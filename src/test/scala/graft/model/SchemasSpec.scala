package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Registry completeness against the reference DDL
  * (reference: script_create_clickhouse_table.sql:1-398). */
class SchemasSpec extends AnyFunSuite {

  test("registry covers all 16 reference tables plus the ledger") {
    assert(Schemas.tableSchemas.size == 17)
    assert(Schemas.tableMeta.size == 16) // ledger is engine metadata, not CDC-applied
  }

  test("column counts match the reference DDL per table") {
    val expected = Map(
      "log_replication" -> 7,
      "matomo_log_visit" -> 79,
      "matomo_log_link_visit_action" -> 53,
      "matomo_log_conversion_item" -> 15,
      "matomo_log_conversion" -> 56,
      "matomo_log_profiling" -> 4,
      "matomo_log_action" -> 5,
      "matomo_goal" -> 12,
      "matomo_site" -> 18,
      "matomo_site_url" -> 2,
      "matomo_tagmanager_tag" -> 17,
      "matomo_tagmanager_variable" -> 12,
      "matomo_tagmanager_container_version" -> 10,
      "matomo_tagmanager_container_release" -> 9,
      "matomo_tagmanager_container" -> 9,
      "matomo_tagmanager_trigger" -> 11,
      "matomo_custom_dimensions" -> 8)
    expected.foreach { case (t, n) =>
      assert(Schemas.tableSchemas(t).fields.length == n, s"$t column count")
    }
  }

  test("every meta's key/partition/delete columns exist in its schema") {
    Schemas.tableMeta.foreach { case (t, m) =>
      val cols = Schemas.tableSchemas(t).fieldNames.toSet
      m.keyCols.foreach(k => assert(cols.contains(k), s"$t key $k"))
      m.partitionCol.foreach(c => assert(cols.contains(c), s"$t partition $c"))
      m.deleteDateCol.foreach(c => assert(cols.contains(c), s"$t deleteDate $c"))
    }
  }

  test("versioned tables carry the engine version column, exactly as the DDL does") {
    Schemas.tableMeta.foreach { case (t, m) =>
      val hasVersion = Schemas.tableSchemas(t).fieldNames.contains(Schemas.VersionCol)
      if (m.versioned) assert(hasVersion, s"$t should carry ${Schemas.VersionCol}")
    }
    // only the two hot tables + the ledger have dateid in the reference DDL
    val withVersion = Schemas.tableSchemas.filter(_._2.fieldNames.contains(Schemas.VersionCol)).keySet
    assert(withVersion == Set("log_replication", "matomo_log_visit",
      "matomo_log_link_visit_action"))
  }
}
