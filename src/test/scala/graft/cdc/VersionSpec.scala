package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas

/** Q5/F6 — version layout and boundary semantics (VERDICT What's-wrong #3/#4). */
class VersionSpec extends SparkSpec {

  private def envelope(rows: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("log_file", "log_pos", "row_index")
      .select(lit("INSERT").as("op"), lit("db").as("schema"), lit("t").as("table"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("ts"),
        col("log_file"), col("log_pos"), col("row_index"),
        lit(null).cast("string").as("before"), lit(null).cast("string").as("after"))
  }

  test("version is strictly monotone over binlog order incl. 5000-row events") {
    // coordinates in strictly increasing binlog order with large row indexes
    val coords = for {
      f <- 1 to 3
      p <- Seq(4L, 1000L, 123456789L, (1L << 32) - 1)
      r <- Seq(0, 255, 256, 4999, Cdc.MaxRowIndex)
    } yield (f"mysql-bin.$f%06d", p, r)
    val versions = Cdc.withVersion(envelope(coords))
      .select(Schemas.VersionCol).collect().map(_.getLong(0)).toSeq
    assert(versions == versions.sorted)
    assert(versions.distinct.size == versions.size)
    // driver-side encode agrees with the column expression
    coords.zip(versions).foreach { case ((f, p, r), v) =>
      assert(Cdc.versionOf(f, p, r) == v)
    }
  }

  test("row_index or log_pos overflow raises instead of corrupting the order") {
    val bad = envelope(Seq(("mysql-bin.000001", 10L, Cdc.MaxRowIndex + 1)))
    val e = intercept[Exception] {
      Cdc.withVersion(bad).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      Cdc.versionOf("mysql-bin.000001", 1L << 33, 0)
    }
  }

  test("file-index overflow or a malformed log_file raises (no silent sign flip / null)") {
    intercept[Exception] {
      Cdc.withVersion(envelope(Seq(("mysql-bin.131072", 10L, 0)))).collect()
    }
    intercept[Exception] {
      Cdc.withVersion(envelope(Seq(("no-numeric-suffix", 10L, 0)))).collect()
    }
    intercept[IllegalArgumentException] {
      Cdc.versionOf("mysql-bin.131072", 10L, 0)
    }
    // the last valid coordinate tops out exactly at Long.MaxValue
    assert(Cdc.versionOf("mysql-bin.131071", (1L << 32) - 1, Cdc.MaxRowIndex) ==
      Long.MaxValue)
  }

  test("property: versionOf is monotone in (fileIdx, pos, row) lexicographic order") {
    val rnd = new scala.util.Random(42)
    def coord(): (Int, Long, Int) = (
      1 + rnd.nextInt(99999),
      4L + (rnd.nextLong().abs % ((1L << 32) - 4)),
      rnd.nextInt(Cdc.MaxRowIndex + 1))
    (1 to 500).foreach { _ =>
      val (a, b) = (coord(), coord())
      val va = Cdc.versionOf(f"mysql-bin.${a._1}%06d", a._2, a._3)
      val vb = Cdc.versionOf(f"mysql-bin.${b._1}%06d", b._2, b._3)
      val cmp = Ordering[(Int, Long, Int)].compare(a, b)
      assert(java.lang.Long.compare(va, vb).sign == cmp.sign, s"$a vs $b")
    }
  }

  test("filterEvents endCoord keeps events at or before the coordinate (F6)") {
    val rows = Seq(
      ("mysql-bin.000001", 100L, 0),
      ("mysql-bin.000001", 200L, 0),
      ("mysql-bin.000001", 200L, 5),   // same pos, later row: still <= (f1, 200)
      ("mysql-bin.000001", 201L, 0),
      ("mysql-bin.000002", 4L, 0))
    val kept = Cdc.filterEvents(envelope(rows),
      endCoord = Some(("mysql-bin.000001", 200L)))
      .select("log_file", "log_pos").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("mysql-bin.000001", 100L), ("mysql-bin.000001", 200L)))
  }

  test("filterEvents table/schema/op/time filters compose (F1-F3, F5)") {
    import spark.implicits._
    val df = Seq(
      ("INSERT", "db1", "a", "2024-01-01 00:00:00"),
      ("UPDATE", "db1", "a", "2024-01-02 00:00:00"),
      ("DELETE", "db2", "a", "2024-01-03 00:00:00"),
      ("INSERT", "db1", "b", "2024-01-04 00:00:00"))
      .toDF("op", "schema", "table", "t")
      .select(col("op"), col("schema"), col("table"), col("t").cast("timestamp").as("ts"),
        lit("mysql-bin.000001").as("log_file"), lit(4L).as("log_pos"),
        lit(0).as("row_index"), lit(null).cast("string").as("before"),
        lit(null).cast("string").as("after"))
    val kept = Cdc.filterEvents(df,
      onlyTables = Seq("a"), onlySchemas = Seq("db1"),
      opTypes = Seq("INSERT", "UPDATE"),
      startTs = Some(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
    assert(kept.select("op").as[String].collect().toSeq == Seq("UPDATE"))
  }
}
