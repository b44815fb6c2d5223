package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas
import CdcFixtures._

/** FIXTURES.md §A3 scenario tests for the CDC apply core — the semantics the
  * reference gets from its single-threaded sequential loop
  * (reference: matomo2clickhouse.py:648-653) recovered order-insensitively. */
class CdcApplySpec extends SparkSpec {

  // ---- applyMutable (plain UPDATE path, reference: binlog2sql_util.py:294-341)

  test("mutable: INSERT then UPDATE of the same key in one batch materializes the row") {
    val st = state(spark, Nil)
    val ch = changes(spark, Seq(
      ins(1, 10, "a"),
      upd(2, 10, "a", "b")))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(10L), Some("b"), None)))
  }

  test("mutable: INSERT then UPDATE then DELETE of the same key in one batch removes it") {
    val st = state(spark, Nil)
    val ch = changes(spark, Seq(
      ins(1, 10, "a"), upd(2, 10, "a", "b"), del(3, 10, "b")))
    assert(collectMutable(Cdc.applyMutable(st, ch, Seq("id"))).isEmpty)
  }

  test("mutable: UPDATE with no state row and no batch INSERT is a no-op") {
    val st = state(spark, Seq((5L, "keep", null)))
    val ch = changes(spark, Seq(upd(1, 99, "x", "y")))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(5L), Some("keep"), None)))
  }

  test("mutable: UPDATE applies only changed columns (F8), null-to-null elided") {
    // state note='s-note' differs from the before-image note (both null in the
    // change): note is UNCHANGED in the event, so the state value survives
    val st = state(spark, Seq((7L, "old", "s-note")))
    val ch = changes(spark, Seq(upd(1, 7, "old", "new", None, None)))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(7L), Some("new"), Some("s-note"))))
  }

  test("mutable: UPDATE moves a column changing null -> value and value -> null") {
    val st = state(spark, Seq((7L, "n", "x")))
    val ch = changes(spark, Seq(
      upd(1, 7, "n", "n", beforeNote = Some("x"), afterNote = None)))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(7L), Some("n"), None)))
  }

  test("mutable: DELETE removes the matching row, others untouched") {
    val st = state(spark, Seq((1L, "a", null), (2L, "b", null)))
    val ch = changes(spark, Seq(del(1, 1, "a")))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(2L), Some("b"), None)))
  }

  test("mutable: null key matches null-safely (F13)") {
    val st = state(spark, Seq((null, "nullkey", null), (2L, "b", null)))
    val ch = changes(spark, Seq(
      ("DELETE", 1L, Some((None, Some("nullkey"), None)), None): Ev))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(2L), Some("b"), None)))
  }

  test("mutable: INSERT on key collision replaces the state row (latest-wins)") {
    val st = state(spark, Seq((3L, "stale", "z")))
    val ch = changes(spark, Seq(ins(1, 3, "fresh")))
    val out = collectMutable(Cdc.applyMutable(st, ch, Seq("id")))
    assert(out == Set((Some(3L), Some("fresh"), None)))
  }

  // ---- applyVersioned (INS-UPD rewrite, reference: binlog2sql_util.py:305-327)

  test("versioned: INSERT(v1) then DELETE(v2) same batch does not resurrect v1") {
    val h = history(spark, Nil)
    val ch = changes(spark, Seq(ins(1, 10, "a"), del(2, 10, "a")))
    assert(collectVersioned(Cdc.applyVersioned(h, ch, Seq("id"))).isEmpty)
  }

  test("versioned: DELETE(v1) then INSERT(v2) same batch keeps v2, drops history") {
    val h = history(spark, Seq((10L, "hist", null, 0L)))
    val ch = changes(spark, Seq(del(1, 10, "hist"), ins(2, 10, "reborn")))
    val out = collectVersioned(Cdc.applyVersioned(h, ch, Seq("id")))
    assert(out == Set((10L, Some("reborn"), None, 2L)))
  }

  test("versioned: UPDATE appends a new version; latest-wins returns it") {
    val h = history(spark, Seq((10L, "v0", null, 0L)))
    val ch = changes(spark, Seq(upd(1, 10, "v0", "v1")))
    val applied = Cdc.applyVersioned(h, ch, Seq("id"))
    assert(collectVersioned(applied) ==
      Set((10L, Some("v0"), None, 0L), (10L, Some("v1"), None, 1L)))
    val latest = collectVersioned(Cdc.latestWins(applied, Seq("id")))
    assert(latest == Set((10L, Some("v1"), None, 1L)))
  }

  test("versioned: suppressOldDeletes keeps fresh deletes, drops old ones (31-day boundary)") {
    import spark.implicits._
    val now = lit("2024-02-01 00:00:00").cast("timestamp")
    val ch = Seq(
      ("DELETE", 1L, "2023-12-31 00:00:00", 1L),
      ("DELETE", 2L, "2024-01-02 00:00:00", 2L),
      ("INSERT", 3L, "2023-01-01 00:00:00", 3L)) // non-delete: never suppressed
      .toDF("op", "id", "d", Schemas.VersionCol)
      .select(col("op"), col(Schemas.VersionCol),
        struct(col("id"), col("d").cast("timestamp").as("d")).as("before"),
        lit(null).cast("struct<id:bigint,d:timestamp>").as("after"))
    val kept = Cdc.suppressOldDeletes(ch, "d", now, maxAgeDays = 31)
      .select("before.id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    assert(Cdc.rejectedDeleteCount(ch, "d", now, maxAgeDays = 31) == 1L)
  }

  // ---- purge / stale (J2/J3, reference: _settings.py:230-287)

  test("purge keeps exactly the max-version row per key; stale is the complement") {
    val h = history(spark, Seq(
      (1L, "a0", null, 10L), (1L, "a1", null, 20L), (1L, "a2", null, 30L),
      (2L, "b0", null, 5L)))
    val purged = collectVersioned(Cdc.dedupPurge(h, Seq("id")))
    assert(purged == Set((1L, Some("a2"), None, 30L), (2L, Some("b0"), None, 5L)))
    val stale = collectVersioned(Cdc.staleVersions(h, Seq("id")))
    assert(stale == Set((1L, Some("a0"), None, 10L), (1L, Some("a1"), None, 20L)))
  }

  test("lastEventPerKey keeps the max-version event and the batch-insert flag (ST7)") {
    val ch = changes(spark, Seq(
      ins(1, 10, "a"), upd(2, 10, "a", "b"),   // key 10: last=UPDATE, had insert
      upd(5, 20, "x", "y")))                   // key 20: last=UPDATE, no insert
    val out = Cdc.lastEventPerKey(ch, Seq("id")).collect().map { r =>
      (r.getAs[Long]("__key_id"), r.getAs[String]("op"),
        r.getAs[Long](graft.model.Schemas.VersionCol), r.getAs[Boolean]("__had_insert"))
    }.toSet
    assert(out == Set((10L, "UPDATE", 2L, true), (20L, "UPDATE", 5L, false)))
  }

  test("unknown table fails fast at the registry, mirroring the reference's strict-schema errors") {
    // reference: README.md:196-206 — schema drift is a hard error, not a skip
    val ch = changes(spark, Seq(ins(1, 10, "a")))
    intercept[NoSuchElementException] {
      Cdc.typedChanges(ch.withColumn("table", org.apache.spark.sql.functions.lit("nope")),
        "no_such_table")
    }
  }

  test("strict typedChanges raises on a corrupt payload; permissive nulls it") {
    import spark.implicits._
    val env = Seq(("INSERT", "db", "matomo_site", "2024-01-05 10:00:00",
        "mysql-bin.000001", 100L, 0, null: String, """{"idsite": NOT-JSON"""))
      .toDF("op", "schema", "table", "ts", "log_file", "log_pos", "row_index",
        "before", "after")
      .withColumn("ts", col("ts").cast("timestamp"))
    // permissive (default): parse failure becomes an all-null struct — which
    // downstream would mistake for real data, hence the strict mode
    val lax = Cdc.typedChanges(env, "matomo_site").collect()
    assert(lax.length == 1)
    val after = lax.head.getStruct(lax.head.fieldIndex("after"))
    assert(after != null && after.isNullAt(after.fieldIndex("idsite")))
    // strict: the batch fails loudly instead
    val e = intercept[Exception] {
      Cdc.typedChanges(env, "matomo_site", strict = true).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed"), e.getMessage)
  }

  test("schema drift: extra payload columns are ignored, absent ones read as null — in BOTH parse modes") {
    import spark.implicits._
    // upstream ALTER TABLE ADD COLUMN lands in the binlog before the registry
    // learns it: the payload carries a field the schema lacks (brand_new_col)
    // and omits one it has (name). Neither is corruption — replication must
    // keep flowing (new column dropped, missing column null), and strict
    // mode must reserve its failure for MALFORMED payloads only.
    val env = Seq(("INSERT", "db", "matomo_site", "2024-01-05 10:00:00",
        "mysql-bin.000001", 100L, 0, null: String,
        """{"idsite": 7, "brand_new_col": "surprise", "timezone": "UTC"}"""))
      .toDF("op", "schema", "table", "ts", "log_file", "log_pos", "row_index",
        "before", "after")
      .withColumn("ts", col("ts").cast("timestamp"))
    for (strict <- Seq(false, true)) {
      val out = Cdc.typedChanges(env, "matomo_site", strict = strict).collect()
      assert(out.length == 1, s"strict=$strict")
      val after = out.head.getStruct(out.head.fieldIndex("after"))
      assert(after.getLong(0) == 7L, s"strict=$strict idsite")          // kept
      assert(after.isNullAt(1), s"strict=$strict absent 'name' -> null") // missing
      // the registry schema, not the payload, decides the output width —
      // the unknown field must not widen the struct
      val registryWidth = graft.model.Schemas.tableSchemas("matomo_site")
        .fields.count(_.name != graft.model.Schemas.VersionCol)
      assert(after.length == registryWidth, s"strict=$strict width")
    }
  }

  test("purge with window predicate leaves rows outside the window untouched") {
    val h = history(spark, Seq(
      (1L, "old-dup", null, 1L), (1L, "old-dup2", null, 2L), // outside window
      (2L, "w0", null, 100L), (2L, "w1", null, 200L)))       // inside window
    val purged = collectVersioned(
      Cdc.dedupPurge(h, Seq("id"), windowPred = Some(col(Schemas.VersionCol) >= 100L)))
    assert(purged == Set(
      (1L, Some("old-dup"), None, 1L), (1L, Some("old-dup2"), None, 2L),
      (2L, Some("w1"), None, 200L)))
  }

  test("incrementalAgg: batched maintenance equals whole-log maintenance exactly") {
    import spark.implicits._
    val raw = Seq(
      ("INSERT", None, Some(("x", 2.25))),
      ("INSERT", None, Some(("y", 1.0))),
      ("UPDATE", Some(("x", 2.25)), Some(("x", 3.5))),
      ("DELETE", Some(("y", 1.0)), None),
      ("INSERT", None, Some(("y", 7.125))))
      .toDF("op", "b", "a")
    val changes = raw.select(col("op"),
      when(col("b").isNotNull, struct(col("b._1").as("g"), col("b._2").as("v"))).as("before"),
      when(col("a").isNotNull, struct(col("a._1").as("g"), col("a._2").as("v"))).as("after"))
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "cnt", "sum_micro")

    val whole = Cdc.incrementalAgg(empty, changes, "g", "v")
      .as[(String, Long, Long)].collect().toSet
    // x: +2250000, then -2250000 +3500000 -> cnt 1, 3500000
    // y: +1000000, -1000000, +7125000 -> cnt 1, 7125000
    assert(whole == Set(("x", 1L, 3500000L), ("y", 1L, 7125000L)))

    // maintaining across an arbitrary batch boundary is EXACT (integer deltas)
    val batched = Cdc.incrementalAgg(
      Cdc.incrementalAgg(empty, changes.limit(2), "g", "v"),
      changes.exceptAll(changes.limit(2)), "g", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(batched == whole)
  }

  test("incrementalAgg randomized: any batch partitioning equals the whole-log result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val groups = Seq("a", "b", "c")
    val ops = Seq.tabulate(60) { i =>
      val g = groups(rnd.nextInt(3))
      val v = rnd.nextInt(1000) / 4.0
      rnd.nextInt(3) match {
        case 0 => ("INSERT", None, Some((g, v)))
        case 1 => ("UPDATE", Some((g, v)), Some((groups(rnd.nextInt(3)), v + 0.25)))
        case _ => ("DELETE", Some((g, v)), None)
      }
    }
    def frame(rows: Seq[(String, Option[(String, Double)], Option[(String, Double)])]) =
      rows.toDF("op", "b", "a").select(col("op"),
        when(col("b").isNotNull, struct(col("b._1").as("g"), col("b._2").as("v"))).as("before"),
        when(col("a").isNotNull, struct(col("a._1").as("g"), col("a._2").as("v"))).as("after"))
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "cnt", "sum_micro")
    val whole = Cdc.incrementalAgg(empty, frame(ops), "g", "v")
      .as[(String, Long, Long)].collect().toSet
    for (cut1 <- Seq(13, 29, 47)) {
      val staged = Cdc.incrementalAgg(
        Cdc.incrementalAgg(empty, frame(ops.take(cut1)), "g", "v"),
        frame(ops.drop(cut1)), "g", "v")
        .as[(String, Long, Long)].collect().toSet
      assert(staged == whole, s"cut at $cut1")
    }
  }

  test("consistentCut: min head; cutView hides post-watermark versions") {
    import spark.implicits._
    assert(Cdc.consistentCut(Map("a" -> 90L, "b" -> 70L, "c" -> 80L)) == 70L)
    val hist = Seq(
      (1L, 10L, "v1"), (1L, 60L, "v2"), (1L, 75L, "v3-after-cut"),
      (2L, 70L, "w1"))
      .toDF("user_id", Schemas.VersionCol, "payload")
    val view = Cdc.cutView(hist, Seq("user_id"), watermark = 70L)
      .select("user_id", "payload").as[(Long, String)].collect().toSet
    // user 1's v3 (version 75 > 70) must be invisible; v2 wins; the
    // watermark boundary itself (70) is included
    assert(view == Set((1L, "v2"), (2L, "w1")))
  }

  test("lagReport counts only ops beyond the applied head, per op type") {
    import spark.implicits._
    val log = Seq(
      ("INSERT", 1L), ("UPDATE", 2L), ("DELETE", 3L),
      ("INSERT", 4L), ("UPDATE", 5L), ("INSERT", 6L))
      .toDF("op", Schemas.VersionCol)
    val out = Cdc.lagReport(log, appliedMax = 3L)
      .select("op", "n_pending", "min_pending", "max_pending", "applied_head")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("INSERT", 2L, 4L, 6L, 3L), ("UPDATE", 1L, 5L, 5L, 3L)))
    // fully caught up: empty report
    assert(Cdc.lagReport(log, appliedMax = 6L).isEmpty)
  }
}
