package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Evidence that Catalyst's runtime bloom-filter injection (enabled by
 * default, `spark.sql.optimizer.runtime.bloomFilter.enabled`) fires for the
 * selective-dim ⋈ big-fact shape this engine leans on: the dim side's keys
 * build a bloom filter that pre-filters the fact scan BEFORE the join
 * shuffle — at 100 TB that is the difference between shuffling the whole
 * fact table and shuffling the matching sliver. The application-side size
 * threshold (10 GB default) is lowered so unit-test-sized parquet crosses
 * it; restored after.
 */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  test("selective dim join injects a bloom might_contain on the fact side") {
    val dir = Files.createTempDirectory("rtf").toString
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      // injection applies to SHUFFLE joins only; keep the tiny dim from
      // planning as a broadcast join in this test
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(keys(0), "0")
      spark.conf.set(keys(1), "-1")
      (1 to 200000).map(i => (i.toLong % 1000, s"payload$i"))
        .toDF("k", "p").write.mode("overwrite").parquet(s"$dir/fact")
      (1 to 1000).map(i => (i.toLong, if (i % 100 == 0) "hot" else "cold"))
        .toDF("k", "attr").write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === "hot")
      val joined = fact.join(dim, Seq("k"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(800)}")
      // and the filtered join is still exact: hot dim keys are 100..1000
      // step 100, fact keys are 0..999 with 200 rows each -> 9 keys match
      assert(joined.count() == 9 * 200L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
