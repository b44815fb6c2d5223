package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain inner join's rows") {
    // one pathologically hot key (90% of rows) + a tail
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (1L + i % 7, 1000L + i)))
      .toDF("k", "row_id")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "absent-left"))
      .toDF("k", "v")
    val plain = left.join(right, Seq("k"))
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 8, leftDisambig = "row_id")
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("the hot key actually spreads across salt buckets") {
    val left = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val buckets = left
      .withColumn("__salt", pmod(xxhash64(col("k"), col("row_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(buckets > 4, s"only $buckets salt buckets used")
  }

  test("AQE splits a skewed sort-merge partition at runtime (skew=true in the final plan)") {
    // graft.Sessions enables adaptive.skewJoin; this pins that the engine's
    // first line of skew defense actually fires. Thresholds are lowered so
    // unit-test-sized data crosses them; restored after.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import spark.implicits._
      // one key carries 50k rows, the tail is tiny -> one oversized partition
      val left = ((1 to 50000).map(i => (1L, s"payload-$i-${"x" * 40}")) ++
        (1 to 200).map(i => (1L + i % 13, s"cold$i"))).toDF("k", "p")
      val right = (1L to 14L).map(k => (k, s"dim$k")).toDF("k", "attr")
      val joined = left.join(right, Seq("k"))
      // drive THIS QueryExecution to completion (count() would plan a new
      // one), then read the finalized adaptive plan
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() == 50200L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
