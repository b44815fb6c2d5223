package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("writePartitioned: pruned dirs, capped file sizes, audited report") {
    val dir = Files.createTempDirectory("layout").toString
    val df = ((1 to 900).map(i => ("click", i.toLong)) ++
      (1 to 50).map(i => ("view", i.toLong))).toDF("event_type", "v")

    val report = Layout.writePartitioned(df, dir, Seq("event_type"),
      maxRowsPerFile = 100)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // every row landed, per partition value
    assert(report("click")._2 == 900L && report("view")._2 == 50L)
    // the hot partition split into >= ceil(900/100) files; the cap held
    assert(report("click")._1 >= 9L, s"hot partition files: ${report("click")._1}")
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().agg(max("count")).as[Long].head()
    assert(perFile <= 100L, s"maxRecordsPerFile violated: $perFile")

    // hive layout: a partition filter prunes to the partition directories
    val scan = spark.read.parquet(dir).filter(col("event_type") === "view")
    assert(scan.count() == 50L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(600))
  }
}
