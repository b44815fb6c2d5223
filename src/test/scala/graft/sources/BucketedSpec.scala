package graft.sources

import graft.SparkSpec
import graft.queries.Tables

/** Co-located join: bucketed tables must join with zero Exchange operators
  * (the build brief's bucketing requirement, testable only through the
  * physical plan). */
class BucketedSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    if (loc.exists()) rmrf(loc)
  }

  test("orders joins lineitem shuffle-free when both are bucketed on the key") {
    val dir = "/root/testdata/sf0.001"
    dropTable("b_orders"); dropTable("b_lineitem")
    Bucketed.save(Tables(spark, dir, "orders"), "b_orders", "o_orderkey", 4)
    Bucketed.save(Tables(spark, dir, "lineitem"), "b_lineitem", "l_orderkey", 4)

    // disable broadcast so both joins plan as merge joins: the comparison is
    // shuffled-merge (plain parquet) vs shuffle-FREE merge (bucketed scans)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = Bucketed.join(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(plan.contains("Bucketed: true"), plan.take(800))
      assert(joined.count() > 0)

      val o = Tables(spark, dir, "orders")
      val l = Tables(spark, dir, "lineitem")
      val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"), plainPlan.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
