package graft.queries

import graft.SparkSpec

/** The spark.sql surface over registered views must agree with the
  * DataFrame formulation of the same operator (J1 both ways —
  * SURVEY.md §2.3 keeps the join form as the window form's cross-check). */
class CatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registered views expose the workload through spark.sql") {
    Catalog.registerViews(spark, dir)
    assert(spark.sql("SELECT count(*) FROM events").collect().head.getLong(0) > 0)
    val viaSql = spark.sql(
      "SELECT user_id, event_id FROM v_events_latest")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDf = RefWorkload.j1LatestRecord(spark, dir)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("an ad-hoc SQL join over the views plans and runs") {
    Catalog.registerViews(spark, dir)
    val n = spark.sql(
      """SELECT n_name, count(*) AS c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin).count()
    assert(n > 0)
  }
}
