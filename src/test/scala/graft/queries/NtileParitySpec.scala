package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{Prep, TextOps}

/**
 * The registered `quality_deciles` / `prep_zorder` queries assign exact
 * ntile buckets from broadcast ExactQuantile boundary rows (no
 * unpartitioned WindowExec — PlanGuardSpec forbids it). This spec pins
 * them row-for-row against the textbook global-window ntile spelling,
 * which stays legal here at test scale as the semantic reference.
 */
class NtileParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("quality_deciles cutpoint binning == global-window ntile(10)") {
    val q = TextOps.textStats(Tables(spark, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    val w = Window.orderBy(col("quality_score").asc, col("doc_id").asc)
    val windowed = q.withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality_score")).as("min_q"), max(col("quality_score")).as("max_q"))
    val got = LlmWorkload.qualityDeciles(spark, dir)
    assert(got.schema == windowed.schema)
    assert(sortedRows(got) == sortedRows(windowed))
    graft.Caching.releaseAll()
  }

  test("prep_zorder cutpoint binning == global-window ntile(16)") {
    val e = Tables(spark, dir, "events").select(
      col("event_id"),
      pmod(col("user_id"), lit(65536L)).as("x"),
      pmod(col("event_id"), lit(65536L)).as("y"))
    val z = e.withColumn("zval", Prep.zorderValue(col("x"), col("y")))
    val w = Window.orderBy(col("zval").asc, col("event_id").asc)
    val windowed = z.withColumn("bucket", ntile(16).over(w))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))
    val got = LlmWorkload.prepZorder(spark, dir)
    assert(got.schema == windowed.schema)
    assert(sortedRows(got) == sortedRows(windowed))
    graft.Caching.releaseAll()
  }
}
