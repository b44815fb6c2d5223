package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(expr(s"graft_topk(v, t, $k)").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", $"e.value".as("v"), $"e.tie".as("t"),
        ($"pos" + 1).cast("int").as("rnk"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"t".asc)
    df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"g", $"v", $"t", $"rnk")
  }

  test("graft_topk equals the window top-k on randomized data under any partitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(7).toString, (rnd.nextInt(40) / 2.0), rnd.nextInt(1000).toLong))
    for (parts <- Seq(1, 8)) {
      val df = rows.toDF("g", "v", "t").repartition(parts)
      val a = viaAgg(df, 5).orderBy("g", "rnk").collect().toSeq
      val b = viaWindow(df, 5).orderBy("g", "rnk").collect().toSeq
      assert(a == b, s"parts=$parts")
    }
  }

  test("graft_topk: groups smaller than k return all rows, best first") {
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L)).toDF("g", "v", "t")
    val out = viaAgg(df, 5).orderBy("rnk").as[(String, Double, Long, Int)].collect()
    assert(out.toSeq == Seq(("a", 3.0, 11L, 1), ("a", 1.0, 10L, 2)))
  }

  test("graft_topk: ties on value break by ascending tie column") {
    val df = Seq(("a", 2.0, 30L), ("a", 2.0, 10L), ("a", 2.0, 20L)).toDF("g", "v", "t")
    val out = viaAgg(df, 2).orderBy("rnk").as[(String, Double, Long, Int)].collect()
    assert(out.toSeq == Seq(("a", 2.0, 10L, 1), ("a", 2.0, 20L, 2)))
  }

  test("graft_topk: null measures are skipped, not ranked") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(2.0), 3L))
      .toDF("g", "v", "t")
    val out = viaAgg(df, 3).orderBy("rnk").as[(String, Double, Long, Int)].collect()
    assert(out.toSeq == Seq(("a", 2.0, 3L, 1), ("a", 1.0, 1L, 2)))
  }

  test("graft_topk: null TIES are skipped too — the documented divergence " +
      "from the window spelling") {
    val df = Seq(("a", 5.0, Some(1L)), ("a", 9.0, None), ("a", 2.0, Some(3L)))
      .toDF("g", "v", "t")
    val out = viaAgg(df, 3).orderBy("rnk").as[(String, Double, Long, Int)].collect()
    // the null-tie row (v=9.0, the would-be winner) does not compete;
    // row_number() would rank it — callers must coalesce nullable ties
    assert(out.toSeq == Seq(("a", 5.0, 1L, 1), ("a", 2.0, 3L, 2)))
  }

  test("graft_topk: wrong arity raises an AnalysisException, not IndexOutOfBounds") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "v", "t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy($"g").agg(expr("graft_topk(v, t)")).collect()
    }
    assert(e.getMessage.contains("graft_topk"))
  }

  test("graft_topk serialization round-trips the heap") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopK(Literal(0.0), Literal(0L), Literal(3))
    val buf = agg.createAggregationBuffer()
    Seq((5.0, 1L), (3.0, 2L), (9.0, 3L), (7.0, 4L)).foreach { case (v, t) =>
      buf.enqueue((v, t)); if (buf.size > 3) buf.dequeue()
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toArray.sorted.toSeq == buf.toArray.sorted.toSeq)
  }
}
