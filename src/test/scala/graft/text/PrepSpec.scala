package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: stable per-id assignment, every row assigned, weights hold roughly") {
    val small = (1L to 50L).toDF("id")
    val large = (1L to 500L).toDF("id")
    val s = Prep.hashSplit(small, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val l = Prep.hashSplit(large, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    // a doc's split never depends on the rest of the corpus
    assert(s.forall { case (id, sp) => l(id) == sp })
    assert(l.values.forall(Set("train", "val", "test")))
    val train = l.values.count(_ == "train")
    assert(train > 300 && train < 480, s"train=$train of 500")
  }

  test("packShards cuts contiguous shards at the exclusive prefix budget") {
    val df = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 600L), (5L, 600L))
      .toDF("id", "toks")
    val out = Prep.packShards(df, "id", "toks", budget = 1000L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // exclusive prefix sums 0,600,1200,1800,2400 -> shards 0,0,1,1,2
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("packShards with partition cols packs each partition independently") {
    val df = Seq(("a", 1L, 900L), ("a", 2L, 900L), ("b", 3L, 100L), ("b", 4L, 100L))
      .toDF("w", "id", "toks")
    val out = Prep.packShards(df, "id", "toks", budget = 1000L, partitionCols = Seq("w"))
      .select("w", "id", "shard").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L), ("b", 4L, 0L)))
  }
}
