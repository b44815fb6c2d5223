package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of left rows share key 1 (the hot key); right has a few rows per key
    val left = ((1 to 900).map(i => (1L, s"ev$i")) ++
      (1 to 100).map(i => (1L + i % 7, s"cold$i"))).toDF("k", "payload")
    val right = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3"), (1L, "dim1b"))
      .toDF("k", "attr")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().sorted.toSeq
    val salted = SaltedJoin.join(left, right, "k", factor = 8)
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
  }

  test("the hot key spreads over multiple salted partitions") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "x")).toDF("k", "attr")
    val salts = left
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(salts == 8L, s"expected the hot key to use all 8 salts, got $salts")
    // and the join still returns every row exactly once
    assert(SaltedJoin.join(left, right, "k", factor = 8).count() == 1000L)
  }
}
