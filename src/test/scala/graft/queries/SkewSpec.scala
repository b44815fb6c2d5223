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
}
