package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Tiny frame constructors shared across packages. */
object Frames {

  /** An empty DataFrame with the given DDL schema — the building block of
    * every read-or-empty / seed-state path ([[graft.stream.CorpusIngest]]
    * table reads, union-find fold seeds, compaction truncations). */
  def empty(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(ddl))
}
