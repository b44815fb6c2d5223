package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Parquet table loader for the driver testdata (TESTDATA.md).
 *
 * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's vectorized
 * reader rejects; sessions therefore set
 * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Sessions]]) and
 * this loader converts the nano count to a proper TIMESTAMP_NTZ column
 * (values are microsecond-aligned, verified against the data, so the
 * conversion is lossless). All other timestamp columns are MILLIS NTZ and
 * read natively.
 */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integer division: epoch-nanos (~1.7e18) overflows double precision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case None => df
    }
  }
}
