package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The envelope carries payloads as JSON (SURVEY.md §1.3); every registry
  * schema must survive the to_json → from_json round trip the streaming
  * fan-out performs (graft.cdc.Cdc.typedChanges). */
class RegistryRoundTripSpec extends SparkSpec {

  private def sampleValue(t: DataType): Column = t match {
    case LongType => lit(42L)
    case IntegerType => lit(7)
    case ShortType => lit(3).cast("short")
    case ByteType => lit(1).cast("byte")
    case DoubleType => lit(1.5)
    case StringType => lit("x\"y'z")   // quoting must survive (typed, no splicing)
    case TimestampType => lit("2024-03-05 10:20:30").cast("timestamp")
    case other => fail(s"no sample for $other")
  }

  test("every registry schema round-trips through JSON payload encoding") {
    Schemas.tableSchemas.foreach { case (table, schema) =>
      val sample = struct(schema.fields.toSeq.map(f =>
        sampleValue(f.dataType).cast(f.dataType).as(f.name)): _*)
      val df = spark.range(1)
        .select(sample.as("orig"))
        .withColumn("json", to_json(col("orig")))
        .withColumn("back", from_json(col("json"), schema))
      val ok = df.select((col("orig") <=> col("back")).as("eq"))
        .collect().head.getBoolean(0)
      assert(ok, s"$table payload did not round-trip; " +
        df.select("json").collect().head.getString(0).take(200))
    }
  }
}
