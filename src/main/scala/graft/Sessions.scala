package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify / Bench / tests agree on the
  * semantics-relevant configs. */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // skewed join keys re-plan at runtime (the engine's answer to the
      // reference's hot-key tables; salting stays unnecessary under AQE)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // testdata events.ts is parquet TIMESTAMP(NANOS): read as long, the
      // Tables loader converts to TIMESTAMP_NTZ (see graft.queries.Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
