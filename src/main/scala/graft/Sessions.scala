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
      // parallelism-first coalescing for TINY shuffles too: the default
      // 1 MB minPartitionSize collapses a cheap-to-shuffle stage (e.g. the
      // ~1.6 MB argmax output of a Lloyd iteration) to 1-2 partitions, and
      // the EXPENSIVE work downstream of the exchange (candidate joins
      // that expand each row ~√nlist×, explodes) inherits that
      // parallelism — measured: one core computing 4.5M dot products per
      // retrain iteration while 31 idled (8-core wall == 32-core wall).
      // AQE sizes partitions by shuffle bytes, which says nothing about
      // post-exchange compute. 16 KB keeps the parallelism-first target
      // (totalBytes / defaultParallelism) in charge for small stages; at
      // production scale real shuffle stages dwarf both floors and the
      // behavior is identical to the default.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // skewed join keys re-plan at runtime (the engine's answer to the
      // reference's hot-key tables; salting stays unnecessary under AQE)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // testdata events.ts is parquet TIMESTAMP(NANOS): read as long, the
      // Tables loader converts to TIMESTAMP_NTZ (see graft.queries.Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // push IN lists up to UnionFind.MaxLabelFetchIds to parquet as
      // or-of-eq so row-group min/max stats prune point-lookup fetches
      // (above the default 10, Spark degrades the push to a min/max RANGE,
      // which prunes nothing for scattered ids; measured on this Spark:
      // 50 ids pushed read 0.6× the table, range-only read 1.0×). Kept at
      // 1000 — parquet evaluates the or-chain recursively and a ~5000-term
      // chain measurably overflows the stack
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
      .config("spark.ui.enabled", "false")
}
