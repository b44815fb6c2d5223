package graft.text

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scale contract of [[UnionFind.increment]]'s one corpus-sized touch
  * (VERDICT r9 item 3): fetching the matched docs' label rows must PRUNE
  * the labels table, not scan it. The matched-id set is batch-bounded, so
  * the increment collects it and pushes an IN predicate into the parquet
  * scan; with the registry's sorted layout (compaction range-sorts by
  * doc_id, appends sort within partitions) row-group min/max stats skip
  * everything outside the matched ids. At 100 TB this is the difference
  * between an increment that reads O(matched row groups) and one that
  * re-reads the corpus per batch.
  *
  * The tripwire measures actual task input records via a TaskEnd listener
  * (the [[CcScaleSpec]] discipline): a compacted-layout labels table of
  * 200k rows in ~64 KiB row groups, 8 scattered matched ids — the
  * increment must read well under half the table (measured ~0.15×; an
  * unpruned scan reads ≥ 1.0×). A regression to the join-only fetch, a
  * lost sorted layout, or Spark degrading the IN push to a min/max range
  * (the >threshold behavior — useless for scattered ids) all fail loudly. */
class LabelFetchPruneSpec extends SparkSpec {
  import spark.implicits._

  private val tableRows = 200000L

  test("increment's label fetch reads a pruned fraction of a sorted labels table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lblprune").toString
    // the compacted-form layout ClusterRegistry.compactLabels produces:
    // range-partitioned + sorted by doc_id, small row groups so min/max
    // skipping is observable at unit-test scale
    spark.range(tableRows)
      .select(col("id").as("doc_id"), col("id").as("label"))
      .repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(dir)
    val labels = spark.read.parquet(dir)
    val merges = graft.Frames.empty(spark, "child BIGINT, parent BIGINT")

    // 8 scattered matched corpus ids — far apart so each hits its own row
    // group; the batch brings 8 new docs, each pairing with one of them
    val corpusIds = (0 until 8).map(i => i * 24001L + 7L)
    val batchIds = corpusIds.indices.map(i => 900000L + i)
    val crossPairs = batchIds.zip(corpusIds)
      .toDF("batch_id", "corpus_id")
    val batchPairs = graft.Frames.empty(spark, "doc_a BIGINT, doc_b BIGINT")

    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { read.addAndGet(m.inputMetrics.recordsRead); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val (newLabels, newMerges) = UnionFind.increment(labels, merges,
          batchIds.toDF("doc_id"), batchPairs, crossPairs)
        val l = newLabels.as[(Long, Long)].collect().toMap
        newMerges.count()
        l
      } finally {
        var prev = -1L
        var waited = 0
        while (read.get() != prev && waited < 50) {
          prev = read.get(); Thread.sleep(100); waited += 1
        }
        spark.sparkContext.removeSparkListener(listener)
        graft.Caching.releaseAll()
      }

    // correctness first: each batch doc joins its matched corpus doc's
    // cluster (label = the corpus doc's id, the component min)
    assert(got == batchIds.zip(corpusIds).toMap, got.toString)

    // the prune tripwire: the labels fetch must read row groups around
    // the 8 matched ids, not the table. Half-the-table headroom covers
    // reruns of cached frames and the batch-side reads; an unpruned scan
    // reads >= tableRows and fails unambiguously.
    assert(read.get() < tableRows / 2,
      s"increment read ${read.get()} input records against a $tableRows-row " +
        "labels table — the matched-id IN push no longer prunes the fetch")
  }
}
