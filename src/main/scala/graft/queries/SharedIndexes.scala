package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Session-lifetime registry of PERSISTED index frames shared across batch
 * queries — the in-session face of the on-disk index discipline the
 * streaming ingests maintain ([[graft.stream.CorpusIngest]] appends banded
 * MinHash signatures + shingle sets per accepted batch;
 * [[graft.stream.EmbeddingIngest]] appends SRP band codes + IVF buckets).
 *
 * A dedup pipeline asks several questions of the SAME pair graph: the pairs
 * themselves (`dedup_minhash_pairs`), their transitive closure
 * (`dedup_clusters`), and the per-cluster canonical pick
 * (`dedup_keep_best`). Recomputing signatures + bands + verify from raw
 * text for each question triples the most expensive scan in the suite; a
 * production run derives all three from one persisted signature/pair frame.
 * `frame` gives batch queries exactly that: the first caller builds and
 * materializes the frame (so it is computed while its upstream scoped
 * caches are still alive), every later caller — in the same query or a
 * later one — reads the materialized blocks.
 *
 * Deliberately NOT drained by [[graft.Caching.releaseAll]]'s per-query
 * release: these frames are the session's index state, not one query's
 * intermediates. `clear()` is the session-end (or test-isolation) hook.
 *
 * At 100 TB the same shape is the index tables living as parquet
 * (signatures, verified pairs, component labels) refreshed by the ingest
 * pipeline; `frame`'s memory/disk persist stands in for that storage tier
 * in a single-session run.
 */
object SharedIndexes {

  private val frames = mutable.Map.empty[String, DataFrame]

  /** The frame registered under `key`, building + persisting + eagerly
    * materializing it on first use. Keys must identify the source data AND
    * the index parameters (`minhash-pairs:/root/testdata/sf0.01`). */
  def frame(key: String)(build: => DataFrame): DataFrame = synchronized {
    frames.getOrElseUpdate(key, {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize now: upstream per-query caches still exist
      df
    })
  }

  private val framePairs = mutable.Map.empty[String, (DataFrame, DataFrame)]

  /** Two-frame variant of [[frame]] for indexes whose build shares one
    * scan across both outputs (the MinHash index's banded signatures +
    * shingle sets come from ONE cached shingle pass — building them as
    * two independent `frame` entries would pay that pass twice). */
  def pair(key: String)(build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    synchronized {
      framePairs.getOrElseUpdate(key, {
        val (a, b) = build
        val pa = a.persist(StorageLevel.MEMORY_AND_DISK)
        val pb = b.persist(StorageLevel.MEMORY_AND_DISK)
        pa.count(); pb.count()
        (pa, pb)
      })
    }

  /** Drop every shared frame (session teardown / test isolation). */
  def clear(): Unit = synchronized {
    frames.values.foreach(_.unpersist(blocking = false))
    frames.clear()
    framePairs.values.foreach { case (a, b) =>
      a.unpersist(blocking = false); b.unpersist(blocking = false) }
    framePairs.clear()
  }
}
