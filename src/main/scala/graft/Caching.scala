package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Ownership for pipeline-intermediate caches. The multi-pass operators
 * (LSH/Jaccard dedup, embedding near-dup) persist frames that feed several
 * joins of ONE logical pipeline; a bare `.persist` there pins executor
 * storage for the session lifetime and re-warns (`Asked to cache already
 * cached data`) on every repeated invocation. `scoped` centralizes both
 * concerns: it persists only plans not already cached, and records what it
 * persisted so a driver (Bench, Verify, a user's job runner) can release
 * everything after each query's terminal action.
 */
object Caching {

  private val owned = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` for reuse across the joins of one pipeline invocation.
    * If the plan is already cached (the same pipeline invoked again in this
    * session), the existing cache is reused silently. Frames persisted here
    * are released by [[releaseAll]]. */
  def scoped(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(level)
      owned += df
    }
    df
  }

  /** Unpersist every scoped frame. Call after the terminal action of the
    * pipeline whose intermediates were scoped; Bench and Verify call it
    * after every query so no cache outlives the query that built it. */
  def releaseAll(): Unit = synchronized {
    owned.foreach(_.unpersist(blocking = false))
    owned.clear()
  }
}
