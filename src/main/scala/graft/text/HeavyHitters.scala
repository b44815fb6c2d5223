package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Caching

/**
 * Exact frequency heavy hitters in two bounded passes — the corpus-scale
 * token/domain frequency operator (the reference's aggregation layer stops
 * at groupBy counts over replicated rows, matomo2clickhouse.py:756; at
 * 100 TB a full `groupBy(token)` shuffles every occurrence of every token,
 * which is the single largest shuffle a text pipeline can emit).
 *
 * Pass 1 runs a Misra–Gries summary of capacity `k` inside each partition
 * (`mapPartitions` — the genuinely imperative per-partition case) and emits
 * at most `k` candidate tokens per partition plus that partition's row
 * count. MG guarantees any token with partition count > n_p/(k+1) survives,
 * so every token with GLOBAL count ≥ n/k is a candidate in at least one
 * partition — the candidate union is a guaranteed superset of the answer.
 * Pass 2 broadcast-semi-joins the (≤ partitions·k row) candidate set back
 * onto the token stream and counts exactly, so only candidate occurrences
 * shuffle. The final threshold `cnt·k ≥ n` is pure 64-bit integer
 * arithmetic — engine-portable, no float epsilon.
 *
 * Output: (token, n_occurrences, share) for every token whose exact count
 * is ≥ 1/k of all rows. Deterministic regardless of partitioning: MG only
 * affects the candidate SUPERSET, never the exact counts or the threshold.
 */
object HeavyHitters {

  /**
   * One MERGEABLE Misra–Gries summary of the whole frame, counter values
   * included: per-partition MG of capacity `k`, then a pointwise SUM of the
   * per-partition counters. Each partition's counters satisfy
   * cnt_p ∈ [f_p − n_p/(k+1), f_p] (absent ⇒ f_p ≤ n_p/(k+1)), and both
   * bounds are additive, so the summed summary satisfies
   * cnt ∈ [f − n/(k+1), f] over the whole frame — and summaries of DISJOINT
   * frames keep the same bound when summed again (the property the
   * persisted per-batch layer of [[graft.stream.CorpusIngest]] relies on:
   * serving merges historical summaries by plain integer addition).
   * Size: at most partitions·k rows (the pointwise sum skips the
   * compress-back-to-k step — rows stay bounded and the bound proof stays
   * two lines).
   *
   * Output: (token, cnt). Any token with f > n/(k+1) is guaranteed present.
   */
  def mgSummary(tokens: DataFrame, tokenCol: String, k: Int = 100): DataFrame = {
    require(k >= 2, s"capacity k must be >= 2, got $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string").as("token")).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        while (it.hasNext) {
          val t = it.next()
          counters.get(t) match {
            case Some(c) => counters.update(t, c + 1)
            case None if counters.size < k => counters.update(t, 1L)
            case None =>
              counters.toArray.foreach { case (key, c) =>
                if (c == 1L) counters.remove(key) else counters.update(key, c - 1)
              }
          }
        }
        counters.iterator
      }.toDF("token", "cnt")
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
  }

  def heavyHitters(tokens: DataFrame, tokenCol: String, k: Int = 100): DataFrame = {
    require(k >= 2, s"capacity k must be >= 2, got $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    val toks = tokens.select(col(tokenCol).cast("string").as("token"))

    // pass 1: per-partition MG candidates + the partition's row count
    // (emitted as a null-token marker row so the total needs no extra scan)
    val summary = Caching.scoped(toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val t = it.next()
        n += 1
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // decrement-all round; amortized O(1) per input token
            counters.toArray.foreach { case (key, c) =>
              if (c == 1L) counters.remove(key) else counters.update(key, c - 1)
            }
        }
      }
      counters.keysIterator.map(t => (t, 0L)) ++ Iterator((null: String, n))
    }.toDF("token", "part_rows"))

    val cand = summary.filter(col("token").isNotNull).select("token").distinct()
    val total = summary.filter(col("token").isNull)
      .agg(sum(col("part_rows")).as("n_tokens"))

    val counts = toks.join(broadcast(cand), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
    counts.crossJoin(broadcast(total))
      .filter(col("n_occurrences") * lit(k.toLong) >= col("n_tokens"))
      .select(col("token"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / col("n_tokens").cast("double"))
          .as("share"))
  }
}
