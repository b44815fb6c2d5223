package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data preparation operators — the last-mile steps between a
 * cleaned corpus and a training run (builder brief: the operations a
 * large-scale training-data pipeline needs beyond the reference's surface).
 *
 * Everything is deterministic BY CONSTRUCTION (content hash / document id,
 * never randomness or wall clock): re-running a split or a packing over the
 * same corpus yields byte-identical assignments, which is what makes
 * incremental re-builds and cross-engine verification possible at all.
 */
object Prep {

  /**
   * Deterministic train/val/test split: bucket = md5-hash of the id modulo
   * 100, split by cumulative weight ranges. Stable under corpus growth (a
   * doc's split never depends on other rows), engine-portable (the oracle
   * replays the same arithmetic), and a pure narrow map — no shuffle at all.
   */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq(("train", 80), ("val", 10), ("test", 10))): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100: $splits")
    val bucket = pmod(TextOps.hash64(col(idCol).cast("string")), lit(100L))
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val head = when(bucket < bounds.head, splits.head._1)
    val assign = splits.tail.zip(bounds.tail).foldLeft(head) {
      case (c, ((name, _), bound)) => c.when(bucket < bound, name)
    }
    df.withColumn("split", assign)
  }

  /**
   * Z-order (Morton) interleave of two non-negative `bits`-bit integer
   * columns — the multi-dimensional clustering key behind data-skipping
   * layouts: rows sorted by the z-value keep BOTH dimensions locally dense,
   * so per-file min/max statistics prune scans filtered on either column
   * (range-partition by z-value before writing; at 100 TB that is the
   * difference between touching every file and touching the overlap).
   * Pure codegen'd bit arithmetic, identical in any engine.
   */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /**
   * Deterministic stratified sampling: keep each row with its stratum's
   * rate, decided by the md5 hash of (id + salt) against a 1/10000 grid —
   * the per-stratum up/down-sampling step of corpus mixing (e.g. keep 50%
   * of English, 10% of the long tail). Like [[hashSplit]], membership is a
   * pure per-row function of the id: stable under corpus growth, replayable
   * by any engine, no shuffle at all. Strata absent from `rates` are
   * dropped (rate 0).
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String = "strat"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      s"rates must be in [0, 1]: $rates")
    val grid = rates.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(math.round(r * 10000).toLong))
          .otherwise(acc)
    }
    df.filter(pmod(TextOps.hash64(
      concat(col(idCol).cast("string"), lit("#" + salt))), lit(10000L)) < grid)
  }

  /**
   * Per-group quota cap: keep at most `cap` rows per group, chosen by the
   * md5 hash of the id (a deterministic "random" sample of each group, not
   * a prefix). The domain/source-cap step of corpus mixing — one shuffle on
   * the group key; the hash order makes the kept subset independent of the
   * input's physical row order, so it is stable across engines and runs.
   */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, cap: Int,
      salt: String = "cap"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy(col(groupCol)).orderBy(
      TextOps.hash64(concat(col(idCol).cast("string"), lit("#" + salt))),
      col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
  }

  /**
   * Deterministic mixture sampling: downsample strata so the kept corpus
   * matches target proportions (`weights` in parts-per-10000, e.g. en=5000
   * means half the kept tokens should be English). The scale is set by the
   * binding stratum — the one whose supply runs out first: K = min over
   * strata of floor(n_s·10000/w_s) is the largest total size every stratum
   * can fill, and stratum s keeps hash(id)%10000 < floor(w_s·K/n_s).
   *
   * All sizing arithmetic is 64-bit integer (exact in any engine); per-row
   * membership is the same hash-grid test as [[stratifiedSample]], so the
   * kept set is a pure function of (corpus counts, id). Strata missing
   * from `weights` are dropped. Two scans: one tiny counts aggregate
   * (broadcast back), one filter — no extra shuffle of the corpus itself.
   */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Int], salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive parts-per-10000: $weights")
    val wExpr = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (s, w)) => when(col(stratumCol) === s, lit(w.toLong)).otherwise(acc)
    }
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", wExpr).filter(col("__w").isNotNull)
    // `div` (not `/`): Spark's `/` on longs is fractional; the sizing must
    // stay exact 64-bit integer arithmetic for cross-engine replay
    val scale = counts.agg(min(expr("__n * 10000 div __w")).as("__k"))
    val grids = counts.crossJoin(broadcast(scale))
      .select(col(stratumCol), expr("__w * __k div __n").as("__grid"))
    df.join(broadcast(grids), Seq(stratumCol))
      .filter(pmod(TextOps.hash64(
        concat(col(idCol).cast("string"), lit("#" + salt))), lit(10000L)) < col("__grid"))
      .drop("__grid")
  }

  /**
   * Epoch-based source upsampling — the REPLICATION side of corpus mixing
   * (where [[stratifiedSample]]/[[mixtureSample]] select or drop, this one
   * repeats): a stratum with weight w contributes floor(w) full epochs of
   * its rows plus a deterministic hash-selected (w − floor(w)) fraction one
   * extra time — the epochs-per-source discipline of pretraining mixes,
   * where high-quality sources are seen several times per data pass.
   * Weights are exact parts-per-10000 (25000 = 2.5 epochs); strata absent
   * from `epochs10k` (or weighted 0) are dropped.
   *
   * Output rows carry `epoch` (0-based copy index), so (id, epoch) is
   * unique and downstream packing/shuffling treats each copy as a distinct
   * sample. Copy counts are a pure per-row function of (id, weights) —
   * integer arithmetic plus the same hash grid as the samplers, so any
   * engine replays the exact multiset. A narrow map + generator: no
   * shuffle at all, rows fan out at most ceil(w)×.
   */
  def upsampleEpochs(df: DataFrame, idCol: String, stratumCol: String,
      epochs10k: Map[String, Int], salt: String = "epoch"): DataFrame = {
    require(epochs10k.nonEmpty && epochs10k.values.forall(_ >= 0),
      s"epoch weights must be non-negative parts-per-10000: $epochs10k")
    val eExpr = epochs10k.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (s, e)) =>
        when(col(stratumCol) === s, lit(e.toLong)).otherwise(acc)
    }
    val h = pmod(TextOps.hash64(
      concat(col(idCol).cast("string"), lit("#" + salt))), lit(10000L))
    df.withColumn("__e", eExpr).filter(col("__e").isNotNull)
      .withColumn("__n", expr("__e div 10000") +
        when(h < col("__e") % 10000, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__e", "__n")
  }

  /**
   * Token-budget shard packing: documents are laid out in id order and cut
   * into shards of ~`budget` tokens (a doc belongs to the shard its
   * EXCLUSIVE prefix token sum falls in, so shards are contiguous id ranges
   * and every shard except the last holds >= budget only if a single doc
   * overflows it — the classic greedy layout for sequence-packing input).
   *
   * Scale: with no `partitionCols` the running sum is a single global sort —
   * fine for a driver-side manifest, wrong for 100 TB. Pass partition
   * columns (writer task, date, language...) to pack independently within
   * each partition: the window then shuffles once on the partition key and
   * sorts per partition, fully parallel.
   */
  def packShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val base =
      if (partitionCols.isEmpty) Window.orderBy(col(idCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(idCol))
    val w = base.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard",
        floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / lit(budget))
          .cast("long"))
  }

  /**
   * Fixed-size overlapping token windows — the context-packing step that
   * turns variable-length documents into training-length chunks: window i
   * covers words [i·stride, i·stride + window) of the normalized text
   * (overlap = window − stride), the final window truncating at the end of
   * the document. A document shorter than one window yields exactly one
   * chunk. `chunk_hash` (md5 of the chunk text) pins content without
   * materializing long strings downstream.
   *
   * Scale: per-row arithmetic only — word split, a per-row sequence of
   * O(len/stride) chunk indices, one generator; no aggregation or join
   * shuffle. The one exchange is the explicit `Spread.byKey` repartition
   * that opens parallelism before the row-multiplying explode (a few-file
   * input would otherwise chunk on a handful of cores). Chunk identity
   * (doc_id, chunk_id) is deterministic by construction, so incremental
   * rebuilds produce byte-identical chunking.
   */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs.select(col(idCol).as("doc_id"), TextOps.wordsOf(col(textCol)).as("w"))
      .transform(graft.Spread.byKey(_, col("doc_id")))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0, (greatest(size(w) - $window, 0) + $stride - 1) div $stride)")))
      .withColumn("chunk",
        concat_ws(" ", slice(col("w"), col("chunk_id") * stride + 1, lit(window))))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        size(slice(col("w"), col("chunk_id") * stride + 1, lit(window)))
          .cast("long").as("n_tokens"),
        md5(col("chunk")).as("chunk_hash"))
  }
}
