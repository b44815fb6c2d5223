package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join — the manual skew weapon for the case AQE cannot fix:
 * a shuffled join whose LEFT side floods a handful of keys (one customer =
 * 30% of events) while the RIGHT side is too big to broadcast outright but
 * small per key. AQE's skew-join splits oversized SORT-MERGE partitions at
 * runtime, but when a single KEY exceeds what one task can sort, or the
 * join must be shuffled-hash, pre-salting is still the tool the runtime
 * cannot synthesize.
 *
 * Mechanics: the left side appends a deterministic salt in [0, factor)
 * hashed from the WHOLE ROW (so the same logical row always lands on the
 * same salted partition — reproducible plans, no RNG); the right side is
 * replicated `factor`× with every salt value. The join key becomes
 * (key, salt): each formerly-hot key now spreads over `factor` reducers.
 * Cost: right-side shuffle volume × factor — worth it exactly when the hot
 * key's row count ≫ right's total size × factor.
 *
 * Result equality with the plain join is an algebraic identity (each left
 * row meets each matching right row exactly once — for its own salt), and
 * the spec pins it on data.
 */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `factor` ways.
    * Output columns: left's then right's (minus right's key), like a plain
    * `left.join(right, key)`. */
  def join(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 2, s"salt factor must be >= 2, got $factor")
    val saltCol: Column =
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(factor.toLong))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
