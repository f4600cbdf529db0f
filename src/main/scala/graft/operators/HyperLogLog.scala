package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) with a DETERMINISTIC md5-derived
  * hash and all-integer register construction — the second member of the
  * oracle-exact sketch family next to [[CountMin]]. Engine-native HLL++
  * (`approx_count_distinct`) is implementation-defined and cannot be
  * oracle-checked; this one can, because every piece is pinned:
  *
  *   - hash = top 60 bits of md5 (the engine-portable
  *     [[HashFunctions.hash64]] family);
  *   - bucket = top `p` bits (integer div by 2^(60−p));
  *   - rho = leading-zero rank of the remaining width = 60−p bits,
  *     computed as `width + 1 − bitlen(w)` with bitlen a SUM OF INTEGER
  *     COMPARISONS against power-of-two literals (no log2 — libm is not
  *     correctly rounded, integer compares are engine-identical);
  *   - register = max(rho) per bucket — max is order-independent, so the
  *     register table is bit-identical under any partitioning;
  *   - the harmonic sum Σ 2^−reg is carried as the INTEGER
  *     S = Σ 2^(width+1−reg): with p = 6 the max is 64·2^55 = 2^61 < 2^63,
  *     so the only floating-point ops in the whole estimate are one exact
  *     power-of-two scale of the alpha constant, one correctly-rounded
  *     int→double conversion, and ONE division — identical on any IEEE
  *     engine.
  *
  * No small-range (linear-counting) correction: it needs ln(), which is
  * libm. The audit emits `v_empty` (zero registers) so a consumer can
  * apply their own correction off-engine; the gate keys sit in the raw-HLL
  * regime (n/m ≈ 30) where the correction would not fire anyway.
  *
  * Reference anchor: the reference has no sketches; this extends the
  * profiling family (X64/X65/X147) with the NDV member — "distinct users
  * per partition" over 100 TB without a count-distinct shuffle.
  *
  * Physical shape at 100 TB: the build is ONE combiner-heavy aggregation
  * to groups × m register cells (map-side max absorbs hot keys — the
  * sketch is skew-immune since registers, not keys, are the groups); a
  * group's sketch is m longs, so merges and estimates never shuffle data.
  * Because max is idempotent AND commutative, folds are replay-idempotent:
  * a re-delivered micro-batch cannot corrupt the store (strictly stronger
  * than CMS's additive fold, which leans on exactly-once batch ids).
  */
object HyperLogLog {

  /** Registers per sketch: m = 2^P = 64; alpha_64 = 0.709 (Flajolet
    * Fig. 3). Width = 60 − P hash bits feed rho; rho ∈ [1, width+1].
    */
  val P = 6
  val M: Int = 1 << P
  val Width: Int = 60 - P
  private val Alpha64 = 0.709

  /** Numerator alpha·m²·2^(width+1) built by EXACT power-of-two scaling
    * of the 0.709 literal — a single double, identical on any engine
    * that parses decimal literals correctly rounded.
    */
  private val EstNumerator: Double =
    Alpha64 * M * M * math.pow(2.0, Width + 1).toLong.toDouble

  private def pow2(i: Int): Long = 1L << i

  /** bitlen(w) for w < 2^width as a static integer-comparison tree. */
  private def bitlen(w: Column): Column =
    (0 until Width).map(i => when(w >= pow2(i), 1).otherwise(0))
      .reduce(_ + _)

  /** Per-group register table: (groupCols..., bucket, reg). Missing
    * buckets mean register 0. One combiner-heavy aggregation.
    */
  def build(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val h = HashFunctions.hash64(col(keyCol).cast("string"))
    val w = h % pow2(Width)
    val bucket = (h / pow2(Width)).cast("long")
    val rho = lit(Width + 1) - bitlen(w)
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Raw-HLL estimate per group from a register table: (groupCols...,
    * est, v_empty). S = Σ 2^(width+1−reg) over present registers plus
    * 2^(width+1) per absent one — an int64 sum; est = numerator / S.
    */
  def estimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    // reg ∈ [1, width+1] so the shift is 0..width — stays in int64
    val scaled = expr(s"shiftleft(CAST(1 AS BIGINT), ${Width + 1} - reg)")
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(scaled).as("s_present"), count(lit(1)).as("n_present"))
      .select(groupCols.map(col) :+
        round(lit(EstNumerator) /
          (col("s_present") + (lit(M) - col("n_present")) * pow2(Width + 1))
            .cast("double"), 4).as("est") :+
        (lit(M) - col("n_present")).cast("long").as("v_empty"): _*)
  }

  /** Estimate vs exact NDV per group — the calibration artifact that
    * tells a deployment whether m fits its cardinality band. Output:
    * (group, true_ndv, est, v_empty, rel_err).
    */
  def audit(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val est = estimate(build(df, keyCol, Seq(groupCol)), Seq(groupCol))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("true_ndv"))
    est.join(exact, groupCol)
      .select(col(groupCol), col("true_ndv"), col("est"), col("v_empty"),
        round((col("est") - col("true_ndv")) / col("true_ndv"), 4)
          .as("rel_err"))
  }
}
