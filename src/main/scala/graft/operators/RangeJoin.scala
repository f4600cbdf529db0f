package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: fact rows with a point value against a table of
  * [lo, hi) intervals. Spark plans a raw `v >= lo AND v < hi` join as a
  * broadcast nested loop — O(|fact|·|ranges|) compares, which dies when the
  * range table stops being tiny.
  *
  * The scale form here is equi-bucketing: each interval explodes into the
  * fixed-width buckets it overlaps, each fact row hashes to its single
  * bucket, and the join becomes a plain HASH equi-join on the bucket id
  * plus a residual interval check. Cost is O(|fact| + |ranges|·span/width)
  * with shuffle/broadcast/AQE machinery all available — the standard trick
  * (cf. interval binning in genomics joins and Databricks' range-join
  * optimization).
  */
object RangeJoin {

  /** Inner join of `fact` to every interval containing `valueCol`
    * (lo inclusive, hi exclusive). `bucketWidth` trades replication of the
    * ranges table (span/width copies per interval) against residual-filter
    * selectivity — pick roughly the median interval width.
    */
  def pointInInterval(
      fact: DataFrame,
      valueCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    // hi is exclusive, but an interval ending exactly on a boundary still
    // explodes into that last bucket — the residual filter removes the
    // one-off; correctness never depends on the bucketing
    val exploded = ranges.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val bucketed = fact.withColumn("_bucket",
      floor(col(valueCol) / w).cast("long"))
    bucketed.join(exploded, Seq("_bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }

  /** Interval-OVERLAP join: both sides are [lo, hi) intervals; a pair
    * joins when the intervals intersect (aLo < bHi AND bLo < aHi). The
    * naive theta-join is a nested loop; here BOTH sides explode into the
    * fixed-width buckets they cover and the join is a hash equi-join on
    * the bucket id plus the residual overlap check.
    *
    * De-duplication without a distinct: a pair overlapping k shared
    * buckets would surface k times, so each pair is attributed ONLY to
    * the FIRST bucket the two intervals share — max(floor(aLo/w),
    * floor(bLo/w)) — a per-row predicate, no extra shuffle (the standard
    * reporting trick in binned spatial joins).
    *
    * Column names must be disjoint across `a` and `b` (alias before
    * calling). At 100 TB: cost O(|a|·spanA/w + |b|·spanB/w) exploded
    * rows through one equi-shuffle; pick `bucketWidth` near the median
    * interval width, and salt hot buckets via [[SkewJoin]] if one time
    * window dominates.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("_bucket", explode(sequence(
        floor(col(lo) / w).cast("long"),
        floor(col(hi) / w).cast("long"))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("_bucket"))
      .where(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .where(col("_bucket") ===
        greatest(floor(col(aLo) / w), floor(col(bLo) / w)).cast("long"))
      .drop("_bucket")
  }
}
