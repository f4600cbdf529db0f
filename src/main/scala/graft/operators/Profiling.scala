package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE-style artifacts a pipeline's health
  * checks read: per-column statistics and statistics-driven value
  * histograms. Both are one-pass, combiner-heavy shapes that hold at any
  * scale; both exist in the reference's world as Qdrant collection
  * telemetry (point counts, payload-index cardinalities) and here become
  * first-class queries.
  */
object Profiling {

  /** Long-form column profile: one row per requested column with
    * `(column, n_rows, n_nulls, n_distinct, min_str, max_str)`.
    *
    * ONE pass over the data: every per-column aggregate evaluates inside
    * a single `agg` (Spark plans the multiple DISTINCT aggregates with
    * one Expand over the scan — at 100 TB swap `countDistinct` for
    * `approx_count_distinct` and the Expand disappears, same plan
    * otherwise). The single aggregated row is unpivoted plan-side with
    * `stack`, never collected. min/max stringify via CAST — callers
    * profiling double columns whose magnitude crosses 1e7 should
    * pre-format them (engines disagree on scientific notation there).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"dst_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows_"), aggs: _*)
    val stacked = cols.map(c =>
      s"'$c', n_rows_, n_rows_ - cnt_$c, dst_$c, min_$c, max_$c").mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stacked) AS (column, n_rows, n_nulls, n_distinct, min_str, max_str)"))
  }

  /** Equi-width value histogram per group with statistics-driven bounds:
    * `buckets` bins over the column's observed [min, max], the top edge
    * closed (a max-valued row lands in the last bin via `least`). Bounds
    * come from one min/max aggregate (two doubles to the driver); the
    * binning itself is a pure per-row Column tree and the only shuffle is
    * the (group, bucket) count — uniform keys, combiner-heavy. NULL
    * values are excluded (they are the profiler's `n_nulls`, not a bin).
    */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1)
    val b = df.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).collect()(0)
    require(!b.isNullAt(0), "histogram: no non-null values")
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val w = (hi - lo) / buckets
    val bucket =
      if (w == 0.0) lit(0) // constant column: everything in bin 0
      else least(floor((col(valueCol).cast("double") - lit(lo)) / lit(w)),
        lit(buckets - 1)).cast("int")
    df.where(col(valueCol).isNotNull)
      .withColumn("bucket", bucket)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
