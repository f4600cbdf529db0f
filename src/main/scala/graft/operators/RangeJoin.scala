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
}
