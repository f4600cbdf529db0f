package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. non-shuffle-join paths) or when one key
  * dominates so heavily that a single task would own it.
  *
  * WHEN TO PREFER AQE (measured head-to-head in SkewJoinAqeSpec): a plain
  * shuffled equi-join whose consumer imposes no distribution requirement —
  * AQE splits the oversized partition at runtime with result parity and
  * zero code. The manual salt is still required when:
  *   - the consumer REUSES the join's partitioning (groupBy on the join
  *     key): AQE declines the split rather than break the downstream
  *     distribution requirement (asserted in the spec);
  *   - the skew is in AGGREGATION state, not a join — AQE never splits
  *     aggregation; the salted two-level fold does;
  *   - the join runs inside stateful Structured Streaming (AQE disabled);
  *   - the layout must stay STATICALLY co-partitioned across stages
  *     (bucketed stores).
  *
  * Left (large, skewed) rows get a random salt in [0, buckets); right
  * (smaller) rows are replicated `buckets` times. The join key becomes
  * (key, salt), spreading each hot key over `buckets` tasks. Results are
  * identical to the unsalted join — salting only changes partitioning.
  *
  * At 100 TB: salt only the hot keys (`hotKeys` list from a cheap
  * pre-aggregation) and leave the long tail unsalted, so the right side
  * is replicated just for the handful of keys that need it.
  */
object SkewJoin {

  /** Full salting: every left row salted, entire right side replicated.
    *
    * Sizing rule: `buckets` ≈ ceil(rows-of-hottest-key / target-rows-per-
    * task) — enough to split the hottest key across tasks, no more (every
    * extra bucket replicates the whole right side once). [[bucketsFor]]
    * computes this from key statistics.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val salted = left.withColumn("salt_", (rand(42) * buckets).cast("int"))
    val replicated = right.withColumn("salt_",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "salt_")).drop("salt_")
  }

  /** Selective salting: only `hotKeys` are salted/replicated; the tail
    * joins normally. One union of two joins, same results as a plain join.
    */
  def saltedEquiJoinHot(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any], buckets: Int): DataFrame = {
    val isHot: Column = col(key).isin(hotKeys: _*)
    val hot = saltedEquiJoin(left.where(isHot), right.where(isHot), key, buckets)
    val cold = left.where(!isHot).join(right.where(!isHot), Seq(key))
    // align column order for the union
    hot.select(cold.columns.map(col): _*).unionByName(cold)
  }

  /** Hot-key detection: keys whose row share exceeds `threshold`. Runs as
    * one combiner-heavy aggregation over the large side.
    *
    * A SHARE threshold self-bounds the result: at most 1/threshold keys
    * can each hold more than `threshold` of the rows, so the hot list
    * stays a tiny in-predicate at any corpus size — but only if
    * `threshold` is a few percent or more. Sub-1e-3 thresholds stop
    * meaning "hot" (they match merely above-average keys by the
    * thousands); for absolute sizing use [[bucketsFor]] instead. */
  def hotKeys(df: DataFrame, key: String, threshold: Double): Seq[Any] = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .where(col("n") > total * threshold)
      .select(col(key)).collect().map(_.get(0)).toSeq
  }

  /** Derive `buckets` from input statistics instead of guessing: the
    * hottest key's row count divided by the target task size, clamped to
    * [1, maxBuckets]. One aggregation job over the skewed side.
    */
  def bucketsFor(df: DataFrame, key: String,
      targetRowsPerTask: Long = 1L << 20, maxBuckets: Int = 256): Int = {
    require(targetRowsPerTask >= 1 && maxBuckets >= 1)
    val hottest = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0)
    if (hottest.isNullAt(0)) 1
    else {
      val b = (hottest.getLong(0) + targetRowsPerTask - 1) / targetRowsPerTask
      math.min(math.max(b, 1L), maxBuckets.toLong).toInt
    }
  }
}
