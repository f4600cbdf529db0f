package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) with a DETERMINISTIC
  * md5-derived hash family — the one member of the sketch family whose
  * output is oracle-exact across engines (HLL++/t-digest internals are
  * implementation-defined; a CMS cell is just an integer sum under a pinned
  * hash, so two engines agree bit-for-bit).
  *
  * Reference anchor: the reference has no sketches; this extends the
  * profiling family (X64/X65) with the frequency-sketch member a 100 TB
  * pipeline uses for heavy-hitter screens without a full groupBy.
  *
  * Physical shape at 100 TB: the build is ONE combiner-heavy aggregation to
  * depth × width cells (map-side combine absorbs hot keys — the sketch is
  * skew-IMMUNE by construction since cells, not keys, are the groups); the
  * result is broadcast-sized by definition (e.g. 4×1024 longs), so
  * estimation joins broadcast the sketch, never shuffle the data.
  */
object CountMin {

  /** Depth-row bucket hash: row `d`'s independent member of the family. */
  private def bucket(c: Column, d: Int, width: Int): Column =
    pmod(HashFunctions.hash64(c.cast("string"), seed = d), lit(width.toLong))

  /** Build the sketch: (d, bucket, cnt) rows — depth × width cells at
    * most, missing cells mean zero. One explode-free aggregation pass:
    * each input row contributes to `depth` cells via a tiny inline array.
    */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2)
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), bucket(col(keyCol), d, width).as("bucket"))): _*)
    df.select(explode(cells).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the count of every distinct key in `keys`: the CMS
    * estimate is min over rows of the key's cell count (an overestimate,
    * never under). The sketch side broadcasts; the keys side is scanned
    * once. Output: (key, est).
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), bucket(col("key"), d, width).as("bucket"))): _*)
    keys.select(col(keyCol).as("key"))
      .distinct()
      .select(col("key"), explode(cells).as("cell"))
      .select(col("key"), col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy-hitter audit: estimate vs exact count for every distinct key —
    * the calibration artifact that tells a deployment whether width/depth
    * fit its key cardinality (est − true = collision mass; ε = e/width of
    * the stream length with probability 1 − (1/e)^depth). Output:
    * (key, true_cnt, est, overcount), overcount ≥ 0 always.
    */
  def audit(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val sk = build(df, keyCol, depth, width)
    val exact = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("true_cnt"))
    estimate(sk, df, keyCol, depth, width)
      .join(exact, "key")
      .select(col("key"), col("true_cnt"), col("est"),
        (col("est") - col("true_cnt")).as("overcount"))
  }
}
