package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters — the frequent-items sketch whose guarantee
  * (not whose counts) is deterministic: after ONE pass with k counters,
  * every item with true frequency > n/(k+1) is GUARANTEED present in the
  * summary, and each retained estimate undercounts by at most n/(k+1)
  * (Misra & Gries 1982; merge rule from Agarwal et al., PODS 2012).
  *
  * The counts themselves depend on arrival/merge order, so — unlike the
  * pinned-md5 [[CountMin]]/[[HyperLogLog]]/[[Kmv]] family — they can
  * never be oracle-exact. The audit therefore follows the
  * `profile_bloom_audit` discipline: emit only ORDER-INDEPENDENT facts.
  * For every truly-frequent item (true_cnt > n div (k+1), exact side):
  * is it present in the sketch (theorem says always), and is its sketch
  * estimate within the guaranteed band 0 < true − est ≤ n/(k+1)
  * (theorem says always)? Booleans that the theorems force to TRUE are
  * deterministic even though the path producing them is not — the gate
  * proves the sketch keeps its contract on real data, which is exactly
  * what a 100 TB deployment needs to know before trusting it.
  *
  * Physical shape at 100 TB: a typed [[Aggregator]] with a k-entry map
  * buffer — map-side partials shrink every partition to ≤k (item, count)
  * entries before the shuffle, merges are size-capped (sum maps, then
  * subtract the (k+1)-th largest count from all and drop ≤0 — the
  * offset step that preserves the error bound), so the full pass over
  * any corpus moves only executors×k entries. The sketch answers "top
  * sources / domains / languages by volume" in one combiner-heavy pass
  * with NO groupBy shuffle of the raw keys.
  *
  * Reference anchor: none (the reference has no sketches); third
  * frequent-structure member next to `mine_frequent_pairs` (exact) and
  * `profile_cms_audit` (point-query estimates).
  */
object MisraGries {

  /** k-counter MG buffer as a Map; deterministic GUARANTEES, order-
    * dependent counts (see object doc). */
  class MgAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1)
        case None if buf.size < k => buf.updated(item, 1L)
        case None => // decrement-all step: drop zeros, item absorbed
          buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    /** Agarwal et al. merge: sum counts, then subtract the (k+1)-th
      * largest from every counter and drop non-positives — keeps ≤k
      * entries and the n/(k+1) bound. */
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        val off = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.view.mapValues(_ - off).filter(_._2 > 0).toMap
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** One MG sketch over `itemCol`: (item, est) rows, ≤k of them. */
  def sketch(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string")).as[String]
      .groupByKey(_ => 0)
      .agg(new MgAggregator(k).toColumn.name("mg"))
      .toDF("g", "mg")
      .select(explode(col("mg")).as(Seq("item", "est")))
  }

  /** Guarantee audit (order-independent output; see object doc): for
    * every truly-frequent item — true_cnt > thr where thr = n div (k+1)
    * — emit (item, true_cnt, thr, present, est_in_band), both booleans
    * TRUE whenever the implementation honors the MG contract. */
  def audit(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val sk = sketch(df, itemCol, k)
    val exact = df.groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("true_cnt"))
      .withColumn("n", sum(col("true_cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("thr", expr(s"n div ${k + 1}"))
      .where(col("true_cnt") > col("thr"))
    exact.join(sk, Seq("item"), "left_outer")
      .select(col("item"), col("true_cnt"), col("thr"),
        col("est").isNotNull.as("present"),
        (col("est").isNotNull && col("est") <= col("true_cnt") &&
          (col("true_cnt") - col("est")) <= col("thr")).as("est_in_band"))
  }
}
