package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE skew-join vs the manual salt, head to head on the same skewed
  * join — the documented verdict for when [[SkewJoin]]'s machinery is
  * still worth owning (r5 verdict item #7).
  *
  * VERDICT (asserted + logged below): on a plain shuffled equi-join with
  * one dominant key and a distribution-free consumer, AQE's skew
  * handling splits the oversized partition at runtime and reaches result
  * parity with the manual salt — for THAT shape, prefer AQE and keep the
  * join declarative. The manual salt remains necessary where AQE cannot
  * reach:
  *   - a consumer that REUSES the join's partitioning (groupBy on the
  *     join key): AQE must decline the split or it would break the
  *     downstream distribution requirement — asserted below;
  *   - aggregation skew (`groupBy` on the hot key — AQE splits join
  *     partitions, never aggregation state);
  *   - streaming joins/state (AQE is disabled in stateful streaming —
  *     see ResolveWriteToStream's warning on every stream gate);
  *   - pre-partitioned/bucketed layouts where the split must be STATIC
  *     so two sides stay co-partitioned across stages;
  *   - non-shuffle paths (a broadcast side never shuffles, nothing to
  *     split).
  * SkewJoin's Scaladoc carries the same statement; this spec is the
  * executable evidence.
  */
class SkewJoinAqeSpec extends SparkSpec {

  /** one key owns half the fact side; dim side too large to broadcast
    * only by conf (we force SMJ to model the at-scale no-broadcast case) */
  private def skewed: (DataFrame, DataFrame) = {
    import spark.implicits._
    val fact = spark.range(0, 120000).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 50).cast("string"))).as("key"),
      (col("id") % 97).cast("double").as("v"))
    val dim = (Seq("hot") ++ (0 until 50).map("k" + _)).toDF("key")
      .withColumn("key_len", length(col("key")))
    (fact, dim)
  }

  private def agg(joined: DataFrame): Map[String, (Long, Double)] =
    joined.groupBy(col("key")).agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("AQE skew split reaches result parity with the manual salt; both plans shuffle-join") {
    val (fact, dim) = skewed
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // model the no-broadcast case
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // defaults target 256MB partitions; scale thresholds down so the
      // hot key's partition counts as skewed at test size
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }

      val t0 = System.nanoTime()
      val aqeDf = fact.join(dim, Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      val aqeResult = aqeDf.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val aqeSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val saltedResult = agg(SkewJoin.saltedEquiJoin(fact, dim, "key",
        SkewJoin.bucketsFor(fact, "key", targetRowsPerTask = 10000)))
      val saltSec = (System.nanoTime() - t1) / 1e9

      // parity: salting and AQE splitting are pure partitioning choices
      assert(aqeResult == saltedResult)
      assert(aqeResult("hot")._1 == 60000L)
      info(f"aqe=${aqeSec}%.2fs salted=${saltSec}%.2fs")

      // FINDING 1 (pinned): when the consumer REUSES the join's hash
      // partitioning (groupBy on the join key, zero exchange between),
      // AQE must DECLINE the skew split — splitting would break the
      // downstream distribution requirement. The hot key stays one task;
      // only the salt spreads it here.
      val reusePlan = aqeDf.queryExecution.executedPlan.toString
      assert(reusePlan.contains("isFinalPlan=true"), reusePlan.take(400))
      assert(!reusePlan.contains("skew=true"), reusePlan.take(2000))

      // FINDING 2: with no downstream distribution requirement (global
      // agg — partial aggregation is partition-local), the SAME join DOES
      // get the runtime skew split
      val freeDf = fact.join(dim, Seq("key"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val freeRow = freeDf.collect()(0)
      assert(freeRow.getLong(0) == 120000L)
      val freePlan = freeDf.queryExecution.executedPlan.toString
      assert(freePlan.contains("isFinalPlan=true"), freePlan.take(400))
      assert(freePlan.contains("skew=true"), freePlan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE cannot split AGGREGATION skew: the hot groupBy key stays one task — salt can") {
    val (fact, _) = skewed
    // per-key salted pre-aggregate then re-combine: the manual two-level
    // fold AQE has no equivalent for (it only splits join partitions)
    val pre = fact.withColumn("salt_", (rand(7) * 8).cast("int"))
      .groupBy(col("key"), col("salt_"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("s"))
    val two = pre.groupBy(col("key"))
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val one = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(two == one) // two-level fold is exact (DECIMAL sums commute)
  }
}
