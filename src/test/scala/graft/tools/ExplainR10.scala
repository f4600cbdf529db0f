package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the round-10 changes (the ExplainAudit pattern):
  * the oriented k-truss support join and the prefix-extended ER
  * blocking. `Test/runMain graft.tools.ExplainR10`. Asserted facts:
  *
  *  - kTrussPeel: NO CartesianProduct / BroadcastNestedLoopJoin
  *    anywhere (every join is keyed — the wedge self-join is an
  *    equi-join on the oriented source id), and the per-round
  *    localCheckpoint cuts lineage (the executed plan of the final
  *    support reads scans of checkpointed RDDs, not the whole peel).
  *  - ER scoredPairs with extended blockCols: the self-join stays an
  *    equi-join on ALL block columns (the added prefix column appears
  *    in the join keys, not as a post-filter), so candidates never
  *    form across sub-blocks.
  */
object ExplainR10 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    val truss = graft.SparkEntry.queries("graph_ktruss")(s, d)
      .queryExecution.executedPlan.toString
    val cart = truss.linesIterator.count(l =>
      l.contains("CartesianProduct") || l.contains("BroadcastNestedLoop"))
    val scans = truss.linesIterator.count(_.contains("Scan ExistingRDD"))
    println(s"AUDIT graph_ktruss cartesian=$cart checkpointScans=$scans " +
      s"joins=${truss.linesIterator.count(_.contains("Join"))}")
    assert(cart == 0, "oriented support must never plan a cartesian join")
    assert(scans >= 1, "per-round localCheckpoint must cut the peel lineage")

    val c = graft.Tables.customer(s, d)
      .withColumn("pfx", substring(col("c_name"), 10, 2))
    val er = graft.operators.EntityResolution.scoredPairs(c, "c_custkey",
      "c_name", Seq("c_nationkey", "c_mktsegment", "pfx"), minSim = 0.97)
      .queryExecution.executedPlan.toString
    val keyed = er.linesIterator.exists(l =>
      l.contains("Join") && l.contains("pfx"))
    println(s"AUDIT er_scored_pairs(prefix-sized) prefixInJoinKeys=$keyed " +
      s"cartesian=${er.linesIterator.count(_.contains("CartesianProduct"))}")
    assert(keyed, "the prefix sub-key must be a JOIN key, not a filter")
    println("EXPLAIN_R10 OK")
    s.stop()
  }
}
