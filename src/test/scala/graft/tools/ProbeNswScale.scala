package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** r12 scale probe: time the NSW beam traversal alone at a scale point
  * (graph built once with the shared nswGraph, which both arms share) —
  * `Test/runMain graft.tools.ProbeNswScale <dataDir> [planes]`.
  * Evidence for OPTIMIZATION_r12.md: the traversal's cost must stay
  * ~flat with corpus size (bounded state), and the old shuffle-the-
  * graph-per-round form must not.
  */
object ProbeNswScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val planes = if (args.length > 1) args(1).toInt else 8
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    println(s"PROBE n=${e.count()} planes=$planes")
    val qv = e.where(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .head().getSeq[Float](1)
    var t0 = System.nanoTime()
    val g = Similarity.nswGraph(e, "embedding", "vec_id", m = 24,
      planes = planes).localCheckpoint()
    println(f"PROBE graph_build ${(System.nanoTime() - t0) / 1e9}%.2f s (${g.count()} edges)")
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      Similarity.nswSearch(g, e, "embedding", "vec_id", qv,
        k = 10, beam = 48, rounds = 6, entryId = 1L)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE search_$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
