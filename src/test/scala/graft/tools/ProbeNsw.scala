package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall-vs-cost sweep for the NSW tier: which knob (m, beam, rounds,
  * entry count) actually buys recall on the near-random synthetic
  * embeddings? */
object ProbeNsw {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val e = graft.Tables.embeddings(s, d)
    val qv = e.where(col("vec_id") === 0L).head().getSeq[Float](1)
    val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id", qv, 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    for ((m, beam, rounds) <- Seq((8, 8, 3), (8, 16, 3), (8, 16, 5),
        (16, 16, 3), (16, 32, 5), (24, 48, 6))) {
      val t0 = System.nanoTime()
      val g = Similarity.nswGraph(e, "embedding", "vec_id", m = m)
      val tier = Similarity.nswSearch(g, e, "embedding", "vec_id", qv,
        k = 10, beam = beam, rounds = rounds, entryId = 1L)
        .collect().map(_.getLong(0)).toSet
      val rec = (tier & exact).size / 10.0
      println(f"PROBE m=$m beam=$beam rounds=$rounds recall=$rec " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    s.stop()
  }
}
