package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** r12 probe: where does cluster_dbscan_knn_sized spend its wall —
  * candidate knn-pair stage vs the components/assign tail? */
object ProbeDbscanKnn {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      val e = graft.Tables.embeddings(s, d)
      val planes = Dedup.planesFor(e.count(), targetBucketSize = 128)
      println(s"PROBE planes=$planes round=$round")
      val pairs = t("knn_pairs") {
        Similarity.mutualKnnPairsBucketed(e, "embedding", "vec_id",
          k = 12, minCosine = 0.2, planes = planes, seeds = Seq(7, 21),
          dims = 64).select(col("a"), col("b")).localCheckpoint()
      }
      println(s"PROBE n_pairs=${pairs.count()}")
      t("full_gate") {
        graft.SparkEntry.queries("cluster_dbscan_knn_sized")(s, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
