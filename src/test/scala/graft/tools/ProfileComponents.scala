package graft.tools

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does dedup_components time go: signature, pairs, or the loop? */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (i <- 1 to 2) {
      val dd = graft.Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val sig = Dedup.minhashSignature(dd, "text", "doc_id", numHashes = 4)
      t(s"sig#$i") { sig.write.format("noop").mode("overwrite").save() }
      val pairs = Dedup.minhashCandidatePairs(sig, "doc_id", 4, 2)
      t(s"pairs#$i") { pairs.write.format("noop").mode("overwrite").save() }
      val cc = t(s"loop#$i") {
        Components.connectedComponents(dd.select(col("doc_id").as("id")), pairs)
      }
      t(s"materialize#$i") {
        cc.orderBy(col("id")).write.format("noop").mode("overwrite").save()
      }
      println(s"PROF pairs_count#$i " + pairs.count())
    }
    s.stop()
  }
}
