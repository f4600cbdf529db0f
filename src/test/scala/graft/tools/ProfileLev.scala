package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Piecewise timing of the dedup_levenshtein gate: signature job,
  * candidate-pair job, then the verify joins — run twice each, warm JVM,
  * to localize the gate's cost. */
object ProfileLev {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PIECE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (_ <- 1 to 3) {
      val dd = s.read.parquet(s"$d/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      val sig = Dedup.minhashSignature(dd, "text", "doc_id", numHashes = 4)
      timed("sig.noop") { sig.write.format("noop").mode("overwrite").save() }
      val pairs = timed("pairs.localCheckpoint") {
        Dedup.minhashCandidatePairs(sig, "doc_id", 4, 2).localCheckpoint()
      }
      timed("verify.noop") {
        Dedup.levenshteinVerify(pairs, dd, "doc_id", "text")
          .orderBy(col("a"), col("b"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("verify.noSort") {
        Dedup.levenshteinVerify(pairs, dd, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      timed("joinsOnly.noop") {
        pairs
          .join(dd.select(col("doc_id").as("a"), col("text").as("ta")), "a")
          .join(dd.select(col("doc_id").as("b"), col("text").as("tb")), "b")
          .select(col("a"), col("b"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("docsScanOnly.noop") {
        dd.select(col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
