package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall@10 sweep over PQ configs at sf0.01: subspace count × Lloyd
  * rounds × ADC scoring rule (mean-of-subspace-cosines vs dot/norm
  * reconstruction). Picks the config for the refined PQ recall gate. */
object ProbePqRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val e = graft.Tables.embeddings(spark, d)
    val qv = e.where(col("vec_id") === 0L).select(col("embedding"))
      .collect()(0).getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id", qv, k = 10)
      .select("vec_id").as[Long].collect().toSet

    def recall(m: Int, cb: Int, iters: Int, dotNorm: Boolean): Double = {
      val codebook = Similarity.pqTrain(e, "embedding", "vec_id", m, cb, 64, iters)
      val enc = Similarity.pqEncode(e, "embedding", "vec_id", codebook, m, 64)
      val subLen = 64 / m
      val tier: Set[Long] =
        if (!dotNorm)
          Similarity.pqAdcSearch(enc, "vec_id", codebook, qv, k = 10, m = m)
            .select("vec_id").as[Long].collect().toSet
        else {
          // dot/norm reconstruction driver-side (cb small): score =
          // sum_s dot(q_s, c_s) / (|q| * sqrt(sum_s |c_s|^2))
          val cbMap = codebook.map { case (s, c, v) => (s, c) -> v }.toMap
          val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
          val codes = enc.collect().map { r =>
            val id = r.getLong(0)
            val cs = (0 until m).map(i => r.getInt(i + 1))
            var dot = 0.0; var nrm = 0.0
            for (s <- 0 until m) {
              val cv = cbMap((s, cs(s)))
              val qs = qv.slice(s * subLen, (s + 1) * subLen)
              dot += qs.zip(cv).map { case (a, b) => a * b }.sum
              nrm += cv.map(x => x * x).sum
            }
            id -> (if (nrm == 0) 0.0 else dot / (qn * math.sqrt(nrm)))
          }
          codes.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
        }
      tier.intersect(exact).size / 10.0
    }

    for (m <- Seq(4, 8, 16); iters <- Seq(1, 2); dn <- Seq(false, true)) {
      val r = recall(m, 16, iters, dn)
      println(f"PQRECALL m=$m cb=16 iters=$iters dotnorm=$dn recall=$r%.2f bytes=${m}")
    }
    spark.stop()
  }
}
