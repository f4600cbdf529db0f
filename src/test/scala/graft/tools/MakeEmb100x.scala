package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12: embeddings-only 100× scale point for the NSW traversal probe
  * (ScaleUp's full-table replication is overkill when only the vector
  * corpus matters). Same decorrelation rule as ScaleUp post-r11: copy k
  * rotates components by (k mod 63) + reflects on (k / 63) parity, so
  * copies ≤ 126 stay pairwise-decorrelated; ids stride-offset.
  */
object MakeEmb100x {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 100
    val out = if (args.length > 1) args(1)
      else "/root/repo/target/scale/emb100x"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val base = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val S = 10000000L
    (0 until copies).grouped(10).zipWithIndex.foreach { case (ks, i) =>
      val chunk = ks.map { k =>
        val rot = k % 63
        val refl = (k / 63) % 2 == 1
        val rotated = expr(
          s"concat(slice(embedding, ${rot + 1}, ${64 - rot}), slice(embedding, 1, $rot))")
        val vec = if (refl)
          expr(s"transform($rotated, x -> -x)") else rotated
        base.select((col("vec_id") + lit(k * S)).as("vec_id"),
          vec.cast("array<float>").as("embedding"))
      }.reduce(_ unionByName _)
      chunk.write.mode(if (i == 0) "overwrite" else "append")
        .parquet(s"$out/embeddings.parquet")
    }
    println("MADE " + s.read.parquet(s"$out/embeddings.parquet").count())
    s.stop()
  }
}
