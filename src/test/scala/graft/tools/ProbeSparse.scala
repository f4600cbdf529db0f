package graft.tools

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Same-JVM A/B: sparse-cosine pair join keyed by term STRING vs 64-bit
  * term hash. `sbt "Test/runMain graft.tools.ProbeSparse"` */
object ProbeSparse {
  def pairs(docs: DataFrame, hashTerms: Boolean): DataFrame = {
    val toks = TextFunctions.tokens(lower(col("text")))
    val terms = TextFunctions.shinglesFromTokens(toks, 2)
    val ex = docs.select(col("doc_id").as("id"), explode(terms).as("term_s"))
    val keyed =
      if (hashTerms) ex.select(col("id"), HashFunctions.hash64(col("term_s")).as("term"))
      else ex.select(col("id"), col("term_s").as("term"))
    val tf = keyed.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("df_", count(lit(1)).over(Window.partitionBy(col("term"))))
      .where(col("df_") <= 300).drop("df_")
    val norms = tf.groupBy(col("id"))
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("norm"))
    val l = tf.select(col("term"), col("id").as("a"), col("tf").as("tfa"))
    val r = tf.select(col("term"), col("id").as("b"), col("tf").as("tfb"))
    l.join(r, "term").where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("tfa") * col("tfb")).as("dot"))
      .join(norms.select(col("id").as("a"), col("norm").as("na")), "a")
      .join(norms.select(col("id").as("b"), col("norm").as("nb")), "b")
      .withColumn("cosine", round(col("dot").cast("double") / (col("na") * col("nb")), 6))
      .where(col("cosine") >= 0.3)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    for (round <- 1 to 3; hashTerms <- Seq(false, true)) {
      val t0 = System.nanoTime()
      pairs(docs, hashTerms).write.format("noop").mode("overwrite").save()
      println(f"PROBE round=$round hash=$hashTerms ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
