package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the sparse-cosine pipeline, plus A/B of the
  * df-cap shapes (window vs aggregate+broadcast-anti) and the norm
  * attachment shapes (two pair-table joins vs carried through the term
  * join). `sbt "Test/runMain graft.tools.ProbeSparse2"` */
object ProbeSparse2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE2 $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def tfWindow(): DataFrame = {
      val staged = docs.select(col("doc_id").as("id"),
        TextFunctions.tokens(lower(col("text"))).as("toks_"))
      staged.select(col("id"),
          explode(TextFunctions.shinglesFromTokens(col("toks_"), 2)).as("term"))
        .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("df_", count(lit(1)).over(Window.partitionBy(col("term"))))
        .where(col("df_") <= 300).drop("df_")
    }

    def tfAgg(): DataFrame = {
      val staged = docs.select(col("doc_id").as("id"),
        TextFunctions.tokens(lower(col("text"))).as("toks_"))
      val tfAll = staged.select(col("id"),
          explode(TextFunctions.shinglesFromTokens(col("toks_"), 2)).as("term"))
        .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      val hot = tfAll.groupBy(col("term")).agg(count(lit(1)).as("df_"))
        .where(col("df_") > 300).select(col("term"))
      tfAll.join(broadcast(hot), Seq("term"), "left_anti")
    }

    for (rnd <- 1 to 2) {
      time(s"r$rnd tf-window build+count") { tfWindow().write.format("noop").mode("overwrite").save() }
      time(s"r$rnd tf-agg build+count") { tfAgg().write.format("noop").mode("overwrite").save() }

      val tf = tfWindow().persist()
      time(s"r$rnd tf persist") { tf.count() }
      time(s"r$rnd pairs join+dot") {
        val l = tf.select(col("term"), col("id").as("a"), col("tf").as("tfa"))
        val r = tf.select(col("term"), col("id").as("b"), col("tf").as("tfb"))
        l.join(r, "term").where(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("tfa") * col("tfb")).as("dot"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$rnd pairs join+dot xxh64") {
        val tfh = tf.select(xxhash64(col("term")).as("th"), col("id"), col("tf")).persist()
        tfh.count()
        val l = tfh.select(col("th"), col("id").as("a"), col("tf").as("tfa"))
        val r = tfh.select(col("th"), col("id").as("b"), col("tf").as("tfb"))
        l.join(r, "th").where(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("tfa") * col("tfb")).as("dot"))
          .write.format("noop").mode("overwrite").save()
        tfh.unpersist(true)
      }
      time(s"r$rnd full (norm joins)") {
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
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$rnd full (norms carried)") {
        val norms = tf.groupBy(col("id"))
          .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("norm"))
        val tfn = tf.join(broadcast(norms), "id")
        val l = tfn.select(col("term"), col("id").as("a"), col("tf").as("tfa"), col("norm").as("na"))
        val r = tfn.select(col("term"), col("id").as("b"), col("tf").as("tfb"), col("norm").as("nb"))
        l.join(r, "term").where(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(sum(col("tfa") * col("tfb")).as("dot"),
            first(col("na")).as("na"), first(col("nb")).as("nb"))
          .withColumn("cosine", round(col("dot").cast("double") / (col("na") * col("nb")), 6))
          .where(col("cosine") >= 0.3)
          .write.format("noop").mode("overwrite").save()
      }
      tf.unpersist(true)
    }
    s.stop()
  }
}
