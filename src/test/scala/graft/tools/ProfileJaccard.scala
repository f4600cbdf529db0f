package graft.tools

import graft.functions.{HashFunctions, TextFunctions}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(s, d)
    val sh = docs
      .withColumn("toks_", TextFunctions.tokens(col("text")))
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("toks_"), 3)).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val ex = sh.select(col("id"), col("n_sh"), explode(col("shingles")).as("shingle"))
      .select(col("id"), col("n_sh"), HashFunctions.hash64(col("shingle")).as("shk"))
    time("explode+hash")(ex.write.format("noop").mode("overwrite").save())
    val l = ex.select(col("shk"), col("id").as("a"), col("n_sh").as("na"))
    val r = ex.select(col("shk"), col("id").as("b"), col("n_sh").as("nb"))
    val joined = l.join(r, "shk").where(col("a") < col("b"))
    time("join")(joined.write.format("noop").mode("overwrite").save())
    val grouped = joined.groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    time("group")(grouped.write.format("noop").mode("overwrite").save())
    time("preview5000") {
      TextFunctions.withContentPreview(docs, "text", "preview", 150)
        .select("doc_id", "preview").write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
