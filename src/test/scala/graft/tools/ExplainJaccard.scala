package graft.tools

import graft.functions.{HashFunctions, TextFunctions}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ExplainJaccard {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(s, "/root/testdata/sf0.01")
    val sh = docs
      .withColumn("toks_", TextFunctions.tokens(col("text")))
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("toks_"), 3)).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val ex = sh.select(col("id"), col("n_sh"), explode(col("shingles")).as("shingle"))
      .select(col("id"), col("n_sh"), HashFunctions.hash64(col("shingle")).as("shk"))
    println("PLAN_START")
    ex.explain("formatted")
    println("PLAN_END")
    s.stop()
  }
}
