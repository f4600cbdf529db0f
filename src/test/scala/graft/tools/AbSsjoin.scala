package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: current prefix-filter candidates vs prefix + PPJoin length
  * filter (min size >= t * max size, decimal-exact) — candidate counts
  * and end-to-end interleaved wall. One JVM.
  * `Test/runMain graft.tools.AbSsjoin <rounds>`. */
object AbSsjoin {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val minSim = 0.5; val termK = 3
    val t = java.math.BigDecimal.valueOf(minSim)

    val docs = graft.Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val sets = docs
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks_"))
      .select(col("id"), array_distinct(
        TextFunctions.shinglesFromTokens(col("toks_"), termK)).as("terms"))
      .withColumn("sz", size(col("terms")))
      .where(col("sz") > 0)
      .withColumn("hterms", transform(col("terms"), x => xxhash64(x)))
      .persist()
    val post = sets.select(col("id"), col("sz"), explode(col("terms")).as("term"))
    val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    val pref = post.join(dft, "term")
      .withColumn("rn_", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df_"), col("term"))))
      .where(col("rn_") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1))
      .select(col("term"), col("id"), col("sz"))
      .localCheckpoint()

    val candA = pref.select(col("term"), col("id").as("a"))
      .join(pref.select(col("term"), col("id").as("b")), "term")
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val candB = pref.select(col("term"), col("id").as("a"), col("sz").as("sa_"))
      .join(pref.select(col("term"), col("id").as("b"), col("sz").as("sb_")), "term")
      .where(col("a") < col("b") &&
        least(col("sa_"), col("sb_")).cast("decimal(20,0)") >=
          lit(t) * greatest(col("sa_"), col("sb_")).cast("decimal(20,0)"))
      .select(col("a"), col("b")).distinct()
    println(s"CAND no-length=${candA.count()}  with-length=${candB.count()}")

    def verify(cand: DataFrame): DataFrame = cand
      .join(sets.select(col("id").as("a"), col("hterms").as("ta_"),
        col("sz").as("sa_")), "a")
      .join(sets.select(col("id").as("b"), col("hterms").as("tb_"),
        col("sz").as("sb_")), "b")
      .withColumn("inter_", size(array_intersect(col("ta_"), col("tb_"))))
      .withColumn("jac_", col("inter_").cast("double") /
        (col("sa_") + col("sb_") - col("inter_")))
      .where(col("jac_") >= minSim)
      .select(col("a"), col("b"), round(col("jac_"), 6).as("jaccard"))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(verify(candA)); time(verify(candB)) // warm
    var mA = Double.MaxValue; var mB = Double.MaxValue
    (1 to rounds).foreach { _ =>
      mA = math.min(mA, time(verify(candA)))
      mB = math.min(mB, time(verify(candB)))
    }
    // result-identity check: symmetric difference must be empty
    val ra = verify(candA); val rb = verify(candB)
    val diff = ra.unionAll(rb).groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c")).where(col("c") =!= 2).count()
    println(f"AB ssjoin candverify  nolen=$mA%6.2f  len=$mB%6.2f  ratio=${mB / mA}%.2f  resultDiff=$diff")
    s.stop()
  }
}
