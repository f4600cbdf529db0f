package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Honest-regime A/B for dedup_ssjoin_prefix's internal materialization:
  * under the r13 cache-release rule every gate run starts cache-cold, so
  * the lazy `sets.persist()` is populated DURING the one action — and
  * racing consumer stages can re-run the tokenize→shingle→hash pipeline.
  * Arms: shipped (persist), sets eagerly checkpointed, sets + prefix
  * postings checkpointed. Cache cleared before every run (exactly what
  * Bench now does); results cross-checked.
  * `Test/runMain graft.tools.AbSsjoinCkptR13 <reps>`
  */
object AbSsjoinCkptR13 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (minSim, termK) = (0.5, 3)

    def docs(): DataFrame = graft.Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)

    def pairs(mode: String): DataFrame = {
      if (mode == "shipped")
        return graft.operators.SetSimJoin.jaccardPairs(docs(), "text",
          "doc_id", minSim = minSim, termK = termK)
          .orderBy(col("a"), col("b"))
      val t = java.math.BigDecimal.valueOf(minSim)
      // the r12 shape: the sz filter on the DERIVED terms column — the
      // optimizer pushes it below the projection and inlines the token
      // pipeline into the HOF lambda (O(tokens^2) per doc)
      val sets0 = docs()
        .select(col("doc_id").as("id"),
          TextFunctions.tokens(col("text")).as("toks_"))
        .select(col("id"), array_distinct(
          TextFunctions.shinglesFromTokens(col("toks_"), termK)).as("terms"))
        .withColumn("sz", size(col("terms")))
        .where(col("sz") > 0)
        .withColumn("hterms", transform(col("terms"), x => xxhash64(x)))
      val sets = mode match {
        case "persist" => sets0.persist()
        case _ => sets0.localCheckpoint()
      }
      // (historical arms; see also "shipped" below)
      val post = sets.select(col("id"), col("sz"), explode(col("terms")).as("term"))
      val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df_"))
      val pref0 = post.join(dft, "term")
        .withColumn("rn_", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df_"), col("term"))))
        .where(col("rn_") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1))
        .select(col("term"), col("id"))
      val pref = if (mode == "ckpt2") pref0.localCheckpoint() else pref0
      val cand = pref.select(col("term"), col("id").as("a"))
        .join(pref.select(col("term"), col("id").as("b")), "term")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"))
        .distinct()
      cand
        .join(sets.select(col("id").as("a"), col("hterms").as("ta_"),
          col("sz").as("sa_")), "a")
        .join(sets.select(col("id").as("b"), col("hterms").as("tb_"),
          col("sz").as("sb_")), "b")
        .withColumn("inter_", size(array_intersect(col("ta_"), col("tb_"))))
        .withColumn("jac_", col("inter_").cast("double") /
          (col("sa_") + col("sb_") - col("inter_")))
        .where(col("jac_") >= minSim)
        .select(col("a"), col("b"), round(col("jac_"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    }

    def clear(): Unit = s.sharedState.cacheManager.clearCache()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // cross-check
    val base = pairs("persist").collect(); clear()
    for (m <- Seq("ckpt", "ckpt2", "shipped")) {
      val c = pairs(m).collect(); clear()
      println(s"CHECK $m rows=${c.length} base=${base.length} " +
        (if (c.map(_.toString).sameElements(base.map(_.toString))) "IDENTICAL"
         else "MISMATCH"))
    }
    val arms = Seq("persist", "shipped")
    val mins = collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    for (i <- 1 to reps; m <- arms) {
      clear()
      val t0 = System.nanoTime()
      noop(pairs(m))
      val dt = (System.nanoTime() - t0) / 1e9
      mins(m) = math.min(mins(m), dt)
      println(f"ARM rep$i $m%-8s $dt%6.2f s")
    }
    println("SUMMARY " + arms.map(m => f"$m=${mins(m)}%.2f").mkString("  "))
    s.stop()
  }
}
