package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase split + broadcast A/B for search_knn_graph_descent: how much of
  * the gate is the bucketed seed graph vs the two descent rounds, and
  * what do broadcast attach joins (vector store into the candidate
  * re-score; r13 hits/nsw playbook) buy on the descent side? Old and new
  * descent shapes inlined, alternated in one JVM, results cross-checked.
  * `Test/runMain graft.tools.AbDescentR13 <reps>`
  */
object AbDescentR13 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (k, minCos, dims) = (8, 0.2, 64)

    def embs(): DataFrame = graft.Tables.embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-18s $dt%6.2f s"); dt
    }

    /** descent with/without broadcast attach of the vector store and the
      * two-hop build side (the shipped r12 shape = bcast=false). */
    def descent(e: DataFrame, g0: DataFrame, bcast: Boolean): DataFrame = {
      val base = e.select(col("vec_id"), col("embedding"))
      val att: DataFrame => DataFrame = if (bcast) broadcast else identity
      var g = g0.select(col("q"), col("b"), col("s")).localCheckpoint()
      for (_ <- 1 to 2) {
        val edges = g.select(col("q"), col("b"))
        val nbr = edges.unionAll(
          edges.select(col("b").as("q"), col("q").as("b")))
        val twoHop = nbr.select(col("q"), col("b").as("m"))
          .join(att(nbr.select(col("q").as("m"), col("b"))), Seq("m"))
          .select(col("q"), col("b"))
        val cand = nbr.unionAll(twoHop)
          .where(col("q") =!= col("b")).distinct()
        // directedTopK replica (Similarity's is private): same rounding,
        // floor, tie-break
        val scored = cand
          .join(att(base.select(col("vec_id").as("q"), col("embedding").as("qv"))), Seq("q"))
          .join(att(base.select(col("vec_id").as("b"), col("embedding").as("bv"))), Seq("b"))
          .withColumn("s", round(
            graft.functions.VectorFunctions.cosine(col("qv"), col("bv"), dims), 6))
          .where(col("s") >= minCos)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q")).orderBy(col("s").desc, col("b"))
        g = scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= k)
          .select(col("q"), col("b"), col("s")).localCheckpoint()
      }
      g
    }

    // phase split
    val e = embs()
    val planes = Dedup.planesFor(e.count(), targetBucketSize = 128)
    var g0: DataFrame = null
    timed("g0_bucketed") {
      g0 = Similarity.knnGraphBucketed(e, "embedding", "vec_id",
        k = k, minCosine = minCos, planes = planes, seeds = Seq(7, 21),
        dims = dims).localCheckpoint()
      noop(g0)
    }
    timed("descent_old") { noop(descent(e, g0, bcast = false)) }
    timed("descent_new") { noop(descent(e, g0, bcast = true)) }

    val a = descent(e, g0, bcast = false).orderBy(col("q"), col("b")).collect()
    val b = descent(e, g0, bcast = true).orderBy(col("q"), col("b")).collect()
    println(s"CHECK rows old=${a.length} new=${b.length} " +
      (if (a.sameElements(b)) "IDENTICAL" else "MISMATCH"))

    var mOld, mNew = Double.MaxValue
    for (i <- 1 to reps) {
      var t0 = System.nanoTime()
      noop(descent(e, g0, bcast = false))
      val x = (System.nanoTime() - t0) / 1e9; mOld = math.min(mOld, x)
      t0 = System.nanoTime()
      noop(descent(e, g0, bcast = true))
      val y = (System.nanoTime() - t0) / 1e9; mNew = math.min(mNew, y)
      println(f"ARM rep$i old=$x%6.2f new=$y%6.2f")
    }
    println(f"SUMMARY descent old_min=$mOld%.2f new_min=$mNew%.2f")
    s.stop()
  }
}
