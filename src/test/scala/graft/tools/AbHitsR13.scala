package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the r13 Graph.hits change: per-round score joins
  * with the r12 shape (no broadcast — planner picks SMJ over the
  * checkpointed, statless score tables) vs the r13 shape (score tables
  * broadcast). Both shapes inlined so they alternate in ONE JVM; results
  * cross-checked row-for-row; the round-1 auth subtree's formatted plan
  * for each arm is dumped to plans/r13/graph_hits_round_{before,after}.txt
  * (the gate's own final plan is checkpoint-opaque — the joins run inside
  * eager per-round jobs).
  * `Test/runMain graft.tools.AbHitsR13 <reps>`
  */
object AbHitsR13 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = 1000000L
    val rounds = 2

    def edges(): DataFrame = graft.Tables.orders(s, d)
      .join(graft.Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()

    def hitsShape(bcast: Boolean, dumpRound1: Option[String]): DataFrame = {
      val attach: DataFrame => DataFrame = if (bcast) broadcast else identity
      val e = edges().localCheckpoint()
      var hub = e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(scale).as("h")).localCheckpoint()
      var auth: DataFrame = null
      var first = true
      (0 until rounds).foreach { _ =>
        val aRaw = e.join(attach(hub.withColumnRenamed("node", "src")), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a_raw"))
        val authPlan = aRaw
          .crossJoin(broadcast(aRaw.agg(max(col("a_raw")).as("a_max"))))
          .select(col("node"), expr(s"(a_raw * ${scale}L) div a_max").as("a"))
        if (first) {
          dumpRound1.foreach { path =>
            Files.write(Paths.get(path), authPlan.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
            println(s"WROTE $path")
          }
          first = false
        }
        auth = authPlan.localCheckpoint()
        val hRaw = e.join(attach(auth.withColumnRenamed("node", "dst")), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("a")).as("h_raw"))
        hub = hRaw
          .crossJoin(broadcast(hRaw.agg(max(col("h_raw")).as("h_max"))))
          .select(col("node"), expr(s"(h_raw * ${scale}L) div h_max").as("h"))
          .localCheckpoint()
      }
      auth.select(col("node"), lit("authority").as("side"), col("a").as("units"))
        .unionAll(hub.select(col("node"), lit("hub").as("side"),
          col("h").as("units")))
        .orderBy(col("side"), col("node"))
    }

    Files.createDirectories(Paths.get("plans/r13"))
    // results identical?
    val before = hitsShape(bcast = false,
      Some("plans/r13/graph_hits_round_before.txt")).collect()
    val after = hitsShape(bcast = true,
      Some("plans/r13/graph_hits_round_after.txt")).collect()
    println(s"CHECK rows before=${before.length} after=${after.length} " +
      (if (before.sameElements(after)) "IDENTICAL" else "MISMATCH"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    var mOld, mNew = Double.MaxValue
    for (i <- 1 to reps) {
      var t0 = System.nanoTime()
      noop(hitsShape(bcast = false, None))
      val a = (System.nanoTime() - t0) / 1e9; mOld = math.min(mOld, a)
      t0 = System.nanoTime()
      noop(hitsShape(bcast = true, None))
      val b = (System.nanoTime() - t0) / 1e9; mNew = math.min(mNew, b)
      println(f"ARM rep$i old=$a%6.2f new=$b%6.2f")
    }
    println(f"SUMMARY hits old_min=$mOld%.2f new_min=$mNew%.2f")
    s.stop()
  }
}
