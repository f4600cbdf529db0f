package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B + plan dumps for the r13 runLengthAudit rewrite: the
  * r12 shape paid one GLOBAL ordered window pass per value column (three
  * single-task sorts of the full table); the r13 shape carries every
  * column's lag comparison through ONE shared window pass. Both shapes
  * inlined (the shipped code is the new one), alternated in one JVM,
  * results cross-checked; formatted plans land in
  * plans/r13/store_rle_advisor_{before,after}.txt.
  * `Test/runMain graft.tools.AbRleR13 <reps>`
  */
object AbRleR13 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber")
    val valueCols = Seq("l_returnflag", "l_linestatus", "l_suppkey")

    def li: DataFrame = graft.Tables.lineitem(s, d)
    val w = Window.orderBy(orderCols.map(col): _*)

    def oldShape(): DataFrame = valueCols.map { v =>
      li.select(orderCols.map(col) :+ col(v).as("v_"): _*)
        .withColumn("chg_",
          when(col("v_") <=> lag(col("v_"), 1).over(w), 0L).otherwise(1L))
        .agg(count(lit(1)).as("n_rows"), sum(col("chg_")).as("n_runs"))
        .select(lit(v).as("value_col"), col("n_rows"), col("n_runs"),
          expr("(n_rows * 1000) div greatest(n_runs, 1L)").as("avg_run_x1000"))
    }.reduce(_ unionByName _).orderBy(col("value_col"))

    def newShape(): DataFrame =
      graft.operators.Profiling.runLengthAudit(li, orderCols, valueCols)
        .orderBy(col("value_col"))

    Files.createDirectories(Paths.get("plans/r13"))
    def dump(df: DataFrame, path: String): Unit = {
      Files.write(Paths.get(path), df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      println(s"WROTE $path")
    }
    dump(oldShape(), "plans/r13/store_rle_advisor_before.txt")
    dump(newShape(), "plans/r13/store_rle_advisor_after.txt")

    val a = oldShape().collect()
    val b = newShape().collect()
    println(s"CHECK rows old=${a.length} new=${b.length} " +
      (if (a.map(_.toString).sameElements(b.map(_.toString))) "IDENTICAL"
       else "MISMATCH"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    var mOld, mNew = Double.MaxValue
    for (i <- 1 to reps) {
      var t0 = System.nanoTime()
      noop(oldShape())
      val x = (System.nanoTime() - t0) / 1e9; mOld = math.min(mOld, x)
      t0 = System.nanoTime()
      noop(newShape())
      val y = (System.nanoTime() - t0) / 1e9; mNew = math.min(mNew, y)
      println(f"ARM rep$i old=$x%6.2f new=$y%6.2f")
    }
    println(f"SUMMARY rle old_min=$mOld%.2f new_min=$mNew%.2f")
    s.stop()
  }
}
