package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` plans for named queries to files —
  * the optimization-round evidence trail:
  * `Test/runMain graft.tools.PlanDumpR12 <suffix> <query...>` writes
  * `plans/r12/<query>_<suffix>.txt` for each query (suffix is
  * `before` / `after`). Plans are captured at sf0.1 — the bench scale —
  * so PushedFilters / join strategies / AQE hints match what the bench
  * actually runs (sized parameters can derive differently at sf0.001).
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR12 <suffix> <query...>")
    val suffix = args(0)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get("plans/r12"))
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r12/${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"WROTE plans/r12/${name}_$suffix.txt (${txt.length} chars)")
    }
    s.stop()
  }
}
