package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(s, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.take(6000))
    s.stop()
  }
}
