package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 probe: does Dataset.localCheckpoint go through AQE (coalesced
  * shuffle partitions), or does it materialize the un-coalesced plan? */
object ProbeAqeCkpt {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val df = (1 to 2000).toDF("id")
      .groupBy(col("id") % 97).agg(count(lit(1)))
    println("PROBE ckpt_parts=" + df.localCheckpoint().rdd.getNumPartitions)
    println("PROBE rdd_parts=" + df.rdd.getNumPartitions)
    s.stop()
  }
}
