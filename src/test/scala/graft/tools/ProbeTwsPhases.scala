package graft.tools

import graft.streaming.StreamingIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Micro-batch phase decomposition for stream_tws_sessions (r12 verdict
  * item 5): the harness steps — staging writes, bounds collect, stream
  * start, each processAllAvailable, result read — timed individually, so
  * the 3-4 s gate cost is attributed to machinery vs operator work.
  * Inlines stagedTwsSessionRoundtrip step-for-step (same confs the gate
  * sees: RocksDB provider, p4 state partitioning).
  * `Test/runMain graft.tools.ProbeTwsPhases <reps>`
  */
object ProbeTwsPhases {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("graft.stream.parts", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"TWSPHASE $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val events = graft.Tables.events(s, d)
        .where(col("event_id") % 3 === 0)
        .select(col("user_id").as("userId"), col("ts"), col("value"))
      val workDir = s"/tmp/probe_twssess"
      val fs = new org.apache.hadoop.fs.Path(workDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(workDir), true)
      val inDir = s"$workDir/in"
      val table = "probe_twssess_t"

      def stage(b: DataFrame): Unit = b
        .select(to_json(struct(col("userId"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("value"))).as("value"))
        .coalesce(1)
        .write.mode("append").text(inDir)

      val bounds = timed("bounds_collect") {
        events.agg(min(col("ts")), max(col("ts"))).collect()(0)
      }
      val mid = new java.sql.Timestamp(
        (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
      timed("stage1_write") { stage(events.where(col("ts") < lit(mid))) }

      val parsed = s.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir)
        .select(from_json(col("value"), StructType(Seq(
          StructField("userId", LongType),
          StructField("ts", TimestampType),
          StructField("value", DoubleType)))).as("j"))
        .select(col("j.*")).as[StreamingIngest.UserEvent]

      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(providerKey)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = timed("stream_start") {
        try StreamingIngest.sessionsTws(parsed)
          .writeStream.format("memory").queryName(table)
          .option("checkpointLocation", s"$workDir/ckpt")
          .outputMode(OutputMode.Append)
          .start()
        finally {
          s.conf.set("spark.sql.shuffle.partitions", prevParts)
          prev match {
            case Some(p) => s.conf.set(providerKey, p)
            case None => s.conf.unset(providerKey)
          }
        }
      }
      val maxTs = bounds.getTimestamp(1).getTime
      def flush(offsetMs: Long): Unit = {
        stage(s.createDataFrame(Seq((-1L,
          new java.sql.Timestamp(maxTs + offsetMs), 0.0)))
          .toDF("userId", "ts", "value"))
        q.processAllAvailable()
      }
      try {
        timed("batch1") { q.processAllAvailable() }
        timed("stage2_write") { stage(events.where(col("ts") >= lit(mid))) }
        timed("batch2") { q.processAllAvailable() }
        timed("flush1") { flush(3L * 3600 * 1000) }
        timed("flush2") { flush(4L * 3600 * 1000) }
      } finally timed("stop") { q.stop() }
      timed("result_read") {
        s.table(table).where(col("userId") >= 0)
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
