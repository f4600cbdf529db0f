package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** r12 probe: where does stream_interval_join_outer's wall go? The gate
  * harness with a timer around each lifecycle phase (staging writes,
  * stream start, each processAllAvailable, read-back). Mirrors
  * StreamingIngest.stagedIntervalJoinRoundtrip's left_outer path on the
  * gate's own inputs; read-only evidence, not a second implementation
  * shipped anywhere.
  */
object ProbeIvjPhases {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"ROUND $round")
      // same inputs as the gate (SparkEntry stream_interval_join_outer)
      val ev = graft.Tables.events(s, d)
      val left = ev.where(col("event_id") % 7 === 0)
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
      val right = ev.where(col("event_id") % 11 === 0)
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))

      val workDir = s"/tmp/probe_ivj_$round"
      import org.apache.hadoop.fs.Path
      val fs = new Path(workDir).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(workDir), true)
      val (lDir, rDir) = (s"$workDir/left", s"$workDir/right")
      def stage(df: org.apache.spark.sql.DataFrame, dir: String): Unit = df
        .select(to_json(struct(col("key"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("id"))).as("value"))
        .coalesce(1).write.mode("append").text(dir)

      val bounds = t("bounds_agg") {
        left.select(col("ts")).union(right.select(col("ts")))
          .agg(min(col("ts")), max(col("ts"))).collect()(0)
      }
      val mid = new java.sql.Timestamp(
        (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
      t("stage_half1") {
        stage(left.where(col("ts") < lit(mid)), lDir)
        stage(right.where(col("ts") < lit(mid)), rDir)
      }
      def readJsonl(dir: String) = s.readStream
        .schema(StructType(Seq(StructField("value", StringType)))).text(dir)
        .select(from_json(col("value"), StructType(Seq(
          StructField("key", LongType), StructField("ts", TimestampType),
          StructField("id", LongType)))).as("j"))
        .select(col("j.*"))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      val q = t("start_stream") {
        try graft.streaming.StreamingIngest.intervalJoinStream(
          readJsonl(lDir), readJsonl(rDir), "30 minutes", joinType = "left_outer")
          .writeStream.format("memory").queryName(s"probe_ivj$round")
          .option("checkpointLocation", s"$workDir/ckpt")
          .outputMode(OutputMode.Append).start()
        finally s.conf.set("spark.sql.shuffle.partitions", prev)
      }
      val maxTs = bounds.getTimestamp(1).getTime
      def sentinel(offsetMs: Long): Unit = {
        val sdf = s.createDataFrame(Seq((-1L,
          new java.sql.Timestamp(maxTs + offsetMs), -1L)))
          .toDF("key", "ts", "id")
        stage(sdf, lDir); stage(sdf, rDir)
      }
      try {
        t("batch1") { q.processAllAvailable() }
        t("stage_half2") {
          stage(left.where(col("ts") >= lit(mid)), lDir)
          stage(right.where(col("ts") >= lit(mid)), rDir)
          sentinel(3L * 3600 * 1000)
        }
        t("batch2") { q.processAllAvailable() }
        t("sentinel2") { sentinel(4L * 3600 * 1000) }
        t("batch3") { q.processAllAvailable() }
      } finally q.stop()
      t("readback") {
        s.table(s"probe_ivj$round").where(col("key") >= 0)
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
