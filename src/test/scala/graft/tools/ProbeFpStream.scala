package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interleaved A/B/C probe for the stream_frequent_pairs harness: variants
  * {plain, cache, cache+coalesce} run round-robin in ONE JVM so host noise
  * hits all variants equally; per-variant minimum over reps is the
  * drift-robust comparison (the ProbeMemSearch pattern from round 7). */
object ProbeFpStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    val src = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
      .where(col("bk").isNotNull && col("it").isNotNull)

    def runVariant(tag: String, useCache: Boolean, useCoalesce: Boolean): Double = {
      val workDir = s"/tmp/graft_fp_probe_$tag"
      import org.apache.hadoop.fs.Path
      val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(workDir), true)
      val inDir = s"$workDir/in"
      val t0 = System.nanoTime()
      val mid = src.agg(avg(col("bk"))).collect()(0).getDouble(0)
      def stage(b: DataFrame): Unit = b
        .select(to_json(struct(col("bk"), col("it"))).as("value"))
        .write.mode("append").text(inDir)
      stage(src.where(col("bk") < mid))
      val parsed = spark.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir)
        .select(from_json(col("value"), StructType(Seq(
          StructField("bk", LongType), StructField("it", LongType)))).as("j"))
        .select(col("j.*"))
      var latest: Option[String] = None
      val q = parsed.writeStream
        .option("checkpointLocation", s"$workDir/ckpt")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val bi0 = batch.select(col("bk"), col("it")).distinct()
          val bi = if (useCache) bi0.cache() else bi0
          val pairDelta = bi.select(col("bk"), col("it").as("a"))
            .join(bi.select(col("bk"), col("it").as("b")), "bk")
            .where(col("a") < col("b"))
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
          val itemDelta = bi.groupBy(col("it")).agg(count(lit(1)).as("c"))
          val nDelta = bi.agg(count_distinct(col("bk")).as("nb"))
          val (pNext, iNext, nNext) = latest match {
            case None => (pairDelta, itemDelta, nDelta)
            case Some(prev) =>
              (spark.read.parquet(s"$prev/pairs").unionByName(pairDelta)
                .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w")),
                spark.read.parquet(s"$prev/items").unionByName(itemDelta)
                  .groupBy(col("it")).agg(sum(col("c")).as("c")),
                spark.read.parquet(s"$prev/n").unionByName(nDelta)
                  .agg(sum(col("nb")).as("nb")))
          }
          val out = s"$workDir/store/v$id"
          def w(df: DataFrame, p: String): Unit =
            (if (useCoalesce) df.coalesce(1) else df)
              .write.mode("overwrite").parquet(p)
          try {
            w(pNext, s"$out/pairs"); w(iNext, s"$out/items"); w(nNext, s"$out/n")
          } finally if (useCache) bi.unpersist()
          latest = Some(out)
        }
        .start()
      try {
        q.processAllAvailable()
        stage(src.where(col("bk") >= mid))
        q.processAllAvailable()
      } finally q.stop()
      val fin = latest.get
      val nb = spark.read.parquet(s"$fin/n").collect()(0).getLong(0)
      val ic = spark.read.parquet(s"$fin/items")
      spark.read.parquet(s"$fin/pairs")
        .where(col("w") >= 2)
        .join(broadcast(ic.select(col("it").as("a"), col("c").as("ca_"))), "a")
        .join(broadcast(ic.select(col("it").as("b"), col("c").as("cb_"))), "b")
        .select(col("a"), col("b"), col("w"),
          (col("w").cast("double") / lit(nb)).as("support"),
          (col("w").cast("double") / col("ca_")).as("confidence"),
          ((col("w").cast("double") * lit(nb)) /
            (col("ca_").cast("double") * col("cb_").cast("double"))).as("lift"))
        .orderBy(col("a"), col("b"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq(
      ("plain", false, false), ("cache", true, false), ("cacheco", true, true))
    val mins = scala.collection.mutable.Map.empty[String, Double]
    for (rep <- 1 to 3; (tag, c, co) <- variants) {
      val t = runVariant(tag, c, co)
      println(f"VARIANT $tag rep$rep $t%.2f s")
      mins(tag) = math.min(mins.getOrElse(tag, Double.MaxValue), t)
    }
    mins.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"MIN $k $v%.2f s") }
    spark.stop()
  }
}
