package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StoreLayoutSpec extends SparkSpec {

  private def tempPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"layout_$tag").toString
    new java.io.File(p).delete()
    p
  }

  test("writeOptimized: partition dirs, bounded files, sorted rows, exact content") {
    import spark.implicits._
    val src = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd", (41 - i).toLong)
    }.toDF("id", "k", "sort_key")
    val path = tempPath("base")
    StoreLayout.writeOptimized(src, path,
      partitionCols = Seq("k"), sortCols = Seq("sort_key"),
      maxRecordsPerFile = 5)

    // one directory per partition value; 20 rows / 5-row files = 4 files
    val counts = StoreLayout.fileCounts(spark, path)
    assert(counts.keySet == Set("k=even", "k=odd"), counts)
    assert(counts.values.forall(_ == 4), counts)

    // content survives the layout exactly
    val back = StoreLayout.read(spark, path)
    assert(back.count() == 40)
    assert(back.select(sum("id")).head().getLong(0) == (1 to 40).sum.toLong)

    // rows inside each file are sorted by the sort key (row-group min/max
    // stats are only selective if this holds)
    val files = new java.io.File(path).listFiles().filter(_.getName.startsWith("k="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      val vals = spark.read.parquet(f.getPath).select("sort_key")
        .collect().map(_.getLong(0)).toSeq
      assert(vals == vals.sorted, s"${f.getName} not sorted: $vals")
    }

    // a partition-column predicate prunes directories in the plan
    val plan = back.where(col("k") === "even").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("k#"), plan)
  }

  test("bucketed stores equi-join with no shuffle exchange") {
    import spark.implicits._
    val left = (1L to 500L).map(i => (i.toString, s"t${i % 5}", i * 1.0))
      .toDF("memory_id", "tool", "value")
    val right = (1L to 500L).map(i => (i.toString, i * 2.0))
      .toDF("memory_id", "score")
    StoreLayout.writeBucketed(left, "spec_bucket_l", tempPath("bl"), "memory_id", 4)
    StoreLayout.writeBucketed(right, "spec_bucket_r", tempPath("br"), "memory_id", 4)
    val joined = spark.table("spec_bucket_l")
      .join(spark.table("spec_bucket_r"), Seq("memory_id"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the sort-merge join reads both bucketed scans directly
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(joined.count() == 500)
    val r = joined.where(col("memory_id") === "7").head()
    assert(r.getAs[Double]("value") == 7.0 && r.getAs[Double]("score") == 14.0)
    spark.sql("DROP TABLE IF EXISTS spec_bucket_l")
    spark.sql("DROP TABLE IF EXISTS spec_bucket_r")
  }

  test("bucket-partitioned store probe prunes at the scan (PartitionFilters)") {
    import spark.implicits._
    val path = tempPath("prune")
    val df = (0L until 200L).map(i => (i, i % 16)).toDF("vec_id", "bucket")
    StoreLayout.writeOptimized(df, path, Seq("bucket"), Seq("vec_id"))
    val probe = spark.read.parquet(path).where(col("bucket") === 3)
    val scan = probe.queryExecution.executedPlan.toString
    // the bucket predicate lands in PartitionFilters (directory pruning),
    // not PushedFilters (row-group filtering after opening files)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(scan).getOrElse("")
    assert(pf.contains("bucket"), scan.take(1500))
    assert(probe.count() == 200 / 16 + (if (3 < 200 % 16) 1 else 0))
  }

  test("zOrder2: exact Morton interleave") {
    import spark.implicits._
    val df = Seq((3, 0), (1, 1), (2, 3), (0, 0), (65535, 65535))
      .toDF("a", "b")
      .withColumn("z", StoreLayout.zOrder2(col("a"), col("b"), bits = 16))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // bit i of a → 2i, bit i of b → 2i+1
    assert(got((3, 0)) == 0x5L)          // a=11 → positions 0,2
    assert(got((1, 1)) == 0x3L)          // 1|2
    assert(got((2, 3)) == 14L)           // a bit1→4; b bits0,1→2,8
    assert(got((0, 0)) == 0L)
    assert(got((65535, 65535)) == 0xFFFFFFFFL) // all 32 low bits set
  }

  test("writeZOrdered: files are bounded rectangles in BOTH dimensions") {
    import spark.implicits._
    // 64×64 grid in row-major order — a plain sort by `a` would give each
    // file the full b-range; z-order must bound both
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    val path = tempPath("zorder")
    StoreLayout.writeZOrdered(grid, path, "a", "b", numFiles = 16, bits = 6)
    val perFile = spark.read.parquet(path)
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy(col("f"))
      .agg(org.apache.spark.sql.functions.max(col("a")) -
        org.apache.spark.sql.functions.min(col("a")),
        org.apache.spark.sql.functions.max(col("b")) -
          org.apache.spark.sql.functions.min(col("b")))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(perFile.length > 4)
    val avgSpanA = perFile.map(_._1).sum.toDouble / perFile.length
    val avgSpanB = perFile.map(_._2).sum.toDouble / perFile.length
    // global span is 63 on each axis; z-files must be local on BOTH
    assert(avgSpanA < 40, s"a-span $avgSpanA, files: ${perFile.mkString(",")}")
    assert(avgSpanB < 40, s"b-span $avgSpanB, files: ${perFile.mkString(",")}")
    // content survives the layout exactly
    assert(spark.read.parquet(path).count() == 64 * 64)
  }

  test("writeZOrdered: default bits derived from max() keep locality when values exceed a guessably-small width") {
    import spark.implicits._
    // values span [0, 1023] — 10 bits; a hand-picked bits=6 would alias
    // 16 distinct a-values onto each low-bits pattern and scatter them
    val grid = (for (a <- 0 until 1024 by 16; b <- 0 until 1024 by 16) yield (a, b)).toDF("a", "b")
    val path = tempPath("zorder_auto")
    StoreLayout.writeZOrdered(grid, path, "a", "b", numFiles = 16) // bits derived
    val perFile = spark.read.parquet(path)
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy(col("f"))
      .agg(org.apache.spark.sql.functions.max(col("a")) -
        org.apache.spark.sql.functions.min(col("a")),
        org.apache.spark.sql.functions.max(col("b")) -
          org.apache.spark.sql.functions.min(col("b")))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val avgSpanA = perFile.map(_._1).sum.toDouble / perFile.length
    val avgSpanB = perFile.map(_._2).sum.toDouble / perFile.length
    // global span is ~1008 per axis; derived-bits z-files stay local on BOTH
    assert(avgSpanA < 640, s"a-span $avgSpanA")
    assert(avgSpanB < 640, s"b-span $avgSpanB")
    assert(spark.read.parquet(path).count() == 64 * 64)
  }

  test("backfillPartitions: only targeted partitions rewritten, others physically untouched") {
    import spark.implicits._
    val path = tempPath("backfill")
    val src = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
      .toDF("id", "part", "v")
    StoreLayout.writeOptimized(src, path, Seq("part"), Seq("id"))
    def files(dir: String): Set[String] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/part=$dir")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, false)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.getName + ":" + f.getModificationTime
      }
      b.result()
    }
    val bBefore = files("b")
    val cBefore = files("c")
    StoreLayout.backfillPartitions(
      Seq((1L, "a", 10.0), (2L, "a", 20.0)).toDF("id", "part", "v"), path, Seq("part"))
    // partition a carries corrected rows; b and c files byte-identical
    assert(files("b") == bBefore && files("c") == cBefore)
    val got = spark.read.parquet(path).select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 3L -> 3.0, 4L -> 4.0))
    // the overwrite mode is restored afterwards
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }

  test("compactPartitions: needy dirs coalesce to sorted files, others byte-identical") {
    import spark.implicits._
    val path = tempPath("compact")
    // partition a: fragmented by 4 appends; partition b: one clean file
    for (i <- 0 until 4)
      StoreLayout.writeOptimized(
        Seq((i.toLong * 2, "a", 100L - i), (i.toLong * 2 + 1, "a", 50L - i))
          .toDF("id", "part", "sk"),
        path, Seq("part"), Seq("sk"), mode = "append")
    StoreLayout.writeOptimized(
      Seq((100L, "b", 1L), (101L, "b", 2L)).toDF("id", "part", "sk"),
      path, Seq("part"), Seq("sk"), mode = "append")
    def files(dir: String): Set[String] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/part=$dir")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, false)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.getName + ":" + f.getModificationTime
      }
      b.result()
    }
    assert(StoreLayout.fileCounts(spark, path)("part=a") == 4)
    val bBefore = files("b")
    val compacted = StoreLayout.compactPartitions(spark, path,
      Seq("part"), Seq("sk"), maxFiles = 1)
    // only the fragmented directory was rewritten, down to one file...
    assert(compacted == Seq("part=a"))
    val counts = StoreLayout.fileCounts(spark, path)
    assert(counts("part=a") == 1, counts)
    // ...b's file is byte-identical (same name, same mtime)...
    assert(files("b") == bBefore)
    // ...content is unchanged and the compacted file is sorted on sk
    val back = StoreLayout.read(spark, path)
    assert(back.count() == 10)
    val aFile = new java.io.File(s"$path/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val sks = spark.read.parquet(aFile.getPath).select("sk")
      .collect().map(_.getLong(0)).toSeq
    assert(sks == sks.sorted, s"not sorted: $sks")
    // idempotence: a second pass finds nothing over threshold
    assert(StoreLayout.compactPartitions(spark, path,
      Seq("part"), Seq("sk"), maxFiles = 1).isEmpty)
    // overwrite mode restored
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }

  test("compactPartitions: escaped partition values decode before the prune predicate") {
    import spark.implicits._
    val path = tempPath("compact_esc")
    // a value Spark must %-escape in the directory name (colon + space)
    val hot = "2024-01-01 10:00"
    for (i <- 0 until 3)
      StoreLayout.writeOptimized(
        Seq((i.toLong, hot, i), (100L + i, "clean", i)).toDF("id", "hour", "sk"),
        path, Seq("hour"), Seq("sk"), mode = "append")
    val dirs = StoreLayout.fileCounts(spark, path).keys.toSeq.sorted
    assert(dirs.exists(_.contains("%3A")), s"expected an escaped dir, got $dirs")
    val compacted = StoreLayout.compactPartitions(spark, path,
      Seq("hour"), Seq("sk"), maxFiles = 2)
    // both fragmented dirs rewrote — including the escaped one — and the
    // decoded predicate matched its rows (nothing lost, nothing doubled)
    assert(compacted.size == 2, compacted)
    assert(StoreLayout.fileCounts(spark, path).values.forall(_ == 1))
    val back = StoreLayout.read(spark, path)
    assert(back.count() == 6)
    assert(back.where(col("hour") === hot).count() == 3)
  }

  test("unescapePathValue: %xx decodes, malformed stays literal, sentinel is null") {
    assert(StoreLayout.unescapePathValue("plain") == "plain")
    assert(StoreLayout.unescapePathValue("10%3A00") == "10:00")
    assert(StoreLayout.unescapePathValue("a%2Fb%25c") == "a/b%c")
    assert(StoreLayout.unescapePathValue("50%") == "50%")
    assert(StoreLayout.unescapePathValue("x%zz") == "x%zz")
    assert(StoreLayout.unescapePathValue("__HIVE_DEFAULT_PARTITION__") == null)
  }

  test("writeOptimized without partition columns still sorts; guards empty spec") {
    import spark.implicits._
    val src = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val path = tempPath("sortonly")
    StoreLayout.writeOptimized(src, path, partitionCols = Nil, sortCols = Seq("id"))
    assert(StoreLayout.read(spark, path).count() == 3)
    intercept[IllegalArgumentException] {
      StoreLayout.writeOptimized(src, path, Nil, Nil)
    }
  }
}
