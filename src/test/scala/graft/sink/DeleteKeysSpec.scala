package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the targeted-delete mechanics: only affected directories are
  * touched, untouched directories keep their files byte-identical, and a
  * partition whose every row is deleted is REMOVED (the edge dynamic
  * overwrite cannot express).
  */
class DeleteKeysSpec extends SparkSpec {
  import spark.implicits._

  private def fileSet(path: String): Map[String, Set[String]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.length).toSet
    }.toMap
  }

  test("deleteKeys rewrites only affected dirs and removes emptied ones") {
    val path = "/tmp/graft_delete_spec"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    // p=a holds keys 1,2; p=b holds key 3 only; p=c holds key 4
    val src = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("k", "p")
    StoreLayout.writeOptimized(src, path,
      partitionCols = Seq("p"), sortCols = Seq("k"))
    val before = fileSet(path)

    val (rewritten, removed) = StoreLayout.deleteKeys(spark, path,
      Seq("p"), "k", Seq(1L, 3L).toDF("k"))
    assert(rewritten == Seq("p=a")) // a keeps key 2 → rewritten
    assert(removed == Seq("p=b"))   // b emptied → directory gone
    val after = fileSet(path)
    assert(!after.contains("p=b"))
    assert(after("p=c") == before("p=c")) // untouched dir byte-identical
    val content = StoreLayout.read(spark, path)
      .select(col("k"), col("p")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(content == Set((2L, "a"), (4L, "c")))

    // deleting a key that appears nowhere is a no-op
    val (r2, d2) = StoreLayout.deleteKeys(spark, path,
      Seq("p"), "k", Seq(99L).toDF("k"))
    assert(r2.isEmpty && d2.isEmpty && fileSet(path) == after)
  }

  test("hrwShard: adding a shard moves ~1/N of keys, all TO the new shard") {
    val keys = spark.range(0, 2000).toDF("k")
    val assigned = keys.select(col("k"),
      StoreLayout.hrwShard(col("k"), 8).as("s8"),
      StoreLayout.hrwShard(col("k"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val moved = assigned.filter { case (_, a, b) => a != b }
    // every moved key lands on the NEW shard — the rendezvous invariant
    assert(moved.forall(_._3 == 8), moved.take(5).mkString(","))
    // expected movement 1/9 ≈ 222 of 2000; allow a generous band
    assert(moved.length > 120 && moved.length < 350, s"moved ${moved.length}")
    // shards cover the full range and are reasonably balanced
    val byShard = assigned.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.keys.toSet == (0 until 8).toSet)
    assert(byShard.values.forall(c => c > 150 && c < 350), byShard.toMap.toString)
  }
}
