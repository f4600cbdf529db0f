package graft.ingest

import graft.SparkSpec
import graft.catalog.ArchetypeCatalog
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {

  lazy val arch = ArchetypeCatalog.fromYaml(
    """version: "1"
      |title: t
      |parameters:
      |  Mode:
      |    description: m
      |tools:
      |  Act:
      |    parameters:
      |      Mode: auto
      |  Ping:
      |""".stripMargin)

  private def calls = {
    import spark.implicits._
    Seq(
      ("1", "s1", "Act", "2024-01-01 00:00:01",
        Map("Title" -> "t1", "Content" -> "c1", "Context" -> "x")),
      ("2", "s1", "Ping", "2024-01-01 00:00:02",
        Map("Title" -> "t2", "Content" -> "c2", "Context" -> "x")),
      ("3", "s2", "Act", "2024-01-01 00:00:03",
        Map("Title" -> "t3", "Content" -> "c3", "Context" -> "x")),
      ("4", "s2", "Nope", "2024-01-01 00:00:04",
        Map("Title" -> "t4", "Content" -> "c4", "Context" -> "x")))
      .toDF("memory_id", "session_id", "tool", "ts", "args")
      .withColumn("timestamp", to_timestamp(col("ts"))).drop("ts")
  }

  test("toMemories: validate -> partition -> sessionize -> embed end-to-end") {
    val mem = Ingest.toMemories(calls, arch, dims = 8)
    val rows = mem.select("memory_id", "sequence_order", "title").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // the unknown-tool row 4 is rejected; defaults applied; sessions sequenced
    assert(rows == Set(("1", 1, "t1"), ("2", 2, "t2"), ("3", 1, "t3")))
    val emb = mem.where(col("memory_id") === "1").select("embedding")
      .head().getSeq[Double](0)
    assert(emb.length == 8)
    assert(math.abs(math.sqrt(emb.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(Ingest.rejectsOf(calls, arch).count() == 1)
  }

  test("writeStore partitions by tool; tool-filtered reads prune partitions") {
    val path = Files.createTempDirectory("graft-ingest").toString + "/store"
    Ingest.writeStore(Ingest.toMemories(calls, arch, dims = 4), path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("tool=Act", "tool=Ping"))
    val back = spark.read.parquet(path).where(col("tool") === "Act")
    assert(back.count() == 2)
    // partition pruning: only the tool=Act directory is in the scan
    val scan = back.queryExecution.executedPlan.toString
    assert(!scan.contains("tool=Ping"))
  }
}
