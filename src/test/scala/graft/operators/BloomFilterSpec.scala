package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the bloom contract: zero false negatives, idempotent set-bit
  * union (the replay-safe fold property), and an observed FP rate near
  * the design formula at the gate's parameters.
  */
class BloomFilterSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("members are always claimed; split build unions to the full build") {
    val e = Tables.events(spark, dir).select(col("event_id"))
    val bloom = BloomFilter.build(e, "event_id", depth = 3, width = 4096L)
    val verdicts = BloomFilter.probe(bloom, e, "event_id", 3, 4096L)
    assert(verdicts.where(!col("claimed")).isEmpty) // no false negatives
    val lo = BloomFilter.build(e.where(col("event_id") % 2 === 0), "event_id", 3, 4096L)
    val hi = BloomFilter.build(e.where(col("event_id") % 2 =!= 0), "event_id", 3, 4096L)
    val merged = lo.unionByName(hi).distinct()
    assert(merged.exceptAll(bloom).isEmpty && bloom.exceptAll(merged).isEmpty)
    val replayed = merged.unionByName(hi).distinct() // hi delivered twice
    assert(replayed.exceptAll(bloom).isEmpty)
  }

  test("fp rate on disjoint probes sits in the designed band") {
    val e = Tables.events(spark, dir)
    val row = BloomFilter.fpAudit(
      e.where(col("event_type") === "click").select(col("event_id")),
      e.where(col("event_type") === "view").select(col("event_id")),
      "event_id", depth = 3, width = 16384L).collect()(0)
    val fp = row.getAs[Double]("fp_rate")
    // ~200 members at sf0.001, kn/m ≈ 0.037 → design fp ≈ 5e-5; allow slack
    assert(fp >= 0.0 && fp < 0.05, s"fp_rate $fp")
    assert(row.getAs[Long]("n_probes") > 0)
  }
}
