package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the determinism contract of the oracle-exact HLL: registers are
  * integers under pinned bit math (partitioning-independent), max-merge
  * of partial builds equals the one-pass build bit-for-bit (the streaming
  * fold's correctness), merging a delta twice changes nothing (replay
  * idempotence), and the raw estimate lands within the theoretical error
  * band in the regime the gates use.
  */
class HyperLogLogSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, dir)

  test("registers are partitioning-independent and within bounds") {
    val a = HyperLogLog.build(events, "event_id", Seq("event_type"))
    val b = HyperLogLog.build(events.repartition(13, col("user_id")),
      "event_id", Seq("event_type"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val mm = a.agg(min("reg"), max("reg"), max("bucket"), min("bucket")).collect()(0)
    assert(mm.getInt(0) >= 1 && mm.getInt(1) <= HyperLogLog.Width + 1)
    assert(mm.getLong(2) < HyperLogLog.M && mm.getLong(3) >= 0L)
  }

  test("max-merge of disjoint halves equals the one-pass build; replay is a no-op") {
    val full = HyperLogLog.build(events, "event_id", Seq("event_type"))
    val lo = HyperLogLog.build(events.where(col("event_id") % 2 === 0),
      "event_id", Seq("event_type"))
    val hi = HyperLogLog.build(events.where(col("event_id") % 2 =!= 0),
      "event_id", Seq("event_type"))
    def merge(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.unionByName(y).groupBy(col("event_type"), col("bucket"))
        .agg(max(col("reg")).as("reg"))
    val folded = merge(lo, hi)
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty)
    val replayed = merge(folded, hi) // hi delivered twice
    assert(replayed.exceptAll(full).isEmpty && full.exceptAll(replayed).isEmpty)
  }

  test("estimate lands within 3 standard errors of true NDV") {
    // sigma = 1.04/sqrt(64) = 13%; the sf0.001 groups hold ~200 ids each,
    // below the ideal n/m band, so allow the full 3-sigma slack.
    val rows = HyperLogLog.audit(events, "event_id", "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = math.abs(r.getAs[Double]("rel_err"))
      assert(err < 0.39, s"${r.getAs[String]("event_type")}: rel_err $err")
      assert(r.getAs[Long]("v_empty") >= 0L)
    }
  }
}
