package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the blocking-audit arithmetic (RR from counts, PC from sampled
  * truth) and the lateness audit's strict-horizon semantics on
  * hand-computed inputs.
  */
class BlockingLatenessSpec extends SparkSpec {
  import spark.implicits._

  test("blockingAudit: cross-block true match halves pair completeness") {
    val df = Seq(
      (1L, "customer alpha one", "A"),
      (2L, "customer alpha on", "A"),   // true match, same block
      (3L, "customer beta two", "B"),
      (4L, "customer beta twoo", "C")   // true match, CROSS block
    ).toDF("id", "name", "blk")
    val r = EntityResolution.blockingAudit(df, "id", "name", Seq("blk"),
      minSim = 0.97, sampleMod = 1).collect()(0)
    assert(r.getAs[Long]("n_records") == 4 && r.getAs[Long]("total_pairs") == 6)
    assert(r.getAs[Long]("n_candidates") == 1) // only block A pairs
    assert(r.getAs[Double]("reduction_ratio") == 0.833333)
    assert(r.getAs[Long]("n_true") == 2 && r.getAs[Long]("n_captured") == 1)
    assert(r.getAs[Double]("pair_completeness") == 0.5)
  }

  test("latenessAudit: strict horizon compare against the running high-water mark") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"),
      (2L, "2024-01-01 09:00:00"), // 1h late
      (3L, "2024-01-01 10:30:00"),
      (4L, "2024-01-01 10:25:00")  // 5m late
    ).toDF("event_id", "s").select(col("event_id"),
      to_timestamp(col("s")).as("ts"))
    val out = graft.streaming.StreamingIngest.latenessAudit(ev, "ts",
      "event_id", Seq(("1m", 60000L), ("30m", 1800000L), ("2h", 7200000L)))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_late")).toMap
    assert(out == Map("1m" -> 2L, "30m" -> 1L, "2h" -> 0L))
  }
}
