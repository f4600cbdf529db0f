package graft

import org.apache.spark.sql.functions._

/** Plan-shape regressions for the scale-critical physical properties of
  * the newest operators — asserted in CI, not just in the manual
  * `graft.tools.Explain*` audit mains:
  *
  *  - SQ8 search: top-k must be TakeOrderedAndProject and the search must
  *    add no exchange of its own (the one in the gate is the bench
  *    inputs' spread repartition)
  *  - vocabulary: top-k must be TakeOrderedAndProject (no global sort of
  *    the term table)
  *  - anomaly: exactly one scan of raw events (one rollup feeds both the
  *    current value and the trailing baseline)
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(p: String, pat: String): Int =
    p.linesIterator.count(_.contains(pat))

  test("search_sq8: TakeOrdered top-k, no shuffle beyond the input spread") {
    val p = plan("search_sq8")
    assert(count(p, "TakeOrderedAndProject") == 1, p.take(800))
    assert(count(p, "Exchange") <= 1, p.take(800))
  }

  test("text_vocabulary: top-k is TakeOrderedAndProject, single scan") {
    val p = plan("text_vocabulary")
    assert(count(p, "TakeOrderedAndProject") == 1, p.take(800))
    assert(count(p, "Scan parquet") == 1, p.take(800))
  }

  test("events_anomaly: exactly one raw-events scan") {
    val p = plan("events_anomaly")
    assert(count(p, "Scan parquet") == 1, p.take(800))
  }

  test("search_label_centroids: one scan, combiner-heavy aggregate only") {
    val p = plan("search_label_centroids")
    assert(count(p, "Scan parquet") == 1, p.take(800))
    assert(count(p, "HashAggregate") >= 2, p.take(800)) // partial + final
  }
}
