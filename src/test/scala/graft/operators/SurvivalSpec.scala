package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring, micro-exact") {
    // classic KM fixture: events at t=1 (1), t=3 (1); censored at t=2, t=4
    // n=4: S(1)=3/4; t=2 censored only, S unchanged; t=3 risk set {3,4}
    // -> S(3) = 3/4 * 1/2 = 3/8; t=4 censored, unchanged.
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 4L, 1L, 0L, 750000000000L),
      (2L, 3L, 0L, 1L, 750000000000L),
      (3L, 2L, 1L, 0L, 375000000000L),
      (4L, 1L, 0L, 1L, 375000000000L)))
  }

  test("kaplanMeier: deaths-before-censorings at equal time") {
    // at t=1: one death, one censoring — censored subject counts in the
    // risk set for that death: S(1) = (3-1)/3 = 2/3, not 1/2
    val df = Seq((1L, 1L), (1L, 0L), (5L, 1L)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev").collect()
    assert(rows(0).getLong(1) == 3L) // n_risk at t=1
    assert(rows(0).getLong(4) == 666666666666L) // floor(2/3 * 1e12)
    // t=5: risk set 1, death -> S=0
    assert(rows(1).getLong(4) == 0L)
  }

  test("kaplanMeier: no censoring degrades to the empirical survivor") {
    val df = (1 to 10).map(i => (i.toLong, 1L)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev").collect()
    // product telescopes: S(t_i) = (10 - i)/10 exactly
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) == (10L - (i + 1)) * 100000000000L)
    }
  }

  test("kaplanMeier: bucket bound enforced") {
    val df = (1 to 600).map(i => (i.toLong, 1L)).toDF("dur", "ev")
    intercept[IllegalArgumentException] {
      Survival.kaplanMeier(df, "dur", "ev", maxBuckets = 512)
    }
  }

  test("kaplanMeierBands: Greenwood terms exact; band nulls after d=n") {
    // fixture from the textbook test: S(1)=3/4, S(3)=3/8
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L)).toDF("dur", "ev")
    val rows = Survival.kaplanMeierBands(df, "dur", "ev").collect()
    // g(1) = 1e9*1/(4*3) = 83333333; g(3) = g(1) + 1e9*1/(2*1)
    assert(rows(0).getLong(5) == 83333333L)
    assert(rows(2).getLong(5) == 583333333L)
    // bands clamp into [0,1] and bracket the estimate
    rows.foreach { r =>
      assert(r.getDouble(7) >= 0.0 && r.getDouble(8) <= 1.0)
      assert(r.getDouble(7) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(8))
    }
    // everyone-dies tail: d = n at the last time -> band null there on
    val dd = Seq((1L, 1L), (2L, 1L)).toDF("dur", "ev")
    val rr = Survival.kaplanMeierBands(dd, "dur", "ev").collect()
    assert(!rr(0).isNullAt(5) && rr(1).isNullAt(5))
    assert(rr(1).isNullAt(7) && rr(1).isNullAt(8))
  }

  test("kaplanMeierGrouped: independent curves per group, same fold per group") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 0L),
      ("b", 5L, 1L), ("b", 6L, 1L)).toDF("g", "dur", "ev")
    val rows = Survival.kaplanMeierGrouped(df, "g", "dur", "ev")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    // group a replays the textbook fixture; group b telescopes to 0
    assert(rows.toSeq == Seq(
      ("a", 1L, 750000000000L), ("a", 2L, 750000000000L),
      ("a", 3L, 375000000000L), ("a", 4L, 375000000000L),
      ("b", 5L, 500000000000L), ("b", 6L, 0L)))
    // single-group result equals the ungrouped fold
    val solo = Survival.kaplanMeier(
      df.where(col("g") === "a").select(col("dur"), col("ev")), "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(rows.filter(_._1 == "a").map(t => (t._2, t._3)).toSeq ==
      solo.toSeq)
  }

  test("lifetimes: duration and censor flag from an event log") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-05 10:00:00"), // churned
      (2L, "2024-01-02 10:00:00"), (2L, "2024-01-29 10:00:00")  // active
    ).toDF("user_id", "ts").withColumn("ts", to_timestamp(col("ts")))
    val rows = Survival.lifetimes(ev, "user_id", "ts", lit("2024-01-24"))
      .orderBy(col("subject"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 4L, 1L), (2L, 27L, 0L)))
  }
}
