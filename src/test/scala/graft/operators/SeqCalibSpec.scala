package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sequentialPairs + calibrationTable units. */
class SeqCalibSpec extends SparkSpec {
  import spark.implicits._

  test("sequentialPairs: direction counted, ties dropped, first occurrence wins") {
    // b1: x(1) -> y(2); b2: x(1) -> y(3); b3: y(1) -> x(2);
    // b4: x and y at the SAME position (tie -> no pair);
    // b5: x repeats (pos 5 then 1) -> first occurrence 1 -> x before y(2)
    val df = Seq(
      (1, "x", 1), (1, "y", 2),
      (2, "x", 1), (2, "y", 3),
      (3, "y", 1), (3, "x", 2),
      (4, "x", 7), (4, "y", 7),
      (5, "x", 5), (5, "x", 1), (5, "y", 2)
    ).toDF("bk", "it", "pos")
    val rows = MarketBasket.sequentialPairs(df, "bk", "it", "pos",
      minSupportFrac = 0.01)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // x->y in baskets 1,2,5 = 3; y->x in basket 3 only = 1 < floor thr 2
    assert(rows.keySet == Set(("x", "y")))
    val (w, supp, conf) = rows(("x", "y"))
    assert(w == 3L)
    assert(supp == 3.0 / 5.0)  // 5 baskets hold x or y
    assert(conf == 3.0 / 5.0)  // x appears in baskets 1,2,3,4,5
  }

  test("sequentialPairs: relative threshold scales with basket count") {
    // 100 baskets of a->b, 2 baskets of c->d: frac 0.05 -> thr 5
    val df = ((1 to 100).flatMap(b => Seq((b, "a", 1), (b, "b", 2))) ++
      Seq((101, "c", 1), (101, "d", 2), (102, "c", 1), (102, "d", 2)))
      .toDF("bk", "it", "pos")
    val got = MarketBasket.sequentialPairs(df, "bk", "it", "pos",
      minSupportFrac = 0.05)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("calibrationTable: perfectly calibrated bins read back their rate") {
    // scores 0..999999 micro; label = 1 for the top half -> two clean bins
    val df = (0 until 1000).map(i =>
      (i * 1000L, if (i >= 500) 1 else 0)).toDF("s", "y")
    val rows = Profiling.calibrationTable(df, "s", "y", bins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 2)
    val (b0, b1) = (rows(0), rows(1))
    assert(b0._1 == 0L && b0._2 == 500L && b0._3 == 0L && b0._5 == 0.0)
    assert(b1._1 == 1L && b1._2 == 500L && b1._3 == 500L && b1._5 == 1.0)
    // mean predicted prob rises with the bin; brier penalizes distance
    assert(b0._4 < 0.5 && b1._4 > 0.5)
    assert(b0._6 < 0.2 && b1._6 < 0.2)
  }

  test("calibrationTable: miscalibrated scores show a pred/obs gap") {
    // high scores but only 10% positives -> mean_pred >> obs_rate
    val df = (0 until 200).map(i =>
      (900000L + i * 500L, if (i % 10 == 0) 1 else 0)).toDF("s", "y")
    val rows = Profiling.calibrationTable(df, "s", "y", bins = 4).collect()
    val worst = rows.map(r => r.getDouble(3) - r.getDouble(4)).max
    assert(worst > 0.3, s"expected a calibration gap, max was $worst")
  }

  test("calibrationTable: top edge closed into the last bin") {
    val df = Seq((0L, 0), (500000L, 0), (1000000L, 1)).toDF("s", "y")
    val rows = Profiling.calibrationTable(df, "s", "y", bins = 10).collect()
    assert(rows.map(_.getLong(0)).max == 9L)
  }
}
