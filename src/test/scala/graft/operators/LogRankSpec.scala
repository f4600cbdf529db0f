package graft.operators

import graft.SparkSpec

class LogRankSpec extends SparkSpec {
  import spark.implicits._

  test("logRank: identical arms give zero statistic") {
    // two identical survival profiles -> O-E = 0 at every time point
    val life = (0 until 2).flatMap(arm =>
      Seq((2L, 1L, arm), (4L, 1L, arm), (6L, 0L, arm)))
      .toDF("dur", "ev", "arm")
    val r = Survival.logRank(life, "dur", "ev", "arm").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L) // n1, n2
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L) // d1, d2
    assert(r.getLong(4) == 0L, s"oe_milli ${r.getLong(4)}") // perfect balance
    assert(!r.getBoolean(7))
  }

  test("logRank: hand-checked two-time fixture in milli fixed point") {
    // arm0: death at t=1 (n1=2,n2=2); arm1: death at t=2 (n1=1,n2=2)
    // t=1: d=1, e1m = (1000*1*2) div 4 = 500, oem = 1000-500 = 500
    //      v9 = 1*((1000*2) div 4)*((1000*2) div 4)*((1000*3) div 3)
    //         = 500*500*1000 = 250_000_000
    // t=2: d=1, n=3, e1m = (1000*1*1) div 3 = 333, oem = -333
    //      v9 = 1*((1000*1) div 3)*((1000*2) div 3)*((1000*2) div 2)
    //         = 333*666*1000 = 221_778_000
    val life = Seq((1L, 1L, 0), (9L, 0L, 0), (2L, 1L, 1), (9L, 0L, 1))
      .toDF("dur", "ev", "arm")
    val r = Survival.logRank(life, "dur", "ev", "arm").collect()(0)
    assert(r.getLong(4) == 167L, s"oe_milli ${r.getLong(4)}")
    assert(r.getLong(5) == 471778000L, s"v_nano ${r.getLong(5)}")
    // chi2 = 167^2 * 1000 / 471778000 = 0.0591146... -> round6 0.059115
    assert(r.getDouble(6) == 0.059115)
    assert(!r.getBoolean(7))
  }

  test("logRank: strongly divergent arms cross the critical value") {
    // arm0 all die early; arm1 all survive (censored late)
    val life = ((1 to 20).map(i => (1L + i % 3, 1L, 0)) ++
      (1 to 20).map(_ => (30L, 0L, 1))).toDF("dur", "ev", "arm")
    val r = Survival.logRank(life, "dur", "ev", "arm").collect()(0)
    assert(r.getDouble(6) > 3.841459, s"chi2 ${r.getDouble(6)}")
    assert(r.getBoolean(7))
  }
}
