package graft.operators

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch: retains at most k items; heavy item survives any partitioning") {
    // 1000 "hot" + 200 distinct singletons; k=8 -> thr = 1200/9 = 133
    val df = (Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"cold$i"))
      .toDF("item")
    val sk = MisraGries.sketch(df, "item", k = 8).collect()
    assert(sk.length <= 8)
    assert(sk.exists(_.getString(0) == "hot"))
    val sk2 = MisraGries.sketch(df.repartition(13), "item", k = 8).collect()
    assert(sk2.exists(_.getString(0) == "hot"))
  }

  test("audit: every truly-frequent item present with estimate in band") {
    // skewed corpus: a=500, b=300, c=120, + 80 singletons; n=1000
    // k=4 -> thr = 1000 div 5 = 200: frequent = {a, b}
    val df = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(120)("c") ++ (1 to 80).map(i => s"s$i")).toDF("item")
    val rows = MisraGries.audit(df, "item", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.map(_._1).toSet == Set("a", "b"))
    rows.foreach { case (item, cnt, thr, present, inBand) =>
      assert(thr == 200L)
      assert(present, s"$item missing from MG summary")
      assert(inBand, s"$item estimate outside the n/(k+1) band (cnt=$cnt)")
    }
  }

  test("audit: guarantee holds under adversarial partitioning and merge") {
    val df = (Seq.fill(400)("x") ++ (1 to 600).map(i => s"u$i")).toDF("item")
    for (p <- Seq(1, 3, 17)) {
      val rows = MisraGries.audit(df.repartition(p), "item", k = 3).collect()
      // n=1000, k=3 -> thr=250: only x qualifies
      assert(rows.length == 1 && rows(0).getString(0) == "x")
      assert(rows(0).getBoolean(3) && rows(0).getBoolean(4),
        s"guarantee broken at $p partitions")
    }
  }
}
