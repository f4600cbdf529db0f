package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).toDF("id")
  }

  test("hashSample is deterministic and partitioning-independent") {
    val df = ids(2000)
    val a = Sampling.hashSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // roughly the requested fraction (hash uniformity)
    assert(a.size > 500 && a.size < 700, a.size)
    // a different salt draws a different (decorrelated) sample
    val c = Sampling.hashSample(df, "id", 0.3, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("assignSplit: disjoint, exhaustive, stable, near the weights") {
    val split = Sampling.assignSplit(ids(2000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700, counts)
    assert(counts("val") > 140 && counts("val") < 260, counts)
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids(10), "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("mixture keeps sources at their configured rates") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val kept = Sampling.mixture(df, "id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("src0") == 1000)          // rate 1.0 keeps everything
    assert(!counts.contains("src1"))        // rate 0.0 drops everything
    val d = counts("src2")                  // defaultRate ~0.5
    assert(d > 420 && d < 580, d)
  }

  test("capPerGroup keeps exactly k per group, stable under repartitioning") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept = Sampling.capPerGroup(df, "id", "grp", k = 20)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.values.toSet == Set(20L))
    // hash-ranked, not arrival-ranked: same survivors on any partitioning
    val again = Sampling.capPerGroup(df.repartition(17), "id", "grp", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("id").collect().map(_.getLong(0)).toSet)
    // under-cap groups pass through whole
    assert(Sampling.capPerGroup(df, "id", "grp", 1000).count() == 300)
  }

  test("temperatureSample: α=1 keeps all, α=0 balances to the smallest group") {
    import spark.implicits._
    // skewed groups: big=800, mid=200, small=50
    val df = ((1L to 800L).map((_, "big")) ++ (801L to 1000L).map((_, "mid")) ++
      (1001L to 1050L).map((_, "small"))).toDF("id", "grp")
    assert(Sampling.temperatureSample(df, "id", "grp", alpha = 1.0).count() == 1050)
    val balanced = Sampling.temperatureSample(df, "id", "grp", alpha = 0.0)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every group lands near the smallest group's size (hash noise ±40%)
    assert(balanced("small") == 50)
    assert(balanced("big") > 30 && balanced("big") < 70, balanced.toString)
    assert(balanced("mid") > 30 && balanced("mid") < 70, balanced.toString)
    // α=0.5 sits between: keeps more of big than α=0, less than α=1
    val mid = Sampling.temperatureSample(df, "id", "grp", alpha = 0.5)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid("big") > balanced("big") && mid("big") < 800)
    // deterministic under repartitioning
    val a = Sampling.temperatureSample(df, "id", "grp", alpha = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(17), "id", "grp", alpha = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // null-group rows are dropped, not a crash; schema passes through
    val withNull = df.withColumn("grp",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") <= 10, null)
        .otherwise(org.apache.spark.sql.functions.col("grp")))
    val nn = Sampling.temperatureSample(withNull, "id", "grp", alpha = 1.0)
    assert(nn.columns.toSeq == Seq("id", "grp"))
    assert(nn.count() == 1040) // 1050 minus the 10 null-group rows
  }

  test("packSequences bounds every sequence by budget + max doc tokens") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, 10 + (i * 7 % 90))).toDF("id", "n_tok")
      .withColumn("n_tok", col("n_tok").cast("long"))
    val budget = 300L
    val packed = Sampling.packSequences(docs, "id", "n_tok", budget, groups = 4)
    val rows = packed.select("id", "pack_group", "n_tok", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxDoc = rows.map(_._3).max
    val bySeq = rows.groupBy(_._4).view.mapValues(_.map(_._3).sum)
    assert(bySeq.values.forall(_ <= budget + maxDoc),
      s"overflow: ${bySeq.maxBy(_._2)}")
    // each group packs multiple sequences (cumsum actually advances)
    assert(rows.map(_._4).distinct.length > 4)
    // deterministic under repartitioning
    val re = Sampling.packSequences(docs.repartition(13), "id", "n_tok",
      budget, groups = 4)
      .select("id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall { case (id, _, _, seq) => re(id) == seq })
  }

  test("curriculumPhases: quantile thresholds, ties stay together, no sort shuffle") {
    import spark.implicits._
    // scores 1..8: quartile cuts 2.75 / 4.5 / 6.25 → phases 1:{1,2} 2:{3,4} 3:{5,6} 4:{7,8}
    val df = (1L to 8L).map(i => (i, i.toInt)).toDF("id", "score")
    val got = Sampling.curriculumPhases(df, "id", "score", phases = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
    // massive ties: every equal score lands in ONE phase (never split)
    val tied = ((1L to 6L).map(i => (i, 10)) ++ Seq((7L, 20), (8L, 30)))
      .toDF("id", "score")
    val t = Sampling.curriculumPhases(tied, "id", "score", phases = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert((1L to 6L).map(t).toSet.size == 1)
    // assignment is per-row: the plan carries no global Sort before phase
    val plan = Sampling.curriculumPhases(df, "id", "score", phases = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"curriculum must not globally sort:\n$plan")
  }

  test("assignSplitStratified: count-exact per stratum, where assignSplit only holds in expectation") {
    import spark.implicits._
    // 30-row strata: exact cuts must give 24/3/3 in EVERY stratum
    val df = (for (g <- Seq("a", "b", "c"); i <- 1 to 30)
      yield (s"$g-$i", g)).toDF("id", "grp")
    val out = Sampling.assignSplitStratified(df, "id", "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("grp", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (g <- Seq("a", "b", "c")) {
      assert(counts((g, "train")) == 24L, counts.toString)
      assert(counts((g, "val")) == 3L, counts.toString)
      assert(counts((g, "test")) == 3L, counts.toString)
    }
    // deterministic across invocations
    val again = Sampling.assignSplitStratified(df, "id", "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(again == out.collect().map(r => (r.getString(0), r.getString(2))).toSet)
  }

  test("weightedSamplePerGroup: exactly k per group, deterministic, weight-proportional") {
    import spark.implicits._
    // 1000 light rows (w=1) + 1000 heavy rows (w=50) in one group
    val df = ((1L to 1000L).map(i => (i, 1L, "g")) ++
      (1001L to 2000L).map(i => (i, 50L, "g"))).toDF("id", "w", "grp")
    val draw = Sampling.weightedSamplePerGroup(df, "id", "w", "grp", k = 200)
      .collect().map(_.getLong(0))
    assert(draw.length == 200)
    val heavy = draw.count(_ > 1000L)
    // E[heavy] ≈ 196 of 200 (50:1 odds); far from any uniform draw
    assert(heavy > 170, s"heavy rows drawn: $heavy of 200")
    // same salt → same draw; different salt → (almost surely) different
    val again = Sampling.weightedSamplePerGroup(df, "id", "w", "grp", k = 200)
      .collect().map(_.getLong(0))
    assert(draw.toSeq == again.toSeq)
    val other = Sampling.weightedSamplePerGroup(df, "id", "w", "grp",
      k = 200, salt = "other")
      .collect().map(_.getLong(0))
    assert(draw.toSet != other.toSet)
    // two groups stay independent: k from each
    val two = df.withColumn("grp",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val counts = Sampling.weightedSamplePerGroup(two, "id", "w", "grp", k = 10)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L))
  }
}
