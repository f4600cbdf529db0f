package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the round-11 additions (the ExplainAudit pattern):
  * `Test/runMain graft.tools.ExplainR11`. Asserted facts:
  *
  *  - er_multipass_blocked: BOTH passes plan keyed equi-joins that
  *    include their pass-specific sub-key (pfx / sfx) in the join keys;
  *    no CartesianProduct / BroadcastNestedLoopJoin anywhere.
  *  - er_phonetic_blocked: the within-block JW census joins on the
  *    phonetic key (pkey a JOIN key, not a post-filter); no cartesian.
  *  - multimodal_phash_near_dup: the candidate stage is a keyed join on
  *    (band, bv) — a banded Hamming join, never an all-pairs product.
  *  - cluster_dbscan (the adaptive default; named cluster_dbscan_adaptive
  *    when this audit was written): exactly ONE cartesian in the whole plan,
  *    and it is the τ-derivation sample cross-join, bounded at
  *    sampleSize²/2 pairs BY CONSTRUCTION (500² = 125k at the default —
  *    independent of corpus size); the ε-candidate stage itself joins
  *    keyed on (seed, bucket).
  *  - ivfAssignAnn: centroid lookup is a BroadcastHashJoin on
  *    (seed, bucket) — the broadcast-sized centroid table never
  *    shuffles the vectors side for the probe.
  */
object ExplainR11 {
  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def cartesians(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("CartesianProduct") || l.contains("BroadcastNestedLoop"))

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    val multi = planOf(graft.SparkEntry.queries("er_multipass_blocked")(s, d))
    val pfxKeyed = multi.linesIterator.exists(l =>
      l.contains("Join") && l.contains("pfx"))
    val sfxKeyed = multi.linesIterator.exists(l =>
      l.contains("Join") && l.contains("sfx"))
    println(s"AUDIT er_multipass_blocked pfxInJoinKeys=$pfxKeyed " +
      s"sfxInJoinKeys=$sfxKeyed cartesian=${cartesians(multi)}")
    assert(pfxKeyed && sfxKeyed,
      "each pass's sub-key must be a JOIN key, not a filter")
    assert(cartesians(multi) == 0, "multipass must never plan a cartesian")

    val phon = planOf(graft.SparkEntry.queries("er_phonetic_blocked")(s, d))
    val pkeyKeyed = phon.linesIterator.exists(l =>
      l.contains("Join") && l.contains("pkey"))
    println(s"AUDIT er_phonetic_blocked pkeyInJoinKeys=$pkeyKeyed " +
      s"cartesian=${cartesians(phon)}")
    assert(pkeyKeyed, "the phonetic key must be a JOIN key")
    assert(cartesians(phon) == 0, "phonetic census must never plan a cartesian")

    val phash = planOf(graft.SparkEntry.queries("multimodal_phash_near_dup")(s, d))
    val banded = phash.linesIterator.exists(l =>
      l.contains("Join") && l.contains("band") && l.contains("bv"))
    println(s"AUDIT multimodal_phash_near_dup bandedJoin=$banded " +
      s"cartesian=${cartesians(phash)}")
    assert(banded, "pHash candidates must join on (band, bv)")
    assert(cartesians(phash) == 0,
      "the banded Hamming join must never plan an all-pairs product")

    // the GATE's returned plan hides both interesting stages (τ is
    // derived eagerly, pairs are localCheckpointed), so audit the
    // stages directly: (a) the ε-candidate join must key on
    // (seed, bucket); (b) the τ-sample cross-join must sit on top of
    // LIMIT-bounded inputs (sampleSize², independent of corpus size)
    val e = graft.Tables.embeddings(s, d)
    val candPlan = planOf(graft.operators.Dedup
      .embeddingNearDupPairsMultiTable(e, "embedding", "vec_id",
        minCosine = 0.3, planes = 5, seeds = Seq(7, 21), dims = 64))
    val bucketKeyed = candPlan.linesIterator.exists(l =>
      l.contains("Join") && l.contains("seed") && l.contains("bucket"))
    println(s"AUDIT dbscan_candidates bucketKeyed=$bucketKeyed " +
      s"cartesian=${cartesians(candPlan)}")
    assert(bucketKeyed, "ε-candidates must join keyed on (seed, bucket)")
    assert(cartesians(candPlan) == 0)
    val samp = e.orderBy(col("vec_id")).limit(500)
      .select(col("vec_id").as("sid"), col("embedding").as("sv"))
    val tauPlan = planOf(samp.select(col("sid").as("ida"), col("sv").as("va"))
      .crossJoin(samp.select(col("sid").as("idb"), col("sv").as("vb")))
      .where(col("ida") < col("idb")))
    // orderBy+limit compiles to TakeOrderedAndProject — the bounded-
    // input marker on each sample side
    val limited = tauPlan.linesIterator.count(l =>
      l.contains("TakeOrderedAndProject") || l.contains("GlobalLimit"))
    println(s"AUDIT tau_sample cartesian=${cartesians(tauPlan)} " +
      s"boundedSides=$limited")
    assert(limited >= 2,
      "both τ-sample sides must be LIMIT-bounded before the cross-join")

    import s.implicits._
    val vecs = (0L until 64L)
      .map(i => (i, Seq.tabulate(8)(j => ((i + j) % 5 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (1, Seq(0.0, 1.0, 0, 0, 0, 0, 0, 0)))
    val ann = planOf(graft.operators.Similarity.ivfAssignAnn(
      vecs, "embedding", "vec_id", cents, planes = 3, seeds = Seq(7, 21)))
    val bhj = ann.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("seed") &&
        l.contains("bucket"))
    println(s"AUDIT ivfAssignAnn broadcastHashJoinOnSeedBucket=$bhj " +
      s"cartesian=${cartesians(ann)}")
    assert(bhj, "centroid lookup must broadcast and hash-join on (seed, bucket)")
    assert(cartesians(ann) == 0)

    println("EXPLAIN_R11 OK")
    s.stop()
  }
}
