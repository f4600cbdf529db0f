package graft.operators

import graft.functions.JaroWinkler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): blocking → pairwise string
  * scoring → threshold → transitive closure to entity ids. The classic
  * Fellegi-Sunter pipeline skeleton, built from the engine's existing
  * scale pieces — the same candidate-generation discipline as the dedup
  * family (never all-pairs) and the same size-adaptive component
  * resolver as the LSH dedup graph.
  *
  * Physical shape at 100 TB:
  *  - blocking IS the scale lever: candidates meet only inside a block
  *    (hash equi-join on the block key), so total pair volume is
  *    Σ blockSize², not N². Block keys should be cheap and high-recall
  *    (region + name prefix, phonetic key, …);
  *  - a hot block with f records fans out f² — `blockMax` drops blocks
  *    larger than the cap BEFORE the self-join (window count over the
  *    block key, the df-cap pattern from SparseSim/ngramJaccard). An
  *    oversized block means the key under-discriminates: widen the key
  *    rather than raise the cap;
  *  - scoring is the native codegen'd [[JaroWinkler]] expression — one
  *    static call per candidate row inside whole-stage codegen, no
  *    interpreted UDF in the hot path;
  *  - scores are rounded to 6dp BEFORE thresholding, so the keep/drop
  *    decision is identical on any engine that computes the same
  *    rational value (the repo-wide round-then-compare discipline);
  *  - the closure reuses [[Components.connectedComponents]]: driver
  *    union-find under 2²² edges, distributed min-label propagation
  *    above — ER pair graphs are sparse post-threshold, so the small
  *    path is the common case.
  */
object EntityResolution {

  /** Candidate pairs (a < b) inside each block with rounded
    * Jaro-Winkler score >= minSim. Output: (a, b, sim).
    */
  def scoredPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double,
      blockMax: Long = Long.MaxValue): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — all-pairs ER does not scale")
    val base0 = df.select(
      (col(idCol).as("rid_") +: col(nameCol).as("rname_") +:
        blockCols.map(c => col(c))): _*)
    val base =
      if (blockMax == Long.MaxValue) base0
      else base0
        .withColumn("bs_",
          count(lit(1)).over(Window.partitionBy(blockCols.map(col): _*)))
        .where(col("bs_") <= blockMax)
        .drop("bs_")
    val l = base.select(
      (col("rid_").as("a") +: col("rname_").as("na_") +:
        blockCols.map(c => col(c))): _*)
    val r = base.select(
      (col("rid_").as("b") +: col("rname_").as("nb_") +:
        blockCols.map(c => col(c))): _*)
    l.join(r, blockCols)
      .where(col("a") < col("b"))
      .withColumn("sim", round(JaroWinkler.sim(col("na_"), col("nb_")), 6))
      .where(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Prefix length (in characters) for EXTENDING an under-discriminating
    * block key — the statistics-derived-parameter rule (planesFor /
    * hubMaxFor / frequentPairsRelative family) for hash blocking.
    *
    * Natural low-cardinality keys (country, segment, zip prefix) have a
    * FIXED block count, so occupancy grows with the corpus and in-block
    * pair work grows quadratically — measured 51.7× candidate growth on
    * a 10× corpus over the 125 nation×segment blocks (SCALE_NOTES r10).
    * `blockMax` cannot save this shape: at scale EVERY natural block is
    * oversized, so purging collapses recall to zero. The scalable cure
    * is widening the key with a name PREFIX sub-key: true near-matches
    * differ in their trailing characters far more often than their
    * leading ones (the prefix-blocking assumption, same premise as
    * Jaro-Winkler's prefix bonus), so co-blocking of matches survives
    * while occupancy drops 10× per prefix character.
    *
    * Rule: the shortest prefix length that brings expected occupancy
    * n / (naturalBlocks · alphabet^len) under `targetBlockSize`,
    * assuming ~`alphabet` effective symbols per position (10 for the
    * digit-tail names this repo blocks on; pass 26 for alphabetic).
    * Work is then ≤ targetBlockSize · n at any corpus size — linear,
    * with the recall trade measured by [[blockingAudit]] rather than
    * asserted.
    */
  def prefixLenFor(n: Long, naturalBlocks: Long,
      targetBlockSize: Long = 128, alphabet: Int = 10): Int = {
    require(n >= 0 && naturalBlocks >= 1 && targetBlockSize >= 1 &&
      alphabet >= 2)
    // smallest len with denom·alphabet^len >= n, in INTEGER arithmetic
    // (= ceil(log_a(ceil(n/denom)))): the FP ceil(ln/ln) form can flip by
    // one at exact boundary sizes (n = denom·a^k) when libm rounding
    // differs between the engine and the oracle runtime — the repeated-
    // multiply rule is runtime-independent
    val denom = naturalBlocks * targetBlockSize
    val q = (n + denom - 1) / denom // ceil(n/denom)
    var len = 0
    var pw = 1L
    while (pw < q) {
      len += 1
      // overflow guard: past MaxValue/alphabet the true product already
      // exceeds any q, so saturating preserves the comparison
      pw = if (pw > Long.MaxValue / alphabet) Long.MaxValue else pw * alphabet
    }
    len
  }

  /** Entity ids: every record labeled with the minimum record id of its
    * connected component in the >= minSim pair graph (singletons label
    * themselves). Output: (id, component).
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double,
      blockMax: Long = Long.MaxValue): DataFrame = {
    val pairs = scoredPairs(df, idCol, nameCol, blockCols, minSim, blockMax)
      .select(col("a"), col("b"))
    Components.connectedComponents(df.select(col(idCol).as("id")), pairs)
  }

  /** Merge-conflict audit over resolved entities — "did the closure
    * over-merge": for every multi-member entity, do its members agree on
    * a STRONG attribute the blocking key does not already force equal?
    * Transitive closure chains A≈B≈C into one entity even when A and C
    * never scored — a conflicting strong attribute inside an entity is
    * the classic symptom (the chain crossed two real-world records).
    * This is the post-resolution governance twin of [[blockingAudit]]
    * (which measures candidate quality PRE-closure).
    *
    * Output per multi-member entity: (component, n_members,
    * n_strong_values, conflict) — exact integer census, one broadcast
    * join of the model-size entity labels back to the records.
    */
  def conflictAudit(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double,
      strongCol: org.apache.spark.sql.Column): DataFrame = {
    val ents = entities(df, idCol, nameCol, blockCols, minSim)
    df.select(col(idCol).as("id"), strongCol.as("strong_"))
      .join(ents, "id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("strong_")).as("n_strong_values"))
      .where(col("n_members") > 1)
      .withColumn("conflict", col("n_strong_values") > 1)
  }

  /** Multi-pass blocking (the other half of Hernández & Stolfo 1995):
    * the DISTINCT union of [[scoredPairs]] over several cheap block-key
    * sets. Each pass is linear (Σ block² within its own key) and a true
    * match survives if ANY pass co-blocks it — the standard cure for
    * single-key retention loss (a prefix pass keeps matches that agree
    * in their LEADING characters; a suffix pass catches the
    * leading-character edits the prefix pass drops; a phonetic pass
    * catches respellings). Candidate volume is at most the SUM of the
    * passes — still linear — and the rounded JW score is identical
    * across passes, so `distinct` collapses multi-blocked pairs exactly.
    */
  def multiPassPairs(df: DataFrame, idCol: String, nameCol: String,
      passes: Seq[Seq[String]], minSim: Double): DataFrame = {
    require(passes.nonEmpty && passes.forall(_.nonEmpty))
    passes.map(cols => scoredPairs(df, idCol, nameCol, cols, minSim))
      .reduce(_ unionByName _)
      .distinct()
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the OTHER
    * classical blocking family: rank records by a sort key and compare
    * each to its next `windowSize−1` neighbors. Catches near-matches
    * that hash blocking splits across blocks (adjacent names in
    * different nations) at a FIXED candidate budget n·(w−1) — the
    * RR/PC trade [[blockingAudit]] measures, from the other end.
    *
    * One total-order window (rank ties broken by id — deterministic),
    * an in-row offset explode, one uniform-key equi-join on rank.
    * At 100 TB the global sort is a range exchange, the same cost
    * class as any repartitionByRange write. Output: (a, b, sim) with
    * rounded JW ≥ minSim, `a` the lower-ranked record.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      nameCol: String, windowSize: Int, minSim: Double): DataFrame = {
    require(windowSize >= 2 && windowSize <= 64)
    val w = Window.orderBy(col("rname_"), col("rid_"))
    val ranked = df
      .select(col(idCol).as("rid_"), col(nameCol).as("rname_"))
      .withColumn("rk_", row_number().over(w))
    ranked
      .select(col("rid_").as("a"), col("rname_").as("na_"), col("rk_"),
        explode(array((1 until windowSize).map(lit(_)): _*)).as("off_"))
      .withColumn("rk2_", col("rk_") + col("off_"))
      .join(ranked.select(col("rid_").as("b"), col("rname_").as("nb_"),
        col("rk_").as("rk2_")), "rk2_")
      .withColumn("sim", round(JaroWinkler.sim(col("na_"), col("nb_")), 6))
      .where(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Blocking-quality audit — the two numbers every linkage textbook
    * demands before trusting a blocking scheme (Christen 2012):
    *
    *  - reduction ratio RR = 1 − candidates/total: how much comparison
    *    work the blocks save, from COUNT relations only — Σ c(c−1)/2
    *    per block over n(n−1)/2 — no pair is ever materialized;
    *  - pair completeness PC = captured/true: what fraction of true
    *    matches the blocks keep, estimated on a deterministic
    *    `sampleMod` record sample whose all-pairs JW ≥ minSim truth IS
    *    computable (truth needs all pairs by definition; the sample
    *    bounds that to a broadcast-sized cross join, the standard
    *    labeled-subset methodology made deterministic).
    *
    * The tension RR ↑ vs PC ↓ is the whole design space of blocking;
    * this audit is the instrument that places a scheme in it. Output:
    * one row (n_records, total_pairs, n_candidates, reduction_ratio,
    * sample_n, n_true, n_captured, pair_completeness).
    */
  def blockingAudit(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double, sampleMod: Long): DataFrame = {
    require(blockCols.nonEmpty && sampleMod >= 1)
    val n = df.agg(count(lit(1)).as("n_records"))
    val cand = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("c_"))
      .agg(coalesce(sum(expr("c_ * (c_ - 1) div 2")), lit(0L))
        .as("n_candidates"))
    val s = df.where(col(idCol) % sampleMod === 0)
      .select((col(idCol).as("sid_") +: col(nameCol).as("sname_") +:
        blockCols.map(col)): _*)
    val truth = s.select(col("sid_").as("a_"), col("sname_").as("na_"),
        struct(blockCols.map(col): _*).as("ba_"))
      .join(broadcast(s.select(col("sid_").as("b_"),
        col("sname_").as("nb_"), struct(blockCols.map(col): _*).as("bb_"))),
        col("a_") < col("b_"))
      .where(round(JaroWinkler.sim(col("na_"), col("nb_")), 6) >= minSim)
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("ba_") === col("bb_"), 1L).otherwise(0L))
          .as("n_captured"))
    val sn = s.agg(count(lit(1)).as("sample_n"))
    n.crossJoin(cand).crossJoin(sn).crossJoin(truth)
      .select(col("n_records"),
        expr("n_records * (n_records - 1) div 2").as("total_pairs"),
        col("n_candidates"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          expr("n_records * (n_records - 1) div 2").cast("double"), 6)
          .as("reduction_ratio"),
        col("sample_n"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_captured"), lit(0L)).as("n_captured"),
        when(coalesce(col("n_true"), lit(0L)) > 0,
          round(col("n_captured").cast("double") /
            col("n_true").cast("double"), 6)).as("pair_completeness"))
  }
}
