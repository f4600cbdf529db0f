package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, task retries, and reruns — useless for reproducible
  * train/val/test splits or auditable corpus mixing. Everything here keys
  * off a content hash of a stable id instead: the same row lands in the
  * same split/sample on every engine, every run, every partitioning, and
  * the operators are pure per-row Column trees (shuffle-free, pushdown-
  * friendly — a split filter prunes at the scan).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform pseudo-random bucket in [0, 1e6) from (id, salt) — the salt
    * decorrelates independent samples over the same ids. */
  def hashBucket(id: Column, salt: String): Column =
    pmod(HashFunctions.hash64(concat(id.cast("string"), lit("#" + salt))),
      lit(Buckets))

  /** Keep ~`fraction` of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.where(hashBucket(col(idCol), salt) < (fraction * Buckets).toLong)
  }

  /** Assign each row a named split by cumulative weight — e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Order matters (it
    * fixes the bucket ranges); weights must sum to 1.
    */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bucket = hashBucket(col(idCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => (w * Buckets).toLong)
    val expr = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** EXACT-proportion stratified split: within each stratum, rows rank
    * by content hash (stable pseudo-random order) and integer rank
    * thresholds cut the split boundaries — so every stratum lands
    * ⌊/⌈ wᵢ·n ⌉⌋-exact counts, where [[assignSplit]]'s per-row buckets
    * hold the proportions only in expectation (a 30-row stratum can
    * easily draw 26/1/3 instead of 24/3/3). The boundary compare is
    * all-integer (rn·10⁶ ≤ cumᵢ·n — both longs), so the assignment is
    * bit-portable with no float cutoffs.
    *
    * One window shuffle partitioned by stratum (rank + per-stratum
    * count share it); the cost profile of [[capPerGroup]].
    */
  def assignSplitStratified(df: DataFrame, idCol: String,
      strataCol: String, splits: Seq[(String, Double)],
      salt: String = "ssplit"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * Buckets)) // integer cumulative boundaries
    val expr = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(col("rn_") * Buckets <= lit(hi) * col("n_"), lit(name))
        .otherwise(rest)
    }
    df.withColumn("rn_", row_number().over(w))
      .withColumn("n_", count(lit(1)).over(wAll))
      .withColumn("split", expr)
      .drop("rn_", "n_")
  }

  /** Per-group cap — the "at most k documents per domain/source" rule of
    * corpus assembly, deterministic like every sampler here: rows rank
    * within their group by content hash (stable across runs/engines/
    * partitionings — NOT arrival order) and only the first `k` survive.
    * One window shuffle partitioned by group; no global sort; skewed
    * groups cost one task each at worst, bounded by the group's size.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
      salt: String = "cap"): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("rank_", row_number().over(w))
      .where(col("rank_") <= k)
      .drop("rank_")
  }

  /** Class-balanced downsample: every class kept at the MINORITY class's
    * size — [[capPerGroup]] with the cap derived from the data instead of
    * passed in. The cap rides as a broadcast 1-row relation (no driver
    * collect), selection order is the same content-hash rank as every
    * sampler here, so the surviving set is stable across runs, engines,
    * and partitionings. One count pass + one window shuffle on the class.
    */
  def balanceClasses(df: DataFrame, idCol: String, classCol: String,
      salt: String = "bal"): DataFrame = {
    val cap = df.groupBy(col(classCol)).agg(count(lit(1)).as("n_"))
      .agg(min(col("n_")).as("cap_"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("rank_", row_number().over(w))
      .crossJoin(broadcast(cap))
      .where(col("rank_") <= col("cap_"))
      .drop("rank_", "cap_")
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis-Spirakis A-ES scheme made deterministic: each row's key
    * is u^(1/w) with u a uniform in (0, 1] derived from the PORTABLE
    * content hash of (id, salt) — so, like every sampler here, the drawn
    * set is stable across runs, partitionings, and engines (no RNG
    * state, no seed-plus-partition-id games that re-deal on retry). The
    * k largest keys per group are exactly a weight-proportional draw
    * without replacement (Efraimidis & Spirakis 2006).
    *
    * u is the exact dyadic (h + 1)/2⁶⁰ — a 60-bit hash value shifted in
    * exponent only, so u itself carries no rounding; the single pow is
    * the one libm call, and only a last-ulp coincidence at the rank-k
    * boundary between two DIFFERENT keys could differ across engines
    * (ties on equal keys break by id). One window shuffle partitioned by
    * group; rank-k prunes below the sort via WindowGroupLimit — no
    * global sort at any scale.
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
      weightCol: String, groupCol: String, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k >= 1)
    // A-ES is defined for w > 0 only: a negative weight would make
    // 1/u >= 1 outrank every valid key and a zero weight is pow(u, Inf)
    // — both are upstream data bugs, excluded rather than sampled
    val df2 = df.where(col(weightCol) > 0)
    val u = (HashFunctions.hash64(concat(col(idCol).cast("string"),
      lit("#" + salt))) + 1).cast("double") / lit(math.pow(2, 60))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("es_key_").desc, col(idCol))
    df2.withColumn("es_key_", pow(u, lit(1.0) / col(weightCol)))
      .withColumn("rn_", row_number().over(w))
      .where(col("rn_") <= k)
      .drop("es_key_", "rn_")
  }

  /** Deterministic sequence packing — the corpus-assembly step that
    * groups documents into fixed token-budget training sequences.
    *
    * Docs hash into `groups` independent packing groups (content hash of
    * the id — partitioning/retry-stable like every sampler here) and pack
    * in id order within their group: a doc joins the sequence where its
    * group's running token total STARTS, i.e.
    * `seq_in_group = floor(cumsum_before / budget)`. A sequence's total
    * is bounded by `budget + max_doc_tokens` (the straddling doc) — the
    * streaming-friendly bound scalable packers accept; strict first-fit
    * is inherently sequential and cannot shard.
    *
    * One window shuffle PARTITIONED BY GROUP — no global sort; `groups`
    * scales with the cluster (each group packs independently, so more
    * groups = more parallelism, same bound). Global `seq_id` namespaces
    * group × sequence with a Long.MaxValue/groups stride — collision-free
    * until a single group exceeds ~9e18/groups sequences (i.e. never:
    * that would need more tokens than fit in a long), and all arithmetic
    * is integer (`div`), so no double-precision loss on huge cumsums.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
      budget: Long, groups: Int, salt: String = "pack"): DataFrame = {
    require(budget >= 1 && groups >= 1)
    val stride = Long.MaxValue / groups
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pack_group").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df
      .withColumn("pack_group",
        pmod(HashFunctions.hash64(concat(col(idCol).cast("string"),
          lit("#" + salt))), lit(groups.toLong)))
      .withColumn("start_", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("seq_id",
        col("pack_group") * lit(stride) + expr(s"start_ div ${budget}L"))
      .drop("start_")
  }

  /** The seq_id stride [[packSequences]] uses — exposed so external
    * twins (oracle SQL) derive the identical namespace. */
  def packStride(groups: Int): Long = Long.MaxValue / groups

  /** Temperature-based source rebalancing — the multilingual-corpus
    * downsampling rule (effective counts ∝ n_i^α, as in the XLM-R /
    * mBERT exponential-smoothing recipe) restated as a keep-rate with no
    * upsampling: `rate_i = (n_min / n_i)^(1-α)`. α=1 keeps everything;
    * α=0 downsamples every group to the smallest group's size (fully
    * balanced); in between, over-represented groups shrink smoothly.
    *
    * Rates derive from REAL per-group counts (one combiner-heavy
    * count agg; only one row per group reaches the driver — the same
    * statistics-driven-parameter pattern as [[graft.operators.SkewJoin]]'s
    * `bucketsFor`). The per-row filter compares the content-hash bucket
    * against an integer threshold joined in from a BROADCAST threshold
    * table (map-side, no shuffle of `df`) — deterministic across
    * runs/engines/partitionings, and safe at any group cardinality where
    * a when-chain Column tree would not analyze. Thresholds are integers
    * (`round(rate · 1e6)`) so external twins compare the same exact longs
    * rather than re-deriving a float cutoff. Rows with a null group are
    * dropped (inner-join semantics).
    */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, salt: String = "temp"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0)
    val spark = df.sparkSession
    import spark.implicits._
    // null-keyed groups are dropped (a null source has no count to
    // rebalance against — same rows-with-null-key semantics as an inner
    // join on the group column)
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(counts.nonEmpty, "temperatureSample: no non-null groups")
    val nMin = counts.map(_._2).min
    // thresholds join as a broadcast table, not a when-chain: group
    // cardinality is data-derived (domains can run to millions), and a
    // million-deep Column tree never analyzes — the table shape is the
    // same at any cardinality
    val thresholds = broadcast(counts.toSeq.map { case (s, n) =>
      (s, math.round(math.pow(nMin.toDouble / n, 1 - alpha) * Buckets))
    }.toDF("_src", "_thr"))
    df.join(thresholds, col(sourceCol).cast("string") === col("_src"))
      .where(hashBucket(col(idCol), salt) < col("_thr"))
      .drop("_src", "_thr")
  }

  /** Corpus mixing: keep each row with its source's rate — the
    * domain-weighting step of corpus assembly (e.g. wiki ×1.0, web ×0.3).
    * One scan, no union-of-filtered-copies; sources absent from `rates`
    * use `defaultRate`.
    */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0))
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((src, r), rest) => when(col(sourceCol) === src, lit(r)).otherwise(rest)
    }
    df.where(hashBucket(col(idCol), salt) < (rate * Buckets).cast("long"))
  }

  /** Curriculum phases: partition the corpus into `phases` difficulty
    * tiers by a numeric score (length-ordered curricula feed short docs
    * first; quality-ordered ones feed clean docs first). Phase 1 is the
    * lowest-score tier.
    *
    * NOT an ntile: a global ntile needs a total order — one partition
    * sorting the whole corpus. Instead the (phases−1) quantile thresholds
    * come from ONE exact `percentile` aggregate (only those scalars reach
    * the driver), and assignment is a per-row threshold compare —
    * embarrassingly parallel, partitioning-independent, pushdown-friendly.
    * Ties at a threshold all land in the lower phase (score > t), so
    * equal scores NEVER split across phases (an ntile splits them
    * arbitrarily); phase populations are near-equal only when the score
    * has enough distinct values. Thresholds are rounded to 6 digits so
    * external twins compare against the same cutoffs; with quarter
    * quantiles over integer scores the interpolation arithmetic is exact
    * in binary on any engine. At 100 TB swap `percentile` for
    * `approx_percentile` and keep the plan.
    */
  def curriculumPhases(df: DataFrame, idCol: String, scoreCol: String,
      phases: Int): DataFrame = {
    require(phases >= 2)
    val ps = (1 until phases).map(i => i.toDouble / phases)
    val cutsRaw = df
      .agg(expr(s"percentile($scoreCol, array(${ps.mkString(", ")}))"))
      .head().getSeq[Double](0)
    require(cutsRaw != null, "curriculumPhases: no non-null scores")
    val cuts = cutsRaw
      .map(t => BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val phase = cuts.foldLeft(lit(1): Column) {
      (acc, t) => acc + when(col(scoreCol) > lit(t), 1).otherwise(0)
    }
    // null scores have no place on a difficulty axis — dropped, not
    // silently parked in phase 1 (same rows-with-null-key semantics as
    // temperatureSample)
    df.where(col(scoreCol).isNotNull).withColumn("phase", phase)
  }

  /** DSIR-style importance scores for target-domain data selection (Xie
    * et al. 2023, arXiv:2302.03169): featurize every document as hashed
    * word-bigram buckets, estimate the target-domain and whole-corpus
    * bucket distributions with add-one smoothing, and score each document
    * by its features' mean likelihood lift
    * `r(b) = p_target(b)/p_corpus(b)
    *       = (n_tb+1)·(T+B) / ((n_b+1)·(T_t+B))`.
    *
    * Portability deviation from the paper, stated plainly: DSIR sums LOG
    * ratios (a product of likelihoods); ln() is the classic cross-engine
    * last-ulp divergence, so this variant scores by the MEAN of per-bucket
    * lifts — same inputs, same smoothing, monotone in each feature's
    * ratio, but not the same ordering as the log-sum in general. Each
    * lift is two IEEE-exact double products + one division, rounded to 6;
    * per-doc accumulation is a DECIMAL sum (order-independent); one final
    * division by the doc's feature count.
    *
    * Shape: one explode → ONE combiner-heavy bucket count with a
    * conditional target-side sum (no second pass for the target
    * distribution) → broadcast the B-row stats table back onto the
    * per-doc feature stream → per-doc sum. Docs with no bigram (a single
    * token) surface with n_features = 0, score NULL — visibly unscorable
    * rather than silently average.
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      isTargetCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 2)
    val toks = graft.functions.TextFunctions.tokens(lower(col(textCol)))
    val feat = docs
      .select(col(idCol), col(isTargetCol).as("is_t_"), toks.as("toks_"))
      .select(col(idCol), col("is_t_"),
        explode(when(size(col("toks_")) < 2,
            array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("toks_")) - 2),
            i => struct(element_at(col("toks_"), i + 1).as("l"),
              element_at(col("toks_"), i + 2).as("r"))))).as("bg"))
      .select(col(idCol), col("is_t_"),
        pmod(HashFunctions.hash64(concat_ws(" ", col("bg.l"), col("bg.r"))),
          lit(buckets.toLong)).as("b"))
    val stats = feat
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_b"),
        sum(when(col("is_t_"), 1L).otherwise(0L)).as("n_tb"))
    val totals = stats.agg(sum(col("n_b")).as("t_all"), sum(col("n_tb")).as("t_t"))
    val lifted = feat
      .join(broadcast(stats), "b")
      .crossJoin(broadcast(totals))
      .withColumn("lift", round(
        ((col("n_tb") + 1).cast("double") * (col("t_all") + buckets).cast("double")) /
          ((col("n_b") + 1).cast("double") * (col("t_t") + buckets).cast("double")), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(col("lift").cast("decimal(24,6)")).as("liftsum_"))
    docs.select(col(idCol))
      .join(lifted, Seq(idCol), "left")
      .withColumn("n_features", coalesce(col("n_features"), lit(0L)))
      // mean in exact integer micro-units with explicit half-up division:
      // round(double, 6) of the double mean can land on a representable
      // half-ulp tie (observed: 1.0783004999999999) where engines round
      // apart; (2s+n) div 2n never can
      .withColumn("sm_", (col("liftsum_") * 1000000).cast("long"))
      .withColumn("score",
        expr("(sm_ * 2 + n_features) div (n_features * 2)").cast("double")
          / 1000000.0)
      .select(col(idCol), col("n_features"), col("score"))
  }

  /** Split-leakage audit: candidate near-dup pairs that STRADDLE a
    * train/val/test assignment — the contamination a random split
    * guarantees in a deduplicated-but-not-clustered corpus (near-dups
    * are assigned independently, so a duplicate pair crosses the split
    * with probability 2·p·(1−p)). Eval numbers on a leaky split measure
    * memorization; this is the pre-training audit that catches it.
    *
    * `pairs` is any candidate pair relation (a, b) — minhash bands,
    * embedding buckets, simhash radius; `assigned` is (idCol, split).
    * Two slim equi-joins against the assignment relation (broadcast when
    * the assignment is a projection of a dimension; shuffled hash
    * otherwise), then the cross-split filter. Output:
    * (a, b, split_a, split_b), cross-split rows only.
    */
  def splitLeakage(pairs: DataFrame, assigned: DataFrame,
      idCol: String): DataFrame =
    pairs
      .join(assigned.select(col(idCol).as("a"), col("split").as("split_a")), "a")
      .join(assigned.select(col(idCol).as("b"), col("split").as("split_b")), "b")
      .where(col("split_a") =!= col("split_b"))
      .select(col("a"), col("b"), col("split_a"), col("split_b"))

  /** Cluster-aware split assignment — the FIX for what [[splitLeakage]]
    * measures: every near-dup CLUSTER (connected component of the pair
    * graph) is assigned to one split atomically, keyed by the hash of
    * the component's canonical id, so no candidate pair can straddle a
    * boundary — leakage is zero by construction, not by luck
    * (spec-asserted via the audit itself). Singleton documents keep
    * their own id as component and split independently, preserving
    * [[assignSplit]]'s proportions in expectation over the cluster-mass
    * distribution.
    *
    * Cost = the component closure (size-adaptive
    * [[Components.connectedComponents]]) + one per-row hash — the
    * closure is already computed by any dedup pass that keeps one doc
    * per cluster, so in a real pipeline this split is free.
    * Output: (idCol, component, split).
    */
  def clusterSplit(items: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    val comp = Components.connectedComponents(
      items.select(col(idCol).as("id")), pairs)
    assignSplit(comp, "component", splits, salt)
      .select(col("id").as(idCol), col("component"), col("split"))
  }

  /** Token-budget mixture solver — the feasibility arithmetic run BEFORE
    * a mixture sample: given per-source available token mass and target
    * mixture weights w_s = num_s/den_s, the largest total budget T with
    * T·w_s ≤ avail_s for every weighted source is
    * T = min_s ⌊avail_s·den_s / num_s⌋, and each source contributes
    * take_s = ⌊T·num_s / den_s⌋. ALL-INTEGER (weights are rationals, no
    * float mixture math), so the plan is engine-exact; the `binding`
    * flag marks the scarce source(s) that cap the corpus — the answer to
    * "what do I need more of to hit my mixture at budget X".
    *
    * One combiner-heavy per-source token count + a broadcast weight
    * table + a scalar min — nothing scales with rows but the first
    * aggregation. Sources absent from `weights` are excluded (weight 0).
    * Output: (source, avail_tokens, w_num, w_den, take_tokens, binding).
    */
  /** Padding-waste audit for length-bucketed batching: every sequence
    * batch pads to its longest member, so batch composition decides how
    * many pad tokens a training/inference run burns. Two layouts are
    * costed on the SAME deterministic hash order — `hash` (batches cut
    * from the global hash order, length-blind) vs `bucketed` (rows first
    * grouped into ⌊len/bucketWidth⌋ length bands, batches cut inside
    * each band) — and the padding bill Σ_batches (B·max_len − Σ len) is
    * ALL-INTEGER, so the comparison is engine-exact. This is the
    * pre-flight that justifies (or rejects) a bucketing shuffle before
    * a 100 TB tokenization run; the typical verdict is a 30–60% padding
    * cut for one extra sort key.
    *
    * The audit uses global row_number windows (fine for a pre-flight;
    * at full scale run it on a hash sample — the padding shares
    * converge fast). The production batch WRITER is [[packSequences]]'s
    * range-exchange shape, not this window.
    *
    * Output: (layout, n_batches, total_tokens, total_padding,
    * padding_share) — 2 rows.
    */
  def paddingAudit(df: DataFrame, idCol: String, tokenCountCol: String,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id_"),
      col(tokenCountCol).cast("long").as("len_"),
      hashBucket(col(idCol), "batch").as("h_"))
    def cost(layout: String, batched: DataFrame): DataFrame = batched
      .groupBy(col("batch_"))
      .agg(count(lit(1)).as("n_"), max(col("len_")).as("mx_"),
        sum(col("len_")).as("sm_"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("sm_")).as("total_tokens"),
        sum(col("n_") * col("mx_") - col("sm_")).as("total_padding"))
      .select(lit(layout).as("layout"), col("n_batches"),
        col("total_tokens"), col("total_padding"),
        round(col("total_padding").cast("double") /
          (col("total_tokens") + col("total_padding")).cast("double"), 6)
          .as("padding_share"))
    val hashed = base.withColumn("batch_",
      ((row_number().over(Window.orderBy(col("h_"), col("id_"))) - 1)
        / batchSize).cast("long"))
    val bucketed = base
      .withColumn("bkt_", expr(s"len_ div $bucketWidth"))
      .withColumn("batch_", concat_ws(":", col("bkt_"),
        ((row_number().over(Window.partitionBy(col("bkt_"))
          .orderBy(col("h_"), col("id_"))) - 1) / batchSize).cast("long")))
    cost("hash", hashed).unionByName(cost("bucketed", bucketed))
  }

  def tokenBudgetMixture(docs: DataFrame, textCol: String,
      sourceCol: String, weights: Seq[(String, Long, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall { case (_, n, d) => n >= 1 && d >= n })
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(sourceCol, "w_num", "w_den")
    val avail = docs
      .select(col(sourceCol),
        size(graft.functions.TextFunctions.tokens(col(textCol))).as("n_"))
      .groupBy(col(sourceCol))
      .agg(sum(col("n_").cast("long")).as("avail_tokens"))
      .join(broadcast(w), sourceCol)
    val tmax = avail
      .select(expr("(avail_tokens * w_den) div w_num").as("cap"))
      .agg(min(col("cap")).as("t_max"))
    avail.crossJoin(broadcast(tmax))
      .select(col(sourceCol), col("avail_tokens"), col("w_num"), col("w_den"),
        expr("(t_max * w_num) div w_den").as("take_tokens"),
        (expr("(avail_tokens * w_den) div w_num") === col("t_max"))
          .as("binding"))
  }
}
