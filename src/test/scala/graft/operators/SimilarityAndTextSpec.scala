package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityAndTextSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine, self first") {
    val got = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      Seq(1.0f, 0.0f, 0.0f), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == Seq(0L, 1L))
    assert(got.head._2 == 1.0)
  }

  test("knnJoin excludes self and ranks per query") {
    val got = Similarity.knnJoin(vecs, vecs.where(col("vec_id") === 0),
      "embedding", "vec_id", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(got == Seq((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("IVF: assignment picks nearest centroid; probe search scans probed cells only") {
    val centroids = Similarity.pickCentroids(vecs, "embedding", "vec_id", numCells = 2)
    assert(centroids.map(_._1) == Seq(0, 1))
    val assigned = Similarity.ivfAssign(vecs, "embedding", "vec_id", centroids)
    val cells = assigned.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cells(0L) == 0 && cells(2L) == 1)
    val got = Similarity.ivfSearch(assigned, "embedding", "vec_id", centroids,
      Seq(1.0f, 0.0f, 0.0f), k = 2, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L)
  }

  test("ivfAssignAnn: centroid-coincident vectors assign exactly; empty buckets fall back") {
    val centroids = Similarity.pickCentroids(vecs, "embedding", "vec_id", numCells = 2)
    val ann = Similarity.ivfAssignAnn(vecs, "embedding", "vec_id",
      centroids, planes = 2, seeds = Seq(7, 21))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(ann.size == 4 && ann.values.forall(c => c == 0 || c == 1))
    // a vector with a centroid's exact coordinates co-buckets with it
    // (identical signs, identical sums) and cosine 1 wins the argmax
    assert(ann(0L) == 0)
    assert(ann(1L) == 1)
    // a vector OPPOSITE the only centroid never co-buckets with it
    // under one plane (signs flip with the dot): at probeHamming = 0
    // the deterministic min-cell fallback fires instead of dropping
    // the row; at radius 1 the flipped-plane probe reaches the
    // centroid's bucket and assigns through the argmax instead
    import spark.implicits._
    val lone = Seq((9L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    Seq(0, 1).foreach { radius =>
      val fb = Similarity.ivfAssignAnn(lone, "embedding", "vec_id",
        Seq((5, Seq(1.0, 0.0, 0.0))), planes = 1, seeds = Seq(7),
        probeHamming = radius)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
      assert(fb(9L) == 5)
    }
  }

  test("kmeansRefineAnn: degenerates to exact refine when every bucket is probed") {
    val cents = Similarity.pickCentroids(vecs, "embedding", "vec_id", numCells = 2)
    val exact = Similarity.kmeansRefine(vecs, "embedding", "vec_id", cents, iters = 2)
    // planes=1 with Hamming-1 multi-probe covers BOTH buckets — the ANN
    // assignment equals the exact argmax, so the refined centroids are
    // bit-identical across both Lloyd rounds
    val ann = Similarity.kmeansRefineAnn(vecs, "embedding", "vec_id", cents,
      planes = 1, seeds = Seq(7), iters = 2)
    assert(ann == exact)
  }

  test("PQ: encode groups clustered vectors, ADC ranks the query's cluster first") {
    import spark.implicits._
    // two tight clusters in 8 dims (axis-aligned); m=2 subspaces of 4
    def v(base: Double, jitter: Double) =
      Seq(base + jitter, base, 0.1, 0.1, 0.1, 0.1, base, base + jitter).map(_.toFloat)
    val vecs = (0L to 5L).map { i =>
      if (i % 2 == 0) (i, v(1.0, 0.01 * i)) else (i, v(-1.0, 0.01 * i))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vecs, "embedding", "vec_id",
      m = 2, codebookSize = 2, dims = 8, iters = 1)
    assert(cb.map(_._1).toSet == Set(0, 1)) // both subspaces trained
    val enc = Similarity.pqEncode(vecs, "embedding", "vec_id", cb, m = 2, dims = 8)
    val codes = enc.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    // same-cluster vectors share codes; opposite clusters differ
    assert(codes(0L) == codes(2L) && codes(2L) == codes(4L))
    assert(codes(1L) == codes(3L) && codes(0L) != codes(1L))
    // ADC with a cluster-0-like query ranks all of cluster 0 above cluster 1
    val top = Similarity.pqAdcSearch(enc, "vec_id", cb, v(1.0, 0.0), k = 3, m = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(0L, 2L, 4L))
  }

  test("refined PQ: unit-mean codebooks have unit-scale norms, rerank recovers exact top-k") {
    import spark.implicits._
    def v(base: Double, jitter: Double) =
      Seq(base + jitter, base, 0.1, 0.1, 0.1, 0.1, base, base + jitter).map(_.toFloat)
    val vecs = (0L to 5L).map { i =>
      if (i % 2 == 0) (i, v(1.0, 0.01 * i)) else (i, v(-1.0, 0.01 * i))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainUnitMeans(vecs, "embedding", "vec_id",
      m = 2, codebookSize = 2, dims = 8, iters = 1)
    // mean centroids of unit-normalized members stay O(1)-normed — the
    // property the dot/norm ADC depends on (sum-centroids would be ~3×)
    cb.foreach { case (_, _, cv) =>
      val n = math.sqrt(cv.map(x => x * x).sum)
      assert(n > 0.1 && n <= 1.01, s"centroid norm $n outside unit scale")
    }
    val enc = Similarity.pqEncode(vecs, "embedding", "vec_id", cb, m = 2, dims = 8)
    val q = v(1.0, 0.0)
    val exact = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, k = 3)
      .collect().map(_.getLong(0)).toSet
    // shortlist = corpus here, so rerank MUST equal exact top-k
    val got = Similarity.pqAdcRerank(enc, vecs, "embedding", "vec_id", cb,
      q, k = 3, m = 2, shortlist = 6)
      .collect().map(_.getLong(0)).toSet
    assert(got == exact)
    // and a tight shortlist still ranks the query's cluster first
    val tight = Similarity.pqAdcRerank(enc, vecs, "embedding", "vec_id", cb,
      q, k = 3, m = 2, shortlist = 3)
      .collect().map(_.getLong(0)).toSet
    assert(tight == Set(0L, 2L, 4L))
  }

  test("langId picks the stopword-dominant language, und for no hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is fine"),
      (2L, "el perro y la casa de los vecinos se ven"),
      (3L, "zzz qqq www"))
      .toDF("doc_id", "text")
      .withColumn("lang", TextAnalysis.langId(col("text")))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("qualityFeatures ratios and composite score") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    assert(r.getAs[Int]("n_tokens") == 10)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    assert(r.getAs[Double]("stopword_ratio") == 0.2) // the, the
    assert(r.getAs[Double]("quality_score") == 1.0)
  }

  test("fingerprints stable under case and whitespace noise") {
    import spark.implicits._
    val df = Seq((1L, "Hello  World"), (2L, "hello world "))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "text")
      .select("fingerprint").collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("redactPii counts and masks emails, urls, phones; url consumed before email") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to a.b@x.io or c@y.org today"),
      (2L, "see https://x.io/p?u=a@b.com and call 555-123-4567"),
      (3L, "clean text only"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_emails") == 2)
    assert(r(1L).getAs[String]("redacted") == "write to <EMAIL> or <EMAIL> today")
    // the email inside the URL is swallowed by <URL>, not double-masked
    assert(r(2L).getAs[Int]("n_urls") == 1 && r(2L).getAs[Int]("n_phones") == 1)
    assert(r(2L).getAs[String]("redacted") == "see <URL> and call <PHONE>")
    assert(r(3L).getAs[String]("redacted") == "clean text only")
  }

  test("SQ8: codes bounded 0..255, constant dims decode to min, search recalls brute force") {
    import spark.implicits._
    // 4-dim vectors; dim 4 is constant (max == min edge case)
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.2f, 0.5f)),
      (1L, Seq(0.9f, 0.1f, -0.3f, 0.5f)),
      (2L, Seq(0.0f, 1.0f, 0.8f, 0.5f)),
      (3L, Seq(-1.0f, 0.2f, 0.1f, 0.5f)))
      .toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.sqCalibrate(df, "embedding")
    assert(mins == Seq(-1.0f, 0.0f, -0.3f, 0.5f).map(_.toDouble) &&
      maxs == Seq(1.0f, 1.0f, 0.8f, 0.5f).map(_.toDouble))
    val enc = Similarity.sqEncode(df, "embedding", "vec_id", mins, maxs)
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes(0L)(0) == 255 && codes(3L)(0) == 0) // range endpoints
    assert(codes.values.forall(_(3) == 0))           // constant dim → code 0
    // dequantized constant dim is exactly min
    val deq = enc.select(col("vec_id"),
      Similarity.sqDequantize(col("codes"), mins, maxs).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(deq.values.forall(_(3) == 0.5))
    // 8-bit resolution on a 2.0-wide range ⇒ error ≤ half a step
    df.collect().foreach { r =>
      val raw = r.getSeq[Float](1); val d = deq(r.getLong(0))
      raw.zip(d).zip(maxs.zip(mins)).foreach { case ((x, xq), (mx, mn)) =>
        assert(math.abs(x - xq) <= (mx - mn) / 255.0 / 2 + 1e-12) }
    }
    // asymmetric search agrees with brute force on this easy set
    val got = Similarity.sqSearch(enc, "vec_id", mins, maxs,
      Seq(1.0f, 0.0f, 0.2f, 0.5f), k = 2).collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id",
      Seq(1.0f, 0.0f, 0.2f, 0.5f), k = 2).collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("labelCentroids: exact per-label per-dimension means") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(3.0f, 1.0f)),   // label 0: mean (2.0, 0.5)
      (1, Seq(-1.0f, 4.0f)))                         // label 1: itself
      .toDF("label", "embedding")
    val got = Similarity.labelCentroids(df, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 2.0, (0, 1) -> 0.5, (1, 0) -> -1.0, (1, 1) -> 4.0))
  }

  test("vocabulary: tf/df counts, top-k by tf then term") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "a c"), (3L, "b z")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(df, "text", "doc_id", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 2L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("corpusFilter: each rule fires on its pathological doc, clean doc kept") {
    import spark.implicits._
    val clean = ("the quick brown fox jumps over the lazy dog and then " +
      "it runs to the old mill where a friendly miller offers it a meal " +
      "of bread and cheese which the fox gladly accepts before heading home") // 40+ toks, stopwords, no punct
    val df = Seq(
      (1L, clean),
      (2L, "short doc"),                                  // too short
      (3L, ("lorem ipsum dolor sit amet " * 10).trim),    // repeated 2-grams + no stopwords
      (4L, clean + " " + ("!@#$%^&*()" * 60)))            // punct spam
      .toDF("doc_id", "text")
    val r = TextAnalysis.corpusFilter(df, "text", "doc_id",
      minTokens = 10, minStopRatio = 0.05, maxPunctRatio = 0.2,
      maxTopGramRatio = 0.15)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5))).toMap
    assert(r(1L) == ((false, false, false, false, true)))
    assert(r(2L)._1 && !r(2L)._5)                         // too short, dropped
    assert(r(3L)._2 && r(3L)._4 && !r(3L)._5)             // low stopword + repetitive
    assert(r(4L)._3 && !r(4L)._5)                         // high punct
  }

  test("repetitionStats: top-2-gram share, duplicate-5-gram share, short-doc nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),       // 2-grams: ab,ba,ab,ba,ab → top "a b" 3/5
      (2L, "c c c c c c c"),     // 5-grams: 3 copies of "c c c c c" → all dup
      (3L, "x"))                 // too short for any gram
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 5 && r(1L).getDouble(2) == 0.6)
    assert(r(1L).getLong(3) == 2 && r(1L).getDouble(4) == 0.0)
    assert(r(2L).getLong(3) == 3 && r(2L).getDouble(4) == 1.0)
    assert(r(3L).getLong(1) == 0 && r(3L).isNullAt(2))
    assert(r(3L).getLong(3) == 0 && r(3L).isNullAt(4))
  }

  test("cooccurrence: window-2 unordered pairs, no out-of-bounds neighbors") {
    import spark.implicits._
    // doc "a b c": offsets give (a,b), (a,c), (b,c); doc "b a": (a,b)
    val df = Seq((1L, "a b c"), (2L, "b a")).toDF("doc_id", "text")
    val r = TextAnalysis.cooccurrence(df, "text", "doc_id", window = 2, topK = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    // window 1 drops the distance-2 pair
    val r1 = TextAnalysis.cooccurrence(df, "text", "doc_id", window = 1, topK = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r1 == Map(("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("bigramLm: conditional probabilities sum to 1 per prefix, exact ratios") {
    import spark.implicits._
    // "a b", "a b", "a c" → P(b|a)=0.75 across docs? No: per-doc bigrams:
    // doc1 "a b a c": (a,b),(b,a),(a,c); doc2 "a b": (a,b)
    val df = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(df, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 0.666667)), // 2 of 3 a-prefixed bigrams
      ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("bigramLmScore: per-doc mean bigram probability under the corpus LM") {
    import spark.implicits._
    // corpus LM over both docs: P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1
    val df = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc1 bigrams (a,b),(b,a),(a,c): mean(0.666667, 1.0, 0.333333)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - 2.0 / 3) < 1e-6)
    // doc2: single bigram (a,b) → its prob
    assert(got(2L) == ((1L, 0.666667)))
    // the single-token/empty doc contributes nothing and is absent
    val withEmpty = TextAnalysis.bigramLmScore(
      df.unionByName(Seq((3L, "z")).toDF("doc_id", "text")), "text", "doc_id")
    assert(withEmpty.count() == 2)
  }

  test("concordance: edge-truncated contexts, 1-based positions") {
    import spark.implicits._
    val df = Seq((1L, "x a b x c"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.concordance(df, "text", "doc_id", "x", window = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getString(4))).toMap
    assert(got == Map(
      (1L, 1) -> (("", "a b")),      // doc start: empty left
      (1L, 4) -> (("a b", "c")),     // mid: full left, truncated right
      (2L, 1) -> (("", ""))))        // singleton doc: both empty
  }

  test("labelPropagate: majority of k nearest labeled, ties to smaller label") {
    import spark.implicits._
    val labeled = Seq(
      (1L, Seq(1.0f, 0.0f), 5), (2L, Seq(0.95f, 0.31f), 5),
      (3L, Seq(0.9f, 0.44f), 7), (4L, Seq(0.0f, 1.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val unl = Seq((100L, Seq(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = Similarity.labelPropagate(labeled, unl,
      "embedding", "vec_id", "label", k = 3, dims = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // 3 nearest: ids 1,2 (label 5) and 3 (label 7) → majority 5 with 2 votes
    assert(got.toSeq == Seq((100L, 5, 2L)))
    // tie case: k=2 → one vote each for 5 and 7 → smaller label wins
    val tied = Similarity.labelPropagate(labeled.where($"vec_id" =!= 2L), unl,
      "embedding", "vec_id", "label", k = 2, dims = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(tied.toSeq == Seq((5, 1L)))
  }

  test("hardNegatives: nearest different-label vectors only") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // query
      (1L, Seq(0.99f, 0.14f), 0), // same label — excluded despite proximity
      (2L, Seq(0.9f, 0.44f), 1),  // nearest wrong-label
      (3L, Seq(0.0f, 1.0f), 1))   // far wrong-label
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(e, e.where($"vec_id" === 0),
      "embedding", "vec_id", "label", k = 2, dims = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(4)))
    assert(got.toSeq == Seq((0L, 2L, 1, 1), (0L, 3L, 1, 2)))
  }

  test("matryoshkaAudit: prefix ranking with full-score attachment") {
    import spark.implicits._
    // 4-dim vectors; prefix = first 2 dims. v1 matches q on the prefix
    // but diverges on the tail; v2 matches fully.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0.0f, 1.0f, 0.0f)
    val got = Similarity.matryoshkaAudit(vecs, "embedding", "vec_id", q,
      prefixDims = 2, k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    // prefix space: v1 and v2 both cosine 1.0 with q-prefix → tie, id asc
    assert(got(1L)._1 == 1 && got(2L)._1 == 2)
    assert(got(1L)._2 == 1.0 && got(2L)._2 == 1.0)
    // full space: v2 = 1.0 (in full top-k), v1 = 0.5
    assert(got(2L)._3 == 1.0 && got(2L)._4)
    assert(got(1L)._3 == 0.5 && got(1L)._4) // k=2 of 3 vectors: still in
  }

  test("docKeywords: rare terms outrank common ones, rank capped at k") {
    import spark.implicits._
    // "z" appears only in doc 1 (df=1); "a" in all three (df=3)
    val df = Seq((1L, "a a a z"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.docKeywords(df, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // doc1: z → 1·3/1 = 3.0 beats a → 3·3/3 = 3.0? tie → term asc: a first.
    // scores: a = 3*3/3 = 3.0, z = 1*3/1 = 3.0 — tie broken by term
    assert(got((1L, 1)) == (("a", 3.0)))
    assert(got((1L, 2)) == (("z", 3.0)))
    // doc2: b → 1·3/2 = 1.5, a → 1·3/3 = 1.0
    assert(got((2L, 1)) == (("b", 1.5)))
    assert(got((2L, 2)) == (("a", 1.0)))
    assert(!got.contains((1L, 3))) // k caps ranks
  }

  test("centroidSilhouette: separated clusters near 1, overlapped near 0") {
    import spark.implicits._
    // two tight clusters along axes 0 and 1 → well separated
    val good = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.centroidsFromLong(
      Similarity.labelCentroids(good, "embedding", "label"))
    val g = Similarity.centroidSilhouette(good, "embedding", "vec_id", "label", cents)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g(0)._1 == 2 && g(1)._1 == 2)
    assert(g(0)._2 > 0.5 && g(1)._2 > 0.5, s"expected separation, got $g")
    // identical clusters → own and other distances match → s = 0
    val bad = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(1.0f, 0.0f), 1), (4L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val bcents = Similarity.centroidsFromLong(
      Similarity.labelCentroids(bad, "embedding", "label"))
    val b = Similarity.centroidSilhouette(bad, "embedding", "vec_id", "label", bcents)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(b.values.forall(v => math.abs(v) < 0.01), s"expected ~0, got $b")
  }

  test("bpePairStats: per-occurrence char-pair counts, 1-char words skipped") {
    import spark.implicits._
    // "abc" → ab, bc; "ab" ×2 occurrences → ab ×2; "x" → nothing
    val df = Seq((1L, "abc ab x"), (2L, "ab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpePairStats(df, "text", topK = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("ab" -> 3L, "bc" -> 1L))
  }

  test("bpeTrain: merged symbols feed the next round; ties break by symbol order") {
    import spark.implicits._
    // "aaab" ×3: round 0 (a,a) n=6 (two positions per word); rewrite
    // " a a a b " → " aa a b " (leftmost, boundary consumed). Round 1:
    // (aa,a) and (a,b) tie at 3 → "a" < "aa" picks (a,b) → " aa ab ".
    // Round 2 merges the two MERGED symbols (aa,ab) — feed-forward proof.
    val df = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", merges = 3)
      .collect().map(r0 => (r0.getInt(0), r0.getString(1), r0.getString(2), r0.getLong(3))).toSeq
    assert(got == Seq((0, "a", "a", 6L), (1, "a", "b", 3L), (2, "aa", "ab", 3L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", merges = 5)
      .collect().map(r0 => (r0.getString(1), r0.getString(2))).toSeq
    // round 0 merges (a,b); afterwards every word is one symbol → stop
    assert(got == Seq(("a", "b")))
  }

  test("readability: hand-counted words/sentences/vowel-run syllables and Flesch") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello world. This is a test!"),
      (2L, "nopunctuation")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // 6 ws-tokens, 2 [.!?]+ runs, vowel groups: e,o|o|i|i|a|e = 7
    // 206.835 − 1.015·(6/2) − 84.6·(7/6) = 105.09
    assert(r(1L) == ((6L, 2L, 7L, 105.09)))
    // unpunctuated doc: sentence floor of 1; o,u,ua,io = 4 vowel runs
    assert(r(2L)._1 == 1L && r(2L)._2 == 1L && r(2L)._3 == 4L)
  }
}
