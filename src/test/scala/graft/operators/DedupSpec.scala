package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact dup mod case/ws
      (3L, "the quick brown fox jumps over the lazy cat"),    // near dup
      (4L, "completely different content about spark engines here"))
      .toDF("doc_id", "text")
  }

  test("exactClusters groups case/whitespace-normalized duplicates") {
    val got = Dedup.exactClusters(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L), (4L, 1L))) // (keep_id, cluster_size)
  }

  test("minhash signatures: equal for identical shingle sets, found by LSH banding") {
    val sig = Dedup.minhashSignature(docs, "text", "doc_id", numHashes = 8)
    val rows = sig.collect().map(r => r.getLong(0) ->
      (1 to 8).map(i => r.getLong(i))).toMap
    // near-dup docs 1 and 3 share most shingles -> most minhashes agree
    val agree = rows(1L).zip(rows(3L)).count { case (a, b) => a == b }
    assert(agree >= 4)
    assert(rows(1L) != rows(4L))
    val pairs = Dedup.minhashCandidatePairs(sig, "doc_id", 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((3L, 4L)))
  }

  test("simhash: near-dup texts land within small hamming distance") {
    val sigs = Dedup.simhash(docs, "text", "doc_id", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) <= 6)
    assert(hamming(sigs(1L), sigs(4L)) > hamming(sigs(1L), sigs(3L)))
  }

  test("ngramJaccardPairs: near-dups pass the threshold, unrelated don't") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleK = 3, minJaccard = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 3L)))
    assert(pairs((1L, 3L)) > 0.4 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashCandidatesAgainst: only cross-side pairs, no new×new or corpus×corpus") {
    import spark.implicits._
    // docs 1/2 near-identical (cross-side pair), 3/5 identical (both new —
    // must NOT appear), 4/6 identical (both corpus — must NOT appear)
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different corpus content here indeed"),
      (6L, "completely different corpus content here indeed"))
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "another new batch document entirely unrelated text"),
      (5L, "another new batch document entirely unrelated text"))
    val sig = Dedup.minhashSignature((corpus ++ fresh).toDF("doc_id", "text"),
      "text", "doc_id", numHashes = 4, shingleK = 3)
    val pairs = Dedup.minhashCandidatesAgainst(
      sig.where($"doc_id" % 2 === 1), sig.where($"doc_id" % 2 === 0),
      "doc_id", numHashes = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngramJaccardPairs maxDf drops stop-shingles: hot-shingle-only pairs vanish") {
    import spark.implicits._
    // every doc shares the ubiquitous shingle "aaa bbb ccc"; only docs
    // 1 and 2 also share real content. Uncapped, the hot shingle alone
    // pairs ALL f docs (f² join rows in one bucket); capped at maxDf < f
    // it is dropped and only the real near-dup pair survives.
    val hot = "aaa bbb ccc"
    val corpus = (1L to 12L).map { i =>
      val body = if (i <= 2) "shared unique payload xyz" else s"solo$i text$i body$i only$i"
      (i, s"$hot $body")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleK = 3, minJaccard = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 12 * 11 / 2) // hot shingle pairs everyone
    val capped = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleK = 3, minJaccard = 0.01, maxDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet == Set((1L, 2L)))
    // Jaccard recomputed over the FILTERED sets: docs 1/2 have identical
    // surviving shingle sets, so the pair scores exactly 1.0
    assert(capped((1L, 2L)) == 1.0)
  }

  test("embeddingNearDupPairs finds identical vectors at cosine 1") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      minCosine = 0.9, planes = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs == Map((1L, 2L) -> 1.0))
  }

  test("contaminationPairs flags shingle overlap with the benchmark only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),        // copy of bench 100
      (2L, "a b c d e x y z w q"),    // one 5-gram shared ("a b c d e")
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f g h")).toDF("b_id", "b_text")
    def flagged(minHits: Long) =
      Dedup.contaminationPairs(docs, "text", "doc_id", bench, "b_text", "b_id",
        k = 5, minHits = minHits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc1 shares all 4 distinct 5-grams; doc2 exactly one; doc3 none
    assert(flagged(1) == Set((1L, 100L, 4L), (2L, 100L, 1L)))
    assert(flagged(2) == Set((1L, 100L, 4L)))
  }

  test("contaminationPairsBloom: bit-identical to the exact form") {
    import spark.implicits._
    val docs = ((1L to 40L).map(i => (i, s"u$i v$i w$i x$i y$i z$i")) ++
      Seq((98L, "a b c d e f g h"), (99L, "a b c d e x y z w q")))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f g h")).toDF("b_id", "b_text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(Dedup.contaminationPairs(docs, "text", "doc_id",
      bench, "b_text", "b_id", k = 5, minHits = 1))
    val bloomed = rows(Dedup.contaminationPairsBloom(docs, "text", "doc_id",
      bench, "b_text", "b_id", k = 5, minHits = 1))
    assert(bloomed == exact)
    assert(exact == Set((98L, 100L, 4L), (99L, 100L, 1L)))
  }

  test("multi-table LSH recovers recall a single high-plane table drops") {
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.embeddingNearDupPairs(
      vecs, "embedding", "vec_id", minCosine = 0.2, planes = 0, dims = 64))
    val single = pairSet(Dedup.embeddingNearDupPairs(
      vecs, "embedding", "vec_id", minCosine = 0.2, planes = 6, seed = 7, dims = 64))
    val multi = pairSet(Dedup.embeddingNearDupPairsMultiTable(
      vecs, "embedding", "vec_id", minCosine = 0.2, planes = 6,
      seeds = Seq(7, 21), dims = 64))
    // precision is exact on every path (cosine verify), so candidates nest
    assert(single.subsetOf(multi) && multi.subsetOf(exact))
    // the second table must contribute pairs the first table's buckets
    // split — i.e. strictly better recall at the same plane count
    assert(multi.size > single.size,
      s"multi=${multi.size} single=${single.size} exact=${exact.size}")
  }

  test("chunkDedup: global first occurrence kept, later identical chunks drop, docs reassemble") {
    import spark.implicits._
    // chunk size 2: doc 1 = [a b][c d]; doc 2 repeats [a b] then unique
    // [e f]; doc 3 repeats both its own first chunk and doc 1's [c d];
    // doc 4 is entirely made of earlier chunks
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "g h g h c d"),
      (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "text", "doc_id", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "a b c d")))        // first occurrences of both
    assert(got(2L) == ((2L, 1L, "e f")))            // [a b] seen in doc 1
    assert(got(3L) == ((3L, 1L, "g h")))            // own repeat + doc 1's [c d] drop
    assert(got(4L) == ((3L, 0L, "")))               // fully duplicated, row kept
  }

  test("winnowFingerprints: shared substrings guarantee shared fingerprints; short docs fall back to global min") {
    import spark.implicits._
    // k=3, w=4: any shared run of >= k+w-1 = 6 tokens must share a fingerprint
    val common = "p q r s t u v w"  // 8 shared tokens
    val docs = Seq(
      (1L, s"a b c $common d e f"),
      (2L, s"x y $common z"),
      (3L, "one two"),              // shorter than one shingle window
      (4L, "totally different words here nothing shared at all okay"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "text", "doc_id", shingleK = 3, window = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((byDoc(1L) & byDoc(4L)).isEmpty)
    assert(!byDoc.contains(3L)) // fewer than 3 tokens: no shingles at all
    // a doc with shingles but fewer than one window still fingerprints
    val tiny = Seq((9L, "a b c d")).toDF("doc_id", "text") // 2 shingles < window
    assert(Dedup.winnowFingerprints(tiny, "text", "doc_id", 3, 4).count() == 1)
    // pairs report the overlap
    val pairs = Dedup.winnowedPairs(
      Dedup.winnowFingerprints(docs, "text", "doc_id", 3, 4), "doc_id",
      minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("chunkDedup: partial tail chunk and empty text handled") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "text", "doc_id", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "a b c")))  // [a b] + partial [c]
    assert(got(2L) == ((0L, 0L, "")))
    assert(got(3L) == ((2L, 0L, "")))       // both chunks first seen in doc 1
  }

  test("containmentPairs: quote inside article reads 1.0 one way, low Jaccard the other") {
    import spark.implicits._
    // doc 2 is a verbatim slice of doc 1 (every 3-shingle of 2 appears
    // in 1); doc 3 shares nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "gamma delta epsilon zeta"),
      (3L, "one two three four five")).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "text", "doc_id",
      shingleK = 3, minContainment = 0.2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // inner=2 (8 shingles in doc 1, 2 has 2 shingles, both present)
    assert(r((2L, 1L)) == 1.0)
    // the reverse direction is the Jaccard-ish weak signal: 2/8
    assert(r((1L, 2L)) == 0.25)
    assert(!r.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("tauForNeighbors: exact order statistic, rises with corpus size at fixed target") {
    import spark.implicits._
    // 40 deterministic 4-dim unit-ish vectors
    def vec(i: Long) = Seq(
      math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
      math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)
    val e = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tau = Dedup.tauForNeighbors(e, "embedding", "vec_id",
      targetNeighbors = 4, dims = 4, sampleSize = 40)
    // recompute by hand: f = 4/39, j = floor((1-f)*780), tau = sorted(j)
    val vs = (0L until 40L).map(vec)
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val all = (for (a <- 0 until 40; b <- a + 1 until 40)
      yield cos(vs(a), vs(b))).sorted
    val f = 4.0 / 39
    val j = math.min(all.size - 1, math.floor((1 - f) * all.size).toInt)
    assert(tau == all(j))
    // a vector's expected neighbors at tau ~ target (loose: within 3x)
    val admitted = all.count(_ >= tau)
    assert(admitted * 2.0 / 40 >= 1.0 && admitted * 2.0 / 40 <= 12.0)
    // same target over a LARGER corpus (denser space) -> tau NOT lower
    val e2 = (0L until 200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tau2 = Dedup.tauForNeighbors(e2, "embedding", "vec_id",
      targetNeighbors = 4, dims = 4, sampleSize = 40)
    assert(tau2 >= tau)
  }
}
