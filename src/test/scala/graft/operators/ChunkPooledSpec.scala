package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions

/** Chunk-pooled embeddings: single-chunk identity against the JVM-derived
  * surrogate formula, and pooling of a duplicated chunk. */
class ChunkPooledSpec extends SparkSpec {
  import spark.implicits._

  private def rawComp(chunk: String, d: Int): Long =
    HashFunctions.hash64Jvm(s"$chunk#$d") % 2001 - 1000

  private def normalize(rs: Seq[Long]): Seq[Float] = {
    val ss = rs.map(r => r * r).sum
    rs.map(r => (r.toDouble / math.sqrt(ss.toDouble)).toFloat)
  }

  test("a one-chunk document pools to its own chunk embedding") {
    val text = "alpha beta gamma"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Similarity.chunkPooledEmbed(docs, "text", "doc_id",
      dims = 8, chunkTokens = 8)
      .head().getSeq[Float](1)
    val want = normalize((0 until 8).map(d => rawComp(text, d)))
    assert(got === want)
  }

  test("a document of two identical chunks pools to the chunk's own direction") {
    // 8-token chunking splits this into the SAME 4-token... no: chunk
    // size 4 here so "a b c d a b c d" → two identical chunks "a b c d";
    // the mean of two equal vectors normalizes to the same unit vector
    val docs = Seq(
      (1L, "a b c d a b c d"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val got = Similarity.chunkPooledEmbed(docs, "text", "doc_id",
      dims = 8, chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // doc 1's sums are exactly 2× doc 2's — the scale cancels
    assert(got(1L) === got(2L))
  }

  test("empty documents are dropped, not zero-vectored") {
    val docs = Seq((1L, "word"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Similarity.chunkPooledEmbed(docs, "text", "doc_id",
      dims = 8, chunkTokens = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }
}
