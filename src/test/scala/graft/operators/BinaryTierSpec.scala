package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary sign-quantization tier: code-space agreement between the
  * Column-tree and JVM encoders, Hamming geometry, and the
  * shortlist-then-rerank contract. */
class BinaryTierSpec extends SparkSpec {
  import spark.implicits._

  private def vec(bits: Set[Int], dims: Int = 64): Seq[Float] =
    (0 until dims).map(i => if (bits(i)) 1.0f else -1.0f)

  private lazy val base = Seq(
    (0L, vec(Set(0, 1, 2))),
    (1L, vec(Set(0, 1, 2, 7))),     // hamming 1 from query
    (2L, vec(Set(0, 1))),            // hamming 1
    (3L, vec(Set(40, 50, 59))),      // far
    (4L, vec(Set.empty[Int]))        // all-negative → code 0
  ).toDF("vec_id", "embedding")

  test("Column-tree and JVM encoders agree bit for bit") {
    val enc = Similarity.binaryEncode(base, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1)
      assert(enc(id) === Similarity.binaryEncodeJvm(v), s"vec $id")
    }
    // bit i carries weight 2^i
    assert(enc(0L) === 7L)
    assert(enc(1L) === (7L | (1L << 7)))
    assert(enc(4L) === 0L)
  }

  test("hamming shortlist ranks by xor popcount; exact rerank orders output") {
    val enc = Similarity.binaryEncode(base, "embedding", "vec_id")
    val q = vec(Set(0, 1, 2))
    val out = Similarity.hammingRerank(enc, base, "embedding", "vec_id",
      Similarity.binaryEncodeJvm(q), q, k = 3, shortlist = 3)
      .collect().map(_.getLong(0))
    // shortlist of 3 by hamming: 0 (d=0), 1 (d=1), 2 (d=1) — vec 3 and the
    // zero vector never reach the rerank
    assert(out.toSet === Set(0L, 1L, 2L))
    // exact-cosine rerank puts the identical vector first
    assert(out.head === 0L)
  }

  test("zero dims beyond `bits` are not coded") {
    val df = Seq((0L, vec(Set(62, 63)))).toDF("vec_id", "embedding")
    val code = Similarity.binaryEncode(df, "embedding", "vec_id")
      .head().getLong(1)
    assert(code === 0L)
  }
}
