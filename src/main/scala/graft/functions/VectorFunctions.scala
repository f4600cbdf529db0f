package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, expressed as
  * pure Column trees (`zip_with` + `aggregate`) so they stay inside
  * whole-stage codegen — no UDF, no deserialization of the row.
  *
  * Mirrors the reference's dense-vector scoring path
  * (reference: fegis/search/strategies.py:263-291 — Qdrant computes cosine
  * over BAAI/bge-small-en vectors; here the vectors are a column and the
  * score is a Catalyst expression).
  *
  * Accumulation is in Double regardless of element type: deterministic
  * within a row (element order is the array order), so results are stable
  * across partitionings — a requirement for oracle hash-matching and for
  * reproducible ranking at cluster scale.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with Double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) ∈ [-1, 1]; NaN-safe via nullif on zero norms. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** Squared Euclidean distance (cheaper than sqrt when only ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** Random-hyperplane (SimHash-style) LSH bucket id for a dense vector:
    * `planes` pseudo-random ±1 hyperplanes derived from a deterministic
    * per-dimension hash — sign bits packed into a LONG. Deterministic
    * across engines (uses [[HashFunctions.hash64]]-compatible md5 trick),
    * shuffle-free to compute, and gives O(n/2^planes) candidate buckets
    * for ANN at scale.
    */
  def rhpBucket(vec: Column, planes: Int, seed: Int): Column = {
    val bits = (0 until planes).map { p =>
      // dot(vec, hyperplane_p) where hyperplane_p[i] = ±1 from hash(seed,p,i)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val h = conv(
            substring(md5(concat_ws(":", lit(seed.toString), lit(p.toString), i.cast("string"))), 1, 15),
            16, 10).cast("long")
          val sign = when(h % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
          x.cast("double") * sign
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }
}
