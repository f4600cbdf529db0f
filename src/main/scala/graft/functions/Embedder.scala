package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic surrogate embedder.
  *
  * The reference embeds document text with fastembed/ONNX
  * (BAAI/bge-small-en, 384-dim — reference: fegis/storage.py:53,194-199).
  * That model is Python-side and this environment is zero-egress, so the
  * engine decouples SEMANTICS (a dense unit vector per document, computed
  * in-partition during ingest, identical for identical text) from the
  * MODEL. This surrogate derives each dimension from the md5-based
  * [[HashFunctions.hash64]] of (text, dim) and L2-normalizes — fully
  * deterministic, engine-portable (oracle-checkable in external SQL), and
  * with the same execution shape as a real embedder (per-row compute, no
  * shuffle; a real ONNX model would slot in via mapPartitions with
  * batching, same plan).
  */
object Embedder {

  /** `dims`-dim unit vector from text. Each raw component ∈ [-1, 1]:
    * (hash64(text ⊕ dim) mod 2001 − 1000) / 1000.
    *
    * Built WITHOUT higher-order functions: HOF lambdas are interpreted
    * (CodegenFallback, no common-subexpression elimination), which made
    * the norm recompute every component per element — O(dims²) md5 calls
    * per row. The unrolled form is one codegen'd projection where each
    * component subtree is CSE'd: O(dims) md5 per row.
    */
  def embed(text: Column, dims: Int): Column = {
    val comps = (0 until dims).map { d =>
      ((HashFunctions.hash64(concat_ws("#", text, lit(d.toString))) % 2001)
        - lit(1000)).cast("double") / lit(1000.0)
    }
    // same left-to-right accumulation order as an aggregate fold
    val norm = sqrt(comps.map(c => c * c).reduce(_ + _))
    array(comps.map(_ / norm): _*)
  }
}
