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
    */
  def embed(text: Column, dims: Int): Column = {
    val raw = transform(
      sequence(lit(0), lit(dims - 1)),
      i => ((HashFunctions.hash64(concat_ws("#", text, i.cast("string"))) % 2001)
        - lit(1000)).cast("double") / lit(1000.0))
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    transform(raw, x => x / norm)
  }
}
