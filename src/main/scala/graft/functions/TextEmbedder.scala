package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The embedding-model seam: a production model (ONNX runtime session,
  * tokenizer + encoder, remote batcher, …) implements this and drops into
  * [[TextEmbedder.embedText]] — and therefore into ingest and query-side
  * search — without touching any operator. Mirrors
  * [[graft.multimodal.Multimodal.Decoder]]: per-partition `setup()` to
  * amortize model load, then bounded batches (the shape a vectorized
  * inference runtime wants). Implementations must be Serializable (the
  * instance ships to executors inside the mapPartitions closure).
  *
  * The reference embeds in-process at upsert time with fastembed/ONNX
  * (BAAI/bge-small-en — fegis/storage.py:53,194-199); this environment is
  * zero-egress, so [[SurrogateTextEmbedder]] is the default
  * implementation and a real model is a drop-in.
  */
trait TextEmbedder extends Serializable {
  /** Called once per partition before the first batch — load the model,
    * open the runtime session. */
  def setup(): Unit = ()

  /** Embed one bounded batch (≤ the operator's batchSize) into
    * `dims`-dim vectors, one per input, same order. */
  def embedBatch(texts: Seq[String], dims: Int): Seq[Array[Double]]
}

/** Deterministic surrogate (default): the JVM twin of the codegen'd
  * [[Embedder.embed]] Column — identical md5-top-60-bit component
  * derivation and identical left-to-right norm accumulation, so Column
  * expression, batched JVM seam, and external-SQL oracle all produce
  * BIT-IDENTICAL vectors. That equality is what lets the oracle gates
  * keep hash-checking the search surface while the production path runs
  * through the batched seam.
  */
object SurrogateTextEmbedder extends TextEmbedder {
  def embedOne(text: String, dims: Int): Array[Double] = {
    val comps = Array.tabulate(dims) { d =>
      ((HashFunctions.hash64Jvm(s"$text#$d") % 2001) - 1000).toDouble / 1000.0
    }
    // same left-to-right accumulation order as the Column form's reduce
    var ss = 0.0
    var i = 0
    while (i < dims) { ss += comps(i) * comps(i); i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](dims)
    i = 0
    while (i < dims) { out(i) = comps(i) / norm; i += 1 }
    out
  }

  override def embedBatch(texts: Seq[String], dims: Int): Seq[Array[Double]] =
    texts.map(embedOne(_, dims))
}

object TextEmbedder {

  /** Append `outCol` (array&lt;double&gt;) embeddings of `textCol` via the
    * batched seam: per-partition `embedder.setup()`, rows flow in bounded
    * `batchSize` groups through `embedBatch`. All other columns pass
    * through untouched; a NULL text yields a NULL embedding (models
    * can't embed absent documents).
    *
    * Physical shape: one mapPartitions projection — no shuffle, batch
    * size bounds peak memory per task, and the embedder instance is
    * broadcast once inside the closure. At 100 TB this is exactly the
    * reference's embed-at-upsert placed on the ingest scan, with model
    * load amortized per partition instead of per row.
    */
  def embedText(df: DataFrame, textCol: String, outCol: String, dims: Int,
      batchSize: Int = 64,
      embedder: TextEmbedder = SurrogateTextEmbedder): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(dims >= 1)
    val textIdx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      embedder.setup()
      it.grouped(batchSize).flatMap { batch =>
        val present = batch.filter(r => !r.isNullAt(textIdx))
        val vecs = embedder.embedBatch(
          present.map(_.getString(textIdx)), dims).iterator
        batch.map { r =>
          val v = if (r.isNullAt(textIdx)) null else vecs.next().toSeq
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(enc)
  }
}
