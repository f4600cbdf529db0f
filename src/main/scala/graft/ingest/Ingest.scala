package graft.ingest

import graft.catalog.{Archetype, Validation}
import graft.functions.{SurrogateTextEmbedder, TextEmbedder}
import graft.model.MemoryModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch ingest path (reference entry point 1, SURVEY §3): tool-call events
  * → validate → envelope/partition → sessionize → embed → store.
  *
  * Execution shape at 100 TB:
  *  - validation + envelope are per-row projections (no shuffle,
  *    whole-stage codegen); embedding is a shuffle-free batched
  *    mapPartitions over the [[graft.functions.TextEmbedder]] seam
  *    (model load amortized per partition, bounded batch memory);
  *  - sessionization is the ONE shuffle (window partitioned by session) —
  *    the reference instead does a per-insert Qdrant read-back
  *    (storage.py:113-143), which cannot scale past one writer;
  *  - the store is written partitioned by `tool` (the reference's hottest
  *    KEYWORD index, storage.py:73-86) so tool-filtered queries prune
  *    partitions instead of consulting an index.
  */
object Ingest {

  /** Validated tool-call DataFrame → canonical memories rows.
    * Input needs: tool, args (MAP<STRING,STRING>), session_id, event id
    * (memory_id), timestamp.
    *
    * Embedding runs through the batched [[TextEmbedder]] seam (per-
    * partition model setup, bounded batches) — the default surrogate is
    * bit-identical to the codegen'd Column form, and a real ONNX model
    * drops in via the `embedder` parameter without touching this path.
    */
  def toMemories(calls: DataFrame, archetype: Archetype, dims: Int,
      embedder: TextEmbedder = SurrogateTextEmbedder,
      embedBatchSize: Int = 64): DataFrame = {
    val validated = Validation.validate(
      Validation.withDefaults(calls, archetype), archetype)
    val ok = Validation.partitionArgs(Validation.valid(validated), archetype)
    val sessionized = MemoryModel.sessionize(ok)
    TextEmbedder.embedText(sessionized, "content", "embedding", dims,
      embedBatchSize, embedder)
  }

  /** Rejects from the same validated pass (route to a quarantine sink). */
  def rejectsOf(calls: DataFrame, archetype: Archetype): DataFrame =
    Validation.rejects(Validation.validate(
      Validation.withDefaults(calls, archetype), archetype))

  /** Write the memory store partitioned by tool (partition pruning replaces
    * the reference's payload index on `tool`). */
  def writeStore(memories: DataFrame, path: String): Unit =
    memories.write.mode("overwrite").partitionBy("tool").parquet(path)
}
