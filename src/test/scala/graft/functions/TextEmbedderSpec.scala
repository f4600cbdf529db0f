package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

object TextEmbedderSpec {
  // JVM-static counters: tasks deserialize their own copy of the embedder,
  // but in local mode they share this JVM, so companion statics observe
  // every partition's calls
  val maxSeen = new AtomicInteger(0)
  val setups = new AtomicInteger(0)

  class Fake extends TextEmbedder {
    override def setup(): Unit = { setups.incrementAndGet(); () }
    override def embedBatch(texts: Seq[String], dims: Int): Seq[Array[Double]] = {
      maxSeen.getAndUpdate(m => math.max(m, texts.size))
      texts.map(t => Array.tabulate(dims)(d => (t.length + d).toDouble))
    }
  }
}

class TextEmbedderSpec extends SparkSpec {
  import TextEmbedderSpec._

  private def docs = {
    import spark.implicits._
    (1L to 23L).map(i => (i, s"doc number $i with text")).toDF("id", "text")
  }

  test("surrogate seam output is bit-identical to the codegen'd Column form") {
    val viaSeam = TextEmbedder.embedText(docs, "text", "emb", dims = 8)
      .select(col("id"), col("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaColumn = docs
      .withColumn("emb", Embedder.embed(col("text"), 8))
      .select(col("id"), col("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaSeam.keySet == viaColumn.keySet)
    viaSeam.foreach { case (id, v) =>
      assert(v == viaColumn(id), s"id=$id seam/Column mismatch") // exact, no tolerance
    }
  }

  test("batch boundaries never change results; batches stay bounded; setup once per partition") {
    val in = docs.repartition(3)
    def run(bs: Int) = TextEmbedder.embedText(in, "text", "emb", dims = 4,
        batchSize = bs, embedder = new Fake)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val a = run(1)
    val b = run(5)
    val c = run(1000)
    assert(a == b && b == c, "results must not depend on batch size")
    maxSeen.set(0)
    val before = setups.get()
    val got = run(5)
    assert(got.size == 23)
    assert(maxSeen.get() <= 5, s"batches must stay bounded, saw ${maxSeen.get()}")
    // 3 partitions → exactly 3 setup calls for one pass
    assert(setups.get() - before == 3,
      s"setup must run once per partition, got ${setups.get() - before}")
  }

  test("NULL text yields NULL embedding; other columns pass through") {
    import spark.implicits._
    val in = Seq((1L, Some("x"), "keep"), (2L, None: Option[String], "also"))
      .toDF("id", "text", "extra")
    val out = TextEmbedder.embedText(in, "text", "emb", dims = 4, batchSize = 2)
      .collect().map(r => r.getLong(0) -> ((Option(r.getSeq[Double](3)), r.getString(2)))).toMap
    assert(out(1L)._1.exists(_.length == 4))
    assert(out(1L)._2 == "keep")
    assert(out(2L)._1.isEmpty)
    assert(out(2L)._2 == "also")
  }

  test("embedText plan is a shuffle-free projection over the scan") {
    val plan = TextEmbedder.embedText(docs, "text", "emb", dims = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"embed must not shuffle:\n$plan")
  }
}
