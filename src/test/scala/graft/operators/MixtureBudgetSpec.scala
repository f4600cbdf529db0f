package graft.operators

import graft.SparkSpec

/** Pins the all-integer token-budget feasibility arithmetic and the
  * cross-split leakage filter. */
class MixtureBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBudgetMixture: scarce source binds, takes honor the weights") {
    val docs = Seq(
      ("a", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // src a: 10 tokens
      ("b", "t1 t2 t3")                        // src b: 3 tokens
    ).toDF("source", "text")
    val out = Sampling.tokenBudgetMixture(docs, "text", "source",
      Seq(("a", 1L, 2L), ("b", 1L, 2L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getBoolean(5)))).toMap
    // caps: a → 20, b → 6; T = 6; take = 3 each; b binds
    assert(out == Map("a" -> ((10L, 3L, false)), "b" -> ((3L, 3L, true))))
  }

  test("paddingAudit: bucketed layout never pads a uniform-length band") {
    // lengths 1 and 100, bucketWidth 8 separates them; batchSize 2
    val df = Seq((1L, 1L), (2L, 100L), (3L, 1L), (4L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.paddingAudit(df, "doc_id", "n_tokens",
      bucketWidth = 8, batchSize = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bucketed: bands {1,1} and {100,100} → zero padding
    assert(out("bucketed") == ((2L, 202L, 0L)))
    // hash layout: total tokens identical; padding depends on the draw
    // but can never beat the separated bands here
    assert(out("hash")._2 == 202L && out("hash")._3 >= 0L)
  }

  test("clusterSplit: the leakage audit finds ZERO cross-split pairs on real data") {
    val dir = "/root/testdata/sf0.001"
    val dd = graft.Tables.documents(spark, dir)
    val sig = Dedup.minhashSignature(dd, "text", "doc_id", numHashes = 4)
    val pairs = Dedup.minhashCandidatePairs(sig, "doc_id",
      numHashes = 4, rowsPerBand = 2)
    val assigned = Sampling.clusterSplit(
      dd.select(org.apache.spark.sql.functions.col("doc_id")), "doc_id",
      pairs, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(pairs.count() > 0) // the audit must have something to check
    assert(Sampling.splitLeakage(pairs,
      assigned.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("split")), "doc_id").isEmpty)
    // clusters are atomic: one split per component
    val multi = assigned.groupBy("component")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("ns"))
      .where(org.apache.spark.sql.functions.col("ns") > 1)
    assert(multi.isEmpty)
  }

  test("splitLeakage keeps only cross-split pairs") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val assigned = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "train"))
      .toDF("doc_id", "split")
    val out = Sampling.splitLeakage(pairs, assigned, "doc_id").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getString(2) == "train"
      && out(0).getString(3) == "test")
  }
}
