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
