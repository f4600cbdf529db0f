package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The real-embedder path: WordPiece layer tested exactly (pure Scala),
  * ONNX forward pass assume-skipped when no runtime jar is present
  * (zero-egress sandbox) — the documented env-bounded line.
  */
class OnnxTextEmbedderSpec extends AnyFunSuite {

  private val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "spark", "wind", "##ow", "##s", "join", "un", "##believ", "##able",
    ",", "!").zipWithIndex.toMap
  private val tok = new WordPieceTokenizer(vocab, maxLen = 16)

  test("greedy longest-match-first decomposition with ## continuations") {
    assert(tok.wordPieceIds("spark") === Seq(vocab("spark")))
    assert(tok.wordPieceIds("windows") ===
      Seq(vocab("wind"), vocab("##ow"), vocab("##s")))
    assert(tok.wordPieceIds("unbelievable") ===
      Seq(vocab("un"), vocab("##believ"), vocab("##able")))
    // no decomposition → single [UNK], not partial pieces
    assert(tok.wordPieceIds("xyzzy") === Seq(tok.unkId))
  }

  test("basic tokenizer lowercases, strips accents, splits punctuation") {
    assert(tok.basicTokens("Spark  Windows!") === Seq("spark", "windows", "!"))
    assert(tok.basicTokens("Spärk") === Seq("spark"))
    assert(tok.basicTokens("join,spark") === Seq("join", ",", "spark"))
  }

  test("encode adds [CLS]/[SEP] and truncates to maxLen") {
    val ids = tok.encode("Spark windows join")
    assert(ids.head === tok.clsId && ids.last === tok.sepId)
    assert(ids.toSeq === Seq(tok.clsId, vocab("spark"), vocab("wind"),
      vocab("##ow"), vocab("##s"), vocab("join"), tok.sepId))
    val tiny = new WordPieceTokenizer(vocab, maxLen = 4)
    val t = tiny.encode("spark join spark join")
    assert(t.length === 4 && t.head === tiny.clsId && t.last === tiny.sepId)
  }

  test("encode is per-text deterministic (batch-order invariant by construction)") {
    val texts = Seq("Spark join", "unbelievable windows", "Spark join")
    val a = texts.map(tok.encode(_).toSeq)
    val b = texts.reverse.map(tok.encode(_).toSeq)
    assert(a === b.reverse)
    assert(a(0) === a(2))
  }

  test("onnx forward pass (runs only when an ONNX runtime jar is present)") {
    assume(OnnxTextEmbedder.available,
      "ai.onnxruntime not on classpath — env-bounded skip (zero-egress sandbox)")
    // with a runtime present a deployment points these at real artifacts;
    // the assertion shape documents the batch-parity contract
    val modelPath = sys.env.getOrElse("GRAFT_ONNX_MODEL", "")
    val vocabPath = sys.env.getOrElse("GRAFT_ONNX_VOCAB", "")
    assume(modelPath.nonEmpty && vocabPath.nonEmpty,
      "GRAFT_ONNX_MODEL/GRAFT_ONNX_VOCAB not set")
    val e = new OnnxTextEmbedder(modelPath, vocabPath)
    e.setup()
    val texts = Seq("spark windows join", "unbelievable", "spark windows join")
    val dims = 32
    val batched = e.embedBatch(texts, dims)
    val oneByOne = texts.map(t => e.embedBatch(Seq(t), dims).head)
    // batch parity: padding a batch must not change any vector
    batched.zip(oneByOne).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
    assert(batched(0).toSeq === batched(2).toSeq)
  }
}
