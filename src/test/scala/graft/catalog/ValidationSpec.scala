package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {

  lazy val arch: Archetype = ArchetypeCatalog.fromYaml(
    """version: "1.0"
      |title: v
      |parameters:
      |  Mode:
      |    description: "mode"
      |tools:
      |  Act:
      |    parameters:
      |      Mode:
      |    frames:
      |      steps:
      |        type: List
      |        required: true
      |      n:
      |        type: integer
      |""".stripMargin)

  private def call(tool: String, kv: (String, String)*) = {
    import spark.implicits._
    Seq((tool, kv.toMap)).toDF("tool", "args")
  }

  private def errorsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    Validation.validate(Validation.withDefaults(df, arch), arch)
      .select("validation_errors").head().getSeq[String](0)

  val good = Seq("Title" -> "t", "Content" -> "c", "Context" -> "x",
    "Mode" -> "fast", "steps" -> """["a","b"]""", "n" -> "3")

  test("valid call has no errors") {
    assert(errorsOf(call("Act", good: _*)).isEmpty)
  }

  test("missing required standard field / param / frame is reported") {
    val errs = errorsOf(call("Act", good.filterNot(kv =>
      Set("Title", "Mode", "steps")(kv._1)): _*))
    assert(errs.toSet == Set(
      "must contain property 'Title'",
      "must contain property 'Mode'",
      "must contain property 'steps'"))
  }

  test("additionalProperties=false rejects unexpected keys") {
    val errs = errorsOf(call("Act", (good :+ ("Sneaky" -> "1")): _*))
    assert(errs == Seq("""must not contain unexpected properties ["Sneaky"]"""))
  }

  test("typed frames must parse: bad array and bad integer flagged") {
    val errs = errorsOf(call("Act",
      good.filterNot(kv => Set("steps", "n")(kv._1))
        ++ Seq("steps" -> "not-json", "n" -> "3.5x"): _*))
    assert(errs.toSet == Set(
      "property 'steps' must be array",
      "property 'n' must be integer"))
  }

  test("NULL tool is rejected, not silently passed (three-valued isin)") {
    import spark.implicits._
    val df = Seq((Option.empty[String], good.toMap)).toDF("tool", "args")
    assert(errorsOf(df) == Seq("unknown tool 'null'"))
  }

  test("unknown tool is an error") {
    assert(errorsOf(call("Ghost", good: _*)) == Seq("unknown tool 'Ghost'"))
  }

  test("valid/rejects split routes rows") {
    import spark.implicits._
    val df = Seq(
      ("Act", good.toMap),
      ("Act", good.filterNot(_._1 == "Title").toMap)).toDF("tool", "args")
    val v = Validation.validate(Validation.withDefaults(df, arch), arch)
    assert(Validation.valid(v).count() == 1)
    assert(Validation.rejects(v).count() == 1)
  }

  test("partitionArgs splits params/frames and applies envelope defaults") {
    val df = call("Act",
      "Content" -> "c", "Context" -> "x", "Mode" -> "slow",
      "steps" -> """["s"]""")
    val out = Validation.partitionArgs(df, arch).head()
    val params = out.getMap[String, String](out.fieldIndex("parameters"))
    val frames = out.getMap[String, String](out.fieldIndex("frames"))
    assert(params == Map("Mode" -> "slow"))
    assert(frames == Map("steps" -> """["s"]"""))
    // Title default: "{tool} Invocation" (reference storage.py:154)
    assert(out.getString(out.fieldIndex("title")) == "Act Invocation")
    assert(out.getString(out.fieldIndex("content")) == "c")
  }

  test("typedFrames parses JSON-encoded values through declared types") {
    val df = Validation.partitionArgs(call("Act", good: _*), arch)
    val row = Validation.typedFrames(df, arch.tool("Act")).select("frames_typed").head()
    val st = row.getStruct(0)
    assert(st.getSeq[String](st.fieldIndex("steps")) == Seq("a", "b"))
    assert(st.getLong(st.fieldIndex("n")) == 3L)
  }
}
