package graft.catalog

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import scala.util.Random

/** The rendered JSON-Schema documents are the reference's public contract
  * for what a tool accepts (schema.py:86-132). Two guarantees:
  *
  *  1. structural: every rendering branch lands in the fixture documents
  *     (exact-document equality is the `catalog_tool_schemas` oracle gate;
  *     here we pin the load-bearing fragments so a failure names the
  *     branch, not just "hash mismatch");
  *  2. semantic (property test): a validator compiled FROM the rendered
  *     document (create_tool_validators parity, schema.py:76-83) must
  *     agree row-for-row — verdicts AND messages — with the engine's
  *     Column-compiled [[Validation.validate]] over randomized tool calls.
  *     If the emitted schema and the execution path ever describe
  *     different contracts, this catches it.
  */
class ToolSchemaJsonSpec extends SparkSpec {

  private val archetype = ArchetypeCatalog.fromYaml(SparkEntry.FixtureArchetypeYaml)
  private val rendered = ToolSchemaJson.renderAll(archetype).toMap

  test("rendering branches: required/default/skip/frames/fallback-description") {
    val obs = rendered("Observe")
    assert(obs.contains(""""Mood":{"type":"string","description":"Overall mood","examples":["calm","tense"],"x-required":true}"""))
    assert(obs.contains(""""Depth":{"type":"string","description":"How deep to go","default":"moderate","x-required":true}"""))
    assert(!obs.contains("Unknown")) // unknown pool binding skipped
    assert(obs.contains(""""tags":{"type":"array","x-required":true}"""))
    assert(obs.contains(""""weight":{"type":"integer"}"""))
    assert(obs.contains(""""note":{"type":"string"}"""))
    assert(obs.contains(""""required":["Content","Context","Depth","Mood","Title","tags"]"""))
    assert(obs.contains(""""additionalProperties":false"""))

    val rec = rendered("Recall")
    assert(rec.contains(""""description":"Tool: Recall"""")) // schema.py:124 fallback
    assert(!rec.contains("Mood")) // empty-string binding skipped
    assert(rec.contains(""""required":["Content","Context","Title"]"""))
  }

  test("rendered documents round-trip as JSON with standard fields leading") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val m = new ObjectMapper()
    rendered.values.foreach { doc =>
      val props = m.readTree(doc).get("inputSchema").get("properties")
      val names = {
        val it = props.fieldNames(); Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
      }
      assert(names.take(3) == Seq("Title", "Content", "Context"), doc.take(200))
    }
  }

  test("property: compiled-from-rendered validator agrees with Validation.validate") {
    val rnd = new Random(42)
    val keys = Seq("Title", "Content", "Context", "Mood", "Depth",
      "tags", "weight", "note", "zz_extra")
    val values = Seq("hello", "abc", "3", "-17", "2.5", """["a","b"]""",
      """{"k":"v"}""", "true", "not json [", "")

    val rows: Seq[(String, Map[String, String])] =
      (0 until 300).map { _ =>
        val tool = if (rnd.nextBoolean()) "Observe" else "Recall"
        val args = keys.filter(_ => rnd.nextDouble() < 0.7)
          .map(k => k -> values(rnd.nextInt(values.length))).toMap
        (tool, args)
      } ++ Seq(
        // directed cases: fully valid, each-required-missing, typed-frame abuse
        ("Observe", Map("Title" -> "t", "Content" -> "c", "Context" -> "x",
          "Mood" -> "calm", "tags" -> """["a"]""", "weight" -> "3", "note" -> "n")),
        ("Observe", Map("Title" -> "t", "Content" -> "c", "Context" -> "x",
          "Mood" -> "calm", "tags" -> "oops", "weight" -> "abc")),
        ("Recall", Map("Title" -> "t", "Content" -> "c", "Context" -> "x")),
        ("Recall", Map("Title" -> "t", "Content" -> "c", "Context" -> "x",
          "Mood" -> "sneaky")))

    val validators = rendered.map { case (k, doc) =>
      k -> ToolSchemaJson.compileValidator(doc)
    }

    import spark.implicits._
    val df = rows.toDF("tool", "args")
    val validated = Validation.validate(
      Validation.withDefaults(df, archetype), archetype)
      .select(col("tool"), col("args"), col("validation_errors"))
      .collect()

    validated.zip(rows).foreach { case (row, (tool, args)) =>
      val sparkErrors = row.getSeq[String](2).sorted
      val renderedErrors = validators(tool)(args).sorted
      assert(sparkErrors == renderedErrors,
        s"tool=$tool args=$args\n spark: $sparkErrors\n rendered: $renderedErrors")
    }
  }
}
