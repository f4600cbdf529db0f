package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

class ArchetypeCatalogSpec extends AnyFunSuite {

  val fixture: String =
    """version: "1.0"
      |title: test_archetype
      |parameters:
      |  Mood:
      |    description: "Overall mood"
      |    examples: ["calm", "stormy"]
      |  Depth:
      |    description: "How deep to go"
      |tools:
      |  Journal:
      |    description: "Write a journal entry"
      |    parameters:
      |      Mood:            # null binding -> required
      |      Depth: shallow   # default binding -> required-with-default
      |      Missing:         # not in pool -> skipped
      |    frames:
      |      insights:
      |        type: List
      |        required: true
      |      word_count:
      |        type: integer
      |      certainty:
      |        type: number
      |      final:
      |        type: boolean
      |      extras:
      |        type: object
      |      note:            # untyped -> string
      |  Ping:
      |    description: "No params, no frames"
      |""".stripMargin

  lazy val arch: Archetype = ArchetypeCatalog.fromYaml(fixture)

  test("parses title/version and tool set") {
    assert(arch.title == "test_archetype")
    assert(arch.version == "1.0")
    assert(arch.tools.keySet == Set("Journal", "Ping"))
  }

  test("null binding is required, string binding carries default, unknown pool param skipped") {
    val j = arch.tool("Journal")
    assert(j.paramNames == Set("Mood", "Depth"))
    val depth = j.parameters.find(_.name == "Depth").get
    assert(depth.default.contains("shallow"))
    assert(j.parameters.find(_.name == "Mood").get.default.isEmpty)
  }

  test("pool metadata (description/examples) flows into bindings") {
    val mood = arch.tool("Journal").parameters.find(_.name == "Mood").get
    assert(mood.description == "Overall mood")
    assert(mood.examples == Seq("calm", "stormy"))
  }

  test("frame types map list->array, untyped->string; required is opt-in") {
    val j = arch.tool("Journal")
    val types = j.frames.map(f => f.name -> f.frameType).toMap
    assert(types == Map("insights" -> "array", "word_count" -> "integer",
      "certainty" -> "number", "final" -> "boolean", "extras" -> "object",
      "note" -> "string"))
    assert(j.frames.filter(_.required).map(_.name) == Seq("insights"))
  }

  test("required keys = standard fields + null-bound params + required frames") {
    val j = arch.tool("Journal")
    assert(j.requiredKeys ==
      Set("Title", "Content", "Context", "Mood", "insights"))
    // Depth has a default -> satisfied by default fill, not required on input
    assert(j.defaults == Map("Depth" -> "shallow"))
  }

  test("allowed keys form the closed world (additionalProperties=false)") {
    val p = arch.tool("Ping")
    assert(p.allowedKeys == Set("Title", "Content", "Context"))
  }

  test("frameStructType reflects declared types") {
    import org.apache.spark.sql.types._
    val st = arch.tool("Journal").frameStructType
    assert(st("insights").dataType == ArrayType(StringType))
    assert(st("word_count").dataType == LongType)
    assert(st("certainty").dataType == DoubleType)
    assert(st("final").dataType == BooleanType)
    assert(st("extras").dataType == MapType(StringType, StringType))
    assert(st("note").dataType == StringType)
  }

  test("unknown tool lookup raises") {
    intercept[IllegalArgumentException](arch.tool("Nope"))
  }
}
