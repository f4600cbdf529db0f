package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** The reference's `tools/list` catalog surface: render each archetype tool
  * as the MCP-style JSON-Schema document a catalog consumer reads
  * (reference: fegis/schema.py:86-132 `create_tool_schemas`, served by
  * server.py:153-175), and compile a rendered document back into a
  * validator (schema.py:76-83 `create_tool_validators`).
  *
  * Rendering reproduces schema.py exactly:
  *  - the standard Title/Content/Context fields lead the property map as
  *    required strings with the fixed descriptions (schema.py:53-58,
  *    98-106);
  *  - bound pool parameters follow in binding order, each carrying the
  *    pool-declared type (default "string"), description (default ""),
  *    `examples` when declared, `default` when string-bound, and
  *    `x-required: true` (schema.py:140-177) — unknown-pool and
  *    invalid-value bindings were already skipped at catalog load;
  *  - frames follow in declaration order as bare `{"type": t}` with
  *    `x-required` only when opted in (schema.py:180-225, type_mapping
  *    at 198-205);
  *  - `required` is the sorted de-duplicated union (schema.py:127
  *    `sorted(set(required_fields))`) and the schema is closed with
  *    `additionalProperties: false` (schema.py:128).
  *
  * The canonical text form is compact JSON (no whitespace) with
  * insertion-ordered keys — deterministic, so the document itself is
  * hash-gateable against an expected literal. Driver-side code: the
  * catalog is metadata, never a Spark job.
  */
object ToolSchemaJson {

  private val StandardFieldDescriptions = Map(
    "Title" -> "A clear, descriptive title",
    "Content" -> "The main content",
    "Context" -> "Relevant context that informed this response")

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jstr(s: String): String = "\"" + esc(s) + "\""

  /** Render one tool's JSON-Schema document (compact canonical form). */
  def render(ts: ToolSchema): String = {
    val props = new StringBuilder
    var first = true
    def put(name: String, body: String): Unit = {
      if (!first) props.append(',')
      first = false
      props.append(jstr(name)).append(':').append(body)
    }

    ToolSchema.StandardFields.foreach { f =>
      put(f, s"""{"type":"string","description":${jstr(StandardFieldDescriptions(f))},"x-required":true}""")
    }

    ts.parameters.foreach { p =>
      val sb = new StringBuilder
      sb.append("{\"type\":").append(jstr(p.paramType))
        .append(",\"description\":").append(jstr(p.description))
      if (p.examples.nonEmpty)
        sb.append(",\"examples\":[").append(p.examples.map(jstr).mkString(",")).append(']')
      p.default.foreach(d => sb.append(",\"default\":").append(jstr(d)))
      sb.append(",\"x-required\":true}")
      put(p.name, sb.toString)
    }

    ts.frames.foreach { f =>
      val xr = if (f.required) ",\"x-required\":true" else ""
      put(f.name, s"""{"type":${jstr(f.frameType)}$xr}""")
    }

    val required = (ToolSchema.StandardFields ++
      ts.parameters.map(_.name) ++
      ts.frames.filter(_.required).map(_.name)).distinct.sorted

    s"""{"name":${jstr(ts.name)},"description":${jstr(ts.description)},""" +
      s""""inputSchema":{"type":"object","properties":{${props.toString}},""" +
      s""""required":[${required.map(jstr).mkString(",")}],"additionalProperties":false}}"""
  }

  /** All tool documents of an archetype, sorted by tool name for a
    * deterministic catalog listing. */
  def renderAll(a: Archetype): Seq[(String, String)] =
    a.tools.values.toSeq.sortBy(_.name).map(ts => ts.name -> render(ts))

  private lazy val mapper = new ObjectMapper()

  /** Compile a RENDERED schema document into a row validator — the
    * engine twin of `create_tool_validators` (schema.py:76-83), except it
    * consumes the emitted JSON rather than the in-memory `ToolSchema`, so
    * agreement with [[Validation.validate]] proves the rendered document
    * and the compiled Column predicates describe the same contract.
    *
    * Semantics mirror the fastjsonschema subset the reference relies on:
    * default insertion before required checks, `required`,
    * `additionalProperties: false`, and per-property JSON type checks for
    * the non-string frame types (values arrive JSON-encoded strings, as in
    * the canonical store).
    */
  def compileValidator(schemaJson: String): Map[String, String] => Seq[String] = {
    val root = mapper.readTree(schemaJson)
    val input = root.get("inputSchema")
    val props = input.get("properties")
    val allowed = props.fieldNames().asScala.toSet
    val required = input.get("required").elements().asScala.map(_.asText).toVector
    val defaults = props.properties().asScala.flatMap { e =>
      Option(e.getValue.get("default")).map(d => e.getKey -> d.asText)
    }.toMap
    val types: Map[String, String] = props.properties().asScala.map { e =>
      e.getKey -> e.getValue.get("type").asText
    }.toMap

    def parses(v: String, t: String): Boolean = t match {
      case "array" =>
        try { mapper.readTree(v).isArray } catch { case _: Exception => false }
      case "integer" => v.toLongOption.isDefined
      case "number" => v.toDoubleOption.isDefined
      case "boolean" => v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")
      case "object" =>
        try { mapper.readTree(v).isObject } catch { case _: Exception => false }
      case _ => true
    }

    (args: Map[String, String]) => {
      val filled = defaults.foldLeft(args) { case (a, (k, v)) =>
        if (a.contains(k)) a else a + (k -> v)
      }
      val missing = required.filterNot(filled.contains)
        .map(k => s"must contain property '$k'")
      val extras = filled.keys.filterNot(allowed).toSeq.sorted
      val unexpected =
        if (extras.nonEmpty)
          Seq("must not contain unexpected properties " +
            extras.map(jstr).mkString("[", ",", "]"))
        else Nil
      val badTypes = filled.toSeq.flatMap { case (k, v) =>
        types.get(k).filter(t => t != "string" && !parses(v, t))
          .map(t => s"property '$k' must be $t")
      }
      missing ++ unexpected ++ badTypes
    }
  }
}
