package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The reference's user-extension surface: YAML "archetype" files that
  * declare tools (= ingest schemas) built from a global parameter pool and
  * per-tool typed output frames (reference: fegis/schema.py:61-225 and the
  * five shipped archetype YAML files).
  *
  * Semantics reproduced exactly:
  *  - every tool carries required string fields Title/Content/Context
  *    (schema.py:53-58, 98-106);
  *  - a tool binds a pool parameter with `null` → required, or a non-empty
  *    string → required-with-default (schema.py:161-169); bindings naming
  *    an unknown pool parameter, or bound to a non-string value, are
  *    skipped with a warning (schema.py:146-151, 170-175);
  *  - frames are typed {list→array, string, integer, number, boolean,
  *    object}, untyped → string, `required: true` opt-in
  *    (schema.py:198-221);
  *  - the compiled schema is closed: additionalProperties false
  *    (schema.py:128).
  *
  * This is driver-side catalog code (no Spark jobs) — the Spark-facing
  * output is [[ToolSchema.frameStructType]] for typed `from_json`
  * extraction and the key-sets the validator compiles to Column predicates.
  */
final case class ParamSpec(
    name: String,
    description: String,
    examples: Seq[String],
    default: Option[String],
    paramType: String = "string") {
  def required: Boolean = true // null-bound and default-bound are both required
}

final case class FrameSpec(name: String, frameType: String, required: Boolean) {
  /** Spark type for typed frame extraction. `array`/`object` payloads keep
    * string elements/values — the reference's frames are JSON-encoded
    * free-form (schema.py:198-205), typed views refine per archetype. */
  def sparkType: DataType = frameType match {
    case "array"   => ArrayType(StringType)
    case "integer" => LongType
    case "number"  => DoubleType
    case "boolean" => BooleanType
    case "object"  => MapType(StringType, StringType)
    case _         => StringType
  }
}

final case class ToolSchema(
    name: String,
    description: String,
    parameters: Seq[ParamSpec],
    frames: Seq[FrameSpec]) {

  val standardFields: Seq[String] = ToolSchema.StandardFields

  def paramNames: Set[String] = parameters.map(_.name).toSet
  def frameNames: Set[String] = frames.map(_.name).toSet

  /** All keys a call may carry — closed world (additionalProperties=false). */
  def allowedKeys: Set[String] = standardFields.toSet ++ paramNames ++ frameNames

  /** Keys a call must carry (standard fields + all bound params + required
    * frames); params with defaults are satisfied by default-filling before
    * validation, mirroring fastjsonschema's default insertion. */
  def requiredKeys: Set[String] =
    standardFields.toSet ++
      parameters.filter(_.default.isEmpty).map(_.name) ++
      frames.filter(_.required).map(_.name)

  def defaults: Map[String, String] =
    parameters.flatMap(p => p.default.map(p.name -> _)).toMap

  def typedFrames: Seq[FrameSpec] = frames.filter(_.frameType != "string")

  /** StructType for `from_json` extraction of this tool's frames. */
  def frameStructType: StructType =
    StructType(frames.map(f => StructField(f.name, f.sparkType, nullable = true)))
}

object ToolSchema {
  val StandardFields: Seq[String] = Seq("Title", "Content", "Context")
}

final case class Archetype(
    title: String,
    version: String,
    tools: Map[String, ToolSchema]) {
  def tool(name: String): ToolSchema =
    tools.getOrElse(name, throw new IllegalArgumentException(s"unknown tool '$name'"))
}

object ArchetypeCatalog {

  private val TypeMapping = Map(
    "list" -> "array", "string" -> "string", "integer" -> "integer",
    "number" -> "number", "boolean" -> "boolean", "object" -> "object")

  private lazy val mapper = new ObjectMapper(new YAMLFactory())

  def fromFile(path: String): Archetype =
    fromNode(mapper.readTree(new java.io.File(path)))

  def fromYaml(yaml: String): Archetype =
    fromNode(mapper.readTree(yaml))

  private def textOf(n: JsonNode, field: String, default: String = ""): String =
    Option(n.get(field)).map(_.asText).getOrElse(default)

  /** Ordered (name, node) pairs of an object node. Jackson's `properties()`
    * is insertion-ordered, but mapping its `asScala` SET wrapper rebuilds a
    * HashSet and scrambles YAML declaration order — which is part of the
    * contract: parameters and frames render in binding order
    * (schema.py:140, 207). Iterate, don't wrap. */
  private def fieldsOf(n: JsonNode): Seq[(String, JsonNode)] =
    Option(n).toSeq.flatMap(_.properties().iterator().asScala.map(e =>
      e.getKey -> e.getValue).toSeq)

  private def fromNode(root: JsonNode): Archetype = {
    // pool entry: (description, examples, declared type — "string" when
    // absent, schema.py:154 `global_param_definition.get(KEY_TYPE, KEY_STRING)`)
    val pool: Map[String, (String, Seq[String], String)] =
      fieldsOf(root.get("parameters")).map { case (name, v) =>
        val ex = Option(v.get("examples"))
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
        name -> ((textOf(v, "description"), ex, textOf(v, "type", "string")))
      }.toMap

    val tools = fieldsOf(root.get("tools")).map { case (name, defn) =>
      val params = fieldsOf(defn.get("parameters")).flatMap { case (pname, binding) =>
        pool.get(pname) match {
          case None => None // unknown pool parameter: skip (schema.py:146-151)
          case Some((desc, examples, ptype)) =>
            if (binding == null || binding.isNull)
              Some(ParamSpec(pname, desc, examples, None, ptype))
            else if (binding.isTextual && binding.asText.nonEmpty)
              Some(ParamSpec(pname, desc, examples, Some(binding.asText), ptype))
            else None // invalid binding: skip (schema.py:170-175)
        }
      }

      val frames = fieldsOf(defn.get("frames")).map { case (fname, fd) =>
        val isObj = fd != null && fd.isObject
        val rawType =
          if (isObj) textOf(fd, "type", "string").toLowerCase else "string"
        val required = isObj && Option(fd.get("required")).exists(_.asBoolean(false))
        FrameSpec(fname, TypeMapping.getOrElse(rawType, rawType), required)
      }

      name -> ToolSchema(name, textOf(defn, "description", s"Tool: $name"), params, frames)
    }.toMap

    Archetype(textOf(root, "title"), textOf(root, "version"), tools)
  }
}
