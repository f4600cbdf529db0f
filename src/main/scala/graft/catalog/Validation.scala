package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's call-time validation pass, compiled once per archetype to
  * Column predicates (reference: fegis/schema.py:76-83 compiles
  * fastjsonschema validators; fegis/server.py:88-94 enforces; 59-66 cleans
  * error text to drop the `data.` prefix — our messages are born clean).
  *
  * Input: tool-call rows `(tool STRING, args MAP<STRING,STRING>)` — frame
  * values JSON-encoded, as in the canonical store (SURVEY §1.4). Output:
  * the same rows plus `validation_errors ARRAY<STRING>`; empty array =
  * valid. Invalid rows route to a rejects sink, valid rows continue to
  * ingest — per-row, shuffle-free, fully codegen'd (no UDF), so the pass
  * costs one projection at any scale.
  *
  * Checks (fastjsonschema parity):
  *  - required: every required key present (standard fields + null-bound
  *    params + required frames); default-bound params are filled by
  *    [[withDefaults]] BEFORE validation, like fastjsonschema default
  *    insertion;
  *  - additionalProperties=false: any key outside the tool's closed key
  *    set is an error (schema.py:128);
  *  - frame typing: present typed-frame values must parse as their JSON
  *    type (list→array, integer, number, boolean, object);
  *  - unknown tool name is itself an error (server.py:177-193 routes only
  *    known tools).
  */
object Validation {

  /** Fill default-bound parameters into `args` where absent. */
  def withDefaults(df: DataFrame, archetype: Archetype,
      toolCol: String = "tool", argsCol: String = "args"): DataFrame = {
    val filled = archetype.tools.values.foldLeft(col(argsCol)) { (acc, ts) =>
      ts.defaults.foldLeft(acc) { case (a, (k, v)) =>
        when(col(toolCol) === ts.name && !map_contains_key(a, lit(k)),
          map_concat(a, map(lit(k), lit(v)))).otherwise(a)
      }
    }
    df.withColumn(argsCol, filled)
  }

  /** One nullable error Column per candidate violation; non-null survivors
    * are collected into `validation_errors`. */
  private def errorChecks(archetype: Archetype, toolCol: Column, argsCol: Column): Seq[Column] = {
    val knownTool = archetype.tools.keys.toSeq
    // NULL tool must fail too: isin is NULL (not false) under three-valued
    // logic, so the negation alone would let NULL-tool rows pass every check
    val unknownTool =
      when(toolCol.isNull || !toolCol.isin(knownTool: _*),
        concat(lit("unknown tool '"), coalesce(toolCol, lit("null")), lit("'")))

    val perTool = archetype.tools.values.toSeq.sortBy(_.name).flatMap { ts =>
      val isTool = toolCol === ts.name

      val missing = ts.requiredKeys.toSeq.sorted.map { k =>
        when(isTool && !map_contains_key(argsCol, lit(k)),
          lit(s"must contain property '$k'"))
      }

      // additionalProperties=false — closed key set per tool
      val allowed = ts.allowedKeys.toSeq.sorted
      val extras = filter(map_keys(argsCol), k => !k.isin(allowed.map(lit): _*))
      val unexpected =
        when(isTool && size(extras) > 0,
          concat(lit("must not contain unexpected properties "),
            to_json(array_sort(extras))))

      val badTypes = ts.typedFrames.map { f =>
        val v = element_at(argsCol, f.name)
        val parses = f.frameType match {
          case "array"   => from_json(v, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)).isNotNull
          case "integer" => v.try_cast("long").isNotNull
          case "number"  => v.try_cast("double").isNotNull
          case "boolean" => lower(v).isin("true", "false")
          case "object"  => from_json(v, org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).isNotNull
          case _         => lit(true)
        }
        when(isTool && v.isNotNull && !parses,
          lit(s"property '${f.name}' must be ${f.frameType}"))
      }
      missing ++ Seq(unexpected) ++ badTypes
    }
    unknownTool +: perTool
  }

  /** Add `validation_errors ARRAY<STRING>` (empty = valid). */
  def validate(df: DataFrame, archetype: Archetype,
      toolCol: String = "tool", argsCol: String = "args"): DataFrame = {
    val checks = errorChecks(archetype, col(toolCol), col(argsCol))
    df.withColumn("validation_errors",
      filter(array(checks: _*), c => c.isNotNull))
  }

  def valid(validated: DataFrame): DataFrame =
    validated.where(size(col("validation_errors")) === 0).drop("validation_errors")

  /** The rejects channel: invalid rows with their cleaned error messages. */
  def rejects(validated: DataFrame): DataFrame =
    validated.where(size(col("validation_errors")) > 0)

  /** P1: split args into (parameters, frames) by schema key membership
    * (reference: server.py:80-87), and P2: extract the Title/Content/
    * Context envelope with the reference's defaults (storage.py:154-169):
    * title falls back to "{tool} Invocation", content to
    * "Tool: {name}\n{frames-json}".
    */
  def partitionArgs(df: DataFrame, archetype: Archetype,
      toolCol: String = "tool", argsCol: String = "args"): DataFrame = {
    val standard = ToolSchema.StandardFields
    def membership(sel: ToolSchema => Set[String]): Column =
      archetype.tools.values.toSeq.sortBy(_.name).foldLeft(
        map_filter(col(argsCol), (_, _) => lit(false))) { (acc, ts) =>
        when(col(toolCol) === ts.name,
          map_filter(col(argsCol), (k, _) => k.isin(sel(ts).toSeq.map(lit): _*)))
          .otherwise(acc)
      }
    df
      .withColumn("parameters", membership(_.paramNames))
      .withColumn("frames", membership(_.frameNames))
      .withColumn("title",
        coalesce(element_at(col(argsCol), "Title"),
          concat(col(toolCol), lit(" Invocation"))))
      .withColumn("context", element_at(col(argsCol), "Context"))
      .withColumn("content",
        coalesce(element_at(col(argsCol), "Content"),
          concat(lit("Tool: "), col(toolCol), lit("\n"), to_json(col("frames")))))
  }

  /** Typed view of one tool's frames (SURVEY §1.4 "typed extraction"):
    * parse each JSON-encoded frame value through its archetype-declared
    * type into a `frames_typed` struct. String frames pass through as-is.
    */
  def typedFrames(df: DataFrame, ts: ToolSchema,
      framesCol: String = "frames"): DataFrame = {
    val fields = ts.frames.map { f =>
      val raw = element_at(col(framesCol), f.name)
      val parsed = f.frameType match {
        case "string" => raw
        case "integer" => raw.try_cast("long")
        case "number" => raw.try_cast("double")
        case "boolean" => lower(raw).try_cast("boolean")
        case _ => from_json(raw, f.sparkType)
      }
      parsed.as(f.name)
    }
    df.withColumn("frames_typed", struct(fields: _*))
  }
}
