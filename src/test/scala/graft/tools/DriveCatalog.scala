package graft.tools

import graft.catalog._
import org.apache.spark.sql.SparkSession

/** Manual end-to-end drive of the catalog surface (not a test — run with
  * `sbt "Test/runMain graft.tools.DriveCatalog"`). */
object DriveCatalog {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val arch = ArchetypeCatalog.fromYaml(
      """version: "2"
        |title: demo
        |parameters:
        |  Tone:
        |    description: d
        |tools:
        |  Log:
        |    parameters:
        |      Tone: neutral
        |    frames:
        |      items:
        |        type: List
        |        required: true
        |""".stripMargin)
    println("TOOLS=" + arch.tools.keySet)
    val calls = Seq(
      ("Log", Map("Title" -> "t", "Content" -> "c", "Context" -> "x", "items" -> """["a"]""")),
      ("Log", Map("Title" -> "t", "Content" -> "c", "Context" -> "x", "items" -> "oops", "Bad" -> "1")),
      ("Nope", Map("Title" -> "t"))).toDF("tool", "args")
    val v = Validation.validate(Validation.withDefaults(calls, arch), arch)
    println("VALID=" + Validation.valid(v).count())
    Validation.rejects(v).select("tool", "validation_errors").collect()
      .foreach(r => println("REJECT=" + r))
    val p = Validation.partitionArgs(Validation.valid(v), arch)
      .select("parameters", "frames", "title", "content").head()
    println("PARTITIONED=" + p)
    s.stop()
  }
}
