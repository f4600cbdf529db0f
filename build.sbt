ThisBuild / scalaVersion := "2.13.17"
// The bench/verify drivers parse the forked main's LAST stdout line as
// JSON; sbt's "[success] Total time ..." trailer lands after it and has
// made that parse fail in every round to date. Exit codes are unaffected.
Global / showSuccess := false
// Forked run output goes straight through to stdout/stderr instead of
// the sbt logger, which prefixes every line with "[info] " — a prefix
// that also breaks a strict json.loads of the bench line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / version := "0.1.0"
name := "fegisspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32-thread local runs over ~50 query shapes need real heap headroom;
  // an 8g heap produced multi-minute full-GC stalls mid-bench (128 GiB box)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 50+ distinct query shapes generate a lot of Janino classes; the
  // default 240m code cache fills mid-run and stalls the JIT
  "-XX:ReservedCodeCacheSize=512m",
)
