package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B over an arbitrary session conf for named gates, one
  * JVM, min-of-N per arm (the r12 discipline: host ambient drifts ±30%
  * between JVMs, so only in-JVM alternation proves anything).
  *
  * `Test/runMain graft.tools.AbConfR13 <rounds> <confKey> <arm,...> <gate...>`
  * An arm value of `unset` removes the key for that arm. The session is
  * built like Bench's (local[32], p32, gate-scale stream pins), so arms
  * measure exactly what the bench would see.
  */
object AbConfR13 {
  def main(args: Array[String]): Unit = {
    val rounds = args(0).toInt
    val confKey = args(1)
    val arms = args(2).split(",").toSeq
    val gates = args.drop(3)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("graft.stream.parts", "4")
      .config("graft.stream.parts.fp", "8")
      .config("graft.stream.parts.ivj", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val prev = s.conf.getOption(confKey)
    def run(name: String, arm: String): Double = {
      if (arm == "unset") s.conf.unset(confKey)
      else s.conf.set(confKey, arm)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(s, d)
        .write.format("noop").mode("overwrite").save()
      finally prev match {
        case Some(p) => s.conf.set(confKey, p)
        case None => s.conf.unset(confKey)
      }
      s.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    gates.foreach { g => arms.foreach(a => run(g, a)) } // warm (JIT+codegen)
    gates.foreach { g =>
      val mins = arms.map { a =>
        var m = Double.MaxValue
        (1 to rounds).foreach(_ => m = math.min(m, run(g, a)))
        a -> m
      }
      println("AB " + f"$g%-28s " +
        mins.map { case (a, m) => f"$confKey=$a%-6s $m%6.2f" }.mkString("  "))
    }
    s.stop()
  }
}
