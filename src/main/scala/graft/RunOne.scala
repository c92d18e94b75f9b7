package graft

/** Dev harness: run ONE named query (optionally repeated) against a given
  * sf dir and print its wall time — the per-query profiling loop the full
  * Bench is too coarse for. Usage:
  *   runMain graft.RunOne <queryName> [sfDir] [repeats]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <queryName> [sfDir] [repeats]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local("graft-runone")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[runone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
