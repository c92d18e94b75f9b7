package graft

/** Per-round benchmark main. One untimed warmup pass amortizes JVM/codegen
  * warmup and parquet footer caching out of the numbers; timed runs force
  * full evaluation through the noop sink (`count()` would let Catalyst
  * prune unreferenced projected columns — the noop write materializes
  * every column of every row).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // Harness hygiene, outside the timed region: no query is allowed to
      // leak cached data into the next query's measurement. Operators
      // don't persist anymore, so this is a cheap no-op guard against
      // future regressions rather than a cleanup of known leaks.
      spark.catalog.clearCache()
      elapsed
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(force) // warmup (untimed)
    val results = names.map(n => n -> force(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failures = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$failures}""")
    spark.stop()
    // A bench with failed queries must not look like a healthy run.
    if (failures > 0) sys.exit(1)
  }
}
