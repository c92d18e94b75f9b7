package graft

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * named queries (or every query) to plans/<tag>/<query>_<suffix>.txt —
  * the committed before/after plan artifacts the judge checks optimization
  * claims against. Plans are captured WITHOUT executing the query (the
  * initial AQE plan for batch queries); queries whose construction itself
  * runs jobs (streaming drains, lake fixtures) still stage their inputs.
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> [q1,q2,... | all] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <suffix> [names|all] [sfDir]")
    val tag = args(0); val suffix = args(1)
    val names = args.lift(2).filterNot(_ == "all")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-plan-dump")
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          SparkEntry.benchSetup.get(name).foreach(_(spark, sfDir))
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), txt)
          println(s"[plandump] $name -> plans/$tag/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
