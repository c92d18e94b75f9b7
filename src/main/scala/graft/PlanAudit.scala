package graft

/** Physical-plan lint (SURVEY §4: the reference's "avoid full scans"
  * cost gate, README.md:29-31, done natively): prints one line per query
  * with the plan features that matter at 100 TB —
  *
  *   exchanges      shuffle count (each is a full network pass)
  *   topk           TakeOrderedAndProject present (bounded ordered output
  *                  without a global sort)
  *   global_sorts   Sort operators with global=true NOT absorbed into a
  *                  top-k — a scale smell unless the output is bounded
  *   codegen        WholeStageCodegen span count (wider is better);
  *                  0 for AQE plans inspected pre-execution — AQE only
  *                  materializes codegen'd stages as they run
  *   cartesian      Cartesian/BroadcastNestedLoop present — only
  *                  acceptable for deliberately bounded inputs
  *
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def count(p: String) = p.r.findAllIn(plan).length
        val line = Seq(
          f"exchanges=${count("Exchange hashpartitioning") + count("Exchange rangepartitioning")}",
          f"topk=${plan.contains("TakeOrderedAndProject")}",
          f"global_sorts=${count("""Sort \[[^\]]*\], true""")}",
          f"codegen=${math.max(count("""\*\(\d+\)"""), count("WholeStageCodegen"))}",
          f"cartesian=${plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")}"
        ).mkString(" ")
        println(f"$name%-30s $line")
      } catch {
        case e: Throwable =>
          println(f"$name%-30s AUDIT-ERROR ${e.getMessage.takeWhile(_ != '\n')}")
      }
    }
    spark.stop()
  }
}
