package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan lint (SURVEY §4: the reference's "avoid full scans"
  * cost gate, README.md:29-31, done natively): one record per query with
  * the plan features that matter at 100 TB —
  *
  *   exchanges      shuffle count (each is a full network pass)
  *   reused         ReusedExchange count — shared shuffle subtrees (how
  *                  multi-consumer pipelines avoid recompute WITHOUT
  *                  persist; dedup/simhash rely on this)
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
  * The ENFORCED form of this gate is PlanAuditSpec (sbt test fails on a
  * cartesian outside the allow-list or a bounded query missing its
  * top-k); this main is the human-readable report over every query.
  *
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  final case class Features(
      exchanges: Int, reusedExchanges: Int, topk: Boolean,
      globalSorts: Int, codegen: Int, cartesian: Boolean,
      broadcastJoins: Int, sortMergeJoins: Int) {
    override def toString: String =
      s"exchanges=$exchanges reused=$reusedExchanges topk=$topk " +
        s"global_sorts=$globalSorts codegen=$codegen cartesian=$cartesian " +
        s"bcast_joins=$broadcastJoins smj=$sortMergeJoins"
  }

  /** Build (and for streaming queries: run) the query, return the
    * executed plan's scale features. */
  def features(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Features = {
    val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
    def count(p: String) = p.r.findAllIn(plan).length
    Features(
      exchanges = count("Exchange hashpartitioning") +
        count("Exchange rangepartitioning"),
      reusedExchanges = count("ReusedExchange"),
      topk = plan.contains("TakeOrderedAndProject"),
      globalSorts = count("""Sort \[[^\]]*\], true"""),
      codegen = math.max(count("""\*\(\d+\)"""), count("WholeStageCodegen")),
      cartesian = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"),
      broadcastJoins = count("BroadcastHashJoin"),
      sortMergeJoins = count("SortMergeJoin"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try println(f"$name%-30s ${features(spark, sfDir, fn)}")
      catch {
        case e: Throwable =>
          println(f"$name%-30s AUDIT-ERROR ${e.getMessage.takeWhile(_ != '\n')}")
      }
    }
    spark.stop()
  }
}
