package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The reference's one stated cost rule — "avoid full scans: partition
  * the data and query only matching partitions" (reference
  * README.md:29-31, enforced organizationally through Athena) — as a
  * RUNTIME guard on the physical plan. PlanAuditSpec enforces the
  * policy on this repo's own queries at test time; this makes the same
  * check available to callers at query-build time, the way a data
  * platform team actually deploys such a rule against ad-hoc users.
  *
  * [[requirePruned]] walks the executed plan's file scans and rejects
  * any scan of a guarded path that arrives with NO partition filters —
  * i.e. a scan that would list and read every partition directory of a
  * partitioned lake. Unpartitioned tables (nothing to prune — e.g.
  * small dims) and paths outside the guard are untouched, and the walk
  * descends into AQE's wrapped plans. The check inspects ONLY plan
  * metadata; it never runs the query.
  */
object ScanGuard {

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      (other.children ++ other.subqueries).flatMap(fileScans)
  }

  /** Fail fast if `df` would full-scan a PARTITIONED table under
    * `guardedPath`: every file scan rooted there whose relation has
    * partition columns must carry at least one partition filter. */
  def requirePruned(df: DataFrame, guardedPath: String): Unit = {
    val guard = new org.apache.hadoop.fs.Path(guardedPath).toUri.getPath
    val offenders = fileScans(df.queryExecution.executedPlan).filter { s =>
      val partitioned = s.relation.partitionSchema.nonEmpty
      val underGuard = s.relation.location.rootPaths
        .exists(_.toUri.getPath.startsWith(guard))
      partitioned && underGuard && s.partitionFilters.isEmpty
    }
    require(offenders.isEmpty,
      s"full scan of partitioned data under $guardedPath — add a filter " +
        s"on ${offenders.map(_.relation.partitionSchema.fieldNames.mkString("/"))
          .distinct.mkString(", ")} (reference README.md:29-31 policy)")
  }

  /** The other half of the policy — "derive wide once, scan narrow
    * many": a query over a guarded lake may read every PARTITION only
    * when it reads almost no DATA columns (per-partition accounting /
    * maintenance, where the bytes touched are partition values +
    * footers, not rows). Rejects any guarded file scan whose pushed
    * ReadSchema carries more than `maxDataCols` data columns — the
    * regression this catches is column pruning silently breaking, which
    * turns an O(metadata) accounting query into an O(total bytes) scan
    * (catastrophic at 6,037 data columns / 100 TB). */
  def requireNarrow(df: DataFrame, guardedPath: String,
      maxDataCols: Int = 2): Unit = {
    val guard = new org.apache.hadoop.fs.Path(guardedPath).toUri.getPath
    val offenders = fileScans(df.queryExecution.executedPlan).filter { s =>
      val underGuard = s.relation.location.rootPaths
        .exists(_.toUri.getPath.startsWith(guard))
      underGuard && s.requiredSchema.size > maxDataCols
    }
    require(offenders.isEmpty,
      s"wide scan of guarded lake under $guardedPath — reads " +
        s"${offenders.map(_.requiredSchema.size).max} data columns " +
        s"(> $maxDataCols); project only what the query needs " +
        "(reference README.md:29-31 policy, narrow-scan half)")
  }
}
