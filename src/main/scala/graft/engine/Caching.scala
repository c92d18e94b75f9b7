package graft.engine

import org.apache.spark.sql.DataFrame

/** Lifecycle helpers for eagerly-materialized frames.
  *
  * `Dataset.localCheckpoint(true)` persists the materialized RDD
  * DIRECTLY on the RDD (not through the CacheManager), so
  * `Dataset.unpersist()` — which only uncaches CacheManager entries —
  * cannot release it, and neither does `spark.catalog.clearCache()`.
  * Left alone, every checkpoint pins executor storage until the driver
  * GCs the last reference AND the ContextCleaner runs: the round-3
  * polluted-heap failure class, now gated per-query in PlanAuditSpec.
  * Operators that checkpoint internally release their blocks here the
  * moment no future job can read them.
  */
private[graft] object Caching {

  /** Unpersist the RDD behind an eagerly localCheckpoint'ed frame.
    *
    * Only call once the frame is DEAD — a local checkpoint's lineage is
    * truncated, so a post-unpersist job over it fails with lost-block
    * errors rather than recomputing. No-op for frames that are not
    * checkpoint-backed. */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { r => r.unpersist(blocking); () }
}
