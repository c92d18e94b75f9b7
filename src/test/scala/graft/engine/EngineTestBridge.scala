package graft.engine

import org.apache.spark.sql.SparkSession

/** Test-only bridge into `private[engine]` seams, so specs (package
  * `graft`) can exercise protocol internals — e.g. replaying a
  * copy-on-write publish against a tip that concurrently moved —
  * without widening the production API. */
object EngineTestBridge {
  def publishReplacingChecked(spark: SparkSession, dir: String,
      dropped: Set[String], added: String,
      snapshot: Set[String]): Int =
    VersionedLake.publishReplacingChecked(spark, dir, dropped, added,
      snapshot)
}
