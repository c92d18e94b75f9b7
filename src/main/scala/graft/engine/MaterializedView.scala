package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the
  * [[VersionedLake]] manifest log: a grouped `(count, sum)` aggregate
  * kept current by applying version DELTAS, never by re-scanning the
  * source.
  *
  * The view is itself a versioned lake whose data-dir tag records the
  * source version it reflects (`upto<N>`), which buys three properties
  * for free: refresh is exactly-once under replay
  * ([[VersionedLake.commitTagged]] no-ops on a seen tag), the
  * last-applied version is recovered from the manifest itself (no side
  * state file to desync), and every refresh is a readable snapshot of
  * the view's own history.
  *
  * Scale shape: a refresh across append-only source commits reads ONLY
  * the added files ([[VersionedLake.changes]]' manifest fast path) and
  * aggregates them — O(delta) + a merge against the view, whose size
  * is bounded by key cardinality, not source size. Refreshing across
  * an overwrite/compaction boundary pays that step's snapshot diff
  * (correct, O(source)) — the same boundary rule as `changes`, so
  * callers refresh at least once per append segment to stay on the
  * fast path. Deletes arrive as negative deltas; groups that reach
  * n = 0 leave the view.
  */
object MaterializedView {

  private val TagPrefix = "upto"

  /** Source version the view at `mvDir` currently reflects, recovered
    * from the latest view manifest's data-dir tag; 0 for an empty or
    * uninitialized view. */
  def appliedVersion(spark: SparkSession, mvDir: String): Int = {
    val vs = VersionedLake.versions(spark, mvDir)
    if (vs.isEmpty) 0
    else VersionedLake.readManifestTags(spark, mvDir, vs.last)
      .collectFirst { case t if t.startsWith(TagPrefix) =>
        t.drop(TagPrefix.length).toInt }
      .getOrElse(0)
  }

  /** Bring the view up to the source's tip: aggregate the changed rows
    * since the last refresh, merge with the current view state, and
    * commit the result tagged with the tip version. Returns the source
    * version the view now reflects (the tip, or the already-applied
    * version when there is nothing new). The view schema is
    * `(<keyCol>, n, total)` with exact long arithmetic. */
  def refresh(spark: SparkSession, lakeDir: String, mvDir: String,
      keyCol: String, valCol: String, upTo: Option[Int] = None): Int = {
    val srcTip = VersionedLake.tip(spark, lakeDir).getOrElse(0)
    // `upTo` bounds the refresh to an older source version — the
    // stepwise cadence that keeps every step inside one append segment
    // (and so on the manifest fast path)
    val tip = upTo.fold(srcTip)(math.min(_, srcTip))
    val last = appliedVersion(spark, mvDir)
    if (tip <= last) last
    else {
      val delta =
        if (last == 0)
          VersionedLake.readAt(spark, lakeDir, tip)
            .withColumn("op", lit("insert"))
        else VersionedLake.changes(spark, lakeDir, last, tip)
      val sign = when(col("op") === "insert", lit(1L)).otherwise(lit(-1L))
      val deltaAgg = delta
        .groupBy(col(keyCol))
        .agg(sum(sign).as("n"), sum(sign * col(valCol)).as("total"))
      val merged =
        if (last == 0) deltaAgg
        else VersionedLake.readLatest(spark, mvDir)
          .unionByName(deltaAgg)
          .groupBy(col(keyCol))
          .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      val result = merged.filter(col("n") =!= 0)
      // overwrite commit: the view's live set is always ONE data dir,
      // so reads never pay a multi-dir merge and history stays flat
      VersionedLake.commitTagged(result, mvDir, s"$TagPrefix$tip",
        mode = "overwrite")
      tip
    }
  }
}
