package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance, type 2 (row-versioned history):
  * applying a batch of updates to a dimension never overwrites — the
  * current version of a changed row is CLOSED (`valid_to` = batch time)
  * and a new open version appended, so every historical join can ask
  * "what was this customer's segment when the order shipped?".
  *
  * Plan shape, sized for a dimension in the lake and a small-to-medium
  * update batch:
  *  - one equi-join of updates against the OPEN slice only (closed
  *    history is untouched and never read past its filter);
  *  - change detection is a column predicate over the tracked columns —
  *    no hashing, no full-row compare;
  *  - the changed-key set drives one semi- and one anti-join of the open
  *    slice (both broadcastable when the batch is dimension-batch-sized);
  *  - output is a UNION of four disjoint slices — closed history,
  *    newly-closed, untouched-open, new versions. Nothing is rewritten
  *    in place; with [[Lake]] storage only the open partition is
  *    rewritten and history partitions append.
  *
  * `valid_to` uses an explicit open sentinel instead of NULL so the
  * open-row predicate stays a plain comparison (null-safe equality
  * disables some pruning paths, and the DuckDB oracle hash-compares
  * sentinels exactly).
  */
object Scd {

  val OpenSentinel: Long = 99999999L

  def scd2Apply(current: DataFrame, updates: DataFrame, key: String,
      tracked: Seq[String], batchTs: Long): DataFrame = {
    require(tracked.nonEmpty, "scd2Apply needs at least one tracked column")
    val open = current.filter(col("valid_to") === OpenSentinel)
    val history = current.filter(col("valid_to") =!= OpenSentinel)

    val u = updates.select(col(key) +: tracked.map(c => col(c).as(s"_u_$c")): _*)
    // null-SAFE inequality: a tracked column transitioning NULL→value
    // (or back) is a change — plain =!= evaluates to NULL there, the
    // filter drops the row, and the update is silently lost
    val changeFilter = tracked.map(c => !(col(s"_u_$c") <=> col(c))).reduce(_ || _)
    // updates for keys that exist and actually differ in a tracked column
    val changed = open.join(u, key).filter(changeFilter)
    val changedKeys = changed.select(col(key)).distinct()

    val closedNow = open.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", lit(batchTs))
    val stillOpen = open.join(changedKeys, Seq(key), "left_anti")
    // UNtracked attribute columns (the mixed type-1/type-2 dimension
    // shape) ride along from the matched OPEN row: they are not
    // versioned, so the new version inherits them unchanged — without
    // this, the final positional select threw an unresolved-column
    // error for any dimension column outside `tracked`. `changed`
    // carries every `open` column, so the carry is a projection.
    val untracked = current.columns.filterNot(c =>
      c == key || tracked.contains(c) || c == "valid_from" || c == "valid_to")
    val newVersions = changed
      .select(col(key) +: (tracked.map(c => col(s"_u_$c").as(c)) ++
        untracked.map(col(_)) ++
        Seq(lit(batchTs).as("valid_from"), lit(OpenSentinel).as("valid_to"))): _*)

    val cols = current.columns.map(col).toIndexedSeq
    history.select(cols: _*)
      .unionByName(closedNow.select(cols: _*))
      .unionByName(stillOpen.select(cols: _*))
      .unionByName(newVersions.select(cols: _*))
  }

  /** Wrap a plain dimension snapshot as the initial SCD2 state: every
    * row open since `ts`. */
  def initial(dim: DataFrame, ts: Long = 0L): DataFrame =
    dim.withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(OpenSentinel))
}
