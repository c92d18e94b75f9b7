package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Multi-batch SCD2 properties beyond q90's single-batch oracle:
  * version chains across sequential batches, and no-op idempotence. */
class ScdSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def snapshot(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("id", "seg", "bal")

  private def collectVersions(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("two sequential batches build a three-version chain with closed intervals") {
    val t0 = Scd.initial(snapshot((1L, "A", 10.0), (2L, "B", 20.0)))
    val t1 = Scd.scd2Apply(t0, snapshot((1L, "A2", 10.0)), "id",
      Seq("seg", "bal"), batchTs = 1L)
    val t2 = Scd.scd2Apply(t1, snapshot((1L, "A3", 11.0)), "id",
      Seq("seg", "bal"), batchTs = 2L)
    assert(collectVersions(t2) == Seq(
      (1L, "A", 10.0, 0L, 1L),
      (1L, "A2", 10.0, 1L, 2L),
      (1L, "A3", 11.0, 2L, Scd.OpenSentinel),
      (2L, "B", 20.0, 0L, Scd.OpenSentinel)))
  }

  test("no-op updates create no versions; re-applying a batch is idempotent") {
    val t0 = Scd.initial(snapshot((1L, "A", 10.0), (2L, "B", 20.0)))
    val upd = snapshot((1L, "A2", 10.0), (2L, "B", 20.0)) // row 2 unchanged
    val t1 = Scd.scd2Apply(t0, upd, "id", Seq("seg", "bal"), batchTs = 1L)
    assert(t1.count() == 3) // one close+reopen for id 1, id 2 untouched
    // same batch again: values now match the open versions — nothing moves
    val t2 = Scd.scd2Apply(t1, upd, "id", Seq("seg", "bal"), batchTs = 2L)
    assert(collectVersions(t2) == collectVersions(t1))
  }

  test("updates for unknown keys are ignored (dimension inserts are a separate path)") {
    val t0 = Scd.initial(snapshot((1L, "A", 10.0)))
    val t1 = Scd.scd2Apply(t0, snapshot((9L, "X", 1.0)), "id",
      Seq("seg", "bal"), batchTs = 1L)
    assert(collectVersions(t1) == Seq((1L, "A", 10.0, 0L, Scd.OpenSentinel)))
  }

  test("untracked attribute columns carry into new versions (mixed type-1/type-2 shape)") {
    // `country` is NOT in tracked: a tracked change must still version
    // the row, and the new version inherits country from the open row —
    // the untracked column neither errors out nor triggers versions.
    val t0 = Scd.initial(Seq((1L, "A", 10.0, "SE"), (2L, "B", 20.0, "DK"))
      .toDF("id", "seg", "bal", "country"))
    val t1 = Scd.scd2Apply(t0,
      Seq((1L, "A2", 10.0, "NO")).toDF("id", "seg", "bal", "country"),
      "id", Seq("seg", "bal"), batchTs = 1L)
    val got = t1.orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, "A", "SE", 1L),               // closed
      (1L, "A2", "SE", Scd.OpenSentinel), // new version keeps open row's country
      (2L, "B", "DK", Scd.OpenSentinel)))
    // a change ONLY in the untracked column is a no-op
    val t2 = Scd.scd2Apply(t1,
      Seq((2L, "B", 20.0, "FI")).toDF("id", "seg", "bal", "country"),
      "id", Seq("seg", "bal"), batchTs = 2L)
    assert(t2.count() == t1.count())
  }

  test("NULL→value and value→NULL transitions in tracked columns create versions") {
    // =!= is null-unsafe: it evaluates to NULL on these transitions and
    // the change filter silently dropped the update
    val t0 = Scd.initial(Seq((1L, Option.empty[String], 10.0),
      (2L, Some("B"), 20.0)).toDF("id", "seg", "bal"))
    val t1 = Scd.scd2Apply(t0,
      Seq((1L, Some("A"), 10.0), (2L, Option.empty[String], 20.0))
        .toDF("id", "seg", "bal"),
      "id", Seq("seg", "bal"), batchTs = 1L)
    val open = t1.filter(col("valid_to") === Scd.OpenSentinel)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toSeq
    assert(open == Seq(1L -> Some("A"), 2L -> None))
    assert(t1.count() == 4) // both rows closed + reopened
  }

  test("point-in-time lookup: as-of join against the version intervals") {
    val t0 = Scd.initial(snapshot((1L, "A", 10.0)))
    val t1 = Scd.scd2Apply(t0, snapshot((1L, "A2", 10.0)), "id",
      Seq("seg", "bal"), batchTs = 5L)
    def segAt(ts: Long): String = t1
      .filter(col("valid_from") <= ts && col("valid_to") > ts)
      .select("seg").head().getString(0)
    assert(segAt(3L) == "A")
    assert(segAt(7L) == "A2")
  }
}
