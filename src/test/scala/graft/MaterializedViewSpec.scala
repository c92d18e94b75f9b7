package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Incremental == recompute, at every version, across every commit
  * kind — the maintenance invariant that makes a materialized view
  * trustworthy. */
class MaterializedViewSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private def recompute(lake: String, v: Int) =
    VersionedLake.readAt(spark, lake, v)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("total"))

  private def snapshot(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("stepwise refresh tracks append, overwrite, and compaction; " +
      "keys leave the view at n=0; replays and no-ops don't re-commit") {
    import spark.implicits._
    val root = tempDir("mv")
    val lake = s"$root/lake"
    val mv = s"$root/mv"
    def batch(from: Long, to: Long, f: Long => Long) =
      (from until to).map(i => (i, f(i), i / 100)).toDF("id", "v", "k")
    VersionedLake.commit(batch(0, 200, _ * 2), lake)           // k = 0, 1
    VersionedLake.commit(batch(200, 400, _ * 2), lake)         // k = 2, 3
    VersionedLake.commit(batch(0, 100, _ * 5), lake,
      mode = "overwrite")                                      // only k = 0
    VersionedLake.compactVersions(spark, lake)
    (1 to 4).foreach { v =>
      val applied = MaterializedView.refresh(spark, lake, mv, "k", "v",
        upTo = Some(v))
      assert(applied == v)
      assert(snapshot(VersionedLake.readLatest(spark, mv)) ==
        snapshot(recompute(lake, v)),
        s"view diverged from recompute at version $v")
    }
    // the overwrite dropped k=1,2,3 entirely — they must have LEFT the
    // view (n reached 0), not linger as zero rows
    assert(snapshot(VersionedLake.readLatest(spark, mv)).map(_._1) == Seq(0L))
    // no new source version → refresh is a no-op and publishes nothing
    val mvVersionsBefore = VersionedLake.versions(spark, mv)
    assert(MaterializedView.refresh(spark, lake, mv, "k", "v") == 4)
    assert(VersionedLake.versions(spark, mv) == mvVersionsBefore)
    // replaying an already-applied bound is equally inert
    assert(MaterializedView.refresh(spark, lake, mv, "k", "v",
      upTo = Some(2)) == 4)
    assert(VersionedLake.versions(spark, mv) == mvVersionsBefore)
  }

  test("a cold view builds from the full snapshot; a warm append " +
      "refresh applies only the delta") {
    import spark.implicits._
    val root = tempDir("mv-cold")
    val lake = s"$root/lake"
    val mv = s"$root/mv"
    def batch(from: Long, to: Long) =
      (from until to).map(i => (i, i, i % 3)).toDF("id", "v", "k")
    VersionedLake.commit(batch(0, 30), lake)
    VersionedLake.commit(batch(30, 60), lake)
    // cold build goes straight to the tip
    assert(MaterializedView.refresh(spark, lake, mv, "k", "v") == 2)
    assert(snapshot(VersionedLake.readLatest(spark, mv)) ==
      snapshot(recompute(lake, 2)))
    // warm refresh across one more append: the changes() fast path
    // applies — VersionedLakeSpec pins its plan; here pin the result
    VersionedLake.commit(batch(60, 90), lake)
    assert(MaterializedView.refresh(spark, lake, mv, "k", "v") == 3)
    assert(snapshot(VersionedLake.readLatest(spark, mv)) ==
      snapshot(recompute(lake, 3)))
    assert(MaterializedView.appliedVersion(spark, mv) == 3)
  }
}
