package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** The no-full-scan policy as a runtime check: partitioned lake scans
  * without a partition predicate are rejected; pruned scans, data-only
  * filters on unguarded paths, and unpartitioned tables pass. */
class ScanGuardSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private lazy val root = {
    val r = tempDir("scanguard")
    EegFixture.write(s"$r/in", EegFixture.specA)
    Ingest.ingestBatch(spark, s"$r/in", s"$r/lake", s"$r/registry",
      s"$r/processed")
    r
  }

  test("a partition-filtered lake scan passes; a bare scan is rejected " +
      "with the partition columns named") {
    ScanGuard.requirePruned(
      Lake.read(spark, s"$root/lake").filter("Year = 2019 AND Month = 7"),
      s"$root/lake")
    val e = intercept[IllegalArgumentException](
      ScanGuard.requirePruned(Lake.read(spark, s"$root/lake"), s"$root/lake"))
    assert(e.getMessage.contains("Year/Month/Day"))
    // a data-column filter alone does NOT prune partitions — still rejected
    intercept[IllegalArgumentException](ScanGuard.requirePruned(
      Lake.read(spark, s"$root/lake").filter("Time > 100.0"), s"$root/lake"))
  }

  test("unpartitioned tables and paths outside the guard are untouched; " +
      "the walk sees scans under joins and AQE") {
    val flat = s"$root/flat"
    spark.range(0, 100).toDF("id").write.parquet(flat)
    // unpartitioned: nothing to prune, full scan is legitimate
    ScanGuard.requirePruned(spark.read.parquet(flat), flat)
    // guarded path elsewhere: this df never touches it
    ScanGuard.requirePruned(spark.read.parquet(flat), s"$root/lake")
    // the guarded scan hides under a join on a DATA column — no
    // partition filter can exist, so it is found and rejected
    val dataJoin = Lake.read(spark, s"$root/lake")
      .join(spark.read.parquet(flat),
        col("Time") === col("id").cast("double"), "left_semi")
    intercept[IllegalArgumentException](
      ScanGuard.requirePruned(dataJoin, s"$root/lake"))
    // ...and passes once the partition predicate is added
    ScanGuard.requirePruned(dataJoin.filter("Year = 2019"), s"$root/lake")
    // a join ON the partition column passes WITHOUT a literal filter:
    // dynamic partition pruning plants a runtime partition filter, and
    // runtime pruning satisfies the policy as well as a static one
    ScanGuard.requirePruned(
      Lake.read(spark, s"$root/lake")
        .join(spark.read.parquet(flat), col("Day") === col("id"),
          "left_semi"),
      s"$root/lake")
  }

  test("Lake.probe is the guarded production entry point: a windowed " +
      "probe builds, an unwindowed probe throws at build time") {
    val probed = Lake.probe(spark, s"$root/lake")(
      _.filter("Year = 2019 AND Month = 7").select(col("Time")))
    assert(probed.columns.sameElements(Array("Time")))
    intercept[IllegalArgumentException](
      Lake.probe(spark, s"$root/lake")(_.select(col("Time"))))
  }

  test("requireNarrow enforces the scan-narrow half: accounting reads " +
      "pass, a wide projection of the guarded lake throws") {
    // partitionCounts guards itself (0 data columns) — must build clean
    Lake.partitionCounts(spark, s"$root/lake").columns
    // a 1-data-column accounting scan at the matching bound passes
    ScanGuard.requireNarrow(
      Lake.read(spark, s"$root/lake")
        .groupBy(col("Year")).agg(sum(col("Time"))),
      s"$root/lake", maxDataCols = 1)
    // the same lake probed with a full-width projection is rejected,
    // and the message names the width
    val e = intercept[IllegalArgumentException](ScanGuard.requireNarrow(
      Lake.read(spark, s"$root/lake"), s"$root/lake", maxDataCols = 2))
    assert(e.getMessage.contains("narrow"))
    // unguarded paths stay untouched whatever their width
    ScanGuard.requireNarrow(
      Lake.read(spark, s"$root/lake"), s"$root/other", maxDataCols = 0)
  }
}
