package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Accuracy contracts for the sketch aggregates (q23/q24). These queries
  * are rows-only in the driver's CORRECTNESS compare (DuckDB's sketches
  * differ bit-wise), so the VALUE quality is pinned here instead: each
  * sketch must land within its documented error bound of the exact
  * answer it approximates. Both sketches are deterministic for fixed
  * input, so these bounds are stable assertions, not flaky tolerances. */
class SketchSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def lineitem = Tables.table(spark, sf, "lineitem")

  test("approx_count_distinct (HLL++, rsd=0.01) within 1% of exact per group") {
    val approx = lineitem.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, e) <- exact) {
      val relErr = math.abs(approx(g) - e).toDouble / e
      assert(relErr <= 0.01,
        s"group $g: approx ${approx(g)} vs exact $e (relErr $relErr)")
    }
  }

  test("percentile_approx (accuracy=10000) within 1% rank tolerance per group") {
    val rows = lineitem.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val g = r.getString(0)
      val qs = r.getSeq[Double](1)
      val n = r.getLong(2).toDouble
      for ((phi, v) <- Seq(0.25, 0.5, 0.75).zip(qs)) {
        // rank check: the fraction of group rows <= sketch value must sit
        // within 1% of the requested quantile (sketch bound is 1/accuracy
        // = 0.01% of rank; the slack covers value ties/discreteness)
        val below = lineitem
          .filter(col("l_returnflag") === g && col("l_extendedprice") <= v)
          .count().toDouble / n
        assert(math.abs(below - phi) <= 0.01,
          s"group $g phi=$phi: sketch value $v sits at rank $below")
      }
    }
  }

  test("persisted HLL sketch slices union to the single-pass estimate") {
    // the q63 contract: sketch-per-slice → parquet binary round-trip →
    // union must estimate like sketching the whole corpus in one pass
    // (HLL insertion is order/partition-independent), and land within
    // the sketch's error bound of the exact distinct count
    val ev = Tables.table(spark, sf, "events")
    val single = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p = TestSpark.tempDir("hll-slices") + "/slices"
    ev.withColumn("slice", pmod(col("event_id"), lit(4)))
      .groupBy(col("slice"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.parquet(p)
    val merged = spark.read.parquet(p).groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((g, e) <- exact) {
      val relMerge = math.abs(merged(g) - single(g)).toDouble / single(g)
      assert(relMerge <= 0.02,
        s"group $g: union ${merged(g)} vs single-pass ${single(g)}")
      val relExact = math.abs(merged(g) - e).toDouble / e
      assert(relExact <= 0.05,
        s"group $g: union ${merged(g)} vs exact $e (relErr $relExact)")
    }
  }
}
