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

  test("CMS slices merge to the single-pass sketch; estimates dominate " +
      "exact within eps*N; native probe == driver probe") {
    // the q107 contract, three layers:
    //  1. counter-wise merge of per-slice sketches == sketching the whole
    //     corpus in one pass (CMS counters sum, so this is EXACT equality
    //     per key, not approximate agreement);
    //  2. estimates never undercount, and overcount by at most eps*N on
    //     this fixed input (deterministic for a fixed seed — a strict
    //     assertion, not a tolerance);
    //  3. the codegen'd CmsEstimate expression returns bit-identical
    //     estimates to driver-side CountMinSketch.estimateCount — i.e.
    //     the aggregate's long-item hash and the probe's agree, and the
    //     codegen path is faithful.
    import org.apache.spark.util.sketch.CountMinSketch
    val eps = 0.001
    val k = when(pmod(col("user_id"), lit(4)) === 1, lit(900001L))
      .when(pmod(col("user_id"), lit(8)) === 2, lit(900002L))
      .when(pmod(col("user_id"), lit(16)) === 4, lit(900003L))
      .otherwise(col("user_id")).cast("long").as("k")
    val keyed = Tables.table(spark, sf, "events")
      .select(k, col("event_id"))
    val p = TestSpark.tempDir("cms-slices") + "/slices"
    keyed.groupBy(pmod(col("event_id"), lit(8)).as("slice"))
      .agg(expr("count_min_sketch(k, 0.001D, 0.999D, 42)").as("sk"))
      .write.parquet(p)
    val merged = spark.read.parquet(p).select(col("sk")).collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
      .reduce((a, b) => a.mergeInPlace(b))
    val single = CountMinSketch.readFrom(
      keyed.agg(expr("count_min_sketch(k, 0.001D, 0.999D, 42)").as("sk"))
        .collect()(0).getAs[Array[Byte]](0))
    val exact = keyed.groupBy(col("k")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(merged.totalCount == n, "merged sketch lost rows")
    val bound = math.ceil(eps * n).toLong
    for ((key, e) <- exact.toSeq.sortBy(_._1)) {
      val est = merged.estimateCount(java.lang.Long.valueOf(key))
      assert(est == single.estimateCount(java.lang.Long.valueOf(key)),
        s"key $key: merged est $est != single-pass est")
      assert(est >= e, s"key $key: CMS undercounted ($est < $e)")
      assert(est <= e + bound,
        s"key $key: overcount $est vs exact $e exceeds eps*N=$bound")
    }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    val viaExpr = spark
      .createDataFrame(exact.keys.toSeq.sorted.map(Tuple1.apply)).toDF("k")
      .select(col("k"), org.apache.spark.sql.graft.SketchFunctions
        .cmsEstimate(out.toByteArray, col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((key, est) <- viaExpr)
      assert(est == merged.estimateCount(java.lang.Long.valueOf(key)),
        s"key $key: native expression est $est != driver est")
  }
}
