package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Integer PageRank against hand-computed values, its partitioning
  * invariance (the property float PR does NOT have), gram-edge capping,
  * and the single-pass profile against known statistics. */
class GraphProfileSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def chain3 = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")

  test("pageRankInt: one round on the 3-chain matches hand arithmetic") {
    // N=3: tele = 15e9/300 = 50,000,000; r0 = 333,333,333.
    // contrib 1→2 = (r0*85)//100 = 283,333,333 (deg 1)
    // contrib 2→x = (r0*85)//200 = 141,666,666 (deg 2, both neighbors)
    val got = GraphAnalytics.pageRankInt(chain3, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 50000000L + 141666666L)
    assert(got(2L) == 50000000L + 283333333L * 2)
    assert(got(3L) == 50000000L + 141666666L)
  }

  test("pageRankInt is exactly invariant under edge repartitioning") {
    // 40-node preferential-ish graph: i links to i/2 and to 0 (symmetric).
    val edges = (1L until 40L).flatMap { i =>
      Seq((i, i / 2), (i / 2, i), (i, 0L), (0L, i))
    }.distinct.filter { case (a, b) => a != b }.toDF("src", "dst")
    def run(parts: Int): Map[Long, Long] =
      GraphAnalytics.pageRankInt(edges.repartition(parts), 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(1)
    assert(a == run(13), "Long arithmetic must not depend on layout")
    // hub 0 dominates; total mass stays within truncation loss of SCALE
    assert(a(0L) == a.values.max)
    val total = a.values.sum
    assert(total <= GraphAnalytics.Scale)
    assert(total > GraphAnalytics.Scale - 40L * 6 * 50,
      s"truncation loss larger than bound: $total")
  }

  test("gramEdges caps per-gram membership and emits symmetric pairs") {
    // 12 docs sharing one 3-token phrase → cap 4 keeps ids 0..3 →
    // 4·3 = 12 directed pairs, symmetric, no self-loops.
    val docs = (0L until 12L)
      .map(i => (i, s"shared common phrase tail$i"))
      .toDF("doc_id", "text")
    val e = GraphAnalytics.gramEdges(docs, "doc_id", "text", k = 3,
        capPerGram = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.length == 12)
    assert(e.forall { case (a, b) => a < 4 && b < 4 && a != b })
    assert(e.toSet == e.map { case (a, b) => (b, a) }.toSet, "symmetric")
  }

  test("profile reports nulls, distincts, ranges, and means exactly") {
    val df = Seq(
      (Some(1.0), "a"), (Some(2.0), "b"), (None, "a"), (Some(2.0), "c"))
      .toDF("x", "s")
    val rows = Profile.profile(df,
        Seq(Profile.ColSpec("x", numeric = true),
          Profile.ColSpec("s", numeric = false)))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getLong(1) == 4L && x.getLong(2) == 1L && x.getLong(3) == 2L)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.0)
    assert(x.getDouble(6) == 1.6667, "mean of non-null values, rounded")
    assert(x.isNullAt(7) && x.isNullAt(8))
    val s = rows("s")
    assert(s.getLong(2) == 0L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "c")
  }

  test("q152 plans one wide stats scan plus one SINGLE-COLUMN scan per " +
      "distinct count, and no SortAggregate") {
    // The profile cost contract: non-distinct statistics share ONE scan;
    // each exact distinct count is its own single-distinct HashAggregate
    // over a scan PRUNED to that one column (columnar IO ≈ free), never
    // the multi-distinct Expand rewrite — which Spark plans as a
    // SortAggregate over the expanded tuple space (measured ~8× slower
    // at sf0.1). A regression to either shape fails here.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val df = SparkEntry.queries("q152_profile")(spark,
      "/root/testdata/sf0.001")
    val nodes = walk(df.queryExecution.executedPlan)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val nCols = 6 // q152's profiled column count
    assert(scans.length == nCols + 1,
      s"expected 1 stats + $nCols distinct scans, got ${scans.length}")
    // ≤ 2 source columns per distinct scan: qty_nullable is DERIVED
    // from (l_orderkey, l_quantity), so its pruned scan legitimately
    // reads both; every direct column prunes to exactly one.
    assert(scans.count(_.output.length <= 2) >= nCols,
      s"distinct scans must prune to their source columns: " +
        s"${scans.map(_.output.map(_.name))}")
    // grouping-keyed SortAggregate is the Expand-rewrite signature (it
    // sorts rows×(N+1) expanded tuples); the global no-key form Spark
    // picks for string min/max buffers is a streaming fold — harmless.
    assert(!nodes.exists {
      case s: SortAggregateExec => s.groupingExpressions.nonEmpty
      case _ => false
    }, "profile must not fall into the multi-distinct SortAggregate shape")
  }
}
