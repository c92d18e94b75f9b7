package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** The named result-cache surface: hits serve from the in-memory
  * relation, invalidation releases BOTH the view and the pinned blocks
  * (the leak class PlanAuditSpec polices globally). */
class QueryCacheSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** Every test releases its cache entries even on assertion failure —
    * a leaked entry would cascade into the next test's leak checks. */
  private def withCleanCache(body: => Unit): Unit =
    try body finally QueryCache.clear(spark)

  test("put/get/invalidate lifecycle, plans read the cache, no block leak")(withCleanCache {
    val agg = Tables.table(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))

    assert(QueryCache.get(spark, "q_flag_qty").isEmpty)
    val cached = QueryCache.put(agg, "q_flag_qty")
    assert(QueryCache.isCached(spark, "q_flag_qty"))
    assert(QueryCache.entries(spark) == Seq("q_flag_qty"))

    // a cache hit must plan against the InMemoryRelation, not the scan
    // (Spark 4 renders the cached scan as `Scan In-memory table` over an
    // InMemoryRelation; assert on the relation, which both versions print)
    val hit = QueryCache.get(spark, "q_flag_qty").get
    assert(hit.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
    assert(hit.collect().toSeq == cached.collect().toSeq)

    // compute-through: second call must NOT recompute (same cached rows)
    var computed = 0
    val served = QueryCache.getOrPut(spark, "q_flag_qty") {
      computed += 1; agg
    }
    assert(computed == 0)
    assert(served.count() == agg.count())

    // invalidate releases the view AND the pinned blocks
    QueryCache.invalidate(spark, "q_flag_qty")
    assert(!QueryCache.isCached(spark, "q_flag_qty"))
    assert(QueryCache.get(spark, "q_flag_qty").isEmpty)
    assert(QueryCache.entries(spark).isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "invalidate left pinned RDD blocks behind")
  })

  test("clear releases only cache-owned views")(withCleanCache {
    val df = Tables.table(spark, sf, "nation")
    df.createOrReplaceTempView("user_owned_view")
    QueryCache.put(df, "a")
    QueryCache.put(df.limit(3), "b")
    assert(QueryCache.entries(spark).sorted == Seq("a", "b"))
    QueryCache.clear(spark)
    assert(QueryCache.entries(spark).isEmpty)
    assert(spark.catalog.tableExists("user_owned_view"))
    spark.catalog.dropTempView("user_owned_view")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  })

  test("put replaces a stale entry for the same name")(withCleanCache {
    val small = Tables.table(spark, sf, "region")
    QueryCache.put(small.limit(2), "r")
    assert(QueryCache.get(spark, "r").get.count() == 2)
    QueryCache.put(small, "r")
    assert(QueryCache.get(spark, "r").get.count() == small.count())
    QueryCache.invalidate(spark, "r")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  })
}
