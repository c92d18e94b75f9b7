package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 90% of the fact rows share one hot key — the shape salting exists for.
  private def fact = (0 until 2000).map(i =>
    (if (i % 10 == 0) (i % 7).toLong + 1 else 0L, i.toDouble))
    .toDF("k", "v")
  private def dim = (0L to 7L).map(k => (k, s"seg_$k")).toDF("k", "seg")

  test("saltedJoin is result-identical to the plain join") {
    val plain = fact.join(dim, "k").select("k", "v", "seg").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(fact, dim, "k").select("k", "v", "seg")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    assert(salted.length == 2000)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting scatters the hot key across sub-keys") {
    // the point of the exercise: the hot key's rows must spread over
    // (nearly) all salt values instead of landing on one reducer
    val salts = fact.withColumn("_salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .filter(col("k") === 0L)
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(salts >= 6, s"hot key only reached $salts of 8 salts")
  }

  test("identical duplicate rows still spread across salts") {
    // a row-content hash collapses duplicates onto ONE salt — exactly
    // wrong for a hot key made of repeated rows
    val dupes = Seq.fill(800)((0L, 1.0)).toDF("k", "v")
    val salts = Skew.saltedJoin(dupes, dim, "k", nSalts = 8)
    assert(salts.count() == 800)
    val spread = dupes.withColumn("_salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(spread >= 6, s"duplicate rows reached only $spread of 8 salts")
  }

  test("saltedJoin tolerates un-hashable (MapType) payload columns") {
    val withMap = fact.withColumn("m", map(lit("a"), col("v")))
    assert(Skew.saltedJoin(withMap, dim, "k").count() == 2000)
  }

  test("saltedJoin shuffles on (key, salt) when the dim can't broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.saltedJoin(fact, dim, "k")
        .queryExecution.executedPlan.toString
      val saltKeyed = plan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("_salt"))
      assert(saltKeyed, s"no (key, salt) exchange in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
