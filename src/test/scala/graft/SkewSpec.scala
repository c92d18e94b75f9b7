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
    val salts = fact.withColumn("_salt", Skew.contentSalt(fact, 8))
      .filter(col("k") === 0L)
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(salts >= 6, s"hot key only reached $salts of 8 salts")
  }

  test("byte-identical duplicate rows still join correctly") {
    // content salting collapses exact duplicates onto one salt (the
    // documented residual-skew trade for retry determinism) — the join
    // RESULT must still be exact
    val dupes = Seq.fill(800)((0L, 1.0)).toDF("k", "v")
    assert(Skew.saltedJoin(dupes, dim, "k", nSalts = 8).count() == 800)
  }

  test("salt is a pure function of row content — stable across re-orderings") {
    // the ADVICE-flagged failure class (SPARK-23207): a positional-id
    // salt re-derived by a retried task after a shuffle can differ per
    // attempt. A content salt must be invariant to how the rows arrive.
    val a = fact.withColumn("_salt", Skew.contentSalt(fact, 8))
    val b = fact.repartition(13).sortWithinPartitions(col("v").desc)
    val bSalted = b.withColumn("_salt", Skew.contentSalt(b, 8))
    val diff = a.withColumnRenamed("_salt", "_sa")
      .join(bSalted.withColumnRenamed("_salt", "_sb"), Seq("k", "v"))
      .filter(col("_sa") =!= col("_sb")).count()
    assert(diff == 0, s"$diff rows changed salt under re-partitioning")
  }

  test("saltedJoinDupHeavy: exact-duplicate hot key collapses pre-shuffle, result multiset-identical") {
    // 5000 byte-identical copies of the hot row + a distinct-row tail:
    // the shape where content salting is a no-op (all copies share a
    // salt). The dup-heavy variant must (a) reproduce the plain join's
    // multiset exactly and (b) reach the join with the copies collapsed.
    val dupes = Seq.fill(5000)((0L, 1.0)).toDF("k", "v")
      .union((1 until 100).map(i => ((i % 7).toLong + 1, i.toDouble)).toDF("k", "v"))
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "v", "seg").count().collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
        .toSet
    val plain = multiset(dupes.join(dim, "k").select("k", "v", "seg"))
    val deduped = multiset(
      Skew.saltedJoinDupHeavy(dupes, dim, "k").select("k", "v", "seg"))
    assert(deduped == plain)
    // the collapse is real: pre-join cardinality is distinct contents
    val collapsed = dupes.groupBy("k", "v").count()
    assert(collapsed.count() == 100) // 1 hot content + 99 tail rows
    // blocked re-expansion: counts that straddle many blocks (B=7 →
    // 5000 copies = 714 full blocks + a 2-element tail) re-expand to
    // exactly the plain multiset — off-by-one in the block math would
    // drop or duplicate tail copies
    val blocked = multiset(Skew.saltedJoinDupHeavy(dupes, dim, "k",
      expandBlock = 7L).select("k", "v", "seg"))
    assert(blocked == plain)
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
