package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import graft.engine._

class TemporalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "p1"),
    (2L, 10L, ts("2024-01-01 10:05:00"), "p2"),
    (3L, 10L, ts("2024-01-01 09:00:00"), "p_before_any"),
    (4L, 20L, ts("2024-01-01 10:00:00"), "lonely_user")
  ).toDF("id", "k", "t", "tag")

  private def right = Seq(
    (10L, ts("2024-01-01 09:30:00"), 1.0),
    (10L, ts("2024-01-01 10:00:00"), 2.0), // exact tie with left id=1
    (10L, ts("2024-01-01 10:04:00"), 3.0),
    (30L, ts("2024-01-01 08:00:00"), 9.0) // key with no left rows
  ).toDF("k", "rt", "v")

  test("asOfJoin picks the latest right row at-or-before, inclusive ties") {
    val out = Temporal.asOfJoin(left, right, "k", "t", "rt")
      .orderBy("id").collect()
    // id=1: tie at 10:00 matches (inclusive, >= semantics)
    assert(out(0).getAs[Double]("asof_v") == 2.0)
    assert(out(0).getAs[Timestamp]("asof_rt") == ts("2024-01-01 10:00:00"))
    // id=2: latest of the three priors
    assert(out(1).getAs[Double]("asof_v") == 3.0)
    // id=3: before any right row -> null payload (left-outer)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v")))
    // id=4: key never on the right -> null payload
    assert(out(3).isNullAt(out(3).fieldIndex("asof_v")))
    // every left row and column survives
    assert(out.map(_.getAs[String]("tag")).toSeq ==
      Seq("p1", "p2", "p_before_any", "lonely_user"))
  }

  test("asOfJoin plans exactly one shuffle (union-and-window, no join)") {
    val plan = Temporal.asOfJoin(left, right, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, plan)
    assert(!plan.contains("Join"), "as-of must not plan a join")
  }

  test("rangeJoin matches inclusive bounds and only same-key pairs") {
    val out = Temporal.rangeJoin(left, right, "k", "t", "rt",
        beforeSec = 300L, afterSec = 0L)
      .select("id", "rt", "v").orderBy("id", "rt").collect()
    // id=1 @10:00, window [09:55,10:00]: only the 10:00 tie (inclusive end)
    // id=2 @10:05, window [10:00,10:05]: 10:00 (inclusive start) and 10:04
    // id=3 @09:00 and id=4 (key 20): no matches; key 30 never pairs
    val got = out.map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2.0), (2L, 2.0), (2L, 3.0)))
  }

  test("rangeJoin supports identical time-column names on both sides") {
    // asOfJoin already allows leftTime == rightTime (q55 uses ts/ts);
    // rangeJoin must too — the right time comes back as right_<name>.
    val r2 = right.withColumnRenamed("rt", "t")
    val out = Temporal.rangeJoin(left, r2, "k", "t", "t",
        beforeSec = 300L, afterSec = 0L)
      .select("id", "right_t", "v").orderBy("id", "right_t").collect()
    val got = out.map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2.0), (2L, 2.0), (2L, 3.0)))
  }

  test("rangeJoin aliases right time when a LEFT payload column shares its name") {
    // leftTime != rightTime, but left carries an unrelated column named
    // `rt` — without the alias the output would hold two `rt` columns
    val l2 = left.withColumn("rt", lit("left_payload"))
    val out = Temporal.rangeJoin(l2, right, "k", "t", "rt",
        beforeSec = 300L, afterSec = 0L)
    assert(out.columns.count(_ == "rt") == 1, out.columns.mkString(","))
    assert(out.columns.contains("right_rt"))
    val got = out.select("id", "right_rt", "v").orderBy("id", "right_rt")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2.0), (2L, 2.0), (2L, 3.0)))
  }

  test("rangeJoin rejects ambiguous shared payload columns up front") {
    val r2 = right.withColumnRenamed("v", "tag") // collides with left's tag
    val e = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(left, r2, "k", "t", "rt", 300L, 0L)
    }
    assert(e.getMessage.contains("tag"))
  }

  test("rangeJoin bucket expansion never duplicates a pair") {
    // windows straddling bucket borders: every (left, right) pair must
    // appear exactly once even when the left row expands to 2 buckets
    val l = (0 until 50).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 10:${i % 60}%02d:30"))).toDF("id", "k", "t")
    val r = (0 until 50).map(i =>
      (1L, ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toDouble)).toDF("k", "rt", "v")
    val pairs = Temporal.rangeJoin(l, r, "k", "t", "rt", 90L, 90L)
      .select("id", "rt").collect().map(x => (x.getLong(0), x.getTimestamp(1)))
    assert(pairs.length == pairs.distinct.length)
    assert(pairs.nonEmpty)
  }
}
