package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Batch-equivalence tests: the streaming forms drained with
  * Trigger.AvailableNow must equal their batch counterparts row-for-row
  * — the strongest available check of streaming semantics on bounded
  * input. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling window equals the batch groupBy form") {
    val stream = Streaming.runAvailableNow(
      Streaming.tumblingCounts(Streaming.eventsStream(spark, sf)), "t_tumbling")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Tables.table(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(stream == batch)
  }

  test("streaming hopping window equals the batch window() form") {
    val stream = Streaming.runAvailableNow(
      Streaming.hoppingCounts(Streaming.eventsStream(spark, sf)), "t_hopping")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Tables.table(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(stream == batch)
    // every event lands in exactly windowDuration/slide = 4 windows
    val events = Tables.table(spark, sf, "events").count()
    assert(batch.toSeq.map(_._3).sum == 4 * events)
  }

  test("streaming session windows equal the batch gaps-and-islands form") {
    val stream = Streaming.runAvailableNow(
      Streaming.sessionize(Streaming.eventsStream(spark, sf)), "t_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = Tables.table(spark, sf, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("session_value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet

    assert(stream == batch)
  }
}
