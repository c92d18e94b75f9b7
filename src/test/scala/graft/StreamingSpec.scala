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

  test("append mode: watermark admits late rows, drops too-late rows, bounds state") {
    // The AvailableNow+COMPLETE equivalence tests above can't see watermark
    // semantics (complete mode never gates emission). This drives the SAME
    // tumblingCounts operator in append mode through a scripted MemoryStream:
    // 1h windows, 1h watermark delay, timestamps in epoch seconds.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val enc = org.apache.spark.sql.Encoders.product[(String, Long)]
    val mem = MemoryStream[(String, Long)](spark)
    def hm(h: Int, m: Int): Long = h * 3600L + m * 60L
    val events = mem.toDF().toDF("event_type", "sec")
      .select(timestamp_seconds(col("sec")).as("ts"), col("event_type"),
        lit(1.0).as("value"))
    val q = Streaming.tumblingCounts(events).writeStream
      .queryName("t_watermark").outputMode("append").format("memory").start()
    def drain(): Unit = { q.processAllAvailable(); q.processAllAvailable() }
    def sink(): Map[(java.sql.Timestamp, String), Long] =
      spark.table("t_watermark").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    def tsOf(h: Int): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(hm(h, 0)))
    try {
      // b0: on-time rows; max event 03:30 → watermark becomes 02:30,
      // which closes+emits window [01:00,02:00) on the no-data batch.
      mem.addData(("a", hm(1, 10)), ("a", hm(2, 20)), ("b", hm(3, 30)))
      drain()
      assert(sink().get((tsOf(1), "a")).contains(1L))
      assert(!sink().contains((tsOf(2), "a"))) // [02:00,03:00) still open
      // b1: LATE row (50 min behind max event) but within the watermark:
      // window [02:00,03:00) ends after wm 02:30 → must be admitted.
      mem.addData(("a", hm(2, 40)))
      drain()
      // b2: advance wm to 04:00 → [02:00,03:00) closes; its count of 2
      // proves the late row landed in its window before emission.
      mem.addData(("b", hm(5, 0)))
      drain()
      assert(sink().get((tsOf(2), "a")).contains(2L))
      // b3: TOO-late row — [02:00,03:00) ended before wm 04:00 → dropped;
      // the already-emitted result must not change or duplicate.
      mem.addData(("a", hm(2, 10)))
      drain()
      assert(sink().get((tsOf(2), "a")).contains(2L))
      assert(sink().count(_._1 == ((tsOf(2), "a"))) == 1)
      // State is bounded by the watermark: closed windows are evicted, so
      // live state holds only windows ending after wm 04:00 — not the 4+
      // windows touched over the stream's history.
      val state = q.recentProgress.reverse.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten).headOption
      assert(state.exists(_.numRowsTotal <= 2), s"state not bounded: $state")
    } finally {
      q.stop()
      spark.catalog.dropTempView("t_watermark")
    }
  }

  test("streamToLake: multi-batch drain + full redelivery stays exactly-once per key") {
    import spark.implicits._
    val root = TestSpark.tempDir("stream-lake")
    // two source files → with maxFilesPerTrigger=1, TWO micro-batches,
    // so sequential mergeAppends compose (batch 2 dedups against what
    // batch 1 just wrote); files share key 5 to make that observable
    def rows(ids: Range) = ids.map(i =>
      (i.toLong, s"p_$i", 2024, 1, 1 + (i % 2))).toDF("id", "payload",
      "Year", "Month", "Day")
    rows(0 to 5).write.parquet(s"$root/in/f0")
    rows(5 to 9).write.parquet(s"$root/in/f1")
    val schema = rows(0 to 0).schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
    Streaming.streamToLake(src, s"$root/lake", "id", s"$root/cp0")
    assert(Lake.read(spark, s"$root/lake").count() == 10) // key 5 once
    // crash-replay shape: the SAME input under a fresh checkpoint
    Streaming.streamToLake(src, s"$root/lake", "id", s"$root/cp1")
    val lake = Lake.read(spark, s"$root/lake")
    assert(lake.count() == 10)
    assert(lake.select("id").distinct.count() == 10)
  }

  test("cdcApplyVersioned: waves land as versions; re-drain on the same " +
      "checkpoint is a no-op; tagged replay never double-applies") {
    import spark.implicits._
    val root = TestSpark.tempDir("cdc-apply")
    val base = Seq((1L, 100L), (2L, 200L), (3L, 300L))
      .toDF("k", "price_cents")
    VersionedLake.commitTagged(base, s"$root/lake", "base",
      mode = "overwrite")
    Seq((1L, Some(110L), 1, "U")).toDF("k", "price_cents", "seq", "op")
      .coalesce(1).write.parquet(s"$root/in/w0")
    Seq((3L, Option.empty[Long], 1, "D"), (4L, Some(400L), 1, "I"))
      .toDF("k", "price_cents", "seq", "op")
      .coalesce(1).write.parquet(s"$root/in/w1")
    def src = spark.readStream
      .schema(spark.read.parquet(s"$root/in/*").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
    Streaming.cdcApplyVersioned(src, root, s"$root/cp", "k", "seq", "op",
      Seq("price_cents"))
    def snap() = VersionedLake.readLatest(spark, s"$root/lake")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = snap()
    assert(after == Map(1L -> 110L, 2L -> 200L, 4L -> 400L))
    val versions = VersionedLake.versions(spark, s"$root/lake")
    assert(versions.size == 3, s"base + two wave versions: $versions")
    // replay: SAME checkpoint re-drain processes nothing new
    Streaming.cdcApplyVersioned(src, root, s"$root/cp", "k", "seq", "op",
      Seq("price_cents"))
    assert(snap() == after)
    assert(VersionedLake.versions(spark, s"$root/lake").size == 3,
      "re-drain must not mint versions")
  }

  test("streaming WARC ingest: one segment per batch, re-drain on the " +
      "same checkpoint mints no versions, records match the batch walk") {
    val root = TestSpark.tempDir("warc-stream")
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    Warc.stageCrawl(spark, docs, s"$root/in", nFiles = 4)
    def drain(): Unit = Streaming.streamToVersionedLake(
      Warc.recordsStream(spark, s"$root/in")
        .select(col("file_id"), col("rec_idx"), col("warc_type")),
      s"$root/lake", s"$root/cp")
    drain()
    val versions = VersionedLake.versions(spark, s"$root/lake")
    assert(versions.size == 4, s"one version per segment: $versions")
    val streamed = VersionedLake.readLatest(spark, s"$root/lake")
      .orderBy("file_id", "rec_idx").collect().toSeq
    val batch = Warc.records(spark, s"$root/in")
      .select(col("file_id"), col("rec_idx"), col("warc_type"))
      .orderBy("file_id", "rec_idx").collect().toSeq
    assert(streamed == batch, "streamed records must equal the batch walk")
    // checkpoint recovery: re-drain processes nothing new
    drain()
    assert(VersionedLake.versions(spark, s"$root/lake").size == 4,
      "re-drain must not mint versions")
  }

  test("custom state accumulates across micro-batches, last-wins drain returns final state") {
    import spark.implicits._
    val root = TestSpark.tempDir("stream-state")
    // user 1 spans BOTH files → with maxFilesPerTrigger=1 its state must
    // carry from batch 0 into batch 1, and the drain must keep only the
    // batch-1 (final) update
    Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("user_id", "value")
      .write.parquet(s"$root/in/f0")
    Seq((1L, 4.0), (3L, 5.0)).toDF("user_id", "value")
      .write.parquet(s"$root/in/f1")
    val src = spark.readStream
      .schema("user_id LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
    val out = Streaming.runUpdatesLastWins(
      Streaming.userRunningStats(src), Seq("user_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out == Map(1L -> ((3L, 7.0)), 2L -> ((1L, 3.0)),
      3L -> ((1L, 5.0))))
  }

  test("streaming dedup drops duplicates that arrive in a LATER micro-batch") {
    import spark.implicits._
    val root = TestSpark.tempDir("stream-dedup")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def rows(ids: Range) = ids.map(i => (i.toLong, t0, s"e_$i"))
      .toDF("event_id", "ts", "event_type")
    rows(1 to 5).write.parquet(s"$root/in/f0")
    rows(4 to 8).write.parquet(s"$root/in/f1") // 4,5 re-delivered
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
    val out = Streaming.runAvailableNow(Streaming.dedupByKey(src),
      "t_dedup", outputMode = "append")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == (1L to 8L), s"got $out")
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

  test("long-lived processing-time trigger consumes files dropped while running") {
    // The reference's production loop is event-driven and long-lived
    // (emr-no-vpc.py:18-189); AvailableNow drains model its bounded
    // replay, this models the RESIDENT form: a ProcessingTime trigger
    // that keeps polling and picks up files dropped after start.
    val root = TestSpark.tempDir("stream-pt")
    val in = s"$root/in"
    spark.range(0, 10).write.parquet(in)
    val q = spark.readStream.schema("id LONG").parquet(in)
      .writeStream.queryName("pt_sink").outputMode("append").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    def awaitCount(n: Long): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("pt_sink").count() != n) {
        assert(System.nanoTime() < deadline,
          s"sink stuck at ${spark.table("pt_sink").count()} of $n after 30 s")
        Thread.sleep(200)
      }
    }
    try {
      awaitCount(10)
      // drop more input while the query is live — a new trigger tick,
      // not a restart, must pick it up
      spark.range(10, 25).write.mode("append").parquet(in)
      awaitCount(25)
    } finally q.stop()
    spark.catalog.dropTempView("pt_sink")
  }

  test("parquet writeStream sink resumes from checkpoint without reprocessing") {
    val root = TestSpark.tempDir("stream-pq")
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    def addInput(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id", "id * 1.5D AS v")
        .coalesce(1).write.mode("append").parquet(in)
    def drain(): Unit = Streaming.streamToParquet(
      spark.readStream.schema("id LONG, v DOUBLE").parquet(in), out, ck)

    addInput(0, 100)
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // restart with no new input: the checkpoint must make this a no-op —
    // a sink without source-progress tracking would re-append all rows
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // restart after one NEW input file: only its rows are appended
    addInput(100, 150)
    drain()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 150)
    assert(rows.agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == (0L until 150L).sum)
  }
}
