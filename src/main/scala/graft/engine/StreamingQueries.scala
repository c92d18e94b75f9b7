package graft.engine

import org.apache.spark.sql.functions._

/** CORRECTNESS queries for Structured Streaming — each drains the
  * bounded events stream with AvailableNow and must match a BATCH oracle
  * (the same DuckDB SQL family as q25/q27), which is the strongest
  * equivalence check available for streaming semantics. */
object StreamingQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q170_stream_dq_gate",
      """WITH r AS (
        |  SELECT 'e01' AS rule_id, 'in_range' AS rule_type,
        |         'value' AS col_name,
        |         CAST(sum(CASE WHEN NOT (value >= 0.0 AND value <= 100.0)
        |                       OR value IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations
        |  FROM events
        |  UNION ALL
        |  SELECT 'e02', 'one_of', 'event_type',
        |         CAST(sum(CASE WHEN NOT (event_type IN
        |                       ('view', 'click', 'purchase', 'signup'))
        |                       OR event_type IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'e03', 'not_null', 'user_id',
        |         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM events)
        |SELECT rule_id, rule_type, col_name, n_violations,
        |       (n_violations = 0) AS passed
        |FROM r ORDER BY rule_id""".stripMargin) { (s, dir) =>
      // The q167 expectations gate run CONTINUOUSLY: the same row-local
      // rules ([[Expectations.violationFlag]] — 1/0 flags whose sums
      // are associative) aggregate over the event stream's
      // micro-batches, so the drained streaming totals must equal the
      // batch report EXACTLY — the strongest streaming-DQ equivalence
      // available (and the production shape: a pipeline quarantines on
      // these flags per micro-batch, while the running totals feed
      // monitoring). The value band and the event-type set are
      // deliberately tighter than the data so the report carries real
      // violations; user_id presence passes. Streaming cost shape: the
      // flags are computed row-locally in the source scan; state is
      // ONE 3-counter row.
      import Expectations._
      val rules: Seq[Rule] = Seq(
        InRange("e01", "value", 0.0, 100.0),
        OneOf("e02", "event_type",
          Seq("view", "click", "purchase", "signup")),
        NotNull("e03", "user_id"))
      val flagSums = rules.map(r =>
        sum(Expectations.violationFlag(r)).as(s"__v_${r.id}"))
      val one = Streaming.runAvailableNow(
        Streaming.eventsStream(s, dir).agg(flagSums.head, flagSums.tail: _*),
        "q170_dq_gate")
      one.select(explode(array(rules.map(r => struct(
          lit(r.id).as("rule_id"), lit(r.ruleType).as("rule_type"),
          lit(r.colName).as("col_name"),
          col(s"__v_${r.id}").as("n_violations"))): _*)).as("r"))
        .select(col("r.*"))
        .withColumn("passed", col("n_violations") === 0L)
        .orderBy(col("rule_id"))
    },

    QuerySpec(
      "q50_stream_tumbling",
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
        |       event_type,
        |       COUNT(*)             AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // Streaming tumbling window == batch hour-truncated groupBy: 1h
      // epoch-aligned windows start exactly at date_trunc('hour').
      Streaming.runAvailableNow(
        Streaming.tumblingCounts(Streaming.eventsStream(s, dir)),
        "q50_tumbling")
        .orderBy(col("window_start"), col("event_type"))
    },

    QuerySpec(
      "q53_stream_hopping",
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |w AS (
        |  SELECT make_timestamp((epoch_us(tsu) // 900000000) * 900000000
        |                        - o * 900000000) AS window_start,
        |         event_type, value
        |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS o) offsets)
        |SELECT window_start, event_type, COUNT(*) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM w GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // Streaming hopping window == the batch q52 oracle: 1h windows
      // sliding 15 min, epoch-aligned, drained with AvailableNow.
      Streaming.runAvailableNow(
        Streaming.hoppingCounts(Streaming.eventsStream(s, dir)),
        "q53_hopping")
        .orderBy(col("window_start"), col("event_type"))
    },

    QuerySpec(
      "q51_stream_sessionize",
      """WITH gaps AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu, value,
        |         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |                   - epoch_us(CAST(LAG(ts) OVER w AS TIMESTAMP))
        |                   > 1800 * 1000000
        |              OR LAG(ts) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |),
        |sessions AS (
        |  SELECT user_id, tsu, value,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |              ORDER BY tsu, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS session_id
        |  FROM gaps)
        |SELECT user_id, MIN(tsu) AS session_start,
        |       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      // session_window(30 min) == the batch gaps-and-islands oracle
      // keyed by session start (no exact-1800s gaps exist at any sf, so
      // the strict-< vs > boundary conventions coincide).
      Streaming.runAvailableNow(
        Streaming.sessionize(Streaming.eventsStream(s, dir)),
        "q51_sessionize")
        .orderBy(col("user_id"), col("session_start"))
    },

    QuerySpec(
      "q60_stream_to_lake",
      """SELECT CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS Year,
        |       CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS Month,
        |       CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS Day,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) {
      (s, dir) =>
      // Stream→lake sink ([[Streaming.streamToLake]]): the events stream
      // drained through foreachBatch + mergeAppend into a partitioned
      // lake, then the WHOLE INPUT REDELIVERED under a fresh checkpoint
      // (the Lambda-retry / checkpoint-replay shape) — per-partition
      // row accounting must equal a single clean delivery, or the sink
      // is not idempotent. The oracle recounts per day from the raw
      // events table, so both a dropped batch and a duplicated redelivery
      // fail the compare.
      // Per-PID: this lake is deleted+rebuilt per run and never read by
      // the oracle; a shared path let two concurrent Verify JVMs rip
      // each other's in-flight foreachBatch writes out (observed).
      val root = s"${graft.Sessions.scratchRoot}/stream_lake_" +
        new java.io.File(dir).getName
      Lake.delete(s, root)
      def enriched = Streaming.eventsStream(s, dir)
        .withColumn("Year", year(col("ts")))
        .withColumn("Month", month(col("ts")))
        .withColumn("Day", dayofmonth(col("ts")))
      Streaming.streamToLake(enriched, s"$root/lake", "event_id",
        s"$root/cp_delivery")
      Streaming.streamToLake(enriched, s"$root/lake", "event_id",
        s"$root/cp_redelivery")
      Lake.partitionCounts(s, s"$root/lake")
    },

    QuerySpec(
      "q71_stream_dedup",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Streaming dedup ([[Streaming.dedupByKey]]): the whole input is
      // staged TWICE (redelivery), the stream drops watermark-scoped
      // duplicates on event_id, and the per-type accounting must equal
      // counts from a SINGLE clean copy — a duplicate surviving doubles
      // n, an over-drop loses one. Append mode: dedup emits rows as they
      // arrive; only the duplicate-drop is stateful.
      val deduped = Streaming.runAvailableNow(
        Streaming.dedupByKey(Streaming.eventsStreamDuplicated(s, dir, 2)),
        "q71_dedup", outputMode = "append")
      deduped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },

    QuerySpec(
      "q72_stream_custom_state",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Custom state machine ([[Streaming.userRunningStats]]):
      // flatMapGroupsWithState maintains per-user (count, sum) across
      // micro-batches and emits the updated state per batch; the
      // last-wins drain keeps each user's FINAL state, which must equal
      // the batch GROUP BY. This is the surface for logic window aggregates
      // can't express (custom eviction, per-key decisions) — state here
      // is O(1) per key, the only shape that survives unbounded streams.
      Streaming.runUpdatesLastWins(
        Streaming.userRunningStats(Streaming.eventsStream(s, dir)),
        Seq("user_id"))
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("user_id"))
    },

    QuerySpec(
      "q146_stream_transform_with_state",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // The SAME custom-state semantics as q72, on Spark 4's
      // transformWithState ([[Streaming.userRunningStatsTws]] /
      // [[UserStatsProcessor]]) — the successor API with named typed
      // state cells, explicit TimeMode, and the RocksDB state store.
      // Both state APIs are drained last-wins against ONE oracle, so a
      // divergence between the old and new operators' state handling
      // (a lost update, a key misrouted across column families) shows
      // up as a hash mismatch on either query. The RocksDB provider is
      // required by the new operator and is scoped to THIS drain (the
      // drain inside runUpdatesLastWins is eager), then restored so
      // sibling streams keep the session default.
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(providerKey)
      s.conf.set(providerKey, "org.apache.spark.sql.execution.streaming" +
        ".state.RocksDBStateStoreProvider")
      try Streaming.runUpdatesLastWins(
          Streaming.userRunningStatsTws(Streaming.eventsStream(s, dir)),
          Seq("user_id"))
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("user_id"))
      finally prev match {
        case Some(v) => s.conf.set(providerKey, v)
        case None => s.conf.unset(providerKey)
      }
    },

    QuerySpec(
      "q85_stream_stream_join",
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events)
        |SELECT l.event_id AS trigger_id, r.event_id AS follow_id
        |FROM e l JOIN e r
        |  ON l.user_id = r.user_id
        | AND r.us > l.us AND r.us <= l.us + 1800000000
        |WHERE l.value > 95
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // Stream-stream self-join ([[Streaming.followWithin]]): triggers
      // (value > 95) matched to same-user events in the following 30
      // minutes. The time-range predicate both defines the semantics and
      // bounds the join STATE (left rows evict once the right watermark
      // passes l_ts + 30 min); the drained append stream must equal the
      // batch self-join, in µs arithmetic on both engines.
      val ev = Streaming.eventsStream(s, dir)
      Streaming.runAvailableNow(
        Streaming.followWithin(ev, threshold = 95.0),
        "q85_ssjoin", outputMode = "append")
        .orderBy(col("trigger_id"), col("follow_id"))
    },

    QuerySpec(
      "q123_stream_versioned",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Stream → versioned lake ([[Streaming.streamToVersionedLake]]):
      // every micro-batch commits as one manifest-log version tagged
      // with its batch id, so the EXACTLY-ONCE guarantee is the CAS +
      // tag membership, not row-level dedup. After the drain, a
      // simulated foreachBatch REPLAY of batch 0 (the checkpoint-
      // recovery shape) must no-op — asserted inline, and the final
      // per-type accounting must equal the raw events table, so a
      // double-committed or dropped batch breaks the hash either way.
      val root = s"${graft.Sessions.scratchRoot}/vstream_" +
        new java.io.File(dir).getName
      Lake.delete(s, root)
      Streaming.streamToVersionedLake(Streaming.eventsStream(s, dir),
        s"$root/lake", s"$root/cp")
      val replay = VersionedLake.commitTagged(
        VersionedLake.readLatest(s, s"$root/lake"), s"$root/lake", "b0")
      require(replay.isEmpty, "replayed batch 0 must not re-commit")
      VersionedLake.readLatest(s, s"$root/lake")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },

    QuerySpec(
      "q143_stream_session_window",
      """WITH gaps AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, value,
        |         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |                   - epoch_us(CAST(LAG(ts) OVER w AS TIMESTAMP))
        |                   > 1800 * 1000000
        |              OR LAG(ts) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |s AS (
        |  SELECT user_id, tsu, value,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY tsu, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM gaps)
        |SELECT user_id,
        |       MIN(tsu) AS session_start,
        |       MAX(tsu) + INTERVAL 30 MINUTE AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 2) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      // Streaming NATIVE session windows ([[Streaming.sessionCounts]]):
      // per-(user, open-session) state that MERGES when a row bridges
      // two sessions — the semantics no lag/cumsum can express on an
      // unbounded stream — drained with AvailableNow and compared to
      // the same batch oracle as q142: the drained stream must produce
      // the identical 9,549 sessions, ends = last + gap, or a session
      // split/merged/evicted wrongly moves a boundary and breaks the
      // hash.
      Streaming.runAvailableNow(
        Streaming.sessionCounts(Streaming.eventsStream(s, dir)),
        "q143_sessions")
        .orderBy(col("user_id"), col("session_start"))
    },

    QuerySpec(
      "q178_stream_warc_ingest",
      """WITH d AS (
        |  SELECT doc_id, doc_id % 16 AS file_id, source,
        |         text || CASE WHEN doc_id % 11 = 0
        |                      THEN chr(13)||chr(10)||'WARC/1.0'||
        |                           chr(13)||chr(10)||'WARC-Type: fake'||
        |                           chr(13)||chr(10)||chr(13)||chr(10)
        |                      ELSE '' END AS payload
        |  FROM documents),
        |resp AS (
        |  SELECT file_id,
        |         CAST(row_number() OVER (PARTITION BY file_id
        |                                 ORDER BY doc_id) AS INT) AS rec_idx,
        |         CAST(strlen(payload) AS BIGINT)
        |           AS content_length,
        |         md5(payload) AS payload_md5
        |  FROM d),
        |info AS (
        |  SELECT DISTINCT file_id, 0 AS rec_idx,
        |         CAST(strlen('isPartOf: graft-crawl-' || file_id)
        |              AS BIGINT) AS content_length,
        |         md5('isPartOf: graft-crawl-' || file_id) AS payload_md5
        |  FROM d),
        |r AS (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |SELECT file_id, CAST(count(*) AS BIGINT) AS n_records,
        |       CAST(sum(content_length) AS BIGINT) AS total_bytes,
        |       md5(string_agg(payload_md5, '' ORDER BY rec_idx))
        |         AS recs_md5
        |FROM r GROUP BY file_id ORDER BY file_id""".stripMargin) {
      (s, dir) =>
      // Streaming crawl ingestion — q173's WARC walk composed with the
      // exactly-once lake sink: segments live in a drop folder, the
      // binaryFile stream paces ONE segment per micro-batch (16 batches
      // here), each batch's records walk out partition-wise (stateless
      // transform) and commit under the batch's tag; a simulated
      // checkpoint-recovery replay of batch 0 must no-op. The oracle
      // rebuilds every file's record ledger from `documents`: a
      // dropped/double-committed segment moves n_records, a mis-framed
      // record moves recs_md5 (order-sensitive digest over the per-file
      // record sequence).
      val crawl = MultimodalQueries.stagedCrawl(s, dir)
      val root = s"${graft.Sessions.scratchRoot}/warc_stream_" +
        new java.io.File(dir).getName
      Lake.delete(s, root)
      Streaming.streamToVersionedLake(
        Warc.recordsStream(s, crawl)
          .select(col("file_id"), col("rec_idx"), col("content_length"),
            md5(col("payload")).as("payload_md5")),
        s"$root/lake", s"$root/cp")
      val replay = VersionedLake.commitTagged(
        VersionedLake.readLatest(s, s"$root/lake"), s"$root/lake", "b0")
      require(replay.isEmpty, "replayed batch 0 must not re-commit")
      require(VersionedLake.versions(s, s"$root/lake").size >= 2,
        "pacing must produce at least two committed micro-batches")
      VersionedLake.readLatest(s, s"$root/lake")
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("content_length")).as("total_bytes"),
          md5(concat_ws("", transform(
            array_sort(collect_list(struct(col("rec_idx"),
              col("payload_md5")))),
            x => x("payload_md5")))).as("recs_md5"))
        .orderBy(col("file_id"))
    },

    QuerySpec(
      "q181_stream_kmv",
      TextQueries.q177OracleSql) { (s, dir) =>
      // Streaming sketch maintenance — q177's incremental KMV driven by
      // a STREAM: document drops pace one file per micro-batch, each
      // batch commits ONLY its own per-language bottom-k sketch to the
      // versioned lake under its batch tag (exactly-once on replay),
      // and the live estimate is a k-min over all committed sketches.
      // Bottom-k merge is exactly associative, so however the file
      // source slices the corpus into batches, the drained result must
      // equal the one-shot batch computation — the oracle is q177's
      // verbatim, making stream-incremental ≡ batch a hash equality,
      // the q170 "streaming totals ≡ batch report" discipline applied
      // to a SKETCH. State per batch is ≤ k rows per language; the
      // corpus is never rescanned.
      val drops = stagedDocDrops(s, dir)
      val idx = s"${graft.Sessions.scratchRoot}/kmv_stream_" +
        new java.io.File(dir).getName
      Lake.delete(s, idx)
      val q = Streaming.pacedParquetStream(s, drops).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$idx/cp")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          VersionedLake.commitTagged(
            Kmv.sketch(TextQueries.kmvPoints(batch), TextQueries.KmvSize),
            s"$idx/lake", s"b$id")
          ()
        }
        .start()
      try require(q.awaitTermination(120000),
        s"kmv stream drain still running after 120 s — aborted")
      finally q.stop()
      require(VersionedLake.versions(s, s"$idx/lake").size >= 2,
        "pacing must produce at least two committed micro-batches")
      val replay = VersionedLake.commitTagged(
        VersionedLake.readLatest(s, s"$idx/lake"), s"$idx/lake", "b0")
      require(replay.isEmpty, "replayed batch 0 must not re-commit")
      TextQueries.kmvEstimates(
        Kmv.sketch(VersionedLake.readLatest(s, s"$idx/lake"),
          TextQueries.KmvSize))
    },

    QuerySpec(
      "q136_stream_dedup_ingest",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Unbounded-horizon streaming dedup-ingest
      // ([[Streaming.dedupIngestVersioned]]): the drop folder holds an
      // OVERLAPPING redelivery — drop A is the user_id<50 slice, drop B
      // the full table — and the stream is paced one file per
      // micro-batch, so every drop-A event is redelivered in a LATER
      // batch. q71's watermark dedup only remembers keys inside its
      // horizon; here each batch dedups against the persistent
      // signature index (all of history, O(batch) work) and commits
      // survivors to a versioned lake under its batch tag. Whatever
      // order the file source picks the drops in, the surviving set is
      // the events table exactly once — the oracle is a single clean
      // copy's accounting, so a cross-batch duplicate surviving OR an
      // over-drop breaks the hash.
      val drops = stagedOverlappingDrops(s, dir)
      val root = s"${graft.Sessions.scratchRoot}/dedup_ingest_" +
        new java.io.File(dir).getName
      Lake.delete(s, root)
      Streaming.dedupIngestVersioned(
        Streaming.pacedFileStream(s, drops), root, s"$root/cp")
      require(VersionedLake.versions(s, s"$root/lake").size >= 2,
        "pacing must produce at least two committed micro-batches")
      VersionedLake.readLatest(s, s"$root/lake")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },

    QuerySpec(
      "q156_stream_cdc_apply",
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT k AS o_orderkey,
        |       CASE WHEN k % 3 = 0 THEN (cents * 110) // 100
        |            WHEN k % 3 = 1 THEN (cents * 120) // 100
        |            ELSE cents END AS price_cents
        |FROM o
        |WHERE (k % 3 = 0 AND k % 4 <> 3 AND k % 6 <> 0)
        |   OR (k % 3 = 1)
        |   OR (k % 3 = 2 AND k % 4 <> 3 AND k % 5 <> 0)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Streaming CDC apply ([[Streaming.cdcApplyVersioned]]): the base
      // snapshot commits as version 1, then three changelog wave files
      // stream one-per-micro-batch, each merging onto the current
      // snapshot and committing the next version under its batch tag
      // (exactly-once under replay — StreamingSpec pins the re-drain
      // no-op). Waves are key-disjoint so any file order converges; the
      // oracle derives the final snapshot CLOSED-FORM per key residue,
      // independently of the merge machinery — over-applies,
      // double-applies, and lost deletes all break the hash.
      val drops = stagedCdcWaves(s, dir)
      val root = s"${graft.Sessions.scratchRoot}/cdc_apply_" +
        new java.io.File(dir).getName
      Lake.delete(s, root)
      val base = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .filter(col("k") % 4 =!= 3)
      VersionedLake.commitTagged(base, s"$root/lake", "base",
        mode = "overwrite")
      Streaming.cdcApplyVersioned(Streaming.pacedParquetStream(s, drops),
        root, s"$root/cp", "k", "seq", "op", Seq("price_cents"))
      require(VersionedLake.versions(s, s"$root/lake").size >= 4,
        "base + one version per wave batch expected")
      VersionedLake.readLatest(s, s"$root/lake")
        .select(col("k").as("o_orderkey"), col("price_cents"))
        .orderBy(col("o_orderkey"))
    },

    QuerySpec(
      "q226_stream_cdc_mor",
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT k AS o_orderkey,
        |       CASE WHEN k % 3 = 0 THEN (cents * 110) // 100
        |            WHEN k % 3 = 1 THEN (cents * 120) // 100
        |            ELSE cents END AS price_cents
        |FROM o
        |WHERE (k % 3 = 0 AND k % 4 <> 3 AND k % 6 <> 0)
        |   OR (k % 3 = 1)
        |   OR (k % 3 = 2 AND k % 4 <> 3 AND k % 5 <> 0)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Streaming CDC apply via MERGE-ON-READ
      // ([[Streaming.cdcApplyMergeOnRead]]): the SAME three key-
      // disjoint changelog waves as q156, but each batch applies as
      // ONE SQL `MERGE INTO` row-level commit on a deletion-vector
      // lake — a positions sidecar + an O(changed rows) append per
      // batch, where q156's apply publishes a WHOLE-SNAPSHOT
      // overwrite per batch. Inline evidence: every base dir carries
      // by reference across all three waves (nothing rewritten), each
      // wave commit binds `#dv`, appended bytes stay under the
      // snapshot it merged into, and a REPLAYED batch tag commits
      // nothing (the exactly-once seam, enforced at the publish).
      // Hash-green against q156's closed-form oracle: an over-apply,
      // double-apply, lost delete, or replay double-commit breaks it.
      val drops = stagedCdcWaves(s, dir)
      val root = graft.Sessions.scratchRoot
      val name = s"cdcmor_${new java.io.File(dir).getName}"
      val lake = s"$root/$name"
      Lake.delete(s, lake)
      s.conf.set("spark.sql.catalog.glake_q226",
        classOf[GraftLakeCatalog].getName)
      s.conf.set("spark.sql.catalog.glake_q226.root", root)
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long")
            .as("price_cents"))
        .filter(col("k") % 4 =!= 3)
        .createOrReplaceTempView("q226_base")
      s.sql(s"""CREATE TABLE glake_q226.`$name`
               |TBLPROPERTIES ('deletion_vectors' = 'true') AS
               |SELECT * FROM q226_base""".stripMargin)
      val f = new org.apache.hadoop.fs.Path(lake).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      def dirs(): Set[String] = f.listStatus(
        new org.apache.hadoop.fs.Path(lake)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("d-")).toSet
      def bytes(d: String): Long = f.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$lake/$d")).getLength
      val baseDirs = dirs()
      val baseBytes = baseDirs.toSeq.map(bytes).sum
      Streaming.cdcApplyMergeOnRead(
        Streaming.pacedParquetStream(s, drops), s"glake_q226.`$name`",
        lake, s"$lake-cp", "k", "seq", "op", Seq("price_cents"))
      // MoR evidence: base dirs never rewritten, one #dv commit per
      // wave, appended bytes bounded by the snapshot
      require(baseDirs.subsetOf(dirs()),
        "every base dir must carry by reference across all waves")
      val vs = VersionedLake.versions(s, lake)
      require(vs.size >= 4, s"base + 3 wave commits expected, got $vs")
      vs.filter(_ > vs.min).foreach(v =>
        require(VersionedLake.isDvCommit(s, lake, v),
          s"wave version $v must bind a positions sidecar"))
      val appended = dirs().diff(baseDirs).toSeq.map(bytes).sum
      require(appended < baseBytes,
        s"appended $appended B >= snapshot $baseBytes B — a wave " +
          "rewrote the snapshot instead of merging on read")
      // exactly-once at the PUBLISH: a replayed batch tag commits
      // nothing even when the merge re-runs
      val tipAfter = VersionedLake.tip(s, lake).get
      s.conf.set("spark.graft.lake.commitTag",
        Streaming.cdcBatchTag(s"$lake-cp", 0))
      try s.sql(s"""MERGE INTO glake_q226.`$name` AS t
                   |USING (SELECT -1L AS k, 0L AS pc) AS s
                   |ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET price_cents = s.pc
                   |WHEN NOT MATCHED THEN INSERT (k, price_cents)
                   |  VALUES (s.k, s.pc)""".stripMargin)
      finally s.conf.unset("spark.graft.lake.commitTag")
      require(VersionedLake.tip(s, lake).get == tipAfter,
        "a replayed commit tag must publish nothing")
      require(spark_q226_absent(s, name),
        "a replayed commit tag must not land its rows")
      VersionedLake.readLatest(s, lake)
        .select(col("k").as("o_orderkey"), col("price_cents"))
        .orderBy(col("o_orderkey"))
    })

  private def spark_q226_absent(
      s: org.apache.spark.sql.SparkSession, name: String): Boolean =
    s.table(s"glake_q226.`$name`").filter(col("k") === -1L).count() == 0

  /** Write-once drop-folder pair with OVERLAPPING content (per-PID
    * stream root, swept by graft.Sessions): drop_a = the user_id<50
    * slice, drop_b = the full events table — so whichever file the
    * stream reads first, the second batch carries both duplicates and
    * genuinely-new rows (the discriminating shape: an over-dropping
    * dedup loses the new rows, an under-dropping one doubles the
    * slice). Single part files, atomically renamed into place. */
  /** Three document drop files (doc_id mod 3) for q181's paced stream —
    * disjoint slices whose sketches must merge to the full corpus. */
  private def stagedDocDrops(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val root = s"${graft.Sessions.streamRoot}/docdrops_" +
      new java.io.File(dir).getName
    Staging.ensureStaged(root) {
      val docs = Tables.table(s, dir, "documents")
      (0 to 2).foreach(r => Staging.publishSingleParquet(s, root,
        s"drop_$r", docs.filter(col("doc_id") % 3 === r)))
    }
    root
  }

  private def stagedOverlappingDrops(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val root = s"${graft.Sessions.streamRoot}/overlap_" +
      new java.io.File(dir).getName
    Staging.ensureStaged(root) {
      val ev = Tables.table(s, dir, "events")
      Staging.publishSingleParquet(s, root, "drop_a",
        ev.filter(col("user_id") < 50))
      Staging.publishSingleParquet(s, root, "drop_b", ev)
    }
    root
  }

  /** Orders changelog in exact integer cents ([[Cdc.merge]]'s q154
    * convention) split into three wave FILES with key-disjoint
    * residues (`k mod 3`) — so whatever order the file source picks the
    * waves in, sequential application commutes and the closed-form
    * oracle is exact. Within a wave, per-key conflicts resolve by seq
    * (delete-over-update, update-after-insert, unknown-update drop —
    * the q154 rules, here exercised through the streaming path). */
  private def stagedCdcWaves(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val root = s"${graft.Sessions.streamRoot}/cdc_waves_" +
      new java.io.File(dir).getName
    Staging.ensureStaged(root) {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      def wave(df: org.apache.spark.sql.DataFrame,
          price: org.apache.spark.sql.Column, seq: Int, op: String) =
        df.select(col("k"), price.as("price_cents"),
          lit(seq).as("seq"), lit(op).as("op"))
      Staging.publishSingleParquet(s, root, "wave_a",
        wave(o.filter(col("k") % 3 === 0),
            expr("(cents * 110) div 100"), 1, "U")
          .unionByName(wave(o.filter(col("k") % 6 === 0),
            lit(null).cast("long"), 2, "D")))
      Staging.publishSingleParquet(s, root, "wave_b",
        wave(o.filter(col("k") % 3 === 1 && col("k") % 4 === 3),
            col("cents"), 1, "I")
          .unionByName(wave(o.filter(col("k") % 3 === 1),
            expr("(cents * 120) div 100"), 2, "U")))
      Staging.publishSingleParquet(s, root, "wave_c",
        wave(o.filter(col("k") % 3 === 2 && col("k") % 4 =!= 3 &&
            col("k") % 5 === 0), lit(null).cast("long"), 1, "D")
          .unionByName(wave(o.filter(col("k") % 3 === 2 &&
            col("k") % 4 === 3), col("cents"), 1, "U")))
    }
    root
  }
}
