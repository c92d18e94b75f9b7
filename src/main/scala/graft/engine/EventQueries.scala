package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event analytics over the `events` table. These batch
  * forms carry the DuckDB oracles.
  *
  * The reference's time handling is the Timestamp/Year/Month/Day
  * derivation of sparkle-v9.py:115-122; windows/sessionization are the
  * Athena-SQL capability class generalized to event time.
  */
object EventQueries {
  import Tables.table

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q25_tumbling_window",
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
        |       event_type,
        |       COUNT(*)             AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // Tumbling 1h window as a batch groupBy — identical grouping to the
      // streaming window(ts, "1 hour") form, partial-agg friendly.
      table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    QuerySpec(
      "q52_hopping_window",
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
      // Hopping 1h window sliding every 15 min: window() expands each
      // event to its 4 overlapping window assignments (epoch-aligned, so
      // start = floor15(ts) - {0,1,2,3}·15min — exactly the oracle's
      // generate-offsets construction), then one partial-agg-friendly
      // groupBy. SURVEY §7.3 step 5's tumbling/SLIDING/session promise.
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    QuerySpec(
      "q26_daily_user_activity",
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
        |       COUNT(*) AS n_events,
        |       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |       ROUND(MAX(value), 2) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("day"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          round(max(col("value")), 2).as("max_value"))
        .orderBy(col("day"), col("user_id"))
    },

    QuerySpec(
      "q27_sessionize",
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
        |  SELECT user_id, value,
        |         CAST(SUM(new_session) OVER (PARTITION BY user_id
        |              ORDER BY tsu, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS session_id
        |  FROM gaps)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       ROUND(SUM(value), 2) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      // Gaps-and-islands sessionization (30 min inactivity). Gap compare
      // is in exact integer microseconds so Spark (µs) and DuckDB (ns
      // cast to µs) agree bit-for-bit. One shuffle on user_id serves the
      // lag window, the session-sum window, and the final group-by.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    },

    QuerySpec(
      "q28_event_funnel",
      """SELECT user_id,
        |       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        |FROM events
        |GROUP BY user_id
        |HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      // Pivot-style conditional aggregation — one scan, one shuffle.
      def cnt(t: String) =
        sum(when(col("event_type") === t, 1).otherwise(0)).cast("long")
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(cnt("view").as("views"), cnt("click").as("clicks"),
          cnt("purchase").as("purchases"))
        .filter(col("purchases") > 0)
        .orderBy(col("user_id"))
    },

    QuerySpec(
      "q29_json_extract",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE user_id = 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // Semi-structured props column (the Athena surface includes JSON
      // functions); get_json_object is codegen'd, no UDF.
      table(s, dir, "events")
        .filter(col("user_id") === 0)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },

    QuerySpec(
      "q69_map_explode",
      """SELECT event_id, k.key AS key,
        |       CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)
        |         AS value
        |FROM events, unnest(json_keys(props)) AS k(key)
        |WHERE user_id < 5
        |ORDER BY event_id, key""".stripMargin) { (s, dir) =>
      // Semi-structured → relational: parse the whole props object to a
      // MapType and explode to (key, value) rows — schema-on-read over
      // open-ended keys, where q29's path extraction needs the key known
      // up front. from_json + generator both run inside the scan stage
      // (narrow, no shuffle); the filter is pushed below the explode so
      // fan-out applies only to surviving rows.
      table(s, dir, "events")
        .filter(col("user_id") < 5)
        .select(col("event_id"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType))))
        .select(col("event_id"), col("key"), col("value"))
        .orderBy(col("event_id"), col("key"))
    },

    QuerySpec(
      "q70_typed_maxgap",
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) -
        |         epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS TIMESTAMP))
        |           AS gap
        |  FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Typed per-group imperative logic (KeyValueGroupedDataset.mapGroups
      // — SURVEY §2.7's custom-logic surface): max inter-event gap needs
      // the group's events in time order, the shape you reach for the
      // typed API instead of a hash aggregate. One shuffle on the key
      // (same as any groupBy); per-group memory is one user's history —
      // the bound a 100 TB run sizes partitions for. The oracle computes
      // the same thing via LAG, proving the imperative form equals the
      // declarative one.
      import s.implicits._
      table(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("event_id"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val evs = it.map(t => (t._2, t._3)).toArray.sorted
          var maxGap = 0L
          var i = 1
          while (i < evs.length) {
            val g = evs(i)._1 - evs(i - 1)._1
            if (g > maxGap) maxGap = g
            i += 1
          }
          (uid, evs.length.toLong, maxGap)
        }
        .toDF("user_id", "n_events", "max_gap_us")
        .orderBy(col("user_id"))
    },

    QuerySpec(
      "q74_range_frame",
      """SELECT user_id, event_id,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP)
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
        |             2) AS rolling_1h
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      // RANGE (time-interval) window frame — the VALUE-based sibling of
      // q18's row-count frame: the frame is "everything in the trailing
      // hour", however many rows that is. Spark's range frame needs a
      // numeric order key, so the frame is ±µs on unix_micros — exactly
      // INTERVAL 1 HOUR inclusive. Rows tied on ts share a frame in BOTH
      // engines (RANGE includes peers), so the result is deterministic
      // under tie reordering.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0)
      table(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("rolling_1h"))
        .orderBy(col("user_id"), col("event_id"))
    },

    QuerySpec(
      "q86_funnel",
      """WITH f AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view'
        |                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
        |         min(CASE WHEN event_type = 'click'
        |                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(count(t_view) AS BIGINT) AS n_view,
        |       CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
        |         AS n_view_click,
        |       CAST(count(CASE WHEN t_click > t_view AND t_purchase > t_click
        |                       THEN 1 END) AS BIGINT) AS n_full_funnel
        |FROM f""".stripMargin) { (s, dir) =>
      // Ordered conversion funnel (view → click → purchase, strictly
      // increasing first-occurrence times) via conditional-min
      // aggregation: ONE partial-agg-friendly groupBy per user then one
      // scalar rollup — no self-join, no explode, no window. The classic
      // product-analytics shape at its cheapest plan: at 100 TB this is
      // two map-side-combining aggregations and nothing else.
      val us = unix_micros(col("ts"))
      def firstOf(t: String) =
        min(when(col("event_type") === t, us)).as(s"t_$t")
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
        .agg(count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
          count(when(col("t_click") > col("t_view") &&
            col("t_purchase") > col("t_click"), 1)).as("n_full_funnel"))
    },

    QuerySpec(
      "q87_retention",
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |firstd AS (
        |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT cohort_day,
        |       CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM act JOIN firstd USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // Cohort retention: users grouped by first-active day, activity
      // counted per day-offset. Distinct-days first (cardinality
      // reduction BEFORE any join), the cohort dimension is derived from
      // the same reduced set, and the join is a co-partitioned equi-join
      // on user_id — both sides arrive already shuffled on the key, so
      // AQE plans the cheapest exchange; nothing touches raw events
      // twice at full width.
      val act = table(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val firstd = act.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      act.join(firstd, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    QuerySpec(
      "q95_decayed_features",
      """WITH e AS (
        |  SELECT user_id, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |w AS (
        |  SELECT user_id, value, us,
        |         max(us) OVER (PARTITION BY user_id) AS last_us
        |  FROM e)
        |SELECT user_id,
        |       ROUND(SUM(value * pow(0.5, (last_us - us) / 86400000000.0)),
        |             4) AS decayed_value,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Time-decayed user feature (half-life 1 day, anchored at each
      // user's LAST event) — the standard recency-weighted aggregate of
      // feature-store pipelines. One window (max per user, no join) and
      // one grouped sum, both on the same user_id partitioning, so the
      // second shuffle reuses the first's exchange.
      val w = Window.partitionBy(col("user_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("last_us", max(col("us")).over(w))
        .groupBy(col("user_id"))
        .agg(round(sum(col("value") *
            pow(lit(0.5), (col("last_us") - col("us")) / 86400000000.0)), 4)
            .as("decayed_value"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    QuerySpec(
      "q97_histogram",
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       ROUND(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Equi-width histogram (25-unit bins) by plain arithmetic rather
      // than width_bucket — identical floor/divide semantics in every
      // engine, so bin edges can't drift. One map-side-combining
      // aggregation; the profiling query that sizes everything else.
      table(s, dir, "events")
        .groupBy(floor(col("value") / 25).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
        .orderBy(col("bucket"))
    },

    QuerySpec(
      "q98_correlation",
      """SELECT event_type,
        |       ROUND(corr(value, CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE)),
        |             4) AS corr_value_hour,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Pearson correlation of value vs hour-of-day per event type —
      // the drift/leakage scan run over feature columns before
      // training. corr is a single mergeable aggregate (co-moments), so
      // this is one partial-agg pass, no join, no window.
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(corr(col("value"), hour(col("ts")).cast("double")), 4)
            .as("corr_value_hour"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    QuerySpec(
      "q96_mode_per_group",
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, n,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY n DESC, event_type) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Per-group mode (most frequent event_type per user). Built-in
      // max_by/arg_max leave ties UNDEFINED — unacceptable under a
      // hash-compare oracle and a correctness trap in general — so the
      // deterministic form is count + rank with an explicit tie order.
      // Counts first (cardinality-reduced to users × types) so the
      // window sees small input.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"), col("n"))
        .orderBy(col("user_id"))
    },

    QuerySpec(
      "q165_funnel",
      """WITH s1 AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view'
        |             THEN CAST(ts AS TIMESTAMP) END) AS t1
        |  FROM events GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id,
        |         min(CASE WHEN e.event_type = 'click'
        |             AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |             THEN CAST(e.ts AS TIMESTAMP) END) AS t2
        |  FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id,
        |         min(CASE WHEN e.event_type = 'purchase'
        |             AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |             THEN CAST(e.ts AS TIMESTAMP) END) AS t3
        |  FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id)
        |SELECT CAST(count(t1) AS BIGINT) AS n_view,
        |       CAST(count(t2) AS BIGINT) AS n_click,
        |       CAST(count(t3) AS BIGINT) AS n_purchase
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)"""
        .stripMargin) { (s, dir) =>
      // Ordered RE-ENTRANT conversion funnel (view → first click AFTER
      // that view → first purchase AFTER that click) — strictly
      // stronger semantics than q86's first-occurrence comparison,
      // which misses a user whose first click predates their first
      // view but who clicked again after viewing (this form counts
      // them; q86's three independent minimums cannot). The sequential
      // dependency is what a flat GROUP BY can't express.
      // Implementation: THREE chained per-user
      // window minimums over ONE hash-partitioning of the events — each
      // stage's threshold (t1, t2) is a per-user constant the next
      // window's conditional min references, so Spark plans one
      // exchange on user_id and three Window passes, corpus joined
      // zero times (the oracle's join-back formulation is the same
      // computation as three grouped subqueries). Funnel counts then
      // reduce per-user rows — count DISTINCT users holding each stage
      // timestamp. Event-time ordering is strict (>), so same-instant
      // events do not satisfy the next stage — pinned both sides.
      val w = Window.partitionBy(col("user_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click"
            && col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase"
            && col("ts") > col("t2"), col("ts"))).over(w))
        .agg(
          countDistinct(when(col("t1").isNotNull, col("user_id")))
            .as("n_view"),
          countDistinct(when(col("t2").isNotNull, col("user_id")))
            .as("n_click"),
          countDistinct(when(col("t3").isNotNull, col("user_id")))
            .as("n_purchase"))
    },

    QuerySpec(
      "q168_attribution",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |  FROM events),
        |a AS (
        |  SELECT event_type,
        |         last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY t, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND 1 PRECEDING) AS channel
        |  FROM e)
        |SELECT COALESCE(channel, 'none') AS channel,
        |       CAST(count(*) AS BIGINT) AS n_purchases
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Last-touch attribution: each purchase credits the user's most
      // recent preceding non-purchase event type ('none' when the
      // purchase opens the history) — the sequential credit assignment
      // behind marketing/engagement reporting. One window pass per
      // user (ignore-nulls last_value over a strict-past frame, total
      // order pinned by (ts, event_id) so same-instant events cannot
      // flip credit between engines), then a ≤5-row channel count.
      // Plan: one exchange on user_id for the window, the channel
      // aggregation map-side combines — never a self-join of events
      // against events (the naive formulation).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
        .withColumn("channel",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy(col("channel"))
    },

    QuerySpec(
      "q142_session_window",
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
      // Spark's NATIVE session_window (the built-in gaps-and-islands the
      // hand-rolled q27 predates): one groupBy on
      // (user_id, session_window(ts, gap)) — no explicit lag/cumsum, one
      // shuffle, and the window's [start, end) carries the semantics
      // end = last event + gap. The oracle derives the identical
      // sessions with the q27 lag/running-sum construction and rebuilds
      // start/end as min(ts) / max(ts) + 30min — so this differentially
      // pins Spark's session assignment against an independent
      // formulation of the same definition, including the half-open
      // end convention.
      table(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"),
          col("sw.start").as("session_start"),
          col("sw.end").as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))
    })
}
