package graft.engine

import org.apache.spark.sql.functions._

/** CORRECTNESS queries for the temporal join operators ([[Temporal]]),
  * both oracle-exact: DuckDB has a native ASOF JOIN and evaluates the
  * range join as a plain inequality join (fine at oracle scale; the Spark
  * side uses the bucketed form that scales).
  */
object TemporalQueries {
  import Tables.table

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q55_asof_join",
      """WITH clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |       round(p.value, 2) AS purchase_value,
        |       c.ts AS click_ts,
        |       round(c.click_value, 2) AS click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      // Point-in-time feature attribution: each purchase joined to the
      // user's LATEST click at-or-before it ([[Temporal.asOfJoin]] —
      // union-and-window, one shuffle, no per-key cross product). Clicks
      // are pre-aggregated to one row per (user, ts) so the as-of match
      // is deterministic; purchases with no prior click keep nulls.
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      Temporal.asOfJoin(purchases, clicks, "user_id", "ts", "ts",
          prefix = "click_")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("purchase_value"),
          col("click_ts"),
          round(col("click_click_value"), 2).as("click_value"))
        .orderBy(col("event_id"))
    },

    QuerySpec(
      "q56_range_join",
      """SELECT e.event_id, e.user_id, count(*) AS n_views,
        |       round(sum(v.value), 2) AS view_value
        |FROM events e JOIN events v
        |  ON v.user_id = e.user_id
        | AND e.event_type = 'error' AND v.event_type = 'view'
        | AND v.ts >= e.ts - INTERVAL 1 HOUR AND v.ts <= e.ts
        |GROUP BY 1, 2
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      // Interval correlation: views by the same user in the hour up
      // to each error ([[Temporal.rangeJoin]] — time-bucketed equi-join
      // on (key, bucket) with a residual range filter; fan-out ≤ 2×, and
      // the bucket subdivides hot keys in the shuffle).
      val ev = table(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("value").as("view_value"))
      Temporal.rangeJoin(errors, views, "user_id", "ts", "view_ts",
          beforeSec = 3600L, afterSec = 0L)
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_views"),
          round(sum(col("view_value")), 2).as("view_value"))
        .orderBy(col("event_id"))
    },

    QuerySpec(
      "q158_resample_fill",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 20),
        |s AS (
        |  SELECT user_id, date_trunc('hour', t) AS slot,
        |         max(event_id) AS eid
        |  FROM e GROUP BY 1, 2),
        |v AS (SELECT s.user_id, s.slot, e.cents
        |      FROM s JOIN e ON e.event_id = s.eid),
        |sp AS (SELECT user_id, min(slot) AS mn, max(slot) AS mx
        |       FROM v GROUP BY 1),
        |g AS (SELECT user_id,
        |             unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
        |               AS slot
        |      FROM sp),
        |f AS (
        |  SELECT g.user_id, g.slot, v.cents,
        |         v.cents IS NOT NULL AS observed
        |  FROM g LEFT JOIN v
        |    ON v.user_id = g.user_id AND v.slot = g.slot)
        |SELECT user_id, slot,
        |       last_value(cents IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY slot
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS cents,
        |       observed
        |FROM f ORDER BY user_id, slot""".stripMargin) { (s, dir) =>
      // Time-series regularization ([[Temporal.resampleFill]] — plan
      // shape there): 20 users' irregular event values resampled onto
      // an hourly grid with forward fill, the trend-store shape the
      // reference's 1-row-per-second EEG table embodies. ~90% of grid
      // slots are imputed at this sparsity, each flagged `observed =
      // false`; the oracle rebuilds grid, last-in-slot pick (by max
      // event_id — unique, so deterministic), and the IGNORE-NULLS
      // running fill with the identical frame. Values in exact integer
      // cents.
      val ev = table(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      Temporal.resampleFill(ev, "user_id", "ts", "cents", "event_id",
          stepSec = 3600L)
        .select(col("user_id"), col("slot"), col("value").as("cents"),
          col("observed"))
        .orderBy(col("user_id"), col("slot"))
    })
}
