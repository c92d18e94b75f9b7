package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: point-in-time (as-of)
  * join and bounded-interval (range) join. Both are composed from
  * shuffle-friendly primitives — one hash partition on the key plus either
  * an intra-partition sort (as-of) or a bucketed equi-join (range) — so
  * neither ever materializes a per-key cross product.
  *
  * The reference delegates temporal correlation to SQL windows over its
  * event feeds (README.md:24; the EEG drops are month-keyed event batches,
  * lambda-functions/emr-no-vpc.py:18-189); these operators generalize that
  * to the standard time-series join surface (DuckDB/Pandas `ASOF JOIN`,
  * kdb aj) a training-data pipeline needs for feature attribution.
  */
object Temporal {

  /** Distributed as-of join: for each left row, attach the payload of the
    * LATEST right row with the same key and `rightTime <= leftTime`
    * (inclusive — DuckDB `ASOF JOIN ... ON l.t >= r.t` semantics); left
    * rows with no prior right row keep null payload (left-outer).
    *
    * Implementation is union-and-window, the scalable form: tag sides,
    * union on (key, time, side, payload), then one window
    * `last(right_payload, ignoreNulls) over (partition by key order by
    * time, side rows unbounded preceding..current)` and keep left rows.
    * Cost = ONE shuffle on the key + an intra-partition sort — no range
    * condition ever reaches a join, so there is no per-key quadratic term;
    * a sort-merge join with an inequality residual would degenerate to
    * per-key cross products on hot keys. At 100 TB the shuffle partitions
    * by key hash exactly like any groupBy; per-key volume (one entity's
    * history) bounds the sort run.
    *
    * Right rows at equal (key, time) sort before left rows (side 0 < 1),
    * making the match inclusive. Determinism requires the right side be
    * unique per (key, time) — pre-aggregate duplicates upstream, as the
    * query layer does.
    *
    * Output: every left column, then each right payload column as
    * `prefix + name` (rightTime included, as `prefix + rightTime`).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      prefix: String = "asof_"): DataFrame = {
    val rPayloadCols = rightTime +: right.columns
      .filterNot(c => c == key || c == rightTime).toSeq
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(rPayloadCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lSide = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rSide = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toSeq.map(c => col("_l").getField(c).as(c)) ++
        rPayloadCols.map(c => col("_m").getField(c).as(prefix + c)): _*)
  }

  /** Bounded-interval (range) join: all pairs with the same key and
    * `rightTime` in `[leftTime - beforeSec, leftTime + afterSec]`, both
    * ends inclusive.
    *
    * Implementation is the bucketed equi-join form: time is quantized to
    * buckets of width `beforeSec + afterSec` (the window length, so a
    * window covers at most 2 buckets); each RIGHT row lands in exactly one
    * bucket, each LEFT row expands (via `sequence` + `explode`) to the
    * buckets its window overlaps; the join is then a plain equi-join on
    * (key, bucket) with the exact range as a residual filter. Each
    * candidate pair is generated exactly once (the right bucket is
    * unique), fan-out is ≤ 2× the left side, and the shuffle key
    * (key, bucket) subdivides hot keys by time — strictly better skew
    * behavior than keying on `key` alone, and the reason this scales where
    * a raw `l.key = r.key AND r.t BETWEEN ...` join (key-only shuffle +
    * per-key cross product) would not.
    *
    * The right key and time columns are aliased internally before the
    * join, so `leftTime` and `rightTime` may share a name. The right time
    * comes back as `right_<name>` whenever its own name would collide
    * with ANY left column (not just `leftTime` — a left payload column
    * named `rightTime` would otherwise duplicate in the output), else
    * under its own name. Any OTHER column name shared by both sides is
    * rejected up front — it would silently produce duplicate output
    * columns.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      beforeSec: Long, afterSec: Long): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0,
      "window must have positive length")
    val shared = (right.columns.toSet - key - rightTime)
      .intersect(left.columns.toSet - key - leftTime)
    require(shared.isEmpty, "ambiguous non-key/time columns on both " +
      s"sides: ${shared.mkString(", ")} — rename before joining")
    val rtOut =
      if (left.columns.contains(rightTime)) s"right_$rightTime"
      else rightTime
    require(!left.columns.contains(rtOut),
      s"right-time output name $rtOut collides with a left column — " +
        "rename before joining")
    val widthUs = (beforeSec + afterSec) * 1000000L
    def bucket(t: Column): Column = floor(unix_micros(t) / widthUs)
    val lBuckets = explode(sequence(
      bucket(col(leftTime) - expr(s"INTERVAL $beforeSec SECOND")),
      bucket(col(leftTime) + expr(s"INTERVAL $afterSec SECOND"))))
    val l = left.withColumn("_b", lBuckets)
    val r = right.withColumnRenamed(key, "_rk")
      .withColumnRenamed(rightTime, "_rt")
      .withColumn("_b", bucket(col("_rt")))
    l.join(r, col(key) === col("_rk") && l("_b") === r("_b"))
      .filter(col("_rt") >= col(leftTime) -
          expr(s"INTERVAL $beforeSec SECOND") &&
        col("_rt") <= col(leftTime) +
          expr(s"INTERVAL $afterSec SECOND"))
      .drop("_b", "_rk")
      .withColumnRenamed("_rt", rtOut)
  }

  /** Regularize an irregular per-key time series onto a fixed grid with
    * forward fill — the resample step every trend store needs (the
    * reference's EEG table IS a 1-row-per-second trend;
    * reference random_generator.py:48 emits gapless seconds, real
    * hospital feeds don't). For each key: a complete `stepSec` grid
    * from its first to its last observation, each slot carrying the
    * LAST observation in that slot (picked by max `tieCol` — a unique
    * id, so the pick is deterministic), gaps forward-filled from the
    * previous slot.
    *
    * Output: `(key, slot, value, observed)` — `observed` false on
    * filled gaps, so downstream can weight or drop imputed rows.
    *
    * Plan shape: one aggregation on (key, slot), one id-joinback for
    * the slot value (broadcast — one row per observed slot), the grid
    * a row-local `sequence` explode off the per-key span (output rows
    * = span/step per key — callers bound the key set or step), and ONE
    * window (partition key, order slot) for the fill: everything
    * partitions on the key, nothing is ever corpus × grid. */
  def resampleFill(df: DataFrame, key: String, tsCol: String,
      valCol: String, tieCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, "step must be positive")
    val slot = timestamp_seconds(
      floor(unix_micros(col(tsCol)) / (stepSec * 1000000L)) * stepSec)
    val lastIds = df
      .groupBy(col(key), slot.as("slot"))
      .agg(max(col(tieCol)).as("_tie"))
    val slotVals = lastIds
      .join(df.select(col(tieCol).as("_tie"), col(valCol).as("_v")), "_tie")
      .select(col(key), col("slot"), col("_v"))
    val span = slotVals.groupBy(col(key))
      .agg(min(col("slot")).as("_mn"), max(col("slot")).as("_mx"))
    val grid = span.select(col(key),
      explode(sequence(col("_mn"), col("_mx"),
        expr(s"INTERVAL $stepSec SECOND"))).as("slot"))
    val w = Window.partitionBy(col(key)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(slotVals, Seq(key, "slot"), "left")
      .select(col(key), col("slot"),
        last(col("_v"), ignoreNulls = true).over(w).as("value"),
        col("_v").isNotNull.as("observed"))
  }
}
