package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling and dataset splitting — the
  * reproducibility primitives a training-data pipeline needs that
  * `DataFrame.sample`/`sampleBy` cannot give it: those draw from a
  * per-partition RNG, so the selected SET changes with partitioning,
  * retries, and cluster size. Here membership is a pure function of row
  * CONTENT (md5 — engine-portable, unlike xxhash64, so the DuckDB
  * oracle replays it bit-for-bit): the same document lands in the same
  * sample/split on any cluster, any layout, any engine, forever.
  *
  * Scale shape: row-local expressions only — no shuffle, no driver
  * state, evaluated inside the scan's codegen stage; a sample filter
  * composes with partition pruning and column pruning like any other
  * predicate. The md5 is the only non-trivial cost (~100ns/row) — at
  * 100 TB that is noise against the IO it gates.
  */
object Sampling {

  /** Stable bucket in [0, n): first 8 hex chars of md5(content) → int.
    * 32 bits of hash for ≤ 10^4 buckets keeps per-bucket occupancy
    * uniform to ~1e-5. */
  def contentBucket(c: Column, n: Int = 100): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(n.toLong))

  /** Stratified sample with per-stratum percentages: keep a row iff its
    * content bucket falls under its stratum's threshold. Unlike
    * `sampleBy` the strata thresholds are data (a CASE expression), the
    * draw is reproducible, and expected fractions are exact-in-
    * distribution per stratum. */
  def stratifiedSample(df: DataFrame, stratum: String,
      pctByStratum: Map[String, Int], defaultPct: Int,
      contentCol: String = "text"): DataFrame = {
    val threshold = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (value, pct)) => when(col(stratum) === value, pct).otherwise(acc)
    }
    df.filter(contentBucket(col(contentCol)) < threshold)
  }

  /** Train/val/test assignment by content bucket: [0,trainPct) train,
    * [trainPct, trainPct+valPct) val, rest test. Adding a document
    * never moves an existing one between splits — the property that
    * keeps eval sets uncontaminated as the corpus grows. */
  def assignSplit(df: DataFrame, trainPct: Int, valPct: Int,
      contentCol: String = "text"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = contentBucket(col(contentCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
