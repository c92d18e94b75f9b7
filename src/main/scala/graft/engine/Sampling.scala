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

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis, IPL 2006 — the A-ES priority sample): each row draws
    * u ∈ (0,1) as a pure function of content (52 bits of md5, offset by
    * ½ulp so u > 0) and is ranked by `ln(u)/w` — the monotone form of
    * the paper's u^(1/w) key — so the k best-keyed rows are a
    * without-replacement sample with inclusion odds scaling with
    * weight. The training-data use: sample k documents biased by a
    * quality/length score, reproducibly.
    *
    * Same guarantees as the other samplers here: membership is a
    * function of CONTENT, so the drawn set survives repartition,
    * retries, cluster resize, and engine swap (the oracle replays it in
    * SQL bit-for-bit — u is exact integer arithmetic and the key gaps
    * between 52-bit draws dwarf any libm ln() ulp skew). Plan shape:
    * row-local key + TakeOrderedAndProject (per-partition heaps — no
    * global sort, no shuffle of the corpus). Weights must be > 0. */
  def weightedSample(df: DataFrame, weight: Column, k: Int,
      idCol: String, contentCol: String = "text"): DataFrame = {
    val u = (conv(substring(md5(col(contentCol)), 1, 13), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4503599627370496.0)
    df.withColumn("_aes_key", log(u) / weight)
      .orderBy(col("_aes_key").desc, col(idCol))
      .limit(k)
      .drop("_aes_key")
  }

  /** Per-group weighted sampling without replacement: k documents PER
    * GROUP by the same Efraimidis–Spirakis priority keys as
    * [[weightedSample]] — the "best k per language / per source"
    * stratified draw that completes the sampling matrix (q82 stratifies
    * uniformly, q111 weights globally, this weights within strata).
    * Deterministic: the key is a pure function of content, the
    * tiebreak is id, so the drawn set survives repartition and engine
    * swap.
    *
    * Plan shape at 100 TB: one shuffle on the group key, then
    * `row_number` truncation inside each group's partition — the sort
    * is per-group (distributed across group hashes), never global, and
    * rows leave the scan with only (key, id, weight) attached. Heavily
    * skewed strata sort within one partition; if a single stratum is
    * itself ~TBs, pre-filter on a key threshold from a quantile probe
    * first (the [[proportionalMix]] two-phase discipline). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String,
      weight: Column, k: Int, idCol: String,
      contentCol: String = "text"): DataFrame = {
    val u = (conv(substring(md5(col(contentCol)), 1, 13), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_aes_key").desc, col(idCol))
    df.withColumn("_aes_key", log(u) / weight)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_aes_key", "_rn")
  }

  /** Proportional source mixing with exact per-source quotas — the
    * "rebalance the corpus to a target domain mixture" step (the Pile /
    * Dolma recipe: upweight books, downweight raw crawl). Given a weight
    * expression over `sourceCol`, draws ⌊budget·w_s/Σw⌋ documents from
    * each source (budget = ⌊budgetFrac·corpus⌋, capped at the source's
    * size), selected by content-hash rank so the drawn set is
    * deterministic and layout-independent.
    *
    * Two-phase exact-rank selection, sized for 100 TB:
    *  1. PREFILTER row-locally to u < (4·quota + 64)/n_s, where u is the
    *     row's 32-bit content-hash fraction — a Chernoff-safe 4×+64
    *     margin (underfill odds < e^{-quota}, i.e. never in practice),
    *     cutting survivors to ~4× the quota during the scan;
    *  2. exact `row_number` rank-by-(hash, id) over SURVIVORS only, so
    *     the per-source sort that would otherwise single-task a 10 TB
    *     source runs over thousands of rows, not billions.
    * Both phases are pure functions of content, so an oracle replays
    * them bit-for-bit; phase 1 never changes the result vs a pure rank
    * unless a source underfills its 4× margin (vanishing probability,
    * and both engines replay the same two-phase spec either way).
    * Source counts and quotas are one tiny aggregation broadcast back —
    * the corpus itself is scanned once and never shuffled. */
  def proportionalMix(df: DataFrame, sourceCol: String, weight: Column,
      budgetFrac: Double, idCol: String, contentCol: String = "text")
      : DataFrame = {
    val stats = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_n_s"))
      .withColumn("_w", weight)
    val totals = stats.agg(sum(col("_w")).as("_sum_w"),
      sum(col("_n_s")).as("_n_tot"))
    val quotas = stats.crossJoin(broadcast(totals))
      .withColumn("_quota",
        least(col("_n_s"),
          floor(floor(col("_n_tot") * budgetFrac) * col("_w") / col("_sum_w"))))
      .select(col(sourceCol), col("_n_s"), col("_quota"))
    val u = conv(substring(md5(col(contentCol)), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("_u").asc, col(idCol).asc)
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("_u", u)
      .filter(col("_u") < (lit(4.0) * col("_quota") + lit(64.0)) / col("_n_s"))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .filter(col("_rk") <= col("_quota"))
      .select(col(idCol), col(sourceCol), col("_rk").as("rank"))
  }

  /** Deterministic training-export shuffle (the "global shuffle then
    * shard" step that turns a curated corpus into training shards):
    * every row gets a pseudo-random sort key `_ord = md5(seed:id)` and a
    * shard `shard_id = bucket(_ord) mod nShards`; a shard's file is its
    * rows ordered by `(_ord, id)`. Changing the seed reshuffles
    * everything; keeping it reproduces the byte-identical shard order on
    * any cluster, any partitioning, any engine — same content-keyed
    * guarantee as the samplers above.
    *
    * Scale shape: both columns are row-local; materializing shards is
    * ONE hash exchange on `shard_id` with per-shard sorts (what
    * `repartition(shard_id).sortWithinPartitions(_ord, id)` plans) — no
    * global total order, no single-partition window. An ntile-style
    * contiguous sharding would need a corpus-wide `row_number`, which is
    * exactly the non-scalable plan this avoids; hash sharding gives the
    * same statistical shuffle with shard sizes uniform to ~sqrt(n). */
  def exportAssign(df: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("_ord",
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("shard_id",
        pmod(conv(substring(col("_ord"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
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
