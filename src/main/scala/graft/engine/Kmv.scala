package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct-value sketch — the
  * mergeable cardinality sketch whose arithmetic is EXACTLY replayable
  * in ANSI SQL, unlike HLL's register layout (q63) or Spark's internal
  * xxhash64: the hash point is the first 60 bits of md5, which DuckDB
  * computes bit-identically, so estimates get a full hash-compare
  * oracle rather than rows-only.
  *
  * Theory (Bar-Yossef et al., "Counting distinct elements in a data
  * stream"): hash values to uniform points, keep the k smallest; with
  * K(k) the k-th smallest point as a fraction of the hash space,
  * `distinct ≈ (k-1)/K(k)`. The sketch is a SET, which is what makes it
  * more than a counter:
  *  - union: k smallest of the merged sketches — a valid KMV of A∪B;
  *  - intersection: ρ = |union-sketch points present in BOTH inputs|
  *    estimates the Jaccard fraction, `|A∩B| ≈ ρ/k · est(A∪B)`.
  * That second form is the decontamination/dedup PLANNING primitive at
  * 100 TB: "how much n-gram overlap do these two corpora have" answered
  * from two k-row sketches, no corpus-× -corpus join anywhere.
  *
  * Scale shape: per-group k-min runs as a SALTED two-stage rank window
  * (partial k-min per (group, hash mod salts), then k-min of the ≤
  * salts·k survivors) — the [[Dedup.boundedBuckets]] discipline: no
  * single reducer ever sees a group's full domain, nothing buffers
  * more than a streaming rank, and stage-2 input is bounded. The
  * two-stage result is bit-identical to a global k-min (the global k
  * smallest survive their salt partitions), which is what the
  * single-stage oracle replays.
  */
object Kmv {

  /** 2^60 — exactly representable in a double; the hash-space size for
    * [[point]]s, written as a literal so both engines fold the same
    * constant. */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit uniform hash point: first 15 hex chars of md5. md5 agrees
    * across Spark and DuckDB on UTF-8 text; 15 nibbles keep the value
    * positive in a signed 64-bit long on both. */
  def point(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Per-group bottom-k of DISTINCT hash points. Input must carry
    * columns `g` (group) and `h` (point); output is the same shape,
    * ≤ k rows per group. */
  def sketch(pts: DataFrame, k: Int, salts: Int = 32): DataFrame = {
    val w1 = Window.partitionBy(col("g"), pmod(col("h"), lit(salts)))
      .orderBy(col("h"))
    val s1 = pts.distinct()
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= k).drop("rn")
    val w2 = Window.partitionBy(col("g")).orderBy(col("h"))
    s1.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k).drop("rn")
  }

  /** The KMV estimator: exact when the sketch is the whole domain
    * (fewer than k points survive ⇒ true distinct < k), else
    * `(k-1)·2^60 / kth` — every operation in IEEE double with a fixed
    * order, so the oracle's identical expression rounds identically. */
  def estimate(nRows: Column, kth: Column, k: Int): Column =
    when(nRows < k, nRows.cast("long"))
      .otherwise(round(lit((k - 1).toDouble) * lit(HashSpace) /
        kth.cast("double")).cast("long"))

  /** Intersection estimate from ρ matching union-sketch points and the
    * (already-rounded) union estimate — ρ/k of the union. */
  def intersectEstimate(rho: Column, estUnion: Column, k: Int): Column =
    round(rho.cast("double") * estUnion.cast("double") / lit(k.toDouble))
      .cast("long")
}
