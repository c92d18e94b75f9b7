package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-corpus analytics in EXACT integer arithmetic: second-moment
  * (scatter) matrix, power-iteration PCA, and classifier evaluation
  * (ROC-AUC) — the measurement layer a curation pipeline runs over its
  * embedding column before committing to a dedup/filter operating point.
  *
  * Everything here rides on [[Similarity.quantizeInt8]]'s int8 codes, for
  * two reasons that matter equally:
  *  - at 100 TB the analytics pass should touch the 4×-smaller quantized
  *    working set, not the float column (the same lever q100 establishes
  *    for search);
  *  - int8 codes make every downstream sum/product EXACT (BIGINT, or
  *    doubles kept below 2^53), so results are bit-reproducible across
  *    engines, partitionings, and summation orders — which is what lets
  *    the DuckDB oracle replay even the power iteration, an operation
  *    float pipelines can never hash-compare.
  *
  * The reference's analytics surface stops at SQL aggregation (Athena
  * over parquet, reference README.md:13-15); this module is part of the
  * repo's LLM-pipeline extension family, alongside Similarity/Dedup.
  */
object EmbeddingStats {

  /** Int8-quantize keeping the label column ([[Similarity.quantizeInt8]]
    * drops it; evaluation needs it). Same op sequence per element, so
    * q100's oracle bit-agreement carries over unchanged. */
  def quantizedWithLabel(e: DataFrame): DataFrame =
    e.withColumn("_scale",
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"))
      .filter(col("_scale") > 0)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) / _scale * 127.0) AS INT))").as("q"))

  /** Upper-triangle second-moment (scatter) matrix of the int8 codes:
    * `S[i][j] = Σ_rows q_i · q_j` for `1 ≤ i ≤ j ≤ d`, exact BIGINT.
    *
    * Plan shape — the optimal one for a fixed-width mergeable
    * statistic: a custom keyless
    * [[org.apache.spark.sql.graft.IntScatterAgg]] aggregate folds every
    * row's d²/2 products into ONE long[2,080] buffer per task (no
    * intermediate rows at all), and the exchange moves a single ~16 KB
    * serialized buffer per task — corpus-size-independent
    * communication, the same merge discipline as the sketch family.
    * The result explodes into the (i, j, s) relation AFTER the final
    * merge: 2,080 rows total. Products are ≤ 127² and the BIGINT sum
    * is exact to ~5.7e14 rows (≫ any corpus); buffer adds are
    * associative, so the result is bit-identical to
    * [[intScatterExplode]] (differentially tested) at any
    * partitioning. */
  def intScatter(qdf: DataFrame): DataFrame = {
    val d = 64
    qdf.agg(org.apache.spark.sql.graft.ScatterFunctions
        .intScatterTriangle(col("q"), d).as("tri"))
      .select(explode(col("tri")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.s").as("s"))
  }

  /** The declarative explode→groupBy formulation — the differential
    * reference [[intScatter]]'s native aggregate is tested against
    * (and the shape a built-ins-only deployment would use): each row
    * generates its d(d+1)/2 (i, j, product) triples, map-side partial
    * combine collapses them before the shuffle. Correct and
    * partial-agg-friendly, but every row pays ~2,000× row traffic
    * through the aggregator's probe path — the native buffer fold
    * replaces exactly that. */
  private[graft] def intScatterExplode(qdf: DataFrame): DataFrame = {
    val d = 64
    qdf.select(explode(expr(
        s"""flatten(transform(sequence(1, $d), i ->
           |  transform(sequence(i, $d), j -> struct(
           |    CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           |    CAST(element_at(q, i) AS BIGINT) * element_at(q, j) AS p))))"""
          .stripMargin)).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("s"))
  }

  /** Sign-preserving truncating division — the ONE division semantics
    * both engines (and plain Scala `/` on Long) agree on once operands
    * are made non-negative: `sdiv(a, b) = sign(a) · (|a| div b)`. Spark
    * `div` and DuckDB `//` differ on negative operands (trunc vs floor),
    * so every divide in this module goes through this form. */
  private def sdivLong(a: Long, b: Long): Long =
    if (a >= 0) a / b else -((-a) / b)

  /** Power iteration on the int8 scatter matrix, in EXACT integer
    * arithmetic — returns the dominant eigenvector direction as an
    * integer vector with entries in [-vScale, vScale].
    *
    * Each round: `u = C·v` (BIGINT matvec over the d×d matrix
    * `C = sdiv(S, n)` — n-normalized so entries stay ≤ 127² at ANY
    * corpus size, which bounds `|u| ≤ d · 127² · vScale ≈ 4.2e9` and the
    * rescale product `|u| · vScale ≈ 1.7e13`, both far inside BIGINT),
    * then integer-rescale `v' = sign(u) · (|u| · vScale div max|u|)`.
    * Because every step is exact, BOTH engines running the same fixed
    * iteration count produce the IDENTICAL vector — convergence quality
    * affects only how principal the direction is, never the compare.
    *
    * Driver boundary: the input is the COLLECTED scatter triangle —
    * d(d+1)/2 = 2,080 rows, bounded by the embedding dimension, not by
    * data (the k-means-centroid discipline, VERDICT's audited-collect
    * class). The O(iters · d²) loop is ~50k multiplies — driver-trivial.
    */
  def powerIteration(tri: Array[(Int, Int, Long)], n: Long, d: Int,
      iters: Int, vScale: Long = 4096L): Array[Long] = {
    val c = Array.ofDim[Long](d, d)
    tri.foreach { case (i, j, s) =>
      val v = sdivLong(s, n)
      c(i - 1)(j - 1) = v
      c(j - 1)(i - 1) = v
    }
    var v = Array.fill(d)(vScale)
    var it = 0
    var done = false
    while (it < iters && !done) {
      val u = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }; s
      }
      val mx = u.map(math.abs).max
      if (mx == 0L) done = true // zero matrix: direction undefined, stop
      else v = u.map(x => if (x >= 0) x * vScale / mx else -(-x * vScale / mx))
      it += 1
    }
    v
  }

  /** Row-local projection of the int8 codes onto an integer direction
    * vector: `p = Σ_i q_i · v_i`, computed through the codegen'd double
    * dot product — every product (≤ 127 · vScale) and the full sum
    * (≤ d · 127 · vScale ≈ 3.3e7) is integer-valued and < 2^53, so the
    * double arithmetic is EXACT in any summation order and the final
    * BIGINT cast is lossless. No shuffle: the projection happens inside
    * the scan, which is the point of PCA-scoring at 100 TB. */
  def projectInt(qCol: Column, v: Array[Long]): Column =
    Similarity.dot(qCol.cast("array<double>"),
      expr(s"array(${v.mkString("D,")}D)")).cast("bigint")

  /** Deterministic ±1 sign weights (splitmix64 parity — the
    * [[Similarity.hyperplanes]] generator discipline: reproducible
    * everywhere, embeds as literals in both engines). */
  def signWeights(d: Int = 64): Array[Int] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.tabulate(d)(j => if ((mix(j.toLong + 7L) & 1L) == 0L) 1 else -1)
  }

  /** Exact ROC-AUC of an integer score against a binary label, by the
    * tie-corrected Mann–Whitney identity over SCORE-BUCKET counts:
    *
    *   2·P·N·AUC = Σ_buckets (2 · negBelow(s) · pos(s) + pos(s) · neg(s))
    *
    * where negBelow is the cumulative negative count over strictly
    * smaller scores. Everything up to the final division is BIGINT —
    * exact, order-free.
    *
    * Scale shape: the corpus collapses to per-score counts in ONE hash
    * aggregation (map-side combined; the score domain is bounded by
    * construction — an int8 dot against ±1 weights lies in
    * [-d·127, d·127], ≤ 16k distinct values at d = 64), and the
    * cumulative window runs over those ≤ 16k bucket rows, NOT the
    * corpus — the unpartitioned window is bounded by the score domain,
    * independent of corpus size. This is how AUC is computed at 100 TB:
    * never a global sort of raw scores.
    *
    * Returns one row: (pos BIGINT, neg BIGINT, u2 BIGINT,
    * auc = round(u2 / (2·pos·neg), 6)).
    */
  def aucByScoreBuckets(scored: DataFrame, scoreCol: String,
      isPosCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(isPosCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(isPosCol), 0L).otherwise(1L)).as("neg"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets
      .withColumn("neg_below", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(col("pos")).cast("bigint").as("pos"),
        sum(col("neg")).cast("bigint").as("neg"),
        sum(lit(2L) * col("neg_below") * col("pos")
          + col("pos") * col("neg")).cast("bigint").as("u2"))
      .withColumn("auc", round(col("u2").cast("double")
        / (lit(2.0) * col("pos") * col("neg")), 6) + lit(0.0))
  }
}
