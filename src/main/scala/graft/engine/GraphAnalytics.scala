package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the near-duplicate graph — the authority
  * side of dedup: once candidate edges exist (shared shingles, LSH
  * buckets), PageRank over them ranks each duplicate cluster's most
  * central exemplar (the survivor-selection signal "keep the copy
  * everything else points at"), a standard curation heuristic for
  * boilerplate hubs and template families.
  *
  * The rank arithmetic is SCALED-INTEGER, not float: each node's rank
  * is a Long in units of 1e-9 ("nano-rank"), every per-edge
  * contribution is `(rank * 85) div (100 * degree)` and the teleport
  * term `(15 * SCALE) div (100 * N)` — all truncating integer division
  * of positive operands, so the result is EXACTLY reproducible across
  * summation orders, partitionings, and engines (Long addition is
  * associative; float addition is not). That is what lets a PageRank
  * be hash-compared against a DuckDB replay at all — a float PR can
  * only ever be compared approximately. The truncation loss per node
  * per iteration is < (in-degree + 1) nano-units — immaterial for
  * ranking and identical on both engines.
  */
object GraphAnalytics {

  val Scale = 1000000000L // 1e9 nano-rank units = rank 1.0

  /** Undirected near-duplicate edges: documents sharing at least one
    * k-token shingle. Per-gram membership is CAPPED at `capPerGram`
    * docs (smallest ids first — deterministic, and the cap is applied
    * by a streaming rank window BEFORE any buffer forms, the
    * [[Dedup.boundedBuckets]] discipline), so a boilerplate gram shared
    * by a million docs yields at most capPerGram² pairs instead of
    * 10¹². Both directions are emitted so the graph is symmetric;
    * output is distinct (src, dst), src ≠ dst.
    *
    * Scale shape: gram build is row-local (corpus × ~n hashes); the
    * only corpus-wide exchanges are the gram-hash rank window and the
    * final distinct — pairs never exceed cap²·|grams|. */
  def gramEdges(df: DataFrame, idCol: String, textCol: String, k: Int,
      capPerGram: Int): DataFrame = {
    require(k >= 2 && capPerGram >= 2, "need k >= 2 and capPerGram >= 2")
    val id = col(idCol)
    // Native rolling hasher (≡ the declarative md5-of-slice transform
    // the oracle replays — see RollingGramHashes); distinct per doc so
    // a within-doc repeat contributes one membership.
    val grams = df
      .select(id, split(trim(col(textCol)), "\\s+").as("_toks"))
      .withColumn("_ghs", array_distinct(
        org.apache.spark.sql.graft.GramFunctions.gramHashes(col("_toks"), k)))
      .select(id, explode(col("_ghs")).as("_gh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_gh")).orderBy(id)
    val capped = grams
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= capPerGram)
    val a = capped.select(col("_gh"), id.as("src"))
    val b = capped.select(col("_gh"), id.as("dst"))
    a.join(b, Seq("_gh"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** Degree-annotated edge list `(src, dst, deg)` — [[pageRankInt]]'s
    * preferred input: materialize THIS once (scratch parquet, the CC
    * label-spill pattern) and every iteration becomes a single scan of
    * it, with no per-round degree join. */
  def withDegrees(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    edges.join(deg, "src")
  }

  /** Scaled-integer PageRank (damping 0.85, `iterations` rounds) over a
    * symmetric edge list — `(src, dst)`, or `(src, dst, deg)` from
    * [[withDegrees]] (computed here when absent). Returns
    * `(id, rank_nano)` — Long nano-rank, exactly reproducible (see
    * object doc).
    *
    * Plan shape: each round is one `edges ⋈ ranks` join on `src` plus
    * one `groupBy dst` partial-agg sum; the rank table is |V|-sized
    * (graph nodes, not corpus rows), so AQE broadcasts it against the
    * edge scan and the per-round cost is a single pass over E. The
    * node count enters as a broadcast ONE-ROW frame (no driver
    * collect). Iterations are bounded and unrolled into one plan —
    * PageRank needs O(10) rounds, not convergence detection. Callers
    * should pass a MATERIALIZED frame (parquet scan): the unrolled
    * rounds reference it `iterations + 2` times, and a lazy lineage
    * would re-derive its whole upstream per reference. */
  def pageRankInt(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "1..20 iterations")
    val e = if (edges.columns.contains("deg")) edges else withDegrees(edges)
    // STATIC per-node frame (id, tele): the teleport term rides THIS,
    // not the evolving rank frame — so each round references the
    // previous ranks exactly ONCE (inside contribs). A second reference
    // (the naive `ranks.select(id, tele).join(contribs)`) doubles the
    // unrolled lineage per round: Spark re-executes common subplans
    // unless they end in a reusable exchange, so five rounds would
    // re-derive round 1 up to 2⁵ times. With the single-reference
    // chain, total work is LINEAR in iterations; the static node
    // subtree's distinct exchange is identical across rounds and
    // dedupes via ReuseExchange.
    val nRow = e.select(col("src").as("id")).distinct()
      .agg(count(lit(1)).as("n"))
    val nodesTele = e.select(col("src").as("id")).distinct()
      .crossJoin(broadcast(nRow))
      .select(col("id"),
        expr(s"(15 * ${Scale}L) div (100 * n)").as("tele"),
        col("n"))
    val r0 = nodesTele.select(col("id"),
      expr(s"${Scale}L div n").as("rank_nano"))
    (1 to iterations).foldLeft(r0) { case (ranks, _) =>
      val contribs = e
        .join(ranks.select(col("id").as("src"), col("rank_nano")), "src")
        .select(col("dst").as("id"),
          expr("(rank_nano * 85) div (100 * deg)").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("in_sum"))
      nodesTele
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (col("tele") + coalesce(col("in_sum"), lit(0L))).as("rank_nano"))
    }
  }
}
