package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus — the
  * training-data-pipeline extension surface (BASELINE north star): token
  * accounting, quality scoring, stopword-profile language ID, word
  * frequency, and content fingerprinting.
  *
  * All operators are pure column expressions (codegen'd, no UDFs) so they
  * stay inside whole-stage codegen and scale linearly with the corpus:
  * per-document expressions shuffle nothing; the word top-k is a
  * partial-agg-friendly hash aggregation.
  *
  * Every expression here has an exact DuckDB equivalent (the q35-q38
  * oracles) — regex syntax is kept to the RE2 ∩ java.util.regex subset.
  */
object TextAnalysis {

  /** Whitespace-normalized, lowercased, trimmed text — the canonical form
    * for fingerprinting and dedup. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** MD5 content fingerprint of the normalized text (deterministic,
    * engine-portable — unlike xxhash64 which is Spark-specific). */
  def fingerprint(c: Column): Column = md5(normText(c))

  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count proxy: whitespace tokens plus intra-word
    * letter↔digit/underscore transitions. On plain prose this equals the
    * token count; on code/markup it grows like a subword tokenizer's
    * piece count. No lookahead — RE2 (DuckDB) doesn't support it, and the
    * oracle must count the same matches. */
  def tokenCountBpeIsh(c: Column): Column =
    (size(tokens(c)) +
      regexp_count(c, lit("[a-zA-Z][0-9_]|[0-9_][a-zA-Z]"))).cast("long")

  // Stopword profiles for the language-ID heuristic. Word-boundary
  // alternations — supported identically by java.util.regex and RE2.
  val EnStops = "\\b(the|a|of|and|to|in|is|it)\\b"
  val DeStops = "\\b(der|die|das|und|ist|nicht|ein|zu)\\b"
  val EsStops = "\\b(el|la|los|de|que|es|un|y)\\b"
  val FrStops = "\\b(le|la|les|des|et|est|une|dans)\\b"
  val CjkChars = "[\\x{4e00}-\\x{9fff}]"

  def stopHits(c: Column, pattern: String): Column =
    regexp_count(lower(c), lit(pattern)).cast("long")

  /** Stopword-profile language ID: CJK characters dominate, otherwise the
    * profile with the most hits wins (fixed tie order en>de>es>fr). A
    * per-row expression — no shuffle, no model, the classic n-gram/stopword
    * heuristic shape. */
  def langId(c: Column): Column = {
    val (en, de, es, fr) = (stopHits(c, EnStops), stopHits(c, DeStops),
      stopHits(c, EsStops), stopHits(c, FrStops))
    when(regexp_count(c, lit(CjkChars)) > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Quality band from length + lexical diversity + stopword density —
    * the length/punct/stopword-ratio scoring family. */
  def qualityBand(nTokens: Column, diversity: Column, stopRatio: Column): Column =
    when(nTokens >= 30 && nTokens <= 90 && diversity >= 0.25 && stopRatio <= 0.3, "good")
      .when(nTokens >= 15, "fair")
      .otherwise("low")

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * — the rolling-hash fingerprint family): slide a window of `w`
    * consecutive character `k`-grams over the normalized text and keep
    * each window's MINIMUM gram; the distinct minima are the document's
    * fingerprint set. Guarantees every match of length ≥ w+k-1 shares a
    * fingerprint, while keeping O(n/w) expected fingerprints — the
    * near-dup detection primitive that, unlike MinHash, localizes WHERE
    * the overlap is. Minima are taken by binary string order (order
    * embedding of a rolling hash — deterministic and oracle-portable
    * where engine hash functions are not).
    *
    * Evaluation shape is the whole point of this signature. Higher-order
    * -function lambdas are INTERPRETED (no whole-stage codegen, no
    * common-subexpression elimination across lambda boundaries), so a
    * single nested expression `transform(.., j => array_min(slice(
    * transform(..), j, w)))` re-evaluates the entire gram array — and
    * the full-document regex normalization under it — for EVERY outer
    * window element: O(n²) evals × O(n) regex per document (this hung
    * an earlier bench for 20+ minutes on one core). Instead each level
    * is STAGED as its own projection, so when the minima lambda reads
    * `grams` it is a bound attribute: one array build per row, O(n·w)
    * total. Each staged column is deliberately referenced TWICE by its
    * consumer (`length(norm)`+`substr(norm)`, `size(grams)`+
    * `slice(grams)`), which stops Catalyst's CollapseProject from
    * inlining the non-cheap producer back into the lambda — the staging
    * survives optimization (verified by plan in TextSpec).
    *
    * Precondition: rows must satisfy `length(normText(text)) ≥ k+w-1`
    * (shorter rows would hit `sequence(1, non-positive)`, which counts
    * DOWN). Still shuffle-free and row-local; callers should
    * `repartition` a single-file scan first so the per-row work spreads
    * across cores. */
  def winnowStaged(df: org.apache.spark.sql.DataFrame, textCol: Column,
      k: Int, w: Int, out: String): org.apache.spark.sql.DataFrame = {
    val norm = col("__winnow_norm")
    val grams = col("__winnow_grams")
    df.withColumn("__winnow_norm", normText(textCol))
      .withColumn("__winnow_grams",
        transform(sequence(lit(1), length(norm) - (k - 1)),
          i => norm.substr(i, lit(k))))
      .withColumn(out,
        array_distinct(transform(sequence(lit(1), size(grams) - (w - 1)),
          j => array_min(slice(grams, j, lit(w))))))
      .drop("__winnow_norm", "__winnow_grams")
  }

  /** Corpus-wide TF-IDF, top-`k` terms per document. Classic shape:
    * tokenize → explode → two hash aggregations (term frequency per doc,
    * document frequency per term) → score join → per-doc top-k window.
    * Both aggregations are partial-agg friendly (map-side combine on the
    * exploded tokens); the doc-count is ONE scalar broadcast back; the
    * tf⋈df join shuffles on `term` — at 100 TB the vocabulary side is
    * orders of magnitude smaller than the posting side, and AQE picks a
    * broadcast when it fits. Natural log, rounded to 6 before compare
    * (DuckDB `ln` ≡ Spark `log`). Tokens restricted to [a-z]+ after
    * lower/trim so both engines tokenize identically. */
  def tfIdfTopK(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(filter(split(lower(trim(col("text"))), "\\s+"),
        t => t.rlike("^[a-z]+$"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("_n").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("doc_id"), col("term"), col("score"))
  }

  /** Gopher/C4-family repetition signal: fraction of duplicate word
    * `n`-grams in a document (`1 - distinct/total`). Highly repetitive
    * machine-generated or boilerplate text scores near 1, natural prose
    * near 0 — the standard cheap pre-training quality filter. Staged
    * projections (same discipline as [[winnowStaged]]): `words` and
    * `grams` are bound attributes, each consumer references its producer
    * at least twice, so no O(n²) lambda re-evaluation survives
    * optimization. Row-local, shuffle-free. Rows need ≥ n words —
    * filter first. */
  def duplicateGramRatio(df: org.apache.spark.sql.DataFrame, n: Int,
      out: String): org.apache.spark.sql.DataFrame = {
    val words = col("__rep_words")
    val grams = col("__rep_grams")
    df.withColumn("__rep_words", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(words) >= n)
      .withColumn("__rep_grams",
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
      .withColumn("n_grams", size(grams).cast("long"))
      .withColumn(out,
        round(lit(1.0) -
          size(array_distinct(grams)).cast("double") / size(grams), 6))
      .drop("__rep_words", "__rep_grams")
  }

  /** [[duplicateGramRatio]] as a single pushdown-proof Column — for
    * COMPOSED pipelines where the ratio feeds a filter.
    *
    * The staged-projection discipline protects a standalone query, but
    * it cannot protect a pipeline: `PushDownPredicates` substitutes a
    * filter on the ratio THROUGH the staging projections (the alias is
    * inlined into the pushed predicate, the now-unreferenced staging
    * columns are pruned away), and the rebuilt predicate evaluates
    * `split(...)` INSIDE the gram lambda — O(n) tokenizations × O(n)
    * gram elements = O(n²) per row, the exact pathology staging
    * prevents (observed in q108's collapsed filter before this form).
    *
    * This form is immune BY CONSTRUCTION, not by optimizer cooperation:
    * a single-element `transform` is a let-binding — the words array is
    * the ARGUMENT of the outer lambda, so however far the optimizer
    * inlines the whole expression, `ws`/`gs` stay lambda variables
    * (O(1) bound references) and the split and gram build each run once
    * per row: O(n·w) inlined anywhere, filter included. Total function:
    * rows with < `n` words score 0.0 (no duplicate grams), so conjunct
    * reordering can't hit the descending-`sequence` trap. */
  def dupGramRatioExpr(text: Column, n: Int): Column =
    element_at(transform(array(split(lower(trim(text)), "\\s+")), ws =>
      element_at(transform(array(
        when(size(ws) >= n,
          transform(sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws(" ", slice(ws, i, lit(n)))))
          .otherwise(array())), gs =>
        when(size(gs) > 0,
          round(lit(1.0) -
            size(array_distinct(gs)).cast("double") / size(gs), 6))
          .otherwise(lit(0.0))), lit(1))), lit(1))

  /** Corpus-relative quality gate: keep rows at or above the global
    * `q`-quantile of `metric` — "drop the worst quartile" style filtering,
    * where the threshold is a property of the corpus, not a constant.
    *
    * Plan shape: ONE single-row aggregate over the metric, broadcast back,
    * then a row-local filter — the corpus itself is never shuffled. Exact
    * interpolated `percentile` here because the oracle must agree
    * bit-for-bit (threshold rounded to 6 before comparing); its state is
    * O(distinct metric values), bounded for a rounded score. At raw
    * 100 TB swap in `percentile_approx` — identical plan shape, sketch
    * state instead. */
  def quantileThresholdFilter(df: org.apache.spark.sql.DataFrame,
      metric: String, q: Double): org.apache.spark.sql.DataFrame = {
    val thr = df.agg(round(expr(s"percentile($metric, $q)"), 6).as("_thr"))
    df.crossJoin(broadcast(thr)).filter(col(metric) >= col("_thr"))
      .drop("_thr")
  }

  /** Corpus-frequency segment dedup (the C4/CCNet/RefinedWeb cleaning
    * pass): split each document into sentence segments on `.`, find
    * segments that occur verbatim in ≥ `minDocs` DISTINCT documents
    * (boilerplate — nav chrome, legal footers, newsletter prompts), and
    * rebuild every document from its surviving segments in original
    * order. Returns one row per input document:
    * `(id, n_segs, n_removed, clean_md5)` where `clean_md5` hashes the
    * rebuilt text (". "-joined; empty string when everything was
    * boilerplate — documents are never dropped, so the caller decides
    * the min-content policy).
    *
    * Plan shape, and why it holds at 100 TB: segments explode the corpus
    * ~1× (every byte appears in exactly one segment); the frequency pass
    * is one hash aggregation keyed on the segment md5 — uniformly
    * distributed, partial-agg friendly (count-distinct-by-doc expands to
    * (hash, doc) partial dedup map-side). The boilerplate SET is then
    * small BY DEFINITION — ≤ distinct_segments / minDocs, and in practice
    * tiny (boilerplate means few unique strings repeated massively) — so
    * it broadcasts, and the corpus-side pass is a broadcast left join +
    * one reassembly aggregation on the document key. The corpus never
    * sort-merge-joins against anything. Skew note: a segment repeated
    * 10^8× is heavy on ONE reducer only as (hash, doc) pairs in the
    * count-distinct expand, which partial-aggregates map-side before the
    * exchange. "Small by definition" is still a distribution argument
    * (`≤ distinct/minDocs` can be executor-breaking on a template-farm
    * corpus), so the set size is probed with a bounded count and above
    * `maxBroadcastSegs` the hint is dropped — the planner then picks a
    * shuffle join for the one pass that genuinely needs it, identical
    * results. */
  def segmentDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: Column, minDocs: Int,
      maxBroadcastSegs: Int = 1 << 22): org.apache.spark.sql.DataFrame = {
    val segs = df
      .select(col(idCol), posexplode(split(textCol, "\\."))
        .as(Seq("_seg_idx", "_raw")))
      .withColumn("_seg", trim(col("_raw")))
      .filter(col("_seg") =!= "")
      .select(col(idCol), col("_seg_idx"), col("_seg"),
        md5(col("_seg")).as("_h"))
    val boilerplate = segs.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_h"), lit(true).as("_dup"))
    // probe-is-the-result: collect up to bound+1 heavy hashes (32-char
    // md5s — the same driver order the broadcast would hold) so the
    // common case computes the corpus aggregate ONCE; only an
    // over-bound set pays the recompute, inside its shuffle join
    val heavyArr = boilerplate.select(col("_h"))
      .limit(maxBroadcastSegs + 1).collect().map(_.getString(0))
    val fits = heavyArr.length <= maxBroadcastSegs
    val dupSide =
      if (fits) broadcast(df.sparkSession.createDataset(heavyArr.toSeq)(
        org.apache.spark.sql.Encoders.STRING).toDF("_h")
        .withColumn("_dup", lit(true)))
      else boilerplate
    segs.join(dupSide, Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        count(col("_dup")).as("n_removed"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("_dup").isNull,
            struct(col("_seg_idx"), col("_seg"))))),
          s => s.getField("_seg")), ". ")).as("clean_md5"))
  }

  /** Exact substring deduplication (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr operator,
    * re-expressed relationally): any `k`-token span whose text appears
    * more than once in the corpus is removed from every occurrence but
    * the first (first = smallest `(doc, position)` — a total order, so
    * the kept copy is deterministic across partitionings and engines).
    * Complements [[segmentDedup]] (which drops whole repeated sentences
    * at sentence boundaries): this catches repeated spans at ANY offset —
    * the licence-block-mid-page, quoted-paragraph case — the suffix-array
    * use in the paper, here via rolling k-token windows.
    *
    * Plan shape at 100 TB:
    *  - window hashes are built ROW-LOCALLY (`transform` over the start
    *    sequence; ~n hashes per n-token doc) and exploded — corpus × 1,
    *    like the n-gram queries;
    *  - the only corpus-wide exchange is the hash-partitioned
    *    `row_number` over gram hash that picks each span's first
    *    occurrence — same shuffle a `groupBy(hash)` would pay, no
    *    buffering (streaming rank, the [[Dedup.boundedBuckets]] shape).
    *    A pathological hash (one span duplicated across a large corpus
    *    fraction) skews its partition; its occurrence LIST is never
    *    materialized, only ranked, so the cost is a scan not a buffer;
    *  - duplicate-span starts flow BACK per document as a bounded array
    *    (≤ n_tokens entries), and token removal is a row-local indexed
    *    `filter` with an interval-membership `exists` — no token-level
    *    corpus explosion, no second corpus shuffle (the starts join is
    *    id-keyed on an already-id-partitioned projection).
    *
    * Returns `(id, n_tokens, n_removed, clean_md5)` per document,
    * ordered by id; the DuckDB oracle replays the identical md5 window
    * hashes and first-occurrence rank. */
  def substringDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 2, "span length must be at least 2 tokens")
    val id = col(idCol)
    val toks = df
      .select(id, split(trim(col(textCol)), "\\s+").as("_toks"))
      .withColumn("_n", size(col("_toks")))
    // Native rolling-window hasher ([[org.apache.spark.sql.graft.RollingGramHashes]]):
    // ≡ transform(sequence(0, n-k), i -> md5(concat_ws(' ', slice(toks,
    // i+1, k)))) — the declarative contract the oracle replays — in one
    // compiled pass (HOFs don't codegen; equality property-tested).
    val grams = toks
      .withColumn("_ghs",
        org.apache.spark.sql.graft.GramFunctions.gramHashes(col("_toks"), k))
      .select(id, posexplode(col("_ghs")).as(Seq("_pos", "_gh")))
    val firstOcc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_gh")).orderBy(id, col("_pos"))
    val dupStarts = grams
      .withColumn("_rn", row_number().over(firstOcc))
      .filter(col("_rn") > 1)
      .groupBy(id)
      .agg(array_sort(collect_list(col("_pos"))).as("_starts"))
    toks
      .join(dupStarts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), array().cast("array<int>")))
      .withColumn("_kept",
        filter(col("_toks"),
          (t, i) => !exists(col("_starts"), s => s <= i && i < s + k)))
      .select(id, col("_n").cast("long").as("n_tokens"),
        (col("_n") - size(col("_kept"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", col("_kept"))).as("clean_md5"))
      .orderBy(id)
  }

  /** Unigram cross-entropy quality scoring (the CCNet perplexity
    * filter's unigram form): score each document by the mean surprisal
    * −ln p(token) under the corpus's own unigram distribution, with the
    * vocabulary capped at the `vocabSize` most frequent tokens and
    * out-of-vocabulary tokens floored at p = 0.5/N (add-half smoothing).
    * Low scores are templated/common text, high scores are rare-token
    * garbage — curation keeps the middle band (compose with
    * [[quantileThresholdFilter]]). Returns
    * `(id, n_tokens, avg_surprisal)` rounded to 4 so cross-engine float
    * summation order can't flip a comparison.
    *
    * Plan shape at 100 TB: the token explosion is corpus×1; the vocab
    * is one partial-agg-friendly hash aggregation whose result is
    * BOUNDED BY CONSTRUCTION (top-`vocabSize` via TakeOrdered heaps, no
    * global sort) so it always broadcasts — the corpus-side pass is a
    * broadcast left join plus one per-document aggregation, and the
    * corpus never sort-merge-joins. The one-row token total rides the
    * same broadcast pattern as [[quantileThresholdFilter]]. */
  def unigramSurprisal(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(col(textCol))).as("_tok"))
    val tot = toks.agg(count(lit(1)).as("_n"))
    val vocab = toks.groupBy(col("_tok"))
      .agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_tok"))
      .limit(vocabSize)
    toks.join(broadcast(vocab), Seq("_tok"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("_surp",
        -log(coalesce(col("_c"), lit(0.5)) / col("_n")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("_surp")), 4).as("avg_surprisal"))
  }

  /** Deterministic sequence packing: assign documents to fixed
    * token-budget training bins (the "pack short documents into one
    * 2048-token context" step every pre-training run does between
    * curation and tokenization). Documents are sharded by content hash,
    * ordered within each shard by (hash, id), and assigned to the bin
    * their running token offset starts in — the greedy sequential fill
    * with spillover, the semantics used when contexts are packed with
    * EOS separators and boundary-straddling docs are truncated at
    * tokenization. Pure function of content: the packing survives
    * repartition, retries, and engine swap. Returns
    * `(id, shard, bin, n_toks)`.
    *
    * Plan shape at 100 TB: the only non-row-local step is one running
    * sum per shard — `shards` is chosen ~ the cluster's partition count
    * (2^14 at 100 TB ⇒ ~6 GB per shard), so the per-shard sort under
    * the window is a normal distributed sort-within-partition, never a
    * single-task global sort, and bins stay reproducible because shard
    * membership and order are content-keyed, not layout-keyed. */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, budget: Int, shards: Int)
      : org.apache.spark.sql.DataFrame = {
    val h = conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol), tokenCount(col(textCol)).as("n_toks"),
        h.as("_h"), pmod(h, lit(shards.toLong)).as("_shard"))
      .withColumn("_cum", sum(col("n_toks")).over(w))
      .select(col(idCol), col("_shard").as("shard"),
        floor((col("_cum") - col("n_toks")) / lit(budget.toDouble))
          .as("bin"),
        col("n_toks"))
  }

  /** Benchmark decontamination (the GPT-3 appendix-C discipline): count,
    * per candidate training document, how many distinct 13-grams it
    * shares with an evaluation corpus. A document with any shared
    * 13-gram is contaminated — it leaks eval content into training and
    * must be dropped before the loss ever sees it. Returns
    * `(id, gram_h)` pairs of the candidate's matching grams for the
    * caller to aggregate (count per doc, or distinct doc ids).
    *
    * Plan shape: the EVAL side is small by nature (benchmarks are
    * megabytes against a 100 TB corpus), so its distinct gram-hash set
    * broadcasts and the training corpus is filtered by a broadcast
    * LEFT SEMI join during its own scan — the corpus itself never
    * shuffles; only the matched grams (≈ the contamination, tiny) reach
    * the per-document aggregation. Gram generation is a staged-tokens
    * posexplode over an arithmetic sequence (no nested lambdas — the
    * O(n²) HOF trap), and documents shorter than n tokens are filtered
    * BEFORE the sequence so its bound can never go negative (Spark's
    * `sequence(1, -k)` silently generates a DESCENDING range). */
  def sharedNgrams(candidates: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_toks", tokens(col(textCol)))
      .filter(size(col("_toks")) >= n)
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(1), size(col("_toks")) - (n - 1)))
          .as(Seq("_p", "_i")))
      .select(col(idCol),
        md5(concat_ws(" ", slice(col("_toks"), col("_i"), lit(n))))
          .as("gram_h"))
    val evalSet = grams(evalDocs).select(col("gram_h")).distinct()
    grams(candidates)
      .join(broadcast(evalSet), Seq("gram_h"), "left_semi")
  }

  /** Sharded inverted-index build: `(tok, df, postings)` where `df` is
    * the EXACT document frequency and `postings` the first
    * `maxPostings` doc ids in ascending order — the bounded posting
    * list a retrieval layer actually serves (full lists for stopwords
    * are useless AND unbuildable). Tokens are lowercased with
    * non-ASCII-alpha characters stripped ("The," indexes as "the") so
    * token equality and sort order agree across engines (q68's
    * collation discipline).
    *
    * The 100 TB discipline is cap-BEFORE-collect (the
    * `blockedPairwiseTopK` / round-10 LSH pattern): `row_number` over
    * `(tok → id)` ranks postings pre-aggregation, and `collect_list`
    * only ever sees rank ≤ `maxPostings` rows (`when` feeds it null
    * past the cap, and collect_list drops nulls) — no aggregation
    * buffer ever holds a stopword's full posting list, while `count`
    * still sees every row for the exact df. One shuffle total: the
    * window's hash partitioning on `tok` is exactly the aggregation's
    * requirement, so the groupBy adds no exchange. */
  def invertedIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxPostings: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
        explode(array_distinct(transform(tokens(lower(trim(col(textCol)))),
          t => regexp_replace(t, "[^a-z]", "")))).as("tok"))
      .filter(col("tok") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col(idCol))
    toks
      .withColumn("_rn", row_number().over(w))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(
          when(col("_rn") <= maxPostings, col(idCol)))).as("postings"))
  }

  /** Bigram cross-entropy scoring with Jelinek–Mercer interpolation —
    * the LM-quality filter one order above [[unigramSurprisal]]: each
    * document scores the mean surprisal −ln p(tᵢ | tᵢ₋₁) where
    * p(w|u) = λ·c(u,w)/c(u,·) + (1−λ)·c(w)/N, all counts from the
    * corpus itself. Text that reuses the corpus's common transitions
    * (fluent prose) scores low; shuffled or boilerplate-joined text
    * scores high even when its unigrams are ordinary — which is
    * exactly what the bigram term adds. Documents under 2 tokens have
    * no transitions and drop out (filtered BEFORE the pair sequence,
    * the [[sharedNgrams]] negative-bound guard). Returns
    * `(id, n_bigrams, avg_surprisal)` rounded to 4.
    *
    * Plan shape at 100 TB: the bigram explosion is row-local
    * (element_at over one transform — 1-BASED indexing; `_toks[i]`
    * would be Spark's 0-based subscript and shift every pair); the
    * count tables are hash aggregations whose results are bounded by
    * vocabulary (unigrams ~Heaps-law, bigrams capped in practice by a
    * frequency floor) and BROADCAST back, so the corpus-side probe
    * pass never sort-merge-joins. */
  def bigramSurprisal(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, lambda: Double): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("_toks"))
    val uni = toks.select(explode(col("_toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val pairs = toks.filter(size(col("_toks")) >= 2)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(_toks) - 1),
          |  i -> struct(element_at(_toks, i) AS p,
          |              element_at(_toks, i + 1) AS c))""".stripMargin))
        .as("bg"))
      .select(col(idCol), col("bg.p").as("p"), col("bg.c").as("c"))
    val bi = pairs.groupBy(col("p"), col("c")).agg(count(lit(1)).as("cb"))
    val cctx = pairs.groupBy(col("p")).agg(count(lit(1)).as("cc"))
    pairs
      .join(broadcast(bi), Seq("p", "c"))
      .join(broadcast(cctx), Seq("p"))
      .join(broadcast(uni.withColumnRenamed("w", "c")), Seq("c"))
      .crossJoin(broadcast(uni.agg(sum(col("cu")).as("N"))))
      .withColumn("_surp", -log(
        lit(lambda) * col("cb") / col("cc") +
          lit(1 - lambda) * col("cu") / col("N")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("_surp")), 4).as("avg_surprisal"))
  }

  /** BM25 ranked retrieval (the Okapi/Lucene scoring form): score every
    * document containing at least one query term by
    * Σₜ idf(t) · tf·(k₁+1) / (tf + k₁·(1−b+b·|d|/avgdl)) with
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), and keep the `topK`
    * (ties broken by id ascending). Tokens are normalized like
    * [[invertedIndex]] (lowercase, non-alpha stripped) so term equality
    * is engine-portable; |d| counts the normalized non-empty tokens.
    *
    * Plan shape at 100 TB: term hits are row-local HOF counts inside
    * the corpus scan (no token explosion — `filter`/`size` over the
    * normalized array per query term); the corpus statistics the
    * formula needs are two broadcast-size tables (per-term df — |query|
    * rows; N + avgdl — ONE row), so the scoring pass is scan +
    * broadcast joins + TakeOrdered heaps. Every probability input is
    * an exact integer count, and the score rounds to 4 before the
    * top-k so cross-engine float noise (~1e-16 relative) sits far from
    * any rank boundary a 4-decimal lattice can express. */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val norm = filter(transform(tokens(lower(trim(col(textCol)))),
      t => regexp_replace(t, "[^a-z]", "")), t => t =!= "")
    val toks = df.select(col(idCol), norm.as("_toks"),
      size(norm).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("N"),
      avg(col("dl")).as("avgdl"))
    // exact df per query term, computed row-locally (array_contains in
    // the scan) — |terms| counters, no shuffle of the corpus
    val dfs = terms.map(t => sum(when(array_contains(col("_toks"), t), 1L)
      .otherwise(0L)).as(s"df_$t"))
    val termDf = toks.agg(dfs.head, dfs.tail: _*)
    val scored = toks
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(termDf))
      .withColumn("_score", terms.map { t =>
        val tf = size(filter(col("_toks"), x => x === t)).cast("double")
        val idf = log(lit(1.0) +
          (col("N") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
        idf * tf * (k1 + 1) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
      }.reduce(_ + _))
      .filter(col("_score") > 0)
    scored.select(col(idCol), round(col("_score"), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** BPE merge-pair statistics — the first step of byte-pair-encoding
    * tokenizer training: count every adjacent character pair weighted
    * by how often its word occurs, and keep the `topK` candidates
    * (ties broken by pair ascending, so the result is deterministic).
    * The highest-frequency pair is exactly what BPE's first merge
    * would fuse.
    *
    * Scale shape: the corpus collapses to the word-frequency table
    * FIRST (one hash aggregation, output bounded by the vocabulary,
    * which grows ~log of corpus size — Heaps' law), and the character-
    * pair explosion runs over VOCAB rows with a `sum(weight)`
    * aggregation, never over the corpus. At 100 TB that is the
    * difference between exploding ~10^6 vocab entries and exploding
    * ~10^13 running words. Words shorter than 2 chars are filtered
    * BEFORE the index sequence so its bound can never go negative
    * (Spark's `sequence(1, 0)` silently generates a DESCENDING
    * range — the [[sharedNgrams]] guard). */
  /** Deterministic weight table for the hashed-n-gram linear scorer:
    * splitmix64-mixed integers in [-500, 500] (milli-unit weights, so
    * every score is EXACT integer arithmetic — the practice of shipping
    * a quantized model). Same generator discipline as
    * [[Similarity.hyperplanes]]: reproducible everywhere, no seed
    * shipping, and small enough (D entries) to embed as literals in
    * both the Spark plan and the DuckDB oracle. */
  def scorerWeights(d: Int = 1024): Array[Int] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.tabulate(d)(j => (((mix(j.toLong) % 1001) + 1001) % 1001 - 500).toInt)
  }

  /** Hashed-n-gram linear quality scorer (the fastText shape: grams →
    * hash-bucketed embedding/weight lookup → linear score): grams are
    * word unigrams + bigrams, the bucket is the first 8 md5 hex chars
    * mod D (md5 so the oracle can replay the hash — xxhash64 has no
    * DuckDB twin), and the logit is the SUM of the bucket weights —
    * one `aggregate` fold, entirely row-local: no shuffle anywhere
    * before a score filter, which is the whole point of model-based
    * filtering at 100 TB (score-and-drop inside the scan, pay the
    * shuffle only for survivors). The sigmoid is monotone, so
    * thresholding the logit IS thresholding the probability; keeping
    * the logit integral keeps the compare exact. Returns (grams count,
    * logit) columns for a bound `toks` array column. */
  /** The uni+bigram gram array for a bound tokens column — BIND THIS to
    * a column before scoring: [[hashedNgramLogit]] and the gram count
    * both consume it, and an inlined builder would run the gram
    * construction once per consumer (the [[Dedup.shingleSet]] lesson —
    * measured ~2× on the q133 bench). */
  def ngramGrams(toksColName: String): org.apache.spark.sql.Column =
    expr(s"""concat($toksColName,
      CASE WHEN size($toksColName) >= 2
        THEN transform(sequence(1, size($toksColName) - 1),
          i -> concat(element_at($toksColName, i), ' ',
                      element_at($toksColName, i + 1)))
        ELSE array() END)""")

  /** The scorer fold proper. md5 is the hash ONLY because the oracle
    * must replay it (DuckDB has no xxhash64); a production deployment
    * swaps `conv(substring(md5(g),1,8),16,10)` for `xxhash64(g)` —
    * same plan, same bucket distribution class, roughly an order of
    * magnitude less per-gram hash cost — without touching anything
    * else here. */
  def hashedNgramLogit(gramsColName: String,
      weights: Array[Int]): org.apache.spark.sql.Column = {
    val d = weights.length
    expr(s"""aggregate($gramsColName, 0L, (acc, g) ->
      acc + element_at(array(${weights.mkString(",")}),
        cast(pmod(cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint),
                  $d) as int) + 1))""")
  }

  /** Full BPE training loop on top of [[bpePairStats]]'s shape: starting
    * from characters, repeat `nMerges` times — count adjacent symbol
    * pairs weighted by word frequency, take the argmax (ties broken by
    * (a, b) ascending, deterministic), fuse that pair greedily
    * left-to-right in every word. Returns the merge table
    * (step, a, b, freq) — a tokenizer IS its ordered merge list.
    *
    * Scale shape (the q121 argument, iterated): every round is ONE
    * explode+sum aggregation over the VOCABULARY table (bounded, Heaps'
    * law) — the corpus is collapsed to word frequencies before the loop
    * and never touched again. The driver holds only the merge list
    * (nMerges rows) and coordinates the per-round argmax — a bounded
    * 1-row collect per round, the k-means-iteration discipline, NOT a
    * data collect. The merge itself is a codegen'd `aggregate` fold
    * (greedy left-to-right, exactly the reference tokenizer semantics:
    * "aaa" + (a,a) → ["aa","a"]), so each round's plan is map-only over
    * vocab rows plus the one pair aggregation. */
  def bpeTrain(words: org.apache.spark.sql.DataFrame,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    val spark = words.sparkSession
    var cur = words.withColumn("sym",
      expr("filter(split(w, ''), s -> s <> '')"))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = cur.filter(size(col("sym")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(sym) - 1), " +
            "i -> struct(element_at(sym, i) AS a, element_at(sym, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, f))
        cur = cur.withColumn("sym", mergeFold("sym", a, b))
        step += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "a", "b", "freq")
  }

  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Greedy left-to-right fusion of adjacent pair (a, b) into ab over a
    * symbol array — the BPE apply step as a codegen'd fold: the
    * accumulator's LAST symbol decides, so an element just produced by
    * a merge participates as the fused symbol, never as its halves. */
  private def mergeFold(c: String, a: String, b: String)
      : org.apache.spark.sql.Column = {
    val (al, bl, ab) = (sqlStr(a), sqlStr(b), sqlStr(a + b))
    expr(s"""aggregate($c, cast(array() as array<string>), (acc, s) ->
      CASE WHEN size(acc) > 0 AND element_at(acc, -1) = $al AND s = $bl
           THEN concat(slice(acc, 1, size(acc) - 1), array($ab))
           ELSE concat(acc, array(s)) END)""")
  }

  /** Tokenizer APPLICATION: piece count per document after running an
    * ordered merge list over every word — the inference half of
    * [[bpeTrain]] (training emits the merge list once; encoding runs
    * over the corpus forever, so THIS is the hot path). Entirely
    * row-local: per word, characters fold through one codegen'd greedy
    * merge pass per learned merge (the same [[mergeFold]] semantics,
    * composed — merge i's output array is merge i+1's input), and the
    * per-word piece counts sum per document. No UDF, no shuffle — at
    * 100 TB tokenization is a map-only pass whose cost is the fold
    * chain, paid inside the scan. Lambda variables are uniquified per
    * level (`accN`/`sN`) because the merges nest inside the per-word
    * `transform` lambda. */
  def bpePieceCount(wordsColName: String,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val chars = "filter(split(wv, ''), c0 -> c0 <> '')"
    val folded = merges.zipWithIndex.foldLeft(chars) {
      case (inner, ((a, b), i)) =>
        s"""aggregate($inner, cast(array() as array<string>),
          (acc$i, s$i) ->
            CASE WHEN size(acc$i) > 0
                  AND element_at(acc$i, -1) = ${sqlStr(a)}
                  AND s$i = ${sqlStr(b)}
                 THEN concat(slice(acc$i, 1, size(acc$i) - 1),
                             array(${sqlStr(a + b)}))
                 ELSE concat(acc$i, array(s$i)) END)"""
    }
    // A merge (a, b) can only fire on a word whose ORIGINAL text
    // contains a+b as a substring (symbols are contiguous chunks of the
    // word, so adjacent symbols concatenate to a contiguous substring).
    // One word-level guard over ALL pairs skips the O(|word|²)
    // accumulate chain for the overwhelming majority of corpus words —
    // a word touching no pair is exactly its character count (measured
    // 28 s → ~3 s at sf0.1, local[4]). A single guard (not per level)
    // keeps the fold chain appearing ONCE in the expression tree.
    val anyPair = merges.map { case (a, b) =>
      s"instr(wv, ${sqlStr(a + b)}) > 0"
    }.distinct.mkString(" OR ")
    expr(s"""aggregate(
      transform($wordsColName, wv ->
        CASE WHEN $anyPair THEN size($folded)
             ELSE length(wv) END),
      0L, (pa, px) -> pa + px)""")
  }

  /** Sequential reference BPE trainer over an in-memory word-frequency
    * list — an INDEPENDENT implementation (plain Scala collections, no
    * Spark) that [[bpeTrain]] is differentially tested against (the
    * [[Similarity.dotHof]] discipline) and that generates the q131
    * oracle's expected merge table for the planted corpus. */
  def bpeTrainRef(words: Seq[(String, Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    def fuse(v: Vector[String], a: String, b: String): Vector[String] =
      v.foldLeft(Vector.empty[String])((acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s)
    var syms = words.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var continue = true
    while (step <= nMerges && continue) {
      val pairs = syms.flatMap { case (v, c) =>
        v.zip(v.drop(1)).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) continue = false
      else {
        val ((a, b), f) = pairs.minBy { case ((a, b), f) => (-f, a, b) }
        out += ((step, a, b, f))
        syms = syms.map { case (v, c) => (fuse(v, a, b), c) }
        step += 1
      }
    }
    out.toSeq
  }

  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val wordCounts = df
      .select(explode(tokens(lower(trim(col(textCol))))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    wordCounts
      .filter(length(col("w")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(topK)
  }
}
