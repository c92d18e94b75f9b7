package graft.engine

import org.apache.spark.sql.functions._

/** CORRECTNESS queries for the text-analysis family over `documents`.
  * Every metric is replicated verbatim in the DuckDB oracle (regex kept
  * to the RE2 ∩ java.util.regex subset; ratios rounded before any
  * comparison so both engines band identically). */
object TextQueries {
  import Tables.table
  import TextAnalysis._

  /** KMV sketch size for q175/q177/q181 (k in the (k-1)/K(k)
    * estimator). `KmvSize` is the cross-module name (q181 streams the
    * same sketches from StreamingQueries). */
  private val KmvK = 256
  private[engine] def KmvSize: Int = KmvK

  /** Per-language distinct 8-gram shingle points of a documents batch —
    * the sketch input shared by q177 (batch drops) and q181 (streamed
    * drops): one definition so the two incremental paths cannot
    * diverge from each other or from the oracle lattice. */
  private[engine] def kmvPoints(
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    b.select(col("lang").as("g"),
      split(trim(col("text")), "\\s+").as("w"))
      .select(col("g"), explode(Dedup.shingleSet("w", 8)).as("shx"))
      .select(col("g"), Kmv.point(col("shx")).as("h"))

  /** The per-language estimate frame over a merged sketch — q177/q181's
    * shared output shape (lang, kth_hash, est_distinct_shingles). */
  private[engine] def kmvEstimates(
      sk: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sk.groupBy("g")
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(col("g").as("lang"), col("kth").as("kth_hash"),
        Kmv.estimate(col("n"), col("kth"), KmvK)
          .as("est_distinct_shingles"))
      .orderBy("lang")

  /** q177's oracle text, shared verbatim with q181: the one-shot
    * full-corpus computation both incremental paths must equal. */
  private[engine] def q177OracleSql: String =
    s"""WITH ${kmvSketchSql("lang")}
      |SELECT g AS lang, kth AS kth_hash,
      |       ${kmvEstSql("n", "kth")} AS est_distinct_shingles
      |FROM ga ORDER BY lang""".stripMargin

  /** Shared KMV oracle prefix (ONE definition for q175 and q177, the
    * latticeSql discipline): 8-gram shingles of `documents` grouped by
    * `groupExpr`, distinct 60-bit md5 points, bottom-k per group, and
    * the per-group (n, kth) frame `ga` the estimator reads. Mirrors
    * [[Kmv.point]]/[[Kmv.sketch]] exactly. */
  private def kmvSketchSql(groupExpr: String): String =
    s"""d AS (
       |  SELECT $groupExpr AS g0,
       |         regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents),
       |sh0 AS (
       |  SELECT g0 AS g,
       |         CASE WHEN len(toks) >= 8
       |              THEN array_to_string(toks[u.i+1:u.i+8], ' ')
       |              ELSE array_to_string(toks, ' ') END AS sh
       |  FROM d, UNNEST(range(0, greatest(len(toks)-7, 1))) AS u(i)),
       |p AS (
       |  SELECT DISTINCT g,
       |         CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h
       |  FROM sh0),
       |sk AS (SELECT g, h FROM p
       |       QUALIFY row_number() OVER (PARTITION BY g ORDER BY h)
       |               <= $KmvK),
       |ga AS (SELECT g, count(*) AS n, max(h) AS kth FROM sk GROUP BY g)"""
      .stripMargin

  /** The KMV estimator as SQL — [[Kmv.estimate]]'s arithmetic verbatim
    * (exact below k, else (k−1)·2^60/kth in IEEE double). */
  private def kmvEstSql(n: String, kth: String): String =
    s"""CASE WHEN $n < $KmvK THEN $n
       |            ELSE CAST(round(${KmvK - 1}.0 * ${Kmv.HashSpace}
       |                            / CAST($kth AS DOUBLE)) AS BIGINT)
       |       END""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q35_text_stats",
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         regexp_split_to_array(trim(text), '\\s+') AS toks,
         |         length(text) AS n_chars,
         |         len(regexp_extract_all(lower(text), '$EnStops')) AS hits
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |         len(toks) AS n_tokens, n_chars,
         |         round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS diversity,
         |         round(hits * 1.0 / len(toks), 4) AS stop_ratio
         |  FROM t)
         |SELECT *,
         |       CASE WHEN n_tokens BETWEEN 30 AND 90
         |                 AND diversity >= 0.25 AND stop_ratio <= 0.3 THEN 'good'
         |            WHEN n_tokens >= 15 THEN 'fair'
         |            ELSE 'low' END AS quality
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Per-document quality scoring: length, lexical diversity, stopword
      // density → band. Pure row-local expressions — zero shuffles, scales
      // with the scan.
      val toks = tokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          round(size(array_distinct(toks)).cast("double") / size(toks), 4)
            .as("diversity"),
          round(stopHits(col("text"), EnStops).cast("double") / size(toks), 4)
            .as("stop_ratio"))
        .withColumn("quality",
          qualityBand(col("n_tokens"), col("diversity"), col("stop_ratio")))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q36_lang_id",
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |         len(regexp_extract_all(lower(text), '$EnStops')) AS en_hits,
         |         len(regexp_extract_all(lower(text), '$DeStops')) AS de_hits,
         |         len(regexp_extract_all(lower(text), '$EsStops')) AS es_hits,
         |         len(regexp_extract_all(lower(text), '$FrStops')) AS fr_hits,
         |         len(regexp_extract_all(text, '$CjkChars')) AS cjk_hits
         |  FROM documents)
         |SELECT doc_id, lang,
         |       CASE WHEN cjk_hits > 0 THEN 'zh'
         |            WHEN en_hits >= de_hits AND en_hits >= es_hits
         |                 AND en_hits >= fr_hits THEN 'en'
         |            WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
         |            WHEN es_hits >= fr_hits THEN 'es'
         |            ELSE 'fr' END AS predicted,
         |       en_hits, de_hits, es_hits, fr_hits
         |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Stopword-profile language ID (n-gram-heuristic family). The
      // heuristic itself is the operator under test — Spark and DuckDB
      // must agree row-for-row on hits and the argmax tie order.
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          langId(col("text")).as("predicted"),
          stopHits(col("text"), EnStops).as("en_hits"),
          stopHits(col("text"), DeStops).as("de_hits"),
          stopHits(col("text"), EsStops).as("es_hits"),
          stopHits(col("text"), FrStops).as("fr_hits"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q37_word_topk",
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |  FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY n DESC, word
        |LIMIT 20""".stripMargin) { (s, dir) =>
      // Corpus word frequency top-k: explode → hash agg (partial-agg
      // friendly, one shuffle on word) → TakeOrdered. Total order via
      // (n DESC, word) so ties can't flip the hash compare.
      table(s, dir, "documents")
        .select(explode(tokens(lower(col("text")))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    QuerySpec(
      "q38_fingerprint",
      """SELECT doc_id,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |       len(regexp_split_to_array(trim(text), '\s+'))
        |         + len(regexp_extract_all(text, '[a-zA-Z][0-9_]|[0-9_][a-zA-Z]'))
        |         AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Content fingerprinting (dedup key) + BPE-ish piece counting. md5
      // over normalized text is engine-portable, unlike xxhash64.
      table(s, dir, "documents")
        .select(col("doc_id"),
          fingerprint(col("text")).as("fp"),
          tokenCountBpeIsh(col("text")).as("n_pieces"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q57_quality_quantile_filter",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         round(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 1.0
        |               / len(regexp_split_to_array(trim(text), '\s+')), 4) AS diversity
        |  FROM documents),
        |thr AS (SELECT round(quantile_cont(diversity, 0.25), 6) AS thr FROM r)
        |SELECT r.doc_id, r.lang, r.diversity
        |FROM r, thr
        |WHERE r.diversity >= thr.thr
        |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
      // Corpus-relative quality gate ([[TextAnalysis.quantileThresholdFilter]]):
      // drop the worst quartile by lexical diversity. The threshold is a
      // single-row aggregate broadcast back over the corpus — the
      // documents themselves are never shuffled.
      val toks = tokens(col("text"))
      val scored = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          round(size(array_distinct(toks)).cast("double") / size(toks), 4)
            .as("diversity"))
      quantileThresholdFilter(scored, "diversity", 0.25)
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q68_array_hofs",
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |         AS n_tokens,
        |       CAST(len(list_filter(
        |              list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')),
        |              w -> regexp_full_match(w, '[a-z]+'))) AS BIGINT)
        |         AS n_uniq_alpha,
        |       array_to_string(
        |         list_sort(list_filter(
        |           list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')),
        |           w -> regexp_full_match(w, '[a-z]+')))[1:5], ',')
        |         AS first5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Array higher-order functions — split/distinct/lambda-filter/sort/
      // slice/join composed per row, ZERO shuffles and no UDF: every HOF
      // is a codegen'd expression, so the whole projection rides one
      // whole-stage-codegen span over the scan. The lambda keeps only
      // all-ASCII-alpha words so Spark's and DuckDB's binary string sort
      // orders agree on every language slice of the corpus (collation on
      // non-ASCII would otherwise be engine-specific).
      val uniqAlpha = org.apache.spark.sql.functions.filter(
        array_distinct(split(lower(trim(col("text"))), "\\s+")),
        w => w.rlike("^[a-z]+$"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          size(uniqAlpha).cast("long").as("n_uniq_alpha"),
          array_join(slice(array_sort(uniqAlpha), 1, 5), ",").as("first5"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q73_winnowing",
      """WITH d AS (
        |  SELECT doc_id,
        |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         [substring(norm, i, 8) FOR i IN range(1, length(norm) - 6)]
        |           AS grams,
        |         length(norm) AS n
        |  FROM d WHERE length(norm) >= 16),
        |f AS (
        |  SELECT doc_id,
        |         list_distinct([list_min(grams[j:j+3])
        |                        FOR j IN range(1, n - 9)]) AS fps
        |  FROM g)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |       array_to_string(list_sort(fps)[1:3], '|') AS first3
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Winnowing fingerprints ([[TextAnalysis.winnowStaged]], k=8-char
      // grams, w=4 windows): both engines take window minima by binary
      // string order, so the fingerprint SETS compare exactly —
      // summarized as (count, 3 smallest) for a bounded result. DuckDB's
      // range(1, x) is exclusive: x = n-6 gives grams 1..n-7 and
      // x = n-9 gives windows 1..n-10, matching Spark's inclusive
      // sequence(1, n-7) / sequence(1, n-10). The documents table is a
      // single parquet file (one task); the per-row work is the heaviest
      // in the suite, so spread it across cores first — at cluster scale
      // the same round-robin repartition turns one hot scan task into a
      // balanced, shuffle-once fan-out.
      TextAnalysis.winnowStaged(
          table(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism)
            .filter(length(TextAnalysis.normText(col("text"))) >= 16),
          col("text"), k = 8, w = 4, out = "fps")
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_join(slice(array_sort(col("fps")), 1, 3), "|").as("first3"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q80_tfidf",
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                            t -> regexp_full_match(t, '[a-z]+'))) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      // Corpus-wide TF-IDF, top-3 terms/doc ([[TextAnalysis.tfIdfTopK]]).
      TextAnalysis.tfIdfTopK(table(s, dir, "documents"), k = 3)
        .orderBy(col("doc_id"), col("term"))
    },

    QuerySpec(
      "q81_repetition",
      """WITH w AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(trim(text)), '\s+') AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         [array_to_string(words[i:i+2], ' ')
        |          FOR i IN range(1, len(words) - 1)] AS grams
        |  FROM w WHERE len(words) >= 3)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |             / len(grams), 6) AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Gopher/C4-family repetition quality rule: duplicate word-trigram
      // fraction per doc ([[TextAnalysis.duplicateGramRatio]]). DuckDB's
      // range(1, x) is exclusive and words[i:i+2] is a 1-based inclusive
      // 3-slice, matching Spark's sequence(1, size-2)/slice(words, i, 3).
      TextAnalysis.duplicateGramRatio(
          table(s, dir, "documents"), n = 3, out = "dup_ratio")
        .select(col("doc_id"), col("n_grams"), col("dup_ratio"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q82_stratified_sample",
      """WITH h AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM h
        |WHERE bucket < CASE source WHEN 'src0' THEN 50
        |                           WHEN 'src1' THEN 20 ELSE 10 END
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Deterministic stratified sample ([[Sampling.stratifiedSample]]):
      // membership is a pure function of content (md5 bucket), so the
      // oracle re-derives the EXACT same set — count + id-sum per
      // stratum hash-verify it without dumping rows.
      Sampling.stratifiedSample(table(s, dir, "documents"), "source",
          Map("src0" -> 50, "src1" -> 20), defaultPct = 10)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_doc_id"))
        .orderBy(col("source"))
    },

    QuerySpec(
      "q91_chunking",
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest([{'idx': (i - 1) // 30,
        |                  'chunk': array_to_string(words[i:i+39], ' ')}
        |                 FOR i IN range(1, len(words) + 1, 30)]) AS u
        |  FROM w)
        |SELECT doc_id, CAST(u.idx AS BIGINT) AS chunk_idx,
        |       CAST(len(string_split_regex(u.chunk, '\s+')) AS BIGINT)
        |         AS n_tokens,
        |       md5(u.chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      // RAG-style document chunking: overlapping windows of ≤40 tokens
      // at stride 30 (10-token overlap so no boundary sentence is lost
      // to retrieval). Staged words projection, then a row-local
      // posexplode over the arithmetic start sequence — output row count
      // is Σ ceil(n/30), linear in the corpus, no shuffle before the
      // final order. Chunks are md5-summarized so the compare stays
      // byte-exact without dumping text.
      val words = col("__ck_words")
      table(s, dir, "documents")
        .withColumn("__ck_words", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), words.as("words"),
          posexplode(sequence(lit(1), size(words), lit(30)))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx").cast("long"),
          size(slice(col("words"), col("start"), lit(40))).cast("long")
            .as("n_tokens"),
          md5(concat_ws(" ", slice(col("words"), col("start"), lit(40))))
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    QuerySpec(
      "q92_redact",
      """WITH planted AS (
        |  SELECT doc_id,
        |         text || ' contact: user' || doc_id ||
        |         '@example.com or 555-123-4567 at 10.0.0.' ||
        |         (doc_id % 256) AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |      AS red,
        |    text
        |  FROM planted)
        |SELECT doc_id, md5(red) AS redacted_md5,
        |       CAST(len(regexp_extract_all(red, '<EMAIL>')) AS BIGINT)
        |         AS n_email,
        |       CAST(len(regexp_extract_all(red, '<PHONE>')) AS BIGINT)
        |         AS n_phone,
        |       CAST(len(regexp_extract_all(red, '<IP>')) AS BIGINT) AS n_ip
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // PII redaction (emails, phone numbers, IPv4) — the scrub pass
      // every pre-training corpus makes. PII is PLANTED deterministically
      // (the synthetic corpus has none) so both engines scrub the same
      // bytes; patterns stay in the RE2 ∩ java.util.regex subset and the
      // scrubbed text is md5-compared byte-exact, with per-kind counts.
      // Row-local regex chain — scales with the scan.
      val planted = concat(col("text"), lit(" contact: user"), col("doc_id"),
        lit("@example.com or 555-123-4567 at 10.0.0."),
        pmod(col("doc_id"), lit(256)))
      val red =
        regexp_replace(
          regexp_replace(
            regexp_replace(planted,
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
          "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
      table(s, dir, "documents")
        .withColumn("__red", red)
        .select(col("doc_id"), md5(col("__red")).as("redacted_md5"),
          regexp_count(col("__red"), lit("<EMAIL>")).cast("long").as("n_email"),
          regexp_count(col("__red"), lit("<PHONE>")).cast("long").as("n_phone"),
          regexp_count(col("__red"), lit("<IP>")).cast("long").as("n_ip"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q83_split_assign",
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Content-hash train/val/test split ([[Sampling.assignSplit]],
      // 80/10/10): growing the corpus never moves an existing doc
      // between splits — the contamination-safety property. Verified by
      // per-split count + id-sum.
      Sampling.assignSplit(table(s, dir, "documents"), trainPct = 80,
          valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_doc_id"))
        .orderBy(col("split"))
    },

    QuerySpec(
      "q111_weighted_sample",
      """WITH w AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |           AS weight,
        |         (('0x' || substr(md5(text), 1, 13))::BIGINT + 0.5)
        |           / 4503599627370496.0 AS u
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, weight FROM w
        |  ORDER BY ln(u) / weight DESC, doc_id LIMIT 25)
        |SELECT doc_id, weight FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Weighted sample without replacement ([[Sampling.weightedSample]],
      // Efraimidis–Spirakis A-ES priority keys): 25 documents biased by
      // token count, drawn deterministically from content hash — the
      // quality-weighted subset draw a curation pipeline uses where
      // uniform sampling would waste the budget on short docs. The
      // oracle replays the draw end-to-end: u is exact 52-bit integer
      // arithmetic in both engines, and key gaps between distinct draws
      // (~1e-3 at this corpus size) dwarf any libm ln() ulp skew, so
      // the selected SET — not just its size — hash-matches. Row-local
      // key + TakeOrderedAndProject (plan-gated): per-partition heaps,
      // the corpus never shuffles.
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          tokenCount(col("text")).as("weight"))
      Sampling.weightedSample(d, col("weight"), k = 25, idCol = "doc_id")
        .select(col("doc_id"), col("weight"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q129_weighted_sample_per_group",
      """WITH w AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |           AS weight,
        |         (('0x' || substr(md5(text), 1, 13))::BIGINT + 0.5)
        |           / 4503599627370496.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, weight,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY ln(u) / weight DESC, doc_id)
        |           AS rn
        |  FROM w)
        |SELECT lang, doc_id, weight FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      // Per-stratum weighted draw ([[Sampling.weightedSamplePerGroup]],
      // A-ES keys): the best 5 token-count-weighted docs PER LANGUAGE —
      // q111's draw applied within strata, the shape a multilingual
      // curation budget actually uses (a global draw would hand the
      // whole budget to the majority language). Same exact 52-bit u,
      // same key-gap-vs-ulp argument as q111, per-group rank truncation
      // instead of a global heap; the oracle replays the draw
      // bit-for-bit.
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          tokenCount(col("text")).as("weight"))
      Sampling.weightedSamplePerGroup(d, "lang", col("weight"), k = 5,
        idCol = "doc_id")
        .select(col("lang"), col("doc_id"), col("weight"))
        .orderBy(col("lang"), col("doc_id"))
    },

    QuerySpec(
      "q112_segment_dedup",
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN '. subscribe to our newsletter for daily updates'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '. all rights reserved by the site publisher'
        |         ELSE '' END AS text
        |  FROM documents),
        |segs0 AS (
        |  SELECT doc_id,
        |         unnest([{'i': i - 1, 'seg': trim(parts[i])}
        |                 FOR i IN range(1, len(parts) + 1)]) AS u
        |  FROM (SELECT doc_id, string_split(text, '.') AS parts
        |        FROM planted)),
        |segs AS (
        |  SELECT doc_id, u.i AS seg_idx, u.seg AS seg, md5(u.seg) AS h
        |  FROM segs0 WHERE u.seg <> ''),
        |boiler AS (
        |  SELECT h FROM segs GROUP BY h
        |  HAVING count(DISTINCT doc_id) >= 3),
        |flagged AS (
        |  SELECT s.doc_id, s.seg_idx, s.seg, (b.h IS NOT NULL) AS dup
        |  FROM segs s LEFT JOIN boiler b ON s.h = b.h)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_segs,
        |       CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_removed,
        |       md5(coalesce(
        |         string_agg(seg, '. ' ORDER BY seg_idx)
        |           FILTER (WHERE NOT dup), '')) AS clean_md5
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Boilerplate segment removal ([[TextAnalysis.segmentDedup]] — the
      // C4/CCNet/RefinedWeb cleaning pass): sentences occurring verbatim
      // in ≥ 3 distinct documents are boilerplate; every document is
      // rebuilt from its surviving sentences. The synthetic corpus has
      // no cross-document sentences, so two boilerplate tails (a
      // newsletter prompt on even ids, a rights notice on ids % 3) are
      // PLANTED deterministically — the operator must strip exactly
      // those and keep every organic sentence byte-identical (rebuilt
      // text md5-compared). Plan: one hash agg on segment hash, the
      // (by-definition small) boilerplate set broadcast back, one
      // reassembly agg — the corpus never sort-merge-joins.
      val planted = table(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit(". subscribe to our newsletter for daily updates"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit(". all rights reserved by the site publisher"))
            .otherwise(lit(""))))
      TextAnalysis.segmentDedup(planted, "doc_id", col("text"), minDocs = 3)
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q113_decontaminate",
      """WITH eval AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |train AS (
        |  SELECT t.doc_id,
        |         CASE WHEN t.doc_id % 50 = 13
        |              THEN t.text || ' ' || coalesce(e.snip, '')
        |              ELSE t.text END AS text
        |  FROM documents t
        |  LEFT JOIN (SELECT doc_id,
        |               array_to_string(
        |                 string_split_regex(trim(text), '\s+')[1:13], ' ')
        |                 AS snip
        |             FROM eval) e
        |    ON e.doc_id = 97 * (t.doc_id % 5)
        |  WHERE t.doc_id % 97 <> 0),
        |eg AS (
        |  SELECT DISTINCT
        |         unnest([md5(array_to_string(toks[i:i+12], ' '))
        |                 FOR i IN range(1, len(toks) - 11)]) AS gram_h
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |        FROM eval)
        |  WHERE len(toks) >= 13),
        |tg AS (
        |  SELECT doc_id,
        |         unnest([md5(array_to_string(toks[i:i+12], ' '))
        |                 FOR i IN range(1, len(toks) - 11)]) AS gram_h
        |  FROM (SELECT doc_id,
        |               string_split_regex(trim(text), '\s+') AS toks
        |        FROM train)
        |  WHERE len(toks) >= 13)
        |SELECT t.doc_id, CAST(count(DISTINCT t.gram_h) AS BIGINT) AS n_shared
        |FROM tg t JOIN eg USING (gram_h)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      // Benchmark decontamination ([[TextAnalysis.sharedNgrams]], the
      // GPT-3 appendix-C discipline): training documents sharing any
      // 13-gram with the held-out eval slice (ids % 97) leak eval
      // content and must be caught before training. Contamination is
      // PLANTED: every 50th training doc gets an eval doc's opening
      // 13 tokens appended, so the expected flag set is exactly those
      // docs with n_shared = 1 — anything more is an organic collision
      // the operator must also surface. Plan: the eval gram set is tiny
      // (benchmarks vs corpus), broadcast LEFT SEMI during the corpus
      // scan — only matched grams (≈ the contamination) ever shuffle.
      val docs = table(s, dir, "documents")
      val evalDocs = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val snip = evalDocs.select(col("doc_id").as("_pick"),
        array_join(slice(tokens(col("text")), 1, 13), " ").as("_snip"))
      val train = docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("_pick", lit(97) * (col("doc_id") % 5))
        .join(broadcast(snip), Seq("_pick"), "left")
        .withColumn("text",
          when(col("doc_id") % 50 === 13,
            concat(col("text"), lit(" "), coalesce(col("_snip"), lit(""))))
            .otherwise(col("text")))
        .select(col("doc_id"), col("text"))
      TextAnalysis.sharedNgrams(train, evalDocs, "doc_id", "text", n = 13)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram_h")).as("n_shared"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q114_source_mix",
      """WITH stats AS (
        |  SELECT source, count(*) AS n_s,
        |         CAST(substr(source, 4) AS INT) % 3 + 1 AS w
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(w) AS BIGINT) AS sum_w,
        |         CAST(sum(n_s) AS BIGINT) AS n_tot
        |  FROM stats),
        |quotas AS (
        |  SELECT source, n_s,
        |         least(n_s, floor(floor(n_tot * 0.2) * w / sum_w)) AS quota
        |  FROM stats, tot),
        |surv AS (
        |  SELECT d.doc_id, d.source, q.quota,
        |         (('0x' || substr(md5(d.text), 1, 8))::BIGINT)
        |           / 4294967296.0 AS u
        |  FROM documents d JOIN quotas q USING (source)
        |  WHERE (('0x' || substr(md5(d.text), 1, 8))::BIGINT)
        |          / 4294967296.0
        |        < (4.0 * q.quota + 64.0) / q.n_s),
        |ranked AS (
        |  SELECT doc_id, source, quota,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY u, doc_id) AS BIGINT)
        |           AS rank
        |  FROM surv)
        |SELECT doc_id, source, rank FROM ranked
        |WHERE rank <= quota ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Target-mixture rebalancing ([[Sampling.proportionalMix]], the
      // Pile/Dolma recipe): draw 20% of the corpus with per-source
      // quotas ∝ a source weight (here hashed from the source name),
      // selected by content-hash rank so the mixture is deterministic
      // and layout-independent. The 4×+64 Chernoff prefilter keeps the
      // exact per-source rank from ever sorting a full source — both
      // engines replay the same two-phase spec, so the drawn SET
      // hash-matches. One tiny stats agg broadcast back; the corpus is
      // scanned once, and only prefilter survivors (~4× the budget)
      // shuffle into the rank.
      Sampling.proportionalMix(
        table(s, dir, "documents"), "source",
        expr("cast(substring(source, 4, 10) as int) % 3 + 1"),
        budgetFrac = 0.2, idCol = "doc_id")
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q115_unigram_surprisal",
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY tok
        |  ORDER BY c DESC, tok LIMIT 50000)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(avg(-ln(coalesce(v.c, 0.5) / tot.n)), 4)
        |         AS avg_surprisal
        |FROM toks t LEFT JOIN vocab v USING (tok), tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      // Unigram cross-entropy scoring ([[TextAnalysis.unigramSurprisal]],
      // the CCNet LM-filter's unigram form): mean −ln p(token) under the
      // corpus's own top-50k unigram distribution, OOV floored at
      // 0.5/N. Both engines compute p from exact integer counts and the
      // same libm-adjacent ln; the mean is rounded to 4 so summation
      // order can't flip the hash. Plan: vocab is TakeOrdered-bounded
      // and broadcasts; the corpus-side pass is broadcast-join +
      // per-doc agg — no corpus sort-merge anywhere (plan-gated).
      TextAnalysis.unigramSurprisal(
        table(s, dir, "documents"), "doc_id", "text", vocabSize = 50000)
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q116_sequence_pack",
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |              AS BIGINT) AS n_toks,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, h % 8 AS shard, n_toks,
        |         sum(n_toks) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
        |                           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |       CAST(floor((cum - n_toks) / 2048.0) AS BIGINT) AS bin,
        |       n_toks
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Sequence packing ([[TextAnalysis.packSequences]]): documents
      // sharded by content hash and greedily packed into 2048-token
      // training bins by running offset — the context-assembly step
      // between curation and tokenization. Content-keyed order makes
      // the packing reproducible across layouts and engines; the only
      // shuffle is the per-shard running sum, and shards scale the sort
      // (at 100 TB, shards ≈ partition count ⇒ ~GB-sized sorts).
      TextAnalysis.packSequences(
        table(s, dir, "documents"), "doc_id", "text",
        budget = 2048, shards = 8)
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q118_inverted_index",
      """WITH x AS (
        |  SELECT doc_id,
        |         regexp_replace(
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')),
        |           '[^a-z]', '', 'g') AS tok
        |  FROM documents),
        |t AS (SELECT DISTINCT doc_id, tok FROM x WHERE tok <> ''),
        |r AS (SELECT doc_id, tok,
        |             row_number() OVER (PARTITION BY tok ORDER BY doc_id)
        |               AS rn
        |      FROM t)
        |SELECT tok, CAST(count(*) AS BIGINT) AS df,
        |       array_to_string(
        |         list_sort(list(doc_id) FILTER (WHERE rn <= 32)), ',')
        |         AS postings
        |FROM r GROUP BY tok ORDER BY tok""".stripMargin) { (s, dir) =>
      // Inverted-index build ([[TextAnalysis.invertedIndex]]): exact
      // document frequency + the first 32 postings per token, capped
      // BEFORE the collect aggregation (row_number feeds collect_list
      // null past the cap) so no buffer ever materializes a stopword's
      // full posting list — the discipline that survives 100 TB, where
      // "the" would otherwise be a multi-GB single aggregation state.
      // Postings serialize as a comma-joined sorted string (the q68
      // list-compare pattern). One shuffle total: the ranking window's
      // hash partitioning on tok is exactly what the groupBy needs
      // (plan-gated in TextSpec).
      TextAnalysis.invertedIndex(
        table(s, dir, "documents"), "doc_id", "text", maxPostings = 32)
        .select(col("tok"), col("df"),
          array_join(transform(col("postings"), _.cast("string")), ",")
            .as("postings"))
        .orderBy(col("tok"))
    },

    QuerySpec(
      "q172_incremental_index",
      """WITH n AS (
        |  SELECT doc_id,
        |         list_transform(
        |           string_split_regex(lower(trim(text)), '\s+'),
        |           t -> regexp_replace(t, '[^a-z]', '', 'g')) AS toks
        |  FROM documents)
        |SELECT doc_id FROM n
        |WHERE list_contains(toks, 'table')
        |  AND list_contains(toks, 'window')
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // INCREMENTAL inverted-index maintenance — the q169 recipe
      // (commit deltas, merge on read) applied to retrieval: each
      // ingest drop commits ITS OWN posting rows (tok, df, postings
      // over that batch's docs) as a tagged version of one index lake,
      // and a query merges postings ACROSS versions at read time — the
      // full index is never rebuilt when a drop arrives (q118/q127
      // rebuild from the corpus; production ingest cannot). Boolean
      // AND over the merged index: a doc's postings live in exactly
      // one batch's rows per term, so per-doc hit counts equal the
      // full-corpus counts and the oracle is q127's corpus-scan SQL
      // verbatim — incremental-by-construction ≡ rebuild-from-scratch.
      // Probe cost: the tok filter pushes into every version dir's
      // scan (posting rows for two terms, not the index); compaction
      // folds deltas like any lake; replayed drops no-op via their
      // tags.
      val idxDir = s"${graft.Sessions.scratchRoot}/inv_index_" +
        new java.io.File(dir).getName
      val docs = table(s, dir, "documents")
      VersionedLake.commitTagged(TextAnalysis.invertedIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        maxPostings = 1000000), idxDir, "m1")
      VersionedLake.commitTagged(TextAnalysis.invertedIndex(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
        maxPostings = 1000000), idxDir, "m2")
      val terms = Seq("table", "window")
      VersionedLake.readLatest(s, idxDir)
        .filter(col("tok").isin(terms: _*))
        .select(explode(col("postings")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("_hits"))
        .filter(col("_hits") === terms.length)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q127_index_retrieval",
      """WITH n AS (
        |  SELECT doc_id,
        |         list_transform(
        |           string_split_regex(lower(trim(text)), '\s+'),
        |           t -> regexp_replace(t, '[^a-z]', '', 'g')) AS toks
        |  FROM documents)
        |SELECT doc_id FROM n
        |WHERE list_contains(toks, 'table')
        |  AND list_contains(toks, 'window')
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Boolean AND retrieval THROUGH the inverted index (q118's
      // artifact, used): candidates come from intersecting the query
      // terms' posting lists — explode each term's postings, keep doc
      // ids hit by ALL terms — and the oracle answers the same query
      // by scanning the corpus, so the index path must be exactly the
      // scan path. At 100 TB this is the point of the index: the
      // retrieval touches |postings(term)| rows per term and never the
      // corpus. (Posting caps trade that exactness for boundedness;
      // here the cap is set above any sf's document count so lists are
      // complete — a production engine keeps capped lists for ranking
      // and full lists for rare terms, which df makes cheap to tell
      // apart.)
      val terms = Seq("table", "window")
      TextAnalysis.invertedIndex(
          table(s, dir, "documents"), "doc_id", "text",
          maxPostings = 1000000)
        .filter(col("tok").isin(terms: _*))
        .select(explode(col("postings")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("_hits"))
        .filter(col("_hits") === terms.length)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q128_bm25_topk",
      """WITH n AS (
        |  SELECT doc_id,
        |         list_filter(
        |           list_transform(
        |             string_split_regex(lower(trim(text)), '\s+'),
        |             t -> regexp_replace(t, '[^a-z]', '', 'g')),
        |           t -> t <> '') AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM n),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS N, avg(dl) AS avgdl
        |      FROM d),
        |f AS (SELECT
        |        CAST(sum(CASE WHEN list_contains(toks, 'table')
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS df_table,
        |        CAST(sum(CASE WHEN list_contains(toks, 'window')
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS df_window
        |      FROM d),
        |tf AS (SELECT doc_id, dl,
        |         CAST(len(list_filter(toks, t -> t = 'table')) AS DOUBLE)
        |           AS tf_t,
        |         CAST(len(list_filter(toks, t -> t = 'window')) AS DOUBLE)
        |           AS tf_w
        |       FROM d),
        |sc AS (SELECT doc_id,
        |         ln(1 + (N - df_table + 0.5) / (df_table + 0.5))
        |           * tf_t * 2.2
        |           / (tf_t + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |       + ln(1 + (N - df_window + 0.5) / (df_window + 0.5))
        |           * tf_w * 2.2
        |           / (tf_w + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
        |       FROM tf, s, f)
        |SELECT doc_id, round(score, 4) AS score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      // BM25 ranked retrieval ([[TextAnalysis.bm25TopK]], k1 = 1.2,
      // b = 0.75, Lucene idf): the ranking layer over q118/q127's
      // index family, with the full scoring formula mirrored in SQL —
      // exact integer tf/df/N inputs, identical ln and operator
      // order, round-4 before rank so float noise can't flip the
      // top-20 (doc_id tiebreak). Plan: term hits are row-local HOF
      // counts in the scan; corpus statistics arrive as TWO broadcast
      // rows; the rank is TakeOrderedAndProject (plan-gated) — scan +
      // broadcasts + heaps, nothing shuffles the corpus.
      TextAnalysis.bm25TopK(table(s, dir, "documents"), "doc_id", "text",
        terms = Seq("table", "window"), topK = 20)
    },

    QuerySpec(
      "q126_bigram_surprisal",
      """WITH t AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |u AS (SELECT unnest(toks) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
        |        FROM u GROUP BY w),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS N FROM uni),
        |pr AS (
        |  SELECT doc_id,
        |         unnest([{'p': toks[i], 'c': toks[i+1]}
        |                 FOR i IN range(1, len(toks))]) AS bg
        |  FROM t WHERE len(toks) >= 2),
        |pairs AS (SELECT doc_id, bg.p AS p, bg.c AS c FROM pr),
        |bi AS (SELECT p, c, CAST(count(*) AS BIGINT) AS cb
        |       FROM pairs GROUP BY p, c),
        |cctx AS (SELECT p, CAST(count(*) AS BIGINT) AS cc
        |         FROM pairs GROUP BY p)
        |SELECT pairs.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(-ln(0.7 * cb / cc + 0.3 * cu / N)), 4)
        |         AS avg_surprisal
        |FROM pairs JOIN bi USING (p, c) JOIN cctx USING (p)
        |     JOIN uni ON uni.w = pairs.c, tot
        |GROUP BY pairs.doc_id ORDER BY pairs.doc_id""".stripMargin) {
      (s, dir) =>
      // Bigram Jelinek–Mercer scoring
      // ([[TextAnalysis.bigramSurprisal]], λ = 0.7): the fluency filter
      // above q115's unigram form — shuffled text keeps its unigram
      // score but its transition probabilities collapse, so the bigram
      // term separates what the unigram filter can't. Both engines
      // compute every probability from exact integer counts, the same
      // ln, and the same 1-based pair indexing (DuckDB toks[i] is
      // 1-based, matching element_at); the mean rounds to 4 so float
      // summation order can't flip the hash. Count tables broadcast;
      // the corpus probe never sort-merge-joins (plan-gated).
      TextAnalysis.bigramSurprisal(
        table(s, dir, "documents"), "doc_id", "text", lambda = 0.7)
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q121_bpe_pairs",
      """WITH w AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
        |           AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS wc FROM w WHERE w <> '' GROUP BY w),
        |p AS (
        |  SELECT wc,
        |         unnest([substr(w, i, 2) FOR i IN range(1, length(w))])
        |           AS pair
        |  FROM wc WHERE length(w) >= 2)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
        |FROM p GROUP BY pair
        |ORDER BY freq DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
      // BPE merge-pair statistics ([[TextAnalysis.bpePairStats]]): the
      // tokenizer-training first step. The corpus collapses to the
      // word-frequency table before the pair explosion, so pairs are
      // counted over VOCAB rows ×  weight — at 100 TB the explosion
      // touches ~10^6 vocabulary entries, not ~10^13 running words.
      // Deterministic across engines: binary string sort on the pair
      // tiebreak, exact integer weights, bounded output (top-20 plans
      // TakeOrderedAndProject — per-partition heaps, no global sort).
      TextAnalysis.bpePairStats(table(s, dir, "documents"), "text",
        topK = 20)
    },

    QuerySpec(
      "q108_curation_pipeline",
      s"""WITH base AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, regexp_replace(text, ' ', '  ', 'g') || '  ',
         |         lang
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, text, lang,
         |         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         |         round(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) * 1.0
         |               / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS diversity,
         |         round(len(regexp_extract_all(lower(text), '$EnStops')) * 1.0
         |               / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS stop_ratio,
         |         len(regexp_extract_all(lower(text), '$EnStops')) AS en_hits,
         |         len(regexp_extract_all(lower(text), '$DeStops')) AS de_hits,
         |         len(regexp_extract_all(lower(text), '$EsStops')) AS es_hits,
         |         len(regexp_extract_all(lower(text), '$FrStops')) AS fr_hits,
         |         len(regexp_extract_all(text, '$CjkChars')) AS cjk_hits
         |  FROM base),
         |lang_pass AS (
         |  SELECT doc_id, text, n_tokens, diversity, stop_ratio FROM scored
         |  WHERE lang = CASE WHEN cjk_hits > 0 THEN 'zh'
         |                    WHEN en_hits >= de_hits AND en_hits >= es_hits
         |                         AND en_hits >= fr_hits THEN 'en'
         |                    WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
         |                    WHEN es_hits >= fr_hits THEN 'es'
         |                    ELSE 'fr' END),
         |qual AS (
         |  SELECT doc_id, text, n_tokens, diversity FROM lang_pass
         |  WHERE n_tokens BETWEEN 30 AND 90
         |        AND diversity >= 0.25 AND stop_ratio <= 0.3),
         |rep AS (
         |  SELECT doc_id, text, n_tokens, diversity FROM (
         |    SELECT doc_id, text, n_tokens, diversity,
         |           [array_to_string(words[i:i+2], ' ')
         |            FOR i IN range(1, len(words) - 1)] AS grams
         |    FROM (SELECT doc_id, text, n_tokens, diversity,
         |                 string_split_regex(lower(trim(text)), '\\s+') AS words
         |          FROM qual))
         |  WHERE round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
         |              / len(grams), 6) <= 0.05),
         |dedup AS (
         |  SELECT doc_id, text, n_tokens, diversity FROM (
         |    SELECT doc_id, text, n_tokens, diversity,
         |           row_number() OVER (
         |             PARTITION BY md5(regexp_replace(lower(trim(text)),
         |                                             '\\s+', ' ', 'g'))
         |             ORDER BY doc_id) AS rn
         |    FROM rep)
         |  WHERE rn = 1),
         |assigned AS (
         |  SELECT CASE WHEN b < 80 THEN 'train'
         |              WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
         |         doc_id, n_tokens, diversity
         |  FROM (SELECT doc_id, text, n_tokens, diversity,
         |               ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
         |        FROM dedup))
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       CAST(sum(CAST(round(diversity * 10000, 0) AS BIGINT)) AS BIGINT)
         |         AS sum_div_1e4
         |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // END-TO-END corpus curation — the five pipeline stages every
      // pre-training dataset goes through, composed as ONE declarative
      // plan: lang-agreement filter (declared lang must match the
      // stopword-profile prediction) → quality band (length + lexical
      // diversity + stopword density, keep 'good') → repetition rule
      // (duplicate-trigram ratio, Gopher/C4 family) → exact dedup
      // (normalized-fingerprint keep-first) → content-hash train/val/
      // test split → per-split accounting. The point being graded is
      // COMPOSITION: each stage is the already-oracle-verified library
      // operator (q36/q35/q81/q39/q83), and the composed plan keeps the
      // shape the stages promise individually — every filter is
      // row-local and runs IN THE SCAN's codegen stage before the
      // pipeline's only wide operators (the dedup window and the final
      // 3-group aggregate). At 100 TB the ordering is the cost model:
      // cheap row-local gates drop ~2/3 of the corpus before anything
      // shuffles, and what shuffles is one slim projection, not text.
      //
      // The corpus has no natural exact duplicates, so the dedup stage
      // is made load-bearing the q92 way: every document is PLANTED a
      // whitespace-mutated near-copy (doubled inner spaces + trailing
      // pad, doc_id + 100000) in the same single scan via explode —
      // normalization-equal, so every stage scores it identically and
      // the keep-first window must drop exactly the planted half. A
      // diversity checksum rides as an exact integer sum (round to the
      // 4-decimal lattice × 1e4 per row, THEN sum longs) so float
      // summation order can't smear the hash.
      val mutated = concat(regexp_replace(col("text"), " ", "  "), lit("  "))
      val base = table(s, dir, "documents")
        .select(explode(array(
            struct(col("doc_id"), col("text")),
            struct((col("doc_id") + 100000L).as("doc_id"),
              mutated.as("text")))).as("r"),
          col("lang"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
          col("lang"))
      val toks = tokens(col("text"))
      val qual = base
        .filter(langId(col("text")) === col("lang"))
        .select(col("doc_id"), col("text"),
          tokenCount(col("text")).as("n_tokens"),
          round(size(array_distinct(toks)).cast("double") / size(toks), 4)
            .as("diversity"),
          round(stopHits(col("text"), EnStops).cast("double") / size(toks), 4)
            .as("stop_ratio"))
        .filter(qualityBand(col("n_tokens"), col("diversity"),
          col("stop_ratio")) === "good")
        .select(col("doc_id"), col("text"), col("n_tokens"), col("diversity"))
      // dupGramRatioExpr, NOT duplicateGramRatio: the filter is pushed
      // through any staging, and this form stays O(n·w) when inlined.
      val rep = qual
        .filter(TextAnalysis.dupGramRatioExpr(col("text"), n = 3) <= 0.05)
      val kept = Dedup.dedupKeepFirst(rep, "text", "doc_id")
      Sampling.assignSplit(kept, trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(round(col("diversity") * 10000).cast("long")).as("sum_div_1e4"))
        .orderBy(col("split"))
    },

    QuerySpec(
      "q131_bpe_train",
      q131Oracle) { (s, _) =>
      // Full BPE tokenizer training ([[TextAnalysis.bpeTrain]]): 8
      // merge rounds over the planted Sennrich-style word-frequency
      // table — each round one vocab-bounded explode+sum, a 1-row
      // argmax collect, and a codegen'd greedy merge fold. The oracle
      // is the merge table computed by the INDEPENDENT sequential
      // reference trainer ([[TextAnalysis.bpeTrainRef]], plain Scala
      // collections) embedded as VALUES — the q32/q34 spec-derived-
      // constants discipline — so a wrong pair count, a nondeterministic
      // argmax tie-break, or a fold that merges overlapping pairs
      // differently from the reference tokenizer breaks the hash.
      // Determinism under repartitioning is pinned in TextSpec.
      import s.implicits._
      TextAnalysis.bpeTrain(
        BpeWords.toDF("w", "wc").repartition(4), nMerges = 8)
        .orderBy(col("step"))
    },

    QuerySpec(
      "q135_bpe_tokenize",
      q135Oracle) { (s, dir) =>
      // Tokenizer application: the 8 merges TRAINED in q131 (a fixed
      // literal list — train once, encode forever) run over every word
      // of every document, row-local in the scan; output is exact
      // integers (word count, subword piece count, and their
      // difference = how many merges fired). The encode runs as the
      // NATIVE codegen'd [[org.apache.spark.sql.graft.BpePieceCount]]
      // loop (the q133 lesson repeated: the declarative
      // [[TextAnalysis.bpePieceCount]] fold chain it is property-tested
      // equal to nests 8 interpreted `aggregate` levels, each
      // reallocating the symbol array per element — it was the suite's
      // most expensive query at ~19 s; the native loop compacts ONE
      // symbol buffer in place per merge level). The oracle replays
      // the identical greedy fold with nested DuckDB list_reduce over
      // the same literal merge list — one wrong merge order, tie-fold,
      // or overlap resolution shifts a piece count and breaks the hash.
      val merges = TextAnalysis.bpeTrainRef(BpeWords, nMerges = 8)
        .map { case (_, a, b, _) => (a, b) }
      table(s, dir, "documents")
        .withColumn("toks", TextAnalysis.tokens(lower(trim(col("text")))))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          org.apache.spark.sql.graft.BpeFunctions
            .bpePieceCountNative(col("toks"), merges).as("n_pieces"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q133_quality_scorer",
      q133Oracle) { (s, dir) =>
      // Model-based quality scoring ([[TextAnalysis.hashedNgramLogit]]),
      // the fastText shape heuristic filters (q36/q57/q81/q115/q126)
      // graduate to: word uni+bigrams hash into D=1024 buckets of a
      // LITERAL quantized weight table and the document's logit is the
      // bucket-weight sum — md5-bucketed so the oracle replays the
      // identical hash with integer-only arithmetic (weights are
      // milli-units; the sigmoid is monotone, so the logit>0 filter IS
      // the probability threshold). The logit runs as the NATIVE
      // codegen'd [[HashedNgramLogit]] loop (the declarative
      // `aggregate` fold it is property-tested equal to is interpreted
      // — Spark HOFs don't codegen — and was the whole suite's most
      // expensive query at ~13 s; the native loop streams the md5 over
      // token bytes with no gram strings, no hex rendering, no base-16
      // parse). Score and filter are ROW-LOCAL in the scan — the
      // plan's only exchange is the final presentation sort (gated in
      // PlanAuditSpec): at 100 TB the model fee is paid map-side and
      // only survivors ever shuffle. quality_ppm is exact integer
      // division of positive operands, so the compare is exact.
      // n_grams = unigrams + bigrams = 2n-1 for n ≥ 2 (≡ size of the
      // ngramGrams array, without building it).
      val w = TextAnalysis.scorerWeights()
      table(s, dir, "documents")
        .withColumn("toks", TextAnalysis.tokens(lower(trim(col("text")))))
        .withColumn("n_grams", expr(
          "CASE WHEN size(toks) >= 2 THEN 2 * size(toks) - 1 " +
            "ELSE size(toks) END").cast("long"))
        .withColumn("logit",
          org.apache.spark.sql.graft.ScorerFunctions
            .ngramLogitNative(col("toks"), w))
        .filter(col("logit") > 0)
        .select(col("doc_id"), col("n_grams"), col("logit"),
          expr("logit * 1000000 div (1000 * n_grams)").as("quality_ppm"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q147_substring_dedup",
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, u.i AS pos,
        |         md5(array_to_string(toks[u.i + 1:u.i + 8], ' ')) AS gh
        |  FROM d, UNNEST(range(0, greatest(len(toks) - 7, 0))) AS u(i)),
        |r AS (
        |  SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
        |  FROM g),
        |s AS (SELECT doc_id, pos FROM r WHERE rn > 1),
        |t AS (
        |  SELECT d.doc_id, u.i - 1 AS tpos, d.toks[u.i] AS tok,
        |         len(d.toks) AS n
        |  FROM d, UNNEST(range(1, len(d.toks) + 1)) AS u(i)),
        |f AS (
        |  SELECT t.doc_id, t.tpos, t.tok, t.n,
        |         CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END AS st
        |  FROM t LEFT JOIN s ON s.doc_id = t.doc_id AND s.pos = t.tpos),
        |c AS (
        |  SELECT *, MAX(st) OVER (PARTITION BY doc_id ORDER BY tpos
        |             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
        |  FROM f)
        |SELECT doc_id,
        |       CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(sum(cov) AS BIGINT) AS n_removed,
        |       md5(coalesce(string_agg(tok, ' ' ORDER BY tpos)
        |                      FILTER (WHERE cov = 0), '')) AS clean_md5
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Lee et al. exact-substring dedup ([[TextAnalysis.substringDedup]]
      // — scale notes there): every 8-token span duplicated anywhere in
      // the corpus is removed from all but its first occurrence. The
      // oracle replays the rolling md5 window hashes, the
      // first-occurrence rank, and the interval cover (as a RANGE-frame
      // window — a different but result-identical formulation of the
      // Spark side's row-local indexed filter).
      TextAnalysis.substringDedup(
        table(s, dir, "documents"), "doc_id", "text", k = 8)
    },

    QuerySpec(
      "q148_unicode_normalize",
      """WITH p AS (
        |  SELECT doc_id,
        |         replace(translate(
        |             CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END,
        |             'aeiouAEIOU', 'áéíóúÁÉÍÓÚ'), ' ', '  ') AS dirty
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, dirty,
        |         trim(regexp_replace(strip_accents(lower(dirty)),
        |                             '\s+', ' ', 'g')) AS norm
        |  FROM p)
        |SELECT doc_id, md5(norm) AS norm_md5,
        |       CAST(length(norm) AS BIGINT) AS n_chars,
        |       (dirty <> norm) AS changed
        |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Unicode canonicalization via the native codegen'd expression
      // ([[org.apache.spark.sql.graft.NormalizeUtf8Text]]): the planted
      // dirty text (accented vowels, every third doc upper-cased,
      // doubled spaces) must normalize to the DuckDB
      // strip_accents∘lower∘collapse contract byte-for-byte. Row-local,
      // zero shuffles before the final order.
      table(s, dir, "documents")
        .withColumn("__dirty",
          WebText.dirtyText(col("doc_id"), col("text")))
        .withColumn("__norm", WebText.normalizeText(col("__dirty")))
        .select(col("doc_id"), md5(col("__norm")).as("norm_md5"),
          length(col("__norm")).cast("long").as("n_chars"),
          (col("__dirty") =!= col("__norm")).as("changed"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q149_html_extract",
      """WITH h AS (
        |  SELECT doc_id, source, text,
        |         '<html><head><title>' || source || ' #' || doc_id ||
        |         '</title><style>body { margin: 0; }</style></head><body>' ||
        |         '<nav><a href="/">Home</a> <a href="/about">About</a></nav>' ||
        |         '<script type="text/javascript">var id=' || doc_id ||
        |         '; track(id);</script>' ||
        |         '<h1>Doc ' || doc_id || '</h1><p>' || text ||
        |         '</p><p>Tom &amp; Jerry wrote &quot;hello&quot; ' ||
        |         '&lt;tag&gt; &#39;s&nbsp;end.</p>' ||
        |         '<footer>(c) 2026 ' || source || '</footer></body></html>'
        |           AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |         regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
        |         len(regexp_extract_all(html, '<a href="[^"]*"')) AS n_links,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(replace(
        |             regexp_replace(
        |               regexp_replace(
        |                 regexp_replace(
        |                   regexp_replace(html,
        |                     '<script[^>]*>.*?</script>', ' ', 'g'),
        |                   '<style[^>]*>.*?</style>', ' ', 'g'),
        |                 '<nav[^>]*>.*?</nav>', ' ', 'g'),
        |               '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |           '\s+', ' ', 'g')) AS body
        |  FROM h)
        |SELECT doc_id, title, CAST(n_links AS BIGINT) AS n_links,
        |       CAST(length(body) AS BIGINT) AS n_chars, md5(body) AS body_md5
        |FROM x ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // HTML extraction round-trip ([[WebText]] — builder and parser in
      // one plan, the codec-query pattern): title pull, link count,
      // script/style/nav removal BEFORE tag-stripping, entity decode,
      // whitespace collapse. The oracle rebuilds the identical page in
      // SQL and replays every regex (RE2 ∩ java.util.regex) and the
      // entity-decode order, so the compare is byte-exact.
      table(s, dir, "documents")
        .withColumn("__html",
          WebText.htmlWrap(col("doc_id"), col("source"), col("text")))
        .withColumn("__body", WebText.htmlVisibleText(col("__html")))
        .select(col("doc_id"), WebText.htmlTitle(col("__html")).as("title"),
          WebText.htmlLinkCount(col("__html")).as("n_links"),
          length(col("__body")).cast("long").as("n_chars"),
          md5(col("__body")).as("body_md5"))
        .orderBy(col("doc_id"))
    },

    QuerySpec(
      "q150_training_export",
      """WITH h AS (
        |  SELECT doc_id,
        |         len(regexp_split_to_array(trim(text), '\s+')) AS n_toks,
        |         md5('graft-export-seed42:' || doc_id) AS ord
        |  FROM documents),
        |s AS (SELECT *, ('0x' || substr(ord, 1, 8))::BIGINT % 8 AS shard_id
        |      FROM h)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY ord, doc_id))
        |         AS order_md5
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Deterministic training-export shuffle ([[Sampling.exportAssign]]
      // — scale notes there): seeded md5 sort key, hash shard, per-shard
      // manifest (count, token budget, md5 of the doc order) so the
      // oracle verifies the exact shard ORDER without dumping rows. One
      // exchange (the shard groupBy); everything else row-local.
      Sampling.exportAssign(table(s, dir, "documents"), "doc_id",
          nShards = 8, seed = "graft-export-seed42")
        .select(col("doc_id"), col("shard_id"), col("_ord"),
          TextAnalysis.tokenCount(col("text")).as("__nt"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("total_tokens"),
          md5(concat_ws(",", transform(
            array_sort(collect_list(struct(col("_ord"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")))).as("order_md5"))
        .orderBy(col("shard_id"))
    },

    QuerySpec(
      "q153_url_curation",
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' ||
        |         CASE WHEN doc_id % 17 = 0 THEN 'spam-' || source
        |              ELSE source END ||
        |         '.example' ||
        |         CASE WHEN doc_id % 4 = 0 THEN '.net' ELSE '.org' END ||
        |         '/p/' || doc_id ||
        |         CASE WHEN doc_id % 3 = 0 THEN '?utm=x&ref=1' ELSE '' END
        |           AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |         regexp_extract(url, '^https?://([^/?]+)', 1) AS host
        |  FROM u),
        |t AS (
        |  SELECT doc_id, host,
        |         regexp_extract(host, '\.([a-z0-9]+)$', 1) AS tld
        |  FROM p WHERE host NOT LIKE 'spam-%'),
        |r AS (
        |  SELECT doc_id, host, tld,
        |         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
        |  FROM t)
        |SELECT host, max(tld) AS tld,
        |       CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(count(CASE WHEN rn <= 15 THEN 1 END) AS BIGINT)
        |         AS n_kept,
        |       md5(string_agg(CASE WHEN rn <= 15 THEN doc_id::VARCHAR END,
        |                      ',' ORDER BY doc_id)) AS kept_md5
        |FROM r GROUP BY host ORDER BY host""".stripMargin) { (s, dir) =>
      // URL-level curation (the RefinedWeb front door): parse hosts/TLDs
      // from planted URLs ([[WebText.urlHost]]/[[WebText.urlTld]]),
      // drop blocklisted domains (pattern rule — a literal blocklist
      // table would broadcast into the same plan), cap documents per
      // domain at 15 by a streaming rank window (first-seen ids — the
      // anti-SEO-farm lever), manifest per host. The host window and
      // the host groupBy share one exchange (same key).
      val url = concat(lit("https://"),
        when(col("doc_id") % 17 === 0, concat(lit("spam-"), col("source")))
          .otherwise(col("source")),
        lit(".example"),
        when(col("doc_id") % 4 === 0, lit(".net")).otherwise(lit(".org")),
        lit("/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0, lit("?utm=x&ref=1")).otherwise(lit("")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("host")).orderBy(col("doc_id"))
      table(s, dir, "documents")
        .withColumn("host", WebText.urlHost(url))
        .filter(!col("host").startsWith("spam-"))
        .withColumn("__rn", row_number().over(w))
        .groupBy(col("host"))
        .agg(max(WebText.urlTld(col("host"))).as("tld"),
          count(lit(1)).as("n_total"),
          count(when(col("__rn") <= 15, 1)).as("n_kept"),
          md5(concat_ws(",", transform(
            array_sort(collect_list(when(col("__rn") <= 15, col("doc_id")))),
            x => x.cast("string")))).as("kept_md5"))
        .orderBy(col("host"))
    },

    QuerySpec(
      "q175_kmv_overlap",
      s"""WITH ${kmvSketchSql(
        "CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END")},
        |gest AS (
        |  SELECT g AS set_name,
        |         ${kmvEstSql("n", "kth")} AS est
        |  FROM ga),
        |usk AS (SELECT h FROM (SELECT DISTINCT h FROM sk)
        |        QUALIFY row_number() OVER (ORDER BY h) <= ${KmvK}),
        |ua AS (SELECT count(*) AS n, max(h) AS kth FROM usk),
        |uest AS (
        |  SELECT ${kmvEstSql("n", "kth")} AS est
        |  FROM ua),
        |rho AS (
        |  SELECT count(*) AS r FROM usk
        |  WHERE h IN (SELECT h FROM sk WHERE g = 'a')
        |    AND h IN (SELECT h FROM sk WHERE g = 'b')),
        |iest AS (
        |  SELECT CAST(round(CAST(r AS DOUBLE) * CAST(est AS DOUBLE)
        |                    / ${KmvK}.0) AS BIGINT) AS est
        |  FROM rho, uest),
        |ex AS (
        |  SELECT sh, max(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ia,
        |             max(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS ib
        |  FROM (SELECT DISTINCT g, sh FROM sh0) GROUP BY sh),
        |exact AS (
        |  SELECT CAST(sum(ia) AS BIGINT) AS ea,
        |         CAST(sum(ib) AS BIGINT) AS eb,
        |         CAST(count(*) AS BIGINT) AS eu,
        |         CAST(sum(ia * ib) AS BIGINT) AS ei
        |  FROM ex),
        |est4 AS (
        |  SELECT set_name, est FROM gest
        |  UNION ALL SELECT 'union', est FROM uest
        |  UNION ALL SELECT 'intersect', est FROM iest)
        |SELECT e.set_name, e.est,
        |       CASE e.set_name WHEN 'a' THEN x.ea WHEN 'b' THEN x.eb
        |            WHEN 'union' THEN x.eu ELSE x.ei END AS exact
        |FROM est4 e, exact x ORDER BY e.set_name""".stripMargin) { (s, dir) =>
      // KMV bottom-k sketches ([[Kmv]]) estimating the distinct 8-gram
      // shingle cardinality of two corpus halves AND their union AND
      // their intersection — the sketch-speed answer to "how much
      // n-gram overlap do these corpora have" that decontamination /
      // dedup planning needs BEFORE paying for a corpus×corpus join.
      // Salted two-stage k-min (bit-identical to the oracle's global
      // QUALIFY), union = TakeOrdered over ≤2k merged points, ρ via two
      // broadcast-size semi-joins. The exact column (one extra
      // aggregation pass) pins the estimator's calibration in the hash
      // compare; at 100 TB it is the branch you delete.
      val docs = table(s, dir, "documents")
      val sh = Dedup.shingleDf(docs, "doc_id", "text", n = 8)
        .select(when(col("id") % 2 === 0, "a").otherwise("b").as("g"),
          col("sh"))
      val pts = sh.select(col("g"), Kmv.point(col("sh")).as("h"))
      val sk = Kmv.sketch(pts, KmvK)
      val gest = sk.groupBy("g")
        .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
        .select(col("g").as("set_name"),
          Kmv.estimate(col("n"), col("kth"), KmvK).as("est"))
      val usk = sk.select("h").distinct().orderBy("h").limit(KmvK)
      val uest = usk.agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
        .select(lit("union").as("set_name"),
          Kmv.estimate(col("n"), col("kth"), KmvK).as("est"))
      val rho = usk
        .join(sk.filter(col("g") === "a").select("h"), Seq("h"), "left_semi")
        .join(sk.filter(col("g") === "b").select("h"), Seq("h"), "left_semi")
        .agg(count(lit(1)).as("r"))
      val iest = rho.crossJoin(uest.select(col("est").as("uest")))
        .select(lit("intersect").as("set_name"),
          Kmv.intersectEstimate(col("r"), col("uest"), KmvK).as("est"))
      val exact = sh.distinct().groupBy("sh")
        .agg(max(when(col("g") === "a", 1).otherwise(0)).as("ia"),
          max(when(col("g") === "b", 1).otherwise(0)).as("ib"))
        .agg(sum(col("ia")).cast("long").as("ea"),
          sum(col("ib")).cast("long").as("eb"),
          count(lit(1)).as("eu"),
          sum(col("ia") * col("ib")).cast("long").as("ei"))
        .selectExpr("stack(4, 'a', ea, 'b', eb, 'union', eu, " +
          "'intersect', ei) AS (set_name, exact)")
      gest.unionByName(uest).unionByName(iest)
        .join(exact, "set_name")
        .orderBy("set_name")
    },

    QuerySpec(
      "q176_boilerplate_lines",
      """WITH pg AS (
        |  SELECT doc_id,
        |         text || chr(10) || 'copyright ' || source
        |           || CASE WHEN doc_id % 3 = 0
        |                THEN chr(10) || 'subscribe to our newsletter today'
        |                ELSE '' END
        |           || CASE WHEN doc_id % 7 = 0
        |                THEN chr(10) || 'promo code graft-' || doc_id
        |                ELSE '' END AS page
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(page, chr(10))))
        |           AS line
        |  FROM pg),
        |hv AS (SELECT line FROM l GROUP BY line HAVING count(*) >= 20),
        |ha AS (SELECT coalesce(list(line), []) AS harr FROM hv),
        |k AS (
        |  SELECT doc_id, string_split(page, chr(10)) AS ls,
        |         list_filter(string_split(page, chr(10)),
        |                     x -> NOT list_contains(harr, x)) AS kept
        |  FROM pg, ha)
        |SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept,
        |       CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
        |       md5(array_to_string(kept, chr(10))) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // RefinedWeb line-level dedup ([[WebText.removeBoilerplateLines]]):
      // lines occurring in ≥20 distinct documents are boilerplate and
      // removed everywhere. The planted page puts a per-source copyright
      // footer in every document (~25 docs each — removed), a newsletter
      // banner in every third (removed), and a doc-unique promo line in
      // every seventh (KEPT — a threshold off-by-one or a doc-count vs
      // occurrence-count confusion flips it). The heavy set is counted
      // in one shuffle and broadcast back into a row-local array filter;
      // page text itself never shuffles, and the md5 of each cleaned
      // page pins exact line order and content.
      val page = concat(col("text"),
        lit("\ncopyright "), col("source"),
        when(col("doc_id") % 3 === 0,
          lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit("\npromo code graft-"), col("doc_id").cast("string")))
          .otherwise(lit("")))
      WebText.removeBoilerplateLines(
        table(s, dir, "documents").select(col("doc_id"), page.as("page")),
        minDocs = 20)
        .orderBy("doc_id")
    },

    QuerySpec(
      "q177_incremental_kmv",
      q177OracleSql) { (s, dir) =>
      // Incremental distinct-counting through the versioned lake: each
      // monthly batch commits ONLY its own KMV sketch (≤ k rows per
      // lang — batch 1 is never rescanned), and the live estimate is a
      // k-min over the union of committed sketches. Because bottom-k
      // merge is exactly associative on distinct hash points,
      // sketch(sketch(b1) ∪ sketch(b2)) ≡ sketch(b1 ∪ b2) BIT FOR BIT —
      // so the oracle is the verbatim full-corpus computation, the
      // q169 discipline. kth_hash in the output pins the merged sketch
      // itself, not just the rounded estimate. Commits are tagged ⇒
      // warm replays are O(1) no-ops.
      val idx = s"${graft.Sessions.scratchRoot}/kmv_inc_" +
        new java.io.File(dir).getName
      val docs = table(s, dir, "documents")
      VersionedLake.commitTagged(
        Kmv.sketch(kmvPoints(docs.filter(col("doc_id") % 3 === 0)), KmvK),
        idx, "m1")
      VersionedLake.commitTagged(
        Kmv.sketch(kmvPoints(docs.filter(col("doc_id") % 3 =!= 0)), KmvK),
        idx, "m2")
      kmvEstimates(Kmv.sketch(VersionedLake.readLatest(s, idx), KmvK))
    },

    QuerySpec(
      "q180_code_detect",
      """WITH p AS (
        |  SELECT doc_id, lang,
        |         regexp_split_to_array(trim(text), '\s+') AS toks, text
        |  FROM documents),
        |pg AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 4 = 0 THEN
        |           'def f' || doc_id || '(x) {' || chr(10) ||
        |           array_to_string(list_transform(
        |             range(1, least(len(toks), 8) + 1),
        |             i -> '  let v' || (i - 1) || ' = ' || toks[i] || ';'),
        |             chr(10)) ||
        |           chr(10) || '  return x;' || chr(10) || '}'
        |         ELSE text END AS page
        |  FROM p),
        |f AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(page, '[{};=]')) AS BIGINT)
        |           AS n_sym,
        |         CAST(len(regexp_extract_all(page,
        |           '\b(def|let|return)\b')) AS BIGINT) AS kw_hits
        |  FROM pg)
        |SELECT doc_id, lang, n_sym, kw_hits,
        |       (n_sym >= 10 AND kw_hits >= 3) AS is_code
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Code-vs-prose detection — the curation signal that routes
      // documents to a code pipeline (The Stack separation) before any
      // language-model filter sees them. The fixture compiles every
      // fourth document into a deterministic code rendering (def
      // header, let-bindings over its first 8 tokens, return, braces);
      // the detector is two row-local regexp feature counts (structural
      // symbols, keyword hits) and a conjunctive threshold — computed
      // in the scan, no shuffle before the presentation sort, the same
      // encode→detect round-trip discipline as the codec queries. A
      // threshold off-by-one or a regex divergence flips is_code and
      // breaks the hash on all 500 rows.
      val toks = split(trim(col("text")), "\\s+")
      val kept = slice(toks, 1, 8)
      val body = concat_ws("\n", transform(kept, (t, i) =>
        concat(lit("  let v"), i.cast("string"), lit(" = "), t, lit(";"))))
      val page = when(col("doc_id") % 4 === 0,
        concat(lit("def f"), col("doc_id").cast("string"), lit("(x) {\n"),
          body, lit("\n  return x;\n}")))
        .otherwise(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), page.as("page"))
        .select(col("doc_id"), col("lang"),
          regexp_count(col("page"), lit("[{};=]")).cast("long").as("n_sym"),
          regexp_count(col("page"), lit("\\b(def|let|return)\\b"))
            .cast("long").as("kw_hits"))
        .select(col("doc_id"), col("lang"), col("n_sym"), col("kw_hits"),
          (col("n_sym") >= 10 && col("kw_hits") >= 3).as("is_code"))
        .orderBy("doc_id")
    })

  /** Planted BPE corpus (word → frequency): the classic subword-NMT
    * demonstration shape — shared stems and suffixes ("low"/"lower"/
    * "lowest", "new"/"newer"/"newest", "wide"-family) whose merge
    * sequence exercises suffix fusion, tie-breaks, and multi-round
    * symbol growth. Shared between the Spark query and the reference
    * trainer that generates the oracle. */
  // lazy: `specs` above references this during object init
  private[graft] lazy val BpeWords: Seq[(String, Long)] = Seq(
    "low" -> 7L, "lower" -> 5L, "lowest" -> 2L, "newer" -> 6L,
    "newest" -> 3L, "wider" -> 3L, "new" -> 2L, "widest" -> 1L)

  private def q131Oracle: String = {
    val rows = TextAnalysis.bpeTrainRef(BpeWords, nMerges = 8)
      .map { case (step, a, b, f) =>
        def q(s: String) = "'" + s.replace("'", "''") + "'"
        s"($step, ${q(a)}, ${q(b)}, CAST($f AS BIGINT))"
      }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows
       |) AS t(step, a, b, freq) ORDER BY step""".stripMargin
  }

  /** q135 oracle: the identical greedy merge chain in DuckDB — per word
    * a character comprehension, then one `list_reduce` per learned
    * merge (elements pre-wrapped in single-element lists so the
    * accumulator type is VARCHAR[]; DuckDB's reduce seeds from the
    * first element, which equals Spark's fold after its first step),
    * nested in training order, summed per document. Empty words guard
    * to 0 (list_reduce rejects empty input). */
  private def q135Oracle: String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val chars = "[substring(wv, i, 1) FOR i IN range(1, length(wv) + 1)]"
    val folded = TextAnalysis.bpeTrainRef(BpeWords, nMerges = 8)
      .zipWithIndex.foldLeft(chars) { case (inner, ((_, a, b, _), i)) =>
        s"""list_reduce(list_transform($inner, w$i -> [w$i]),
          (a$i, x$i) ->
            CASE WHEN len(a$i) > 0 AND a$i[-1] = ${q(a)}
                  AND x$i[1] = ${q(b)}
                 THEN list_concat(a$i[1:len(a$i) - 1], [${q(a + b)}])
                 ELSE list_concat(a$i, x$i) END)"""
      }
    s"""WITH t AS (
       |  SELECT doc_id,
       |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(len(toks) AS BIGINT) AS n_tokens,
       |       CAST(list_sum(list_transform(toks, wv ->
       |         CASE WHEN length(wv) = 0 THEN 0
       |              ELSE len($folded) END)) AS BIGINT) AS n_pieces
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** q133 oracle: the same weight table as a SQL list literal, the same
    * md5-hex-to-integer bucket hash (strpos arithmetic over the first 8
    * hex chars — DuckDB has no conv()), the same gram construction, and
    * integer-only scoring, so the compare is exact. Positive-operand
    * integer division keeps Spark's `div` (truncate) and DuckDB's `//`
    * agreeing. */
  private def q133Oracle: String = {
    val wl = TextAnalysis.scorerWeights().mkString("[", ", ", "]")
    s"""WITH w AS (SELECT $wl AS wl),
       |t AS (
       |  SELECT doc_id,
       |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         list_concat(toks,
       |           CASE WHEN len(toks) >= 2
       |             THEN [toks[i] || ' ' || toks[i+1]
       |                   FOR i IN range(1, len(toks))]
       |             ELSE [] END) AS grams
       |  FROM t),
       |s AS (
       |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
       |         CAST(list_sum(list_transform(grams, gr ->
       |           wl[CAST(list_sum(list_transform(range(1, 9), i ->
       |                 CAST(strpos('0123456789abcdef',
       |                             substring(md5(gr), i, 1)) - 1 AS BIGINT)
       |                   * (CAST(1 AS BIGINT) << (4 * (8 - i))))) % 1024
       |               AS INT) + 1])) AS BIGINT) AS logit
       |  FROM g, w)
       |SELECT doc_id, n_grams, logit,
       |       (logit * 1000000) // (1000 * n_grams) AS quality_ppm
       |FROM s WHERE logit > 0 ORDER BY doc_id""".stripMargin
  }
}
