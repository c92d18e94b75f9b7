package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextNormFunctions

/** Web-crawl text extraction and canonicalization — the front of a
  * crawl-curation pipeline (what trafilatura/jusText do before any
  * quality filter runs): strip markup and obvious boilerplate from an
  * HTML page, decode entities, and canonicalize the unicode so
  * downstream hashing/dedup sees one spelling per text.
  *
  * Every helper is a row-local scalar expression chain — no UDF, no
  * shuffle, evaluated inside the scan's codegen stage, so extraction
  * composes with partition pruning exactly like a filter. Regexes stay
  * inside the RE2 ∩ java.util.regex subset (non-greedy `.*?`, char
  * classes — no lookahead/backreferences) so the DuckDB oracles replay
  * them verbatim.
  *
  * The corpus fixture has no HTML (TESTDATA.md synthesizes plain words),
  * so q149 wraps each document in a deterministic page — title, nav,
  * script, styled body, entity-bearing footer — inside the query itself
  * and extracts it back, the same encode→parse round-trip pattern as the
  * image/audio/video codec queries (q88/q117/q132): the oracle rebuilds
  * the identical page in SQL, so a parser bug cannot hide behind its own
  * builder.
  */
object WebText {

  /** Deterministic HTML page around a document — the encode half of the
    * q149 round-trip. Uses only entities [[htmlUnescape]] decodes, so
    * extraction is exact. */
  def htmlWrap(docId: Column, source: Column, text: Column): Column =
    concat(
      lit("<html><head><title>"), source, lit(" #"), docId,
      lit("</title><style>body { margin: 0; }</style></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>"),
      lit("<script type=\"text/javascript\">var id="), docId,
      lit("; track(id);</script>"),
      lit("<h1>Doc "), docId, lit("</h1><p>"), text,
      lit("</p><p>Tom &amp; Jerry wrote &quot;hello&quot; "),
      lit("&lt;tag&gt; &#39;s&nbsp;end.</p>"),
      lit("<footer>(c) 2026 "), source, lit("</footer></body></html>"))

  /** `<title>` contents (first match; empty string when absent). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "<title>(.*?)</title>", 1)

  /** Count of anchor tags — the link-density numerator boilerplate
    * classifiers use. */
  def htmlLinkCount(html: Column): Column =
    // group 0 (whole match) — Spark's default group index is 1, which
    // throws on a group-free pattern; DuckDB's default is already 0.
    size(regexp_extract_all(html, lit("<a href=\"[^\"]*\""), lit(0)))
      .cast("long")

  /** Fixed entity set, decoded in an order that keeps `&amp;` from
    * cascading (ampersand last, so `&amp;lt;` decodes to `&lt;` the
    * TEXT, not to `<`). */
  def htmlUnescape(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Visible text: drop script/style/nav subtrees (code and chrome are
    * not training text), strip remaining tags, decode entities, collapse
    * whitespace. Mirrors the jusText "remove non-content blocks first"
    * order — tag-stripping before block removal would leak script bodies
    * into the text. */
  def htmlVisibleText(html: Column): Column = {
    val noScript = regexp_replace(html, "<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "<style[^>]*>.*?</style>", " ")
    val noNav = regexp_replace(noStyle, "<nav[^>]*>.*?</nav>", " ")
    val noTags = regexp_replace(noNav, "<[^>]*>", " ")
    trim(regexp_replace(htmlUnescape(noTags), "\\s+", " "))
  }

  /** Unicode canonicalization (the [[org.apache.spark.sql.graft.NormalizeUtf8Text]]
    * native expression): strip accents, fold case, collapse whitespace —
    * the "one spelling per text" precondition for exact dedup at crawl
    * scale. */
  def normalizeText(c: Column): Column = TextNormFunctions.normalizeText(c)

  /** Host part of an http(s) URL (empty when the pattern misses). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^https?://([^/?]+)", 1)

  /** Last dot-separated label of a host — the TLD for the flat hosts a
    * curation blocklist keys on. */
  def urlTld(host: Column): Column =
    regexp_extract(host, "\\.([a-z0-9]+)$", 1)

  /** URL with the query string removed — tracking parameters are the
    * #1 source of spurious URL-dedup misses. */
  def urlStripQuery(url: Column): Column =
    regexp_replace(url, "\\?.*$", "")

  /** The q148 planted dirty text: vowels swapped for accented forms,
    * every third document upper-cased, spaces doubled — each a
    * transformation [[normalizeText]] must undo, and each exactly
    * replayable in DuckDB (`translate`/`upper`/`replace`). */
  def dirtyText(docId: Column, text: Column): Column =
    replace(
      translate(
        when(pmod(docId, lit(3)) === 0, upper(text)).otherwise(text),
        "aeiouAEIOU", "áéíóúÁÉÍÓÚ"),
      lit(" "), lit("  "))

  /** Corpus-level boilerplate-line removal (the RefinedWeb/CCNet line
    * dedup rule): a LINE that occurs in ≥ `minDocs` distinct documents
    * is boilerplate (nav bars, cookie banners, copyright footers) and
    * is removed from EVERY document; lines below the threshold —
    * including exact duplicates within one page — survive untouched.
    *
    * Shape for 100 TB: pass 1 counts distinct documents per line (the
    * per-document `array_distinct` makes a plain `count(*)` a distinct-
    * doc count — no count-distinct state), and the heavy set it yields
    * is NORMALLY small (boilerplate is what repeats), so pass 2 is a
    * broadcast of that set folded into a row-local `filter` over each
    * page's line array — no explode/reassemble shuffle, no join on the
    * corpus side, document text never moves. "Normally small" is a
    * DISTRIBUTION assumption, not a guarantee (a template-farm corpus
    * at a low `minDocs` can make the heavy set a material fraction of
    * all distinct lines), so the size is probed with a bounded count
    * first and a heavy set above `maxBroadcastLines` switches to the
    * join form: the corpus explodes to lines ONCE, the heavy set joins
    * by line (AQE still broadcasts it when it fits, sort-merge when it
    * truly doesn't), and documents reassemble by position — identical
    * results, executor-sized memory. Input `pages(doc_id, page)`;
    * output per document: kept/removed line counts and the md5 of the
    * cleaned page. */
  def removeBoilerplateLines(pages: DataFrame, minDocs: Int,
      maxBroadcastLines: Int = 1 << 22): DataFrame = {
    // NULL pages normalize to empty BEFORE either branch: the
    // broadcast path's array functions and the join path's posexplode
    // disagree on NULL (size -1 row vs dropped document), and which
    // branch runs must never change the result
    val lines = split(coalesce(col("page"), lit("")), "\n")
    val heavyLines = pages
      .select(col("doc_id"), explode(array_distinct(lines)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minDocs)
      .select(col("line"))
    // bounded probe that IS the pass-1 result when it fits: collect up
    // to bound+1 heavy lines (the same driver memory the broadcast
    // would hold anyway) so the common path computes the corpus-wide
    // aggregate exactly ONCE — re-deriving the heavy frame from the
    // collected rows costs a local parallelize, not a second scan+
    // shuffle of the corpus. Only the rare over-bound case pays the
    // recompute, inside its join.
    val heavyArr = heavyLines.limit(maxBroadcastLines + 1).collect()
      .map(_.getString(0))
    val fits = heavyArr.length <= maxBroadcastLines
    if (fits) {
      val spark = pages.sparkSession
      val heavy = spark.createDataset(heavyArr.toSeq)(
        org.apache.spark.sql.Encoders.STRING).toDF("line")
        .agg(coalesce(collect_list(col("line")),
          array().cast("array<string>")).as("harr"))
      pages.crossJoin(broadcast(heavy))
        .select(col("doc_id"), lines.as("ls"),
          filter(lines, l => !array_contains(col("harr"), l)).as("kept"))
        .select(col("doc_id"),
          size(col("kept")).cast("long").as("n_kept"),
          (size(col("ls")) - size(col("kept"))).cast("long").as("n_removed"),
          md5(array_join(col("kept"), "\n")).as("clean_md5"))
    } else {
      val ex = pages
        .select(col("doc_id"), posexplode(lines).as(Seq("_pos", "line")))
      ex.join(heavyLines.withColumn("_dup", lit(true)), Seq("line"), "left")
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("_dup").isNull, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_removed"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("_dup").isNull,
              struct(col("_pos"), col("line"))))),
            s => s.getField("line")), "\n")).as("clean_md5"))
    }
  }
}
