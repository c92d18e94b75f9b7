package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Web-text family: normalization vectors against an independent regex
  * reference, substring-dedup against hand-computed expectations, the
  * entity-decode non-cascade property, and export-shard determinism
  * under repartitioning. */
class WebTextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ---- NormalizeUtf8Text -------------------------------------------------

  /** Independent reference for the declarative contract
    * (strip_accents∘lower∘collapse): regex-based, a different code path
    * from the expression's single-pass loop. */
  private def normRef(s: String): String =
    java.text.Normalizer
      .normalize(s.toLowerCase(java.util.Locale.ROOT),
        java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")
      .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ")
      .trim

  private def normViaSpark(inputs: Seq[String]): Seq[String] =
    inputs.toDF("s")
      .select(WebText.normalizeText(col("s")))
      .collect().map(_.getString(0)).toSeq

  test("normalizeText matches hand-computed vectors") {
    val cases = Seq(
      "  Ångström\tCafé  señor  " -> "angstrom cafe senor",
      "ÁÉÍÓÚ àèìòù ç Ñ" -> "aeiou aeiou c n",
      "Hello   World" -> "hello world", // ASCII fast path
      "" -> "",
      "   " -> "",
      "a\n\nb\rc" -> "a b c")
    val got = normViaSpark(cases.map(_._1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g == want, s"case $i")
    }
  }

  test("normalizeText agrees with the independent regex reference") {
    val inputs = Seq(
      "Überraschung im FRÜHJAHR", "étude précise", // decomposed input
      "tab\tand  runs \n of space", "já é tão fácil", "MiXeD Case ASCII",
      "ñandú çedilla ÏË")
    assert(normViaSpark(inputs) == inputs.map(normRef))
  }

  test("normalizeText null-propagates") {
    val got = Seq((1, Option.empty[String]), (2, Some("Á")))
      .toDF("id", "s")
      .select(WebText.normalizeText(col("s")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(null, "a"))
  }

  // ---- substringDedup ----------------------------------------------------

  test("substringDedup removes later occurrences of duplicated k-spans") {
    // doc 1: source of the span; doc 2: exact copy (everything removed);
    // doc 3: shares exactly the 4-token span "e f g h" at offset 3;
    // doc 4: internally periodic (self-dedup after the first period);
    // doc 5: shorter than k (untouched).
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y z e f g h w v u"),
      (4L, "p q r s p q r s p q r s"),
      (5L, "t u v")).toDF("doc_id", "text")
    val out = TextAnalysis.substringDedup(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    def m(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(1L) == ((10L, 0L, m("a b c d e f g h i j"))))
    assert(out(2L) == ((10L, 10L, m(""))))
    // doc 3: dup gram start at pos 3 covers tokens 3..6 → "e f g h" gone
    assert(out(3L) == ((10L, 4L, m("x y z w v u"))))
    // doc 4: starts 4..8 cover tokens 4..11 → first period survives
    assert(out(4L) == ((12L, 8L, m("p q r s"))))
    assert(out(5L) == ((3L, 0L, m("t u v"))))
  }

  test("substringDedup keeps the smallest (doc, pos) occurrence " +
      "regardless of input order") {
    // Reversed input order must not change which copy survives.
    val docs = Seq(
      (9L, "m n o p q r s t"),
      (2L, "m n o p q r s t")).toDF("doc_id", "text")
    val out = TextAnalysis
      .substringDedup(docs.repartition(5), "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(2L) == 0L, "doc 2 is first in (doc,pos) order — kept")
    assert(out(9L) == 8L, "doc 9 loses every token")
  }

  // ---- HTML extraction ---------------------------------------------------

  test("htmlUnescape decodes the fixed entity set without cascading") {
    val got = Seq("&amp;lt; &lt; &gt; &quot; &#39; a&nbsp;b &amp;")
      .toDF("s").select(WebText.htmlUnescape(col("s")))
      .collect().head.getString(0)
    // "&amp;lt;" is the TEXT "&lt;", not a second-round "<"
    assert(got == "&lt; < > \" ' a b &")
  }

  test("htmlVisibleText drops script/style/nav bodies and keeps prose") {
    val html = "<html><head><title>T</title><style>p { color: red; }" +
      "</style></head><body><nav><a href=\"/x\">menu</a></nav>" +
      "<script type=\"text/javascript\">var secret=42;</script>" +
      "<p>Keep &quot;this&quot; text.</p></body></html>"
    val row = Seq(html).toDF("h")
      .select(WebText.htmlVisibleText(col("h")).as("body"),
        WebText.htmlTitle(col("h")).as("title"),
        WebText.htmlLinkCount(col("h")).as("links"))
      .collect().head
    assert(row.getString(0) == "T Keep \"this\" text.")
    assert(row.getString(1) == "T")
    assert(row.getLong(2) == 1L)
    assert(!row.getString(0).contains("secret"))
    assert(!row.getString(0).contains("color"))
    assert(!row.getString(0).contains("menu"))
  }

  // ---- exportAssign ------------------------------------------------------

  test("exportAssign is invariant under repartitioning and in range") {
    val df = spark.range(0, 500).toDF("doc_id")
    def draw(parts: Int): Set[(Long, Long, String)] =
      Sampling.exportAssign(df.repartition(parts), "doc_id", 8, "seedX")
        .select(col("doc_id"), col("shard_id"), col("_ord"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    val a = draw(1)
    assert(a == draw(7), "assignment must be a pure function of content")
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    // a different seed is a different permutation
    val b = Sampling.exportAssign(df, "doc_id", 8, "seedY")
      .select(col("doc_id"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b != a.map { case (id, s, _) => (id, s) })
  }

  // ---- removeBoilerplateLines ---------------------------------------------

  test("boilerplate lines: threshold is distinct-DOC count, intra-doc " +
    "duplicates neither trigger removal nor are collapsed") {
    // 'footer' in exactly 3 docs (≥3 → removed); 'navbar' in 2 (kept);
    // doc 1 repeats its own unique line twice (kept twice — occurrence
    // count must not masquerade as doc count, and dedup-within-doc is
    // NOT this operator's job).
    val pages = Seq(
      (1L, "alpha\nalpha\nfooter\nnavbar"),
      (2L, "beta\nfooter\nnavbar"),
      (3L, "gamma\nfooter")).toDF("doc_id", "page")
    val got = WebText.removeBoilerplateLines(pages, minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_kept", "n_removed", "clean_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
    // byte-exact cleaned text for doc 1: both alpha copies, order kept
    val md = WebText.removeBoilerplateLines(pages, minDocs = 3)
      .filter(col("doc_id") === 1).select("clean_md5").head().getString(0)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha\nalpha\nnavbar".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md == want)
  }

  test("boilerplate lines: empty heavy set leaves every page untouched " +
    "and the plan broadcasts (no sort-merge join)") {
    val pages = Seq((1L, "a\nb"), (2L, "c")).toDF("doc_id", "page")
    val out = WebText.removeBoilerplateLines(pages, minDocs = 99)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_removed"))
      .head().getLong(0) == 0L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus side must not sort:\n$plan")
  }

  test("boilerplate lines: a template-farm heavy set above the broadcast " +
    "bound takes the join fallback with identical results") {
    // Adversarial distribution: 40 template lines each in ≥3 docs — at
    // maxBroadcastLines=8 the heavy set exceeds the bound, so the
    // operator must switch to the explode+join+reassemble path. Every
    // output (counts AND byte-exact clean_md5, including a doc whose
    // every line is boilerplate) must match the broadcast path.
    val farm = (1L to 30L).map { d =>
      val shared = (0 until 40).map(t => s"template line ${(d + t) % 40}")
      (d, (shared :+ s"organic content of doc $d").mkString("\n"))
    } :+ (99L, "template line 0\ntemplate line 1") // all-boilerplate doc
    val pages = farm.toDF("doc_id", "page")
    def rows(maxBcast: Int) =
      WebText.removeBoilerplateLines(pages, minDocs = 3, maxBcast)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
    val viaBroadcast = rows(1 << 22)
    val viaJoin = rows(8)
    assert(viaJoin == viaBroadcast)
    // sanity: the template farm really is a big heavy set
    assert(viaBroadcast.find(_._1 == 1L).get._3 == 40L)
    assert(viaBroadcast.find(_._1 == 99L).get._2 == 0L) // nothing kept
  }
}
