package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression}
import graft.engine._

/** Winnowing fingerprint assertions: value-level against an independent
  * Scala reference implementation, and PLAN-level against the nested-HOF
  * shape that hung the round-7 bench (grams re-evaluated per window —
  * O(n²) interpreted evals). The plan test is the regression gate: if
  * CollapseProject ever learns to inline the staged gram array back into
  * the minima lambda, it fails before the bench does. */
class TextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference winnowing: same normalization, same binary-order minima.
    * ASCII-only inputs so Java String order == UTF-8 binary order. */
  private def winnowRef(text: String, k: Int, w: Int): Set[String] = {
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val grams = (0 to norm.length - k).map(i => norm.substring(i, i + k))
    (0 to grams.length - w).map(j => grams.slice(j, j + w).min).toSet
  }

  private val docs = Seq(
    (1L, "The quick  brown fox Jumps over the lazy dog near the river bank"),
    (2L, "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz"),
    (3L, "to be or not to be that is the question whether tis nobler"))

  test("winnowStaged matches the reference implementation") {
    val out = TextAnalysis
      .winnowStaged(docs.toDF("doc_id", "text"), col("text"), 8, 4, "fps")
      .select(col("doc_id"), col("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == winnowRef(text, 8, 4), s"doc $id")
    }
  }

  test("winnowStaged guarantee: shared substrings of length ≥ k+w-1 share a fingerprint") {
    val shared = "common shared fragment of respectable length here"
    val a = s"left prefix junk $shared and an unrelated tail xyz"
    val b = s"totally different opening words $shared closing remarks"
    assert((winnowRef(a, 8, 4) & winnowRef(b, 8, 4)).nonEmpty)
    val out = TextAnalysis
      .winnowStaged(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        col("text"), 8, 4, "fps")
      .select(col("fps")).collect().map(_.getSeq[String](0).toSet)
    assert((out(0) & out(1)).nonEmpty)
  }

  test("optimized plan keeps grams staged — no ArrayTransform nested in the minima lambda") {
    val df = TextAnalysis
      .winnowStaged(docs.toDF("doc_id", "text"), col("text"), 8, 4, "fps")
      .select(col("doc_id"), size(col("fps")).as("n_fp"))
    def hasNestedTransform(e: Expression): Boolean = e match {
      case ArrayTransform(_, fn) =>
        fn.exists(_.isInstanceOf[ArrayTransform]) ||
          fn.children.exists(hasNestedTransform)
      case other => other.children.exists(hasNestedTransform)
    }
    val nested = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.exists(hasNestedTransform)
    }.exists(identity)
    assert(!nested,
      "gram transform was inlined into the window-minima lambda — " +
        "O(n²) re-evaluation (the round-7 bench killer)")
  }

  test("dupGramRatioExpr == duplicateGramRatio on >=n-word docs; 0.0 below") {
    val corpus = docs ++ Seq(
      (4L, "spam spam spam spam spam spam spam spam"),
      (5L, "one two"), // < 3 words: expr scores 0.0, staged form drops it
      (6L, "a b a b a b a b a b a b"))
    val viaExpr = corpus.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.dupGramRatioExpr(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaStaged = TextAnalysis
      .duplicateGramRatio(corpus.toDF("doc_id", "text"), 3, "r")
      .select(col("doc_id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!viaStaged.contains(5L) && viaExpr(5L) == 0.0)
    viaStaged.foreach { case (id, r) =>
      assert(viaExpr(id) == r, s"doc $id: expr ${viaExpr(id)} != staged $r")
    }
    assert(viaExpr(4L) > 0.8 && viaExpr(6L) > 0.5) // planted repetition seen
  }

  test("a filter on dupGramRatioExpr never evaluates split inside a lambda") {
    // The pushdown-immunity contract: push this filter through any
    // projection stack, inline it anywhere — the tokenization must stay
    // the outer lambda's ARGUMENT (once per row), never migrate into a
    // lambda body (once per element = O(n²), the q108 pre-fix plan).
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .filter(TextAnalysis.dupGramRatioExpr(col("text"), 3) <= 0.05)
      .select(col("doc_id"), col("n"))
    def splitInLambda(e: Expression): Boolean = e match {
      case ArrayTransform(_, fn) =>
        fn.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.StringSplit]) ||
          fn.children.exists(splitInLambda)
      case other => other.children.exists(splitInLambda)
    }
    val bad = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.exists(splitInLambda)
    }.exists(identity)
    assert(!bad,
      "split() migrated inside a lambda body — per-element " +
        "re-tokenization (O(n²) per row) survived optimization")
  }

  test("segmentDedup strips cross-document sentences, keeps organic text, " +
      "never drops a document") {
    val corpus = Seq(
      (1L, "unique opening one. shared boilerplate footer. unique tail one"),
      (2L, "unique opening two. shared boilerplate footer"),
      (3L, "shared boilerplate footer. unique tail three"),
      (4L, "entirely original content with no footer"),
      // every segment boilerplate → rebuilt text must be EMPTY, row kept
      (5L, "shared boilerplate footer"),
      // repeated WITHIN one doc only — count is per DISTINCT doc, so a
      // doc-internal repetition must NOT count toward the threshold
      (6L, "local echo. local echo. local echo. and something else")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.segmentDedup(corpus, "doc_id", col("text"), 3)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(1L) == ((3L, 1L, m("unique opening one. unique tail one"))))
    assert(out(2L) == ((2L, 1L, m("unique opening two"))))
    assert(out(3L) == ((2L, 1L, m("unique tail three"))))
    assert(out(4L) == ((1L, 0L, m("entirely original content with no footer"))))
    assert(out(5L) == ((1L, 1L, m(""))), "all-boilerplate doc must survive as empty")
    assert(out(6L) == ((4L, 0L, m("local echo. local echo. local echo. and something else"))),
      "doc-internal repetition counted toward the cross-doc threshold")
  }

  test("segmentDedup above the broadcast bound drops the hint and " +
      "returns identical results through the shuffle join") {
    // Template-farm shape: 12 boilerplate sentences shared by ≥3 docs —
    // with maxBroadcastSegs=4 the probed set exceeds the bound, so the
    // join must plan WITHOUT the broadcast hint yet match byte-exact.
    val farm = (1L to 9L).map { d =>
      val shared = (0 until 12).map(t => s"shared sentence ${(d + t) % 12}")
      (d, (shared :+ s"organic sentence of doc $d").mkString(". "))
    }.toDF("doc_id", "text")
    def rows(bound: Int) =
      TextAnalysis.segmentDedup(farm, "doc_id", col("text"), 3, bound)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
    val viaBroadcast = rows(1 << 22)
    val viaShuffle = rows(4)
    assert(viaShuffle == viaBroadcast)
    assert(viaBroadcast.head._3 == 12L, "all 12 templates removed")
  }

  test("sharedNgrams finds planted overlap, ignores clean docs, and is " +
      "safe on sub-n documents") {
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val candidates = Seq(
      // contains eval 4-gram "gamma delta epsilon zeta" twice
      (1L, "x gamma delta epsilon zeta y gamma delta epsilon zeta"),
      (2L, "totally unrelated words in this candidate document here"),
      (3L, "eta theta"), // shorter than n — the sequence guard path
      (4L, "beta gamma delta epsilon mixed")
    ).toDF("doc_id", "text")
    val hits = TextAnalysis.sharedNgrams(candidates, evalDocs, "doc_id", "text", 4)
      .groupBy("doc_id").agg(countDistinct("gram_h").as("n"),
        count(lit(1)).as("occurrences"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hits.keySet == Set(1L, 4L))
    assert(hits(1L) == ((1L, 2L)),
      "both occurrences of the shared gram must surface, one distinct hash")
    assert(hits(4L) == ((1L, 1L))) // "beta gamma delta epsilon"
  }

  test("unigramSurprisal: common tokens score low, rare high, OOV floored, " +
      "vocab cap binds") {
    // 10 docs of "common common", one "rare unique" — N = 22 tokens:
    // common c=20, rare c=1, unique c=1.
    val corpus = ((1L to 10L).map(i => (i, "common common")) :+
      ((11L, "rare unique"))).toDF("doc_id", "text")
    def score(vocabSize: Int): Map[Long, (Long, Double)] =
      TextAnalysis.unigramSurprisal(corpus, "doc_id", "text", vocabSize)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    val full = score(vocabSize = 3)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(full(1L) == ((2L, r4(-math.log(20.0 / 22)))))
    assert(full(11L) == ((2L, r4(-math.log(1.0 / 22)))))
    assert(full(1L)._2 < full(11L)._2, "common must score below rare")
    // vocab capped at 1 → only `common` in vocab; rare/unique fall to
    // the 0.5/N OOV floor and must score ABOVE every in-vocab token
    val capped = score(vocabSize = 1)
    assert(capped(11L) == ((2L, r4(-math.log(0.5 / 22)))))
    assert(capped(1L) == full(1L), "in-vocab score must not move with the cap")
  }

  test("packSequences: bins respect the running token budget and the " +
      "packing is repartition-invariant") {
    // one shard (shards=1) so the fill order is the full hash order —
    // budget 10 tokens, docs of 4 tokens each: bins hold offsets
    // 0,4,8 (bin 0 — doc straddling 10 starts at 8, spillover), 12,...
    val corpus = (1L to 9L)
      .map(i => (i, s"tok a b c$i")).toDF("doc_id", "text")
    val out = TextAnalysis
      .packSequences(corpus, "doc_id", "text", budget = 10, shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._4 == 4L))
    // reconstruct: in hash order, bin must equal floor(offset/10)
    val binsBySize = out.groupBy(_._3).view.mapValues(_.length).toMap
    // 9 docs × 4 tokens = offsets 0..32 step 4 → bins 0,0,0,1,1,2,2,2,3
    assert(binsBySize == Map(0L -> 3, 1L -> 2, 2L -> 3, 3L -> 1), s"$binsBySize")
    val out2 = TextAnalysis
      .packSequences(corpus.repartition(5), "doc_id", "text", 10, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq,
      "packing moved under repartition")
  }

  test("invertedIndex: exact df, postings capped pre-collect, one shuffle") {
    import spark.implicits._
    // 'stop' appears in every doc — with maxPostings=2 its buffer must
    // hold 2 ids while its df still counts all 40
    val corpus = (1L to 40L).map(i => (i, "stop " + "u" * i.toInt +
      (if (i <= 3) " shared" else ""))).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(corpus, "doc_id", "text", 2)
    val got = idx.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
      .toMap
    assert(got("stop") == ((40L, List(1L, 2L))), s"${got("stop")}")
    assert(got("shared") == ((3L, List(1L, 2L))))
    assert(got("u" * 7) == ((1L, List(7L))))
    assert(got.size == 42)
    // plan: the ranking window's hashpartitioning(tok) must be REUSED by
    // the aggregation — exactly one exchange end to end, and the cap is
    // a pre-aggregation filter, not a post-collect slice
    // AQE toString prints Final AND Initial sections — count only Final
    val exec = idx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val nEx = "Exchange [a-z]".r.findAllIn(exec).length
    assert(nEx == 1, s"expected 1 exchange, got $nEx:\n$exec")
    assert(exec.contains("row_number"), "cap must rank before the collect")
  }

  test("bigramSurprisal: interpolated probabilities are closed-form " +
      "exact; sub-2-token docs drop; common transitions score lower") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c", "a" — uni: a×4 b×2 c×1, N = 7;
    // pairs: (a,b)×2, (a,c)×1; cc(a) = 3
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(corpus, "doc_id", "text", 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAB = -math.log(0.7 * 2.0 / 3 + 0.3 * 2.0 / 7)
    val sAC = -math.log(0.7 * 1.0 / 3 + 0.3 * 1.0 / 7)
    assert(got == Map(1L -> ((1L, r4(sAB))), 2L -> ((1L, r4(sAB))),
      3L -> ((1L, r4(sAC)))), s"$got")
    assert(!got.contains(4L), "a 1-token doc has no transitions")
    assert(got(1L)._2 < got(3L)._2, "the common transition must score lower")
  }

  test("bm25TopK: scores match the closed-form formula, zero-hit docs " +
      "drop, rarer terms weigh more") {
    import spark.implicits._
    // 4 docs, query = (x, y): x in docs 1,2; y only in doc 2 (rarer);
    // doc 3 has neither and must not appear; doc 4 pads N and avgdl
    val corpus = Seq(
      (1L, "x a b c"), (2L, "x y a b"), (3L, "a b c d"), (4L, "a b")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .bm25TopK(corpus, "doc_id", "text", Seq("x", "y"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def bm25(tf: Double, df: Long, dl: Long): Double = {
      val n = 4.0; val avgdl = (4 + 4 + 4 + 2) / 4.0
      math.log(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r4(bm25(1, 2, 4))
    val s2 = r4(bm25(1, 2, 4) + bm25(1, 1, 4))
    assert(got == Seq((2L, s2), (1L, s1)), s"$got")
    assert(bm25(1, 1, 4) > bm25(1, 2, 4), "rarer term must out-weigh")
  }

  test("bpePairStats: pair counts weight by word frequency, explode over " +
      "vocab not corpus, 1-char words safe") {
    import spark.implicits._
    // "ab" ×3, "abc" ×2, "a" ×4 (must not explode), "" via whitespace
    val corpus = Seq(
      (1L, "ab ab a a"), (2L, "ab abc a"), (3L, "abc a  ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(corpus, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ab: 3 (from "ab") + 2 (from "abc") = 5; bc: 2
    assert(got == Seq(("ab", 5L), ("bc", 2L)))
    // the pair explosion's Generate must sit above the word-frequency
    // aggregate — pairs are counted over VOCAB rows, not corpus rows
    val plan = TextAnalysis.bpePairStats(corpus, "text", 10)
      .queryExecution.optimizedPlan
    def generateAboveAggregate(
        p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        seenGenerate: Boolean): Boolean = p match {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
          if g.generator.prettyName == "explode" &&
            g.output.exists(_.name == "pair") =>
        g.children.exists(generateAboveAggregate(_, seenGenerate = true))
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        seenGenerate || a.children.exists(generateAboveAggregate(_, false))
      case other =>
        other.children.exists(generateAboveAggregate(_, seenGenerate))
    }
    assert(generateAboveAggregate(plan, seenGenerate = false),
      s"pair explode must run over the aggregated vocab:\n$plan")
  }

  test("bpeTrain matches the sequential reference trainer and is " +
      "invariant under repartitioning") {
    import spark.implicits._
    // overlapping-pair ("aaaa"), tie-break, and multi-round fusion cases
    val words = Seq("aaaa" -> 4L, "aab" -> 3L, "abab" -> 3L,
      "banana" -> 2L, "bandana" -> 2L, "low" -> 5L, "lower" -> 2L)
    def run(parts: Int): Seq[(Int, String, String, Long)] =
      TextAnalysis.bpeTrain(words.toDF("w", "wc").repartition(parts), 6)
        .orderBy("step")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val ref = TextAnalysis.bpeTrainRef(words, 6)
    assert(run(1) == ref)
    assert(run(7) == ref) // partitioning must not move any merge
    // greedy left-to-right fusion: "aaaa" + (a,a) gives aa|aa, never a
    // 3-wide overlap — visible in the round-2 stats the ref encodes
    assert(ref.head._2 == "a" && ref.head._3 == "a")
  }
}
