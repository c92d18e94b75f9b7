package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.engine._
import org.apache.spark.sql.graft.VectorFunctions

/** Differential tests: the native codegen'd DotProduct must agree
  * bit-for-bit with the built-in higher-order-function formulation on
  * real data (both are sequential left-to-right double sums). */
class VectorExpressionsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("native dot == HOF dot on every embedding pair (bit-exact)") {
    val e = Similarity.prep(Tables.table(spark, sf, "embeddings"))
      .filter(col("vec_id") < 40)
    val a = e.select(col("vec_id").as("a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"))
    val both = a.crossJoin(b).filter(col("a") < col("b"))
      .select(
        Similarity.dot(col("va"), col("vb")).as("native"),
        Similarity.dotHof(col("va"), col("vb")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 700) // sanity: the compare actually ran
  }

  test("native dot: nulls, empties, and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),   // 11.0
      (Seq.empty[Double], Seq(1.0)),    // 0.0 (common prefix empty)
      (Seq(1.0, 2.0, 9.0), Seq(2.0, 3.0)) // 8.0 (common prefix)
    ).toDF("x", "y")
    val got = df.select(VectorFunctions.dotNative(col("x"), col("y")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(11.0, 0.0, 8.0))
    // null array → null out
    val n = df.select(VectorFunctions.dotNative(lit(null).cast("array<double>"),
      col("y")).as("d")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("native ngram logit == declarative md5 fold on real documents " +
      "(bit-exact), including edge token arrays") {
    // The q133 contract: HashedNgramLogit streams md5 over token bytes;
    // the oracle replays the declarative aggregate() fold. Any drift in
    // bucket math (hex vs bytes, pmod, bigram join char) breaks here
    // before it ever reaches the driver's hash compare.
    import org.apache.spark.sql.graft.ScorerFunctions
    val w = TextAnalysis.scorerWeights()
    val docs = Tables.table(spark, sf, "documents")
      .withColumn("toks", TextAnalysis.tokens(lower(trim(col("text")))))
      .withColumn("grams", TextAnalysis.ngramGrams("toks"))
      .select(
        ScorerFunctions.ngramLogitNative(col("toks"), w).as("native"),
        TextAnalysis.hashedNgramLogit("grams", w).as("fold"),
        (expr("CASE WHEN size(toks) >= 2 THEN 2 * size(toks) - 1 " +
          "ELSE size(toks) END")).cast("long").as("n_fast"),
        size(col("grams")).cast("long").as("n_grams"))
    assert(docs.filter(col("native") =!= col("fold")).count() == 0)
    assert(docs.filter(col("n_fast") =!= col("n_grams")).count() == 0)
    assert(docs.count() > 100)

    import spark.implicits._
    // single token (no bigrams), empty-string token (split of blank),
    // unicode multibyte, repeated tokens
    val edge = Seq(
      Seq("solo"), Seq(""), Seq("héllo", "wörld", "héllo"),
      Seq("a", "b", "a", "b", "a")).toDF("toks")
      .withColumn("grams", TextAnalysis.ngramGrams("toks"))
      .select(
        ScorerFunctions.ngramLogitNative(col("toks"), w).as("native"),
        TextAnalysis.hashedNgramLogit("grams", w).as("fold"))
    assert(edge.filter(col("native") =!= col("fold")).count() == 0)
    // null array and null element both poison to null
    val nulls = Seq(1).toDF("i").select(
      ScorerFunctions.ngramLogitNative(
        lit(null).cast("array<string>"), w).as("na"),
      ScorerFunctions.ngramLogitNative(
        array(lit("x"), lit(null).cast("string")), w).as("ne"))
    val r = nulls.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native ngram logit: codegen == interpreted") {
    import org.apache.spark.sql.graft.ScorerFunctions
    import spark.implicits._
    val w = TextAnalysis.scorerWeights()
    val df = (0 until 200).map(i =>
      Seq.tabulate(1 + i % 7)(j => s"tok${i}_$j")).toDF("toks")
    def total(): Long =
      df.select(sum(ScorerFunctions.ngramLogitNative(col("toks"), w)))
        .head().getLong(0)
    val withCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val expected = total()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(expected == total())
    finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegen)
  }

  test("native gram hashes == declarative md5-of-slice transform on " +
      "real documents (bit-exact), codegen == interpreted") {
    import org.apache.spark.sql.graft.GramFunctions
    val docs = Tables.table(spark, sf, "documents")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    Seq(2, 3, 8).foreach { k =>
      val both = docs.select(
        GramFunctions.gramHashes(col("toks"), k).as("native"),
        when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            i => md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
          .otherwise(array().cast("array<string>")).as("decl"))
      assert(both.filter(not(col("native") <=> col("decl"))).count() == 0,
        s"k=$k diverged from the declarative contract")
    }
    // null element poisons; null array propagates; short doc → empty
    import spark.implicits._
    val edge = Seq(
      (1L, Seq("a", "b")), (2L, Seq("only"))).toDF("id", "toks")
      .select(GramFunctions.gramHashes(col("toks"), 3))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(edge.forall(s => s != null && s.isEmpty))
    val nul = Seq(1).toDF("x")
      .select(GramFunctions.gramHashes(lit(null).cast("array<string>"), 3))
      .collect().head
    assert(nul.isNullAt(0))
    val withCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    def sig(): Long = docs
      .select(explode(GramFunctions.gramHashes(col("toks"), 8)).as("g"))
      .agg(sum(length(col("g")))).head().getLong(0)
    val expected = sig()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(expected == sig())
    finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegen)
  }

  test("whole-stage codegen compiles the native expression (no fallback)") {
    // ExpressionEvalHelper-style check: force both codegen and interpreted
    // paths and compare.
    import spark.implicits._
    val df = (0 until 100).map(i =>
      (Seq.tabulate(8)(j => (i * 8 + j) * 0.25), Seq.tabulate(8)(j => 1.0 / (j + 1))))
      .toDF("x", "y")
    val withCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val expected = df.select(sum(VectorFunctions.dotNative(col("x"), col("y"))))
      .head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(sum(VectorFunctions.dotNative(col("x"), col("y"))))
        .head().getDouble(0)
      assert(expected == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegen)
  }

  test("native bpe piece count == declarative fold chain on real " +
      "documents and adversarial merge words") {
    // The q135 contract: BpePieceCount compacts one symbol buffer in
    // place; the oracle replays TextAnalysis.bpePieceCount's nested
    // aggregate folds. Greedy left-to-right tie handling ("aaa" with
    // (a,a) → [aa, a]), merge-result chaining ((a,b) then (ab,c)),
    // the instr guard boundary, and code-point segmentation must all
    // agree before the driver's hash compare ever sees them.
    import org.apache.spark.sql.graft.BpeFunctions
    import graft.engine.TextQueries
    val merges = TextAnalysis.bpeTrainRef(
      TextQueries.BpeWords, nMerges = 8).map { case (_, a, b, _) => (a, b) }
    val docs = Tables.table(spark, sf, "documents")
      .withColumn("toks", TextAnalysis.tokens(lower(trim(col("text")))))
      .select(
        BpeFunctions.bpePieceCountNative(col("toks"), merges).as("native"),
        TextAnalysis.bpePieceCount("toks", merges).as("fold"))
    assert(docs.filter(col("native") =!= col("fold")).count() == 0)
    assert(docs.count() > 50)

    import spark.implicits._
    val adversarial = Seq(
      Seq("aaa", "aaaa"), // greedy tie fold
      Seq("ababab"), // alternating overlap
      Seq("héllo", "wörld"), // multibyte code points
      Seq(""), Seq("x"),
      Seq("abcabc", "cab")).toDF("toks")
    val advMerges = Seq(("a", "a"), ("a", "b"), ("ab", "c"))
    val adv = adversarial.select(
      BpeFunctions.bpePieceCountNative(col("toks"), advMerges).as("native"),
      TextAnalysis.bpePieceCount("toks", advMerges).as("fold"))
    assert(adv.filter(col("native") =!= col("fold")).count() == 0)
    // null array / null element poison to null, matching the fold
    val nulls = Seq(1).toDF("i").select(
      BpeFunctions.bpePieceCountNative(
        lit(null).cast("array<string>"), advMerges).as("na"),
      BpeFunctions.bpePieceCountNative(
        array(lit("ok"), lit(null).cast("string")), advMerges).as("ne"))
    val r = nulls.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native bpe piece count: codegen == interpreted") {
    import org.apache.spark.sql.graft.BpeFunctions
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "a"), ("t", "h"))
    val df = (0 until 200).map(i =>
      Seq.tabulate(1 + i % 5)(j => s"ab${"a" * (i % 3)}th$j")).toDF("toks")
    def total(): Long =
      df.select(sum(BpeFunctions.bpePieceCountNative(col("toks"), merges)))
        .head().getLong(0)
    val withCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val expected = total()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(expected == total())
    finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegen)
  }

  test("native minhash slots == declarative md5/conv contract (bit-exact), " +
    "codegen == interpreted") {
    import spark.implicits._
    val P = org.apache.spark.sql.graft.MinHashSlots.P
    // real shingles + edge strings (empty, multibyte, 1 char)
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val strs = Dedup.shingleDf(docs, "doc_id", "text", n = 3)
      .select(col("sh")).distinct()
      .unionByName(Seq("", "中文 шингл", "a").toDF("sh"))
    // The ORACLE form of MinHashSlots.slots, in built-in expressions:
    // a/b from the md5 hex prefix, slot_i = (a + i·b) mod P.
    val m = md5(col("sh"))
    val staged = strs.select(col("sh"), m.as("m"))
      .select(col("sh"),
        (conv(substring(col("m"), 1, 8), 16, 10).cast("long") % P).as("ha"),
        (conv(substring(col("m"), 9, 8), 16, 10).cast("long") % (P - 1) + 1)
          .as("hb"))
    val declared = staged.select(col("sh"),
      array((0 until 64).map(i =>
        (col("ha") + lit(i.toLong) * col("hb")) % P): _*).as("want"))
    val both = declared.withColumn("got",
      org.apache.spark.sql.graft.VectorFunctions.minhashSlots(col("sh"), 64))
    assert(both.filter(not(col("got") <=> col("want"))).isEmpty,
      "native slots diverge from the declarative md5/conv contract")
    val withCodegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    def sig(): Seq[Row] = both.select(col("sh"), col("got"))
      .orderBy("sh").collect().toSeq
    val compiled = sig()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(compiled == sig())
    finally spark.conf.set("spark.sql.codegen.wholeStage", withCodegen)
  }
}
