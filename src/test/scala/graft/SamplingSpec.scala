package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Properties of content-keyed sampling that the DuckDB oracle can't
  * express: invariance under layout, stability under corpus growth, and
  * approximate stratum fractions. */
class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.table(spark, sf, "documents")

  test("split assignment is invariant under repartition/reorder") {
    val a = Sampling.assignSplit(docs, 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shuffled = docs.repartition(17).sortWithinPartitions(col("text"))
    val b = Sampling.assignSplit(shuffled, 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("growing the corpus never moves an existing doc between splits") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val onHalf = Sampling.assignSplit(half, 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val onFull = Sampling.assignSplit(docs, 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    onHalf.foreach { case (id, s) => assert(onFull(id) == s, s"doc $id moved") }
  }

  test("sample fractions approximate their stratum targets") {
    val total = docs.count().toDouble
    val kept = Sampling.stratifiedSample(docs, "source",
      Map.empty, defaultPct = 30).count().toDouble
    // one md5 bucket in [0,100) per doc; binomial tolerance at n≈500
    assert(math.abs(kept / total - 0.30) < 0.08,
      s"kept ${kept / total} of corpus for a 30% target")
  }

  test("stratified sample applies per-stratum thresholds") {
    val sampled = Sampling.stratifiedSample(docs, "source",
      Map("src0" -> 100), defaultPct = 0)
    // src0 keeps everything, every other stratum nothing
    assert(sampled.filter(col("source") =!= "src0").count() == 0)
    assert(sampled.count() == docs.filter(col("source") === "src0").count())
  }

  test("weighted sample favors heavy rows, is size-k, and is invariant " +
      "under repartition") {
    import TestSpark.spark.implicits._
    // 1000:1 weight ratio — a light row outranks a heavy one with
    // probability 1/1001 per pair (A-ES), so the top-20 is essentially
    // all heavy class; deterministic content hash makes the assertion
    // exact and permanent, not statistical per run.
    val df = (0 until 200).map(i =>
      (i.toLong, s"document body number $i",
        if (i < 100) 1000.0 else 1.0)).toDF("doc_id", "text", "w")
    val s1 = Sampling.weightedSample(df, col("w"), 20, "doc_id")
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(df.repartition(7), col("w"), 20, "doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(s1.length == 20)
    assert(s1.sorted == s2.sorted, "sample set moved under repartition")
    val heavy = s1.count(_ < 100)
    assert(heavy >= 18, s"heavy-class rows in sample: $heavy/20")
  }

  test("proportionalMix fills exact per-source quotas, capped at source " +
      "size, invariant under repartition") {
    import TestSpark.spark.implicits._
    // srcA w=1 n=100, srcB w=3 n=100, srcC w=2 n=4 (forces the cap):
    // budget = floor(204*0.5) = 102, Σw = 6 → quotas 17 / 51 / min(4,34)=4
    val docs = ((0 until 100).map(i => (i.toLong, "srcA", s"alpha document $i")) ++
      (0 until 100).map(i => (i.toLong + 100, "srcB", s"beta document $i")) ++
      (0 until 4).map(i => (i.toLong + 200, "srcC", s"gamma document $i")))
      .toDF("doc_id", "source", "text")
    val weight = when(col("source") === "srcA", 1)
      .when(col("source") === "srcB", 3).otherwise(2)
    val out = Sampling.proportionalMix(docs, "source", weight, 0.5, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("srcA" -> 17, "srcB" -> 51, "srcC" -> 4), s"got $bySrc")
    // ranks are 1..quota within each source
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, src)
    }
    val out2 = Sampling.proportionalMix(docs.repartition(13), "source",
      weight, 0.5, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq,
      "drawn set moved under repartition")
  }

  test("weightedSamplePerGroup draws exactly k per stratum, favors " +
      "heavy rows, and is repartition-invariant") {
    import TestSpark.spark.implicits._
    // two strata; in g1 one row carries 1000× the weight of the rest —
    // across the content-hash draw it must essentially always survive
    val docs = ((0 until 50).map(i => (i.toLong, "g1",
      s"doc one $i", if (i == 7) 1000L else 1L)) ++
      (0 until 50).map(i => (i.toLong + 100, "g2", s"doc two $i", 1L)))
      .toDF("doc_id", "grp", "text", "w")
    def draw(df: org.apache.spark.sql.DataFrame) = Sampling
      .weightedSamplePerGroup(df, "grp", col("w"), k = 3, idCol = "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = draw(docs)
    val byGrp = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp == Map("g1" -> 3, "g2" -> 3), s"$byGrp")
    assert(got.map(_._1).contains(7L),
      "the 1000x-weighted row must be drawn")
    assert(draw(docs.repartition(11)).sortBy(_._1) == got.sortBy(_._1),
      "drawn set moved under repartition")
  }
}
