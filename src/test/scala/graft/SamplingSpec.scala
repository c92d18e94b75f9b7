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
}
