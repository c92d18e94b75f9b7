package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Planted-duplicate assertions for the sketch-based dedup operators
  * (MinHash-LSH, SimHash) that the DuckDB oracle can't replay. The
  * corpus ALSO contains natural near-duplicates (trigram Jaccard
  * 0.89-0.99), so recall assertions are subset-based, plus precision
  * assertions on the verified metric. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.table(spark, sf, "documents")

  private def plantedPairs(mod: Int, offset: Long): Set[(Long, Long)] =
    docs.filter(col("doc_id") % mod === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(d => (d, d + offset)).toSet

  test("exactDedup folds planted copies and keeps the smallest id") {
    val out = Dedup.exactDedup(Dedup.plantedExact(docs), "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = docs.count()
    val planted = docs.filter(col("doc_id") % 7 === 0).count()
    assert(out.length == total) // every planted copy folded into its original
    assert(out.count(_._3 == 2L) == planted)
    assert(out.forall(_._2 < 10000L)) // keeper is always the original
  }

  test("MinHash-LSH finds every planted near-dup pair; survivors verify") {
    val pairs = Dedup.nearDupPairs(Dedup.plantedNear(docs), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = plantedPairs(5, 20000L)
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(found), s"missing: ${expected -- found}")
    // precision: everything reported passed the EXACT Jaccard verify
    assert(pairs.forall(_._3 >= 0.5))
    // 3 junk tokens on the shortest (~10-token) docs still give ≥ 0.65
    assert(pairs.filter(p => expected((p._1, p._2))).forall(_._3 >= 0.65))
    // the extras are the corpus's natural near-dups, e.g. 474↔498
    assert(found((474L, 498L)))
  }

  test("SimHash finds the strong natural near-dups within Hamming 4") {
    val pairs = Dedup.simhashPairs(
      Dedup.simhash60(docs, "doc_id", "text"), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // near-identical natural pairs (measured TF-simhash Hamming ≤ 1)
    val strong = Set((474L, 498L), (110L, 467L), (260L, 391L), (144L, 161L))
    assert(strong.subsetOf(found), s"missing: ${strong -- found}")
    assert(pairs.forall(_._3 <= 4)) // banding contract: verify bound holds
    // unrelated docs (TF-simhash Hamming ~18) never pass; the measured
    // corpus-wide count at Hamming ≤ 4 is 42
    assert(pairs.length < 60)
  }

  test("LSH bucket cap prevents quadratic pair blowup on degenerate corpora") {
    import spark.implicits._
    // 200 identical docs → one bucket of 200 → capped out entirely
    val degenerate = (0 until 200).map(i => (i.toLong, "same text every time"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleDf(degenerate, "doc_id", "text")
    val cand = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(sh), maxBucket = 64)
    assert(cand.count() == 0)
  }

  test("bucket caps truncate membership BEFORE any aggregation buffer") {
    import spark.implicits._
    // The 100 TB failure mode this guards: boilerplate/empty documents
    // all hash to ONE (band, hash) bucket — here 12k identical docs, so
    // the former collect_list-then-filter shape would gather 12k ids
    // (×16 bands) into single aggregation buffers before the size
    // filter could drop them. The capped pipeline must (a) still return
    // zero candidates, and (b) show the row_number window truncation
    // ABOVE the scan and BELOW the collect aggregation in the physical
    // plan, proving per-bucket state is bounded at maxBucket + 1.
    val degenerate = (0 until 12000)
      .map(i => (i.toLong, "boilerplate header text repeated verbatim"))
      .toDF("doc_id", "text")
    val lsh = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(Dedup.shingleDf(degenerate, "doc_id", "text")),
      maxBucket = 64)
    val lshPlan = lsh.queryExecution.executedPlan.toString
    assert(lshPlan.contains("row_number"),
      "LSH candidate plan lost the pre-collect window truncation")
    assert(lsh.count() == 0)
    val sim = Dedup.simhashPairs(
      Dedup.simhash60(degenerate, "doc_id", "text"))
    val simPlan = sim.queryExecution.executedPlan.toString
    assert(simPlan.contains("row_number"),
      "SimHash candidate plan lost the pre-collect window truncation")
    assert(sim.count() == 0)
  }

  test("degenerate flood does not drown real near-dup pairs") {
    import spark.implicits._
    // planted near-dups + a 10k-doc empty flood: every empty doc shares
    // one whole-text shingle → identical signatures → one degenerate
    // bucket per band, dropped by the cap; the planted pairs' buckets
    // are untouched, so recall on real content is unaffected.
    val flood = (0 until 10000).map(i => (100000L + i, "")).toDF("doc_id", "text")
    val corpus = Dedup.plantedNear(docs).unionByName(flood)
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = plantedPairs(5, 20000L)
    assert(expected.subsetOf(pairs.toSet), s"missing: ${expected -- pairs.toSet}")
    assert(pairs.forall { case (a, b) => a < 100000L && b < 100000L },
      "flood ids leaked into the candidate pairs")
  }

  test("connectedComponents: chain, star, isolated node, diameter > 1") {
    import spark.implicits._
    // components: chain 1-2-3-4 (diameter 3 — needs >1 propagation
    // round), star 10-{11,12,13}, isolated 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L).toDF("node")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (13L, 10L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L))
    // edges mentioning nodes outside the vertex set are ignored
    val withStray = edges.union(Seq((4L, 99L)).toDF("a", "b"))
    val got2 = Dedup.connectedComponents(nodes, withStray, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("connectedComponents: materialized spill equals the lazy rebuild, no cache") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("node")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lazyForm = asMap(Dedup.connectedComponents(nodes, edges, "a", "b"))
    val spilled = asMap(Dedup.connectedComponents(nodes, edges, "a", "b",
      materializeDir = Some(TestSpark.tempDir("cc-spill"))))
    assert(spilled == lazyForm)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "CC spill path leaked cached RDDs")
  }

  test("connectedComponents: long path converges by diameter; maxIter fires") {
    import spark.implicits._
    // A 50-node path is the diameter-bound pathology the star-shaped q84
    // fixture never exercises: the min label crosses ONE hop per round,
    // so convergence takes 49 propagation rounds + 1 no-change round —
    // and a maxIter below that must abort loudly, never return a
    // half-propagated labeling as if it were components.
    val n = 50
    val nodes = (1 to n).map(_.toLong).toDF("node")
    val edges = (1 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges, "a", "b", maxIter = n + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to n).map(_.toLong -> 1L).toMap)
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, edges, "a", "b", maxIter = 5)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "connectedComponents leaked cached RDDs on the failure path")
  }

  test("alternating CC matches min-label on mixed components") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L).toDF("node")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (13L, 10L)).toDF("a", "b")
    def asMap(algo: String) =
      Dedup.connectedComponents(nodes, edges, "a", "b", algorithm = algo)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap("alternating") == asMap("min-label"))
    // stray-edge filtering holds for the alternating path too
    val withStray = edges.union(Seq((4L, 99L), (99L, 98L)).toDF("a", "b"))
    val got = Dedup.connectedComponents(nodes, withStray, "a", "b",
      algorithm = "alternating")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == asMap("min-label"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "alternating CC leaked cached RDDs")
  }

  test("alternating CC converges on a long path where min-label exhausts maxIter") {
    import spark.implicits._
    // The giant-component pathology ([[Dedup.connectedComponents]]'s
    // scaladoc): a 300-node path has diameter 299, so min-label needs
    // ~150 double-steps — far past the default budget — while
    // large-star/small-star halves the path each alternation and must
    // land within the SAME default maxIter = 20.
    val n = 300
    val nodes = (1 to n).map(_.toLong).toDF("node")
    val edges = (1 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val minLabelFails = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, edges, "a", "b")
    }
    assert(minLabelFails.getMessage.contains("did not converge"))
    val got = Dedup.connectedComponents(nodes, edges, "a", "b",
      algorithm = "alternating")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to n).map(_.toLong -> 1L).toMap)
    // explicit-dir spill agrees with the default scratch-root spill
    val spilled = Dedup.connectedComponents(nodes, edges, "a", "b",
      algorithm = "alternating",
      materializeDir = Some(TestSpark.tempDir("cc-alt-spill")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spilled == got)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "alternating CC leaked cached RDDs")
  }

  test("dedupAgainstIndex: batch-by-batch result equals full-corpus " +
      "keep-first dedup; a replayed batch is exactly-once") {
    import spark.implicits._
    val idx = TestSpark.tempDir("inc-idx") + "/index"
    // batch ids ordered across drops, so first-arrival == global min id
    val b1 = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "aa bb"))
      .toDF("id", "text") // in-batch dup: 3 folds into 1
    val b2 = Seq((10L, "aa bb"), (11L, "ee ff"), (12L, "ee ff"))
      .toDF("id", "text") // 10 dies against the index, 12 in-batch
    val s1 = Dedup.dedupAgainstIndex(b1, "text", "id", idx, "d1")
      .select("id").as[Long].collect().toSet
    val s2 = Dedup.dedupAgainstIndex(b2, "text", "id", idx, "d2")
      .select("id").as[Long].collect().toSet
    assert(s1 == Set(1L, 2L))
    assert(s2 == Set(11L))
    // ≡ full-corpus keep-first on the union
    val full = Dedup.dedupKeepFirst(b1.unionByName(b2), "text", "id")
      .select("id").as[Long].collect().toSet
    assert(s1 ++ s2 == full)
    // replay of drop 2: same survivors (deduped against the PRE-d2
    // snapshot, not against its own committed fps), and no new version
    val vsBefore = VersionedLake.versions(spark, idx)
    val replay = Dedup.dedupAgainstIndex(b2, "text", "id", idx, "d2")
      .select("id").as[Long].collect().toSet
    assert(replay == s2)
    assert(VersionedLake.versions(spark, idx) == vsBefore)
  }

  test("nearDupAgainstIndex: cross-batch near-copies drop against the " +
      "index, in-batch near-copies drop greedily, fresh docs survive, " +
      "and a replay is exactly-once") {
    import spark.implicits._
    // synthetic corpus with disjoint per-doc vocab: unrelated pairs have
    // Jaccard 0, near-copies (3 junk tokens on 30) ≈ 0.84 — both sides
    // of the 0.75 agreement bar with margin, and fully deterministic
    def mk(i: Int): String = (0 until 30).map(t => s"w${i}_$t").mkString(" ")
    val tail = " zz9 qq8 vv7"
    val idx = TestSpark.tempDir("neardup-idx") + "/index"
    val b1 = (0 until 10).map(i => (i.toLong, mk(i))).toDF("id", "text")
    val b2 = (
      (0 until 5).map(i => (100L + i, mk(i) + tail)) ++ // near index docs
        (0 until 5).map(i => (200L + i, mk(50 + i))) ++ // fresh
        Seq((310L, mk(54) + tail)) // in-batch near-copy of 204
      ).toDF("id", "text")
    val s1 = Dedup.nearDupAgainstIndex(b1, "id", "text", idx, "m1")
      .select("id").as[Long].collect().toSet
    val s2 = Dedup.nearDupAgainstIndex(b2, "id", "text", idx, "m2")
      .select("id").as[Long].collect().toSet
    assert(s1 == (0 until 10).map(_.toLong).toSet)
    assert(s2 == (0 until 5).map(200L + _).toSet)
    // replay of drop 2: same survivors, no new index versions
    val vs = VersionedLake.versions(spark, idx)
    val replay = Dedup.nearDupAgainstIndex(b2, "id", "text", idx, "m2")
      .select("id").as[Long].collect().toSet
    assert(replay == s2)
    assert(VersionedLake.versions(spark, idx) == vs)
    // the committed index holds exactly the survivors' rows (posting
    // keys + signature in ONE row per doc — a single atomic commit)
    assert(VersionedLake.readLatest(spark, idx)
      .select("id").as[Long].collect().toSet == s1 ++ s2)
  }

  test("dedupAgainstIndex survives index compaction: new drops still " +
      "dedup against the compacted tip, and changes() keeps the " +
      "append-only fast path after the boundary") {
    import spark.implicits._
    val idx = TestSpark.tempDir("inc-idx-compact") + "/index"
    val b1 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("id", "text")
    val b2 = Seq((10L, "ee ff")).toDF("id", "text")
    Dedup.dedupAgainstIndex(b1, "text", "id", idx, "d1")
      .write.format("noop").mode("overwrite").save()
    Dedup.dedupAgainstIndex(b2, "text", "id", idx, "d2")
      .write.format("noop").mode("overwrite").save()
    // compaction-as-commit: one data dir, same content, new version
    val vCompact = VersionedLake.compactVersions(spark, idx)
    assert(VersionedLake.readAt(spark, idx, vCompact).count() == 3)
    // a new drop dedups against the compacted tip exactly as before
    val b3 = Seq((20L, "aa bb"), (21L, "gg hh")).toDF("id", "text")
    val s3 = Dedup.dedupAgainstIndex(b3, "text", "id", idx, "d3")
      .select("id").as[Long].collect().toSet
    assert(s3 == Set(21L))
    // post-compaction appends stay on the manifest fast path: the d3
    // commit is a strict superset of the compacted manifest, so
    // changes() is decided from metadata and yields exactly the delta
    val v3 = VersionedLake.versions(spark, idx).last
    val delta = VersionedLake.changes(spark, idx, vCompact, v3)
    assert(delta.select("id").as[Long].collect().toSet == Set(21L))
    assert(delta.select("op").distinct().as[String].collect()
      .sameElements(Array("insert")))
  }
}
