package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ArrayTransform, Expression}
import graft.engine._

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.table(spark, sf, "embeddings")

  test("quantizeInt8: exact codes, zero-vector drop, scale fold stays staged") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f), 0), // zero vector: quantization undefined
      (3L, Array(2.0f, 1.0f, -2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.quantizeInt8(e)
    val rows = out.orderBy("vec_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(rows(0).getDouble(1) == 1.0) // scale = max|x|
    // hand-computed: round(63.5)=64 (half away from zero), -127, round(31.75)=32
    assert(rows(0).getSeq[Int](2) == Seq(64, -127, 32))
    assert(rows(1).getSeq[Int](2) == Seq(127, 64, -127))
    // the max-abs fold must stay a STAGED column — inlined into the
    // per-element lambda it re-runs per element, O(dim²) (the same
    // CollapseProject hazard TextSpec gates for winnowing)
    def nestedFold(ex: Expression): Boolean = ex match {
      case ArrayTransform(_, fn) =>
        fn.exists(_.isInstanceOf[ArrayAggregate]) ||
          fn.children.exists(nestedFold)
      case other => other.children.exists(nestedFold)
    }
    val nested = out.queryExecution.optimizedPlan.collect {
      case p => p.expressions.exists(nestedFold)
    }.exists(identity)
    assert(!nested,
      "max-abs fold was inlined into the quantize lambda — O(dim²) evals")
  }

  test("hyperplanes are deterministic and bounded") {
    val a = Similarity.hyperplanes(12, 64)
    val b = Similarity.hyperplanes(12, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x <= 1.0))
    // not degenerate: planes differ from each other
    assert(a.map(_.toSeq).distinct.length == 12)
  }

  test("brute-force top-k is ordered and self-excluded") {
    val top = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val scores = top.map(_.getDouble(2))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("multi-table ANN reaches useful recall on weakly-clustered data") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val annIds = Similarity.annTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(annIds.size <= 10)
    // 12 tables × 8 bits, Hamming-1 multiprobe: for a cosine-0.4
    // neighbor the per-bit agreement is p = 1 - acos(.4)/π ≈ 0.63, so a
    // table matches with p^8 + 8·p^7·(1-p) ≈ 14%, amplified over 12
    // tables to ~0.84 expected recall. Random embeddings are LSH's worst
    // case — assert well above the random-pick floor with variance margin.
    val recall = (exact & annIds).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall vs exact $exact, got $annIds")
  }

  test("IVF ANN reaches useful recall while scanning a corpus fraction") {
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ivfIds = Similarity.ivfTopK(emb, 0L, 10, nLists = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivfIds).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall vs exact $exact, got $ivfIds")

    // the point of IVF: the probe scans a FRACTION of the corpus, not
    // all of it — 4 of 16 lists must cover well under the whole table
    // (lists are uneven on weakly-clustered data; 60% is the guard rail)
    val cents = Similarity.ivfCentroids(emb, nLists = 16)
    assert(cents.length == 16)
    val indexed = Similarity.ivfAssign(emb, cents)
    val total = indexed.count().toDouble
    val biggest4 = indexed.groupBy("list").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc)
      .limit(4).collect().map(_.getLong(1)).sum.toDouble
    assert(biggest4 / total <= 0.6,
      s"4 largest lists hold ${biggest4 / total} of the corpus — no pruning")

    // centroids are deterministic (fixed seed, same input)
    val again = Similarity.ivfCentroids(emb, nLists = 16)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("IVF probe from persisted centroids equals probe from fresh training") {
    val dir = TestSpark.tempDir("ivf-centroids")
    val cents = Similarity.ivfCentroids(emb, nLists = 16)
    Similarity.saveCentroids(spark, cents, dir)
    val loaded = Similarity.loadCentroids(spark, dir)
    // the parquet round-trip is exact (doubles, ordered by list id)…
    assert(loaded.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    // …so the production probe (train once → persist → probe) returns
    // byte-identical results to self-contained fresh training
    val fresh = Similarity.ivfTopK(emb, 0L, 10).collect().map(_.toSeq).toSeq
    val persisted = Similarity.ivfTopK(emb, 0L, 10, centroids = Some(loaded))
      .collect().map(_.toSeq).toSeq
    assert(persisted == fresh)
  }

  test("IVF-partitioned lake probe prunes lists and matches the assign-scan form") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.tempDir("ivf-lake")
    val cents = Similarity.ivfCentroids(emb, nLists = 16)
    Similarity.writeIvfPartitionedLake(emb, cents, dir)
    val qv = Similarity.prep(emb).filter(col("vec_id") === 0)
      .select(col("v")).head().getSeq[Double](0).toArray
    val probe = Similarity.ivfProbePartitioned(spark, dir, 0L, qv, cents, k = 10)
    // literal list predicates must land in PartitionFilters — the probe
    // opens nProbe of nLists directories, never the rest
    val scan = probe.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*list[^\\]]*\\].*"),
      s"list predicate did not become PartitionFilters:\n$scan")
    // the lake changes which FILES are read, not the answer: identical
    // rows to the self-contained assignment-scan form on the same
    // centroids
    val viaAssign = Similarity.ivfTopK(emb, 0L, 10, centroids = Some(cents))
      .collect().map(_.toSeq).toSeq
    assert(probe.collect().map(_.toSeq).toSeq == viaAssign)
  }

  test("bucket-partitioned lake probe prunes partitions and is result-invariant") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.tempDir("ann-bucket-lake")
    val nPlanes = 4
    Similarity.writeBucketPartitionedLake(emb, dir, nPlanes)
    // one directory per bucket value actually present
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).map(_.getName)
    assert(bucketDirs.nonEmpty && bucketDirs.length <= (1 << nPlanes))
    val qv = Similarity.prep(emb).filter(col("vec_id") === 0)
      .select(col("v")).head().getSeq[Double](0).toArray
    val probe = Similarity.prunedBucketTopK(spark, dir, 0L, qv, nPlanes, k = 10)
    // the partition-key predicate must prune at PLANNING time: literal
    // bucket values in PartitionFilters, nothing on the data columns
    val scan = probe.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"bucket predicate did not become PartitionFilters:\n$scan")
    // result-invariance (the q102 oracle's claim, locally): the same
    // computation over the UNpartitioned frame with a row filter on a
    // recomputed bucket column returns identical rows
    val planes = Similarity.hyperplanes(nPlanes, 64)
    val qb = Similarity.localSignature(qv, planes)
    val neighborhood = (qb +: (0 until nPlanes).map(p => qb ^ (1 << p))).toSet
    val unpruned = Similarity.prep(emb)
      .withColumn("bucket", Similarity.signature(col("v"), planes))
      .filter(col("vec_id") =!= 0L)
      .filter(col("bucket").isin(neighborhood.toSeq.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("label"), col("bucket").cast("int").as("bucket"),
        (round(Similarity.cosine(col("v"),
          array(qv.map(lit): _*)), 4) + lit(0.0)).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
    assert(probe.collect().map(_.toSeq).toSeq ==
      unpruned.collect().map(_.toSeq).toSeq)
  }

  test("lshCosinePairs finds high-cosine pairs, capped against degenerate clusters") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real corpus: every reported pair passed the exact verify, and the
    // strongest brute-force neighbor pairs that share a bucket appear
    val pairs = Similarity.lshCosinePairs(emb, tau = 0.3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getDouble(2) >= 0.3))
    // degenerate cluster: 300 copies of ONE vector share every bucket
    // of every table — the pre-collect cap must drop the bucket whole
    // (0 pairs) instead of materializing it or emitting 300² candidates
    val one = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val degenerate = (0 until 300).map(i => (i.toLong, one, 0))
      .toDF("vec_id", "embedding", "label")
    val capped = Similarity.lshCosinePairs(degenerate, tau = 0.3,
      maxBucket = 64)
    assert(capped.queryExecution.executedPlan.toString.contains("row_number"),
      "lshCosinePairs lost the pre-collect window truncation")
    assert(capped.count() == 0)
  }

  test("blockedPairwiseTopK caps degenerate blocks (no quadratic blowup)") {
    import spark.implicits._
    // 300 vectors all sharing ONE label — uncapped this is a 300² pair
    // join; the cap must truncate the block to its first 40 members.
    val degenerate = (0 until 300).map(i =>
      (i.toLong, Seq(1.0, i.toDouble / 300.0, 0.5), "same_label"))
      .toDF("vec_id", "v", "label")
    val out = Similarity.blockedPairwiseTopK(degenerate, k = 3, maxBlock = 40)
      .collect()
    // every surviving vector keeps exactly k neighbors, and NOTHING
    // beyond the cap participates on either side of a pair
    assert(out.length == 40 * 3)
    assert(out.forall(r => r.getLong(0) < 40 && r.getLong(1) < 40))
    // sanity on the uncapped default with a small healthy block
    val healthy = (0 until 10).map(i =>
      (i.toLong, Seq(1.0, i.toDouble, 2.0), s"lbl_${i % 2}"))
      .toDF("vec_id", "v", "label")
    val pairs = Similarity.blockedPairwiseTopK(healthy, k = 2).collect()
    assert(pairs.length == 10 * 2)
    assert(pairs.forall(r => r.getLong(0) % 2 == r.getLong(1) % 2)) // block-local
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)))
      .toDF("x", "y")
      .select(round(Similarity.cosine(col("x"), col("y")), 6).as("c"))
    assert(df.head().getDouble(0) == 1.0)
  }

  test("semDedup: copy groups collapse to min-id survivors, singletons " +
      "survive, cluster cap only under-dedups") {
    import spark.implicits._
    // Deterministic planted corpus: splitmix vectors (pairwise cosine
    // concentrates near 0 in 64-dim — far under tau). Bases 0-9 carry
    // exact copies at +100 and +200 (groups of three, co-clustered by
    // construction: identical v ⇒ identical assignment); 10-29 are
    // singletons.
    val base = Similarity.hyperplanes(30, 64)
    val rows = (0 until 10).flatMap(i =>
      Seq((i.toLong, base(i)), (100L + i, base(i)), (200L + i, base(i)))) ++
      (10 until 30).map(i => (i.toLong, base(i)))
    val df = rows.map { case (id, v) => (id, v.toSeq.map(_.toFloat), "x") }
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.ivfCentroids(df, nLists = 4)
    val kept = Similarity.semDedup(df, cents, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    // exactly the min id of every group of three + all singletons
    assert(kept == (0L until 30L).toSet, s"got $kept")
    // maxCluster = 1: at most one member per cluster enters pair
    // generation → no pairs → nothing dropped. The cap direction must
    // be UNDER-dedup (rows kept), never data loss.
    val capped = Similarity.semDedup(df, cents, tau = 0.9, maxCluster = 1)
      .collect().map(_.getLong(0)).toSet
    assert(capped == rows.map(_._1).toSet,
      s"cap dropped rows it must keep: ${rows.map(_._1).toSet -- capped}")
  }

  test("PQ: codebooks round-trip exactly, codes stay in range and " +
      "deterministic, ADC+rerank recalls the exact top-k") {
    import org.apache.spark.sql.functions._
    val books = Similarity.pqCodebooks(emb)
    assert(books.length == 8 && books.forall(_.length == 16)
      && books.forall(_.forall(_.length == 8)))
    val dir = TestSpark.tempDir("pq-books")
    Similarity.savePqCodebooks(spark, books, dir)
    val loaded = Similarity.loadPqCodebooks(spark, dir)
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq
      == books.map(_.map(_.toSeq).toSeq).toSeq)
    val enc = Similarity.pqEncode(emb, books)
    val codes = enc.orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2))
    assert(codes.nonEmpty && codes.forall { case (_, cs) =>
      cs.size == 8 && cs.forall(c => c >= 0 && c < 16) })
    val again = Similarity.pqEncode(emb, loaded).orderBy(col("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2))
    assert(codes.toSeq == again.toSeq, "encoding is not deterministic")
    val qv = Similarity.prep(emb).filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0).toArray
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val adc = Similarity.pqAdcTopK(enc, emb, 0L, qv, books, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & adc).size.toDouble / exact.size
    assert(recall >= 0.4, s"ADC recall $recall: exact $exact vs $adc")
  }

  test("maxSim: exact copy scores nTok, token ORDER is irrelevant, " +
    "partial token match scores its match count") {
    import spark.implicits._
    // token i of the query = unit basis vector at slice-local index i;
    // cos between basis tokens is exactly 1 (same index) or 0.
    def basis(tokIdx: Seq[Int]): Array[Float] = {
      val v = Array.fill(64)(0f)
      tokIdx.zipWithIndex.foreach { case (b, t) => v(t * 16 + b) = 1f }
      v
    }
    val e = Seq(
      (0L, basis(Seq(0, 1, 2, 3)), 0), // query
      (1L, basis(Seq(0, 1, 2, 3)), 0), // exact copy → 4.0
      (2L, basis(Seq(3, 2, 1, 0)), 0), // same tokens, SHUFFLED → still 4.0
      (3L, basis(Seq(0, 5, 6, 7)), 0), // one matching token → 1.0
      (4L, basis(Seq(8, 9, 10, 11)), 0)) // disjoint → 0.0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.maxSimTopK(e, queryId = 0L, k = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) == 4.0)
    assert(got(2L) == 4.0, "MaxSim must be invariant to token order")
    assert(got(3L) == 1.0)
    assert(got(4L) == 0.0)
    // single-vector cosine CANNOT separate 1 from 2-vs-order: sanity
    // that the late-interaction scorer ranks the shuffled copy at the top
    assert(Seq(1L, 2L).contains(
      Similarity.maxSimTopK(e, 0L, 1).select("vec_id").as[Long].head()))
  }
}
