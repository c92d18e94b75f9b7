package graft.engine

import org.apache.spark.sql.functions._

/** CORRECTNESS queries for similarity search over `embeddings`. */
object SimilarityQueries {
  import Tables.table

  // ---- staged ANN fixtures (bench-setup split) --------------------------
  // Training an IVF quantizer / writing a bucket-partitioned lake is the
  // probe's INPUT, not the probe: both are staged once per JVM under the
  // per-PID scratch root (swept by graft.Sessions) behind [[Staging]]'s
  // _STAGED completion marker, and the bench stages them untimed via
  // QuerySpec.benchSetup so q59/q102 time the probe. The query builders
  // stage the same fixture when absent, so Verify/tests need no setup.
  // The driver-side probe INPUTS — loaded centroids, the query vector —
  // are memoized per (JVM, sf) too: they are part of staging, and
  // re-running their Spark jobs inside the timed builder would put
  // fixture IO on the probe's clock.

  import Staging.ensureStaged

  private def sfName(dir: String): String = new java.io.File(dir).getName

  /** PUBLISHED centroid path (the [[pqBooksPath]] discipline): the q141
    * oracle replays IVF assignment from this parquet after the JVM
    * exits, so centroids live under the shared fixture root,
    * write-once. */
  private def centroidPath(dir: String): String =
    s"${IngestQueries.FixRoot}/ivf_cents_${sfName(dir)}"

  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]

  /** Train-once centroids ([[Similarity.saveCentroids]]), published
    * once, loaded from the PUBLISHED copy — canonical by construction
    * for Spark probes AND the DuckDB replay, exactly like
    * [[stagedPqBooks]] (k-means float drift between racing trainers
    * cannot desynchronize the two sides). */
  private def stagedCentroids(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Double]] =
    centroidCache.getOrElseUpdate(centroidPath(dir), {
      Staging.publishOnce(centroidPath(dir))(stage =>
        Similarity.saveCentroids(s,
          Similarity.ivfCentroids(table(s, dir, "embeddings"), nLists = 16),
          stage))
      Similarity.loadCentroids(s, centroidPath(dir))
    })

  private val qvCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Double]]

  /** The probe's query vector — one bounded single-row job, memoized
    * per (sf, id) so repeated probes don't re-pay it. */
  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String,
      id: Long): Array[Double] =
    qvCache.getOrElseUpdate(s"${sfName(dir)}#$id",
      Similarity.prep(table(s, dir, "embeddings"))
        .filter(col("vec_id") === id).select(col("v"))
        .head().getSeq[Double](0).toArray)

  private def ivfLakePath(dir: String): String =
    s"${graft.Sessions.scratchRoot}/ivf_lake_${sfName(dir)}"

  /** Write-once IVF-partitioned lake ([[Similarity.writeIvfPartitionedLake]]):
    * the nLists-dots-per-row assignment scan is paid here, untimed —
    * probes prune to their nProbe `list=` directories. */
  private def stagedIvfLake(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = ivfLakePath(dir)
    ensureStaged(p)(Similarity.writeIvfPartitionedLake(
      table(s, dir, "embeddings"), stagedCentroids(s, dir), p))
    p
  }

  /** PUBLISHED (not scratch) books path: the q110 oracle replays ADC in
    * DuckDB from this parquet AFTER the Verify JVM exits, so the books
    * must outlive the per-PID scratch sweep — they live under the
    * shared fixture root with the q75/q94 write-once atomic-publish
    * discipline. */
  private def pqBooksPath(dir: String): String =
    s"${IngestQueries.FixRoot}/pq_books_${sfName(dir)}"

  private val pqBooksCache = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Double]]]]

  /** Train-once PQ codebooks ([[Similarity.pqCodebooks]]), published
    * once, loaded from the PUBLISHED copy. Loading what was published
    * (rather than keeping this JVM's freshly-trained array) makes the
    * published table canonical by construction: Spark's encode/probe
    * and DuckDB's oracle replay provably share one set of books even
    * if a concurrent JVM won the publish race with a float-wise
    * different training run. */
  private def stagedPqBooks(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Array[Double]]] =
    pqBooksCache.getOrElseUpdate(pqBooksPath(dir), {
      Staging.publishOnce(pqBooksPath(dir))(stage =>
        Similarity.savePqCodebooks(s,
          Similarity.pqCodebooks(table(s, dir, "embeddings")), stage))
      Similarity.loadPqCodebooks(s, pqBooksPath(dir))
    })

  private def pqLakePath(dir: String): String =
    s"${graft.Sessions.scratchRoot}/pq_lake_${sfName(dir)}"

  /** Write-once PQ-encoded lake: the m-codes-per-row compression scan
    * is paid here, untimed — q110 probes the compressed index. */
  private def stagedPqLake(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = pqLakePath(dir)
    ensureStaged(p)(Similarity.pqEncode(table(s, dir, "embeddings"),
        stagedPqBooks(s, dir))
      .write.mode("overwrite").parquet(p))
    p
  }

  private val BucketPlanes = 4

  private def bucketLakePath(dir: String): String =
    s"${graft.Sessions.scratchRoot}/ann_bucket_lake_${sfName(dir)}"

  private def stagedBucketLake(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = bucketLakePath(dir)
    ensureStaged(p)(Similarity.writeBucketPartitionedLake(
      table(s, dir, "embeddings"), p, BucketPlanes))
    p
  }

  /** DuckDB literal for one hyperplane (Double.toString round-trips). */
  private def planeLit(p: Array[Double]): String =
    p.map(java.lang.Double.toString).mkString("[", ", ", "]")

  /** The q102 oracle recomputes the partition key IN SQL — the same
    * deterministic hyperplanes as literals, the same sequential
    * dot-product fold (q44 establishes list_dot_product bit-agreement) —
    * over the UNpartitioned embeddings table, proving the pruned probe
    * is result-invariant: partitioning changed the files read, not the
    * answer. */
  private val q102Oracle: String = {
    val planes = Similarity.hyperplanes(BucketPlanes, 64)
    val bucketExpr = planes.zipWithIndex.map { case (pl, i) =>
      s"(CASE WHEN list_dot_product(v, ${planeLit(pl)}) > 0.0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
       |b AS (
       |  SELECT vec_id, v, label, $bucketExpr AS bucket FROM e),
       |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
       |SELECT b.vec_id, b.label, CAST(b.bucket AS INT) AS bucket,
       |       round(list_dot_product(b.v, q.qv)
       |             / (sqrt(list_dot_product(b.v, b.v))
       |                * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0.0 AS score
       |FROM b, q
       |WHERE b.vec_id <> 0 AND bit_count(xor(b.bucket, q.qb)) <= 1
       |ORDER BY score DESC, b.vec_id LIMIT 10""".stripMargin
  }

  /** q105 oracle: recompute the 4×8-bit table signatures in SQL from
    * the same hyperplane literals (q102's discipline — q44 establishes
    * the dot-product folds agree bit-for-bit), generate candidates by
    * (table, bucket) self-join, verify with exact rounded cosine. The
    * Spark side's bucket cap never binds at test scale (maxBucket ≫
    * any healthy bucket; DedupSpec pins the truncation), so the
    * UNcapped SQL closure is the exact expected result. */
  private val PairTables = 4
  private val PairBits = 8

  /** q45 oracle: the [[Similarity.annTopK]] probe replayed end to end —
    * 12×8 sign bits from the SAME hyperplane literals, the Hamming-1
    * any-table multiprobe, exact rounded-cosine rerank, top-10. */
  private def q45Oracle: String = {
    val nTables = 12
    val bits = 8
    val planes = Similarity.hyperplanes(nTables * bits, 64)
    def bucketExpr(t: Int): String =
      (0 until bits).map { i =>
        val pl = planes(t * bits + i)
        s"(CASE WHEN list_dot_product(v, ${planeLit(pl)}) > 0.0 " +
          s"THEN ${1 << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    val sigCols = (0 until nTables)
      .map(t => s"${bucketExpr(t)} AS b$t").mkString(",\n         ")
    val anyMatch = (0 until nTables)
      .map(t => s"bit_count(xor(s.b$t, q.b$t)) <= 1")
      .mkString("\n       OR ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (
       |  SELECT vec_id, label, v,
       |         $sigCols
       |  FROM e),
       |q AS (SELECT * FROM s WHERE vec_id = 0)
       |SELECT s.vec_id, s.label,
       |       round(list_dot_product(s.v, q.v)
       |             / (sqrt(list_dot_product(s.v, s.v))
       |                * sqrt(list_dot_product(q.v, q.v))), 4) + 0.0
       |         AS score
       |FROM s, q
       |WHERE s.vec_id <> 0
       |  AND ($anyMatch)
       |ORDER BY score DESC, s.vec_id LIMIT 10""".stripMargin
  }

  private val q105Oracle: String = {
    val planes = Similarity.hyperplanes(PairTables * PairBits, 64)
    def bucketExpr(t: Int): String =
      (0 until PairBits).map { i =>
        val pl = planes(t * PairBits + i)
        s"(CASE WHEN list_dot_product(v, ${planeLit(pl)}) > 0.0 THEN ${1 << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    val sigCols = (0 until PairTables)
      .map(t => s"${bucketExpr(t)} AS b$t").mkString(", ")
    val keyUnion = (0 until PairTables)
      .map(t => s"SELECT vec_id, $t AS t, b$t AS b FROM s")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v, $sigCols FROM e),
       |k AS ($keyUnion),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM k x JOIN k y ON x.t = y.t AND x.b = y.b
       |  WHERE x.vec_id < y.vec_id),
       |v AS (
       |  SELECT c.a, c.b,
       |         round(list_dot_product(ea.v, eb.v)
       |               / (sqrt(list_dot_product(ea.v, ea.v))
       |                  * sqrt(list_dot_product(eb.v, eb.v))), 4) + 0.0
       |           AS cosine
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.a
       |  JOIN e eb ON eb.vec_id = c.b)
       |SELECT a, b, cosine FROM v WHERE cosine >= 0.3
       |ORDER BY a, b""".stripMargin
  }

  /** sf whose published artifacts the q110/q141 oracles should read —
    * recorded by the builders at run time (the oracle text is
    * materialized AFTER the queries ran, via [[QuerySpec.lazyOracle]]);
    * defaults to the driver's correctness sf. One JVM-global is
    * sufficient because oracle dumping only happens in graft.Verify,
    * which runs every query at a SINGLE sf before dumping — a harness
    * that mixed sfs in one JVM and then dumped oracles would need this
    * keyed per (query, sf). */
  @volatile private var pqOracleSf: String = "sf0.01"

  /** q110 oracle: DuckDB replays the ENTIRE PQ/ADC probe from the
    * published codebook table — re-encodes every vector (per-subspace
    * argmax of `x·c − ½‖c‖²`, ties to the higher code id, exactly
    * Spark's descending struct sort in [[Similarity.pqEncode]]),
    * rebuilds the query-side LUTs, sums the m lookups in Spark's
    * left-fold order (explicit parenthesized adds — SQL SUM() order is
    * unspecified), takes the same 50 ADC candidates, and reranks with
    * the exact rounded cosine. Every float op mirrors the Spark path
    * (q44 establishes the dot-fold bit-agreement), so this is a full
    * hash compare, closing round 10's only unverified new query. */
  /** The shared ADC-replay SQL tail — encode candidates against the
    * published codebooks, build the query-side LUTs, sum in Spark's
    * left-fold order, top-50 by approximate score, exact rounded-cosine
    * rerank. ONE definition consumed by q110 (candidates = the whole
    * table) and q141 (candidates = the probed IVF lists), so a fix to
    * the float-parity-sensitive fold order or a tie-break cannot
    * diverge the two verifications of the same arithmetic. Expects
    * prior CTEs `e`, `books`, `q`, and `cand0(vec_id, v)`. */
  private def adcSqlTail: String = {
    val m = 8
    val ds = 8 // dim 64 / m — the pqCodebooks default geometry
    def foldSum(c: String): String =
      (0 until m).map(s => s"$c$s").reduce((a, b) => s"($a + $b)")
    val nCols = (0 until m).map(s =>
      s"max(CASE WHEN enc.sub = $s THEN lut.qd END) AS n$s").mkString(", ")
    val rCols = (0 until m).map(s =>
      s"max(CASE WHEN enc.sub = $s THEN lut.cn END) AS r$s").mkString(", ")
    s"""scored AS (
       |  SELECT c0.vec_id, b.sub, b.code,
       |         list_dot_product(list_slice(c0.v, b.sub*$ds + 1, b.sub*$ds + $ds),
       |                          b.centroid)
       |           - 0.5 * list_dot_product(b.centroid, b.centroid) AS s
       |  FROM cand0 c0, books b),
       |enc AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub
       |                              ORDER BY s DESC, code DESC) AS rn
       |    FROM scored) WHERE rn = 1),
       |lut AS (
       |  SELECT b.sub, b.code,
       |         list_dot_product(list_slice(q.qv, b.sub*$ds + 1, b.sub*$ds + $ds),
       |                          b.centroid) AS qd,
       |         list_dot_product(b.centroid, b.centroid) AS cn
       |  FROM books b, q),
       |pv AS (
       |  SELECT enc.vec_id, $nCols, $rCols
       |  FROM enc JOIN lut ON lut.sub = enc.sub AND lut.code = enc.code
       |  GROUP BY enc.vec_id),
       |cand AS (
       |  SELECT vec_id,
       |         ${foldSum("n")} / (sqrt(${foldSum("r")})
       |           * (SELECT sqrt(list_dot_product(qv, qv)) FROM q)) AS approx
       |  FROM pv
       |  ORDER BY approx DESC, vec_id LIMIT 50)
       |SELECT e.vec_id, e.label,
       |       round(list_dot_product(e.v, q.qv)
       |             / (sqrt(list_dot_product(e.v, e.v))
       |                * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0.0 AS score
       |FROM cand JOIN e USING (vec_id), q
       |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
  }

  private def q110Oracle: String = {
    val booksGlob = s"${IngestQueries.FixRoot}/pq_books_$pqOracleSf/*.parquet"
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
       |books AS (SELECT sub, code, centroid FROM read_parquet('$booksGlob')),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |cand0 AS (SELECT vec_id, v FROM e WHERE vec_id <> 0),
       |$adcSqlTail""".stripMargin
  }

  private def ivfPqLakePath(dir: String): String =
    s"${graft.Sessions.scratchRoot}/ivfpq_lake_${sfName(dir)}"

  /** Write-once IVF-PQ index ([[Similarity.writeIvfPqLake]]): both
    * assignment scans paid here, untimed — q141 probes pruned
    * compressed lists. */
  private def stagedIvfPqLake(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = ivfPqLakePath(dir)
    ensureStaged(p)(Similarity.writeIvfPqLake(table(s, dir, "embeddings"),
      stagedCentroids(s, dir), stagedPqBooks(s, dir), p))
    p
  }

  /** q141 oracle: the ENTIRE IVF-PQ probe replayed in SQL from the two
    * published tables — coarse assignment (argmax cosine per vector,
    * ties to the higher list, exactly [[Similarity.ivfAssign]]'s
    * descending struct sort), the query's nProbe nearest lists (ties to
    * the LOWER list, [[Similarity.probeLists]]), then q110's ADC
    * machinery restricted to the probed candidates: re-encode, LUT
    * lookups summed in Spark's left-fold order, top-50 by approximate
    * score, exact rounded-cosine rerank. */
  /** q59's oracle: the q141 replay WITHOUT the PQ tail — assignment and
    * probe-list selection from the published centroid table, then the
    * exact rounded-cosine top-10 inside the probed lists. */
  private def q59Oracle: String = {
    val centsGlob = s"${IngestQueries.FixRoot}/ivf_cents_$pqOracleSf/*.parquet"
    def cosSql(x: String, y: String): String =
      s"""list_dot_product($x, $y)
         | / (sqrt(list_dot_product($x, $x))
         |    * sqrt(list_dot_product($y, $y)))""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
       |cents AS (SELECT list, centroid FROM read_parquet('$centsGlob')),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |assign AS (
       |  SELECT vec_id, list FROM (
       |    SELECT e.vec_id, c.list,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             ${cosSql("e.v", "c.centroid")} DESC, c.list DESC) AS rn
       |    FROM e, cents c) WHERE rn = 1),
       |probes AS (
       |  SELECT c.list FROM cents c, q
       |  ORDER BY ${cosSql("q.qv", "c.centroid")} DESC, c.list ASC
       |  LIMIT 4)
       |SELECT e.vec_id, e.label,
       |       round(${cosSql("e.v", "q.qv")}, 4) + 0.0 AS score
       |FROM e JOIN assign a USING (vec_id), q
       |WHERE a.list IN (SELECT list FROM probes) AND e.vec_id <> 0
       |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin
  }

  private def q141Oracle: String = {
    val booksGlob = s"${IngestQueries.FixRoot}/pq_books_$pqOracleSf/*.parquet"
    val centsGlob = s"${IngestQueries.FixRoot}/ivf_cents_$pqOracleSf/*.parquet"
    def cosSql(x: String, y: String): String =
      s"""list_dot_product($x, $y)
         | / (sqrt(list_dot_product($x, $x))
         |    * sqrt(list_dot_product($y, $y)))""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
       |cents AS (SELECT list, centroid FROM read_parquet('$centsGlob')),
       |books AS (SELECT sub, code, centroid FROM read_parquet('$booksGlob')),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |assign AS (
       |  SELECT vec_id, list FROM (
       |    SELECT e.vec_id, c.list,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             ${cosSql("e.v", "c.centroid")} DESC, c.list DESC) AS rn
       |    FROM e, cents c) WHERE rn = 1),
       |probes AS (
       |  SELECT c.list FROM cents c, q
       |  ORDER BY ${cosSql("q.qv", "c.centroid")} DESC, c.list ASC
       |  LIMIT 4),
       |cand0 AS (
       |  SELECT e.vec_id, e.v FROM e JOIN assign a USING (vec_id)
       |  WHERE a.list IN (SELECT list FROM probes) AND e.vec_id <> 0),
       |$adcSqlTail""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q44_cosine_topk",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |       round(list_dot_product(e.v, q.qv)
        |             / (sqrt(list_dot_product(e.v, e.v))
        |                * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0.0 AS score
        |FROM e, q WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      // Brute-force cosine top-k baseline: broadcast the single query
      // row, one linear scan, TakeOrderedAndProject (no global sort).
      Similarity.bruteForceTopK(table(s, dir, "embeddings"), queryId = 0L, k = 10)
    },

    QuerySpec("q45_ann_lsh", q45Oracle) { (s, dir) =>
      // Sign-hyperplane LSH ANN: 12 tables × 8 bits with Hamming-1
      // multiprobe — a candidate's bucket is within 1 bit of the query's
      // in ANY table. Deterministic hyperplanes → stable buckets, which
      // is also what makes the probe fully SQL-replayable: the oracle
      // recomputes all 96 sign bits from the same plane literals (the
      // q105/q102 discipline), applies the same Hamming-1 multiprobe
      // filter, and reranks candidates with the exact rounded cosine —
      // upgrading q45 from rows-only to a full hash compare. Recall vs
      // the exact top-k stays asserted in SimilaritySpec.
      Similarity.annTopK(table(s, dir, "embeddings"), queryId = 0L, k = 10)
    },

    QuerySpec.lazyOracle("q59_ann_ivf")(q59Oracle) { (s, dir) =>
      // IVF ANN, full production shape: spherical-k-means centroids
      // TRAINED ONCE per (JVM, sf) and persisted ([[stagedCentroids]]),
      // the assignment WRITTEN ONCE as a lake partitioned by inverted
      // list ([[stagedIvfLake]]), and the query is a pure probe —
      // literal `list` predicates prune to the 4 nearest of 16
      // partition directories at planning time, exact cosine +
      // TakeOrdered inside them ([[Similarity.ivfProbePartitioned]]).
      // Both training and the assignment scan are staged untimed, so
      // q59's bench number is probe cost. Because the centroids are a
      // PUBLISHED table, everything after training is deterministic
      // arithmetic: the oracle replays assignment (argmax cosine, ties
      // high — [[Similarity.ivfAssign]]'s descending struct sort),
      // probe-list selection (ties low), and the exact rounded-cosine
      // top-k — the q141 discipline applied to plain IVF, upgrading
      // q59 from rows-only to a full hash compare. Recall, pruning,
      // partitioned ≡ unpartitioned, and persisted ≡ fresh stay
      // asserted in SimilaritySpec.
      pqOracleSf = sfName(dir)
      val cents = stagedCentroids(s, dir)
      val lake = stagedIvfLake(s, dir)
      Similarity.ivfProbePartitioned(s, lake, queryId = 0L,
        queryVec(s, dir, 0L), cents, k = 10)
    }.withBenchSetup((s, dir) =>
      { stagedIvfLake(s, dir); queryVec(s, dir, 0L); () }),

    QuerySpec(
      "q102_ann_partition_prune",
      q102Oracle) { (s, dir) =>
      // The prune contract DEMONSTRATED ([[Similarity.prunedBucketTopK]]):
      // embeddings staged as a lake partitioned by the 4-bit sign-LSH
      // bucket, probed over the query's Hamming-1 bucket neighborhood
      // with literal partition-key predicates — the scan's
      // PartitionFilters skip 11 of 16 directories at planning time
      // (plan-gated in PlanAuditSpec). The oracle recomputes the bucket
      // in SQL over the unpartitioned table: same rows, same hash —
      // pruning is result-invariant.
      val lake = stagedBucketLake(s, dir)
      Similarity.prunedBucketTopK(s, lake, queryId = 0L,
        queryVec(s, dir, 0L), nPlanes = BucketPlanes, k = 10)
    }.withBenchSetup((s, dir) =>
      { stagedBucketLake(s, dir); queryVec(s, dir, 0L); () }),

    QuerySpec(
      "q46_blocked_pairwise_topk",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, label
        |  FROM embeddings WHERE vec_id < 100),
        |p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b, a.label AS label,
        |         round(list_dot_product(a.v, b.v)
        |               / (sqrt(list_dot_product(a.v, a.v))
        |                  * sqrt(list_dot_product(b.v, b.v))), 4) + 0.0 AS score
        |  FROM e a, e b
        |  WHERE a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY a
        |            ORDER BY score DESC, b) AS BIGINT) AS rn
        |  FROM p)
        |SELECT a, b, label, score, rn FROM r WHERE rn <= 3
        |ORDER BY a, rn""".stripMargin) { (s, dir) =>
      // Blocked pairwise similarity join ([[Similarity.blockedPairwiseTopK]]):
      // pairs only WITHIN a label block, per-vector top-3 via rank window,
      // degenerate blocks capped (cap doesn't bind on this bounded slice,
      // so the exact oracle above still applies; the cap's own semantics
      // are regression-tested in SimilaritySpec).
      Similarity.blockedPairwiseTopK(
        Similarity.prep(table(s, dir, "embeddings"))
          .filter(col("vec_id") < 100), k = 3)
        .orderBy(col("a"), col("rn"))
    },

    QuerySpec(
      "q105_lsh_cosine_pairs",
      q105Oracle) { (s, dir) =>
      // Embedding near-dup PAIRS via LSH buckets
      // ([[Similarity.lshCosinePairs]]): the scale path for
      // embedding-space dedup — candidates from shared (table, bucket)
      // keys across 4 independent 8-bit sign-LSH tables (shuffle on
      // bucket keys, membership capped pre-collect — never all-pairs),
      // exact rounded cosine ≥ 0.3 verification on candidates only.
      // The oracle regenerates the same buckets from hyperplane
      // literals and closes them UNcapped: hash-green means candidate
      // generation, capping (non-binding here), and verification all
      // agree with an independent engine.
      Similarity.lshCosinePairs(table(s, dir, "embeddings"), tau = 0.3)
    },

    QuerySpec(
      "q100_embedding_quantize",
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding,
        |           x -> abs(CAST(x AS DOUBLE)))) AS sc
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, round(sc, 6) + 0.0 AS scale,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) / sc * 127.0) AS INT)) AS qv
        |  FROM s WHERE sc > 0)
        |SELECT vec_id, scale,
        |       CAST(len(qv) AS INT) AS dim,
        |       CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |       CAST(list_min(qv) AS INT) AS q_min,
        |       CAST(list_max(qv) AS INT) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // Int8 scalar quantization ([[Similarity.quantizeInt8]]): both
      // engines run the IDENTICAL IEEE op sequence per element
      // (float→double, /scale, ·127, round-half-away, int cast), so the
      // compare is element-exact — summarized per vector as
      // (dim, sum, min, max) over the quantized codes plus the rounded
      // scale. A drifted rounding mode, a wrong scale fold, or a
      // float-order-dependent max would all move q_sum or an extremum.
      Similarity.quantizeInt8(table(s, dir, "embeddings"))
        .select(col("vec_id"), col("scale"),
          size(col("q")).as("dim"),
          expr("CAST(aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)")
            .as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
        .orderBy(col("vec_id"))
    },

    QuerySpec(
      "q109_semantic_dedup",
      """SELECT vec_id, label FROM embeddings ORDER BY vec_id""") { (s, dir) =>
      // SemDeDup ([[Similarity.semDedup]]) — paraphrase-level dedup the
      // lexical operators can't see: k-means clusters (the q59 staged
      // centroids — train once, dedup every batch), pairwise cosine
      // WITHIN clusters only, higher id of any pair ≥ tau dropped.
      //
      // Oracle-able despite k-means, via the planted discipline: every
      // vector gets an EXACT copy at vec_id + 100000 in the same single
      // scan. A copy's assignment is bit-identical (same v ⇒ same
      // argmax), so each pair co-clusters and scores cosine 1.0 ≥ tau
      // regardless of what the clusters look like — the copy must be
      // dropped. Natural pairs stay: the corpus-wide max natural cosine
      // is ≈0.60 at both test scales (measured all-pairs) vs tau 0.9,
      // and rounding to 4 decimals can't bridge that. Expected output =
      // exactly the originals — any under-dedup (a surviving copy) or
      // over-dedup (a dropped original) breaks the hash. Policy
      // richness (groups of 3, singletons, the cluster cap) is pinned
      // in SimilaritySpec.
      val e = table(s, dir, "embeddings")
        .select(explode(array(
            struct(col("vec_id"), col("embedding")),
            struct((col("vec_id") + 100000L).as("vec_id"),
              col("embedding")))).as("r"),
          col("label"))
        .select(col("r.vec_id").as("vec_id"), col("r.embedding").as("embedding"),
          col("label"))
      Similarity.semDedup(e, stagedCentroids(s, dir), tau = 0.9)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }.withBenchSetup((s, dir) => { stagedCentroids(s, dir); () }),

    QuerySpec.lazyOracle("q110_pq_adc_topk")(q110Oracle) { (s, dir) =>
      // Product quantization + ADC ([[Similarity.pqCodebooks]] /
      // [[Similarity.pqEncode]] / [[Similarity.pqAdcTopK]]): the
      // compressed-index probe — codebooks trained once per (JVM, sf),
      // the corpus encoded once as an m-codes-per-row lake (32× smaller
      // than float32), and the timed query scans ONLY the compressed
      // index: per-row cost is m lookup-table reads + a sum, the best
      // 50 candidates rerank exactly against the full table via a
      // broadcast join. Recall vs the exact top-k and encode
      // determinism are pinned in SimilaritySpec; the FULL result is
      // hash-checked by [[q110Oracle]]'s DuckDB replay of the probe
      // from the published codebooks (k-means runs only at training —
      // everything after the books is deterministic arithmetic).
      pqOracleSf = sfName(dir)
      val books = stagedPqBooks(s, dir)
      val lake = stagedPqLake(s, dir)
      Similarity.pqAdcTopK(s.read.parquet(lake),
        table(s, dir, "embeddings"), queryId = 0L,
        queryVec(s, dir, 0L), books, k = 10)
    }.withBenchSetup((s, dir) =>
      { stagedPqLake(s, dir); queryVec(s, dir, 0L); () }),

    QuerySpec.lazyOracle("q141_ivf_pq")(q141Oracle) { (s, dir) =>
      // IVF-PQ ([[Similarity.writeIvfPqLake]] / [[Similarity.ivfPqProbe]]):
      // the full FAISS composition — coarse quantizer prunes to 4 of 16
      // list PARTITIONS at planning time, PQ scores the 32×-compressed
      // rows within them by lookup table, the best 50 rerank exactly.
      // Both trained artifacts (centroids, codebooks) are published
      // write-once, so the ENTIRE probe after training is deterministic
      // arithmetic and the oracle replays it end to end in SQL —
      // upgrading this family's verification from q59's rows-only to a
      // full hash compare. The timed region is the pruned compressed
      // probe; training and the index write are staged untimed.
      pqOracleSf = sfName(dir)
      val cents = stagedCentroids(s, dir)
      val books = stagedPqBooks(s, dir)
      val lake = stagedIvfPqLake(s, dir)
      Similarity.ivfPqProbe(s, lake, table(s, dir, "embeddings"),
        queryId = 0L, queryVec(s, dir, 0L), cents, books, k = 10)
    }.withBenchSetup((s, dir) =>
      { stagedIvfPqLake(s, dir); queryVec(s, dir, 0L); () }),

    QuerySpec("q174_maxsim_topk", maxSimOracle) { (s, dir) =>
      // Late-interaction MaxSim ([[Similarity.maxSimTopK]]): 4 token
      // vectors per document (16-wide embedding slices), score =
      // Σ_i max_j cos(q_i, d_j) against vec 0's tokens — the ColBERT
      // retrieval scorer. Broadcast query row, staged norms, all 16
      // interactions codegen'd dots, TakeOrderedAndProject; the oracle
      // spells out the identical 4×4 interaction matrix and add order.
      Similarity.maxSimTopK(table(s, dir, "embeddings"), queryId = 0L,
        k = 10)
    })

  /** q174's oracle: the 4×4 MaxSim interaction matrix written out term
    * by term — generated, so nTok/dimTok edits cannot drift between the
    * Spark expression and the SQL. */
  private def maxSimOracle: String = {
    val nTok = 4
    val dimTok = 16
    val toks = (0 until nTok).map { j =>
      val lo = j * dimTok + 1
      val hi = (j + 1) * dimTok
      (s"v[$lo:$hi] AS t$j",
        s"list_dot_product(v[$lo:$hi], v[$lo:$hi]) AS n$j")
    }
    val tokCols = toks.flatMap { case (t, n) => Seq(t, n) }.mkString(",\n         ")
    val qCols = (0 until nTok).flatMap(j =>
      Seq(s"t$j AS qt$j", s"n$j AS qn$j")).mkString(", ")
    val score = (0 until nTok).map { i =>
      "greatest(" + (0 until nTok).map { j =>
        s"list_dot_product(qt$i, t$j) / (sqrt(qn$i) * sqrt(n$j))"
      }.mkString(",\n                ") + ")"
    }.mkString("\n           + ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |t AS (
       |  SELECT vec_id, label,
       |         $tokCols
       |  FROM e),
       |q AS (SELECT $qCols FROM t WHERE vec_id = 0)
       |SELECT t.vec_id, t.label,
       |       round($score, 4) + 0.0 AS score
       |FROM t, q WHERE t.vec_id <> 0
       |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  }
}
