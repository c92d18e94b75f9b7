package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family over text corpora (BASELINE north star): exact
  * (fingerprint hash-agg), MinHash+LSH banded near-dup, SimHash, and
  * n-gram Jaccard verification.
  *
  * 100 TB discipline — the invariant throughout is NEVER all-pairs:
  *  - exact dedup is one hash aggregation on the fingerprint;
  *  - MinHash signatures are one partial-agg-friendly aggregation over
  *    exploded shingles (64 `min` columns — mergeable, fixed width);
  *  - candidate generation shuffles on (band, band-hash) buckets only;
  *    degenerate buckets are capped (`maxBucket`) BEFORE any aggregation
  *    buffer forms (window truncation, [[boundedBuckets]]) so a
  *    pathological key can't produce a quadratic pair blowup OR a
  *    single-buffer OOM;
  *  - Jaccard verification joins shingles ONLY for candidate pairs
  *    (keyed equi-joins, no cross join anywhere);
  *  - SimHash candidates come from 16-bit chunk equality (pigeonhole: any
  *    pair within Hamming distance 3 of a 64-bit signature shares at
  *    least one of 4 chunks), then exact `bit_count(xor)` verification.
  *
  * Everything is column expressions — no UDFs, stays codegen'd.
  */
object Dedup {

  /** Exact dedup: group by fingerprint, keep the smallest id
    * (deterministic keep-first policy — `dropDuplicates` picks an
    * arbitrary survivor, which can't be oracle-checked). One shuffle. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(idCol).as("id"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("n"))

  /** Full-row exact dedup: keep the lowest-`idCol` row per normalized-
    * text fingerprint. Unlike [[exactDedup]] (whose output is the
    * fingerprint summary), rows keep ALL their columns — the form a
    * curation pipeline needs between filter stages, where the payload
    * must flow through. One sort-window shuffle on the fingerprint;
    * window state is one row (rank 1 survives), so a pathological
    * duplicate group streams instead of buffering. */
  def dedupKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }

  /** Incremental cross-batch exact dedup — the production ingest shape
    * for the reference's monthly-drop model (reference README.md:4,
    * sparkle-v9.py:128-138): the corpus-so-far is represented by a
    * SIGNATURE INDEX (one (fp, id) row per surviving document) kept as
    * a [[VersionedLake]]; each new batch dedups within itself
    * ([[dedupKeepFirst]]) and against the index, then commits ONLY its
    * survivors' signatures as the next index version. Re-deduplicating
    * the full corpus per drop is O(corpus) per ingest — this is
    * O(batch) shuffle + one narrow index scan.
    *
    * 100 TB shape — the corpus-sized index is NEVER reshuffled:
    *  - the index side is read with a 1-column projection (`fp`) and
    *    consumed map-side by a broadcast-hash join whose BUILD side is
    *    the batch's distinct fingerprints — no Exchange above the index
    *    scan (gated in PlanAuditSpec);
    *  - the duplicate-fp set that comes back is ≤ |batch|, broadcast
    *    into the final anti-join, so the batch never shuffles on the
    *    index's key either;
    *  - the index grows by one O(batch) append per drop (and compacts
    *    through [[VersionedLake.compactVersions]] like any lake).
    *    For a batch too large to broadcast its fp set, the same plan
    *    holds with a bloom filter in place of the exact broadcast
    *    (q106's reduction) plus a shuffled repair join on the ~ε false
    *    positives — the index scan still never shuffles.
    *
    * Exactly-once per batch: the index commit is [[VersionedLake
    * .commitTagged]] with `tag` = the batch id, and the dedup baseline
    * is the newest version NOT containing the tag — so a replayed batch
    * dedups against the same pre-batch snapshot and its commit no-ops.
    * (Replays older than the last index compaction return conservative
    * empty survivors — compaction collapses tag lineage into one data
    * dir; schedule compaction outside the writers' replay horizon, the
    * same contract as [[VersionedLake.vacuum]].)
    *
    * Returns the batch's surviving rows with their full payload. The
    * survivor pipeline executes twice — once for the index commit here,
    * once when the CALLER materializes the return — an O(batch) cost,
    * never O(corpus); a caller that lands survivors in its own sink
    * (q136's data-lake commit) can persist the batch first if its
    * source re-read is expensive. */
  def dedupAgainstIndex(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, tag: String): DataFrame = {
    val spark = batch.sparkSession
    val inBatch = dedupKeepFirst(batch, textCol, idCol)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val baseV = VersionedLake.versions(spark, indexDir).reverse
      .find(v => !VersionedLake.readManifestTags(spark, indexDir, v)
        .contains(tag))
    val fresh = baseV match {
      case None => inBatch // first drop: nothing to dedup against
      case Some(v) =>
        val idxFp = VersionedLake.readAt(spark, indexDir, v).select(col("fp"))
        val batchFps = inBatch.select(col("__fp").as("fp")).distinct()
        // No distinct on the matched set: the anti-join below only
        // tests membership, and a distinct here would hang a shuffle
        // over the index scan's subtree — the matched set is already
        // ≤ |batch| (the index holds each fp at most once).
        val dupFps = idxFp.join(broadcast(batchFps), "fp").select(col("fp"))
        inBatch.join(broadcast(dupFps),
          inBatch("__fp") === dupFps("fp"), "left_anti")
    }
    VersionedLake.commitTagged(
      fresh.select(col("__fp").as("fp"), col(idCol).as("id")),
      indexDir, tag)
    fresh.drop("__fp")
  }

  /** Incremental cross-batch NEAR-dup ([[dedupAgainstIndex]]'s sibling
    * for MinHash): the index is ONE versioned lake of
    * (id, keys[bands], sig[64]) rows — the LSH posting keys AND MinHash
    * signature of every surviving document, one row per doc. A new
    * batch generates candidates ONLY batch-internally (banded LSH,
    * [[lshCandidatePairs]]) and batch-vs-index (band-key equality over
    * the exploded `keys`), and verifies candidates by signature slot
    * agreement (the standard MinHash Jaccard estimate — fraction of
    * equal slots ≥ `minAgree`), so verification needs no text fetch:
    * the index carries everything, and column pruning gives the
    * candidate scan (id, keys) and the verify scan (id, sig) each only
    * what it needs.
    *
    * Scale shape, mirroring [[dedupAgainstIndex]]:
    *  - the index `keys` scan is consumed map-side by a broadcast of
    *    the batch's distinct (band, bh) keys — the corpus-sized posting
    *    list is never reshuffled (plan-gated);
    *  - matched postings are capped per bucket by a rank window BEFORE
    *    pairing (the [[boundedBuckets]] discipline — a boilerplate
    *    bucket in the index cannot explode the candidate join; the
    *    window shuffles only MATCHED rows, and sorts stream/spill);
    *  - index signatures are fetched by a broadcast of the candidate
    *    ids (≤ batch × maxBucket), map-side again;
    *  - survivor policy is greedy first-arrival: a batch doc drops on
    *    any verified match to the index or to a LOWER-id batch doc
    *    (transitive families are [[connectedComponents]]' job, on the
    *    pairs this emits).
    * Exactly-once per batch: the single index commit is tagged — one
    * atomic publication per drop, no partial-index crash window — and
    * the dedup baseline is the newest version NOT containing the tag,
    * as in [[dedupAgainstIndex]]. Returns the surviving batch rows
    * (full payload — materializing them re-executes the survivor
    * pipeline, the documented O(batch) cost; a caller needing only
    * survivor IDS should instead read its batch's committed version
    * back — [[VersionedLake.readAt]]/[[VersionedLake.changes]] on the
    * index — which is one narrow column scan of the durable output,
    * the q134 pattern). */
  def nearDupAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, tag: String, minAgree: Double = 0.75,
      maxBucket: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    val k = 64
    val sigsWide = minhashSignatures(shingleDf(batch, idCol, textCol), k)
    val bands = 16; val rowsPerBand = 4
    // ONE index row per doc: (id, keys[16], sig[64]) — a single lake,
    // so a batch is ONE atomic tagged commit (a two-lake split had a
    // crash window between the commits that wedged every later batch),
    // and candidate scans prune to (id, keys) by column projection
    // while the verify scan prunes to (id, sig).
    val indexRows = sigsWide.select(col("id"),
      bandKeyArray(bands, rowsPerBand).as("keys"),
      array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
    val keys = sigsWide
      .select(col("id"), explode(bandKeyArray(bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    def agreeFrac(x: String, y: String) =
      expr(s"size(filter(zip_with($x, $y, (u, v) -> u = v), t -> t)) / $k.0")
    val sb = indexRows.select(col("id").as("b"), col("sig").as("sigb"))
    val sa = indexRows.select(col("id").as("a"), col("sig").as("siga"))
    // batch-internal: banded candidates, slot-agreement verify, greedy
    // drop-the-later-id
    val inBatchDrops = lshCandidatePairs(sigsWide, bands, rowsPerBand,
        maxBucket)
      .join(sa, "a").join(sb, "b")
      .filter(agreeFrac("siga", "sigb") >= minAgree)
      .select(col("b").as("drop_id"))
    val baseV = VersionedLake.versions(spark, indexDir).reverse
      .find(v => !VersionedLake.readManifestTags(spark, indexDir, v)
        .contains(tag))
    val crossDrops = baseV match {
      case None => inBatchDrops.limit(0)
      case Some(v) =>
        val idxKeys = VersionedLake.readAt(spark, indexDir, v)
          .select(col("id"), explode(col("keys")).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
        val batchBuckets = keys.select(col("band"), col("bh")).distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bh")).orderBy(col("id"))
        val matched = idxKeys.join(broadcast(batchBuckets), Seq("band", "bh"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= maxBucket)
          .select(col("id").as("a"), col("band"), col("bh"))
        val pairs = matched
          .join(broadcast(keys.select(col("id").as("b"),
            col("band"), col("bh"))), Seq("band", "bh"))
          .select(col("a"), col("b")).distinct()
        val aSigs = VersionedLake.readAt(spark, indexDir, v)
          .select(col("id"), col("sig"))
          .join(broadcast(pairs.select(col("a").as("id")).distinct()), "id")
          .select(col("id").as("a"), col("sig").as("siga"))
        pairs.join(broadcast(aSigs), "a").join(sb, "b")
          .filter(agreeFrac("siga", "sigb") >= minAgree)
          .select(col("b").as("drop_id"))
    }
    val drops = inBatchDrops.unionByName(crossDrops).distinct()
    val survivors = batch.join(broadcast(drops),
      batch(idCol) === drops("drop_id"), "left_anti")
    val survIds = survivors.select(col(idCol).as("id"))
    VersionedLake.commitTagged(
      indexRows.join(broadcast(survIds), "id"), indexDir, tag)
    survivors
  }

  /** Word n-gram shingle set: (id, sh) distinct rows. Documents shorter
    * than `n` tokens contribute their whole text as one shingle. */
  def shingleDf(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val w = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("id"), w.as("w"))
      .select(col("id"), explode(
        when(size(col("w")) >= n,
          expr(s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))"))
          .otherwise(array(concat_ws(" ", col("w"))))).as("sh"))
      .distinct()
  }

  /** The distinct trigram shingle set as an array column (for the direct
    * pairwise Jaccard form — oracle-expressible). Takes the NAME of an
    * already-split words-array column: inlining `split(...)` here would
    * re-tokenize the text once PER LAMBDA ELEMENT (measured ~4x on the
    * q42 bench) — bind the words array to a column first. */
  def shingleSet(wordsColName: String, n: Int = 3): Column =
    array_distinct(expr(
      s"transform(sequence(0, greatest(size($wordsColName) - $n, 0)), " +
        s"i -> concat_ws(' ', slice($wordsColName, i + 1, $n)))"))

  /** MinHash signature: k permutations approximated Carter–Wegman style —
    * the shingle is digested ONCE (md5) into two base values and slot i
    * is the affine combination `(a + i·b) mod P`, P = 2^31−1 (native
    * codegen'd [[org.apache.spark.sql.graft.MinHashSlots]], whose
    * scaladoc spells the exact arithmetic — it is the q40 ORACLE
    * contract, replayed verbatim in DuckDB over the same md5 hex).
    * Signature h_i = min over shingles — one aggregation keyed on id,
    * partial-agg friendly. This replaced k salted
    * `xxhash64(concat(sh, salt_i))` string re-hashes (~k× less hash
    * work per shingle row), and the md5-mod-prime base upgraded the
    * family from rows-only to full hash-compare verification. The k
    * slot functions share two base values (standard 2-universal
    * approximation, pairwise- not mutually-independent) — a slightly
    * weaker independence assumption than k salted hashes; the
    * banded-LSH threshold behavior it feeds is pinned empirically by
    * DedupSpec's planted-pair recall test. */
  def minhashSignatures(shingles: DataFrame, k: Int = 64): DataFrame = {
    val slots = org.apache.spark.sql.graft.VectorFunctions
      .minhashSlots(col("sh"), k)
    // The slot array stays a materialized column under the aggregate:
    // CollapseProject won't inline a non-trivial producer referenced k
    // times, so the hash runs once per row, not once per slot.
    val aggs = (0 until k).map(i => min(col("mh")(i)).as(s"h$i"))
    shingles.select(col("id"), slots.as("mh"))
      .groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded LSH: hash each band of rowsPerBand signature slots; docs
    * sharing a (band, hash) bucket are candidates. Bucket size capped —
    * a bucket of B docs yields B² pairs, so degenerate content (empty
    * docs, boilerplate) must not explode the join.
    *
    * The cap is applied BEFORE any aggregation buffer forms: membership
    * is truncated to `maxBucket + 1` rows per bucket by a `row_number`
    * window ([[boundedBuckets]]), so on a real corpus where boilerplate
    * lands millions of ids in one (band, hash) bucket, no executor ever
    * holds the full bucket in memory — sort-based windows stream and
    * spill, single-row aggregation state does not. */
  /** The banded LSH key array for a wide signature frame — ONE
    * definition of the band geometry/hash shared by [[lshCandidatePairs]]
    * and the [[nearDupAgainstIndex]] posting index, so the in-batch
    * buckets and the PERSISTED cross-batch postings can never
    * silently desynchronize. */
  private[engine] def bandKeyArray(bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      // The band key is the slot values themselves (comma-joined), not a
      // re-hash: collision-free, and exactly reproducible in the oracle
      // (DuckDB string_agg over the same slots) where Spark's murmur
      // `hash(...)` was engine-internal. Slots are < 2^31, so the key
      // stays ≤ 43 chars — fine as a shuffle key.
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}")): _*).as("bh"))
    }: _*)

  def lshCandidatePairs(sig: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 64): DataFrame = {
    val exploded = sig
      .select(col("id"), explode(bandKeyArray(bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val buckets = boundedBuckets(exploded, Seq("band", "bh"), maxBucket)
    buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Shared bucket-capping discipline for candidate generation: truncate
    * each bucket's MEMBERSHIP to `maxBucket + 1` ids with a per-bucket
    * `row_number` window BEFORE collecting, then keep buckets whose
    * (now-bounded) size is in [2, maxBucket]. Equivalent semantics to
    * filtering on the true bucket size — a bucket larger than
    * `maxBucket` retains exactly `maxBucket + 1` rows, fails the size
    * filter, and is dropped whole — but the worst-case per-bucket state
    * anywhere in the plan is `maxBucket + 1` ids: the window's sort is
    * the spillable ExternalSorter (same discipline as
    * [[Similarity.blockedPairwiseTopK]]), where the previous
    * `groupBy.agg(collect_list)`-then-filter shape materialized the
    * ENTIRE degenerate bucket in one in-memory aggregation buffer
    * before the filter could drop it — at 100 TB, an executor OOM.
    * No extra shuffle: the window exchange on the bucket key replaces
    * the aggregation exchange, and the post-window `collect_list` sees
    * data already partitioned on its grouping key. */
  private[engine] def boundedBuckets(exploded: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("id"))
    exploded
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxBucket + 1)
      .groupBy(keys: _*)
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
  }

  /** Exact Jaccard for candidate pairs only: keyed joins against the
    * shingle table — intersection by (doc, shingle) equi-join, union by
    * inclusion-exclusion. */
  def jaccardOnCandidates(cand: DataFrame, shingles: DataFrame): DataFrame = {
    val n = shingles.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val na = n.select(col("id").as("a"), col("n").as("n_a"))
    val nb = n.select(col("id").as("b"), col("n").as("n_b"))
    val sa = shingles.select(col("id").as("a"), col("sh"))
    val sb = shingles.select(col("id").as("b"), col("sh"))
    val inter = cand.join(sa, "a").join(sb, Seq("b", "sh"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_i"))
    cand.join(na, "a").join(nb, "b")
      .join(inter, Seq("a", "b"), "left")
      .withColumn("n_i", coalesce(col("n_i"), lit(0L)))
      .withColumn("jaccard", round(
        col("n_i").cast("double") / (col("n_a") + col("n_b") - col("n_i")), 4))
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → banded
    * candidates → exact-Jaccard verify → threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    // The shingle table feeds four consumers (signatures, two sides of
    // the intersection join, per-doc counts). It ends in `.distinct()`,
    // i.e. an Exchange on (id, sh) — Spark's ReuseExchange / AQE stage
    // reuse shares that shuffle across all four, so scan+tokenize+explode
    // runs ONCE with no cache. (An earlier persist() here leaked into
    // callers' heaps — a returned lazy DataFrame has no unpersist point.)
    val sh = shingleDf(df, idCol, textCol)
    val cand = lshCandidatePairs(minhashSignatures(sh))
    jaccardOnCandidates(cand, sh)
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** SimHash bit width: 60, the md5-hex-prefix budget of [[Kmv.point]] —
    * 15 nibbles keep the per-token hash (and therefore the signature)
    * positive in a signed 64-bit integer on BOTH engines, which is what
    * lets the oracle replay the whole signature in SQL. */
  val SimhashBits: Int = 60

  /** 60-bit SimHash with term-frequency weights (the classic form): per
    * bit, sum ±1 per token OCCURRENCE by the token hash's bit value;
    * signature bit = sign of the sum. Frequency weighting matters — on
    * low-vocabulary corpora a distinct-token simhash degenerates (most
    * docs contain most words, so signatures collapse), while frequency
    * vectors still separate documents. The token hash is the md5-prefix
    * point ([[Kmv.point]]), so DuckDB recomputes the identical
    * signatures bit for bit — the earlier xxhash64 form was
    * Spark-internal and kept q41 rows-only. */
  def simhash60(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(trim(col(textCol)), "\\s+")).as("t"))
    // Bind the md5-prefix hash to a COLUMN before aggregating — the
    // [[minhashSignatures]] discipline: each of the 60 bit-sum aggregates
    // references the hash, and an inlined expression would re-digest the
    // token once per bit (60 md5 calls per token occurrence; codegen's
    // subexpression elimination does not reach across aggregate update
    // functions). CollapseProject keeps a non-trivial producer referenced
    // 60 times materialized, so the digest runs once per row.
    val hashed = toks.select(col("id"), Kmv.point(col("t")).as("hv"))
    val h = col("hv")
    val aggs = (0 until SimhashBits).map(i =>
      sum(when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$i"))
    val sums = hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    sums.select(col("id"),
      (0 until SimhashBits).map(i =>
        when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce((x, y) => x.bitwiseOR(y)).as("sig"))
  }

  /** SimHash near-dup candidates by chunk equality, verified with exact
    * Hamming distance. Pigeonhole: any pair within Hamming `chunks - 1`
    * shares at least one chunk, so the default (6 chunks × 10 bits) is
    * COMPLETE for maxHamming ≤ 5. Fewer, wider chunks (4 × 15) give much
    * finer buckets — prefer them at lake scale when the dup definition
    * allows Hamming ≤ 3. */
  def simhashPairs(sigIn: DataFrame, maxHamming: Int = 5, chunks: Int = 6,
      maxBucket: Int = 256): DataFrame = {
    require(SimhashBits % chunks == 0,
      s"chunks must divide $SimhashBits: $chunks")
    require(maxHamming <= chunks - 1,
      s"chunk banding is only complete for Hamming <= ${chunks - 1}")
    // The signature pipeline ends in an Exchange (the per-id groupBy in
    // simhash60); ReuseExchange / AQE stage reuse shares it across the
    // bucketing scan and both verify-join sides — no cache needed, and no
    // leaked persist surviving this call's return.
    val sig = sigIn
    val width = SimhashBits / chunks
    val mask = (1L << width) - 1
    val chunkCols = (0 until chunks).map(c =>
      struct(lit(c).as("c"),
        shiftrightunsigned(col("sig"), c * width).bitwiseAND(lit(mask)).as("v")))
    // same pre-collect membership cap as the LSH path ([[boundedBuckets]]):
    // degenerate chunk values (e.g. every empty doc sharing one signature)
    // must never materialize a full bucket in one aggregation buffer
    val exploded = sig
      .select(col("id"), explode(array(chunkCols: _*)).as("k"))
      .select(col("id"), col("k.c").as("c"), col("k.v").as("v"))
    val buckets = boundedBuckets(exploded, Seq("c", "v"), maxBucket)
    val pairs = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val s1 = sig.select(col("id").as("a"), col("sig").as("siga"))
    val s2 = sig.select(col("id").as("b"), col("sig").as("sigb"))
    pairs.join(s1, "a").join(s2, "b")
      .withColumn("hamming", expr("CAST(bit_count(siga ^ sigb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  // ---- deterministic planted-duplicate corpora (queries + tests + oracle
  // SQL replicate the same construction) --------------------------------

  /** documents ∪ exact copies of every doc_id ≡ 0 (mod 7), shifted +10000. */
  def plantedExact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"), col("text")))

  /** documents ∪ near-copies (3 appended junk tokens) of every
    * doc_id ≡ 0 (mod 5), shifted +20000. */
  def plantedNear(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000L).as("doc_id"),
          concat(col("text"), lit(" zz9 qq8 vv7")).as("text")))

  /** Connected components over an undirected similarity-pair graph — the
    * step that turns near-dup PAIRS into dedup DECISIONS: pairs are not
    * transitive (A~B, B~C does not imply the pair A~C was emitted), so
    * keep-one-per-pair under-deletes chains; the component is the true
    * duplicate cluster and `min(id)` its canonical survivor.
    *
    * Iterative min-label propagation: every node repeatedly takes the
    * minimum label among itself and its neighbors; converges in
    * O(component diameter) rounds — near-dup clusters are stars/short
    * chains, so 2-4 rounds in practice, `maxIter` bounds pathology.
    * Self-loops are unioned into the edge set so one round is a SINGLE
    * join + min-agg that references the label frame exactly once (min
    * over neighbors ∪ self ≡ least(own, neighbor-min)) — that keeps the
    * final plan linear in rounds where a two-reference step would double
    * the plan tree every round. Each round's labels are eagerly
    * localCheckpoint'ed (the iteration would otherwise re-plan and
    * re-codegen an ever-deeper lineage) and the PREVIOUS round's blocks
    * are released the moment the new round materializes, so storage
    * holds exactly one label set at any time regardless of round count.
    * On a real cluster use `sparkContext.setCheckpointDir` +
    * `checkpoint()` for the fault-tolerant variant — same loop.
    *
    * Convergence: labels only ever decrease, so the label SUM (exact,
    * decimal — no overflow, no tolerance) is strictly monotone and
    * stalls exactly at the fixpoint — one cheap agg per barrier instead
    * of a compare-join, and the loop takes TWO propagation steps per
    * barrier (see the in-body note) so the job/sync count is half the
    * round count.
    *
    * The RETURNED frame never pins executor storage (PlanAuditSpec's
    * per-query cached-RDD gate). Two shapes, chosen by `materializeDir`:
    * with a directory, the converged labels SPILL to parquet there and
    * a plain file-backed frame comes back — one |V|-row write+read, the
    * production shape (durable shared path on a real cluster; local
    * callers use the swept per-PID scratch root). Each call writes a
    * NEW `cc_<pid>_<seq>` spill — never reused or deleted here, because
    * a previously returned frame still reads its own spill; repeated
    * calls (bench warmup + timed) therefore accumulate one |V|-row
    * directory per call until the per-PID sweep reclaims the root. Without one, the
    * frame is a lazy, UNCACHED rebuild of the converged iteration
    * chain: the consumer re-executes the propagation steps, but the
    * edge side's exchange is identical every round (ReusedExchange
    * dedups it) and each step's agg output is already partitioned on
    * `node` for the next step — zero storage needed, right for small
    * diameters. (The lazy shape is min-label-only; the alternating
    * variant always spills — its round operator is multi-reference,
    * see [[alternatingCc]].) At 100 TB the same loop holds (it is the standard
    * Pregel-style CC); for graphs with giant components swap in
    * large-star/small-star (Kiveris et al., 2014) — same interface,
    * fewer rounds.
    *
    * `nodes` fixes the vertex set (isolated nodes keep themselves as
    * canonical); edges whose endpoints are outside `nodes` are ignored.
    *
    * `algorithm` selects the iteration scheme behind the same
    * interface: `"min-label"` (default) converges in O(diameter)
    * rounds — right for dedup graphs, whose components are stars and
    * short chains; `"alternating"` is large-star/small-star (Kiveris
    * et al., MR-CC 2014, [[alternatingCc]]) — O(log² n) rounds
    * regardless of diameter, the variant for graphs with giant or
    * long-path components where min-label would need a round per hop.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20,
      materializeDir: Option[String] = None,
      algorithm: String = "min-label"): DataFrame = {
    val nodeIds = nodes.select(col(nodes.columns.head).as("node"))
    // the label-sum convergence check is exact ONLY for integral ids:
    // string ids would cast to null (sum null == null → false
    // convergence after one barrier) and fractional ids could change
    // by less than the decimal's granularity — fail loudly up front
    // instead of returning silently wrong components
    require(Seq("long", "int", "integer", "bigint", "short", "byte")
      .contains(nodeIds.schema.head.dataType.typeName),
      s"connectedComponents needs integral node ids, got " +
        s"${nodeIds.schema.head.dataType.typeName} — hash string ids to " +
        "long (xxhash64) before clustering")
    algorithm match {
      case "min-label" =>
        minLabelCc(nodeIds, edges, aCol, bCol, maxIter, materializeDir)
      case "alternating" =>
        alternatingCc(nodeIds, edges, aCol, bCol, maxIter, materializeDir)
      case other => throw new IllegalArgumentException(
        s"unknown CC algorithm '$other' (want min-label or alternating)")
    }
  }

  private def minLabelCc(nodeIds: DataFrame, edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int,
      materializeDir: Option[String]): DataFrame = {
    val symSelf = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .join(nodeIds.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(nodeIds.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .unionByName(nodeIds.select(col("node").as("src"), col("node").as("dst")))
      .persist()
    def step(labels: DataFrame): DataFrame = symSelf
      .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
      .groupBy(col("src").as("node"))
      .agg(min(col("label")).as("label"))
    def labelSum(labels: DataFrame): Any =
      labels.agg(sum(col("label").cast("decimal(38,0)"))).head().get(0)
    // TWO propagation steps per materialization: each checkpoint+sum is
    // a cluster-wide barrier (a job round-trip locally, a full stage
    // sync on a real cluster), and monotonicity makes the stall check
    // just as sound across a double step — the sum stalls over steps
    // (2k-1, 2k) only if step 2k-1 changed nothing, i.e. the fixpoint
    // was already reached by step 2(k-1). Halves the barrier count for
    // the same round budget.
    var labels = nodeIds.withColumn("label", col("node")).localCheckpoint(true)
    var iter = 0 // completed double-step iterations
    var converged = false
    try {
      var prevSum = labelSum(labels)
      // not converged after k iterations ⇒ step 2k-1 changed ⇒ the
      // fixpoint is past 2k-2 — keep going only while 2·iter-2 < maxIter,
      // so a failure genuinely means "not converged within maxIter rounds"
      while (!converged && 2 * iter - 2 < maxIter) {
        val next = step(step(labels)).localCheckpoint(true)
        // release the old round and point `labels` at the new one
        // BEFORE the sum job: if labelSum throws, the finally block
        // must be holding the checkpoint that actually exists
        Caching.unpersistCheckpoint(labels)
        labels = next
        iter += 1
        val nextSum = labelSum(labels)
        converged = nextSum == prevSum
        prevSum = nextSum
      }
      require(converged,
        s"connectedComponents did not converge in $maxIter rounds")
      materializeDir match {
        case Some(root) =>
          // SPILL the converged labels to storage and hand back a plain
          // file-backed frame: one |V|-row write+read instead of
          // re-running the propagation chain in the consumer, and still
          // nothing cached. This is the production shape for big graphs
          // (pass a durable shared path on a real cluster); the default
          // lazy rebuild below needs no storage at all.
          val out = s"$root/cc_${ProcessHandle.current().pid()}_" +
            s"${CcSeq.incrementAndGet()}"
          labels.withColumnRenamed("label", "canonical")
            .write.mode("overwrite").parquet(out)
          labels.sparkSession.read.parquet(out)
        case None =>
          // fixpoint reached by step 2(iter-1) — rebuild that state
          // lazily, no checkpoints (the consumer re-executes the chain;
          // ReusedExchange dedups the edge side)
          var out = nodeIds.withColumn("label", col("node"))
          for (_ <- 1 to 2 * (iter - 1)) out = step(out)
          out.withColumnRenamed("label", "canonical")
      }
    } finally {
      // post-write/post-plan: the Some-branch frame reads files and the
      // None-branch plan references no checkpoint, so the final
      // checkpoint's blocks are dead either way
      symSelf.unpersist(blocking = false)
      Caching.unpersistCheckpoint(labels)
    }
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014): each
    * round rewires edges instead of propagating labels —
    *
    *  - LARGE-STAR, per node u: every strictly-larger neighbor is
    *    re-attached to m = min(Γ(u) ∪ {u});
    *  - SMALL-STAR, per node u: u and its smaller neighbors all attach
    *    to that same minimum.
    *
    * The alternation halves long paths instead of walking them, so it
    * converges in O(log² n) rounds independent of component diameter —
    * where min-label needs a round per hop — and its only fixpoints are
    * star graphs centered at component minima, so the converged edge
    * set IS the (node → canonical) mapping. Each round is two
    * keyed aggregations + two keyed joins + one distinct — all
    * partial-agg-friendly shuffles on node ids, never all-pairs, and
    * per-round state is one checkpointed edge set (previous rounds
    * released immediately, the [[minLabelCc]] storage discipline).
    * The final star's center degree is the component size — inherent
    * to ANY star-contraction output (the result itself is that
    * mapping) — but intermediate rounds keep degrees balanced, which
    * is the paper's point versus naive star contraction.
    *
    * Convergence: the canonical edge multiset is fingerprinted per
    * round (count + Σ xxhash64(u,v), order-invariant); an unchanged
    * fingerprint across a full round means the round was the identity
    * (w.h.p. — a 64-bit-sum collision at equal counts), i.e. the
    * fixpoint star state. Unlike min-label's label sums there is no
    * monotone scalar here, so fixpoint detection is the check, with
    * `maxIter` bounding pathology exactly as before. */
  private def alternatingCc(nodeIds: DataFrame, edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int,
      materializeDir: Option[String]): DataFrame = {
    // canonical form: directed larger→smaller, no self-loops, deduped,
    // both endpoints inside the vertex set
    val input = edges.select(col(aCol).as("x"), col(bCol).as("y"))
      .filter(col("x") =!= col("y"))
      .join(nodeIds.withColumnRenamed("node", "x"), Seq("x"), "left_semi")
      .join(nodeIds.withColumnRenamed("node", "y"), Seq("y"), "left_semi")
      .select(greatest(col("x"), col("y")).as("u"),
        least(col("x"), col("y")).as("v"))
      .distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val centers = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("c"), least(col("u"), col("mn")).as("m"))
      sym.join(centers, col("u") === col("c"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is canonical (u > v): the group at u holds exactly the
      // smaller neighbors; u and all of them attach to the minimum
      val centers = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(centers, "u")
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
    }
    def round(e: DataFrame): DataFrame =
      smallStar(largeStar(e)).distinct()
    def fingerprint(e: DataFrame): (Long, Any) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.get(1))
    }
    def labelsFrom(e: DataFrame): DataFrame =
      nodeIds.join(
        e.groupBy(col("u").as("node")).agg(min(col("v")).as("lbl")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("lbl"), col("node")).as("canonical"))
    var e = input.localCheckpoint(true)
    var iter = 0
    var converged = false
    try {
      var prev = fingerprint(e)
      while (!converged && iter < maxIter) {
        val next = round(e).localCheckpoint(true)
        Caching.unpersistCheckpoint(e)
        e = next
        iter += 1
        val cur = fingerprint(e)
        converged = cur == prev
        prev = cur
      }
      require(converged,
        s"connectedComponents(alternating) did not converge in $maxIter rounds")
      // ALWAYS spill (defaulting to the swept per-PID scratch root):
      // min-label's lazy-rebuild alternative is closed here because one
      // alternating round references its input ~4 times (the symmetric
      // union, then the join against the per-center minima), so a lazy
      // replay of k rounds is a 4^k-reference plan tree — Catalyst
      // analysis blows up long before the data does. The spill is one
      // |V|-row write+read and the returned frame pins no storage.
      val root = materializeDir.getOrElse(graft.Sessions.scratchRoot)
      val out = s"$root/cc_${ProcessHandle.current().pid()}_" +
        s"${CcSeq.incrementAndGet()}"
      labelsFrom(e).write.mode("overwrite").parquet(out)
      nodeIds.sparkSession.read.parquet(out)
    } finally Caching.unpersistCheckpoint(e)
  }

  private val CcSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Survivor selection per duplicate cluster — the dedup DECISION that
    * follows [[connectedComponents]]: from each component keep the
    * member with the best `score` (ascending by default: "prefer the
    * shortest/cleanest copy"; ties broken by smallest node id, so the
    * choice is deterministic and oracle-checkable — the C4/RefinedWeb
    * keep-policy shape, where near-dup families keep the original and
    * drop the padded variants). One hash aggregation on `canonical`:
    * `min(struct(score, node))` is the lexicographic argmin, partial-agg
    * friendly (map-side combine), so at 100 TB the cluster table never
    * materializes per-member rows past the shuffle.
    *
    * `components`: (node, canonical) as returned by
    * [[connectedComponents]]; `scores`: (node, score). */
  def keepBest(components: DataFrame, scores: DataFrame): DataFrame =
    components.join(scores, "node")
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("cluster_size"),
        min(struct(col("score"), col("node"))).as("_best"))
      .select(col("canonical"), col("cluster_size"),
        col("_best.node").as("keeper"), col("_best.score").as("keeper_score"))
}
