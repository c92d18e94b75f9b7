package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ENFORCED physical-plan gate (the reference's "avoid full scan"
  * cost checks, reference README.md:29-31, promoted from the PlanAudit
  * report to a failing test): a future query that plans an unapproved
  * cartesian product, drops a bounded query's top-k into a global sort,
  * or leaks cached data past its return breaks the build, not the next
  * benchmark round.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** Deliberately-bounded nested-loop joins: q43 pairs a vec_id<60 grid
    * (≤1770 rows by construction); q44 broadcasts a single query row;
    * q57 broadcasts a ONE-ROW quantile threshold back over the corpus
    * (crossJoin(broadcast(agg)) — the scalable scalar-threshold shape);
    * q80 broadcasts a ONE-ROW corpus count into the tf⋈df join; q84
    * generates edges all-pairs over a ≤300-doc planted subset (the
    * operator under test is the transitive closure — unbounded candidate
    * generation is LSH's job). */
  // q84/q101 are NOT listed: their clustering pipeline (bounded planted
  // crossJoin + CC loop) executes eagerly during build and spills, so
  // the audited plan is just the spilled-label file scan — the bounded-
  // cartesian discipline for them lives in DedupQueries (fixed planted
  // subset) and DedupSpec, not here.
  private val cartesianAllowed =
    Set("q43_embedding_cosine_pairs", "q44_cosine_topk",
      "q57_quality_quantile_filter", "q80_tfidf",
      "q94_quarantine", // q94: 1×1 summary crossJoin of two aggregates
      "q114_source_mix", // ONE-ROW totals crossJoin into the quota calc
      "q115_unigram_surprisal", // ONE-ROW token total into the scorer
      "q126_bigram_surprisal", // ONE-ROW token total into the scorer
      "q128_bm25_topk", // TWO ONE-ROW stat frames into the scorer
      "q151_pagerank", // ONE-ROW node count into teleport/r0 terms
      "q159_hybrid_rrf", // q44's 1-row query vec + q128's stat frames
      "q161_hard_negatives", // ≤10-anchor broadcast into the scan
      "q164_drift_psi", // ONE-ROW totals crossJoin over ≤12 bucket rows
      "q152_profile", // ONE-ROW per-column distinct-count frames
      "q171_filtered_ann", // q44's 1-row query-vector broadcast
      "q174_maxsim_topk", // ONE-ROW query-token frame into the scan
      "q175_kmv_overlap", // 1×1 sketch-stat frames into the estimates
      "q176_boilerplate_lines") // ONE-ROW heavy-line set, row-local filter

  /** Queries whose output is bounded (LIMIT/top-k semantics) MUST plan
    * TakeOrderedAndProject — per-partition heaps, no global sort. */
  private val mustTopK = Set(
    "q02_project_scalar", "q03_topk", "q08_outer_join",
    "q37_word_topk", "q44_cosine_topk", "q45_ann_lsh",
    "q102_ann_partition_prune", "q111_weighted_sample", "q121_bpe_pairs",
    "q128_bm25_topk", "q171_filtered_ann", "q174_maxsim_topk")

  /** Dimension-join queries MUST broadcast their dims: a fact⋈dim that
    * plans a SortMergeJoin shuffles the fact side — the single most
    * expensive wrong plan at 100 TB. (q61 is exempt BY DESIGN: it forces
    * a merge join to prove the bucketed layout removes the exchange.) */
  // q99's dimension joins DO broadcast (4 in-plan), but its EXCEPT
  // anti-join of two same-sized aggregates legitimately plans SMJ
  // pre-AQE, so it doesn't fit this gate's "no SMJ anywhere" form.
  // q112/q113/q114: curation passes whose corpus side must NEVER
  // sort-merge — the boilerplate set, eval-gram set, and quota table
  // are all small by construction and must broadcast.
  // (q174/q176 cross ONE broadcast row into the corpus scan — they plan
  // BroadcastNestedLoopJoin, so they live in cartesianAllowed above and
  // their no-SMJ discipline is asserted in SimilaritySpec/WebTextSpec.)
  private val mustBroadcastOnly = Set(
    "q04_join_broadcast", "q06_semi_join", "q07_anti_join",
    "q77_sql_join3", "q112_segment_dedup", "q113_decontaminate",
    "q114_source_mix", "q115_unigram_surprisal", "q126_bigram_surprisal")

  test("no query plans an unapproved cartesian; bounded queries keep top-k") {
    val feats = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val f = PlanAudit.features(spark, sf, fn)
        // Per-query cache hygiene (the round-8 lesson: the dedup-only
        // check let Lake.upsert's and readCsvQuarantine's checkpoints
        // slip through): building ANY query — including the eager
        // fixture/iteration work some builders do — must leave zero
        // persistent RDDs behind, or every later query in a bench run
        // executes against a polluted executor heap.
        val leaked = spark.sparkContext.getPersistentRDDs
        assert(leaked.isEmpty,
          s"$name left cached RDDs behind: " +
            leaked.values.map(_.toString).mkString("; "))
        name -> f
    }
    val badCartesian = feats.collect {
      case (n, f) if f.cartesian && !cartesianAllowed(n) => n
    }
    assert(badCartesian.isEmpty,
      s"cartesian/nested-loop outside the allow-list: $badCartesian")
    val missingTopK = feats.collect {
      case (n, f) if mustTopK(n) && !f.topk => n
    }
    assert(missingTopK.isEmpty,
      s"bounded-output queries without TakeOrderedAndProject: $missingTopK")
    val factShuffled = feats.collect {
      case (n, f) if mustBroadcastOnly(n) &&
        (f.broadcastJoins == 0 || f.sortMergeJoins > 0) => n -> f
    }
    assert(factShuffled.isEmpty,
      s"dimension joins planning a fact-side shuffle: $factShuffled")
    // every declared query must exist (guards the sets against renames)
    val known = feats.map(_._1).toSet
    assert((mustTopK ++ cartesianAllowed ++ mustBroadcastOnly).subsetOf(known))
  }

  test("lake queries with Year/Month/Day predicates plan partition pruning") {
    // The one cost rule the reference states outright (README.md:29-31):
    // avoid full scans — partition so queries read only matching data.
    // Enforce its physical form: a Year/Month/Day-filtered lake scan must
    // carry the predicate as PartitionFilters (directories skipped at
    // planning), and a data-column predicate must reach the parquet reader
    // as PushedFilters — at 100 TB these are the difference between
    // reading one day and reading the lake.
    import graft.engine.{EegFixture, Ingest, Lake}
    val root = TestSpark.tempDir("plan-prune")
    EegFixture.write(s"$root/in", EegFixture.specA)
    Ingest.ingestBatch(spark, s"$root/in", s"$root/lake", s"$root/registry",
      s"$root/processed")

    def scanLine(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("FileScan")).mkString("\n")

    val pruned = scanLine(Lake.read(spark, s"$root/lake")
      .filter("Year = 2019 AND Month = 7 AND Day = 15"))
    assert(pruned.matches("(?s).*PartitionFilters: \\[[^\\]]*Year[^\\]]*\\].*"),
      s"partition predicate did not become PartitionFilters:\n$pruned")

    val pushed = scanLine(Lake.read(spark, s"$root/lake")
      .filter("Time > 100.0"))
    assert(pushed.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(Time[^\\]]*\\].*"),
      s"data predicate did not reach the parquet reader:\n$pushed")
    // control: the data-column filter must NOT populate PartitionFilters
    assert(pushed.matches("(?s).*PartitionFilters: \\[\\].*"),
      s"control: data filter unexpectedly in PartitionFilters:\n$pushed")
  }

  test("bucketed tables join with zero exchanges; unbucketed form shuffles") {
    // The pay-the-shuffle-once contract of Lake.writeBucketed: a
    // sort-merge join of two tables bucketed on the join key with equal
    // bucket counts must move NO data (no Exchange on either side),
    // where the same join on raw frames shuffles both. Broadcast is
    // disabled so the comparison is SMJ-vs-SMJ, not SMJ-vs-broadcast.
    import graft.engine.{Lake, Tables}
    val cust = Tables.table(spark, sf, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"))
    val ord = Tables.table(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_totalprice"))
    Lake.writeBucketed(cust, "gate_bt_customer", "c_custkey", 8)
    Lake.writeBucketed(ord, "gate_bt_orders", "o_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val c = spark.table("gate_bt_customer")
      val o = spark.table("gate_bt_orders")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val bucketed = exchanges(c.join(o, c("c_custkey") === o("o_custkey")))
      assert(bucketed == 0, s"bucketed join planned $bucketed exchanges")
      val raw = exchanges(cust.join(ord,
        cust("c_custkey") === ord("o_custkey")))
      assert(raw >= 2, s"control: raw join planned only $raw exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS gate_bt_customer")
      spark.sql("DROP TABLE IF EXISTS gate_bt_orders")
    }
  }

  test("multi-consumer pipelines leave no cached RDDs after returning") {
    // The round-3 regression class: Dedup persisted its shingle/signature
    // tables and never unpersisted, so every bench query after q40/q41 ran
    // against a polluted executor heap. The pipelines now rely on
    // ReuseExchange/AQE stage reuse instead — run them to completion and
    // assert nothing stayed cached.
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    graft.engine.Dedup.nearDupPairs(
      graft.engine.Dedup.plantedNear(docs), "doc_id", "text", 0.5).count()
    graft.engine.Dedup.simhashPairs(
      graft.engine.Dedup.simhash60(docs, "doc_id", "text"), maxHamming = 4)
      .count()
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"cached RDDs survived a query's return: ${leaked.values.map(_.name)}")
    // the streaming memory sinks must be dropped by runAvailableNow, not
    // accumulate one temp view per call
    graft.engine.Streaming.runAvailableNow(
      graft.engine.Streaming.tumblingCounts(
        graft.engine.Streaming.eventsStream(spark, sf)), "gate_tumbling")
      .count()
    val sinkViews = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("gate_tumbling"))
    assert(sinkViews.isEmpty,
      s"memory-sink temp views leaked: ${sinkViews.map(_.name).toSeq}")
  }

  test("q108 pipeline: row-local gates before 3 exchanges, rank-1 " +
      "pre-shuffle, no per-element re-tokenization") {
    // The composed-pipeline cost model at 100 TB: every filter stage
    // (lang agreement, quality band, repetition) must run in the scan's
    // stage, so the only wide operators are the dedup window, the
    // 3-group aggregate, and the final order — exactly 3 exchanges.
    // WindowGroupLimit's Partial pass must sit BELOW the window
    // exchange (each map task forwards at most one row per fingerprint
    // — the dedup shuffle moves survivors, not duplicates). And the
    // collapsed filter must not contain `slice(split(...))`: that is
    // the pushed-predicate O(n²) re-tokenization q108 had before
    // dupGramRatioExpr (TextSpec holds the expression-level contract;
    // this holds the end-to-end plan).
    val df = SparkEntry.queries("q108_curation_pipeline")(spark, sf)
    val exec = df.queryExecution.executedPlan.toString
    val nExchanges = "Exchange [a-z]".r.findAllIn(exec).length
    assert(nExchanges <= 3, s"expected <=3 exchanges, got $nExchanges:\n$exec")
    assert(exec.contains("WindowGroupLimit") && exec.contains("Partial"),
      s"no partial rank-1 pushdown below the dedup window:\n$exec")
    assert(!exec.contains("slice(split("),
      "per-element re-tokenization is back in the collapsed filter")
  }

  test("q106 injects a runtime bloom filter on the fact side of the join") {
    // The demonstrated form of semi-join reduction: the selective orders
    // leg must produce a bloom filter that the lineitem side applies as
    // might_contain(...) BEFORE its shuffle — at 100 TB that filter is
    // the difference between shuffling the whole fact table and
    // shuffling the surviving fraction. The q106 oracle already proves
    // result-invariance; this gate pins the plan shape so a Spark or
    // builder change that silently stops injecting the filter fails the
    // build, not a benchmark round.
    val df = SparkEntry.queries("q106_bloom_join_prune")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"no runtime bloom filter in the optimized plan:\n$opt")
    // and the join is the shuffle join the filter exists to protect
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("SortMergeJoin") || exec.contains("ShuffledHashJoin"),
      s"expected a shuffle join under the bloom filter:\n$exec")
  }

  test("q133 scores and filters row-local: the only exchange is the " +
      "presentation sort") {
    // The model-based filter's 100 TB contract: the hashed-n-gram logit
    // and its threshold run INSIDE the scan stage (map-side), so only
    // surviving rows ever reach an exchange. One shuffle total — the
    // final orderBy — and it must sit ABOVE the filter.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    val df = SparkEntry.queries("q133_quality_scorer")(spark, sf)
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.length == 1,
      s"expected exactly the sort exchange, got ${shuffles.length}:\n" +
        df.queryExecution.executedPlan)
    // the logit filter is beneath that one exchange, not above it
    assert(walk(shuffles.head).exists(_.toString.contains("Filter")),
      s"score filter did not run below the exchange:\n" +
        df.queryExecution.executedPlan)
  }

  test("incremental dedup never reshuffles the signature index: the " +
      "index scan is narrow and feeds a broadcast join map-side") {
    // The scale contract of Dedup.dedupAgainstIndex (the corpus-so-far
    // index is O(corpus); the batch is O(batch)): the index side must be
    // consumed by a BroadcastHashJoin probe with NO Exchange between its
    // file scan and the join, reading ONLY the fp column. A plan change
    // that flips the join to sort-merge (reshuffling the whole corpus
    // per monthly drop) or widens the scan fails here, not at 100 TB.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    val root = TestSpark.tempDir("inc-dedup-plan")
    val idx = s"$root/index"
    val docs = graft.engine.Tables.table(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text"))
    // drop 1 builds the index; drop 2's plan is what we audit
    graft.engine.Dedup.dedupAgainstIndex(docs, "text", "id", idx, "b1")
      .write.format("noop").mode("overwrite").save()
    val second = graft.engine.Dedup.dedupAgainstIndex(
      docs.withColumn("id", col("id") + 50000L), "text", "id", idx, "b2")
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val nodes = walk(second.queryExecution.executedPlan)
    def isIndexScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains("index"))
      case _ => false
    }
    val indexScans = nodes.filter(isIndexScan)
    assert(indexScans.nonEmpty, "expected a scan of the signature index")
    // narrow: the index scan reads only the fp column
    indexScans.foreach { s =>
      val cols = s.asInstanceOf[FileSourceScanExec].requiredSchema.fieldNames
      assert(cols.sameElements(Array("fp")),
        s"index scan should read only fp, read ${cols.mkString(",")}")
    }
    // never reshuffled: no ShuffleExchange has the index scan beneath it
    nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      assert(!walk(e).exists(isIndexScan),
        s"signature index is reshuffled:\n${second.queryExecution.executedPlan}")
    }
  }

  test("near-dup index postings feed a broadcast join with no exchange " +
      "on the scan-to-join path") {
    // nearDupAgainstIndex's posting list is corpus-sized; its scan must
    // reach its FIRST join un-exchanged, with the batch's bucket keys on
    // the broadcast side. (Shuffles ABOVE that join — the posting cap
    // window — touch only matched rows and are allowed.)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    val root = TestSpark.tempDir("neardup-plan")
    val idx = s"$root/index"
    val docs = graft.engine.Tables.table(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text")).limit(40)
    graft.engine.Dedup.nearDupAgainstIndex(docs, "id", "text", idx, "p1")
      .write.format("noop").mode("overwrite").save()
    val second = graft.engine.Dedup.nearDupAgainstIndex(
      docs.withColumn("id", col("id") + 90000L), "id", "text", idx, "p2")
    // path from root to the keys-lake scan
    def pathTo(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case a: AdaptiveSparkPlanExec => pathTo(a.executedPlan).map(a :: _)
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("neardup-plan")) => Some(List(s))
      case other =>
        (other.children ++ other.subqueries).view.flatMap(pathTo).headOption
          .map(other :: _)
    }
    val path = pathTo(second.queryExecution.executedPlan)
    assert(path.isDefined, "expected a scan of the posting-list index")
    val belowJoin = path.get.reverse
      .takeWhile(!_.isInstanceOf[BroadcastHashJoinExec])
    assert(belowJoin.length < path.get.length,
      s"index scan never meets a broadcast join:\n${path.get.head}")
    assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"exchange between the index scan and its join:\n${path.get.head}")
  }

  test("web-text queries stay row-local: q148/q149 shuffle only for the " +
      "presentation sort; q150 adds exactly the shard aggregation") {
    // Extraction and normalization are scan-stage scalar work — at
    // 100 TB any exchange beneath them would shuffle the raw crawl. The
    // export manifest may shuffle once on shard_id (the operator's one
    // inherent exchange) plus the final sort.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    def shuffles(name: String): Seq[ShuffleExchangeExec] =
      walk(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
    Seq("q148_unicode_normalize", "q149_html_extract").foreach { q =>
      val s = shuffles(q)
      assert(s.length == 1, s"$q: expected only the sort exchange, got $s")
    }
    val s150 = shuffles("q150_training_export")
    assert(s150.length <= 2, s"q150: expected shard agg + sort, got $s150")
    assert(s150.exists(_.outputPartitioning.toString.contains("shard_id")),
      s"q150: no exchange hash-partitions on shard_id:\n$s150")
  }

  test("q147 substring dedup plans no corpus self-join: gram rank + " +
      "starts joinback bound the exchanges") {
    // The operator's inherent exchanges: gram-hash rank window, starts
    // per-doc aggregation, the id joinback (both sides), presentation
    // sort. Anything beyond that — in particular a cartesian or a
    // token-level corpus explosion shuffle — is a regression.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val df = SparkEntry.queries("q147_substring_dedup")(spark, sf)
    val nodes = walk(df.queryExecution.executedPlan)
    val n = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(n <= 5, s"q147: exchange count grew to $n:\n" +
      df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Cartesian")),
      "q147 must not plan a cartesian")
  }

  test("q161 ranks hard negatives with a Partial WindowGroupLimit below " +
      "the exchange; q162's scatter aggregation is partial before its " +
      "shuffle") {
    // q161's 100 TB contract: each map task forwards ≤ k rows per
    // anchor BEFORE the window exchange (WindowGroupLimit Partial), so
    // the shuffle carries O(anchors·k·partitions) rows, never the
    // scored corpus; the anchor set arrives by broadcast.
    val e161 = SparkEntry.queries("q161_hard_negatives")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(e161.contains("WindowGroupLimit") &&
      e161.contains("Partial"),
      s"q161: no partial per-anchor rank pushdown:\n$e161")
    assert(e161.contains("BroadcastExchange"),
      s"q161: anchors must broadcast:\n$e161")
    // q162's contract: the custom IntScatterAgg folds rows into one
    // buffer per task BELOW the exchange (partial typed aggregate), the
    // exchange is the keyless single-partition merge, and no Generate
    // amplifies the scan — the result explodes only AFTER the final
    // merge (2,080 rows total).
    val e162 = SparkEntry.queries("q162_int_scatter")(spark, sf)
      .queryExecution.executedPlan.toString
    val partialIdx = e162.indexOf("partial_graft_int_scatter")
    val exchangeIdx = e162.indexOf("Exchange SinglePartition")
    val genIdx = e162.indexOf("Generate explode")
    assert(partialIdx >= 0 && exchangeIdx >= 0 &&
      exchangeIdx < partialIdx,
      s"q162: expected partial graft_int_scatter below the merge " +
        s"exchange:\n$e162")
    assert(genIdx == -1 || genIdx < exchangeIdx,
      s"q162: scan-side Generate amplification is back:\n$e162")
  }

  test("Cdc.merge never shuffles the base: the snapshot splits on " +
      "broadcast semi/anti and no Exchange sits above a base scan") {
    // The r11 scale-killer: full-outer joins cannot broadcast in Spark
    // 4.1.2 (JoinSelection excludes FullOuter even with an explicit
    // hint), so the old one-full-outer merge sorted AND shuffled the
    // 100 TB base per changelog batch — and q156 paid it per
    // micro-batch. The rewrite splits the base on the broadcast
    // winner-key set; this gate pins that shape: the base parquet scan
    // must never appear beneath a ShuffleExchange, and both split joins
    // must be BroadcastHashJoin.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    val base = graft.engine.Tables.table(spark, sf, "orders")
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
    import spark.implicits._
    val ch = Seq((1L, 101L, 1, "U"), (2L, 202L, 1, "I"),
      (3L, 0L, 1, "D"), (2L, 203L, 2, "U"))
      .toDF("k", "price_cents", "seq", "op")
    val merged = graft.engine.Cdc.merge(base, ch, "k", "seq", "op",
      Seq("price_cents"))
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val nodes = walk(merged.queryExecution.executedPlan)
    def isBaseScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains("orders"))
      case _ => false
    }
    assert(nodes.exists(isBaseScan), "expected a parquet scan of the base")
    nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      assert(!walk(e).exists(isBaseScan),
        s"base is reshuffled:\n${merged.queryExecution.executedPlan}")
    }
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    val baseSideBhj = bhj.filter(j => walk(j).exists(isBaseScan))
    assert(baseSideBhj.size >= 2,
      s"expected broadcast semi+anti over the base, got " +
        s"${baseSideBhj.map(_.joinType)}:\n" +
        merged.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"merge planned a sort-merge join:\n" +
        merged.queryExecution.executedPlan)
    // and the touched-key probe reads ONLY the key column off the base
    val narrow = nodes.collect {
      case s: FileSourceScanExec if isBaseScan(s) => s.requiredSchema.fieldNames
    }
    assert(narrow.exists(_.sameElements(Array("o_orderkey"))),
      s"semi-split base scan is not pruned to the key: " +
        narrow.map(_.mkString(",")).mkString("; "))
  }
}
