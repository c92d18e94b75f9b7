package graft

import org.apache.hadoop.fs.Path

/** Measured (not argued) evidence for the DELTA-ENCODED manifest log
  * at commit scale: a minute-cadence streaming sink reaches 10k
  * commits in a week over a lake holding ~1k live data dirs. Builds
  * that steady state THROUGH THE REAL PROTOCOL — appends growing a
  * 1k-dir window, then replacing commits (drop oldest + add newest,
  * the compaction/retention shape) holding it — so manifests are
  * production's own bytes: deltas with a full snapshot at the cadence.
  * Reports
  *
  *  - per-commit manifest bytes: the delta log's actual writes vs the
  *    full-list encoding (O(commits x live dirs) storage removed);
  *  - tip live-set resolution (nearest full/ckpt + delta replay);
  *  - `versionAt` (binary-searched manifest mtimes, O(log N) stats —
  *    the TIMESTAMP AS OF / startingTimestamp path);
  *  - `history()` (one forward walk over the whole log);
  *  - a cold `spark.read.format("graftlake")` plan over the full lake
  *    (tip + snapshot resolve + file listing, O(live dirs) per plan);
  *  - one streaming `latestOffset -> planInputPartitions` trigger over
  *    a 100-version backlog (the per-trigger planning cost).
  *
  * Usage: runMain graft.LogScale [nVersions] [windowDirs] [reps]
  */
object LogScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val window = if (args.length > 1) args(1).toInt else 1000
    val reps = if (args.length > 2) args(2).toInt else 20
    val spark = Sessions.local("graft-logscale")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("logscale")
      .toString
    val dir = s"$root/lake"
    graft.engine.VersionedLake.commit(
      spark.range(0, 100).toDF("id").coalesce(1), dir)
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val seedFile = f.listStatus(new Path(
      s"$dir/${graft.engine.VersionedLake.manifestEntries(spark, dir, 1).head}"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get

    // the real write pattern: appends grow the window, then each
    // commit drops the oldest dir and adds a new one (retention /
    // compaction steady state) — delta manifests stay O(1) entries
    val before = System.nanoTime()
    (2 to n).foreach { v =>
      if (v <= window + 1)
        graft.engine.VersionedLake.publishForScale(spark, dir, s"d-ls$v")
      else
        graft.engine.VersionedLake.deleteRangePublishForTest(spark, dir,
          Set(s"d-ls${v - window}"), s"d-ls$v")
    }
    val publishMs = (System.nanoTime() - before) / 1e6 / (n - 1)

    // materialize on disk only what the measured READ paths list: the
    // final live window plus the early append backlog the streaming
    // trigger plans over (publishes never touch data dirs)
    def materialize(v: Int): Unit = {
      val d = new Path(s"$dir/d-ls$v")
      if (!f.exists(d)) {
        org.apache.hadoop.fs.FileUtil.copy(
          f, seedFile, f, new Path(d, s"part-ls$v.parquet"),
          false, spark.sparkContext.hadoopConfiguration)
        ()
      }
    }
    ((n - window + 1) to n).foreach(materialize)
    (2 to math.min(101, n)).foreach(materialize)

    val tip = graft.engine.VersionedLake.tip(spark, dir).get
    val live = graft.engine.VersionedLake.manifestEntries(spark, dir, tip)
    val manifests = f.listStatus(new Path(s"$dir/_manifests")).toSeq
      .filter(_.getPath.getName.matches("v\\d+"))
    val totalBytes = manifests.map(_.getLen).sum
    val fullListBytes = live.map(_.length + 1L).sum
    println(f"[logscale] commits=$n liveDirs=${live.length} " +
      f"manifestLogBytes=$totalBytes " +
      f"(avg ${totalBytes / manifests.length}%d B/commit) vs " +
      f"full-list encoding ~${fullListBytes * n}%d B " +
      f"(${fullListBytes}%d B/commit); publish ${publishMs}%.2f ms/op")

    def time(label: String)(body: => Any): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      println(f"[logscale] $label: " +
        f"${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/op " +
        f"(n=$n, dirs=${live.length})")
    }
    time("tip live-set resolution (ckpt/full + delta replay)") {
      require(graft.engine.VersionedLake
        .manifestEntries(spark, dir, tip).length == live.length)
    }
    val now = System.currentTimeMillis()
    time("versionAt (binary-searched mtimes)") {
      require(graft.engine.VersionedLake
        .versionAt(spark, dir, now).contains(tip))
    }
    time("history() forward walk") {
      require(graft.engine.VersionedLake
        .history(spark, dir).length == n)
    }
    time("cold graftlake plan (footer-inferred schema + listing)") {
      spark.read.format("graftlake").load(dir)
        .queryExecution.executedPlan
    }
    // SQL writers embed the table schema in every manifest (#schema
    // line): the plan then resolves it from ONE manifest read instead
    // of merging O(live files) parquet footers — publish one such
    // commit and measure the difference (the residual is the file
    // LISTING of the live dirs, paid by any planner)
    graft.engine.VersionedLake.publishForScale(spark, dir,
      s"d-ls${n + 1}",
      Some(spark.read.format("graftlake").load(dir).schema.json))
    materialize(n + 1)
    time("cold graftlake plan (manifest-declared schema + listing)") {
      spark.read.format("graftlake").load(dir)
        .queryExecution.executedPlan
    }
    // one streaming trigger over the 100-version append backlog at the
    // log's head: latestOffset (admission) + planInputPartitions
    val schema = spark.read.format("graftlake").load(dir).schema
    val scan = new graft.engine.GraftLakeScanBuilder(spark,
      new graft.engine.GraftLakeFileIndex(spark, dir, tip),
      schema, schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("path", dir)),
      dir).build()
    val stream = new graft.engine.GraftLakeMicroBatchStream(
      scan.asInstanceOf[graft.engine.GraftLakeParquetScan], dir,
      startingVersion = 1, maxVersionsPerTrigger = Some(100))
    time("streaming latestOffset -> planInputPartitions (100-v backlog)") {
      val from = graft.engine.GraftLakeOffset(1)
      val end = stream.latestOffset(from,
        org.apache.spark.sql.connector.read.streaming.ReadLimit
          .allAvailable())
      require(stream.planInputPartitions(from, end).nonEmpty)
    }

    // ---- PARTITIONED-entry point: one manifest entry PER (commit,
    // partition leaf) — the partitioned streaming sink's write pattern
    // (q210). Entries are hive leaf paths (~2x longer strings) and each
    // commit carries TWO of them; same steady-state window. The delta
    // log must stay O(delta per commit), never O(live leaves).
    val pdir = s"$root/plake"
    graft.engine.VersionedLake.commit(
      spark.range(0, 10).toDF("id").coalesce(1), pdir)
    def leaves(v: Int) = Seq(
      s"d-pl$v/y=2024/m=${v % 12}", s"d-pl$v/y=2024/m=${(v + 1) % 12}")
    val pWindow = window / 2 // 2 leaves/commit -> same live-entry count
    val t0p = System.nanoTime()
    (2 to n).foreach { v =>
      if (v <= pWindow + 1)
        graft.engine.VersionedLake.publishForScaleAll(spark, pdir,
          leaves(v))
      else
        graft.engine.VersionedLake.replacePublishForScale(spark, pdir,
          leaves(v - pWindow).toSet, leaves(v))
    }
    val pPublishMs = (System.nanoTime() - t0p) / 1e6 / (n - 1)
    val pTip = graft.engine.VersionedLake.tip(spark, pdir).get
    val pLive = graft.engine.VersionedLake.manifestEntries(spark, pdir,
      pTip)
    val pManifests = f.listStatus(new Path(s"$pdir/_manifests")).toSeq
      .filter(_.getPath.getName.matches("v\\d+"))
    val pBytes = pManifests.map(_.getLen).sum
    val pFullList = pLive.map(_.length + 1L).sum
    println(f"[logscale] PARTITIONED commits=$n liveLeaves=${pLive.length} " +
      f"manifestLogBytes=$pBytes " +
      f"(avg ${pBytes / pManifests.length}%d B/commit) vs " +
      f"full-list encoding ~${pFullList * n}%d B " +
      f"(${pFullList}%d B/commit); publish ${pPublishMs}%.2f ms/op")
    time("partitioned tip live-set resolution") {
      require(graft.engine.VersionedLake
        .manifestEntries(spark, pdir, pTip).length == pLive.length)
    }
    spark.stop()
  }
}
