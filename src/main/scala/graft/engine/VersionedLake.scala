package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned lake with snapshot isolation, time travel, and vacuum —
  * the manifest-log design (Iceberg/Delta shape, reduced to its load-
  * bearing core) on plain Parquet + a filesystem:
  *
  * ```
  * <dir>/d-<token>/               one immutable data directory per commit
  * <dir>/_manifests/v00007        one manifest per version: either the
  *                                FULL live set (one dir name per line)
  *                                or a DELTA (`#delta` + `+dir`/`-dir`
  *                                ops against the previous version)
  * <dir>/_manifests/v00007.ckpt   optional checkpoint sidecar: the full
  *                                live set AT that version — bounds the
  *                                delta-replay walk and anchors vacuum
  * ```
  *
  * Routine commits write DELTA manifests (O(changed dirs) bytes, not
  * O(live dirs)); every [[CheckpointInterval]]-th version — and every
  * overwrite/replace, whose live set IS its delta — is written full,
  * so resolving any version replays at most `CheckpointInterval - 1`
  * small files from the nearest full manifest or `.ckpt` sidecar.
  * Without this, a minute-cadence streaming sink over a lake with
  * 10^4-10^5 data dirs pays O(commits x dirs) manifest-log storage and
  * an O(live) write per commit (Delta's log runs the same
  * delta-actions + periodic-checkpoint design for the same reason).
  *
  * A commit writes its data directory FIRST, then publishes a manifest
  * whose name embeds the next version number, created with
  * `overwrite = false` — the create is the commit's compare-and-swap:
  * of two racing writers, exactly one creates `v00008`; the loser
  * re-reads the new live set and retries at `v00009` (its data dir is
  * already on disk — only the pointer write repeats). Readers list
  * manifests and read data dirs that are never mutated after publish,
  * so every version is a consistent snapshot with no read locks; a
  * crash before the manifest create leaves an unreferenced data dir
  * (invisible, swept by [[vacuum]]), never a torn version.
  *
  * At 100 TB nothing here is size-of-data: a commit's CAS is one
  * create RPC, readers resolve a snapshot with one list + one read,
  * and [[vacuum]] deletes by manifest difference — no directory walk
  * over data. (On HDFS/local, `create(overwrite=false)` is atomic; an
  * object store without atomic create would supply its CAS primitive —
  * conditional PUT — behind the same protocol.)
  *
  * The reference keeps one mutable lake with no version history
  * (sparkle-v9.py:128-138 overwrite-style append); this module is the
  * missing production discipline: concurrent writers can't corrupt the
  * lake, and yesterday's training run stays reproducible against
  * yesterday's version.
  */
object VersionedLake {

  private val ManifestDir = "_manifests"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 5-digit names below 100k, 9-digit beyond — the name is the CAS
    * collision point, so it must be deterministic per version, and
    * existing 5-digit lakes must keep resolving; the widening lifts
    * the 99,999-commit cap (a once-a-minute streaming sink passes
    * 100k commits in 10 weeks) to ~1.9k years at that rate. */
  private def manifestPath(dir: String, v: Int): Path =
    new Path(s"$dir/$ManifestDir/v" +
      (if (v <= 99999) "%05d".format(v) else "%09d".format(v)))

  /** Published versions, ascending; empty for a non-existent lake.
    * One full directory list — the ground-truth AUDIT enumeration
    * ([[vacuum]], specs). No hot path calls this anymore: newest-
    * version resolution is [[tip]] (O(1 + lag) via the hint file) and
    * range-dependent metadata ([[versionAt]], [[history]],
    * [[commitTagged]]'s replay check) goes through [[versionRange]]
    * (O(log tip) existence probes, no listing). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val md = new Path(s"$dir/$ManifestDir")
    val f = fs(spark, dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(n => n.matches("v\\d{5}") || n.matches("v\\d{9}"))
      .map(_.drop(1).toInt).sorted
  }

  // ---- O(1) tip resolution (the `_last_checkpoint` shape) --------------
  //
  // Every manifest is already a full-state snapshot (the complete live
  // set, not a delta), so unlike Delta no log REPLAY ever happens —
  // the only O(#commits) cost was DISCOVERING the newest manifest by
  // listing the whole log directory, paid on every plan, read, and
  // publish CAS attempt. A hint file written after each publish makes
  // that O(1 + lag): read the hint, verify its manifest exists, probe
  // forward to the first missing version. Correctness never rests on
  // the hint — it can only UNDER-report (written after publish;
  // concurrent writers may regress it), the probe walks forward past
  // any regression, a hint whose manifest is gone (vacuumed) falls
  // back to the full listing, and interior gaps cannot exist: versions
  // are claimed sequentially, a torn manifest BLOCKS all later
  // publishes until repair deletes it (making its predecessor the tip
  // again), and vacuum removes only prefixes. So "v exists, v+1
  // missing" proves v is the tip.

  private val TipHint = "_tip"
  private val MaxTipProbe = 4096

  private def tipHintPath(dir: String): Path =
    new Path(s"$dir/$ManifestDir/$TipHint")

  /** Best-effort hint refresh after a publish — a failure (or a racing
    * overwrite) costs probe steps on the next resolution, never
    * correctness. */
  private def writeTipHint(f: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Int): Unit =
    try {
      val out = f.create(tipHintPath(dir), true)
      try out.write(v.toString.getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Newest published version without listing the manifest log —
    * O(1 + publish lag) reads; falls back to one full [[versions]]
    * listing when the hint is missing, unparsable, vacuumed-away, or
    * further than [[MaxTipProbe]] behind. */
  def tip(spark: SparkSession, dir: String): Option[Int] = {
    val f = fs(spark, dir)
    val hp = tipHintPath(dir)
    val hint: Option[Int] =
      try {
        if (!f.exists(hp)) None
        else {
          val in = f.open(hp)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim
          finally in.close()
          s.toIntOption.filter(_ >= 1)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    hint.filter(h => f.exists(manifestPath(dir, h))) match {
      case None => versions(spark, dir).lastOption
      case Some(h) =>
        var v = h
        var steps = 0
        while (steps < MaxTipProbe && f.exists(manifestPath(dir, v + 1))) {
          v += 1; steps += 1
        }
        if (steps >= MaxTipProbe) versions(spark, dir).lastOption
        else Some(v)
    }
  }

  /** Contiguous published range `lo..tip` WITHOUT listing the log: tip
    * from the hint/probe, lo by binary-searching manifest existence.
    * Sound because the retained version set is always one contiguous
    * range — versions are claimed sequentially, a torn manifest blocks
    * all later publishes until repair makes its predecessor the tip
    * again, and [[vacuum]] removes only prefixes (see [[tip]]'s
    * invariant note). O(log tip) existence RPCs where the listing-based
    * [[versions]] pays one RPC per historical commit — the difference
    * between a metadata call and a directory scan on a long-lived
    * streaming-sink lake with 10^5+ commits. */
  def versionRange(spark: SparkSession, dir: String): Option[(Int, Int)] =
    tip(spark, dir).map { t =>
      val f = fs(spark, dir)
      var lo = 1
      var hi = t
      while (lo < hi) {
        val mid = lo + (hi - lo) / 2
        if (f.exists(manifestPath(dir, mid))) hi = mid else lo = mid + 1
      }
      (lo, t)
    }

  /** The version visible at wall-clock `tsMillis`: the newest manifest
    * whose publish time is <= ts (`TIMESTAMP AS OF` resolves here).
    * Publish time is the manifest file's mtime — assigned by the
    * filesystem at the CAS create, so it is the same clock for every
    * writer and survives process restarts; and because the CAS create
    * of v+1 strictly follows v's, mtimes are NONDECREASING in version,
    * so the lookup is an upper-bound binary search over
    * [[versionRange]] — O(log N) stats, not one stat per retained
    * commit. None for a timestamp before the first publish. NOT
    * filtered through retention: a vacuumed version resolves and then
    * fails loudly at read, rather than silently answering with a
    * different (older-surviving) snapshot. */
  def versionAt(spark: SparkSession, dir: String, tsMillis: Long)
      : Option[Int] = {
    val f = fs(spark, dir)
    def mt(v: Int): Long =
      f.getFileStatus(manifestPath(dir, v)).getModificationTime
    versionRange(spark, dir).flatMap { case (lo, hi) =>
      if (mt(lo) > tsMillis) None
      else {
        var a = lo
        var b = hi
        while (a < b) {
          val mid = a + (b - a + 1) / 2
          if (mt(mid) <= tsMillis) a = mid else b = mid - 1
        }
        Some(a)
      }
    }
  }

  /** Commit history, oldest first: (version, publishedAtMillis,
    * dataDirs in the live set). One manifest stat + read per retained
    * version — bounded by retention, driver-side by design (this is
    * the `CALL glake.history(…)` metadata query, not a data path).
    * One FORWARD walk from the oldest retained version: each step
    * applies one manifest's delta to the running live set, so the
    * whole history costs O(retained) small reads — never O(retained x
    * resolution depth), and never a `_manifests` listing. */
  def history(spark: SparkSession, dir: String): Seq[(Int, Long, Int)] = {
    val f = fs(spark, dir)
    versionRange(spark, dir).fold(Seq.empty[(Int, Long, Int)]) {
      case (lo, hi) =>
        var live = readManifest(spark, dir, lo)
        (lo to hi).map { v =>
          if (v > lo) live = manifestStep(spark, dir, live, v)._1
          (v, f.getFileStatus(manifestPath(dir, v)).getModificationTime,
            live.length)
        }
    }
  }

  /** Content terminator appended to every manifest: the CAS create
    * claims the version NAME atomically, but the content write that
    * follows is not atomic with it — a reader opening the file in that
    * window would otherwise resolve a silently-wrong (empty or subset)
    * snapshot. The terminator makes torn content DETECTABLE; readers
    * retry the few-ms fill window and fail loudly on a manifest a
    * crashed writer never finished (a loud error names the file; the
    * pre-terminator behavior was quiet wrongness). */
  private val ManifestEnd = "#end"

  /** Marker line recorded in a manifest published by a LAYOUT-ONLY
    * commit (compaction, Z-order): the live set changed but the ROWS
    * did not — Delta's `dataChange=false`. Incremental consumers
    * ([[changes]], the `graftlake` streaming source) skip such
    * versions instead of refusing the history or re-delivering
    * rewritten rows, so routine `CALL optimize`/`zorder` maintenance
    * coexists with running streams. Marker lines start with `#` so
    * dir-name readers filter them structurally. */
  private val LayoutMarker = "#layout"

  /** Marker heading a DELTA-ENCODED manifest: the file records only
    * `+dir` / `-dir` ops against the previous version instead of the
    * full live set. Readers resolve a delta by walking back to the
    * nearest FULL manifest or `.ckpt` checkpoint sidecar and replaying
    * ops forward; writers bound that walk by publishing a full
    * manifest every [[CheckpointInterval]] versions. Pre-delta lakes
    * (every line a bare dir name) parse as full manifests unchanged. */
  private val DeltaMarker = "#delta"

  /** Marker binding a DELETION-VECTOR commit to its positions sidecar:
    * `#dv\t<uuid>` in the manifest of version N means "the rows at the
    * positions listed in `_deletes/vN-<uuid>` are deleted AS OF N" —
    * the live DIR set is unchanged (the delta carries no ops), the
    * data bytes stay in place, and every read at version ≥ N must
    * apply the vector. The uuid makes the binding unforgeable: a
    * sidecar whose version's manifest does not name its uuid is a
    * crashed attempt's orphan and is never applied. */
  private val DvMarker = "#dv\t"

  /** Full-manifest cadence: every Nth version is written full, so
    * delta resolution replays at most N-1 small files. Overwrite /
    * replace commits and v1 are always full (their live set IS the
    * delta), making them natural bases too. */
  val CheckpointInterval: Int = 16

  /** Manifest content lines (terminator dropped), marker lines
    * included — the raw form [[readManifest]] and [[isLayoutOnly]]
    * filter their views from. */
  private def readManifestLines(spark: SparkSession, dir: String, v: Int)
      : Seq[String] = {
    val p = manifestPath(dir, v)
    var attempt = 0
    while (true) {
      val in = fs(spark, dir).open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      if (lines.lastOption.contains(ManifestEnd))
        return lines.dropRight(1)
      attempt += 1
      if (attempt >= 50)
        throw new IllegalStateException(
          s"manifest $p is torn or still being published " +
            "(no terminator after retries) — its writer crashed " +
            "mid-publish or is stalled; the version is unreadable. " +
            "repairTornManifests (or any vacuum) removes a stale " +
            "torn manifest and un-wedges the lake")
      Thread.sleep(20)
    }
    Nil // unreachable
  }

  /** One manifest file, parsed: `Right(full live set)` or
    * `Left((adds, drops))` for a delta, plus the layout-only flag. */
  private def parseManifest(lines: Seq[String])
      : (Either[(Seq[String], Seq[String]), Seq[String]], Boolean) = {
    val layout = lines.contains(LayoutMarker)
    if (lines.contains(DeltaMarker))
      (Left((lines.collect { case l if l.startsWith("+") => l.drop(1) },
        lines.collect { case l if l.startsWith("-") => l.drop(1) })),
        layout)
    else (Right(lines.filterNot(_.startsWith("#"))), layout)
  }

  private def applyOps(live: Seq[String],
      ops: (Seq[String], Seq[String])): Seq[String] =
    live.filterNot(ops._2.toSet) ++ ops._1

  // ---- checkpoint sidecars ----------------------------------------------

  private def ckptPath(dir: String, v: Int): Path =
    manifestPath(dir, v).suffix(".ckpt")

  /** Checkpoint content for version `v`, if a readable (terminated)
    * sidecar exists. Checkpoints are derived data with the same torn-
    * write discipline as manifests, but a torn/garbled one simply
    * degrades to the walk-back resolution — EXCEPT the one [[vacuum]]
    * writes at the retention boundary, which vacuum verifies readable
    * BEFORE dropping the boundary's delta bases. */
  private def readCheckpoint(f: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Int): Option[Seq[String]] =
    try {
      val p = ckptPath(dir, v)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
        if (lines.lastOption.contains(ManifestEnd))
          Some(lines.dropRight(1).filterNot(_.startsWith("#")))
        else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def writeCheckpointFile(f: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Int, live: Seq[String]): Unit = {
    // same tmp+rename publish discipline as the change sidecars: a
    // checkpoint is derived data (a torn one degrades to the walk-back,
    // readCheckpoint verifies the terminator), but the one vacuum
    // writes at the retention boundary becomes load-bearing the moment
    // history below it drops — fill it invisibly, then swing the name
    val p = ckptPath(dir, v)
    val tmp = p.suffix(s".tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write((live :+ ManifestEnd).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(p, false) // refresh: rename-onto-existing fails on local fs
    if (!f.rename(tmp, p)) {
      f.delete(tmp, false)
      // a racing checkpointer of the same version won — content is
      // identical (both derive from the same immutable manifest chain)
      if (!f.exists(p)) throw new java.io.IOException(
        s"failed to publish checkpoint sidecar $p")
    }
  }

  /** Force a full-snapshot checkpoint sidecar at the current tip and
    * return the checkpointed version — `CALL glake.checkpoint(...)`.
    * Publishes NO new version (the sidecar is derived data); it bounds
    * every later resolution of this and later versions to the sidecar
    * plus the delta tail, and lets the next [[vacuum]] drop history
    * without first writing its own boundary checkpoint. */
  def checkpoint(spark: SparkSession, dir: String): Int = {
    val t = tip(spark, dir).getOrElse(throw new IllegalArgumentException(
      s"no versions published at $dir"))
    writeCheckpointFile(fs(spark, dir), dir, t, readManifest(spark, dir, t))
    t
  }

  /** Live set of version `v`: walk back through delta manifests to the
    * nearest full manifest or checkpoint sidecar, then replay the ops
    * forward. Bounded by [[CheckpointInterval]] small file reads (the
    * write side guarantees a full manifest at least every Nth
    * version). */
  private def resolveLive(spark: SparkSession, dir: String, v: Int)
      : Seq[String] =
    try resolveLiveWalk(spark, dir, v)
    catch {
      // a CONCURRENT VACUUM writes its boundary checkpoint and then
      // deletes the dropped delta bases — a walker that passed the
      // boundary version before its .ckpt landed (or mid-delete) hits
      // the dropped manifests while resolving a RETAINED version. One
      // re-walk from scratch sees the checkpoint (vacuum verifies it
      // readable BEFORE any delete); a genuinely truncated log fails
      // the same way twice and the loud error stands.
      case _: java.io.FileNotFoundException =>
        resolveLiveWalk(spark, dir, v)
      case e: IllegalStateException
          if e.getMessage != null &&
            e.getMessage.contains("no resolvable base") =>
        resolveLiveWalk(spark, dir, v)
    }

  private def resolveLiveWalk(spark: SparkSession, dir: String, v: Int)
      : Seq[String] = {
    val f = fs(spark, dir)
    var pending = List.empty[(Seq[String], Seq[String])]
    var cur = v
    while (true) {
      parseManifest(readManifestLines(spark, dir, cur))._1 match {
        case Right(full) =>
          return pending.foldLeft(full)(applyOps)
        case Left(ops) =>
          readCheckpoint(f, dir, cur) match {
            // ckpt(cur) is the live set AFTER cur — cur's own ops are
            // already included, only the later pending ones replay
            case Some(live) => return pending.foldLeft(live)(applyOps)
            case None =>
              if (cur <= 1) throw new IllegalStateException(
                s"delta manifest v$cur of $dir has no resolvable base " +
                  "(no full manifest or checkpoint below it) — the log " +
                  "was truncated outside the vacuum protocol")
              pending = ops :: pending
              cur -= 1
          }
      }
    }
    Nil // unreachable
  }

  private def readManifest(spark: SparkSession, dir: String, v: Int)
      : Seq[String] = resolveLive(spark, dir, v)

  /** True iff version `v` was published as a layout-only (row-
    * preserving) commit — see [[LayoutMarker]]. */
  def isLayoutOnly(spark: SparkSession, dir: String, v: Int): Boolean =
    readManifestLines(spark, dir, v).contains(LayoutMarker)

  /** (live dir names, layoutOnly) of one version — the random-access
    * resolution. Per-version WALKS ([[changes]], the streaming source)
    * should step with [[manifestStep]] instead: one manifest read per
    * version, no repeated delta-chain replay. */
  private[engine] def manifestInfo(spark: SparkSession, dir: String,
      v: Int): (Seq[String], Boolean) = {
    val lines = readManifestLines(spark, dir, v)
    parseManifest(lines) match {
      case (Right(full), l) => (full, l)
      case (Left(_), l) => (resolveLive(spark, dir, v), l)
    }
  }

  /** The uuid a manifest's [[DvMarker]] binds, if it is a
    * deletion-vector commit. */
  private def dvUuidOf(lines: Seq[String]): Option[String] =
    lines.collectFirst {
      case l if l.startsWith(DvMarker) => l.drop(DvMarker.length)
    }

  /** True iff version `v` is a deletion-vector commit (rows removed by
    * sidecar, live dirs untouched). */
  def isDvCommit(spark: SparkSession, dir: String, v: Int): Boolean =
    dvUuidOf(readManifestLines(spark, dir, v)).nonEmpty

  /** live(v) from live(v-1) with ONE manifest read — the incremental
    * step the per-version walks advance with. Returns (live,
    * layoutOnly, isDeletionVectorCommit). */
  private[engine] def manifestStep(spark: SparkSession, dir: String,
      prevLive: Seq[String], v: Int): (Seq[String], Boolean, Boolean) = {
    val lines = readManifestLines(spark, dir, v)
    val dv = dvUuidOf(lines).nonEmpty
    parseManifest(lines) match {
      case (Right(full), l) => (full, l, dv)
      case (Left(ops), l) => (applyOps(prevLive, ops), l, dv)
    }
  }

  /** Marker line carrying the commit's TABLE SCHEMA (one-line DDL) —
    * written by every writer that knows the FULL table schema (SQL
    * DML/DDL/COW; library appends may be narrower than the merged
    * union and do not embed). The DSv2 plan path then resolves a
    * version's schema from ITS OWN manifest instead of re-reading
    * every live file's parquet footer per cold plan (mergeSchema
    * inference is O(live files) — the dominant plan cost at 10^3+
    * dirs; Delta keeps schema in the log for the same reason). Absent
    * marker → footer inference, exactly as before. */
  private val SchemaMarker = "#schema\t"

  /** The schema a version's publishing writer declared, if any. A
    * missing/vacuumed/torn manifest reads as None — schema resolution
    * is an optimization; the EXISTENCE error stays with the read path,
    * which raises the clear retention message. */
  def manifestSchema(spark: SparkSession, dir: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    try {
      if (!versionExists(spark, dir, v)) None
      else readManifestLines(spark, dir, v)
        .collectFirst { case l if l.startsWith(SchemaMarker) =>
          val payload = l.drop(SchemaMarker.length)
          // JSON is the format (it round-trips field metadata — the
          // column-mapping ids live there); DDL accepted for
          // manifests written by the first schema-declaring build
          scala.util.Try(org.apache.spark.sql.types.DataType
            .fromJson(payload)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
            .orElse(scala.util.Try(org.apache.spark.sql.types.StructType
              .fromDDL(payload))).toOption
        }.flatten
    } catch { case scala.util.control.NonFatal(_) => None }

  private def schemaLine(schemaDdl: Option[String]): Seq[String] =
    schemaDdl.filterNot(_.contains("\n")).map(SchemaMarker + _).toSeq

  private def manifestBytes(live: Seq[String],
      layoutOnly: Boolean = false,
      schemaDdl: Option[String] = None): Array[Byte] =
    (schemaLine(schemaDdl) ++
      (if (layoutOnly) live :+ LayoutMarker else live) :+ ManifestEnd)
      .mkString("\n").getBytes("UTF-8")

  /** Delta-manifest bytes: O(changed dirs), the routine-commit write. */
  private def deltaBytes(adds: Seq[String], drops: Seq[String],
      layoutOnly: Boolean, schemaDdl: Option[String] = None): Array[Byte] =
    ((DeltaMarker +: schemaLine(schemaDdl)) ++
      (drops.map("-" + _) ++ adds.map("+" + _)) ++
      (if (layoutOnly) Seq(LayoutMarker) else Nil) :+ ManifestEnd)
      .mkString("\n").getBytes("UTF-8")

  /** Un-wedge a lake whose publisher crashed between the CAS create
    * and the content write: such a manifest claimed its version NAME
    * but never became readable, and because every publish reads the
    * tip to build the next live set, a torn TIP blocks all future
    * commits too — loudly, but forever. Deleting it is safe: an
    * unreadable manifest can never have been observed by a reader nor
    * built upon by a writer (their readManifest fails the same way),
    * and its data dir simply becomes an unreferenced orphan for
    * [[vacuum]]. Only manifests stale for `staleMs` are touched — a
    * fresh one is a publisher mid-fill (the window is normally
    * milliseconds). Returns the versions repaired. Also invoked by
    * [[vacuum]] with its grace window, so routine maintenance heals
    * crashed publishes without a separate operational step. */
  def repairTornManifests(spark: SparkSession, dir: String,
      staleMs: Long = 600000L): Seq[Int] = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(s"$dir/$ManifestDir"))) return Seq.empty
    val cutoff = System.currentTimeMillis() - staleMs
    val repaired = versions(spark, dir).filter { v =>
      val p = manifestPath(dir, v)
      if (f.getFileStatus(p).getModificationTime > cutoff) false
      else {
        val in = f.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
        val torn = !lines.lastOption.contains(ManifestEnd)
        if (torn) f.delete(p, false)
        torn
      }
    }
    // a repaired (deleted) torn TIP may be what the hint points at;
    // refresh so tip resolution stays O(1) instead of falling back
    if (repaired.nonEmpty)
      versions(spark, dir).lastOption.foreach(writeTipHint(f, dir, _))
    repaired
  }

  /** Stage `df` into `dataDir` honoring the lake's partition spec:
    * flat lakes write one dir; PARTITIONED lakes route through the
    * dynamic-partition writer into hive `c=v` leaves (the frame must
    * carry the partition columns) and publish one entry per leaf —
    * library/SQL parity: a library append reads back partition-pruned
    * exactly like an INSERT. Returns the manifest entries to publish
    * and the FULL frame schema — partition columns included: the
    * files of a partitioned lake hold only data columns, but the
    * manifest DECLARATION must carry the partition columns or
    * readEntries could not reconstruct and cast them. */
  private def stageForCommit(df: DataFrame, dir: String,
      dataDir: String, codec: String)
      : (Seq[String], org.apache.spark.sql.types.StructType) = {
    val spark = df.sparkSession
    val partCols = GraftLakePartitions.of(spark, dir)
    val out = withMappedIds(df, dir)
    if (partCols.isEmpty) {
      out.write.option("compression", codec).parquet(s"$dir/$dataDir")
      (Seq(dataDir), out.schema)
    } else {
      require(partCols.forall(pc =>
        out.columns.exists(_.equalsIgnoreCase(pc.name))),
        "the committed frame lacks the lake's partition columns " +
          s"(${partCols.map(_.name).mkString(", ")})")
      out.write.option("compression", codec)
        .partitionBy(partCols.map(_.name): _*).parquet(s"$dir/$dataDir")
      val staged = GraftLakePartitions.stagedEntries(spark, dir,
        dataDir, partCols.length)
      val entries =
        if (staged.nonEmpty) staged
        else Seq(GraftLakePartitions.seedEmpty(spark, dir, dataDir,
          out.schema, partCols))
      (entries, out.schema)
    }
  }

  /** Commit `df` as the next version. `mode` "append" carries the
    * previous live set forward plus the new data dir; "overwrite"
    * replaces it. On a PARTITIONED lake the frame routes through the
    * dynamic-partition writer and publishes one entry per leaf.
    * Returns the published version number. */
  def commit(df: DataFrame, dir: String, mode: String = "append",
      codec: String = "snappy"): Int = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val (entries, schema) = stageForCommit(df, dir, dataDir, codec)
    publishAll(df.sparkSession, dir, entries, mode,
      carrySchema = Some(schema))
  }

  /** Exactly-once commit for RETRIED writers (foreachBatch replays,
    * task restarts): the data dir name derives from `tag`, so a replay
    * of an already-published tag is detected by manifest membership and
    * no-ops (returns None); a crash AFTER the data write but BEFORE the
    * manifest publish left an unreferenced dir, which the retry
    * REWRITES (delete + write) before publishing — either way exactly
    * one version ever references the tag. The membership scan is over
    * manifest CONTENTS (bounded metadata); [[vacuum]] retention must
    * exceed the writer's replay horizon or a resurrected ancient tag
    * would re-commit (for a streaming checkpoint that horizon is one
    * batch). */
  def commitTagged(df: DataFrame, dir: String, tag: String,
      mode: String = "append", codec: String = "snappy"): Option[Int] = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"unsafe tag $tag")
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val dataDir = s"d-$tag"
    // O(1) replay check: a marker per published tag, written AFTER the
    // manifest publish. Without it every commit would scan the whole
    // manifest history for membership — O(versions) per commit,
    // quadratic over a long-running stream's life. The marker can only
    // UNDER-report (crash between publish and marker write), so a
    // marker miss falls back to the exact membership scan — which in
    // that rare case finds the tag in the newest manifests and still
    // exits early. With delta manifests, "ever published" is decided
    // from RAW lines (`+d-tag` in the publishing delta, bare in a full
    // snapshot) plus the oldest retained version's RESOLVED live set —
    // a dir added before the retained window and still live appears
    // there (dirs are never re-added after a drop: names are minted
    // per publish), so no per-version resolution is needed.
    if (tagPublished(spark, dir, tag)) None
    else {
      f.delete(new Path(s"$dir/$dataDir"), true) // orphan from a crash
      val (entries, schema) = stageForCommit(df, dir, dataDir, codec)
      val v = publishAll(spark, dir, entries, mode,
        carrySchema = Some(schema))
      writeTagMarker(spark, dir, tag)
      Some(v)
    }
  }

  /** True iff `tag` was ever published at `dir` — the O(1) `_tags/`
    * marker check plus the exact manifest-membership fallback (the
    * marker can only UNDER-report; see [[commitTagged]]'s analysis).
    * Membership covers all three publish shapes a tagged commit can
    * take: a full-manifest `d-tag` line, a delta `+d-tag` add, and a
    * `#dv tag` marker (a pure-delete merge-on-read batch adds no data
    * dir — its tag lives only in the vector binding). */
  private[graft] def tagPublished(spark: SparkSession, dir: String,
      tag: String): Boolean = {
    val f = fs(spark, dir)
    val dataDir = s"d-$tag"
    // partitioned entries are `d-tag/c=v` — the tag's identity is the
    // FIRST path segment of an entry, not the whole entry
    def carries(e: String): Boolean =
      e == dataDir || e.startsWith(s"$dataDir/")
    f.exists(new Path(s"$dir/_tags/$tag")) ||
      versionRange(spark, dir).exists { case (lo, hi) =>
        readManifest(spark, dir, lo).exists(carries) ||
          (lo to hi).reverseIterator.exists { v =>
            readManifestLines(spark, dir, v).exists(l =>
              carries(l) || (l.startsWith("+") && carries(l.drop(1))) ||
                l == DvMarker + tag)
          }
      }
  }

  /** The tag's O(1) replay marker, written AFTER the publish. */
  private[graft] def writeTagMarker(spark: SparkSession, dir: String,
      tag: String): Unit = {
    val out = fs(spark, dir).create(new Path(s"$dir/_tags/$tag"), true)
    out.close()
  }

  /** A user commit tag's MANIFEST FACE: the deletion-vector sidecar
    * name contract is `v<version>-<12 hex chars>` (the strictness
    * keeps foreign files in `_deletes/` from ever binding), so a
    * row-level tagged commit cannot put the raw tag in its uuid slot
    * — it would silently never parse, and the vector would never
    * apply (deleted rows resurrect). Instead the tag derives a STABLE
    * 12-hex uuid: deterministic, so a replayed batch computes the
    * same identity and the tag discipline still dedupes it. */
  private[graft] def commitTagUuid(tag: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  /** Tags of a version's data dirs (the `d-` prefix stripped) — how
    * tagged writers recover their own progress from the manifest
    * itself instead of a side state file. */
  def readManifestTags(spark: SparkSession, dir: String, v: Int)
      : Seq[String] =
    readManifest(spark, dir, v).map(_.stripPrefix("d-"))

  /** The commit CAS: create-no-overwrite of the next manifest; a racing
    * writer that published first makes the create throw — recompute
    * against the new tip and retry (the data dir is already durable,
    * only the pointer write repeats). `private[engine]` because the
    * DSv2 write path ([[GraftLakeWrite]]) stages its parquet through
    * Spark's own committer and then lands HERE for the pointer swing —
    * one publish protocol, two front doors. */
  private[engine] def publish(spark: SparkSession, dir: String,
      dataDir: String, mode: String, layoutOnly: Boolean = false): Int =
    publishAll(spark, dir, Seq(dataDir), mode, layoutOnly)

  /** Measurement seam ([[graft.LogScale]]): one real-protocol append
    * publish — production's exact write pattern, without the data
    * write the scale harness fabricates separately. */
  private[graft] def publishForScale(spark: SparkSession, dir: String,
      dataDir: String, schemaDdl: Option[String] = None): Int =
    publishAll(spark, dir, Seq(dataDir), "append", schemaDdl = schemaDdl)

  /** Measurement seams for PARTITIONED-entry commits ([[graft.LogScale]]
    * point: one manifest entry per (commit, partition leaf) — the
    * partitioned streaming sink's write pattern). */
  private[graft] def publishForScaleAll(spark: SparkSession, dir: String,
      entries: Seq[String]): Int =
    publishAll(spark, dir, entries, "append")

  private[graft] def replacePublishForScale(spark: SparkSession,
      dir: String, dropped: Set[String], added: Seq[String]): Int =
    publishReplacing(spark, dir, dropped, added)

  /** Declared-schema union: `prev`'s fields keep their order, types and
    * metadata (the column-mapping field ids live there); `write`-only
    * fields append. The monotone merge that keeps a lake's `#schema`
    * declaration alive across narrower library/stream appends without
    * ever hiding an earlier commit's columns. */
  private def mergeDeclared(prev: org.apache.spark.sql.types.StructType,
      write: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(prev.fields ++
      write.fields.filterNot(w =>
        prev.fields.exists(_.name.equalsIgnoreCase(w.name))))

  /** [[publish]] generalized to several data entries in ONE version —
    * a partitioned commit publishes one entry per partition leaf.
    *
    * `schemaDdl` is for writers that know the FULL table schema (SQL
    * paths — they pass `table.schema()`). Writers that only know their
    * OWN write schema (library commits, the streaming sink) pass it as
    * `carrySchema` instead: the declaration is then derived PER CAS
    * ATTEMPT from the current tip — the tip's declared schema merged
    * with the write schema — so a lost race never publishes a stale
    * declaration that hides a concurrent commit's new column. A lake
    * whose tip never declared stays undeclared (the true footer union
    * is unknowable without the O(live files) pass the declaration
    * exists to avoid). */
  private[engine] def publishAll(spark: SparkSession, dir: String,
      dataDirs: Seq[String], mode: String,
      layoutOnly: Boolean = false,
      schemaDdl: Option[String] = None,
      carrySchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Int = {
    require(dataDirs.nonEmpty, "publishAll needs at least one entry")
    val f = fs(spark, dir)
    var committed = -1
    var minted = false
    while (committed < 0) {
      val prevTip = tip(spark, dir)
      val next = prevTip.getOrElse(0) + 1
      val prevLive =
        prevTip.fold(Seq.empty[String])(readManifest(spark, dir, _))
      val declared = schemaDdl.orElse(carrySchema.flatMap { ws =>
        if (mode == "overwrite" || prevTip.isEmpty) Some(ws.json)
        else manifestSchema(spark, dir, prevTip.get)
          .map(prev => mergeDeclared(prev, ws).json)
      })
      // a CAS-retry (or a racing same-tag replay) may find its entries
      // already published at the new tip — appending them AGAIN would
      // double-count the rows; the existing version is the commit
      val fresh = dataDirs.filterNot(prevLive.contains)
      if (mode == "append" && fresh.isEmpty) {
        committed = prevTip.get
      } else {
        val full = mode == "overwrite" || prevTip.isEmpty
        val live = if (full) dataDirs else prevLive ++ fresh
        // routine appends delta-encode (+entry per added dir, O(delta)
        // bytes); full snapshots at the cadence — and for overwrites,
        // whose live set IS the delta — bound every reader's replay walk
        val bytes =
          if (full || next % CheckpointInterval == 0)
            manifestBytes(live, layoutOnly, declared)
          else deltaBytes(fresh, Seq.empty, layoutOnly, declared)
        try {
          val out = f.create(manifestPath(dir, next), false)
          try out.write(bytes)
          finally out.close()
          committed = next
          minted = true
        } catch {
          case e: java.io.IOException =>
            // retry ONLY a lost race (the loser's manifest now
            // exists); a real IO failure must not spin
            if (!f.exists(manifestPath(dir, next))) throw e
        }
      }
    }
    if (minted) writeTipHint(f, dir, committed)
    committed
  }

  // ---- strict staged-DDL publishes -------------------------------------
  //
  // [[publish]]'s CAS-RETRY loop is the right protocol for data commits
  // (a lost race re-reads the tip and appends on top), but it is WRONG
  // for staged DDL: a CTAS that loses the version-1 race must NOT retry
  // as an append at version 2 — that silently unions two racing
  // writers' tables, violating CREATE's exactly-one-winner contract.
  // These variants attempt exactly ONE expected version and surface a
  // lost race to the caller instead of absorbing it.

  /** Single-attempt publish of a brand-new table's version 1 (staged
    * CREATE / CTAS). Returns false — leaving the staged data dir as an
    * unreferenced orphan for [[vacuum]] — when a racing writer
    * published ANY version first (the caller maps that to
    * `TableAlreadyExistsException`); only a genuinely unclaimed
    * version 1 is created. */
  private[engine] def publishCreateStrict(spark: SparkSession,
      dir: String, dataDir: String): Boolean =
    publishCreateStrictAll(spark, dir, Seq(dataDir))

  private[engine] def publishCreateStrictAll(spark: SparkSession,
      dir: String, dataDirs: Seq[String],
      schemaDdl: Option[String] = None): Boolean = {
    val f = fs(spark, dir)
    if (tip(spark, dir).nonEmpty) return false
    try {
      val out = f.create(manifestPath(dir, 1), false)
      try out.write(manifestBytes(dataDirs, schemaDdl = schemaDdl))
      finally out.close()
      writeTipHint(f, dir, 1)
      true
    } catch {
      case e: java.io.IOException =>
        // a lost race makes the create throw AND the manifest exist;
        // a real IO failure must propagate, not read as "already there"
        if (f.exists(manifestPath(dir, 1))) false else throw e
    }
  }

  /** [[publishCreateStrict]] with the data write included — the plain
    * `CREATE TABLE` shape (one empty schema-bearing data dir). */
  private[engine] def commitCreateStrict(df: DataFrame,
      dir: String): Boolean = {
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    df.write.parquet(s"$dir/$dataDir")
    publishCreateStrictAll(df.sparkSession, dir, Seq(dataDir),
      Some(df.schema.json))
  }

  /** Single-attempt overwrite publish at exactly `observedTip + 1` —
    * the staged REPLACE TABLE AS SELECT commit. Any tip movement since
    * the replace was staged (a concurrent commit whose data this
    * replace would silently discard, or whose CAS slot it would lose)
    * is refused loudly — the same serializable posture as
    * [[publishReplacingChecked]], for the same reason: the staged data
    * was computed against the observed snapshot and cannot absorb a
    * concurrent commit by retrying. */
  private[engine] def publishReplaceStrict(spark: SparkSession,
      dir: String, dataDir: String, observedTip: Int): Int =
    publishReplaceStrictAll(spark, dir, Seq(dataDir), observedTip)

  private[engine] def publishReplaceStrictAll(spark: SparkSession,
      dir: String, dataDirs: Seq[String], observedTip: Int,
      schemaDdl: Option[String] = None): Int = {
    val f = fs(spark, dir)
    def conflict(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"REPLACE TABLE conflict on $dir: the tip moved past " +
          s"v$observedTip after this replace was staged — publishing " +
          "would silently discard the concurrent commit; re-run the " +
          "replace against the new snapshot")
    if (tip(spark, dir).getOrElse(0) != observedTip)
      conflict()
    try {
      val out = f.create(manifestPath(dir, observedTip + 1), false)
      try out.write(manifestBytes(dataDirs, schemaDdl = schemaDdl))
      finally out.close()
      writeTipHint(f, dir, observedTip + 1)
      observedTip + 1
    } catch {
      case e: java.io.IOException =>
        if (f.exists(manifestPath(dir, observedTip + 1))) conflict()
        else throw e
    }
  }

  /** Snapshot read of one published version — fails loudly, with the
    * still-readable version range, on a version that never existed or
    * was expired by [[vacuum]] (a raw FileNotFoundException would leave
    * the reader guessing whether the lake is corrupt or merely
    * retention-trimmed). `mergeSchema` because commits may add columns
    * over time (schema evolution): a snapshot whose live set spans the
    * addition reads the union schema, nulls where old files lack the
    * column. Footer-merge cost is per data dir in the snapshot, not per
    * row — metadata-bounded like everything else here. */
  def readAt(spark: SparkSession, dir: String, v: Int): DataFrame = {
    requireVersion(spark, dir, v)
    // a PARTITIONED lake's entries are partition leaf dirs whose files
    // do not carry the partition columns — read through the DSv2 index,
    // which reconstructs them from the manifest entry names in ONE
    // scan. A COLUMN-MAPPING lake routes the same way: its files must
    // bind by field id (a name-matched plain read would silently null
    // a renamed column out of pre-rename files).
    if (GraftLakePartitions.of(spark, dir).nonEmpty ||
        GraftLakeMapping.enabled(spark, dir) || dvEnabled(spark, dir))
      return spark.read.format("graftlake")
        .option(GraftLakeDataSource.VersionAsOf, v).load(dir)
    val dirs = readManifest(spark, dir, v)
    // A DECLARED schema (the manifest's own union of every commit's
    // columns, as of v — time travel keeps the era's declaration) makes
    // the footer-merge pass redundant: mergeSchema reads EVERY file's
    // footer in a distributed job per read, O(live files) at scale and
    // one extra Spark job per snapshot read at any scale. Undeclared
    // lakes (never committed with a schema) keep the footer merge —
    // the union is unknowable without it.
    manifestSchema(spark, dir, v) match {
      case Some(declared) =>
        spark.read.schema(declared).parquet(dirs.map(d => s"$dir/$d"): _*)
      case None =>
        spark.read.option("mergeSchema", "true")
          .parquet(dirs.map(d => s"$dir/$d"): _*)
    }
  }

  /** Read an arbitrary ENTRY set of version-agnostic lake dirs —
    * partition-aware: on a partitioned lake the partition columns are
    * reconstructed from the entry names ([[GraftLakePartitions
    * .readEntries]]); on an unpartitioned one this is the plain
    * mergeSchema multi-dir read. The incremental walks' primitive. */
  /** Read a set of manifest entries. `dvAt` applies deletion vectors
    * at/below that version — threaded INTO the per-data-dir scans on a
    * partitioned lake because `_metadata` (the DV join key) resolves
    * only on a direct file relation, never through the union
    * [[GraftLakePartitions.readEntries]] builds. */
  private def readEntrySet(spark: SparkSession, dir: String,
      entries: Seq[String], dvAt: Option[Int] = None): DataFrame = {
    val partCols = GraftLakePartitions.of(spark, dir)
    if (!GraftLakeMapping.enabled(spark, dir)) {
      if (partCols.nonEmpty)
        GraftLakePartitions.readEntries(spark, dir, entries, partCols,
          dropDvAt = dvAt)
      else {
        // NO declared-schema fast path here (unlike [[readAt]]): an
        // entry-set read's schema is scoped to THESE entries — the tip
        // declaration may carry columns added after they were written,
        // which would leak null columns into change feeds.
        val base = spark.read.option("mergeSchema", "true")
          .parquet(entries.map(d => s"$dir/$d"): _*)
        dvAt.fold(base)(v => dropDvRows(spark, dir, base, v))
      }
    } else {
      // COLUMN-MAPPING: id-matched read through the declared TIP
      // schema on a derived session — a name-matched read would null
      // renamed columns out of pre-rename files, corrupting change
      // feeds and CDF sidecars computed from these frames. Historical
      // rows surface under the CURRENT names (ids are stable across
      // renames — Delta's CDF-with-latest-schema shape).
      import org.apache.spark.sql.functions.col
      val declared = tip(spark, dir)
        .flatMap(manifestSchema(spark, dir, _))
        .getOrElse(throw new IllegalStateException(
          s"column-mapping lake $dir has no declared schema at its " +
            "tip — cannot id-match the entry-set read"))
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      if (partCols.isEmpty) {
        val base = s2.read.schema(declared)
          .parquet(entries.map(d => s"$dir/$d"): _*)
        dvAt.fold(base)(v => dropDvRows(s2, dir, base, v))
      } else {
        // per data dir with basePath so the `c=v` partition values
        // fill the declared partition columns
        entries.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
          .map { case (dd, es) =>
            val df0 = s2.read.schema(declared)
              .option("basePath", s"$dir/$dd")
              .parquet(es.map(e => s"$dir/$e"): _*)
            dvAt.fold(df0)(v => dropDvRows(s2, dir, df0, v))
          }.reduce(_.unionByName(_, allowMissingColumns = true))
      }
    }
  }

  /** One existence probe — the streaming source's offset-planning
    * retention check (is this version's manifest still readable?). */
  private[engine] def versionExists(spark: SparkSession, dir: String,
      v: Int): Boolean =
    fs(spark, dir).exists(manifestPath(dir, v))

  private def requireVersion(spark: SparkSession, dir: String,
      v: Int): Unit =
    if (!fs(spark, dir).exists(manifestPath(dir, v))) {
      val vs = versions(spark, dir)
      throw new IllegalArgumentException(
        s"version $v of $dir does not exist or was vacuumed; " +
          (if (vs.isEmpty) "no versions are published"
           else s"readable versions: ${vs.head}..${vs.last}"))
    }

  // ---- DSv2 read-path seam ([[GraftLakeDataSource]]) -------------------

  /** Live data-dir paths of one published version, with [[readAt]]'s
    * clear retention error — the snapshot resolution the `graftlake`
    * format's FileIndex is built from. */
  private[engine] def liveDataDirs(spark: SparkSession, dir: String,
      v: Int): Seq[String] = {
    requireVersion(spark, dir, v)
    readManifest(spark, dir, v).map(d => s"$dir/$d")
  }

  /** Sidecar lookups for the DSv2 file-pruning path — same parsers the
    * library probes use, so the two read paths cannot drift. */
  private[engine] def fileStats(spark: SparkSession, dir: String,
      dataDir: String, c: String): Map[String, (Double, Double, Long)] =
    statsFor(spark, dir, dataDir, c)

  private[engine] def fileBloom(spark: SparkSession, dir: String,
      dataDir: String, c: String): Map[String, java.util.BitSet] =
    bloomFor(spark, dir, dataDir, c)

  private[engine] def bloomWantPositions(value: String): Seq[Int] =
    (0 until BloomHashes).map(bloomPosLocal(value, _, BloomBits))

  /** Distinct sidecar-indexed columns across `dataDirs` (stats or
    * bloom), first-seen order — driver-side, one small sidecar read
    * per dir, bounded by the snapshot's dir count. Used to pick the
    * ONE attribute the COW scan advertises for runtime group filtering
    * (a multi-attribute set makes Spark build a struct-IN the V2
    * predicate translation rejects — single-column or nothing). */
  private[engine] def indexedCols(spark: SparkSession, dir: String,
      dataDirs: Seq[String]): Seq[String] = {
    val f = fs(spark, dir)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    dataDirs.foreach { d =>
      Seq(s"$dir/_stats/$d.stats", s"$dir/_bloom/$d.bloom").foreach { sp =>
        val p = new Path(sp)
        if (f.exists(p)) {
          val in = f.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .map(_.split('\t')).filter(_.length >= 2)
            .foreach(a => seen += a(1))
          finally in.close()
        }
      }
    }
    seen.toSeq
  }

  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val t = tip(spark, dir)
    require(t.nonEmpty, s"no versions published at $dir")
    readAt(spark, dir, t.get)
  }

  /** Rewrite the current live set as ONE data directory and publish it
    * as a new version (small-file compaction as a commit, not a swap:
    * older versions keep reading their own manifests, so there is no
    * rename window and nothing to recover — compare
    * [[Lake.recoverCrashedSwap]], which versioning makes unnecessary). */
  def compactVersions(spark: SparkSession, dir: String,
      codec: String = "snappy", statsCols: Seq[String] = Seq.empty,
      bloomCol: Option[String] = None): Int =
    // pass statsCols / bloomCol on an indexed lake or the compacted dir
    // has no sidecars and the metadata-only paths (readSkipping /
    // statsAggregate / readBloomProbe) silently degrade to scans after
    // every compaction — conservative, never wrong, but the fast path
    // is the point of the index. Both sidecar kinds may (and on a lake
    // carrying both SHOULD) be requested together — one data write,
    // two sidecars. layoutOnly: the rewrite preserves every row, so
    // streams and changes() skip this version instead of refusing it.
    compactFullSnapshot(spark, dir, statsCols, bloomCol, codec)(identity)

  /** Incremental small-file compaction (the OPTIMIZE maintenance op):
    * coalesce only the data dirs whose total bytes fall below
    * `thresholdBytes` into ONE new dir, carrying every large dir by
    * manifest reference — cost proportional to the small TAIL, not
    * the lake, which is the only compaction a 100 TB table can afford
    * to run routinely ([[compactVersions]] rewrites everything and is
    * the occasional full-defrag). Returns the new version, or None
    * when fewer than two dirs qualify (a no-op publishes nothing, so
    * repeated maintenance calls converge instead of churning
    * versions). The publish is conflict-checked: a concurrent rewrite
    * of a small dir fails loudly rather than resurrecting its rows. */
  def compactSmall(spark: SparkSession, dir: String,
      thresholdBytes: Long, statsCols: Seq[String] = Seq.empty,
      bloomCol: Option[String] = None, codec: String = "snappy")
      : Option[Int] = {
    val f = fs(spark, dir)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    val live = readManifest(spark, dir, vs.last)
    def bytesOf(d: String): Long =
      f.listStatus(new Path(s"$dir/$d")).toSeq
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val small = live.filter(d => bytesOf(d) < thresholdBytes)
    // COLUMN-MAPPING lakes: the coalescing rewrite must stamp the
    // field ids or the id-matching reader cannot bind the compacted
    // files. Reading with the DECLARED schema (metadata included)
    // makes the parquet writer stamp them — no extra pass; files of
    // older eras clip/null against it exactly like a mergeSchema read.
    val lakePartCols = GraftLakePartitions.of(spark, dir)
    val declared: Option[org.apache.spark.sql.types.StructType] =
      if (GraftLakeMapping.enabled(spark, dir))
        Some(manifestSchema(spark, dir, vs.last).map(s =>
          // data files never carry partition columns — clip them
          org.apache.spark.sql.types.StructType(s.filterNot(fl =>
            lakePartCols.exists(_.name.equalsIgnoreCase(fl.name)))))
          .getOrElse(throw new IllegalStateException(
            s"column-mapping lake $dir has no declared schema at its " +
              "tip — cannot stamp field ids into the compacted files")))
      else None
    // the path-based read CLOBBERS per-read fieldId options from the
    // session conf (ParquetFileFormat re-sets them from SQLConf), so
    // id-matching for the mapped rewrite needs a SESSION whose conf
    // says so — a DERIVED one, never the caller's: mutate-and-restore
    // on the shared session would silently flip concurrent queries to
    // id-matched reads for the rewrite's whole duration. newSession()
    // shares the SparkContext (and so the executors and the warehouse)
    // but owns its conf; the flag lives and dies with the rewrite.
    val rss: SparkSession =
      if (declared.isEmpty) spark
      else {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        s2
      }
    def readSmall(entries: Seq[String]): DataFrame = {
      val paths = entries.map(e => s"$dir/$e")
      val base = declared.fold(
        rss.read.option("mergeSchema", "true").parquet(paths: _*))(
        sch => rss.read.schema(sch).parquet(paths: _*))
      // deletion vectors MATERIALIZE here: the coalesced replacement
      // carries only visible rows, and the replaced files' vectors
      // become dead metadata for vacuum
      dropDvRows(rss, dir, base, vs.last)
    }
    {
    val partitioned = lakePartCols.nonEmpty
    if (partitioned) {
      // OPTIMIZE WITHIN PARTITIONS: small entries group by their
      // partition suffix; each group coalesces into one leaf under a
      // single fresh data dir (`d-new/<suffix>`) — rows never cross a
      // partition boundary, so the entries-are-partition-leaves
      // invariant and every partition-pruning path survive compaction
      val groups = small.groupBy(_.split('/').drop(1).mkString("/"))
        .filter(_._2.length >= 2)
      if (groups.isEmpty) return None
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      val newEntries = groups.toSeq.sortBy(_._1).map { case (suffix, es) =>
        val outFiles = math.max(1L,
          es.map(bytesOf).sum / (128L << 20)).toInt
        readSmall(es)
          .coalesce(outFiles).write.option("compression", codec)
          .parquet(s"$dir/$dataDir/$suffix")
        s"$dataDir/$suffix"
      }
      // sidecars for ALL compacted leaves in one batched build, not
      // one driver iteration per partition
      writeSidecarsBatch(spark, dir, newEntries, statsCols,
        bloomCol.toSeq)
      return Some(publishReplacing(spark, dir,
        groups.values.flatten.toSet, newEntries,
        checked = true, layoutOnly = true, noDvSince = Some(vs.last)))
    }
    if (small.length < 2) None
    else {
      val merged = readSmall(small)
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      // one output file per ~128 MB of input: the tail usually fits
      // one file, but a large tail must not funnel through one task
      val outFiles = math.max(1L,
        small.map(bytesOf).sum / (128L << 20)).toInt
      merged.coalesce(outFiles).write.option("compression", codec)
        .parquet(s"$dir/$dataDir")
      if (statsCols.nonEmpty) writeStatsFor(spark, dir, dataDir, statsCols)
      bloomCol.foreach(c => writeBloomFor(spark, dir, dataDir, c))
      Some(publishReplacing(spark, dir, small.toSet, Seq(dataDir),
        checked = true, layoutOnly = true, noDvSince = Some(vs.last)))
    }
    }
  }

  /** Z-ordered compaction as a versioned commit: rewrite the latest
    * snapshot range-partitioned and sorted by the Morton interleave of
    * two dimension columns ([[Lake.zValue]] — callers map their
    * domains into [0, 2^bits) first), recording min/max stats for BOTH
    * dims in the same commit. Each output file then covers a small
    * RECTANGLE in (a, b) space, so a range probe on EITHER dimension —
    * through [[readSkipping]] or a pushed filter on the `graftlake`
    * read path — skips most files; a 1-D sort gives this for one
    * column and leaves the other's per-file ranges as wide as the
    * data. The layout lever for the second and third most-filtered
    * columns once directory partitioning is spent on the first —
    * at 100 TB the difference between reading a rectangle and reading
    * a stripe. Data is unchanged (a layout commit, like
    * [[compactVersions]]); older versions keep reading their own
    * manifests. */
  def compactZOrder(spark: SparkSession, dir: String, aCol: String,
      bCol: String, nFiles: Int, bits: Int = 16,
      bloomCol: Option[String] = None, codec: String = "snappy"): Int = {
    import org.apache.spark.sql.functions.col
    val partCols = GraftLakePartitions.of(spark, dir)
    if (partCols.nonEmpty)
      return compactZOrderPartitioned(spark, dir, aCol, bCol, nFiles,
        bits, bloomCol, codec, partCols)
    // codec threads through like every other commit entry point — the
    // z-order rewrite is the LARGEST rewrite a lake ever does, the
    // worst place to silently swap the caller's compression policy.
    // layoutOnly: sortWithinPartitions over a range repartition is a
    // row-preserving permutation — streaming consumers skip it.
    compactFullSnapshot(spark, dir, Seq(aCol, bCol), bloomCol, codec)(
      snap => snap
        .withColumn("_z", Lake.zValue(col(aCol), col(bCol), bits))
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z"))
  }

  /** Z-order WITHIN each partition of a partitioned lake: every
    * partition's live entries rewrite into one fresh leaf under a
    * single data dir, rows clustered by the Morton interleave of the
    * two DATA dimensions — each output file then covers a small
    * (a, b) rectangle INSIDE its partition, so after directory
    * partitioning is spent on the first filter column, range probes on
    * the second and third still skip files (the Delta OPTIMIZE ZORDER
    * BY shape). Rows never cross a partition boundary — the entries-
    * are-partition-leaves invariant every pruning path depends on
    * holds by construction; a CROSS-partition interleave is
    * structurally impossible (partition values are directory names)
    * and is exactly what this deliberately does not attempt. `nFiles`
    * is PER PARTITION. Layout-only, conflict-checked, one atomic
    * commit for the whole lake. */
  private def compactZOrderPartitioned(spark: SparkSession, dir: String,
      aCol: String, bCol: String, nFiles: Int, bits: Int,
      bloomCol: Option[String], codec: String,
      partCols: Seq[org.apache.spark.sql.types.StructField]): Int = {
    import org.apache.spark.sql.functions.col
    Seq(aCol, bCol).foreach(c =>
      require(!partCols.exists(_.name.equalsIgnoreCase(c)),
        s"z-order dimension $c is a PARTITION column — constant within " +
          "every leaf, nothing to cluster; pick data columns"))
    val t = tip(spark, dir)
    require(t.nonEmpty, s"no versions published at $dir")
    val observed = readManifest(spark, dir, t.get)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    // ONE job for the whole lake, not one per partition (a 1,000-day
    // lake must not run 1,000 sequential rewrites): range-partition by
    // (partition cols, z) so each task holds contiguous (partition, z)
    // blocks, and let the dynamic-partition writer lay the hive leaves
    // out — `nFiles` stays PER PARTITION, so the range width is
    // nFiles × live partitions. The DSv2 read reconstructs partition
    // values from the manifest entry names.
    val nParts = math.max(1,
      observed.map(_.split('/').drop(1).mkString("/")).distinct.length)
    val keys = partCols.map(c => col(c.name)) :+ col("_z")
    // readAt applies deletion vectors and id-matches mapped lakes;
    // withMappedIds re-stamps the field ids into the rewrite
    withMappedIds(readAt(spark, dir, t.get)
        .withColumn("_z", Lake.zValue(col(aCol), col(bCol), bits))
        .repartitionByRange(math.max(1, nFiles) * nParts, keys: _*)
        .sortWithinPartitions(keys: _*)
        .drop("_z"), dir)
      .write.option("compression", codec)
      .partitionBy(partCols.map(_.name): _*)
      .parquet(s"$dir/$dataDir")
    var newEntries = GraftLakePartitions.stagedEntries(spark, dir,
      dataDir, partCols.length)
    if (newEntries.isEmpty) // empty lake: keep a schema carrier live
      newEntries = Seq(GraftLakePartitions.seedEmpty(spark, dir, dataDir,
        manifestSchema(spark, dir, t.get).getOrElse(
          readAt(spark, dir, t.get).schema), partCols))
    // ONE batched sidecar build for every leaf — the sidecar phase
    // must not reintroduce the O(partitions)-sequential-jobs term the
    // single-job rewrite removed
    writeSidecarsBatch(spark, dir, newEntries, Seq(aCol, bCol),
      bloomCol.toSeq)
    publishReplacing(spark, dir, observed.toSet, newEntries,
      checked = true, layoutOnly = true, noDvSince = Some(t.get))
  }

  /** The full-snapshot rewrite shared by [[compactVersions]] and
    * [[compactZOrder]]: observe the tip's live set, rewrite its rows
    * (optionally re-clustered), and publish the replacement
    * CONFLICT-CHECKED — the new manifest drops exactly the OBSERVED
    * dirs, so a concurrent append that lands during the (potentially
    * long) rewrite is carried forward by the CAS retry instead of
    * being silently discarded by a blind overwrite; a concurrent
    * rewrite of an observed dir refuses loudly. The layout marker is
    * therefore always TRUE of the published commit: rows(new) ==
    * rows(observed), and any concurrent append's rows survive beside
    * it. */
  // (The round-16 refusal helpers requireUnpartitionedLake /
  // requireNotMappedLake are gone: library commits stage through the
  // lake's partition spec ([[stageForCommit]]), and every survivor
  // rewrite reads through [[survivorReader]] — id-matched on mapped
  // lakes, DV-filtered on deletion-vector lakes.)

  /** Field-id stamping for library commits on a COLUMN-MAPPING lake:
    * the id-matching reader only binds files whose footers carry the
    * ids, so the write schema inherits them from the lake's declared
    * schema (mapped lakes always declare — CREATE writes v1's). A
    * column the mapping has never seen gets a FRESH id, recorded in
    * the registry before the data lands — the same protocol as SQL
    * `ADD COLUMN`. Unmapped lakes pass through untouched. */
  private def withMappedIds(df: DataFrame, dir: String): DataFrame = {
    val spark = df.sparkSession
    if (!GraftLakeMapping.enabled(spark, dir)) df
    else {
      import org.apache.spark.sql.functions.col
      val declared = tip(spark, dir)
        .flatMap(manifestSchema(spark, dir, _))
        .getOrElse(throw new IllegalStateException(
          s"column-mapping lake $dir has no declared schema at its " +
            "tip — cannot stamp parquet field ids into a library commit"))
      val overlaid = GraftLakeMapping.withFieldIds(df.schema, declared)
      val stamped = GraftLakeMapping.assignIds(overlaid,
        GraftLakeMapping.nextId(spark, dir))
      if (stamped.fields.exists(f => GraftLakeMapping.fieldId(
          overlaid(f.name)).isEmpty))
        GraftLakeMapping.record(spark, dir, stamped)
      df.select(stamped.fields.map(f =>
        col(s"`${f.name}`").as(f.name, f.metadata)).toSeq: _*)
    }
  }

  private def compactFullSnapshot(spark: SparkSession, dir: String,
      statsCols: Seq[String], bloomCol: Option[String], codec: String)(
      cluster: DataFrame => DataFrame): Int = {
    val partCols = GraftLakePartitions.of(spark, dir)
    if (partCols.nonEmpty)
      return compactFullSnapshotPartitioned(spark, dir, statsCols,
        bloomCol, codec, partCols)(cluster)
    val t = tip(spark, dir)
    require(t.nonEmpty, s"no versions published at $dir")
    val observed = readManifest(spark, dir, t.get)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    // readAt routes through the DSv2 seam: deletion vectors apply
    // (the rewrite materializes them) and column-mapping lakes read
    // by field id; withMappedIds re-stamps the ids into the rewrite
    val w = withMappedIds(cluster(readAt(spark, dir, t.get)), dir)
      .write.option("compression", codec)
    bloomCol.fold(w)(c =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
      .parquet(s"$dir/$dataDir")
    if (statsCols.nonEmpty) writeStatsFor(spark, dir, dataDir, statsCols)
    bloomCol.foreach(c => writeBloomFor(spark, dir, dataDir, c))
    publishReplacing(spark, dir, observed.toSet, Seq(dataDir),
      checked = true, layoutOnly = true, noDvSince = Some(t.get))
  }

  /** Full-snapshot rewrite of a PARTITIONED lake: every partition's
    * live rows rewrite into one fresh leaf set under a single data
    * dir, as ONE dynamic-partition job (never one job per partition);
    * entries stay partition leaves, sidecars build batched. */
  private def compactFullSnapshotPartitioned(spark: SparkSession,
      dir: String, statsCols: Seq[String], bloomCol: Option[String],
      codec: String,
      partCols: Seq[org.apache.spark.sql.types.StructField])(
      cluster: DataFrame => DataFrame): Int = {
    import org.apache.spark.sql.functions.col
    val t = tip(spark, dir)
    require(t.nonEmpty, s"no versions published at $dir")
    val observed = readManifest(spark, dir, t.get)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val keys = partCols.map(c => col(c.name))
    val nParts = math.max(1,
      observed.map(_.split('/').drop(1).mkString("/")).distinct.length)
    val w = withMappedIds(cluster(readAt(spark, dir, t.get))
        .repartitionByRange(nParts, keys: _*), dir)
      .write.option("compression", codec)
      .partitionBy(partCols.map(_.name): _*)
    bloomCol.fold(w)(c =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
      .parquet(s"$dir/$dataDir")
    var newEntries = GraftLakePartitions.stagedEntries(spark, dir,
      dataDir, partCols.length)
    if (newEntries.isEmpty) // empty lake: keep a schema carrier live
      newEntries = Seq(GraftLakePartitions.seedEmpty(spark, dir, dataDir,
        manifestSchema(spark, dir, t.get).getOrElse(
          readAt(spark, dir, t.get).schema), partCols))
    writeSidecarsBatch(spark, dir, newEntries, statsCols,
      bloomCol.toSeq)
    publishReplacing(spark, dir, observed.toSet, newEntries,
      checked = true, layoutOnly = true, noDvSince = Some(t.get))
  }

  // ---- row-level change-data-feed sidecars ------------------------------
  //
  // Dir-granular CDF is correct but ships a rewrite's WHOLE pre-image
  // as deletes and its replacement as inserts — a MERGE touching 1% of
  // a dir's rows delivers 100% of them twice (survivor delete+insert
  // pairs consumers must net out). With the OPT-IN cdf policy (Delta's
  // `enableChangeDataFeed`), every data-changing commit additionally
  // persists its EXACT row-level changes as `_changes/v<version>/`
  // parquet — table columns plus `_change_type` ∈ {insert, delete,
  // update_preimage, update_postimage} — and changes()/readChangeFeed
  // serve from the sidecar when present, falling back to the dir diff
  // otherwise (crash between publish and sidecar write is benign).
  // Cost at DML time is one netted diff over the CHANGED dirs only —
  // O(changed rows) extra write, the same trade Delta makes.

  private val CdfMarker = "_cdf"

  /** Opt this lake into row-level change capture: subsequent COW DML,
    * deleteRange and replaceWhere commits persist their exact changed
    * rows. Declared via `TBLPROPERTIES ('cdf' = 'true')` at CREATE or
    * this call. */
  def setChangeDataFeed(spark: SparkSession, dir: String): Unit = {
    val out = fs(spark, dir).create(new Path(s"$dir/$CdfMarker"), true)
    try out.write("true".getBytes("UTF-8"))
    finally out.close()
  }

  def cdfEnabled(spark: SparkSession, dir: String): Boolean =
    try fs(spark, dir).exists(new Path(s"$dir/$CdfMarker"))
    catch { case scala.util.control.NonFatal(_) => false }

  private def changeSidecarDir(dir: String, v: Int): Path =
    new Path(s"$dir/_changes/v$v")

  /** The readable row-level change sidecar of version `v`, if one was
    * fully published (atomic rename + the writer's _SUCCESS marker —
    * a torn sidecar is treated as absent, never as a partial feed). */
  private[graft] def changeSidecarPath(spark: SparkSession, dir: String,
      v: Int): Option[Path] = {
    val f = fs(spark, dir)
    val p = changeSidecarDir(dir, v)
    try {
      if (f.exists(p) && f.exists(new Path(p, "_SUCCESS"))) Some(p)
      else
        // a DELETION-VECTOR commit's change rows were staged BEFORE
        // its publish under the uuid the manifest binds — atomic with
        // the commit, unlike the best-effort post-publish v<N> sidecar
        dvUuidOf(readManifestLines(spark, dir, v)).map(u =>
          new Path(s"$dir/_changes/dv-$u"))
          .filter(q => f.exists(q) && f.exists(new Path(q, "_SUCCESS")))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Persist `changes` (table columns + `_change_type`) as version
    * `v`'s row-level feed: staged under a temp name, renamed into
    * place ATOMICALLY after the parquet job's own _SUCCESS lands — a
    * reader can only ever observe a complete sidecar or none. */
  private[engine] def writeChangeSidecar(spark: SparkSession, dir: String,
      v: Int, changes: DataFrame): Unit = {
    require(changes.columns.contains("_change_type"),
      "a change sidecar needs the _change_type column")
    val f = fs(spark, dir)
    // COLUMN-MAPPING lakes: sidecar files must carry the declared
    // field ids or the id-matching CDF read refuses them outright
    // ("read schema expects field ids"). Overlay ONLY — table columns
    // get their registered ids; `_change_type` (not a table column)
    // stays id-less and binds by name, which the partial-id parquet
    // read supports.
    val out =
      if (!GraftLakeMapping.enabled(spark, dir)) changes
      else {
        import org.apache.spark.sql.functions.col
        val declared = tip(spark, dir)
          .flatMap(manifestSchema(spark, dir, _))
          .getOrElse(changes.schema)
        val overlaid =
          GraftLakeMapping.withFieldIds(changes.schema, declared)
        changes.select(overlaid.fields.map(fl =>
          col(s"`${fl.name}`").as(fl.name, fl.metadata)).toSeq: _*)
      }
    val tmp = new Path(
      s"$dir/_changes/.tmp-${java.util.UUID.randomUUID.toString.take(12)}")
    out.write.parquet(tmp.toString)
    if (!f.rename(tmp, changeSidecarDir(dir, v))) {
      // a racing writer of the same version (replayed commit) won the
      // rename — drop the duplicate staging, theirs is identical
      f.delete(tmp, true)
    }
    ()
  }

  /** The netted row-level changes of a dir-replacing commit, tagged
    * for the sidecar: survivors carried inside the rewrite cancel in
    * the multiset diff, the remainder tags by the COMMAND — an UPDATE
    * only updates (deleted side = exact pre-images, added side = exact
    * post-images); every other command reports insert/delete. A NO-OP
    * update (new image == old image) cancels too: a row whose bytes
    * did not change is not a change, matching [[changes]]'s multiset
    * semantics. */
  private[engine] def cowChangeRows(spark: SparkSession, dir: String,
      dropped: Seq[String], added: Seq[String], command: String)
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    // on a DV lake the dropped dirs' raw bytes still hold rows earlier
    // vectors deleted — they were not part of THIS commit's pre-image
    // and must not surface as spurious delete events
    val a = readEntrySet(spark, dir, dropped,
      dvAt = tip(spark, dir).filter(_ => dvEnabled(spark, dir)))
    val b = if (added.isEmpty) a.limit(0) else readEntrySet(spark, dir, added)
    val diff = snapshotDiff(spark, a, b)
    val tag =
      if (command == "UPDATE")
        when(col("op") === "insert", lit("update_postimage"))
          .otherwise(lit("update_preimage"))
      else col("op")
    diff.withColumn("_change_type", tag).drop("op")
  }

  // ---- merge-on-read deletion vectors ------------------------------------
  //
  // Copy-on-write rewrites a whole data dir to delete 1% of its rows —
  // at 100 TB with GDPR-style point deletes that write amplification
  // is the dominant cost. With the opt-in `deletion_vectors` table
  // property, a SQL DELETE instead records the (entry, file, position)
  // of each deleted row in a `_deletes/v<N>-<uuid>` parquet sidecar
  // and publishes an op-less delta manifest carrying `#dv <uuid>`:
  // O(deleted rows) written, ZERO data rewritten. Every DSv2 read at
  // version ≥ N applies the vector (row positions come from Spark's
  // own parquet row-index machinery — exact under row-group skipping
  // and file splits); time travel BELOW N never sees it; the exact
  // deleted rows are staged as `_changes/dv-<uuid>` BEFORE the publish
  // so changes()/CDF replay them atomically; OPTIMIZE/COW rewrites
  // read DV-aware and so MATERIALIZE the deletes away, leaving the
  // sidecar dead metadata for vacuum. Delta/Iceberg's deletion-vector
  // design point, realized on the manifest-CAS protocol.
  //
  // Scope: composes with PARTITIONED BY (partition-decidable deletes
  // keep the manifest-only whole-leaf drop; data-column deletes vector
  // within the candidate leaves) AND with column mapping (the position
  // scans read by field id on mapped lakes — see the survivorReader /
  // deleteVectors mapped branches). UPDATE/MERGE/rich-predicate DELETE
  // on any DV lake take the SupportsDelta merge-on-read path
  // ([[GraftLakeDeltaOperation]]).

  private def dvReg(dir: String) = new Path(s"$dir/_dv")

  def dvEnabled(spark: SparkSession, dir: String): Boolean =
    try fs(spark, dir).exists(dvReg(dir))
    catch { case scala.util.control.NonFatal(_) => false }

  def setDeletionVectors(spark: SparkSession, dir: String,
      maxRatio: Option[Double] = None,
      maxPending: Option[Long] = None): Unit = {
    maxRatio.foreach(r => require(r > 0 && r <= 1,
      s"dv_max_ratio must be in (0, 1], got $r"))
    maxPending.foreach(n => require(n > 0,
      s"dv_max_pending must be positive, got $n"))
    val bytes = ("dv\n" +
      maxRatio.fold("")(r => s"maxRatio\t$r\n") +
      maxPending.fold("")(n => s"maxPending\t$n\n")).getBytes("UTF-8")
    // NEVER truncate the registry in place: `dvEnabled` is an existence
    // check, so on a lake with LIVE sidecars a crash between a
    // truncating create and the content write would silently flip
    // dvEnabled off — every pending delete resurrects on the next
    // scan. Fill a tmp file invisibly, swing the name, and verify the
    // registry is readable before returning (ALTER TABLE SET/UNSET
    // TBLPROPERTIES routes through here on live tables).
    val f = fs(spark, dir)
    val reg = dvReg(dir)
    val tmp = reg.suffix(
      s".tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    f.delete(reg, false) // rename-onto-existing fails on local fs
    if (!f.rename(tmp, reg)) {
      f.delete(tmp, false)
      // racing ALTER won the rename — its registry is in place; fall
      // through to the readback check either way
    }
    // loud verification: the one crash window left (between the delete
    // and the rename) plus any FS failure must surface HERE, at ALTER
    // time, never as silently-disabled vectors at scan time
    val ok =
      try {
        val in = f.open(reg)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .nonEmpty
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!ok) {
      // last-resort direct re-create before giving up
      val retry = f.create(reg, true)
      try retry.write(bytes) finally retry.close()
      val in2 = f.open(reg)
      val ok2 = try scala.io.Source.fromInputStream(in2, "UTF-8")
        .getLines().nonEmpty finally in2.close()
      if (!ok2) throw new java.io.IOException(
        s"failed to publish deletion-vector registry $reg — the " +
          "registry is unreadable; live vectors would silently stop " +
          "applying, refusing instead")
    }
  }

  /** The declared DV maintenance bound, if any: when live (pending)
    * deleted positions exceed this fraction of the rows in the files
    * they cover, the NEXT DV delete auto-materializes those files'
    * vectors ([[materializeVectors]]) — turning "the DV tax is
    * bounded by OPTIMIZE cadence" from policy into mechanism.
    * Malformed/missing degrades to None (no auto-maintenance). */
  def dvMaxRatio(spark: SparkSession, dir: String): Option[Double] = {
    val f = fs(spark, dir)
    try {
      if (!f.exists(dvReg(dir))) None
      else {
        val in = f.open(dvReg(dir))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList
        finally in.close()
        lines.map(_.split('\t')).collectFirst {
          case Array("maxRatio", v) => v.toDouble
        }.filter(r => r > 0 && r <= 1)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The DEFAULT absolute pending-positions bound, when the table
    * declares neither `dv_max_ratio` nor `dv_max_pending`: 10M
    * positions (the old advisory-warning threshold, now mechanism).
    * Session-overridable so operators can tune it fleet-wide — and so
    * a spec can exercise the default path without a 10M-row fixture. */
  private[graft] val DvDefaultMaxPending = 10000000L

  /** The ABSOLUTE pending-positions bound: declared per table
    * (`dv_max_pending`), else the session default. Unlike the ratio
    * (opt-in), this bound ALWAYS holds — an undeclared 100 TB lake
    * with heavy delete churn auto-materializes at the default instead
    * of growing an unbounded backlog (scan-side selection tax and
    * per-task sidecar reads are O(backlog); the bound is opt-OUT by
    * raising it, not opt-in). Malformed lines degrade to the default. */
  def dvMaxPending(spark: SparkSession, dir: String): Long = {
    val default =
      try spark.conf.get("spark.graft.dv.maxPendingDefault",
        DvDefaultMaxPending.toString).toLong
      catch { case scala.util.control.NonFatal(_) => DvDefaultMaxPending }
    dvMaxPendingDeclared(spark, dir).getOrElse(default)
  }

  /** The PER-TABLE declared absolute bound, if any — distinct from
    * [[dvMaxPending]]'s declared-or-default resolution so ALTER can
    * rewrite one bound without clobbering the other's declaredness. */
  private[engine] def dvMaxPendingDeclared(spark: SparkSession,
      dir: String): Option[Long] = {
    val f = fs(spark, dir)
    try {
      if (!f.exists(dvReg(dir))) None
      else {
        val in = f.open(dvReg(dir))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList
        finally in.close()
        lines.map(_.split('\t')).collectFirst {
          case Array("maxPending", v) => v.toLong
        }.filter(_ > 0)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Rewrite EXACTLY the entries carrying live deletion vectors, with
    * the vectors applied — the bounded-maintenance primitive behind
    * `dv_max_ratio` (and callable directly): O(vectored entries) IO,
    * never O(lake); untouched entries carry by manifest reference.
    * Partition leaves rewrite within their own partitions. Returns
    * the published version, or None when no vector is live. */
  def materializeVectors(spark: SparkSession, dir: String,
      codec: String = "snappy"): Option[Int] = {
    val t = tip(spark, dir).getOrElse(return None)
    // entries still live that have at least one vectored file
    val touched = liveDvKeys(spark, dir, t)
      .map(k => k.substring(0, k.lastIndexOf('/')))
      .distinct.sorted
    if (touched.isEmpty) return None
    val partCols = GraftLakePartitions.of(spark, dir)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    // id-matched on mapped lakes, DV-filtered by construction
    val (rss, readEs) = survivorReader(spark, dir, t)
    val newEntries: Seq[String] =
      if (partCols.isEmpty) {
        readEs(touched)
          .write.option("compression", codec).parquet(s"$dir/$dataDir")
        Seq(dataDir)
      } else {
        // group vectored leaves by partition suffix; rows never cross
        // a partition boundary
        touched.groupBy(_.split('/').drop(1).mkString("/")).toSeq
          .sortBy(_._1).map { case (suffix, es) =>
            readEs(es)
              .write.option("compression", codec)
              .parquet(s"$dir/$dataDir/$suffix")
            s"$dataDir/$suffix"
          }
      }
    val _ = rss
    val schema = manifestSchema(spark, dir, t)
      .map(s => org.apache.spark.sql.types.StructType(s.filterNot(fl =>
        partCols.exists(_.name.equalsIgnoreCase(fl.name)))))
      .getOrElse(readAt(spark, dir, t).schema)
    indexStagedEntries(spark, dir, newEntries, schema)
    Some(publishReplacing(spark, dir, touched.toSet, newEntries,
      checked = true, layoutOnly = true, noDvSince = Some(t)))
  }

  /** Roll the lake back to version `v` AS A NEW COMMIT — the rolled-
    * over history stays time-travelable until vacuum; nothing is
    * deleted. Metadata-only where possible: v's entries carry by
    * manifest REFERENCE (their files still exist — v is within
    * retention, so vacuum has kept every dir v references).
    *
    * The one data cost is deletion vectors PUBLISHED AFTER v on
    * entries that are part of v's snapshot: sidecar applicability is
    * `sidecarVersion <= readVersion`, so at the restored tip those
    * post-v deletes would silently stay applied to restored data.
    * EXACTLY those entries are instead rewritten with v's OWN vector
    * state ([[survivorReader]] anchored at v — id-matched on mapped
    * lakes, per-leaf on partitioned ones), which also kills the
    * post-v sidecars' keys (replaced entries → dead metadata for
    * vacuum). O(post-v-vectored entries), never O(lake).
    *
    * Serializable: publishes strictly against the observed tip — a
    * concurrent commit refuses loudly rather than being silently
    * discarded. Returns the new version; None when `v` IS the tip. */
  def restore(spark: SparkSession, dir: String, v: Int): Option[Int] = {
    val tipV = tip(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no versions published at $dir"))
    if (v == tipV) return None
    requireVersion(spark, dir, v)
    val want = readManifest(spark, dir, v)
    val wantSet = want.toSet
    // entries of v carrying a vector published AFTER v
    val postV = dvSidecars(spark, dir, tipV).filter(_._1 > v)
    val affected: Seq[String] =
      if (postV.isEmpty) Seq.empty
      else readDvParquet(spark, postV.map(_._2.toString))
        .select("entry").distinct().collect().map(_.getString(0))
        .filter(wantSet).sorted.toSeq
    val partCols = GraftLakePartitions.of(spark, dir)
    val newEntries: Seq[String] =
      if (affected.isEmpty) Seq.empty
      else {
        // v's state of exactly these entries: v's declared schema
        // (id-matched on mapped lakes) and v's vectors
        val (rss, readEs) = survivorReader(spark, dir, v)
        val dataDir =
          s"d-${java.util.UUID.randomUUID.toString.take(12)}"
        val es =
          if (partCols.isEmpty) {
            readEs(affected).write.parquet(s"$dir/$dataDir")
            Seq(dataDir)
          } else {
            affected.groupBy(_.split('/').drop(1).mkString("/")).toSeq
              .sortBy(_._1).map { case (suffix, group) =>
                readEs(group).write.parquet(s"$dir/$dataDir/$suffix")
                s"$dataDir/$suffix"
              }
          }
        val _ = rss
        val schema = manifestSchema(spark, dir, v)
          .map(s => org.apache.spark.sql.types.StructType(s.filterNot(
            fl => partCols.exists(_.name.equalsIgnoreCase(fl.name)))))
          .getOrElse(readAt(spark, dir, v).schema)
        indexStagedEntries(spark, dir, es, schema)
        es
      }
    val entries =
      want.filterNot(affected.toSet) ++ newEntries
    // MAPPED lakes: a restore that crosses a REPLACE boundary brings
    // back columns whose (id, name) pairs live in a PRIOR mapping
    // epoch — aliases() scopes to the current epoch, so without
    // re-recording them the restored era's stats/bloom sidecar lines
    // (keyed under those names) stop matching and every skipping probe
    // quietly demotes to a full scan. Recording the restored schema
    // into the CURRENT epoch regains alias coverage; it cannot merge
    // unrelated histories because field ids are never reused across
    // epochs ([[GraftLakeMapping.nextId]] scans every era).
    if (GraftLakeMapping.enabled(spark, dir))
      manifestSchema(spark, dir, v).foreach(s =>
        GraftLakeMapping.record(spark, dir, s))
    Some(publishReplaceStrictAll(spark, dir, entries, tipV,
      schemaDdl = manifestSchema(spark, dir, v).map(_.json)))
  }

  /** DV maintenance-bound enforcement, called after a DV delete
    * publishes. TWO bounds, either sufficient to trigger:
    *
    *  - `dv_max_ratio` (opt-in): live positions vs the rows of the
    *    files they cover (both from metadata — ref counts and parquet
    *    footers of ONLY the vectored files);
    *  - the ABSOLUTE pending-positions bound ([[dvMaxPending]]) —
    *    ALWAYS in force, defaulting to [[DvDefaultMaxPending]] when
    *    the table declares nothing: an undeclared lake's backlog (and
    *    with it the scan-side selection tax) is bounded by MECHANISM,
    *    not operator discipline.
    *
    * Exceeding either materializes the vectored files' deletes away.
    * Best-effort: a concurrent rewrite racing the materialization
    * loses nothing (the next delete re-checks). */
  private[engine] def enforceDvBound(spark: SparkSession,
      dir: String): Unit = {
    val ratioOpt = dvMaxRatio(spark, dir)
    val maxPending = dvMaxPending(spark, dir)
    val t = tip(spark, dir).getOrElse(return)
    // LIVE vectors only: a materialized-away sidecar still lists
    // until vacuum, but its files are gone from the manifest — dead
    // positions must not re-trigger maintenance forever. Counts come
    // from the O(DV files) ref map; positions never collect.
    val liveKeys = liveDvKeys(spark, dir, t).toSet
    val dv = dvRefs(spark, dir, t).filter { case (k, _) =>
      liveKeys(k) }
    if (dv.isEmpty) return
    val positions = dv.valuesIterator.map(_.count).sum
    val overPending = positions > maxPending
    // the footer reads are O(vectored files) — paid only when a ratio
    // is declared and the absolute bound has not already decided
    val overRatio = !overPending && ratioOpt.exists { bound =>
      val conf = spark.sessionState.newHadoopConf()
      val rows = dv.keysIterator.map { k =>
        try {
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new Path(s"$dir/$k"), conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          } finally reader.close()
        } catch { case scala.util.control.NonFatal(_) => 0L }
      }.sum
      rows > 0 && positions.toDouble / rows > bound
    }
    if (overPending || overRatio) {
      // best-effort: a concurrent rewrite racing the maintenance
      // refuses at ITS cas — the delete that triggered this stays
      // committed either way, and the next delete re-checks
      try { materializeVectors(spark, dir); () }
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"DV maintenance bound on $dir deferred: $e")
      }
    }
  }

  // published part files are immutable, so a footer's row count
  // memoizes forever (bounded sweep like the other metadata memos)
  private val fileRowsMemo = scala.collection.concurrent.TrieMap
    .empty[String, Long]

  /** Total rows of one parquet file, from its footer — O(1 footer
    * read), memoized per path (files are immutable once published).
    * 0 on any read failure (callers treat 0 as "unknown": degrade to
    * the unadjusted estimate, never throw planning off). */
  private[engine] def parquetFileRows(
      conf: org.apache.hadoop.conf.Configuration, p: Path): Long =
    fileRowsMemo.getOrElseUpdate(p.toString, {
      if (fileRowsMemo.size > 65536) fileRowsMemo.clear()
      try {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        } finally reader.close()
      } catch { case scala.util.control.NonFatal(_) => 0L }
    })

  private val DvSidecarName = "^v(\\d+)-([0-9a-f]{12})$".r

  /** Deletion-vector sidecars applying to reads AT OR BELOW version
    * `v`: one `_deletes` listing; each candidate is bound (or
    * rejected) by its own manifest's `#dv` marker — an unbound sidecar
    * is a crashed attempt's orphan and never applies. A sidecar whose
    * manifest was VACUUMED proves its version predates retention
    * (below every readable `v`), so it applies; one below-retention
    * name whose manifest never existed (crashed attempt at a
    * never-published version) cannot be confused with it, because
    * versions are claimed sequentially and vacuum removes only
    * prefixes. */
  // a sidecar's manifest binding is IMMUTABLE once its manifest is
  // readable (published manifests never change their marker) — memoize
  // those outcomes so repeated plans pay one _deletes listing, not one
  // manifest read per candidate. The vacuumed-manifest fallback is NOT
  // memoized: its answer depends on the moving retention window.
  private val dvBindMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Boolean]

  private[engine] def dvSidecars(spark: SparkSession, dir: String,
      v: Int): Seq[(Int, Path)] = {
    val f = fs(spark, dir)
    val root = new Path(s"$dir/_deletes")
    if (!dvEnabled(spark, dir) || !f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case DvSidecarName(n, uuid) if n.toInt <= v =>
          val bound = dvBindMemo.get((dir, p.getName)).getOrElse {
            // a transient manifest-read failure must FAIL THE SCAN,
            // not skip the sidecar: treating it as "unbound" silently
            // resurrects deleted rows. One retry absorbs the
            // object-store hiccup; only the well-understood
            // vacuumed-manifest FNF takes the fallback path.
            def bindOnce(): Boolean =
              dvUuidOf(readManifestLines(spark, dir, n.toInt))
                .contains(uuid)
            try {
              val b =
                try bindOnce()
                catch {
                  case _: java.io.FileNotFoundException => throw
                    new java.io.FileNotFoundException(p.getName)
                  case scala.util.control.NonFatal(_) => bindOnce()
                }
              if (dvBindMemo.size > 4096) dvBindMemo.clear() // bounded
              dvBindMemo.put((dir, p.getName), b)
              b
            } catch {
              case _: java.io.FileNotFoundException =>
                // manifest gone: applies iff genuinely below retention
                versionRange(spark, dir).exists { case (lo, _) =>
                  n.toInt < lo }
            }
          }
          if (bound) Some((n.toInt, p)) else None
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** The positions sidecar's FIXED layout (every writer emits exactly
    * this triple — [[GraftLakeDeltaOp.writePosPart]] and the metadata
    * DELETE path) — passed to every sidecar read so none pays a
    * footer-inference job. */
  private[engine] val DvSidecarSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("entry",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))

  private[engine] def readDvParquet(spark: SparkSession,
      paths: Seq[String]): DataFrame =
    spark.read.schema(DvSidecarSchema).parquet(paths: _*)

  /** All deleted (entry, file, pos) rows applying at `v` — the
    * anti-join side for DV-aware library reads and rewrites. */
  private[engine] def dvFrame(spark: SparkSession, dir: String,
      v: Int): Option[DataFrame] = {
    val side = dvSidecars(spark, dir, v)
    if (side.isEmpty) None
    else Some(readDvParquet(spark, side.map(_._2.toString))
      .select("entry", "file", "pos"))
  }

  /** Every ENCODED URI string Spark may report for this file in
    * `_metadata.file_path` / `input_file_name`: SparkPath encoding of
    * the qualified path, plus — for authority-less URIs (file:) — the
    * null-authority spelling (`file:/x` vs `file:///x`), which differs
    * per constructing layer. Driver-side lookups key on ALL forms so
    * the match never depends on which layer built the Path. */
  private[engine] def encodedForms(
      f: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] = {
    val q = f.makeQualified(p)
    val u = q.toUri
    val base = org.apache.spark.paths.SparkPath.fromPath(q).urlEncoded
    if (u.getAuthority == null || u.getAuthority.isEmpty) {
      val alt = new java.net.URI(u.getScheme, null, u.getPath,
        null, null).toString
      Seq(base, alt).distinct
    } else Seq(base)
  }

  // per (lake, version, sidecar-set): one [[GraftLakeDvRef]] per
  // (entry, file) carrying a vector — O(DV files) driver rows, NEVER
  // positions. Sidecars are immutable and uuid-named, so the key is
  // exact; evict wholesale rather than grow forever (a miss costs one
  // small distributed aggregation).
  private val dvRefsMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Int, String), Map[String, GraftLakeDvRef]]

  /** The planning-side DV state: per vectored file, the sidecar part
    * files holding its positions and their count — `entry…/fileName`
    * (relative path under the lake root — file names alone are not
    * guaranteed unique across data dirs) → [[GraftLakeDvRef]].
    * Computed by ONE distributed aggregation over the sidecar scan
    * (positions never collect); tasks later open exactly the parts
    * their ref names ([[GraftLakeDvScan.loadPositions]]). Driver
    * memory is O(DV files) by construction — no pending-position
    * backlog can balloon it, so there is no warn-past-N escape hatch
    * left to need. */
  private[graft] def dvRefs(spark: SparkSession, dir: String,
      v: Int): Map[String, GraftLakeDvRef] = {
    val side = dvSidecars(spark, dir, v)
    if (side.isEmpty) return Map.empty
    val key = (dir, v, side.map(_._2.getName).sorted.mkString(","))
    if (dvRefsMemo.size > 256) dvRefsMemo.clear()
    dvRefsMemo.getOrElseUpdate(key, {
      import org.apache.spark.sql.functions.{col, count, lit}
      readDvParquet(spark, side.map(_._2.toString))
        .groupBy(col("entry"), col("file"),
          col("_metadata.file_path").as("part"))
        .agg(count(lit(1)).as("n"))
        .collect() // bounded: one row per (vectored file, sidecar part)
        .groupBy(r => (r.getString(0), r.getString(1)))
        .map { case ((e, fl), rs) =>
          s"$e/$fl" -> GraftLakeDvRef(e, fl,
            // file_path is URL-ENCODED (SparkPath semantics) — decode
            // to the on-disk spelling the task-side reader opens
            rs.map(r => GraftLakeDvScan.decodedPathString(
              r.getString(2))).toSeq.distinct.sorted,
            rs.map(_.getLong(3)).sum)
        }
    })
  }

  private[engine] def dvFileKeys(spark: SparkSession, dir: String,
      v: Int): Seq[(String, String)] =
    dvRefs(spark, dir, v).values.map(r => (r.entry, r.file)).toSeq

  /** DV keys (`entry/file`) whose ENTRY is still live at `v` — the
    * single spelling of the liveness invariant maintenance, the
    * fixtures and the specs all share. */
  private[graft] def liveDvKeys(spark: SparkSession, dir: String,
      v: Int): Seq[String] = {
    val live = readManifest(spark, dir, v).toSet
    dvFileKeys(spark, dir, v).collect {
      case (e, f) if live(e) => s"$e/$f"
    }
  }

  /** Total on-disk bytes of the DV sidecars applying at `v` — decides
    * whether an anti-join side is broadcast-safe. Sidecars are
    * immutable and uuid-named, so per-sidecar sizes memoize forever
    * (one getContentSummary each, EVER — not one per planning call). */
  private val dvBytesMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Long]

  private[engine] def dvSidecarBytes(spark: SparkSession, dir: String,
      v: Int): Long = {
    val f = fs(spark, dir)
    dvSidecars(spark, dir, v).map { s =>
      if (dvBytesMemo.size > 8192) dvBytesMemo.clear() // bounded
      dvBytesMemo.getOrElseUpdate((dir, s._2.getName),
        f.getContentSummary(s._2).getLength)
    }.sum
  }

  /** Broadcast only when the vectors are provably small; past the
    * threshold the join stays a shuffle and AQE decides — at 100 TB a
    * backlog of pending positions must not be forced driver-side. */
  private[engine] val DvBroadcastMaxBytes: Long = 32L * 1024 * 1024

  /** Drop the rows of `df` that a deletion vector at/below `v` covers.
    * `df` must be a FRESH FILE SCAN (`_metadata` is the join key).
    * Identity — zero extra plan nodes — when no vector applies.
    *
    * The join key is the file's QUALIFIED URI string: `_metadata
    * .file_path` is URL-ENCODED (SparkPath semantics — a partition
    * value like `New York` surfaces as `New%20York`), so deriving the
    * manifest-form entry from it with string surgery silently
    * mismatches any URI-encodable character. Instead the (decoded)
    * sidecar keys — already driver-resident and memoized in
    * [[dvRefs]], O(DV files) by construction — are re-qualified
    * through the filesystem into exactly the encoded form the scan
    * reports. */
  private[engine] def dropDvRows(spark: SparkSession, dir: String,
      df: DataFrame, v: Int): DataFrame = {
    // ONLY the per-FILE key set comes driver-side (O(DV files),
    // memoized); the positions themselves stay in the DISTRIBUTED
    // sidecar scan below. No per-position driver state is forced
    // here: at 100 TB an unbounded pending backlog must never collect
    // on this path.
    val side0 = dvFrame(spark, dir, v).getOrElse(return df)
    val keys = dvFileKeys(spark, dir, v)
    if (keys.isEmpty) return df
    import org.apache.spark.sql.functions.{broadcast, col}
    val f = fs(spark, dir)
    import spark.implicits._
    val fileDim = keys.flatMap { case (entry, file) =>
      encodedForms(f, new Path(s"$dir/$entry/$file"))
        .map(q => (q, entry, file))
    }.toDF("__dv_fp", "entry", "file")
    val side = side0
      .join(broadcast(fileDim), Seq("entry", "file"))
      .select(col("__dv_fp"), col("pos").as("__dv_p"))
    val hinted =
      if (dvSidecarBytes(spark, dir, v) <= DvBroadcastMaxBytes)
        broadcast(side)
      else side
    df.withColumn("__dv_fp", col("_metadata.file_path"))
      .withColumn("__dv_p", col("_metadata.row_index"))
      .join(hinted, Seq("__dv_fp", "__dv_p"), "left_anti")
      .drop("__dv_fp", "__dv_p")
  }

  /** SQL DELETE on a DV lake: record positions, rewrite nothing.
    * Returns the published version, or None when no live row matched.
    * Serializable: the touched dirs must still be live at the CAS (a
    * concurrent rewrite carried the rows as survivors — refusing
    * loudly beats losing the delete); rows an earlier vector already
    * deleted are excluded, so change events never double-report. */
  /** Position-scan FILE pruning for a DV delete: dirs bound by a
    * one-interval condition through the stats sidecars, then files
    * bound by every point-lookup conjunct through stats ranges AND the
    * bloom sidecars ([[SidecarProbe.admitAnyOf]] — conservative: a
    * file is skipped only when it provably holds no matching row, so
    * skipping loses no positions). THE 100 TB point-delete shape: the
    * scan cost is O(files that can match the keys), never O(lake). */
  private[graft] def dvPruneFiles(spark: SparkSession, dir: String,
      snapshot: Seq[String],
      rangeBound: Option[(String, Double, Double)],
      pointLookups: Seq[(String, Seq[Any])]): Seq[(String, Path)] = {
    val f = fs(spark, dir)
    val dirs = rangeBound match {
      case Some((c, lo, hi)) =>
        if (lo <= hi) dirsIntersecting(spark, dir, snapshot, c, lo, hi)
        else Seq.empty
      case None => snapshot
    }
    val probe = new SidecarProbe(spark, dir)
    dirs.flatMap { d =>
      f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .filter(p => pointLookups.forall { case (c, vs) =>
          probe.admitAnyOf(p, c, vs) })
        .map(p => (d, p))
    }
  }

  private[engine] def deleteVectors(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      rangeBound: Option[(String, Double, Double)],
      pointLookups: Seq[(String, Seq[Any])] = Seq.empty,
      entriesOverride: Option[Seq[String]] = None): Option[Int] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val f = fs(spark, dir)
    val tipV = tip(spark, dir).getOrElse(return None)
    val snapshot = readManifest(spark, dir, tipV)
    // partition-pruned candidate entries (a partitioned DELETE's
    // partition conjuncts) — still CAS-anchored against the snapshot
    val scanEntries = entriesOverride.getOrElse(snapshot)
    val pruned = dvPruneFiles(spark, dir, scanEntries, rangeBound,
      pointLookups)
    if (pruned.isEmpty) return None
    // serializable anchor: the dirs whose files we record positions
    // for must still be live at the CAS
    val touched = pruned.map(_._1).distinct
    val partCols = GraftLakePartitions.of(spark, dir)
    def withDvCols(df: DataFrame): DataFrame = df
      .withColumn("__dv_fp", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    // the FULL manifest entry (`d-x` flat, `d-x/c=v/…` partitioned) —
    // vacuum's liveness check and the (entry, file, pos) key both
    // need it. `_metadata.file_path` is URL-ENCODED (SparkPath), so
    // the entry is NOT derivable from it by string surgery (a value
    // like `New York` surfaces as `New%20York` and would mismatch the
    // manifest form forever); instead each pruned file's qualified
    // URI maps back to its MANIFEST-FORM (entry, file) through a
    // driver-built broadcast lookup — exact, O(candidate files).
    val lkRows = pruned.flatMap { case (e, p) =>
      encodedForms(f, p).map(q => (q, e, p.getName)) }
    import spark.implicits._
    val lkDf = lkRows.toDF("__dv_fp", "__dv_entry", "__dv_file")
    // COLUMN-MAPPING lakes: the position scan must read BY FIELD ID
    // (a name-matched read would null renamed columns out of
    // pre-rename files and the predicate would silently MISS their
    // rows) — declared schema on a derived fieldId session, the
    // survivorReader pattern
    val (prs, declaredOpt) =
      if (!GraftLakeMapping.enabled(spark, dir)) (spark, None)
      else {
        val declared = manifestSchema(spark, dir, tipV)
          .getOrElse(throw new IllegalStateException(
            s"column-mapping lake $dir has no declared schema at its " +
              "tip — cannot id-match the DV position scan"))
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        (s2, Some(declared))
      }
    def rawScan(paths: Seq[String], basePath: Option[String]): DataFrame = {
      val r0 = declaredOpt.fold(
        prs.read.option("mergeSchema", "true"))(sch =>
        // full declared schema: data columns id-match from footers,
        // partition columns fill from the `c=v` dir names (typed by
        // the declaration, no inference)
        prs.read.schema(org.apache.spark.sql.types.StructType(
          sch.filter(f => basePath.isDefined ||
            !partCols.exists(_.name.equalsIgnoreCase(f.name))))))
      basePath.fold(r0)(bp => r0.option("basePath", bp))
        .parquet(paths: _*)
    }
    // partitioned lakes: partition values live in dir names, not file
    // bytes — read per data dir with basePath so Spark reconstructs
    // the `c=v` columns (cast to DECLARED types), or the predicate
    // could not see them and the change sidecar would ship partial
    // rows. Union width = touched data dirs, not partitions.
    val scan0 =
      if (partCols.isEmpty)
        withDvCols(rawScan(pruned.map(_._2.toString), None))
      else pruned.groupBy(_._1.takeWhile(_ != '/')).toSeq.sortBy(_._1)
        .map { case (dd, ps) =>
          val df = rawScan(ps.map(_._2.toString), Some(s"$dir/$dd"))
          withDvCols(partCols.foldLeft(df)((d, c) =>
            d.withColumn(c.name, col(c.name).cast(c.dataType))))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
    // LEFT join so a path-form mismatch cannot silently DROP deletes
    // (an inner join would exclude matched rows whose reported
    // spelling is absent from encodedForms — on an exotic filesystem
    // that is a silent partial DELETE); the null check after the
    // cache refuses loudly instead
    val matched0 = scan0.filter(pred <=> lit(true))
      .join(broadcast(lkDf), Seq("__dv_fp"), "left")
    // broadcast the prior/interleaved vector frames only when their
    // bytes are provably small (memoized sidecar sizes) — at 100 TB a
    // pending-position backlog must not be forced driver-side per
    // DELETE; past the gate the anti-join stays shuffle-side for AQE
    def dvHint(frame: DataFrame): DataFrame =
      if (dvSidecarBytes(spark, dir, tipV) <= DvBroadcastMaxBytes)
        broadcast(frame)
      else frame
    val matched = dvFrame(spark, dir, tipV) match {
      case None => matched0
      case Some(old) =>
        matched0.join(dvHint(old.select(
          col("entry").as("__dv_entry"), col("file").as("__dv_file"),
          col("pos").as("__dv_pos"))),
          Seq("__dv_entry", "__dv_file", "__dv_pos"), "left_anti")
    }
    val m = matched.cache()
    var cur = m
    try {
      if (m.isEmpty) return None
      require(m.filter(col("__dv_entry").isNull).limit(1).count() == 0,
        s"DV delete on $dir matched rows whose reported file path " +
          "has no encoded form in the pruned-file lookup — refusing " +
          "loudly rather than silently skipping their deletes " +
          "(filesystem path-spelling mismatch; extend encodedForms)")
      val uuid = java.util.UUID.randomUUID.toString.replace("-", "")
        .take(12)
      // the exact deleted rows, staged BEFORE the publish under the
      // uuid the marker will bind — changes()/CDF replay is atomic
      // with the commit (the post-publish v<N> sidecar CDF writes
      // elsewhere is best-effort; here it must not be)
      val changeDir = s"$dir/_changes/dv-$uuid"
      m.drop("__dv_fp", "__dv_entry", "__dv_file", "__dv_pos")
        .withColumn("_change_type", lit("delete"))
        .write.parquet(changeDir)
      // vectors already subtracted from `cur` reach up to this version
      // — a CONCURRENT DV DELETE changes no dirs, so the `gone` check
      // cannot see it; without re-subtracting its positions, both
      // commits would publish overlapping vectors and the change
      // sidecar would re-report rows the interleaved commit already
      // deleted (duplicate delete events for CDF consumers)
      var subtractedTo = tipV
      var committed = -1
      while (committed < 0) {
        val prevTip = tip(spark, dir).get
        val gone = touched.toSet.diff(
          readManifest(spark, dir, prevTip).toSet)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deletion-vector conflict on $dir: dirs " +
              s"${gone.mkString(", ")} were rewritten after this " +
              "DELETE scanned them (the rewrite carried the rows as " +
              "survivors) — retry against the new snapshot")
        val interleaved = dvSidecars(spark, dir, prevTip)
          .filter(_._1 > subtractedTo)
        if (interleaved.nonEmpty) {
          val nv = spark.read
            .parquet(interleaved.map(_._2.toString): _*)
            .select(col("entry").as("__dv_entry"),
              col("file").as("__dv_file"),
              col("pos").as("__dv_pos"))
          val next0 = cur.join(
            if (dvSidecarBytes(spark, dir, prevTip) <=
              DvBroadcastMaxBytes) broadcast(nv) else nv,
            Seq("__dv_entry", "__dv_file", "__dv_pos"), "left_anti")
            .cache()
          if (cur ne m) cur.unpersist()
          cur = next0
          subtractedTo = prevTip
          if (cur.isEmpty) {
            // every matched row was deleted by the interleaved
            // commit(s): nothing left to publish
            f.delete(new Path(changeDir), true)
            return None
          }
          cur.drop("__dv_fp", "__dv_entry", "__dv_file", "__dv_pos")
            .withColumn("_change_type", lit("delete"))
            .write.mode("overwrite").parquet(changeDir)
        }
        // SORTED by (entry, file, pos): each vectored file's positions
        // cluster into few row groups with tight stats, so the
        // task-side predicate-pushed sidecar read
        // ([[GraftLakeDvScan.loadPositions]]) skips foreign keys'
        // pages instead of decoding the whole backlog per task
        val pos = cur.select(col("__dv_entry").as("entry"),
          col("__dv_file").as("file"), col("__dv_pos").as("pos"))
          .sort("entry", "file", "pos")
        val next = prevTip + 1
        val sidecar = new Path(s"$dir/_deletes/v$next-$uuid")
        f.delete(sidecar, true) // our own stale attempt (uuid-unique)
        pos.write.parquet(sidecar.toString)
        val declared = manifestSchema(spark, dir, prevTip).map(_.json)
        val bytes = ((DeltaMarker +: schemaLine(declared)) ++
          Seq(DvMarker + uuid) :+ ManifestEnd)
          .mkString("\n").getBytes("UTF-8")
        try {
          val out = f.create(manifestPath(dir, next), false)
          try out.write(bytes) finally out.close()
          committed = next
        } catch {
          case e: java.io.IOException =>
            if (!f.exists(manifestPath(dir, next))) throw e
            f.delete(sidecar, true) // lost the race: unbind the attempt
        }
      }
      writeTipHint(f, dir, committed)
      // dv_max_ratio maintenance contract: the commit that pushes
      // pending positions past the bound pays the (scoped) rewrite
      enforceDvBound(spark, dir)
      Some(committed)
    } finally {
      if (cur ne m) cur.unpersist()
      m.unpersist()
      ()
    }
  }

  /** The MERGE-ON-READ row-level publish ([[GraftLakeDeltaWrite]]):
    * ONE version that appends `added` (the UPDATE/MERGE's rewritten +
    * inserted rows) and binds the staged positions sidecar via the
    * `#dv` marker (the delete half) — O(changed rows) bytes, zero
    * data rewritten. Either half may be absent: positions-only is the
    * pure-DELETE shape ([[deleteVectors]]' commit form), adds-only is
    * an insert-only MERGE (plain checked append, no marker).
    *
    * Concurrency: the write was computed from a scan that already
    * happened and cannot absorb an arbitrary interleaving by looping,
    * so two refusals stay unconditional —
    *  - a touched entry left the tip (a rewrite carried the rows this
    *    commit deletes as survivors — publishing resurrects/ghosts);
    *  - a NON-row-level commit changed the live dir set (an append/
    *    overwrite may hold rows matching the operation's condition).
    * A concurrent ROW-LEVEL (`#dv`) commit, however, is ADJUDICATED by
    * footprint instead of refused outright — the frequent-small-
    * corrections shape (two disjoint-key UPDATEs) serializes without
    * caller-level retries: its positions are compared to ours (entry-
    * set screen first — O(touched files) metadata — then an exact
    * position semi-join only when entries overlap), and its appended
    * dirs are tolerated in the fresh-dir check. OVERLAPPING positions
    * still refuse loudly (the concurrent commit deleted/rewrote a row
    * this operation also acts on — a lost update; the rewritten rows
    * are already staged and cannot be unpicked without a rescan).
    * Isolation: position-disjoint commits against a concurrent pure
    * DELETE serialize exactly; against a concurrent UPDATE/MERGE the
    * rows IT appended are not re-scanned against our condition —
    * write-snapshot isolation, Delta's WriteSerializable default.
    * Attempts are bounded; the final failure is loud.
    *
    * The staged sidecar dir renames to its version-bound name inside
    * the CAS loop (the name embeds the version); a lost race's next
    * attempt renames it forward again, and a REFUSAL after a rename
    * puts it back on the stage path so the caller's cleanup covers it
    * (a version-named but unbound sidecar would orphan until vacuum). */
  private[graft] def publishDvDelta(spark: SparkSession, dir: String,
      observedV: Int, snapshot: Set[String], touched: Seq[String],
      added: Seq[String], stagedPos: Option[Path], uuid: String,
      schemaDdl: Option[String]): Int = {
    require(stagedPos.nonEmpty || added.nonEmpty,
      "publishDvDelta needs positions or added entries")
    val f = fs(spark, dir)
    var sidecarAt = stagedPos
    var committed = -1
    val ourEntries = touched.toSet
    // concurrent-commit adjudication state: versions at or below
    // `adjudicatedTo` have been checked (re-checking per CAS attempt
    // would be O(attempts x concurrent commits)); `toleratedAdds`
    // accumulates dirs appended by tolerated row-level commits
    var adjudicatedTo = observedV
    val toleratedAdds = scala.collection.mutable.Set.empty[String]
    var attempts = 0
    def refuse(msg: String): Nothing = {
      // ADVICE r19: a lost CAS race may have renamed the sidecar to a
      // version-bound name already — restore the stage path before
      // rethrowing so the caller's stage-dir cleanup reaches it
      (sidecarAt, stagedPos) match {
        case (Some(cur), Some(orig)) if cur != orig =>
          if (!f.rename(cur, orig)) f.delete(cur, true)
          sidecarAt = stagedPos
        case _ => ()
      }
      throw new java.util.ConcurrentModificationException(msg)
    }
    while (committed < 0) {
      attempts += 1
      if (attempts > 32)
        refuse(s"merge-on-read publish on $dir lost $attempts CAS " +
          "races — the lake is under write contention this commit " +
          "cannot outrun; retry the operation")
      val prevTip = tip(spark, dir).getOrElse(
        throw new IllegalStateException(s"no versions published at $dir"))
      ((adjudicatedTo + 1) to prevTip).foreach { k =>
        val lines = readManifestLines(spark, dir, k)
        dvUuidOf(lines).foreach { u =>
          // concurrent row-level commit: tolerable iff its delete
          // footprint provably cannot overlap ours
          val overlapCandidates =
            sidecarAt.nonEmpty && ourEntries.nonEmpty && {
              val theirEntries = readDvParquet(spark,
                Seq(s"$dir/_deletes/v$k-$u"))
                .select("entry").distinct().collect()
                .map(_.getString(0)).toSet
              theirEntries.exists(ourEntries)
            }
          if (overlapCandidates) {
            // exact check, shuffle-side (never per-row on the driver):
            // O(both commits' changed rows)
            val ours = readDvParquet(spark,
              Seq(sidecarAt.get.toString))
              .select("entry", "file", "pos")
            val theirs = readDvParquet(spark,
              Seq(s"$dir/_deletes/v$k-$u"))
              .select("entry", "file", "pos")
            if (ours.join(theirs, Seq("entry", "file", "pos"),
                "left_semi").limit(1).count() > 0)
              refuse(s"merge-on-read conflict on $dir: row-level " +
                s"commit v$k deleted or rewrote positions this " +
                "operation also acts on (a lost update); retry " +
                "against the new snapshot")
          }
          // its appended dirs (rewritten/inserted rows) are tolerated
          // in the fresh-dir screen below
          parseManifest(lines)._1 match {
            case Left((adds, _)) => toleratedAdds ++= adds
            case Right(_) => ()
          }
        }
      }
      adjudicatedTo = prevTip
      val tip0 = readManifest(spark, dir, prevTip)
      val gone = touched.toSet.diff(tip0.toSet)
      if (gone.nonEmpty)
        refuse(
          s"merge-on-read conflict on $dir: dirs ${gone.mkString(", ")} " +
            "were rewritten by a concurrent commit after this " +
            "operation scanned them; retry against the new snapshot")
      val fresh = tip0.toSet.diff(snapshot).diff(toleratedAdds)
      if (fresh.nonEmpty)
        refuse(
          s"merge-on-read conflict on $dir: dirs ${fresh.mkString(", ")} " +
            "were appended by a concurrent commit after this " +
            "operation's snapshot — they may hold rows matching the " +
            "operation's condition; retry against the new snapshot")
      val next = prevTip + 1
      sidecarAt.foreach { cur =>
        val tgt = new Path(s"$dir/_deletes/v$next-$uuid")
        if (cur != tgt) {
          f.delete(tgt, true) // our own stale attempt (uuid-unique)
          if (!f.rename(cur, tgt))
            throw new java.io.IOException(
              s"failed to stage DV sidecar $tgt")
          sidecarAt = Some(tgt)
        }
      }
      val marker = sidecarAt.map(_ => DvMarker + uuid).toSeq
      val bytes = ((DeltaMarker +: schemaLine(schemaDdl)) ++
        added.map("+" + _) ++ marker :+ ManifestEnd)
        .mkString("\n").getBytes("UTF-8")
      try {
        val out = f.create(manifestPath(dir, next), false)
        try out.write(bytes) finally out.close()
        committed = next
      } catch {
        case e: java.io.IOException =>
          if (!f.exists(manifestPath(dir, next))) throw e
        // lost race: loop — the next attempt re-checks conflicts and
        // renames the sidecar forward to the new next version
      }
    }
    writeTipHint(f, dir, committed)
    committed
  }

  /** Changed rows between two published versions, tagged `op` =
    * insert | delete — the incremental-consumption primitive (CDC by
    * version, the "process only what's new since yesterday's run"
    * path a training pipeline re-runs on).
    *
    * Scale shape, decided version-by-version from manifest metadata:
    * an APPEND step reads exactly its added data dirs (O(delta), zero
    * row comparison, zero shuffle); a LAYOUT-ONLY step (compaction /
    * Z-order — [[isLayoutOnly]]) preserves every row and contributes
    * nothing; a data-changing rewrite (COW MERGE/UPDATE/DELETE,
    * overwrite, replaceWhere) diffs ONLY its dropped-vs-added dirs —
    * survivor rows carried inside the rewrite cancel in the multiset
    * diff, so the cost is O(changed fraction), never O(lake). The
    * events concatenate per commit (Delta-CDF semantics: a row
    * inserted then deleted within the range appears as both events —
    * signed consumers net it). Only when an intermediate manifest was
    * vacuumed away does this fall back to the endpoint snapshot diff
    * (`exceptAll`, one full-width shuffle per side). */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int)
      : DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    // the walk needs every manifest in [fromV, toV]; a vacuumed-away
    // intermediate is detected DURING the walk (the first missing
    // manifest aborts it) rather than by an O(range) exists() precheck
    // — one RPC per version was the cost, paid on every call over a
    // long-lived lake's whole history. The failover is the ENDPOINT
    // snapshot diff — correct on any history, O(both snapshots).
    try changesWalk(spark, dir, fromV, toV)
    catch { case _: java.io.FileNotFoundException =>
      changesEndpoints(spark, dir, fromV, toV)
    }
  }

  /** Per-version walk, concatenating each commit's own delta (the
    * Delta-CDF shape): an APPEND step's changes are exactly its added
    * dirs — metadata-decided, no row diff; a LAYOUT-ONLY step
    * (compaction/Z-order) preserves every row and contributes
    * NOTHING; a step that drops dirs with data change (COW MERGE/
    * UPDATE/DELETE, overwrite, replaceWhere) diffs ONLY the dropped
    * vs added dirs — survivors carried inside the rewrite cancel in
    * the multiset diff, so the cost is O(changed fraction), never
    * O(lake). Note the per-commit semantics: a row inserted at one
    * step and deleted at a later step appears as BOTH events (signed
    * consumers net it out; the endpoint fallback nets it silently). */
  private def changesWalk(spark: SparkSession, dir: String, fromV: Int,
      toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    var inserts = Seq.empty[String]
    var steps = Seq.empty[DataFrame]
    var prev = readManifest(spark, dir, fromV)
    var v = fromV + 1
    while (v <= toV) {
      val (cur, layoutOnly, isDv) = manifestStep(spark, dir, prev, v)
      val added = cur.filterNot(prev.toSet)
      val removed = prev.filterNot(cur.toSet)
      if (layoutOnly) {
        // row-preserving rewrite: no change events
      } else if (removed.isEmpty && !isDv) {
        inserts = inserts ++ added
      } else changeSidecarPath(spark, dir, v) match {
        case Some(p) =>
          // row-level sidecar: the commit's EXACT changes, survivors
          // already netted at DML time — O(changed rows), no diff here
          import org.apache.spark.sql.functions.{col, lit, when}
          steps = steps :+ spark.read.parquet(p.toString)
            .withColumn("op",
              when(col("_change_type").isin("insert", "update_postimage"),
                lit("insert")).otherwise(lit("delete")))
            .drop("_change_type")
        case None =>
          // a DV commit's sidecar is staged before its publish — its
          // absence is corruption, and the dir-diff fallback would be
          // SILENTLY EMPTY (no dirs changed), losing the deletes
          require(!isDv,
            s"deletion-vector commit v$v of $dir lacks its change " +
              "sidecar (_changes/dv-*) — it was removed outside the " +
              "vacuum protocol; the delete events cannot be replayed")
          // on a DV lake the dropped dirs' RAW bytes still hold rows
          // earlier vectors deleted — they were not part of THIS
          // commit's pre-image and must not surface as spurious
          // delete events (caught by DvFuzzSpec's netted-feed check)
          val dvAt = if (dvEnabled(spark, dir)) Some(v) else None
          val a0 = readEntrySet(spark, dir, removed, dvAt)
          val b0 =
            if (added.isEmpty) a0.limit(0)
            else readEntrySet(spark, dir, added, dvAt)
          steps = steps :+ snapshotDiff(spark, a0, b0)
      }
      prev = cur
      v += 1
    }
    val insertDf =
      if (inserts.isEmpty) Seq.empty[DataFrame]
      else Seq(readEntrySet(spark, dir, inserts)
        .withColumn("op", lit("insert")))
    val parts = insertDf ++ steps
    if (parts.isEmpty)
      readAt(spark, dir, toV).limit(0).withColumn("op", lit("insert"))
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Endpoint-only resolution when the intermediate history was
    * vacuumed: append fast path when the endpoints prove it, otherwise
    * the full snapshot diff. */
  private def changesEndpoints(spark: SparkSession, dir: String,
      fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val from = readManifest(spark, dir, fromV).toSet
    val to = readManifest(spark, dir, toV)
    // a deletion-vector commit in (fromV, toV] deletes rows WITHOUT
    // changing the dir set — the append fast path would miss it
    val dvInRange = dvSidecars(spark, dir, toV).exists(_._1 > fromV)
    if (!dvInRange && from.subsetOf(to.toSet)) {
      val added = to.filterNot(from)
      if (added.isEmpty)
        readAt(spark, dir, toV).limit(0).withColumn("op", lit("insert"))
      else readEntrySet(spark, dir, added)
        .withColumn("op", lit("insert"))
    } else snapshotDiff(spark, readAt(spark, dir, fromV),
      readAt(spark, dir, toV))
  }

  /** Multiset row diff `b0 \ a0` (insert) ∪ `a0 \ b0` (delete), with
    * schema-evolution alignment: both sides select the UNION of their
    * columns (missing → null, matching mergeSchema read semantics) so
    * the diff compares rows, not shapes — exceptAll throws on
    * mismatched schemas otherwise. */
  private def snapshotDiff(spark: SparkSession, a0: DataFrame,
      b0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val cols = (a0.columns ++ b0.columns.filterNot(a0.columns.contains))
      .toSeq
    val typeOf = (a0.schema ++ b0.schema)
      .map(f => f.name -> f.dataType).toMap // newer side wins on both
    def align(df: DataFrame) = df.select(cols.map(c =>
      if (df.columns.contains(c)) col(c).cast(typeOf(c))
      else lit(null).cast(typeOf(c)).as(c)): _*)
    val (a, b) = (align(a0), align(b0))
    b.exceptAll(a).withColumn("op", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("delete")))
  }

  /** Commit with FILE-LEVEL DATA-SKIPPING STATS (the Delta/Iceberg
    * data-skipping shape, the pruning lever BEYOND partition dirs):
    * after the data write, one bounded driver pass over the new part
    * files' parquet FOOTERS records per-file min/max for `statsCols`
    * into `_stats/<dataDir>.stats` (tab-separated, one line per
    * (file, col)); [[readSkipping]] then serves a range probe from only
    * the files whose range intersects it. Stats are metadata-sized
    * (files × cols), collected from footers already written — no second
    * data scan — and a data dir WITHOUT stats (plain [[commit]]) is
    * simply never skipped, so the two commit paths interoperate.
    * Cluster the frame (`repartitionByRange` + sort) before committing
    * or every file spans the full range and nothing can skip. */
  def commitWithStats(df: DataFrame, dir: String, statsCols: Seq[String],
      mode: String = "append", codec: String = "snappy"): Int =
    commitIndexed(df, dir, statsCols, None, mode, codec)

  /** Commit with ANY combination of sidecar indexes in one data write:
    * min/max range stats for `statsCols` AND/OR a per-file Bloom over
    * `bloomCol`. The two index classes answer different probes (ranges
    * on clustered columns vs point lookups on unclustered keys) and
    * live in separate sidecar files, so a lake wanting both must not
    * have to choose — one parquet write, then each sidecar pass over
    * the already-written files. */
  def commitIndexed(df: DataFrame, dir: String, statsCols: Seq[String],
      bloomCol: Option[String], mode: String = "append",
      codec: String = "snappy", layoutOnly: Boolean = false): Int = {
    val spark = df.sparkSession
    val partCols = GraftLakePartitions.of(spark, dir)
    val out = withMappedIds(df, dir)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val w0 = out.write.option("compression", codec)
    // parquet's native row-group bloom rides along whenever the
    // file-level bloom is requested (see commitWithBloom's doc)
    val w = bloomCol.fold(w0)(c =>
      w0.option(s"parquet.bloom.filter.enabled#$c", "true"))
    val entries: Seq[String] =
      if (partCols.isEmpty) {
        w.parquet(s"$dir/$dataDir")
        Seq(dataDir)
      } else {
        require(partCols.forall(pc =>
          out.columns.exists(_.equalsIgnoreCase(pc.name))),
          "the committed frame lacks the lake's partition columns " +
            s"(${partCols.map(_.name).mkString(", ")})")
        w.partitionBy(partCols.map(_.name): _*).parquet(s"$dir/$dataDir")
        val staged = GraftLakePartitions.stagedEntries(spark, dir,
          dataDir, partCols.length)
        if (staged.nonEmpty) staged
        else Seq(GraftLakePartitions.seedEmpty(spark, dir, dataDir,
          out.schema, partCols))
      }
    writeSidecarsBatch(spark, dir, entries, statsCols, bloomCol.toSeq)
    publishAll(spark, dir, entries, mode, layoutOnly,
      carrySchema = Some(out.schema))
  }

  // ---- declared index policy (SQL-writer parity) -----------------------
  //
  // Library writers choose their sidecars per commit (commitWithStats /
  // commitWithBloom / commitIndexed). SQL and streaming writers have no
  // such call site, so without a DECLARED policy their data would get
  // numeric range stats only — a `WHERE key = 'x'` point lookup on
  // SQL-inserted data scanned every file while library-indexed data
  // pruned. A lake-level `_index` file (set by the `bloom` table
  // property at CREATE, or [[setBloomIndex]]) names the bloom-indexed
  // column; every SQL/streaming commit path honors it.

  /** Declare `c` as A bloom-indexed column of the lake: every
    * subsequent SQL/streaming commit writes a per-file bloom sidecar
    * over it ([[indexStagedDir]]), so point lookups prune on
    * DML-written data exactly like on [[commitWithBloom]] data. The
    * policy is MULTI-COLUMN — repeated calls (or `'bloom'='a,b'` at
    * CREATE) accumulate, one sidecar section per column, and each
    * point-lookup predicate probes its own column's bloom (two lookup
    * keys on one lake both prune). Existing data dirs are not
    * back-indexed (run [[compactVersions]] with `bloomCol` to index
    * history). */
  def setBloomIndex(spark: SparkSession, dir: String, c: String): Unit =
    setBloomIndexCols(spark, dir,
      (bloomIndexCols(spark, dir) :+ c).distinct)

  /** Replace the declared bloom-column set wholesale — the RENAME
    * COLUMN path re-points the policy at the new name (sidecar aliases
    * keep pre-rename files pruning). */
  private[engine] def setBloomIndexCols(spark: SparkSession, dir: String,
      cols: Seq[String]): Unit = {
    val out = fs(spark, dir).create(new Path(s"$dir/_index"), true)
    try out.write(cols.distinct.map(x => s"bloom\t$x").mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** The declared bloom-index columns, declaration order. One small
    * file read — malformed or missing degrades to empty (no bloom,
    * never an error). */
  def bloomIndexCols(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(s"$dir/_index")
    val f = fs(spark, dir)
    try {
      if (!f.exists(p)) Seq.empty
      else {
        val in = f.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList
        finally in.close()
        lines.map(_.split('\t')).collect {
          case Array("bloom", c) if c.nonEmpty => c
        }.distinct
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** First declared bloom column (legacy single-column view). */
  def bloomIndexCol(spark: SparkSession, dir: String): Option[String] =
    bloomIndexCols(spark, dir).headOption

  /** Sidecar indexing for a freshly-staged SQL/streaming commit dir:
    * min/max range stats for every numeric column (SQL writers have no
    * commitWithStats to opt into, so everything range-skippable is
    * indexed by default) PLUS a bloom over the lake's declared index
    * column when present and in this write's schema — the write-path
    * parity that keeps DML-written and library-written data equally
    * prunable. Stats lift from footers (metadata read per file); the
    * bloom is one narrow read-back aggregation of the staged files. */
  private[engine] def indexStagedDir(spark: SparkSession, dir: String,
      dataDir: String, schema: org.apache.spark.sql.types.StructType,
      declaredBloom: Seq[String] = Seq.empty): Unit = {
    val numericCols = GraftLakeDataSource.numericCols(schema)
    if (numericCols.nonEmpty) writeStatsFor(spark, dir, dataDir, numericCols)
    // declaredBloom covers staged CTAS, whose `_index` file only lands
    // at commitStagedChanges (an aborted CTAS must leave nothing).
    // MULTI-COLUMN: one sidecar carrying every declared column's bloom
    val blooms = (declaredBloom ++ bloomIndexCols(spark, dir))
      .distinct.filter(schema.fieldNames.contains)
    if (blooms.nonEmpty) writeBloomsFor(spark, dir, dataDir, blooms)
  }

  /** [[indexStagedDir]] for a MULTI-ENTRY staged commit (partitioned
    * INSERT, streaming epoch into a partitioned lake): one batched
    * sidecar build for all entries ([[writeSidecarsBatch]]) instead of
    * one driver iteration per partition leaf. */
  private[engine] def indexStagedEntries(spark: SparkSession,
      dir: String, entries: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      declaredBloom: Seq[String] = Seq.empty): Unit =
    writeSidecarsBatch(spark, dir, entries,
      GraftLakeDataSource.numericCols(schema),
      (declaredBloom ++ bloomIndexCols(spark, dir))
        .distinct.filter(schema.fieldNames.contains))

  /** Per-file footer-stats lines (`file \t col \t min \t max \t rows`)
    * — pure function of one parquet footer, safe to evaluate on
    * EXECUTORS (the batched multi-entry path ships it there). */
  private[engine] def statsLinesOfFile(file: Path,
      statsCols: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      import scala.jdk.CollectionConverters._
      val rows = blocks.asScala.map(_.getRowCount).sum
      statsCols.flatMap { c =>
        val stats = blocks.asScala.toSeq.flatMap(_.getColumns.asScala
          .filter(_.getPath.toDotString == c).map(_.getStatistics))
          .filter(s => s != null && !s.isEmpty)
        if (stats.isEmpty) {
          // a ZERO-ROW file gets an explicit empty range (it can
          // never intersect a probe and must not be conservatively
          // rewritten/read); a file with rows but no usable stats
          // gets NO line — conservative on every path
          if (rows == 0L) Some(s"${file.getName}\t$c\tInfinity\t-Infinity\t0")
          else None
        } else {
          def num(v: Any): Double = v match {
            case l: java.lang.Long => l.toDouble
            case i: java.lang.Integer => i.toDouble
            case d: java.lang.Double => d
            case fl: java.lang.Float => fl.toDouble
            case _ => Double.NaN
          }
          val mins = stats.map(s => num(s.genericGetMin))
          val maxs = stats.map(s => num(s.genericGetMax))
          if (mins.exists(_.isNaN)) None // non-numeric: no skipping
          else Some(s"${file.getName}\t$c\t${mins.min}\t${maxs.max}\t$rows")
        }
      }
    } finally reader.close()
  }

  /** Footer-stats pass for one data dir (shared by [[commitWithStats]],
    * [[deleteRange]]'s rewrite, and the DSv2 DML commit — the stats are
    * LIFTED from the parquet footers the write already produced, so
    * indexing costs one metadata read per file, never a data pass): per
    * (file, statsCol) one line `file \t col \t min \t max \t rows`. */
  private[engine] def writeStatsFor(spark: SparkSession, dir: String,
      dataDir: String, statsCols: Seq[String]): Unit = {
    val f = fs(spark, dir)
    val conf = spark.sessionState.newHadoopConf()
    val lines = f.listStatus(new Path(s"$dir/$dataDir")).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .flatMap(file => statsLinesOfFile(file, statsCols, conf))
    val statsOut = f.create(new Path(s"$dir/_stats/$dataDir.stats"), true)
    try statsOut.write(lines.mkString("\n").getBytes("UTF-8"))
    finally statsOut.close()
    ()
  }

  /** BATCHED sidecar build for a multi-entry commit (partitioned
    * INSERT / streaming epoch / OPTIMIZE / z-order): the footer-stats
    * pass runs as ONE distributed job over every (entry, file) pair —
    * not one driver loop iteration per entry — and each bloom column
    * is ONE read over all entries' files, split back per entry by
    * `input_file_name`. A 1,000-partition z-order's sidecar phase is
    * O(1) jobs, not O(partitions) sequential footer walks. Per-entry
    * sidecar FILES still land (the read side probes them by entry),
    * but those are tiny driver-side metadata writes. */
  private[engine] def writeSidecarsBatch(spark: SparkSession,
      dir: String, entries: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String]): Unit = {
    if (entries.isEmpty || (statsCols.isEmpty && bloomCols.isEmpty))
      return
    val f = fs(spark, dir)
    val filesByEntry: Seq[(String, Seq[Path])] = entries.map { e =>
      e -> f.listStatus(new Path(s"$dir/$e")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
    }
    if (statsCols.nonEmpty) {
      val pairs = filesByEntry.flatMap { case (e, fps) =>
        fps.map(p => (e, p.toString)) }
      val grouped: Map[String, Seq[String]] =
        if (pairs.isEmpty) Map.empty
        else if (pairs.length <= 4) {
          // few files: driver-local beats a job's scheduling overhead
          val conf = spark.sessionState.newHadoopConf()
          pairs.groupBy(_._1).map { case (e, ps) =>
            e -> ps.flatMap(p =>
              statsLinesOfFile(new Path(p._2), statsCols, conf))
          }
        } else {
          val sconf = new SerializableHadoopConf(
            spark.sessionState.newHadoopConf())
          val cols = statsCols
          spark.sparkContext
            .parallelize(pairs, math.min(pairs.length,
              spark.sparkContext.defaultParallelism * 2))
            .map { case (e, p) =>
              (e, statsLinesOfFile(new Path(p), cols, sconf.value)) }
            .collect().toSeq
            .groupBy(_._1).map { case (e, xs) =>
              e -> xs.flatMap(_._2).sorted }
        }
      filesByEntry.foreach { case (e, _) =>
        val out = f.create(new Path(s"$dir/_stats/$e.stats"), true)
        try out.write(grouped.getOrElse(e, Seq.empty)
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
      }
    }
    if (bloomCols.nonEmpty) {
      // `input_file_name` reports URL-ENCODED URIs (SparkPath) while
      // entry names are manifest-form (decoded) — derive each file's
      // entry through a qualified-URI lookup built from the listing,
      // never by string surgery on the encoded path (a partition
      // value like `New York` would mismatch forever)
      val entryOfUri: Map[String, String] = filesByEntry.flatMap {
        case (e, fps) =>
          fps.flatMap(p => encodedForms(f, p).map(_ -> e))
      }.toMap
      val nonEmpty = filesByEntry.filter(_._2.nonEmpty).map(_._1)
      val byEntryCol: Map[(String, String), Seq[String]] =
        if (nonEmpty.isEmpty) Map.empty
        else bloomCols.distinct.flatMap { c =>
          bloomLinesGrouped(spark,
            nonEmpty.map(e => s"$dir/$e"), c, entryOfUri)
        }.groupBy(x => (x._1, x._2))
          .map { case (k, xs) => k -> xs.flatMap(_._3) }
      filesByEntry.foreach { case (e, fps) =>
        val names = fps.map(_.getName)
        val lines = bloomCols.distinct.flatMap { c =>
          val have = byEntryCol.getOrElse((e, c), Seq.empty)
          val covered = have.map(_.takeWhile(_ != '\t')).toSet
          // keyless files (zero rows / all-null keys) get the explicit
          // all-zero bitmap — same contract as bloomLinesFor
          have ++ names.filterNot(covered).sorted.map(n =>
            s"$n\t$c\t${"0" * (BloomBits / 4)}")
        }
        val out = f.create(new Path(s"$dir/_bloom/$e.bloom"), true)
        try out.write(lines.mkString("\n").getBytes("UTF-8"))
        finally out.close()
      }
    }
    ()
  }

  /** One distributed pass computing bloom lines for `keyCol` over many
    * entry dirs at once; rows come back tagged (entry, col, lines). */
  private def bloomLinesGrouped(spark: SparkSession, paths: Seq[String],
      keyCol: String, entryOfUri: Map[String, String])
      : Seq[(String, String, Seq[String])] = {
    import org.apache.spark.sql.functions.{array, col, collect_set,
      explode, input_file_name, sort_array}
    val pos = spark.read.option("mergeSchema", "true")
      .parquet(paths: _*)
      .filter(col(keyCol).isNotNull)
      .select(input_file_name().as("f"),
        col(keyCol).cast("string").as("kv"))
      .select(col("f"), explode(array((0 until BloomHashes).map(j =>
        bloomPos(col("kv"), j, BloomBits)): _*)).as("p"))
      .groupBy(col("f"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .collect() // bounded: one row per file, ≤ m positions each
    pos.toSeq.map { r =>
      val full = r.getString(0)
      val line = {
        val bits = new java.util.BitSet(BloomBits)
        r.getSeq[Int](1).foreach(bits.set)
        val arr = java.util.Arrays.copyOf(bits.toByteArray, BloomBits / 8)
        s"${new Path(full).getName}\t$keyCol\t${arr
          .map("%02x".format(_)).mkString}"
      }
      (entryOfUri.getOrElse(full,
        throw new IllegalStateException(
          s"bloom batch read an unlisted file: $full")),
        keyCol, Seq(line))
    }.groupBy(x => (x._1, x._2)).toSeq.map { case ((e, c), xs) =>
      (e, c, xs.flatMap(_._3).sorted)
    }
  }

  /** Stats lines of one data dir for column `c`, as
    * file → (min, max, rows); empty map if the dir has no stats file.
    * Sidecars are an OPTIMIZATION, never a correctness gate, so a
    * malformed line (torn write, bit rot) is DROPPED rather than
    * thrown: the file it described simply loses its range and is
    * always read — a corrupt 1 KiB sidecar must not brick every read
    * of an otherwise-healthy version. */
  private def statsFor(spark: SparkSession, dir: String, d: String,
      c: String): Map[String, (Double, Double, Long)] = {
    val f = fs(spark, dir)
    val p = new Path(s"$dir/_stats/$d.stats")
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.split('\t')).filter(a => a.length == 5 && a(1) == c)
        .flatMap(a => scala.util.Try(
          a(0) -> ((a(2).toDouble, a(3).toDouble, a(4).toLong))).toOption)
        .toMap
      finally in.close()
    }
  }

  /** [[statsFor]] merged across every name `c`'s field id has had in
    * the current mapping era: stats lines are keyed by each FILE's own
    * column name, so on a COLUMN-MAPPING lake a pre-rename file's
    * range lives under the OLD name — a name-only lookup would miss it
    * and silently demote the dir to the scan path (or, worse, leave a
    * metadata fold that ignores the pre-rename files). `names` is the
    * alias set computed ONCE per operation ([[GraftLakeMapping
    * .aliases]]); unmapped callers pass Seq(c). Per-file names are
    * unique within a sidecar, so the merge cannot collide. */
  private def statsForNames(spark: SparkSession, dir: String, d: String,
      names: Seq[String]): Map[String, (Double, Double, Long)] =
    names.map(statsFor(spark, dir, d, _)).reduce(_ ++ _)

  /** Every name `c`'s field id has had in the current mapping era
    * (Seq(c) on unmapped lakes) — compute ONCE per operation and
    * thread through the sidecar lookups; per-dir registry reads would
    * be O(dirs) metadata RPCs. */
  private def aliasNamesOf(spark: SparkSession, dir: String,
      c: String): Seq[String] =
    if (!GraftLakeMapping.enabled(spark, dir)) Seq(c)
    else GraftLakeMapping.aliases(spark, dir).getOrElse(c, Seq(c))

  /** Read a specific FILE subset of the lake, BY FIELD ID when the
    * lake is column-mapped: a name-matched read nulls renamed columns
    * out of pre-rename files, which silently drops their rows past any
    * later filter (or skews a min/max) — the library probes' analogue
    * of the survivorReader discipline. Data columns only (these are
    * leaf files; partition values live in dir names). Returns the
    * session the read plans against so DV application joins on it. */
  private def readFilesIdMatched(spark: SparkSession, dir: String,
      tipV: Int, files: Seq[String]): (SparkSession, DataFrame) =
    if (!GraftLakeMapping.enabled(spark, dir))
      (spark, spark.read.option("mergeSchema", "true").parquet(files: _*))
    else {
      val partCols = GraftLakePartitions.of(spark, dir)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      val declared = manifestSchema(spark, dir, tipV).map(sch =>
        org.apache.spark.sql.types.StructType(sch.filterNot(fl =>
          partCols.exists(_.name.equalsIgnoreCase(fl.name)))))
      (s2, declared.fold(
        s2.read.option("mergeSchema", "true"))(sch =>
        s2.read.schema(sch)).parquet(files: _*))
    }

  /** Metadata-only count/min/max over the latest snapshot — the
    * `SELECT count(*), min(c), max(c)` a log-structured lake answers
    * from its stats without touching a data byte. Dirs whose stats
    * cover every part file contribute from METADATA (sum of row
    * counts, min of mins, max of maxs); dirs without full coverage
    * fall back to one aggregated scan, and the two halves combine —
    * so the answer is always exact and the data read is proportional
    * to the UNstatsed fraction only.
    *
    * DV lakes: a file carrying a LIVE deletion vector has footer/
    * sidecar stats that over-count its deleted rows (and a min/max a
    * vector may have hollowed out), so EXACTLY those files move from
    * the metadata fold to the scan — which applies the vectors
    * ([[dropDvRows]]). After a point delete the read cost is
    * O(vectored files), never O(lake); the clean fraction still
    * answers from metadata. Returns (rows, min, max); min/max are NaN
    * for an empty snapshot. */
  def statsAggregate(spark: SparkSession, dir: String, c: String)
      : (Long, Double, Double) = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val f = fs(spark, dir)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    val tipV = vs.last
    val snapshot = readManifest(spark, dir, tipV)
    // COLUMN-MAPPING lakes: stats lines are keyed by each file's OWN
    // column name — fold under every name `c`'s id has had (computed
    // once), and read the scan fraction BY FIELD ID (a name-matched
    // read would null `c` out of pre-rename files and silently skew
    // min/max)
    val cNames = aliasNamesOf(spark, dir, c)
    // files carrying LIVE vectors, per entry — O(DV files) metadata
    val dvLive: Map[String, Set[String]] =
      if (!dvEnabled(spark, dir)) Map.empty
      else {
        val live = snapshot.toSet
        dvRefs(spark, dir, tipV).values.toSeq
          .filter(r => live(r.entry)).groupBy(_.entry)
          .map { case (e, rs) => e -> rs.map(_.file).toSet }
      }
    def vecOf(d: String): Set[String] =
      dvLive.getOrElse(d, Set.empty)
    val (meta, scan) = snapshot.partition { d =>
      val stats = statsForNames(spark, dir, d, cNames)
      val files = f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      files.nonEmpty && files.forall(stats.contains)
    }
    val fromMeta = meta.flatMap(d => statsForNames(spark, dir, d, cNames)
      .collect { case (fn, s) if !vecOf(d)(fn) => s })
    val scanPaths = scan.map(d => s"$dir/$d") ++
      meta.flatMap(d => vecOf(d).toSeq.sorted.map(fn => s"$dir/$d/$fn"))
    val scanAgg =
      if (scanPaths.isEmpty) None
      else {
        val (prs, base) = readFilesIdMatched(spark, dir, tipV, scanPaths)
        val applied =
          if (dvLive.isEmpty) base
          else dropDvRows(prs, dir, base, tipV)
        Some(applied
          .agg(count(lit(1)), min(col(c).cast("double")),
            max(col(c).cast("double")))
          .head())
      }
    val rows = fromMeta.map(_._3).sum + scanAgg.map(_.getLong(0)).getOrElse(0L)
    val nonEmpty = fromMeta.filter(_._3 > 0) // empty files carry (∞, −∞)
    val mins = nonEmpty.map(_._1) ++
      scanAgg.filter(!_.isNullAt(1)).map(_.getDouble(1))
    val maxs = nonEmpty.map(_._2) ++
      scanAgg.filter(!_.isNullAt(2)).map(_.getDouble(2))
    if (mins.isEmpty) (rows, Double.NaN, Double.NaN)
    else (rows, mins.min, maxs.max)
  }

  /** True iff every part file of the latest snapshot has recorded
    * stats for `c` — i.e. [[statsAggregate]] will answer from pure
    * metadata with zero data scan. Production builders require this as
    * evidence; it is never a correctness precondition. */
  def statsCovered(spark: SparkSession, dir: String, c: String): Boolean = {
    val f = fs(spark, dir)
    // a LIVE vector forces its files onto the scan path (their stats
    // over-count deleted rows); materialized/vector-free DV lakes are
    // metadata-served like any other
    if (dvEnabled(spark, dir) && tip(spark, dir).exists(t =>
        liveDvKeys(spark, dir, t).nonEmpty)) return false
    // alias-merged on mapped lakes: pre-rename files' stats live under
    // their own era's name and still count as coverage
    val cNames = aliasNamesOf(spark, dir, c)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    vs.nonEmpty && readManifest(spark, dir, vs.last).forall { d =>
      val stats = statsForNames(spark, dir, d, cNames)
      f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .forall(p => stats.contains(p.getName))
    }
  }

  /** Targeted delete as a commit (the right-to-be-forgotten shape):
    * remove every row with `c` in [lo, hi] by REWRITING ONLY the data
    * dirs whose stats intersect the range — untouched dirs carry
    * forward by reference, so the blast radius is the intersecting
    * fraction, not the lake (at 100 TB the difference between a
    * surgical rewrite and a full-table pass). Dirs without stats are
    * conservatively rewritten. The rewrite lands as ONE new stats-
    * carrying data dir and the next manifest references
    * untouched ∪ rewrite — published through the same CAS as every
    * commit, CONFLICT-CHECKED: a concurrent APPEND that wins the CAS
    * race is re-read and carried forward by the retry, while a
    * concurrent rewrite of a touched dir (another delete, a
    * compaction) fails the publish loudly instead of resurrecting its
    * removed rows. Returns the new version, or the current one if
    * nothing intersects (no-op, no new version). */
  /** Of `dirs`, those the stats sidecars CANNOT clear of [lo, hi] on
    * `c` — conservative: a dir with no stats, a file with no recorded
    * range, or an empty dir all count as intersecting. Driver-side
    * metadata only; shared by [[deleteRange]] and the DSv2
    * overwrite-by-filter commit ([[GraftLakeWrite]]). */
  private[engine] def dirsIntersecting(spark: SparkSession, dir: String,
      dirs: Seq[String], c: String, lo: Double, hi: Double): Seq[String] = {
    val f = fs(spark, dir)
    dirs.filter { d =>
      val stats = statsFor(spark, dir, d, c)
      val files = f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      files.isEmpty ||
        files.exists(n => stats.get(n)
          .forall { case (mn, mx, _) => mx >= lo && mn <= hi })
    }
  }

  /** Survivor-rewrite read seam, shared by [[deleteRange]] /
    * [[replaceWhereIn]] / [[compactFullSnapshot]]: on a COLUMN-MAPPING
    * lake the entries read BY FIELD ID through a derived session with
    * the declared schema (a name-matched read would null renamed
    * columns out of pre-rename files, and the rewrite would bake the
    * nulls in), and on a DV lake rows earlier vectors deleted are
    * dropped (carrying them would resurrect deletes; the rewrite
    * materializes the touched entries' vectors). Returns the session
    * the read plans against (field-id conf scoped to it) and the
    * entry-set reader. */
  private def survivorReader(spark: SparkSession, dir: String,
      tipV: Int): (SparkSession, Seq[String] => DataFrame) = {
    val partCols = GraftLakePartitions.of(spark, dir)
    val dvAt = if (dvEnabled(spark, dir)) Some(tipV) else None
    if (!GraftLakeMapping.enabled(spark, dir)) {
      (spark, es => {
        val base = spark.read.option("mergeSchema", "true")
          .parquet(es.map(e => s"$dir/$e"): _*)
        dvAt.fold(base)(v => dropDvRows(spark, dir, base, v))
      })
    } else {
      val declared = manifestSchema(spark, dir, tipV)
        .map(s => org.apache.spark.sql.types.StructType(s.filterNot(fl =>
          partCols.exists(_.name.equalsIgnoreCase(fl.name)))))
        .getOrElse(throw new IllegalStateException(
          s"column-mapping lake $dir has no declared schema at its " +
            "tip — cannot id-match the survivor read"))
      // derived session: the path-based read re-sets fieldId options
      // from SQLConf, and mutating the caller's session would flip
      // concurrent queries to id-matched reads (compactSmall pattern)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      (s2, es => {
        val base = s2.read.schema(declared)
          .parquet(es.map(e => s"$dir/$e"): _*)
        dvAt.fold(base)(v => dropDvRows(s2, dir, base, v))
      })
    }
  }

  def deleteRange(spark: SparkSession, dir: String, c: String,
      lo: Double, hi: Double, statsCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.col
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    val tipV = vs.last
    val live = readManifest(spark, dir, tipV)
    val partCols = GraftLakePartitions.of(spark, dir)
    val dv = dvEnabled(spark, dir)
    val touched = dirsIntersecting(spark, dir, live, c, lo, hi)
    if (touched.isEmpty) return tipV
    require(!partCols.exists(_.name.equalsIgnoreCase(c)) ||
      partCols.isEmpty,
      s"deleteRange on partition column '$c' — use the SQL partition " +
        "DELETE (manifest-only) instead of a survivor rewrite")
    val (rss, readEs) = survivorReader(spark, dir, tipV)
    // NULL-keyed rows are OUTSIDE any range — they must survive, and
    // a bare !(range) would drop them (three-valued logic: !(NULL) is
    // NULL, and Filter discards NULL). readSkipping has the matching
    // property: a NULL never matches a probe but is never destroyed.
    def keep(df: DataFrame): DataFrame =
      df.filter(col(c).isNull || !(col(c) >= lo && col(c) <= hi))
    // Min/max ranges cannot see a HOLE a previous delete left, so a
    // repeated delete would re-rewrite the same dirs forever. When
    // the touched dirs' stats record their exact row counts, one
    // count of the survivors proves the delete removes nothing —
    // no-op without a commit. On a DV lake the expected count nets
    // out the touched files' LIVE vectored positions (footer counts
    // include them; the survivor read does not).
    val touchedRows = touched.map(d =>
      statsFor(spark, dir, d, c).values.map(_._3).sum)
    val countsKnown = touched.forall { d =>
      val stats = statsFor(spark, dir, d, c)
      fs(spark, dir).listStatus(new Path(s"$dir/$d")).toSeq
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .forall(p => stats.contains(p.getName))
    }
    val dvPending =
      if (!dv) 0L
      else {
        val ts = touched.toSet
        // exact by protocol: a DV delete anti-joins every earlier
        // vector before publishing, so no (entry, file, pos) repeats
        // across sidecars and the ref counts sum to live positions
        dvRefs(spark, dir, tipV).collect {
          case (k, r) if ts(k.substring(0, k.lastIndexOf('/'))) =>
            r.count
        }.sum
      }
    val survivorsAll = keep(readEs(touched))
    if (countsKnown &&
        survivorsAll.count() == touchedRows.sum - dvPending)
      return tipV
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val blooms = bloomIndexCols(spark, dir)
    val newEntries: Seq[String] =
      if (partCols.isEmpty) {
        survivorsAll.write.parquet(s"$dir/$dataDir")
        Seq(dataDir)
      } else {
        // partitioned: survivors rewrite WITHIN their own partition
        // leaves (rows never cross a boundary — the entries-are-
        // partition-leaves invariant holds by construction)
        touched.groupBy(_.split('/').drop(1).mkString("/")).toSeq
          .sortBy(_._1).map { case (suffix, es) =>
            keep(readEs(es)).write.parquet(s"$dir/$dataDir/$suffix")
            s"$dataDir/$suffix"
          }
      }
    // the survivor dir absorbs rows from bloom-indexed dirs: honor
    // the lake's declared policy or point lookups stop pruning
    // over the rewritten fraction (same parity as indexStagedDir)
    writeSidecarsBatch(spark, dir, newEntries, statsCols,
      blooms.filter(survivorsAll.columns.contains))
    // checked: a concurrent rewrite of a touched dir (another
    // delete, a compaction) is refused loudly — publishing would
    // resurrect its removed rows, since they are baked into this
    // survivor set. Concurrent APPENDS still absorb via the CAS
    // retry (they are not in `dropped`). On a DV lake a vector
    // landing after the survivor scan refuses too (noDvSince).
    val v = publishReplacing(spark, dir, touched.toSet, newEntries,
      checked = true, noDvSince = if (dv) Some(tipV) else None)
    // opt-in row-level CDF: the deleted rows ARE the net diff of
    // touched-vs-survivors (survivors cancel) — persist them so
    // feeds deliver O(deleted rows), not the whole touched band
    if (cdfEnabled(spark, dir))
      writeChangeSidecar(spark, dir, v,
        cowChangeRows(spark, dir, touched, newEntries, "DELETE"))
    val _ = rss // scoped field-id session lives for the rewrite only
    v
  }

  /** Targeted partition overwrite — Delta's `replaceWhere` for an
    * integer partition key: replace every live row with `c ∈ values` by
    * `replacement`, rewriting ONLY the data dirs whose file stats
    * intersect some value; every other dir carries forward BY REFERENCE
    * in the next manifest (the [[deleteRange]] machinery, generalized
    * from a range predicate to a value set). This is the write half of
    * incremental backfill: recompute the affected partitions, swap them
    * in, leave the rest untouched.
    *
    * NULL-keyed rows are outside every value set and survive
    * (three-valued-logic convention shared with [[deleteRange]] /
    * [[readSkipping]]). Dirs without stats are conservatively touched.
    * Returns the committed version (the current tip when `values` is
    * empty and `replacement` must also be empty by contract). */
  def replaceWhereIn(spark: SparkSession, dir: String, c: String,
      values: Seq[Long], replacement: DataFrame,
      statsCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    val tipV = vs.last
    if (values.isEmpty) return tipV
    val partCols = GraftLakePartitions.of(spark, dir)
    val dv = dvEnabled(spark, dir)
    require(!partCols.exists(_.name.equalsIgnoreCase(c)),
      s"replaceWhereIn on partition column '$c' — use SQL INSERT " +
        "OVERWRITE with a partition predicate (manifest-only swap)")
    def intersects(d: String): Boolean = {
      val stats = statsFor(spark, dir, d, c)
      val files = f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      files.isEmpty ||
        files.exists(n => stats.get(n)
          .forall { case (mn, mx, _) => values.exists(v => v >= mn && v <= mx) })
    }
    val touched = readManifest(spark, dir, tipV).filter(intersects)
    val (rss, readEs) = survivorReader(spark, dir, tipV)
    def keep(df: DataFrame): DataFrame =
      df.filter(col(c).isNull || !col(c).isin(values: _*))
    val repl = withMappedIds(replacement, dir)
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val newEntries: Seq[String] =
      if (partCols.isEmpty) {
        val survivors =
          if (touched.isEmpty) repl.limit(0)
          else keep(readEs(touched))
        survivors.unionByName(repl, allowMissingColumns = true)
          .write.parquet(s"$dir/$dataDir")
        Seq(dataDir)
      } else {
        // survivors rewrite within their own leaves; the replacement
        // routes through the dynamic-partition writer (it must carry
        // the partition columns)
        require(partCols.forall(pc =>
          repl.columns.exists(_.equalsIgnoreCase(pc.name))),
          "replacement frame lacks the lake's partition columns " +
            s"(${partCols.map(_.name).mkString(", ")})")
        touched.groupBy(_.split('/').drop(1).mkString("/")).toSeq
          .sortBy(_._1).foreach { case (suffix, es) =>
            keep(readEs(es)).write.mode("append")
              .parquet(s"$dir/$dataDir/$suffix")
          }
        repl.write.partitionBy(partCols.map(_.name): _*)
          .mode("append").parquet(s"$dir/$dataDir")
        val staged = GraftLakePartitions.stagedEntries(spark, dir,
          dataDir, partCols.length)
        if (staged.nonEmpty) staged
        else Seq(GraftLakePartitions.seedEmpty(spark, dir, dataDir,
          repl.schema, partCols))
      }
    // declared bloom policy carries through the partition swap, like
    // deleteRange and every DML commit path
    writeSidecarsBatch(spark, dir, newEntries, statsCols,
      bloomIndexCols(spark, dir).filter(n =>
        repl.columns.contains(n) && !partCols.exists(
          _.name.equalsIgnoreCase(n))))
    // checked for the same reason as deleteRange: survivors of the
    // touched dirs are baked into the new dir, so a concurrent rewrite
    // of one of them must fail the publish, not resurrect rows; a DV
    // commit landing after the survivor scan refuses too
    val v = publishReplacing(spark, dir, touched.toSet, newEntries,
      checked = true, noDvSince = if (dv) Some(tipV) else None)
    val _ = rss
    v
  }

  /** CAS publish of `live(tip) \ dropped :+ added` — the delete/rewrite
    * pointer swap. A lost race re-reads the new tip, so appends that
    * landed meanwhile are preserved (they are not in `dropped`). */
  /** Manifest dir names of a version — the replacement units the COW
    * row-level write coordinates on ([[GraftLakeRowLevelOperation]]). */
  private[graft] def manifestEntries(spark: SparkSession, dir: String,
      v: Int): Seq[String] = readManifest(spark, dir, v)

  /** Parquet data files the TIP manifest references — the read tax a
    * scan pays per query, and the number maintenance must bound (the
    * MoR churn tail grows by one per small row-level commit). Shared
    * by the maintenance spec and the MorMaintScale measurement so the
    * two cannot drift on what "live" means. */
  private[graft] def liveDataFileCount(spark: SparkSession,
      dir: String): Int = {
    val f = fs(spark, dir)
    manifestEntries(spark, dir, tip(spark, dir).get).map(e =>
      f.listStatus(new Path(s"$dir/$e"))
        .count(_.getPath.getName.endsWith(".parquet"))).sum
  }

  /** [[publishReplacing]] with a SERIALIZABLE conflict check for the
    * copy-on-write row-level writes, which computed their result from
    * a SCAN that already happened and cannot recompute. Two races are
    * refused (loudly), not absorbed:
    *
    *  - a dir this commit replaces left the tip — a concurrent
    *    compaction/delete/merge rewrote it, and its rows are baked
    *    into `added`, so publishing would duplicate or resurrect them;
    *  - a dir appeared in the tip that the operation's snapshot never
    *    saw — a concurrent append may contain rows MATCHING the
    *    operation's condition (a key a MERGE just inserted, a row an
    *    UPDATE/DELETE should have touched), and publishing would leave
    *    duplicates or ghosts the operation's semantics exclude. The
    *    sidecars cannot prove the append disjoint in general, so this
    *    is strict serializable (Delta/Iceberg's COW validation makes
    *    the same call); the caller retries against the new snapshot.
    *
    * The lenient variant stays correct for its callers (deleteRange /
    * backfill recompute `dropped` from the tip inside their own
    * loop). */
  private[engine] def publishReplacingChecked(spark: SparkSession,
      dir: String, dropped: Set[String], added: String,
      snapshot: Set[String], schemaDdl: Option[String] = None,
      noDvSince: Option[Int] = None): Int =
    publishReplacing(spark, dir, dropped, Seq(added), checked = true,
      snapshot = Some(snapshot), schemaDdl = schemaDdl,
      noDvSince = noDvSince)

  /** Multi-entry checked replace — a partitioned COW/replaceWhere drops
    * and adds PARTITION entries; `added` may be empty (whole-partition
    * DELETE: the drop is the entire commit, manifest-only). */
  private[engine] def publishReplacingCheckedAll(spark: SparkSession,
      dir: String, dropped: Set[String], added: Seq[String],
      snapshot: Set[String], schemaDdl: Option[String] = None,
      noDvSince: Option[Int] = None): Int =
    publishReplacing(spark, dir, dropped, added, checked = true,
      snapshot = Some(snapshot), schemaDdl = schemaDdl,
      noDvSince = noDvSince)

  /** Test seam: [[deleteRange]]'s publish step with an externally-
    * staged survivor dir — lets a spec interleave a competing rewrite
    * between the scan and the publish to pin the conflict refusal. */
  private[graft] def deleteRangePublishForTest(spark: SparkSession,
      dir: String, dropped: Set[String], added: String): Int =
    publishReplacing(spark, dir, dropped, Seq(added), checked = true)

  private def publishReplacing(spark: SparkSession, dir: String,
      dropped: Set[String], added: Seq[String],
      checked: Boolean = false,
      snapshot: Option[Set[String]] = None,
      layoutOnly: Boolean = false,
      schemaDdl: Option[String] = None,
      noDvSince: Option[Int] = None): Int = {
    val f = fs(spark, dir)
    var committed = -1
    while (committed < 0) {
      val prevTip = tip(spark, dir)
      // a DELETION VECTOR published on the dropped dirs after this
      // rewrite SCANNED them would be silently undone (the rewrite
      // carried the deleted rows as survivors) — refuse loudly, the
      // same serializable posture as the dropped-dir check below
      noDvSince.foreach { v0 =>
        ((v0 + 1) to prevTip.getOrElse(0)).foreach { k =>
          if (isDvCommit(spark, dir, k))
            throw new java.util.ConcurrentModificationException(
              s"copy-on-write conflict on $dir: deletion-vector " +
                s"commit v$k landed after this rewrite's scan (its " +
                "deletes would be resurrected); retry against the " +
                "new snapshot")
        }
      }
      val next = prevTip.getOrElse(0) + 1
      val tip0 = prevTip.fold(Seq.empty[String])(
        readManifest(spark, dir, _))
      // the conflict check lives INSIDE the CAS loop: every retry
      // re-reads the tip it is about to replace, so a dir rewritten
      // (or appended) between attempts is caught too
      if (checked) {
        val gone = dropped.diff(tip0.toSet)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"copy-on-write conflict on $dir: dirs " +
              s"${gone.mkString(", ")} were rewritten by a concurrent " +
              "commit after this operation scanned them; retry against " +
              "the new snapshot")
        // the append check only applies to ROW-LEVEL ops (which pass
        // their snapshot): a concurrent append may hold rows matching
        // their condition. Compaction-style callers omit it — an
        // appended dir they never read is simply carried forward.
        snapshot.foreach { snap =>
          val fresh = tip0.toSet.diff(snap)
          if (fresh.nonEmpty)
            throw new java.util.ConcurrentModificationException(
              s"copy-on-write conflict on $dir: dirs " +
                s"${fresh.mkString(", ")} were appended by a concurrent " +
                "commit after this operation's snapshot — they may hold " +
                "rows matching the operation's condition; retry against " +
                "the new snapshot")
        }
      }
      val live = tip0.filterNot(dropped) ++ added
      // callers that don't declare (library compaction, deleteRange)
      // CARRY the tip's declaration forward: their rewrites preserve
      // or shrink rows, never columns — without this every OPTIMIZE
      // would knock a declared lake back to O(live files) footer
      // inference on its next cold plan
      val declared = schemaDdl.orElse(
        prevTip.flatMap(manifestSchema(spark, dir, _)).map(_.json))
      val bytes =
        if (prevTip.isEmpty || next % CheckpointInterval == 0)
          manifestBytes(live, layoutOnly, declared)
        else deltaBytes(added, tip0.filter(dropped), layoutOnly, declared)
      try {
        val out = f.create(manifestPath(dir, next), false)
        try out.write(bytes)
        finally out.close()
        committed = next
      } catch {
        case e: java.io.IOException =>
          if (!f.exists(manifestPath(dir, next))) throw e
      }
    }
    writeTipHint(f, dir, committed)
    committed
  }

  /** Range probe served through the file-level stats: of the latest
    * snapshot's part files, read ONLY those whose recorded [min, max]
    * for `c` intersects [lo, hi] (files from dirs without stats are
    * always read — skipping is an optimization, never a correctness
    * gate, and the row filter is applied regardless). The pruning
    * decision is driver-side metadata only. */
  def readSkipping(spark: SparkSession, dir: String, c: String,
      lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    // alias-fold on mapped lakes (pre-rename files' ranges live under
    // their own era's name); the admitted files then read BY FIELD ID
    // — a name-matched read would null `c` out of pre-rename files and
    // the range filter would silently drop their rows
    val cNames = aliasNamesOf(spark, dir, c)
    val files = readManifest(spark, dir, vs.last).flatMap { d =>
      val all = f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      val ranges = statsForNames(spark, dir, d, cNames)
      if (ranges.isEmpty) all
      else
        // a file with no recorded range for c cannot be skipped
        all.filter(p => ranges.get(p.getName)
          .forall { case (mn, mx, _) => mx >= lo && mn <= hi })
    }
    val snap =
      if (files.isEmpty) readAt(spark, dir, vs.last).limit(0)
      // deletion vectors apply to the raw file scan (identity when
      // none are live) — skipping loses no vectors: a skipped file's
      // positions cover rows the range filter would drop anyway
      else {
        val (prs, base) = readFilesIdMatched(spark, dir, vs.last,
          files.map(_.toString))
        dropDvRows(prs, dir, base, vs.last)
      }
    snap.filter(col(c) >= lo && col(c) <= hi)
  }

  // ---- bloom file-skipping index ---------------------------------------

  /** Bloom geometry: m bits (1 KiB) per file and k probe positions —
    * ~1% false-positive rate at ~850 distinct keys per file; a false
    * positive only costs one needless file read, never correctness. */
  val BloomBits: Int = 8192
  val BloomHashes: Int = 6

  /** The j-th bloom position of a key — first 8 md5 hex chars of
    * `<key>#<j>` as an unsigned int, mod m. Declarative builtins on
    * the commit side; [[bloomPosLocal]] is the byte-identical probe
    * side (the md5 of the same UTF-8 bytes). */
  private def bloomPos(key: org.apache.spark.sql.Column, j: Int,
      m: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat, conv, lit, md5, substring}
    (conv(substring(md5(concat(key, lit(s"#$j")).cast("binary")), 1, 8),
      16, 10).cast("long") % m).cast("int")
  }

  private def bloomPosLocal(key: String, j: Int, m: Int): Int = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key#$j".getBytes("UTF-8"))
    ((((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)) % m).toInt
  }

  /** Commit `df` recording a PER-FILE Bloom filter over `keyCol` — the
    * equality-probe complement of [[commitWithStats]]'s min/max ranges:
    * ranges skip files for *range* predicates on clustered columns, but
    * a point lookup on a high-cardinality unclustered key (doc id, user
    * id — the right-to-access/debug probe shape) intersects every
    * range, while a 1 KiB bloom per file prunes to the files that might
    * actually hold the key. The bit positions come from ONE narrow
    * read-back aggregation of the just-written files (distinct
    * positions per file — output bounded by files × m bits, the audited
    * driver-boundary class, 1 KiB of hex per file in the manifest
    * sidecar). Files are the skipping grain for the same reason as
    * [[commitWithStats]]: the manifest is driver-side metadata. */
  def commitWithBloom(df: DataFrame, dir: String, keyCol: String,
      mode: String = "append", codec: String = "snappy"): Int =
    commitIndexed(df, dir, Seq.empty, Some(keyCol), mode, codec)

  /** Bloom sidecar pass for one data dir: the bit positions fold into
    * ONE position set per file EXECUTOR-side (groupBy file + distinct
    * positions), so the driver collects exactly one row per part file
    * (≤ m ints each), matching [[writeStatsFor]]'s one-line-per-file
    * boundary — never the raw (file, position) pairs, which on a
    * many-thousand-file commit would be orders of magnitude more
    * driver memory than the 1 KiB/file sidecar produced. */
  private def writeBloomFor(spark: SparkSession, dir: String,
      dataDir: String, keyCol: String): Unit =
    writeBloomsFor(spark, dir, dataDir, Seq(keyCol))

  /** Bloom sidecar for one data dir over SEVERAL key columns: one
    * section of lines per column in the SAME sidecar file (lines carry
    * the column name; readers filter), so a multi-column policy never
    * overwrites one column's index with another's. */
  private[engine] def writeBloomsFor(spark: SparkSession, dir: String,
      dataDir: String, keyCols: Seq[String]): Unit = {
    val lines = keyCols.distinct.flatMap(c =>
      bloomLinesFor(spark, dir, dataDir, c))
    val out = fs(spark, dir)
      .create(new Path(s"$dir/_bloom/$dataDir.bloom"), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    ()
  }

  private def bloomLinesFor(spark: SparkSession, dir: String,
      dataDir: String, keyCol: String): Seq[String] = {
    import org.apache.spark.sql.functions.{array, col, collect_set,
      explode, input_file_name, sort_array}
    val pos = spark.read.parquet(s"$dir/$dataDir")
      // NULL keys carry no bloom membership (a point probe is an
      // equality, which a NULL never satisfies); without the filter a
      // null md5 position would NPE the driver-side bitset fold
      .filter(col(keyCol).isNotNull)
      .select(input_file_name().as("f"),
        col(keyCol).cast("string").as("kv"))
      .select(col("f"), explode(array((0 until BloomHashes).map(j =>
        bloomPos(col("kv"), j, BloomBits)): _*)).as("p"))
      .groupBy(col("f"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .collect() // bounded: one row per file, ≤ m positions each
    val f = fs(spark, dir)
    val withKeys = pos.toSeq
      .map(r => new Path(r.getString(0)).getName -> r.getSeq[Int](1))
    // part files that contributed NO positions (zero rows, or all-null
    // keys) get an explicit all-zero bitmap: they can never satisfy a
    // point probe and must prune, where a MISSING line would admit
    // them forever — the analogue of writeStatsFor's explicit empty
    // range for zero-row files
    val covered = withKeys.map(_._1).toSet
    val keyless = f.listStatus(new Path(s"$dir/$dataDir")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .filterNot(covered).map(_ -> Seq.empty[Int])
    (withKeys ++ keyless)
      .sortBy(_._1)
      .map { case (name, ps) =>
        val bits = new java.util.BitSet(BloomBits)
        ps.foreach(bits.set)
        // FIXED-length bitmap (BitSet.toByteArray trims trailing zero
        // bytes): with padding, a truncated sidecar line has the wrong
        // length and is dropped by the reader — degrade to reading the
        // file — where a trimmed format would misread truncation as a
        // legitimately sparse bloom and silently skip matching files
        val full = java.util.Arrays.copyOf(bits.toByteArray, BloomBits / 8)
        val hex = full.map("%02x".format(_)).mkString
        s"$name\t$keyCol\t$hex"
      }
  }

  /** Bloom lines of one data dir for `c`: file → BitSet. Malformed
    * lines are dropped, not thrown — same degrade-to-read contract as
    * [[statsFor]] (a file without a parseable bloom is always read). */
  private def bloomFor(spark: SparkSession, dir: String, d: String,
      c: String): Map[String, java.util.BitSet] = {
    val f = fs(spark, dir)
    val p = new Path(s"$dir/_bloom/$d.bloom")
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.split('\t')).filter(a => a.length == 3 && a(1) == c)
        .flatMap { a =>
          scala.util.Try {
            // exact-length contract (see writeBloomFor): anything else
            // is a torn line, and a wrong-length bitmap must degrade
            // to reading the file, never to a false skip
            require(a(2).length == BloomBits / 4, "torn bloom line")
            val bytes = a(2).sliding(2, 2)
              .map(Integer.parseInt(_, 16).toByte).toArray
            a(0) -> java.util.BitSet.valueOf(bytes)
          }.toOption
        }.toMap
      finally in.close()
    }
  }

  /** Point-lookup over the latest snapshot reading ONLY files whose
    * bloom may contain `value` (files without a recorded bloom are
    * conservatively read — optimization, never a correctness gate).
    * The file decision is driver-side metadata; the returned frame
    * still applies the exact TYPED equality filter (`lit(value)`, not
    * a string-cast comparison — the predicate must reach the parquet
    * reader as a PushedFilter so row-group stats prune WITHIN the
    * files the bloom admitted), so a bloom false positive costs IO,
    * not wrong rows. `inputFiles` on the result is the skipping
    * evidence, as with [[readSkipping]]. Bloom membership hashes the
    * value's STRING rendering — pass the same type the column holds
    * (a Long for a bigint key), whose `toString` matches the commit
    * side's `cast("string")`. */
  def readBloomProbe(spark: SparkSession, dir: String, c: String,
      value: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val f = fs(spark, dir)
    val vs = tip(spark, dir).toSeq // O(1+lag) newest-version resolution
    require(vs.nonEmpty, s"no versions published at $dir")
    val want = (0 until BloomHashes)
      .map(bloomPosLocal(value.toString, _, BloomBits))
    // alias-fold + id-matched read, as readSkipping: a pre-rename
    // file's bloom lives under its own era's name, and its rows must
    // bind `c` by field id or the equality filter silently drops them
    val cNames = aliasNamesOf(spark, dir, c)
    val files = readManifest(spark, dir, vs.last).flatMap { d =>
      val all = f.listStatus(new Path(s"$dir/$d")).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      val blooms = cNames.map(bloomFor(spark, dir, d, _))
        .reduce(_ ++ _)
      if (blooms.isEmpty) all
      else all.filter(p => blooms.get(p.getName)
        .forall(b => want.forall(b.get)))
    }
    val snap =
      if (files.isEmpty)
        // empty WITHOUT referencing any file, so `inputFiles` honestly
        // reports the zero reads the bloom decided on
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          readAt(spark, dir, vs.last).schema)
      // deletion vectors apply to the probe scan too (identity when
      // none are live) — a bloom admit of a vectored row must not
      // resurrect it
      else {
        val (prs, base) = readFilesIdMatched(spark, dir, vs.last,
          files.map(_.toString))
        dropDvRows(prs, dir, base, vs.last)
      }
    snap.filter(col(c) === lit(value))
  }

  /** Grace window for [[vacuum]]'s unreferenced-dir sweep. Every commit
    * front door (library, DSv2 DML, streaming sinks) writes its data
    * dir FIRST and publishes the manifest pointer AFTER — so at any
    * moment an unreferenced `d-*` dir may be a commit in flight, and
    * that window is as long as the data write (hours for a large
    * commit). A vacuum that swept it would let the writer publish a
    * version pointing at deleted files — a corrupt tip. Deleting only
    * dirs whose newest file is older than the grace makes the sweep
    * safe against any writer that stages faster than the grace
    * (Delta's retention-before-delete, same reasoning). */
  val DefaultVacuumGraceMs: Long = 60L * 60 * 1000

  /** Drop history: delete manifests older than the newest `retain`
    * versions, then delete data dirs no retained manifest references —
    * including orphans from crashed commits — but ONLY dirs quiescent
    * for `graceMs` (see [[DefaultVacuumGraceMs]]; pass 0 to force-sweep
    * when no writer can be in flight). Membership math on manifest
    * CONTENTS, one bounded directory list to find candidates; data-dir
    * deletes are recursive but only on the garbage set. */
  def vacuum(spark: SparkSession, dir: String, retain: Int,
      graceMs: Long = DefaultVacuumGraceMs): Unit = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    // heal crashed publishes first (same staleness contract as the
    // data-dir sweep): a torn tip manifest otherwise wedges every
    // reader AND writer forever — see [[repairTornManifests]]
    repairTornManifests(spark, dir, graceMs)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    // the oldest kept version must stay resolvable after its delta
    // bases are dropped: persist a full checkpoint sidecar for it
    // FIRST, verified readable BEFORE any manifest is deleted — a
    // failed checkpoint write aborts the drop rather than stranding a
    // delta without a base (a crash between the two is safe either
    // way: bases survive until the delete loop runs)
    keep.headOption.filter(_ => drop.nonEmpty).foreach { k0 =>
      val isDelta =
        parseManifest(readManifestLines(spark, dir, k0))._1.isLeft
      if (isDelta && readCheckpoint(f, dir, k0).isEmpty) {
        writeCheckpointFile(f, dir, k0, resolveLive(spark, dir, k0))
        if (readCheckpoint(f, dir, k0).isEmpty)
          throw new IllegalStateException(
            s"checkpoint write for v$k0 of $dir failed verification; " +
              "aborting the manifest drop — retry the vacuum")
      }
    }
    val liveDirs = keep.flatMap(readManifest(spark, dir, _)).toSet
    // resolve DV sidecar bindings BEFORE their manifests drop: an
    // UNBOUND sidecar (a crashed DELETE attempt's orphan) must die in
    // the same pass that deletes the manifest disproving its binding —
    // otherwise, once its version falls below retention, the reader's
    // vacuumed-manifest fallback would legitimize it and silently
    // delete rows that were never committed deleted
    if (drop.nonEmpty) {
      val dropSet = drop.toSet
      val delRoot0 = new Path(s"$dir/_deletes")
      if (f.exists(delRoot0))
        f.listStatus(delRoot0).toSeq.map(_.getPath).foreach { p =>
          p.getName match {
            case DvSidecarName(n, uuid) if dropSet(n.toInt) =>
              val bound =
                try dvUuidOf(readManifestLines(spark, dir, n.toInt))
                  .contains(uuid)
                catch { // already-gone manifest: can't disprove, keep
                  case _: java.io.FileNotFoundException => true
                }
              if (!bound) { f.delete(p, true); () }
            case _ => ()
          }
        }
    }
    drop.foreach { v =>
      f.delete(manifestPath(dir, v), false)
      f.delete(ckptPath(dir, v), false) // a dropped version's sidecar
      f.delete(changeSidecarDir(dir, v), true) // and its row-level feed
    }
    val cutoff = System.currentTimeMillis() - graceMs
    // RECURSIVE newest-mtime: an in-flight commit's activity happens
    // levels deep (task attempts under _temporary/0/...), where the
    // top dir's and even its direct children's mtimes stop moving at
    // job setup — a direct-children check would judge a long-staging
    // commit "quiescent" and sweep it mid-write. The recursion is
    // bounded: it only ever runs on unreferenced candidate dirs.
    def quiescentSince(p: Path): Long = {
      var newest = f.getFileStatus(p).getModificationTime
      def walk(d: Path): Unit = f.listStatus(d).foreach { st =>
        newest = math.max(newest, st.getModificationTime)
        if (st.isDirectory) walk(st.getPath)
      }
      walk(p)
      newest
    }
    // on a PARTITIONED lake, live entries are `d-x/c=v/...` leaves: a
    // top dir is garbage only when NO live entry lives under it, and a
    // partially-dropped top dir (a whole-partition DELETE removed some
    // leaves) gets its dead LEAVES swept individually
    val topLive = liveDirs.map(_.takeWhile(_ != '/'))
    val nPart = GraftLakePartitions.of(spark, dir).length
    def dropSidecars(entry: String): Unit = {
      f.delete(new Path(s"$dir/_stats/$entry.stats"), false)
      f.delete(new Path(s"$dir/_bloom/$entry.bloom"), false)
      ()
    }
    val tops = f.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("d-"))
    tops.filter(p => !topLive(p.getName))
      .filter(p => quiescentSince(p) <= cutoff)
      .foreach { p =>
        f.delete(p, true)
        // sidecar metadata lives and dies with its data dir — orphan
        // .stats/.bloom files would otherwise accumulate one per
        // vacuumed commit, unboundedly on a long-lived lake; on a
        // partitioned lake the sidecars nest under a same-named dir
        dropSidecars(p.getName)
        f.delete(new Path(s"$dir/_stats/${p.getName}"), true)
        f.delete(new Path(s"$dir/_bloom/${p.getName}"), true)
        ()
      }
    if (nPart > 0) tops.filter(p => topLive(p.getName)).foreach { top =>
      def leaves(p: Path, depth: Int): Seq[Path] =
        if (depth == nPart) Seq(p)
        else f.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.contains('='))
          .flatMap(st => leaves(st.getPath, depth + 1))
      leaves(top, 0).foreach { leaf =>
        val entry = GraftLakePartitions.entryOfDepth(leaf, nPart + 1)
        if (!liveDirs(entry) && quiescentSince(leaf) <= cutoff) {
          f.delete(leaf, true)
          dropSidecars(entry)
        }
      }
    }
    // streaming-write staging stragglers (crashed task attempts whose
    // files were never listed in a commit message) are invisible to
    // every reader but would otherwise accumulate forever; the same
    // quiescence grace protects an in-flight epoch's staging
    val stageRoot = new Path(s"$dir/_stage")
    if (f.exists(stageRoot))
      f.listStatus(stageRoot).toSeq.filter(_.isDirectory).foreach { qd =>
        // partitioned task attempts stage DIRECTORY TREES
        // (taskPrefix/c=v/part-*); quiescence must consider the whole
        // tree — a top dir's own mtime does not move when a task
        // writes into a grandchild leaf — and the delete must recurse
        f.listStatus(qd.getPath).toSeq
          .filter(st => quiescentSince(st.getPath) <= cutoff)
          .foreach(st => f.delete(st.getPath, st.isDirectory))
        if (f.listStatus(qd.getPath).isEmpty) f.delete(qd.getPath, false)
      }
    // deletion-vector sidecars: one bound to a RETAINED version stays;
    // below retention it survives only while any of its entries is
    // still live (readers of retained versions must keep applying it);
    // an unbound in-retention name is a crashed attempt's orphan,
    // swept after the grace window. A DV commit's change-rows sidecar
    // (_changes/dv-<uuid>) follows the same binding.
    val delRoot = new Path(s"$dir/_deletes")
    if (f.exists(delRoot)) {
      val retainedDvUuids = keep.flatMap(v =>
        readManifestLines(spark, dir, v).collectFirst {
          case l if l.startsWith(DvMarker) => l.drop(DvMarker.length)
        }).toSet
      val lo = keep.headOption.getOrElse(Int.MaxValue)
      f.listStatus(delRoot).toSeq.map(_.getPath).foreach { p =>
        p.getName match {
          case DvSidecarName(n, uuid) =>
            val keepIt =
              if (retainedDvUuids(uuid)) true
              else if (n.toInt < lo)
                // below retention: alive while its entries are
                readDvParquet(spark, Seq(p.toString)).select("entry")
                  .distinct().collect().map(_.getString(0))
                  .exists(liveDirs)
              else false // in-retention but unbound: crashed attempt
            if (!keepIt && quiescentSince(p) <= cutoff) {
              f.delete(p, true)
              ()
            }
          case n if n.startsWith("stage-") =>
            // a merge-on-read write's positions staging
            // ([[GraftLakeDeltaWrite]]): renamed away at publish, so a
            // survivor here is a crashed attempt's orphan — swept once
            // quiescent (the grace window protects an in-flight write)
            if (quiescentSince(p) <= cutoff) {
              f.delete(p, true)
              ()
            }
          case _ => ()
        }
      }
      val chRoot = new Path(s"$dir/_changes")
      if (f.exists(chRoot))
        f.listStatus(chRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("dv-"))
          .filter(p => !retainedDvUuids(p.getName.stripPrefix("dv-")))
          .filter(p => quiescentSince(p) <= cutoff)
          .foreach { p => f.delete(p, true); () }
    }
    // drop tag markers only for data dirs actually gone — a grace-kept
    // published dir must keep its marker, or a replayed tag would
    // re-commit the same data
    val tagDir = new Path(s"$dir/_tags")
    if (f.exists(tagDir))
      f.listStatus(tagDir).toSeq.map(_.getPath)
        .filter(p => !liveDirs(s"d-${p.getName}") &&
          !f.exists(new Path(s"$dir/d-${p.getName}")))
        .foreach(p => f.delete(p, false))
    // refresh the tip hint (repair may have deleted the hinted torn
    // tip) so the next resolution stays O(1)
    keep.lastOption.foreach(writeTipHint(f, dir, _))
  }
}
