package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned lake with snapshot isolation, time travel, and vacuum —
  * the manifest-log design (Iceberg/Delta shape, reduced to its load-
  * bearing core) on plain Parquet + a filesystem:
  *
  * ```
  * <dir>/d-<token>/          one immutable data directory per commit
  * <dir>/_manifests/v00007   one manifest per version: the FULL live
  *                           set, one data-dir name per line
  * ```
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

  private def manifestPath(dir: String, v: Int): Path =
    new Path(s"$dir/$ManifestDir/v${"%05d".format(v)}")

  /** Published versions, ascending; empty for a non-existent lake. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val md = new Path(s"$dir/$ManifestDir")
    val f = fs(spark, dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{5}")).map(_.drop(1).toInt).sorted
  }

  private def readManifest(spark: SparkSession, dir: String, v: Int)
      : Seq[String] = {
    val in = fs(spark, dir).open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `df` as the next version. `mode` "append" carries the
    * previous live set forward plus the new data dir; "overwrite"
    * replaces it. Returns the published version number. */
  def commit(df: DataFrame, dir: String, mode: String = "append",
      codec: String = "snappy"): Int = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    df.write.option("compression", codec).parquet(s"$dir/$dataDir")
    publish(df.sparkSession, dir, dataDir, mode)
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
    // marker miss falls back to the exact newest-first manifest scan —
    // which in that rare case finds the tag in the newest manifests
    // and still exits early.
    val marker = new Path(s"$dir/_tags/$tag")
    lazy val inManifests = versions(spark, dir).reverseIterator
      .exists(v => readManifest(spark, dir, v).contains(dataDir))
    if (f.exists(marker) || inManifests) None
    else {
      f.delete(new Path(s"$dir/$dataDir"), true) // orphan from a crash
      df.write.option("compression", codec).parquet(s"$dir/$dataDir")
      val v = publish(spark, dir, dataDir, mode)
      val out = f.create(marker, true)
      out.close()
      Some(v)
    }
  }

  /** Tags of a version's data dirs (the `d-` prefix stripped) — how
    * tagged writers recover their own progress from the manifest
    * itself instead of a side state file. */
  def readManifestTags(spark: SparkSession, dir: String, v: Int)
      : Seq[String] =
    readManifest(spark, dir, v).map(_.stripPrefix("d-"))

  /** The commit CAS: create-no-overwrite of the next manifest; a racing
    * writer that published first makes the create throw — recompute
    * against the new tip and retry (the data dir is already durable,
    * only the pointer write repeats). */
  private def publish(spark: SparkSession, dir: String, dataDir: String,
      mode: String): Int = {
    val f = fs(spark, dir)
    var committed = -1
    while (committed < 0) {
      val prev = versions(spark, dir)
      val next = prev.lastOption.getOrElse(0) + 1
      val prevLive =
        if (prev.isEmpty) Seq.empty[String]
        else readManifest(spark, dir, prev.last)
      // a CAS-retry (or a racing same-tag replay) may find its dir
      // already published at the new tip — appending it AGAIN would
      // double-count the rows; the existing version is the commit
      if (mode == "append" && prevLive.contains(dataDir)) {
        committed = prev.last
      } else {
        val live =
          if (mode == "overwrite" || prev.isEmpty) Seq(dataDir)
          else prevLive :+ dataDir
        try {
          val out = f.create(manifestPath(dir, next), false)
          try out.write(live.mkString("\n").getBytes("UTF-8"))
          finally out.close()
          committed = next
        } catch {
          case e: java.io.IOException =>
            // retry ONLY a lost race (the loser's manifest now
            // exists); a real IO failure must not spin
            if (!f.exists(manifestPath(dir, next))) throw e
        }
      }
    }
    committed
  }

  /** Snapshot read of one published version — fails loudly on a
    * version that never existed or was vacuumed. `mergeSchema` because
    * commits may add columns over time (schema evolution): a snapshot
    * whose live set spans the addition reads the union schema, nulls
    * where old files lack the column. Footer-merge cost is per data
    * dir in the snapshot, not per row — metadata-bounded like
    * everything else here. */
  def readAt(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val dirs = readManifest(spark, dir, v)
    spark.read.option("mergeSchema", "true")
      .parquet(dirs.map(d => s"$dir/$d"): _*)
  }

  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no versions published at $dir")
    readAt(spark, dir, vs.last)
  }

  /** Rewrite the current live set as ONE data directory and publish it
    * as a new version (small-file compaction as a commit, not a swap:
    * older versions keep reading their own manifests, so there is no
    * rename window and nothing to recover — compare
    * [[Lake.recoverCrashedSwap]], which versioning makes unnecessary). */
  def compactVersions(spark: SparkSession, dir: String,
      codec: String = "snappy"): Int =
    commit(readLatest(spark, dir), dir, mode = "overwrite", codec = codec)

  /** Changed rows between two published versions, tagged `op` =
    * insert | delete — the incremental-consumption primitive (CDC by
    * version, the "process only what's new since yesterday's run"
    * path a training pipeline re-runs on).
    *
    * Scale shape: when `toV`'s manifest is a superset of `fromV`'s
    * (append-only history between them — the overwhelmingly common
    * case), the changes are EXACTLY the added data dirs, so this reads
    * only the new files — O(delta) with zero row-level comparison and
    * zero shuffle, decided from manifest metadata alone. Only a
    * history that dropped dirs in between (overwrite, compaction)
    * falls back to the snapshot multiset diff (`exceptAll`, one
    * full-width shuffle per side) — correct on any history, but
    * O(both snapshots); callers walking across a compaction boundary
    * should step version-by-version so every append segment stays on
    * the fast path. */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int)
      : DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val from = readManifest(spark, dir, fromV).toSet
    val to = readManifest(spark, dir, toV)
    if (from.subsetOf(to.toSet)) {
      val added = to.filterNot(from)
      if (added.isEmpty)
        readAt(spark, dir, toV).limit(0)
          .withColumn("op", org.apache.spark.sql.functions.lit("insert"))
      else spark.read.parquet(added.map(d => s"$dir/$d"): _*)
        .withColumn("op", org.apache.spark.sql.functions.lit("insert"))
    } else {
      import org.apache.spark.sql.functions.{col, lit}
      val a0 = readAt(spark, dir, fromV)
      val b0 = readAt(spark, dir, toV)
      // schema evolution across the boundary: align both snapshots on
      // the union of their columns (missing → null, matching the
      // mergeSchema read semantics) so the multiset diff compares rows,
      // not shapes — exceptAll throws on mismatched schemas otherwise
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
  }

  /** Drop history: delete manifests older than the newest `retain`
    * versions, then delete data dirs no retained manifest references —
    * including orphans from crashed commits. Membership math on
    * manifest CONTENTS, one bounded directory list to find candidates;
    * data-dir deletes are recursive but only on the garbage set. */
  def vacuum(spark: SparkSession, dir: String, retain: Int): Unit = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    val liveDirs = keep.flatMap(readManifest(spark, dir, _)).toSet
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    f.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("d-") && !liveDirs(p.getName))
      .foreach(p => f.delete(p, true))
    // drop tag markers whose data dir was just vacuumed, keeping the
    // marker set aligned with what the manifests can still answer
    val tagDir = new Path(s"$dir/_tags")
    if (f.exists(tagDir))
      f.listStatus(tagDir).toSeq.map(_.getPath)
        .filter(p => !liveDirs(s"d-${p.getName}"))
        .foreach(p => f.delete(p, false))
  }
}
