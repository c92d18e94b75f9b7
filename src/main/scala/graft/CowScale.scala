package graft

import org.apache.spark.sql.functions._

/** Measured (not argued) scale evidence for the copy-on-write DML
  * path: build the SAME multi-commit lake twice — once with
  * stats+bloom sidecars on the merge key, once bare — and run the
  * SAME KB-sized `MERGE INTO` whose keys all live in ONE commit's id
  * range. On the indexed lake, runtime group filtering prunes the
  * operation scan (and therefore the rewrite) to that one dir; on the
  * bare lake the merge must rewrite everything. The dir counts in the
  * output are the proof the timing difference is pruning, not noise:
  * indexed keeps `slices` live dirs (untouched ones carried by
  * manifest reference), bare collapses to 1.
  *
  * Usage: runMain graft.CowScale [srcSfDir] [copies]
  * (copies=10 over sf0.1 events ≈ 1M-row lake, 10 commits)
  */
object CowScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-cowscale")
    import graft.engine._

    val ev0 = spark.read.parquet(s"$src/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val shift = 1000000000L
    def copyK(k: Int) =
      ev0.withColumn("event_id", col("event_id") + lit(k * shift))

    // merge source: 1,000 updates + 100 inserts, every key inside
    // copy (copies/2)'s id range — one dir's worth of matches
    val mid = copies / 2
    val source = copyK(mid).limit(1000)
      .withColumn("value", col("value") * 2)
      .unionByName(copyK(mid).limit(100)
        .withColumn("event_id", col("event_id") + lit(shift / 2)))
    source.createOrReplaceTempView("cowscale_src")

    val root = "/tmp/graft_cowscale"
    spark.conf.set("spark.sql.catalog.glcs",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glcs.root", root)

    /** One merge run; returns (seconds, live dirs after, rows after,
      * BYTES the merge commit wrote = added entries + any positions
      * sidecar — the write-amplification witness). `mor = true`
      * enables deletion vectors so the SAME SQL routes merge-on-read
      * ([[graft.engine.GraftLakeDeltaOperation]]). */
    def run(nameTag: String, indexed: Boolean, mor: Boolean = false)
        : (Double, Int, Long, Long) = {
      val dir = s"$root/$nameTag"
      Lake.delete(spark, dir)
      (0 until copies).foreach { k =>
        if (indexed)
          VersionedLake.commitIndexed(copyK(k), dir, Seq("event_id"),
            Some("event_id"))
        else VersionedLake.commit(copyK(k), dir)
      }
      if (mor) VersionedLake.setDeletionVectors(spark, dir)
      val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val preTip = VersionedLake.tip(spark, dir).get
      val pre = VersionedLake.manifestEntries(spark, dir, preTip).toSet
      val t0 = System.nanoTime()
      spark.sql(
        s"""MERGE INTO glcs.$nameTag AS t
           |USING cowscale_src AS s ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET value = s.value
           |WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type,
           |  value) VALUES (s.event_id, s.user_id, s.event_type, s.value)
           |""".stripMargin)
      val sec = (System.nanoTime() - t0) / 1e9
      val postTip = VersionedLake.tip(spark, dir).get
      val added = VersionedLake.manifestEntries(spark, dir, postTip)
        .filterNot(pre)
      def len(p: String): Long =
        try f.getContentSummary(new org.apache.hadoop.fs.Path(p))
          .getLength
        catch { case scala.util.control.NonFatal(_) => 0L }
      val sidecarBytes = {
        val delRoot = new org.apache.hadoop.fs.Path(s"$dir/_deletes")
        if (!f.exists(delRoot)) 0L
        else f.listStatus(delRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith(s"v$postTip-"))
          .map(p => len(p.toString)).sum
      }
      val bytes = added.map(e => len(s"$dir/$e")).sum + sidecarBytes
      val h = VersionedLake.history(spark, dir)
      val rows = VersionedLake.readLatest(spark, dir).count()
      (sec, h.last._3, rows, bytes)
    }

    // bare first so JIT/codegen warmth, if anything, favors it
    val (bareSec, bareDirs, bareRows, bareBytes) =
      run("bare", indexed = false)
    val (idxSec, idxDirs, idxRows, idxBytes) =
      run("indexed", indexed = true)
    val (morSec, morDirs, morRows, morBytes) =
      run("mor", indexed = true, mor = true)
    require(bareRows == idxRows && idxRows == morRows,
      s"merge results diverged: $bareRows / $idxRows / $morRows")
    println(s"""{"metric":"cow_merge_scale","copies":$copies,""" +
      s""""rows":$idxRows,"indexed_sec":${f"$idxSec%.2f"},""" +
      s""""bare_sec":${f"$bareSec%.2f"},"mor_sec":${f"$morSec%.2f"},""" +
      s""""indexed_dirs_live":$idxDirs,"bare_dirs_live":$bareDirs,""" +
      s""""mor_dirs_live":$morDirs,"indexed_bytes_written":$idxBytes,""" +
      s""""bare_bytes_written":$bareBytes,"mor_bytes_written":$morBytes}""")
    spark.stop()
  }
}
