package graft

import org.apache.spark.sql.functions._

/** Measured (not argued) evidence for merge-on-read deletion vectors:
  * the SAME ~1%-of-one-dir key-set DELETE on two otherwise identical
  * multi-commit lakes — one plain (best-case copy-on-write: stats +
  * bloom sidecars let runtime group filtering prune the rewrite to the
  * ONE intersecting dir), one with `deletion_vectors`. Reported per
  * variant: seconds, and the BYTES the DELETE wrote under the lake
  * root (data dirs + sidecars + manifests). The COW variant rewrites
  * the whole touched dir (~rows_per_dir × row_width); the DV variant
  * writes O(deleted rows) of positions + change rows — the
  * write-amplification collapse GDPR-style point deletes need at
  * 100 TB.
  *
  * Usage: runMain graft.DvScale [srcSfDir] [copies]
  */
object DvScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-dvscale")
    import graft.engine._

    val ev0 = spark.read.parquet(s"$src/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val shift = 1000000000L
    def copyK(k: Int) =
      ev0.withColumn("event_id", col("event_id") + lit(k * shift))

    val root = "/tmp/graft_dvscale"
    spark.conf.set("spark.sql.catalog.gldvs",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gldvs.root", root)

    // ~1% of ONE dir's rows, by key set (the GDPR point-delete shape)
    val mid = copies / 2
    val nDel = math.max(1,
      (ev0.count() / 100).toInt)
    val keys = copyK(mid).select("event_id").limit(nDel)
      .collect().map(_.getLong(0))

    def bytesUnder(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(q: org.apache.hadoop.fs.Path): Long =
        f.listStatus(q).map(st =>
          if (st.isDirectory) walk(st.getPath) else st.getLen).sum
      if (f.exists(p)) walk(p) else 0L
    }

    // full-scan aggregate wall time (one warm-up, then timed): the
    // DV read-path tax measurement — with the per-file InputPartition
    // + columnar selection design, a snapshot with ONE live vector
    // must scan in ~the clean snapshot's time, not pay a snapshot-wide
    // row-wise downgrade
    def scanSec(tag: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.table(s"gldvs.$tag").agg(count(lit(1)), sum("value"))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      math.min(once(), once())
    }

    def run(tag: String, dv: Boolean): (Double, Long, Long, Double, Double) = {
      val dir = s"$root/$tag"
      Lake.delete(spark, dir)
      copyK(0).createOrReplaceTempView("dvscale_seed")
      spark.sql(s"""CREATE TABLE gldvs.$tag TBLPROPERTIES (
        |'bloom' = 'event_id'${if (dv) ", 'deletion_vectors' = 'true'"
        else ""}) AS SELECT * FROM dvscale_seed""".stripMargin)
      (1 until copies).foreach { k =>
        copyK(k).createOrReplaceTempView("dvscale_in")
        spark.sql(s"INSERT INTO gldvs.$tag SELECT * FROM dvscale_in")
      }
      val cleanScan = scanSec(tag)
      val before = bytesUnder(dir)
      val t0 = System.nanoTime()
      spark.sql(s"DELETE FROM gldvs.$tag WHERE event_id IN " +
        s"(${keys.mkString(",")})")
      val sec = (System.nanoTime() - t0) / 1e9
      val written = bytesUnder(dir) - before
      val vecScan = scanSec(tag)
      (sec, written, spark.table(s"gldvs.$tag").count(), cleanScan,
        vecScan)
    }

    // plain (COW) first so JIT warmth, if anything, favors it
    val (cowSec, cowBytes, cowRows, _, _) = run("cow", dv = false)
    val (dvSec, dvBytes, dvRows, cleanScan, vecScan) = run("dv", dv = true)
    require(cowRows == dvRows,
      s"delete results diverged: $cowRows vs $dvRows")
    val dvFiles = engine.GraftLakeDataSource.filesRead(
      spark.table("gldvs.dv"))
    // the executed plan must stay COLUMNAR with vectors live (clean
    // files pass batches through; DV files pay a zero-copy selection)
    val plan = spark.table("gldvs.dv").queryExecution.executedPlan
      .toString
    require(plan.contains("ColumnarToRow"),
      "a vectored snapshot must still read columnar")
    println(s"""{"metric":"dv_delete_scale","copies":$copies,""" +
      s""""deleted":${keys.length},"rows":$dvRows,""" +
      s""""dv_sec":${f"$dvSec%.2f"},"cow_sec":${f"$cowSec%.2f"},""" +
      s""""dv_bytes_written":$dvBytes,"cow_bytes_written":$cowBytes,""" +
      s""""files":$dvFiles,"scan_clean_sec":${f"$cleanScan%.2f"},""" +
      s""""scan_vectored_sec":${f"$vecScan%.2f"}}""")

    // --- planning-state scale point: a MULTI-MILLION-position pending
    // backlog (dv_max_pending raised so it stays live). What's
    // measured: the driver's ENTIRE planning-side DV state is the ref
    // map — O(DV files) entries, a few paths + a count each — never
    // the positions; the backlog'd snapshot still scans exact (tasks
    // load only their own file's positions from the sidecar).
    val blCopies = math.max(copies, 30)
    val tag = "backlog"
    val dirB = s"$root/$tag"
    engine.Lake.delete(spark, dirB)
    copyK(0).createOrReplaceTempView("dvscale_seed")
    spark.sql(s"""CREATE TABLE gldvs.$tag TBLPROPERTIES (
      |'deletion_vectors' = 'true',
      |'dv_max_pending' = '1000000000') AS
      |SELECT * FROM dvscale_seed""".stripMargin)
    (1 until blCopies).foreach { k =>
      copyK(k).createOrReplaceTempView("dvscale_in")
      spark.sql(s"INSERT INTO gldvs.$tag SELECT * FROM dvscale_in")
    }
    val perCopy = ev0.count()
    val t0b = System.nanoTime()
    // one range DELETE covering every copy but the last: the vector
    // carries (blCopies-1) * perCopy ≈ millions of positions
    spark.sql(s"DELETE FROM gldvs.$tag WHERE event_id < " +
      s"${(blCopies - 1).toLong * shift}")
    val blDelSec = (System.nanoTime() - t0b) / 1e9
    val tipB = engine.VersionedLake.tip(spark, dirB).get
    val refs = engine.VersionedLake.dvRefs(spark, dirB, tipB)
    val pending = refs.valuesIterator.map(_.count).sum
    require(pending >= (blCopies - 1).toLong * perCopy,
      s"backlog fixture expected millions pending, got $pending")
    // the retained planning objects, exhaustively: key + entry + file
    // + part-path strings and one long per ref — what replaces the
    // old O(positions) arrays (which would be ~8B × pending here)
    val refBytes = refs.iterator.map { case (k, r) =>
      2L * (k.length + r.entry.length + r.file.length +
        r.parts.map(_.length).sum) + 8L
    }.sum
    val blScan = scanSec(tag)
    val blRows = spark.table(s"gldvs.$tag").count()
    require(blRows == perCopy,
      s"backlog scan must net the vector exactly: $blRows vs $perCopy")
    println(s"""{"metric":"dv_backlog_scale","copies":$blCopies,""" +
      s""""pending_positions":$pending,"dv_files":${refs.size},""" +
      s""""planning_ref_bytes":$refBytes,""" +
      s""""positions_bytes_if_collected":${8L * pending},""" +
      s""""delete_sec":${f"$blDelSec%.2f"},""" +
      s""""scan_backlog_sec":${f"$blScan%.2f"},"rows":$blRows}""")
    spark.stop()
  }
}
