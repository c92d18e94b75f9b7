package graft

import org.apache.spark.sql.functions._

/** Measured (not argued) evidence that MERGE-ON-READ churn is bounded
  * by maintenance: N small SQL UPDATEs each publish one tiny appended
  * dir + one positions sidecar (the O(changed rows) write path the
  * write-amplification numbers in BENCH_NOTES celebrate) — but the
  * TAIL grows linearly in N: N small dirs, N sidecar parts, N pending
  * vector commits, and every scan pays the per-file overhead. The
  * maintenance pass (tighten `dv_max_pending` → materialize vectors;
  * `compactSmall` → merge the small-dir tail; `vacuum` → sweep dead
  * sidecars + history) must return the lake to O(1) live files.
  * Reported per N: live data files and bytes under the lake root
  * BEFORE maintenance, live files/bytes AFTER, and the wall seconds
  * of the maintenance pass itself.
  *
  * Usage: runMain graft.MorMaintScale [srcSfDir] [updates...]
  */
object MorMaintScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ns = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 32, 128)
    val spark = Sessions.local("graft-mormaintscale")
    import graft.engine._

    val root = "/tmp/graft_mormaintscale"
    spark.conf.set("spark.sql.catalog.glmms",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glmms.root", root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def bytesUnder(dir: String): Long = {
      def walk(q: org.apache.hadoop.fs.Path): Long =
        f.listStatus(q).map(st =>
          if (st.isDirectory) walk(st.getPath) else st.getLen).sum
      walk(new org.apache.hadoop.fs.Path(dir))
    }

    ns.foreach { n =>
      val name = s"t$n"
      val dir = s"$root/$name"
      Lake.delete(spark, dir)
      spark.read.parquet(s"$src/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
        .createOrReplaceTempView(s"glmms_src_$n")
      spark.sql(s"""CREATE TABLE glmms.$name
                   |TBLPROPERTIES ('deletion_vectors'='true') AS
                   |SELECT * FROM glmms_src_$n""".stripMargin)
      def liveFiles(): Int = VersionedLake.liveDataFileCount(spark, dir)
      val t0 = System.nanoTime()
      // N disjoint small corrections (the monthly-corrections shape)
      (0 until n).foreach(i => spark.sql(
        s"UPDATE glmms.$name SET value = value + 1.0 " +
          s"WHERE event_id % 9973 = $i"))
      val updSec = (System.nanoTime() - t0) / 1e9
      val filesB = liveFiles()
      val bytesB = bytesUnder(dir)
      val t1 = System.nanoTime()
      spark.sql(s"ALTER TABLE glmms.$name SET TBLPROPERTIES " +
        "('dv_max_pending'='1')") // tighten → materialize NOW
      VersionedLake.compactSmall(spark, dir, Long.MaxValue)
      VersionedLake.vacuum(spark, dir, retain = 1, graceMs = 0)
      val maintSec = (System.nanoTime() - t1) / 1e9
      val filesA = liveFiles()
      val bytesA = bytesUnder(dir)
      println(s"""{"metric":"mor_maint","updates":$n,""" +
        s""""update_sec":${f"$updSec%.1f"},""" +
        s""""files_before":$filesB,"bytes_before":$bytesB,""" +
        s""""maint_sec":${f"$maintSec%.1f"},""" +
        s""""files_after":$filesA,"bytes_after":$bytesA}""")
    }
    spark.stop()
  }
}
