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

    def run(nameTag: String, indexed: Boolean): (Double, Int, Long) = {
      val dir = s"$root/$nameTag"
      Lake.delete(spark, dir)
      (0 until copies).foreach { k =>
        if (indexed)
          VersionedLake.commitIndexed(copyK(k), dir, Seq("event_id"),
            Some("event_id"))
        else VersionedLake.commit(copyK(k), dir)
      }
      val t0 = System.nanoTime()
      spark.sql(
        s"""MERGE INTO glcs.$nameTag AS t
           |USING cowscale_src AS s ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET value = s.value
           |WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type,
           |  value) VALUES (s.event_id, s.user_id, s.event_type, s.value)
           |""".stripMargin)
      val sec = (System.nanoTime() - t0) / 1e9
      val h = VersionedLake.history(spark, dir)
      val rows = VersionedLake.readLatest(spark, dir).count()
      (sec, h.last._3, rows)
    }

    // bare first so JIT/codegen warmth, if anything, favors it
    val (bareSec, bareDirs, bareRows) = run("bare", indexed = false)
    val (idxSec, idxDirs, idxRows) = run("indexed", indexed = true)
    require(bareRows == idxRows,
      s"merge results diverged: $bareRows vs $idxRows")
    println(s"""{"metric":"cow_merge_scale","copies":$copies,""" +
      s""""rows":$idxRows,"indexed_sec":${f"$idxSec%.2f"},""" +
      s""""bare_sec":${f"$bareSec%.2f"},"indexed_dirs_live":$idxDirs,""" +
      s""""bare_dirs_live":$bareDirs}""")
    spark.stop()
  }
}
