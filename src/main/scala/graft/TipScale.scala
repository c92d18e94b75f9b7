package graft

import org.apache.hadoop.fs.Path

/** Measured (not argued) evidence for manifest-log metadata scale: a
  * lake whose manifest log holds N commits (a once-a-minute streaming
  * sink reaches 10k in a week) must still resolve its tip — the step
  * every plan, read, and publish CAS attempt pays — without listing
  * all N manifests. Builds an N-version manifest log (raw terminated
  * manifest files over one shared data dir; the data path is not what
  * is being measured), then times
  *
  *  - `VersionedLake.tip` (hint + forward probe, O(1 + lag)),
  *  - the pre-checkpoint resolution `versions(...).lastOption`
  *    (full directory list, O(N)),
  *  - a cold `spark.read.format("graftlake")` plan (tip resolution +
  *    snapshot manifest read + file listing).
  *
  * Usage: runMain graft.TipScale [nVersions] [reps]
  */
object TipScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val reps = if (args.length > 1) args(1).toInt else 20
    val spark = Sessions.local("graft-tipscale")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tipscale")
      .toString
    val dir = s"$root/lake"
    graft.engine.VersionedLake.commit(
      spark.range(0, 1000).toDF("id"), dir)
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // manifest history: version v's live set stays the single real
    // data dir (contents identical to v1's) — tip RESOLUTION cost is
    // a function of the log's size, not the snapshots'
    val v1 = {
      val in = f.open(new Path(s"$dir/_manifests/v00001"))
      try { val b = new Array[Byte](in.available()); in.readFully(b); b }
      finally in.close()
    }
    def name(v: Int) =
      "v" + (if (v <= 99999) "%05d".format(v) else "%09d".format(v))
    (2 to n).foreach { v =>
      val o = f.create(new Path(s"$dir/_manifests/${name(v)}"), false)
      o.write(v1); o.close()
    }
    val oh = f.create(new Path(s"$dir/_manifests/_tip"), true)
    oh.write(n.toString.getBytes("UTF-8")); oh.close()

    def time(label: String)(body: => Any): Unit = {
      body // warm (fs caches, classloading)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      println(f"[tipscale] $label: ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/op (n=$n)")
    }
    time("tip via hint (checkpointed)") {
      require(graft.engine.VersionedLake.tip(spark, dir).contains(n))
    }
    time("tip via full listing") {
      require(graft.engine.VersionedLake
        .versions(spark, dir).lastOption.contains(n))
    }
    time("cold graftlake plan (read schema + snapshot resolve)") {
      spark.read.format("graftlake").load(dir).queryExecution.executedPlan
    }
    spark.stop()
  }
}
