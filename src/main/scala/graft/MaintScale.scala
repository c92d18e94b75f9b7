package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Measured (not argued) evidence that partitioned-lake MAINTENANCE is
  * O(1) Spark jobs in the partition count: build a lake with N
  * partition leaves, run within-partition Z-ORDER (rewrite + stats +
  * bloom sidecars), and report wall seconds and the NUMBER OF SPARK
  * JOBS the whole maintenance pass scheduled. Before round 17 the
  * sidecar phase ran one footer walk and one bloom aggregation PER
  * LEAF (O(partitions) sequential jobs — a 1,000-day lake paid 1,000
  * scheduling round-trips after its single-job rewrite); now the
  * stats pass is one distributed footer job and each bloom column one
  * read over every leaf.
  *
  * Usage: runMain graft.MaintScale [leaves] [rowsPerLeaf]
  */
object MaintScale {
  def main(args: Array[String]): Unit = {
    val leaves = args.headOption.map(_.toInt).getOrElse(1000)
    val rowsPerLeaf = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-maintscale")
    import graft.engine._

    val root = "/tmp/graft_maintscale"
    val dir = s"$root/t"
    Lake.delete(spark, dir)
    spark.conf.set("spark.sql.catalog.gms",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.root", root)
    spark.sql("CREATE TABLE gms.t (id BIGINT, x INT, y INT, m INT) " +
      "PARTITIONED BY (m) TBLPROPERTIES ('bloom'='id')")
    val n = leaves.toLong * rowsPerLeaf
    val t0 = System.nanoTime()
    spark.sql("INSERT INTO gms.t SELECT id, CAST(id % 50 AS INT), " +
      s"CAST((id * 7) % 50 AS INT), CAST(id % $leaves AS INT) " +
      s"FROM range(0, $n)")
    val insertSec = (System.nanoTime() - t0) / 1e9

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t1 = System.nanoTime()
    VersionedLake.compactZOrder(spark, dir, "x", "y", nFiles = 1,
      bloomCol = Some("id"))
    val zorderSec = (System.nanoTime() - t1) / 1e9
    Thread.sleep(2000) // listener events post asynchronously
    spark.sparkContext.removeSparkListener(l)
    val entries = VersionedLake.manifestEntries(spark, dir,
      VersionedLake.tip(spark, dir).get)
    require(entries.length == leaves,
      s"expected $leaves leaf entries, got ${entries.length}")
    require(spark.table("gms.t").count() == n, "rows must survive")
    println(s"""{"metric":"maint_scale","leaves":$leaves,""" +
      s""""rows":$n,"insert_sec":${f"$insertSec%.1f"},""" +
      s""""zorder_sec":${f"$zorderSec%.1f"},""" +
      s""""zorder_jobs":${jobs.get()}}""")
    Lake.delete(spark, dir)
    spark.stop()
  }
}
