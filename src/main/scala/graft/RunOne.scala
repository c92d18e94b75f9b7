package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev harness: run ONE named query (optionally repeated) against a given
  * sf dir and print its wall time — the per-query profiling loop the full
  * Bench is too coarse for. With SPARK_GRAFT_RUNONE_JOBS=1, also prints
  * every Spark job's wall time and call site, attributing multi-action
  * queries (index commits, streaming drains, iterative graph passes) to
  * the actions that cost. Usage:
  *   runMain graft.RunOne <queryName> [sfDir] [repeats]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <name[,name2,...]> [sfDir] [repeats]")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local("graft-runone")
    // Wall time on this host swings 3x with I/O weather; summed executor
    // CPU + GC time is the noise-robust A/B metric (guide §1: measure
    // what the change moves, not what the host adds).
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0)
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        Option(sc.stageInfo.taskMetrics).foreach { m =>
          cpuNs.addAndGet(m.executorCpuTime)
          gcMs.addAndGet(m.jvmGCTime)
          runMs.addAndGet(m.executorRunTime)
          ()
        }
      }
    })
    // SPARK_GRAFT_RUNONE_PHASES=1: per-execution Catalyst phase times
    // (analysis/optimization/planning) from the QueryPlanningTracker —
    // where driver-bound fixtures (many small DML statements) spend.
    if (sys.env.contains("SPARK_GRAFT_RUNONE_PHASES"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val ph = qe.tracker.phases.map { case (k, v) =>
              s"$k=${v.endTimeMs - v.startTimeMs}" }.mkString(" ")
            println(f"[runone-exec] $funcName ${durationNs / 1e9}%6.3f s  $ph")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    // SPARK_GRAFT_RUNONE_BATCHES=1: per-micro-batch durationMs breakdown
    // (triggerExecution, queryPlanning, walCommit, addBatch, ...) — where
    // a streaming drain's driver time goes.
    if (sys.env.contains("SPARK_GRAFT_RUNONE_BATCHES"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            val d = p.durationMs
            println(s"[runone-batch] batch=${p.batchId} rows=${p.numInputRows} " +
              s"durations=$d")
          }
        })
    if (sys.env.contains("SPARK_GRAFT_RUNONE_JOBS")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse("?")
          starts.put(js.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[runone-job] job=${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
          }
        }
      })
    }
    names.foreach { name =>
      // SPARK_GRAFT_RUNONE_WARM=1: one untimed pass at sf0.001 first — the
      // bench's codegen/JIT warmup — so a query that is NOT repeatable in
      // one JVM (catalog DDL fixtures) still gets one warm timed run.
      if (sys.env.contains("SPARK_GRAFT_RUNONE_WARM")) {
        val warmDir = "/root/testdata/sf0.001"
        try {
          SparkEntry.benchSetup.get(name).foreach(_(spark, warmDir))
          SparkEntry.queries(name)(spark, warmDir)
            .write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          System.err.println(s"[runone] $name warmup failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
      (1 to reps).foreach { i =>
        try {
          SparkEntry.benchSetup.get(name).foreach(_(spark, sfDir))
          val (c0, g0, r0) = (cpuNs.get, gcMs.get, runMs.get)
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"[runone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
            f"  cpu=${(cpuNs.get - c0) / 1e9}%.2f s gc=${(gcMs.get - g0) / 1e3}%.2f s" +
            f" taskrun=${(runMs.get - r0) / 1e3}%.2f s")
        } catch { case e: Throwable =>
          println(s"[runone] $name run $i FAILED: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
