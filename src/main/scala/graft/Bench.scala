package graft

import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Per-round benchmark main, hardened so one pathological query cannot
  * destroy the round's perf evidence (round 7 lesson: a single hung query
  * → rc 124 → NO numbers at all, not even for the healthy queries):
  *
  *  - every run (warmup and timed) executes inside a bounded future with
  *    its own Spark job group; on timeout the group is cancelled, the
  *    query records -1, and the bench MOVES ON;
  *  - the JSON line is printed from a shutdown hook if the process is
  *    killed (the driver's `timeout` sends SIGTERM), so even a hard kill
  *    leaves partial per-query evidence;
  *  - warmup is one pass at sf0.001 (not a full untimed pass at the
  *    bench sf, which doubled every streaming drain): it compiles each
  *    query's generated code — the codegen cache is keyed on code text,
  *    identical across sf — at negligible data cost. Drain-dominated
  *    streaming/compaction queries are skipped in warmup; their cost is
  *    state-store commits and file IO, not codegen.
  *
  * Timed runs force full evaluation through the noop sink (`count()`
  * would let Catalyst prune unreferenced projected columns — the noop
  * write materializes every column of every row).
  */
object Bench {
  /** Sentinel distinguishing a TIMED-OUT run (possible zombie tasks still
    * holding cores — counts toward the saturation circuit breaker) from a
    * fast failure (-1.0, which costs nothing and resets the breaker).
    * Recorded in the JSON as -1.0 either way. */
  private val TimedOut = -2.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val perQueryTimeout =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TIMEOUT_SEC", "90").toInt
    val spark = Sessions.local("graft-bench")
    val sc = spark.sparkContext

    // Test hook for the timeout machinery itself: inject a query that
    // cannot finish (unfiltered cross join) and assert the bench still
    // emits a complete JSON with exactly this one failure.
    val queries =
      if (sys.env.contains("SPARK_GRAFT_BENCH_INJECT_HANG"))
        SparkEntry.queries + ("zz_injected_hang" ->
          ((s: org.apache.spark.sql.SparkSession, _: String) =>
            s.range(1000000L).crossJoin(s.range(1000000L)).toDF()))
      else SparkEntry.queries
    // Attribution hook: run only the named queries (comma-separated
    // exact names) in an otherwise-identical harness — used to measure
    // a subset alone vs inside the full suite (codegen-cache pressure,
    // heap churn) without changing what the driver's full run measures.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // SPARK_GRAFT_BENCH_REPEATS=N: time each query N times and record
    // the MEDIAN. When the env is UNSET (how the driver runs the
    // round-closing artifact), the policy is ADAPTIVE per query — the
    // in-harness form of the spike adjudication two judge rounds were
    // spent on: run once; if the time exceeds 2.5x the committed
    // quiet-host reference (bench_ref.json, refreshed each round's
    // close) the run is a suspected host-noise spike and the query
    // re-runs twice more, recording the median of three. Queries whose
    // timed body drains a once-staged stream (name contains "stream")
    // or probes a benchSetup-staged fixture that a repeat would see
    // already-mutated are never re-run — their repeats measure a
    // different (cheaper) operation, which would print phantom
    // IMPROVEMENTS instead. The artifact stamps the per-query attempt
    // counts so a reader can tell adjudicated medians from single runs.
    val repeatsEnv = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .map(_.trim.toInt).filter(_ >= 1)
    val refTimes: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("bench_ref.json")), "UTF-8")
        """"(q[^"]+)"\s*:\s*([-0-9.Ee]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }

    /** A query's timed result plus the evidence trail: every repeat's
      * time and how many of them timed out (the breaker must see
      * repeat timeouts even when the median lands on a success —
      * zombie tasks from the timed-out repeats still hold cores). */
    final case class Timed(value: Double, attempts: Int, timeouts: Int)

    def median(ok: Seq[Double]): Double = {
      val s = ok.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }

    def summarize(times: Seq[Double]): Timed = {
      val ok = times.filter(_ >= 0)
      val t = times.count(_ == TimedOut)
      if (ok.isEmpty)
        Timed(if (t > 0) TimedOut else times.head, times.length, t)
      else Timed(median(ok), times.length, t)
    }

    def run(name: String, dir: String): Timed = repeatsEnv match {
      case Some(n) => summarize((0 until n).map(_ => runOnce(name, dir)))
      case None =>
        val t1 = runOnce(name, dir)
        val repeatable = !SparkEntry.benchSetup.contains(name) &&
          !name.contains("stream")
        // NO reference time (query added this round, or bench_ref.json
        // missing/unreadable) ⇒ nothing to call a spike against: record
        // the single run as-is — comparable to later rounds' single
        // runs — instead of a 1s default threshold that would triple
        // every heavy new query's bench time and stamp its first round
        // as an attempts=3 median
        val threshold = refTimes.get(name)
          .fold(Double.PositiveInfinity)(r => math.max(1.0, r * 2.5))
        if (!repeatable || t1 < threshold) summarize(Seq(t1))
        else summarize(Seq(t1, runOnce(name, dir), runOnce(name, dir)))
    }

    def runOnce(name: String, dir: String): Double = {
      val fut = Future {
        sc.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
        try {
          // fixture staging is the operator's INPUT, not the operator —
          // untimed, but inside the same job group and timeout so a hung
          // setup is cancelled like a hung query
          SparkEntry.benchSetup.get(name).foreach(_(spark, dir))
          val t0 = System.nanoTime()
          queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally sc.clearJobGroup()
      }
      val elapsed =
        try Await.result(fut, perQueryTimeout.seconds)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            System.err.println(s"[bench] $name exceeded ${perQueryTimeout}s — cancelled")
            sc.cancelJobGroup(s"bench-$name")
            TimedOut
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      // Harness hygiene, outside the timed region: no query is allowed to
      // leak cached data into the next query's measurement.
      spark.catalog.clearCache()
      // clearCache cannot release directly-persisted RDDs (local
      // checkpoints) — PlanAuditSpec gates this per query at test time;
      // here just surface a leak loudly so a polluted-heap run is
      // attributable from the bench log alone.
      val leaked = sc.getPersistentRDDs
      if (leaked.nonEmpty)
        System.err.println(s"[bench] WARNING: $name left " +
          s"${leaked.size} persistent RDD(s) on the executor heap")
      elapsed
    }

    val results = TrieMap[String, Double]()
    val attempts = TrieMap[String, Int]()
    val repeatTimeouts = TrieMap[String, Int]()
    val printed = new AtomicBoolean(false)
    def printJson(): Unit = if (printed.compareAndSet(false, true)) {
      val qs = names.flatMap(n => results.get(n).map(v => "\"" + n + "\":" + v))
        .mkString("{", ",", "}")
      val done = names.flatMap(results.get)
      val total = done.filter(_ >= 0).sum
      val failures = done.count(_ < 0)
      // separate from `failures` (= queries whose RECORDED value is a
      // failure): timeouts swallowed by a successful median still left
      // zombie tasks behind and must be visible in the artifact
      val rto = repeatTimeouts.values.sum
      // headline-first, and also on stderr: the driver tails stdout, and
      // with 98 queries the per-query map can push the total past the
      // truncation point — a short summary line survives either way
      val repeatsStamp = repeatsEnv.map(_.toString).getOrElse("adaptive")
      System.err.println(
        s"""[bench-total] {"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","failures":$failures,"repeat_timeouts":$rto,"repeats":"$repeatsStamp"}""")
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$failures,"repeat_timeouts":$rto,"repeats":"$repeatsStamp"}""")
      // belt-and-braces AFTER the full line, on stdout too: a stdout
      // TAIL capture that truncates away the big per-query line (the
      // round-9 archive lost q01-q36 and the headline that way) still
      // ends with the totals — and a head capture keeps the full line
      println(s"""{"metric":"total_compact","value":$total,"unit":"sec","sf":"$sfDir","failures":$failures}""")
      // The driver's BENCH_r*.json archive tail-truncates at ~2,000
      // chars (two-thirds of the per-query map is unrecoverable every
      // round), so the full map is ALSO written to a committed file —
      // stable key order, one query per line — making round-over-round
      // per-query diffs possible from git history alone.
      try {
        // a SUBSET run (BENCH_ONLY) defaults to its own file: the
        // committed bench_last.json is the FULL suite's artifact, and
        // a quick single-query reproduction must not clobber it
        val file = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
          if (only.isDefined) "bench_subset.json" else "bench_last.json")
        val body = names.flatMap(n => results.get(n)
          .map(v => "  \"" + n + "\": " + v)).mkString(",\n")
        // run-condition stamps: round-over-round comparisons of this
        // artifact must not mix master/shuffle configurations silently
        // (the driver's local[32] rerun overwrites the builder's run)
        val master = spark.sparkContext.master
        val shuffleParts =
          spark.conf.get("spark.sql.shuffle.partitions", "?")
        // per-query attempt counts for the adjudicated (re-run) ones,
        // so a reader can tell a noise-robust median from a single run
        val adjudicated = names.filter(n => attempts.getOrElse(n, 1) > 1)
          .map(n => "\"" + n + "\": " + attempts(n)).mkString(", ")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(file),
          s"""{\n"_total_sec": $total, "_sf": "$sfDir", "_failures": $failures, "_repeat_timeouts": $rto, "_master": "$master", "_shuffle_partitions": "$shuffleParts", "_repeats": "$repeatsStamp", "_adjudicated_attempts": {$adjudicated},\n$body\n}\n""")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] bench_last.json write failed: $e")
      }
    }
    // The driver kills a stuck bench with SIGTERM; partial numbers beat
    // none, so emit whatever completed before dying.
    val hook = new Thread(() => printJson())
    Runtime.getRuntime.addShutdownHook(hook)

    // A cancelled job's tasks can be uninterruptible (a tight codegen or
    // interpreted-eval loop never checks the kill flag) and keep burning
    // cores, starving every later query into its own timeout. Three
    // consecutive timeouts ⇒ the executor is saturated with zombies:
    // stop measuring, mark the rest failed, and get the JSON out while
    // the driver's budget lasts.
    var consecutiveTimeouts = 0
    def runGuarded(name: String, dir: String, record: Boolean): Unit =
      if (consecutiveTimeouts < 3) {
        // warmup is codegen-compilation only: one pass regardless of
        // the timed runs' repeat policy
        val r =
          if (record) run(name, dir)
          else summarize(Seq(runOnce(name, dir)))
        if (record) {
          results.put(name, math.max(r.value, -1.0))
          attempts.put(name, r.attempts)
          if (r.timeouts > 0) repeatTimeouts.put(name, r.timeouts)
        }
        // EVERY timeout feeds the breaker — a median that lands on a
        // success must not reset it while the timed-out repeats'
        // zombie tasks still hold cores
        consecutiveTimeouts =
          if (r.timeouts > 0) consecutiveTimeouts + r.timeouts else 0
      } else if (record) results.put(name, -1.0)

    // warmup: codegen-compile each query at the smallest sf; skip queries
    // whose cost is drains/rewrites, not codegen
    val skipWarm = Set("stream", "compact", "injected")
    names.filterNot(n => skipWarm.exists(n.contains))
      .foreach(runGuarded(_, warmDir, record = false))

    names.foreach(runGuarded(_, sfDir, record = true))
    printJson()
    Runtime.getRuntime.removeShutdownHook(hook)
    spark.stop()
    // A bench with failed queries must not look like a healthy run.
    if (names.flatMap(results.get).exists(_ < 0)) sys.exit(1)
  }
}
