package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Model-based fuzz over the PARTITIONED-lake surface this round
  * composed: INSERT, whole-partition DELETE (manifest-only),
  * data-column replaceWhere (partition-bounded COW), COW UPDATE,
  * partition-wise OPTIMIZE, within-partition Z-ORDER and VACUUM, in a
  * seeded random interleaving checked against an in-memory model after
  * every op (global and per-partition) and through time travel.
  * Interleavings are where the entries-are-partition-leaves invariant
  * and the rewrite paths' survivor handling would break silently. */
class PartitionFuzzSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  for (seed <- Seq(31L))
  test("random partitioned insert/partition-delete/replaceWhere/" +
      s"update/optimize/zorder/vacuum interleavings always read back " +
      s"as the model (seed $seed)") {
    val root = tempDir(s"glp-fuzz-$seed")
    val cat = s"glpfz$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, a INT, v DOUBLE, m INT) " +
      "PARTITIONED BY (m)")
    val dir = s"$root/t"
    val rnd = new scala.util.Random(seed)
    // id -> (a, v, m)
    val model = scala.collection.mutable.Map.empty[Long, (Int, Double, Int)]
    var nextId = 0L
    val recorded = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Map[Long, (Int, Double, Int)])]

    def mkRows(n: Int): Seq[(Long, Int, Double, Int)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val a = ((id * 13) % 1000).toInt
        val v = rnd.nextInt(1000).toDouble
        val m = (id % 4).toInt
        model(id) = (a, v, m)
        (id, a, v, m)
      }

    def checkTip(label: String): Unit = {
      val got = spark.table(s"$cat.t").groupBy("m")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val want = model.values.groupBy(_._3).map { case (m, vs) =>
        m -> (vs.size.toLong, vs.map(_._2).sum) }
      assert(got.keySet == want.keySet,
        s"$label: partitions ${got.keySet} != ${want.keySet}")
      want.foreach { case (m, (n, sv)) =>
        assert(got(m)._1 == n, s"$label m=$m: count ${got(m)._1} != $n")
        assert(math.abs(got(m)._2 - sv) < 1e-6,
          s"$label m=$m: sum ${got(m)._2} != $sv")
      }
    }

    (1 to 30).foreach { step =>
      rnd.nextInt(8) match {
        case 0 | 1 => // INSERT fresh rows across all partitions
          import spark.implicits._
          mkRows(80 + rnd.nextInt(120))
            .toDF("id", "a", "v", "m")
            .createOrReplaceTempView("glpfz_in")
          spark.sql(s"INSERT INTO $cat.t SELECT * FROM glpfz_in")
        case 2 => // whole-partition DELETE (manifest-only)
          val m = rnd.nextInt(4)
          model.filterInPlace { case (_, (_, _, pm)) => pm != m }
          spark.sql(s"DELETE FROM $cat.t WHERE m = $m")
        case 3 => // data-column replaceWhere bounded to one partition
          val m = rnd.nextInt(4)
          val cut = nextId / 2
          val replaced = model.collect {
            case (id, (_, _, pm)) if pm == m && id < cut => id }.toSeq
          if (replaced.nonEmpty) {
            replaced.foreach(model.remove)
            // replacement rows reuse half the ids, new values — every
            // row satisfies the condition (constraint check)
            val repl = replaced.take(replaced.length / 2 + 1).map { id =>
              val a = ((id * 13) % 1000).toInt
              val v = 5000.0 + rnd.nextInt(100)
              model(id) = (a, v, m)
              (id, a, v, m)
            }
            import spark.implicits._
            repl.toDF("id", "a", "v", "m").writeTo(s"$cat.t")
              .overwrite(col("m") === m && col("id") < cut)
          }
        case 4 => // COW UPDATE on a random key set
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length, 1 + rnd.nextInt(25)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
            ks.foreach { k =>
              val (a, v, m) = model(k); model(k) = (a, v + 1000.0, m) }
            spark.sql(s"UPDATE $cat.t SET v = v + 1000.0 WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 5 => // partition-wise OPTIMIZE
          VersionedLake.compactSmall(spark, dir, Long.MaxValue)
          ()
        case 6 => // within-partition Z-ORDER
          if (model.nonEmpty) {
            VersionedLake.compactZOrder(spark, dir, "a", "id",
              nFiles = 2, bits = 20)
            ()
          }
        case 7 => // VACUUM
          VersionedLake.vacuum(spark, dir, retain = 6, graceMs = 0)
      }
      checkTip(s"step $step")
      VersionedLake.tip(spark, dir).foreach { t =>
        if (recorded.lastOption.forall(_._1 != t))
          recorded += ((t, model.toMap))
      }
    }

    // retained recorded versions time-travel to their recorded models
    val readable = VersionedLake.versions(spark, dir).toSet
    val checked = recorded.filter(r => readable(r._1)).takeRight(4)
    assert(checked.nonEmpty, "retention kept no recorded version")
    checked.foreach { case (ver, snap) =>
      val got = spark.sql(s"SELECT count(*), SUM(v) FROM $cat.t " +
        s"VERSION AS OF $ver").head()
      assert(got.getLong(0) == snap.size,
        s"v$ver count ${got.getLong(0)} != recorded ${snap.size}")
      val s = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      assert(math.abs(s - snap.values.map(_._2).sum) < 1e-6,
        s"v$ver sum $s != recorded ${snap.values.map(_._2).sum}")
    }
    // the invariant every pruning path depends on survives the run
    val tip = VersionedLake.tip(spark, dir).get
    assert(VersionedLake.manifestEntries(spark, dir, tip).forall(
      _.matches("d-[^/]+/m=(\\d+|__HIVE_DEFAULT_PARTITION__)")),
      "entries must stay partition leaves across every interleaving")
  }

  for (seed <- Seq(91L, 20260816L))
  test("PARTITIONED × DELETION-VECTOR interleavings (insert/streamed " +
      "append/partition-delete/DV point delete/mixed delete/update/" +
      "replaceWhere/optimize/zorder/vacuum) always read back as the " +
      s"model, through time travel and the netted feed (seed $seed)") {
    val root = tempDir(s"glpdv-fuzz-$seed")
    val cat = s"glpdvfz$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, a INT, v DOUBLE, m INT) " +
      "PARTITIONED BY (m) TBLPROPERTIES ('deletion_vectors'='true')")
    val dir = s"$root/t"
    val rnd = new scala.util.Random(seed)
    val model = scala.collection.mutable.Map.empty[Long, (Int, Double, Int)]
    var nextId = 0L
    var streamedBatches = 0
    var restores = 0
    val recorded = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Map[Long, (Int, Double, Int)])]

    def mkRows(n: Int): Seq[(Long, Int, Double, Int)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val a = ((id * 13) % 1000).toInt
        val v = rnd.nextInt(1000).toDouble
        val m = (id % 3).toInt
        model(id) = (a, v, m)
        (id, a, v, m)
      }

    def checkTip(label: String): Unit = {
      val got = spark.table(s"$cat.t").groupBy("m")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val want = model.values.groupBy(_._3).map { case (m, vs) =>
        m -> (vs.size.toLong, vs.map(_._2).sum) }
      assert(got.keySet == want.keySet,
        s"$label: partitions ${got.keySet} != ${want.keySet}")
      want.foreach { case (m, (n, sv)) =>
        assert(got(m)._1 == n, s"$label m=$m: count ${got(m)._1} != $n")
        assert(math.abs(got(m)._2 - sv) < 1e-6,
          s"$label m=$m: sum ${got(m)._2} != $sv")
      }
    }

    (1 to 34).foreach { step =>
      rnd.nextInt(11) match {
        case 0 | 1 => // INSERT fresh rows across all partitions
          import spark.implicits._
          mkRows(60 + rnd.nextInt(100))
            .toDF("id", "a", "v", "m")
            .createOrReplaceTempView("glpdvfz_in")
          spark.sql(s"INSERT INTO $cat.t SELECT * FROM glpdvfz_in")
        case 2 => // STREAMED append through the partitioned sink
          import spark.implicits._
          mkRows(40 + rnd.nextInt(60)).toDF("id", "a", "v", "m")
            .coalesce(1).write.mode("append").parquet(s"$root/in")
          streamedBatches += 1
          val q = spark.readStream
            .schema("id LONG, a INT, v DOUBLE, m INT")
            .parquet(s"$root/in")
            .writeStream.format("graftlake")
            .option("checkpointLocation", s"$root/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(dir)
          q.awaitTermination()
        case 3 => // whole-partition DELETE (manifest-only, DV lake)
          val m = rnd.nextInt(3)
          model.filterInPlace { case (_, (_, _, pm)) => pm != m }
          spark.sql(s"DELETE FROM $cat.t WHERE m = $m")
        case 4 => // DV point delete across partitions
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length, 1 + rnd.nextInt(30)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
            ks.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 5 => // MIXED delete: partition conjunct + data key set
          val m = rnd.nextInt(3)
          val live = model.collect {
            case (id, (_, _, pm)) if pm == m => id }.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length, 1 + rnd.nextInt(15)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
            ks.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE m = $m AND id IN " +
              s"(${ks.mkString(",")})")
          }
        case 6 => // COW UPDATE on a random key set (materializes DVs
          // on the touched dirs)
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length, 1 + rnd.nextInt(20)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
            ks.foreach { k =>
              val (a, v, m) = model(k); model(k) = (a, v + 1000.0, m) }
            spark.sql(s"UPDATE $cat.t SET v = v + 1000.0 WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 7 => // data-column replaceWhere bounded to one partition
          val m = rnd.nextInt(3)
          val cut = nextId / 2
          val replaced = model.collect {
            case (id, (_, _, pm)) if pm == m && id < cut => id }.toSeq
          if (replaced.nonEmpty) {
            replaced.foreach(model.remove)
            val repl = replaced.take(replaced.length / 2 + 1).map { id =>
              val a = ((id * 13) % 1000).toInt
              val v = 5000.0 + rnd.nextInt(100)
              model(id) = (a, v, m)
              (id, a, v, m)
            }
            import spark.implicits._
            repl.toDF("id", "a", "v", "m").writeTo(s"$cat.t")
              .overwrite(col("m") === m && col("id") < cut)
          }
        case 8 => // partition-wise OPTIMIZE / within-partition Z-ORDER
          if (rnd.nextBoolean())
            VersionedLake.compactSmall(spark, dir, Long.MaxValue)
          else if (model.nonEmpty)
            VersionedLake.compactZOrder(spark, dir, "a", "id",
              nFiles = 2, bits = 20)
          ()
        case 9 => // VACUUM
          VersionedLake.vacuum(spark, dir, retain = 6, graceMs = 0)
        case 10 => // RESTORE to a retained recorded version — the
          // PARTITIONED branch of restore (per-leaf rewrite of
          // post-target-vectored entries, partition dirs re-added by
          // reference) interleaved with sink epochs, partition drops
          // and pending vectors; the sink checkpoint keeps appending
          val readable = VersionedLake.versions(spark, dir).toSet
          val targets = recorded.filter(r => readable(r._1))
          if (targets.nonEmpty) {
            val (tv, snap) = targets(rnd.nextInt(targets.length))
            if (VersionedLake.restore(spark, dir, tv).nonEmpty) {
              restores += 1
              model.clear()
              model ++= snap
            }
          }
      }
      checkTip(s"step $step")
      VersionedLake.tip(spark, dir).foreach { t =>
        if (recorded.lastOption.forall(_._1 != t))
          recorded += ((t, model.toMap))
      }
    }

    // retained recorded versions time-travel to their recorded models
    val readable = VersionedLake.versions(spark, dir).toSet
    val checked = recorded.filter(r => readable(r._1)).takeRight(4)
    assert(checked.nonEmpty, "retention kept no recorded version")
    checked.foreach { case (ver, snap) =>
      val got = spark.sql(s"SELECT count(*), SUM(v) FROM $cat.t " +
        s"VERSION AS OF $ver").head()
      assert(got.getLong(0) == snap.size,
        s"v$ver count ${got.getLong(0)} != recorded ${snap.size}")
      val s = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      assert(math.abs(s - snap.values.map(_._2).sum) < 1e-6,
        s"v$ver sum $s != recorded ${snap.values.map(_._2).sum}")
    }
    // the netted change feed over the retained history reaches the
    // final model from the oldest readable snapshot
    val lo = VersionedLake.versions(spark, dir).min
    val hi = VersionedLake.tip(spark, dir).get
    if (lo < hi) {
      val base = spark.sql(s"SELECT count(*), SUM(v) FROM $cat.t " +
        s"VERSION AS OF $lo").head()
      val baseN = base.getLong(0)
      val baseS = if (base.isNullAt(1)) 0.0 else base.getDouble(1)
      val ch = VersionedLake.changes(spark, dir, lo, hi)
        .withColumn("sgn",
          when(col("op") === "insert", lit(1)).otherwise(lit(-1)))
      val net = ch.agg(sum(col("sgn")), sum(col("sgn") * col("v"))).head()
      val netN = if (net.isNullAt(0)) 0L else net.getLong(0)
      val netS = if (net.isNullAt(1)) 0.0 else net.getDouble(1)
      assert(baseN + netN == model.size,
        s"netted feed count ${baseN + netN} != model ${model.size}")
      assert(math.abs(baseS + netS - model.values.map(_._2).sum) < 1e-6,
        s"netted feed sum ${baseS + netS} != model " +
          model.values.map(_._2).sum)
    }
    assert(streamedBatches == 0 ||
      VersionedLake.manifestEntries(spark, dir,
        VersionedLake.tip(spark, dir).get).nonEmpty)
    // entries-are-partition-leaves holds across the DV composition too
    val tip = VersionedLake.tip(spark, dir).get
    assert(VersionedLake.manifestEntries(spark, dir, tip).forall(
      _.matches("d-[^/]+/m=(\\d+|__HIVE_DEFAULT_PARTITION__)")),
      "entries must stay partition leaves across every interleaving")
    assert(restores > 0, s"seed $seed never restored — pick another seed")
  }
}
