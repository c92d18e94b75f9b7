package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Model-based fuzz over the deletion-vector surface: a seeded random
  * sequence of INSERT / DV-DELETE / UPDATE (merge-on-read on every DV
  * lake — flat, mapped, and the partitioned×mapped triple) / RESTORE /
  * OPTIMIZE / VACUUM ops against an in-memory id→value model. After EVERY op the snapshot
  * must equal the model (count and sum — a misapplied position, a
  * resurrected row, or a vector leaking across a rewrite all diverge
  * here); recorded historical versions must time-travel to their
  * recorded models while retained; and the full change feed must net
  * to the final model. This is the harness for the corruption classes
  * the targeted specs cannot enumerate — interleavings. */
class DvFuzzSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  for (seed <- Seq(20260815L, 477L))
  test("random insert/delete/update/optimize/vacuum interleavings " +
      "always read back as the model, at the tip, through time travel " +
      s"and through the netted change feed (seed $seed)") {
    val root = tempDir(s"gldv-fuzz-$seed")
    val cat = s"gldvfz$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('deletion_vectors'='true')")
    val dir = s"$root/t"
    val rnd = new scala.util.Random(seed)
    val model = scala.collection.mutable.Map.empty[Long, Double]
    var nextId = 0L
    var merges = 0
    // (version, model snapshot) at recording time
    val recorded = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Map[Long, Double])]

    def checkTip(label: String): Unit = {
      val got = spark.table(s"$cat.t")
        .agg(count(lit(1)), sum("v")).head()
      assert(got.getLong(0) == model.size,
        s"$label: count ${got.getLong(0)} != model ${model.size}")
      val sumGot = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      assert(math.abs(sumGot - model.values.sum) < 1e-6,
        s"$label: sum $sumGot != model ${model.values.sum}")
    }

    (1 to 36).foreach { step =>
      rnd.nextInt(9) match {
        case 0 | 1 => // INSERT a fresh batch
          val n = 50 + rnd.nextInt(150)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            val v = rnd.nextInt(1000).toDouble
            model(id) = v
            (id, v)
          }
          import spark.implicits._
          rows.toDF("id", "v").createOrReplaceTempView("gldvfz_in")
          spark.sql(s"INSERT INTO $cat.t SELECT * FROM gldvfz_in")
        case 2 => // DV point delete of a random live key set
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(40))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 3 => // merge-on-read UPDATE of a random live key set
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(30))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(k => model(k) = model(k) + 1000.0)
            spark.sql(s"UPDATE $cat.t SET v = v + 1000.0 WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 4 => // OPTIMIZE (materializes vectors)
          VersionedLake.compactSmall(spark, dir, Long.MaxValue)
          ()
        case 5 => // VACUUM (drops history + dead sidecars)
          VersionedLake.vacuum(spark, dir, retain = 6, graceMs = 0)
        case 6 => // RESTORE to a random still-retained recorded
          // version: the model resets to that version's snapshot —
          // post-target vectors must unapply (scoped rewrite), the
          // target's entries return by reference, and every later
          // checkTip/time-travel/feed invariant keeps holding
          val readable = VersionedLake.versions(spark, dir).toSet
          val targets = recorded.filter(r => readable(r._1))
          if (targets.nonEmpty) {
            val (tv, snap) = targets(rnd.nextInt(targets.length))
            VersionedLake.restore(spark, dir, tv)
            model.clear()
            model ++= snap
          }
        case 7 => // MERGE: matched-update + matched-delete +
          // not-matched-insert in ONE merge-on-read commit (both
          // halves of the publish plus inserts — the hardest commit
          // path, interleaving with every other op here)
          val live = model.keys.toArray
          val picked =
            if (live.isEmpty) Seq.empty[Long]
            else (0 until (1 + rnd.nextInt(25)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
          val (delKs, updKs) = picked.partition(_ => rnd.nextInt(4) == 0)
          val insRows = (0 until (5 + rnd.nextInt(25))).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextInt(1000).toDouble)
          }
          val src = updKs.map(k => (k, model(k) + 5000.0, "u")) ++
            delKs.map(k => (k, 0.0, "d")) ++
            insRows.map { case (id, nv) => (id, nv, "i") }
          if (src.nonEmpty) {
            merges += 1
            updKs.foreach(k => model(k) = model(k) + 5000.0)
            delKs.foreach(model.remove)
            insRows.foreach { case (id, nv) => model(id) = nv }
            import spark.implicits._
            src.toDF("id", "nv", "act")
              .createOrReplaceTempView("gldvfz_mrg")
            spark.sql(
              s"""MERGE INTO $cat.t AS t USING gldvfz_mrg AS s
                 |ON t.id = s.id
                 |WHEN MATCHED AND s.act = 'd' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET v = s.nv
                 |WHEN NOT MATCHED THEN INSERT (id, v)
                 |VALUES (s.id, s.nv)""".stripMargin)
          }
        case 8 => // TAGGED merge-on-read commit + an immediate REPLAY
          // of the same tag: the exactly-once seam interleaving with
          // every other op here — the replay must publish nothing, so
          // the model applies the update ONCE (a double-apply breaks
          // checkTip, the time-travel sweep AND the netted feed)
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(20))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(k => model(k) = model(k) + 7000.0)
            def run(): Unit = {
              spark.conf.set("spark.graft.lake.commitTag", s"fz$step")
              try spark.sql(s"UPDATE $cat.t SET v = v + 7000.0 " +
                s"WHERE id IN (${ks.mkString(",")})")
              finally spark.conf.unset("spark.graft.lake.commitTag")
            }
            run()
            run() // checkpoint-style replay: must no-op at the lake
          }
      }
      checkTip(s"step $step")
      VersionedLake.tip(spark, dir).foreach { t =>
        if (recorded.lastOption.forall(_._1 != t))
          recorded += ((t, model.toMap))
      }
    }

    // time travel: every recorded version still within retention must
    // read back as its recorded model
    val readable = VersionedLake.versions(spark, dir).toSet
    val checkedVersions = recorded.filter(r => readable(r._1)).takeRight(5)
    assert(checkedVersions.nonEmpty, "retention kept no recorded version")
    checkedVersions.foreach { case (ver, snap) =>
      val got = spark.sql(
        s"SELECT count(*), SUM(v) FROM $cat.t VERSION AS OF $ver").head()
      assert(got.getLong(0) == snap.size,
        s"v$ver count ${got.getLong(0)} != recorded ${snap.size}")
      val sumGot = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      assert(math.abs(sumGot - snap.values.sum) < 1e-6,
        s"v$ver sum $sumGot != recorded ${snap.values.sum}")
    }

    // the change feed over the whole retained history nets to the
    // final model (vacuumed intermediates fall back to the DV-aware
    // endpoint diff; inserts count +, deletes −, updates net)
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
      val net = ch.agg(sum(col("sgn")),
        sum(col("sgn") * col("v"))).head()
      val netN = if (net.isNullAt(0)) 0L else net.getLong(0)
      val netS = if (net.isNullAt(1)) 0.0 else net.getDouble(1)
      assert(baseN + netN == model.size,
        s"netted feed count ${baseN + netN} != model ${model.size}")
      assert(math.abs(baseS + netS - model.values.sum) < 1e-6,
        s"netted feed sum ${baseS + netS} != model ${model.values.sum}")
    }
    assert(merges > 0, s"seed $seed never merged — pick another seed")
  }

  for (seed <- Seq(808L, 4242L))
  test("COLUMN-MAPPING × DV interleavings: renames between inserts, " +
      "DV deletes (by old-era AND new-era column names), updates, " +
      "RESTORE across rename eras, optimize, auto-materialize and " +
      s"vacuum always read back as the model (seed $seed)") {
    val root = tempDir(s"gldvm-fuzz-$seed")
    val cat = s"gldvmfz$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // dv_max_ratio makes auto-materialization part of the interleaving
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('deletion_vectors'='true', " +
      "'column_mapping'='id', 'dv_max_ratio'='0.2')")
    val dir = s"$root/t"
    val rnd = new scala.util.Random(seed)
    val model = scala.collection.mutable.Map.empty[Long, Double]
    var nextId = 0L
    var vName = "v"
    var renames = 0
    var restores = 0
    var merges = 0
    // (version, model snapshot, value-column name) at recording time —
    // a restore rolls the DECLARED SCHEMA back too, so the column name
    // is part of the restored state
    val recorded = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Map[Long, Double], String)]

    def checkTip(label: String): Unit = {
      val got = spark.table(s"$cat.t")
        .agg(count(lit(1)), sum(vName)).head()
      assert(got.getLong(0) == model.size,
        s"$label: count ${got.getLong(0)} != model ${model.size}")
      val sumGot = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      assert(math.abs(sumGot - model.values.sum) < 1e-6,
        s"$label: sum $sumGot != model ${model.values.sum}")
    }

    (1 to 30).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 => // INSERT a fresh batch under the CURRENT name
          val n = 40 + rnd.nextInt(120)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            val v = rnd.nextInt(1000).toDouble
            model(id) = v
            (id, v)
          }
          import spark.implicits._
          rows.toDF("id", vName).createOrReplaceTempView("gldvmfz_in")
          spark.sql(s"INSERT INTO $cat.t SELECT * FROM gldvmfz_in")
        case 2 => // DV point delete by id (spans all column eras)
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(35))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 3 => // DV delete keyed on the RENAMED value column
          val live = model.toSeq
          if (live.nonEmpty) {
            val (id, v) = live(rnd.nextInt(live.length))
            val victims = model.collect {
              case (k, x) if x == v => k }.toSeq
            victims.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE $vName IN ($v)")
            val _ = id
          }
        case 4 => // merge-on-read UPDATE through the current name
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(25))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(k => model(k) = model(k) + 1000.0)
            spark.sql(s"UPDATE $cat.t SET $vName = $vName + 1000.0 " +
              s"WHERE id IN (${ks.mkString(",")})")
          }
        case 5 => // metadata-only RENAME of the value column
          renames += 1
          val next = s"v$renames"
          spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN $vName TO $next")
          vName = next
        case 6 => // OPTIMIZE or VACUUM
          if (rnd.nextBoolean())
            VersionedLake.compactSmall(spark, dir, Long.MaxValue)
          else VersionedLake.vacuum(spark, dir, retain = 6, graceMs = 0)
          ()
        case 7 => // RESTORE to a retained recorded version — on a
          // MAPPED lake this rolls the declared schema back across
          // rename eras too (the exact composition class the targeted
          // specs cannot enumerate): post-target vectors unapply via
          // the id-matched scoped rewrite, and the restored era's
          // (id, name) pairs re-record into the current mapping epoch
          val readable = VersionedLake.versions(spark, dir).toSet
          val targets = recorded.filter(r => readable(r._1))
          if (targets.nonEmpty) {
            val (tv, snap, name) = targets(rnd.nextInt(targets.length))
            if (VersionedLake.restore(spark, dir, tv).nonEmpty) {
              restores += 1
              model.clear()
              model ++= snap
              vName = name
            }
          }
        case 8 => // MERGE through the CURRENT column name — both
          // publish halves + inserts, across rename eras (the scan
          // and the staged rewrite must both bind by field id)
          val live = model.keys.toArray
          val picked =
            if (live.isEmpty) Seq.empty[Long]
            else (0 until (1 + rnd.nextInt(20)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
          val (delKs, updKs) = picked.partition(_ => rnd.nextInt(4) == 0)
          val insRows = (0 until (5 + rnd.nextInt(20))).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextInt(1000).toDouble)
          }
          val src = updKs.map(k => (k, model(k) + 5000.0, "u")) ++
            delKs.map(k => (k, 0.0, "d")) ++
            insRows.map { case (id, nv) => (id, nv, "i") }
          if (src.nonEmpty) {
            merges += 1
            updKs.foreach(k => model(k) = model(k) + 5000.0)
            delKs.foreach(model.remove)
            insRows.foreach { case (id, nv) => model(id) = nv }
            import spark.implicits._
            src.toDF("id", "nv", "act")
              .createOrReplaceTempView("gldvmfz_mrg")
            spark.sql(
              s"""MERGE INTO $cat.t AS t USING gldvmfz_mrg AS s
                 |ON t.id = s.id
                 |WHEN MATCHED AND s.act = 'd' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET `$vName` = s.nv
                 |WHEN NOT MATCHED THEN INSERT (id, `$vName`)
                 |VALUES (s.id, s.nv)""".stripMargin)
          }
        case 9 => // TAGGED update through the CURRENT name + an
          // immediate REPLAY: exactly-once must hold across rename
          // eras too (the replay's inert write still resolves the
          // current schema; the tag's derived uuid is era-free)
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(15))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(k => model(k) = model(k) + 7000.0)
            def run(): Unit = {
              spark.conf.set("spark.graft.lake.commitTag", s"fzm$step")
              try spark.sql(
                s"UPDATE $cat.t SET `$vName` = `$vName` + 7000.0 " +
                  s"WHERE id IN (${ks.mkString(",")})")
              finally spark.conf.unset("spark.graft.lake.commitTag")
            }
            run()
            run() // replay across the current mapping era: no-op
          }
      }
      checkTip(s"step $step")
      VersionedLake.tip(spark, dir).foreach { t =>
        if (recorded.lastOption.forall(_._1 != t))
          recorded += ((t, model.toMap, vName))
      }
    }
    assert(renames > 0, s"seed $seed never renamed — pick another seed")
    assert(restores > 0, s"seed $seed never restored — pick another seed")
    assert(merges > 0, s"seed $seed never merged — pick another seed")
  }

  for (seed <- Seq(90210L, 3031L))
  test("TRIPLE-composition fuzz — PARTITIONED x column_mapping x DV " +
      "with the STREAMING SINK in the loop: sink epochs, renames, DV " +
      "deletes, partition deletes, MoR updates, RESTORE across " +
      "REPLACE/rename/epoch boundaries, auto-materialization, " +
      s"optimize and vacuum always read back as the model (seed $seed)") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir(s"gldvt-fuzz-$seed")
    val cat = s"gldvtfz$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // dv_max_ratio puts AUTO-materialization into the interleaving;
    // the partition spec and the id mapping make this the full
    // three-feature composition the pair fuzzes cannot reach
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE, m INT) " +
      "PARTITIONED BY (m) TBLPROPERTIES ('deletion_vectors'='true', " +
      "'column_mapping'='id', 'dv_max_ratio'='0.2')")
    val dir = s"$root/t"
    val inDir = s"$root/in"
    val ck = s"$root/ck"
    val rnd = new scala.util.Random(seed)
    // id -> (value, partition)
    val model = scala.collection.mutable.Map.empty[Long, (Double, Int)]
    var nextId = 0L
    var vName = "v"
    var renames = 0
    var sinkEpochs = 0
    var replaces = 0
    var restores = 0
    var merges = 0
    // (version, model snapshot, value-column name): restore rolls the
    // declared schema back with the data, possibly across a REPLACE
    // boundary (a different id epoch) — the composition class where
    // the last two real bugs hid
    val recorded = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Map[Long, (Double, Int)], String)]

    def freshRows(n: Int): Seq[(Long, Double, Int)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val v = rnd.nextInt(1000).toDouble
        val m = (id % 3).toInt
        model(id) = (v, m)
        (id, v, m)
      }

    def checkTip(label: String): Unit = {
      val got = spark.table(s"$cat.t")
        .agg(count(lit(1)), sum(vName)).head()
      assert(got.getLong(0) == model.size,
        s"$label: count ${got.getLong(0)} != model ${model.size}")
      val sumGot = if (got.isNullAt(1)) 0.0 else got.getDouble(1)
      val want = model.values.map(_._1).sum
      assert(math.abs(sumGot - want) < 1e-6,
        s"$label: sum $sumGot != model $want")
      // one partition's count — a leaf lost by a rename/epoch/DV
      // interleaving diverges here even when the totals cancel
      val got0 = spark.table(s"$cat.t").filter(col("m") === 0).count()
      assert(got0 == model.values.count(_._2 == 0),
        s"$label: m=0 count $got0 != model")
    }

    (1 to 34).foreach { step =>
      rnd.nextInt(11) match {
        case 0 => // batch INSERT under the CURRENT name
          import spark.implicits._
          freshRows(40 + rnd.nextInt(100))
            .toDF("id", vName, "m").createOrReplaceTempView("gldvtfz_in")
          spark.sql(s"INSERT INTO $cat.t SELECT * FROM gldvtfz_in")
        case 1 | 2 => // STREAMING SINK epoch (append-mode, exactly-once)
          import spark.implicits._
          sinkEpochs += 1
          freshRows(30 + rnd.nextInt(80))
            .toDF("id", vName, "m").coalesce(1)
            .write.mode("append").parquet(inDir)
          val q = spark.readStream
            .schema(s"id BIGINT, `$vName` DOUBLE, m INT")
            .parquet(inDir)
            .writeStream.format("graftlake")
            .option("checkpointLocation", ck)
            .trigger(Trigger.AvailableNow())
            .start(dir)
          q.awaitTermination()
        case 3 => // DV point delete by id (spans eras and partitions)
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(35))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(model.remove)
            spark.sql(s"DELETE FROM $cat.t WHERE id IN " +
              s"(${ks.mkString(",")})")
          }
        case 4 => // manifest-only PARTITION delete
          val k = rnd.nextInt(3)
          model.filterInPlace { case (_, (_, m)) => m != k }
          spark.sql(s"DELETE FROM $cat.t WHERE m = $k")
        case 5 => // merge-on-read UPDATE through the current name
          val live = model.keys.toArray
          if (live.nonEmpty) {
            val ks = (0 until math.min(live.length,
              1 + rnd.nextInt(25))).map(_ => live(rnd.nextInt(live.length)))
              .distinct
            ks.foreach(k => model(k) = (model(k)._1 + 1000.0, model(k)._2))
            spark.sql(s"UPDATE $cat.t SET `$vName` = `$vName` + 1000.0 " +
              s"WHERE id IN (${ks.mkString(",")})")
          }
        case 6 => // metadata-only RENAME of the value column
          renames += 1
          val next = s"v$renames"
          spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN `$vName` TO `$next`")
          vName = next
        case 7 => // OPTIMIZE or VACUUM
          if (rnd.nextBoolean())
            VersionedLake.compactSmall(spark, dir, Long.MaxValue)
          else VersionedLake.vacuum(spark, dir, retain = 6, graceMs = 0)
          ()
        case 8 => // REPLACE TABLE: a new id EPOCH over the same
          // registries (partition spec kept, dv/mapping persist),
          // REUSING the current value-column name — the exact alias
          // hazard the epoch stamp exists for. The sink checkpoint
          // survives the replace and keeps appending afterwards.
          import spark.implicits._
          replaces += 1
          model.clear()
          freshRows(20 + rnd.nextInt(40))
            .toDF("id", vName, "m").createOrReplaceTempView("gldvtfz_rp")
          spark.sql(s"REPLACE TABLE $cat.t PARTITIONED BY (m) AS " +
            "SELECT * FROM gldvtfz_rp")
        case 9 => // RESTORE to a retained recorded version — possibly
          // ACROSS a replace (id epoch) or rename boundary, with sink
          // epochs, partition leaves and pending vectors in between;
          // the sink checkpoint survives and keeps appending after
          val readable = VersionedLake.versions(spark, dir).toSet
          val targets = recorded.filter(r => readable(r._1))
          if (targets.nonEmpty) {
            val (tv, snap, name) = targets(rnd.nextInt(targets.length))
            if (VersionedLake.restore(spark, dir, tv).nonEmpty) {
              restores += 1
              model.clear()
              model ++= snap
              vName = name
            }
          }
        case 10 => // MERGE across partitions, rename eras AND id
          // epochs: matched-update keeps the row's leaf, matched-
          // delete vectors it, not-matched-insert routes to its own
          // leaf — one commit, interleaving with sink epochs,
          // REPLACE and RESTORE
          val live = model.keys.toArray
          val picked =
            if (live.isEmpty) Seq.empty[Long]
            else (0 until (1 + rnd.nextInt(20)))
              .map(_ => live(rnd.nextInt(live.length))).distinct
          val (delKs, updKs) = picked.partition(_ => rnd.nextInt(4) == 0)
          val insRows = (0 until (5 + rnd.nextInt(20))).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextInt(1000).toDouble, (id % 3).toInt)
          }
          val src = updKs.map(k =>
            (k, model(k)._1 + 5000.0, model(k)._2, "u")) ++
            delKs.map(k => (k, 0.0, model(k)._2, "d")) ++
            insRows.map { case (id, nv, m) => (id, nv, m, "i") }
          if (src.nonEmpty) {
            merges += 1
            updKs.foreach(k =>
              model(k) = (model(k)._1 + 5000.0, model(k)._2))
            delKs.foreach(model.remove)
            insRows.foreach { case (id, nv, m) => model(id) = (nv, m) }
            import spark.implicits._
            src.toDF("id", "nv", "m", "act")
              .createOrReplaceTempView("gldvtfz_mrg")
            spark.sql(
              s"""MERGE INTO $cat.t AS t USING gldvtfz_mrg AS s
                 |ON t.id = s.id
                 |WHEN MATCHED AND s.act = 'd' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET `$vName` = s.nv
                 |WHEN NOT MATCHED THEN INSERT (id, `$vName`, m)
                 |VALUES (s.id, s.nv, s.m)""".stripMargin)
          }
      }
      checkTip(s"step $step")
      VersionedLake.tip(spark, dir).foreach { t =>
        if (recorded.lastOption.forall(_._1 != t))
          recorded += ((t, model.toMap, vName))
      }
    }
    assert(renames > 0, s"seed $seed never renamed — pick another seed")
    assert(sinkEpochs > 0, s"seed $seed never streamed — pick another")
    assert(replaces > 0, s"seed $seed never replaced — pick another")
    assert(restores > 0, s"seed $seed never restored — pick another seed")
    assert(merges > 0, s"seed $seed never merged — pick another seed")
  }
}
