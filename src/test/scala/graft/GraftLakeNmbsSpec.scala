package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** `WHEN NOT MATCHED BY SOURCE` (Spark 4's third MERGE clause family)
  * on both row-level regimes. The hazard class: unmatched TARGET rows
  * become actionable, so any file/group pruning driven by the SOURCE's
  * keys would silently skip rows the clause must act on (a pruned
  * file's rows are all unmatched-by-source!). These specs prove the
  * semantics are exact AND that the pruning surfaces are disabled for
  * this variant — Spark plans the target-source join FULL OUTER, which
  * pushes no data filters to the target scan, and the join-driven
  * runtime filter rule ([[org.apache.spark.sql.graft
  * .InjectDeltaRuntimeFilter]]) fires only on Inner/LeftSemi/
  * RightOuter, never FullOuter. */
class GraftLakeNmbsSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private def withCatalog[A](root: String)(body: String => A): A = {
    val cat = s"glnm_${new java.io.File(root).getName.takeRight(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    body(cat)
  }

  test("all FIVE clause families in one merge-on-read MERGE: matched " +
      "update, not-matched insert, NMBS delete + NMBS update are " +
      "exact; the plan is a FullOuter join with NO pushed filters and " +
      "NO runtime pruning on the target (pruning would lose " +
      "unmatched-by-source rows)") {
    val root = tempDir("glnm-flat")
    withCatalog(root) { cat =>
      val dir = s"$root/t"
      // a DV table with multiple stats-indexed commits, so pruning
      // WOULD bite if the planner (wrongly) enabled it for this
      // variant
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('deletion_vectors'='true')")
      Seq((0L, 500L), (500L, 1000L), (1000L, 1500L), (1500L, 2000L))
        .foreach { case (lo, hi) =>
          VersionedLake.commitIndexed(
            spark.range(lo, hi).toDF("id")
              .withColumn("v", col("id").cast("double")).coalesce(1),
            dir, Seq("id"), None)
        }
      spark.range(100, 200).selectExpr("id AS k",
        "CAST(-1.0 AS DOUBLE) AS nv")
        .union(spark.range(9000, 9010).selectExpr("id AS k",
          "CAST(-2.0 AS DOUBLE) AS nv"))
        .createOrReplaceTempView("glnm_src")
      @volatile var captured
          : Option[org.apache.spark.sql.execution.QueryExecution] = None
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          if (qe.executedPlan.getClass.getSimpleName
              .startsWith("WriteDelta"))
            captured = Some(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        spark.sql(
          s"""MERGE INTO $cat.t AS t USING glnm_src AS s
             |ON t.id = s.k
             |WHEN MATCHED THEN UPDATE SET v = s.nv
             |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.k, s.nv)
             |WHEN NOT MATCHED BY SOURCE AND t.id >= 1900 THEN DELETE
             |WHEN NOT MATCHED BY SOURCE AND t.id % 100 = 0
             |  THEN UPDATE SET v = CAST(0.0 AS DOUBLE)
             |""".stripMargin)
        val deadline = System.currentTimeMillis() + 10000
        while (captured.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val qe = captured.getOrElse(fail(
          "listener captured no delta-write plan"))
        // plan guarantees: FullOuter join, target scan with no pushed
        // data filters, no DynamicPruning filter above the relation
        val joins = qe.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
        assert(joins.nonEmpty &&
          joins.head.joinType.sql.contains("FULL"),
          s"NMBS merge must plan a FullOuter join: ${joins.map(_.joinType)}")
        qe.optimizedPlan.foreach {
          case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation
              if r.scan.isInstanceOf[GraftLakeDeltaScan] =>
            val sc = r.scan.asInstanceOf[GraftLakeDeltaScan]
            assert(sc.pushedFilters.isEmpty,
              s"NMBS target scan must push NO data filters: ${
                sc.pushedFilters.mkString(",")}")
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            assert(!f.condition.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                .DynamicPruning]),
              "NMBS target must receive NO runtime pruning filter")
          case _ => ()
        }
        // semantics: 100..199 updated to -1; 9000..9009 inserted;
        // 1900..1999 deleted; multiples of 100 outside the source
        // range zeroed; everything else untouched
        val t = spark.table(s"$cat.t")
        assert(t.count() == 2000 - 100 + 10)
        assert(t.filter(col("id").between(100, 199) &&
          col("v") =!= -1.0).count() == 0)
        assert(t.filter(col("id") >= 9000).count() == 10)
        assert(t.filter(col("id") >= 1900 && col("id") < 2000)
          .count() == 0, "NMBS DELETE must reach every unmatched row")
        assert(t.filter(col("id") % 100 === 0 && col("id") < 100 &&
          col("v") =!= 0.0).count() == 0,
          "NMBS UPDATE must reach every unmatched multiple of 100")
        assert(t.filter(col("id") === 300).head().getDouble(1) == 0.0)
        assert(t.filter(col("id") === 301).head().getDouble(1) == 301.0)
        // and it commits merge-on-read: positions sidecar at the tip
        val tip = VersionedLake.tip(spark, dir).get
        assert(VersionedLake.isDvCommit(spark, dir, tip))
      } finally spark.listenerManager.unregister(listener)
    }
  }

  test("NMBS x deletion vectors: rows an earlier vector deleted are " +
      "NOT addressable as unmatched-by-source (no double delete, no " +
      "resurrection), across time travel") {
    val root = tempDir("glnm-dv")
    withCatalog(root) { cat =>
      spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES " +
        "('deletion_vectors'='true') AS " +
        "SELECT id, CAST(id AS DOUBLE) AS v FROM range(0, 1000)")
      val dir = s"$root/t"
      spark.sql(s"DELETE FROM $cat.t WHERE id < 100")
      val vAfterDelete = VersionedLake.tip(spark, dir).get
      spark.range(500, 600).toDF("k")
        .createOrReplaceTempView("glnm_dv_src")
      // source matches 500..599; EVERY other live row is unmatched
      spark.sql(
        s"""MERGE INTO $cat.t AS t USING glnm_dv_src AS s
           |ON t.id = s.k
           |WHEN NOT MATCHED BY SOURCE THEN DELETE
           |""".stripMargin)
      val t = spark.table(s"$cat.t")
      assert(t.count() == 100, "only the matched rows survive")
      assert(t.filter(col("id") < 500 || col("id") >= 600)
        .count() == 0)
      // the pre-vectored rows were not double-reported: the NMBS
      // commit's sidecar covers exactly the 800 live unmatched rows
      val tip = VersionedLake.tip(spark, dir).get
      val prevCount = VersionedLake.dvRefs(spark, dir, vAfterDelete)
        .values.map(_.count).sum
      val tipCount = VersionedLake.dvRefs(spark, dir, tip)
        .values.map(_.count).sum
      assert(tipCount - prevCount == 800,
        s"NMBS delete must vector exactly the live unmatched rows, " +
          s"got ${tipCount - prevCount}")
      // time travel below the NMBS merge still sees the first delete
      assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF " +
        s"$vAfterDelete").head().getLong(0) == 900)
    }
  }

  test("NMBS on a PARTITIONED x column-mapped DV lake: clauses act " +
      "across every leaf and rename era") {
    val root = tempDir("glnm-part")
    withCatalog(root) { cat =>
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE, m INT) " +
        "PARTITIONED BY (m) TBLPROPERTIES ('deletion_vectors'='true', " +
        "'column_mapping'='id')")
      spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE), " +
        "CAST(id % 3 AS INT) FROM range(0, 900)")
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO val")
      spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE), " +
        "CAST(id % 3 AS INT) FROM range(900, 1200)")
      spark.range(0, 1200, 2).toDF("k")
        .createOrReplaceTempView("glnm_part_src")
      // odd ids are unmatched: zero them in place (both rename eras,
      // all three leaves)
      spark.sql(
        s"""MERGE INTO $cat.t AS t USING glnm_part_src AS s
           |ON t.id = s.k
           |WHEN NOT MATCHED BY SOURCE
           |  THEN UPDATE SET val = CAST(-9.0 AS DOUBLE)
           |""".stripMargin)
      val t = spark.table(s"$cat.t")
      assert(t.count() == 1200)
      assert(t.filter(col("id") % 2 === 1 && col("val") =!= -9.0)
        .count() == 0, "every odd row in every leaf/era must update")
      assert(t.filter(col("id") % 2 === 0 &&
        col("val") =!= col("id").cast("double")).count() == 0,
        "matched rows must be untouched")
      // per-leaf exactness
      (0 until 3).foreach { m =>
        assert(t.filter(col("m") === m && col("val") === -9.0)
          .count() == 200, s"leaf m=$m")
      }
    }
  }

  test("NMBS on a COPY-ON-WRITE lake (no vectors): runtime group " +
      "filtering must not prune dirs whose rows are all " +
      "unmatched-by-source") {
    val root = tempDir("glnm-cow")
    withCatalog(root) { cat =>
      val dir = s"$root/t"
      Seq((0L, 250L), (250L, 500L), (500L, 750L), (750L, 1000L))
        .foreach { case (lo, hi) =>
          VersionedLake.commitIndexed(
            spark.range(lo, hi).toDF("id")
              .withColumn("v", col("id").cast("double")).coalesce(1),
            dir, Seq("id"), None)
        }
      // source keys confined to ONE dir's range: with (wrong) group
      // filtering the other three dirs would be pruned and their
      // unmatched rows silently survive the delete
      spark.range(100, 200).toDF("k")
        .createOrReplaceTempView("glnm_cow_src")
      spark.sql(
        s"""MERGE INTO $cat.t AS t USING glnm_cow_src AS s
           |ON t.id = s.k
           |WHEN MATCHED THEN UPDATE SET v = CAST(-1.0 AS DOUBLE)
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 900 THEN DELETE
           |""".stripMargin)
      val t = spark.table(s"$cat.t")
      assert(t.count() == 900,
        "the NMBS delete must reach the dir the source keys miss")
      assert(t.filter(col("v") === -1.0).count() == 100)
      assert(t.filter(col("id") >= 900).count() == 0)
      assert(t.filter(col("id").between(200, 899) &&
        col("v") =!= col("id").cast("double")).count() == 0)
    }
  }
}
