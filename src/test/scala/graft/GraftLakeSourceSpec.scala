package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** The `graftlake` DSv2 format: snapshot/time-travel equivalence with
  * the library path, sidecar file pruning reaching a plain
  * `spark.read`, native-parquet plan shape, and the retention error
  * contract through the V2 seam. */
class GraftLakeSourceSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private def v2(dir: String, version: Option[Int] = None) = {
    val r = spark.read.format("graftlake")
    version.fold(r)(v => r.option(GraftLakeDataSource.VersionAsOf, v))
      .load(dir)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("format(graftlake) reads the latest snapshot and every " +
      "versionAsOf identically to the library path") {
    import spark.implicits._
    val dir = tempDir("glsrc-tt") + "/lake"
    VersionedLake.commit(spark.range(0, 100).toDF("id"), dir)
    VersionedLake.commit(spark.range(100, 200).toDF("id"), dir)
    VersionedLake.commit(spark.range(0, 30).toDF("id"), dir,
      mode = "overwrite")
    assert(rows(v2(dir)) == rows(VersionedLake.readLatest(spark, dir)))
    VersionedLake.versions(spark, dir).foreach { v =>
      assert(rows(v2(dir, Some(v))) ==
        rows(VersionedLake.readAt(spark, dir, v)),
        s"V2 read of version $v diverged from the library read")
    }
    // an expired/unknown version fails with the retention error, not a
    // raw FileNotFoundException
    val e = intercept[IllegalArgumentException](v2(dir, Some(99)).collect())
    assert(e.getMessage.contains("readable versions"), e.getMessage)
  }

  test("pushed range filter prunes files through the manifest stats " +
      "sidecar; results equal the unpruned filter") {
    import spark.implicits._
    val dir = tempDir("glsrc-skip") + "/lake"
    // 8 near-disjoint id ranges, one file each, stats recorded
    VersionedLake.commitWithStats(
      spark.range(0, 8000).toDF("id")
        .withColumn("v", col("id") * 3)
        .repartitionByRange(8, col("id"))
        .sortWithinPartitions("id"),
      dir, statsCols = Seq("id"))
    val probe = v2(dir).filter(col("id") >= 2000 && col("id") <= 2999)
    val total = VersionedLake.readLatest(spark, dir).inputFiles.length
    val read = GraftLakeDataSource.filesRead(probe)
    assert(total >= 4, s"fixture produced only $total files")
    assert(read < total, s"pushed range read $read/$total files")
    assert(rows(probe) == rows(VersionedLake.readLatest(spark, dir)
      .filter(col("id") >= 2000 && col("id") <= 2999)))
    // control: the unfiltered V2 read plans every file
    assert(GraftLakeDataSource.filesRead(v2(dir)) == total)
  }

  test("pushed equality filter prunes files through the bloom sidecar " +
      "even when ranges cannot skip") {
    import spark.implicits._
    val dir = tempDir("glsrc-bloom") + "/lake"
    // hash-distributed: every file's id RANGE spans the table, only the
    // bloom can skip
    VersionedLake.commitWithBloom(
      spark.range(0, 6000).toDF("id").withColumn("v", col("id") % 7)
        .repartition(12, col("id")),
      dir, keyCol = "id")
    val total = VersionedLake.readLatest(spark, dir).inputFiles.length
    val hit = v2(dir).filter(col("id") === 137L)
    assert(GraftLakeDataSource.filesRead(hit) < total,
      s"bloom did not prune: ${GraftLakeDataSource.filesRead(hit)}/$total")
    assert(rows(hit) == Seq(Seq(137L, 137L % 7)))
    val miss = v2(dir).filter(col("id") === 987654321L)
    assert(GraftLakeDataSource.filesRead(miss) <= 1,
      "absent key should bloom-negative almost every file")
    assert(miss.count() == 0)
  }

  test("the V2 scan is the native vectorized parquet path (BatchScan + " +
      "pushed filters), and a snapshot spanning schema evolution merges") {
    import spark.implicits._
    val dir = tempDir("glsrc-native") + "/lake"
    VersionedLake.commit(spark.range(0, 50).toDF("id"), dir)
    VersionedLake.commit(
      spark.range(50, 60).toDF("id").withColumn("lang", lit("en")), dir)
    val df = v2(dir).filter(col("id") > 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"not a DSv2 scan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,10)]"),
      s"filter not pushed to the parquet reader:\n$plan")
    // evolution: old files read null for the added column
    val got = df.select("id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(11L).isEmpty && got(55L).contains("en"))
    assert(got.size == 49)
  }

  test("SQL reaches the lake through the catalog: plain SELECT reads " +
      "latest, VERSION AS OF time-travels, DDL is refused") {
    import spark.implicits._
    val base = tempDir("glsrc-cat")
    val dir = s"$base/events_lake"
    VersionedLake.commit(spark.range(0, 10).toDF("id"), dir)
    VersionedLake.commit(spark.range(10, 25).toDF("id"), dir)
    spark.conf.set("spark.sql.catalog.glake_test",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glake_test.root", base)
    assert(spark.sql("SELECT count(*) AS n FROM glake_test.events_lake")
      .head().getLong(0) == 25L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM glake_test.events_lake VERSION AS OF 1")
      .head().getLong(0) == 10L)
    // the V2 seam composes: a filter through SQL still prunes row-level
    assert(spark.sql(
      "SELECT id FROM glake_test.events_lake WHERE id = 7")
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    val e = intercept[Exception](
      spark.sql("DROP TABLE glake_test.events_lake"))
    assert(e.getMessage.contains("read-only"), e.getMessage)
    // discovery: the lake dir is listed as a table of the catalog
    val cat = new GraftLakeCatalog
    cat.initialize("t",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", base)))
    assert(cat.listTables(Array.empty).map(_.name).toSeq ==
      Seq("events_lake"))
  }

  test("readStream over the lake consumes each version as its own " +
      "micro-batch, picks up versions published mid-stream, and a " +
      "restart resumes from the checkpoint without re-delivery") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("glsrc-stream")
    val dir = s"$root/lake"
    VersionedLake.commit(spark.range(0, 10).toDF("id"), dir)
    VersionedLake.commit(spark.range(10, 20).toDF("id"), dir)

    def drain(sinkTable: String): Unit = {
      val q = spark.readStream.format("graftlake").load(dir)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/cp")
        .format("parquet").option("path", s"$root/sink")
        .start()
      q.awaitTermination()
    }
    drain("s1")
    def sink() = spark.read.parquet(s"$root/sink")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sink() == (0L until 20L))
    // versions published AFTER the first drain arrive incrementally —
    // the restarted stream reads ONLY the new version's files
    VersionedLake.commit(spark.range(20, 25).toDF("id"), dir)
    drain("s2")
    assert(sink() == (0L until 25L), "new version not consumed")
    // replay safety: draining again with the same checkpoint delivers
    // nothing new (offsets are versions; data dirs immutable)
    drain("s3")
    assert(sink() == (0L until 25L), "replay double-delivered rows")
  }

  test("streaming refuses a non-append history step instead of " +
      "silently double-delivering rewritten rows") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("glsrc-stream-ow")
    val dir = s"$root/lake"
    VersionedLake.commit(spark.range(0, 10).toDF("id"), dir)
    val q1 = spark.readStream.format("graftlake").load(dir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/cp")
      .format("parquet").option("path", s"$root/sink")
      .start()
    q1.awaitTermination()
    VersionedLake.commit(spark.range(100, 103).toDF("id"), dir,
      mode = "overwrite")
    val q2 = spark.readStream.format("graftlake").load(dir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/cp")
      .format("parquet").option("path", s"$root/sink")
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q2.awaitTermination())
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")),
      s"wrong failure: ${e.getMessage}")
  }

  test("count/min/max through the V2 path push down to parquet " +
      "metadata (inherited aggregate pushdown)") {
    import spark.implicits._
    val dir = tempDir("glsrc-agg") + "/lake"
    VersionedLake.commit(spark.range(0, 500).toDF("id"), dir)
    VersionedLake.commit(spark.range(500, 800).toDF("id"), dir)
    val df = v2(dir).agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"aggregate not pushed to the parquet footer read:\n$plan")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((800L, 0L, 799L)))
  }

  test("compactZOrder: a range probe on EITHER dimension alone prunes " +
      "files through the V2 path — the rectangle property a 1-D sort " +
      "cannot give") {
    import spark.implicits._
    val dir = tempDir("glsrc-zorder") + "/lake"
    // full 256×256 grid, one row per (a, b) cell
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    VersionedLake.commit(grid.repartition(16), dir)
    VersionedLake.compactZOrder(spark, dir, "a", "b", nFiles = 16,
      bits = 8)
    val total = VersionedLake.readLatest(spark, dir).inputFiles.length
    assert(total >= 8, s"fixture produced only $total files")
    val aProbe = v2(dir).filter(col("a") >= 0 && col("a") <= 15)
    val bProbe = v2(dir).filter(col("b") >= 0 && col("b") <= 15)
    val (aRead, bRead) = (GraftLakeDataSource.filesRead(aProbe),
      GraftLakeDataSource.filesRead(bProbe))
    assert(aRead < total, s"a-dim probe read $aRead/$total files")
    assert(bRead < total, s"b-dim probe read $bRead/$total files")
    // layout commits never change data
    assert(aProbe.count() == 16L * 256 && bProbe.count() == 16L * 256)
    assert(VersionedLake.readLatest(spark, dir).count() == 65536L)
  }

  test("startingVersion bounds the initial backfill") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("glsrc-stream-sv")
    val dir = s"$root/lake"
    VersionedLake.commit(spark.range(0, 10).toDF("id"), dir)
    VersionedLake.commit(spark.range(10, 20).toDF("id"), dir)
    val q = spark.readStream.format("graftlake")
      .option(GraftLakeDataSource.StartingVersion, 2).load(dir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/cp")
      .format("parquet").option("path", s"$root/sink")
      .start()
    q.awaitTermination()
    // version 2 ADDED only the second commit's dir: ids 10..19
    assert(spark.read.parquet(s"$root/sink").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (10L until 20L))
  }
}
