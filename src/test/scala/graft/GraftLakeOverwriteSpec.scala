package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** `df.writeTo("glake.t").overwrite(cond)` — replaceWhere through the
  * DSv2 seam: one atomic versioned commit, stats-pruned rewrite for
  * interval conditions, exact three-valued-logic semantics for the
  * full pushed-filter algebra, truncate fallthrough, and clean refusal
  * of untranslatable conditions. */
class GraftLakeOverwriteSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private def catalogFor(alias: String, lake: String): String = {
    spark.conf.set(s"spark.sql.catalog.$alias",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$alias.root",
      new java.io.File(lake).getParent)
    s"$alias.`${new java.io.File(lake).getName}`"
  }

  test("range overwrite: one atomic version, survivors exact, the " +
      "non-intersecting band carried by manifest reference") {
    val root = tempDir("glow-range")
    val lake = s"$root/lake"
    val base = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    VersionedLake.commitWithStats(
      base.filter(col("id") < 500), lake, Seq("id"))
    VersionedLake.commitWithStats(
      base.filter(col("id") >= 500), lake, Seq("id"))
    val tbl = catalogFor("glake_ow1", lake)
    val dirsV1 = VersionedLake.manifestEntries(spark, lake, 1)
    val bandB = VersionedLake.manifestEntries(spark, lake, 2).diff(dirsV1)

    spark.range(100, 200).selectExpr("id", "id * 100 AS v")
      .writeTo(tbl).overwrite(col("id") >= 100 && col("id") < 200)

    assert(VersionedLake.versions(spark, lake) == Seq(1, 2, 3),
      "replaceWhere must be ONE commit (delete + insert together)")
    val dirsV3 = VersionedLake.manifestEntries(spark, lake, 3)
    assert(bandB.forall(dirsV3.contains),
      "the provably-non-matching band must survive by reference")
    assert(!dirsV3.exists(dirsV1.contains),
      "the intersecting band must have been rewritten")
    val tip = spark.read.format("graftlake").load(lake)
    assert(tip.count() == 1000)
    assert(tip.filter(col("id").between(100, 199))
      .filter(col("v") =!= col("id") * 100).count() == 0)
    assert(tip.filter(!col("id").between(100, 199))
      .filter(col("v") =!= col("id") * 2).count() == 0)
    // pre-overwrite snapshot intact through time travel
    assert(VersionedLake.readAt(spark, lake, 2)
      .agg(sum("v")).head().getLong(0) == (0L until 1000L).map(_ * 2).sum)
  }

  test("NULL-keyed rows are NOT matched by a range condition and " +
      "survive the overwrite (three-valued logic)") {
    val root = tempDir("glow-null")
    val lake = s"$root/lake"
    VersionedLake.commit(spark.sql(
      """SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS k,
        |       id AS x FROM range(0, 30)""".stripMargin)
      .repartition(1), lake)
    val tbl = catalogFor("glake_ow2", lake)
    spark.sql("SELECT CAST(NULL AS LONG) AS k, -1L AS x WHERE false")
      .writeTo(tbl).overwrite(col("k") >= 0L) // matches every non-null k
    val tip = spark.read.format("graftlake").load(lake)
    assert(tip.count() == 10, "exactly the NULL-keyed rows survive")
    assert(tip.filter(col("k").isNotNull).count() == 0)
  }

  test("non-interval conditions (string prefix, IN) evaluate exactly " +
      "through the full-rewrite path") {
    val root = tempDir("glow-rich")
    val lake = s"$root/lake"
    VersionedLake.commit(spark.sql(
      """SELECT concat(CASE WHEN id % 2 = 0 THEN 'web_' ELSE 'app_' END,
        |              id) AS name, id AS x FROM range(0, 20)""".stripMargin)
      .repartition(1), lake)
    val tbl = catalogFor("glake_ow3", lake)
    spark.sql("SELECT 'web_all' AS name, 9999L AS x")
      .writeTo(tbl).overwrite(col("name").startsWith("web_"))
    val tip = spark.read.format("graftlake").load(lake)
    assert(tip.filter(col("name").startsWith("app_")).count() == 10)
    assert(tip.filter(col("name").startsWith("web_")).count() == 1)
    assert(tip.count() == 11)

    spark.sql("SELECT 'app_1n3' AS name, -5L AS x")
      .writeTo(tbl).overwrite(col("name").isin("app_1", "app_3"))
    val tip2 = spark.read.format("graftlake").load(lake)
    assert(tip2.count() == 10)
    assert(tip2.filter(col("x") === -5L).count() == 1)
    assert(tip2.filter(col("name").isin("app_1", "app_3")).count() == 0)
  }

  test("a contradictory (provably empty) interval deletes nothing — " +
      "the commit is a pure append") {
    val root = tempDir("glow-empty")
    val lake = s"$root/lake"
    VersionedLake.commitWithStats(
      spark.range(0, 50).selectExpr("id", "id AS v"), lake, Seq("id"))
    val tbl = catalogFor("glake_ow4", lake)
    val dirsV1 = VersionedLake.manifestEntries(spark, lake, 1)
    spark.range(1000, 1010).selectExpr("id", "id AS v")
      .writeTo(tbl).overwrite(col("id") > 10L && col("id") < 5L)
    val dirsV2 = VersionedLake.manifestEntries(spark, lake, 2)
    assert(dirsV1.forall(dirsV2.contains),
      "nothing matched: every prior dir survives by reference")
    assert(spark.read.format("graftlake").load(lake).count() == 60)
  }

  test("overwrite(true) falls through to the manifest-level truncate") {
    val root = tempDir("glow-trunc")
    val lake = s"$root/lake"
    VersionedLake.commit(
      spark.range(0, 40).selectExpr("id", "id AS v"), lake)
    val tbl = catalogFor("glake_ow5", lake)
    spark.range(0, 3).selectExpr("id", "id * 7 AS v")
      .writeTo(tbl).overwrite(lit(true))
    val tip = spark.read.format("graftlake").load(lake)
    assert(tip.count() == 3)
    assert(VersionedLake.readAt(spark, lake, 1).count() == 40,
      "truncate keeps history time-travelable")
  }

  test("an untranslatable condition is refused at analysis, never a " +
      "wrong-rows commit") {
    val root = tempDir("glow-refuse")
    val lake = s"$root/lake"
    VersionedLake.commit(
      spark.range(0, 10).selectExpr("id", "id AS v"), lake)
    val tbl = catalogFor("glake_ow6", lake)
    // Spark 4.1.2 consults canOverwrite at plan time and refuses with
    // "Table does not support overwrite by expression" (a plain
    // SparkException, not AnalysisException) — the point is it fails
    // BEFORE any commit, never with wrong rows.
    val e = intercept[org.apache.spark.SparkException] {
      spark.range(0, 1).selectExpr("id", "id AS v")
        .writeTo(tbl).overwrite(col("id") % 2 === 0)
    }
    assert(e.getMessage.contains("does not support overwrite by expression"))
    assert(VersionedLake.versions(spark, lake) == Seq(1),
      "the refused overwrite must not have committed anything")
  }
}
