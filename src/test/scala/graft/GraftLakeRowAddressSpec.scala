package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

/** Row-address metadata columns on the PLAIN read path: a DV lake
  * advertises `__graft_file`/`__graft_pos` ([[GraftLakeTable
  * .metadataColumns]]), so `SELECT __graft_file, __graft_pos FROM t`
  * is a reachable user query — it must route through the delta-scan
  * wrapper that synthesizes the columns. An ordinary parquet scan
  * would emit all-NULLs for columns the files do not store (declared
  * non-nullable!) — silently wrong results, the exact failure this
  * spec pins against. */
class GraftLakeRowAddressSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private def withCatalog[A](root: String)(body: String => A): A = {
    val cat = s"glra_${new java.io.File(root).getName.takeRight(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    body(cat)
  }

  test("SELECT __graft_file/__graft_pos on a flat DV lake synthesizes " +
      "real row addresses — never NULL, unique per row, positions " +
      "stable across a DV delete, and exact under a pushed filter") {
    val root = tempDir("glra-flat")
    withCatalog(root) { cat =>
      spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES " +
        "('deletion_vectors'='true') AS " +
        "SELECT id, CAST(id AS DOUBLE) AS v FROM range(0, 5000)")
      spark.sql(s"INSERT INTO $cat.t " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(5000, 9000)")
      val addr0 = spark.sql(s"SELECT __graft_file AS f, __graft_pos " +
        s"AS p, id FROM $cat.t").cache()
      try {
        assert(addr0.count() == 9000)
        assert(addr0.filter(col("f").isNull || col("p").isNull)
          .count() == 0, "row addresses must never be NULL")
        assert(addr0.select("f", "p").distinct().count() == 9000,
          "(file, pos) must be a unique row id")
        // the file key is manifest-relative (dataDir/fileName) and
        // every key resolves to a real on-disk file
        val keys = addr0.select("f").distinct().collect()
          .map(_.getString(0))
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        keys.foreach { k =>
          assert(k.count(_ == '/') == 1, s"key $k not dataDir/file")
          assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/t/$k")),
            s"key $k does not resolve on disk")
        }
        // per-file positions are the parquet row indexes: 0..n-1
        val spans = addr0.groupBy("f")
          .agg(min("p").as("lo"), max("p").as("hi"),
            count(lit(1)).as("n")).collect()
        spans.foreach { r =>
          assert(r.getLong(1) == 0L, s"file ${r.getString(0)} lo != 0")
          assert(r.getLong(2) == r.getLong(3) - 1,
            s"file ${r.getString(0)} positions not contiguous")
        }
      } finally { addr0.unpersist(); () }
      // a pushed data filter must not disturb the addresses (the row
      // index machinery is exact under row-group skipping)
      val some = spark.sql(s"SELECT __graft_pos AS p, id FROM $cat.t " +
        "WHERE id BETWEEN 100 AND 110")
      assert(some.count() == 11)
      assert(some.filter(col("p").isNull).count() == 0)
      // DV delete: victims' addresses disappear; SURVIVORS KEEP their
      // original positions (a position is an identity, not a rank)
      val before = spark.sql(s"SELECT __graft_file AS f, __graft_pos " +
        s"AS p, id FROM $cat.t WHERE id IN (4998, 4999, 5000, 5001)")
        .collect().map(r => r.getLong(2) -> (r.getString(0),
          r.getLong(1))).toMap
      spark.sql(s"DELETE FROM $cat.t WHERE id IN (4999, 5000)")
      val after = spark.sql(s"SELECT __graft_file AS f, __graft_pos " +
        s"AS p, id FROM $cat.t WHERE id IN (4998, 4999, 5000, 5001)")
        .collect().map(r => r.getLong(2) -> (r.getString(0),
          r.getLong(1))).toMap
      assert(after.keySet == Set(4998L, 5001L),
        "deleted rows must not be addressable")
      assert(after(4998L) == before(4998L) &&
        after(5001L) == before(5001L),
        "survivor addresses must be stable across a DV delete")
    }
  }

  test("row addresses on a PARTITIONED x column-mapped DV lake key by " +
      "the full leaf-relative path, and aggregate exactly per file") {
    val root = tempDir("glra-part")
    withCatalog(root) { cat =>
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE, m INT) " +
        "PARTITIONED BY (m) TBLPROPERTIES ('deletion_vectors'='true', " +
        "'column_mapping'='id')")
      spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE), " +
        "CAST(id % 3 AS INT) FROM range(0, 3000)")
      val addr = spark.sql(s"SELECT __graft_file AS f, __graft_pos AS " +
        s"p, m FROM $cat.t")
      assert(addr.count() == 3000)
      assert(addr.filter(col("f").isNull).count() == 0)
      // leaf-relative: dataDir/m=K/fileName — and the leaf value in
      // the key agrees with the row's partition column
      val mism = addr.filter(!col("f").contains(
        concat(lit("/m="), col("m"), lit("/")))).count()
      assert(mism == 0, "file key leaf must match the partition value")
      assert(addr.select("f", "p").distinct().count() == 3000)
    }
  }

  test("a lake WITHOUT deletion vectors does not advertise the " +
      "row-address columns — the projection fails at analysis " +
      "instead of reading fabricated NULLs") {
    val root = tempDir("glra-novec")
    withCatalog(root) { cat =>
      spark.sql(s"CREATE TABLE $cat.t AS SELECT id FROM range(0, 10)")
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT __graft_pos FROM $cat.t").collect()
      }
      assert(e.getMessage.contains("__graft_pos"))
    }
  }
}
