package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** Regression for reference defect D1 (sparkle-v9.py:128-138): the
  * reference unioned the existing lake with each new batch and appended
  * the union, duplicating all pre-existing rows on every ingest. Our
  * writer appends only the new batch — row accounting must be exactly
  * additive across repeated ingests. */
class LakeSpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  private val A = EegFixture.specA
  private val B = EegFixture.specB

  test("repeated ingestBatch is additive — no D1 union duplication") {
    val root = tempDir("lake-d1")
    val lake = s"$root/lake"

    def batch(specs: EegFileSpec*): Unit = {
      val in = s"$root/in"
      specs.foreach(EegFixture.write(in, _))
      Ingest.ingestBatch(spark, in, lake, s"$root/registry", s"$root/processed")
    }

    batch(A)
    assert(Lake.read(spark, lake).count() == A.nRows)

    batch(B)
    assert(Lake.read(spark, lake).count() == A.nRows + B.nRows)

    // Same content under a new file name — a third batch must add exactly
    // its own rows again (the D1 bug would re-append the whole lake).
    batch(A.copy(fileName = "PUH-2019-042_02.csv"))
    assert(Lake.read(spark, lake).count() == 2L * A.nRows + B.nRows)

    // Partition accounting: every partition count is a multiple of its
    // single-ingest count (A's partitions doubled, B's unchanged).
    val counts = Lake.partitionCounts(spark, lake).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(counts((2019, 7, 15)) == 2L * counts.getOrElse((2020, 3, 1), 0L) ||
      counts((2019, 7, 15)) % 2 == 0) // A rows ingested twice → even counts
    assert(counts.values.sum == 2L * A.nRows + B.nRows)
  }

  test("lake layout is Hive-partitioned Year=/Month=/Day= (K1)") {
    val root = tempDir("lake-layout")
    val lake = s"$root/lake"
    val in = s"$root/in"
    EegFixture.write(in, A)
    Ingest.ingestBatch(spark, in, lake, s"$root/registry", s"$root/processed")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$lake/Year=2019/Month=7/Day=15")))
    // empty input dir → F4 guard: no-op, lake untouched
    val before = Lake.read(spark, lake).count()
    assert(Ingest.ingestBatch(spark, in, lake, s"$root/registry",
      s"$root/processed").isEmpty)
    assert(Lake.read(spark, lake).count() == before)
    // partition pruning survives the layout: a Day filter reads one partition
    val pruned = Lake.read(spark, lake)
      .filter(org.apache.spark.sql.functions.col("Day") === 15)
    assert(pruned.count() == counts20190715(lake))
  }

  private def counts20190715(lake: String): Long =
    Lake.read(spark, lake)
      .filter("Year = 2019 AND Month = 7 AND Day = 15").count()

  test("mergeAppend is idempotent on redelivery, additive on new keys") {
    import spark.implicits._
    val lake = s"${tempDir("lake-merge")}/lake"
    def batch(ids: Range) = ids.map(i =>
      (i.toLong, s"row_$i", 2019, 7, 15)).toDF("id", "payload", "Year", "Month", "Day")

    Lake.mergeAppend(batch(0 until 100), lake, "id")
    assert(Lake.read(spark, lake).count() == 100)
    // exact redelivery (Lambda-retry shape) → no-op
    Lake.mergeAppend(batch(0 until 100), lake, "id")
    assert(Lake.read(spark, lake).count() == 100)
    // overlapping batch → only the genuinely new keys land
    Lake.mergeAppend(batch(50 until 150), lake, "id")
    assert(Lake.read(spark, lake).count() == 150)
    assert(Lake.read(spark, lake).select("id").distinct.count() == 150)
    // a batch for an untouched partition must not scan/dedup against it:
    // same ids, different day → appends fully (key scope is per-partition)
    val otherDay = batch(0 until 10)
      .withColumn("Day", org.apache.spark.sql.functions.lit(16))
    Lake.mergeAppend(otherDay, lake, "id")
    assert(Lake.read(spark, lake).count() == 160)

    // Key scope is per (key, partition) even WITHIN one batch: a batch
    // spanning two days where the key already exists on Day 15 but not on
    // Day 17 must drop the Day-15 duplicate and land the Day-17 row — a
    // key-only anti-join would pool Day 15's keys and silently drop the
    // new Day-17 row too.
    val spanning = batch(0 until 5) // dup on Day 15
      .union(batch(0 until 5).withColumn("Day",
        org.apache.spark.sql.functions.lit(17))) // new on Day 17
    Lake.mergeAppend(spanning, lake, "id")
    assert(Lake.read(spark, lake).count() == 165)
    assert(Lake.read(spark, lake).filter("Day = 17").count() == 5)
    assert(Lake.read(spark, lake).filter("Day = 15")
      .groupBy("id").count().filter("count > 1").count() == 0)
  }

  test("compact collapses small files per partition, data-identical") {
    import spark.implicits._
    val lake = s"${tempDir("lake-compact")}/lake"
    // 8 small appends × 2 days: incremental-ingest fragmentation
    (0 until 8).foreach { b =>
      Lake.append((0 until 250).map(i =>
        (b * 1000L + i, s"p${b}_$i", 2024, 5, 1 + (i % 2)))
        .toDF("id", "payload", "Year", "Month", "Day"), lake)
    }
    def files(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(lake)).iterator()
        .asScala.filter(_.toString.endsWith(".parquet")).toSeq
    }
    def snapshot() = Lake.read(spark, lake)
      .select("id", "payload", "Year", "Month", "Day")
      .collect().map(_.toSeq).toSet
    val before = snapshot()
    assert(files().size >= 16, s"fixture not fragmented: ${files().size}")

    Lake.compact(spark, lake, targetRowsPerFile = 1000L)
    // 1000 rows per partition / 1000 target → 1 file per day (2 total);
    // allow the salt-in-same-task merge slack of the docs, not more
    assert(files().size <= 4, s"still fragmented: ${files().size} files")
    assert(snapshot() == before, "compaction changed data")
    // still a partitioned lake: pruning keeps working after the rewrite
    assert(Lake.read(spark, lake).filter("Day = 2").count() == 1000)
  }

  test("append codec option: snappy vs gzip file suffixes, identical read-back") {
    val root = tempDir("lake-codec")
    val in = s"$root/in"
    val path = EegFixture.write(in, A)
    val df = Ingest.ingestFile(spark, path)

    Lake.append(df, s"$root/lake_snappy") // default codec
    Lake.append(df, s"$root/lake_gzip", codec = "gzip")

    def parquetFiles(dir: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
        .toSeq
    }
    val snappyFiles = parquetFiles(s"$root/lake_snappy")
    val gzipFiles = parquetFiles(s"$root/lake_gzip")
    assert(snappyFiles.nonEmpty && snappyFiles.forall(_.endsWith(".snappy.parquet")))
    assert(gzipFiles.nonEmpty && gzipFiles.forall(_.endsWith(".gz.parquet")))

    // codec changes bytes, never data: identical rows and schema back
    def key(dir: String) = Lake.read(spark, dir)
      .select("Time", "ClockDateTime", "I1_1", "Year", "Month", "Day")
      .collect().map(_.toSeq).toSet
    assert(key(s"$root/lake_snappy") == key(s"$root/lake_gzip"))
    assert(Lake.read(spark, s"$root/lake_gzip").count() == A.nRows)
  }

  test("z-ordered layout clusters BOTH dimensions; single-column sort only one") {
    import spark.implicits._
    val root = tempDir("lake-zorder")
    // uniform 2-D grid, both dims in [0, 256)
    val data = (0 until 20000).map(i =>
      ((i * 7919) % 256, (i * 104729) % 256, i.toLong))
      .toDF("a", "b", "payload")

    def perFileRanges(dir: String): Seq[(Long, Long)] = {
      import org.apache.spark.sql.functions.{input_file_name, max, min}
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .collect().map(r => (r.getInt(1).toLong, r.getInt(2).toLong)).toSeq
    }
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size

    data.repartitionByRange(8, data("a")).sortWithinPartitions("a")
      .write.parquet(s"$root/by_a")
    Lake.writeZordered(data, s"$root/zorder", "a", "b", nFiles = 8, bits = 8)

    val byA = perFileRanges(s"$root/by_a")
    val z = perFileRanges(s"$root/zorder")
    // sort-by-a: a clusters (range ~32) but b stays full-width (~255)
    assert(avg(byA.map(_._1)) < 64, s"by_a a-ranges: $byA")
    assert(avg(byA.map(_._2)) > 200, s"by_a b-ranges: $byA")
    // z-order: BOTH dims collapse to sub-stripes
    assert(avg(z.map(_._1)) < 160, s"zorder a-ranges: $z")
    assert(avg(z.map(_._2)) < 160, s"zorder b-ranges: $z")
    // layout only — the data itself is unchanged
    assert(spark.read.parquet(s"$root/zorder").agg(
      org.apache.spark.sql.functions.sum("payload")).head().getLong(0)
      == (0L until 20000L).sum)
    assert(spark.read.parquet(s"$root/zorder").count() == 20000)
  }

  test("schema evolution: mergeSchema unions old and new file schemas, old rows null-filled") {
    import spark.implicits._
    val lake = s"${tempDir("lake-evolve")}/lake"
    Lake.append(Seq((1L, 10.0, 2024, 8, 1)).toDF("id", "v", "Year", "Month", "Day"), lake)
    // a new column appears in later ingests — old files stay as written
    Lake.append(Seq((2L, 20.0, "eu", 2024, 8, 2))
      .toDF("id", "v", "region", "Year", "Month", "Day"), lake)
    val merged = Lake.read(spark, lake, mergeSchema = true)
    assert(merged.columns.contains("region"))
    val byId = merged.select("id", "region").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId == Map(1L -> None, 2L -> Some("eu")))
    // the default read still works (first-file schema wins for data cols)
    assert(Lake.read(spark, lake).count() == 2)
  }

  test("upsert replaces matched keys, inserts new, leaves untouched partitions' files alone") {
    import spark.implicits._
    val lake = s"${tempDir("lake-upsert")}/lake"
    Lake.append(Seq(
      (1L, 10.0, 2024, 7, 1), (2L, 20.0, 2024, 7, 1),
      (3L, 30.0, 2024, 7, 2))
      .toDF("id", "v", "Year", "Month", "Day"), lake)
    def day2Files() = Option(new java.io.File(s"$lake/Year=2024/Month=7/Day=2")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = day2Files()

    // batch touches ONLY day 1: update id 1, insert id 9
    Lake.upsert(Seq((1L, 11.0, 2024, 7, 1), (9L, 90.0, 2024, 7, 1))
      .toDF("id", "v", "Year", "Month", "Day"), lake, "id")

    val rows = Lake.read(spark, lake).select("id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0, 9L -> 90.0))
    // dynamic overwrite must not have rewritten the untouched partition
    assert(day2Files() == before, "untouched partition was rewritten")

    // an EMPTY batch is a no-op: no partitions match, nothing is
    // rewritten, nothing cached stays behind (the degenerate-input path
    // builds a lit(false) predicate and an empty replacement slice)
    val allBefore = Lake.read(spark, lake).orderBy("id")
      .collect().map(_.toSeq).toSeq
    Lake.upsert(Seq.empty[(Long, Double, Int, Int, Int)]
      .toDF("id", "v", "Year", "Month", "Day"), lake, "id")
    assert(Lake.read(spark, lake).orderBy("id")
      .collect().map(_.toSeq).toSeq == allBefore)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("null partition values survive mergeAppend dedup, upsert, and compact") {
    // null Year/Month/Day lands under __HIVE_DEFAULT_PARTITION__; ===
    // never matches null, so before the null-safe predicates this slice
    // was silently DUPLICATED by mergeAppend redelivery, its survivors
    // DELETED by upsert's dynamic overwrite, and its rows DROPPED
    // entirely by compact's size join — all unrecoverable after the swap.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val lake = s"${tempDir("lake-nullpart")}/lake"
    val none = Option.empty[Int]
    // mixed lake: a real partition plus null-partition rows (an all-null
    // lake is unreadable anyway — partition inference yields VOID)
    val batch = Seq(
      (1L, 10.0, Some(2024), Some(7), Some(1)),
      (2L, 20.0, none, none, none),
      (3L, 30.0, none, none, none))
      .toDF("id", "v", "Year", "Month", "Day")
    Lake.mergeAppend(batch, lake, "id")
    Lake.mergeAppend(batch, lake, "id") // redelivery must be a no-op
    assert(Lake.read(spark, lake).count() == 3)
    // upsert: update id 2, keep id 3 as survivor of the null partition
    Lake.upsert(batch.filter(col("id") === 2).withColumn("v", lit(22.0)),
      lake, "id")
    val afterUpsert = Lake.read(spark, lake).select("id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(afterUpsert == Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    Lake.compact(spark, lake, targetRowsPerFile = 1000L)
    val afterCompact = Lake.read(spark, lake).select("id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(afterCompact == afterUpsert, "compact lost the null partition")
  }

  test("compact preserves schema-evolved columns (merged read, not one footer)") {
    import spark.implicits._
    val lake = s"${tempDir("lake-evolve-compact")}/lake"
    Lake.append(Seq((1L, 10.0, 2024, 7, 1))
      .toDF("id", "v", "Year", "Month", "Day"), lake)
    Lake.append(Seq((2L, 20.0, "new", 2024, 7, 2))
      .toDF("id", "v", "w", "Year", "Month", "Day"), lake)
    Lake.compact(spark, lake, targetRowsPerFile = 1000L)
    val rows = Lake.read(spark, lake, mergeSchema = true)
      .select("id", "w").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> None, 2L -> Some("new")),
      "compaction dropped an evolved column")
  }

  test("read/append recover a lake stranded at _old by a crash mid-compact-swap") {
    import spark.implicits._
    val lake = s"${tempDir("lake-recover")}/lake"
    Lake.append((0 until 100).map(i => (i.toLong, 2024, 6, 1 + (i % 2)))
      .toDF("id", "Year", "Month", "Day"), lake)

    // simulate a crash between compact's two renames: live dir moved
    // aside, replacement never arrived
    def strand(): Unit = {
      val fs = new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(lake),
        new org.apache.hadoop.fs.Path(s"${lake}_old")))
    }

    strand()
    assert(Lake.read(spark, lake).count() == 100) // read auto-recovers
    assert(!new java.io.File(s"${lake}_old").exists())

    // a WRITER arriving first must also restore before appending, or the
    // old data would be stranded while a parallel lake grows at the name
    strand()
    Lake.append((100 until 110).map(i => (i.toLong, 2024, 6, 1 + (i % 2)))
      .toDF("id", "Year", "Month", "Day"), lake)
    assert(Lake.read(spark, lake).count() == 110)

    // mergeAppend on a stranded lake still dedups against restored keys
    strand()
    Lake.mergeAppend((0 until 120).map(i => (i.toLong, 2024, 6, 1 + (i % 2)))
      .toDF("id", "Year", "Month", "Day"), lake, "id")
    assert(Lake.read(spark, lake).count() == 120) // 110 restored + 10 new
  }
}
