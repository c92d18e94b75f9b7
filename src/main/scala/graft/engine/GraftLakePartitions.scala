package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.execution.datasources.{PartitionPath,
  PartitionSpec}
import org.apache.spark.sql.types.{StructField, StructType}

/** Identity `PARTITIONED BY` for graftlake tables — the reference's one
  * stated cost rule (README.md:31, sparkle-v9.py:136-138 prune by
  * directory partition) composed with the versioned manifest protocol:
  *
  *  - the partition spec is declared at CREATE/CTAS and persisted in a
  *    `_partition` registry file (one struct DDL line) at the lake root;
  *  - each commit lays its rows out in hive-style dirs INSIDE its own
  *    immutable data dir (`d-x/y=2024/m=5/part-*.parquet`), written by
  *    Spark's own dynamic-partition writer;
  *  - the MANIFEST tracks one entry per (commit, partition-leaf) —
  *    `d-x/y=2024/m=5` — so a partition is a first-class replacement
  *    unit: a whole-partition DELETE or an `INSERT OVERWRITE
  *    PARTITION` backfill is a manifest-only commit (zero data IO),
  *    and OPTIMIZE compacts within partitions;
  *  - reads surface the partition columns from ENTRY NAMES through an
  *    explicit `PartitionSpec` handed to the file index — partition
  *    values come from manifest metadata, never from listing, and
  *    Spark's planning-time partition pruning + DPP drop whole
  *    partition dirs before any file is touched;
  *  - the stats/bloom sidecars compose unchanged: entries are leaf
  *    dirs, each with its own sidecar, so within an admitted partition
  *    the same file-level skipping applies.
  *
  * At 100 TB this is the first pruning lever (drop partitions at plan
  * time), with sidecar file-skipping second and parquet row-group
  * stats third — the Delta/Iceberg layering. */
object GraftLakePartitions {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def regPath(dir: String) = new Path(s"$dir/_partition")

  /** Persist the partition spec (written once, right after the CREATE
    * publish — a lost-race DDL must not plant its spec in the winner's
    * lake). */
  def set(spark: SparkSession, dir: String,
      cols: Seq[StructField]): Unit = {
    val out = fs(spark, dir).create(regPath(dir), true)
    try out.write(StructType(cols).toDDL.getBytes("UTF-8"))
    finally out.close()
    // refresh (don't just seed) the memo: a recreate at a reused path
    // must displace the dead table's cached spec
    if (cols.nonEmpty) memo.put(dir, cols) else memo.remove(dir)
    ()
  }

  // positive-only memo: the registry is written once at CREATE and
  // never changes, but BEFORE it exists a lookup must keep re-reading
  // (a negative cache would freeze a table as unpartitioned when the
  // read raced the CREATE)
  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[StructField]]

  /** Drop the memoized spec for `dir` — called by the table
    * delete/create paths ([[Lake.delete]], the catalog's DROP and the
    * staged-DDL commits): a lake deleted and recreated at the same path
    * within one JVM must not keep serving the dead table's partition
    * columns (mis-parsed entries, misrouted writes). External deletes
    * this process never sees still require a new path or a restart —
    * the same contract as every metastore cache. */
  private[engine] def invalidate(dir: String): Unit = {
    memo.remove(dir)
    ()
  }

  /** Declared partition columns in partition order; empty for an
    * unpartitioned lake. One small file read, memoized once found. */
  def of(spark: SparkSession, dir: String): Seq[StructField] =
    memo.getOrElse(dir, {
      val p = regPath(dir)
      val f = fs(spark, dir)
      val r =
        try {
          if (!f.exists(p)) Seq.empty[StructField]
          else {
            val in = f.open(p)
            val ddl = try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString.trim
            finally in.close()
            if (ddl.isEmpty) Seq.empty[StructField]
            else StructType.fromDDL(ddl).fields.toSeq
          }
        } catch { case scala.util.control.NonFatal(_) =>
          Seq.empty[StructField]
        }
      if (r.nonEmpty) memo.put(dir, r)
      r
    })

  /** Partition VALUES of one manifest entry (`d-x/c1=v1/c2=v2`),
    * parsed and cast to the declared types. Hive escaping and the
    * `__HIVE_DEFAULT_PARTITION__` null sentinel follow Spark's own
    * writer, so write and read agree byte-for-byte. */
  private[engine] def valuesOf(entry: String, cols: Seq[StructField],
      zoneId: String): InternalRow = {
    val segs = entry.split('/').drop(1)
    require(segs.length == cols.length,
      s"manifest entry '$entry' does not match the declared partition " +
        s"spec (${cols.map(_.name).mkString(", ")})")
    InternalRow.fromSeq(segs.zip(cols).map { case (seg, c) =>
      val eq = seg.indexOf('=')
      require(eq > 0 && seg.substring(0, eq) == c.name,
        s"entry segment '$seg' does not name partition column ${c.name}")
      val raw = ExternalCatalogUtils.unescapePathName(seg.substring(eq + 1))
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(raw),
          org.apache.spark.sql.types.StringType),
        c.dataType, Option(zoneId)).eval()
    })
  }

  /** Entry name (relative to the lake root) of a leaf partition dir /
    * any path `depth` segments deep — path-scheme agnostic (works on
    * qualified `file:/…` paths and bare ones alike). */
  private[engine] def entryOfDepth(p: Path, depth: Int): String = {
    var segs = List.empty[String]
    var cur = p
    var i = 0
    while (i < depth && cur != null) {
      segs = cur.getName :: segs
      cur = cur.getParent
      i += 1
    }
    segs.mkString("/")
  }

  /** Explicit PartitionSpec over leaf entry paths — partition values
    * decided from MANIFEST METADATA (the entry names), not from any
    * directory listing or value inference. */
  private[engine] def specFor(spark: SparkSession, lakeDir: String,
      entryPaths: Seq[Path]): Option[PartitionSpec] = {
    val cols = of(spark, lakeDir)
    if (cols.isEmpty) None
    else {
      val zone = spark.sessionState.conf.sessionLocalTimeZone
      // QUALIFIED paths: the file index keys its leaf-dir → files map
      // by fully-qualified path, and an unqualified spec path would
      // match nothing (silently empty partitions)
      val f = fs(spark, lakeDir)
      Some(PartitionSpec(StructType(cols), entryPaths.map { p =>
        PartitionPath(
          valuesOf(entryOfDepth(p, cols.length + 1), cols, zone),
          f.makeQualified(p))
      }))
    }
  }

  /** Leaf partition entries (relative paths) of a freshly-staged data
    * dir — what a partitioned commit publishes. One bounded driver walk
    * of exactly the staged tree. */
  private[engine] def stagedEntries(spark: SparkSession, lakeDir: String,
      dataDir: String, nCols: Int): Seq[String] = {
    val f = fs(spark, lakeDir)
    val rootP = new Path(s"$lakeDir/$dataDir")
    if (!f.exists(rootP)) return Seq.empty
    def walk(p: Path, depth: Int): Seq[Path] =
      if (depth == nCols) Seq(p)
      else f.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains('='))
        .flatMap(st => walk(st.getPath, depth + 1))
    walk(rootP, 0)
      .filter(p => f.listStatus(p)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(p => entryOfDepth(p, nCols + 1))
      .sorted
  }

  /** The all-null partition entry name for `dataDir` — where empty
    * schema-carrier commits live on a partitioned lake (an empty frame
    * has no partition values; the null partition holds zero rows and
    * can never match an equality filter). */
  private[engine] def nullEntry(dataDir: String,
      cols: Seq[StructField]): String =
    (dataDir +: cols.map(c =>
      s"${c.name}=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"))
      .mkString("/")

  /** Write the zero-row schema carrier a partitioned commit needs when
    * no task produced output (CREATE TABLE, zero-row CTAS, a COW that
    * deleted everything): data columns only (partition values live in
    * dir names), at the null-partition entry. Returns the entry. */
  private[engine] def seedEmpty(spark: SparkSession, lakeDir: String,
      dataDir: String, fullSchema: StructType,
      cols: Seq[StructField]): String = {
    val dataOnly = StructType(fullSchema.filterNot(f =>
      cols.exists(_.name.equalsIgnoreCase(f.name))))
    val entry = nullEntry(dataDir, cols)
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      dataOnly).repartition(1)
      .write.mode("append").parquet(s"$lakeDir/$entry")
    entry
  }

  /** Split `entries` by a partition-decidable predicate: (entries whose
    * partition values make it TRUE → droppable whole, the rest). Exact
    * catalyst evaluation (three-valued logic included) over one tiny
    * driver-local frame — one row per entry, metadata-scale. */
  private[engine] def entriesWhere(spark: SparkSession,
      entries: Seq[String], cols: Seq[StructField],
      cond: org.apache.spark.sql.Column): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.functions.{col, lit, not}
    if (entries.isEmpty) return (Seq.empty, Seq.empty)
    import spark.implicits._
    val rows = entries.map { e =>
      val raw = e.split('/').drop(1).map { seg =>
        val v = ExternalCatalogUtils.unescapePathName(
          seg.substring(seg.indexOf('=') + 1))
        if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null else v
      }
      (e, raw.toSeq)
    }
    val base = rows.toDF("__entry", "__raw")
    val typed = cols.zipWithIndex.foldLeft(base) { case (df, (c, i)) =>
      df.withColumn(c.name, col("__raw").getItem(i).cast(c.dataType))
    }
    val hit = typed.filter(cond <=> lit(true))
      .select("__entry").collect().map(_.getString(0)).toSeq
    val miss = typed.filter(not(cond <=> lit(true)))
      .select("__entry").collect().map(_.getString(0)).toSeq
    (hit, miss)
  }

  /** Read arbitrary partitioned ENTRIES with their partition columns
    * reconstructed — one relation per top-level data dir (`basePath` =
    * the data dir so Spark parses the `c=v` segments), partition
    * columns cast to the DECLARED types (never inferred), unioned by
    * name. The incremental paths' read primitive ([[VersionedLake
    * .changes]] steps, CDC); snapshots go through the DSv2 index
    * instead (one scan, no union). Union width is the number of DATA
    * DIRS in the entry set — the changed-commit count, never the
    * partition count. */
  private[engine] def readEntries(spark: SparkSession, lakeDir: String,
      entries: Seq[String], cols: Seq[StructField],
      dropDvAt: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(entries.nonEmpty, "readEntries needs at least one entry")
    entries.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
      .map { case (dd, es) =>
        // no mergeSchema WITHIN a data dir: every dir is one commit's
        // single write frame (SQL insert, library commit, stream
        // batch, rewrite — all one schema), so the union is exact from
        // one footer and the per-dir distributed footer-merge job is
        // redundant. CROSS-dir evolution is still honored by the
        // unionByName(allowMissingColumns) below.
        val df0 = spark.read
          .option("basePath", s"$lakeDir/$dd")
          .parquet(es.map(e => s"$lakeDir/$e"): _*)
        // deletion vectors apply HERE, per relation: `_metadata` (the
        // DV join key) resolves only on a direct file scan, never
        // through the union below
        val df = dropDvAt.fold(df0)(v =>
          VersionedLake.dropDvRows(spark, lakeDir, df0, v))
        cols.foldLeft(df)((d, c) =>
          d.withColumn(c.name, col(c.name).cast(c.dataType)))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** True iff every referenced column of every filter is a partition
    * column — the predicate is then decidable wholly from entry names
    * (all rows of an entry share its partition values). */
  private[engine] def partitionDecidable(
      filters: Array[org.apache.spark.sql.sources.Filter],
      cols: Seq[StructField]): Boolean = {
    val names = cols.map(_.name).toSet
    filters.forall(_.references.forall(names.contains))
  }
}

/** V2 partitioned parquet write into a staged lake data dir — the
  * missing half of Spark's V2 file writes (`FileWrite` hardcodes
  * `partitionColumns = Seq.empty`; file sources normally fall back to
  * V1 for partitioned writes, a path this connector must not take
  * because V1 inserts would append raw files into published dirs).
  * Mirrors `FileWrite.toBatch` with the partition attributes filled
  * in: Spark's own `FileWriterFactory` then runs its
  * `DynamicPartitionDataWriter`, producing standard hive-escaped
  * `c=v` dirs under the staging dir. Requires input ordered by the
  * partition columns ([[requiredOrdering]]) so each task holds one
  * open file at a time — the same contract V1 enforces with its sort. */
final class GraftLakePartitionedWrite(stagingPath: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    partCols: Seq[String], desc: String,
    fieldIdTable: Option[StructType] = None)
  extends org.apache.spark.sql.connector.write.Write
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions,
    SortDirection, SortOrder}

  override def description(): String = desc

  override def requiredDistribution
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions
      .unspecified()

  override def requiredOrdering: Array[SortOrder] =
    partCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
      .toArray

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
    import scala.jdk.CollectionConverters._
    val spark = SparkSession.active
    // column-mapping tables: overlay the TABLE schema's field ids onto
    // the write schema (resolution does not reliably carry metadata) —
    // Spark's parquet writer then stamps them into every footer, the
    // id-matching reader's contract
    val schema = fieldIdTable.fold(info.schema())(t =>
      GraftLakeMapping.withFieldIds(info.schema(), t))
    val options = info.options().asCaseSensitiveMap().asScala.toMap
    val hadoopConf = spark.sessionState.newHadoopConfWithOptions(options)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(hadoopConf)
    job.setOutputKeyClass(classOf[Void])
    job.setOutputValueClass(classOf[InternalRow])
    org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
      .setOutputPath(job, new Path(stagingPath))
    val committer = org.apache.spark.internal.io.FileCommitProtocol
      .instantiate(spark.sessionState.conf.fileCommitProtocolClass,
        java.util.UUID.randomUUID().toString, stagingPath, false)
    val allAttrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val partAttrs = partCols.map(c =>
      allAttrs.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"write schema (${schema.fieldNames.mkString(", ")}) lacks " +
            s"partition column $c")))
    val dataAttrs = allAttrs.filterNot(partAttrs.contains)
    val factory = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat().prepareWrite(spark, job, options,
        StructType(dataAttrs.map(a =>
          StructField(a.name, a.dataType, a.nullable, a.metadata))))
    val description =
      new org.apache.spark.sql.execution.datasources.WriteJobDescription(
        java.util.UUID.randomUUID().toString,
        new org.apache.spark.util.SerializableConfiguration(
          job.getConfiguration),
        factory,
        allAttrs,
        dataAttrs,
        partAttrs,
        None,
        stagingPath,
        Map.empty,
        spark.sessionState.conf.maxRecordsPerFile,
        spark.sessionState.conf.sessionLocalTimeZone,
        Seq.empty)
    committer.setupJob(job)
    new org.apache.spark.sql.execution.datasources.v2.FileBatchWrite(
      job, description, committer)
  }
}
