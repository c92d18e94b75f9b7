package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex,
  PartitionDirectory, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `graftlake` DataSource V2 format — the engine-integrated read
  * path for the [[VersionedLake]] (the Delta/Iceberg consumption seam:
  * the reference's lake is likewise read through a catalog by its query
  * engine, reference README.md:13-15, never through library calls):
  *
  * {{{
  * spark.read.format("graftlake").load(dir)                    // latest
  * spark.read.format("graftlake")
  *   .option("versionAsOf", 3).load(dir)                       // time travel
  * }}}
  *
  * Architecture: everything below the file listing is Spark's OWN
  * parquet DSv2 machinery — [[GraftLakeTable]] IS a `ParquetTable`
  * (vectorized reader, pushed filters, columnar batches, AQE), with
  * exactly ONE seam replaced: the `FileIndex` resolves the snapshot
  * from the manifest log instead of listing the directory, and applies
  * the manifest's stats/bloom sidecars to the PUSHED data filters so a
  * range or point probe through plain `spark.read` skips files the
  * same way the library probes ([[VersionedLake.readSkipping]] /
  * [[VersionedLake.readBloomProbe]]) do. That keeps the fast path
  * driver-side metadata (nothing size-of-data at plan time) and the
  * scan path 100% native — a reimplemented row-by-row reader would
  * have been a 10× regression at 100 TB.
  *
  * Correctness posture: pruning only ever REMOVES files the sidecars
  * prove cannot match (ranges conservative on missing stats, bloom
  * conservative on missing filters), and the pushed predicate is still
  * evaluated row-level by the parquet reader — a sidecar bug costs IO
  * or a hash mismatch in q182's differential, never silent wrong rows
  * from a stale listing.
  */
final class GraftLakeDataSource
    extends org.apache.spark.sql.connector.catalog.TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graftlake"

  // Deliberately a PLAIN TableProvider, not FileDataSourceV2: Spark's
  // ResolveDataSource hard-routes every FileDataSourceV2 stream to the
  // V1 FileStreamSource path (which would stream raw d-* dirs,
  // manifest-unaware — including uncommitted orphans). A plain
  // provider keeps batch on loadV2Source and lets the MICRO_BATCH_READ
  // capability reach the streaming planner.

  private def makeTable(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): Table = {
    require(options.get("paths") == null,
      "graftlake reads one lake root, got multiple paths")
    val lakeDir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftlake needs the lake root: spark.read.format(\"graftlake\")" +
          ".load(<dir>)"))
    val spark = SparkSession.active
    val version = Option(options.get(GraftLakeDataSource.VersionAsOf))
      .map(_.trim.toInt)
      .getOrElse {
        val vs = VersionedLake.versions(spark, lakeDir)
        require(vs.nonEmpty, s"no versions published at $lakeDir")
        vs.last
      }
    // snapshots may span schema-evolving commits — same mergeSchema
    // semantics as VersionedLake.readAt
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.put("mergeSchema", "true")
    new GraftLakeTable(lakeDir, spark,
      new CaseInsensitiveStringMap(merged), Seq(lakeDir), schema, lakeDir,
      version)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    makeTable(options, None).asInstanceOf[GraftLakeTable].schema

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    makeTable(new CaseInsensitiveStringMap(properties), Option(schema))
}

object GraftLakeDataSource {
  /** Read-option key for time travel (Delta's option name, so the idiom
    * transfers): absent → latest published version. */
  val VersionAsOf = "versionAsOf"

  /** readStream option: first lake version the stream consumes
    * (inclusive; default 1 = the full history as the initial batches). */
  val StartingVersion = "startingVersion"

  /** Files the executed plan will actually read through the V2 scan —
    * the post-pruning evidence q182 and the spec gate assert on
    * (`DataFrame.inputFiles` reports the index's full listing, BEFORE
    * per-scan filter pruning, so it cannot serve as this witness). */
  def filesRead(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan match {
        case f: FileScan => f.planInputPartitions().map {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
          case _ => 0
        }.sum
        case _ => 0
      }
    }.sum
  }
}

/** V2 catalog over a directory of versioned lakes — the SQL seam of
  * the format (the reference consumes its lake exactly this way:
  * Athena reads S3 parquet through the Glue catalog, reference
  * README.md:13-15). Register and query, time travel included, with
  * zero library calls:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.glake",
  *   "graft.engine.GraftLakeCatalog")
  * spark.conf.set("spark.sql.catalog.glake.root", "/data/lakes")
  * spark.sql("SELECT * FROM glake.events")                  // latest
  * spark.sql("SELECT * FROM glake.events VERSION AS OF 3")  // time travel
  * }}}
  *
  * A table identifier maps to `<root>/<namespace…>/<name>`; a table
  * exists iff that directory has published manifests. Read-only by
  * design — writes go through the commit protocol
  * ([[VersionedLake.commit]]'s CAS), which a SQL INSERT cannot
  * express; every DDL/DML entry point says so loudly. */
final class GraftLakeCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog {
  import org.apache.spark.sql.connector.catalog.Identifier
  import org.apache.spark.sql.catalyst.analysis.NoSuchTableException

  private var catalogName: String = _
  private var root: String = _
  private def spark = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw
      new IllegalArgumentException(
        s"graftlake catalog '$name' needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def load(ident: Identifier, version: Option[Int]): Table = {
    val dir = dirOf(ident)
    val vs = VersionedLake.versions(spark, dir)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir)
    opts.put("mergeSchema", "true")
    new GraftLakeTable(ident.toString, spark,
      new CaseInsensitiveStringMap(opts), Seq(dir), None, dir,
      version.getOrElse(vs.last))
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` lands here (the analyzer's time-travel hook). */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.trim.toInt))

  override def tableExists(ident: Identifier): Boolean =
    VersionedLake.versions(spark, dirOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path((root +: namespace.toSeq).mkString("/"))
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(base)) Array.empty
    else f.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_manifests")))
      .map(p => Identifier.of(namespace, p.getName)).toArray
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "graftlake catalog is read-only: write through the versioned " +
      "commit protocol (VersionedLake.commit*/Streaming sinks), which " +
      "SQL DML cannot express")

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = readOnly

  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table =
    readOnly

  override def dropTable(ident: Identifier): Boolean = readOnly

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly
}

/** One published snapshot as a native parquet DSv2 table: identical to
  * Spark's own `ParquetTable` except the file index is the manifest
  * snapshot (with sidecar pruning), not a directory listing. */
final class GraftLakeTable(name: String, spark: SparkSession,
    options: CaseInsensitiveStringMap, paths: Seq[String],
    userSpecifiedSchema: Option[StructType], lakeDir: String, version: Int)
  extends ParquetTable(name, spark, options, paths, userSpecifiedSchema,
    classOf[ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new GraftLakeFileIndex(spark, lakeDir, version)

  /** Beyond ParquetTable: the lake is also a STREAMING source —
    * versions are the offsets (see [[GraftLakeMicroBatchStream]]). */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    val caps = new java.util.HashSet(super.capabilities())
    caps.add(
      org.apache.spark.sql.connector.catalog.TableCapability.MICRO_BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =
    new GraftLakeScanBuilder(spark, fileIndex, schema, dataSchema,
      mergedOptions(options), lakeDir)

  /** Read-only by design: a DataFrame write to the lake dir would land
    * parquet files OUTSIDE the manifest protocol — invisible to every
    * reader (snapshot semantics) and swept by vacuum, i.e. silently
    * lost. Fail at plan time instead. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    throw new UnsupportedOperationException(
      "graftlake is read-only: write through the versioned commit " +
        "protocol (VersionedLake.commit*/commitIndexed or the " +
        "streaming lake sinks), which a raw DataFrame write cannot " +
        "express")
}

/** ParquetScanBuilder that builds a [[GraftLakeParquetScan]] — same
  * pushdown surface (columns, catalyst filters, aggregates), the built
  * scan merely knows how to serve micro-batches too. */
final class GraftLakeScanBuilder(spark: SparkSession,
    fileIndex: PartitioningAwareFileIndex, schema: StructType,
    dataSchema: StructType, options: CaseInsensitiveStringMap,
    lakeDir: String)
  extends org.apache.spark.sql.execution.datasources.v2.parquet
    .ParquetScanBuilder(spark, fileIndex, schema, dataSchema, options) {

  override def build()
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =
    new GraftLakeParquetScan(super.build(), lakeDir,
      Option(options.get(GraftLakeDataSource.StartingVersion))
        .map(_.trim.toInt).getOrElse(1))
}

/** ParquetScan + `toMicroBatchStream`: batch execution is byte-for-byte
  * the parent's (same reader factory, same partitions); only the
  * streaming entry point is added. */
final class GraftLakeParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    lakeDir: String, startingVersion: Int)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions) {

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftLakeMicroBatchStream(this, lakeDir, startingVersion)
}

/** Version offset: the stream's progress IS a published lake version. */
final case class GraftLakeOffset(v: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** Incremental lake consumption — `spark.readStream.format("graftlake")`
  * turns the versioned lake into a STREAM of its own commits (Delta's
  * streaming-source shape; the production "process only what's new
  * since yesterday" path without a rescan):
  *
  *  - offsets are version numbers; a micro-batch covers the versions
  *    published in `(start, end]` and reads EXACTLY the data dirs those
  *    manifests added — the [[VersionedLake.changes]] append fast path,
  *    O(delta) from manifest metadata, zero row-level comparison;
  *  - exactly-once follows from offsets-in-checkpoint + immutable data
  *    dirs: a replayed batch re-reads the same manifest delta
  *    bit-for-bit;
  *  - a history step that DROPS dirs between consumed versions
  *    (overwrite, compaction, deleteRange) fails loudly: silently
  *    re-reading rewritten data would double-deliver rows — the caller
  *    chooses a fresh checkpoint (reprocess) instead, Delta's
  *    `ignoreChanges` refusal semantics;
  *  - `startingVersion` option (inclusive, default 1) bounds the
  *    initial backfill; vacuumed-away manifests below it fail with the
  *    retention error rather than silently skipping data.
  *
  * Reader machinery is the wrapped ParquetScan's own factory over a
  * per-batch file index of the added dirs — the streaming path reuses
  * the native vectorized reader like everything else here. */
final class GraftLakeMicroBatchStream(scan: GraftLakeParquetScan,
    lakeDir: String, startingVersion: Int)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  import org.apache.spark.sql.connector.read.InputPartition

  private def spark = scan.sparkSession

  override def initialOffset(): Offset = GraftLakeOffset(startingVersion - 1)

  override def latestOffset(): Offset = {
    val vs = VersionedLake.versions(spark, lakeDir)
    GraftLakeOffset(if (vs.isEmpty) startingVersion - 1 else vs.last)
  }

  override def deserializeOffset(json: String): Offset =
    GraftLakeOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftLakeOffset].v
    val to = end.asInstanceOf[GraftLakeOffset].v
    if (to <= from) return Array.empty
    // version 0 is "before the first commit" (empty set); any other
    // start — including startingVersion-1 on the first batch — reads
    // its manifest so the batch delivers exactly what later versions
    // ADDED (a vacuumed-away manifest fails with the retention error
    // rather than silently re-delivering the whole snapshot)
    val fromDirs =
      if (from <= 0) Set.empty[String]
      else VersionedLake.liveDataDirs(spark, lakeDir, from).toSet
    val toDirs = VersionedLake.liveDataDirs(spark, lakeDir, to)
    require(fromDirs.subsetOf(toDirs.toSet),
      s"streaming read of $lakeDir requires append-only history, but " +
        s"versions ($from, $to] dropped data dirs " +
        s"(overwrite/compaction/delete) — restart from a fresh " +
        "checkpoint to reprocess the rewritten snapshot")
    val added = toDirs.filterNot(fromDirs)
    if (added.isEmpty) Array.empty
    else scan.copy(
      fileIndex = new InMemoryFileIndex(spark,
        added.map(new Path(_)), Map.empty, None),
      partitionFilters = Nil, dataFilters = Nil)
      .planInputPartitions()
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Manifest-resolved file index with sidecar skipping. Listing cost is
  * one manifest read + one list per live data dir (metadata-bounded);
  * the pruning decision per pushed filter is a sidecar read per
  * (data dir, column), memoized per listing. */
final class GraftLakeFileIndex(spark: SparkSession, lakeDir: String,
    version: Int)
  extends InMemoryFileIndex(spark,
    VersionedLake.liveDataDirs(spark, lakeDir, version).map(new Path(_)),
    Map.empty, None) {

  // Sidecar lookups memoized for the INDEX's lifetime, not per
  // listFiles call: a version's sidecars are immutable (data dirs are
  // never mutated after publish), and a table may be planned many
  // times — at 100k data dirs the difference is one sidecar read per
  // (dir, col) ever vs per query. Driver-side planning is effectively
  // single-threaded per query; synchronized maps keep concurrent
  // queries over one cached DataFrame safe.
  private val statsCache = collection.concurrent.TrieMap
    .empty[(String, String), Map[String, (Double, Double, Long)]]
  private val bloomCache = collection.concurrent.TrieMap
    .empty[(String, String), Map[String, java.util.BitSet]]

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val ranges = GraftLakeFileIndex.rangePredicates(dataFilters)
    val points = GraftLakeFileIndex.pointPredicates(dataFilters)
    if (ranges.isEmpty && points.isEmpty) base
    else {
      def admit(p: Path): Boolean = {
        val d = p.getParent.getName
        val f = p.getName
        ranges.forall { case (c, lo, hi) =>
          statsCache.getOrElseUpdate((d, c),
            VersionedLake.fileStats(spark, lakeDir, d, c))
            .get(f) // no recorded range for this file → cannot skip
            .forall { case (mn, mx, _) => mx >= lo && mn <= hi }
        } && points.forall { case (c, want) =>
          bloomCache.getOrElseUpdate((d, c),
            VersionedLake.fileBloom(spark, lakeDir, d, c))
            .get(f)
            .forall(bits => want.forall(bits.get))
        }
      }
      base.map(pd => pd.copy(files = pd.files.filter(fs => admit(fs.getPath))))
    }
  }
}

object GraftLakeFileIndex {

  /** `[lo, hi]` windows a file's recorded min/max must intersect, from
    * the pushed data filters. Only shapes the sidecar can answer are
    * extracted; strict comparisons widen to inclusive (conservative —
    * skipping may only remove provably-non-matching files). */
  private[engine] def rangePredicates(filters: Seq[Expression])
      : Seq[(String, Double, Double)] = {
    def num(l: Literal): Option[Double] = l.value match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    filters.flatMap {
      case EqualTo(a: Attribute, l: Literal) =>
        num(l).map(v => (a.name, v, v))
      case EqualTo(l: Literal, a: Attribute) =>
        num(l).map(v => (a.name, v, v))
      case GreaterThan(a: Attribute, l: Literal) =>
        num(l).map(v => (a.name, v, Double.PositiveInfinity))
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        num(l).map(v => (a.name, v, Double.PositiveInfinity))
      case LessThan(a: Attribute, l: Literal) =>
        num(l).map(v => (a.name, Double.NegativeInfinity, v))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        num(l).map(v => (a.name, Double.NegativeInfinity, v))
      case GreaterThan(l: Literal, a: Attribute) =>
        num(l).map(v => (a.name, Double.NegativeInfinity, v))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        num(l).map(v => (a.name, Double.NegativeInfinity, v))
      case LessThan(l: Literal, a: Attribute) =>
        num(l).map(v => (a.name, v, Double.PositiveInfinity))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        num(l).map(v => (a.name, v, Double.PositiveInfinity))
      case _ => None
    }
  }

  /** Bloom probe positions per equality filter. The hashed rendering
    * must match the commit side's `cast("string")`: integral and string
    * literals round-trip exactly; fractional/other types are NOT probed
    * (their `toString` may differ from Spark's cast) — conservative. */
  private[engine] def pointPredicates(filters: Seq[Expression])
      : Seq[(String, Seq[Int])] = {
    def render(l: Literal): Option[String] = l.value match {
      case i: java.lang.Integer => Some(i.toString)
      case i: java.lang.Long => Some(i.toString)
      case i: java.lang.Short => Some(i.toString)
      case i: java.lang.Byte => Some(i.toString)
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case s: String => Some(s)
      case _ => None
    }
    filters.flatMap {
      case EqualTo(a: Attribute, l: Literal) =>
        render(l).map(v => (a.name, VersionedLake.bloomWantPositions(v)))
      case EqualTo(l: Literal, a: Attribute) =>
        render(l).map(v => (a.name, VersionedLake.bloomWantPositions(v)))
      case _ => None
    }
  }
}
