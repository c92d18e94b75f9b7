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
  * parquet DSv2 machinery — [[GraftLakeTable]] WRAPS a `ParquetTable`
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
    val byTs = Option(options.get(GraftLakeDataSource.TimestampAsOf))
      .map { raw =>
        require(options.get(GraftLakeDataSource.VersionAsOf) == null,
          "versionAsOf and timestampAsOf are mutually exclusive")
        val tsMillis = GraftLakeDataSource.parseTsOption(raw,
          GraftLakeDataSource.TimestampAsOf)
        VersionedLake.versionAt(spark, lakeDir, tsMillis).getOrElse(
          throw new IllegalArgumentException(
            s"no version of $lakeDir was published at or before " +
              s"$raw — the lake did not exist yet"))
      }
    val version = byTs
      .orElse(Option(options.get(GraftLakeDataSource.VersionAsOf))
        .map(_.trim.toInt))
      .getOrElse {
        val t = VersionedLake.tip(spark, lakeDir)
        require(t.nonEmpty, s"no versions published at $lakeDir")
        t.get
      }
    // snapshots may span schema-evolving commits — same mergeSchema
    // semantics as VersionedLake.readAt
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.put("mergeSchema", "true")
    // column-mapping lakes: id-matching read/write confs ride the
    // table OPTIONS (they reach the scan's and write's hadoop
    // configuration — scoped to exactly these tables, never a session
    // conf mutation)
    if (GraftLakeMapping.enabled(spark, lakeDir))
      GraftLakeMapping.confOptions.foreach { case (k, v) =>
        merged.put(k, v) }
    val cdf = Option(options.get(GraftLakeDataSource.ReadChangeFeed))
      .exists(_.trim.equalsIgnoreCase("true"))
    // schema from the version's OWN manifest when its writer declared
    // one — the cold plan then skips the O(live files) footer-merge
    // inference (library-committed versions without a declaration
    // still infer)
    val declared = schema.orElse(
      VersionedLake.manifestSchema(spark, lakeDir, version))
    new GraftLakeTable(lakeDir, spark,
      new CaseInsensitiveStringMap(merged), Seq(lakeDir), declared,
      lakeDir, version, cdf)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    makeTable(options, None).asInstanceOf[GraftLakeTable].schema

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    makeTable(new CaseInsensitiveStringMap(properties), Option(schema))
}

object GraftLakeDataSource {
  /** Parse a time-travel option value (`timestampAsOf` /
    * `startingTimestamp`) to epoch millis. Accepted shapes:
    *
    *  - bare integer: epoch MILLIS, but only in the unambiguous
    *    13-digit range (>= 1e12, ~2001-09). A 10-digit epoch-SECONDS
    *    value — the most common Unix timestamp — would otherwise
    *    silently resolve to 1970: for `timestampAsOf` a confusing
    *    "lake did not exist" error, for `startingTimestamp` a SILENT
    *    full reprocess from v1. Refused loudly instead.
    *  - `yyyy-MM-dd` (midnight), `yyyy-MM-dd HH:mm:ss[.f]`, and
    *    ISO-8601 `yyyy-MM-dd'T'HH:mm:ss[.f]` with an optional zone
    *    offset (Delta accepts the 'T' form; `Timestamp.valueOf` used
    *    to reject it). Zone-less strings are session-local, matching
    *    the previous `Timestamp.valueOf` semantics. */
  private[engine] def parseTsOption(raw: String, optName: String): Long = {
    val s = raw.trim
    s.toLongOption match {
      case Some(n) =>
        require(n >= 1000000000000L,
          s"$optName='$raw' is ambiguous: bare integers are epoch " +
            "MILLIS, and this value lands before 2001 as millis (it " +
            "looks like epoch seconds) — pass milliseconds or a " +
            "'yyyy-MM-dd[ HH:mm:ss]' / ISO-8601 timestamp string")
        n
      case None =>
        val norm =
          (if (s.length <= 10) s + "T00:00:00" else s).replace(' ', 'T')
        try java.time.OffsetDateTime.parse(norm).toInstant.toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(norm)
              .atZone(java.time.ZoneId.systemDefault()).toInstant
              .toEpochMilli
        }
    }
  }

  /** Read-option key for time travel (Delta's option name, so the idiom
    * transfers): absent → latest published version. */
  val VersionAsOf = "versionAsOf"

  /** Wall-clock time travel as a read option (Delta's name): newest
    * version published at or before the instant — epoch millis or
    * `yyyy-MM-dd[ HH:mm:ss]`, same clock as SQL `TIMESTAMP AS OF`
    * ([[VersionedLake.versionAt]]). */
  val TimestampAsOf = "timestampAsOf"

  /** readStream option: first lake version the stream consumes
    * (inclusive; default 1 = the full history as the initial batches). */
  val StartingVersion = "startingVersion"

  /** readStream option (Delta's idiom): start from the first version
    * published AT or AFTER this wall-clock instant — accepts epoch
    * millis or `yyyy-MM-dd[ HH:mm:ss]`. Resolved ONCE at stream
    * construction to a version ([[VersionedLake.versionAt]] mtime
    * clock); mutually exclusive with `startingVersion`. A timestamp
    * after the tip starts at tip+1 (only future commits deliver —
    * Delta's semantics). */
  val StartingTimestamp = "startingTimestamp"

  /** readStream admission-control options (Delta's rate-limiting idiom):
    * cap how much backlog one micro-batch admits. `maxVersionsPerTrigger`
    * bounds versions per batch; `maxFilesPerTrigger` bounds the ADDED
    * parquet files per batch (a version is never split — the first
    * pending version is always admitted whole, so progress is
    * guaranteed even when one commit exceeds the cap). Absent → all
    * available, the previous behavior. */
  val MaxVersionsPerTrigger = "maxVersionsPerTrigger"
  val MaxFilesPerTrigger = "maxFilesPerTrigger"

  /** readStream option (Delta's idiom, same name): skip data-changing
    * rewrite commits (COW MERGE/UPDATE/DELETE, overwrite, replaceWhere)
    * instead of refusing the history — the whole commit is dropped,
    * appends before and after still deliver. For consumers that
    * tolerate missing updates/deletes (append-only downstream tables);
    * layout-only compaction commits are always skipped regardless. */
  val SkipChangeCommits = "skipChangeCommits"

  /** readStream option (Delta's CDF idiom): deliver the lake as a
    * CHANGE FEED — every row tagged with a `_change_type` column
    * (insert | delete) so the stream survives data-changing rewrite
    * commits instead of refusing them. Semantics are GROUP-level CDF:
    * an append commit delivers its rows as `insert`; a COW MERGE/
    * UPDATE/DELETE/overwrite commit delivers the PRE-IMAGE rows of its
    * rewritten dirs as `delete` and the replacement dirs' rows as
    * `insert` — survivor rows carried through the rewrite appear as a
    * delete+insert PAIR that cancels exactly under signed aggregation
    * (the MV-maintenance consumption shape; volume is the rewritten
    * fraction, never the lake). Layout-only compaction commits deliver
    * nothing. Streaming-only: batch diffs are `VersionedLake.changes`,
    * which cancels carried pairs via the localized multiset diff. */
  val ReadChangeFeed = "readChangeFeed"

  /** readStream option (Kafka/Delta's idiom, default true): when a
    * LAGGING consumer's next batch needs versions that vacuum expired,
    * fail AT OFFSET-PLANNING TIME with the retention-contract error
    * (not a raw missing-path error from deep inside a scan). `false`
    * opts into skipping the expired commits: the stream resumes from
    * the oldest readable version's successor — rows published in the
    * lost commits are never delivered to this consumer (logged, by
    * explicit choice). */
  val FailOnDataLoss = "failOnDataLoss"

  /** The change-type column the CDF stream appends. */
  val ChangeTypeCol = "_change_type"

  /** The commit-version column the CDF stream appends (Delta CDF's
    * `_commit_version`): per-commit ordering made visible, so an
    * order-applying consumer (keyed upsert sink) can sequence events —
    * CDF micro-batch partitions are also EMITTED in commit order
    * (per-version delete-then-insert), never all-deletes-then-all-
    * inserts across the batch. */
  val CommitVersionCol = "_commit_version"

  /** Columns the DML paths auto-index (stats sidecars lifted from the
    * parquet footers): every top-level numeric field — SQL writers
    * have no `commitWithStats` to opt into, so index everything
    * range-skippable by default. */
  private[engine] def numericCols(schema: StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    schema.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == LongType ||
        f.dataType == ShortType || f.dataType == ByteType ||
        f.dataType == FloatType || f.dataType == DoubleType => f.name
    }.toSeq
  }

  /** Runtime-filter predicates → per-column IN value lists, shared by
    * the read scan and the COW operation scan. Only single-column INs
    * with literal children translate; a build side larger than
    * `maxValues` is dropped (admit() is values × files driver work,
    * and a set that large is also too unselective to prune with). */
  private[engine] def parseInPredicates(
      predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate],
      maxValues: Int): Seq[(String, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.{Literal,
      NamedReference}
    predicates.toSeq.flatMap { p =>
      if (p.name() != "IN") None
      else p.children().toSeq match {
        case (f: NamedReference) +: rest
          if f.fieldNames().length == 1 && rest.size <= maxValues &&
            rest.forall(_.isInstanceOf[Literal[_]]) =>
          Some((f.fieldNames()(0),
            rest.map(_.asInstanceOf[Literal[_]].value)))
        case _ => None
      }
    }
  }

  /** Files the executed plan will actually read through the V2 scan —
    * the post-pruning evidence q182 and the spec gate assert on
    * (`DataFrame.inputFiles` reports the index's full listing, BEFORE
    * per-scan filter pruning, so it cannot serve as this witness). */
  def filesRead(df: DataFrame): Int =
    filesReadPlan(df.queryExecution.executedPlan)

  /** [[filesRead]] over an already-executed physical plan — the form a
    * QueryExecutionListener-captured COMMAND plan (MERGE/UPDATE/DELETE)
    * needs: commands have no DataFrame handle, but their captured plan
    * still carries the V2 scans whose runtime filters were applied. */
  def filesReadPlan(plan: org.apache.spark.sql.execution.SparkPlan)
      : Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // AQE wraps executed stages (ResultQueryStage/BroadcastQueryStage
      // in Spark 4) as LEAF nodes whose real plan hangs off `.plan` —
      // without descending, an executed frame measures ZERO scans and
      // a `< total` pruning gate passes vacuously
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(plan).collect {
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

  /** [[filesRead]] but the file PATHS — the witness for assertions
    * about WHICH dirs/partitions a plan reads (`DataFrame.inputFiles`
    * is empty on non-FileTable V2 relations, so it cannot serve). */
  def filesReadPaths(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // AQE wraps executed stages (ResultQueryStage/BroadcastQueryStage
      // in Spark 4) as LEAF nodes whose real plan hangs off `.plan` —
      // without descending, an executed frame measures ZERO scans and
      // a `< total` pruning gate passes vacuously
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.scan match {
        case f: FileScan => f.planInputPartitions().toSeq.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.urlEncodedPath).toSeq
          case _ => Seq.empty[String]
        }
        case _ => Seq.empty[String]
      }
      case _ => Seq.empty[String]
    }
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
  * exists iff that directory has published manifests. DML writes are
  * first-class — `INSERT INTO glake.events …` / `INSERT OVERWRITE`
  * stage parquet and swing the same manifest CAS as
  * [[VersionedLake.commit]] (see [[GraftLakeWrite]]), and
  * `DELETE FROM` runs the stats-pruned survivor rewrite
  * ([[GraftLakeDelete]]). Creation is SQL-first-class too:
  * `CREATE TABLE` publishes a schema-bearing empty version 1, and
  * CTAS / `REPLACE TABLE AS SELECT` are ATOMIC through the
  * `StagingTableCatalog` seam ([[GraftLakeStagedTable]] — data staged
  * unpublished, manifest CAS at commit, the replaced snapshot still
  * time-travelable). Only destructive DDL (drop/alter/rename) is
  * refused: a lake is retired by vacuum with retention, never by a
  * SQL `DROP TABLE` that would unlink 100 TB with no undo. */
final class GraftLakeCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {
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
    val t = VersionedLake.tip(spark, dir)
    if (t.isEmpty) throw new NoSuchTableException(ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir)
    opts.put("mergeSchema", "true")
    if (GraftLakeMapping.enabled(spark, dir))
      GraftLakeMapping.confOptions.foreach { case (k, v0) =>
        opts.put(k, v0) }
    val v = version.getOrElse(t.get)
    new GraftLakeTable(ident.toString, spark,
      new CaseInsensitiveStringMap(opts), Seq(dir),
      VersionedLake.manifestSchema(spark, dir, v), dir, v)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` lands here (the analyzer's time-travel hook). */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.trim.toInt))

  /** `TIMESTAMP AS OF <ts>` — the analyzer hands micros since epoch;
    * resolve to the newest version published at or before that instant
    * ([[VersionedLake.versionAt]], manifest mtimes — one clock for all
    * writers). A timestamp before the first publish is an error, not
    * an empty table: the lake did not exist yet, and an empty answer
    * would be indistinguishable from a real empty snapshot. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val tsMillis = Math.floorDiv(timestamp, 1000L)
    val v = VersionedLake.versionAt(spark, dirOf(ident), tsMillis)
      .getOrElse(throw new NoSuchTableException(ident))
    load(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    VersionedLake.tip(spark, dirOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path((root +: namespace.toSeq).mkString("/"))
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(base)) Array.empty
    else f.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_manifests")))
      .map(p => Identifier.of(namespace, p.getName)).toArray
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "graftlake catalog supports CREATE TABLE [AS SELECT] / REPLACE " +
      "TABLE AS SELECT, ALTER TABLE ADD COLUMN(S), and DML (INSERT " +
      "INTO / INSERT OVERWRITE / DELETE FROM / MERGE / UPDATE commit " +
      "through the versioned manifest protocol) but not destructive " +
      "DDL: a lake is retired by vacuum with retention, never by SQL " +
      "DROP or a column drop/rename — an unlinked 100 TB lake has no " +
      "undo")

  private def toStruct(
      columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : StructType =
    StructType(columns.map { c =>
      val f = org.apache.spark.sql.types
        .StructField(c.name(), c.dataType(), c.nullable())
      Option(c.comment()).fold(f)(f.withComment)
    })

  /** Identity `PARTITIONED BY` columns, validated: every transform
    * must be an identity over one declared top-level column of a
    * dir-renderable type. Returned in declaration order; empty = an
    * unpartitioned lake (the default). Partition values become hive
    * `c=v` dirs inside each commit's data dir and first-class manifest
    * entries — see [[GraftLakePartitions]]. */
  private def identityPartitionCols(
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : Seq[org.apache.spark.sql.types.StructField] = {
    import org.apache.spark.sql.types._
    val cols = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1 &&
        t.references()(0).fieldNames().length == 1,
        s"graftlake supports identity PARTITIONED BY columns only, " +
          s"got $t — derive the partition column in the query " +
          "(bucketing/temporal binning: CALL zorder or the stats/bloom " +
          "sidecars cover those probe shapes without a dir layout)")
      val n = t.references()(0).fieldNames()(0)
      val c = columns.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"PARTITIONED BY names unknown column '$n' " +
            s"(have: ${columns.map(_.name).mkString(", ")})"))
      require(c.dataType match {
        case StringType | IntegerType | LongType | ShortType | ByteType |
             DateType | BooleanType => true
        case _ => false
      }, s"partition column $n has type ${c.dataType.sql}; partition " +
        "values must render as directory names " +
        "(string/integral/date/boolean)")
      StructField(c.name, c.dataType, c.nullable())
    }
    require(cols.isEmpty || cols.size < columns.length,
      "a table cannot be partitioned by every column")
    cols
  }

  /** A REPLACE over an existing partitioned lake must keep its spec:
    * the registry is lake-global (old versions' manifest entries parse
    * against it), so changing partitioning means a new table. */
  private def requireSpecUnchanged(dir: String,
      cols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    val existing = GraftLakePartitions.of(spark, dir)
    require(existing.map(f => (f.name, f.dataType)) ==
      cols.map(f => (f.name, f.dataType)),
      s"cannot change PARTITIONED BY of an existing lake (" +
        s"${existing.map(_.name).mkString(",")} -> " +
        s"${cols.map(_.name).mkString(",")}): old versions' manifest " +
        "entries resolve against the declared spec — create a new " +
        "table and backfill instead")
  }

  /** `TBLPROPERTIES ('bloom' = '<col>[,<col>…]')` — declares the
    * lake's bloom-indexed columns ([[VersionedLake.setBloomIndex]]):
    * every commit, SQL or streaming, then writes per-file bloom
    * sections over EACH so point lookups on any declared key prune. */
  private def bloomProp(
      properties: java.util.Map[String, String],
      columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : Seq[String] =
    Option(properties.get("bloom")).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map { c =>
        // a typo'd column would silently yield a policy every commit
        // filters out — fail the DDL instead
        require(columns.exists(_.name == c),
          s"bloom table property names unknown column '$c' " +
            s"(have: ${columns.map(_.name).mkString(", ")})")
        c
      }.distinct

  /** `TBLPROPERTIES ('cdf' = 'true')` — opts the lake into row-level
    * change capture (Delta's `enableChangeDataFeed`): data-changing
    * commits persist their exact changed rows as `_changes/<version>`
    * sidecars, and change feeds serve O(changed rows) instead of the
    * rewritten dirs' delete+insert pairs. */
  private def cdfProp(properties: java.util.Map[String, String]): Boolean =
    Option(properties.get("cdf")).exists(_.trim.equalsIgnoreCase("true"))

  /** `TBLPROPERTIES ('column_mapping' = 'id')` — parquet field-id
    * column mapping ([[GraftLakeMapping]]): RENAME/DROP COLUMN become
    * metadata-only commits. Declared at CREATE only (ids must be in
    * every file from the first write). */
  private def mappingProp(
      properties: java.util.Map[String, String]): Boolean =
    Option(properties.get("column_mapping")).map(_.trim)
      .filter(_.nonEmpty) match {
      case None => false
      case Some("id") => true
      case Some(other) => throw new IllegalArgumentException(
        s"column_mapping supports 'id' (parquet field-id mapping), " +
          s"got '$other'")
    }

  /** `TBLPROPERTIES ('deletion_vectors' = 'true')` — merge-on-read
    * point deletes ([[VersionedLake]] DV section): a SQL DELETE records
    * (entry, file, position) sidecars instead of rewriting dirs; scans
    * apply them, OPTIMIZE materializes them away. Composes with
    * PARTITIONED BY (the reference's Y/M/D layout + a GDPR point
    * delete is DV's best case — partition-decidable predicates still
    * take the cheaper manifest-only whole-leaf drop); UNMAPPED lakes
    * only (the DV position scan binds columns by name). */
  private def dvProp(properties: java.util.Map[String, String]): Boolean =
    Option(properties.get("deletion_vectors"))
      .exists(_.trim.equalsIgnoreCase("true"))

  private def requireDvCompatible(dv: Boolean,
      partCols: Seq[org.apache.spark.sql.types.StructField],
      mapped: Boolean): Unit = {
    // deletion_vectors composes with BOTH partitioning and column
    // mapping now: the position scan id-matches through the declared
    // schema on mapped lakes, and positions are per-file so partition
    // dirs change nothing structurally. Nothing left to refuse — the
    // hook stays for future property combinations.
    val _ = (dv, partCols, mapped)
  }

  /** `TBLPROPERTIES ('dv_max_ratio' = '0.05')` — the DV maintenance
    * CONTRACT: when live deleted positions exceed this fraction of
    * the rows in the files they cover, the delete that crossed the
    * bound auto-materializes those files' vectors
    * ([[VersionedLake.materializeVectors]]). Requires
    * deletion_vectors. */
  private def dvMaxRatioProp(
      properties: java.util.Map[String, String]): Option[Double] = {
    val raw = Option(properties.get("dv_max_ratio")).map(_.trim)
      .filter(_.nonEmpty)
    raw.foreach { _ =>
      require(dvProp(properties),
        "dv_max_ratio requires 'deletion_vectors' = 'true'")
    }
    raw.map { s =>
      val d =
        try s.toDouble
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"dv_max_ratio must be a number in (0, 1], got '$s'")
        }
      require(d > 0 && d <= 1,
        s"dv_max_ratio must be in (0, 1], got $d")
      d
    }
  }

  /** `TBLPROPERTIES ('dv_max_pending' = '1000000')` — the ABSOLUTE
    * pending-positions bound. Unlike the ratio it is always in force:
    * undeclared tables inherit [[VersionedLake.DvDefaultMaxPending]]
    * (session-overridable via `spark.graft.dv.maxPendingDefault`), so
    * declaring this property RAISES or LOWERS the default rather than
    * opting in. Requires deletion_vectors. */
  private def dvMaxPendingProp(
      properties: java.util.Map[String, String]): Option[Long] = {
    val raw = Option(properties.get("dv_max_pending")).map(_.trim)
      .filter(_.nonEmpty)
    raw.foreach { _ =>
      require(dvProp(properties),
        "dv_max_pending requires 'deletion_vectors' = 'true'")
    }
    raw.map { s =>
      val n =
        try s.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"dv_max_pending must be a positive integer, got '$s'")
        }
      require(n > 0, s"dv_max_pending must be positive, got $n")
      n
    }
  }

  /** Plain `CREATE TABLE` (no AS SELECT): the lake exists from a
    * schema-bearing empty version-1 commit — the same shape a library
    * caller stages before pointing stream writers at a new lake. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val partCols = identityPartitionCols(partitions, columns)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val dir = dirOf(ident)
    val mapped = mappingProp(properties)
    val dv = dvProp(properties)
    requireDvCompatible(dv, partCols, mapped)
    val declared =
      if (mapped) GraftLakeMapping.assignIds(toStruct(columns))
      else toStruct(columns)
    // strict single-attempt v1 publish, NOT commit's CAS-retry: two
    // racing CREATEs must yield one winner and one clean error, never
    // a retried append that unions their schemas/data
    if (partCols.isEmpty) {
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row], declared)
        .repartition(1).write.parquet(s"$dir/$dataDir")
      if (!VersionedLake.publishCreateStrictAll(spark, dir, Seq(dataDir),
          Some(declared.json)))
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
    } else {
      // the schema carrier lives at the null partition (an empty frame
      // has no partition values); the spec registry lands only AFTER
      // the create wins — a lost-race loser must not plant its spec
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      val entry = GraftLakePartitions.seedEmpty(spark, dir, dataDir,
        declared, partCols)
      if (!VersionedLake.publishCreateStrictAll(spark, dir, Seq(entry),
          Some(declared.json)))
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
      GraftLakePartitions.set(spark, dir, partCols)
    }
    if (mapped) GraftLakeMapping.record(spark, dir, declared)
    if (dv) VersionedLake.setDeletionVectors(spark, dir,
      dvMaxRatioProp(properties), dvMaxPendingProp(properties))
    bloomProp(properties, columns).foreach { c =>
      require(!partCols.exists(_.name == c),
        s"bloom table property names partition column '$c' — " +
          "partition pruning already answers point lookups on it")
      VersionedLake.setBloomIndex(spark, dir, c) // accumulates per col
    }
    if (cdfProp(properties)) VersionedLake.setChangeDataFeed(spark, dir)
    loadTable(ident)
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) ------------------------
  // The query writes into an UNPUBLISHED data dir; commitStagedChanges
  // swings the manifest CAS — table-with-data appears atomically or not
  // at all, and REPLACE keeps the old snapshot time-travelable. See
  // [[GraftLakeStagedTable]].

  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val partCols = identityPartitionCols(partitions, columns)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val mapped = mappingProp(properties)
    val dv = dvProp(properties)
    requireDvCompatible(dv, partCols, mapped)
    val declared =
      if (mapped) GraftLakeMapping.assignIds(toStruct(columns))
      else toStruct(columns)
    new GraftLakeStagedTable(ident, dirOf(ident), declared,
      replace = false, orCreate = false,
      bloomProp(properties, columns), partCols, cdfProp(properties),
      mapped, dvProp = dv, dvMaxRatio = dvMaxRatioProp(properties),
      dvMaxPending = dvMaxPendingProp(properties))
  }

  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val partCols = identityPartitionCols(partitions, columns)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val dir = dirOf(ident)
    requireSpecUnchanged(dir, partCols)
    // REPLACE on a MAPPED lake: the new table keeps mapping (old files
    // are only readable by id, and the registry persists). Its columns
    // take FRESH ids from the never-reused counter — pre-replace ids
    // stay retired because pre-replace versions stay time-travelable —
    // and the commit opens a new mapping EPOCH so alias probing cannot
    // merge a reused name with a pre-replace column's history.
    val mapped = GraftLakeMapping.enabled(spark, dir)
    require(!mappingProp(properties) || mapped,
      "column_mapping is declared at CREATE TABLE, not REPLACE")
    val declared =
      if (mapped) GraftLakeMapping.assignIds(toStruct(columns),
        GraftLakeMapping.nextId(spark, dir))
      else toStruct(columns)
    new GraftLakeStagedTable(ident, dir, declared,
      replace = true, orCreate = false,
      bloomProp(properties, columns), partCols, cdfProp(properties),
      mapped = mapped, dvProp = dvProp(properties),
      dvMaxRatio = dvMaxRatioProp(properties),
      dvMaxPending = dvMaxPendingProp(properties),
      epochBump = mapped)
  }

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val partCols = identityPartitionCols(partitions, columns)
    val dir = dirOf(ident)
    val exists = tableExists(ident)
    val existingMapped = exists && GraftLakeMapping.enabled(spark, dir)
    if (exists) {
      requireSpecUnchanged(dir, partCols)
      // an UNMAPPED table cannot gain mapping by replace (its existing
      // files carry no ids); a MAPPED one keeps it, with or without
      // the property respelled
      require(!mappingProp(properties) || existingMapped,
        "column_mapping is declared at CREATE TABLE of a NEW table")
    }
    val mapped = mappingProp(properties) || existingMapped
    val dv = dvProp(properties)
    requireDvCompatible(dv, partCols, mapped)
    val declared =
      if (existingMapped)
        // fresh-id + epoch discipline, as stageReplace
        GraftLakeMapping.assignIds(toStruct(columns),
          GraftLakeMapping.nextId(spark, dir))
      else if (mapped) GraftLakeMapping.assignIds(toStruct(columns))
      else toStruct(columns)
    new GraftLakeStagedTable(ident, dir, declared,
      replace = true, orCreate = true,
      bloomProp(properties, columns), partCols, cdfProp(properties),
      mapped, dvProp = dv, dvMaxRatio = dvMaxRatioProp(properties),
      dvMaxPending = dvMaxPendingProp(properties),
      epochBump = existingMapped)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` records the widened schema as a
    * schema-declaring EMPTY append commit: existing rows read null for
    * the new column, older versions keep their own schema via VERSION
    * AS OF, and the change is itself versioned history.
    *
    * `RENAME COLUMN` / `DROP COLUMN` additionally require COLUMN
    * MAPPING (`TBLPROPERTIES ('column_mapping'='id')` at CREATE): with
    * stable parquet field ids in every file, both are METADATA-ONLY
    * commits — a rename re-declares the schema under the new name
    * (same id, old files' differently-named column still binds by id),
    * a drop removes the field (the data bytes stay in place, invisible
    * — the undo is VERSION AS OF). Without mapping they stay refused:
    * a name-matched rename would null out every old file's column.
    * Retype/reposition stay refused (parquet footers cannot express a
    * reorder; a retype would rewrite data). */
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val setProps = changes.collect { case p: TableChange.SetProperty => p }
    val unsetProps = changes.collect {
      case p: TableChange.RemoveProperty => p }
    if (adds.size + renames.size + drops.size + setProps.size +
        unsetProps.size != changes.size || changes.isEmpty) readOnly
    // SET/UNSET TBLPROPERTIES: the DV maintenance bounds are the
    // tunable policy surface (a lake created without one must be
    // re-boundable without a REPLACE). Registry-only metadata — no
    // version minted, matching the bloom/cdf policy registries — and
    // a TIGHTENED bound acts immediately (the enforcement pass runs
    // here, not just on the next delete). Everything else refuses
    // loudly: silently accepting an unknown property would let a user
    // believe e.g. 'column_mapping' was enabled post-CREATE.
    if (setProps.nonEmpty || unsetProps.nonEmpty) {
      require(adds.isEmpty && renames.isEmpty && drops.isEmpty,
        "graftlake ALTER handles property and column changes in " +
          "separate statements")
      val dir0 = dirOf(ident)
      val touched = setProps.map(_.property) ++
        unsetProps.map(_.property)
      val allowed = Set("dv_max_ratio", "dv_max_pending")
      require(touched.forall(allowed.contains),
        s"graftlake ALTER TABLE SET/UNSET TBLPROPERTIES supports " +
          s"${allowed.mkString(", ")}; got ${touched.mkString(", ")} " +
          "(deletion_vectors/column_mapping/bloom/cdf are declared " +
          "at CREATE TABLE)")
      require(VersionedLake.dvEnabled(spark, dir0),
        "the DV maintenance bounds require a 'deletion_vectors' table")
      var ratio = VersionedLake.dvMaxRatio(spark, dir0)
      var pending = VersionedLake.dvMaxPendingDeclared(spark, dir0)
      setProps.foreach { pr =>
        pr.property match {
          case "dv_max_ratio" =>
            ratio = Some(
              try pr.value.trim.toDouble
              catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"dv_max_ratio must be a number in (0, 1], got " +
                      s"'${pr.value}'")
              })
          case "dv_max_pending" =>
            pending = Some(
              try pr.value.trim.toLong
              catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"dv_max_pending must be a positive integer, got " +
                      s"'${pr.value}'")
              })
        }
      }
      unsetProps.foreach { pr =>
        pr.property match {
          case "dv_max_ratio"   => ratio = None
          case "dv_max_pending" => pending = None
        }
      }
      // setDeletionVectors re-validates ranges; a tightened bound
      // materializes the backlog NOW
      VersionedLake.setDeletionVectors(spark, dir0, ratio, pending)
      VersionedLake.enforceDvBound(spark, dir0)
      return loadTable(ident)
    }
    val dir = dirOf(ident)
    val mapped = GraftLakeMapping.enabled(spark, dir)
    if ((renames.nonEmpty || drops.nonEmpty) && !mapped)
      throw new UnsupportedOperationException(
        "graftlake RENAME/DROP COLUMN needs column mapping — create " +
          "the table with TBLPROPERTIES ('column_mapping'='id'): " +
          "stable parquet field ids make both metadata-only; without " +
          "them a rename would silently null the column in every " +
          "existing file")
    val partCols = GraftLakePartitions.of(spark, dir)
    var schema = loadTable(ident).asInstanceOf[GraftLakeTable].schema()
    adds.foreach { a =>
      require(a.fieldNames().length == 1,
        "graftlake ADD COLUMN supports top-level columns, got " +
          a.fieldNames().mkString("."))
      val colName = a.fieldNames()(0)
      require(a.isNullable,
        s"added column $colName must be nullable: existing rows have " +
          "no value for it")
      require(a.position() == null,
        "graftlake ADD COLUMN appends at the end (mergeSchema union " +
          "order); FIRST/AFTER is not supported")
      require(!schema.fields.exists(_.name.equalsIgnoreCase(colName)),
        s"column $colName already exists")
      val fld = org.apache.spark.sql.types.StructField(colName,
        a.dataType(), nullable = true)
      schema = schema.add(Option(a.comment()).fold(fld)(fld.withComment))
    }
    if (mapped && adds.nonEmpty)
      // fresh ids for added columns, from the registry's never-reused
      // counter (a DROPPED column's id must stay retired: old files
      // still carry it, and a reused id would bind new reads to the
      // dropped column's bytes)
      schema = GraftLakeMapping.assignIds(schema,
        GraftLakeMapping.nextId(spark, dir))
    renames.foreach { r =>
      require(r.fieldNames().length == 1,
        "graftlake RENAME COLUMN supports top-level columns")
      val from = r.fieldNames()(0)
      require(!partCols.exists(_.name.equalsIgnoreCase(from)),
        s"cannot rename partition column $from: partition values are " +
          "directory names, renaming them means re-laying data out")
      require(schema.fieldNames.contains(from), s"no such column $from")
      require(!schema.fields.exists(_.name.equalsIgnoreCase(r.newName())),
        s"column ${r.newName()} already exists")
      schema = org.apache.spark.sql.types.StructType(schema.fields.map(
        f => if (f.name == from) f.copy(name = r.newName()) else f))
    }
    drops.foreach { d =>
      require(d.fieldNames().length == 1,
        "graftlake DROP COLUMN supports top-level columns")
      val c = d.fieldNames()(0)
      require(!partCols.exists(_.name.equalsIgnoreCase(c)),
        s"cannot drop partition column $c")
      require(schema.fieldNames.contains(c), s"no such column $c")
      require(schema.fields.length > partCols.length + 1,
        "cannot drop the last data column")
      schema = org.apache.spark.sql.types.StructType(
        schema.fields.filterNot(_.name == c))
    }
    if (renames.nonEmpty) {
      // the bloom policy follows renamed names (sidecar ALIASES keep
      // old files pruning; new commits index under the new name)
      val renamedBloom = VersionedLake.bloomIndexCols(spark, dir).map(c =>
        renames.find(_.fieldNames()(0) == c).fold(c)(_.newName()))
      VersionedLake.setBloomIndexCols(spark, dir, renamedBloom)
    }
    // plain append commit (CAS-retried): racing writers are safe — an
    // empty dir unions with anything, and two concurrent ALTERs land
    // as successive versions whose schemas merge. On a partitioned
    // lake the schema carrier lives at the null-partition entry like
    // every other empty commit.
    if (partCols.isEmpty) {
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row], schema)
        .repartition(1).write.parquet(s"$dir/$dataDir")
      // index the empty carrier like every other staged dir — without
      // a stats line its seed file would demote statsCovered (and the
      // metadata-only aggregate path) FOREVER after any ALTER
      VersionedLake.indexStagedDir(spark, dir, dataDir, schema)
      VersionedLake.publishAll(spark, dir, Seq(dataDir),
        "append", schemaDdl = Some(schema.json))
    } else {
      val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
      val entry = GraftLakePartitions.seedEmpty(spark, dir,
        dataDir, schema, partCols)
      VersionedLake.indexStagedDir(spark, dir, entry,
        org.apache.spark.sql.types.StructType(schema.filterNot(f =>
          partCols.exists(_.name.equalsIgnoreCase(f.name)))))
      VersionedLake.publishAll(spark, dir, Seq(entry), "append",
        schemaDdl = Some(schema.json))
    }
    if (mapped) GraftLakeMapping.record(spark, dir, schema)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = readOnly

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly

  /** Lifecycle operations as `CALL glake.<proc>(…)` — see
    * [[GraftLakeProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftLakeProcedures.load(root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftLakeProcedures.list(namespace)
}

/** One published snapshot as a native parquet DSv2 table. The scan
  * machinery is Spark's own `ParquetTable` (held as a DELEGATE, with
  * the file index replaced by the manifest snapshot + sidecar
  * pruning) — but the table deliberately does NOT extend `FileTable`:
  * the analyzer's `FallBackFileSourceV2` rule rewrites every
  * `INSERT INTO` over a `FileTable` into a V1
  * `InsertIntoHadoopFsRelationCommand` aimed at the index's root
  * paths, which here would APPEND RAW FILES INTO A PUBLISHED DATA DIR
  * — mutating an immutable snapshot behind every reader's and time
  * traveler's back, with no version bump. Wrapping instead of
  * extending keeps that rule from matching, so writes stay on the V2
  * path and land in [[GraftLakeWrite]]'s staged-dir + manifest-CAS
  * protocol. */
object GraftLakeTable {
  /** Install the two post-PartitionPruning runtime-pruning rules into
    * THIS session's experimental hook if absent. They cannot ride
    * `GraftExtensions`: no SparkSessionExtensions injection point
    * lands after the optimizer's "PartitionPruning" batch (where Spark
    * builds the struct-IN that [[org.apache.spark.sql.graft
    * .SplitCowGroupFilter]] decomposes), and "User Provided
    * Optimizers" is the only batch back there. A session built outside
    * [[graft.Sessions]] — a user's own builder with just
    * `spark.sql.extensions` — would silently lose multi-key COW group
    * pruning AND join-driven MoR file pruning (correctness unaffected,
    * but a two-key MERGE rewrites dirs both keys could have pruned).
    * Called at TABLE RESOLUTION: every query that can hit either rule
    * resolves a GraftLakeTable first, and the optimizer re-reads
    * `extraOptimizations` per run, so even the resolving query's own
    * optimization already sees the rules. */
  private[graft] def ensureRuntimeRules(spark: SparkSession): Unit =
    // check-then-act on a shared mutable field: concurrent table
    // resolutions on one session (the supported disjoint-key writer
    // race) would otherwise append the pair twice — each duplicate
    // costs optimizer time on every later query's fixedPoint batch
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      val missing = Seq(
        org.apache.spark.sql.graft.SplitCowGroupFilter,
        org.apache.spark.sql.graft.InjectDeltaRuntimeFilter)
        .filterNot(cur.contains)
      if (missing.nonEmpty)
        spark.experimental.extraOptimizations = cur ++ missing
    }
}

final class GraftLakeTable(tableName: String, spark: SparkSession,
    options: CaseInsensitiveStringMap, paths: Seq[String],
    userSpecifiedSchema: Option[StructType], lakeDir: String, version: Int,
    cdf: Boolean = false)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  import org.apache.spark.sql.connector.catalog.TableCapability

  GraftLakeTable.ensureRuntimeRules(spark)

  private val snapshotVersion = version // FileTable.version() shadows inside the delegate
  private val delegate: ParquetTable =
    new ParquetTable(tableName, spark, options, paths, userSpecifiedSchema,
        classOf[ParquetFileFormat]) {
      override lazy val fileIndex: PartitioningAwareFileIndex =
        new GraftLakeFileIndex(spark, lakeDir, snapshotVersion)
    }

  /** Table creation options merged under call-site options — the same
    * precedence as FileTable's protected `mergedOptions`, replicated
    * here because the delegate's copy is FileTable-protected. */
  private def merged(o: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    m.putAll(o.asCaseSensitiveMap())
    new CaseInsensitiveStringMap(m)
  }

  /** The CDF column, appended LAST so positional consumers of the base
    * schema are unaffected. Nullable=false in spirit (the stream always
    * fills it), but declared nullable because the underlying parquet
    * files do not carry it — the reader materializes it as null and
    * the per-partition projection overwrites it with the op constant. */
  private def widen(s: StructType): StructType =
    // idempotent: getTable receives inferSchema's output (already
    // widened) as the user-specified schema — widening again would
    // plant a duplicate column
    if (!cdf || s.fieldNames.contains(GraftLakeDataSource.ChangeTypeCol)) s
    else StructType(s.fields :+ org.apache.spark.sql.types.StructField(
      GraftLakeDataSource.ChangeTypeCol,
      org.apache.spark.sql.types.StringType, nullable = true)
      :+ org.apache.spark.sql.types.StructField(
      GraftLakeDataSource.CommitVersionCol,
      org.apache.spark.sql.types.LongType, nullable = true))

  override def name(): String = tableName
  override def schema(): StructType = widen(delegate.schema)

  /** Declared identity partitioning, surfaced so DESCRIBE/SHOW and the
    * analyzer see the layout (the registry is the source of truth —
    * see [[GraftLakePartitions]]). */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    GraftLakePartitions.of(spark, lakeDir).map(c =>
      org.apache.spark.sql.connector.expressions.Expressions
        .identity(c.name)).toArray
  /** Declared feature registries, surfaced so SHOW TBLPROPERTIES /
    * DESCRIBE EXTENDED reflect what the lake actually enforces —
    * including maintenance bounds set later via
    * `ALTER TABLE SET TBLPROPERTIES`. Read from the registries ONCE
    * PER TABLE INSTANCE: Spark calls properties() repeatedly while
    * resolving a single plan (and again for DESCRIBE), and each
    * uncached call costs five registry reads — several metadata RPCs
    * per plan on an object store. A table instance is minted per
    * resolution at a pinned snapshot version, so the memo is exactly
    * as fresh as the snapshot itself: the next statement re-resolves
    * the table and re-reads the ALTER-visible bounds from disk. */
  override def properties(): java.util.Map[String, String] =
    memoizedProperties

  private lazy val memoizedProperties: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    if (VersionedLake.dvEnabled(spark, lakeDir)) {
      m.put("deletion_vectors", "true")
      VersionedLake.dvMaxRatio(spark, lakeDir)
        .foreach(r => m.put("dv_max_ratio", r.toString))
      VersionedLake.dvMaxPendingDeclared(spark, lakeDir)
        .foreach(n => m.put("dv_max_pending", n.toString))
    }
    if (GraftLakeMapping.enabled(spark, lakeDir))
      m.put("column_mapping", "id")
    if (VersionedLake.cdfEnabled(spark, lakeDir)) m.put("cdf", "true")
    val blooms = VersionedLake.bloomIndexCols(spark, lakeDir)
    if (blooms.nonEmpty) m.put("bloom", blooms.mkString(","))
    m
  }

  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    // same idempotence as widen(): the delegate may already carry the
    // CDF columns via the round-tripped user-specified schema
    if (!cdf || delegate.schema.fieldNames.contains(
        GraftLakeDataSource.ChangeTypeCol)) delegate.columns()
    else delegate.columns() :+
      org.apache.spark.sql.connector.catalog.Column.create(
        GraftLakeDataSource.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, true) :+
      org.apache.spark.sql.connector.catalog.Column.create(
        GraftLakeDataSource.CommitVersionCol,
        org.apache.spark.sql.types.LongType, true)
  private[engine] def dataSchema: StructType = delegate.dataSchema
  private[engine] def formatName: String = delegate.formatName
  private[engine] def supportsDataType(
      dt: org.apache.spark.sql.types.DataType): Boolean =
    delegate.supportsDataType(dt)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, // versions as offsets, below
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, // epoch-tagged commits, below
      TableCapability.TRUNCATE, // INSERT OVERWRITE on the whole table
      TableCapability.OVERWRITE_BY_FILTER) // writeTo(...).overwrite(cond)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =
    // cdf: _change_type rides in BOTH schemas so the builder treats it
    // as a (files-absent → null) data column; the stream's reader
    // factory overwrites it with each partition's op constant
    new GraftLakeScanBuilder(spark, delegate.fileIndex, schema(),
      widen(delegate.dataSchema), merged(options), lakeDir, cdf,
      // deletion vectors applying to THIS snapshot (version-bound:
      // time travel below a DV commit must not see it), restricted to
      // files the snapshot actually holds — once a rewrite/OPTIMIZE
      // materializes every vector away, scans are vectorized again
      // IMMEDIATELY, not only after vacuum sweeps the dead sidecars
      {
        val dv0 = VersionedLake.dvRefs(spark, lakeDir, snapshotVersion)
        if (dv0.isEmpty) dv0
        else {
          // keys are `entry…/fileName` relative paths — match by the
          // same-depth suffix of each live file's full path
          val segs = dv0.keysIterator.next().count(_ == '/') + 1
          // inputFiles reports URL-ENCODED URI strings; DV keys are
          // on-disk (decoded) relative paths — normalize before the
          // suffix match or an encodable partition value (a space, a
          // '#') would silently filter the vector out of the scan
          val live = delegate.fileIndex.inputFiles
            .map(p => GraftLakeDvScan.tailSegments(
              GraftLakeDvScan.decodedPathString(p), segs)).toSet
          dv0.filter { case (k, _) => live(k) }
        }
      })

  /** Batch writes go through the SAME commit protocol as the library:
    * tasks stage parquet into a fresh `d-*` dir via Spark's own
    * committer, and the driver-side `BatchWrite.commit` swings the
    * manifest CAS ([[VersionedLake.publish]]) — so `INSERT INTO`,
    * `INSERT OVERWRITE` and `df.write.format("graftlake")` are real
    * versioned commits: atomic (readers see the old tip until the
    * pointer lands), concurrency-safe (CAS retry), and vacuum-visible.
    * Streaming writes (`writeStream.format("graftlake")`) commit one
    * version per micro-batch through the SAME tag-deduplicated manifest
    * protocol as the library's exactly-once sinks — the transaction id
    * is (queryId, epochId), so a checkpoint replay no-ops
    * ([[GraftLakeStreamingWrite]]). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(!cdf, "a readChangeFeed handle is read-only")
    val mergedInfo = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = merged(info.options())
      override def queryId(): String = info.queryId()
      override def schema(): StructType = info.schema()
    }
    new GraftLakeWriteBuilder(this, lakeDir, mergedInfo)
  }

  /** Whether row-level SQL routes MERGE-ON-READ: EVERY deletion-vector
    * lake — flat, partitioned, and column-mapped — publishes UPDATE /
    * MERGE / rich-predicate DELETE as positions sidecar + small append
    * ([[GraftLakeDeltaOperation]]; mapped lakes id-match the scan and
    * overlay field ids on the staged rewrite). Copy-on-write remains
    * for lakes without vectors. */
  private def deltaCapable: Boolean =
    VersionedLake.dvEnabled(spark, lakeDir)

  /** Row-address metadata columns — surfaced on every DV lake, served
    * by BOTH scan paths that can synthesize them: the row-level delta
    * scan and the plain batch read (which routes through the same
    * wrapper when a query projects them —
    * [[GraftLakeScanBuilder.pruneColumns]]). */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (deltaCapable) GraftLakeDeltaOp.metadataColumns
    else Array.empty

  /** SQL `MERGE INTO` / `UPDATE` / rich-predicate `DELETE`: on EVERY
    * deletion-vector lake — flat, partitioned, column-mapped —
    * MERGE-ON-READ ([[GraftLakeDeltaOperation]]
    * — O(changed rows) written, zero data rewritten); otherwise
    * group-based copy-on-write ([[GraftLakeRowLevelOperation]]):
    * Spark rewrites each into read-groups → mutate rows → replace-
    * groups, with the sidecars pruning unaffected dirs at runtime. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.RowLevelOperation =
        if (deltaCapable)
          new GraftLakeDeltaOperation(GraftLakeTable.this, spark,
            lakeDir, snapshotVersion, info.command())
        else new GraftLakeRowLevelOperation(GraftLakeTable.this, spark,
          lakeDir, snapshotVersion, info.command())
    }

  /** SQL `DELETE FROM` as a versioned commit. The pushed conjuncts
    * must compose into ONE closed numeric interval on ONE column (or
    * the always-true truncate) — exactly what
    * [[VersionedLake.deleteRange]] executes as a stats-pruned
    * rewrite-survivors commit: untouched data dirs are carried by
    * manifest reference (zero IO), only intersecting dirs rewrite, a
    * no-match delete publishes nothing, and history stays time-
    * travelable. Anything the interval can't express (OR, IN,
    * predicates on two columns, string columns, float ranges
    * unbounded above — NaN orders above +Inf in Spark) reports
    * `canDeleteWhere = false`, and Spark falls back to the group-based
    * copy-on-write path ([[GraftLakeRowLevelOperation]]) — exact for
    * every predicate, still one atomic version, just without the
    * metadata-only shortcut. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    val partCols = GraftLakePartitions.of(spark, lakeDir)
    if (partCols.isEmpty)
      // the metadata-delete survivor rewrite id-matches on mapped
      // lakes (VersionedLake.survivorReader) and the DV position scan
      // reads through the declared schema, so neither path excludes
      // column mapping anymore. A DELETION-VECTOR lake takes this
      // path for EVERY exactly-replayable predicate: the delete
      // records positions, no rewrite.
      GraftLakeDelete.translate(schema(), filters).isDefined ||
        (VersionedLake.dvEnabled(spark, lakeDir) &&
          filters.forall(f =>
            GraftLakeDelete.toColumn(schema(), f).isDefined))
    else {
      // partitioned lakes take the metadata path for partition-
      // decidable predicates (whole entries drop by manifest
      // reference). On a DELETION-VECTOR lake, data-column predicates
      // ALSO stay metadata-scale: partition conjuncts prune entries,
      // the rest records positions — the Y/M/D-lake GDPR shape. A
      // filter mixing partition and data references (an OR across the
      // two) fits neither split and takes the COW rewrite. Everything
      // else: copy-on-write, which is partition-aware.
      val translatable = filters.forall(f =>
        GraftLakeDelete.toColumn(schema(), f).isDefined)
      val partNames = partCols.map(_.name).toSet
      def unmixed = filters.forall { f =>
        val refs = f.references
        refs.forall(partNames.contains) || !refs.exists(partNames.contains)
      }
      translatable &&
        (GraftLakePartitions.partitionDecidable(filters, partCols) ||
          (VersionedLake.dvEnabled(spark, lakeDir) && filters.nonEmpty &&
            unmixed))
    }
  }

  /** Whole-partition DELETE: every entry whose partition values make
    * the predicate TRUE is dropped BY MANIFEST REFERENCE — zero data
    * IO, the O(metadata) retention shape directory partitioning
    * exists for. Exact catalyst evaluation of the predicate over the
    * entry values (all rows of an entry share them); entries where it
    * is FALSE or NULL survive whole. */
  private def deleteWherePartitioned(
      filters: Array[org.apache.spark.sql.sources.Filter],
      partCols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    import org.apache.spark.sql.functions.lit
    val pred = filters.toSeq
      .map(f => GraftLakeDelete.toColumn(schema(), f).getOrElse(
        throw new IllegalStateException(s"untranslatable filter $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    val tipV = VersionedLake.tip(spark, lakeDir).getOrElse(return)
    val snapshot = VersionedLake.manifestEntries(spark, lakeDir, tipV)
    val (touched, kept) =
      GraftLakePartitions.entriesWhere(spark, snapshot, partCols, pred)
    if (touched.isEmpty) return // no partition matches: no new version
    // a delete emptying the lake still needs a schema carrier
    val added =
      if (kept.nonEmpty) Seq.empty[String]
      else {
        val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
        Seq(GraftLakePartitions.seedEmpty(spark, lakeDir, dataDir,
          schema(), partCols))
      }
    VersionedLake.publishReplacingCheckedAll(spark, lakeDir,
      touched.toSet, added, snapshot.toSet, Some(schema().json))
    ()
  }

  /** GUARD against Spark's lossy V2→V1 predicate bridge:
    * `PredicateUtils.toV1` converts `OR(a, b)` with an untranslatable
    * side into JUST THE OTHER SIDE (a strictly stronger predicate),
    * and the default `SupportsDelete` bridge's only defense is an
    * outer array-length check an OR never trips. Unchecked, a
    * `DELETE WHERE id % 1000 = 1 OR v > 9998.5` arrives at
    * [[deleteWhere]] as `v > 9998.5` alone — a SILENT partial delete.
    * Accept a predicate only when its V1 conversion is FAITHFUL:
    * every OR/AND/NOT node's children must themselves convert (the
    * default leaf conversion is all-or-nothing, so only the boolean
    * connectives need the recursion). Refusal falls back to the
    * row-level plan, which is exact for every predicate. */
  private def faithfulToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.filter._
    p match {
      case o: Or => faithfulToV1(o.left()) && faithfulToV1(o.right())
      case a: And => faithfulToV1(a.left()) && faithfulToV1(a.right())
      case n: Not => faithfulToV1(n.child())
      case leaf =>
        org.apache.spark.sql.graft.PredicateBridge.toV1(leaf).isDefined
    }
  }

  override def canDeleteWhere(
      predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean =
    predicates.forall(faithfulToV1) && super.canDeleteWhere(predicates)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val partCols = GraftLakePartitions.of(spark, lakeDir)
    if (partCols.nonEmpty) {
      if (GraftLakePartitions.partitionDecidable(filters, partCols)) {
        deleteWherePartitioned(filters, partCols)
        return
      }
      // DV on a PARTITIONED lake (canDeleteWhere gated: DV enabled,
      // translatable, no partition/data-mixed filter): partition
      // conjuncts prune candidate ENTRIES from their names — an entry
      // where they are FALSE or NULL holds no matching row — and the
      // position scan runs over the survivors with the FULL predicate
      // (the partitioned scan reconstructs partition columns), so the
      // delete writes O(matched positions) and reads O(candidate
      // files), never O(lake)
      import org.apache.spark.sql.functions.lit
      val partNames = partCols.map(_.name).toSet
      val (partF, dataF) =
        filters.partition(_.references.forall(partNames.contains))
      def toCol(fs: Array[org.apache.spark.sql.sources.Filter]) =
        fs.toSeq.map(f => GraftLakeDelete.toColumn(schema(), f)
          .getOrElse(throw new IllegalStateException(
            s"untranslatable filter $f")))
          .reduceOption(_ && _).getOrElse(lit(true))
      val tipV = VersionedLake.tip(spark, lakeDir).getOrElse(return)
      val snapshot = VersionedLake.manifestEntries(spark, lakeDir, tipV)
      val candidates =
        if (partF.isEmpty) snapshot
        else GraftLakePartitions.entriesWhere(spark, snapshot, partCols,
          toCol(partF))._1
      if (candidates.isEmpty) return
      // range/point file pruning only from DATA-column conjuncts —
      // stats/bloom sidecars cover data columns; partition columns
      // were already spent on the entry split
      val bound = GraftLakeDelete.translate(schema(), dataF) match {
        case Some(GraftLakeDelete.Range(c, lo, hi)) => Some((c, lo, hi))
        case _ => None
      }
      val points = dataF.toSeq.collect {
        case org.apache.spark.sql.sources.EqualTo(c, v) => (c, Seq(v))
        case org.apache.spark.sql.sources.In(c, vs) => (c, vs.toSeq)
      }
      VersionedLake.deleteVectors(spark, lakeDir, toCol(filters), bound,
        points, entriesOverride = Some(candidates))
      return
    }
    // DELETION-VECTOR lakes: any exactly-replayable predicate becomes
    // a positions sidecar — O(deleted rows) written, zero dirs
    // rewritten (truncate stays the cheaper manifest overwrite). A
    // one-interval condition still bounds the position SCAN through
    // the stats sidecars.
    if (VersionedLake.dvEnabled(spark, lakeDir) &&
        filters.nonEmpty &&
        !GraftLakeDelete.translate(schema(), filters)
          .contains(GraftLakeDelete.Truncate)) {
      import org.apache.spark.sql.functions.lit
      val pred = filters.toSeq
        .map(f => GraftLakeDelete.toColumn(schema(), f).getOrElse(
          throw new IllegalStateException(s"untranslatable filter $f")))
        .reduceOption(_ && _).getOrElse(lit(true))
      val bound = GraftLakeDelete.translate(schema(), filters) match {
        case Some(GraftLakeDelete.Range(c, lo, hi)) => Some((c, lo, hi))
        case _ => None
      }
      // point-lookup conjuncts prune the POSITION SCAN at file level
      // through the stats + bloom sidecars — a 100 TB key-set delete
      // reads the files that can hold the keys, not the lake
      val points = filters.toSeq.collect {
        case org.apache.spark.sql.sources.EqualTo(c, v) => (c, Seq(v))
        case org.apache.spark.sql.sources.In(c, vs) => (c, vs.toSeq)
      }
      VersionedLake.deleteVectors(spark, lakeDir, pred, bound, points)
      return
    }
    GraftLakeDelete.translate(schema(), filters) match {
      case Some(GraftLakeDelete.Truncate) =>
        // manifest-level truncate: one empty-but-schema-bearing commit
        // (SPARK-23271 writes a footer-only file), so the tip is an
        // empty table and every prior version stays readable
        val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema()).repartition(1)
          .write.parquet(s"$lakeDir/$dataDir")
        VersionedLake.publishAll(spark, lakeDir, Seq(dataDir),
          "overwrite", schemaDdl = Some(schema().json))
        ()
      case Some(GraftLakeDelete.Range(c, lo, hi)) =>
        if (lo <= hi) {
          VersionedLake.deleteRange(spark, lakeDir, c, lo, hi,
            GraftLakeDataSource.numericCols(schema()))
          ()
        } // empty interval: nothing can match — publish nothing
      case None => throw new UnsupportedOperationException(
        // defensive: unreachable through SQL — Spark consults
        // canDeleteWhere first and routes untranslatable predicates to
        // the copy-on-write rewrite instead
        "graftlake metadata DELETE supports one numeric range on one " +
          "column (or no WHERE); richer predicates take the " +
          "copy-on-write path")
    }
  }
}

/** Pushed-filter → delete-interval translation for [[GraftLakeTable]].
  * Deliberately exact-or-refuse: every accepted shape provably deletes
  * the SAME rows as catalyst would (NULLs never match a range in
  * either engine; strict bounds become the adjacent representable
  * double; integral literals beyond 2^52 are refused because the
  * interval compares as double and would round). The one systematic
  * divergence is NaN: Spark orders NaN above +Infinity, so `c > v`
  * with no upper bound MATCHES NaN in catalyst but no closed [lo, hi]
  * interval can — ranges unbounded above on float/double columns are
  * therefore not translated (they take the copy-on-write path, which
  * evaluates the predicate exactly) rather than silently keeping NaN
  * rows. */
private[engine] object GraftLakeDelete {
  // the file imports catalyst's expressions of the same names; the
  // V1 pushdown filters need explicit qualification
  import org.apache.spark.sql.{sources => sf}
  import org.apache.spark.sql.sources.Filter
  import org.apache.spark.sql.types._

  sealed trait Action
  case object Truncate extends Action
  final case class Range(col: String, lo: Double, hi: Double) extends Action

  private val MaxExactLong = 1L << 52

  private def asExactDouble(v: Any): Option[Double] = v match {
    case i: Int => Some(i.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case l: Long =>
      if (math.abs(l) <= MaxExactLong) Some(l.toDouble) else None
    case f: Float if !f.isNaN => Some(f.toDouble)
    case d: Double if !d.isNaN => Some(d)
    case _ => None
  }

  /** Exact replay of one pushed V1 filter as a catalyst `Column` —
    * the full algebra Spark's own `DataSourceStrategy.translateFilter`
    * emits, so every condition that REACHES a data source (Spark
    * refuses to plan the untranslatable ones) evaluates here with
    * catalyst's exact semantics, three-valued logic included: the
    * filter was BORN from a catalyst expression, and this maps each
    * node back to the catalyst function it came from. Refuses (None)
    * any attribute not a top-level schema field and any future filter
    * node this version doesn't know — callers gate on `isDefined`
    * (`canOverwrite`), so unknown shapes fail analysis, never rows. */
  def toColumn(schema: StructType,
      f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, lit}
    def ref(a: String): Option[Column] =
      if (schema.fields.exists(_.name == a))
        Some(col("`" + a.replace("`", "``") + "`"))
      else None
    def rec(f: Filter): Option[Column] = f match {
      case _: sf.AlwaysTrue => Some(lit(true))
      case _: sf.AlwaysFalse => Some(lit(false))
      case sf.And(a, b) => for {x <- rec(a); y <- rec(b)} yield x && y
      case sf.Or(a, b) => for {x <- rec(a); y <- rec(b)} yield x || y
      case sf.Not(a) => rec(a).map(!_)
      case sf.EqualTo(a, v) => ref(a).map(_ === lit(v))
      case sf.EqualNullSafe(a, v) => ref(a).map(_ <=> lit(v))
      case sf.GreaterThan(a, v) => ref(a).map(_ > lit(v))
      case sf.GreaterThanOrEqual(a, v) => ref(a).map(_ >= lit(v))
      case sf.LessThan(a, v) => ref(a).map(_ < lit(v))
      case sf.LessThanOrEqual(a, v) => ref(a).map(_ <= lit(v))
      case sf.In(a, vs) => ref(a).map(_.isin(vs.toSeq: _*))
      case sf.IsNull(a) => ref(a).map(_.isNull)
      case sf.IsNotNull(a) => ref(a).map(_.isNotNull)
      case sf.StringStartsWith(a, v) => ref(a).map(_.startsWith(v))
      case sf.StringEndsWith(a, v) => ref(a).map(_.endsWith(v))
      case sf.StringContains(a, v) => ref(a).map(_.contains(v))
      case _ => None
    }
    rec(f)
  }

  def translate(schema: StructType,
      filters: Array[Filter]): Option[Action] = {
    def flatten(f: Filter): Seq[Filter] = f match {
      case sf.And(a, b) => flatten(a) ++ flatten(b)
      case other => Seq(other)
    }
    val conjuncts = filters.toSeq.flatMap(flatten)
      .filterNot(_.isInstanceOf[sf.AlwaysTrue])
    if (conjuncts.isEmpty) return Some(Truncate)

    def numericTopLevel(a: String): Boolean =
      schema.fields.exists(f => f.name == a && (f.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType => true
        case _ => false
      }))
    def floating(a: String): Boolean =
      schema.fields.exists(f => f.name == a &&
        (f.dataType == FloatType || f.dataType == DoubleType))

    // each conjunct contributes one [lo, hi] bound on one column
    val bounds = conjuncts.map {
      case sf.EqualTo(a, v) => asExactDouble(v).map(d => (a, d, d))
      case sf.GreaterThan(a, v) =>
        asExactDouble(v).map(d =>
          (a, Math.nextUp(d), Double.PositiveInfinity))
      case sf.GreaterThanOrEqual(a, v) =>
        asExactDouble(v).map(d => (a, d, Double.PositiveInfinity))
      case sf.LessThan(a, v) =>
        asExactDouble(v).map(d =>
          (a, Double.NegativeInfinity, Math.nextDown(d)))
      case sf.LessThanOrEqual(a, v) =>
        asExactDouble(v).map(d => (a, Double.NegativeInfinity, d))
      // implied by any range (a range never matches NULL), and alone
      // it is the full non-null interval
      case sf.IsNotNull(a) =>
        Some((a, Double.NegativeInfinity, Double.PositiveInfinity))
      case _ => None
    }
    if (bounds.exists(_.isEmpty)) return None
    val bs = bounds.flatten
    val col = bs.head._1
    if (!bs.forall(_._1 == col) || !numericTopLevel(col)) return None
    val lo = bs.map(_._2).max
    val hi = bs.map(_._3).min
    // NaN divergence (see scaladoc): refuse unbounded-above floats
    if (floating(col) && hi.isPosInfinity) return None
    Some(Range(col, lo, hi))
  }
}

/** WriteBuilder for the lake: append by default, `truncate()` (what
  * Spark plans for `INSERT OVERWRITE` / `mode("overwrite")` on an
  * unpartitioned table) becomes a manifest-level overwrite — the new
  * version's live set is just the staged dir; old dirs stay readable
  * through time travel until vacuum.
  *
  * `overwrite(filters)` — what Spark plans for
  * `df.writeTo("glake.t").overwrite(cond)` (replaceWhere) — becomes ONE
  * atomic versioned commit: rows matching the condition are deleted,
  * the new data appended, published together as a single manifest swap.
  * The condition is evaluated EXACTLY (the full pushed-filter algebra,
  * [[GraftLakeDelete.toColumn]]); when it additionally composes into
  * one numeric interval, the stats sidecars prune the rewrite to the
  * intersecting data dirs — every other live dir is carried by manifest
  * reference, zero IO, same shape as [[VersionedLake.deleteRange]]. */
final class GraftLakeWriteBuilder(table: GraftLakeTable, lakeDir: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var mode = "append"
  private var replaceCond: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    mode = "overwrite"; replaceCond = Array.empty; this
  }

  // exact-or-refuse, consulted by Spark BEFORE overwrite(): a filter
  // shape toColumn cannot replay exactly surfaces as a clean analysis
  // error ("table does not support overwrite by filter"), never a
  // wrong-rows commit. On a PARTITIONED lake a partition-decidable
  // condition swaps whole partition entries by manifest reference
  // (INSERT OVERWRITE ... PARTITION / the Y/M/D backfill shape, zero
  // survivor IO); a data-column condition takes the partitioned COW
  // path — only the partitions its partition-decidable conjuncts admit
  // are rewritten, the rest carry by reference.
  override def canOverwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f =>
      GraftLakeDelete.toColumn(table.schema(), f).isDefined)

  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(canOverwrite(filters),
      "graftlake overwrite-by-filter got an untranslatable condition " +
        s"(Spark should have consulted canOverwrite): ${filters.mkString(", ")}")
    GraftLakeDelete.translate(table.schema(), filters) match {
      case Some(GraftLakeDelete.Truncate) => truncate()
      case _ => mode = "replace"; replaceCond = filters; this
    }
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    // same dir shape as VersionedLake.commit — compaction, vacuum and
    // the racing-writer specs treat every d-* dir uniformly
    val dataDir = s"d-${java.util.UUID.randomUUID.toString.take(12)}"
    val spark0 = org.apache.spark.sql.SparkSession.active
    val partCols = GraftLakePartitions.of(spark0, lakeDir)
    val mapped = GraftLakeMapping.enabled(spark0, lakeDir)
    val inner: org.apache.spark.sql.connector.write.Write =
      if (partCols.isEmpty && !mapped)
        org.apache.spark.sql.execution.datasources.v2.parquet
          .ParquetWrite(Seq(s"$lakeDir/$dataDir"), table.formatName,
            table.supportsDataType _, info)
      // the custom write also serves MAPPED tables (field-id overlay)
      else new GraftLakePartitionedWrite(s"$lakeDir/$dataDir", info,
        partCols.map(_.name),
        s"graftlake partitioned $mode $lakeDir (staging $dataDir)",
        if (mapped) Some(table.schema()) else None)
    new GraftLakeWrite(inner, info, lakeDir, dataDir, mode,
      table.schema(), replaceCond, partCols)
  }
}

/** The staged write: execution is byte-for-byte Spark's parquet V2
  * write into the staging dir (task commits, speculation, the lot);
  * the ONLY addition is the driver-side manifest publish after the
  * file committer lands — the same two-phase shape as
  * [[VersionedLake.commit]] (durable data dir, then pointer CAS). An
  * abort deletes the staging dir; a crash between file-commit and
  * manifest-publish leaves an unreferenced dir that no reader ever
  * sees and vacuum sweeps. */
final class GraftLakeWrite(
    inner: org.apache.spark.sql.connector.write.Write,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    lakeDir: String, dataDir: String, mode: String,
    tableSchema: StructType,
    replaceCond: Array[org.apache.spark.sql.sources.Filter],
    partCols: Seq[org.apache.spark.sql.types.StructField] = Seq.empty)
  extends org.apache.spark.sql.connector.write.Write
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory,
    PhysicalWriteInfo, WriterCommitMessage}

  override def description(): String =
    s"graftlake $mode $lakeDir (staging $dataDir)"

  // a partitioned staging write needs rows ordered by the partition
  // columns (one open file per task); unpartitioned is a no-op
  override def requiredDistribution
      : org.apache.spark.sql.connector.distributions.Distribution =
    inner match {
      case r: org.apache.spark.sql.connector.write
        .RequiresDistributionAndOrdering => r.requiredDistribution
      case _ => org.apache.spark.sql.connector.distributions.Distributions
        .unspecified()
    }
  override def requiredOrdering
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    inner match {
      case r: org.apache.spark.sql.connector.write
        .RequiresDistributionAndOrdering => r.requiredOrdering
      case _ => Array.empty
    }

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    import scala.jdk.CollectionConverters._
    require(mode != "replace", // unreachable: no streaming plan builds it
      "overwrite-by-filter is a batch operation; streams append (or " +
        "truncate per batch in Complete mode)")
    // the batch staging dir allocated by the builder is unused here (a
    // name only — nothing touches disk until tasks write); streaming
    // stages per-epoch files under _stage and commits per epoch instead.
    // Partitioned lakes route each epoch's rows into c=v leaf files and
    // publish one manifest entry per (epoch, partition leaf) — the
    // reference's flagship micro-batch-into-Y/M/D shape.
    new GraftLakeStreamingWrite(lakeDir, info.schema(),
      info.queryId(), mode,
      info.options().asCaseSensitiveMap().asScala.toMap,
      partCols, Some(tableSchema))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val innerBatch = inner.toBatch
    override def createBatchWriterFactory(p: PhysicalWriteInfo)
        : DataWriterFactory = innerBatch.createBatchWriterFactory(p)
    override def useCommitCoordinator: Boolean =
      innerBatch.useCommitCoordinator
    override def onDataWriterCommit(m: WriterCommitMessage): Unit =
      innerBatch.onDataWriterCommit(m)
    override def commit(msgs: Array[WriterCommitMessage]): Unit = {
      innerBatch.commit(msgs) // file committer: task temps -> staging dir
      val spark = SparkSession.active
      if (partCols.nonEmpty) { commitPartitioned(spark); return }
      if (mode == "replace") { commitReplace(spark); return }
      // every DML commit is auto-indexed (numeric range stats + the
      // lake's declared bloom column, VersionedLake.indexStagedDir) —
      // INSERT'd data is immediately skippable through the same
      // sidecar paths as library-indexed commits
      VersionedLake.indexStagedDir(spark, lakeDir, dataDir,
        info.schema())
      VersionedLake.publishAll(spark, lakeDir, Seq(dataDir), mode,
        schemaDdl = Some(tableSchema.json))
    }

    /** Partitioned commit: the dynamic-partition writer laid the staged
      * rows out as `c=v` leaf dirs; publish one manifest entry per
      * leaf, each with its own stats/bloom sidecars.
      *
      * A `replace` with a PARTITION-DECIDABLE condition swaps the
      * matching partition entries by manifest reference with ZERO
      * survivor IO (rows of an entry share its partition values, so
      * the condition drops entries whole — INSERT OVERWRITE ...
      * PARTITION, the Y/M/D backfill shape). A DATA-COLUMN condition
      * takes the partitioned COW path: the rewrite set is bounded
      * first by the condition's partition-decidable conjuncts (a
      * partition they falsify cannot hold a matching row — dropped at
      * metadata cost), then by the stats sidecars when the condition
      * is one numeric interval; the surviving rows of the touched
      * partitions rewrite INTO THE SAME partition leaves of the staged
      * dir (partition boundaries never crossed — the entries-are-
      * partition-leaves invariant holds by construction), every other
      * partition carries by manifest reference. Both shapes enforce
      * Delta's replaceWhere constraint: data written OUTSIDE the
      * condition would silently duplicate rows beside the surviving
      * partitions, so it is refused loudly — entry-level (free) when
      * partition-decidable, one O(new data) scan otherwise. */
    private def commitPartitioned(spark: SparkSession): Unit = {
      import org.apache.spark.sql.functions.{lit, not}
      var entries = GraftLakePartitions.stagedEntries(spark, lakeDir,
        dataDir, partCols.length)
      val seeded = entries.isEmpty
      val dataOnly = StructType(info.schema().filterNot(f =>
        partCols.exists(_.name.equalsIgnoreCase(f.name))))
      if (seeded) {
        if (mode == "append") return // zero-row INSERT: publish nothing
        entries = Seq(GraftLakePartitions.seedEmpty(spark, lakeDir,
          dataDir, info.schema(), partCols))
      }
      def indexAll(es: Seq[String]): Unit =
        VersionedLake.indexStagedEntries(spark, lakeDir, es, dataOnly)
      mode match {
        case "append" | "overwrite" =>
          indexAll(entries)
          VersionedLake.publishAll(spark, lakeDir, entries, mode,
            schemaDdl = Some(tableSchema.json))
          ()
        case "replace" =>
          val pred = replaceCond.toSeq
            .map(f => GraftLakeDelete.toColumn(tableSchema, f).getOrElse(
              throw new IllegalStateException(
                s"untranslatable overwrite filter $f")))
            .reduceOption(_ && _).getOrElse(lit(true))
          val tipV = VersionedLake.tip(spark, lakeDir)
          val snapshot = tipV
            .map(v => VersionedLake.manifestEntries(spark, lakeDir, v))
            .getOrElse(Seq.empty)
          if (GraftLakePartitions.partitionDecidable(replaceCond,
              partCols)) {
            // whole-partition swap. Constraint check is entry-level:
            // every staged entry's partition values must satisfy the
            // condition (the seeded zero-row carrier is exempt — it
            // holds no rows to mis-place)
            if (!seeded) {
              val (_, outside) = GraftLakePartitions.entriesWhere(spark,
                entries, partCols, pred)
              require(outside.isEmpty,
                "replaceWhere would write rows OUTSIDE the overwrite " +
                  s"condition (partitions ${outside.map(
                    _.dropWhile(_ != '/')).mkString(", ")}) — they " +
                  "would duplicate beside the surviving partitions; " +
                  "widen the condition or fix the written frame")
            }
            indexAll(entries)
            val (touched, _) = GraftLakePartitions.entriesWhere(spark,
              snapshot, partCols, pred)
            VersionedLake.publishReplacingCheckedAll(spark, lakeDir,
              touched.toSet, entries, snapshot.toSet,
              Some(tableSchema.json), noDvSince = tipV)
            ()
          } else {
            // partitioned COW: Delta's arbitrary replaceWhere. On a
            // COLUMN-MAPPING lake the survivor read id-matches through
            // a derived session with the DECLARED schema (partition
            // values still parse from the dir names via basePath) and
            // the rewrite re-stamps the ids — a name-matched read
            // would null renamed columns out of pre-rename files.
            val mapped = GraftLakeMapping.enabled(spark, lakeDir)
            val readTouched: Seq[String] => org.apache.spark.sql.DataFrame =
              if (!mapped)
                es => GraftLakePartitions.readEntries(spark, lakeDir,
                  es, partCols, dropDvAt = tipV)
              else {
                val s2 = spark.newSession()
                s2.conf.set("spark.sql.parquet.fieldId.read.enabled",
                  "true")
                es => es.groupBy(_.takeWhile(_ != '/')).toSeq
                  .sortBy(_._1).map { case (dd, g) =>
                    // declared schema carries the field ids; its
                    // partition columns fill from the `c=v` dir names.
                    // Rows earlier deletion vectors deleted are NOT
                    // survivors here either — the id-matched branch
                    // must apply them like the unmapped one, or the
                    // triple composition would resurrect deletes
                    VersionedLake.dropDvRows(s2, lakeDir,
                      s2.read.schema(tableSchema)
                        .option("basePath", s"$lakeDir/$dd")
                        .parquet(g.map(e => s"$lakeDir/$e"): _*),
                      tipV.getOrElse(0))
                  }.reduce(_.unionByName(_))
              }
            if (!seeded) {
              val bad = GraftLakePartitions.readEntries(spark, lakeDir,
                entries, partCols).filter(not(pred <=> lit(true))).count()
              require(bad == 0L,
                s"replaceWhere would write $bad rows that do NOT " +
                  "satisfy the overwrite condition — they would " +
                  "duplicate beside the surviving rows; widen the " +
                  "condition or fix the written frame")
            }
            val partBound = replaceCond.filter(f =>
              GraftLakePartitions.partitionDecidable(Array(f), partCols))
            val byPartition =
              if (partBound.isEmpty) snapshot
              else GraftLakePartitions.entriesWhere(spark, snapshot,
                partCols,
                partBound.map(f => GraftLakeDelete.toColumn(tableSchema,
                  f).get).reduce(_ && _))._1
            val touched =
              GraftLakeDelete.translate(tableSchema, replaceCond) match {
                case Some(GraftLakeDelete.Range(c, lo, hi)) =>
                  if (lo <= hi) VersionedLake.dirsIntersecting(spark,
                    lakeDir, byPartition, c, lo, hi)
                  else Seq.empty // provably-empty interval: pure append
                case _ => byPartition
              }
            if (touched.nonEmpty) {
              // survivors rewrite into the staged dir's own partition
              // leaves (three-valued logic: a NULL-condition row is
              // not matched and must survive). On a DV lake, rows
              // earlier vectors deleted are NOT survivors — carrying
              // them would resurrect deletes (the rewrite
              // MATERIALIZES the touched entries' vectors away)
              readTouched(touched)
                .filter(not(pred <=> lit(true)))
                .write.partitionBy(partCols.map(_.name): _*)
                .mode("append").parquet(s"$lakeDir/$dataDir")
            }
            // sidecars AFTER the survivor append so they cover every
            // file of every published leaf
            val finalEntries = {
              val es = GraftLakePartitions.stagedEntries(spark, lakeDir,
                dataDir, partCols.length)
              if (es.nonEmpty) es else entries // zero-survivor seeded
            }
            indexAll(finalEntries)
            if (touched.isEmpty) {
              VersionedLake.publishAll(spark, lakeDir, finalEntries,
                "append", schemaDdl = Some(tableSchema.json))
              ()
            } else {
              val v = VersionedLake.publishReplacingCheckedAll(spark,
                lakeDir, touched.toSet, finalEntries, snapshot.toSet,
                Some(tableSchema.json), noDvSince = tipV)
              if (VersionedLake.cdfEnabled(spark, lakeDir))
                VersionedLake.writeChangeSidecar(spark, lakeDir, v,
                  VersionedLake.cowChangeRows(spark, lakeDir, touched,
                    finalEntries, "REPLACE"))
            }
          }
      }
      ()
    }

    /** replaceWhere commit: the staged dir already holds the new data
      * (file committer landed above); rewrite the SURVIVORS of the
      * condition-intersecting dirs into the same staged dir, then swap
      * `tip \ touched + staged` in one manifest CAS. Pruning is
      * metadata-only (stats sidecars) and conservative; dirs the
      * sidecars cannot clear rewrite through the exact row filter.
      * Publishes SERIALIZABLE ([[VersionedLake.publishReplacingChecked]])
      * — a concurrent rewrite of a touched dir, or an append landing
      * after the survivor scan (it may hold rows matching the
      * condition), is refused loudly for the caller to retry, the same
      * call Delta/Iceberg's COW validation makes. */
    private def commitReplace(spark: SparkSession): Unit = {
      import org.apache.spark.sql.functions.{lit, not}
      val pred = replaceCond
        .map(f => GraftLakeDelete.toColumn(tableSchema, f).getOrElse(
          throw new IllegalStateException( // canOverwrite gated this
            s"untranslatable overwrite filter $f")))
        .reduceOption(_ && _).getOrElse(lit(true))
      val tipV = VersionedLake.tip(spark, lakeDir)
      val snapshot = tipV
        .map(v => VersionedLake.manifestEntries(spark, lakeDir, v))
        .getOrElse(Seq.empty)
      val touched = GraftLakeDelete.translate(tableSchema, replaceCond) match {
        case Some(GraftLakeDelete.Range(c, lo, hi)) =>
          if (lo <= hi)
            VersionedLake.dirsIntersecting(spark, lakeDir, snapshot, c, lo, hi)
          else Seq.empty // provably-empty interval: pure append
        case _ => snapshot // no interval shape: every live dir rewrites
      }
      if (touched.nonEmpty) {
        // COLUMN-MAPPING lakes: survivors must read BY FIELD ID (a
        // name-matched read would null a renamed column out of
        // pre-rename files) and the rewrite must stamp the ids —
        // reading with the table schema (ids in its metadata) on a
        // fieldId-scoped derived session gives both, the compactSmall
        // pattern (per-read options are clobbered by the V1 path)
        val reader =
          if (!GraftLakeMapping.enabled(spark, lakeDir))
            spark.read.option("mergeSchema", "true")
          else {
            val s2 = spark.newSession()
            s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
            s2.read.schema(tableSchema)
          }
        // three-valued logic: a row where the condition is NULL is NOT
        // matched — it must survive, so keep NOT(pred IS TRUE). On a
        // DV lake, rows earlier vectors deleted are NOT survivors —
        // carrying them would resurrect deletes (the rewrite
        // MATERIALIZES the touched dirs' vectors away)
        VersionedLake.dropDvRows(spark, lakeDir,
            reader.parquet(touched.map(d => s"$lakeDir/$d"): _*),
            tipV.getOrElse(0))
          .filter(not(pred <=> lit(true)))
          .write.mode("append").parquet(s"$lakeDir/$dataDir")
      }
      // sidecars AFTER the survivor append so they cover every file in
      // the published dir (new data and survivors alike)
      VersionedLake.indexStagedDir(spark, lakeDir, dataDir, tableSchema)
      if (touched.isEmpty) {
        VersionedLake.publishAll(spark, lakeDir, Seq(dataDir), "append",
          schemaDdl = Some(tableSchema.json))
        ()
      } else {
        val v = VersionedLake.publishReplacingChecked(spark, lakeDir,
          touched.toSet, dataDir, snapshot.toSet,
          Some(tableSchema.json), noDvSince = tipV)
        if (VersionedLake.cdfEnabled(spark, lakeDir))
          VersionedLake.writeChangeSidecar(spark, lakeDir, v,
            VersionedLake.cowChangeRows(spark, lakeDir, touched,
              Seq(dataDir), "REPLACE"))
      }
      ()
    }
    override def abort(msgs: Array[WriterCommitMessage]): Unit = {
      innerBatch.abort(msgs)
      val p = new Path(s"$lakeDir/$dataDir")
      p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
  }
}

/** ParquetScanBuilder that builds a [[GraftLakeParquetScan]] — same
  * pushdown surface (columns, catalyst filters, aggregates), the built
  * scan merely knows how to serve micro-batches too. */
final class GraftLakeScanBuilder(spark: SparkSession,
    fileIndex: PartitioningAwareFileIndex, schema: StructType,
    dataSchema: StructType, options: CaseInsensitiveStringMap,
    lakeDir: String, cdf: Boolean = false,
    dvRefs: Map[String, GraftLakeDvRef] = Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet
    .ParquetScanBuilder(spark, fileIndex, schema, dataSchema, options) {

  /** Aggregate pushdown answers from parquet FOOTER stats — which
    * still count DV-deleted rows. With any vector live, the aggregate
    * must run over the DV-filtered scan instead — and never under a
    * requested row-address column (positions are per row; that case
    * cannot arise today because V2ScanRelationPushDown pushes
    * aggregates BEFORE pruneColumns populates metaCols, so build()
    * enforces the invariant where both facts are finally known). */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    if (dvRefs.nonEmpty || metaCols.nonEmpty) false
    else {
      val pushed = super.pushAggregation(aggregation)
      aggPushed ||= pushed
      pushed
    }

  @volatile private var aggPushed = false

  /** Row-address metadata columns (`__graft_file`/`__graft_pos`,
    * advertised on DV lakes via [[GraftLakeTable.metadataColumns]])
    * requested by THIS query. They are synthesized, not stored: strip
    * them out of what reaches the parquet reader and route build() to
    * the delta scan — an ordinary scan would read all-NULLs for
    * columns declared non-nullable (silently wrong results). */
  @volatile private var metaCols: Seq[String] = Seq.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val (meta, data) = requiredSchema.fields.partition(f =>
      GraftLakeDeltaOp.isMetaCol(f.name))
    metaCols = meta.map(_.name).toSeq
    super.pruneColumns(StructType(data))
  }

  override def build()
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan = {
    if (metaCols.nonEmpty) {
      // a footer-stat aggregate under a synthesized row-address
      // column would answer per-FILE where the query asks per-ROW —
      // fail loudly if Spark's pushdown ordering ever lets both in
      require(!aggPushed, "aggregate pushdown cannot combine with " +
        "row-address metadata columns (footer stats are per file, " +
        "addresses are per row)")
      // row-address projection: single-file partitions + synthesized
      // address columns + DV application — the SAME wrapper the
      // row-level operations scan through. Batch-only by construction
      // (the streaming source replays versions, where a row's address
      // is not a stable identity; GraftLakeDeltaScan implements no
      // toMicroBatchStream, so a readStream projecting __graft_* fails
      // loudly instead of mis-addressing).
      require(!cdf, "row-address columns are a snapshot-read surface; " +
        "the change feed delivers _change_type events instead")
      return new GraftLakeDeltaScan(dvRefs, super.build(), lakeDir,
        metaCols)
    }
    def intOpt(k: String): Option[Int] =
      Option(options.get(k)).map(_.trim.toInt)
    Seq(GraftLakeDataSource.MaxVersionsPerTrigger,
        GraftLakeDataSource.MaxFilesPerTrigger).foreach(k =>
      intOpt(k).foreach(n => require(n > 0, s"$k must be positive, got $n")))
    val fromTs = Option(
      options.get(GraftLakeDataSource.StartingTimestamp)).map { raw =>
      require(intOpt(GraftLakeDataSource.StartingVersion).isEmpty,
        "startingVersion and startingTimestamp are mutually exclusive")
      val tsMillis = GraftLakeDataSource.parseTsOption(raw,
        GraftLakeDataSource.StartingTimestamp)
      // first version published AT/AFTER the instant: one past the
      // newest version published BEFORE it (none before → from v1;
      // instant past the tip → tip+1, only future commits deliver)
      VersionedLake.versionAt(spark, lakeDir, tsMillis - 1)
        .map(_ + 1).getOrElse(1)
    }
    val skip = Option(options.get(GraftLakeDataSource.SkipChangeCommits))
      .exists(_.trim.equalsIgnoreCase("true"))
    require(!(cdf && skip),
      s"${GraftLakeDataSource.ReadChangeFeed} delivers change commits " +
        s"as tagged events; ${GraftLakeDataSource.SkipChangeCommits} " +
        "drops them — pick one")
    val failOnLoss = Option(
      options.get(GraftLakeDataSource.FailOnDataLoss))
      .forall(!_.trim.equalsIgnoreCase("false"))
    new GraftLakeParquetScan(super.build(), lakeDir,
      fromTs.orElse(intOpt(GraftLakeDataSource.StartingVersion))
        .getOrElse(1),
      intOpt(GraftLakeDataSource.MaxVersionsPerTrigger),
      intOpt(GraftLakeDataSource.MaxFilesPerTrigger),
      skip, cdf, failOnLoss, dvRefs)
  }
}

/** ParquetScan + `toMicroBatchStream`: batch execution is byte-for-byte
  * the parent's (same reader factory, same partitions); only the
  * streaming entry point is added. */
final class GraftLakeParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    lakeDir: String, startingVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    skipChangeCommits: Boolean = false,
    cdf: Boolean = false,
    failOnDataLoss: Boolean = true,
    dvRefs: Map[String, GraftLakeDvRef] = Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions)
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftLakeMicroBatchStream(this, lakeDir, startingVersion,
      maxVersionsPerTrigger, maxFilesPerTrigger, skipChangeCommits, cdf,
      failOnDataLoss)

  /** CDF is a STREAMING shape (versions as offsets, per-commit
    * partitions); a batch `_change_type` read would silently be all
    * null — refuse with the right tool's name instead. */
  override def toBatch: org.apache.spark.sql.connector.read.Batch = {
    require(!cdf,
      s"${GraftLakeDataSource.ReadChangeFeed} is a readStream option; " +
        "batch change feeds are VersionedLake.changes(fromV, toV)")
    super.toBatch
  }

  /** Runtime (join-driven) file pruning — dynamic partition pruning's
    * V2 hook, answered from the SAME sidecars as static pushdown: when
    * this scan joins a filtered dimension on a declared attribute,
    * Spark re-plans the scan at execution with `IN (build-side keys)`,
    * and files whose stats range excludes every key (or whose bloom
    * rejects every key) are dropped WITHOUT reading them. This is the
    * 100 TB shape for "fact lake ⋈ filtered dim": static pushdown
    * cannot see the dim's keys at plan time, so without it the lake
    * pays a full scan no matter how selective the dim filter is. */
  @volatile private var runtimeAdmit: Option[Path => Boolean] = None

  /** All atomic top-level read columns — DATA columns (a sidecar may
    * exist for any) plus PARTITION columns (pruned from the manifest
    * entry values, the dynamic-partition-pruning shape). A declared-
    * but-unindexed column degrades to no pruning (every file admitted)
    * — conservative, never wrong. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    import org.apache.spark.sql.types._
    (readDataSchema.fields ++ readPartitionSchema.fields).collect {
      case f if (f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType => true
        case _ => false
      }) => org.apache.spark.sql.connector.expressions.Expressions
        .column(f.name)
    }
  }

  override def filter(predicates
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val ins = GraftLakeDataSource.parseInPredicates(predicates, 10000)
    if (ins.nonEmpty) fileIndex match {
      case g: GraftLakeFileIndex =>
        runtimeAdmit = Some(p => ins.forall { case (c, vs) =>
          g.admitAnyOf(p, c, vs) })
      case _ => ()
    }
  }

  override def partitions
      : Seq[org.apache.spark.sql.execution.datasources.FilePartition] = {
    val ps = super.partitions
    val admitted = runtimeAdmit match {
      case None => ps
      case Some(adm) =>
        // REINDEX the survivors: an RDD partition's `index` must equal
        // its position in the array — filtering with original indices
        // kept would leave gaps and break that contract downstream
        ps.flatMap { fp =>
          val kept = fp.files.filter(pf => adm(pf.toPath))
          if (kept.isEmpty) None else Some(kept)
        }.zipWithIndex.map { case (files, i) =>
          org.apache.spark.sql.execution.datasources.FilePartition(i, files)
        }
    }
    // DV-carrying files read alone (per-file positions — see
    // GraftLakeDvScan); clean files keep their grouping
    GraftLakeDvScan.isolate(admitted, dvRefs)
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    if (dvRefs.isEmpty) super.createReaderFactory()
    else GraftLakeDvScan.readerFactory(this)

  /** The un-vectored factory — the STREAMING replay's reader: a
    * version's events replay as committed (the DV delete is its own
    * change event; applying the vector to an earlier version's insert
    * replay would under-deliver it AND double-count the delete). */
  private[engine] def plainReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    super.createReaderFactory()

  /** DV-NET statistics: the inherited file-size estimate counts bytes
    * of rows pending vectors have already deleted, so join planning on
    * a heavily-vectored lake over-estimates the build side and a
    * broadcast-able table shuffles. Subtract each vectored file's
    * deleted fraction (sidecar position count over footer row count —
    * both O(DV files), memoized metadata) from the size estimate.
    * Conservative on any unknown: a failed footer read leaves that
    * file unadjusted. The default pending bound caps how wrong the
    * unadjusted estimate could ever get; this makes it right. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    GraftLakeDvScan.netStatistics(super.estimateStatistics(), dvRefs,
      fileIndex, sparkSession.sessionState.newHadoopConf())
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
  *    retention error rather than silently skipping data;
  *  - `maxVersionsPerTrigger` / `maxFilesPerTrigger` admission control
  *    ([[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]])
  *    drains a backlog as BOUNDED micro-batches instead of one giant
  *    catch-up batch — each batch a durable checkpoint, peak state
  *    bounded by the cap, a retry repeating only its own batch. The
  *    decision is metadata-only (manifest diff + memoized dir list);
  *    AvailableNow captures the tip at start and drains rate-limited
  *    batches up to exactly there.
  *
  * Reader machinery is the wrapped ParquetScan's own factory over a
  * per-batch file index of the added dirs — the streaming path reuses
  * the native vectorized reader like everything else here. */
final class GraftLakeMicroBatchStream(scan: GraftLakeParquetScan,
    lakeDir: String, startingVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    skipChangeCommits: Boolean = false,
    cdf: Boolean = false,
    failOnDataLoss: Boolean = true)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
    Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles}
  import org.apache.spark.sql.connector.read.InputPartition

  private def spark = scan.sparkSession

  override def initialOffset(): Offset = GraftLakeOffset(startingVersion - 1)

  /** Published tip, floored at initialOffset: with startingVersion
    * ahead of the published tip, reporting the (smaller) tip would
    * checkpoint a REGRESSED offset, and versions published later would
    * be delivered from the regressed point — including the ones
    * startingVersion asked to skip. */
  private def publishedTip: Int = {
    val t = VersionedLake.tip(spark, lakeDir)
    math.max(startingVersion - 1, t.getOrElse(startingVersion - 1))
  }

  override def latestOffset(): Offset = GraftLakeOffset(publishedTip)

  /** Offset-planning retention check: a lagging consumer whose next
    * batch needs a vacuum-expired version fails HERE with the
    * retention-contract error — never a raw missing-path error from
    * deep inside a scan — and `failOnDataLoss=false` opts into
    * resuming from the oldest readable version (commits expired in
    * between are LOST to this consumer, logged). Returns the effective
    * start offset the walk proceeds from. One existence probe on the
    * happy path. */
  private def retentionCheckedStart(from: Int): Int = {
    val probe = math.max(from, 1)
    if (probe > publishedTip ||
        VersionedLake.versionExists(spark, lakeDir, probe)) from
    else {
      val lo = VersionedLake.versionRange(spark, lakeDir)
        .fold(publishedTip)(_._1)
      if (failOnDataLoss)
        throw new IllegalStateException(
          s"stream over $lakeDir needs version $probe but retention " +
            s"(vacuum) expired it — the oldest readable version is " +
            s"$lo. Restart from a fresh checkpoint (optionally with " +
            s"${GraftLakeDataSource.StartingVersion} >= $lo) to " +
            s"reprocess, or set ${GraftLakeDataSource.FailOnDataLoss}" +
            "=false to skip the expired commits (their rows are lost " +
            "to this consumer)")
      System.err.println(
        s"[graftlake] WARN stream over $lakeDir skipping expired " +
          s"versions $probe..$lo (failOnDataLoss=false): their rows " +
          "are lost to this consumer")
      lo
    }
  }

  // ---- admission control (rate limiting) ------------------------------
  //
  // Without it, a fresh checkpoint against a deep lake admits the ENTIRE
  // backlog as one micro-batch — at 100 TB that is one giant batch that
  // must succeed whole (no incremental checkpoint progress, peak shuffle
  // state proportional to the backlog, a retry repeats everything).
  // With a cap, the backlog drains as bounded batches, each a durable
  // checkpoint — the same reason Delta ships maxFilesPerTrigger.

  /** Versions the lake had when an AvailableNow run started: the run
    * drains rate-limited batches UP TO this tip, then stops — versions
    * published mid-run wait for the next run (the AvailableNow
    * contract). */
  @volatile private var availableNowTip: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTip = Some(publishedTip)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  /** True published tip regardless of rate limit — the lag the progress
    * metrics report. */
  override def reportLatestOffset(): Offset = GraftLakeOffset(publishedTip)

  /** Parquet files a version ADDED over its predecessor — metadata only
    * (one manifest diff + one dir list), memoized for the stream's
    * lifetime: data dirs are immutable once published, so a count never
    * changes. */
  private val addedFilesMemo =
    scala.collection.mutable.HashMap.empty[Int, Int]

  /** Fill the memo for `(from, end]` in ONE incremental manifest walk
    * (resolve `from` once, then one small read per version) — the
    * per-trigger admission cost; per-version random-access resolution
    * would pay the delta-replay walk for EVERY candidate version. */
  private def ensureAddedFileCounts(from: Int, end: Int): Unit =
    synchronized {
      if ((from + 1 to end).forall(addedFilesMemo.contains)) return
      val f = new Path(lakeDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def files(dirs: Iterable[String]): Int =
        dirs.map(d => f.listStatus(new Path(s"$lakeDir/$d"))
          .count(_.getPath.getName.endsWith(".parquet"))).sum
      var prev: Seq[String] =
        if (from <= 0) Seq.empty
        else VersionedLake.manifestInfo(spark, lakeDir, from)._1
      var v = from + 1
      while (v <= end) {
        val (cur, layoutOnly, isDv) =
          VersionedLake.manifestStep(spark, lakeDir, prev, v)
        if (!addedFilesMemo.contains(v)) {
          // layout-only commits deliver nothing (planInputPartitions
          // skips them), so they weigh nothing against the admission
          // cap; under skipChangeCommits the same holds for
          // data-changing rewrites and deletion-vector commits
          val prevSet = prev.toSet
          val removed = prevSet.diff(cur.toSet)
          val skipped =
            layoutOnly ||
              (skipChangeCommits && (removed.nonEmpty || isDv))
          val c =
            if (skipped) 0
            // a change feed also DELIVERS the rewrite's pre-image
            // dirs, so they weigh against the cap like the added ones;
            // a DV commit delivers its (small) change sidecar
            else if (isDv) 1
            else files(cur.filterNot(prevSet)) +
              (if (cdf) files(removed) else 0)
          addedFilesMemo.put(v, c)
          ()
        }
        prev = cur
        v += 1
      }
    }

  private def addedFileCount(v: Int): Int =
    synchronized(addedFilesMemo(v))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = retentionCheckedStart(start.asInstanceOf[GraftLakeOffset].v)
    // an AvailableNow run never passes its captured tip (min: a vacuum
    // cannot shrink the published tip, but defensive beats regressed)
    val tip = availableNowTip.fold(publishedTip)(math.min(_, publishedTip))
    if (tip <= from) return GraftLakeOffset(from)
    var end = tip
    maxVersionsPerTrigger.foreach(n => end = math.min(end, from + n))
    def fileCapOf(l: ReadLimit): Option[Int] = l match {
      case m: ReadMaxFiles => Some(m.maxFiles())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(fileCapOf).reduceOption(math.min)
      case _: ReadAllAvailable => None
      case _ => None // minRows etc.: nothing to admit-limit on versions
    }
    fileCapOf(limit).foreach { cap =>
      ensureAddedFileCounts(from, end)
      var admitted = from
      var files = 0
      var v = from + 1
      while (v <= end &&
          // first pending version always admitted whole: progress even
          // when one commit alone exceeds the cap (Delta's contract)
          (admitted == from || files + addedFileCount(v) <= cap)) {
        files += addedFileCount(v); admitted = v; v += 1
      }
      end = admitted
    }
    GraftLakeOffset(end)
  }

  override def deserializeOffset(json: String): Offset =
    GraftLakeOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = retentionCheckedStart(start.asInstanceOf[GraftLakeOffset].v)
    val to = end.asInstanceOf[GraftLakeOffset].v
    if (to <= from) return Array.empty
    // Version-by-version walk over (from, to] (version 0 is "before
    // the first commit"; a vacuumed-away manifest in the range fails
    // with the retention error rather than silently re-delivering).
    // Each version contributes its ADDED dirs — except LAYOUT-ONLY
    // commits (compaction/Z-order, `dataChange=false`), which preserve
    // every row and contribute NOTHING: their rewritten output mixes
    // already-delivered rows with pending ones, so the batch keeps
    // reading the pending ORIGINAL dirs (immutable, still on disk
    // until vacuum — the same retention-vs-lag contract as the
    // manifests themselves). Only a DATA-changing rewrite (overwrite,
    // COW DML, replaceWhere) still refuses: re-reading rewritten rows
    // would double-deliver, and skipping them would lose data —
    // Delta's ignoreChanges refusal, scoped now to genuine changes.
    // incremental walk: resolve the START version once, then advance
    // with one manifest read per version (manifestStep) — never a
    // delta-chain re-resolution per version
    var prevSeq: Seq[String] =
      if (from <= 0) Seq.empty[String]
      else VersionedLake.manifestInfo(spark, lakeDir, from)._1
    var prev: Set[String] = prevSeq.toSet
    // sidecar-aware per-batch index + the scan's own pushed data
    // filters: a filtered stream prunes each batch's files through the
    // same stats/bloom path as a batch read (metadata-only decision;
    // files without sidecars are conservatively read)
    def planDirs(paths: Seq[Path]): Seq[
        org.apache.spark.sql.execution.datasources.FilePartition] =
      if (paths.isEmpty) Seq.empty
      else scan.copy(
        fileIndex = new GraftLakeFileIndex(spark, lakeDir, paths),
        partitionFilters = Nil, dataFilters = scan.dataFilters)
        .planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
            .FilePartition => fp
        }
    def entryPaths(dirs: Seq[String]): Seq[Path] =
      dirs.map(d => new Path(s"$lakeDir/$d"))
    // row-level sidecar dirs on a PARTITIONED lake: plain listing (no
    // partition spec — the sidecar dir has no `c=v` layout) and the
    // partition columns read from the FILE BYTES via the widened data
    // schema; the emitted row layout (data..., cdf..., partition...)
    // is byte-identical to the normal scan's
    def planSidecar(p: Path): Seq[
        org.apache.spark.sql.execution.datasources.FilePartition] =
      scan.copy(
        fileIndex = new org.apache.spark.sql.execution.datasources
          .InMemoryFileIndex(spark, Seq(p), Map.empty, None),
        partitionFilters = Nil, dataFilters = Nil,
        readDataSchema = StructType(
          scan.readDataSchema.fields ++ scan.readPartitionSchema.fields),
        readPartitionSchema = new StructType())
        .planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
            .FilePartition => fp
        }
    val pending = scala.collection.mutable.LinkedHashSet.empty[String]
    // CDF groups in COMMIT ORDER: (partitions, op, version) — an
    // order-applying consumer must see each commit's deletes before
    // its inserts and commits in sequence, never all-deletes-then-
    // all-inserts across the whole batch
    val cdfGroups = scala.collection.mutable.ArrayBuffer.empty[
      (Seq[org.apache.spark.sql.execution.datasources.FilePartition],
        String, Int)]
    val partitionedLake = GraftLakePartitions.of(spark, lakeDir).nonEmpty
    var v = from + 1
    while (v <= to) {
      val (cur, layoutOnly, isDv) =
        VersionedLake.manifestStep(spark, lakeDir, prevSeq, v)
      val removed = prev.diff(cur.toSet)
      val added = cur.filterNot(prev)
      if (layoutOnly) {
        // row-preserving: nothing to deliver; pending dirs the rewrite
        // replaced keep being read from their original files
      } else if ((removed.nonEmpty || isDv) && skipChangeCommits) {
        // Delta's skipChangeCommits: the data-changing rewrite commit
        // is dropped WHOLE — neither its replacement dirs (they mix
        // rewritten old rows with DML-inserted ones) nor any
        // retraction delivers. PENDING appends it rewrote still
        // deliver from their ORIGINAL immutable dirs (Delta likewise
        // delivers the append commit's own files): the consumer opted
        // into missing the updates/deletes, not into losing the
        // append — same retention-vs-lag contract as the layout skip.
      } else if ((removed.nonEmpty || isDv) && cdf) {
        // change feed across a rewrite: with a ROW-LEVEL sidecar
        // (opt-in cdf policy), deliver the commit's EXACT changes —
        // `_change_type` comes from the sidecar files themselves,
        // O(changed rows), zero survivor noise. Without one, the
        // rewrite's pre-image dirs deliver as `delete` and its
        // replacements as `insert` — survivor rows carry as a
        // delete+insert pair that cancels under signed aggregation
        // (group-level CDF; see ReadChangeFeed's doc). Sidecar files
        // hold partition columns as DATA columns, so on a partitioned
        // lake the dir-granular path keeps serving (its scan expects
        // partition values from the index).
        VersionedLake.changeSidecarPath(spark, lakeDir, v) match {
          case Some(p) if !partitionedLake =>
            cdfGroups += ((planDirs(Seq(p)), "file", v))
          case Some(p) =>
            // PARTITIONED lake: sidecar files carry the partition
            // columns as DATA columns (no hive layout), so they read
            // through a scan copy whose data schema absorbs the
            // partition fields — falling through to the dir-granular
            // path here would deliver NOTHING for a DV commit (no
            // dirs changed: the delete events would be silently lost)
            cdfGroups += ((planSidecar(p), "sidecar", v))
          case None if isDv =>
            // a DV commit's sidecar is staged BEFORE its publish; the
            // dir-granular fallback would be silently EMPTY here (no
            // dirs changed) — losing the delete events
            throw new IllegalStateException(
              s"deletion-vector commit v$v of $lakeDir lacks its " +
                "change sidecar (_changes/dv-*) — it was removed " +
                "outside the vacuum protocol; the delete events " +
                "cannot be replayed")
          case _ =>
            cdfGroups += ((planDirs(entryPaths(removed.toSeq)),
              "delete", v))
            cdfGroups += ((planDirs(entryPaths(added)), "insert", v))
        }
      } else {
        require(removed.isEmpty && !isDv,
          s"streaming read of $lakeDir requires append-only history " +
            s"(layout-only compaction commits are skipped), but " +
            s"version $v ${if (isDv) "deleted rows by deletion vector"
            else "dropped data dirs with data change " +
              "(overwrite/DML/delete/restore)"} — restart from a fresh checkpoint " +
            s"to reprocess the rewritten snapshot, set " +
            s"${GraftLakeDataSource.SkipChangeCommits}=true to skip " +
            s"data-changing rewrite commits, or consume with " +
            s"${GraftLakeDataSource.ReadChangeFeed}=true for tagged " +
            "change events")
        if (cdf) cdfGroups += ((planDirs(entryPaths(added)), "insert", v))
        else added.foreach(pending += _)
      }
      prevSeq = cur
      prev = cur.toSet
      v += 1
    }
    if (!cdf) {
      if (pending.isEmpty) Array.empty
      else planDirs(entryPaths(pending.toSeq)).toArray
    } else {
      // commit-ordered groups, partitions REINDEXED so the RDD
      // contract (index == array position) holds across the groups
      cdfGroups.toSeq.flatMap { case (fps, op, ver) =>
        fps.map(fp => (fp, op, ver))
      }.zipWithIndex.map { case ((fp, op, ver), i) =>
        GraftLakeCdfPartition(
          org.apache.spark.sql.execution.datasources.FilePartition(
            i, fp.files), op, ver): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    // plainReaderFactory: per-commit replay semantics — deletion
    // vectors arrive as their OWN change events, never retroactively
    if (cdf) {
      // partitioned lakes additionally need the SIDECAR factory: same
      // row layout, partition columns sourced from file bytes (own
      // hadoop conf copy — factory creation writes its schema there)
      val sidecarInner =
        if (GraftLakePartitions.of(spark, lakeDir).isEmpty) None
        else Some(scan.copy(
          hadoopConf = new org.apache.hadoop.conf.Configuration(
            scan.hadoopConf),
          readDataSchema = StructType(scan.readDataSchema.fields ++
            scan.readPartitionSchema.fields),
          readPartitionSchema = new StructType(),
          pushedAggregate = None).createReaderFactory())
      new GraftLakeCdfReaderFactory(scan.plainReaderFactory(),
        scan.readSchema(), sidecarInner)
    } else scan.plainReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** A CDF micro-batch partition: the wrapped file partition plus the
  * change type its rows deliver as (`"file"` = the change type comes
  * from the sidecar files themselves) and the commit version. */
private[engine] final case class GraftLakeCdfPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    op: String, version: Int)
  extends org.apache.spark.sql.connector.read.InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Reader factory for the change feed: runs the wrapped parquet ROW
  * reader and overwrites the `_change_type` column (materialized as
  * null by the files-absent schema-evolution path) with the
  * partition's op constant — unless the partition reads a ROW-LEVEL
  * sidecar, whose files carry their own change types — and the
  * `_commit_version` column with the partition's version, via one
  * bound projection. Row-based by construction — a CDF batch is the
  * changed fraction, so the columnar path's throughput edge is not
  * worth per-column batch rewriting. A consumer that pruned both CDF
  * columns away gets the wrapped reader untouched. */
private[engine] final class GraftLakeCdfReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    readSchema: StructType,
    sidecarInner: Option[
      org.apache.spark.sql.connector.read.PartitionReaderFactory] = None)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{InputPartition,
    PartitionReader}

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[GraftLakeCdfPartition]
    val r =
      (if (cp.op == "sidecar") sidecarInner.getOrElse(inner) else inner)
        .createReader(cp.inner)
    val ctIdx = readSchema.fieldNames
      .indexOf(GraftLakeDataSource.ChangeTypeCol)
    val cvIdx = readSchema.fieldNames
      .indexOf(GraftLakeDataSource.CommitVersionCol)
    if (ctIdx < 0 && cvIdx < 0) r
    else {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference,
        Literal, UnsafeProjection}
      val proj = UnsafeProjection.create(
        readSchema.fields.zipWithIndex.map { case (f, i) =>
          if (i == ctIdx && cp.op != "file" && cp.op != "sidecar")
            Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString(cp.op), f.dataType)
          else if (i == cvIdx)
            Literal(cp.version.toLong, f.dataType)
          else BoundReference(i, f.dataType, f.nullable)
        }.toSeq)
      new PartitionReader[InternalRow] {
        override def next(): Boolean = r.next()
        override def get(): InternalRow = proj(r.get())
        override def close(): Unit = r.close()
      }
    }
  }
}

/** Manifest-resolved file index with sidecar skipping. Listing cost is
  * one manifest read + one list per live data dir (metadata-bounded);
  * the pruning decision per pushed filter is a sidecar read per
  * (data dir, column), memoized per listing. The dirs-explicit
  * constructor serves the STREAMING path: each micro-batch indexes
  * only its delta dirs, and the same sidecar pruning applies — a
  * filtered stream skips non-matching files per batch instead of
  * reading every delta file. */
final class GraftLakeFileIndex(spark: SparkSession, lakeDir: String,
    dataDirPaths: Seq[Path], sidecarPrune: Boolean = true)
  extends InMemoryFileIndex(spark, dataDirPaths, Map.empty, None,
    org.apache.spark.sql.execution.datasources.NoopCache,
    // partitioned lakes: partition values decided from MANIFEST entry
    // names (an explicit PartitionSpec), never inferred from listings —
    // planning-time partition pruning + DPP then drop whole entries
    GraftLakePartitions.specFor(spark, lakeDir, dataDirPaths), None) {

  def this(spark: SparkSession, lakeDir: String, version: Int) =
    this(spark, lakeDir,
      VersionedLake.liveDataDirs(spark, lakeDir, version).map(new Path(_)))

  // manifest entries are `d-x` or `d-x/c=v/...` — the sidecar key is
  // the ENTRY-relative path of a file's parent dir
  private val entryDepth =
    1 + GraftLakePartitions.of(spark, lakeDir).length

  // One probe per index: sidecar lookups memoized for the INDEX's
  // lifetime, not per listFiles call — a version's sidecars are
  // immutable (data dirs are never mutated after publish), and a
  // table may be planned many times; at 100k data dirs the difference
  // is one sidecar read per (dir, col) ever vs per query.
  private val probe = new SidecarProbe(spark, lakeDir)

  private[engine] def admitAnyOf(p: Path, c: String,
      values: Seq[Any]): Boolean = probe.admitAnyOf(p, c, values)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    // sidecarPrune=false is the COW-scan contract: a file pruned out
    // of a replace-semantics scan is a file NOT rewritten — with its
    // dir still replaced, its rows would be SILENTLY LOST. Partition
    // pruning (super's, above) stays: all rows of a pruned partition
    // provably fail the condition, so their dir is not replaced at all.
    if (!sidecarPrune) return base
    val ranges = GraftLakeFileIndex.rangePredicates(dataFilters)
    val points = GraftLakeFileIndex.pointPredicates(dataFilters)
    if (ranges.isEmpty && points.isEmpty) base
    else {
      def admit(p: Path): Boolean = {
        val d = GraftLakePartitions.entryOfDepth(p.getParent, entryDepth)
        val f = p.getName
        ranges.forall { case (c, lo, hi) =>
          probe.stats(d, c)
            .get(f) // no recorded range for this file → cannot skip
            .forall { case (mn, mx, _) => mx >= lo && mn <= hi }
        } && points.forall { case (c, want) =>
          probe.bloom(d, c)
            .get(f)
            .forall(bits => want.forall(bits.get))
        }
      }
      base.map(pd => pd.copy(files = pd.files.filter(fs => admit(fs.getPath))))
    }
  }
}

/** The per-file sidecar oracle shared by every pruning path (static
  * pushdown, join-driven runtime filtering, COW group filtering):
  * answers "might file `p` contain …?" from the stats + bloom
  * sidecars, memoized per (dir, col) for the probe's lifetime, and
  * conservative at every gap — no sidecar / no entry / unrenderable
  * value → admit. Values arrive as catalyst internals (boxed
  * numerics / UTF8String). */
private[engine] final class SidecarProbe(spark: SparkSession,
    lakeDir: String) {
  private val statsCache = collection.concurrent.TrieMap
    .empty[(String, String), Map[String, (Double, Double, Long)]]
  private val bloomCache = collection.concurrent.TrieMap
    .empty[(String, String), Map[String, java.util.BitSet]]

  private val partCols = GraftLakePartitions.of(spark, lakeDir)
  private val entryDepth = 1 + partCols.length

  // column-mapping renames: a column's sidecar lines are keyed by each
  // FILE's own era name, so a probe consults every name the field id
  // has ever had — a file appears under exactly one era name, the
  // merged map stays one-entry-per-file. Empty off mapped lakes.
  private lazy val aliasMap = GraftLakeMapping.aliases(spark, lakeDir)
  private def aliasesOf(c: String): Seq[String] =
    aliasMap.getOrElse(c, Seq(c))

  /** Runtime (join-driven) pruning on a PARTITION column — the V2
    * dynamic-partition-pruning shape: the build side's key set arrives
    * as an IN filter, and whole partition dirs drop by comparing the
    * MANIFEST entry's value segment, zero sidecar or file IO. Renders
    * both sides as strings (hive dir names are string renderings;
    * integral/string keys round-trip exactly); an unrenderable value
    * admits — conservative, never wrong. */
  private def partitionAdmit(parent: Path, c: String,
      rendered: Seq[String]): Option[Boolean] = {
    val i = partCols.indexWhere(_.name.equalsIgnoreCase(c))
    if (i < 0) None
    else {
      val segs = entryOf(parent).split('/').drop(1)
      if (i >= segs.length) Some(true)
      else {
        val raw = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(
            segs(i).substring(segs(i).indexOf('=') + 1))
        Some(rendered.contains(raw))
      }
    }
  }

  /** Manifest-entry key of a file's parent dir (`d-x` or
    * `d-x/c=v/...` on a partitioned lake) — what the sidecar files are
    * named by. */
  private[engine] def entryOf(parent: Path): String =
    GraftLakePartitions.entryOfDepth(parent, entryDepth)

  def stats(d: String, c: String): Map[String, (Double, Double, Long)] =
    statsCache.getOrElseUpdate((d, c),
      aliasesOf(c).map(n => VersionedLake.fileStats(spark, lakeDir, d, n))
        .reduce(_ ++ _))

  def bloom(d: String, c: String): Map[String, java.util.BitSet] =
    bloomCache.getOrElseUpdate((d, c),
      aliasesOf(c).map(n => VersionedLake.fileBloom(spark, lakeDir, d, n))
        .reduce(_ ++ _))

  /** Can file `p` contain ANY of `values` in column `c`? The runtime
    * pruning predicate — OR-of-points where the static path answers
    * single ranges/points. */
  def admitAnyOf(p: Path, c: String, values: Seq[Any]): Boolean = {
    val d = entryOf(p.getParent)
    val f = p.getName
    def render(v: Any): Option[String] = v match {
      case i: java.lang.Integer => Some(i.toString)
      case i: java.lang.Long => Some(i.toString)
      case i: java.lang.Short => Some(i.toString)
      case i: java.lang.Byte => Some(i.toString)
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case s: String => Some(s)
      case _ => None
    }
    val renders = values.flatMap(render(_))
    // a partition column decides from the MANIFEST ENTRY's value
    // segment alone (runtime/dynamic partition pruning, zero IO);
    // only fully-rendered value sets may prune
    if (renders.length == values.length)
      partitionAdmit(p.getParent, c, renders).foreach(a => return a)
    val nums = values.collect { case n: Number => n.doubleValue() }
    val statsOk = nums.length != values.length ||
      stats(d, c).get(f)
        .forall { case (mn, mx, _) => nums.exists(v => v >= mn && v <= mx) }
    val bloomOk = renders.length != values.length ||
      bloom(d, c).get(f)
        .forall(bits => renders.exists(r =>
          VersionedLake.bloomWantPositions(r).forall(bits.get)))
    statsOk && bloomOk
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
