package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-based table registry over the driver-generated parquet lake.
  *
  * The reference delegated its catalog to AWS Glue (crawler refresh,
  * reference `lambda-functions/emr-no-vpc.py:159-169`) and queried via
  * Athena over partitioned parquet. Our Spark-native equivalent is
  * path-based parquet relations + temp views in the session catalog —
  * Catalyst handles pruning/pushdown from there.
  *
  * At 100 TB each `table(...)` is a partitioned directory scan; nothing
  * here collects to the driver or assumes single-file tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from the scale-factor directory.
    *
    * `events.ts` has shipped in two physical forms across testdata
    * generations — TIMESTAMP(NANOS) (which Spark's µs TimestampType
    * cannot ingest directly, [PARQUET_TYPE_ILLEGAL]) and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    * [[normalizeEventTs]] dispatches on the type that actually came off
    * the footer, so the engine reads either generation — the kind of
    * physical-representation drift a 100 TB lake accumulates across
    * producer versions.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Defensive idempotent set: the driver may pass its own session
      // (not built via graft.Sessions), and without this conf a NANOS
      // ts column is a hard read error. Runtime-settable SQL conf, same
      // value always — no behavior change for Sessions-built sessions.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The NTZ branch of normalizeEventTs casts wall time to an instant
      // through the session timezone; anything but UTC silently shifts
      // every event by the tz offset relative to the DuckDB oracle. Same
      // defensive idempotent set as nanosAsLong above.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      normalizeEventTs(spark.read.parquet(path), longTsUnit(spark, path))
    } else spark.read.parquet(path)
  }

  /** Normalize `ts` to Spark's µs TimestampType whatever the file schema
    * delivered. A LongType `ts` is ambiguous post-read: Spark's type
    * system erases whether it came from a nanosAsLong read of
    * TIMESTAMP(NANOS) or from a genuine INT64 column (a future
    * generation shipping raw epoch-micros longs would be silently
    * divided by 1000 if we assumed nanos). So the long branch dispatches
    * on `unit`, which [[longTsUnit]] reads off the parquet footer's
    * logical-type annotation — the one place the distinction survives.
    * TIMESTAMP_NTZ (µs/ms files with isAdjustedToUTC=false) → cast,
    * which under the pinned UTC session timezone maps wall time to the
    * identical instant DuckDB reads. Already-µs TimestampType passes
    * through. */
  private[graft] def normalizeEventTs(df: DataFrame,
      unit: String = "nanos"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        val toMicros = unit match {
          case "nanos" => "timestamp_micros(ts div 1000)" // DuckDB-identical truncation
          case "millis" => "timestamp_millis(ts)"
          case _ => "timestamp_micros(ts)" // raw INT64: documented epoch-µs contract
        }
        df.withColumn("ts", expr(toMicros))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Time unit of a long-read `ts` column, from one parquet footer of
    * `dir` (driver-side, one small metadata read, cached per path).
    * Returns "nanos" / "micros" / "millis" for TIMESTAMP-annotated
    * columns and "micros" for unannotated INT64 (the raw-epoch-µs
    * contract); any probe failure (empty dir, no ts column) falls back
    * to "nanos" — the only generation that reaches the long branch
    * today. */
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def longTsUnit(spark: SparkSession, dir: String): String =
    tsUnitCache.computeIfAbsent(dir, { d =>
      try {
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val conf = spark.sessionState.newHadoopConf()
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(conf)
        val file = fs.listStatus(p).map(_.getPath)
          .find(f => f.getName.endsWith(".parquet")).get
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          schema.getType(schema.getFieldIndex("ts"))
            .asPrimitiveType().getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit.name.toLowerCase // NANOS / MICROS / MILLIS
            case _ => "micros"
          }
        } finally reader.close()
      } catch {
        // ONLY structurally-expected failures fall back (no parquet
        // file in the dir, no `ts` field in the schema) — the cases
        // where "nanos" is the sole generation that can reach the long
        // branch. A transient IO failure must PROPAGATE: swallowing it
        // would cache the wrong unit forever (computeIfAbsent) and
        // silently shift a future raw-micros generation 1000×.
        case _: NoSuchElementException => "nanos"
        case _: org.apache.parquet.io.InvalidRecordException => "nanos"
        case _: IllegalArgumentException => "nanos"
      }
    })

  /** Register every table as a temp view (the Athena-surface analogue:
    * `spark.sql` over named relations, reference `README.md:13-15`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
