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
      normalizeEventTs(spark.read.parquet(path))
    } else spark.read.parquet(path)
  }

  /** Normalize `ts` to Spark's µs TimestampType whatever the file schema
    * delivered: long = epoch NANOS (the nanosAsLong read of
    * TIMESTAMP(NANOS)) → integer-divide to µs — exact for µs-resolution
    * data, the same truncation DuckDB's CAST applies; TIMESTAMP_NTZ
    * (µs/ms files with isAdjustedToUTC=false) → cast, which under the
    * pinned UTC session timezone maps wall time to the identical
    * instant DuckDB reads. Already-µs TimestampType passes through. */
  private[engine] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every table as a temp view (the Athena-surface analogue:
    * `spark.sql` over named relations, reference `README.md:13-15`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
