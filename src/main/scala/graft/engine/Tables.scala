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
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) does not accept ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set once at session
    * construction — see [[graft.Sessions]]; never mutated here) it reads
    * as a long (ns since epoch) which we convert with integer division —
    * exact for the µs-resolution data, and the same truncation DuckDB's
    * CAST(ts AS TIMESTAMP) applies on the oracle side.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Defensive idempotent set: the driver may pass its own session
      // (not built via graft.Sessions), and without this conf the NANOS
      // column is a hard read error. Runtime-settable SQL conf, same
      // value always — no behavior change for Sessions-built sessions.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }

  /** Register every table as a temp view (the Athena-surface analogue:
    * `spark.sql` over named relations, reference `README.md:13-15`). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
