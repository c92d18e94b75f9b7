package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Queries are assembled from per-module QuerySpec lists; each spec
  * colocates the Spark implementation with its DuckDB oracle SQL so the
  * two can't drift (column names / ordering are part of the compare).
  */
object SparkEntry {

  private def allSpecs: Seq[QuerySpec] =
    RelationalQueries.specs ++ EventQueries.specs ++ IngestQueries.specs ++
      TextQueries.specs ++ DedupQueries.specs ++ SimilarityQueries.specs ++
      MultimodalQueries.specs ++ StreamingQueries.specs ++
      TemporalQueries.specs ++ EvalQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's advertised capability class — filter + aggregation
    * over columnar data (reference README.md:4) — as TPC-H Q1 shape. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_filter_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case s if s.oracle.isDefined => s.name -> s.oracle.get }
      .toMap

  /** Untimed fixture staging (see [[QuerySpec.withBenchSetup]]): the
    * bench runs these before starting a query's clock so measured time
    * is the operator, not its input-lake construction. */
  def benchSetup: Map[String, (SparkSession, String) => Unit] =
    allSpecs.collect {
      case s if s.benchSetup.isDefined => s.name -> s.benchSetup.get
    }.toMap
}
