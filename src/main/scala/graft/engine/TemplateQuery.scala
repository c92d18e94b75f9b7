package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP3 — the reference web platform's "generate SQL based on user
  * input" contract (reference README.md:62-69: the NextJS app collects
  * a column group, patient/date constraints, and an aggregation, then
  * queries through API Gateway + Lambda). The three pieces exist
  * separately in this repo (category projection q33, partition-pruned
  * WHERE, SQL aggregation); this composes them into the ONE
  * parameterized query that UI actually issues, with the platform's
  * cost policy enforced at build time ([[ScanGuard]]): the date
  * predicate must prune partitions and the category projection must
  * keep the scan narrow — at 6,037 columns × 100 TB the template is
  * only viable BECAUSE both hold.
  */
object TemplateQuery {

  /** One web-form submission: which super-category of measurement
    * columns, optionally which patient, which test date, and which
    * aggregation ("avg" | "min" | "max"). */
  final case class Ep3(category: String, patientId: Option[String],
      year: Int, month: Int, day: Int, agg: String)

  /** Build the composed query over a partitioned EEG lake.
    *
    * Aggregation arithmetic is EXACT-REPLAY shaped: the fixture
    * measurements carry exactly 3 decimals, so "avg" sums scaled
    * integer milli-units and performs the same two IEEE double
    * divisions on both engines (sum/n/1000) — hash-stable across
    * Spark and DuckDB, the q154 integer-cents discipline. */
  def ep3Query(spark: SparkSession, lakeDir: String,
      mapping: Map[String, Seq[String]], p: Ep3): DataFrame = {
    val cols = mapping.getOrElse(p.category,
        throw new IllegalArgumentException(
          s"unknown super-category: ${p.category}"))
      .filterNot(Seq("ClockDateTime", "Time").contains) // key cols aggregate nowhere
    val base = Lake.read(spark, lakeDir)
      .filter(col("Year") === p.year && col("Month") === p.month &&
        col("Day") === p.day)
    val scoped =
      p.patientId.fold(base)(id => base.filter(col("PatientID") === id))
    def milli(c: String) = round(col(c) * 1000).cast("long")
    val aggs = p.agg match {
      case "avg" => cols.map(c =>
        (sum(milli(c)).cast("double") / count(lit(1)) / 1000.0).as(s"avg_$c"))
      case "min" => cols.map(c => min(col(c)).as(s"min_$c"))
      case "max" => cols.map(c => max(col(c)).as(s"max_$c"))
      case other => throw new IllegalArgumentException(
        s"unsupported aggregation: $other")
    }
    val out = scoped.agg(count(lit(1)).as("n"), aggs: _*)
    // the reference's cost policy, enforced where the SQL is generated:
    // the date must reach the scan as PartitionFilters and the category
    // projection must prune to its own columns (+ patient key)
    ScanGuard.requirePruned(out, lakeDir)
    ScanGuard.requireNarrow(out, lakeDir,
      maxDataCols = cols.length + p.patientId.size)
    out
  }
}
