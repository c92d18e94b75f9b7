package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark DataFrame/SQL implementation plus
  * (when SQL-expressible) an equivalent ANSI-SQL oracle that DuckDB runs on
  * the same parquet tables. Keeping the pair colocated prevents the classic
  * column-name / ordering drift between implementation and oracle.
  *
  * Determinism contract (both sides):
  *  - explicit total-order ORDER BY (hash compare is row-order-sensitive);
  *  - double aggregates rounded (ROUND(x, 2..6)) so float summation order
  *    differences between engines can't flip a hash;
  *  - integer sums cast to BIGINT in the oracle (DuckDB widens to HUGEINT);
  *  - date parts cast to INT in the oracle (DuckDB year() yields BIGINT).
  */
final case class QuerySpec(
    name: String,
    oracleGen: Option[() => String],
    fn: (SparkSession, String) => DataFrame,
    benchSetup: Option[(SparkSession, String) => Unit] = None) {

  /** The oracle SQL, materialized at CALL time. A thunk rather than a
    * string because some oracles can only be written after the query
    * ran (q110 embeds the path of codebooks the builder published);
    * Verify dumps oracle_sql.json after every query executed, so
    * late-bound text is safe there. Static oracles cost one closure. */
  def oracle: Option[String] = oracleGen.map(_())

  /** Mark the fixture-staging part of this query as UNTIMED bench
    * setup: the bench runs it before starting the clock, so the timed
    * region measures the operator (compact, upsert, …), not the
    * construction of its input lake. The builder itself must stay
    * self-contained — it stages the same fixture when absent, so
    * Verify/tests need no setup call and a bench-setup run just finds
    * the staging already done. */
  def withBenchSetup(setup: (SparkSession, String) => Unit): QuerySpec =
    copy(benchSetup = Some(setup))
}

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, Some(() => oracle), fn)

  /** Oracle whose TEXT is computed when dumped, not when the spec is
    * declared — for SQL that references run-time artifacts (persisted
    * codebooks, builder-recorded paths). */
  def lazyOracle(name: String)(oracle: => String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, Some(() => oracle), fn)

  /** For capabilities DuckDB SQL can't express (MinHash, HLL sketches,
    * streaming…) — the driver then records a weaker rows-only check. */
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, None, fn)
}
