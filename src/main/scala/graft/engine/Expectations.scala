package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ / Great-Expectations
  * shape, Spark-native): a rule set evaluated against a table in as few
  * passes as the rule classes allow, returning one row per rule —
  * (rule_id, rule_type, col_name, n_violations, passed). The gate a
  * production lake runs on every drop BEFORE the data reaches consumers;
  * [[Profile]] describes a table, this judges it.
  *
  * Evaluation cost by rule class — the point of declaring rules instead
  * of writing N ad-hoc queries:
  *  - ROW-LOCAL rules (not-null, range, set-membership, regex) all fold
  *    into ONE conditional aggregation — a single scan of the table
  *    whatever their number, map-side combined, no shuffle beyond the
  *    1-row aggregate;
  *  - UNIQUENESS is one groupBy on the key with a >1 filter — the one
  *    genuinely shuffling rule (the exact-duplicate-count semantics);
  *    its exchange carries the key cardinality, not the row count;
  *  - REFERENTIAL integrity is an anti-join against the DISTINCT
  *    reference keys, broadcast when the dimension is broadcast-able —
  *    the fact table never shuffles.
  *
  * Violation counts are exact BIGINT; `passed` is a strict
  * n_violations = 0. Rules carry their own ids so a report diff between
  * drops is stable under rule reordering.
  */
object Expectations {

  sealed trait Rule {
    def id: String
    def ruleType: String
    def colName: String
  }
  /** `col IS NOT NULL` for every row. */
  final case class NotNull(id: String, column: String) extends Rule {
    def ruleType = "not_null"; def colName = column
  }
  /** `lo ≤ col ≤ hi` (nulls violate: a range claim is also a presence
    * claim — Deequ's hasMin/hasMax semantics). */
  final case class InRange(id: String, column: String, lo: Double,
      hi: Double) extends Rule {
    def ruleType = "in_range"; def colName = column
  }
  /** `col ∈ values` (nulls violate). */
  final case class OneOf(id: String, column: String, values: Seq[String])
      extends Rule {
    def ruleType = "one_of"; def colName = column
  }
  /** `col RLIKE regex` (nulls violate). The regex must stay in the
    * RE2-ish common subset both engines parse identically — anchored
    * character classes, no lookaround (the oracle replays it through
    * DuckDB's regexp_matches). */
  final case class MatchesRegex(id: String, column: String, regex: String)
      extends Rule {
    def ruleType = "regex"; def colName = column
  }
  /** No key value occurs twice (NULL keys ignored, SQL-distinct
    * semantics: uniqueness is about collisions, presence is
    * [[NotNull]]'s job). Violations = rows in excess of one per
    * duplicated key. */
  final case class Unique(id: String, column: String) extends Rule {
    def ruleType = "unique"; def colName = column
  }
  /** Every non-null `col` value exists in `refCol` of the reference
    * table (foreign-key claim). */
  final case class RefIntegrity(id: String, column: String,
      ref: () => DataFrame, refCol: String) extends Rule {
    def ruleType = "ref_integrity"; def colName = column
  }

  /** 3-valued-logic violation predicate of a ROW-LOCAL rule (nulls
    * violate every claim except via [[NotNull]], which IS the presence
    * claim). */
  private def violated(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case InRange(_, c, lo, hi) =>
      !(col(c) >= lo && col(c) <= hi) || col(c).isNull
    case OneOf(_, c, vs) => !col(c).isInCollection(vs) || col(c).isNull
    case MatchesRegex(_, c, re) => !col(c).rlike(re) || col(c).isNull
    case _ => lit(false)
  }

  /** 1/0 violation flag for a row-local rule — the summable form a
    * STREAMING aggregation needs (q170: the same rules run continuously
    * over micro-batches; flag sums are associative, so streaming
    * totals ≡ the batch [[check]] counts exactly). Non-row-local rules
    * (uniqueness, referential) are rejected: their state is not a
    * per-row flag. */
  def violationFlag(r: Rule): Column = r match {
    case _: NotNull | _: InRange | _: OneOf | _: MatchesRegex =>
      when(violated(r), 1L).otherwise(0L)
    case other => throw new IllegalArgumentException(
      s"rule ${other.id} (${other.ruleType}) is not row-local")
  }

  /** Evaluate `rules` against `df`; returns (rule_id, rule_type,
    * col_name, n_violations BIGINT, passed BOOLEAN) ordered by
    * rule_id. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "declare at least one rule")
    require(rules.map(_.id).distinct.length == rules.length,
      "rule ids must be unique")
    val rowLocal = rules.filter {
      case _: NotNull | _: InRange | _: OneOf | _: MatchesRegex => true
      case _ => false
    }
    val rowLocalDf: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map(r =>
          sum(when(violated(r), 1L).otherwise(0L)).as(s"__v_${r.id}"))
        val one = df.agg(aggs.head, aggs.tail: _*)
        val arr = array(rowLocal.map(r => struct(
          lit(r.id).as("rule_id"), lit(r.ruleType).as("rule_type"),
          lit(r.colName).as("col_name"),
          col(s"__v_${r.id}").as("n_violations"))): _*)
        Some(one.select(explode(arr).as("r")).select(col("r.*")))
      }

    val perRule: Seq[DataFrame] = rules.collect {
      case Unique(id, c) =>
        df.filter(col(c).isNotNull).groupBy(col(c)).count()
          .filter(col("count") > 1)
          .agg(coalesce(sum(col("count") - 1L), lit(0L)).as("n_violations"))
          .select(lit(id).as("rule_id"), lit("unique").as("rule_type"),
            lit(c).as("col_name"), col("n_violations"))
      case RefIntegrity(id, c, ref, rc) =>
        val keys = ref().select(col(rc).as(c)).distinct()
        df.filter(col(c).isNotNull).select(col(c))
          .join(broadcast(keys), Seq(c), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_violations"))
          .select(lit(id).as("rule_id"),
            lit("ref_integrity").as("rule_type"),
            lit(c).as("col_name"), col("n_violations"))
    }

    (rowLocalDf.toSeq ++ perRule)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule_id"))
  }
}
