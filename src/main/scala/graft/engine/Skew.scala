package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the standard remedy when one join/agg
  * key carries a pathological share of the rows, so its single reducer
  * becomes the stage's straggler (or OOMs).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) already handles
  * the sort-merge case at runtime; explicit salting remains the tool for
  * the shapes AQE can't rescue — hash aggregations over a hot key, joins
  * where a SINGLE key exceeds any split threshold, or plans where the
  * skewed exchange feeds a window/sort that AQE won't re-plan. The
  * reference met the same problem class by partitioning data out of the
  * hot path entirely (README.md:29-31); salting is the shuffle-time
  * equivalent when the data can't be pre-partitioned.
  */
object Skew {

  /** Salted inner equi-join, result-identical to
    * `left.join(right, key)`: each left row scatters to one of `nSalts`
    * sub-keys, the right side replicates `nSalts`×, and the join keys on
    * (key, salt). A hot key's rows then spread over `nSalts` reducers
    * instead of one.
    *
    * The salt hashes a `monotonically_increasing_id()` (partition-id ×
    * row-position — deterministic within a run for a deterministic input,
    * so retried/speculative tasks of the same partition re-derive the
    * same salts): unlike hashing the row's columns, this never throws on
    * un-hashable column types (MapType) and spreads IDENTICAL left rows
    * across salts instead of collapsing them onto one reducer — duplicate
    * hot-key rows are exactly the skew case that matters.
    *
    * Cost model: right side is duplicated `nSalts`× through the shuffle —
    * use when `right` is the SMALL side (dimension-sized, but too big or
    * too dynamic to broadcast) and `left` is the skewed fact side. The
    * salt widens the shuffle key, so it also de-skews any downstream
    * aggregation that reuses the (key, salt) partitioning before the
    * final merge.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int = 8): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val l = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(nSalts)))
    val r = right.withColumnRenamed(key, "_rk")
      .withColumn("_salt", explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, col(key) === col("_rk") && l("_salt") === r("_salt"))
      .drop("_salt", "_rk")
  }
}
