package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Types `hash`/`xxhash64` accept: everything except maps (and
    * containers holding maps). */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType    => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType  => hashable(a.elementType)
    case _             => true
  }

  /** xxhash64 over every hashable column of `df` — a salt source that is
    * a PURE FUNCTION OF ROW CONTENT, so a retried or speculative task
    * re-derives byte-identical salts no matter how the rows were
    * re-ordered. Positional ids (`monotonically_increasing_id`) look
    * attractive here but are a correctness trap: when the input is itself
    * the output of a shuffle, a re-executed map task can observe a
    * different row order, derive different salts, and duplicate or drop
    * join rows while other reducers already consumed the old outputs
    * (the SPARK-23207 failure class). Content hashing trades that away
    * at one cost: byte-identical duplicate rows share a salt, so a hot
    * key composed of EXACT duplicates still lands on one reducer. Hot
    * keys whose rows differ in any hashable column — the overwhelmingly
    * common case — spread fully.
    */
  private[graft] def contentHash(df: DataFrame): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    require(cols.nonEmpty, "no hashable columns to derive a salt from")
    xxhash64(cols: _*)
  }

  private[graft] def contentSalt(df: DataFrame, nSalts: Int): Column =
    pmod(contentHash(df), lit(nSalts.toLong)).cast("int")

  /** Salted inner equi-join, result-identical to
    * `left.join(right, key)`: each left row scatters to one of `nSalts`
    * sub-keys, the right side replicates `nSalts`×, and the join keys on
    * (key, salt). A hot key's rows then spread over `nSalts` reducers
    * instead of one.
    *
    * The salt is [[contentSalt]] — deterministic under task retry and
    * speculative execution even when `left` is the output of an earlier
    * shuffle (see [[contentHash]] for why positional ids are unsafe
    * here). MapType columns are excluded from the hash automatically, so
    * un-hashable payloads never throw.
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
    val l = left.withColumn("_salt", contentSalt(left, nSalts))
    val r = right.withColumnRenamed(key, "_rk")
      .withColumn("_salt", explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, col(key) === col("_rk") && l("_salt") === r("_salt"))
      .drop("_salt", "_rk")
  }

  /** Salted join for DUPLICATE-HEAVY hot keys — the one shape
    * [[saltedJoin]]'s content salt cannot spread: byte-identical rows
    * share a hash, hence a salt, hence a reducer. Instead of spreading
    * the copies, COLLAPSE them before the shuffle: a group-by over every
    * left column combines duplicates map-side (partial aggregation), so
    * a key with millions of identical copies reaches the exchange as at
    * most one row per map task with a count. The collapsed rows go
    * through the regular salted join (hot DISTINCT contents still
    * spread), and the count re-expands each surviving row afterwards —
    * generation on the consuming task, no extra shuffle. Multiset-
    * identical to `left.join(right, key)`; requires all-hashable left
    * columns (same constraint as the group-by itself).
    *
    * Re-expansion is TWO staged explodes, not one: a single
    * `sequence(1, _dup)` materializes the whole count as one in-memory
    * array before exploding — for the motivating hot key (millions of
    * byte-identical copies) that is tens of MB in a single row, and a
    * hard failure past the 2^31 array-element cap. Exploding
    * ceil(_dup/B) block ids first and then ≤B elements per block bounds
    * every intermediate array: the outer array stays ≤ _dup/B entries
    * (a billion dups → 256k elements at the default B=4096) and the
    * inner one ≤ B, while generation still happens on the consuming
    * task with no extra shuffle. */
  def saltedJoinDupHeavy(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int = 8, expandBlock: Long = 4096L): DataFrame = {
    require(expandBlock > 0, "expandBlock must be positive")
    val collapsed = left.groupBy(left.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_dup"))
    saltedJoin(collapsed, right, key, nSalts)
      // block b of ceil(_dup/B) carries min(B, _dup - b*B) copies;
      // `div` is integral long division — Column.divide goes through
      // double, exact only below 2^53
      .withColumn("_blk",
        explode(sequence(lit(0L), expr(s"(_dup - 1) div $expandBlock"))))
      .withColumn("_i", explode(sequence(lit(1L),
        least(lit(expandBlock), col("_dup") - col("_blk") * expandBlock))))
      .drop("_dup", "_blk", "_i")
  }
}
