package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operator — the pre-ingest quality report every
  * pipeline runs before trusting a new drop: per-column null counts,
  * exact distinct cardinality, ranges, and means in ONE scan of the
  * table. The reference's platform ingests monthly hospital drops whose
  * schema is only conventionally stable (reference sparkle-v9.py derives
  * it per-file from the header); a profile diff between drops is how
  * such a pipeline notices a silently shifted column.
  *
  * Plan shape: one global aggregation computes every NON-distinct
  * statistic in one pass (partial aggregates map-side — the scan is the
  * cost, the agg row is ~4·|cols| values); exact distinct counts run as
  * one single-distinct HashAggregate per column over a narrow columnar
  * scan (see the inline note for why multi-distinct-in-one-agg is a
  * SortAggregate trap), joined back as 1-row frames; the per-column
  * rows are then EXPLODED from the combined row, row-locally. For
  * 100 TB profiling swap in `approx_count_distinct` per column (the
  * q23 sketch path) and the distinct passes fold back into the single
  * aggregation — the output contract is the same shape.
  *
  * Numeric columns report `(min_num, max_num, mean)` rounded to 4 (so
  * float summation order cannot flip a compare) with `(min_str,
  * max_str)` null; non-numerics the reverse (values cast to string —
  * dates render ISO in both engines).
  */
object Profile {

  /** `numeric = true` → min/max/mean as rounded doubles; otherwise
    * min/max as strings, mean null. */
  final case class ColSpec(name: String, numeric: Boolean)

  def profile(df: DataFrame, cols: Seq[ColSpec]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val x = col(c.name)
      Seq(count(x).as(s"__nn_${c.name}")) ++
        (if (c.numeric) Seq(
          round(min(x).cast("double"), 4).as(s"__mn_${c.name}"),
          round(max(x).cast("double"), 4).as(s"__mx_${c.name}"),
          round(avg(x), 4).as(s"__av_${c.name}"))
        else Seq(
          min(x).cast("string").as(s"__mns_${c.name}"),
          max(x).cast("string").as(s"__mxs_${c.name}")))
    }
    // Exact distinct cardinalities run as ONE SINGLE-distinct
    // aggregation per column over a narrow columnar scan, crossJoined
    // back as 1-row frames — NOT as N countDistinct calls inside the
    // stats aggregate: Spark rewrites multi-distinct through one Expand
    // grouped by the tuple of ALL distinct columns, and with several
    // float columns that degenerates to a SortAggregate over
    // rows×(N+1) expanded tuples (measured ~8.4 s at sf0.1 vs ~1 s for
    // this shape). Per-column single-distinct plans are map-side
    // deduped HashAggregates; the extra scans each read ONE column —
    // columnar IO makes N narrow passes ≈ one wide pass in bytes.
    val base = df.agg(aggs.head, aggs.tail: _*)
    val one = cols.foldLeft(base) { (acc, c) =>
      acc.crossJoin(
        df.agg(countDistinct(col(c.name)).as(s"__nd_${c.name}")))
    }
    val rows = array(cols.map { c =>
      struct(
        lit(c.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${c.name}")).as("n_nulls"),
        col(s"__nd_${c.name}").as("n_distinct"),
        (if (c.numeric) col(s"__mn_${c.name}")
         else lit(null).cast("double")).as("min_num"),
        (if (c.numeric) col(s"__mx_${c.name}")
         else lit(null).cast("double")).as("max_num"),
        (if (c.numeric) col(s"__av_${c.name}")
         else lit(null).cast("double")).as("mean"),
        (if (c.numeric) lit(null).cast("string")
         else col(s"__mns_${c.name}")).as("min_str"),
        (if (c.numeric) lit(null).cast("string")
         else col(s"__mxs_${c.name}")).as("max_str"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
