package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational CDC MERGE — the changelog-apply operator (Delta/Iceberg
  * `MERGE INTO`, Flink changelog materialization) expressed as one
  * declarative plan: given a base snapshot and a keyed changelog of
  * I/U/D operations with a per-key sequence, produce the next snapshot
  * under latest-wins semantics.
  *
  * Resolution rules (each a deliberate MERGE convention, replayed
  * verbatim by the q154 oracle):
  *  - the change with the highest `seq` per key WINS (earlier changes
  *    for the key are superseded — rank, never apply-in-sequence);
  *  - winner `D`: the key is absent from the result, whether it came
  *    from base or an earlier insert;
  *  - winner `U`: applied if the key exists in base OR the changelog
  *    also carries an `I` for it (update-after-insert in the same
  *    batch); an update for a truly unknown key is DROPPED, not
  *    upserted — silent upsert-on-update masks producer bugs;
  *  - winner `I`: always materializes the row (insert-or-replace);
  *  - keys untouched by the changelog carry their base row forward.
  *
  * Scale shape: the winner pick is a streaming `row_number` over the
  * changelog only (never the base); the base participates in exactly
  * ONE key-partitioned full-outer join — the minimum any merge must
  * pay — and untouched rows never move again after it. A changelog is
  * normally ≪ base, so AQE broadcasts the change side of the join and
  * the base is not even shuffled; composed with the lake layer
  * ([[Lake.upsert]]'s partition-pruned rewrite), only base partitions
  * containing changed keys are read at all. Output columns:
  * `key, payloadCols…, src` (`base`/`upd`/`ins`).
  */
object Cdc {

  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "merge needs at least one payload column")
    val k = col(keyCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(k).orderBy(col(seqCol).desc)
    val winner = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(k +: col(opCol).as("_op") +:
        payloadCols.map(c => col(c).as(s"_ch_$c")): _*)
    val hasIns = changes.filter(col(opCol) === "I")
      .select(k).distinct().withColumn("_has_i", lit(true))
    val ch = winner.join(hasIns, Seq(keyCol), "left")
    base
      .select(k +: lit(true).as("_in_base") +:
        payloadCols.map(c => col(c).as(s"_b_$c")): _*)
      .join(ch, Seq(keyCol), "full_outer")
      .filter(
        // D wins → gone; U without a pre-existing row → dropped
        (col("_op").isNull && col("_in_base")) ||
          (col("_op") === "I") ||
          (col("_op") === "U" &&
            (coalesce(col("_in_base"), lit(false)) ||
              coalesce(col("_has_i"), lit(false)))))
      .select(k +:
        payloadCols.map(c =>
          when(col("_op").isin("I", "U"), col(s"_ch_$c"))
            .otherwise(col(s"_b_$c")).as(c)) :+
        when(col("_op") === "I", "ins")
          .when(col("_op") === "U", "upd")
          .otherwise("base").as("src"): _*)
  }
}
