package graft.engine

import org.apache.spark.sql.functions._

/** CORRECTNESS queries for the multimodal plumbing. The media table is
  * synthesized deterministically from `documents`, so the DuckDB oracle
  * re-derives metadata and frame fingerprints from the raw text — the
  * binary payload equals the UTF-8 text bytes, and md5 agrees on both. */
object MultimodalQueries {
  import Tables.table

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q47_media_metadata",
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'png'
        |            WHEN doc_id % 3 = 1 THEN 'jpeg'
        |            ELSE 'wav' END AS format,
        |       count(*) AS n,
        |       CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
        |       CAST(min(doc_id % 8 * 160 + 320) AS INT) AS min_width,
        |       CAST(max(doc_id % 8 * 90 + 180) AS INT) AS max_height
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // Binary payload + typed metadata struct schema, aggregated by
      // format — the "catalog view" of a media lake.
      Multimodal.mediaTable(table(s, dir, "documents"))
        .groupBy(col("meta.format").as("format"))
        .agg(count(lit(1)).as("n"),
          sum(col("payload_len")).as("total_bytes"),
          min(col("meta.width")).as("min_width"),
          max(col("meta.height")).as("max_height"))
        .orderBy(col("format"))
    },

    QuerySpec(
      "q48_frame_sample",
      """WITH fr AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT))) AS i
        |  FROM documents)
        |SELECT doc_id AS media_id, i AS frame_idx,
        |       md5(substr(text, CAST(i*64+1 AS INT), 64)) AS frame_md5
        |FROM fr WHERE i % 5 = 0
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      // Video-style frame sampling over the opaque payload: fixed 64-byte
      // frames, every 5th kept, md5-fingerprinted. Row-local explosion —
      // no shuffle before the final order.
      Multimodal.frameSample(
        Multimodal.mediaTable(table(s, dir, "documents")))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    QuerySpec.noOracle("q49_decode_features") { (s, dir) =>
      // Partition-wise batch decode (mapInPandas-analogue) through the
      // STUB codec — deterministic, so the rows-only check is stable;
      // batch-shape and determinism assertions live in MultimodalSpec.
      Multimodal.decodeFeatures(
        Multimodal.mediaTable(table(s, dir, "documents")), dim = 8)
        .select(col("media_id"), col("dim"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("feature"), 8).cast("double"), 4).as("f7"))
        .orderBy(col("media_id"))
    })
}
