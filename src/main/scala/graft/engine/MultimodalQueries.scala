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
    },

    QuerySpec(
      "q88_image_headers",
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |            ELSE 'bmp' END AS format,
        |       CAST(doc_id % 8 * 160 + 320 AS INT) AS width,
        |       CAST(doc_id % 8 * 90 + 180 AS INT) AS height
        |FROM documents ORDER BY 1""".stripMargin) { (s, dir) =>
      // REAL container-header round-trip ([[ImageHeaders]]): each doc's
      // payload gets an actual PNG/GIF/BMP header (spec-layout bytes,
      // dimensions encoded at their true offsets) prepended to the text
      // body, then the METADATA IS PARSED BACK FROM THE BYTES — format
      // by magic sniff, width/height from the header fields, all in
      // codegen'd binary expressions. The oracle recomputes the planted
      // dimensions from the doc_id formulas, so a single wrong byte
      // offset, endianness, or magic in EITHER the encoder or the
      // parser breaks the hash. Row-local end to end — no shuffle
      // before the final order.
      val w = (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int")
      val h = (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int")
      val header = when(col("doc_id") % 3 === 0, ImageHeaders.pngHeader(w, h))
        .when(col("doc_id") % 3 === 1, ImageHeaders.gifHeader(w, h))
        .otherwise(ImageHeaders.bmpHeader(w, h))
      table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          concat(header, col("text").cast("binary")).as("payload"))
        .select(col("media_id"), ImageHeaders.parse(col("payload")).as("m"))
        .select(col("media_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy(col("media_id"))
    })
}
