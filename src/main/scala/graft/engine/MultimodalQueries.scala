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
        |       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
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

    QuerySpec(
      "q49_decode_features",
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |              WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
        |         CAST(doc_id % 8 * 160 + 320 AS INT) AS width,
        |         CAST(doc_id % 5 * 64 + 128 AS INT) AS height
        |  FROM documents)
        |SELECT doc_id AS media_id, format, width, height,
        |       CAST((width * 10) // height AS INT) AS aspect_band,
        |       md5(format || ':' || CAST(width AS VARCHAR) || 'x' ||
        |           CAST(height AS VARCHAR)) AS sig
        |FROM m ORDER BY 1""".stripMargin) { (s, dir) =>
      // REAL batch decode — retires the stub codec from the query
      // surface. Every doc payload gets an actual container header
      // prepended to its text bytes (PNG/GIF/BMP at their spec offsets;
      // JPEG as SOI + a real SOF0 segment), and every output value is
      // parsed BACK FROM THOSE BYTES: fixed-offset formats through
      // codegen'd binary expressions, JPEG through the partition-wise
      // marker scan (the mapInPandas slot a pixel codec would fill).
      // The oracle recomputes the planted dimensions from the doc_id
      // formulas, so one wrong byte offset, endianness, magic, or
      // segment length in EITHER the encoders or the parsers moves a
      // width/height and breaks the hash. Feature derivation (aspect
      // band, content signature) runs on the PARSED values — the
      // decode → feature-extract pipeline shape, end to end on bytes.
      val w = (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int")
      val h = (pmod(col("doc_id"), lit(5)) * 64 + 128).cast("int")
      val header = when(col("doc_id") % 4 === 0, ImageHeaders.pngHeader(w, h))
        .when(col("doc_id") % 4 === 1, ImageHeaders.gifHeader(w, h))
        .when(col("doc_id") % 4 === 2, ImageHeaders.bmpHeader(w, h))
        .otherwise(ImageHeaders.jpegHeader(w, h))
      Multimodal.headerFeatures(
        table(s, dir, "documents")
          .select(col("doc_id").as("media_id"),
            concat(header, col("text").cast("binary")).as("payload")))
        .withColumn("aspect_band", expr("CAST((width * 10) div height AS INT)"))
        .withColumn("sig", md5(concat(col("format"), lit(":"),
          col("width").cast("string"), lit("x"),
          col("height").cast("string")).cast("binary")))
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
    },

    QuerySpec(
      "q117_audio_headers",
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(1 + doc_id % 2 AS INT) AS channels,
        |         CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |              WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
        |         CAST(CASE doc_id % 3 WHEN 0 THEN 8 ELSE 16 END AS INT)
        |           AS bits_per_sample,
        |         CAST(strlen(text) AS BIGINT) AS data_len
        |  FROM documents)
        |SELECT doc_id AS media_id, channels, sample_rate, bits_per_sample,
        |       data_len,
        |       data_len * 8000 // (sample_rate * channels * bits_per_sample)
        |         AS duration_ms
        |FROM m ORDER BY 1""".stripMargin) { (s, dir) =>
      // REAL audio-container round-trip ([[AudioHeaders]]), the WAV leg
      // of the q88/q49 codec family: each doc's payload gets an actual
      // RIFF/WAVE header (spec-layout bytes, derived byte-rate and
      // block-align fields) prepended to the text body, and every doc
      // with doc_id % 5 == 0 additionally gets a `fact` chunk between
      // `fmt ` and `data` — the non-canonical layout the codegen'd
      // fixed-offset parser must DECLINE and the partition-wise RIFF
      // chunk walk must resolve ([[Multimodal.audioFeatures]]'s
      // two-tier decode, exercised on both tiers by construction). The
      // oracle recomputes the planted shape from the doc_id formulas,
      // so one wrong offset, endianness, chunk size, or pad byte in
      // EITHER the encoder or EITHER parser breaks the hash;
      // duration_ms is derived from the PARSED fields by exact long
      // division on both engines. Row-local end to end.
      val ch = (lit(1) + pmod(col("doc_id"), lit(2))).cast("int")
      val rate = when(pmod(col("doc_id"), lit(4)) === 0, 8000)
        .when(pmod(col("doc_id"), lit(4)) === 1, 16000)
        .when(pmod(col("doc_id"), lit(4)) === 2, 22050)
        .otherwise(44100).cast("int")
      val bits = when(pmod(col("doc_id"), lit(3)) === 0, 8)
        .otherwise(16).cast("int")
      val dataLen = length(col("text").cast("binary")).cast("long")
      val header = when(pmod(col("doc_id"), lit(5)) === 0,
          AudioHeaders.wavHeader(ch, rate, bits, dataLen, withFact = true))
        .otherwise(AudioHeaders.wavHeader(ch, rate, bits, dataLen))
      Multimodal.audioFeatures(
        table(s, dir, "documents")
          .select(col("doc_id").as("media_id"),
            concat(header, col("text").cast("binary")).as("payload")))
        .orderBy(col("media_id"))
    },

    QuerySpec(
      "q132_video_headers",
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |              ELSE 90000 END AS INT) AS timescale,
        |         CAST((doc_id % 500 + 1) * 100 AS BIGINT) AS duration,
        |         CAST(1 + doc_id % 3 AS INT) AS track_count,
        |         CAST(strlen(text) AS BIGINT) AS mdat_len
        |  FROM documents)
        |SELECT doc_id AS media_id, timescale, duration, track_count,
        |       mdat_len, duration * 1000 // timescale AS duration_ms
        |FROM m ORDER BY 1""".stripMargin) { (s, dir) =>
      // REAL video-container round-trip ([[VideoHeaders]]), the
      // MP4/ISO-BMFF leg completing the q88/q117 codec family: each
      // doc's text bytes become an `mdat` payload behind actual
      // `ftyp`+`moov(mvhd, trak×n)` boxes (big-endian sizes, derived
      // moov size, spec matrix/rate fields), and every doc with
      // doc_id % 5 == 0 additionally gets a `free` box between `ftyp`
      // and `moov` — the editor-padding layout the codegen'd
      // fixed-offset parser must DECLINE and the partition-wise box
      // walk must resolve ([[Multimodal.videoFeatures]]'s two-tier
      // decode, exercised on both tiers by construction). The oracle
      // recomputes the planted shape from the doc_id formulas, so one
      // wrong offset, box size, endianness, or track-count derivation
      // in EITHER the encoder or EITHER parser breaks the hash;
      // duration_ms is exact long division on both engines.
      val ts = when(pmod(col("doc_id"), lit(3)) === 0, 600)
        .when(pmod(col("doc_id"), lit(3)) === 1, 1000)
        .otherwise(90000).cast("int")
      val dur = ((pmod(col("doc_id"), lit(500)) + 1) * 100).cast("long")
      val nTracks = (lit(1) + pmod(col("doc_id"), lit(3))).cast("int")
      val body = col("text").cast("binary")
      val payload = when(pmod(col("doc_id"), lit(5)) === 0,
          VideoHeaders.mp4Payload(ts, dur, nTracks, body, withFree = true))
        .otherwise(VideoHeaders.mp4Payload(ts, dur, nTracks, body))
      Multimodal.videoFeatures(
        table(s, dir, "documents")
          .select(col("doc_id").as("media_id"), payload.as("payload")))
        .orderBy(col("media_id"))
    },

    QuerySpec(
      "q145_frame_dedup",
      """WITH lib AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0),
        |fr AS (
        |  SELECT doc_id AS media_id, i AS frame_idx,
        |         md5(substr(text, CAST(i*64+1 AS INT), 64)) AS frame_md5
        |  FROM (SELECT doc_id, text,
        |               unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT)))
        |                 AS i
        |        FROM lib)
        |  WHERE i % 5 = 0),
        |k AS (
        |  SELECT frame_md5, media_id, n FROM (
        |    SELECT frame_md5, media_id,
        |           COUNT(*) OVER (PARTITION BY frame_md5) AS n,
        |           ROW_NUMBER() OVER (PARTITION BY frame_md5
        |                              ORDER BY media_id, frame_idx) AS rn
        |    FROM fr) WHERE rn = 1)
        |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       CAST(SUM(n) AS BIGINT) AS n_refs
        |FROM k GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      // Frame-level dedup across a media library (the multimodal ×
      // dedup composition: content-defined storage for video frames) —
      // the library carries planted whole-media duplicates (+10000
      // copies of every doc_id % 7 == 0), frames are q48's sampled
      // 64-byte windows, and each distinct frame hash keeps its
      // (media, idx)-least owner; the per-media rollup counts owned
      // frames and total references folded into them. One shuffle on
      // the frame hash (the frame explosion is row-local), min-struct
      // keeper = the oracle's (media, idx) row_number — a copy owning
      // a frame its original should own, or a lost duplicate
      // reference, moves a count.
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val lib = docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"), col("text")))
      val frames = Multimodal.frameSample(Multimodal.mediaTable(lib))
      frames.groupBy(col("frame_md5"))
        .agg(min(struct(col("media_id"), col("frame_idx"))).as("k"),
          count(lit(1)).as("n"))
        .groupBy(col("k.media_id").as("media_id"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n")).as("n_refs"))
        .orderBy(col("media_id"))
    },

    QuerySpec(
      "q173_warc_scan",
      """WITH d AS (
        |  SELECT doc_id, doc_id % 16 AS file_id, source,
        |         text || CASE WHEN doc_id % 11 = 0
        |                      THEN chr(13)||chr(10)||'WARC/1.0'||
        |                           chr(13)||chr(10)||'WARC-Type: fake'||
        |                           chr(13)||chr(10)||chr(13)||chr(10)
        |                      ELSE '' END AS payload
        |  FROM documents),
        |resp AS (
        |  SELECT file_id,
        |         CAST(row_number() OVER (PARTITION BY file_id
        |                                 ORDER BY doc_id) AS INT) AS rec_idx,
        |         'response' AS warc_type,
        |         'https://' || source || '.example.org/p/' || doc_id
        |           AS target_uri,
        |         CAST(strlen(payload) AS BIGINT)
        |           AS content_length,
        |         md5(payload) AS payload_md5
        |  FROM d),
        |info AS (
        |  SELECT DISTINCT file_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
        |         CAST(NULL AS VARCHAR) AS target_uri,
        |         CAST(strlen('isPartOf: graft-crawl-' || file_id)
        |              AS BIGINT) AS content_length,
        |         md5('isPartOf: graft-crawl-' || file_id) AS payload_md5
        |  FROM d)
        |SELECT * FROM (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |ORDER BY file_id, rec_idx""".stripMargin) { (s, dir) =>
      // WARC/1.0 crawl ingestion ([[Warc]]): the staged fixture is 16
      // REAL files on disk (8 plain `.warc`, 8 `.warc.gz`), read back
      // through Spark's `binaryFile` source and walked record-by-record
      // partition-wise — the Common-Crawl ingest shape. Every 11th
      // response body contains a byte-exact fake `WARC/1.0` record head
      // COUNTED by Content-Length, so a parser that splits on the magic
      // instead of honoring the declared length invents records and
      // breaks the row count; a wrong byte-length (zh multibyte docs),
      // lost gzip tier, or mis-framed payload breaks the md5 hash. The
      // oracle re-derives every record from `documents` — the parser is
      // checked against what was ENCODED, end to end.
      val crawl = stagedCrawl(s, dir)
      Warc.records(s, crawl)
        .select(col("file_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy(col("file_id"), col("rec_idx"))
    }.withBenchSetup((s, dir) => { stagedCrawl(s, dir); () }))

  /** Stage the WARC crawl fixture once per (JVM, sf) under the per-PID
    * scratch root; returns its directory. Shared with the streaming
    * ingest form (q178). */
  private[engine] def stagedCrawl(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val root = s"${graft.Sessions.scratchRoot}/warc_crawl_" +
      new java.io.File(dir).getName
    Staging.ensureStaged(root) {
      Warc.stageCrawl(s, table(s, dir, "documents"), root)
    }
    root
  }
}
