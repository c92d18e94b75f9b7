package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed rows for the partition-wise batch decode path (the Scala-native
  * analogue of a Pandas-UDF `mapInPandas` stage: a typed Dataset walked
  * partition-by-partition through a codec). Top-level case classes so
  * implicit Encoders resolve. */
final case class MediaRow(media_id: Long, format: String, payload: Array[Byte])
final case class DimsRow(media_id: Long, width: Int, height: Int)
final case class ParsedMediaRow(media_id: Long, format: Option[String],
    width: Option[Int], height: Option[Int], payload: Array[Byte])
final case class ParsedVideoRow(media_id: Long, timescale: Option[Int],
    duration: Option[Long], track_count: Option[Int],
    mdat_len: Option[Long], payload: Array[Byte])
final case class ParsedAudioRow(media_id: Long, channels: Option[Int],
    sample_rate: Option[Int], bits_per_sample: Option[Int],
    data_len: Option[Long], payload: Array[Byte])

/** Multimodal column plumbing (BASELINE north star): image/audio/video
  * as opaque `binary` payloads with a typed metadata struct, plus
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The decode surface works from REAL payload bytes ([[ImageHeaders]]):
  * container headers are parsed with codegen'd fixed-offset binary
  * expressions (PNG/GIF/BMP) or the partition-wise JPEG marker scan —
  * no stub codec remains on the query surface. PIXEL decode
  * (libjpeg/ffmpeg territory) is out of scope for this environment; the
  * partition-wise typed stage here is exactly the slot such a codec
  * plugs into, with no plan-shape change.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collection, no base64 blowup); frame explosion is bounded by
  * ceil(len/frameBytes) per row; the batch decode is `mapPartitions` —
  * one codec instance per partition, streaming iterator, no
  * per-row setup cost.
  */
object Multimodal {

  /** Synthesize the media table from `documents` (deterministic:
    * format/width/height derived from doc_id, payload = text bytes).
    * This is the SCHEMA under test: opaque binary + typed metadata. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("wav").as("format"),
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height")).as("meta"),
      col("text").cast("binary").as("payload"),
      // byte length of the payload, not char length — differs under
      // multibyte UTF-8, and the frame math is in bytes
      length(col("text").cast("binary")).cast("long").as("payload_len"))

  /** Metadata-only resize: recompute width/height for a bounding box,
    * preserving aspect ratio (integer floor). The pixel transform itself
    * is codec territory — metadata algebra is the engine's part. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleNum = least(lit(maxW) * col("meta.height"), lit(maxH) * col("meta.width"))
    val newW = floor(col("meta.width") * scaleNum /
      (col("meta.width") * col("meta.height"))).cast("int")
    val newH = floor(col("meta.height") * scaleNum /
      (col("meta.width") * col("meta.height"))).cast("int")
    media.withColumn("meta",
      struct(col("meta.format").as("format"), newW.as("width"), newH.as("height")))
  }

  /** Frame sampling: treat the payload as a sequence of fixed-size
    * frames, keep every `every`-th, fingerprint each. Row-local
    * explosion bounded by payload size. */
  def frameSample(media: DataFrame, frameBytes: Int = 64, every: Int = 5): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        posexplode(expr(
          s"sequence(0, CAST(ceil(payload_len / $frameBytes.0) AS INT) - 1)"))
          .as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % every === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(expr(s"substring(payload, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
          .as("frame_md5"))

  /** JPEG dimensions via the REAL marker-scan parser
    * ([[ImageHeaders.jpegDimensions]]) in the partition-wise typed
    * stage: JPEG's SOF segment sits at a variable offset, so unlike
    * PNG/GIF/BMP ([[ImageHeaders.parse]], fixed-offset column
    * expressions) it needs imperative per-row code — which belongs
    * exactly here, next to the codec. Payloads without a valid JPEG
    * frame header are dropped (flatMap), not errors. */
  def jpegDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("meta.format").as("format"),
        col("payload"))
      .as[MediaRow]
      .mapPartitions(rows => rows.flatMap(m =>
        ImageHeaders.jpegDimensions(m.payload)
          .map { case (w, h) => DimsRow(m.media_id, w, h) }))
      .toDF()
  }

  /** REAL batch decode over mixed image containers — the
    * mapInPandas-equivalent stage fused with the codegen'd fixed-offset
    * parser, in ONE pass. The projection evaluates
    * [[ImageHeaders.parse]] (whole-stage codegen, no UDF) in the same
    * scan that feeds the typed stage; inside `mapPartitions`, rows the
    * fixed magics matched pass straight through (no byte work), and
    * only the remainder runs the JPEG marker scan (streaming iterator —
    * the slot a pixel codec would occupy). Returns
    * (media_id, format, width, height), every value derived from the
    * payload BYTES; unparseable payloads are dropped, not errors. No
    * shuffle, one scan — an earlier two-branch union form read the
    * media source TWICE. */
  def headerFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"),
        ImageHeaders.parse(col("payload")).as("m"))
      .select(col("media_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("payload"))
      .as[ParsedMediaRow]
      .mapPartitions(rows => rows.flatMap { r =>
        r.format match {
          case Some(f) =>
            for (w <- r.width; h <- r.height) yield (r.media_id, f, w, h)
          case None =>
            ImageHeaders.jpegDimensions(r.payload)
              .map { case (w, h) => (r.media_id, "jpeg", w, h) }
        }
      })
      .toDF("media_id", "format", "width", "height")
  }

  /** Audio counterpart of [[headerFeatures]] — same two-tier decode, on
    * WAV bytes: [[AudioHeaders.parse]] (codegen'd fixed-offset
    * expressions) resolves canonical 44-byte-header payloads in the
    * scan projection; rows it declined (fact/LIST chunk between `fmt `
    * and `data`) run the [[AudioHeaders.wavInfo]] chunk walk inside the
    * partition-wise typed stage. One scan, no shuffle; unparseable
    * payloads are dropped, not errors. Output adds `duration_ms`
    * derived from the PARSED fields (dataLen·1000 / byte rate, exact
    * long division) — the decode → feature-extract shape. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"),
        AudioHeaders.parse(col("payload")).as("a"))
      .select(col("media_id"), col("a.channels").as("channels"),
        col("a.sample_rate").as("sample_rate"),
        col("a.bits_per_sample").as("bits_per_sample"),
        col("a.data_len").as("data_len"), col("payload"))
      .as[ParsedAudioRow]
      .mapPartitions(rows => rows.flatMap { r =>
        r.channels match {
          case Some(ch) =>
            for (rate <- r.sample_rate; bits <- r.bits_per_sample;
                 len <- r.data_len) yield (r.media_id, ch, rate, bits, len)
          case None =>
            AudioHeaders.wavInfo(r.payload).map { case (ch, rate, bits, len) =>
              (r.media_id, ch, rate, bits, len)
            }
        }
      })
      .toDF("media_id", "channels", "sample_rate", "bits_per_sample",
        "data_len")
      .withColumn("duration_ms",
        expr("data_len * 8000 div (sample_rate * channels * bits_per_sample)"))
  }

  /** Video counterpart — same two-tier decode, on MP4/ISO-BMFF bytes:
    * [[VideoHeaders.parse]] (codegen'd fixed-offset expressions)
    * resolves canonical `ftyp`+`moov`-first payloads in the scan
    * projection; rows it declined (a `free` box before `moov`, v1
    * headers) run the [[VideoHeaders.mp4Info]] box walk inside the
    * partition-wise typed stage. One scan, no shuffle; unparseable
    * payloads are dropped, not errors. `duration_ms` is derived from
    * the PARSED movie-header fields by exact long division. */
  def videoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"),
        VideoHeaders.parse(col("payload")).as("v"))
      .select(col("media_id"), col("v.timescale").as("timescale"),
        col("v.duration").cast("long").as("duration"),
        col("v.track_count").as("track_count"),
        col("v.mdat_len").as("mdat_len"), col("payload"))
      .as[ParsedVideoRow]
      .mapPartitions(rows => rows.flatMap { r =>
        r.timescale match {
          case Some(ts) =>
            for (dur <- r.duration; tc <- r.track_count; len <- r.mdat_len)
              yield (r.media_id, ts, dur, tc, len)
          case None =>
            VideoHeaders.mp4Info(r.payload).map { case (ts, dur, tc, len) =>
              (r.media_id, ts, dur, tc, len)
            }
        }
      })
      .toDF("media_id", "timescale", "duration", "track_count", "mdat_len")
      .withColumn("duration_ms", expr("duration * 1000 div timescale"))
  }
}
