package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def media = Multimodal.mediaTable(Tables.table(spark, sf, "documents"))

  test("media schema: opaque binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    val meta = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height"))
    // payload bytes round-trip to the source text
    val r = media.filter(col("media_id") === 0).select(col("payload")).head()
    val text = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == text)
  }

  test("headerFeatures routes formats to the right parser and drops junk") {
    import spark.implicits._
    // one of each: fixed-offset path (png), marker-scan path (jpeg),
    // synthesized headers from both encoders, and an unparseable payload
    val mixed = Seq(
      (1L, realPng),
      (2L, realJpeg),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .union(Seq((4L, 800, 600)).toDF("id", "w", "h")
        .select(col("id"),
          ImageHeaders.jpegHeader(col("w"), col("h")).as("payload")))
      .union(Seq((5L, 320, 200)).toDF("id", "w", "h")
        .select(col("id"),
          ImageHeaders.gifHeader(col("w"), col("h")).as("payload")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.headerFeatures(df).orderBy("media_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
        .toSeq
    val got = run(mixed)
    assert(got == Seq(
      (1L, "png", 1, 1),
      (2L, "jpeg", 640, 480),
      (4L, "jpeg", 800, 600),
      (5L, "gif", 320, 200))) // id 3 dropped: no container parses it
    // repartitioning must not change per-row results (batch independence)
    assert(run(mixed.repartition(7)) == got)
  }

  test("frameSample covers every payload with ceil(len/64) frames") {
    val n = media.count()
    val allFrames = Multimodal.frameSample(media, frameBytes = 64, every = 1)
    val perDoc = allFrames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("payload_len")), "media_id")
      .withColumn("expected", ceil(col("payload_len") / 64.0))
      .filter(col("count") =!= col("expected"))
    assert(perDoc.count() == 0)
    assert(allFrames.select("media_id").distinct().count() == n)
  }

  test("resizeMeta preserves aspect ratio within a bounding box") {
    val out = Multimodal.resizeMeta(media, 320, 180)
      .select(col("meta.width"), col("meta.height")).collect()
    assert(out.forall(r => r.getInt(0) <= 320 && r.getInt(1) <= 180))
    assert(out.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }

  /** A REAL, complete 1×1 RGBA PNG (valid signature, IHDR, zlib IDAT,
    * IEND — decodes in any viewer), byte-for-byte. */
  private val realPng: Array[Byte] = Array(
    -119, 80, 78, 71, 13, 10, 26, 10, 0, 0, 0, 13, 73, 72, 68, 82,
    0, 0, 0, 1, 0, 0, 0, 1, 8, 6, 0, 0, 0, 31, 21, -60, -119, 0, 0, 0,
    11, 73, 68, 65, 84, 120, -100, 99, 96, 0, 2, 0, 0, 5, 0, 1, 122,
    94, -85, 63, 0, 0, 0, 0, 73, 69, 78, 68, -82, 66, 96, -126)
    .map(_.toByte)

  /** Minimal JFIF: SOI, APP0 (16-byte JFIF segment), SOF0 declaring
    * 640×480, EOI — the variable-offset shape the marker scan exists
    * for. */
  private val realJpeg: Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    val app0 = Array(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    // SOF0 len 17: precision 8, height 480 (0x01E0), width 640 (0x0280),
    // 3 components
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02,
      0x80, 0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val eoi = Array(0xff, 0xd9)
    (soi ++ app0 ++ sof0 ++ eoi).map(i => i.asInstanceOf[Int].toByte)
  }

  test("ImageHeaders.parse reads a real PNG's dimensions from its bytes") {
    import spark.implicits._
    val df = Seq((1L, realPng)).toDF("media_id", "payload")
      .select(col("media_id"), ImageHeaders.parse(col("payload")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.width"), col("m.height"))
    val r = df.head()
    assert((r.getString(1), r.getInt(2), r.getInt(3)) == (("png", 1, 1)))
  }

  test("ImageHeaders encode→parse round-trips GIF and BMP at spec offsets") {
    import spark.implicits._
    val dims = Seq((1L, 640, 480), (2L, 65535, 1), (3L, 1, 65535))
    val gif = dims.toDF("id", "w", "h")
      .select(col("id"),
        ImageHeaders.parse(ImageHeaders.gifHeader(col("w"), col("h"))).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
    assert(gif.toSeq == dims.map { case (_, w, h) => ("gif", w, h) })
    val bmp = dims.toDF("id", "w", "h")
      .select(col("id"),
        ImageHeaders.parse(ImageHeaders.bmpHeader(col("w"), col("h"))).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
    assert(bmp.toSeq == dims.map { case (_, w, h) => ("bmp", w, h) })
  }

  test("parse returns null format for unknown payloads, not an error") {
    import spark.implicits._
    val r = Seq((1L, "not an image".getBytes)).toDF("media_id", "payload")
      .select(ImageHeaders.parse(col("payload")).as("m"))
      .select(col("m.format"), col("m.width")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("jpegDimensions scans past APP segments to SOF0; jpegDims stage drops non-JPEG") {
    assert(ImageHeaders.jpegDimensions(realJpeg) == Some((640, 480)))
    assert(ImageHeaders.jpegDimensions(realPng).isEmpty)
    assert(ImageHeaders.jpegDimensions(Array[Byte](1, 2, 3)).isEmpty)
    import spark.implicits._
    val media = Seq((1L, realJpeg), (2L, realPng))
      .toDF("media_id", "payload")
      .withColumn("meta", struct(lit("jpeg").as("format")))
    val out = Multimodal.jpegDims(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 640, 480)))
  }

  test("WAV: canonical headers parse fixed-offset; fact-chunk layouts " +
      "decline to the chunk walker; both round-trip the encoder") {
    import spark.implicits._
    val shapes = Seq((1L, 1, 8000, 8, 123L), (2L, 2, 44100, 16, 4000L))
    def headers(withFact: Boolean) = shapes
      .toDF("id", "ch", "rate", "bits", "len")
      .select(col("id"), AudioHeaders.wavHeader(col("ch"), col("rate"),
        col("bits"), col("len"), withFact).as("payload"))
    // canonical: fixed-offset parse resolves every field
    val fixed = headers(withFact = false)
      .select(col("id"), AudioHeaders.parse(col("payload")).as("a"))
      .select(col("id"), col("a.channels"), col("a.sample_rate"),
        col("a.bits_per_sample"), col("a.data_len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSeq
    assert(fixed == shapes.map(s => (s._1, s._2, s._3, s._4, s._5)))
    // fact chunk: fixed-offset parse must return nulls (data not at 37)
    val declined = headers(withFact = true)
      .select(AudioHeaders.parse(col("payload")).as("a"))
      .select(col("a.channels")).collect()
    assert(declined.forall(_.isNullAt(0)))
    // ...and the typed-stage decode resolves BOTH layouts identically
    val both = headers(withFact = false).union(
      headers(withFact = true).withColumn("id", col("id") + 10))
    val out = Multimodal.audioFeatures(
      both.withColumnRenamed("id", "media_id"))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, 1, 8000, 8, 123L, 123L * 8000 / (8000 * 1 * 8)),
      (2L, 2, 44100, 16, 4000L, 4000L * 8000 / (44100 * 2 * 16)),
      (11L, 1, 8000, 8, 123L, 123L * 8000 / (8000 * 1 * 8)),
      (12L, 2, 44100, 16, 4000L, 4000L * 8000 / (44100 * 2 * 16))))
  }

  test("wavInfo walks LIST chunks with odd sizes (RIFF pad byte) and " +
      "rejects truncated or non-RIFF payloads") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // fmt, then a LIST chunk with ODD body size 7 (padded to 8), then data
    val fmt = cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(22050) ++
      le32(22050 * 2 * 2) ++ le16(4) ++ le16(16)
    val list = cc("LIST") ++ le32(7) ++ cc("INFOxyz") ++ Array[Byte](0)
    val data = cc("data") ++ le32(999)
    val body = fmt ++ list ++ data
    val wav = cc("RIFF") ++ le32(4L + body.length) ++ cc("WAVE") ++ body
    assert(AudioHeaders.wavInfo(wav) == Some((2, 22050, 16, 999L)))
    // without the pad byte the walk lands mid-chunk and must not parse
    val unpadded = cc("RIFF") ++
      le32(4L + body.length - 1) ++ cc("WAVE") ++
      fmt ++ cc("LIST") ++ le32(7) ++ cc("INFOxyz") ++ data
    assert(AudioHeaders.wavInfo(unpadded).isEmpty)
    assert(AudioHeaders.wavInfo(cc("RIFF") ++ le32(0)).isEmpty)
    assert(AudioHeaders.wavInfo("not audio".getBytes).isEmpty)
    // corrupt chunk size near u32 max wraps negative through toInt —
    // must reject, not walk the cursor backward forever
    val evil = cc("RIFF") ++ le32(100) ++ cc("WAVE") ++
      cc("JUNK") ++ le32(0xfffffff0L) ++ fmt ++ data
    assert(AudioHeaders.wavInfo(evil).isEmpty)
  }

  test("MP4: canonical layouts parse fixed-offset; free-box layouts " +
      "are declined there and resolved by the box walk") {
    import spark.implicits._
    val media = Seq((1L, 600, 3000L, 2, "hello mp4"),
        (2L, 90000, 450000L, 3, "second"))
      .toDF("media_id", "ts", "dur", "n", "body")
    def payload(withFree: Boolean) = media.select(col("media_id"),
      VideoHeaders.mp4Payload(col("ts"), col("dur"), col("n"),
        col("body").cast("binary"), withFree).as("payload"))
    // canonical: the codegen'd fixed-offset parser resolves everything
    val fixed = payload(withFree = false)
      .select(col("media_id"), VideoHeaders.parse(col("payload")).as("v"))
      .select("media_id", "v.timescale", "v.duration", "v.track_count",
        "v.mdat_len")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(fixed == Set((1L, 600, 3000, 2, 9L), (2L, 90000, 450000, 3, 6L)))
    // free box: fixed-offset declines (all-null struct)…
    val declined = payload(withFree = true)
      .select(VideoHeaders.parse(col("payload")).as("v"))
      .collect()
    assert(declined.forall(_.getStruct(0).isNullAt(0)))
    // …and the two-tier videoFeatures resolves BOTH layouts identically
    val viaWalk = Multimodal.videoFeatures(payload(withFree = true))
    val viaFixed = Multimodal.videoFeatures(payload(withFree = false))
    assert(viaWalk.orderBy("media_id").collect().toSeq ==
      viaFixed.orderBy("media_id").collect().toSeq)
    // v1 mvhd (64-bit times): only the walk understands it
    def be4(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be8(v: Long): Array[Byte] = be4(v >> 32) ++ be4(v & 0xffffffffL)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val mvhdV1 = be4(120) ++ cc("mvhd") ++ Array[Byte](1, 0, 0, 0) ++
      be8(0) ++ be8(0) ++ be4(1000) ++ be8(77000L) ++
      Array.fill[Byte](80)(0)
    val trakMin = be4(16) ++ cc("trak") ++ be4(8) ++ cc("tkhd")
    val moov = be4(8L + mvhdV1.length + trakMin.length) ++ cc("moov") ++
      mvhdV1 ++ trakMin
    val ftyp = be4(20) ++ cc("ftyp") ++ cc("isom") ++ be4(0x200) ++ cc("mp41")
    val mdat = be4(8 + 4) ++ cc("mdat") ++ cc("abcd")
    assert(VideoHeaders.mp4Info(ftyp ++ moov ++ mdat)
      == Some((1000, 77000L, 1, 4L)))
    // corrupt-size guard: a box size that would walk backward or past
    // the end must reject, not spin
    val evilBox = be4(3) ++ cc("junk")
    assert(VideoHeaders.mp4Info(ftyp ++ evilBox ++ moov ++ mdat).isEmpty)
    val overrun = be4(0xfffffff0L) ++ cc("junk")
    assert(VideoHeaders.mp4Info(ftyp ++ overrun ++ moov ++ mdat).isEmpty)
    assert(VideoHeaders.mp4Info("not a movie".getBytes).isEmpty)
  }
}
