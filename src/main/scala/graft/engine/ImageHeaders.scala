package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL image-container header codecs — no external libraries, and for
  * the fixed-layout formats no UDFs either: PNG/GIF/BMP dimensions live
  * at fixed offsets, so both the encoder and the parser are compositions
  * of built-in binary functions (`substring` on binary, `hex`/`unhex`,
  * `conv`, `concat`) that stay inside whole-stage codegen. This replaces
  * the "metadata arrives from elsewhere" assumption in the multimodal
  * family with the production reality: width/height are read FROM the
  * payload bytes.
  *
  * Layouts implemented (documented against the public format specs):
  *  - PNG  (ISO/IEC 15948 §5.3/§11.2.2): 8-byte signature, then the
  *    IHDR chunk: 4-byte length, "IHDR", width int32 BE at byte 17
  *    (1-based), height int32 BE at 21.
  *  - GIF  (GIF89a spec §17-18): "GIF89a", then the logical screen
  *    descriptor: width uint16 LE at byte 7, height uint16 LE at 9.
  *  - BMP  (BITMAPINFOHEADER): "BM", 12 bytes of file header, DIB
  *    header size at 15; width int32 LE at byte 19, height int32 LE
  *    at 23.
  *
  * JPEG's dimensions sit in a SOF marker segment at a VARIABLE offset
  * (after arbitrarily many APPn/COM segments), so it cannot be a fixed
  * -offset expression — [[jpegDimensions]] is the marker-scan parser,
  * run in the partition-wise typed stage of
  * [[Multimodal.headerFeatures]] (the mapInPandas-analogue slot where
  * scan-shaped codecs belong).
  */
object ImageHeaders {

  val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val IhdrPrefix: Array[Byte] =
    Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII")
  /** bit depth 8, color type 6 (RGBA), compression/filter 0, no
    * interlace, then a CRC placeholder (readers that verify CRCs do so
    * past the header — dimensions parse regardless). */
  private val IhdrTail: Array[Byte] =
    Array[Byte](8, 6, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0)
  val GifMagic: Array[Byte] = "GIF89a".getBytes("US-ASCII")
  val BmpMagic: Array[Byte] = "BM".getBytes("US-ASCII")

  /** `n`-byte big-endian binary encoding of a non-negative int column. */
  private[engine] def be(c: Column, n: Int): Column =
    unhex(lpad(hex(c), n * 2, "0"))

  /** Reverse the bytes of a fixed-width binary column (BE ↔ LE). */
  private[engine] def swap(bin: Column, n: Int): Column =
    concat((n to 1 by -1).map(i => substring(bin, i, 1)): _*)

  /** Big-endian int from `n` bytes at 1-based `pos` of a binary column. */
  private[engine] def beInt(payload: Column, pos: Int, n: Int): Column =
    conv(hex(substring(payload, pos, n)), 16, 10).cast("int")

  private[engine] def leInt(payload: Column, pos: Int, n: Int): Column =
    conv(hex(swap(substring(payload, pos, n), n)), 16, 10).cast("int")

  // ---- encoders (header construction from metadata) -------------------

  def pngHeader(w: Column, h: Column): Column =
    concat(lit(PngMagic ++ IhdrPrefix), be(w, 4), be(h, 4), lit(IhdrTail))

  def gifHeader(w: Column, h: Column): Column =
    concat(lit(GifMagic), swap(be(w, 2), 2), swap(be(h, 2), 2))

  def bmpHeader(w: Column, h: Column): Column = {
    // file size/reserved/data offset (12 bytes, zeros are legal here
    // for a header-only fixture) + DIB header size 40 LE
    val fileHeaderPad = Array.fill[Byte](12)(0) ++ Array[Byte](40, 0, 0, 0)
    concat(lit(BmpMagic ++ fileHeaderPad), swap(be(w, 4), 4), swap(be(h, 4), 4))
  }

  /** Minimal valid JPEG frame header: SOI, then a baseline SOF0 segment
    * (ISO/IEC 10918 B.2.2) — marker FFC0, length 17 (8+3·3), precision
    * 8, height u16 BE at segment offset 3, width at 5, then 3 components
    * (id, 1×1 sampling, quant-table id). Dimensions land exactly where
    * [[jpegDimensions]]'s marker scan reads them, so the encoder and
    * the scan parser round-trip through real bytes. */
  def jpegHeader(w: Column, h: Column): Column = {
    val soiSof0 = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08)
      .map(_.toByte)
    val components = Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    concat(lit(soiSof0), be(h, 2), be(w, 2), lit(components))
  }

  // ---- parser ---------------------------------------------------------

  /** Sniff format by magic bytes and read dimensions from the container
    * header: `struct(format, width, height)`, format null when no magic
    * matches (unknown payloads pass through typed, not as errors). */
  def parse(payload: Column): Column = {
    val isPng = substring(payload, 1, 8) === lit(PngMagic)
    val isGif = substring(payload, 1, 6) === lit(GifMagic)
    val isBmp = substring(payload, 1, 2) === lit(BmpMagic)
    struct(
      when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
        .otherwise(lit(null).cast("string")).as("format"),
      when(isPng, beInt(payload, 17, 4))
        .when(isGif, leInt(payload, 7, 2))
        .when(isBmp, leInt(payload, 19, 4))
        .otherwise(lit(null).cast("int")).as("width"),
      when(isPng, beInt(payload, 21, 4))
        .when(isGif, leInt(payload, 9, 2))
        .when(isBmp, leInt(payload, 23, 4))
        .otherwise(lit(null).cast("int")).as("height"))
  }

  /** JPEG (ISO/IEC 10918 / JFIF) marker scan: walk FF-marker segments
    * from SOI until a frame header (SOF0-SOF15, excluding DHT/DAC/RST),
    * where height is the uint16 BE at segment offset 3 and width at 5.
    * Plain Scala over the payload bytes — used inside mapPartitions
    * (one scan per row, zero allocation), the slot where variable-offset
    * codecs live. */
  def jpegDimensions(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (payload.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < payload.length) {
      if (u8(i) != 0xff) return None
      val marker = u8(i + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else {
        val len = u16(i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 9 >= payload.length) return None
          return Some((u16(i + 7), u16(i + 5))) // (width, height)
        }
        i += 2 + len
      }
    }
    None
  }
}
