package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL video-container header codec for MP4 / ISO-BMFF (ISO 14496-12),
  * completing the modality family ([[ImageHeaders]] images,
  * [[AudioHeaders]] audio): no external libraries, and for the
  * canonical layout no UDFs — a minimal `ftyp`+`moov(mvhd,trak*)`+`mdat`
  * file has every header field at a computable offset, so encoder and
  * fast-path parser are compositions of built-in binary functions that
  * stay inside whole-stage codegen.
  *
  * ISO-BMFF is a box sequence `(size u32 BE, fourcc, body)` — the
  * big-endian sibling of the RIFF chunk walk — where size INCLUDES the
  * 8-byte box header, size 0 means "to end of file", and size 1 means a
  * 64-bit size follows. Canonical minimal layout (1-based offsets):
  *  - 1  `ftyp` (20 B): major brand `isom`, minor version, brand `mp41`
  *  - 21 `moov` (116 + 100·tracks B):
  *    - 29 `mvhd` v0 (108 B): creation/modification u32, timescale u32
  *      @49, duration u32 @53, rate, volume, matrix, next_track_id
  *    - then one 100-B `trak` (`tkhd` v0) per track
  *  - `mdat`: the media payload.
  *
  * Real files are NOT canonical: a `free`/`skip` box can sit between
  * `ftyp` and `moov` (padding left by editors), `moov` can trail
  * `mdat`, and v1 headers use 64-bit times. That is exactly the
  * JPEG/RIFF problem shape, and it gets the same two-tier answer:
  * [[mp4Info]] is a box-walk parser in plain Scala, run partition-wise
  * ([[Multimodal.videoFeatures]]) only for payloads the fixed-offset
  * expression declined — fast path in codegen, walk for the long tail,
  * with the same corrupt-size guard as [[AudioHeaders.wavInfo]].
  */
object VideoHeaders {

  private val FtypB = "ftyp".getBytes("US-ASCII")
  private val MoovB = "moov".getBytes("US-ASCII")
  private val MvhdB = "mvhd".getBytes("US-ASCII")
  private val TrakB = "trak".getBytes("US-ASCII")
  private val TkhdB = "tkhd".getBytes("US-ASCII")
  private val MdatB = "mdat".getBytes("US-ASCII")
  private val FreeB = "free".getBytes("US-ASCII")

  /** The unity transform matrix every minimal writer emits: fixed-point
    * 16.16 identity with the 2.30 w term (ISO 14496-12 §6.2.2). */
  private val Matrix: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(36)
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    b.array()
  }

  private def be4(c: Column): Column = ImageHeaders.be(c.cast("long"), 4)
  private def zeros(n: Int): Column = lit(Array.fill[Byte](n)(0))

  // ---- encoder --------------------------------------------------------

  /** Minimal `tkhd` v0 track box (100 B): flags = 7 (enabled, in movie,
    * in preview), track duration mirrors the movie duration, zero
    * width/height (non-visual minimal track, the shape audio/metadata
    * tracks ship). Fixed 100-byte size is what lets the fast-path
    * parser recover the track COUNT from the `moov` size by arithmetic
    * alone. */
  private def trak(id: Int, duration: Column): Column = concat(
    be4(lit(100)), lit(TrakB),
    be4(lit(92)), lit(TkhdB),
    lit(Array[Byte](0, 0, 0, 7)), // version 0, flags enabled|in-movie|in-preview
    zeros(8), // creation + modification
    be4(lit(id)), zeros(4),
    be4(duration), zeros(8),
    zeros(2), zeros(2), // layer, alternate_group
    zeros(2), zeros(2), // volume, reserved
    lit(Matrix),
    zeros(8)) // width, height (16.16)

  /** Full minimal MP4: `ftyp` [+ `free`] + `moov(mvhd, trak×n)` +
    * `mdat(body)`. `withFree = true` inserts a 12-byte `free` box
    * between `ftyp` and `moov` — the editor-padding layout the
    * fixed-offset parser must decline and the box walk must handle.
    * The `moov` size is DERIVED (116 + 100·n), not taken, so a
    * round-trip also pins the size math; tracks are capped at 3 (the
    * planted corpus range — a general writer would fold over a track
    * array). */
  def mp4Payload(timescale: Column, duration: Column, nTracks: Column,
      body: Column, withFree: Boolean = false): Column = {
    val mvhd = concat(
      be4(lit(108)), lit(MvhdB),
      zeros(4), // version 0 + flags
      zeros(8), // creation + modification
      be4(timescale), be4(duration),
      be4(lit(0x00010000)), // rate 1.0
      lit(Array[Byte](1, 0)), zeros(2), // volume 1.0, reserved
      zeros(8), // reserved
      lit(Matrix),
      zeros(24), // pre_defined
      be4(nTracks + lit(1))) // next_track_id
    val traks = when(nTracks === 1, trak(1, duration))
      .when(nTracks === 2, concat(trak(1, duration), trak(2, duration)))
      .otherwise(concat(trak(1, duration), trak(2, duration),
        trak(3, duration)))
    val moov = concat(be4(lit(116) + nTracks * lit(100)), lit(MoovB),
      mvhd, traks)
    val ftyp = concat(be4(lit(20)), lit(FtypB),
      lit("isom".getBytes("US-ASCII")), be4(lit(0x200)),
      lit("mp41".getBytes("US-ASCII")))
    val free =
      if (!withFree) lit(Array.emptyByteArray)
      else concat(be4(lit(12)), lit(FreeB), lit("pad!".getBytes("US-ASCII")))
    val mdat = concat(be4(length(body).cast("long") + 8), lit(MdatB), body)
    concat(ftyp, free, moov, mdat)
  }

  // ---- parsers --------------------------------------------------------

  /** Fixed-offset parse of the CANONICAL layout, fully codegen'd:
    * `struct(timescale, duration, track_count, mdat_len)`, all null
    * unless `ftyp`(20 B) sits first, `moov` second, and its first child
    * is a v0 `mvhd` — a `free` box or a v1 header fails the guard and
    * falls through to [[mp4Info]] partition-wise. The track count and
    * `mdat` length come from box-size ARITHMETIC (the fixed trak width
    * and the file tail), so no variable-offset substring is needed. */
  def parse(payload: Column): Column = {
    val moovSize = ImageHeaders.beInt(payload, 21, 4)
    val isCanonical = substring(payload, 5, 4) === lit(FtypB) &&
      ImageHeaders.beInt(payload, 1, 4) === 20 &&
      substring(payload, 25, 4) === lit(MoovB) &&
      substring(payload, 33, 4) === lit(MvhdB) &&
      ImageHeaders.beInt(payload, 29, 4) === 108 &&
      substring(payload, 37, 1) === lit(Array[Byte](0))
    def f(c: Column): Column = when(isCanonical, c)
    struct(
      f(ImageHeaders.beInt(payload, 49, 4)).as("timescale"),
      f(ImageHeaders.beInt(payload, 53, 4)).as("duration"),
      f(((moovSize - lit(116)) / lit(100)).cast("int")).as("track_count"),
      f((length(payload) - lit(20) - moovSize - lit(8)).cast("long"))
        .as("mdat_len"))
  }

  /** ISO-BMFF box walk for non-canonical layouts: iterate top-level
    * boxes, descend into `moov` for `mvhd` (v0 AND v1 time widths) and
    * `trak` counting, take `mdat`'s payload length. Plain Scala over
    * the bytes, used inside `mapPartitions` (the
    * [[AudioHeaders.wavInfo]] slot). Corrupt-size guard: a box claiming
    * size < 8 (other than the spec's 0 = to-EOF) or more bytes than
    * remain is unparseable — reject rather than walk backward or spin
    * (64-bit sizes, size == 1, are declined the same way: nothing this
    * codec writes emits them). Returns
    * (timescale, duration, trackCount, mdatLen). */
  def mp4Info(payload: Array[Byte]): Option[(Int, Long, Int, Long)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def fourcc(i: Int, cc: Array[Byte]): Boolean =
      payload(i) == cc(0) && payload(i + 1) == cc(1) &&
        payload(i + 2) == cc(2) && payload(i + 3) == cc(3)
    if (payload.length < 8 || !fourcc(4, FtypB)) return None
    var ts = -1; var dur = -1L; var tracks = 0; var mdat = -1L
    var i = 0
    while (i + 8 <= payload.length) {
      val size0 = u32(i)
      val size = if (size0 == 0L) (payload.length - i).toLong else size0
      if (size < 8 || size > payload.length - i) return None
      if (fourcc(i + 4, MoovB)) {
        var c = i + 8
        val end = i + size.toInt
        while (c + 8 <= end) {
          val cs = u32(c)
          if (cs < 8 || cs > end - c) return None
          if (fourcc(c + 4, MvhdB)) {
            if (u8(c + 8) == 1) { // v1: 64-bit creation/modification/duration
              if (c + 40 > end) return None
              ts = u32(c + 28).toInt; dur = u64(c + 32)
            } else {
              if (c + 28 > end) return None
              ts = u32(c + 20).toInt; dur = u32(c + 24)
            }
          } else if (fourcc(c + 4, TrakB)) tracks += 1
          c += cs.toInt
        }
      } else if (fourcc(i + 4, MdatB)) mdat = size - 8
      i += size.toInt
    }
    if (ts > 0 && tracks > 0 && mdat >= 0) Some((ts, dur, tracks, mdat))
    else None
  }
}
