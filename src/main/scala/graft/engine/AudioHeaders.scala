package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL audio-container header codec for RIFF/WAVE (the audio leg of
  * the multimodal family, completing [[ImageHeaders]]): no external
  * libraries, and for the canonical layout no UDFs either — a 44-byte
  * PCM WAV header has every field at a fixed offset, so the encoder and
  * the parser are compositions of built-in binary functions that stay
  * inside whole-stage codegen.
  *
  * Canonical PCM layout (RIFF spec / MS WAVE format, all sizes
  * little-endian, 1-based byte offsets):
  *  - 1  "RIFF", 5 riff size u32 = 36 + dataLen, 9 "WAVE"
  *  - 13 "fmt ", 17 fmt size u32 = 16, 21 audio format u16 = 1 (PCM)
  *  - 23 channels u16, 25 sample rate u32, 29 byte rate u32
  *    (= rate·channels·bits/8), 33 block align u16 (= channels·bits/8),
  *    35 bits per sample u16
  *  - 37 "data", 41 data size u32, then the samples.
  *
  * Real files are NOT always canonical: a `fact` chunk (required for
  * non-PCM, common anyway) or a `LIST`/INFO chunk can sit between
  * `fmt ` and `data`, moving the data chunk to a variable offset. That
  * is JPEG's problem shape ([[ImageHeaders.jpegDimensions]]), and it
  * gets the same answer: [[wavInfo]] is a chunk-walk parser in plain
  * Scala, run partition-wise ([[Multimodal.audioFeatures]]) only for
  * payloads the fixed-offset expression declined — fast path in
  * codegen, scan path for the long tail.
  */
object AudioHeaders {

  private val Riff = "RIFF".getBytes("US-ASCII")
  private val Wave = "WAVE".getBytes("US-ASCII")
  private val Fmt = "fmt ".getBytes("US-ASCII")
  private val Data = "data".getBytes("US-ASCII")

  /** `n`-byte little-endian binary encoding of a non-negative integral
    * column (cast to long first: `hex` needs an integral input, and the
    * field arithmetic below passes through `Column./` which is double
    * division — exact here because every field is far below 2^53). */
  private def le(c: Column, n: Int): Column =
    ImageHeaders.swap(ImageHeaders.be(c.cast("long"), n), n)

  /** Little-endian unsigned long from `n` bytes at 1-based `pos` —
    * u32 fields (riff/data size) exceed Int for >2 GiB payloads. */
  private def leLong(payload: Column, pos: Int, n: Int): Column =
    conv(hex(ImageHeaders.swap(substring(payload, pos, n), n)), 16, 10)
      .cast("long")

  // ---- encoder --------------------------------------------------------

  /** PCM WAV header for the given shape; `withFact = true` inserts a
    * `fact` chunk (sample-count field, here dataLen/blockAlign) between
    * `fmt ` and `data` — the layout the fixed-offset parser must
    * decline and the chunk walker must handle. Derived fields
    * (byte rate, block align, riff size) are computed, not taken, so a
    * round-trip check also pins the derivation math. */
  def wavHeader(channels: Column, rate: Column, bits: Column,
      dataLen: Column, withFact: Boolean = false): Column = {
    val blockAlign = channels * bits / lit(8)
    val byteRate = rate * blockAlign
    val factLen = if (withFact) 12 else 0
    val fact =
      if (!withFact) lit(Array.emptyByteArray)
      else concat(lit("fact".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0)),
        le(dataLen / blockAlign, 4))
    concat(
      lit(Riff), le(dataLen + lit(36L + factLen), 4), lit(Wave),
      lit(Fmt ++ Array[Byte](16, 0, 0, 0, 1, 0)),
      le(channels, 2), le(rate, 4), le(byteRate, 4),
      le(blockAlign, 2), le(bits, 2),
      fact,
      lit(Data), le(dataLen, 4))
  }

  // ---- parsers --------------------------------------------------------

  /** Fixed-offset parse of the CANONICAL layout, fully codegen'd:
    * `struct(channels, sample_rate, bits_per_sample, data_len)`, all
    * null unless the RIFF/WAVE/fmt magics match AND `data` sits at its
    * canonical offset 37 — a fact/LIST chunk fails that last guard and
    * falls through to [[wavInfo]] in the partition-wise stage. */
  def parse(payload: Column): Column = {
    val isCanonical = substring(payload, 1, 4) === lit(Riff) &&
      substring(payload, 9, 4) === lit(Wave) &&
      substring(payload, 13, 4) === lit(Fmt) &&
      substring(payload, 37, 4) === lit(Data)
    def f(c: Column): Column = when(isCanonical, c)
    struct(
      f(ImageHeaders.leInt(payload, 23, 2)).as("channels"),
      f(ImageHeaders.leInt(payload, 25, 4)).as("sample_rate"),
      f(ImageHeaders.leInt(payload, 35, 2)).as("bits_per_sample"),
      f(leLong(payload, 41, 4)).as("data_len"))
  }

  /** RIFF chunk walk for non-canonical layouts: verify RIFF/WAVE, then
    * iterate `(fourcc, size u32 LE, body)` chunks — chunk bodies are
    * padded to even length per the RIFF spec — collecting the fmt
    * fields and stopping at `data`. Plain Scala over the payload bytes,
    * used inside `mapPartitions` (the [[ImageHeaders.jpegDimensions]]
    * slot). Returns (channels, sampleRate, bitsPerSample, dataLen). */
  def wavInfo(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      u16(i).toLong | (u16(i + 2).toLong << 16)
    def fourcc(i: Int, cc: Array[Byte]): Boolean =
      payload(i) == cc(0) && payload(i + 1) == cc(1) &&
        payload(i + 2) == cc(2) && payload(i + 3) == cc(3)
    if (payload.length < 12 || !fourcc(0, Riff) || !fourcc(8, Wave))
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    while (i + 8 <= payload.length) {
      val size = u32(i + 4)
      if (fourcc(i, Fmt)) {
        if (i + 24 > payload.length) return None
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      } else if (fourcc(i, Data)) {
        return fmt.map { case (ch, rate, bits) => (ch, rate, bits, size) }
      }
      // a corrupt size whose Int cast wraps negative would walk the
      // cursor BACKWARD and spin forever; any non-data chunk claiming
      // more bytes than remain is equally unparseable — reject both
      if (size > payload.length - i - 8) return None
      i += 8 + size.toInt + (size.toInt & 1) // odd bodies pad one byte
    }
    None
  }
}
