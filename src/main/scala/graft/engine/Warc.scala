package graft.engine

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/1.0 container codec — the web-crawl leg of the container family
  * (images [[ImageHeaders]], RIFF/WAV [[AudioHeaders]], ISO-BMFF
  * [[VideoHeaders]]). WARC is the wire format of large-scale web-crawl
  * corpora (Common Crawl ships ~1 GB `.warc.gz` segments), so a
  * training-data engine's ingest front starts here: many opaque crawl
  * files in object storage → one record-level DataFrame.
  *
  * Grammar (ISO 28500): a file is a concatenation of records,
  * `version CRLF headers CRLF CRLF payload CRLF CRLF`, where
  * `Content-Length` governs the payload in BYTES. That last clause is
  * the whole parsing problem: payloads can (and in real crawls do)
  * contain `WARC/1.0` literally, so any split-on-magic parser is
  * wrong — the walk must honor Content-Length. The fixture plants
  * exactly that adversarial payload to keep the parser honest.
  *
  * Scale shape: one crawl file = one row of Spark's `binaryFile`
  * source; [[records]] walks each blob with a streaming iterator inside
  * `mapPartitions` (the [[Multimodal.jpegDims]] slot — imperative byte
  * scanning belongs partition-wise, next to the codec). No shuffle, no
  * driver involvement; 100 TB of crawl is just more files across more
  * tasks. Gzipped members decompress in the same pass (tier 2, like the
  * WAV chunk-walk fallback). The ENCODER is fixture/test machinery: a
  * real deployment reads crawls, it does not synthesize them — which is
  * why the per-file `collect_list` in [[crawlFiles]] is bounded by
  * design and documented as such.
  */
object Warc {

  private val Version = "WARC/1.0"
  private val CrLf = "\r\n"

  /** Payload planted inside some response bodies: a byte-exact fake
    * record head. Counted by Content-Length, so a correct parser reads
    * it as body bytes; a split-on-`WARC/1.0` parser invents records. */
  val AdversarialSuffix: String =
    CrLf + Version + CrLf + "WARC-Type: fake" + CrLf + CrLf

  // ---- encoder (fixture side; pure Column algebra, codegen'd) ---------

  /** One WARC record as a STRING column (ASCII headers + UTF-8 payload;
    * the file is cast to binary once, at write time). `targetUri` null
    * ⇒ header omitted (warcinfo records carry no URI). Content-Length
    * is the payload's UTF-8 BYTE length — char length diverges on the
    * zh documents, and the walk counts bytes. */
  def record(warcType: Column, targetUri: Column, recordId: Column,
      payload: Column): Column =
    concat(
      lit(Version + CrLf),
      lit("WARC-Type: "), warcType, lit(CrLf),
      when(targetUri.isNotNull,
        concat(lit("WARC-Target-URI: "), targetUri, lit(CrLf)))
        .otherwise(lit("")),
      lit("WARC-Record-ID: <urn:graft:"), recordId, lit(">" + CrLf),
      lit("Content-Length: "),
      length(payload.cast("binary")).cast("string"), lit(CrLf),
      lit(CrLf), payload, lit(CrLf + CrLf))

  /** Assemble the crawl: `nFiles` WARC files from `documents`, each a
    * `warcinfo` record followed by one `response` per document (ordered
    * by doc_id; file = doc_id mod nFiles). Every 11th document's body
    * carries [[AdversarialSuffix]]. Returns (file_id, warc binary).
    * The per-file `collect_list` is FIXTURE synthesis (bounded: a real
    * crawl file is bounded by construction and read, not built). */
  def crawlFiles(docs: DataFrame, nFiles: Int): DataFrame = {
    val body = concat(col("text"),
      when(col("doc_id") % 11 === 0, lit(AdversarialSuffix))
        .otherwise(lit("")))
    val resp = record(lit("response"),
      concat(lit("https://"), col("source"), lit(".example.org/p/"),
        col("doc_id")),
      concat(lit("doc-"), col("doc_id")), body)
    val info = record(lit("warcinfo"), lit(null).cast("string"),
      concat(lit("file-"), col("file_id")),
      concat(lit("isPartOf: graft-crawl-"), col("file_id")))
    docs.select(pmod(col("doc_id"), lit(nFiles)).as("file_id"),
        col("doc_id"), resp.as("rec"))
      .groupBy("file_id")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("rec"))))
        .as("recs"))
      .select(col("file_id"),
        concat(info,
          array_join(transform(col("recs"), r => r("rec")), ""))
          .cast("binary").as("warc"))
  }

  /** Write the crawl under `dir` as real files — `crawl-<k>.warc`
    * plain, `crawl-<k>.warc.gz` for even k (both extensions in one
    * listing, the mixed-generation shape a real bucket has). Executors
    * write; the driver only fires the job. Local-fs fixture staging,
    * same contract as the lake builders. */
  def stageCrawl(spark: SparkSession, docs: DataFrame, dir: String,
      nFiles: Int = 16): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(dir))
    val writeOne: Iterator[(Long, Array[Byte])] => Unit =
      _.foreach { case (id, bytes) =>
        val (name, out) =
          if (id % 2 == 0) (s"crawl-$id.warc.gz", gzip(bytes))
          else (s"crawl-$id.warc", bytes)
        java.nio.file.Files.write(java.nio.file.Path.of(dir, name), out)
        ()
      }
    crawlFiles(docs, nFiles).as[(Long, Array[Byte])]
      .foreachPartition(writeOne)
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    // GZIPInputStream reads THROUGH concatenated members (how real
    // .warc.gz segments are built: one member per record), so a
    // member-per-record file lands here as one contiguous byte run.
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  // ---- parser ----------------------------------------------------------

  /** One parsed record. `payload` stays bytes — type, charset, and
    * downstream decode are the caller's business (text docs, images,
    * anything: WARC is opaque-payload by design). */
  final case class Rec(file_id: Long, rec_idx: Int, warc_type: String,
      target_uri: Option[String], content_length: Long,
      payload: Array[Byte])

  /** Streaming record walk over one file's bytes. Gzip magic ⇒
    * decompress first (tier 2). Malformed framing (bad version line,
    * missing/invalid Content-Length, length past EOF) STOPS the walk —
    * the corrupt-size discipline of the RIFF/BMFF walks: emit what
    * parsed, never scan past a lying length. */
  def walk(fileId: Long, raw: Array[Byte]): Iterator[Rec] = {
    val b =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b)
        // corrupt/truncated gzip is the same class as corrupt framing:
        // stop cleanly (zero records), never kill the ingest task —
        // ZipException/EOFException both extend IOException
        try gunzip(raw) catch { case _: java.io.IOException => Array.emptyByteArray }
      else raw

    var i = 0
    var idx = 0
    var dead = false

    // Next CRLF-terminated line from `i`, or None at EOF/overrun.
    def line(): Option[String] = {
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= b.length) None
      else {
        val s = new String(b, i, j - i, UTF_8)
        i = j + 2
        Some(s)
      }
    }

    def nextRec(): Option[Rec] = {
      if (dead || i >= b.length) return None
      line() match {
        case Some(Version) =>
          var wtype: String = null
          var uri: Option[String] = None
          var clen = -1L
          var hdr = line()
          while (hdr.exists(_.nonEmpty)) {
            val h = hdr.get
            val c = h.indexOf(": ")
            if (c > 0) {
              val (k, v) = (h.substring(0, c), h.substring(c + 2))
              k match {
                case "WARC-Type" => wtype = v
                case "WARC-Target-URI" => uri = Some(v)
                case "Content-Length" =>
                  clen = try v.toLong catch { case _: Exception => -1L }
                case _ => ()
              }
            }
            hdr = line()
          }
          // overflow-safe length check: `i + clen + 4 > b.length` wraps
          // negative for a crafted Content-Length near Long.MaxValue
          // and would admit the record, then throw in the copy — the
          // subtraction form is exact for every clen ≥ 0 (the RHS may
          // go negative near EOF, which correctly rejects)
          if (hdr.isEmpty || wtype == null || clen < 0 ||
            clen > (b.length - i - 4).toLong) { dead = true; None }
          else if (!(b(i + clen.toInt) == '\r' && b(i + clen.toInt + 1) == '\n' &&
            b(i + clen.toInt + 2) == '\r' && b(i + clen.toInt + 3) == '\n')) {
            // The 4 bytes after the payload MUST be the CRLFCRLF record
            // terminator. A record whose Content-Length points anywhere
            // else is mis-framed; silently emitting it and desyncing
            // until the NEXT version-line check would blame the wrong
            // record — stop explicitly HERE and drop the lying record.
            dead = true; None
          } else {
            val payload = java.util.Arrays.copyOfRange(b, i, i + clen.toInt)
            i += clen.toInt + 4 // trailing CRLF CRLF (verified above)
            val r = Rec(fileId, idx, wtype, uri, clen, payload)
            idx += 1
            Some(r)
          }
        case _ => dead = true; None
      }
    }

    Iterator.continually(nextRec()).takeWhile(_.isDefined).map(_.get)
  }

  /** The crawl as a record-level DataFrame: `binaryFile` source over
    * `dir` (both `.warc` and `.warc.gz`), then the partition-wise walk.
    * Columns: file_id, rec_idx, warc_type, target_uri, content_length,
    * payload (binary). One scan, zero shuffles — everything after this
    * is ordinary relational work on records. */
  def records(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        walk(fileIdOf(path), bytes)
      })
      .toDF()
  }

  /** Streaming form of [[records]]: crawl segments LAND in `dir` over
    * time (the crawler's drop folder), the file stream paces one
    * segment per micro-batch, and each batch is walked with the same
    * partition-wise iterator — stateless, so the transform composes
    * with any exactly-once sink (q178 commits each batch to the
    * versioned lake under its batch tag). */
  def recordsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // binaryFile's schema is FIXED by the source, but the streaming
    // planner still requires it spelled out (no inference pass on
    // streams) — this is that fixed schema, verbatim.
    val binaryFileSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, " +
        "content BINARY")
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", "1")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        walk(fileIdOf(path), bytes)
      })
      .toDF()
  }

  /** Segment id from the file name: `crawl-<k>.warc[.gz]` parses its
    * number; any OTHER name (real crawls ship names like
    * `CC-MAIN-….warc.gz`) gets a deterministic md5-derived id instead
    * of failing the task — one foreign-named segment must not kill a
    * whole ingest job, and the id only needs to be stable and distinct
    * per file. */
  private[graft] def fileIdOf(path: String): Long = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val digits = name.stripPrefix("crawl-").takeWhile(_.isDigit)
    // ≤18 digits always fits a Long; a 19+-digit numeric name would
    // throw in toLong and kill the ingest task — exactly the
    // one-foreign-name failure the md5 fallback exists to prevent, so
    // oversized numbers fall through to the stable md5 id too
    if (name.startsWith("crawl-") && digits.nonEmpty && digits.length <= 18)
      digits.toLong
    else {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(name.getBytes(UTF_8))
      // 60 bits → always non-negative, never collides with the small
      // crawl-<k> range in practice
      (((dg(0) & 0x0fL) << 56) | ((dg(1) & 0xffL) << 48) |
        ((dg(2) & 0xffL) << 40) | ((dg(3) & 0xffL) << 32) |
        ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
        ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL))
    }
  }
}
