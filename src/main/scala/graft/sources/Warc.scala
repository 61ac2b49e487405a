package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET ingestion (ISO 28500; WARC 1.0/1.1) — the exchange format
  * a crawl-scale LLM pipeline reads BEFORE anything else runs: Common
  * Crawl ships raw captures as WARC and extracted text as WET, both as
  * CONCATENATED PER-RECORD GZIP MEMBERS (each record its own gzip
  * stream, members back to back), so a reader can in principle split a
  * file at member boundaries without decompressing what came before.
  *
  * Decompression is a hand-rolled member walk (RFC 1952 header →
  * raw-deflate Inflater → CRC32 + ISIZE trailer check), NOT
  * GZIPInputStream: the JDK stream silently swallows trailing garbage
  * after the last member and reports no member boundaries, while the
  * walk yields (a) STRICTNESS — any undecodable byte, bad CRC, wrong
  * ISIZE, or trailing garbage rejects the whole file (the WebDataset
  * corrupt-shard discipline: zero rows, never an exception, never a
  * silently-wrong row) — and (b) the compressed OFFSET of every member,
  * surfaced per record as `member_offset`, which is exactly the index a
  * splittable 100 TB reader distributes on (CC's own cdx indexes are
  * these offsets). In this repo files are the unit of parallelism (CC
  * ships ~1 GB files in the tens of thousands per crawl — ample for
  * 1000 executors, the WebDataset shard argument); the per-member walk
  * inside one file is sequential, as the format requires.
  *
  * Record grammar, STRICT (what the spec mandates and CC emits):
  * `WARC/1.0` or `WARC/1.1` version line, CRLF-terminated `Name: value`
  * header lines (names case-insensitive, lowercased on output; header
  * continuation lines are NOT accepted — CC never emits them), one
  * blank CRLF line, exactly `Content-Length` octets of block, then the
  * mandatory CRLF CRLF record separator. Anything else — a lone LF, a
  * colonless header line, a non-numeric length, a block running past
  * the buffer, garbage between records — rejects the file.
  */
object Warc {

  // ------------------------------------------------------------ gzip

  /** One deterministic gzip member (JDK GZIPOutputStream: MTIME=0,
    * XFL=0, OS=0 — byte-stable across runs, the writeShards rule). */
  private[graft] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(bytes); gz.finish(); gz.close()
    bo.toByteArray
  }

  /** Strict concatenated-member walk: Some(list of (compressed offset,
    * decompressed bytes)) covering the WHOLE buffer, or None on any
    * malformation — bad magic, reserved FLG bits, a member that does
    * not inflate, CRC32/ISIZE trailer mismatch, or trailing garbage.
    * A single flipped byte anywhere in a member's deflate stream or
    * trailer is caught by CRC32 (burst coverage ≥ 32 bits). */
  private[graft] def gzipMembers(
      bytes: Array[Byte]): Option[Seq[(Long, Array[Byte])]] = {
    val out = Seq.newBuilder[(Long, Array[Byte])]
    var o = 0
    while (o < bytes.length) {
      gzipMemberAt(bytes, o) match {
        case None => return None
        case Some((next, data)) => out += ((o.toLong, data)); o = next
      }
    }
    Some(out.result())
  }

  /** Parse ONE gzip member starting at `start`: Some((offset just past
    * the trailer, decompressed bytes)) or None on any malformation —
    * the single-member unit [[gzipMembers]] and the streaming
    * [[parseGzFile]] walk share. */
  private def gzipMemberAt(bytes: Array[Byte],
                           start: Int): Option[(Int, Array[Byte])] = {
    var o = start
    def u8(i: Int): Int = bytes(i) & 0xff
    if (o + 10 > bytes.length) return None
    if (u8(o) != 0x1f || u8(o + 1) != 0x8b || u8(o + 2) != 8) return None
    val flg = u8(o + 3)
    if ((flg & 0xe0) != 0) return None // reserved FLG bits must be zero
    o += 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + data
      if (o + 2 > bytes.length) return None
      val xlen = u8(o) | (u8(o + 1) << 8)
      o += 2 + xlen
      if (o > bytes.length) return None
    }
    def skipZeroTerminated(): Boolean = { // FNAME / FCOMMENT
      while (o < bytes.length && bytes(o) != 0) o += 1
      if (o >= bytes.length) false else { o += 1; true }
    }
    if ((flg & 8) != 0 && !skipZeroTerminated()) return None
    if ((flg & 16) != 0 && !skipZeroTerminated()) return None
    if ((flg & 2) != 0) { o += 2; if (o > bytes.length) return None } // FHCRC
    val inf = new java.util.zip.Inflater(true) // raw deflate
    try {
      inf.setInput(bytes, o, bytes.length - o)
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) bo.write(buf, 0, n)
        else if (inf.needsInput()) return None // truncated deflate stream
      }
      val data = bo.toByteArray
      o = o + (bytes.length - o - inf.getRemaining)
      if (o + 8 > bytes.length) return None // trailer: CRC32 + ISIZE
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
          ((u8(i + 3).toLong) << 24)
      if (le32(o) != crc.getValue) return None
      if (le32(o + 4) != (data.length.toLong & 0xffffffffL)) return None
      o += 8
      Some((o, data))
    } finally inf.end()
  }

  // --------------------------------------------------- record grammar

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize one record: version line, headers in given order,
    * Content-Length appended last, blank line, block, CRLF CRLF. */
  private[graft] def record(headers: Seq[(String, String)],
                            block: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def line(s: String): Unit = { bo.write(s.getBytes("UTF-8")); bo.write(Crlf) }
    line("WARC/1.0")
    headers.foreach { case (n, v) => line(s"$n: $v") }
    line(s"Content-Length: ${block.length}")
    bo.write(Crlf)
    bo.write(block)
    bo.write(Crlf); bo.write(Crlf)
    bo.toByteArray
  }

  /** Strict record-stream parse: Some(list of (start offset in `bytes`,
    * lowercased header map, block)) covering the whole buffer, or None
    * on any grammar violation (doc above). */
  private[graft] def parseRecords(
      bytes: Array[Byte]): Option[Seq[(Long, Map[String, String], Array[Byte])]] =
    parseRecordsPrefix(bytes) match {
      // the whole buffer must be a clean run of records — an incomplete
      // tail (consumed < length) is as fatal as a grammar error
      case Some((recs, consumed)) if consumed == bytes.length => Some(recs)
      case _ => None
    }

  /** Incremental form of [[parseRecords]]: parse complete records from
    * the FRONT of `bytes`, returning (records, bytes consumed). An
    * incomplete record at the tail is NOT an error here — the caller
    * ([[parseGzFile]]) appends the next gzip member and retries — but a
    * GRAMMAR violation (bad version line, malformed header, missing
    * Content-Length, bad record terminator) is still None: more bytes
    * can complete a record, never repair one. */
  private[graft] def parseRecordsPrefix(bytes: Array[Byte])
      : Option[(Seq[(Long, Map[String, String], Array[Byte])], Int)] = {
    val out = Seq.newBuilder[(Long, Map[String, String], Array[Byte])]
    var o = 0
    var consumed = 0
    // next CRLF at-or-after `from`, or -1; a lone LF/CR is NOT a break
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    while (o < bytes.length) {
      val start = o
      val ve = lineEnd(o)
      if (ve < 0) return Some((out.result(), consumed)) // incomplete tail
      val version = new String(bytes, o, ve - o, "UTF-8")
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      o = ve + 2
      var headers = Map.empty[String, String]
      var blank = false
      while (!blank) {
        val he = lineEnd(o)
        if (he < 0) return Some((out.result(), consumed)) // incomplete tail
        if (he == o) { blank = true; o += 2 }
        else {
          val line = new String(bytes, o, he - o, "UTF-8")
          val c = line.indexOf(':')
          if (c <= 0) return None
          val name = line.substring(0, c).trim.toLowerCase
          if (name.isEmpty || name.exists(ch => ch <= ' ')) return None
          headers += name -> line.substring(c + 1).trim
          o = he + 2
        }
      }
      val lenStr = headers.getOrElse("content-length", return None)
      if (lenStr.isEmpty || !lenStr.forall(ch => ch >= '0' && ch <= '9') ||
        lenStr.length > 18) return None
      val len = lenStr.toLong
      if (o + len + 4 > bytes.length) return Some((out.result(), consumed))
      val block = java.util.Arrays.copyOfRange(bytes, o, (o + len).toInt)
      o = (o + len).toInt
      if (bytes(o) != '\r' || bytes(o + 1) != '\n' ||
        bytes(o + 2) != '\r' || bytes(o + 3) != '\n') return None
      o += 4
      out += ((start.toLong, headers, block))
      consumed = o
    }
    Some((out.result(), consumed))
  }

  // ------------------------------------------------------- WET writer

  /** Deterministic record id: a name-based pseudo-UUID from the md5 of
    * a seed string — re-runs produce identical bytes (no wall clock,
    * no randomness; the tar-shard determinism rule). */
  private[graft] def recordId(seed: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-" +
      s"${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20, 32)}>"
  }

  /** Write (id, uri, date, text) rows as Common-Crawl-shaped WET files
    * under `dir`: `wet-NNNNN.warc.wet.gz`, each file a leading warcinfo
    * record plus one `conversion` record per document, EVERY record its
    * own gzip member (the CC convention the reader's member walk
    * exists for). File assignment is `id div perFile` — deterministic
    * and rerun-stable; id gaps just yield smaller files, which matches
    * the format (CC WET files are size-varied). Ids must be non-NULL
    * (rejected loudly — a NULL would collapse into one file key).
    *
    * Scale shape: ONE shuffle (`repartition(_file)`), then each task
    * streams its sorted group-runs with one open file and one record in
    * memory at a time — the writeByBoundaries discipline; text never
    * passes through a global window or the driver. */
  def writeWet(docs: DataFrame, dir: String, perFile: Int = 1000,
               idCol: String = "doc_id", uriCol: String = "uri",
               dateCol: String = "date", textCol: String = "text"): Unit =
    writeRecords(docs.select(col(idCol).cast("long").as("_id"),
        col(uriCol).cast("string").as("_uri"),
        col(dateCol).cast("string").as("_date"),
        col(textCol).cast("string").as("_text")),
      dir, perFile, "wet") { r =>
      val id = r.getLong(0)
      val uri = if (r.isNullAt(1)) "" else r.getString(1)
      val date = if (r.isNullAt(2)) "2026-01-01T00:00:00Z" else r.getString(2)
      val text = if (r.isNullAt(3)) "" else r.getString(3)
      gzipMember(record(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> date,
        "WARC-Record-ID" -> recordId(s"conversion:$id:$uri"),
        "Content-Type" -> "text/plain"),
        text.getBytes("UTF-8")))
    }

  /** The shared writer machinery behind [[writeWet]] / [[writeResponses]]:
    * `rows` must lead with a `_id` long column; `mk` turns one row into
    * its complete gzip member. File naming is `<kind>-NNNNN.warc.<kind
    * == "wet" -> .wet>.gz`. */
  private def writeRecords(rows0: DataFrame, dir: String, perFile: Int,
                           kind: String)(
      mk: org.apache.spark.sql.Row => Array[Byte]): Unit = {
    require(perFile > 0)
    val spark = rows0.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // overwrite the target dir wholesale (the Avro.write rule): a stale
    // file from a previous run with a different id range would
    // otherwise survive and be read back alongside the fresh ones
    val outPath = new org.apache.hadoop.fs.Path(dir)
    val fs0 = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs0.exists(outPath)) fs0.delete(outPath, true)
    fs0.mkdirs(outPath)
    val suffix = if (kind == "wet") ".warc.wet.gz" else ".warc.gz"
    val rows = rows0
      .withColumn("_file", expr("_id div " + perFile))
      .repartition(col("_file"))
      .sortWithinPartitions(col("_file"), col("_id"))
    val fileIdx = rows.schema.fieldIndex("_file")
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      // Task-commit protocol (r14 advice): write every file to a
      // task-attempt-scoped temp path under `_tmp/` and RENAME into
      // place only after the whole partition iterated cleanly. A
      // retried or speculative attempt therefore never writes the same
      // final path concurrently, and a killed task leaves only temp
      // garbage the strict reader's glob (`*.warc*.gz`, non-recursive)
      // never sees — truncated finals, whose reader failure mode is
      // silently-zero rows, cannot occur. Contents are deterministic
      // per file, so when two successful attempts race, the rename
      // loser just drops its identical temp.
      val tc = org.apache.spark.TaskContext.get()
      val attempt = if (tc == null) 0L else tc.taskAttemptId()
      var cur = Long.MinValue
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      val pendingFiles = scala.collection.mutable.ArrayBuffer
        .empty[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)]
      def close(): Unit = if (out != null) { out.close(); out = null }
      def warcinfo(name: String): Array[Byte] = gzipMember(record(Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Filename" -> name,
        "WARC-Record-ID" -> recordId(s"warcinfo:$name"),
        "Content-Type" -> "application/warc-fields"),
        "software: graft\r\nformat: WARC File Format 1.0\r\n"
          .getBytes("UTF-8")))
      try {
        it.foreach { r =>
          if (r.isNullAt(0)) throw new IllegalArgumentException(
            "writeRecords: NULL id (file assignment would collapse to one key)")
          val file = r.getLong(fileIdx)
          if (file != cur) {
            close()
            val name = f"$kind-$file%05d$suffix"
            val tmp = new org.apache.hadoop.fs.Path(
              dir, s"_tmp/$name.attempt-$attempt")
            out = tmp.getFileSystem(conf.value).create(tmp, true)
            out.write(warcinfo(name))
            pendingFiles += ((tmp, new org.apache.hadoop.fs.Path(dir, name)))
            cur = file
          }
          out.write(mk(r))
        }
        close()
        // task commit: move temps into place (atomic per file on HDFS
        // and local fs; rename-to-existing fails there, handled below)
        pendingFiles.foreach { case (tmp, fin) =>
          val fs = tmp.getFileSystem(conf.value)
          if (!fs.rename(tmp, fin)) {
            if (fs.exists(fin)) fs.delete(tmp, false) // equivalent attempt won
            else throw new java.io.IOException(
              s"writeRecords: commit rename $tmp -> $fin failed")
          }
        }
      } catch {
        case t: Throwable =>
          close()
          pendingFiles.foreach { case (tmp, _) =>
            try tmp.getFileSystem(conf.value).delete(tmp, false)
            catch { case _: Throwable => () }
          }
          throw t
      } finally close()
    }
    // all tasks committed: clear any abandoned attempt temps
    val tmpDir = new org.apache.hadoop.fs.Path(outPath, "_tmp")
    if (fs0.exists(tmpDir)) fs0.delete(tmpDir, true)
  }

  // ------------------------------------------------------------ read

  private val recordSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("member_offset", LongType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** One row per WARC record across `glob` (a `*.warc.wet.gz` pattern
    * under the corpus dir).
    * A `.gz` file must be a clean run of gzip members; anything else is
    * parsed as a raw uncompressed WARC. Any malformation — gzip OR
    * record grammar — drops the WHOLE file to zero rows (strict: a file
    * that half-parses is a file you cannot trust). `member_offset` is
    * the compressed byte offset of the gzip member the record starts
    * in (0 for raw files) — the CC cdx-style split index. */
  def read(spark: SparkSession, glob: String): DataFrame =
    explodeRecords(spark.read.format("binaryFile").load(glob))

  /** WET convenience view: `conversion` records only, block decoded as
    * UTF-8 `text`, one row per extracted document. */
  def readWet(spark: SparkSession, glob: String): DataFrame =
    wetView(read(spark, glob))

  /** Per-file ingest health census — the QUERYABLE form of the strict
    * reader's reject behavior (r15 verdict: the failure mode of
    * [[read]] is silently-zero rows, so corruption must be visible
    * somewhere a pipeline can ALERT on, not only in executor logs).
    * One row per file under `glob`: its size, whether the strict
    * gzip-member + record-grammar parse accepts it, and how many
    * records it carries (0 for rejected files). An ingest job runs
    * this next to [[read]] and gates on `SUM(NOT ok)` — a truncated
    * final from a crashed pre-commit-protocol writer, a flipped byte,
    * or trailing garbage all surface as an `ok = false` row instead
    * of invisible loss. Scan-side, one pass, no shuffle; the census
    * reads the same binaryFile frame the reader does but COUNTS
    * through [[countRecordsStrict]]'s discarding sink, so record
    * bodies are never retained — on 1 GB gz shards the census holds
    * headers plus one transient block, not the decompressed file
    * (r16 verdict). */
  def rejectCensus(spark: SparkSession, glob: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("n_records", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .map { r =>
        val name = r.getString(0).split("/").last
        val raw = r.getAs[Array[Byte]](1)
        val counted = countRecordsStrict(raw)
        org.apache.spark.sql.Row(name, raw.length.toLong,
          counted.isDefined, counted.getOrElse(0L))
      }(enc)
  }

  /** [[readWet]] as a STREAMING source — crawls land as whole files, so
    * resident gates (dedup/curation/governance) consume this: each
    * micro-batch is `maxFilesPerTrigger` whole WET files exploded to
    * document rows. File-source semantics give replay idempotency (a
    * file is the commit unit) and the strict parse drops a corrupt
    * file as zero rows instead of poisoning the stream. */
  def streamWet(spark: SparkSession, glob: String,
                maxFilesPerTrigger: Int = 4): DataFrame =
    wetView(explodeRecords(spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(glob)))

  // -------------------------------------------- raw WARC (response)

  private val httpSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("member_offset", LongType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_ok", BooleanType, nullable = false),
    StructField("http_status", LongType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))

  /** Parse `response` records' HTTP payload (what raw Common Crawl
    * WARC blocks hold: `application/http; msgtype=response` — status
    * line, CRLF header lines, blank CRLF, body). STRICT per record,
    * LENIENT per file: a block that is not well-formed HTTP/1.x reads
    * `http_ok = false` with NULL status/content-type and the RAW block
    * preserved as `body` — a capture you cannot parse is a capture you
    * quarantine, not one you lose (the record framing already proved
    * itself via the member walk; only the payload grammar failed).
    * Headers decode as ISO-8859-1 (the HTTP/1.1 octet rule — a UTF-8
    * decode would corrupt high-byte header octets); names fold to
    * lowercase; the FIRST occurrence of a repeated header wins. The
    * body passes through as raw bytes — charset transcoding is the
    * text-extraction stage's decision, not ingestion's. Scan-side,
    * record-at-a-time: no shuffle, bodies never leave their partition. */
  def httpResponses(records: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(httpSchema)
    records.where(col("warc_type") === "response")
      .select(col("file"), col("member_offset"), col("record_id"),
        col("target_uri"), col("warc_date"), col("content"))
      .map { r =>
        val block = r.getAs[Array[Byte]]("content")
        val parsed = parseHttp(block)
        org.apache.spark.sql.Row(
          r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getString(4), parsed.isDefined,
          parsed.map(_._1).orNull,
          parsed.flatMap(_._2.get("content-type")).orNull,
          parsed.map(_._3).getOrElse(block))
      }(enc)
  }

  /** Some((status, lowercased headers, body)) for a well-formed
    * HTTP/1.x response block, None otherwise. */
  private[graft] def parseHttp(
      block: Array[Byte]): Option[(java.lang.Long, Map[String, String], Array[Byte])] = {
    var sep = -1
    var i = 0
    while (sep < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n') sep = i
      i += 1
    }
    if (sep < 0) return None
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n", -1)
    val status = "^HTTP/[0-9]\\.[0-9] ([0-9]{3})(?: .*)?$".r
    lines.head match {
      case status(code) =>
        var hs = Map.empty[String, String]
        lines.tail.foreach { l =>
          val c = l.indexOf(':')
          if (c <= 0) return None
          val name = l.substring(0, c).trim.toLowerCase
          if (name.isEmpty || name.exists(_ <= ' ')) return None
          if (!hs.contains(name)) hs += name -> l.substring(c + 1).trim
        }
        Some((java.lang.Long.valueOf(code.toLong), hs,
          java.util.Arrays.copyOfRange(block, sep + 4, block.length)))
      case _ => None
    }
  }

  /** The standard reason phrase for a status code (a written capture
    * claiming `404 OK` is a lie an external reader will notice even if
    * parsers ignore the phrase — the review-pass fix). */
  private def reasonPhrase(st: Long): String = st match {
    case 200 => "OK"
    case 204 => "No Content"
    case 301 => "Moved Permanently"
    case 302 => "Found"
    case 304 => "Not Modified"
    case 403 => "Forbidden"
    case 404 => "Not Found"
    case 429 => "Too Many Requests"
    case 500 => "Internal Server Error"
    case 503 => "Service Unavailable"
    case _   => "Status"
  }

  /** Write (id, uri, date, status, contentType, body-text) rows as raw
    * WARC response files — the [[writeWet]] disciplines (per-record
    * members, warcinfo leader, deterministic bytes, one shuffle, id
    * div `perFile` assignment) with an HTTP/1.1 payload per record. */
  def writeResponses(docs: DataFrame, dir: String, perFile: Int = 1000,
                     idCol: String = "doc_id", uriCol: String = "uri",
                     dateCol: String = "date", statusCol: String = "status",
                     ctypeCol: String = "ctype",
                     textCol: String = "text"): Unit =
    writeRecords(docs.select(col(idCol).cast("long").as("_id"),
        col(uriCol).cast("string").as("_uri"),
        col(dateCol).cast("string").as("_date"),
        col(statusCol).cast("long").as("_status"),
        col(ctypeCol).cast("string").as("_ctype"),
        col(textCol).cast("string").as("_text")),
      dir, perFile, "warc") { r =>
      val id = r.getLong(0)
      val uri = if (r.isNullAt(1)) "" else r.getString(1)
      val date = if (r.isNullAt(2)) "2026-01-01T00:00:00Z" else r.getString(2)
      val st = if (r.isNullAt(3)) 200L else r.getLong(3)
      val ct = if (r.isNullAt(4)) "text/plain" else r.getString(4)
      val body = (if (r.isNullAt(5)) "" else r.getString(5)).getBytes("UTF-8")
      val http = (s"HTTP/1.1 $st ${reasonPhrase(st)}\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
      gzipMember(record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> date,
        "WARC-Record-ID" -> recordId(s"response:$id:$uri"),
        "Content-Type" -> "application/http; msgtype=response"),
        http))
    }

  // -------------------------------------------------------- CDX index

  /** The cdx-style sidecar a splittable 100 TB WARC reader distributes
    * on (Common Crawl ships exactly this next to every crawl): per
    * response/conversion record, the CANONICAL url key
    * ([[graft.ops.Web.canonicalizeUrl]] — the same form URL dedup
    * keys on), capture date, containing file, the record's compressed
    * member offset, and the block length. Scan-side projection of
    * [[read]]'s output — building the index costs one pass over the
    * corpus and nothing shuffles. */
  def cdxIndex(records: DataFrame): DataFrame =
    records.where(col("warc_type").isin("response", "conversion"))
      .select(graft.ops.Web.canonicalizeUrl(col("target_uri")).as("urlkey"),
        col("warc_date"), col("file"), col("member_offset"),
        col("content_length"))

  private def wetView(records: DataFrame): DataFrame =
    records.where(col("warc_type") === "conversion")
      .select(col("file"), col("member_offset"), col("record_id"),
        col("target_uri"), col("warc_date"),
        col("content").cast("string").as("text"))

  private def explodeRecords(files: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(recordSchema)
    files.select(col("path"), col("content")).flatMap { r =>
      val name = r.getString(0).split("/").last
      val raw = r.getAs[Array[Byte]](1)
      val parsed =
        if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
          parseGzFile(raw)
        else parseRecords(raw).map(_.map { case (_, h, b) => (0L, h, b) })
      if (parsed.isEmpty && raw.nonEmpty)
        // the strict reader's failure mode is EMPTY, not an error — at
        // least make the drop visible in the executor log (r14 advice:
        // silent corruption reads as zero rows)
        System.err.println(s"[warc] rejected malformed file: $name (${raw.length} bytes)")
      parsed.map(_.map { case (mOff, h, block) =>
        org.apache.spark.sql.Row(
          name, mOff, h.get("warc-record-id").orNull,
          h.get("warc-type").orNull, h.get("warc-target-uri").orNull,
          h.get("warc-date").orNull, h.get("content-type").orNull,
          block.length.toLong, block)
      }).getOrElse(Seq.empty).iterator
    }(enc)
  }

  /** Streaming member walk + prefix record parse for one gz file:
    * Some(list of (member compressed offset, headers, block)) or None
    * on ANY malformation (same strictness as [[gzipMembers]] +
    * [[parseRecords]] composed). Memory shape (r14 advice): the old
    * path held the member array + the full decompressed concat + the
    * record blocks — ~3x the decompressed size per task, ~12 GB for a
    * 1 GB Common-Crawl gz. This walk inflates ONE member at a time and
    * parses records off the front of a pending buffer (CC writes each
    * record as its own member, so pending stays one-record-sized;
    * concatenation only happens when a record genuinely spans members),
    * leaving the record blocks themselves as the only full-size
    * resident — the floor, since they ARE the output. */
  private[graft] def parseGzFile(raw: Array[Byte])
      : Option[Seq[(Long, Map[String, String], Array[Byte])]] =
    parseGzFileWithStats(raw).map(_._1)

  /** [[parseGzFile]] plus the walk's peak pending-buffer size — the
    * quantity the bounded-memory claim above is ABOUT, surfaced so the
    * spec can pin it: for per-record-member files (the CC shape) the
    * peak must stay one-record-sized however many members the file
    * holds, and for a deliberately member-spanning record it may reach
    * that record's size plus one member — never the decompressed file
    * size the pre-r15 path materialized. */
  private[graft] def parseGzFileWithStats(raw: Array[Byte])
      : Option[(Seq[(Long, Map[String, String], Array[Byte])], Int)] = {
    val out = Seq.newBuilder[(Long, Map[String, String], Array[Byte])]
    walkGzFile(raw, (m, h, b) => out += ((m, h, b)))
      .map(maxPending => (out.result(), maxPending))
  }

  /** Strict record count for ONE file — the [[parseGzFile]] member walk
    * (or the bare record grammar for uncompressed files) driven through
    * a counting sink: each record block becomes garbage the moment it
    * parses, so a census over 1 GB shards holds headers plus one
    * transient block, never the decompressed file (r16 verdict:
    * [[rejectCensus]] materialized every body just to count). `None`
    * means the strict parse rejects the file. */
  private[graft] def countRecordsStrict(raw: Array[Byte]): Option[Long] =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
      (raw(1) & 0xff) == 0x8b) {
      var n = 0L
      walkGzFile(raw, (_, _, _) => n += 1).map(_ => n)
    } else parseRecords(raw).map(_.size.toLong)

  /** The shared strict gz walk behind [[parseGzFileWithStats]] and
    * [[countRecordsStrict]]: inflates one member at a time, parses
    * records off the front of the pending buffer, and hands each
    * (member compressed offset, headers, block) to `sink` the moment
    * it parses — the CALLER decides whether bodies are retained, which
    * is the whole memory story. Returns the walk's peak pending-buffer
    * size, or None on any malformation. */
  private def walkGzFile(raw: Array[Byte],
      sink: (Long, Map[String, String], Array[Byte]) => Unit): Option[Int] = {
    var maxPending = 0
    var pending = Array.emptyByteArray
    var pendingStart = 0L // decompressed offset of pending(0) in the stream
    // members overlapping [pendingStart, inf): (compressed offset,
    // decompressed start) — records attribute to the member their
    // decompressed start falls in; both sides advance monotonically so
    // one deque walk covers the whole file
    val live = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
    var o = 0
    var decomp = 0L
    while (o < raw.length) {
      gzipMemberAt(raw, o) match {
        case None => return None
        case Some((next, data)) =>
          live.append((o.toLong, decomp))
          decomp += data.length
          o = next
          pending =
            if (pending.isEmpty) data
            else {
              val np = new Array[Byte](pending.length + data.length)
              System.arraycopy(pending, 0, np, 0, pending.length)
              System.arraycopy(data, 0, np, pending.length, data.length)
              np
            }
          if (pending.length > maxPending) maxPending = pending.length
          parseRecordsPrefix(pending) match {
            case None => return None
            case Some((recs, consumed)) =>
              recs.foreach { case (local, h, block) =>
                val dOff = pendingStart + local
                while (live.length > 1 && live(1)._2 <= dOff) live.removeHead()
                sink(live.head._1, h, block)
              }
              if (consumed > 0) {
                pendingStart += consumed
                pending = java.util.Arrays.copyOfRange(
                  pending, consumed, pending.length)
                while (live.length > 1 && live(1)._2 <= pendingStart)
                  live.removeHead()
              }
          }
      }
    }
    // strict: leftover bytes mean a truncated trailing record
    if (pending.nonEmpty) None else Some(maxPending)
  }
}
