package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Warc

/** WARC/WET ingestion: gzip member walk strictness (CRC/ISIZE/trailing
  * garbage), record grammar pinned by hand, system-gunzip acceptance,
  * bit-exact document roundtrip through Common-Crawl-shaped files,
  * single-byte-flip fuzz battery, member offsets, streaming twin. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def wetBytes(docs: Seq[(Long, String, String, String)],
                       perFile: Int = 1000): Array[Byte] = {
    val dir = Files.createTempDirectory("warc_spec").toString
    Warc.writeWet(docs.toDF("doc_id", "uri", "date", "text"), dir, perFile)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
    assert(f.length == 1)
    Files.readAllBytes(f.head.toPath)
  }

  test("record grammar pinned: version line, CRLF headers, length, separator") {
    val rec = Warc.record(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://x.com/a"), "hello\nworld".getBytes("UTF-8"))
    val s = new String(rec, "UTF-8")
    assert(s.startsWith("WARC/1.0\r\n"))
    assert(s.contains("WARC-Type: conversion\r\n"))
    assert(s.contains("Content-Length: 11\r\n\r\nhello\nworld\r\n\r\n"))
    val parsed = Warc.parseRecords(rec).get
    assert(parsed.size == 1)
    val (off, h, block) = parsed.head
    assert(off == 0L && h("warc-type") == "conversion")
    assert(h("content-length") == "11")
    assert(new String(block, "UTF-8") == "hello\nworld")
    // two records back to back parse with correct offsets
    val two = rec ++ Warc.record(Seq("WARC-Type" -> "x"), Array[Byte]())
    val p2 = Warc.parseRecords(two).get
    assert(p2.map(_._1) == Seq(0L, rec.length.toLong))
  }

  test("strict record parse: LF-only, colonless header, bad length, missing separator, trailing garbage reject") {
    val ok = Warc.record(Seq("WARC-Type" -> "t"), "abc".getBytes)
    assert(Warc.parseRecords(ok).isDefined)
    // lone-LF line endings are not the grammar
    val lf = new String(ok, "UTF-8").replace("\r\n", "\n").getBytes("UTF-8")
    assert(Warc.parseRecords(lf).isEmpty)
    // colonless header line
    assert(Warc.parseRecords(
      "WARC/1.0\r\nnocolonhere\r\n\r\n\r\n\r\n".getBytes).isEmpty)
    // missing Content-Length
    assert(Warc.parseRecords(
      "WARC/1.0\r\nWARC-Type: t\r\n\r\n\r\n\r\n".getBytes).isEmpty)
    // non-numeric / oversized length
    assert(Warc.parseRecords(
      "WARC/1.0\r\nContent-Length: 3x\r\n\r\nabc\r\n\r\n".getBytes).isEmpty)
    // block runs past the buffer
    assert(Warc.parseRecords(
      "WARC/1.0\r\nContent-Length: 99\r\n\r\nabc\r\n\r\n".getBytes).isEmpty)
    // missing the CRLF CRLF separator
    assert(Warc.parseRecords(
      "WARC/1.0\r\nContent-Length: 3\r\n\r\nabc".getBytes).isEmpty)
    // trailing garbage after a valid record
    assert(Warc.parseRecords(ok ++ "junk".getBytes).isEmpty)
    // wrong version
    assert(Warc.parseRecords(
      "WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes).isEmpty)
    // WARC/1.1 accepted
    assert(Warc.parseRecords(
      "WARC/1.1\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes).isDefined)
  }

  test("gzip member walk: offsets, strict CRC/ISIZE/trailing-garbage rejection") {
    val a = Warc.gzipMember("alpha".getBytes)
    val b = Warc.gzipMember("beta-beta".getBytes)
    val ms = Warc.gzipMembers(a ++ b).get
    assert(ms.map(_._1) == Seq(0L, a.length.toLong))
    assert(ms.map(m => new String(m._2)) == Seq("alpha", "beta-beta"))
    // deterministic bytes (re-runnable writer contract)
    assert(Warc.gzipMember("alpha".getBytes).sameElements(a))
    // trailing garbage — exactly what GZIPInputStream would swallow
    assert(Warc.gzipMembers(a ++ "x".getBytes).isEmpty)
    // truncation mid-member
    assert(Warc.gzipMembers(java.util.Arrays.copyOf(a, a.length - 3)).isEmpty)
    // corrupt stored CRC
    val badCrc = (a ++ b).clone()
    badCrc(a.length - 6) = (badCrc(a.length - 6) ^ 0x01).toByte
    assert(Warc.gzipMembers(badCrc).isEmpty)
    // not gzip at all
    assert(Warc.gzipMembers("WARC/1.0".getBytes).isEmpty)
  }

  test("system gunzip accepts the multi-member file (external-reader acceptance)") {
    val gzBin = Seq("/bin/gunzip", "/usr/bin/gunzip")
      .find(p => new java.io.File(p).exists())
    assume(gzBin.isDefined, "no system gunzip in this container")
    val bytes = wetBytes(Seq(
      (1L, "http://a.com/1", "2026-01-01T00:00:00Z", "first doc"),
      (2L, "http://a.com/2", "2026-01-01T00:00:00Z", "second doc")))
    val f = Files.createTempFile("warc_ext", ".warc.wet.gz")
    Files.write(f, bytes)
    val p = new ProcessBuilder(gzBin.get, "-c", f.toString)
      .redirectErrorStream(false).start()
    val out = p.getInputStream.readAllBytes()
    assert(p.waitFor() == 0, "gunzip rejected the file")
    // gunzip concatenates the decompressed members; the result is the
    // same record stream the reader parses
    val recs = Warc.parseRecords(out).get
    assert(recs.size == 3) // warcinfo + 2 conversions
    assert(recs.head._2("warc-type") == "warcinfo")
    assert(recs.map(_._2("warc-type")).count(_ == "conversion") == 2)
  }

  test("WET roundtrip bit-exact; warcinfo leader; member offsets strictly increasing") {
    val docs = (0L until 37L).map(i =>
      (i * 3, s"https://s$i.example.com/p?x=$i", "2026-02-03T04:05:06Z",
        s"body $i with unicode é中 and\nnewlines".stripMargin))
    val dir = Files.createTempDirectory("warc_rt").toString
    Warc.writeWet(docs.toDF("doc_id", "uri", "date", "text"), dir, perFile = 20)
    // 37 docs at ids 0,3,..,108; file = id div 20 -> files 0..5
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc.wet.gz")) == 6)
    val all = Warc.read(spark, s"$dir/*.warc.wet.gz")
    val info = all.where(col("warc_type") === "warcinfo").collect()
    assert(info.length == 6 && info.forall(_.getLong(1) == 0L))
    val back = Warc.readWet(spark, s"$dir/*.warc.wet.gz")
      .select(col("target_uri"), col("warc_date"), col("text"),
        col("file"), col("member_offset"))
      .collect()
    assert(back.length == 37)
    val got = back.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == docs.map(d => (d._2, d._3, d._4)).toSet)
    // member offsets strictly increase within a file (per-record members)
    back.groupBy(_.getString(3)).foreach { case (_, rs) =>
      val offs = rs.map(_.getLong(4)).sorted
      assert(offs.distinct.length == offs.length && offs.forall(_ > 0))
    }
    // deterministic re-write: identical bytes
    val before = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
      .sortBy(_.getName).map(f => Files.readAllBytes(f.toPath).toSeq).toSeq
    Warc.writeWet(docs.toDF("doc_id", "uri", "date", "text")
      .repartition(7), dir, perFile = 20)
    val after = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
      .sortBy(_.getName).map(f => Files.readAllBytes(f.toPath).toSeq).toSeq
    assert(before == after)
  }

  test("parseRecordsPrefix: incomplete tail waits, grammar damage is fatal") {
    val rec = Warc.record(Seq("WARC-Type" -> "conversion"), "abc".getBytes)
    // whole record + half of a second: prefix yields 1 record, consumed
    // stops at the boundary; more bytes later can complete the tail
    val half = rec ++ rec.take(rec.length / 2)
    val Some((recs, consumed)) = Warc.parseRecordsPrefix(half)
    assert(recs.size == 1 && consumed == rec.length)
    // completing the tail yields both
    val Some((recs2, consumed2)) = Warc.parseRecordsPrefix(
      half ++ rec.drop(rec.length / 2))
    assert(recs2.size == 2 && consumed2 == 2 * rec.length)
    // grammar damage (bad version) is None even with a clean prefix
    val bad = rec ++ "NOTWARC/9.9\r\n\r\n".getBytes
    assert(Warc.parseRecordsPrefix(bad).isEmpty)
  }

  test("parseGzFile: member-spanning record attributes to the member holding its start") {
    val r1 = Warc.record(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://s.com/1"), "body one".getBytes)
    val r2 = Warc.record(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://s.com/2"), "body two".getBytes)
    val r3 = Warc.record(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://s.com/3"), "body three".getBytes)
    // member A = r1 + first half of r2; member B = rest of r2; C = r3
    val cut = r2.length / 2
    val mA = Warc.gzipMember(r1 ++ r2.take(cut))
    val mB = Warc.gzipMember(r2.drop(cut))
    val mC = Warc.gzipMember(r3)
    val got = Warc.parseGzFile(mA ++ mB ++ mC).get
    assert(got.map(_._2("warc-target-uri")) ==
      Seq("http://s.com/1", "http://s.com/2", "http://s.com/3"))
    assert(got.map(t => new String(t._3, "UTF-8")) ==
      Seq("body one", "body two", "body three"))
    // r1 and r2 both START in member A (offset 0); r3 starts in C
    assert(got.map(_._1) ==
      Seq(0L, 0L, (mA.length + mB.length).toLong))
    // equivalence with the materialized path on a per-record-member file
    val perRec = Warc.gzipMember(r1) ++ Warc.gzipMember(r2) ++ Warc.gzipMember(r3)
    val viaOld = {
      val ms = Warc.gzipMembers(perRec).get
      val bo = new java.io.ByteArrayOutputStream()
      ms.foreach { case (_, d) => bo.write(d) }
      Warc.parseRecords(bo.toByteArray).get
    }
    val viaNew = Warc.parseGzFile(perRec).get
    assert(viaNew.map(_._2) == viaOld.map(_._2))
    assert(viaNew.map(_._1) == ms_offsets(perRec, Seq(r1, r2, r3)))
    // truncated trailing record (half of r2 never completed) -> whole file rejected
    assert(Warc.parseGzFile(mA).isEmpty)
  }

  test("parseGzFile: pending buffer stays one-record-sized, not file-sized") {
    // 2000 per-record members: the streaming walk's peak pending buffer
    // must track the LARGEST single record, never the decompressed file
    // (the r15 memory rewrite's contract — ~3x file size pre-fix)
    val recs = (0 until 2000).map { i =>
      Warc.record(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> s"http://s.com/$i"),
        ("body " + ("x" * 100) + i).getBytes)
    }
    val gz = recs.map(Warc.gzipMember).reduce(_ ++ _)
    val Some((got, maxPending)) = Warc.parseGzFileWithStats(gz)
    assert(got.size == 2000)
    val largest = recs.map(_.length).max
    val total = recs.map(_.length).sum
    assert(maxPending <= largest,
      s"peak pending $maxPending must stay <= one record ($largest), " +
        s"file holds $total decompressed bytes")
    // a member-spanning record may hold that record plus one member's
    // overshoot — still record-scale, never file-scale
    val big = Warc.record(Seq("WARC-Type" -> "conversion"),
      Array.fill[Byte](5000)('b'))
    val cut = big.length / 2
    val spanned = Warc.gzipMember(big.take(cut)) ++
      Warc.gzipMember(big.drop(cut)) ++ gz
    val Some((got2, maxPending2)) = Warc.parseGzFileWithStats(spanned)
    assert(got2.size == 2001)
    assert(maxPending2 <= big.length + largest,
      s"spanning peak $maxPending2 must stay record-scale " +
        s"(record ${big.length} + one member <= ${big.length + largest})")
  }

  test("rejectCensus: a truncated file reads ok=false while the reader drops it silently") {
    val dir = Files.createTempDirectory("graft-warc-census").toString
    val docs = (0L until 40L)
      .map(i => (i, s"http://s.com/$i", "2026-01-01T00:00:00Z", s"body $i"))
      .toDF("doc_id", "uri", "date", "text")
    Warc.writeWet(docs, dir, perFile = 10) // 4 files
    // simulate the crash the commit protocol guards against: truncate
    // one FINAL file mid-member (a pre-protocol writer could leave this)
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).minBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    java.nio.file.Files.write(victim.toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2))
    // drop the local-fs checksum sidecar: a production truncation
    // (crashed writer on HDFS/S3) carries no stale client-side CRC
    new java.io.File(victim.getParent, s".${victim.getName}.crc").delete()
    // the strict reader: 3 healthy files' rows only, no error — the
    // invisible-loss failure mode the census exists to surface
    assert(Warc.readWet(spark, s"$dir/*.warc.wet.gz").count() == 30L)
    val census = Warc.rejectCensus(spark, s"$dir/*.warc.wet.gz")
      .select("file", "ok", "n_records")
      .as[(String, Boolean, Long)].collect()
      .map { case (f, o, n) => f -> ((o, n)) }.toMap
    assert(census.size == 4)
    assert(census(victim.getName) == ((false, 0L)),
      s"truncated file must read ok=false: $census")
    assert(census.count { case (_, (ok, n)) => ok && n == 11 } == 3,
      s"healthy files carry warcinfo + 10 docs: $census")
  }

  private def ms_offsets(gz: Array[Byte], recs: Seq[Array[Byte]]): Seq[Long] =
    Warc.gzipMembers(gz).get.map(_._1)

  test("writeWet commit protocol: no _tmp residue, finals only") {
    val docs = (0L until 9L).map(i =>
      (i, s"https://c$i.example.com/", "2026-02-03T04:05:06Z", s"doc $i"))
    val dir = Files.createTempDirectory("warc_commit").toString
    Warc.writeWet(docs.toDF("doc_id", "uri", "date", "text"), dir, perFile = 4)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.contains("_tmp"))
    assert(!names.exists(_.contains(".attempt-")))
    // only finals (plus Hadoop's hidden .crc sidecars) remain
    assert(names.filterNot(_.startsWith(".")).forall(_.endsWith(".warc.wet.gz")))
    assert(Warc.readWet(spark, s"$dir/*.warc.wet.gz").count() == 9L)
  }

  test("writeWet: task count bounded by shuffle partitions, files multiplexed per task") {
    // 120 docs at perFile=1 -> 120 output files, but repartition(_file)
    // hash-distributes file KEYS over spark.sql.shuffle.partitions, so
    // the writer's task count stays bounded at ANY file count — a
    // 100 TB writer's parallelism is a config, not a function of file
    // sizing (the r18-verdict concern was one task per output file;
    // this pins that each task streams its several files sequentially)
    val dir = Files.createTempDirectory("warc_taskcount").toString
    val docs = spark.range(120).select(col("id").as("doc_id"),
      concat(lit("https://h"), col("id"), lit(".example.com/")).as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      concat(lit("text "), col("id")).as("text"))
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (s.stageInfo.name.contains("foreachPartition"))
          maxTasks.updateAndGet(m => math.max(m, s.stageInfo.numTasks))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Warc.writeWet(docs, dir, perFile = 1)
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz"))
    assert(files.length == 120, s"expected 120 files, got ${files.length}")
    val sp = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(maxTasks.get() > 0 && maxTasks.get() <= sp,
      s"writer ran ${maxTasks.get()} tasks; must be bounded by shuffle " +
        s"partitions ($sp), not the 120-file count")
    assert(Warc.readWet(spark, s"$dir/*.warc.wet.gz").count() == 120L)
  }

  test("fuzz battery: every single-byte flip reads either the original rows or zero rows") {
    val bytes = wetBytes(Seq(
      (5L, "http://fuzz.com/5", "2026-01-01T00:00:00Z", "fuzz body five"),
      (6L, "http://fuzz.com/6", "2026-01-01T00:00:00Z", "fuzz body six")))
    def parse(b: Array[Byte]): Option[Seq[(String, String)]] =
      Warc.gzipMembers(b).flatMap { ms =>
        val bo = new java.io.ByteArrayOutputStream()
        ms.foreach { case (_, d) => bo.write(d) }
        Warc.parseRecords(bo.toByteArray)
      }.map(_.collect { case (_, h, blk) if h("warc-type") == "conversion" =>
        (h("warc-target-uri"), new String(blk, "UTF-8")) })
    val expected = parse(bytes).get
    assert(expected == Seq(("http://fuzz.com/5", "fuzz body five"),
      ("http://fuzz.com/6", "fuzz body six")))
    // CRC32 catches any flip in the deflate stream or trailer; header
    // metadata flips either reject or decode identically — a flip must
    // NEVER yield different surviving content
    var rejected = 0
    for (i <- bytes.indices; bit <- Seq(0x01, 0x80)) {
      val m = bytes.clone(); m(i) = (m(i) ^ bit).toByte
      parse(m) match {
        case None => rejected += 1
        case Some(rows) => assert(rows == expected,
          s"flip at byte $i bit $bit silently changed content")
      }
    }
    assert(rejected > bytes.length, "most flips must reject") // sanity
    // truncations at every length: never WRONG content — a cut landing
    // exactly on a member boundary is indistinguishable from a shorter
    // file (each record is its own member), so a clean PREFIX of the
    // records is the only acceptable non-reject outcome
    for (len <- 0 to bytes.length) {
      parse(java.util.Arrays.copyOf(bytes, len)).foreach(r =>
        assert(r == expected.take(r.length),
          s"truncation at $len yielded non-prefix content"))
    }
  }

  test("corrupt file yields zero rows through the reader, never an exception") {
    val dir = Files.createTempDirectory("warc_bad").toString
    Warc.writeWet(Seq((1L, "http://ok.com/1", "2026-01-01T00:00:00Z", "ok"))
      .toDF("doc_id", "uri", "date", "text"), dir, perFile = 10)
    val good = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gz")).head
    val corrupt = Files.readAllBytes(good.toPath)
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x10).toByte
    Files.write(new java.io.File(dir, "wet-00099.warc.wet.gz").toPath, corrupt)
    // also a raw uncompressed WARC alongside (no .gz framing)
    Files.write(new java.io.File(dir, "raw-1.warc.wet.gz").toPath,
      Warc.record(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://raw.com/r",
        "WARC-Date" -> "2026-01-01T00:00:00Z"), "raw text".getBytes))
    val rows = Warc.readWet(spark, s"$dir/*.warc.wet.gz")
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("http://ok.com/1", "ok"), ("http://raw.com/r", "raw text")))
  }

  test("parseHttp pinned: status line, header case-fold, first-wins, binary body bit-exact") {
    val body = Array.tabulate(256)(i => i.toByte) // every octet value
    val head = "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n" +
      "content-TYPE: text/plain\r\nX-A: 1\r\n\r\n"
    val parsed = Warc.parseHttp(head.getBytes("ISO-8859-1") ++ body)
    assert(parsed.isDefined)
    val (st, hs, b) = parsed.get
    assert(st == 404L)
    assert(hs("content-type") == "text/html", "first occurrence wins")
    assert(hs("x-a") == "1")
    assert(b.sameElements(body), "body must pass through bit-exact")
    // status line without a reason phrase is legal
    assert(Warc.parseHttp("HTTP/1.0 204\r\n\r\n".getBytes).get._1 == 204L)
    // missing separator / non-HTTP status line / colonless header
    assert(Warc.parseHttp("HTTP/1.1 200 OK\r\nA: 1".getBytes).isEmpty)
    assert(Warc.parseHttp("ICY 200 OK\r\n\r\nx".getBytes).isEmpty)
    assert(Warc.parseHttp(
      "HTTP/1.1 200 OK\r\nnocolon\r\n\r\nx".getBytes).isEmpty)
  }

  test("writeResponses -> httpResponses roundtrip; malformed payload quarantines with raw body") {
    val dir = Files.createTempDirectory("warc_http").toString
    Warc.writeResponses(Seq(
      (1L, "http://a.com/1", "2026-01-01T00:00:00Z", 200L,
        "text/plain", "hello résponse"),
      (2L, "http://a.com/2", "2026-01-01T00:00:00Z", 404L,
        "text/html; charset=utf-8", "nope"))
      .toDF("doc_id", "uri", "date", "status", "ctype", "text"),
      dir, perFile = 10)
    // a response record whose payload is NOT HTTP, riding a raw file
    Files.write(new java.io.File(dir, "bad-1.warc.gz").toPath,
      Warc.record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://a.com/junk",
        "WARC-Date" -> "2026-01-01T00:00:00Z"),
        "this is not http".getBytes("UTF-8")))
    // the written status lines carry REAL reason phrases (a capture
    // claiming '404 OK' is a lie an external reader notices)
    val rawRecords = Warc.read(spark, s"$dir/*.warc.gz")
      .where(col("warc_type") === "response" &&
        col("file").startsWith("warc-"))
      .select(col("content")).collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "ISO-8859-1")
        .split("\r\n").head).toSet
    assert(rawRecords == Set("HTTP/1.1 200 OK", "HTTP/1.1 404 Not Found"))
    val got = Warc.httpResponses(Warc.read(spark, s"$dir/*.warc.gz"))
      .collect().map(r => r.getString(3) ->
        ((r.getBoolean(5), Option(r.get(6)).map(_.toString.toLong),
          Option(r.getString(7)),
          new String(r.getAs[Array[Byte]](8), "UTF-8")))).toMap
    assert(got("http://a.com/1") ==
      ((true, Some(200L), Some("text/plain"), "hello résponse")))
    assert(got("http://a.com/2") ==
      ((true, Some(404L), Some("text/html; charset=utf-8"), "nope")))
    assert(got("http://a.com/junk") ==
      ((false, None, None, "this is not http")),
      "an unparseable payload must keep its raw block, flagged")
    // cdx over the same files: canonical urlkey, offsets positive and
    // strictly increasing within a file (warcinfo occupies offset 0)
    val cdx = Warc.cdxIndex(Warc.read(spark, s"$dir/*.warc.gz")).collect()
    assert(cdx.map(_.getString(0)).toSet ==
      Set("http://a.com/1", "http://a.com/2", "http://a.com/junk"))
    cdx.groupBy(_.getString(2)).foreach { case (f, rs) =>
      val offs = rs.map(_.getLong(3))
      if (f.startsWith("warc-"))
        assert(offs.forall(_ > 0) && offs.distinct.length == offs.length)
      else assert(offs.forall(_ == 0L), "raw files carry offset 0")
    }
  }

  test("streamWet == batch readWet; file-grained micro-batches") {
    val dir = Files.createTempDirectory("warc_stream").toString
    val docs = (0L until 30L).map(i =>
      (i, s"http://st.com/$i", "2026-01-01T00:00:00Z", s"stream doc $i"))
    Warc.writeWet(docs.toDF("doc_id", "uri", "date", "text"), dir, perFile = 10)
    val out = Files.createTempDirectory("warc_stream_out").toString
    val cp = Files.createTempDirectory("warc_stream_cp").toString
    val q = Warc.streamWet(spark, s"$dir/*.warc.wet.gz", maxFilesPerTrigger = 1)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch = Warc.readWet(spark, s"$dir/*.warc.wet.gz")
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == batch && batch.size == 30)
  }
}
