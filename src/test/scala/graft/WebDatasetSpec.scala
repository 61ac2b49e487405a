package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Multimodal}
import graft.sources.WebDataset

/** WebDataset tar shards: ustar bytes a real `tar` accepts (header
  * format pinned by hand), strict-parse rejection, bit-exact media
  * roundtrip through shards, sample adjacency, deterministic re-write. */
class WebDatasetSpec extends SparkTestBase {
  import spark.implicits._

  test("ustar entry format pinned: name, octal size, checksum, padding, terminator") {
    val data = "hello world".getBytes
    val tar = WebDataset.tarBytes(Seq("000000000007.txt" -> data))
    // header + 512-padded data + 1024 terminator
    assert(tar.length == 512 + 512 + 1024)
    assert(new String(tar, 0, 16, "US-ASCII") == "000000000007.txt")
    // size field: 11 octal digits + space
    assert(new String(tar, 124, 12, "US-ASCII") == "00000000013 ")
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar")
    assert(tar(156) == '0')
    // checksum recomputes
    var sum = 0L
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toByte else tar(i)) & 0xff
    val cs = new String(tar, 148, 8, "US-ASCII").takeWhile(c => c >= '0' && c <= '7')
    assert(java.lang.Long.parseLong(cs, 8) == sum)
    // POSIX ustar checksum terminator: six digits, NUL, space
    assert(cs.length == 6 && tar(154) == 0 && tar(155) == ' '.toByte)
    // data + zero padding
    assert(new String(tar, 512, data.length, "US-ASCII") == "hello world")
    assert(tar.slice(512 + data.length, 1024).forall(_ == 0))
    // parser roundtrip
    val back = WebDataset.tarEntries(tar).get
    assert(back.map(_._1) == Seq("000000000007.txt"))
    assert(back.head._2.sameElements(data))
  }

  test("system tar lists the archive (external-reader acceptance)") {
    val tarBin = Seq("/bin/tar", "/usr/bin/tar")
      .find(p => new java.io.File(p).exists())
    assume(tarBin.isDefined, "no system tar in this container")
    val f = Files.createTempFile("wds_ext", ".tar")
    Files.write(f, WebDataset.tarBytes(Seq(
      "000000000001.txt" -> "hello".getBytes("UTF-8"),
      "000000000001.img" -> Array.fill[Byte](600)(7))))
    val out = new StringBuilder
    val p = new ProcessBuilder(tarBin.get, "-tf", f.toString)
      .redirectErrorStream(true).start()
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach(l => out.append(l).append('\n'))
    assert(p.waitFor() == 0, s"tar rejected the shard: $out")
    assert(out.toString.linesIterator.toSeq ==
      Seq("000000000001.txt", "000000000001.img"))
  }

  test("strict parse: truncation, corrupt checksum, missing terminator reject") {
    val tar = WebDataset.tarBytes(Seq("a.bin" -> Array.fill[Byte](700)(3)))
    assert(WebDataset.tarEntries(java.util.Arrays.copyOf(tar, tar.length - 100)).isEmpty,
      "terminator cut")
    assert(WebDataset.tarEntries(java.util.Arrays.copyOf(tar, 600)).isEmpty,
      "data cut")
    val bad = tar.clone(); bad(148) = '7' // corrupt checksum digit
    assert(WebDataset.tarEntries(bad).isEmpty)
    assert(WebDataset.tarEntries("not a tar at all".getBytes).isEmpty)
    // empty archive (just the terminator) is valid and empty
    assert(WebDataset.tarEntries(new Array[Byte](1024)).get.isEmpty)
  }

  test("media shards roundtrip bit-exact; samples adjacent; uniform fill") {
    val dir = Files.createTempDirectory("wds").toString
    val assets = Multimodal.syntheticDhashAssets((0L until 57L).toDF("doc_id"))
      .withColumn("caption", concat(lit("caption of "), col("asset_id")))
    WebDataset.writeShards(assets, dir, perShard = 10,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    val back = WebDataset.readShards(spark, dir)
    val rows = back.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getAs[Array[Byte]](3)))
    // 57 samples x 2 parts
    assert(rows.length == 114)
    // 6 shards: five full (10 samples) + one of 7
    val perShard = rows.groupBy(_._1).view.mapValues(_.length / 2).toMap
    assert(perShard.size == 6 && perShard.values.toSeq.sorted == Seq(7, 10, 10, 10, 10, 10))
    // bit-exact media
    val media = assets.select(col("asset_id"), col("media")).collect()
      .map(r => f"${r.getLong(0)}%012d" -> r.getAs[Array[Byte]](1)).toMap
    rows.filter(_._3 == "img").foreach { case (_, k, _, d) =>
      assert(d.sameElements(media(k)), s"media for $k corrupted") }
    rows.filter(_._3 == "txt").foreach { case (_, k, _, d) =>
      assert(new String(d, "UTF-8") == s"caption of ${k.toLong}") }
    // adjacency: within each shard's archive order, the two entries of a
    // sample are consecutive
    val raw = spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select("content").collect().map(_.getAs[Array[Byte]](0))
    raw.foreach { t =>
      val names = WebDataset.tarEntries(t).get.map(_._1)
      names.grouped(2).foreach { g =>
        assert(g.map(_.split("\\.").head).distinct.size == 1,
          s"sample entries not adjacent: $g") }
    }
    // deterministic: re-write produces identical shard bytes
    val before = raw.map(t => java.util.Arrays.hashCode(t)).sorted.toSeq
    WebDataset.writeShards(assets, dir, perShard = 10,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    val after = spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select("content").collect()
      .map(r => java.util.Arrays.hashCode(r.getAs[Array[Byte]](0))).sorted.toSeq
    assert(after == before, "re-write must be byte-identical")
  }

  test("shard bytes invariant to input partitioning; NULL/duplicate ids rejected") {
    val base = Multimodal.syntheticDhashAssets((0L until 37L).toDF("doc_id"))
      .withColumn("caption", concat(lit("c"), col("asset_id")))
    def bytesOf(dir: String): Seq[Int] =
      spark.read.format("binaryFile").load(s"$dir/*.tar")
        .select("content").collect()
        .map(r => java.util.Arrays.hashCode(r.getAs[Array[Byte]](0))).sorted.toSeq
    val d1 = Files.createTempDirectory("wdsp1").toString
    val d2 = Files.createTempDirectory("wdsp2").toString
    WebDataset.writeShards(base.repartition(7), d1, perShard = 8,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    WebDataset.writeShards(base.repartition(3), d2, perShard = 8,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    assert(bytesOf(d1) == bytesOf(d2),
      "shard bytes must not depend on input partitioning")
    // NULL id: rejected loudly (getAs[Long] would silently rank it as 0)
    val withNull = base.withColumn("asset_id",
      when(col("asset_id") === 5, lit(null)).otherwise(col("asset_id")))
    val e1 = intercept[org.apache.spark.SparkException] {
      WebDataset.writeShards(withNull, Files.createTempDirectory("wdsn").toString, 8)
    }
    assert(e1.getMessage.contains("NULL id"))
    // duplicate ids: rejected loudly (entry names would collide)
    val withDup = base.withColumn("asset_id", col("asset_id") % 10)
    val e2 = intercept[org.apache.spark.SparkException] {
      WebDataset.writeShards(withDup, Files.createTempDirectory("wdsd").toString, 8)
    }
    assert(e2.getMessage.contains("duplicate id"))
  }

  test("NULL parts skip their entry; dedup stack runs straight off shard rows") {
    val dir = Files.createTempDirectory("wds2").toString
    val assets = Multimodal.syntheticDhashAssets((0L until 20L).toDF("doc_id"))
      .withColumn("caption",
        when(col("asset_id") % 3 === 0, concat(lit("c"), col("asset_id"))))
    WebDataset.writeShards(assets, dir, perShard = 8,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    val back = WebDataset.readShards(spark, dir)
    assert(back.where(col("ext") === "txt").count() == 7) // ids 0,3,..,18
    assert(back.where(col("ext") === "img").count() == 20)
    // the reader's rows feed the perceptual dedup engine directly — the
    // format is an INPUT layout, not a dead end
    val pairs = graft.ops.Dedup.dhashPairs(
      back.where(col("ext") === "img")
        .select(col("key").cast("long").as("asset_id"), col("data").as("media")))
    // q133 twin classes exist inside 0..19 (13 pairs with 10, 16 with 10)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 13L)) && got.contains((10L, 16L)))
  }

  /** Skewed-size fixture for the byte-budget path: every 9th sample is
    * ~50 KB (3+ budget multiples at 16 KiB), the rest ~40-600 B, plus a
    * sometimes-NULL caption — the 4-orders-of-magnitude variance the
    * byte contract exists for. */
  private def skewedAssets = (0L until 80L).toDF("asset_id")
    .withColumn("_n", when(col("asset_id") % 9 === 0,
        lit(50000L) + col("asset_id") * 31L)
      .otherwise(lit(40L) + col("asset_id") * 7L))
    .withColumn("media", expr("cast(repeat('x', cast(_n as int)) as binary)"))
    .withColumn("caption",
      when(col("asset_id") % 3 === 0, concat(lit("cap "), col("asset_id"))))
    .drop("_n")

  test("byte-budget shards: assignment matches the prefix rule; spread bounded; roundtrip") {
    val budget = 16384L
    val dir = Files.createTempDirectory("wdsb").toString
    WebDataset.writeShardsBytes(skewedAssets, dir, budget,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    // replicate the documented rule independently: sample s lands in the
    // shard of its start offset in the id-ordered concatenation, bins
    // renumbered densely in first-seen order
    def entryCost(n: Long): Long = 512L + (n + 511L) / 512L * 512L
    val rows = skewedAssets.select("asset_id", "media", "caption").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
        Option(r.getString(2)))).sortBy(_._1)
    var pos = 0L
    val rawBin = rows.map { case (id, m, c) =>
      val start = pos
      pos += entryCost(m.length) + c.map(s =>
        entryCost(s.getBytes("UTF-8").length.toLong)).getOrElse(0L)
      id -> start / budget
    }
    val dense = rawBin.map(_._2).distinct.sorted.zipWithIndex.toMap
    val expected = rawBin.map { case (id, b) => id -> dense(b).toLong }.toMap
    val back = WebDataset.readShards(spark, dir)
      .select(col("shard"), col("key").cast("long").as("id"), col("ext"), col("data"))
      .collect()
    val gotShard = back.map(r =>
      r.getLong(1) -> r.getString(0).stripPrefix("shard-").stripSuffix(".tar").toLong)
      .toMap
    assert(gotShard == expected, "shard assignment must match the prefix rule")
    // spread: no shard exceeds budget + one sample's footprint (a
    // straddling sample stays in the earlier shard — bounded overshoot)
    val maxSample = rows.map { case (_, m, c) =>
      entryCost(m.length) + c.map(s =>
        entryCost(s.getBytes("UTF-8").length.toLong)).getOrElse(0L) }.max
    val shardDataBytes = back.groupBy(r => r.getString(0)).view.mapValues(
      _.map(r => entryCost(r.getAs[Array[Byte]](3).length.toLong)).sum).toMap
    assert(shardDataBytes.size > 3, s"budget must split: $shardDataBytes")
    shardDataBytes.foreach { case (s, n) =>
      assert(n <= budget + maxSample, s"shard $s overshoots: $n") }
    // bit-exact media roundtrip
    val media = rows.map { case (id, m, _) => id -> m }.toMap
    back.filter(_.getString(2) == "img").foreach { r =>
      assert(r.getAs[Array[Byte]](3).sameElements(media(r.getLong(1)))) }
    assert(back.count(_.getString(2) == "txt") == rows.count(_._3.isDefined))
  }

  test("byte-budget shards: bytes invariant to input partitioning; NULL id rejected") {
    def bytesOf(dir: String): Seq[Int] =
      spark.read.format("binaryFile").load(s"$dir/*.tar")
        .select("content").collect()
        .map(r => java.util.Arrays.hashCode(r.getAs[Array[Byte]](0))).sorted.toSeq
    val d1 = Files.createTempDirectory("wdsb1").toString
    val d2 = Files.createTempDirectory("wdsb2").toString
    WebDataset.writeShardsBytes(skewedAssets.repartition(7), d1, 16384L,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    WebDataset.writeShardsBytes(skewedAssets.repartition(3), d2, 16384L,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    assert(bytesOf(d1) == bytesOf(d2),
      "shard bytes must not depend on input partitioning")
    // determinism: re-write in place is byte-identical
    WebDataset.writeShardsBytes(skewedAssets, d1, 16384L,
      parts = Seq("media" -> "img", "caption" -> "txt"))
    assert(bytesOf(d1) == bytesOf(d2), "re-write must be byte-identical")
    val withNull = skewedAssets.withColumn("asset_id",
      when(col("asset_id") === 5, lit(null)).otherwise(col("asset_id")))
    val e = intercept[org.apache.spark.SparkException] {
      WebDataset.writeShardsBytes(withNull,
        Files.createTempDirectory("wdsbn").toString, 16384L)
    }
    assert(e.getMessage.contains("NULL id"))
  }
}
