package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC/WET ingestion throughput smoke (round 14): write a synthetic
  * ~120-token corpus as Common-Crawl-shaped WET and raw-WARC response
  * files, read both back through the strict member walk, and pin the
  * numbers in BENCH_NOTES ("WARC smoke"). Correctness is asserted
  * alongside the timings (row counts and total body octets must match
  * the source exactly — a fast reader that drops records is not fast).
  *
  *   sbt "runMain graft.WarcSmoke 100000"
  */
object WarcSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("https://h"), pmod(col("id"), lit(997)),
        lit(".example.com/p/"), col("id").cast("string")).as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      concat_ws(" ", transform(sequence(lit(1), lit(120)), j =>
        concat(lit("tok"), pmod(col("id") * 131 + j * 7, lit(1000003)),
          lit("_"), j))).as("text"))
      .repartition(32).persist()
    val srcOctets = docs.agg(sum(octet_length(col("text"))))
      .head().getLong(0)
    println(s"corpus: ${docs.count()} docs, $srcOctets text octets")
    val base = java.nio.file.Files.createTempDirectory("warc_smoke").toString

    var t0 = System.nanoTime()
    sources.Warc.writeWet(docs, s"$base/wet", perFile = 2000)
    println(f"writeWet($n docs -> ${(n + 1999) / 2000} files): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val wet = sources.Warc.readWet(spark, s"$base/wet/*.warc.wet.gz")
      .agg(count(lit(1)), sum(octet_length(col("text")))).head()
    println(f"readWet: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"${wet.getLong(0)} docs, ${wet.getLong(1)} octets")
    assert(wet.getLong(0) == n && wet.getLong(1) == srcOctets,
      "WET roundtrip must be lossless")

    t0 = System.nanoTime()
    val cdx = sources.Warc.cdxIndex(
      sources.Warc.read(spark, s"$base/wet/*.warc.wet.gz")).count()
    println(f"cdxIndex: ${(System.nanoTime() - t0) / 1e9}%.1f s, $cdx rows")
    assert(cdx == n)

    t0 = System.nanoTime()
    sources.Warc.writeResponses(docs
      .withColumn("status", lit(200L)).withColumn("ctype", lit("text/plain")),
      s"$base/warc", perFile = 2000)
    println(f"writeResponses($n docs): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val http = sources.Warc.httpResponses(
        sources.Warc.read(spark, s"$base/warc/*.warc.gz"))
      .agg(count(lit(1)), sum(when(col("http_ok"), 1L).otherwise(0L)),
        sum(octet_length(col("body")))).head()
    println(f"httpResponses: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"${http.getLong(0)} responses, ${http.getLong(1)} ok, " +
      f"${http.getLong(2)} body octets")
    assert(http.getLong(0) == n && http.getLong(1) == n &&
      http.getLong(2) == srcOctets, "HTTP roundtrip must be lossless")
    spark.stop()
  }
}
