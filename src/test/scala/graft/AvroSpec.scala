package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Avro

/** Avro interop (sources/Avro): container round-trip over the full
  * supported type lattice, split-driven parallel read of a single file,
  * and loud rejection of the shapes the mapping refuses to guess at. */
class AvroSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath + "/out"

  private def fixture(n: Long) = {
    import spark.implicits._
    spark.range(n).select(
      col("id"),
      (col("id") % 1000).cast("int").as("i"),
      (col("id") % 7).cast("float").as("f"),
      (col("id") * 0.25).as("d"),
      (col("id") % 2 === 0).as("b"),
      when(col("id") % 3 === 0, lit(null: String))
        .otherwise(concat(lit("txt"), col("id"))).as("s"),
      encode(concat(lit("blob"), col("id")), "UTF-8").as("bin"),
      expr("date_add(date'2020-01-01', cast(id % 1000 as int))").as("dt"),
      expr("timestamp_micros(id * 1000001 + 123456)").as("ts"),
      expr("cast(timestamp_micros(id * 999983 + 7) as timestamp_ntz)").as("tsn"),
      array(col("id"), col("id") * 2, col("id") * 3).as("arr"),
      map(lit("k1"), col("id"), lit("k2"), col("id") * 2).as("m"),
      struct(col("id").as("a"), concat(lit("s"), col("id")).as("nested")).as("st"))
  }

  /** Canonical textual image: map entries sorted, binary hexed, rows in
    * id order — stable across the avro HashMap's iteration order. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.selectExpr("id", "i", "f", "d", "b", "s", "hex(bin) bin", "dt", "ts",
        "tsn", "arr", "sort_array(map_entries(m)) me", "st")
      .orderBy("id").toJSON.collect().toSeq

  test("round-trip preserves every supported type, nulls included") {
    val dir = tmp("avro_rt")
    val src = fixture(500)
    Avro.write(src, dir)
    val back = Avro.read(spark, dir)
    // schema fidelity: timestamps/dates come back as the same Spark types
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("tsn").dataType == TimestampNTZType)
    assert(back.schema("dt").dataType == DateType)
    assert(back.schema("bin").dataType == BinaryType)
    assert(back.schema("s").nullable)
    assert(canon(back) == canon(src))
  }

  test("a single container file reads as multiple splits") {
    val dir = tmp("avro_split")
    Avro.write(fixture(20000).coalesce(1), dir, codec = "null")
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(hconf.get(key))
    try {
      hconf.setLong(key, 64 * 1024)
      val back = Avro.read(spark, dir)
      assert(back.rdd.getNumPartitions > 1,
        "sync-marker splitting should yield multiple tasks for one file")
      assert(back.count() == 20000)
      assert(back.agg(sum("id")).head.getLong(0) == 20000L * 19999 / 2)
    } finally old match {
      case Some(v) => hconf.set(key, v)
      case None => hconf.unset(key)
    }
  }

  test("write refuses types the mapping cannot represent") {
    val df = spark.range(3).select(col("id").cast(DecimalType(10, 2)).as("dec"))
    val e = intercept[IllegalArgumentException](Avro.write(df, tmp("avro_bad")))
    assert(e.getMessage.contains("unsupported Spark type"))
  }

  test("[null,T] unions map to nullable; wider unions are rejected") {
    val rec = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"ok","type":["null","long"]},
        |{"name":"plain","type":"string"}]}""".stripMargin)
    val st = Avro.toSparkStruct(rec)
    assert(st("ok").dataType == LongType && st("ok").nullable)
    assert(st("plain").dataType == StringType && !st("plain").nullable)
    val multi = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r2","fields":[
        |{"name":"two","type":["int","string"]}]}""".stripMargin)
    val e = intercept[IllegalArgumentException](Avro.toSparkStruct(multi))
    assert(e.getMessage.contains("union"))
  }
}
