package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.model.Tables

/** Regression coverage for the events-loader dtype dispatch.
  *
  * The driver's testdata has shipped `events.ts` as parquet TIMESTAMP(NANOS)
  * (loads as Long under nanosAsLong), then regenerated it as timestamp[us]
  * without tz (loads as TIMESTAMP_NTZ) — the round-7 gate went red because
  * the loader assumed the first shape. This spec writes one fixture per
  * physical shape and asserts they all normalize to the identical
  * microsecond TimestampType instants.
  */
class TablesSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  // Two instants, chosen with sub-millisecond micros so the NTZ/us path
  // must preserve precision the old div-by-1000 nanos path also produced.
  private val microsUtc = Seq(1700000000123456L, 1712345678654321L)

  private def writeFixture(dt: DataType, rows: Seq[Any]): String = {
    val dir = Files.createTempDirectory("graft-events-fixture").toFile
    dir.deleteOnExit()
    val schema = StructType(Seq(
      StructField("event_id", StringType),
      StructField("ts", dt)))
    val data = rows.zipWithIndex.map { case (v, i) => Row(s"e$i", v) }
    spark.createDataFrame(data.asJava, schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  private def loadedMicros(sfDir: String): Seq[Long] =
    Tables.events(spark, sfDir)
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .orderBy("event_id")
      .collect().map(_.getLong(1)).toSeq

  test("Long-nanos fixture (old TIMESTAMP(NANOS) testdata) normalizes") {
    val dir = writeFixture(LongType, microsUtc.map(_ * 1000L + 789L)) // +ns dust
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(loadedMicros(dir) === microsUtc) // nanos truncated, not rounded
  }

  test("TIMESTAMP_NTZ fixture (regenerated timestamp[us] testdata) normalizes") {
    val ntz = microsUtc.map { us =>
      LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)
    }
    val dir = writeFixture(TimestampNTZType, ntz)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    // Session TZ is UTC (Conf), so NTZ wall-clock == the same UTC instant.
    assert(loadedMicros(dir) === microsUtc)
  }

  test("TimestampType fixture (tz-adjusted parquet) passes through") {
    val ts = microsUtc.map { us =>
      val t = new Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    val dir = writeFixture(TimestampType, ts)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(loadedMicros(dir) === microsUtc)
  }

  test("all three physical shapes load identical instants") {
    val nanosDir = writeFixture(LongType, microsUtc.map(_ * 1000L))
    val ntzDir = writeFixture(TimestampNTZType, microsUtc.map { us =>
      LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)
    })
    assert(loadedMicros(nanosDir) === loadedMicros(ntzDir))
  }

  test("driver testdata sf0.001 events loads with a TimestampType ts") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }

  test("ISO-string fixture (CSV/JSON-era writer shape) parses in UTC") {
    val iso = microsUtc.map { us =>
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
        .toString.replace("Z", "").replace("T", " ")
    }
    val dir = writeFixture(StringType, iso)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(loadedMicros(dir) === microsUtc)
  }

  test("unsupported ts dtype fails loudly at load, not at analysis") {
    val dir = writeFixture(DoubleType, Seq(1.5d, 2.5d))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("Verify summary JSON shape is driver-parseable") {
    val ok = Verify.summaryJson(5, Nil)
    assert(ok === """{"tool":"verify","n_ok":5,"n_err":0,"errors":{}}""")
    val bad = Verify.summaryJson(3,
      Seq("q01" -> """boom "quoted"""", "q02" -> "tab\there"))
    assert(bad.contains(""""n_err":2"""))
    assert(bad.contains("""\"quoted\""""))
    assert(bad.contains("""tab\there"""))
  }
}
