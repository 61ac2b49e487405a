package graft

import graft.sources.Jdbc
import graft.sinks.JdbcSink

class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  // Embedded Derby ships on Spark's classpath (Hive-metastore dependency),
  // so the JDBC write path gets a REAL round trip: executor-side batched
  // insert -> read back through the same sources.Jdbc options shape.
  private val derbyUrl = s"jdbc:derby:/tmp/graft_derby_${System.nanoTime()};create=true"
  private val derbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("JdbcSink round trip: write to embedded Derby, read back, frame-equal") {
    val rows = Seq(
      (1L, "alpha", 1.5),
      (2L, "beta", -0.25),
      (3L, null.asInstanceOf[String], 0.0)).toDF("id", "name", "score")
    JdbcSink.write(rows, derbyUrl, "app.enriched", driver = derbyDriver,
      batchSize = 2)
    val back = Jdbc.dim(spark, derbyUrl, "app.enriched", "", "", derbyDriver)
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(Array("id", "name", "score")))
    val got = back.select("id", "name", "score").as[(Long, Option[String], Double)]
      .collect().toSet
    assert(got == Set((1L, Some("alpha"), 1.5), (2L, Some("beta"), -0.25), (3L, None, 0.0)))
    // append mode: second write doubles the rows (the streaming per-batch contract)
    JdbcSink.write(rows, derbyUrl, "app.enriched", driver = derbyDriver)
    assert(Jdbc.dim(spark, derbyUrl, "app.enriched", "", "", derbyDriver).count() == 6)
  }

  test("writeBatchOnce: replayed batch ids are no-ops, new ids write") {
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // batch 0 writes
    assert(JdbcSink.writeBatchOnce(rows, 0L, derbyUrl, "app.once", driver = derbyDriver))
    // replay of batch 0 (checkpoint recovery) skips
    assert(!JdbcSink.writeBatchOnce(rows, 0L, derbyUrl, "app.once", driver = derbyDriver))
    assert(Jdbc.dim(spark, derbyUrl, "app.once", "", "", derbyDriver).count() == 2)
    // batch 1 appends
    assert(JdbcSink.writeBatchOnce(rows, 1L, derbyUrl, "app.once", driver = derbyDriver))
    assert(Jdbc.dim(spark, derbyUrl, "app.once", "", "", derbyDriver).count() == 4)
    // a different sink table tracks its own batch ids
    assert(JdbcSink.writeBatchOnce(rows, 0L, derbyUrl, "app.once2", driver = derbyDriver))
    assert(Jdbc.dim(spark, derbyUrl, "app.once2", "", "", derbyDriver).count() == 2)
  }

  test("JdbcSink options: batched executor write shape") {
    val o = JdbcSink.options("jdbc:postgresql://pg:5432/app", "analytics.engagement_enriched",
      "app", "secret", "org.postgresql.Driver", batchSize = 5000,
      isolationLevel = "NONE", truncate = true)
    assert(o("batchsize") == "5000")
    assert(o("isolationLevel") == "NONE")
    assert(o("truncate") == "true")
    assert(o("dbtable") == "analytics.engagement_enriched")
  }

  test("options: reference shape — single-partition read, driver + creds") {
    val o = Jdbc.options("jdbc:postgresql://pg:5432/app", "public.content",
      "app", "secret")
    assert(o("url") == "jdbc:postgresql://pg:5432/app")
    assert(o("dbtable") == "public.content")
    assert(o("driver") == "org.postgresql.Driver")
    // reference app.py:60-66 configures no partitioning: none emitted
    assert(!o.contains("partitionColumn") && !o.contains("numPartitions"))
  }

  test("options: partitioned read emits all four slice options") {
    val o = Jdbc.options("jdbc:postgresql://pg:5432/app", "public.big_dim",
      "app", "secret",
      partitioning = Some(Jdbc.Partitioning("id", 0L, 1000000L, 16)))
    assert(o("partitionColumn") == "id")
    assert(o("lowerBound") == "0" && o("upperBound") == "1000000")
    assert(o("numPartitions") == "16")
  }

  test("dim: fails fast with a clear error when the driver jar is absent") {
    // No database or JDBC driver exists in this sandbox; the production
    // path must surface the missing-classpath problem at load(), not as a
    // silent empty frame.
    val e = intercept[Exception] {
      Jdbc.dim(spark, "jdbc:postgresql://nohost:5432/app", "public.content",
        "app", "secret")
    }
    def chain(t: Throwable): List[Throwable] =
      Option(t).map(x => x :: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(c => c.isInstanceOf[ClassNotFoundException] ||
      c.getMessage != null && c.getMessage.contains("postgresql")))
  }
}
