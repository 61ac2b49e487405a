package graft

import graft.sources.Jdbc

class JdbcSpec extends SparkTestBase {

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
