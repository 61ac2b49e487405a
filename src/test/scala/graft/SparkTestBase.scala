package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps the
  * full `sbt test` run fast; suites must not mutate session state). */
object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (BucketingSpec) land in /tmp, not the repo
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${java.util.UUID.randomUUID().toString.take(8)}")
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Conf.ensure(s)
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}
