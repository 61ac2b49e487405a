package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Runtime (Bloom) filter injection: on a selective join, Catalyst can
  * build a bloom filter from the small filtered side and push a
  * `bloom_filter_might_contain` probe into the LARGE side's scan — rows
  * that cannot join are dropped at the scan instead of surviving to the
  * shuffle. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling the ~selectivity fraction that can match.
  * The feature keys off file-source statistics, so the fixture writes
  * real parquet. */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("selective join injects a bloom filter probe on the big side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // keep SMJ so the filter matters
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val tmp = Files.createTempDirectory("graft-rf").toString
    try {
      spark.range(0, 500000).select(col("id").as("k"),
        (col("id") % 97).as("v")).write.mode("overwrite").parquet(s"$tmp/facts")
      spark.range(0, 10000).select(col("id").as("k"),
        (col("id") % 7).as("grp")).write.mode("overwrite").parquet(s"$tmp/dim")
      val facts = spark.read.parquet(s"$tmp/facts")
      val dim = spark.read.parquet(s"$tmp/dim").where(col("grp") === 3) // selective
      val joined = facts.join(dim, "k")
      val n = joined.collect().length
      assert(n == 10000 / 7 + (if (10000 % 7 > 3) 1 else 0))
      val plan = joined.queryExecution.executedPlan.toString
      // rendered as might_contain(subquery over bloom_filter_agg(...))
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom probe, plan:\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
