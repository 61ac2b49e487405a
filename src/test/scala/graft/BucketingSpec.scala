package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Bucketing = the shuffle you pay once at write time instead of on every
  * join. At 100 TB, a fact-to-fact equi-join shuffles BOTH sides unless
  * they are co-partitioned on disk; writing both tables bucketed on the
  * join key with the same bucket count lets the sort-merge join read
  * bucket i of each side into the same task — zero exchanges at query
  * time. This spec proves Spark actually elides the shuffle (and that the
  * join is still correct) rather than just asserting we called bucketBy.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    // AQE hides materialized exchanges inside leaf QueryStageExec wrappers —
    // a children-only walk reads "no shuffles" from ANY adaptive plan, so
    // unwrap AdaptiveSparkPlanExec and QueryStageExec explicitly
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case q: QueryStageExec => count(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(count).sum
      case other =>
        other.children.map(count).sum + other.subqueries.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed-bucketed equi-join runs with ZERO shuffles; plain join shuffles both sides") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force SMJ so the exchange question is real
    try {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
      spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS v")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_facts")
      spark.range(0, 500).selectExpr("id AS k", "id * 10 AS w")
        .write.bucketBy(8, "k").mode("overwrite").saveAsTable("b_dim")

      val bucketed = spark.table("b_facts").join(spark.table("b_dim"), "k")
      assert(shuffleCount(bucketed) == 0,
        "bucketed join must not exchange either side")
      assert(bucketed.count() == 10000)

      // identical data, no bucketing -> both sides shuffle
      val plain = spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS v")
        .join(spark.range(0, 500).selectExpr("id AS k", "id * 10 AS w"), "k")
      assert(shuffleCount(plain) >= 2, "plain SMJ shuffles both sides")
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_agg")
    spark.range(0, 10000).selectExpr("id % 100 AS k", "id AS v")
      .write.bucketBy(8, "k").mode("overwrite").saveAsTable("b_agg")
    try {
      val agg = spark.table("b_agg").groupBy("k").count()
      assert(shuffleCount(agg) == 0, "bucket-aligned groupBy needs no exchange")
      assert(agg.count() == 100)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
