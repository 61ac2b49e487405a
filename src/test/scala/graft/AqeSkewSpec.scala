package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: prove the runtime re-planner actually splits a
  * skewed partition (OptimizeSkewedJoin marks the SMJ `skew=true`), not
  * just that the conf is set. Complements ops/Skew (manual salting): AQE
  * is the first line of defense at 100 TB, salting the fallback for
  * aggregations and cases AQE can't touch. */
class AqeSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("OptimizeSkewedJoin splits the hot key's partition (skew=true in plan)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 90% on key 7 -> one partition dwarfs the rest
      val facts = spark.range(0, 200000)
        .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000).as("k"),
          concat(lit("payload_"), col("id")).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("dv"))
      val joined = facts.join(dim, "k")
      // collect() executes THIS dataset's queryExecution (count() would
      // build and run a different derived plan, leaving this one unfinal)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join, plan:\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
