package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // pathological key distribution: one key owns 90% of the rows
  private val facts = ((1 to 900).map(i => (i.toLong, "hot")) ++
    (1 to 100).map(i => (900L + i, s"k${i % 10}"))).toDF("row_id", "key")
  private val dim = (Seq("hot") ++ (0 until 10).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"payload-$i") }.toDF("key", "payload")

  test("saltedJoin == plain join (inner), hot key spread over buckets") {
    val plain = facts.join(dim, Seq("key")).select("row_id", "key", "payload")
      .as[(Long, String, String)].collect().sorted.toList
    val salted = Skew.saltedJoin(facts, dim, "key", buckets = 8,
      discriminator = Some(col("row_id"))).select("row_id", "key", "payload")
      .as[(Long, String, String)].collect().sorted.toList
    assert(salted == plain)
    // the hot key's fact rows really do land in multiple salt buckets
    val spread = facts.where($"key" === "hot")
      .select(Skew.salt(8, col("row_id")).as("s"))
      .distinct().count()
    assert(spread >= 6, s"hot key used only $spread of 8 salt buckets")
  }

  test("saltedJoin preserves left-join semantics for unmatched keys") {
    val factsU = facts.union(Seq((9999L, "unmatched")).toDF("row_id", "key"))
    val plain = factsU.join(dim, Seq("key"), "left").count()
    val salted = Skew.saltedJoin(factsU, dim, "key", buckets = 4, joinType = "left",
      discriminator = Some(col("row_id"))).count()
    assert(salted == plain)
  }

  test("saltedCount == plain count per key") {
    val plain = facts.groupBy("key").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(facts, "key", buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("default discriminator is content-derived (stable across repartitioning)") {
    val a = Skew.saltedCount(facts.repartition(13), "key", buckets = 8)
      .as[(String, Long)].collect().toMap
    val b = Skew.saltedCount(facts.repartition(2), "key", buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
