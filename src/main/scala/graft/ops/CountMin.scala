package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch frequency estimation — the mergeable point-lookup
  * sibling of [[HeavyHitters]]'s Misra-Gries: MG answers "what are the
  * heavy keys", CMS answers "how often did THIS key occur" for any key,
  * in one fixed-size counter table. The scale story mirrors every sketch
  * here: Spark's built-in `count_min_sketch` aggregate computes partials
  * per partition and merges them associatively, so the shuffle carries
  * depth×width counters per task — bounded by (eps, confidence), never by
  * the key cardinality or row count. At 100 TB the driver still receives
  * ONE sketch of a few hundred KB.
  *
  * Determinism: CMS counters are plain sums over hash cells and the
  * estimate is the min over depth cells, so for a fixed seed the estimate
  * is IDENTICAL under any partitioning, merge order, or cluster size —
  * which is what lets q90 emit value-stable bounds booleans.
  *
  * Guarantees (Cormode-Muthukrishnan): estimate >= exact always (counters
  * only over-count via collisions); estimate <= exact + eps·N with
  * probability >= confidence (N = total rows sketched).
  */
object CountMin {

  /** Build one sketch over `keyCol` via the codegen'd built-in aggregate;
    * the single driver-side row is the bounded sketch itself. */
  def sketch(df: DataFrame, keyCol: String, eps: Double = 1e-3,
             confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = df
      .select(expr(s"count_min_sketch($keyCol, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("sk"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Driver-checkable certification (q90): the exact top-k keys with exact
    * counts, plus the order-independent sketch invariants as booleans —
    * lb_ok: estimate >= exact (structural, always true); ub_ok: estimate
    * <= exact + eps·N (probabilistic per (data, seed), but deterministic
    * for a fixed dataset, so it hash-matches an all-TRUE oracle). Both
    * driver collects are bounded: one sketch + k probe rows. */
  def certifiedCounts(df: DataFrame, keyCol: String, k: Int = 10,
                      eps: Double = 1e-3, confidence: Double = 0.999,
                      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cms = sketch(df, keyCol, eps, confidence, seed)
    val topk = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("key").asc)
      .limit(k)
      .as[(Long, Long)].collect()
    val bound = eps * cms.totalCount()
    topk.toSeq.map { case (key, exact) =>
      val est = cms.estimateCount(key)
      (key, exact, est >= exact, est <= exact + bound)
    }.toDF("key", "exact_cnt", "lb_ok", "ub_ok")
  }
}
