package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch as a mergeable typed Aggregator — the
  * scale path for "top tokens over 100 TB" that q52's exact vocabulary
  * cannot take: the exact form shuffles every distinct token; this sketch
  * is a fixed m-entry map per partition, merged associatively, so the
  * shuffle carries m*#tasks entries no matter the vocabulary size.
  *
  * Guarantees (classic MG + Agarwal et al., "Mergeable Summaries",
  * PODS'12 merge rule):
  *   - counts are UNDER-estimates: approx <= exact;
  *   - total decrement across the stream is bounded, giving
  *     exact - approx <= N/(m+1) for every item (N = stream length);
  *   - any item with exact > N/(m+1) is guaranteed present.
  *
  * The sketch CONTENT depends on partition/merge order (any MG does), but
  * the guarantees above do not — so the driver-checkable query form
  * (q66) emits the exact top-k plus per-item booleans asserting the
  * order-independent invariants, same certification discipline as
  * q43/q45.
  */
object HeavyHitters {

  /** Merge rule: combine counters, then subtract the (m+1)-th largest
    * count and drop non-positive entries — keeps the additive error
    * bound while never exceeding m entries. */
  private[ops] def shrink(b: mutable.Map[String, Long], m: Int): Unit =
    if (b.size > m) {
      val counts = b.values.toArray.sorted(Ordering.Long.reverse)
      val d = counts(m) // (m+1)-th largest
      val dead = b.iterator.collect { case (k, v) if v - d <= 0 => k }.toList
      dead.foreach(b.remove)
      b.mapValuesInPlace((_, v) => v - d)
      ()
    }

  class MisraGriesAgg(m: Int)
      extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    override def zero: mutable.Map[String, Long] = mutable.Map.empty
    override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
      b.update(a, b.getOrElse(a, 0L) + 1L)
      shrink(b, m)
      b
    }
    override def merge(a: mutable.Map[String, Long],
                       b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      shrink(a, m)
      a
    }
    override def finish(r: mutable.Map[String, Long]): Map[String, Long] = r.toMap
    override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Sketch the token stream of `documents` with capacity m. Returns the
    * sketch entries as (token, approx_cnt) rows. */
  def tokenSketch(documents: DataFrame, m: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .as[String]
      .groupByKey(_ => 0) // single global sketch; partials merge map-side
      .agg(new MisraGriesAgg(m).toColumn.name("sk"))
      .flatMap { case (_, sk) => sk.toSeq }
      .toDF("token", "approx_cnt")
  }

  /** Driver-checkable certification (q66): the EXACT top-k tokens with
    * exact counts, plus order-independent sketch invariants as booleans:
    * present_ok — the item is in the sketch OR its exact count is under
    * the N/(m+1) retention threshold; bound_ok — when present, the
    * sketch's estimate e satisfies 0 <= exact - e <= N/(m+1). */
  def certifiedTopTokens(documents: DataFrame, k: Int = 10, m: Int = 16): DataFrame = {
    val exact = documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(k)
    val sketch = tokenSketch(documents, m)
    val n = documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .agg(count(lit(1)).as("n"))
    val bound = (col("n") / (m + 1)).cast("double")
    exact
      .join(sketch, Seq("token"), "left")
      .crossJoin(broadcast(n))
      .select(col("token"), col("exact_cnt"),
        (col("approx_cnt").isNotNull || col("exact_cnt") <= bound).as("present_ok"),
        (col("approx_cnt").isNull ||
          (col("approx_cnt") <= col("exact_cnt") &&
            (col("exact_cnt") - col("approx_cnt")) <= bound)).as("bound_ok"))
  }
}
