package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a typed `Aggregator` — the scale-path alternative to
  * the `row_number().over(window)` formulation (Relational
  * .topUsersPerEventType):
  *
  *   - window form: shuffle ALL (group, key, cnt) rows to the group's
  *     reducer, full sort, take k — the reducer for a hot group holds the
  *     whole group.
  *   - aggregator form: each map task keeps a BOUNDED k-element buffer per
  *     group (partial aggregation), so the shuffle carries at most
  *     k * #groups * #tasks rows and the reducer merges k-bounded buffers.
  *     For k=10 over a group with 10^8 distinct keys that is a ~10^7x
  *     shuffle reduction.
  *
  * The buffer is a plain sorted Vector (k is small; heap constants don't
  * pay off under Spark's serialize-per-merge pattern). Ordering is total
  * and caller-supplied — (-score, key) with the KEY'S OWN ordering, so a
  * numeric key ties numerically (a lexicographic tie-break on stringified
  * numbers would silently disagree with the SQL form) — and results are
  * exactly equal to the window form (oracle-checked as q42, asserted in
  * TopKSpec).
  */
object TopK {

  class TopKAgg[K: Ordering](k: Int)
    extends Aggregator[(K, Long), Vector[(K, Long)], Vector[(K, Long)]] {

    private implicit val entryOrd: Ordering[(Long, K)] =
      Ordering.Tuple2(Ordering.Long, implicitly[Ordering[K]])

    private def trim(xs: Vector[(K, Long)]): Vector[(K, Long)] =
      xs.sortBy { case (key, score) => (-score, key) }.take(k)

    override def zero: Vector[(K, Long)] = Vector.empty
    override def reduce(b: Vector[(K, Long)], e: (K, Long)): Vector[(K, Long)] = trim(b :+ e)
    override def merge(a: Vector[(K, Long)], b: Vector[(K, Long)]): Vector[(K, Long)] = trim(a ++ b)
    override def finish(r: Vector[(K, Long)]): Vector[(K, Long)] = r
    // kryo: the buffer is an internal k-element blob; no columnar access
    // needed, and kryo round-trips Vector[(K, Long)] without a
    // hand-rolled ExpressionEncoder
    override def bufferEncoder: Encoder[Vector[(K, Long)]] = Encoders.kryo[Vector[(K, Long)]]
    override def outputEncoder: Encoder[Vector[(K, Long)]] = Encoders.kryo[Vector[(K, Long)]]
  }

  /** Top `k` users per event_type by event count — same contract and
    * results as Relational.topUsersPerEventType, aggregator execution. */
  def topUsersPerEventType(events: DataFrame, k: Int = 3): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = events
      .groupBy(col("event_type"), col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long, Long)]
    val agg = new TopKAgg[Long](k).toColumn
    counts
      .groupByKey(_._1)
      .mapValues { case (_, user, cnt) => (user, cnt) }
      .agg(agg.name("top"))
      .flatMap { case (eventType, top) =>
        top.zipWithIndex.map { case ((user, cnt), i) =>
          (eventType, user, cnt, i + 1)
        }
      }
      .toDF("event_type", "user_id", "cnt", "rk")
  }
}
