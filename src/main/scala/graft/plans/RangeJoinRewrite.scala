package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Optimizer rule: rewrite a pure range join — `l.ts >= r.start AND
  * l.ts < r.end` with NO equi-predicate — into the bucketized equi-join
  * decomposition (ops.Relational.intervalJoin), automatically.
  *
  * Why a Rule and not just the operator: Spark plans a range-only inner
  * join as BroadcastNestedLoopJoin (small side) or CartesianProduct —
  * both enumerate |L|x|R| pairs, which is dead at 100 TB. Users writing
  * the natural `ON ts BETWEEN start AND end` join should get the
  * shuffle-joinable plan without knowing the trick. The rewrite:
  *
  *   Join(L, R, ts >= s && ts < e)
  *     =>  Project(origOutput,
  *           Filter(ts >= s && ts < e,
  *             Join(L + bucket(ts), Generate(explode(bucketRange(s,e)), R),
  *                  bucketL = bucketR)))
  *
  * Each left row has ONE bucket and an interval meets it in exactly that
  * bucket, so the rewrite introduces no duplicates; the residual Filter
  * restores exactness. Semantics-preserving for Inner joins whose
  * condition is precisely the conjunction above with timestamp operands
  * drawn from opposite sides (strictest-possible pattern — anything else
  * is left untouched). The equi-join means Catalyst can then pick SMJ /
  * shuffled-hash with all the usual machinery (AQE, skew handling).
  *
  * Install per-session:  `RangeJoinRewrite.install(spark)`  (uses
  * `spark.experimental.extraOptimizations` — the supported runtime hook),
  * or at session build time via SparkSessionExtensions:
  * `.withExtensions(e => e.injectOptimizerRule(_ => RangeJoinRewrite))`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** Bucket width in seconds; choose near the typical interval length. */
  val BucketSeconds = 3600L

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)

  private def tsSeconds(e: Expression): Expression =
    Cast(e, LongType, Some(SQLConf.get.sessionLocalTimeZone))

  /** floor(seconds / width) as a long — Floor(double) returns LongType. */
  private def bucket(e: Expression): Expression =
    Cast(Floor(Divide(Cast(tsSeconds(e), DoubleType),
      Literal(BucketSeconds.toDouble))), LongType)

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.subsetOf(side.outputSet) && e.references.nonEmpty &&
      e.dataType == TimestampType && e.deterministic

  /** Matches `ts < end` or `ts <= end` — half-open and closed intervals. */
  private object UpperBound {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(ts, end) => Some((ts, end))
      case LessThanOrEqual(ts, end) => Some((ts, end))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right,
        Inner, Some(cond @ And(GreaterThanOrEqual(ts1, start), UpperBound(ts2, end))), hint)
        if ts1.semanticEquals(ts2) &&
          fromSide(ts1, left) && fromSide(start, right) && fromSide(end, right) =>
      val lBucket = Alias(bucket(ts1), "_graft_b")()
      val rBucketAttr = AttributeReference("_graft_b_r", LongType)()
      val lPlan = Project(left.output :+ lBucket, left)
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved, and post-analysis batches reject the plan
      val gen = Explode(Sequence(bucket(start), bucket(end), None,
        Some(SQLConf.get.sessionLocalTimeZone)))
      val rPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(rBucketAttr), child = right)
      val equi = EqualTo(lBucket.toAttribute, rBucketAttr)
      Project(j.output,
        Filter(cond, Join(lPlan, rPlan, Inner, Some(equi), hint)))
  }
}
