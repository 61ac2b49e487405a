package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Packed k-means assignment key over a milli-quantized `array<long>`
  * vector: key = dist²·k + cid for the nearest of the in-plan centroids
  * (min key = smallest dist², ties to the lowest cid — the q188 tie-key
  * device, decoded by mod/div at the call site).
  *
  * Centroids ship INSIDE the expression (the QuantDot/NearestCentroids
  * discipline): one corpus scan, zero joins, vectors never leave the
  * scan. This kernel exists because the interpreted-HOF formulation
  * (one `aggregate(zip_with(...))` per centroid) pays per-ELEMENT
  * interpretation overhead — k·d·rounds evals per row took ~180 s for
  * k=16, d=64 at 100k rows where this tight loop takes ~1 s. NULL for
  * null vectors and for dimension mismatches (a caller bug surfaced as
  * a droppable row, not a crash mid-job); null ELEMENTS contribute no
  * term — SQL SUM skips NULL addends, so reading them as 0 would make
  * the oracle's (mv−cv)² replay diverge by cv² per null dimension. */
case class KmeansKey(child: Expression, cents: Seq[Seq[Long]])
  extends UnaryExpression {
  require(cents.nonEmpty, "centroids must be non-empty")
  require(cents.forall(_.length == cents.head.length),
    "centroids must share one dimensionality")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_key"

  @transient private lazy val c: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  def compute(arr: ArrayData): Any = {
    val k = c.length
    val d = c(0).length
    if (arr.numElements() != d) return null
    var best = Long.MaxValue
    var i = 0
    while (i < k) {
      val ci = c(i)
      var d2 = 0L
      var j = 0
      while (j < d) {
        if (!arr.isNullAt(j)) { // SUM-skip: null dims carry no term
          val t = arr.getLong(j) - ci(j)
          d2 += t * t
        }
        j += 1
      }
      val key = d2 * k + i
      if (key < best) best = key
      i += 1
    }
    java.lang.Long.valueOf(best)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmKey", this, classOf[KmeansKey].getName)
    val r = ctx.freshName("kmRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): KmeansKey =
    copy(child = newChild)
}
