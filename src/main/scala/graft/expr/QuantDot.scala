package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Quantized integer dot product of a float-vector column against an
  * in-plan weight vector — the scoring half of the embedding linear
  * probe (q146): each component is fixed-point quantized with
  * q(x) = floor(double(x)·qscale + 0.5) and the score is Σ w(j)·q(x_j),
  * ALL in exact int64 so any engine replays it bit-for-bit (a float dot
  * product is rounding- and order-dependent; integer addition is not —
  * the repo-wide oracle discipline, here applied to vectors).
  *
  * The weights ship INSIDE the expression (the
  * [[LinearGramScore]]/NearestCentroids discipline): one corpus scan,
  * zero joins, and the embedding array never leaves the scan — at 100 TB
  * of vectors this is a scan-speed pass like BqPack. NULL for null
  * vectors and for length mismatches (scoring a vector against a probe
  * trained at a different dimensionality is a caller bug surfaced as a
  * droppable row, not a crash mid-job). */
case class QuantDot(child: Expression, weights: Seq[Long], qscale: Long)
  extends UnaryExpression with VectorReader {
  require(weights.nonEmpty, "weights must be non-empty")
  require(qscale >= 1, "qscale must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_dot"

  @transient private lazy val w: Array[Long] = weights.toArray
  // VectorReader (the CosineSim discipline): float AND double arrays,
  // null elements as 0 — a bare getFloat over an array<double> would
  // read 4-byte strides across 8-byte values and produce silent garbage
  @transient private lazy val isFloat = isFloatArray(child.dataType)

  def compute(arr: ArrayData): Any = {
    if (arr.numElements() != w.length) return null
    var acc = 0L
    var j = 0
    while (j < w.length) {
      val q = math.floor(elemAt(arr, j, isFloat) * qscale + 0.5).toLong
      acc += w(j) * q
      j += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantDot", this, classOf[QuantDot].getName)
    val r = ctx.freshName("qdRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantDot =
    copy(child = newChild)
}
