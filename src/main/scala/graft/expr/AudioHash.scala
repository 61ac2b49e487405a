package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual audio hash of a WAV `binary` column — the dHash
  * discipline on the 1-D energy envelope (65 frame-mean |amplitude|
  * values, one temporal-gradient sign bit each; see
  * [[graft.ops.Codecs.ahash64]] for the exact integer pipeline the q136
  * oracle replays). Rides the SCAN like [[DHash64]]: audio bytes are
  * decoded where they are read and only the 8-byte hash ever moves —
  * the only viable shape at 100 TB of audio. NULL for non-audio or
  * undecodable bytes and for clips shorter than 65 samples (no gradient
  * evidence — the no-evidence drop rule; callers filter).
  *
  * Reference scope note: the reference pipeline (pipeline/app.py) has no
  * media path at all — this is part of the mandated training-data
  * extension surface, the audio sibling of the image dedup family.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ahash64"

  def compute(bytes: Array[Byte]): Any =
    graft.ops.Codecs.ahash64(bytes) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None    => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahash", this, classOf[AHash64].getName)
    // fresh name: the expression can appear twice in ONE codegen scope
    // (Filter isnotnull(ahash64(m)) + Project ahash64(m)) — a fixed
    // local would redefine and kick the stage out of codegen (the
    // round-9 DHash64 lesson)
    val r = ctx.freshName("ahashRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}
