package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual difference-hash of an image `binary` column (dHash —
  * the 9x8 block-mean grayscale gradient-sign fingerprint; see
  * [[graft.ops.Codecs.dhash64]] for the exact integer pipeline and the
  * reference the q133 oracle replays). Rides the SCAN like the other
  * signature expressions ([[SimHash64]], [[BqPack]]): media bytes are
  * decoded where they are read and only the 8-byte hash ever moves —
  * at 100 TB of images nothing else is viable. NULL for non-image or
  * undecodable bytes and for rasters smaller than the 9x8 grid (no
  * gradient evidence — the no-evidence drop rule; callers filter).
  *
  * Reference scope note: the reference pipeline (pipeline/app.py) has no
  * media path at all — this is part of the mandated training-data
  * extension surface, alongside the text dedup family.
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  def compute(bytes: Array[Byte]): Any =
    graft.ops.Codecs.dhash64(bytes) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None    => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dhash", this, classOf[DHash64].getName)
    // fresh name: the expression can appear twice in ONE codegen scope
    // (e.g. Filter isnotnull(dhash64(m)) + Project dhash64(m)) and a
    // fixed local would redefine, kicking the stage out of codegen
    val r = ctx.freshName("dhashRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}
