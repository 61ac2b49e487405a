package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct temporal shingle fingerprints of a VIDEO `binary` column —
  * the whole video-copy-detection signature in one scan-side pass:
  * container parse → per-frame dHash (the [[DHash64]] pipeline per
  * frame) → bounded per-frame fingerprint → consecutive `n`-frame
  * shingle fold → distinct (see [[graft.ops.Codecs.videoShingles]] for
  * the exact integer pipeline the q141 oracle replays).
  *
  * Rides the SCAN like [[DHash64]]/[[AHash64]]: video bytes are decoded
  * where they are read and only the shingle longs (≲ 8 B × frames) ever
  * move — the only viable shape at 100 TB of video. The shingles are
  * order-SENSITIVE (frame-sequence n-grams), so a trimmed or re-muxed
  * copy shares most shingles while a re-ordered cut of the same frames
  * shares almost none — frame-SET hashing cannot make that distinction.
  * NULL for non-video/malformed bytes or any undecodable frame; an
  * empty array for videos shorter than `n` frames (no temporal
  * evidence — the no-evidence drop rule; callers filter).
  *
  * Reference scope note: the reference pipeline (pipeline/app.py) has no
  * media path at all — this is part of the mandated training-data
  * extension surface, the video member of the perceptual dedup family
  * (image [[DHash64]], audio [[AHash64]]).
  */
case class VideoShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "temporal shingle width must be >= 2 (1 would hash single frames, not sequences)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "video_shingles"

  def compute(bytes: Array[Byte]): Any =
    graft.ops.Codecs.videoShingles(bytes, n) match {
      case Some(a) => new GenericArrayData(a)
      case None    => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vshingler", this, classOf[VideoShingles].getName)
    // fresh name: the expression can appear twice in ONE codegen scope
    // (Filter isnotnull + Project) — a fixed local would redefine and
    // kick the stage out of codegen (the round-9 DHash64 lesson)
    val r = ctx.freshName("vshRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (${classOf[ArrayData].getName}) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): VideoShingles =
    copy(child = newChild)
}

/** Container format of a media `binary` column by magic bytes
  * ([[graft.ops.Codecs.sniffFormat]]: ppm/png/jpeg/wav/avi/mp4/gvid) —
  * the scan-side prober a corpus-composition report groups by. NULL for
  * unrecognized bytes (garbage rows drop out of a groupBy the usual
  * way). Rides the scan like the hash expressions: only the short
  * format string leaves it. */
case class MediaFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "media_format"

  def compute(bytes: Array[Byte]): Any =
    graft.ops.Codecs.sniffFormat(bytes) match {
      case Some(f) => org.apache.spark.unsafe.types.UTF8String.fromString(f)
      case None    => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mfmt", this, classOf[MediaFormat].getName)
    val r = ctx.freshName("mfmtRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaFormat =
    copy(child = newChild)
}

/** Frame count of a video container (GVID/AVI/MP4 via
  * [[graft.ops.Codecs.videoFrames]]) — container parse only, no frame
  * decode, so it is cheap enough for a metadata scan over raw crawl
  * video. NULL for non-videos/malformed containers. */
case class VideoFrameCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "video_frame_count"

  def compute(bytes: Array[Byte]): Any =
    graft.ops.Codecs.videoFrames(bytes) match {
      case Some(fs) => java.lang.Long.valueOf(fs.length.toLong)
      case None     => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vfcnt", this, classOf[VideoFrameCount].getName)
    val r = ctx.freshName("vfcRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): VideoFrameCount =
    copy(child = newChild)
}
