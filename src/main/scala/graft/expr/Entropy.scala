package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram token-entropy signals in one tight per-row pass — the
  * RefinedWeb/Dolma "unigram entropy" quality filter re-expressed in the
  * exact-integer discipline every oracle here demands: instead of
  * floating H = Σ (c/N)·log2(N/c), emit
  *
  *   surprisal_sum = Σ over distinct tokens  c · floor(log2(N div c))
  *
  * with integer division FIRST (N div c, the [[graft.ops.Perplexity]]
  * inverse-probability-ratio discipline) and floor(log2(x)) = the minimal
  * binary representation's length minus one — DuckDB `length(bin(x))-1`,
  * so any engine replays the number bit-for-bit. The sum is bounded by
  * N·floor(log2 N) (all tokens unique), zero when one token repeats —
  * downstream a permille normalization by that bound gives a [0,1000]
  * repetitiveness-vs-diversity score (see
  * [[graft.ops.Quality.unigramEntropy]]).
  *
  * Tokenization is lower + split-then-filter (TextAnalysis.tokens
  * semantics; NOT trim-based — control-char-padded text diverges, the
  * round-9 Md5Shingles lesson). All counting happens in a per-row hash
  * map: ZERO shuffles, the [[GopherRepetitionStats]] shape — the
  * explode-tokens → groupBy(doc, token) form this replaces pushes every
  * token through the shuffle.
  */
case class UnigramEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("surprisal_sum", LongType, nullable = false)))

  override def prettyName: String = "unigram_entropy_stats"

  /** floor(log2 x) for x >= 1; 0 for x <= 0 (never hit: N div c >= 1). */
  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  def compute(text: UTF8String): InternalRow = {
    val counts = new java.util.HashMap[String, Long]()
    var n = 0L
    // Locale.ROOT: default-locale lowercasing diverges from Spark/DuckDB
    // lower() under tr_TR (I -> dotless ı) and breaks the oracle replay
    val parts = text.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        counts.merge(parts(i), 1L, (a, b) => a + b)
        n += 1
      }
      i += 1
    }
    var surp = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      surp += c * ilog2(n / c)
    }
    InternalRow(n, counts.size.toLong, surp)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniEnt", this, classOf[UnigramEntropyStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEntropyStats =
    copy(child = newChild)
}
