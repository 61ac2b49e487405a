package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup / similarity hot paths.
  *
  * Round-1 profiling showed the higher-order-function formulations
  * (`transform`/`aggregate` lambdas) dominating the bench: every lambda
  * application is an interpreted Catalyst eval, so a 32-permutation MinHash
  * over a few hundred shingles costs ~10^4 interpreted expression
  * evaluations *per row* (q25 = 312 s of a 345 s total at sf0.1). These
  * expressions do the same math in tight JIT-compiled loops — one virtual
  * call per row from generated code (`ctx.addReferenceObj`), so the
  * surrounding operators stay inside whole-stage codegen and the per-row
  * work runs at native speed. At the 100 TB design point these run at
  * parquet-scan speed; the interpreted HOFs would be the job.
  *
  * All hashing is xxhash64 with Spark's default seed 42 (same family the
  * SQL `xxhash64` function uses), so results are deterministic across
  * sessions and partitionings. Apart from [[WinnowEncodings]] (whose
  * engine-neutral polynomial IS mirrored by the q110/q111 DuckDB
  * oracles) none of these feed a cross-engine oracle — planted-fixture
  * ScalaTests pin their semantics instead.
  */
object Exprs {
  private[expr] val Seed = 42L

  private[expr] def hashUtf8(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, Seed)

  private[expr] def hashLong(v: Long): Long =
    XxHash64Function.hash(v, LongType, Seed)

  /** Lower-cased whitespace tokens; empty/blank text => zero tokens
    * (mirrors graft.ops.TextAnalysis.tokens + lower). */
  private[expr] def tokensOf(text: UTF8String): Array[String] = {
    val t = text.toString.trim
    if (t.isEmpty) Array.empty[String]
    // Locale.ROOT: default-locale lowercasing diverges from Spark/DuckDB
    // lower() under tr_TR (I -> dotless ı) — same fix as UnigramEntropyStats
    else t.toLowerCase(java.util.Locale.ROOT).split("\\s+")
  }

  // ------------------------------------------------------------ wrappers

  def shingleHashes(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text), n))

  def minhashSig(hashes: Column, k: Int = 32): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(hashes), k))

  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  def dhash64(media: Column): Column =
    ExpressionUtils.column(DHash64(ExpressionUtils.expression(media)))

  def ahash64(media: Column): Column =
    ExpressionUtils.column(AHash64(ExpressionUtils.expression(media)))

  def videoShingles(media: Column, n: Int = 2): Column =
    ExpressionUtils.column(VideoShingles(ExpressionUtils.expression(media), n))

  def mediaFormat(media: Column): Column =
    ExpressionUtils.column(MediaFormat(ExpressionUtils.expression(media)))

  def videoFrameCount(media: Column): Column =
    ExpressionUtils.column(VideoFrameCount(ExpressionUtils.expression(media)))

  def unigramEntropyStats(text: Column): Column =
    ExpressionUtils.column(UnigramEntropyStats(ExpressionUtils.expression(text)))

  def quantDot(vec: Column, weights: Seq[Long], qscale: Long = 1024L): Column =
    ExpressionUtils.column(QuantDot(ExpressionUtils.expression(vec), weights, qscale))

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplaneBucket(vec: Column, planes: Int): Column =
    ExpressionUtils.column(HyperplaneBucket(ExpressionUtils.expression(vec), planes))

  def bqPack(vec: Column): Column =
    ExpressionUtils.column(BqPack(ExpressionUtils.expression(vec)))

  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ExpressionUtils.column(NearestCentroids(ExpressionUtils.expression(vec), centroids, nprobe))

  def shingleStrings(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(ShingleStrings(ExpressionUtils.expression(text), n))

  def zValue(a: Column, b: Column): Column =
    ExpressionUtils.column(ZValue(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Double]]],
              coarse: Seq[Seq[Double]] = Nil): Column =
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(vec), codebooks, coarse))

  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    ExpressionUtils.column(PqAdc(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), ksub))

  def normalizeText(text: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(text), form))

  def winnowEncodings(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowEncodings(ExpressionUtils.expression(text), k, w))

  def gopherRepetitionStats(text: Column): Column =
    ExpressionUtils.column(GopherRepetitionStats(ExpressionUtils.expression(text)))

  def md5Shingles(text: Column, n: Int): Column =
    ExpressionUtils.column(Md5Shingles(ExpressionUtils.expression(text), n))

  def charGramBuckets(text: Column, buckets: Int): Column =
    ExpressionUtils.column(CharGramBuckets(ExpressionUtils.expression(text), buckets))

  def linearGramScore(text: Column, weights: Seq[Long]): Column =
    ExpressionUtils.column(LinearGramScore(ExpressionUtils.expression(text), weights))

  def langNbScore(text: Column, langs: Seq[String], weights: Seq[Seq[Long]]): Column =
    ExpressionUtils.column(LangNbScore(ExpressionUtils.expression(text), langs, weights))
}

/** Distinct xxhash64 values of the word `n`-gram shingles of a text column
  * (single pass: tokenize, roll the n-gram window, hash the space-joined
  * shingle, dedup). Texts with fewer than `n` tokens produce the single
  * shingle of all their tokens — including "" for blank text — matching the
  * HOF formulation it replaces (see ops/Dedup.scala round-1 history). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  def compute(text: UTF8String): ArrayData = {
    val toks = Exprs.tokensOf(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < n) {
      seen.add(Exprs.hashUtf8(UTF8String.fromString(toks.mkString(" "))))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(Exprs.hashUtf8(UTF8String.fromString(sb.toString)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** k-element MinHash signature over an array<long> of shingle hashes
  * (Broder '97 min-wise hashing). Each "permutation" j is a strong 64-bit
  * mix of (h XOR phi*j) — the splitmix64 finalizer (Steele et al. '14 /
  * Vigna, public domain) — rather than an affine (a*h+b) mod P map: the
  * affine form is ORDER-PRESERVING whenever a*h fits below the modulus, so
  * for small/clustered hash values every permutation picks the same
  * argmin and the signature degenerates (caught by PropertySpec's
  * jaccard-agreement property: non-identical sets agreed on 0/64
  * positions). One pass over the shingles, k mixes per element in a JIT
  * loop; minima compared as unsigned. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")

  private final val Phi = -7046029254386353131L // 0x9E3779B97F4A7C15

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= -4658895280553007687L // 0xBF58476D1CE4E5B9
    z ^= (z >>> 27); z *= -7723592293110705685L // 0x94D049BB133111EB
    z ^ (z >>> 31)
  }

  def compute(hashes: ArrayData): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, -1L) // unsigned max
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h ^ (Phi * (j + 1)))
        if (java.lang.Long.compareUnsigned(v, sig(j)) < 0) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhasher", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash (Charikar '02) over lower-cased whitespace tokens: bit b
  * of the signature is the sign of the sum over tokens of
  * (+1 if bit b of xxhash64(token) else -1). Blank text => 0L. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(text: UTF8String): Long = {
    val toks = Exprs.tokensOf(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Exprs.hashUtf8(UTF8String.fromString(toks(i)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhasher", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Numeric-array element reader shared by the vector expressions: arrays of
  * float or double, null elements read as 0.0. */
private[expr] trait VectorReader {
  protected def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (arr.isNullAt(i)) 0.0
    else if (isFloat) arr.getFloat(i).toDouble
    else arr.getDouble(i)

  protected def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two numeric vectors in one pass (dot product and
  * both norms accumulated together); NULL when either norm is zero or the
  * lengths differ. Sequential index-order accumulation in double, so the
  * result is deterministic and matches an equivalent sequential oracle. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with VectorReader {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat = isFloatArray(left.dataType)
  @transient private lazy val rightIsFloat = isFloatArray(right.dataType)

  /** @return java.lang.Double or null (zero vector / length mismatch) */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    if (na != b.numElements()) return null
    var dot = 0.0; var n1 = 0.0; var n2 = 0.0
    var i = 0
    while (i < na) {
      val x = elemAt(a, i, leftIsFloat)
      val y = elemAt(b, i, rightIsFloat)
      dot += x * y; n1 += x * x; n2 += y * y
      i += 1
    }
    if (n1 == 0.0 || n2 == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(n1) * math.sqrt(n2)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cos", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Binary quantization (sign-bit) pack: bit i = (component i >= 0) for a
  * ≤64-dim numeric vector, packed into ONE long — 32× smaller than
  * float32 at rest, and `bit_count(a ^ b)` (one XOR + POPCNT) is the
  * 1-bit angular-distance proxy modern vector stores use as a cheap
  * shortlist stage before exact rescoring. Positive scaling preserves
  * every sign, so an exact-copy (or scaled-copy) probe has Hamming 0 to
  * its source — the planted-probe certificate q122 asserts. NULL for
  * null input or >64 dims. */
case class BqPack(child: Expression) extends UnaryExpression with VectorReader {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bq_pack"

  @transient private lazy val childIsFloat = isFloatArray(child.dataType)

  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n > 64) return null
    var sig = 0L
    var i = 0
    while (i < n) {
      if (elemAt(arr, i, childIsFloat) >= 0.0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bq", this, classOf[BqPack].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long ${ev.value}_r = $ref.compute($c);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BqPack =
    copy(child = newChild)
}

/** `planes`-bit hyperplane-LSH bucket (Charikar '02 random projections):
  * bit p = sign(v . plane_p). Plane components are derived from an integer
  * mix of (p, j) — xxhash64(p*1000003 + j) scaled into [-1, 1) — so the
  * planes are reproducible everywhere with zero data movement and no
  * driver-side state (the round-1 Column version needed a driver `.first()`
  * to learn the dimension; here it comes from each row's own array). The
  * per-dimension plane matrix is memoized per expression instance. */
case class HyperplaneBucket(child: Expression, planes: Int) extends UnaryExpression with VectorReader {
  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val childIsFloat = isFloatArray(child.dataType)
  @transient private var cachedDim: Int = -1
  @transient private var cachedPlanes: Array[Array[Double]] = _

  private def planeMatrix(dim: Int): Array[Array[Double]] = {
    if (cachedDim != dim) {
      val m = Array.ofDim[Double](planes, dim)
      var p = 0
      while (p < planes) {
        var j = 0
        while (j < dim) {
          val mixed = Exprs.hashLong(p.toLong * 1000003L + j)
          // (mixed >>> 11) is 53 bits; /2^53 maps to [0,1), *2-1 to [-1,1).
          // Round 2 divided by 2^52 -> components in [-1,3), biasing every
          // plane toward +1; non-centered corpora collapsed into one or two
          // buckets (and the maxBucket cap then dropped their candidates).
          m(p)(j) = ((mixed >>> 11).toDouble / 9007199254740992.0) * 2.0 - 1.0
          j += 1
        }
        p += 1
      }
      cachedPlanes = m
      cachedDim = dim
    }
    cachedPlanes
  }

  def compute(vec: ArrayData): Long = {
    val dim = vec.numElements()
    if (dim == 0) return 0L
    val m = planeMatrix(dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val plane = m(p)
      var proj = 0.0
      var j = 0
      while (j < dim) {
        proj += elemAt(vec, j, childIsFloat) * plane(j)
        j += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketer", this, classOf[HyperplaneBucket].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** IDs of the `nprobe` nearest centroids (squared-L2) for a vector — the
  * IVF coarse-quantizer assignment, evaluated per row in a JIT loop
  * against a centroid matrix shipped inside the plan (nlist x dim doubles,
  * a few KB — the same data a broadcast would carry, without a join).
  * Output is ordered nearest-first; nprobe=1 gives the owning list. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
  extends UnaryExpression with VectorReader {
  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.size)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val childIsFloat = isFloatArray(child.dataType)
  @transient private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray

  def compute(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    val nlist = cents.length
    val d2 = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cent = cents(c)
      val n = math.min(dim, cent.length)
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = elemAt(vec, j, childIsFloat) - cent(j)
        s += d * d
        j += 1
      }
      // NaN components would make every comparison below false and leave
      // no selectable centroid; treat them as infinitely far instead
      d2(c) = if (java.lang.Double.isNaN(s)) Double.PositiveInfinity else s
      c += 1
    }
    // selection of nprobe smallest (nlist is small — tens to thousands);
    // `best == -1` seeds with the first unused slot so all-equal /
    // all-infinite distances still assign deterministically
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](nlist)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < nlist) {
        if (!used(i) && (best == -1 || d2(i) < bestD)) { bestD = d2(i); best = i }
        i += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivf", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Word n-gram shingle STRINGS (the un-hashed twin of ShingleHashes, for
  * operators whose output must be reproducible in a SQL oracle): one pass,
  * lower-cased whitespace tokens, space-joined n-grams, duplicates kept
  * (callers dedup explicitly when set semantics are wanted). Replaces a
  * higher-order-function formulation whose tokenizer was re-evaluated per
  * output shingle — O(tokens^2) interpreted work per row. */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  def compute(text: UTF8String): ArrayData = {
    val toks = Exprs.tokensOf(text)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleStr", this, classOf[ShingleStrings].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** Morton/Z-value of two non-negative 32-bit keys: bit-interleaves the
  * lower 32 bits of each child into one long (a <- even bits, b <- odd).
  * Sorting/range-partitioning by this value clusters BOTH dimensions at
  * once, so parquet row-group min/max statistics prune scans filtered on
  * either key — the single-column sort only helps its own column. JIT
  * bit-twiddling per row; used by graft.ops.Layout. */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  private def spread(v0: Long): Long = {
    // interleave-ready: spread 32 bits to even positions (Morton encode)
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  override def nullSafeEval(a: Any, b: Any): Any = {
    def toL(x: Any): Long = x match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => other.toString.toLong
    }
    compute(toL(a), toL(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zv", this, classOf[ZValue].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute((long)($a), (long)($b));")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder (Jégou/Douze/Schmid, TPAMI 2011): split
  * the vector into `m = codebooks.size` contiguous subvectors and emit,
  * per subspace, the index of the nearest codebook centroid (squared L2).
  * One JIT pass computes all m codes — m * ksub * dsub mults per row, the
  * irreducible PQ-encode cost — vs m interpreted slice+argmin trees.
  * Rows whose dimension differs from m*dsub encode to null (a corpus with
  * ragged vectors should be length-filtered before indexing, not silently
  * truncated). */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                   coarse: Seq[Seq[Double]] = Nil)
  extends UnaryExpression with VectorReader {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty && codebooks.head.head.nonEmpty)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  @transient private lazy val childIsFloat = isFloatArray(child.dataType)
  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val dsub = books(0)(0).length
  @transient private lazy val coarseCents: Array[Array[Double]] =
    coarse.map(_.toArray).toArray

  def compute(vec: ArrayData): ArrayData = {
    val m = books.length
    if (vec.numElements() != m * dsub) return null
    // residual mode (IVF-PQ, Jégou et al. §IV): encode vec - C_nearest;
    // the same nearest-coarse-centroid the inverted-list assignment uses,
    // so encode and placement can never disagree
    val sub: Array[Double] =
      if (coarseCents.isEmpty) null
      else {
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < coarseCents.length) {
          val cent = coarseCents(c)
          val n = math.min(vec.numElements(), cent.length)
          var d2 = 0.0
          var j = 0
          while (j < n) { val d = elemAt(vec, j, childIsFloat) - cent(j); d2 += d * d; j += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        coarseCents(best)
      }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var j = 0
        while (j < dsub) {
          val r = elemAt(vec, off + j, childIsFloat) -
            (if (sub == null || off + j >= sub.length) 0.0 else sub(off + j))
          val d = r - cent(j)
          d2 += d * d
          j += 1
        }
        // NaN never compares <, so a NaN subvector keeps centroid 0 —
        // deterministic, same discipline as NearestCentroids
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r = $ref.compute($v);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) lookup: approximate squared L2 between an
  * UNQUANTIZED query and a PQ-coded vector = Σ_s lut[s*ksub + codes[s]],
  * where the query's per-subspace distance table `lut` was computed once
  * per query (m*ksub entries) on the driver. m table lookups per corpus
  * row — the reason PQ search runs at memory-bandwidth speed. Null when
  * the table length disagrees with m*ksub (wrong codebook generation). */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {
  require(ksub >= 1)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  def compute(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var s = 0
    var acc = 0.0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      acc += lut.getDouble(s * ksub + c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Unicode text normalization for corpus curation, one JIT pass:
  * (1) canonical/compatibility normalize (java.text.Normalizer, `form` in
  * NFC/NFD/NFKC/NFKD), (2) strip C0 controls except tab/newline plus DEL,
  * (3) collapse [space,tab] runs to one space and trim edge spaces. The
  * steps are the standard pre-tokenization cleanup (mojibake-safe dedup
  * keys need (1); (2)/(3) kill the whitespace variance that defeats
  * shingle hashing) and each is expressible in DuckDB for the oracle
  * (nfc_normalize + two regexp_replace + trim — q106). A HOF/UDF chain
  * would be three interpreted passes with two intermediate copies. */
case class NormalizeText(child: Expression, form: String) extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form), s"bad form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  @transient private lazy val formEnum = java.text.Normalizer.Form.valueOf(form)

  def compute(s: UTF8String): UTF8String = {
    val norm = java.text.Normalizer.normalize(s.toString, formEnum)
    val out = new java.lang.StringBuilder(norm.length)
    var pendingSpace = false
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      val isCtl = c < 0x09 || (c >= 0x0B && c < 0x20) || c == 0x7F
      if (!isCtl) {
        if (c == ' ' || c == '\t') pendingSpace = out.length() > 0
        else {
          if (pendingSpace) { out.append(' '); pendingSpace = false }
          out.append(c)
        }
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nt", this, classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}


/** Winnowing sketch encodings (Schleimer/Wilkerson/Aiken '03) in one
  * JIT-compiled pass: whitespace-tokenize, per-codepoint polynomial token
  * hash, k-gram fold, w-window rightmost-minimum select, dedup — emitting
  * the same `pos*2e9+fp` encodings as the HOF formulation this replaces
  * (ops/TextAnalysis.winnow round-6 history). UNLIKE the other
  * expressions in this file, these values DO feed the cross-engine
  * oracle (q110/q111 mirror the math in DuckDB SQL), so the arithmetic
  * is pinned: token hash (acc*131 + codepoint) mod 1e9+7 over CODEPOINTS
  * (matching both Spark's split("")+ascii() and DuckDB's per-character
  * ascii(), astral planes included), gram fold (acc*31 + tv) mod 1e9+7,
  * ties to the RIGHTMOST window minimum, 1-based gram positions.
  * Documents under k+w-1 tokens yield an empty array (the caller's
  * explode drops them — same result as the HOF path's size filter).
  * Interpreted cost was O(tokens*(k+w)) lambda evals per row; this is
  * the identical arithmetic in tight loops behind one virtual call. */
case class WinnowEncodings(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_encodings"

  private def isWs(c: Char): Boolean = // Java regex \s (ASCII class, as split("\\s+"))
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): ArrayData = {
    val P = 1000000007L
    val s = text.toString
    val n = s.length
    // token values: one polynomial per whitespace-delimited token
    var tv = new Array[Long](32)
    var nt = 0
    var acc = 0L
    var in = false
    var i = 0
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        if (in) {
          if (nt == tv.length) tv = java.util.Arrays.copyOf(tv, nt * 2)
          tv(nt) = acc; nt += 1; in = false; acc = 0L
        }
        i += 1
      } else {
        val cp = s.codePointAt(i)
        acc = (acc * 131L + cp) % P
        in = true
        i += Character.charCount(cp)
      }
    }
    if (nt < k + w - 1) return new GenericArrayData(Array.emptyLongArray)
    val ng = nt - k + 1
    val gh = new Array[Long](ng)
    var g = 0
    while (g < ng) {
      var a = 0L
      var j = 0
      while (j < k) { a = (a * 31L + tv(g + j)) % P; j += 1 }
      gh(g) = a; g += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var jw = 0
    val nw = ng - w + 1
    while (jw < nw) {
      var mn = gh(jw)
      var pos = jw
      var t = jw + 1
      while (t < jw + w) { // <= : ties resolve to the RIGHTMOST minimum
        if (gh(t) <= mn) { mn = gh(t); pos = t }
        t += 1
      }
      seen.add((pos + 1).toLong * 2000000000L + mn)
      jw += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this, classOf[WinnowEncodings].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowEncodings =
    copy(child = newChild)
}

/** Gopher repetition signals in one tight per-row pass (Rae et al. 2021
  * table A1): word count, distinct-word count, the most frequent word
  * 2-gram (ties to the codepoint-ascending gram) with its count, and the
  * characters covered by word 3-grams occurring >= 2 times. Replaces the
  * explode-2-grams-and-3-grams -> groupBy(doc, n, gram) shape, which at
  * 1M docs pushed ~237M gram rows through the shuffle (the suite's
  * heaviest per-byte op): all counting happens in a per-row hash map, so
  * the operator is ZERO-shuffle scan-side work. Value-identical to the
  * relational form (same tokenization as [[Exprs.tokensOf]]; short docs
  * degrade to the single all-tokens shingle exactly like
  * [[ShingleStrings]]); GopherFastSpec pins equality, the q116 DuckDB
  * oracle re-derives the relational definition independently.
  *
  * Gram lengths and tie-breaks are in CODEPOINTS (UTF-8 binary order ==
  * codepoint order), matching Spark `length`/UTF8String comparison and
  * DuckDB collation — NOT Java's UTF-16 `String.length`/`compareTo`,
  * which diverge on astral codepoints.
  */
case class GopherRepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top2_cnt", LongType, nullable = false),
    StructField("top2_gram", StringType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))

  override def prettyName: String = "gopher_repetition_stats"

  private def codepointLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** codepoint order == UTF-8 binary order; Java's String.compareTo is
    * UTF-16 order and disagrees above U+E000 vs astral codepoints. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  private def grams(toks: Array[String], n: Int): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    if (toks.length < n) {
      m.put(toks.mkString(" "), 1) // ShingleStrings short-doc degenerate
      return m
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      m.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    m
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Exprs.tokensOf(text)
    val nWords = toks.length.toLong
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { distinct.add(toks(i)); i += 1 }

    // top 2-gram: max count, ties to the codepoint-ascending gram text
    var topGram: String = null
    var topCnt = 0L
    val it2 = grams(toks, 2).entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val c = e.getValue.toLong
      if (c > topCnt || (c == topCnt && (topGram == null || cpCompare(e.getKey, topGram) < 0))) {
        topCnt = c
        topGram = e.getKey
      }
    }

    var dup3 = 0L
    val it3 = grams(toks, 3).entrySet().iterator()
    while (it3.hasNext) {
      val e = it3.next()
      if (e.getValue >= 2) dup3 += e.getValue.toLong * codepointLen(e.getKey)
    }

    org.apache.spark.sql.catalyst.InternalRow(
      nWords, distinct.size.toLong, topCnt,
      UTF8String.fromString(if (topGram == null) "" else topGram), dup3)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRep", this, classOf[GopherRepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepetitionStats =
    copy(child = newChild)
}

/** Hex md5 of every `n`-token shingle of a text column, CASE-SENSITIVE
  * (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
  * Better" matches exact byte spans — unlike [[ShingleStrings]], which
  * lowercases for near-dup recall). One tight pass; emits a 32-char hex
  * string per position, so the per-row payload is O(32·n_tokens) bytes
  * instead of the O(L·n_tokens·token_len) a gram-string array would
  * carry at L=50. Documents with fewer than `n` tokens emit an EMPTY
  * array (no span of length n exists — the short-doc degenerate shingle
  * would wrongly let whole short docs match each other). md5-hex of the
  * UTF-8 bytes of the space-joined gram == Spark `md5()` == DuckDB
  * `md5()`, so the oracle can re-derive identical keys from the gram
  * text. */
case class Md5Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_shingles"

  def compute(text: UTF8String): ArrayData = {
    // split-then-filter, NOT trim-then-split: Java trim strips every char
    // <= U+0020 (including non-\s controls U+0000-U+0008, U+000E-U+001F),
    // which would shift token positions relative to TextAnalysis.tokens /
    // the DuckDB oracle and make exactSubstrDedup cut the wrong spans.
    // This mirrors TextAnalysis.tokens minus the lowercase.
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = Character.forDigit((dig(b) >> 4) & 0xF, 16)
        hex(b * 2 + 1) = Character.forDigit(dig(b) & 0xF, 16)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Shingles", this, classOf[Md5Shingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Shingles =
    copy(child = newChild)
}

/** Hashed character n-gram buckets (n = 2 and 3 combined) of a text
  * column — the fastText-style feature map (Joulin et al. 2016) for
  * language identification: every adjacent codepoint pair/triple folds
  * with the engine-neutral polynomial (`acc·131 + cp mod P`, the same
  * family as the q110 token fold) and lands in `buckets` slots. One
  * tight pass over codepoints (a `substring(t, i, 1)` HOF would seek
  * from the string head per position — O(n²) on UTF-8). Case folding is
  * the CALLER's job (pass `lower(col)`), so Spark/DuckDB `lower`
  * semantics stay in charge rather than Java's locale-sensitive
  * `String.toLowerCase`. Texts under 2 codepoints emit no features.
  * Emission order is 2-gram-then-3-gram per position; consumers
  * aggregate counts, so order never matters cross-engine. */
case class CharGramBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 2, "buckets must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_buckets"

  def compute(text: UTF8String): ArrayData = {
    val P = 1000000007L
    val s = text.toString
    val n = s.length
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.ArrayList[java.lang.Long](2 * n)
    var prev = -1L // codepoint at i-1
    var prev2 = -1L // codepoint at i-2
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i).toLong
      if (prev >= 0) {
        val h2 = (prev * 131L + cp) % P
        out.add(h2 % buckets)
        if (prev2 >= 0) {
          val h3 = (((prev2 * 131L + prev) % P) * 131L + cp) % P
          out.add(h3 % buckets)
        }
      }
      prev2 = prev
      prev = cp
      i += Character.charCount(cp.toInt)
    }
    val arr = new Array[Long](out.size)
    var o = 0
    while (o < arr.length) { arr(o) = out.get(o); o += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charGrams", this, classOf[CharGramBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramBuckets =
    copy(child = newChild)
}

/** Per-row fastText-style classification against a model shipped inside
  * the plan: re-derives [[CharGramBuckets]]'s 2-/3-gram fold inline and
  * accumulates each language's Naive-Bayes weight as the grams stream
  * past — no gram explode, no |langs|-way join, no aggregation; the
  * entire classify stage collapses to scan-side work. The weight matrix
  * is |langs| × buckets longs (5×2048 = 80 KB here) — the same payload
  * a broadcast join would ship, without the join. Output: struct
  * (lang_pred, score); ties resolve to the lexicographically smallest
  * language in codepoint order (== UTF8String binary order, matching
  * the relational min(struct)). Texts under 2 codepoints return null
  * (the no-evidence drop rule — callers filter). */
case class LangNbScore(child: Expression, langs: Seq[String],
                       weights: Seq[Seq[Long]]) extends UnaryExpression {
  require(langs.nonEmpty && weights.size == langs.size &&
    weights.forall(_.size == weights.head.size),
    "weights must be |langs| rows of equal width")

  private val buckets = weights.head.size

  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("score", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "lang_nb_score"

  @transient private lazy val w: Array[Array[Long]] = weights.map(_.toArray).toArray
  // langs in index order; tie-break scans find the smallest lang string
  @transient private lazy val langArr: Array[String] = langs.toArray

  def compute(text: UTF8String): Any = {
    val P = 1000000007L
    val s = text.toString
    val n = s.length
    if (n < 2) return null
    val nl = langArr.length
    val acc = new Array[Long](nl)
    // `n < 2` above is UTF-16 units, not codepoints: a single astral
    // codepoint (length 2) reaches the loop but emits no 2-gram. Track
    // actual feature emission so no-evidence docs return null, matching
    // CharGramBuckets' empty array (the relational path drops them).
    var any = false
    var prev = -1L
    var prev2 = -1L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i).toLong
      if (prev >= 0) {
        any = true
        val b2 = ((prev * 131L + cp) % P % buckets).toInt
        var l = 0
        while (l < nl) { acc(l) += w(l)(b2); l += 1 }
        if (prev2 >= 0) {
          val b3 = ((((prev2 * 131L + prev) % P) * 131L + cp) % P % buckets).toInt
          l = 0
          while (l < nl) { acc(l) += w(l)(b3); l += 1 }
        }
      }
      prev2 = prev
      prev = cp
      i += Character.charCount(cp.toInt)
    }
    if (!any) return null
    var best = 0
    var l = 1
    while (l < nl) {
      // higher score wins; ties to the codepoint-smaller lang string
      if (acc(l) > acc(best) ||
        (acc(l) == acc(best) &&
          UTF8String.fromString(langArr(l)).binaryCompare(
            UTF8String.fromString(langArr(best))) < 0)) best = l
      l += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(langArr(best)), acc(best))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langNb", this, classOf[LangNbScore].getName)
    // fresh name — a fixed local redefines when the expression appears
    // twice in one codegen scope (the DHash64 lesson)
    val r = ctx.freshName("langNbRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LangNbScore =
    copy(child = newChild)
}

/** Scan-side LINEAR scorer over hashed char 2-/3-gram features — the
  * single-output sibling of [[LangNbScore]] (one weight vector instead of
  * a per-language grid): re-derives [[CharGramBuckets]]'s fold inline and
  * accumulates Σ w(bucket) as the grams stream past, plus the feature
  * count so callers can length-normalize (`score_sum div n_feats`). The
  * model ships inside the plan (`buckets` longs — 16 KB at 2048), so a
  * learned quality score costs ZERO joins and zero shuffles on the
  * corpus: it rides the scan, the FineWeb-Edu deployment shape (a
  * classifier head applied to every crawl doc). Docs that emit no gram
  * return null (the no-evidence drop rule, astral-codepoint-safe per the
  * round-9 [[LangNbScore]] fix). */
case class LinearGramScore(child: Expression, weights: Seq[Long])
  extends UnaryExpression {
  require(weights.size >= 2, "weights must have >= 2 buckets")

  private val buckets = weights.size

  override def dataType: DataType = StructType(Seq(
    StructField("score_sum", LongType, nullable = false),
    StructField("n_feats", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "linear_gram_score"

  @transient private lazy val w: Array[Long] = weights.toArray

  def compute(text: UTF8String): Any = {
    val P = 1000000007L
    val s = text.toString
    val n = s.length
    if (n < 2) return null
    var acc = 0L
    var cnt = 0L
    var prev = -1L
    var prev2 = -1L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i).toLong
      if (prev >= 0) {
        acc += w(((prev * 131L + cp) % P % buckets).toInt)
        cnt += 1L
        if (prev2 >= 0) {
          acc += w((((((prev2 * 131L + prev) % P) * 131L) + cp) % P % buckets).toInt)
          cnt += 1L
        }
      }
      prev2 = prev
      prev = cp
      i += Character.charCount(cp.toInt)
    }
    if (cnt == 0L) return null
    org.apache.spark.sql.catalyst.InternalRow(acc, cnt)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linGram", this, classOf[LinearGramScore].getName)
    val r = ctx.freshName("linGramRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LinearGramScore =
    copy(child = newChild)
}
