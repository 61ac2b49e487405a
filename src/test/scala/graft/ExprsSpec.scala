package graft

import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Semantics of the custom Catalyst expressions (graft.expr). These pin the
  * behaviors the DuckDB oracle cannot (engine-specific hashing). */
class ExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("shingleHashes matches xxhash64 of the space-joined n-grams") {
    val df = Seq(("A b C d", 1)).toDF("text", "id")
    val got = df.select(Exprs.shingleHashes(col("text"), 3).as("sh"))
      .as[Seq[Long]].head()
    // lower-cased trigrams: "a b c", "b c d"
    val expect = df.select(array(xxhash64(lit("a b c")), xxhash64(lit("b c d"))).as("e"))
      .as[Seq[Long]].head()
    assert(got == expect)
  }

  test("shingleHashes: shorter-than-n text => one shingle of all tokens; blank => hash of empty string") {
    val df = Seq(("one two", 1), ("   ", 2), ("", 3)).toDF("text", "id")
    val got = df.orderBy("id").select(Exprs.shingleHashes(col("text"), 3).as("sh"))
      .as[Seq[Long]].collect()
    val short = df.limit(1).select(array(xxhash64(lit("one two"))).as("e")).as[Seq[Long]].head()
    val empty = df.limit(1).select(array(xxhash64(lit(""))).as("e")).as[Seq[Long]].head()
    assert(got(0) == short)
    assert(got(1) == empty && got(2) == empty)
  }

  test("shingleHashes dedups repeated shingles") {
    val df = Seq(("x y x y x y", 1)).toDF("text", "id") // trigrams: "x y x","y x y","x y x","y x y"
    val got = df.select(Exprs.shingleHashes(col("text"), 3).as("sh")).as[Seq[Long]].head()
    assert(got.length == 2)
    assert(got.distinct.length == 2)
  }

  test("minhashSig: k elements, equal sets => equal sigs, similar sets agree on most positions") {
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = (1 to 100).map(i => if (i == 50) "CHANGED" else s"tok$i").mkString(" ")
    val far = (200 to 300).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
    val sigs = df.orderBy("id")
      .select(Exprs.minhashSig(Exprs.shingleHashes(col("text"), 3), 32).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 32))
    assert(sigs(0) == sigs(1))
    val agreeNear = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    val agreeFar = sigs(0).zip(sigs(3)).count { case (a, b) => a == b }
    // jaccard(base, near) ~= (98-2)/(98+3+2-...) ~ 0.94 => expect most positions equal
    assert(agreeNear >= 24, s"agreeNear=$agreeNear")
    assert(agreeFar <= 4, s"agreeFar=$agreeFar")
  }

  test("simhash64: near-identical texts are close in hamming, unrelated far") {
    val base = (1 to 200).map(i => s"word$i").mkString(" ")
    val near = (1 to 200).map(i => if (i % 97 == 0) "swapped" else s"word$i").mkString(" ")
    val far = (500 to 700).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
    val sigs = df.orderBy("id").select(Exprs.simhash64(col("text")).as("s")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0) == sigs(1))
    assert(ham(sigs(0), sigs(2)) <= 8, s"near hamming=${ham(sigs(0), sigs(2))}")
    assert(ham(sigs(0), sigs(3)) >= 20, s"far hamming=${ham(sigs(0), sigs(3))}")
    // blank text => 0
    val z = Seq(("  ", 1)).toDF("text", "id").select(Exprs.simhash64(col("text"))).as[Long].head()
    assert(z == 0L)
  }

  test("cosineSim: exact values, zero-vector null, ragged null, float arrays") {
    val df = Seq(
      (1, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (2, Array(1.0f, 2.0f), Array(2.0f, 4.0f)),   // parallel -> 1
      (3, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),   // zero vector -> null
      (4, Array(3.0f, 4.0f), Array(3.0f, 4.0f))    // identical -> 1
    ).toDF("id", "a", "b")
    val got = df.orderBy("id").select(Exprs.cosineSim(col("a"), col("b"))).as[Option[Double]].collect()
    assert(math.abs(got(0).get - 0.0) < 1e-12)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(got(2).isEmpty)
    assert(math.abs(got(3).get - 1.0) < 1e-12)
    // ragged lengths -> null (round 1 would have thrown / misaligned)
    val ragged = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Exprs.cosineSim(col("a"), col("b"))).as[Option[Double]].head()
    assert(ragged.isEmpty)
  }

  test("hyperplaneBucket: deterministic, scale-invariant, empty-safe, <2^planes") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
    val df = Seq((1, v), (2, v.map(x => x * 7.5f)), (3, Array.empty[Float]))
      .toDF("id", "vec")
    val got = df.orderBy("id").select(Exprs.hyperplaneBucket(col("vec"), 12)).as[Long].collect()
    assert(got(0) == got(1), "positive scaling must not change the bucket")
    assert(got(2) == 0L, "empty vector => bucket 0 (no driver-side crash)")
    assert(got(0) >= 0 && got(0) < (1L << 12))
    // stable across evaluations / plans
    val again = df.where(col("id") === 1).select(Exprs.hyperplaneBucket(col("vec"), 12)).as[Long].head()
    assert(again == got(0))
  }
}
