package graft

import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Dedup, Multimodal}
import graft.expr.Exprs

/** Perceptual audio dedup (energy-envelope hash): the pure frame/pack
  * arithmetic on hand-computed fixtures, the invariances that make it a
  * DUPLICATE detector (volume gain, container re-wrap), the no-evidence
  * null rules, and the banded pair pipeline end-to-end on the planted
  * q136 corpus — the audio twin of DhashSpec.
  */
class AhashSpec extends SparkTestBase {
  import spark.implicits._

  // base formula clip used across tests: samples in [-12000, 12000]
  private def baseSamples(seed: Long, n: Int): Array[Short] = {
    val m = (seed * 2654435761L) % 1000003L
    Array.tabulate(n) { i =>
      val v = i + 7 * m + 1
      (((v * v % 1000003L) * 2654435761L % 1000003L) % 24001L - 12000L).toShort
    }
  }

  test("audioFrames: hand-computed frame sums on a 130-sample clip") {
    // 130 samples into 65 frames -> exactly 2 per frame; |values| known
    val samples = Array.tabulate(130)(i => (if (i % 2 == 0) i else -i).toShort)
    val wav = Codecs.encodeWav(16000, samples)
    val (sums, cnts) = Codecs.audioFrames(wav, 65).get
    assert(cnts.forall(_ == 2L))
    // frame f holds samples 2f and 2f+1 -> |2f| + |2f+1| = 4f + 1
    assert(sums.zipWithIndex.forall { case (s, f) => s == 4L * f + 1 })
  }

  test("audioFrames: floor partition covers every sample once when 65 does not divide n") {
    val samples = Array.fill[Short](100)(7)
    val (sums, cnts) = Codecs.audioFrames(Codecs.encodeWav(8000, samples), 65).get
    assert(cnts.sum == 100L && sums.sum == 700L)
    assert(cnts.forall(c => c == 1L || c == 2L), "frame sizes within one of each other")
  }

  test("ahash64: bit order pinned against an independent per-frame computation") {
    val n = 300
    val samples = baseSamples(5, n)
    val got = Codecs.ahash64(Codecs.encodeWav(16000, samples)).get
    val sums = new Array[Long](65); val cnts = new Array[Long](65)
    for (i <- 0 until n) {
      val f = i * 65 / n
      sums(f) += math.abs(samples(i).toLong); cnts(f) += 1
    }
    var exp = 0L
    for (i <- 0 until 64)
      if (sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) exp |= 1L << i
    assert(got == exp)
  }

  test("volume gain x2 preserves the hash exactly (no clipping)") {
    val base = baseSamples(9, 250)
    val a = Codecs.encodeWav(16000, base)
    val b = Codecs.encodeWav(16000, base.map(s => (s * 2).toShort))
    assert(Codecs.ahash64(a).get == Codecs.ahash64(b).get)
    assert(!java.util.Arrays.equals(a, b), "payload bytes must differ")
  }

  test("container re-wrap: metadata chunk changes bytes, not decode or hash") {
    val wav = Codecs.encodeWav(16000, baseSamples(11, 200))
    val wrapped = Codecs.insertRiffChunk(wav, "LIST", "INFOsome metadata".getBytes)
    assert(!java.util.Arrays.equals(wav, wrapped))
    assert(Codecs.decodeWav(wav).get == Codecs.decodeWav(wrapped).get)
    assert(Codecs.ahash64(wav).get == Codecs.ahash64(wrapped).get)
    // odd-length payload exercises the word-alignment pad
    val odd = Codecs.insertRiffChunk(wav, "LIST", "abc".getBytes)
    assert(Codecs.decodeWav(odd).get == Codecs.decodeWav(wav).get)
  }

  test("no-evidence nulls: garbage, image bytes, sub-65-sample clips") {
    assert(Codecs.ahash64("not audio".getBytes).isEmpty)
    assert(Codecs.ahash64(Codecs.encodePpm(16, 12, (x, y) => (x, y, 0))).isEmpty)
    assert(Codecs.ahash64(Codecs.encodeWav(16000, Array.fill[Short](64)(5))).isEmpty, "n < 65")
    assert(Codecs.ahash64(Codecs.encodeWav(16000, Array.fill[Short](65)(5))).nonEmpty)
    // expression path: null lands as SQL NULL
    val rows = Seq(1L, 2L).toDF("asset_id")
      .withColumn("media",
        when(col("asset_id") === 1, lit("junk".getBytes))
          .otherwise(lit(Codecs.encodeWav(16000, baseSamples(3, 120)))))
      .select(Exprs.ahash64(col("media")))
      .collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
  }

  test("ahashPairs: planted twin cliques found at Hamming 0, no cross-seed pairs") {
    val ids = (1L to 120L).toDF("doc_id")
    val pairs = Dedup.ahashPairs(Multimodal.syntheticAhashAssets(ids))
      .as[(Long, Long, Long)].collect().toSet
    // seeds s = 10,20,..,110: gain twin at s+3, metadata re-wrap at s+6
    val seeds = (10L to 110L by 10L)
    val expected = seeds.flatMap(s =>
      Seq((s, s + 3, 0L), (s, s + 6, 0L), (s + 3, s + 6, 0L))).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected.diff(pairs).take(5)}")
    assert(pairs == expected, s"extra: ${pairs.diff(expected).take(5)}")
  }

  test("ahashSurvivors: twins drop, seed + non-audio pass through") {
    val ids = (1L to 40L).toDF("doc_id")
    val kept = Dedup.ahashSurvivors(Multimodal.syntheticAhashAssets(ids))
      .select("asset_id").as[Long].collect().toSet
    // cliques in 1..40: seeds 10,20,30,40 -> drop 13,16,23,26,33,36
    // (43/46 out of range); garbage id 0 not present, none of 1..40 %97==0
    assert(kept == (1L to 40L).toSet -- Set(13L, 16L, 23L, 26L, 33L, 36L))
  }

  test("ahashPairs: maxBucket cap drops a degenerate identical-clip bucket") {
    val flat = Codecs.encodeWav(16000, baseSamples(2, 150))
    val assets = (1L to 50L).map(i => (i, flat)).toDF("asset_id", "media")
    assert(Dedup.ahashPairs(assets, maxBucket = 10).count() == 0)
    assert(Dedup.ahashPairs(assets, maxBucket = 1000).count() == 50L * 49 / 2)
  }

  test("banding requires maxHamming < blocks (completeness guarantee)") {
    val assets = Seq((1L, Codecs.encodeWav(16000, baseSamples(2, 100)))).toDF("asset_id", "media")
    intercept[IllegalArgumentException] {
      Dedup.ahashPairs(assets, maxHamming = 4, blocks = 4).count()
    }
  }
}
