package graft

import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Dedup, Multimodal}
import graft.expr.Exprs

/** Perceptual image dedup (dHash): the pure grid/pack arithmetic on
  * hand-computed fixtures, the invariances that make it a DUPLICATE
  * detector (brightness shift, cross-codec re-encode, rescale), the
  * no-evidence null rules, and the banded pair pipeline end-to-end on
  * the planted q133 corpus.
  */
class DhashSpec extends SparkTestBase {
  import spark.implicits._

  // base formula image used across tests: values in [0, 200], no clipping
  private def basePx(seed: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((x * 7 + y * 13 + seed) % 201).toInt,
    ((x * 3 + y * 11 + 2 * seed) % 201).toInt,
    ((x * 5 + y * 17 + 3 * seed) % 201).toInt)

  test("grayGrid: hand-computed block means on a 4x4 raster") {
    // gray ramp: pixel (x,y) has r=g=b = 10*(y*4+x) -> luma = that value
    val rgb = Array.tabulate(16) { i => val v = 10 * i; (v << 16) | (v << 8) | v }
    val g = Codecs.grayGrid(Codecs.Pixels(4, 4, rgb), 2, 2).get
    // 2x2 blocks of the 4x4: top-left pixels {0,10,40,50} -> mean 25
    assert(g.toList == List(25L, 45L, 105L, 125L))
  }

  test("dhash64: bit order pinned against an independent per-cell computation") {
    val w = 36; val h = 24
    val bytes = Codecs.encodePpm(w, h, basePx(5))
    val got = Codecs.dhash64(bytes).get
    // independent reference: accumulate the 9x8 grid with plain loops
    val sums = Array.ofDim[Long](8, 9); val cnt = Array.ofDim[Long](8, 9)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = basePx(5)(x, y)
      sums(y * 8 / h)(x * 9 / w) += (299 * r + 587 * g + 114 * b) / 1000
      cnt(y * 8 / h)(x * 9 / w) += 1
    }
    var exp = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (sums(cy)(cx + 1) / cnt(cy)(cx + 1) > sums(cy)(cx) / cnt(cy)(cx))
        exp |= 1L << (cy * 8 + cx)
    assert(got == exp)
  }

  test("brightness shift preserves the hash exactly (no clipping)") {
    val a = Codecs.encodePpm(20, 14, basePx(9))
    val b = Codecs.encodePpm(20, 14, (x, y) => {
      val (r, g, bl) = basePx(9)(x, y); (r + 20, g + 20, bl + 20)
    })
    assert(Codecs.dhash64(a).get == Codecs.dhash64(b).get)
    assert(!java.util.Arrays.equals(a, b), "payload bytes must differ")
  }

  test("cross-codec: PNG re-encode of the same pixels hashes identically") {
    val ppm = Codecs.encodePpm(20, 14, basePx(11))
    val png = Codecs.encodeImageIO(20, 14, "png", basePx(11))
    assert(Codecs.dhash64(ppm).get == Codecs.dhash64(png).get)
  }

  test("JPEG re-encode of a smooth raster stays within small Hamming distance") {
    // smooth gradient (adjacent 9x8 cells differ by ~20 luma): JPEG's
    // lossy wobble (a few luma units) cannot flip gradient signs
    val smooth = (x: Int, y: Int) => { val v = x * 3 + y * 2; (v, v, v) }
    val ppm = Codecs.encodePpm(64, 48, smooth)
    val jpg = Codecs.encodeImageIO(64, 48, "jpg", smooth)
    val d = java.lang.Long.bitCount(Codecs.dhash64(ppm).get ^ Codecs.dhash64(jpg).get)
    assert(d <= 3, s"jpeg hamming $d")
  }

  test("2x downscale of a smooth raster stays within small Hamming distance") {
    val smooth = (x: Int, y: Int) => { val v = x * 3 + y * 2; (v, v, v) }
    val big = Codecs.encodePpm(72, 48, smooth)
    // half-size twin sampled at the same physical positions
    val small = Codecs.encodePpm(36, 24, (x, y) => smooth(x * 2, y * 2))
    val d = java.lang.Long.bitCount(Codecs.dhash64(big).get ^ Codecs.dhash64(small).get)
    assert(d <= 3, s"resize hamming $d")
  }

  test("no-evidence nulls: garbage, WAV audio, sub-9x8 rasters") {
    assert(Codecs.dhash64("not an image".getBytes).isEmpty)
    assert(Codecs.dhash64(Codecs.encodeWav(16000, Array[Short](1, 2, 3))).isEmpty)
    assert(Codecs.dhash64(Codecs.encodePpm(8, 8, basePx(1))).isEmpty, "w < 9")
    assert(Codecs.dhash64(Codecs.encodePpm(9, 7, basePx(1))).isEmpty, "h < 8")
    assert(Codecs.dhash64(Codecs.encodePpm(9, 8, basePx(1))).nonEmpty)
    // expression path: null lands as SQL NULL
    val rows = Seq(1L, 2L).toDF("asset_id")
      .withColumn("media",
        when(col("asset_id") === 1, lit("junk".getBytes))
          .otherwise(lit(Codecs.encodePpm(16, 12, basePx(3)))))
      .select(Exprs.dhash64(col("media")))
      .collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
  }

  test("dhashPairs: planted twin cliques found at Hamming 0, no cross-seed pairs") {
    val ids = (1L to 120L).toDF("doc_id")
    val pairs = Dedup.dhashPairs(Multimodal.syntheticDhashAssets(ids))
      .as[(Long, Long, Long)].collect().toSet
    // seeds s = 10,20,..,110 (s%10==0): twin at s+3, png re-encode at s+6
    // -> 3-clique per seed, except garbage ids (none of 10..116 hit %97==0
    // except 97 itself: 97 is not in any clique class — 97%10==7)
    val seeds = (10L to 110L by 10L)
    val expected = seeds.flatMap(s =>
      Seq((s, s + 3, 0L), (s, s + 6, 0L), (s + 3, s + 6, 0L))).toSet
    assert(expected.subsetOf(pairs),
      s"missing: ${expected.diff(pairs).take(5)}")
    // nothing beyond the planted cliques (cross-seed hashes are ~32 apart)
    assert(pairs == expected, s"extra: ${pairs.diff(expected).take(5)}")
  }

  test("dhashPairs: maxBucket cap drops a degenerate monochrome bucket") {
    // 50 identical flat images -> one bucket of 50 in every band; cap 10
    // drops them all, cap 1000 keeps the clique
    val flat = Codecs.encodePpm(16, 12, (_, _) => (100, 100, 100))
    val assets = (1L to 50L).map(i => (i, flat)).toDF("asset_id", "media")
    assert(Dedup.dhashPairs(assets, maxBucket = 10).count() == 0)
    assert(Dedup.dhashPairs(assets, maxBucket = 1000).count() == 50L * 49 / 2)
  }

  test("banding requires maxHamming < blocks (completeness guarantee)") {
    val assets = Seq((1L, Codecs.encodePpm(16, 12, basePx(2)))).toDF("asset_id", "media")
    intercept[IllegalArgumentException] {
      Dedup.dhashPairs(assets, maxHamming = 4, blocks = 4).count()
    }
  }
}
