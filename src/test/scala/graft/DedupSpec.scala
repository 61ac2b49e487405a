package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Planted-duplicate scenarios for the dedup operators — the correctness
  * story the DuckDB oracle cannot cover (engine-specific hashing). */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact: survivor is min doc_id, dup_cnt counts the group") {
    val d = docs(
      (10L, "alpha beta gamma"),
      (3L, "alpha beta gamma"),
      (7L, "alpha beta gamma"),
      (5L, "something else"),
      (6L, "")) // empty text forms its own group
    val got = Dedup.exact(d).orderBy("doc_id")
      .as[(Long, Long)].collect().toList
    assert(got == List((3L, 3L), (5L, 1L), (6L, 1L)))
  }

  test("exact: same length, different text are NOT merged (128-bit key)") {
    val d = docs((1L, "aaaa"), (2L, "bbbb"), (3L, "cccc"))
    assert(Dedup.exact(d).count() == 3)
  }

  private val base = (1 to 120).map(i => s"tok$i").mkString(" ")
  private val near = (1 to 120).map(i => if (i == 60) "CHANGED" else s"tok$i").mkString(" ")
  private val far = (500 to 620).map(i => s"zzz$i").mkString(" ")

  test("minhashDuplicates finds the planted near-pair and nothing else") {
    val d = docs((1L, base), (2L, near), (3L, far), (4L, base))
    val pairs = Dedup.minhashDuplicates(d, tau = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"missing planted near-dup pair, got $pairs")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)), "exact dup must also pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("incrementalDuplicates: batch vs persisted index finds planted cross-dups only") {
    // corpus: 40 distinct docs; index persisted through parquet (the
    // staging-table round trip a streaming ingest would use)
    val corpus = (1L to 40L).map(i =>
      (i, (1 to 100).map(j => s"c${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val dir = s"/tmp/graft_mh_index_${System.nanoTime()}"
    Dedup.minhashIndex(corpus).write.parquet(dir)
    val index = spark.read.parquet(dir)
    // batch: near-dup of corpus doc 7, exact copy of doc 20, fresh doc
    val nearOf7 = (1 to 100).map(j => if (j == 50) "MUT" else s"c7w$j").mkString(" ")
    val copyOf20 = (1 to 100).map(j => s"c20w$j").mkString(" ")
    val batch = Seq(
      (101L, nearOf7), (102L, copyOf20),
      (103L, (1 to 100).map(j => s"freshw$j").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.incrementalDuplicates(batch, index, tau = 0.7)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 7L), (102L, 20L)), s"got $got")
    // agreement with the batch-rebuild ground truth: cross pairs of a full
    // minhashDuplicates over corpus+batch match the incremental result
    val full = Dedup.minhashDuplicates(corpus.unionAll(batch), tau = 0.7)
      .where(col("doc_b") > 100L && col("doc_a") <= 100L)
      .select(col("doc_b"), col("doc_a")).as[(Long, Long)].collect().toSet
    assert(got == full, s"incremental=$got full-rebuild-cross=$full")
  }

  test("minhashSurvivors keeps min-id representative and unrelated docs") {
    val d = docs((1L, base), (2L, near), (3L, far), (4L, base))
    val survivors = Dedup.minhashSurvivors(d, tau = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L), s"got $survivors")
  }

  test("minhash jaccard value is the exact shingle jaccard") {
    val d = docs((1L, base), (2L, near))
    val j = Dedup.minhashDuplicates(d, tau = 0.1)
      .select("jaccard").as[Double].head()
    // 118 shared trigrams of 120; changed word breaks 3 trigrams
    val shBase = 118; val broken = 3
    val expect = (shBase - broken + 1 - 1).toDouble / (shBase + broken + broken)
    // compute directly instead: |A ∩ B| / |A ∪ B| over trigram sets
    val a = base.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val b = near.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exact = (a & b).size.toDouble / (a | b).size
    assert(math.abs(j - exact) < 1e-12, s"got $j expect $exact (sanity $expect)")
  }

  test("minhash bucket cap drops degenerate buckets") {
    // 50 identical docs: every band bucket has 50 members; cap=10 => no pairs
    val d = (1L to 50L).map(i => (i, base)).toDF("doc_id", "text")
    val sigs = Dedup.signatures(d)
    assert(Dedup.minhashCandidates(sigs, maxBucket = 10).count() == 0)
    assert(Dedup.minhashCandidates(sigs, maxBucket = 100).count() == 50L * 49 / 2)
  }

  test("ngramJaccardPairs equals hand-computed bigram jaccard") {
    val d = docs(
      (1L, "a b c d"),          // bigrams: ab, bc, cd
      (2L, "a b c e"),          // bigrams: ab, bc, ce -> inter 2, union 4 -> 0.5
      (3L, "x y"),              // bigram: xy -> no overlap
      (4L, "a b"))              // bigram: ab -> inter 1 with d1 (union 3), d2 (union 3)
    val got = Dedup.ngramJaccardPairs(d, n = 2, minJaccard = 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((1L, 2L)) == 0.5)
    assert(got((1L, 4L)) == 1.0 / 3)
    assert(got((2L, 4L)) == 1.0 / 3)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs maxDf cap drops stopword-shingle pair explosions") {
    // adversarial corpus: 40 docs share the stopword bigram "of the" but
    // are otherwise disjoint — without a document-frequency cap the
    // postings self-join emits 40*39/2 pair rows through that one shingle
    val d = (1L to 40L).map(i =>
      (i, s"of the unique${i}a unique${i}b unique${i}c unique${i}d")).toDF("doc_id", "text")
    // cap below the hot shingle's df: its postings are dropped, and since
    // every cross-doc overlap was ONLY the stopword shingles, no pairs
    val capped = Dedup.ngramJaccardPairs(d, n = 2, minJaccard = 0.0, maxDf = 10)
    assert(capped.count() == 0, "hot shingle must be excluded from pairing")
    // uncapped: every pair co-occurs via "of the" -> the k^2 explosion
    val uncapped = Dedup.ngramJaccardPairs(d, n = 2, minJaccard = 0.0, maxDf = 1000)
    assert(uncapped.count() == 40L * 39 / 2)
    // the cap only UNDERcounts intersections: surviving pairs keep their
    // full-denominator jaccard, so real near-dups still surface
    val e = docs((1L, "of the aaa bbb ccc"), (2L, "of the aaa bbb ddd"),
      (3L, "of the zzz yyy xxx"))
    val kept = Dedup.ngramJaccardPairs(e, n = 2, minJaccard = 0.2, maxDf = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L)), s"got $kept")
  }

  test("simhashDuplicates: planted near-pair found with exact hamming, unrelated absent") {
    val d = docs((1L, base), (2L, near), (3L, far))
    val got = Dedup.simhashDuplicates(d, maxHamming = 8)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(got.exists(r => r._1 == 1L && r._2 == 2L), s"got ${got.toList}")
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L))
    val ham = got.find(r => r._1 == 1L && r._2 == 2L).get._3
    assert(ham >= 0 && ham <= 8)
  }

  test("crossModalPairs: media pair survives only when captions also near-duplicate") {
    val mediaPairs = Seq((1L, 2L, 0L), (1L, 3L, 0L), (4L, 5L, 1L))
      .toDF("asset_a", "asset_b", "hamming")
    val prose = "a red bird sits on the old oak branch near the river bank today"
    val captions = Seq(
      (1L, prose),
      (2L, prose + " thumbnail"),              // near-dup caption -> confirmed
      (3L, "completely different words about quantum chromodynamics lattice"),
      (4L, "tiny"), (5L, "tiny")               // short-caption fallback: identical
    ).toDF("asset_id", "caption")
    val got = Dedup.crossModalPairs(mediaPairs, captions)
      .select("asset_a", "asset_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 5L)), s"got $got")
    // threshold is exact integer cross-multiplication: 100% bar keeps only
    // the identical-caption pair
    val strict = Dedup.crossModalPairs(mediaPairs, captions, minJaccardPct = 100)
      .select("asset_a", "asset_b").as[(Long, Long)].collect().toSet
    assert(strict == Set((4L, 5L)))
  }

  test("embeddingDuplicates: near-identical vectors pair, orthogonal do not") {
    val v1 = Array.tabulate(16)(i => math.cos(i).toFloat)
    val v2 = v1.clone(); v2(0) = v2(0) + 0.01f       // ~same direction
    val v3 = Array.tabulate(16)(i => (if (i % 2 == 0) 1f else -1f) * math.sin(i + 3).toFloat)
    val d = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val got = Dedup.embeddingDuplicates(d, minCos = 0.99, planes = 4)
      .select("vec_a_id", "vec_b_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"got $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("confusableSkeleton: every TR39-subset codepoint pinned; ZWSP family stripped") {
    import org.apache.spark.sql.functions.col
    // from-string typed as raw Cyrillic in Dedup.scala — pin each
    // codepoint here via escapes so a mistyped lookalike cannot hide
    val pairs = Seq(
      '\u0430' -> 'a', '\u0435' -> 'e', '\u043E' -> 'o', '\u0440' -> 'p',
      '\u0441' -> 'c', '\u0445' -> 'x', '\u0443' -> 'y', '\u0456' -> 'i',
      '\u0455' -> 's', '\u0458' -> 'j', '\u04BB' -> 'h', '\u0501' -> 'd',
      '\u051B' -> 'q')
    val input = pairs.map(_._1).mkString + "\u200B\u200C\u200D\uFEFF plain"
    val got = Seq(Tuple1(input)).toDF("text")
      .select(Dedup.confusableSkeleton(col("text"))).as[String].head()
    assert(got == pairs.map(_._2).mkString + " plain")
  }

  test("skeletonExact: homoglyph+ZWSP spoof collapses onto its original") {
    import org.apache.spark.sql.functions.col
    val spoofed = "su\u0440er ch\u0435\u0430p \u200Bdeal" // "super cheap deal" spoofed
    val docs = Seq(
      (1L, "super cheap deal"),
      (2L, spoofed),
      (3L, "Super cheap deal"),      // case variant: collapses too (lower)
      (4L, "a different document")
    ).toDF("doc_id", "text")
    val got = Dedup.skeletonExact(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((3L, true)), 4L -> ((1L, false))))
    // exact dedup is blind to the same spoof — the gap this op closes
    assert(Dedup.exact(docs.where(col("doc_id") <= 2)).count() == 2)
  }

  test("sourceOverlapMatrix: unordered rollup, within-source rows, totals") {
    // near-identical texts across sources: (1 cc, 2 c4), (3 cc, 4 cc),
    // plus an unrelated doc in "web"
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "cc"),
      (2L, "alpha beta gamma delta epsilon eta", "c4"),
      (3L, "one two three four five six", "cc"),
      (4L, "one two three four five seven", "cc"),
      (5L, "totally unrelated content here now folks", "web")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapMatrix(docs, n = 2, minJaccard = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // pair (1,2) crosses c4/cc -> normalized (c4, cc); pair (3,4) is
    // within cc; doc 5 pairs with nothing
    assert(got == Map(
      ("c4", "cc") -> ((1L, 1L, 3L)),
      ("cc", "cc") -> ((1L, 3L, 3L))))
  }

  test("gramNovelty: doc-set df, within-doc repeats don't count, short docs keep NULL ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x y z w v"),        // shares [a b c d e] with 2
      (2L, "a b c d e q r s t u"),
      (3L, "a b c d a b c d a b c d"),    // repeats ITS OWN 4+1-grams only
      (4L, "k l m n o p q1 r1 s1 t1"),    // fully novel
      (5L, "too short")).toDF("doc_id", "text")
    val got = Dedup.gramNovelty(docs, n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // docs 1/2: 6 distinct grams each, exactly one shared
    assert(got(1L) == ((6L, 1L, 166666L)))
    assert(got(2L) == ((6L, 1L, 166666L)))
    // doc 3's grams repeat internally but appear in no OTHER doc
    assert(got(3L)._2 == 0L, "within-doc repeats are not memorization evidence")
    assert(got(4L) == ((6L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, -1L)), "under-n docs surface with NULL ppm")
  }
}
