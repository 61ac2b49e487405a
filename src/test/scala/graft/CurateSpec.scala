package graft

import org.apache.spark.sql.functions._
import graft.ops.Curate

class CurateSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSample: deterministic, repartition-stable, rate within tolerance") {
    val df = spark.range(0, 10000).toDF("doc_id")
    val s1 = Curate.hashSample(df, "doc_id", 0.25, "s1")
    val n = s1.count()
    // md5 is uniform: expect 2500 +/- a generous 5-sigma binomial band
    assert(n > 2200 && n < 2800, s"got $n of 10000 at rate 0.25")
    // identical keys survive regardless of partitioning or run order
    val s2 = Curate.hashSample(df.repartition(13), "doc_id", 0.25, "s1")
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty)
    assert(s2.select("doc_id").except(s1.select("doc_id")).isEmpty)
    // different salt draws a different (but same-sized-ish) sample
    val s3 = Curate.hashSample(df, "doc_id", 0.25, "s2")
    assert(s3.select("doc_id").except(s1.select("doc_id")).count() > 1000)
    // nested sampling: a 0.1 sample of the same salt is a subset of 0.25
    val s4 = Curate.hashSample(df, "doc_id", 0.1, "s1")
    assert(s4.select("doc_id").except(s1.select("doc_id")).isEmpty)
  }

  test("chunks: overlap, tail chunk, empty and short docs") {
    val docs = Seq(
      (1L, (1 to 95).map(i => s"t$i").mkString(" ")), // 95 tokens
      (2L, "one two three"),                          // shorter than a chunk
      (3L, "   \t  "),                                // whitespace-only -> no rows
      (4L, "")                                        // empty -> no rows
    ).toDF("doc_id", "text")
    val c = Curate.chunks(docs, chunkLen = 50, stride = 40)
      .orderBy("doc_id", "chunk_idx")
      .collect()
    val d1 = c.filter(_.getLong(0) == 1L)
    // starts 0, 40, 80 -> sizes 50, 50, 15
    assert(d1.map(_.getLong(2)).toSeq == Seq(50L, 50L, 15L))
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    // overlap: chunk 1 starts at token 41 (1-based), chunk 0 ends at 50
    assert(d1(1).getString(3).startsWith("t41 "))
    assert(d1(0).getString(3).endsWith(" t50"))
    val d2 = c.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getLong(2) == 3L &&
      d2(0).getString(3) == "one two three")
    assert(!c.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
  }

  test("redactPii: emails and phones replaced and counted") {
    val df = Seq(
      (1L, "reach me at a.b+c@ex-ample.org or 555-867-5309 thanks"),
      (2L, "two mails x@y.io and z@w.co, phone 123 456 7890 and 999.888.7777"),
      (3L, "nothing personal here")
    ).toDF("doc_id", "text")
    val r = Curate.redactPii(df).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones", "text").collect()
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    assert(r(0).getString(3) == "reach me at [EMAIL] or [PHONE] thanks")
    assert(r(1).getLong(1) == 2L && r(1).getLong(2) == 2L)
    assert(!r(1).getString(3).contains("@") && !r(1).getString(3).contains("7890"))
    assert(r(2).getLong(1) == 0L && r(2).getLong(2) == 0L)
    assert(r(2).getString(3) == "nothing personal here")
  }

  test("dupClusters: components resolve to min-id labels, chain included") {
    // components: {1,2,3} (chain 1-2, 2-3), {10,11}, {20,21,22,23} (star)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("doc_a", "doc_b")
    val got = Curate.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("dupClusters: long chain converges (diameter > a few hops)") {
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Curate.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got.size == 30 && got.values.forall(_ == 1L))
  }

  test("clusterSpectrum: octave histogram and hand-computed power-law fit") {
    // sizes: 8 singletons (oct 0), 2+2+3 (oct 1), 5 (oct 2)
    val assign = (
      (1 to 8).map(i => (i.toLong, i.toLong)) ++            // singletons
      Seq(100L -> 10L, 101L -> 10L, 102L -> 11L, 103L -> 11L,
        104L -> 12L, 105L -> 12L, 106L -> 12L) ++           // 2, 2, 3
      (110 to 114).map(i => (i.toLong, 20L))                // 5
    ).toDF("doc_id", "cluster_id")
    val got = Curate.clusterSpectrum(assign).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // ls over (1, 3000), (2, 1000), (3, 0): det 6, slope -9000/6,
    // intercept 26000 div 6
    assert(got == Map(
      0L -> ((8L, 8L, 3000L, -1500L, 4333L)),
      1L -> ((3L, 7L, 1000L, -1500L, 4333L)),
      2L -> ((1L, 5L, 0L, -1500L, 4333L))))
  }

  test("clusterSpectrum: single-octave input reads NULL fit, not zero") {
    val assign = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val r = Curate.clusterSpectrum(assign).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).getLong(1) == 3L)
    assert(r(0).isNullAt(4) && r(0).isNullAt(5),
      "a one-point fit is degenerate (det = 0): NULL, never a fabricated 0")
  }

  test("dupClustersStar == dupClusters on random graphs and a deep chain") {
    val rnd = new scala.util.Random(23)
    // random graph: 120 nodes, 90 random edges -> several components
    val randPairs = (1 to 90).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    val exp = Curate.dupClusters(randPairs).as[(Long, Long)].collect().toSet
    val got = Curate.dupClustersStar(randPairs).as[(Long, Long)].collect().toSet
    assert(got == exp, s"missing=${exp.diff(got).take(5)} extra=${got.diff(exp).take(5)}")
    // 200-node chain (the adversarial-depth case): star converges in
    // O(log n) rounds and still labels everything with the chain min
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = Curate.dupClustersStar(chain).as[(Long, Long)].collect().toMap
    assert(star.size == 200 && star.values.forall(_ == 1L))
    // self-pair-only docs stay in the output (contract parity with
    // dupClusters — a caller must not lose docs by switching algorithms)
    val selfy = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    val gotSelf = Curate.dupClustersStar(selfy).as[(Long, Long)].collect().toSet
    val expSelf = Curate.dupClusters(selfy).as[(Long, Long)].collect().toSet
    assert(gotSelf == expSelf && gotSelf.contains((5L, 5L)), s"got $gotSelf")
  }

  test("decontaminate: doc containing benchmark text flagged, clean doc not") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // splices 10 benchmark tokens verbatim -> heavy 5-gram overlap
      (1L, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
      // same vocabulary, different order -> no shared 5-gram
      (2L, "dog lazy the over jumps fox brown quick the tonight filler filler2 filler3")
    ).toDF("doc_id", "text")
    val got = graft.ops.Curate.decontaminate(corpus, bench, n = 5, maxSharedRatio = 0.2)
      .select("doc_id", "n_shared", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 >= 6 && got(1L)._2, s"spliced doc must be flagged: $got")
    assert(got(2L)._1 == 0 && !got(2L)._2, s"reordered doc must be clean: $got")
  }

  test("decontaminate explodes the corpus shingles exactly once") {
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Curate.decontaminate(docs.where($"doc_id" % 5 =!= 0),
      docs.where($"doc_id" % 5 === 0))
    df.collect()
    def generates(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => generates(a.executedPlan)
      case q: QueryStageExec => generates(q.plan)
      case g: GenerateExec => 1 + g.children.map(generates).sum
      case other => other.children.map(generates).sum + other.subqueries.map(generates).sum
    }
    // one Generate for the corpus side + one for the benchmark side; the
    // old semi-join + separate-total shape exploded the corpus twice (3)
    assert(generates(df.queryExecution.executedPlan) <= 2,
      "corpus shingles must explode once")
  }

  test("repetitionScore: boilerplate spam scores high, diverse text low") {
    val docs = Seq(
      (1L, Seq.fill(20)("buy cheap pills now").mkString(" ")), // massive 3-gram repeats
      (2L, (1 to 80).map(i => s"w$i").mkString(" "))           // all distinct
    ).toDF("doc_id", "text")
    val got = graft.ops.Curate.repetitionScore(docs, n = 3)
      .select("doc_id", "rep_ratio").as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.9, s"spam ratio ${got(1L)}")
    assert(got(2L) == 0.0, s"diverse ratio ${got(2L)}")
  }

  test("curate: each gate filters what it should") {
    val docs = Seq(
      // passes everything (en, 24 tokens, no stopwords)
      (1L, "en", (1 to 24).map(i => s"w$i").mkString(" ")),
      // duplicate text of 1 with larger id -> deduped away
      (5L, "en", (1 to 24).map(i => s"w$i").mkString(" ")),
      // too short
      (2L, "en", "tiny doc"),
      // wrong language
      (3L, "zh", (1 to 24).map(i => s"x$i").mkString(" ")),
      // stopword soup: 20 of 24 tokens are stopwords (>60%)
      (4L, "en", (Seq.fill(20)("the") ++ Seq("alpha", "beta", "gamma", "delta")).mkString(" "))
    ).toDF("doc_id", "lang", "text")
    // sampleRate 1.0 -> sampling keeps everything that survives the gates
    val got = Curate.curate(docs, minTokens = 20, maxStopPct10 = 6,
      langs = Seq("en", "de", "fr"), sampleRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("weightedSample: expected count ~ target, heavy rows preferred, deterministic") {
    // 10k rows, weight = id % 100 (so weights 0..99; the 100 zero-weight
    // rows per block must never appear)
    val df = spark.range(0, 10000)
      .select($"id".as("doc_id"), ($"id" % 100).as("w"))
    val s = Curate.weightedSample(df, "doc_id", "w", targetRows = 1000.0)
    val n = s.count()
    // Poisson with E=1000: +/- 5 sigma ~ 160
    assert(n > 800 && n < 1200, s"expected ~1000 kept, got $n")
    assert(s.where($"w" <= 0).isEmpty, "non-positive weights must be dropped")
    // heavy rows kept at ~ their weight ratio: w>=90 band vs w in [10,20)
    val heavy = s.where($"w" >= 90).count().toDouble / 1000
    val light = s.where($"w" >= 10 && $"w" < 20).count().toDouble / 1000
    assert(heavy > 3 * light, s"heavy band must dominate: heavy=$heavy light=$light")
    // reproducible across partitionings (md5 coin, not rand())
    val s2 = Curate.weightedSample(df.repartition(7), "doc_id", "w", 1000.0)
    assert(s.select("doc_id").except(s2.select("doc_id")).isEmpty)
    assert(s2.select("doc_id").except(s.select("doc_id")).isEmpty)
  }

  test("weightedSample: negative weights excluded from the denominator") {
    // planted: 1000 positive-weight rows (w=10) + 1000 rows of w=-10.
    // The old bug summed ALL weights (sigma_w = 0 here -> rate blows up /
    // NaN); correct sigma_w = 10000 -> E[kept] = target exactly
    val df = spark.range(0, 2000)
      .select($"id".as("doc_id"),
        when($"id" < 1000, 10.0).otherwise(-10.0).as("w"))
    val s = Curate.weightedSample(df, "doc_id", "w", targetRows = 500.0)
    val n = s.count()
    // each positive row gets rate 0.5 exactly; 5-sigma band around 500
    assert(n > 400 && n < 600, s"expected ~500, got $n")
    assert(s.where($"doc_id" >= 1000).isEmpty, "negative-weight rows must not appear")
  }

  test("weightedSample: internal sum column dodges caller's schema") {
    val df = spark.range(0, 100)
      .select($"id".as("doc_id"), lit(5L).as("w"),
        lit("x").as("_sw"), lit("y").as("_graft_sw0"))
    val s = Curate.weightedSample(df, "doc_id", "w", targetRows = 50.0)
    // caller columns survive untouched; count is ~50 (uniform weights)
    assert(s.columns.toSeq == Seq("doc_id", "w", "_sw", "_graft_sw0"))
    val n = s.count()
    assert(n > 25 && n < 75, s"got $n")
  }

  test("epochShuffle: dense 0..n-1 positions matching the md5 permutation; epochs differ") {
    val df = spark.range(0, 5000).select($"id".as("doc_id"), ($"id" % 7).as("tag"))
    val got = Curate.epochShuffle(df, "doc_id", epoch = 1, parts = 16)
    val rows = got.select("doc_id", "_skey", "pos")
      .as[(Long, String, Long)].collect()
    // dense, 0-based, no gaps
    assert(rows.map(_._3).sorted.toSeq == (0L until 5000L).toSeq)
    // position order IS md5-key order (the global permutation)
    assert(rows.sortBy(_._3).map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // reproducible under a different input partitioning
    val again = Curate.epochShuffle(df.repartition(3), "doc_id", 1, parts = 16)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(rows.forall(r => again(r._1) == r._3), "permutation must be partitioning-invariant")
    // a different epoch is a different permutation
    val e2 = Curate.epochShuffle(df, "doc_id", epoch = 2, parts = 16)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(rows.count(r => e2(r._1) == r._3) < 50, "epochs must permute independently")
  }

  test("decontaminateBloom == decontaminate, incl. tiny bloom (FPs verified away)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where($"doc_id" < 400)
    val bench = docs.where($"doc_id" >= 400)
    val exact = Curate.decontaminate(corpus, bench, n = 5)
    // expectedItems far below the true shingle count -> high fp rate ->
    // the exact verification join must still kill every false positive
    for (items <- Seq(1L << 22, 64L)) {
      val bloom = Curate.decontaminateBloom(corpus, bench, n = 5,
        expectedItems = items)
      assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty,
        s"bloom path (expectedItems=$items) must equal the exact path")
    }
  }

  test("packSequences: == locally simulated concat-and-chunk; partitioning-invariant") {
    val docs = spark.range(0, 500).select($"id".as("doc_id"),
      // id%13+1 tokens per doc; every 29th doc is whitespace-only (dropped)
      when($"id" % 29 === 0, lit(" \t "))
        .otherwise(concat_ws(" ", transform(
          sequence(lit(1), ($"id" % 13 + 1).cast("int")),
          j => concat(lit("w"), j)))).as("text"))
    val got = Curate.packSequences(docs, "doc_id", "text",
        budget = 17L, epoch = 1, parts = 5)
      .select("doc_id", "n_tokens", "stream_pos", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._3)
    // local reference: walk the md5-key order with a running token offset
    val ref = docs.select($"doc_id",
        md5(concat($"doc_id".cast("string"), lit("_e1"))).as("sk"),
        size(filter(split($"text", "\\s+"), t => length(t) > 0))
          .cast("long").as("n"))
      .as[(Long, String, Long)].collect().filter(_._3 > 0)
      .sortBy(r => (r._2, r._1))
    var pos = 0L
    val exp = ref.map { case (id, _, n) =>
      val r = (id, n, pos, pos / 17, (pos + n - 1) / 17); pos += n; r
    }
    assert(got.toSeq == exp.toSeq)
    assert(!got.exists(_._1 % 29 == 0), "token-empty docs must be dropped")
    // same layout under different input partitioning AND a different parts
    val again = Curate.packSequences(docs.repartition(7), "doc_id", "text",
        17L, 1, parts = 16)
      .select("doc_id", "stream_pos").as[(Long, Long)].collect().toMap
    assert(got.forall(r => again(r._1) == r._3),
      "packing layout must be partitioning-invariant")
  }

  test("decontaminateBloom: empty benchmark -> zero shared, nothing contaminated") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val bench = corpus.where($"doc_id" < 0)
    val got = Curate.decontaminateBloom(corpus, bench, n = 5)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0L, false)), got.mkString(","))
  }

  test("budgetPerGroup: two-level prefix sum == the direct window, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 60L).map(i => (i, if (i < 40) "big" else "small", 10L + i % 7))
    val df = rows.toDF("doc_id", "source", "cost")
    val w = Window.partitionBy($"source")
      .orderBy(substring(md5(concat($"doc_id".cast("string"), lit("s7b"))
        .cast("binary")), 1, 8), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val direct = df.withColumn("cum", sum($"cost").over(w).cast("long"))
      .where($"cum" <= 100L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(direct.nonEmpty && direct.size < rows.size) // the budget really binds
    for (buckets <- Seq(1, 3, 16)) {
      val got = Curate.budgetPerGroup(df, "source", "doc_id", "cost",
        budget = 100L, salt = "s7b", buckets = buckets)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == direct, s"buckets=$buckets")
    }
    // NULL / non-positive costs are dropped, not accumulated
    val withBad = df.union(Seq((900L, "big", 0L), (901L, "big", -5L)).toDF(
      "doc_id", "source", "cost"))
    assert(Curate.budgetPerGroup(withBad, "source", "doc_id", "cost", 100L, "s7b")
      .as[(Long, String, Long, Long)].collect().toSet == direct)
    // the round-15 regression shape: a FAT doc whose bucket-local prefix
    // overshoots the budget while later thin docs' true cum also
    // overshoots — the old two-window form dropped the fat doc's cost
    // between windows and let later rows sneak back under budget
    val fat = (0L until 40L).map(i =>
      (i, "g", if (i % 5 == 0) 79L else 5L)).toDF("doc_id", "source", "cost")
    val wf = Window.partitionBy($"source")
      .orderBy(substring(md5(concat($"doc_id".cast("string"), lit("cjk"))
        .cast("binary")), 1, 8), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val directFat = fat.withColumn("cum", sum($"cost").over(wf).cast("long"))
      .where($"cum" <= 200L).as[(Long, String, Long, Long)].collect().toSet
    for (buckets <- Seq(1, 2, 16, 64))
      assert(Curate.budgetPerGroup(fat, "source", "doc_id", "cost",
        budget = 200L, salt = "cjk", buckets = buckets)
        .as[(Long, String, Long, Long)].collect().toSet == directFat,
        s"fat-doc shape diverged at buckets=$buckets")
  }

  test("dedupLines: first occurrence survives corpus-wide, order kept, empty docs vanish") {
    val docs = Seq(
      (1L, "boiler\nunique one\nshared"),
      (2L, "boiler\nunique two\nshared"), // boiler+shared already seen in doc 1
      (3L, "boiler\nshared")              // nothing left -> doc disappears
    ).toDF("doc_id", "text")
    val got = Curate.dedupLines(docs).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "boiler\nunique one\nshared", 2L -> "unique two"))
    // first = lowest (doc_id, pos): a line repeated WITHIN one doc keeps
    // only its earliest position
    val rep = Seq((7L, "a\nb\na\nc")).toDF("doc_id", "text")
    assert(Curate.dedupLines(rep).as[(Long, String)].collect().toMap
      == Map(7L -> "a\nb\nc"))
    // custom separator is treated literally, not as regex
    val dot = Seq((1L, "x.y"), (2L, "x.z")).toDF("doc_id", "text")
    assert(Curate.dedupLines(dot, sep = ".").as[(Long, String)].collect().toMap
      == Map(1L -> "x.y", 2L -> "z"))
  }

  test("resolveDuplicates: best-scoring member survives per cluster, singletons kept") {
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L), // cluster {1,2,3}: 2 wins (tie 2<3)
      (4L, 5L), (5L, 99L),             // cluster {4,5}: 5 wins
      (6L, 1L)                         // never paired: kept
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Curate.resolveDuplicates(docs, pairs, scoreCol = "score")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 50L), (5L, 99L), (6L, 1L)))
    // chain component: 1-2, 2-3, 3-4 is ONE cluster even though 1 and 4
    // never pair directly
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got2 = Curate.resolveDuplicates(docs, chain, scoreCol = "score")
      .as[(Long, Long)].collect().toSet
    // {1,2,3,4} one cluster; max score 50 ties 2 vs 3 -> lowest id 2;
    // 5 and 6 now unpaired -> kept
    assert(got2 == Set((2L, 50L), (5L, 99L), (6L, 1L)))
  }

  test("softDedupWeights: 1/cluster_size ppm weights, singletons at full weight") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // cluster {1,2,3} (chain), cluster {4,5}, singleton 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Curate.softDedupWeights(docs, pairs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (4L, 4L, 2L, 500000L), (5L, 4L, 2L, 500000L),
      (6L, 6L, 1L, 1000000L)))
    // total weight of a cluster never exceeds scale (the over-count is
    // removed, not amplified): 3 * 333333 <= 1000000
    assert(got.groupBy(_._2).forall { case (_, m) => m.toList.map(_._4).sum <= 1000000L })
  }

  test("capPerDomain: salted two-level top-k == the direct window, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    // 3 domains: 40 rows (capped), 7 rows (capped), 3 rows (all kept)
    val rows = (0L until 40L).map(i => (i, "big")) ++
      (100L until 107L).map(i => (i, "mid")) ++
      (200L until 203L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val direct = df
      .withColumn("rk", row_number().over(Window.partitionBy($"source")
        .orderBy(substring(md5(concat($"doc_id".cast("string"), lit("s7"))
          .cast("binary")), 1, 8), $"doc_id")))
      .where($"rk" <= 5)
      .as[(Long, String, Int)].collect().toSet
    for (buckets <- Seq(1, 4, 16)) {
      val got = Curate.capPerDomain(df, "source", "doc_id", k = 5,
        salt = "s7", buckets = buckets)
        .as[(Long, String, Int)].collect().toSet
      assert(got == direct, s"buckets=$buckets")
    }
    // per-domain sizes: min(n, k), ranks dense 1..kept
    val kept = Curate.capPerDomain(df, "source", "doc_id", k = 5)
      .groupBy($"source").agg(count(lit(1)).as("n"), max($"rk").as("mx"))
      .as[(String, Long, Int)].collect()
      .map { case (s, n, m) => s -> ((n, m)) }.toMap
    assert(kept == Map("big" -> ((5L, 5)), "mid" -> ((5L, 5)), "small" -> ((3L, 3))))
  }

  test("c4Filter: line rules, doc-level poison, sentence minimum") {
    val docs = Seq(
      // keeps line 1 (.), drops too-short / no-punct / javascript lines,
      // keeps ! and ? lines -> 3 lines, 3 sentences
      (1L, "one two three four five.\nshort line.\n" +
        "no terminal punct here at all\n" +
        "Please enable JavaScript to continue reading now.\n" +
        "second good line stays right here!\n" +
        "third good line stays right here?"),
      // doc-level drop: lorem ipsum
      (2L, "contains lorem ipsum dolor sit amet.\n" +
        "more good words stay right here.\nthird fine sentence sits here."),
      // doc-level drop: curly brace
      (3L, "var x = 1; // brace follows {\n" +
        "good line number one stays here.\n" +
        "good line number two stays here.\n" +
        "good line number three stays here."),
      // only 2 sentences survive -> dropped by minSentences
      (4L, "only one good sentence lives here.\n" +
        "second good sentence is right here."),
      // closing-quote line counts as terminal but adds no sentence mark
      (5L, "ends with a closing quote so it stays \"\n" +
        "second good sentence sits right here.\n" +
        "third good sentence sits right here.\n" +
        "fourth keeps it over the bar.")
    ).toDF("doc_id", "text")
    val got = Curate.c4Filter(docs)
      .select($"doc_id", $"n_lines", $"n_sentences", $"text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 5L))
    assert(got(1L)._2 == 3 && got(1L)._3 == 3)
    assert(got(1L)._4 == "one two three four five.\n" +
      "second good line stays right here!\nthird good line stays right here?")
    assert(got(5L)._2 == 4 && got(5L)._3 == 3)
  }

  test("contentChunks: reassembly is lossless, boundaries are content-local") {
    val text = (1 to 400).map(i => s"tok${i % 97}x$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b c"), (3L, " ")).toDF("doc_id", "text")
    val got = Curate.contentChunks(docs, w = 4, divisor = 16)
      .as[(Long, Long, String, Long)].collect()
    // token-less doc vanishes; short doc (< w tokens) is one chunk 0
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    // chunk ids are dense 0..k and concatenating chunks in id order
    // reproduces the original token stream exactly
    val one = got.filter(_._1 == 1L).sortBy(_._2)
    assert(one.map(_._2).toSeq == one.indices.map(_.toLong))
    assert(one.map(_._3).mkString(" ") == text)
    assert(one.length > 5, s"divisor 16 over 400 tokens must cut: ${one.length}")
    // content-defined resync: inserting one token near the front only
    // changes chunks up to the next boundary — the tail chunk sets match
    val edited = Seq((9L, ("INSERTED " + text))).toDF("doc_id", "text")
    val ed = Curate.contentChunks(edited, w = 4, divisor = 16)
      .as[(Long, Long, String, Long)].collect().map(_._3).toSet
    val shared = one.map(_._3).toSet intersect ed
    assert(shared.size >= one.length - 2,
      s"CDC must resync after an edit: shared ${shared.size}/${one.length}")
    // deterministic under repartition
    val again = Curate.contentChunks(docs.repartition(7), w = 4, divisor = 16)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(again == got.toSet)
  }

  test("temperatureSample: sqrt(n_min/n_s) keep-rate, smallest source intact") {
    val rows = (0L until 400L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val got = Curate.temperatureSample(df, salt = "t5")
      .as[(Long, String)].collect().toSet
    // smallest source: rate 1 -> every row whose md5 prefix < ffffffff
    // (i.e. all of them, for these ids)
    assert(got.count(_._2 == "small") == 100)
    // big source: rate sqrt(100/400) = 0.5 exactly -> same rows as the
    // static-rate sampler at 0.5
    val direct = df.where($"source" === "big" &&
      Curate.hashSamplePredicate($"doc_id", 0.5, "t5"))
      .as[(Long, String)].collect().toSet
    assert(got.filter(_._2 == "big") == direct)
    // deterministic under repartition
    val got2 = Curate.temperatureSample(df.repartition(7), salt = "t5")
      .as[(Long, String)].collect().toSet
    assert(got2 == got)
  }

  test("leakageSafeSplit: clusters move together; singletons keep the doc-key split") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two planted clusters: {3,4,5} and {40,41}
    val pairs = Seq((3L, 4L), (4L, 5L), (40L, 41L)).toDF("doc_a", "doc_b")
    val got = Curate.leakageSafeSplit(docs, pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // every cluster member shares the representative key AND the split
    assert(Seq(3L, 4L, 5L).map(got(_)).distinct.size == 1)
    assert(got(3L)._1 == 3L)
    assert(Seq(40L, 41L).map(got(_)).distinct.size == 1 && got(40L)._1 == 40L)
    // singletons key by their own id and match the doc-keyed split rule
    val plain = Curate.trainValTestSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (1L to 100L).filterNot(Set(4L, 5L, 41L)).foreach { i =>
      assert(got(i)._1 == i && got(i)._2 == plain(i), s"singleton $i diverged")
    }
    // all three splits occur over 100 docs at 80/10/10
    assert(got.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("curriculumPack: stage blocks are contiguous; degenerate stage == packSequences") {
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 5 + 1).toInt).map(j => s"t${i}_$j").mkString(" "),
        (i % 3))).toDF("doc_id", "text", "stage")
    val packed = Curate.curriculumPack(docs, "doc_id", "text", "stage",
      budget = 7L, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    // every stage-s document streams strictly before every stage-(s+1) doc
    val maxPosByStage = packed.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minPosByStage = packed.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    assert(maxPosByStage(0L) < minPosByStage(1L) &&
      maxPosByStage(1L) < minPosByStage(2L))
    // constant stage degenerates to the plain epoch-shuffled pack
    val flat = Curate.curriculumPack(docs.withColumn("stage",
      org.apache.spark.sql.functions.lit(0L)), "doc_id", "text", "stage",
      budget = 7L, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val plain = Curate.packSequences(docs, "doc_id", "text", budget = 7L, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(flat == plain)
  }

  test("epochAllocate: hand-computed water-fill across the three regimes") {
    // T = {a:100, b:400}, maxEpochs=2 -> w = {10, 20}, caps = {200, 800},
    // cap/weight ratios {20, 40} -> fill order a then b
    val docs = Seq((1L, 100L, "a"), (2L, 400L, "b"))
      .toDF("doc_id", "n_chars", "source")
    def run(b: Long) = Curate.epochAllocate(docs, budget = b, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), r.getLong(4), r.getLong(5)))).toMap
    // under-subscribed: nobody caps, shares proportional to w (50/100)
    val low = run(150L)
    assert(low("a") == ((false, 50L, 500L)))
    assert(low("b") == ((false, 100L, 250L)))
    // the interesting regime: a caps at 2 epochs exactly (the capped
    // test is <= at equality), surplus water-fills into b
    val mid = run(600L)
    assert(mid("a") == ((true, 200L, 2000L)))
    assert(mid("b") == ((false, 400L, 1000L)))
    // over-subscribed: budget >= sum of caps, everyone caps
    val high = run(2000L)
    assert(high("a") == ((true, 200L, 2000L)))
    assert(high("b") == ((true, 800L, 2000L)))
  }

  test("blocklist: AC automaton == unrolled rlike on adversarial fixtures") {
    // nested phrases, shared prefixes, boundary adjacency, start/end
    // placement, case and whitespace normalization, and negative
    // controls ("pillsbury", "assassin" vs "ass")
    val phrases = Seq("pills", "cheap pills", "ass", "bonus spins",
      "lorem ipsum", "x9")
    val docs = Seq(
      (1L, "Buy CHEAP\n pills here"),         // cheap pills + pills (ws norm)
      (2L, "pillsbury dough assassin"),        // nothing (boundary rule)
      (3L, "pills"),                           // whole-text match
      (4L, "an ass; bonus spins!"),            // punctuation boundaries
      (5L, "lorem   ipsum lorem ipsum"),       // distinct counted once
      (6L, "x9x9 and x9."),                    // self-adjacent: only bounded hit
      (7L, ""),                                // empty
      (8L, null.asInstanceOf[String]))         // NULL text
    val df = docs.toDF("doc_id", "text")
    def collectRep(rep: org.apache.spark.sql.DataFrame) =
      rep.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val unrolled = collectRep(Curate.blocklistReport(df, phrases))
    val ac = collectRep(Curate.blocklistReportAC(df, phrases))
    assert(ac == unrolled, s"AC $ac != unrolled $unrolled")
    assert(unrolled(1L) == ((2L, true)))
    assert(unrolled(2L) == ((0L, false)))
    assert(unrolled(3L) == ((1L, true)))
    assert(unrolled(4L) == ((2L, true)))
    assert(unrolled(5L) == ((1L, true)))
    assert(unrolled(6L) == ((1L, true)))
    assert(unrolled(7L) == ((0L, false)))
    // randomized cross-check: 300 docs of random token soup over a
    // vocabulary overlapping the phrase set
    val vocab = Vector("pills", "cheap", "bonus", "spins", "pillsbury",
      "ass", "assassin", "lorem", "ipsum", "x9", "dough", "now")
    val rng = new scala.util.Random(7)
    val rand = (0 until 300).map(i =>
      (i.toLong, Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")))
    val rdf = rand.toDF("doc_id", "text")
    assert(collectRep(Curate.blocklistReportAC(rdf, phrases)) ==
      collectRep(Curate.blocklistReport(rdf, phrases)))
  }

  test("lengthGroupedBatches: sorted batches, own-max padding, partitioning-invariant") {
    // 10 docs with token counts 1..10 (k 'w' words), batchSize 4:
    // batches {1,2,3,4} pad_to 4, {5,6,7,8} pad_to 8, {9,10} pad_to 10
    val docs = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
    val out = Curate.lengthGroupedBatches(docs.toDF("doc_id", "text"), 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (i <- 1 to 10) {
      val (n, b, padTo, pad) = out(i.toLong)
      assert(n == i.toLong)
      assert(b == (i - 1) / 4, s"doc $i batch $b")
      val expPad = Seq(4L, 8L, 10L)((i - 1) / 4)
      assert(padTo == expPad && pad == expPad - i, s"doc $i pad $padTo/$pad")
    }
    // invariant to input partitioning (the two-pass rank is global)
    val scrambled = Curate.lengthGroupedBatches(
      docs.toDF("doc_id", "text").repartition(7), 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(scrambled == out)
  }

  test("fimTransform: PSM slices reassemble the original text exactly") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the bank."),
      (2L, "short"), // under minChars: passthrough
      (3L, "a" * 20)) // exactly at the threshold
    val out = Curate.fimTransform(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val orig = docs.toMap
    for ((id, r) <- out) {
      val (ok, pl, ml, sl, fim) = (r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))
      val text = orig(id)
      assert(pl + ml + sl == text.length.toLong, s"doc $id lens")
      if (!ok) assert(fim == text && ml == 0 && sl == 0)
      else {
        // parse the PSM tags and reassemble in original order
        val pfx = "<fim_prefix>"; val sfx = "<fim_suffix>"; val mid = "<fim_middle>"
        assert(fim.startsWith(pfx))
        val p = fim.substring(pfx.length, fim.indexOf(sfx))
        val sSeg = fim.substring(fim.indexOf(sfx) + sfx.length, fim.indexOf(mid))
        val m = fim.substring(fim.indexOf(mid) + mid.length)
        assert(p.length == pl && m.length == ml && sSeg.length == sl)
        assert(p + m + sSeg == text, s"doc $id reassembly")
        assert(pl >= 1 && pl + ml <= text.length - 0, s"doc $id cut range")
      }
    }
    assert(!out(2L).getBoolean(1) && out(1L).getBoolean(1) && out(3L).getBoolean(1))
  }

  test("spanCorrupt: sentinel substitution reconstructs the original text") {
    // deterministic hash flags: reconstruct by splicing each target
    // span back over its sentinel; also pin the closing sentinel and
    // the under-length passthrough
    val docs = (0L until 60L).map(i =>
      (i, ("w%03d ".format(i) * 20).trim)) ++ Seq((999L, "tiny"))
    val out = Curate.spanCorrupt(docs.toDF("doc_id", "text"), segments = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    val orig = docs.toMap
    val sent = "<extra_id_(\\d+)>".r
    var sawMask = false
    for ((id, (ok, nc, in, tgt)) <- out) {
      if (!ok) {
        assert(id == 999L && in == orig(id) && nc == 0 && tgt == "")
      } else if (nc == 0) {
        assert(in == orig(id) && tgt == "")
      } else {
        sawMask = true
        // target = <id_0>span0<id_1>span1...<id_nc>; split spans out
        val ids = sent.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
        assert(ids == (0 to nc.toInt), s"doc $id sentinel order $ids")
        val spans = sent.split(tgt).drop(1) // text between sentinels
        assert(spans.length == nc.toInt)
        var rebuilt = in
        spans.zipWithIndex.foreach { case (sp, j) =>
          rebuilt = rebuilt.replace(s"<extra_id_$j>", sp) }
        assert(rebuilt == orig(id), s"doc $id reconstruction")
        // input sentinels are exactly 0..nc-1 in order
        assert(sent.findAllMatchIn(in).map(_.group(1).toInt).toSeq ==
          (0 until nc.toInt), s"doc $id input sentinels")
      }
    }
    assert(sawMask, "fixture must exercise masking")
  }

  test("annealMix: both caps hold, every row surfaces with a phase, ineligible/NULL-cost rows stay stable") {
    import spark.implicits._
    // src A: 3 eligible docs of 40; src B: 3 of 40; src C ineligible;
    // plus a NULL-cost eligible doc. budget 100, 50% share cap -> per
    // source <= 50 (one 40-char doc each), global <= 100
    val docs = Seq(
      (1L, "A", Some(40L), true), (2L, "A", Some(40L), true),
      (3L, "A", Some(40L), true), (4L, "B", Some(40L), true),
      (5L, "B", Some(40L), true), (6L, "B", Some(40L), true),
      (7L, "C", Some(40L), false), (8L, "A", None, true))
      .toDF("doc_id", "source", "n_chars", "elig")
    val got = graft.ops.Curate.annealMix(docs, "doc_id", "source",
      "n_chars", "elig", annealBudget = 100L, maxSourcePermille = 500)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got.size == 8, "every input row must carry a phase")
    assert(got(7L) == "stable", "ineligible rows can never anneal")
    assert(got(8L) == "stable", "NULL-cost rows can never anneal")
    val ann = got.filter(_._2 == "anneal").keySet
    // per-source cap 50 admits exactly one 40-char doc per source
    assert(ann.count(Set(1L, 2L, 3L)) <= 1 && ann.count(Set(4L, 5L, 6L)) <= 1)
    assert(ann.nonEmpty, "the budget must admit something")
    // determinism: repartitioned input yields the identical phase map
    val re = graft.ops.Curate.annealMix(docs.repartition(5), "doc_id",
      "source", "n_chars", "elig", annealBudget = 100L,
      maxSourcePermille = 500)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(re == got)
  }
}
