package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expr.Exprs
import graft.ops.TextAnalysis

/** Generator-driven properties, table-style: ScalaCheck generates a corpus
  * of adversarial inputs once, ONE Spark job evaluates the operator over
  * all of them, and each row is checked against an independent JVM-side
  * reference implementation. (Per-sample forAll would spin a Spark job per
  * case — same coverage, two orders of magnitude slower.) */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // strings heavy on whitespace edge cases: empty, blanks, tabs/newlines,
  // repeated tokens, unicode
  private val textGen: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    1 -> Gen.const("   \t \n "),
    3 -> Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(" "),
      Gen.const("\t"), Gen.const("héllo"), Gen.const("中文")))
      .map(_.mkString(" ")),
    3 -> Gen.alphaStr.map(_.take(40)))

  private def refTokens(s: String): Seq[String] = {
    val t = s.trim
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  test("property: tokenCount == reference whitespace tokenizer on adversarial strings") {
    val texts = samples(textGen, 200, seed = 7L)
    val got = texts.toDF("text")
      .select(col("text"), TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(String, Int)].collect()
    got.foreach { case (s, n) =>
      assert(n == refTokens(s).length, s"tokenCount mismatch for ${s.take(40).inspect}")
    }
  }

  test("property: ShingleHashes cardinality == distinct reference n-grams (lowercased)") {
    val texts = samples(textGen, 150, seed = 11L)
    val got = texts.toDF("text")
      .select(col("text"), size(Exprs.shingleHashes(col("text"), 3)).as("n"))
      .as[(String, Int)].collect()
    got.foreach { case (s, n) =>
      val toks = refTokens(s.toLowerCase)
      val expect =
        if (toks.length < 3) 1 // single whole-text shingle (possibly "")
        else toks.sliding(3).map(_.mkString(" ")).toSet.size
      assert(n == expect, s"shingle count mismatch for ${s.take(40).inspect}")
    }
  }

  test("property: CosineSim(v, a*v) == 1 for any nonzero v and a>0; symmetric") {
    val vecGen = Gen.chooseNum(1, 16).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-100, 100).map(_ / 10.0f)))
      .suchThat(v => v.exists(x => x != 0f))
    val scaleGen = Gen.chooseNum(1, 50).map(_ / 10.0f)
    val data = samples(Gen.zip(vecGen, scaleGen), 100, seed = 13L)
      .map { case (v, a) => (v.toArray, v.map(_ * a).toArray) }
    val got = data.toDF("a", "b").select(
      Exprs.cosineSim(col("a"), col("b")).as("ab"),
      Exprs.cosineSim(col("b"), col("a")).as("ba"))
      .as[(Option[Double], Option[Double])].collect()
    got.foreach { case (ab, ba) =>
      assert(ab.isDefined && math.abs(ab.get - 1.0) < 1e-5, s"cos(v, a*v) = $ab")
      assert(ab == ba, "cosine must be symmetric")
    }
  }

  test("property: MinHashSig positions agree more for higher-jaccard sets") {
    // deterministic structured check: overlapping integer sets with known
    // jaccard; signature agreement rate must correlate
    val base = (1L to 200L).toArray
    def variant(drop: Int): Array[Long] = base.drop(drop) ++ (1000L until (1000L + drop))
    val rows = Seq(0, 20, 100, 180).map(d => (d, base, variant(d)))
    val got = rows.toDF("drop", "a", "b").select(col("drop"),
      Exprs.minhashSig(col("a"), 64).as("sa"), Exprs.minhashSig(col("b"), 64).as("sb"))
      .as[(Int, Seq[Long], Seq[Long])].collect()
      .map { case (d, sa, sb) => d -> sa.zip(sb).count { case (x, y) => x == y } }
      .toMap
    assert(got(0) == 64, "identical sets => identical signatures")
    assert(got(20) > got(100), s"agreement must fall with jaccard: $got")
    assert(got(100) > got(180), s"agreement must fall with jaccard: $got")
  }

  test("property: ZValue round-trips — de-interleaving recovers both keys") {
    def deinterleave(z0: Long): (Long, Long) = {
      def squash(v0: Long): Long = {
        var v = v0 & 0x5555555555555555L
        v = (v | (v >> 1))  & 0x3333333333333333L
        v = (v | (v >> 2))  & 0x0F0F0F0F0F0F0F0FL
        v = (v | (v >> 4))  & 0x00FF00FF00FF00FFL
        v = (v | (v >> 8))  & 0x0000FFFF0000FFFFL
        (v | (v >> 16)) & 0xFFFFFFFFL
      }
      (squash(z0), squash(z0 >> 1))
    }
    val pairs = samples(Gen.zip(Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.chooseNum(0L, 0xFFFFFFFFL)), 200, seed = 17L)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), graft.ops.Layout.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(deinterleave(z) == (a, b), s"round-trip failed for ($a, $b): z=$z")
    }
  }

  test("property: GraphAnn.view is the cyclic shift by t mod dim for any (vec, t)") {
    val vecGen = for {
      dim <- Gen.choose(1, 9)
      vs <- Gen.listOfN(dim, Gen.choose(-100, 100).map(_.toFloat / 7f))
    } yield vs.toArray
    val rows = samples(vecGen, 40, 20260816L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("vec_id", "embedding")
    for (t <- Seq(1, 2, 3, 7, 31)) {
      val got = df.select(col("vec_id"), graft.ops.GraphAnn.view(col("embedding"), t))
        .as[(Long, Array[Float])].collect().toMap
      rows.foreach { case (id, v) =>
        val sh = t % v.length
        val want = (v.drop(sh) ++ v.take(sh)).toSeq
        assert(got(id).toSeq == want,
          s"view(t=$t) on dim ${v.length}: got ${got(id).toSeq}, want $want")
      }
    }
  }

  test("property: cosine similarity bounded in [-1, 1] for arbitrary vectors") {
    val vecGen = Gen.chooseNum(1, 24).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-1000, 1000).map(_ / 7.0f)))
    val data = samples(Gen.zip(vecGen, vecGen), 150, seed = 19L)
      .map { case (a, b) => (a.toArray, b.padTo(a.length, 0f).take(a.length).toArray) }
    val got = data.toDF("a", "b")
      .select(Exprs.cosineSim(col("a"), col("b"))).as[Option[Double]].collect()
    got.flatten.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos out of bounds: $c"))
  }

  test("property: dupClusters == union-find reference on random graphs") {
    // one random pair-set per trial; all trials resolved in ONE Spark job
    // by tagging pairs with a trial id shifted into the node id space
    val pairGen = for {
      n <- Gen.chooseNum(2, 24) // nodes per trial
      m <- Gen.chooseNum(1, 30) // edges per trial
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield es.filter { case (a, b) => a != b }
    val trials = samples(pairGen, 40, seed = 23L).zipWithIndex
      .map { case (es, t) => es.map { case (a, b) =>
        (t * 1000L + a, t * 1000L + b) } }
      .filter(_.nonEmpty)
    val allPairs = trials.flatten
    val got = graft.ops.Curate.dupClusters(allPairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

    // reference: plain union-find with min-id representative per component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    allPairs.foreach { case (a, b) => union(a, b) }
    val nodes = allPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(x => x -> find(x)).toMap
    assert(got == expected,
      s"mismatch on ${got.toSet.diff(expected.toSet).take(5)} ...")
  }

  test("property: intervalJoin == naive theta join on random events/intervals") {
    val base = 1700000000L // epoch seconds anchor
    val evGen = Gen.chooseNum(0L, 200000L).map(base + _)
    val ivGen = for {
      s <- Gen.chooseNum(0L, 200000L)
      len <- Gen.chooseNum(0L, 20000L)
    } yield (base + s, base + s + len)
    val events = samples(evGen, 120, seed = 29L).zipWithIndex
      .map { case (t, i) => (i.toLong, new java.sql.Timestamp(t * 1000)) }
    val intervals = samples(ivGen, 60, seed = 31L).zipWithIndex
      .map { case ((s, e), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000), new java.sql.Timestamp(e * 1000)) }
    val ev = events.toDF("event_id", "ts")
    val iv = intervals.toDF("iv_id", "iv_start", "iv_end")
    val got = graft.ops.Relational.intervalJoin(ev, iv, "ts", "iv_start", "iv_end")
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      (eid, t) <- events
      (iid, s, e) <- intervals
      if !t.before(s) && t.before(e)
    } yield (eid, iid)).toSet
    assert(got == expected, s"got ${got.size} vs expected ${expected.size}")
  }

  test("property: non-overlapping chunks reconstruct the token stream exactly") {
    // stride == chunkLen -> chunks partition the tokens; joining them back
    // must reproduce the original tokenization for ANY whitespace shape
    val texts = samples(textGen, 120, seed = 37L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.ops.Curate.chunks(texts.toDF("doc_id", "text"),
      chunkLen = 7, stride = 7)
      .groupBy("doc_id")
      .agg(concat_ws(" ", flatten(sort_array(
        collect_list(struct(col("chunk_idx"), split(col("chunk_text"), " "))))
        .getField("col2"))).as("rejoined"))
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      val ref = refTokens(t).mkString(" ")
      if (ref.isEmpty) assert(!got.contains(id), s"doc $id: empty docs emit no chunks")
      else assert(got(id) == ref, s"doc $id: '${got(id).inspect}' != '${ref.inspect}'")
    }
  }

  test("property: hashSample thresholds are monotone and nested across rates") {
    val rates = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 1.0)
    val thr = rates.map(graft.ops.Curate.hashSampleThreshold)
    assert(thr == thr.sorted, s"thresholds must be monotone in rate: $thr")
    assert(thr.forall(_.length == 8))
    // nested samples follow from monotone thresholds + a fixed hash: a row
    // kept at rate r is kept at every r' > r (checked end-to-end)
    val df = spark.range(0, 3000).toDF("doc_id")
    val keep = rates.map(r =>
      graft.ops.Curate.hashSample(df, "doc_id", r, "p").select("doc_id")
        .as[Long].collect().toSet)
    keep.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "samples must nest as rate grows")
    }
    assert(keep.head.isEmpty && keep.last.size >= 2999) // rate 0 / rate 1
  }

  test("property: binary parsers never throw on fuzzed bytes (tar/mp4/avi/gvid/image/wav)") {
    // random bytes, random prefixes of valid containers, and valid
    // containers with random single-byte corruptions: every parser must
    // return None/empty, never throw — a 100 TB media scan WILL see all
    // of these
    val rnd = new scala.util.Random(20260814L)
    val ppm = graft.ops.Codecs.encodePpm(9, 8, (x, y) => (x, y, x + y))
    val valid: Seq[Array[Byte]] = Seq(
      graft.ops.Codecs.encodeVideo(Seq(ppm)),
      graft.ops.Codecs.encodeAvi(9, 8, 25, Seq(ppm)),
      graft.ops.Codecs.encodeMp4(9, 8, 25, Seq(ppm)),
      graft.sources.WebDataset.tarBytes(Seq("k.img" -> ppm)),
      graft.ops.Codecs.encodeWav(16000, Array[Short](5, -5, 7)),
      ppm)
    val cases = Seq.newBuilder[Array[Byte]]
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(b)
      cases += b
    }
    for (v <- valid; _ <- 0 until 50) {
      cases += java.util.Arrays.copyOf(v, rnd.nextInt(v.length + 1))
      val c = v.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      cases += c
    }
    // magic-bearing garbage: right prefix, random tail
    for (magic <- Seq("GVID", "RIFF1234AVI ", "????ftyp", "RIFF1234WAVE"); _ <- 0 until 30) {
      val tail = new Array[Byte](rnd.nextInt(1500))
      rnd.nextBytes(tail)
      cases += (magic.getBytes("US-ASCII") ++ tail)
    }
    cases.result().foreach { b =>
      graft.ops.Codecs.videoFrames(b)       // gvid + avi + mp4 dispatch
      graft.ops.Codecs.videoShingles(b, 2)
      graft.ops.Codecs.dhash64(b)
      graft.ops.Codecs.decodeWav(b)
      graft.ops.Codecs.decodePixels(b)
      graft.ops.Codecs.sniffFormat(b)
      graft.sources.WebDataset.tarEntries(b)
    }
  }

  test("property: rocAuc label-flip complement — auc + auc' == 1e6 within flooring") {
    // flipping every label swaps pos/neg, so wins' = pairs - wins - ties
    // and the true AUCs sum to exactly 1; the two independent ppm floors
    // can lose at most 1 ppm between them
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val df = rows.toDF("score_ppm", "label")
    val flipped = rows.map { case (s, y) => (s, !y) }.toDF("score_ppm", "label")
    val a = graft.ops.QualityModel.rocAuc(df).head().getLong(5)
    val b = graft.ops.QualityModel.rocAuc(flipped).head().getLong(5)
    assert(math.abs(a + b - 1000000L) <= 1L, s"$a + $b")
  }

  test("property: rocAuc bounded in [0, 1e6]; extremes hit exactly") {
    val rnd = new scala.util.Random(43)
    for (seed <- 1 to 5) {
      val rows = (1 to 100).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextBoolean())).toDF("score_ppm", "label")
      val v = graft.ops.QualityModel.rocAuc(rows).head().getLong(5)
      assert(v >= 0L && v <= 1000000L)
    }
  }

  test("property: readability metric-NULL iff wordless; sentences floored at 1 on text") {
    val texts = samples(textGen, 150, seed = 11L)
    val got = graft.ops.Quality.readability(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
    got.foreach { r =>
      val (nw, ns) = (r.getLong(1), r.getLong(2))
      assert(r.isNullAt(6) == (nw == 0L), "fre NULL exactly when no words")
      if (nw > 0L) assert(ns >= 1L, "sentence floor must hold for worded text")
    }
  }

  test("property: rankAgreement gamma bounded; monotone relabel reads +1e6") {
    val rnd = new scala.util.Random(47)
    val xs = (1 to 200).map(_ => rnd.nextInt(12).toLong)
    // y = x under any strictly monotone map: every untied pair concordant
    val mono = xs.map(x => (x, x * 3 + 1)).toDF("x", "y")
    assert(graft.ops.Stats.rankAgreement(mono).head().getLong(3) == 1000000L)
    val rand = xs.map(x => (x, rnd.nextInt(12).toLong)).toDF("x", "y")
    val g = graft.ops.Stats.rankAgreement(rand).head()
    if (!g.isNullAt(3))
      assert(math.abs(g.getLong(3)) <= 1000000L)
  }

  test("property: robots LIKE-pattern compile == reference wildcard matcher") {
    // adversarial alphabet: LIKE metachars (% _), the escape char (!),
    // the robots wildcard/anchor (* $), and path punctuation — exactly
    // the space where an escaping bug would hide
    val chars = Gen.oneOf('/', 'a', 'b', '%', '_', '!', '*', '$', '.', '?', '=', '&')
    val patGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, chars))
      .map(_.mkString)
    val tgtGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, chars))
      .map(cs => "/" + cs.mkString)
    def refMatch(pattern: String, target: String): Boolean = {
      if (pattern.isEmpty) return false // empty pattern matches nothing
      val anchored = pattern.endsWith("$")
      val core = if (anchored) pattern.dropRight(1) else pattern
      val rx = "^" + core.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*") +
        (if (anchored) "$" else "")
      java.util.regex.Pattern.compile(rx).matcher(target).find()
    }
    val cases = samples(Gen.zip(patGen, tgtGen), 300, seed = 31L).zipWithIndex
    val urls = cases.map { case ((_, t), i) =>
      (i.toLong, s"http://h$i.com$t") }.toDF("doc_id", "url")
    // one synthetic disallow rule per host, fed directly (bypassing the
    // robots text parser, which trims and cuts at '#': this property
    // isolates the PATTERN COMPILER)
    val rules = cases.map { case ((p, _), i) =>
      (s"h$i.com", "*", "disallow", p, 0L) }
      .toDF("host", "agent", "rule", "value", "pos")
    val got = graft.ops.Web.robotsUrlVerdict(urls, rules)
      .select(col("doc_id"), col("allowed"))
      .as[(Long, Boolean)].collect().toMap
    cases.foreach { case ((p, t), i) =>
      val expectBlocked = refMatch(p, t)
      assert(got(i.toLong) == !expectBlocked,
        s"pattern ${p.inspect} vs target ${t.inspect}: " +
          s"sql allowed=${got(i.toLong)}, reference match=$expectBlocked")
    }
  }

  private implicit class Inspect(s: String) {
    def inspect: String = s.map(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString).mkString
  }
}
