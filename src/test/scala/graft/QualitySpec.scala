package graft

import graft.ops.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("uniqueness: duplicates beyond the first counted; clean table -> 0") {
    val dup = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    assert(Quality.uniquenessViolations(dup, Seq("k")).as[Long].head() == 2L)
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Quality.uniquenessViolations(clean, Seq("k")).as[Long].head() == 0L)
    // empty input -> 0, not null (the COALESCE matters)
    assert(Quality.uniquenessViolations(clean.where($"k" < 0), Seq("k")).as[Long].head() == 0L)
  }

  test("fk: orphans counted, NULL child keys pass (SQL FK semantics)") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(3L), Some(4L), None).toDF("fk")
    assert(Quality.fkViolations(child, "fk", parent, "pk").as[Long].head() == 2L)
  }

  test("domain: out-of-set counted, NULL passes") {
    val df = Seq(Some("a"), Some("b"), Some("x"), None).toDF("c")
    assert(Quality.domainViolations(df, "c", Seq("a", "b")).as[Long].head() == 1L)
    assert(Quality.nullViolations(df, "c").as[Long].head() == 1L)
  }

  test("childBattery: one-scan fusion matches the per-check functions exactly") {
    // planted violations: pk dup (10 twice), orphan fk (99), null dates
    val child = Seq(
      (10L, Some(1L), Some("2024-01-01")),
      (10L, Some(1L), None),
      (11L, Some(99L), None),
      (12L, None, Some("2024-01-02")),
      (13L, Some(2L), Some("2024-01-03"))).toDF("pk", "fk", "d")
    val parent = Seq(1L, 2L).toDF("ck")
    val got = Quality.childBattery(child, "pk", "fk", "d", parent, "ck",
      "pk_u", "fk_v", "null_v").as[(String, Long)].collect().toMap
    assert(got("pk_u") == Quality.uniquenessViolations(child, Seq("pk")).as[Long].head())
    assert(got("fk_v") == Quality.fkViolations(child, "fk", parent, "ck").as[Long].head())
    assert(got("null_v") == Quality.nullViolations(child, "d").as[Long].head())
    assert(got == Map("pk_u" -> 1L, "fk_v" -> 1L, "null_v" -> 2L))
  }

  test("q60 battery reads each table once: <= 3 file scans in the plan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    val df = SparkEntry.queries("q60_dq_checks")(spark, "/root/testdata/sf0.001")
    df.collect()
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => 1
      case other => other.children.map(scans).sum + other.subqueries.map(scans).sum
    }
    assert(scans(df.queryExecution.executedPlan) <= 3,
      "q60 must fuse the three orders checks into one scan (3 tables, 3 scans)")
  }

  test("rollingSpikes: planted 4x day fires, flat series never does") {
    import org.apache.spark.sql.functions._
    // 20 days x 10 events, day 15 gets 40 events
    val flat = spark.range(0, 200)
      .select(date_add(lit("2024-01-01").cast("date"), ($"id" % 20).cast("int")).as("d"))
    val spike = spark.range(0, 30)
      .select(date_add(lit("2024-01-01").cast("date"), lit(14)).as("d"))
    val got = Quality.rollingSpikes(flat.union(spike), "d")
      .select("day", "spike").as[(java.sql.Date, Boolean)].collect().toMap
    assert(got(java.sql.Date.valueOf("2024-01-15")), "planted 4x day must flag")
    assert(got.count(_._2) == 1, s"only the planted day flags: $got")
    val calm = Quality.rollingSpikes(flat, "d").select("spike").as[Boolean].collect()
    assert(calm.forall(!_), "flat series must never flag")
  }

  test("distributionDrift: TVD exact on known distributions") {
    import org.apache.spark.sql.functions._
    def mk(xs: Seq[Int]) = xs.toDF("v")
    val bucket = (df: org.apache.spark.sql.DataFrame) => col("v")
    // before: 4x bucket0 + 6x bucket1; after: 5x each -> TVD = 0.1
    val d1 = Quality.distributionDrift(
      mk(Seq.fill(4)(0) ++ Seq.fill(6)(1)), mk(Seq.fill(5)(0) ++ Seq.fill(5)(1)), bucket)
    val rows = d1.orderBy("bucket")
      .select("bucket", "cnt_before", "cnt_after", "drift_num", "tvd")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(rows.toSeq == Seq((0, 4L, 5L, 10L, 0.1), (1, 6L, 5L, 10L, 0.1)), rows.mkString(","))
    // identical distributions -> TVD 0
    val same = Quality.distributionDrift(mk(Seq(0, 1, 1)), mk(Seq(0, 1, 1)), bucket)
    assert(same.select("tvd").as[Double].collect().forall(_ == 0.0))
    // disjoint supports -> TVD 1, absent buckets zero-filled
    val dis = Quality.distributionDrift(mk(Seq(0, 0)), mk(Seq(1, 1, 1)), bucket)
    val got = dis.orderBy("bucket").as[(Int, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0, 2L, 0L, 6L, 1.0), (1, 0L, 3L, 6L, 1.0)), got.mkString(","))
  }

  test("snapshotDiff: added/removed/changed, unchanged rows absent") {
    val before = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)).toDF("k", "t", "v")
    val after = Seq((2L, "y", 2.0), (3L, "z", 9.0), (4L, "w", 4.0)).toDF("k", "t", "v")
    val got = Quality.snapshotDiff(before, after, "k", Seq("t", "v"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("gopherQuality: closed-form values on a planted fixture") {
    val docs = Seq(
      // 2 lines; bullet line; '#' once; '...' at end; words: ["-","x#y","ab","..."]
      (1L, "- x#y\nab ..."),
      // 1 line, 3 alpha words, no symbols
      (2L, "one two three")
    ).toDF("doc_id", "text")
    val got = Quality.gopherQuality(docs, minWords = 2, maxWords = 3)
      .as[(Long, Long, Double, Double, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: words ["-","x#y","ab","..."] (4); nonWs chars = 12-3 = 9;
    // mean 9/4; symbols 1 hash + 1 ellipsis -> 2/4; lines 2: one "- "
    // bullet, one "..." tail -> 0.5 each; alpha words 2/4; 4 words > max 3
    assert(got(1L) == ((1L, 4L, 9 / 4.0, 2 / 4.0, 0.5, 0.5, 2 / 4.0, false)))
    // doc 2: 3 words, 11 non-ws chars, all alpha, in [2,3] bounds
    assert(got(2L) == ((2L, 3L, 11 / 3.0, 0.0, 0.0, 0.0, 1.0, true)))
  }

  test("gopherRepetition: closed-form values on a planted fixture") {
    val docs = Seq(
      (1L, "a b a b a"), // 2-grams {a b:2, b a:2}, 3-grams {a b a:2, b a b:1}
      (2L, "x y z"),     // no repetition; top-2-gram tie broken gram-asc
      (3L, "q"),         // shorter than n: single joined gram
      (4L, "A a")        // case-folding: tokens are lowercased
    ).toDF("doc_id", "text")
    val got = Quality.gopherRepetition(docs)
      .as[(Long, Long, String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 9 chars; top "a b" (cnt 2, ties with "b a" -> gram asc);
    // dup3 = 2 * len("a b a") = 10
    assert(got(1L) == ((1L, 2L, "a b", 2 * 3 / 9.0, 10 / 9.0, 3 / 5.0)))
    // doc 2: tie at cnt 1 -> "x y"; no dup 3-grams
    assert(got(2L) == ((2L, 1L, "x y", 3 / 5.0, 0.0, 0.0)))
    // doc 3: single token -> the joined-gram fallback, frac 1/1
    assert(got(3L) == ((3L, 1L, "q", 1.0, 0.0, 0.0)))
    // doc 4: "A a" lowers to [a, a] -> one 2-gram "a a" (cnt 1, so no
    // dup-3-gram chars), dup_word 1/2
    assert(got(4L) == ((4L, 1L, "a a", 3 / 3.0, 0.0, 0.5)))
  }

  test("stackCodeFilters: every cut fires; marker only scans first 5 lines") {
    val docs = Seq(
      (1L, "// module a\nshort code line;\nreturn 0;"),
      (2L, "// Auto-Generated by tool\ncode;\nmore;"),
      (3L, "ok line\n" + "x" * 1200 + "\nend;"),
      (4L, "+++ --- +++ --- +++ ---\n### $$$ %%%\n!!! ??? &&&"),
      (5L, "AUTOGENERATED file follows\ncode;"),
      (6L, "a1;\nb2;\nc3;\nd4;\ne5;\n// generated by tool")
    ).toDF("doc_id", "text")
    val got = Quality.stackCodeFilters(docs)
      .as[(Long, Long, Double, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 16L && got(1L)._3 == (11 + 16 + 9) / 3.0)
    assert(got(1L)._6, "clean doc must keep")
    assert(got(2L)._5 && !got(2L)._6, "auto-generated header must drop")
    assert(got(3L)._2 == 1200L && !got(3L)._6, "1200-char line must drop")
    assert(got(4L)._4 < 0.25 && !got(4L)._6, "symbol soup must drop")
    assert(got(5L)._5, "AUTOGENERATED (case-blind) must flag")
    assert(!got(6L)._5, "marker on line 6 is past the 5-line window")
  }

  test("quantileDrift: hand-computed ppm TVD over quartile buckets") {
    // global sorted values 1,2,3,4,101,102,103,104 -> R-7 quartile edges
    // e1=2.75, e2=52.5, e3=102.25; buckets split 2/2/2/2 globally while
    // each group occupies exactly two buckets -> per-group
    // Σ|p_s - p_g| = 2·|500000-250000| + 2·|0-250000| = 1e6 -> tvd 500000
    val rows = Seq(("lo", 1), ("lo", 2), ("lo", 3), ("lo", 4),
      ("hi", 101), ("hi", 102), ("hi", 103), ("hi", 104)).toDF("src", "x")
    val got = Quality.quantileDrift(rows, "src", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("lo") == ((4L, 500000L, true)))
    assert(got("hi") == ((4L, 500000L, true)))
    // a single group IS the corpus: zero drift by construction
    val solo = Quality.quantileDrift(
      rows.where(org.apache.spark.sql.functions.col("src") === "lo"), "src", "x")
      .collect()
    assert(solo.length == 1 && solo(0).getLong(2) == 0L && !solo(0).getBoolean(3))
  }

  test("quantileDriftSketch == quantileDrift when data sits clear of the rank wiggle") {
    // 20-wide constant-value BANDS straddle each quartile rank (100/200/
    // 300 of 400), so the exact R-7 edge interpolates between two equal
    // band values AND any value inside GK's ±εN rank window IS the band
    // value — both forms resolve to the identical edge, so bucket
    // membership (and the whole drift report) must match exactly
    val vals = Seq.fill(90)(10) ++ Seq.fill(20)(500) ++ Seq.fill(80)(1000) ++
      Seq.fill(20)(5000) ++ Seq.fill(80)(10000) ++ Seq.fill(20)(50000) ++
      Seq.fill(90)(100000)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (if (i % 5 == 0) "a" else "b", v)
    }.toDF("src", "x")
    val exact = Quality.quantileDrift(rows, "src", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val sketch = Quality.quantileDriftSketch(rows, "src", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(sketch == exact, s"sketch $sketch != exact $exact")
  }

  test("quantileDriftSketchCertified: exact columns == quantileDrift; bound holds") {
    // skewed continuous values WITHOUT protective bands — the regime
    // where sketch edges genuinely wobble within +/- eps*N ranks; the
    // certificate's TVD envelope must absorb the wobble
    val rows = (0 until 4000).map { i =>
      val g = if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c"
      val v = if (g == "a") (i * 37 % 1000) + 800.0 else (i * 37 % 1000).toDouble
      (g, v)
    }.toDF("src", "x")
    val cert = Quality.quantileDriftSketchCertified(rows, "src", "x")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val exact = Quality.quantileDrift(rows, "src", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(cert.keySet == exact.keySet)
    for ((g, (n, tvd, drifted, ok)) <- cert) {
      assert((n, tvd, drifted) == exact(g), s"exact columns diverged for $g")
      assert(ok, s"sketch-vs-exact TVD bound failed for $g")
    }
  }

  test("cohenKappa: hand-computed values; negative kappa; constant raters -> NULL") {
    // 10 items, labels {x, y}: 6 agreements (4 xx + 2 yy);
    // marginals a: 6x/4y, b: 6x/4y -> pe = (36+16)/100 = 0.52
    // po = 0.6 -> kappa = 0.08/0.48 = 166666 ppm
    val rows = Seq.fill(4)(("x", "x")) ++ Seq.fill(2)(("y", "y")) ++
      Seq.fill(2)(("x", "y")) ++ Seq.fill(2)(("y", "x"))
    val r = Quality.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == 600000L && r.getLong(2) == 520000L)
    assert(r.getLong(3) == 166666L)
    // systematic DISagreement: po < pe -> negative kappa, exact sign
    val anti = Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))
    val r2 = Quality.cohenKappa(anti.toDF("a", "b"), "a", "b").head()
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 500000L)
    assert(r2.getLong(3) == -1000000L)
    // both raters constant: pe = 1, kappa undefined (NULL, not 0)
    val const = Seq.fill(5)(("x", "x"))
    val r3 = Quality.cohenKappa(const.toDF("a", "b"), "a", "b").head()
    assert(r3.getLong(1) == 1000000L && r3.getLong(2) == 1000000L)
    assert(r3.isNullAt(3))
    // NULL labels excluded
    val withNull = rows ++ Seq((null, "x"), ("x", null))
    assert(Quality.cohenKappa(withNull.toDF("a", "b"), "a", "b")
      .head().getLong(0) == 10L)
  }

  test("calibrationReport: hand-computed buckets and ECE; top edge clamps") {
    // scores in ppm; labels: bucket 0 perfectly calibrated at 0,
    // bucket 9 overconfident (score ~0.9, zero positives)
    val rows = Seq(
      (50000L, false), (50000L, false),            // bucket 0
      (500000L, true), (500000L, false),           // bucket 5: mean 500000, pos 500000
      (900000L, false), (900000L, false),          // bucket 9
      (1000000L, false))                           // top edge -> clamps to 9
    val out = Quality.calibrationReport(rows.toDF("score_ppm", "label"),
      "score_ppm", "label", 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set(0L, 5L, 9L))
    assert(out(0L) == ((2L, 50000L, 0L, 50000L, out(0L)._5)))
    assert(out(5L)._2 == 500000L && out(5L)._3 == 500000L && out(5L)._4 == 0L)
    assert(out(9L)._1 == 3L) // 1000000 clamped into bucket 9
    assert(out(9L)._2 == (900000L + 900000L + 1000000L) / 3)
    assert(out(9L)._4 == out(9L)._2) // zero positives: gap == mean score
    // ECE = (2*50000 + 2*0 + 3*933333) / 7
    val ece = (2L * 50000L + 3L * 933333L) / 7L
    assert(out.values.forall(_._5 == ece), s"ece ${out.values.map(_._5)} != $ece")
  }

  test("kAnonymity: class sizes and verdicts; kAnonymize suppresses violators") {
    val rows = Seq(
      ("us", "A", 1L), ("us", "A", 2L), ("us", "A", 3L),
      ("us", "B", 4L), ("us", "B", 5L),
      ("de", "A", 6L)
    ).toDF("country", "segment", "id")
    val audit = Quality.kAnonymity(rows, Seq("country", "segment"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(audit(("us", "A")) == ((3L, true)))
    assert(audit(("us", "B")) == ((2L, false)))
    assert(audit(("de", "A")) == ((1L, false)))
    // suppression drops exactly the rows of sub-k classes
    val kept = Quality.kAnonymize(rows, Seq("country", "segment"), k = 3L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // the anonymized view is itself k-anonymous
    val recheck = Quality.kAnonymity(
      Quality.kAnonymize(rows, Seq("country", "segment"), k = 3L),
      Seq("country", "segment"), k = 3L)
    assert(recheck.where(!org.apache.spark.sql.functions.col("k_anonymous")).count() == 0)
  }

  test("kAnonymize: sub-k class keyed by a NULL QI value is suppressed") {
    // the audit's groupBy puts NULL-country rows in their own class; the
    // enforcement anti-join must match that class null-safely — a plain
    // equi-anti-join never equals NULL and would leak rows 4 and 5
    val rows = Seq(
      (Some("us"), "A", 1L), (Some("us"), "A", 2L), (Some("us"), "A", 3L),
      (None, "A", 4L), (None, "A", 5L)
    ).toDF("country", "segment", "id")
    val kept = Quality.kAnonymize(rows, Seq("country", "segment"), k = 3L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), "NULL-keyed sub-k class must be suppressed")
    val recheck = Quality.kAnonymity(
      Quality.kAnonymize(rows, Seq("country", "segment"), k = 3L),
      Seq("country", "segment"), k = 3L)
    assert(recheck.where(!org.apache.spark.sql.functions.col("k_anonymous")).count() == 0)
  }

  test("lDiversity: homogeneous class fails even when k-large") {
    val rows = Seq(
      ("us", "flu", 1L), ("us", "flu", 2L), ("us", "flu", 3L), ("us", "flu", 4L),
      ("de", "flu", 5L), ("de", "cold", 6L), ("de", "cut", 7L)
    ).toDF("region", "diagnosis", "id")
    val got = Quality.lDiversity(rows, Seq("region"), "diagnosis", l = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // "us" is k=4 large yet fully homogeneous -> fails l-diversity
    assert(got("us") == ((4L, 1L, false)))
    assert(got("de") == ((3L, 3L, true)))
  }

  test("tCloseness: skewed class fails, boundary class passes, hand-computed EMD") {
    // domain {0,1}; global 7xv0 + 3xv1 over N=10 -> cum_g ppm at v0 = 700000
    // A: 4xv0           -> |1000000-700000| = 300000 -> emd 300000 FAIL
    // B: 2xv0 + 2xv1    -> |500000-700000|  = 200000 -> emd 200000 pass (boundary)
    // C: 1xv0 + 1xv1    -> same 200000 -> pass
    val rows = Seq(
      ("A", 0L), ("A", 0L), ("A", 0L), ("A", 0L),
      ("B", 0L), ("B", 0L), ("B", 1L), ("B", 1L),
      ("C", 0L), ("C", 1L)
    ).toDF("region", "band")
    val got = Quality.tCloseness(rows, Seq("region"), "band", tPpm = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("A") == ((4L, 300000L, false)))
    assert(got("B") == ((4L, 200000L, true)))
    assert(got("C") == ((2L, 200000L, true)))
  }

  test("tCloseness: NULL QI value forms its own class (null-safe join)") {
    // the NULL-region class has the same 50/50 distribution as the
    // global: EMD must be 0, not the spurious maximum a null-unsafe
    // count join would produce
    val rows = Seq(
      (Some("us"), 0L), (Some("us"), 1L),
      (None, 0L), (None, 1L)
    ).toDF("region", "band")
    val got = Quality.tCloseness(rows, Seq("region"), "band", tPpm = 0L)
      .collect().map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("us") == ((2L, 0L, true)))
    assert(got("NULL") == ((2L, 0L, true)))
  }

  test("tCloseness: m=1 degenerates to emd 0; NULL sensitive rows excluded") {
    val one = Seq(("A", Some(5L)), ("A", Some(5L)), ("B", Some(5L)),
      ("B", None)).toDF("region", "band")
    val got = Quality.tCloseness(one, Seq("region"), "band", tPpm = 0L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // single-value domain: every class trivially matches; the null row
    // does not count toward B's class size
    assert(got("A") == ((2L, 0L, true)))
    assert(got("B") == ((1L, 0L, true)))
  }

  test("datasheet: cross-source dup shows in both rows, modal lang ties break low, NULL text is never a dup") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "same text", "en", "A"),
      (2L, "same text", "de", "B"),     // cross-source exact dup of 1
      (3L, "unique a", "en", "A"),
      (4L, "unique b", "de", "A"),      // A langs: en 2, de 1 -> en
      (5L, null.asInstanceOf[String], "en", "B"),
      (6L, null.asInstanceOf[String], "de", "B")) // two NULL texts: NOT dups
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.ops.Quality.datasheet(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6)))).toMap
    // A: 3 docs, 25 chars, 1 dup-exposed doc, modal en (2/3)
    assert(got("A") == ((3L, 25L, 8L, 333333L, "en", 666666L)))
    // B: 3 docs (one real + two NULL texts), dup-exposed only doc 2;
    // langs en 1 / de 2 -> de
    assert(got("B") == ((3L, 9L, 3L, 333333L, "de", 666666L)))
  }

  test("datasheet: NULL-source docs fold to '' and survive the modal-lang join") {
    val docs = Seq(
      (1L, "kept row", "en", null.asInstanceOf[String]),
      (2L, "other kept", "en", null.asInstanceOf[String]),
      (3L, "named", "de", "A"))
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.ops.Quality.datasheet(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(5)))).toMap
    // the NULL-source volume row must NOT vanish (inner join on a NULL
    // key would drop it) — it folds to '' like _lang does
    assert(got.keySet == Set("", "A"))
    assert(got("") == ((2L, "en")))
    assert(got("A") == ((1L, "de")))
  }

  test("readability: hand-computed FRE milli, NULL/empty/wordless rows survive") {
    val docs = Seq(
      (1L, "the cat sat. it ran!"), // 5 words, 2 sentence runs, 5 vowel runs
      (2L, null.asInstanceOf[String]),
      (3L, ""),                     // zero words: metrics NULL, row kept
      (4L, "km"),                   // vowelless single word, no punctuation
      (5L, "banana bandana"))       // 6 syllables / 2 words: negative FRE
      .toDF("doc_id", "text")
    val got = Quality.readability(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        Option(r.getString(7))))).toMap
    // doc 1: wps = 5000//2 = 2500, spw = 1000;
    // fre = 206835 - 2537 - 84600 = 119698
    assert(got(1L) == ((5L, 2L, 5L, Some(119698L), Some("very_easy"))))
    assert(got(2L) == ((0L, 0L, 0L, None, None)))
    // empty text: sentence floor applies but zero words means NULL fre
    assert(got(3L) == ((0L, 1L, 0L, None, None)))
    // doc 4: wps = 1000, spw = 0 -> fre = 206835 - 1015 = 205820
    assert(got(4L) == ((1L, 1L, 0L, Some(205820L), Some("very_easy"))))
    // doc 5: wps = 2000, spw = 3000 ->
    // fre = 206835 - 2030 - 253800 = -48995 (negative FRE is a value)
    assert(got(5L) == ((2L, 1L, 6L, Some(-48995L), Some("very_confusing"))))
  }
}
