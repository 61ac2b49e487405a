package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Plan-regression guard: pins the shuffle budget of representative
  * queries. A change that silently adds an exchange to one of these
  * plans fails HERE, in the unit suite, instead of surfacing as a bench
  * regression a round later. Counts unwrap AQE query stages (a
  * children-only walk reads 0 from any adaptive plan — see
  * BucketingSpec). Budgets are the CURRENT plan shapes from PLANS.md;
  * they are upper bounds, so an optimization that removes an exchange
  * still passes. */
class PlanGuardSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Counts across a set of plans with ONE cache-dedup set: descends into
    * each distinct persisted build plan once (`.persist()` hides its
    * shuffles behind InMemoryTableScan the same way localCheckpoint hides
    * lineage — the round-6 census blind spot). */
  private def countAll(plans: Seq[SparkPlan], pred: SparkPlan => Boolean): Int = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        if (seen.add(im.relation.cachedPlan)) walk(im.relation.cachedPlan) else 0
      case other =>
        (if (pred(other)) 1 else 0) +
          other.children.map(walk).sum +
          other.subqueries.map(walk).sum
    }
    plans.map(walk).sum
  }

  private def count(p: SparkPlan, pred: SparkPlan => Boolean): Int =
    countAll(Seq(p), pred)

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan, _.isInstanceOf[ShuffleExchangeLike])
  }

  private def broadcasts(df: DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan, _.isInstanceOf[BroadcastExchangeLike])
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("scan-speed queries execute with ZERO shuffles") {
    for (name <- Seq("q01_cdc_parse", "q21_token_stats", "q22_quality",
      "q23_lang_id", "q24_fingerprint", "q26_simhash_sig", "q34_bpe_tokens",
      "q44_scalar_battery", "q46_hash_sample", "q47_chunks", "q48_pii_redact",
      "q63_unpivot", "q69_repetition", "q80_quantize_int8", "q110_winnow",
      "q114_url_canon", "q120_gopher_quality", "q124_c4_filter",
      "q125_stack_filters", "q142_unigram_entropy")) {
      assert(shuffles(q(name)) == 0, s"$name grew a shuffle")
    }
  }

  test("single-shuffle aggregations/windows stay single-shuffle") {
    for (name <- Seq("q06_pricing_summary", "q11_rollup", "q20_dedup_exact",
      "q35_sessions", "q37_quantiles", "q38_cube", "q41_running_revenue",
      "q45_approx_quantiles", "q51_cdc_latest", "q54_variant",
      "q55_column_stats", "q57_window_battery", "q62_session_window",
      "q73_bpe_pairs", "q78_sequence_pack", "q81_length_band",
      "q87_filtered_knn", "q127_span_corrupt", "q128_content_chunks")) {
      assert(shuffles(q(name)) <= 1, s"$name grew beyond one shuffle")
    }
  }

  test("round-6 additions hold their plan budgets") {
    // q88: one scalar-aggregate exchange for the weight sum; the sample
    // predicate itself is scan-side (broadcast join back)
    assert(shuffles(q("q88_weighted_sample")) <= 1, "q88 grew a shuffle")
    assert(broadcasts(q("q88_weighted_sample")) >= 1, "q88 must broadcast the sum")
    // q89: two per-side bucket aggs + the tiny global window; the join of
    // the <=#buckets count frames must not add a fourth exchange
    assert(shuffles(q("q89_drift")) <= 3, "q89 grew beyond agg+agg+window")
    // q92: per-day aggregate then the #days-row window
    assert(shuffles(q("q92_rolling_spikes")) <= 2, "q92 grew beyond agg+window")
  }

  test("round-7 additions hold their plan budgets") {
    // q114: URL canonicalization is pure scan-side string work
    assert(shuffles(q("q114_url_canon")) == 0, "q114 grew a shuffle")
    // q115: the two-level rank is exactly two window exchanges
    // ((domain, bucket) then domain) — a third means the salting broke
    assert(shuffles(q("q115_domain_cap")) <= 2, "q115 grew beyond two windows")
    // q116 (round-8): the codegen'd GopherRepetitionStats variant is pure
    // scan-side work — ZERO shuffles, one scan; any exchange means the
    // relational explode-gram shape leaked back in
    assert(shuffles(q("q116_gopher_rep")) == 0, "q116 grew a shuffle")
    assert(q("q116_gopher_rep").queryExecution.executedPlan.toString
      .split("Scan parquet").length - 1 <= 1, "q116 re-reads the text scan")
    // q118: groupBy(line) + the line-key join + the doc reassembly agg;
    // a fourth exchange means the first-occurrence shape regressed (e.g.
    // to a per-line window)
    assert(shuffles(q("q118_line_dedup")) <= 3, "q118 grew beyond three exchanges")
    // q119: ONE data exchange (the range-bucketed prefix window; the
    // offset branch reuses it under AQE) + up to two CENSUS-SIZED
    // exchanges (|groups|·buckets rows: the bucket-offset rollup and
    // its per-group window) — the round-15 sound rewrite; the old form
    // shuffled the full data twice
    assert(shuffles(q("q119_token_budget")) <= 3, "q119 grew extra exchanges")
  }

  test("round-8 additions hold their plan budgets") {
    // q129: gram-key agg + the occ reshuffle for the semi-join, the hit
    // window + island agg + per-doc span agg (doc-keyed, AQE may collapse
    // or broadcast), and the final doc join — six exchanges is the
    // relational shape's ceiling; more means a stage regressed
    assert(shuffles(q("q129_substr_dedup")) <= 6, "q129 grew extra exchanges")
    // q130: scored is persisted, so the corpus text is scanned at most
    // twice live (score build + LM tables from the en target) and the
    // histogram chain reads the cache (countAll descends INTO cached
    // plans rather than counting the cache nodes, so assert on the plan
    // string here)
    assert(q("q130_ccnet_ppl").queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"), "q130 lost its scored persist")
    spark.catalog.clearCache() // drop q130's persisted score frame
    // q23b: classification is scan-side (LangNbScore ships the model
    // inside the plan), so the only exchanges left are the training
    // aggregations building the weight grid
    assert(shuffles(q("q23b_lang_id_ft")) <= 4, "q23b classify stopped being scan-side")
    // q131: stage-2 adds ZERO exchanges on top of stage 1 (<=6) +
    // stage 3 (score agg + histogram chain behind the persist) + the
    // id-keyed tier join + the cap's two windows; 19 is the measured
    // composition shape at sf0.001 (budgets are upper bounds). Round 9
    // raised it 13 -> 19: the tertile-threshold derivation now runs the
    // bounded two-level cumulativeByValue (range partition + per-pid
    // window + offsets window + broadcast-back) instead of ONE global
    // single-partition Window — every added exchange moves only the
    // DISTINCT-MEANS histogram (a few hundred narrow rows), which is
    // exactly the trade: constant extra tiny exchanges for a sort that
    // no longer serializes the distinct means through one task
    assert(shuffles(q("q131_fineweb_pipeline")) <= 19, "q131 grew extra exchanges")
    spark.catalog.clearCache() // q131's internal ppl persist
  }

  test("round-9 additions hold their plan budgets") {
    // q133: the dHash is SCAN-SIDE (media bytes never shuffle — only the
    // 8-byte sigs move): one bucket groupBy + the pair-verify id joins.
    // A third exchange means hashing fell off the scan
    assert(shuffles(q("q133_image_dhash_pairs")) <= 2, "q133 grew extra exchanges")
    // q134: scoring is scan-side (LinearGramScore ships the weight
    // vector in-plan — exactly ONE corpus text scan); the remaining
    // exchanges are the training aggregations + the tertile-threshold
    // chain, all of which move <=buckets-row / distinct-value frames
    val q134 = q("q134_quality_score")
    // the scored frame is persisted, so the corpus text is scanned once
    // at execution no matter how many times the threshold chain and the
    // final tagging reference it (the q130 probe — plan-string scan
    // counts double-report cached build plans)
    assert(q134.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"), "q134 lost its scored persist")
    assert(shuffles(q134) <= 11, "q134 grew extra exchanges")
    spark.catalog.clearCache() // q134's internal scored persist
    // q135: cluster decisions and representatives come back BROADCAST
    // onto the decoded-metadata frame (the resolveDuplicates contract —
    // the corpus side never shuffles)
    assert(q("q135_image_dedup_resolve").queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "q135 lost its broadcast resolution")
  }

  test("round-12 additions hold their plan budgets") {
    // q188/q194: pure scan-side passes (mapPartitions segmentation /
    // row-local margin projection) — ZERO shuffles
    assert(shuffles(q("q188_unigram_segment")) == 0, "q188 grew a shuffle")
    assert(shuffles(q("q196_unigram_em")) == 0, "q196 grew a shuffle")
    assert(shuffles(q("q194_margin_gate")) == 0, "q194 grew a shuffle")
    // q189: bench probes broadcast; the only exchange is the drop-list
    // groupBy — vectors must never shuffle
    assert(shuffles(q("q189_semantic_contamination")) <= 1,
      "q189 grew beyond the drop-list aggregation")
    assert(broadcasts(q("q189_semantic_contamination")) >= 1,
      "q189 must broadcast the probe set")
    // q192: the segment pass (0) + source join + the source rollup
    assert(shuffles(q("q192_unigram_fertility")) <= 2, "q192 grew extra exchanges")
    // q193: render agg + the (md5, len) dedup agg
    assert(shuffles(q("q193_chat_dedup")) <= 2, "q193 grew extra exchanges")
    // q190: (doc,gram) distinct + df agg + the key join + per-doc rollup
    assert(shuffles(q("q190_gram_novelty")) <= 4, "q190 grew extra exchanges")
    // q191: two budgetPerGroup stages, each ONE data exchange + up to
    // two census-sized offset exchanges (see the q119 note) — the
    // eligible frame is small enough for AQE to collapse
    assert(shuffles(q("q191_anneal_mix")) <= 6, "q191 grew extra exchanges")
    // q195: df agg + volume rollup + lang rollup + modal window
    assert(shuffles(q("q195_datasheet")) <= 4, "q195 grew extra exchanges")
    // q197: one pair aggregation + two broadcast strength joins on top
    // of the checkpointed fit
    assert(shuffles(q("q197_bt_fit")) <= 2, "q197 grew extra exchanges")
    // q187: the iteration shuffles live behind per-round checkpoints
    // (censused through CheckpointAudit in PLANS.md); the final read
    // is the item join only
    assert(shuffles(q("q187_bradley_terry")) <= 4, "q187's final join grew")
    // q198: sample-trained WordPiece — the trainer collects a bounded
    // 256-doc sample, the encode is a pure scan-side pass: ZERO shuffles
    assert(shuffles(q("q198_wordpiece")) == 0, "q198 grew a shuffle")
    // q199/q200: the 8 GD/MW rounds live behind per-round checkpoints;
    // the final read broadcasts the <=4-long weight row onto one scan
    assert(shuffles(q("q199_logreg_quality")) == 0, "q199's final scan grew a shuffle")
    assert(broadcasts(q("q199_logreg_quality")) >= 1, "q199 must broadcast the weights")
    assert(shuffles(q("q200_doremi_mix")) == 0, "q200's final read grew a shuffle")
    // q201: the game→pair aggregation + the matrix rollup
    assert(shuffles(q("q201_winrate_wilson")) <= 2, "q201 grew extra exchanges")
    // q202: probe-set build + two grouped neighborhood aggs + the mined
    // join; probe vectors travel broadcast, the corpus side never
    // shuffles. bitextMargin materializes + releases its candidate cache
    // (round-13 advice), so the final plan is a bare checkpoint scan —
    // read the TRUE census through CheckpointAudit.
    graft.plans.CheckpointAudit.start()
    val bdf = q("q202_bitext_margin")
    val bplans = (graft.plans.CheckpointAudit.finish() :+ bdf)
      .map(_.queryExecution.executedPlan)
    assert(countAll(bplans, _.isInstanceOf[ShuffleExchangeLike]) <= 4,
      "q202 grew extra exchanges")
    assert(countAll(bplans, _.isInstanceOf[BroadcastExchangeLike]) >= 1,
      "q202 must broadcast the probes")
    // q203: candidate pairs come back BROADCAST onto the token frame —
    // the LCS DP is row-local, ZERO shuffles
    assert(shuffles(q("q203_rouge_dedup")) == 0, "q203 grew a shuffle")
    assert(broadcasts(q("q203_rouge_dedup")) >= 1, "q203 lost its broadcast pair join")
    // q204: regex extraction + checksum fold ride the scan — ZERO shuffles
    assert(shuffles(q("q204_luhn_audit")) == 0, "q204 grew a shuffle")
    // q205: the token count shuffle + sort-limit head + the bounded
    // (<=256-row) rank window, octave rollup, and fit window
    assert(shuffles(q("q205_zipf_fit")) <= 5, "q205 grew extra exchanges")
    // q206: the Gram/power iteration runs at construction (bounded
    // collects, eagerByDesign); the returned projection is ONE scan
    assert(shuffles(q("q206_pca_projection")) == 0, "q206's final scan grew a shuffle")
    // q207: Lloyd rounds run at construction (k·d-row collects); the
    // returned assignment is ONE scan against literal centroids
    assert(shuffles(q("q207_kmeans_clusters")) == 0, "q207's final scan grew a shuffle")
    // q208: the q207 scan + ONE map-side-combined report rollup
    assert(shuffles(q("q208_cluster_report")) <= 1, "q208 grew extra exchanges")
    // q209: token first-occurrence agg + doc-count agg + the bounded
    // cumulativeByValue machinery (range partition, per-part totals,
    // offsets) + the vocab-offset join + octave/fit windows
    assert(shuffles(q("q209_heaps_fit")) <= 10, "q209 grew extra exchanges")
    // q210: ONE per-source token aggregation; the waterfill windows run
    // over the source-alphabet-bounded frame
    assert(shuffles(q("q210_waterfill")) <= 4, "q210 grew extra exchanges")
    // q211: size agg + the bounded waterfill windows + the per-cluster
    // rank window; the quota joins back BROADCAST
    assert(shuffles(q("q211_cluster_coreset")) <= 7, "q211 grew extra exchanges")
    assert(broadcasts(q("q211_cluster_coreset")) >= 1, "q211 lost its broadcast quota join")
    // q212: pure driver arithmetic on the fit — the returned 1-row
    // frame is a local relation, ZERO shuffles
    assert(shuffles(q("q212_pca_anisotropy")) == 0, "q212 grew a shuffle")
    // q213: regex census rides the scan — ZERO shuffles
    assert(shuffles(q("q213_license_census")) == 0, "q213 grew a shuffle")
    // q214: vocab count + sort-limit + the doc-partitioned lead window
    // + the pair rollup; both vocab ends join BROADCAST (ReuseExchange
    // collapses the two identical vocab broadcasts into one)
    assert(shuffles(q("q214_cooccurrence")) <= 5, "q214 grew extra exchanges")
    assert(broadcasts(q("q214_cooccurrence")) >= 1, "q214 lost its broadcast vocab joins")
    // q214 ordering: the center-side vocab restriction must sit BELOW the
    // context explode — the generator emits window× rows per token, so
    // restricting first cuts its output by the center hit-rate (the
    // round-12 verdict's one scale nit). Pin: some broadcast join lives
    // in the Generate node's subtree.
    val coPlan = {
      val df = q("q214_cooccurrence"); df.collect(); df.queryExecution.executedPlan
    }
    def findGenerate(p: SparkPlan): Option[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => findGenerate(a.executedPlan)
      case qs: QueryStageExec => findGenerate(qs.plan)
      case g: org.apache.spark.sql.execution.GenerateExec => Some(g)
      case other => other.children.view.flatMap(findGenerate).headOption
    }
    val gen = findGenerate(coPlan)
    assert(gen.isDefined, "q214 lost its context-explode Generate")
    assert(count(gen.get, _.isInstanceOf[BroadcastExchangeLike]) >= 1,
      "q214's center vocab restriction slid above the explode again")
  }

  test("round-13 additions hold their plan budgets") {
    // q215: the q214 matrix (<=5) + the marginal rollup + the scalar
    // total, all behind the materialize checkpoint; marginals and W
    // join back broadcast. True census via CheckpointAudit, cached
    // build plans descended once.
    graft.plans.CheckpointAudit.start()
    val pdf = q("q215_ppmi")
    val pplans = (graft.plans.CheckpointAudit.finish() :+ pdf)
      .map(_.queryExecution.executedPlan)
    val psh = countAll(pplans, _.isInstanceOf[ShuffleExchangeLike])
    assert(psh <= 8, s"q215 grew extra exchanges ($psh)")
    assert(countAll(pplans, _.isInstanceOf[BroadcastExchangeLike]) >= 2,
      "q215 must broadcast the marginals and the scalar total")
    // q216: registry distincts + ONE per-doc longest-match fold; the
    // registry joins BROADCAST against the scan-side suffix explode
    assert(shuffles(q("q216_domain_optout")) <= 3, "q216 grew extra exchanges")
    assert(broadcasts(q("q216_domain_optout")) >= 1,
      "q216 lost its broadcast registry join")
    // q217: the q216 verdict + the audit rollup; counts join back broadcast
    assert(shuffles(q("q217_optout_audit")) <= 6, "q217 grew extra exchanges")
    assert(broadcasts(q("q217_optout_audit")) >= 2,
      "q217 lost its broadcast joins")
    // q218: recall distinct + per-token max + per-doc sum + the top-k
    // window over candidates; query tokens and candidates broadcast
    assert(shuffles(q("q218_maxsim")) <= 4, "q218 grew extra exchanges")
    assert(broadcasts(q("q218_maxsim")) >= 2,
      "q218 lost its broadcast query-token/candidate joins")
    // q219: three scan-side segmentation passes + one rollup each —
    // the segmentations themselves never shuffle
    assert(shuffles(q("q219_tokenizer_compression")) <= 3,
      "q219 grew extra exchanges")
    // q220: the q143 BM25 chain + qrels build + two metric rollups
    assert(shuffles(q("q220_retrieval_eval")) <= 8, "q220 grew extra exchanges")
    // q221: ONE per-host window + the rules-to-agents equi-join
    assert(shuffles(q("q221_robots_rules")) <= 4, "q221 grew extra exchanges")
    // q222: the q221 parse + registry distinct + the q216 verdict fold;
    // the derived registry still joins BROADCAST
    assert(shuffles(q("q222_robots_optout")) <= 7, "q222 grew extra exchanges")
    assert(broadcasts(q("q222_robots_optout")) >= 1,
      "q222 lost its broadcast registry join")
    // q223: ONE map-side-combined rollup; the combinatorics are
    // per-row arithmetic on the bounded problem frame
    assert(shuffles(q("q223_pass_at_k")) <= 1, "q223 grew extra exchanges")
    // q224: seeding + Lloyd run at construction (bounded collects); the
    // returned assignment is ONE scan against literal centroids — the
    // q207 contract
    assert(shuffles(q("q224_kmeans_kcenter")) == 0,
      "q224's final scan grew a shuffle")
    // q225: two probe-broadcast brute retrievers (per-query windows
    // over bounded candidate frames) + the q220 metric rollups
    assert(shuffles(q("q225_matryoshka_recall")) <= 7,
      "q225 grew extra exchanges")
    assert(broadcasts(q("q225_matryoshka_recall")) >= 2,
      "q225 lost its broadcast probe frames")
  }

  test("checkpointed pipelines: CheckpointAudit exposes the true shuffle census") {
    // round-6 blind spot: these queries' final plans are a bare
    // Scan ExistingRDD (0 shuffles), so a shuffle regression inside them
    // was invisible. True counts = recorded pre-checkpoint stages + final,
    // with persisted build plans descended once.
    def trueShuffles(name: String): (Int, Int) = {
      graft.plans.CheckpointAudit.start()
      val df = q(name)
      val stages = graft.plans.CheckpointAudit.finish()
      (stages.size,
        countAll((stages :+ df).map(_.queryExecution.executedPlan),
          _.isInstanceOf[ShuffleExchangeLike]))
    }
    val (st111, sh111) = trueShuffles("q111_winnow_pairs")
    assert(st111 >= 1, "q111 must record its checkpointed pair stage")
    assert(sh111 >= 1 && sh111 <= 5, s"q111 true shuffle count $sh111 left its budget")
    val (st109, sh109) = trueShuffles("q109_pack")
    assert(st109 >= 1 && sh109 <= 3, s"q109 true shuffle count $sh109 left its budget")
  }

  test("broadcast-dim enrichment never shuffles the fact side") {
    val df = q("q02_enrich")
    assert(shuffles(df) == 0, "q02 must not shuffle")
    assert(broadcasts(df) >= 1, "q02 must broadcast the dim")
  }

  // ---- interpreted-HOF cost guard (the q73 bug class) ----------------
  // Shuffle budgets cannot see expression-evaluation cost: a lambda that
  // captures a regex/JSON parse re-evaluates it per array element with a
  // "perfect" plan shape. LambdaCostAudit closes that blind spot.

  test("no query evaluates regex/JSON work inside a HOF lambda") {
    for ((name, fn) <- SparkEntry.queries) {
      val v = graft.plans.LambdaCostAudit.violations(fn(spark, sf))
      assert(v.isEmpty, s"$name: ${v.mkString("; ")}")
    }
  }

  test("the audit fails on the original q73 formulation (regex captured in lambda)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the exact shape that shipped the O(tokens^2) bug: `toks` is the raw
    // regexp_extract_all expression and the transform lambda re-captures it
    // through element_at, so every element re-runs the regex over the text
    val toks = regexp_extract_all(col("text"), lit(ops.TextAnalysis.bpePattern), lit(0))
    val old = docs.select(explode(
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          (t, i) => concat(t, lit(" "), element_at(toks, i + 2))))).as("pair"))
    assert(graft.plans.LambdaCostAudit.violations(old).nonEmpty,
      "audit must flag the per-element regex re-evaluation")
    // and the fixed formulation is clean
    assert(graft.plans.LambdaCostAudit.violations(
      ops.TextAnalysis.bpePairCounts(docs)).isEmpty)
  }

  test("the audit sees inside subquery plans and spares per-element-variable work") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // expensive-on-the-lambda-variable = the necessary per-element work,
    // linear overall — must NOT be flagged
    val legit = docs.select(transform(split(col("text"), " "),
      x => regexp_replace(x, "[0-9]", "#")).as("clean"))
    assert(graft.plans.LambdaCostAudit.violations(legit).isEmpty,
      "per-element regex on the lambda variable is linear, not a violation")
    // the q73 bug shape hidden INSIDE a scalar subquery must still be seen
    docs.createOrReplaceTempView("lca_docs")
    val buried = spark.sql(
      """SELECT doc_id,
        |  (SELECT max(size(transform(sequence(1, 3),
        |     i -> element_at(regexp_extract_all(d2.text, '[A-Za-z]+', 0), i))))
        |   FROM lca_docs d2) m
        |FROM lca_docs""".stripMargin)
    assert(graft.plans.LambdaCostAudit.violations(buried).nonEmpty,
      "captured-regex lambda inside a subquery plan must be flagged")
  }
}
