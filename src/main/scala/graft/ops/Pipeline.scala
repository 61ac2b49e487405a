package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A composed FineWeb-style curation pipeline (Penedo et al. 2024,
  * "The FineWeb Datasets" — the stage order every modern crawl-to-
  * pretraining recipe follows): exact duplicated-span removal, then
  * repetition filtering on the CLEANED text, then LM-perplexity
  * tiering against an in-corpus target, then a per-source document
  * cap. Each stage is one of this library's individually-oracled
  * operators; this entry point exists because a pipeline user runs
  * them chained, and the chain has semantics of its own (every stage
  * sees the previous stage's survivors, and the perplexity thresholds
  * are computed on the post-filter distribution, not the raw corpus).
  *
  * Scale shape is inherited from the stages: the substring dedup never
  * shuffles text, the repetition filter is ZERO-shuffle scan-side work
  * ([[graft.expr.GopherRepetitionStats]]), the LM tables stay
  * broadcastable, and the cap's sorts are salt-bounded under domain
  * skew. The one extra cost the composition adds is a doc-id-keyed
  * join of the narrow perplexity scores back to the survivor frame.
  */
object Pipeline {

  /** Returns the curated survivor set: (id, lang, domain, n_tokens,
    * n_removed, avg_surprisal, ppl_bucket, rk).
    *
    *  1. [[Dedup.exactSubstrDedup]] (`minLen`) rewrites every doc with
    *     corpus-duplicated spans cut out;
    *  2. repetition gate on the cleaned text: keep docs with
    *     `dup_word_frac <= maxDupWordFrac`, `top2_frac <= maxTop2Frac`,
    *     `dup3_frac <= maxDup3Frac`;
    *  3. [[Perplexity.perplexityBuckets]] against the survivors whose
    *     `langCol` equals `targetLang`; the `tail` tier is dropped
    *     (docs without bigram evidence drop with it, the stage-3
    *     no-evidence rule);
    *  4. [[Curate.capPerDomain]] keeps at most `capPerSource` docs per
    *     `domainCol` in salted-md5 rank order.
    */
  /** Stages 1-2 (span dedup + repetition gate) — shared verbatim by the
    * derive-thresholds batch path ([[fineWebCurate]]), the persisted-
    * model batch path ([[fineWebCurateFromModel]]), and the streaming
    * form ([[graft.streaming.StreamCurate]]); any drift between them
    * would silently break the stream==batch contract. Returns the
    * survivor frame (id, lang, domain, n_tokens, n_removed, kept_text). */
  private[graft] def cleanAndGate(docs: DataFrame, minLen: Int,
                                  maxDupWordFrac: Double, maxTop2Frac: Double,
                                  maxDup3Frac: Double, idCol: String,
                                  textCol: String, langCol: String,
                                  domainCol: String): DataFrame = {
    // 1. span dedup, carrying the mixture columns through
    val deduped = Dedup.exactSubstrDedup(docs, minLen, idCol, textCol,
      keep = Seq(langCol, domainCol))

    // 2. repetition gate, scan-side on the cleaned text (no joins: the
    // signals come from the single-pass expression inline)
    val s = graft.expr.Exprs.gopherRepetitionStats(col("kept_text"))
    val chars = greatest(length(col("kept_text")), lit(1)).cast("double")
    deduped.withColumn("_s", s)
      .withColumn("_dwf",
        (col("_s.n_words") - col("_s.n_distinct")).cast("double") /
          greatest(col("_s.n_words"), lit(1L)))
      .withColumn("_t2f",
        (col("_s.top2_cnt") * length(col("_s.top2_gram"))).cast("double") / chars)
      .withColumn("_d3f", col("_s.dup3_chars").cast("double") / chars)
      .where(col("_dwf") <= maxDupWordFrac && col("_t2f") <= maxTop2Frac &&
        col("_d3f") <= maxDup3Frac)
      .select(col(idCol), col(langCol), col(domainCol),
        col("n_tokens"), col("n_removed"), col("kept_text"))
  }

  def fineWebCurate(docs: DataFrame, minLen: Int = 5,
                    maxDupWordFrac: Double = 0.6, maxTop2Frac: Double = 0.2,
                    maxDup3Frac: Double = 0.2, targetLang: String = "en",
                    capPerSource: Int = 12, salt: String = "fw8",
                    idCol: String = "doc_id", textCol: String = "text",
                    langCol: String = "lang",
                    domainCol: String = "source"): DataFrame = {
    val rep = cleanAndGate(docs, minLen, maxDupWordFrac, maxTop2Frac,
      maxDup3Frac, idCol, textCol, langCol, domainCol)
    // rep is read twice (LM corpus, LM target) but NOT persisted: AQE's
    // ReusedExchange already dedups the shared span-dedup subtree within
    // the one job, and a measured persist attempt (round 8) cost
    // 5.1 -> 7.3 s at sf0.1 — cache-store overhead on a text-bearing
    // frame beat the reuse it bought

    // 3. perplexity tiers on the survivors; thresholds are computed on
    // THIS distribution (CCNet computes cutoffs on what it scores).
    // The doc metadata rides the scoring aggregation's own shuffle
    // (`keep` — grouped with the id it is functionally dependent on),
    // so no join back to the span-dedup subtree is needed; the old
    // doc-id tier join re-derived the whole stage-1/2 plan a second
    // time (r18, guide §2.4). Inner-join semantics preserved: lmScore
    // drops no-bigram docs, and tail rows drop below.
    val tiers = Perplexity.perplexityBuckets(rep,
      rep.where(col(langCol) === targetLang),
      idCol = idCol, textCol = "kept_text",
      keep = Seq(langCol, domainCol, "n_tokens", "n_removed"))
    val tiered = tiers.where(col("ppl_bucket") =!= "tail")
      .select(col(idCol), col(langCol), col(domainCol), col("n_tokens"),
        col("n_removed"), col("avg_surprisal"), col("ppl_bucket"))

    // 4. per-source cap (salted two-level rank, deterministic)
    Curate.capPerDomain(tiered, domainCol, idCol, capPerSource, salt)
      .select(col(idCol), col(langCol), col(domainCol), col("n_tokens"),
        col("n_removed"), col("avg_surprisal"), col("ppl_bucket"), col("rk"))
  }

  /** FIT the curation model once — the production/streaming prerequisite:
    * run stages 1-2 on a reference corpus, train and persist the target-
    * language LM on the survivors ([[Perplexity.saveLm]]), score the
    * survivors against it, and persist the tertile cutoffs next to the
    * LM (`<modelDir>/thresholds`). CCNet's deployment shape exactly:
    * cutoffs are computed ONCE on a reference distribution, then applied
    * as fixed values to every shard or micro-batch — a stream cannot see
    * a global distribution, and re-deriving per batch would make
    * admission depend on batch boundaries. */
  def fitCurationModel(docs: DataFrame, modelDir: String, minLen: Int = 5,
                       maxDupWordFrac: Double = 0.6, maxTop2Frac: Double = 0.2,
                       maxDup3Frac: Double = 0.2, targetLang: String = "en",
                       idCol: String = "doc_id", textCol: String = "text",
                       langCol: String = "lang",
                       domainCol: String = "source"): Unit = {
    val rep = cleanAndGate(docs, minLen, maxDupWordFrac, maxTop2Frac,
      maxDup3Frac, idCol, textCol, langCol, domainCol)
    Perplexity.saveLm(rep.where(col(langCol) === targetLang), modelDir,
      textCol = "kept_text")
    val scored = Perplexity.lmScoreFromIndex(rep, modelDir, idCol, "kept_text")
    Perplexity.tertileThresholds(scored, "avg_surprisal")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/thresholds")
  }

  /** The persisted-model twin of [[fineWebCurate]]: stages 1-2, then
    * scoring against the SAVED LM and tagging against the SAVED
    * thresholds instead of re-deriving either. When the model was fit on
    * the same corpus, the output is row-identical to [[fineWebCurate]]
    * (StreamCurateSpec pins it) — which is what licenses the streaming
    * form to use the persisted path while the oracle gates the derived
    * one. */
  def fineWebCurateFromModel(docs: DataFrame, modelDir: String,
                             minLen: Int = 5, maxDupWordFrac: Double = 0.6,
                             maxTop2Frac: Double = 0.2,
                             maxDup3Frac: Double = 0.2,
                             capPerSource: Int = 12, salt: String = "fw8",
                             idCol: String = "doc_id", textCol: String = "text",
                             langCol: String = "lang",
                             domainCol: String = "source"): DataFrame = {
    val rep = cleanAndGate(docs, minLen, maxDupWordFrac, maxTop2Frac,
      maxDup3Frac, idCol, textCol, langCol, domainCol)
    val tiered = tierFromModel(rep, modelDir, idCol)
    Curate.capPerDomain(tiered, domainCol, idCol, capPerSource, salt)
      .select(col(idCol), col(langCol), col(domainCol), col("n_tokens"),
        col("n_removed"), col("avg_surprisal"), col("ppl_bucket"), col("rk"))
  }

  /** Stage 3 against a persisted model: score `rep` (kept_text) with the
    * saved LM, tag with the saved thresholds, drop the tail tier. Shared
    * by [[fineWebCurateFromModel]] and the streaming form. */
  private[graft] def tierFromModel(rep: DataFrame, modelDir: String,
                                   idCol: String): DataFrame = {
    val spark = rep.sparkSession
    // metadata rides the scoring aggregation (the fineWebCurate keep
    // discipline) — no join back to the span-dedup subtree
    val keep = rep.columns.filter(c => c != idCol && c != "kept_text").toSeq
    val scored = Perplexity.lmScoreFromIndex(rep, modelDir, idCol,
      "kept_text", keep)
    val tagged = Perplexity.tagTertiles(scored,
      spark.read.parquet(s"$modelDir/thresholds"), "avg_surprisal",
      "ppl_bucket", "head", "middle", "tail")
    tagged.where(col("ppl_bucket") =!= "tail")
      .select((col(idCol) +: keep.map(col)) ++
        Seq(col("avg_surprisal"), col("ppl_bucket")): _*)
  }

  /** The composed GOVERNANCE sweep — the compliance stages a crawl
    * corpus passes BEFORE any quality curation touches it, chained in
    * one plan with a single reason-coded verdict (every gate is one of
    * this library's individually-oracled operators; the composition
    * exists because the PRECEDENCE is semantics of its own):
    *
    *   opted_out  — the host sits under an opt-out registry domain
    *                ([[Web.domainOptOut]]; legal removal requests
    *                outrank everything — an opted-out doc must not
    *                even appear in a license report's retained set);
    *   robots_blocked — (only when `robotsRules` is given) the URL's
    *                path is disallowed for `bot` under RFC 9309
    *                longest-match ([[Web.robotsUrlVerdict]]) — the
    *                site's own per-path directive, checked after the
    *                legal registry and before anything content-based;
    *   license    — copyleft or unrecognized-SPDX declaration
    *                ([[Quality.licenseCensus]]; `none` passes — web
    *                text is mostly unlicensed prose, and dropping it
    *                would empty the corpus; the code-corpus caller
    *                that wants the Stack rule filters `none` itself);
    *   pii        — an email/phone pattern hit ([[Curate]] patterns —
    *                route to the redaction pipeline, not the corpus);
    *   unreadable — Flesch below `minFreMilli` or unmeasurable
    *                ([[Quality.readability]]);
    *   keep       — everything else.
    *
    * Scale shape: every content gate is zero-shuffle scan-side work,
    * computed as COLUMNS of one corpus projection that ride
    * domainOptOut's longest-match aggregation as extra grouping keys
    * (the [[fineWebCurate]] metadata-through-aggregation device) — the
    * whole sweep is ONE pass over the corpus plus one map-side-combined
    * shuffle of narrow per-doc scalars, never text. The registry
    * broadcasts inside domainOptOut; only the optional robots gate adds
    * a second doc pass and one id-keyed join (it aggregates the same
    * rows under a different key). */
  def governanceSweep(docs: DataFrame, registry: DataFrame,
                      minFreMilli: Long = 30000L,
                      idCol: String = "doc_id", urlCol: String = "url",
                      textCol: String = "text",
                      robotsRules: Option[DataFrame] = None,
                      bot: String = "graftbot"): DataFrame = {
    // ONE corpus projection (r19, guide §2.4): the license, readability
    // and PII gates are pure scan-side expressions, so they compute as
    // COLUMNS of a single pass over `docs` and ride domainOptOut's
    // longest-match aggregation as extra grouping keys (functionally
    // dependent on idCol — the fineWebCurate metadata-through-
    // aggregation device). The old form projected each gate separately
    // and equi-joined four narrow frames back onto the id frame: 4
    // corpus scans + 4 doc-id joins for the same rows.
    val meta = Quality.withLicenseCols(
        Quality.withReadabilityCols(
          docs.select(col(idCol), col(urlCol), col(textCol)), textCol),
        textCol)
      .withColumn("has_pii",
        regexp_count(col(textCol), lit(Curate.emailPattern)) +
          regexp_count(col(textCol), lit(Curate.phonePattern)) > 0)
      .select(col(idCol), col(urlCol), col("spdx_id"),
        col("license_class"), col("fre_milli"), col("has_pii"))
    val opt = Web.domainOptOut(meta, registry,
      idCol = idCol, urlCol = urlCol,
      keep = Seq("spdx_id", "license_class", "fre_milli", "has_pii"))
    // the optional URL-LEVEL robots gate ([[Web.robotsUrlVerdict]]):
    // RFC 9309 path patterns sit between the domain registry (a legal
    // removal outranks a crawl directive) and everything content-based
    // — a path the site disallowed for this bot must not even be
    // license-reported. Its verdict is a DIFFERENT aggregation of the
    // same doc rows (host-keyed rule match, then a per-doc fold), so it
    // stays the composition's one id-keyed join.
    val rob = robotsRules.map(rr =>
      Web.robotsUrlVerdict(docs.select(col(idCol), col(urlCol)), rr,
          bot, urlCol = urlCol, idCol = idCol)
        .select(col(idCol), col("allowed").as("_rob_ok")))
    val joined = rob.foldLeft(
      opt.select(col(idCol), col("host"), col("optout_domain"),
        col("spdx_id"), col("license_class"), col("fre_milli"),
        col("has_pii")))(_.join(_, Seq(idCol)))
    joined
      .withColumn("verdict",
        when(col("optout_domain").isNotNull, lit("opted_out"))
          .when(rob.fold(lit(false))(_ => !col("_rob_ok")),
            lit("robots_blocked"))
          .when(col("license_class").isin("copyleft", "other-spdx"),
            lit("license"))
          .when(col("has_pii"), lit("pii"))
          .when(col("fre_milli").isNull || col("fre_milli") < minFreMilli,
            lit("unreadable"))
          .otherwise(lit("keep")))
      .withColumn("kept", col("verdict") === "keep")
      .drop("_rob_ok")
  }

  /** The composed DECONTAMINATION sweep — eval hygiene's q238: the
    * three contamination legs this library ships separately (lexical
    * gram overlap, BM25 triage, semantic cosine) chained into ONE
    * reason-coded per-document verdict, because the precedence is
    * semantics of its own (a doc must carry its STRONGEST evidence
    * class, not three overlapping reports):
    *
    *   lexical      — the doc shares >= `minOverlapPct`% of some bench
    *                  item's distinct `n`-grams (verbatim evidence, the
    *                  GPT-3 appendix-C rule; corpus-WIDE, not the
    *                  triage's candidates-only cut) — drop;
    *   semantic     — some bench probe embedding clears `minCos`
    *                  (3dp-rounded cosine, the q189 flag-stability
    *                  device) — paraphrase-level evidence — drop;
    *   bm25_suspect — the doc ranks top-`k` BM25 for some bench query
    *                  but NEITHER harder leg confirms — route to
    *                  review, not auto-drop (kept=false here too: a
    *                  decontamination gate fails closed);
    *   clean        — everything else (kept).
    *
    * Scale shape: the lexical leg winnows corpus grams scan-side
    * against the BROADCAST bench gram set before anything shuffles
    * (benches are small by definition — that asymmetry is the whole
    * design); BM25 rides the existing postings machinery; the semantic
    * leg broadcasts the probe matrix. The composition adds only
    * id-keyed left joins of narrow per-doc verdict columns. */
  def contaminationSweep(docs: DataFrame, bench: DataFrame,
                         docVecs: DataFrame, benchVecs: DataFrame,
                         n: Int = 5, minOverlapPct: Long = 20L,
                         k: Int = 3, minCos: Double = 0.6,
                         idCol: String = "doc_id", textCol: String = "text",
                         benchIdCol: String = "bench_id",
                         vecIdCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val lex = lexicalLeg(docs, bench, n, minOverlapPct, idCol, textCol,
      benchIdCol)
    // index path, not the fused Retrieval.bm25 (r18 probe): bench items
    // are document-sized, their term set covers most of the vocabulary,
    // and the persisted matched frame keeps the exploding scoring stage
    // fast — see the contaminationTriage note
    val sus = Retrieval.bm25Search(
        Retrieval.bm25Postings(docs, idCol, textCol),
        bench.select(col(benchIdCol).as("query_id"), col(textCol)), k)
      .groupBy(col("doc_id"))
      .agg(min(col("rank")).cast("long").as("bm25_rank"))
      .select(col("doc_id").as(idCol), col("bm25_rank"))
    val sem = Similarity.semanticContamination(
        docVecs.select(col(vecIdCol), col(vecCol)), benchVecs,
        minCos, vecIdCol, vecCol, guardSelfPairs = false)
      .select(col("nid").as(idCol), col("n_probes_hit"), col("max_cos3"))
    docs.select(col(idCol))
      .join(lex, Seq(idCol), "left")
      .join(sus, Seq(idCol), "left")
      .join(sem, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lex_bench"), lit(0L)).as("n_lex_bench"),
        col("lex_ppm"), col("bm25_rank"),
        coalesce(col("n_probes_hit"), lit(0L)).as("n_probes_hit"),
        col("max_cos3"))
      .withColumn("verdict",
        when(col("n_lex_bench") > 0, lit("lexical"))
          .when(col("n_probes_hit") > 0, lit("semantic"))
          .when(col("bm25_rank").isNotNull, lit("bm25_suspect"))
          .otherwise(lit("clean")))
      .withColumn("kept", col("verdict") === "clean")
  }

  /** The sweep's lexical evidence: per doc the count of bench items
    * whose distinct-gram overlap clears `minOverlapPct`%, and the
    * strongest overlap in exact ppm. Corpus grams are winnowed
    * scan-side against the BROADCAST bench gram set before anything
    * shuffles. */
  /** The (doc, bench item) shared-gram pair frame both lexical views
    * fold: `_ns` shared distinct grams, `_bg` the item's gram count. */
  private def lexicalPairs(docs: DataFrame, bench: DataFrame, n: Int,
                           idCol: String, textCol: String,
                           benchIdCol: String): DataFrame = {
    val benchSh = bench.select(col(benchIdCol),
      array_distinct(Dedup.shingles(col(textCol), n)).as("_g"))
    val benchSizes = benchSh.select(col(benchIdCol),
      size(col("_g")).cast("long").as("_bg"))
    val benchGrams = benchSh.select(col(benchIdCol), explode(col("_g")).as("_h"))
    docs
      .select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("_h"))
      .join(broadcast(benchGrams), Seq("_h"))
      .groupBy(col(idCol), col(benchIdCol)).agg(count(lit(1)).as("_ns"))
      .join(broadcast(benchSizes), Seq(benchIdCol))
  }

  private[graft] def lexicalLeg(docs: DataFrame, bench: DataFrame,
                                n: Int, minOverlapPct: Long, idCol: String,
                                textCol: String,
                                benchIdCol: String): DataFrame =
    lexicalPairs(docs, bench, n, idCol, textCol, benchIdCol)
      .where(col("_ns") * 100L >= col("_bg") * minOverlapPct &&
        col("_bg") > 0L)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lex_bench"),
        max(expr("_ns * 1000000 div _bg")).as("lex_ppm"))

  /** The BENCH-side audit of the sweep's lexical leg — the question an
    * eval owner asks after a decontamination run: WHICH items leaked,
    * how widely, and which are provably unleaked (the q217 zero-hit
    * discipline: an item with no contaminated doc reads 0, it does not
    * vanish — "this eval is clean" is a claim the report must be able
    * to make). Per bench item: contaminated-doc count at the
    * `minOverlapPct` rule, the widest single-doc overlap in exact ppm,
    * and the item's gram count (tiny items saturate trivially — the
    * denominator belongs in the report). Bounded by |bench| rows; the
    * pair frame folds map-side before the broadcast size join. */
  def contaminationAudit(docs: DataFrame, bench: DataFrame,
                         n: Int = 5, minOverlapPct: Long = 20L,
                         idCol: String = "doc_id", textCol: String = "text",
                         benchIdCol: String = "bench_id"): DataFrame = {
    val hits = lexicalPairs(docs, bench, n, idCol, textCol, benchIdCol)
      .where(col("_ns") * 100L >= col("_bg") * minOverlapPct &&
        col("_bg") > 0L)
      .groupBy(col(benchIdCol))
      .agg(count(lit(1)).as("_nd"),
        max(expr("_ns * 1000000 div _bg")).as("_mp"))
    bench.select(col(benchIdCol),
        size(array_distinct(Dedup.shingles(col(textCol), n))).cast("long")
          .as("bench_grams"))
      .join(broadcast(hits), Seq(benchIdCol), "left")
      .select(col(benchIdCol), col("bench_grams"),
        coalesce(col("_nd"), lit(0L)).as("n_contaminated"),
        col("_mp").as("max_overlap_ppm"))
  }

  /** The STREAMABLE contamination gate — [[contaminationSweep]]'s
    * per-batch form: the lexical and semantic legs are already
    * per-doc-vs-fixed-bench (batch-independent), but live BM25 is not
    * (df/avgdl/top-k rank quantify over the whole corpus), so the
    * triage leg scores against a [[Retrieval.bm25Frozen]] REFERENCE
    * table and flags `score_fx >= minScoreFx` instead of rank<=k — a
    * threshold a single doc can answer for itself. `docs` carries both
    * text and the embedding column. Output: one verdict row per doc
    * (same precedence as the sweep; bm25_score_fx replaces bm25_rank).
    * Because every leg is per-doc against fixed reference frames, a
    * stream of batches produces EXACTLY the rows of one batch run on
    * their union — the stream==batch contract residents are specced
    * against. */
  def contaminationGate(docs: DataFrame, bench: DataFrame,
                        benchVecs: DataFrame, frozen: DataFrame,
                        minScoreFx: Long,
                        n: Int = 5, minOverlapPct: Long = 20L,
                        minCos: Double = 0.6,
                        idCol: String = "doc_id", textCol: String = "text",
                        benchIdCol: String = "bench_id",
                        vecIdCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val lex = lexicalLeg(docs, bench, n, minOverlapPct, idCol, textCol,
      benchIdCol)
    val sus = Retrieval.bm25ScoreFrozen(docs, frozen, idCol, textCol)
      .where(col("score_fx") >= minScoreFx)
      .groupBy(col(idCol)).agg(max(col("score_fx")).as("bm25_score_fx"))
    val sem = Similarity.semanticContamination(
        docs.select(col(idCol), col(vecCol)),
        benchVecs.select(col(vecIdCol).as(idCol), col(vecCol)),
        minCos, idCol, vecCol, guardSelfPairs = false)
      .select(col("nid").as(idCol), col("n_probes_hit"), col("max_cos3"))
    docs.select(col(idCol))
      .join(lex, Seq(idCol), "left")
      .join(sus, Seq(idCol), "left")
      .join(sem, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lex_bench"), lit(0L)).as("n_lex_bench"),
        col("lex_ppm"), col("bm25_score_fx"),
        coalesce(col("n_probes_hit"), lit(0L)).as("n_probes_hit"),
        col("max_cos3"))
      .withColumn("verdict",
        when(col("n_lex_bench") > 0, lit("lexical"))
          .when(col("n_probes_hit") > 0, lit("semantic"))
          .when(col("bm25_score_fx").isNotNull, lit("bm25_suspect"))
          .otherwise(lit("clean")))
      .withColumn("kept", col("verdict") === "clean")
  }
}
