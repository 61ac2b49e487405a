package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Curate, Importance, Similarity}
import graft.SparkEntry.waterfillCtes

/** Mixture / sampling domain registry: the dataset-composition
  * operators a pre-training pipeline runs after curation — hash and
  * stratified and weighted sampling (q46/q56/q88), deterministic
  * splits and epoch shuffling (q100/q94), mixture balancing and
  * temperature sampling (q82/q126), DSIR importance resampling
  * (q123), data-constrained epoch allocation and water-filling
  * (q160/q210), DoReMi domain reweighting (q200), two-phase anneal
  * mixes (q191), and per-source token budgets (q119). Mechanical move
  * out of SparkEntry (registry-split tranche 14): queries and SQL
  * moved verbatim; the oracle gate re-ran on the split —
  * byte-identical results. */
private[graft] object MixtureRegistry {

  /** Shared DoReMi-mixture replay (q200): the per-source loss frame,
    * then 8 unrolled multiplicative-weights rounds as chained
    * MATERIALIZED CTEs. Every division has positive operands; products
    * route through HUGEINT. Ends with `dl` (loss frame) and `da8`. */
  private val doremiCtes: String = {
    val iterCtes = (1 to 8).map { t =>
      val p = t - 1
      s"""dm$t AS MATERIALIZED (SELECT
         |    CAST(SUM(CAST(a.alpha AS HUGEINT) * l.loss_ppm) AS HUGEINT)
         |      // 1000000 mixbar
         |  FROM da$p a JOIN dl l USING (source)),
         |dx$t AS MATERIALIZED (SELECT a.source, a.asum,
         |    CAST(a.alpha AS HUGEINT) * (1000000 +
         |      16 * greatest(l.loss_ppm - (SELECT mixbar FROM dm$t), 0)) am
         |  FROM da$p a JOIN dl l USING (source)),
         |da$t AS MATERIALIZED (SELECT source,
         |    CAST((1000000 * am) // (SELECT SUM(am) FROM dx$t) AS BIGINT) alpha,
         |    asum + (1000000 * am) // (SELECT SUM(am) FROM dx$t) asum
         |  FROM dx$t)""".stripMargin
    }.mkString(",\n")
    s"""dfeat AS MATERIALIZED (SELECT source,
       |    (1000000 * len(list_distinct(tk))) // greatest(len(tk), 1) ttr
       |  FROM (SELECT source, list_filter(regexp_split_to_array(lower(text),
       |      '\\s+'), x -> x <> '') tk FROM documents)),
       |dl AS MATERIALIZED (SELECT source, COUNT(*) n_docs,
       |    CAST(SUM(ttr) AS HUGEINT) // COUNT(*) loss_ppm
       |  FROM dfeat GROUP BY 1),
       |da0 AS MATERIALIZED (SELECT source,
       |    CAST(1000000 // (SELECT COUNT(*) FROM dl) AS BIGINT) alpha,
       |    CAST(0 AS HUGEINT) asum FROM dl),
       |$iterCtes""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- corpus curation (ops.Curate): the raw-crawl -> training-set steps ---
    // deterministic md5-keyed sampling (reproducible across runs/engines,
    // unlike rand()/TABLESAMPLE) — the only sane way to sample 100 TB
    "q46_hash_sample" -> ((s, d) =>
      Curate.hashSample(Tables.documents(s, d), "doc_id", 0.25, "s1")
        .select(col("doc_id"), col("lang"), col("n_chars"))),
    // per-stratum sampling rates (mixture weighting): keep all German,
    // half of French, a fifth of English, drop the rest — one predicate
    "q56_stratified_sample" -> ((s, d) =>
      Curate.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
        Map("en" -> 0.2, "de" -> 1.0, "fr" -> 0.5), salt = "st")
        .select(col("doc_id"), col("lang"))),
    // mixture balancing: per-source sampling rates derived in-plan from
    // corpus counts (uniform target), applied via the deterministic md5
    // sampler — statistics, rates, and sample in ONE plan. The synthetic
    // sources are uniform (rates would all be 1), so the query remaps
    // docs to a 70/20/10 skew first — the sampler must actually fire on
    // the over-represented stratum to match the oracle
    "q82_mixture_balance" -> ((s, d) =>
      Curate.mixtureBalance(Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 10 < 7, "big")
          .when(col("doc_id") % 10 < 9, "mid")
          .otherwise("small").as("source")))),
    // weighted deterministic (Poisson) sampling: pᵢ = min(1, wᵢ·target/Σw)
    // via the md5 coin — "sample ~150 docs weighted by length"; Σw spans
    // positive weights only (the sampled population). At sf0.01 every
    // rate is < 1, so the coin decides every row
    "q88_weighted_sample" -> ((s, d) =>
      Curate.weightedSample(Tables.documents(s, d), "doc_id", "n_chars",
        targetRows = 150.0).select(col("doc_id"), col("n_chars"))),
    // deterministic 80/10/10 split: disjoint + exhaustive md5 bands
    "q100_split3" -> ((s, d) =>
      Curate.trainValTestSplit(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("split"))),
    // BQ + rescore (Similarity.bqKnn): 1-bit sign quantization, XOR/POPCNT
    // Hamming shortlist, exact cosine rescoring. Planted-probe
    // DSIR importance resampling (ops/Importance, Xie et al. NeurIPS '23):
    // hashed word-bigram likelihood-ratio weights, integer-exact (add-one
    // smoothed ratio buckets, not float logs — see Importance header);
    // target = the English slice, raw = the whole corpus; top-100 docs by
    // mean bigram weight. The ≤4096-row weight table broadcasts; top-k is
    // TakeOrdered
    "q123_dsir" -> ((s, d) =>
      Importance.dsirResample(Tables.documents(s, d),
        Tables.documents(s, d).where(col("lang") === "en"), k = 100)),
    // temperature-flattened mixture resampling (Curate.temperatureSample,
    // τ pinned at 1/2 so the keep-rate sqrt(n_min/n_s) is IEEE-exact in
    // both engines); the 7/2/1 source skew is q82's synthetic mixture
    "q126_temperature_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 10 < 7, lit("big"))
          .when(col("doc_id") % 10 < 9, lit("mid"))
          .otherwise(lit("small")).as("source"))
      Curate.temperatureSample(docs)
    }),
    // data-constrained epoch allocation (Curate.epochAllocate,
    // Muennighoff '23): sources remapped to the q82 70/20/10 skew, then
    // a 2.5-epoch global budget water-filled under temperature
    // upweighting (w = floor(sqrt(T))) and a 4-epoch hard cap —
    // cap/weight grows with size, so the SMALL source caps and surplus
    // flows upward; the oracle replays the per-source sums, the
    // IEEE-double ratio order, the cross-multiplied capped test, and
    // both integer allocations. Budget (2.5 epochs of the corpus)
    // derives IN-PLAN from a 1-row broadcast aggregate — registration
    // runs zero driver-side jobs (the q158-totals pattern)
    "q160_epoch_allocate" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
        when(col("doc_id") % 10 < 7, "big")
          .when(col("doc_id") % 10 < 9, "mid")
          .otherwise("small").as("source"))
      Curate.epochAllocateScaled(docs, num = 5L, den = 2L, maxEpochs = 4L)
    }),
    // exact integer waterfilling token-budget allocation (Importance
    // .waterfillAllocation): the "data recipe" solver — equal shares
    // capped at availability, freed share redistributed via the exact
    // waterfill level, mod-remainder tokens to the first unsaturated
    // sources so Σ alloc == budget EXACTLY; saturation = a window-min
    // prefix AND over the ascending-avail order, every division on
    // non-negative operands
    "q210_waterfill" -> ((s, d) =>
      Importance.waterfillAllocation(Tables.documents(s, d))),
    // DoReMi-style domain reweighting (Importance.doremiWeights, Xie
    // et al. '23): per-source excess-loss multiplicative weights —
    // the (1+eta*excess) MW variant (Arora-Hazan-Kale) in place of
    // exp (no exact integer replay), loss = the source's mean
    // type-token ratio as the data-derived hardness proxy; 8 rounds
    // over the source-alphabet-bounded frame (one corpus scan total),
    // final AND round-averaged weights (the paper's deliverable);
    // oracle unrolls the same 8 rounds as MATERIALIZED CTEs
    "q200_doremi_mix" -> ((s, d) =>
      Importance.doremiWeights(Tables.documents(s, d))),
    "q191_anneal_mix" -> ((s, d) =>
      Curate.annealMix(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            (col("lang") === "en").as("high_q")),
        idCol = "doc_id", sourceCol = "source", costCol = "n_chars",
        eligibleCol = "high_q", annealBudget = 20000L,
        maxSourcePermille = 100, salt = "anl")),
    // per-group token-budget sampling (Curate.budgetPerGroup): ≤30k chars
    // per source in md5 order; the two-level prefix-sum must be
    // row-identical to the oracle's plain per-source window cumsum
    "q119_token_budget" -> ((s, d) =>
      Curate.budgetPerGroup(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        groupCol = "source", idCol = "doc_id", costCol = "n_chars",
        budget = 30000L, salt = "s7b")),
    // deterministic epoch shuffle + dense global index (distributed
    // zipWithIndex): the oracle recomputes the SAME permutation as a
    // global row_number over the md5 keys — proving the range-partition +
    // offset-sum numbering is exactly the serialized ordering, without
    // the engine ever forming a single-partition sort
    "q94_epoch_shuffle" -> ((s, d) =>
      Curate.epochShuffle(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", epoch = 3)
        .select(col("doc_id"), col("lang"), col("pos")))
  )

  val oracleSql: Map[String, String] = Map(
    "q46_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) < '40000000'""".stripMargin,
    "q123_dsir" ->
      """WITH tok AS (SELECT doc_id, lang,
        |    list_transform(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
        |      t -> (CAST(LEN(t) AS BIGINT) * 131 + ascii(substr(t, 1, 1))) % 1000000007) tv
        |  FROM documents),
        |f AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(tv)),
        |    i -> ((tv[i] * 31 + tv[i+1]) % 1000000007) % 4096)) bucket
        |  FROM tok),
        |cr AS (SELECT bucket, COUNT(*) cr FROM f GROUP BY 1),
        |ct AS (SELECT bucket, COUNT(*) ct FROM f WHERE lang = 'en' GROUP BY 1),
        |w AS (SELECT cr.bucket, (10000 * (COALESCE(ct.ct, 0) + 1)) // (cr.cr + 1) w
        |  FROM cr LEFT JOIN ct USING (bucket)),
        |s AS (SELECT f.doc_id, COUNT(*) n_bigrams, CAST(SUM(w.w) AS BIGINT) score
        |  FROM f JOIN w USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_bigrams, score, score // n_bigrams avg_w
        |FROM s ORDER BY avg_w DESC, doc_id LIMIT 100""".stripMargin,
    "q160_epoch_allocate" ->
      """WITH docs2 AS (SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 10 < 7 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END source
        |  FROM documents),
        |b AS (SELECT CAST((5 * SUM(n_chars)) // 2 AS BIGINT) bud FROM docs2),
        |per AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) tokens_avail
        |        FROM docs2 WHERE n_chars > 0 GROUP BY 1),
        |w AS (SELECT source, tokens_avail,
        |    CAST(FLOOR(SQRT(CAST(tokens_avail AS DOUBLE))) AS BIGINT) weight,
        |    CAST(tokens_avail * 4 AS BIGINT) cap
        |  FROM per),
        |o AS (SELECT *, CAST(cap AS DOUBLE) / weight ratio FROM w),
        |p AS (SELECT *,
        |    CAST(SUM(cap) OVER (ORDER BY ratio, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      c_le,
        |    CAST(COALESCE(SUM(weight) OVER (ORDER BY ratio, source
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) w_gt
        |  FROM o),
        |t AS (SELECT p.*, bud,
        |        c_le * weight + cap * w_gt <= bud * weight capped
        |      FROM p CROSS JOIN b),
        |tot AS (SELECT
        |    CAST(COALESCE(SUM(CASE WHEN capped THEN cap END), 0) AS BIGINT)
        |      cstar,
        |    CAST(COALESCE(SUM(CASE WHEN NOT capped THEN weight END), 0)
        |      AS BIGINT) wstar
        |  FROM t)
        |SELECT source, tokens_avail, weight, capped,
        |  CAST(CASE WHEN capped THEN cap
        |       ELSE ((bud - cstar) * weight) // GREATEST(wstar, 1) END
        |    AS BIGINT) alloc_tokens,
        |  CAST((CASE WHEN capped THEN cap
        |        ELSE ((bud - cstar) * weight) // GREATEST(wstar, 1) END)
        |       * 1000 // tokens_avail AS BIGINT) epochs_milli
        |FROM t CROSS JOIN tot""".stripMargin,
    "q191_anneal_mix" ->
      """WITH el AS (SELECT doc_id, source, n_chars FROM documents
        |            WHERE lang = 'en' AND n_chars > 0),
        |s1 AS (SELECT doc_id, source, n_chars FROM (
        |    SELECT doc_id, source, n_chars,
        |      SUM(n_chars) OVER (PARTITION BY source
        |        ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'anl'), 1, 8),
        |          doc_id ROWS UNBOUNDED PRECEDING) c1
        |    FROM el) WHERE c1 <= 2000),
        |adm AS (SELECT doc_id, cum FROM (
        |    SELECT doc_id, CAST(SUM(n_chars) OVER (
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'anl'), 1, 8),
        |        doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
        |    FROM s1) WHERE cum <= 20000)
        |SELECT d.doc_id, d.source, d.n_chars, adm.cum,
        |  CASE WHEN adm.cum IS NOT NULL THEN 'anneal' ELSE 'stable' END phase
        |FROM documents d LEFT JOIN adm USING (doc_id)""".stripMargin,
    "q126_temperature_sample" ->
      """WITH documents2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 7 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid'
        |         ELSE 'small' END source
        |  FROM documents),
        |c AS (SELECT source, COUNT(*) cnt FROM documents2 GROUP BY source),
        |r AS (SELECT source, cnt, MIN(cnt) OVER () mn FROM c),
        |t AS (SELECT source,
        |    lower(lpad(to_hex(least(CAST(FLOOR(
        |      sqrt(CAST(mn AS DOUBLE) / cnt) * 4294967296.0)
        |      AS BIGINT), 4294967295)), 8, '0')) thr
        |  FROM r)
        |SELECT d.doc_id, d.source
        |FROM documents2 d JOIN t USING (source)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'graft'), 1, 8) < t.thr""".stripMargin,
    "q119_token_budget" ->
      """SELECT doc_id, source, n_chars, cum FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 's7b'), 1, 8), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
        |  FROM documents WHERE n_chars > 0)
        |WHERE cum <= 30000""".stripMargin,
    "q56_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'st'), 1, 8) <
        |  CASE lang WHEN 'en' THEN '33333333' WHEN 'de' THEN 'ffffffff'
        |            WHEN 'fr' THEN '80000000' ELSE '00000000' END""".stripMargin,
    "q82_mixture_balance" ->
      """WITH documents2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 7 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid'
        |         ELSE 'small' END source
        |  FROM documents),
        |c AS (SELECT source, COUNT(*) cnt FROM documents2 GROUP BY source),
        |r AS (SELECT source, cnt, SUM(cnt) OVER () total, COUNT(*) OVER () nsrc FROM c),
        |t AS (SELECT source,
        |    lower(lpad(to_hex(least(CAST(FLOOR(
        |      least(1.0, (CAST(total AS DOUBLE) / nsrc) / cnt) * 4294967296.0)
        |      AS BIGINT), 4294967295)), 8, '0')) thr
        |  FROM r)
        |SELECT d.doc_id, d.source
        |FROM documents2 d JOIN t USING (source)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'graft'), 1, 8) < t.thr""".stripMargin,
    "q88_weighted_sample" ->
      """WITH sw AS (SELECT CAST(SUM(CASE WHEN n_chars > 0 THEN n_chars END)
        |    AS DOUBLE) sw FROM documents),
        |t AS (SELECT doc_id, n_chars,
        |    lower(lpad(to_hex(least(CAST(FLOOR(
        |      least(CAST(1 AS DOUBLE), CAST(n_chars AS DOUBLE) * 150.0 / sw)
        |      * 4294967296.0) AS BIGINT), 4294967295)), 8, '0')) thr
        |  FROM documents CROSS JOIN sw)
        |SELECT doc_id, n_chars FROM t
        |WHERE n_chars > 0
        |  AND substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < thr""".stripMargin,
    "q94_epoch_shuffle" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || '_e3')) - 1 AS BIGINT) pos
        |FROM documents""".stripMargin,
    "q100_split3" ->
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8)
         |         < '${graft.ops.Curate.hashSampleThreshold(0.8)}' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8)
         |         < '${graft.ops.Curate.hashSampleThreshold(0.8 + 0.1)}' THEN 'val'
         |       ELSE 'test' END split
         |FROM documents""".stripMargin,
    // waterfill replay: per-source token counts, ascending-order
    // prefix sums, window-min saturation, level + remainder bumps
    "q210_waterfill" ->
      ("""WITH av AS (SELECT source,
        |    CAST(SUM(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> ''))) AS BIGINT) avail
        |  FROM documents GROUP BY source HAVING avail > 0),
        |""".stripMargin + waterfillCtes(500000L) + """
        |SELECT source, avail avail_tokens, alloc_tokens, saturated,
        |  CAST((alloc_tokens * 1000000) // avail AS BIGINT) epochs_ppm
        |FROM alloc""".stripMargin),
    // DoReMi MW replay: loss frame + 8 unrolled MATERIALIZED rounds
    "q200_doremi_mix" ->
      ("WITH " + doremiCtes + """
        |SELECT l.source, CAST(l.n_docs AS BIGINT) n_docs,
        |  CAST(l.loss_ppm AS BIGINT) loss_ppm, a.alpha alpha_ppm,
        |  CAST(a.asum // 8 AS BIGINT) alpha_avg_ppm
        |FROM dl l JOIN da8 a USING (source)""".stripMargin)
  )
}
