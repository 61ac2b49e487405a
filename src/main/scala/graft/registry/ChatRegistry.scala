package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.{bm25Cte, btCtes, btGames, btScheduleCte,
  chatConv, chatCte, prefPairCtes, prefPairsFrame, subwordMerges}
import graft.model.Tables
import graft.ops
import graft.ops.{Bpe, Chat, Curate, Dedup, Kmv, Retrieval}

/** Chat/preference domain registry (round-15 split tranche 8): the
  * SFT/RLHF intake family — transcript render/mask/validate
  * (q167-q169, q186), span packing in char/token/subword space
  * (q170/q173/q184), FIM rewrite (q178), hard negatives (q179),
  * preference-pair validation (q180) with its length-bias audit
  * (q227), best-of-n (q185), chat dedup (q193), the Bradley-Terry
  * pair (q187/q197), Wilson win rates (q201) and distinct-n
  * diversity (q229) — each query above its DuckDB oracle. Fixtures
  * (chatTurns, prefPairsFrame, btGames, subwordMerges and the chat
  * oracle CTEs) stay in SparkEntry private[graft]: the tokenizer
  * oracles (q219 class) compose them too. Bodies and SQL moved
  * verbatim; the oracle gate re-ran on the split — byte-identical. */
private[graft] object ChatRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SFT chat-template rendering (Chat.flatten): in-plan synthesized
    // multi-turn transcripts (optional system opener, alternating
    // user/assistant, planted malformed classes) rendered to the fixed
    // ChatML-shaped template with assistant-char totals — the
    // loss-budget numerator; the oracle replays the synthesis, the
    // template concat (ORDER BY turn), and every length
    "q167_chat_render" -> ((s, d) =>
      Chat.flatten(chatConv(Tables.documents(s, d)))),
    // loss-mask spans (Chat.maskSpans): per-turn character ranges of
    // the content inside the rendered template — integer length
    // cumsums, so the oracle replays every offset exactly; the
    // assistant rows are the mask a tokenizer-side masking consumes
    "q168_chat_mask" -> ((s, d) =>
      Chat.maskSpans(chatConv(Tables.documents(s, d)))),
    // transcript validation (Chat.validate): the SFT quarantine report
    // — opener/alternation/non-empty/ends-with-assistant contracts as
    // per-doc booleans; the planted %7 (role collapse) and %11 (empty
    // turn) classes make every flag fire both ways
    "q169_chat_validate" -> ((s, d) =>
      Chat.validate(chatConv(Tables.documents(s, d)))),
    // packed loss-mask spans (Chat.packSpans): the q167/q168 transcripts
    // packed into 200-char training sequences with every assistant/user
    // span remapped to (seq_idx, in-sequence range) fragments — spans
    // SPLIT at block boundaries (the case hand-rolled packers corrupt);
    // two-pass global offsets (the q109 discipline); the oracle replays
    // the per-doc length cumsum, the block explode, and every fragment
    // boundary
    "q170_chat_pack" -> ((s, d) =>
      Chat.packSpans(chatConv(Tables.documents(s, d)), seqLen = 200L)),
    // TOKEN-space packed loss-mask spans (Chat.packSpansTokens): q170's
    // pipeline with every length measured in q34 BPE pre-tokens — the
    // unit real context budgets are denominated in; template junctions
    // are all '\n' (never inside a token), so segment token counts add
    // exactly and the oracle replays header/content/piece token counts
    // with the q34 regex plus the same cumsum/block arithmetic; 16-token
    // blocks sit inside the ~14-token pieces so boundary splits fire
    "q173_chat_pack_tokens" -> ((s, d) =>
      Chat.packSpansTokens(chatConv(Tables.documents(s, d)), seqLen = 16L)),
    // fill-in-middle transformation (Curate.fimTransform, Bavarian '22):
    // PSM-order infilling rewrite with md5-derived deterministic cut
    // points (the q154 48-bit hash discipline); both engines' substring
    // is 1-based so the oracle replays every slice char-for-char;
    // under-length docs pass through with fim_ok false
    "q178_fim" -> ((s, d) =>
      Curate.fimTransform(Tables.documents(s, d))),
    // hard-negative mining (Retrieval.hardNegatives, DPR/ICT): the
    // q143 query set in the self-supervised form — the positive IS the
    // query's source doc, so the mined negatives are the lexically
    // closest OTHER documents, with the false-negative audit flag
    // (negative outscoring the gold); the oracle replays the bm25
    // chain at k+1, the positive drop, the re-rank, and the flag
    "q179_hard_negatives" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      Retrieval.hardNegatives(docs, qs,
        qs.select(col("query_id"), col("query_id").as("pos_id")), k = 5)
    }),
    // preference-pair (DPO/RLHF) validation (Chat.preferencePairs):
    // the third training-data leg — (chosen, rejected) pairs
    // synthesized in-plan from the chat transcripts: rejected = chosen
    // with the final response TRUNCATED to half (the valid class),
    // %29 mutates a PREFIX turn (prefix violation), %23 leaves the
    // pair identical (tie violation); the %7/%19 transcript classes
    // flow through as ends/NULL-role failures. The oracle replays the
    // synthesis relationally (no list construction) and every flag
    "q180_preference_pairs" -> ((s, d) => prefPairsFrame(s, d)),
    // SUBWORD-space packed loss-mask spans (Chat.packSpansSubword):
    // q173's pipeline measured in REAL BPE tokens under a fixed
    // 16-merge table (a pure literal both engines share — training is
    // engine-specific, so the trained-merges composition is gated by
    // ChatSpec's round-trip instead). The oracle REPLAYS THE TOKENIZER:
    // a recursive CTE runs the lowest-rank-first merge loop per
    // distinct pre-token (replace-all of the min-rank pair is
    // equivalent because a merge's output only feeds LATER-rank
    // merges), then q173's cumsum/block/fragment arithmetic in subword
    // units; 32-token blocks sit inside typical ~25-token pieces so
    // boundary splits fire
    "q184_chat_pack_subword" -> ((s, d) =>
      Chat.packSpansSubword(chatConv(Tables.documents(s, d)),
        seqLen = 32L, subwordMerges)),
    // rejection-sampling / best-of-n prep (Chat.bestOfN, the WebGPT/
    // Llama-2 recipe): per prompt (4 candidates each), keep the
    // argmax-reward candidate with deterministic ties — rewards are
    // hash-derived ppm; prompt %11 forces a four-way tie (lowest
    // cand_id must win), doc %23 NULLs single scores (audited, can't
    // win), prompt %13 unscores the whole prompt (row kept, pick_ok
    // false); the oracle replays the hash and the row_number argmax
    "q185_best_of_n" -> ((s, d) => {
      val prompt = expr("doc_id div 4")
      val raw = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("bon"))), lit(1000000L))
      val reward = when(pmod(prompt, lit(13)) === 0, lit(null).cast("long"))
        .when(pmod(col("doc_id"), lit(23)) === 0, lit(null).cast("long"))
        .when(pmod(prompt, lit(11)) === 0, lit(500000L))
        .otherwise(raw)
      Chat.bestOfN(Tables.documents(s, d).select(prompt.as("prompt_id"),
        col("doc_id").as("cand_id"), reward.as("reward")))
    }),
    // validate's EMPTY/NULL-transcript contract (round-11 advice,
    // driver-gated): %5==0 docs get a NULL turns array, %5==1 an empty
    // one — both must emit one all-false row (posexplode_outer), never
    // vanish from a corpus/quarantine split; the rest are clean 2-turn
    // transcripts except where a short doc empties the second content
    // slice (turns_ok fires both ways)
    "q186_chat_validate_outer" -> ((s, d) => {
      val turnsType = "array<struct<role:string,content:string>>"
      val turns = when(pmod(col("doc_id"), lit(5)) === 0,
          lit(null).cast(turnsType))
        .when(pmod(col("doc_id"), lit(5)) === 1, array().cast(turnsType))
        .otherwise(array(
          struct(lit("user").as("role"),
            substring(col("text"), 1, 20).as("content")),
          struct(lit("assistant").as("role"),
            substring(col("text"), 21, 20).as("content"))))
      Chat.validate(Tables.documents(s, d)
        .select(col("doc_id"), turns.as("turns")))
    }),
    // Bradley–Terry preference strengths (Chat.bradleyTerry, Hunter '04
    // MM algorithm): 8 pseudo-policies play hash-scheduled games —
    // a = doc_id%8 vs b = (doc_id div 8)%8 (self-games dropped), the
    // winner by the replayable rule "a wins iff hash48 mod (a+b+2)
    // <= b" (P = (b+1)/(a+b+2), so LOWER indices are genuinely
    // stronger and the fitted ordering is a real signal); 8 MM rounds
    // in decimal-routed ppm fixed point with the MAP ghost-game prior;
    // the oracle replays the hash, the schedule, and all 8 updates as
    // chained CTEs (the unrolled-iteration discipline)
    "q187_bradley_terry" -> ((s, d) =>
      Chat.bradleyTerry(btGames(s, d), iters = 8)),
    // SFT transcript exact dedup (Dedup.exact over Chat.flatten's
    // rendered template): the dedup leg applied to STRUCTURED chat
    // data — hashing the rendered form means role markup is part of
    // the identity (a user/assistant swap of identical strings does
    // NOT collide), and the (md5, length) key keeps transcripts off
    // the shuffle; survivor = smallest doc_id, the q20 rule
    "q193_chat_dedup" -> ((s, d) =>
      Dedup.exact(Chat.flatten(chatConv(Tables.documents(s, d)))
        .select(col("doc_id"), col("rendered").as("text")))),
    // BT goodness-of-fit (Chat.btFitReport): per pair, empirical win
    // rate vs the fitted s_a/(s_a+s_b) probability and the residual —
    // the coherence triage read next to q187's strengths; same game
    // schedule, oracle extends the unrolled-MM chain with the pair
    // rollup and the fit arithmetic
    "q197_bt_fit" -> ((s, d) => {
      val g = btGames(s, d)
      Chat.btFitReport(g, Chat.bradleyTerry(g, iters = 8))
    }),
    // pairwise win-rate matrix with Wilson score intervals
    // (Chat.winRateWilson, Wilson 1927 / Brown-Cai-DasGupta 2001): the
    // model-free leaderboard read next to q187's BT fit — z pinned to 2
    // so z^2=4 keeps every term rational, the one sqrt runs on an
    // integer radicand < 2^52 where floor(sqrt(double)) IS the exact
    // integer square root on both engines; one-sided significance
    // verdicts from the bounds vs 1/2
    "q201_winrate_wilson" -> ((s, d) =>
      Chat.winRateWilson(btGames(s, d))),
    // length-bias (verbosity) audit of the preference corpus
    // (Chat.lengthBias, Singhal et al. '23): the q180 validated pairs
    // banded by the bit width of the length delta — per band and
    // globally, how often the CHOSEN side is the longer one; non-ok
    // pairs surface as the NULL-band row
    "q227_length_bias" -> ((s, d) =>
      Chat.lengthBias(prefPairsFrame(s, d))),
    // distinct-n generation diversity (Chat.distinctNgrams, Li et al.
    // '16): 4 candidates per prompt (the q185 grouping), %7 doubles
    // its text (repetition halves distinct mass), %101 NULLs it (the
    // candidate still counts); unigrams pool across candidates,
    // bigrams stay within one
    "q229_distinct_ngrams" -> ((s, d) =>
      Chat.distinctNgrams(Tables.documents(s, d).select(
        expr("doc_id div 4").as("prompt_id"),
        col("doc_id").as("cand_id"),
        when(pmod(col("doc_id"), lit(101)) === 0,
          lit(null).cast("string"))
          .when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text")))),
    // reward-margin gate (Chat.marginGate, the Llama-2 margin /
    // Zephyr drop-low-margin discipline): hash-derived ppm rewards
    // with planted classes — %17 inverts the pair (reward model
    // disagrees with the label), %13 unscores one side (NULL margin,
    // never kept, always surfaces), %11 forces an exact tie (margin
    // 0 < 1000, dropped but not inverted)
    "q194_margin_gate" -> ((s, d) => {
      val hc = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("mgc"))), lit(1000000L))
      val hr = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("mgr"))), lit(1000000L))
      val cRaw = when(pmod(col("doc_id"), lit(13)) === 0,
        lit(null).cast("long")).otherwise(hc)
      val c = when(pmod(col("doc_id"), lit(11)) === 0, hr).otherwise(cRaw)
      val r = when(pmod(col("doc_id"), lit(17)) === 0, hc + lit(500000L))
        .otherwise(hr)
      Chat.marginGate(Tables.documents(s, d)
        .select(col("doc_id").as("pair_id"), c.as("chosen_reward"),
          r.as("rejected_reward")), minMargin = 1000L)
    }))

  val oracleSql: Map[String, String] = Map(
    "q167_chat_render" ->
      ("WITH " + chatCte + """
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_turns,
        |  CAST(COALESCE(COUNT(*) FILTER (WHERE role = 'assistant'), 0)
        |    AS BIGINT) n_assistant,
        |  CAST(length(string_agg(piece, '' ORDER BY turn_idx)) AS BIGINT)
        |    rendered_len,
        |  CAST(COALESCE(SUM(length(content))
        |    FILTER (WHERE role = 'assistant'), 0) AS BIGINT)
        |    assistant_chars,
        |  string_agg(piece, '' ORDER BY turn_idx) rendered
        |FROM cp GROUP BY doc_id""".stripMargin),
    "q168_chat_mask" ->
      ("WITH " + chatCte + """
        |SELECT doc_id, turn_idx, role,
        |  CAST(ps + length(role) + 5 AS BIGINT) content_start,
        |  CAST(ps + length(role) + 5 + length(content) AS BIGINT)
        |    content_end
        |FROM (SELECT doc_id, turn_idx, role, content,
        |      COALESCE(SUM(length(piece)) OVER (PARTITION BY doc_id
        |        ORDER BY turn_idx
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) ps
        |      FROM cp)""".stripMargin),
    // NULL-role pinning (round-10 advice): every flag's operand is
    // COALESCE'd to FALSE so bool_and cannot silently SKIP a NULL
    // (Spark's min(when) counts it as a violation); ends_assistant
    // tests the max-turn_idx row explicitly so a NULL closing role
    // reads "not the assistant" on both engines
    "q169_chat_validate" ->
      ("WITH " + chatCte + """
        |SELECT doc_id,
        |  bool_and(turn_idx > 0
        |    OR COALESCE(role IN ('system', 'user'), FALSE)) opener_ok,
        |  bool_and(COALESCE(role IS NOT NULL AND (prev_role IS NULL
        |    OR (role <> prev_role AND role <> 'system')), FALSE))
        |    alternation_ok,
        |  bool_and(role IS NOT NULL AND content IS NOT NULL
        |    AND length(content) > 0) turns_ok,
        |  bool_or(COALESCE(turn_idx = last_idx AND role = 'assistant',
        |    FALSE)) ends_assistant,
        |  (bool_and(turn_idx > 0
        |     OR COALESCE(role IN ('system', 'user'), FALSE))
        |   AND bool_and(COALESCE(role IS NOT NULL AND (prev_role IS NULL
        |     OR (role <> prev_role AND role <> 'system')), FALSE))
        |   AND bool_and(role IS NOT NULL AND content IS NOT NULL
        |     AND length(content) > 0)
        |   AND bool_or(COALESCE(turn_idx = last_idx AND role = 'assistant',
        |     FALSE))) ok
        |FROM (SELECT doc_id, turn_idx, role, content,
        |      lag(role) OVER (PARTITION BY doc_id ORDER BY turn_idx)
        |        prev_role,
        |      max(turn_idx) OVER (PARTITION BY doc_id) last_idx FROM ct)
        |GROUP BY doc_id""".stripMargin),
    "q170_chat_pack" ->
      ("WITH " + chatCte + """,
        |fl AS (SELECT doc_id, CAST(SUM(length(piece)) AS BIGINT) rlen
        |       FROM cp GROUP BY doc_id),
        |offs AS (SELECT doc_id, COALESCE(SUM(rlen) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) doff
        |  FROM fl),
        |sp AS (SELECT doc_id, turn_idx, role,
        |    ps + length(role) + 5 cs, ps + length(role) + 5
        |      + length(content) ce
        |  FROM (SELECT doc_id, turn_idx, role, content,
        |        COALESCE(SUM(length(piece)) OVER (PARTITION BY doc_id
        |          ORDER BY turn_idx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) ps
        |        FROM cp)),
        |g AS (SELECT sp.doc_id, turn_idx, role, doff + cs gs, doff + ce ge
        |      FROM sp JOIN offs USING (doc_id) WHERE ce > cs)
        |SELECT CAST(k AS BIGINT) seq_idx, doc_id, turn_idx, role,
        |  CAST(GREATEST(gs, k * 200) - k * 200 AS BIGINT) frag_start,
        |  CAST(LEAST(ge, (k + 1) * 200) - k * 200 AS BIGINT) frag_end
        |FROM (SELECT doc_id, turn_idx, role, gs, ge,
        |      unnest(range(CAST(gs // 200 AS BIGINT),
        |        CAST((ge - 1) // 200 + 1 AS BIGINT))) k FROM g)""".stripMargin),
    "q173_chat_pack_tokens" ->
      ("WITH " + chatCte + """,
        |tl AS (SELECT doc_id, turn_idx, role,
        |    LEN(regexp_extract_all(piece, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) pl,
        |    LEN(regexp_extract_all('<|' || role || '|>',
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) hl,
        |    LEN(regexp_extract_all(content, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) cl
        |  FROM cp),
        |fl AS (SELECT doc_id, CAST(SUM(pl) AS BIGINT) rlen
        |       FROM tl GROUP BY doc_id),
        |offs AS (SELECT doc_id, COALESCE(SUM(rlen) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) doff
        |  FROM fl),
        |sp AS (SELECT doc_id, turn_idx, role, ps + hl cs, ps + hl + cl ce
        |  FROM (SELECT doc_id, turn_idx, role, hl, cl,
        |        COALESCE(SUM(pl) OVER (PARTITION BY doc_id
        |          ORDER BY turn_idx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) ps
        |        FROM tl)),
        |g AS (SELECT sp.doc_id, turn_idx, role, doff + cs gs, doff + ce ge
        |      FROM sp JOIN offs USING (doc_id) WHERE ce > cs)
        |SELECT CAST(k AS BIGINT) seq_idx, doc_id, turn_idx, role,
        |  CAST(GREATEST(gs, k * 16) - k * 16 AS BIGINT) frag_start,
        |  CAST(LEAST(ge, (k + 1) * 16) - k * 16 AS BIGINT) frag_end
        |FROM (SELECT doc_id, turn_idx, role, gs, ge,
        |      unnest(range(CAST(gs // 16 AS BIGINT),
        |        CAST((ge - 1) // 16 + 1 AS BIGINT))) k FROM g)""".stripMargin),
    "q178_fim" ->
      """WITH hx AS (SELECT doc_id, text, length(text) L,
        |    md5(CAST(doc_id AS VARCHAR) || 'fima') ha,
        |    md5(CAST(doc_id AS VARCHAR) || 'fimb') hb
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(ha, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) va,
        |    CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hb, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vb
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id),
        |s AS (SELECT hx.doc_id, text, L,
        |    LEAST(1 + (va % NULLIF(L - 1, 0)), 1 + (vb % NULLIF(L - 1, 0))) lo,
        |    GREATEST(1 + (va % NULLIF(L - 1, 0)), 1 + (vb % NULLIF(L - 1, 0))) hi
        |  FROM hx JOIN g USING (doc_id))
        |SELECT doc_id, L >= 20 fim_ok,
        |  CAST(CASE WHEN L >= 20 THEN lo ELSE L END AS BIGINT) prefix_len,
        |  CAST(CASE WHEN L >= 20 THEN hi - lo ELSE 0 END AS BIGINT)
        |    middle_len,
        |  CAST(CASE WHEN L >= 20 THEN L - hi ELSE 0 END AS BIGINT)
        |    suffix_len,
        |  CASE WHEN L >= 20 THEN '<fim_prefix>' || substr(text, 1, lo)
        |    || '<fim_suffix>' || substr(text, hi + 1, L - hi)
        |    || '<fim_middle>' || substr(text, lo + 1, hi - lo)
        |  ELSE text END fim_text
        |FROM s""".stripMargin,
    "q179_hard_negatives" ->
      ("WITH " + bm25Cte + """,
        |cand AS (SELECT query_id, doc_id, score_fx FROM r WHERE rk <= 6),
        |ps AS (SELECT query_id, score_fx pos_fx FROM cand
        |       WHERE doc_id = query_id),
        |neg AS (SELECT c.query_id, c.doc_id, c.score_fx,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY c.score_fx DESC, c.doc_id ASC) rk2
        |  FROM cand c WHERE c.doc_id <> c.query_id)
        |SELECT n.query_id, CAST(rk2 AS BIGINT) rank, n.doc_id,
        |  CAST(n.score_fx AS BIGINT) score_fx,
        |  COALESCE(n.score_fx > ps.pos_fx, FALSE) above_positive
        |FROM neg n LEFT JOIN ps USING (query_id)
        |WHERE rk2 <= 5""".stripMargin),
    "q180_preference_pairs" ->
      ("WITH " + chatCte + ",\n" + prefPairCtes + """
        |SELECT pair_id, prefix_ok, ends_ok, divergent_ok,
        |  chosen_chars, rejected_chars, ok
        |FROM pp""".stripMargin),
    // the oracle replays the TOKENIZER itself: a recursive CTE runs
    // the lowest-rank-first merge loop per distinct pre-token ('§' is
    // provably absent from the corpus alphabet; replace-all of the
    // min-rank pair is equivalent to one-at-a-time merging because a
    // merge's output only feeds later-rank merges), then the q173
    // cumsum/block/fragment arithmetic in subword units
    "q184_chat_pack_subword" ->
      ("WITH RECURSIVE " + chatCte + ",\n        mg(rk, a, b) AS (VALUES " +
        subwordMerges.zipWithIndex
          .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ") +
        """),
        |wset AS (SELECT DISTINCT w FROM (
        |    SELECT unnest(regexp_extract_all(content,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) w FROM cp
        |    UNION SELECT role FROM cp
        |    UNION SELECT unnest(['<', '|', '>', 'end']))),
        |enc AS (
        |  SELECT w, '§' || regexp_replace(w, '(.)', '\1§', 'g') st FROM wset
        |  UNION ALL
        |  SELECT e.w, replace(e.st, '§' || m.a || '§' || m.b || '§',
        |      '§' || m.a || m.b || '§')
        |  FROM (SELECT w, st, (SELECT min(rk) FROM mg
        |          WHERE contains(st, '§' || a || '§' || b || '§')) mr
        |        FROM enc) e
        |  JOIN mg m ON m.rk = e.mr),
        |wc AS (SELECT w,
        |    CAST(length(st) - length(replace(st, '§', '')) - 1 AS BIGINT) nt
        |  FROM enc WHERE NOT EXISTS (SELECT 1 FROM mg
        |    WHERE contains(st, '§' || a || '§' || b || '§'))),
        |cw AS (SELECT doc_id, turn_idx,
        |    unnest(regexp_extract_all(content,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) w
        |  FROM cp),
        |cls AS (SELECT doc_id, turn_idx, SUM(nt) cl
        |  FROM cw JOIN wc USING (w) GROUP BY 1, 2),
        |tl AS (SELECT cp.doc_id, cp.turn_idx, cp.role,
        |    4 + rw.nt hl, COALESCE(cls.cl, 0) cl,
        |    8 + rw.nt + COALESCE(cls.cl, 0)
        |      + (SELECT nt FROM wc WHERE w = 'end') pl
        |  FROM cp JOIN wc rw ON rw.w = cp.role
        |    LEFT JOIN cls ON cls.doc_id = cp.doc_id
        |      AND cls.turn_idx = cp.turn_idx),
        |fl AS (SELECT doc_id, CAST(SUM(pl) AS BIGINT) rlen
        |       FROM tl GROUP BY doc_id),
        |offs AS (SELECT doc_id, COALESCE(SUM(rlen) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) doff
        |  FROM fl),
        |sp AS (SELECT doc_id, turn_idx, role, ps + hl cs, ps + hl + cl ce
        |  FROM (SELECT doc_id, turn_idx, role, hl, cl,
        |        COALESCE(SUM(pl) OVER (PARTITION BY doc_id
        |          ORDER BY turn_idx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) ps
        |        FROM tl)),
        |g AS (SELECT sp.doc_id, turn_idx, role, doff + cs gs, doff + ce ge
        |      FROM sp JOIN offs USING (doc_id) WHERE ce > cs)
        |SELECT CAST(k AS BIGINT) seq_idx, doc_id, turn_idx, role,
        |  CAST(GREATEST(gs, k * 32) - k * 32 AS BIGINT) frag_start,
        |  CAST(LEAST(ge, (k + 1) * 32) - k * 32 AS BIGINT) frag_end
        |FROM (SELECT doc_id, turn_idx, role, gs, ge,
        |      unnest(range(CAST(gs // 32 AS BIGINT),
        |        CAST((ge - 1) // 32 + 1 AS BIGINT))) k FROM g)""".stripMargin),
    "q185_best_of_n" ->
      """WITH hx AS (SELECT doc_id, doc_id // 4 prompt_id,
        |    md5(CAST(doc_id AS VARCHAR) || 'bon') h FROM documents),
        |g AS (SELECT doc_id, prompt_id, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id, prompt_id),
        |c AS (SELECT prompt_id, doc_id cand_id,
        |    CASE WHEN prompt_id % 13 = 0 THEN NULL
        |         WHEN doc_id % 23 = 0 THEN NULL
        |         WHEN prompt_id % 11 = 0 THEN 500000
        |         ELSE v % 1000000 END reward
        |  FROM g),
        |a AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) n_candidates,
        |    CAST(COUNT(reward) AS BIGINT) n_scored FROM c GROUP BY 1),
        |w AS (SELECT prompt_id, cand_id, CAST(reward AS BIGINT) reward,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY reward DESC, cand_id ASC) rk
        |  FROM c WHERE reward IS NOT NULL)
        |SELECT a.prompt_id, w.cand_id, w.reward,
        |  a.n_candidates, a.n_scored, a.n_scored > 0 pick_ok
        |FROM a LEFT JOIN w ON w.prompt_id = a.prompt_id AND rk = 1""".stripMargin,
    // the outer contract: empty/NULL transcripts appear as all-false
    // rows (a plain unnest would drop them — the UNION ALL leg is the
    // outer join's relational replay)
    "q186_chat_validate_outer" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 20) c0,
        |    substr(text, 21, 20) c1 FROM documents),
        |v AS (SELECT doc_id,
        |    (length(c0) > 0 AND length(c1) > 0) tok
        |  FROM t WHERE doc_id % 5 NOT IN (0, 1))
        |SELECT doc_id, TRUE opener_ok, TRUE alternation_ok,
        |  tok turns_ok, TRUE ends_assistant, tok ok FROM v
        |UNION ALL
        |SELECT doc_id, FALSE, FALSE, FALSE, FALSE, FALSE
        |FROM documents WHERE doc_id % 5 IN (0, 1)""".stripMargin,
    // Hunter '04 MM replay: the hash schedule, then 8 unrolled update
    // CTEs — every division has positive operands, so DuckDB's
    // flooring // equals Spark's truncating div step for step
    "q187_bradley_terry" ->
      ("WITH " + btCtes + """
        |SELECT it.item, it.wins, it.games, s8.s strength_ppm
        |FROM it JOIN s8 USING (item)""".stripMargin),
    "q193_chat_dedup" ->
      ("WITH " + chatCte + """,
        |r AS (SELECT doc_id, string_agg(piece, '' ORDER BY turn_idx)
        |    rendered FROM cp GROUP BY doc_id)
        |SELECT MIN(doc_id) doc_id, CAST(COUNT(*) AS BIGINT) dup_cnt
        |FROM r GROUP BY rendered""".stripMargin),
    "q197_bt_fit" ->
      ("WITH " + btCtes + """,
        |pw AS (SELECT LEAST(winner, loser) a, GREATEST(winner, loser) b,
        |    CAST(COUNT(*) AS BIGINT) n_games,
        |    CAST(COUNT(*) FILTER (WHERE winner < loser) AS BIGINT) wins_a
        |  FROM gm GROUP BY 1, 2)
        |SELECT pw.a, pw.b, pw.n_games, pw.wins_a,
        |  (1000000 * wins_a) // n_games emp_a_ppm,
        |  (1000000 * sa.s) // (sa.s + sb.s) fit_a_ppm,
        |  (1000000 * wins_a) // n_games
        |    - (1000000 * sa.s) // (sa.s + sb.s) residual_ppm
        |FROM pw JOIN s8 sa ON sa.item = pw.a
        |  JOIN s8 sb ON sb.item = pw.b""".stripMargin),
    // Wilson intervals over the shared game schedule: z=2 rational
    // form; lateral aliases let the flags reference the bounds
    "q201_winrate_wilson" ->
      ("WITH " + btScheduleCte + """,
        |pw AS (SELECT LEAST(winner, loser) a, GREATEST(winner, loser) b,
        |    CAST(COUNT(*) AS BIGINT) n_games,
        |    CAST(COUNT(*) FILTER (WHERE winner < loser) AS BIGINT) wins_a
        |  FROM gm GROUP BY 1, 2),
        |wx AS (SELECT a, b, n_games, wins_a,
        |    (1000000 * wins_a) // n_games phat_ppm FROM pw),
        |wt AS (SELECT *, CAST(floor(sqrt(CAST(
        |    (phat_ppm * (1000000 - phat_ppm)) // n_games
        |      + 1000000000000 // (CAST(n_games AS HUGEINT) * n_games)
        |    AS DOUBLE))) AS BIGINT) root FROM wx)
        |SELECT a, b, n_games, wins_a, CAST(phat_ppm AS BIGINT) phat_ppm,
        |  CAST(greatest(CAST(n_games AS HUGEINT) * phat_ppm + 2000000
        |      - 2 * CAST(n_games AS HUGEINT) * root, 0)
        |    // (n_games + 4) AS BIGINT) lb_ppm,
        |  least(CAST((CAST(n_games AS HUGEINT) * phat_ppm + 2000000
        |      + 2 * CAST(n_games AS HUGEINT) * root)
        |    // (n_games + 4) AS BIGINT), 1000000) ub_ppm,
        |  lb_ppm > 500000 a_better, ub_ppm < 500000 b_better
        |FROM wt""".stripMargin),
    // length-bias replay: the q180 pair chain banded by the bit width
    // of the length delta (length(bin(x)) = floor(log2 x)+1 — the
    // ilog2 device); non-ok pairs -> the NULL band with zero win
    // counts, so the window totals see only valid non-tie pairs; all
    // division operands non-negative so // == div
    "q227_length_bias" ->
      ("WITH " + chatCte + ",\n" + prefPairCtes + """,
        |b AS (SELECT CASE WHEN NOT ok THEN NULL
        |      WHEN chosen_chars = rejected_chars THEN 0
        |      ELSE length(bin(abs(chosen_chars - rejected_chars))) END band,
        |    CASE WHEN ok AND chosen_chars > rejected_chars
        |      THEN 1 ELSE 0 END cl,
        |    CASE WHEN ok AND chosen_chars < rejected_chars
        |      THEN 1 ELSE 0 END rl
        |  FROM pp),
        |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) n_pairs,
        |    CAST(SUM(cl) AS BIGINT) n_chosen_longer,
        |    CAST(SUM(rl) AS BIGINT) n_rejected_longer
        |  FROM b GROUP BY 1)
        |SELECT CAST(band AS BIGINT) band, n_pairs,
        |  n_chosen_longer, n_rejected_longer,
        |  CAST(CASE WHEN n_chosen_longer + n_rejected_longer > 0
        |    THEN (1000000 * n_chosen_longer)
        |      // (n_chosen_longer + n_rejected_longer) END AS BIGINT)
        |    band_win_ppm,
        |  CAST(CASE WHEN SUM(n_chosen_longer + n_rejected_longer) OVER () > 0
        |    THEN (1000000 * SUM(n_chosen_longer) OVER ())
        |      // SUM(n_chosen_longer + n_rejected_longer) OVER ()
        |    END AS BIGINT) longer_win_ppm
        |FROM g""".stripMargin),
    // distinct-n replay: the same planted classes, unigrams from the
    // unnest, bigrams from a candidate-partitioned lead, then the
    // (prompt, n, gram) dedup rollup and the per-prompt fold; all
    // division operands non-negative so // == div
    "q229_distinct_ngrams" ->
      """WITH px AS (SELECT doc_id // 4 pid, doc_id cid,
        |    CASE WHEN doc_id % 101 = 0 THEN NULL
        |         WHEN doc_id % 7 = 0 THEN text || ' ' || text
        |         ELSE text END AS "text"
        |  FROM documents),
        |base AS (SELECT pid, CAST(COUNT(*) AS BIGINT) n_cands
        |  FROM px GROUP BY 1),
        |tk AS (SELECT pid, cid,
        |    list_filter(regexp_split_to_array("text", '\s+'), x -> x <> '') l
        |  FROM px WHERE "text" IS NOT NULL),
        |tok AS (SELECT pid, cid, generate_subscripts(l, 1) pos, unnest(l) g
        |  FROM tk),
        |ld AS (SELECT pid, g,
        |    lead(g, 1) OVER (PARTITION BY pid, cid ORDER BY pos) nx
        |  FROM tok),
        |gr AS (SELECT pid, g, 1 n FROM tok
        |  UNION ALL
        |  SELECT pid, g || ' ' || nx, 2 FROM ld WHERE nx IS NOT NULL),
        |pg AS (SELECT pid, n, g, COUNT(*) c FROM gr GROUP BY 1, 2, 3),
        |wd AS (SELECT pid,
        |    CAST(COALESCE(SUM(CASE WHEN n = 1 THEN c END), 0) AS BIGINT) t1,
        |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) d1,
        |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN c END), 0) AS BIGINT) t2,
        |    CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) d2
        |  FROM pg GROUP BY 1)
        |SELECT base.pid prompt_id, n_cands,
        |  COALESCE(t1, 0) total_1, COALESCE(d1, 0) distinct_1,
        |  COALESCE(t2, 0) total_2, COALESCE(d2, 0) distinct_2,
        |  CAST(CASE WHEN COALESCE(t1, 0) > 0
        |    THEN (1000000 * d1) // t1 END AS BIGINT) d1_ppm,
        |  CAST(CASE WHEN COALESCE(t2, 0) > 0
        |    THEN (1000000 * d2) // t2 END AS BIGINT) d2_ppm
        |FROM base LEFT JOIN wd USING (pid)""".stripMargin,
    "q194_margin_gate" ->
      """WITH hx AS (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || 'mgc') h1,
        |    md5(CAST(doc_id AS VARCHAR) || 'mgr') h2 FROM documents),
        |g AS (SELECT doc_id,
        |    CAST(SUM((strpos('0123456789abcdef', substr(h1, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v1,
        |    CAST(SUM((strpos('0123456789abcdef', substr(h2, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v2
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id),
        |p AS (SELECT doc_id pair_id,
        |    CASE WHEN doc_id % 11 = 0 THEN v2 % 1000000
        |         WHEN doc_id % 13 = 0 THEN NULL
        |         ELSE v1 % 1000000 END c,
        |    CASE WHEN doc_id % 17 = 0 THEN v1 % 1000000 + 500000
        |         ELSE v2 % 1000000 END r
        |  FROM g)
        |SELECT pair_id, c chosen_reward, r rejected_reward,
        |  c - r margin,
        |  (c IS NOT NULL AND r IS NOT NULL) scored,
        |  (c IS NOT NULL AND r IS NOT NULL AND c < r) inverted,
        |  (c IS NOT NULL AND r IS NOT NULL AND c >= r
        |   AND c - r >= 1000) keep
        |FROM p""".stripMargin)
}
