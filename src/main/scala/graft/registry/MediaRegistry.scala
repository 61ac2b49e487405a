package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops
import graft.ops.{Codecs, Curate, Dedup, Multimodal, TextAnalysis}
import graft.expr.Exprs

/** Media/multimodal domain registry (round-15 split tranche 9):
  * typed metadata + frame sampling + byte-histogram features over the
  * binary-asset plumbing (q31-q33), the REAL dependency-free codecs
  * (q96 PPM/WAV, q112 PNG), perceptual-hash pair generation for
  * image/audio/video (q133/q136/q141), the cross-modal and per-modal
  * dedup resolves (q135/q140/q144), the encoding census (q139) and
  * container metadata (q165) — each query above its DuckDB oracle.
  * Shared oracle CTE text and media fixtures stay in SparkEntry
  * private[graft] where other families still compose them. Bodies and
  * SQL moved verbatim; the oracle gate re-ran on the split —
  * byte-identical results. */
private[graft] object MediaRegistry {

  /** The q133 dHash pipeline as a DuckDB CTE chain (pixel formula ->
    * integer luma -> 9x8 block-mean grid -> gradient-sign bits -> 16-bit
    * bands -> capped buckets -> Hamming distances in `hm`); shared by
    * q133 (the pair report) and q135 (cluster resolution over the same
    * pair graph). No WITH prefix -- callers choose WITH / WITH RECURSIVE. */
  private val dhashPairsCte: String =
    """ids AS (SELECT doc_id id FROM documents),
        |cls AS (SELECT id,
        |    CASE WHEN id % 10 = 3 AND id >= 13 THEN id - 3
        |         WHEN id % 10 = 6 AND id >= 16 THEN id - 6
        |         ELSE id END seed,
        |    CASE WHEN id % 10 = 3 AND id >= 13 THEN 20 ELSE 0 END sh
        |  FROM ids WHERE id % 97 <> 0),
        |img AS (SELECT id, sh, seed % 16 + 16 w, (seed*3) % 12 + 12 h,
        |    (seed * 2654435761) % 1000003 m
        |  FROM cls),
        |px AS (SELECT id, sh, m, w, h, unnest(range(w)) x FROM img),
        |pxy AS (SELECT id, sh, m, w, h, x, unnest(range(h)) y FROM px),
        |gr AS (SELECT id, w, h, x, y,
        |    (299*((x*(7 + m % 13) + y*(13 + m % 29) + m) % 201 + sh)
        |   + 587*((x*(3 + m % 17) + y*(11 + m % 31) + 2*m) % 201 + sh)
        |   + 114*((x*(5 + m % 19) + y*(17 + m % 37) + 3*m) % 201 + sh)) // 1000 g
        |  FROM pxy),
        |grid AS (SELECT id, (x*9)//w cx, (y*8)//h cy, SUM(g)//COUNT(*) v
        |  FROM gr GROUP BY 1, 2, 3),
        |bits AS (SELECT a.id, a.cy*8 + a.cx bt
        |  FROM grid a JOIN grid b ON a.id = b.id AND a.cy = b.cy
        |    AND b.cx = a.cx + 1
        |  WHERE b.v > a.v),
        |ib AS (SELECT id, unnest(range(4)) band FROM img),
        |bv AS (SELECT ib.id, ib.band,
        |    COALESCE(SUM(CAST(1 AS BIGINT) << CAST(bt % 16 AS INT)), 0) v
        |  FROM ib LEFT JOIN bits ON bits.id = ib.id AND bits.bt // 16 = ib.band
        |  GROUP BY 1, 2),
        |bkt AS (SELECT band, v FROM bv GROUP BY band, v
        |  HAVING COUNT(*) BETWEEN 2 AND 1000),
        |kb AS (SELECT bv.id, bv.band, bv.v FROM bv JOIN bkt USING (band, v)),
        |cand AS (SELECT DISTINCT a.id ia, b.id ib2 FROM kb a JOIN kb b
        |  ON a.band = b.band AND a.v = b.v AND a.id < b.id),
        |hm AS (SELECT c.ia, c.ib2, SUM(bit_count(xor(x.v, y.v))) d
        |  FROM cand c JOIN bv x ON x.id = c.ia
        |    JOIN bv y ON y.id = c.ib2 AND y.band = x.band
        |  GROUP BY 1, 2)""".stripMargin

  /** The q136 audio-hash pipeline as a DuckDB CTE chain (sample formula
    * -> |amplitude| -> 65-frame floor partition -> cross-multiplied
    * gradient-sign bits -> 16-bit bands -> capped buckets -> Hamming
    * distances in `hm`) — the audio twin of [[dhashPairsCte]]. The gain
    * twin needs no special casing beyond `gn`: both cross-product sides
    * scale by the gain, so every bit is identical to its seed's. The
    * metadata twin needs NO formula change at all — the container bytes
    * differ but the decoded PCM (all the oracle ever models) is the
    * seed's. */
  private val ahashPairsCte: String =
    """ids AS (SELECT doc_id id FROM documents),
      |cls AS (SELECT id,
      |    CASE WHEN id % 10 = 3 AND id >= 13 THEN id - 3
      |         WHEN id % 10 = 6 AND id >= 16 THEN id - 6
      |         ELSE id END seed,
      |    CASE WHEN id % 10 = 3 AND id >= 13 THEN 2 ELSE 1 END gn
      |  FROM ids WHERE id % 97 <> 0),
      |aup AS (SELECT id, gn, m, m % 600 + 100 n
      |  FROM (SELECT id, gn, (seed * 2654435761) % 1000003 m FROM cls)),
      |smp AS (SELECT id, n, unnest(range(n)) i, gn, m FROM aup),
      |frm AS (SELECT id, (i*65)//n f,
      |    SUM(abs((((i + 7*m + 1)*(i + 7*m + 1) % 1000003) * 2654435761
      |             % 1000003) % 24001 - 12000) * gn) s, COUNT(*) c
      |  FROM smp GROUP BY 1, 2),
      |bits AS (SELECT x.id, x.f bt
      |  FROM frm x JOIN frm y ON x.id = y.id AND y.f = x.f + 1
      |  WHERE y.s * x.c > x.s * y.c),
      |ib AS (SELECT id, unnest(range(4)) band FROM aup),
      |bv AS (SELECT ib.id, ib.band,
      |    COALESCE(SUM(CAST(1 AS BIGINT) << CAST(bt % 16 AS INT)), 0) v
      |  FROM ib LEFT JOIN bits ON bits.id = ib.id AND bits.bt // 16 = ib.band
      |  GROUP BY 1, 2),
      |bkt AS (SELECT band, v FROM bv GROUP BY band, v
      |  HAVING COUNT(*) BETWEEN 2 AND 1000),
      |kb AS (SELECT bv.id, bv.band, bv.v FROM bv JOIN bkt USING (band, v)),
      |cand AS (SELECT DISTINCT a.id ia, b.id ib2 FROM kb a JOIN kb b
      |  ON a.band = b.band AND a.v = b.v AND a.id < b.id),
      |hm AS (SELECT c.ia, c.ib2, SUM(bit_count(xor(x.v, y.v))) d
      |  FROM cand c JOIN bv x ON x.id = c.ia
      |    JOIN bv y ON y.id = c.ib2 AND y.band = x.band
      |  GROUP BY 1, 2)""".stripMargin

  /** The q141 video pipeline as a DuckDB CTE chain: per-frame pixel
    * formula -> luma -> 9x8 grid -> gradient-sign bits -> 16-bit band
    * fold to a bounded fingerprint -> ordered 2-frame shingles ->
    * df-capped postings -> exact jaccard pairs in `jac`. The per-frame
    * stages are [[dhashPairsCte]]'s keyed by (id, f); the pairing stages
    * are the q29 inverted-index discipline. */
  private val videoPairsCte: String =
    """ids AS (SELECT doc_id id FROM documents),
      |cls AS (SELECT id,
      |    CASE WHEN id % 10 = 3 AND id >= 13 THEN id - 3
      |         WHEN id % 10 = 6 AND id >= 16 THEN id - 6
      |         WHEN id % 10 = 8 AND id >= 18 THEN id - 8
      |         ELSE id END seed,
      |    CASE WHEN id % 10 = 3 AND id >= 13 THEN 20 ELSE 0 END sh,
      |    CASE WHEN id % 10 = 3 AND id >= 13 THEN 1 ELSE 0 END tr
      |  FROM ids WHERE id % 97 <> 0),
      |geo AS (SELECT id, sh, tr, seed % 10 + 12 w, (seed*3) % 8 + 9 h,
      |    seed % 5 + 4 nf, (seed * 2654435761) % 1000003 m
      |  FROM cls),
      |frm AS (SELECT id, sh, w, h, f, (m + (f*f + f)*7919) % 1000003 mf
      |  FROM (SELECT id, sh, m, w, h, unnest(range(tr, nf)) f FROM geo)),
      |px AS (SELECT id, sh, mf, w, h, f, unnest(range(w)) x FROM frm),
      |pxy AS (SELECT id, sh, mf, w, h, f, x, unnest(range(h)) y FROM px),
      |gr AS (SELECT id, f, w, h, x, y,
      |    (299*((x*(7 + mf % 13) + y*(13 + mf % 29) + mf) % 201 + sh)
      |   + 587*((x*(3 + mf % 17) + y*(11 + mf % 31) + 2*mf) % 201 + sh)
      |   + 114*((x*(5 + mf % 19) + y*(17 + mf % 37) + 3*mf) % 201 + sh)) // 1000 g
      |  FROM pxy),
      |grid AS (SELECT id, f, (x*9)//w cx, (y*8)//h cy, SUM(g)//COUNT(*) v
      |  FROM gr GROUP BY 1, 2, 3, 4),
      |bits AS (SELECT a.id, a.f, a.cy*8 + a.cx bt
      |  FROM grid a JOIN grid b ON a.id = b.id AND a.f = b.f
      |    AND a.cy = b.cy AND b.cx = a.cx + 1
      |  WHERE b.v > a.v),
      |fb AS (SELECT id, f, unnest(range(4)) band FROM frm),
      |bv AS (SELECT fb.id, fb.f, fb.band,
      |    COALESCE(SUM(CAST(1 AS BIGINT) << CAST(bt % 16 AS INT)), 0) v
      |  FROM fb LEFT JOIN bits ON bits.id = fb.id AND bits.f = fb.f
      |    AND bits.bt // 16 = fb.band
      |  GROUP BY 1, 2, 3),
      |fp AS (SELECT id, f, list_reduce(list(v ORDER BY band),
      |    (a, b) -> (a*1315423911 + b) % 1000000007) fp
      |  FROM bv GROUP BY id, f),
      |shl AS (SELECT id, list_distinct(list_transform(range(1, len(fps)),
      |    i -> (fps[i]*31 + fps[i+1]) % 1000000007)) sps
      |  FROM (SELECT id, list(fp ORDER BY f) fps FROM fp GROUP BY id)
      |  WHERE len(fps) >= 2),
      |post AS (SELECT id, unnest(sps) s FROM shl),
      |cold AS (SELECT * FROM post WHERE s IN (
      |    SELECT s FROM post GROUP BY s HAVING COUNT(*) <= 1000)),
      |sz AS (SELECT id, len(sps) sz FROM shl),
      |pr AS (SELECT a.id ia, b.id ib2, COUNT(*) c FROM cold a JOIN cold b
      |  ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
      |jac AS (SELECT ia, ib2, c,
      |    CAST(c AS DOUBLE) / (x.sz + y.sz - c) j
      |  FROM pr JOIN sz x ON x.id = pr.ia JOIN sz y ON y.id = pr.ib2)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- multimodal plumbing (binary media + typed metadata; decode STUB) ---
    "q31_multimodal_meta" -> ((s, d) =>
      Multimodal.metadata(Multimodal.assets(Tables.documents(s, d)))),
    "q32_frame_sample" -> ((s, d) =>
      Multimodal.frameSamples(Multimodal.assets(Tables.documents(s, d)), everyMs = 1000)),
    // flat f00..f15 doubles (round-3): the array<float> form crashed the
    // driver's pandas compare; scalar columns restore the hash gate AND
    // admit a real DuckDB oracle (the stub codec is integer arithmetic
    // over the UTF-8 bytes). decodeFeatures (array form) remains the API.
    "q33_media_features" -> ((s, d) =>
      Multimodal.featureColumns(s, Multimodal.assets(Tables.documents(s, d)))),
    // REAL byte-level media decode: PPM/WAV payloads synthesized from a
    // closed-form formula, parsed back by the dependency-free codecs
    // (magic-byte dispatch, garbage rows emitted undecoded) — the oracle
    // recomputes the decoded integer sums from the formula, so the codec
    // round trip gets the same cross-engine hash gate as relational ops
    "q96_codec_real" -> ((s, d) =>
      Multimodal.decodeMedia(s,
        Multimodal.syntheticRealAssets(
          Tables.documents(s, d).select(col("doc_id"))))),
    // REAL entropy-coded decode: PNG payloads written by the JDK's
    // ImageIO from a closed-form pixel formula, decoded back through the
    // same headless ImageIO on executors (magic-byte dispatch, garbage
    // rows undecoded). PNG is lossless, so the decoded channel sums equal
    // the formula's — the oracle recomputes them without seeing a PNG
    // byte, giving the entropy-coded path q96's cross-engine gate
    "q112_codec_png" -> ((s, d) =>
      Multimodal.decodeMedia(s,
        Multimodal.syntheticPngAssets(
          Tables.documents(s, d).select(col("doc_id"))))),
    // perceptual image dedup (Dedup.dhashPairs): in-plan synthesized
    // PPM/PNG assets with planted brightness-shifted and cross-codec
    // duplicate twins; the oracle replays the ENTIRE integer pipeline —
    // pixel formula -> luma -> 9x8 block-mean grid -> gradient-sign bits
    // -> 16-bit bands -> capped buckets -> Hamming-verified pairs — so
    // decode, downsample, packing, banding, and verification are all
    // cross-engine hash-gated
    "q133_image_dhash_pairs" -> ((s, d) =>
      Dedup.dhashPairs(Multimodal.syntheticDhashAssets(
        Tables.documents(s, d).select(col("doc_id"))))),
    // model-based quality scoring (QualityModel, FineWeb-Edu shape): a
    // labeled fixture is synthesized in-plan (40% of docs get a grade-5
    // or grade-0 marker suffix), the integer smoothed-mean-label weight
    // grid trains relationally, and the corpus is scored SCAN-SIDE by
    // the in-plan weight vector; the oracle re-derives training,
    // scoring, and the tertile thresholds relationally — the scan-side
    // == relational equivalence proof, the q23b pattern
    // image dedup RESOLUTION: the q133 pair graph resolved to one
    // canonical image per perceptual cluster — keep the HIGHEST-
    // RESOLUTION copy (pixels = w*h from the real decode), tie to the
    // lowest id; never-paired images all survive. Composes dhashPairs ->
    // dupClusters -> resolveDuplicates, the same pipeline the text pair
    // families feed; the oracle chains the q133 pair SQL with the q117
    // recursive-CTE cluster + representative rule
    "q135_image_dedup_resolve" -> ((s, d) => {
      // synthesize the asset corpus ONCE (the q144 single-pass shape):
      // the persisted binary frame feeds both the hash-pair engine and
      // the dimension decode; meta is tiny and checkpointed, so the
      // cache releases as soon as both eager consumers finish
      val assets = Multimodal.syntheticDhashAssets(
        Tables.documents(s, d).select(col("doc_id"))).persist()
      val pairs = Dedup.dhashPairs(assets)
        .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
      val meta = Multimodal.decodeMedia(s, assets)
        .where(col("media_type") === "image")
        .select(col("asset_id"), col("width"), col("height"),
          (col("width") * col("height")).cast("long").as("pixels"))
        .localCheckpoint(true)
      val out = Curate.resolveDuplicates(meta, pairs, idCol = "asset_id",
        scoreCol = "pixels")
      assets.unpersist(false)
      out
    }),
    // perceptual AUDIO dedup (Dedup.ahashPairs): in-plan synthesized WAV
    // assets with planted volume-scaled and metadata-rewrapped duplicate
    // twins; the oracle replays the ENTIRE integer pipeline — sample
    // formula -> |amplitude| -> 65-frame floor partition -> cross-
    // multiplied gradient-sign bits -> 16-bit bands -> capped buckets ->
    // Hamming-verified pairs — so decode, framing, packing, banding, and
    // verification are all cross-engine hash-gated (the q133 discipline
    // on the audio modality)
    "q136_audio_ahash_pairs" -> ((s, d) =>
      Dedup.ahashPairs(Multimodal.syntheticAhashAssets(
        Tables.documents(s, d).select(col("doc_id"))))),
    // encoding-damage QA (TextAnalysis.encodingReport): replacement
    // chars, mojibake artifacts (UTF-8 re-read in a legacy codepage),
    // and control-char spill, counted by exact substring arithmetic;
    // damage planted in-plan per id class so all three signals and all
    // three verdicts occur, and the oracle replays every count
    "q139_encoding_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val t = when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" cafÃ© naÃ¯ve seÃ±or")))
        .when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" bad�char�")))
        .when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" ctl\u0007here")))
        .when(col("doc_id") % 7 === 4,
          concat(col("text"),
            lit(" â€œquoteâ€” and â€™s")))
        .otherwise(col("text"))
      TextAnalysis.encodingReport(docs.select(col("doc_id"), t.as("text")))
    }),
    // cross-modal (image, caption) pair dedup (Dedup.crossModalPairs,
    // the LAION rule): q133's verified image pairs survive only if the
    // captions ALSO near-duplicate — twins inherit their seed's caption
    // with a small suffix (high jaccard, confirmed) except every third
    // metadata twin, which keeps its OWN unrelated text (low jaccard,
    // rejected: same image, different supervision — must survive); the
    // oracle chains the q133 CTE with the caption join and exact
    // distinct-2-gram jaccard
    "q140_crossmodal_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val assets = Multimodal.syntheticDhashAssets(docs.select(col("doc_id")))
      val seedOf = when(col("doc_id") % 10 === 3 && col("doc_id") >= 13, col("doc_id") - 3)
        .when(col("doc_id") % 10 === 6 && col("doc_id") >= 16, col("doc_id") - 6)
        .otherwise(col("doc_id"))
      val capSrc = when(col("doc_id") % 10 === 6 && col("doc_id") % 3 === 0, col("doc_id"))
        .otherwise(seedOf)
      val suffix = when(col("doc_id") % 10 === 3 && col("doc_id") >= 13, lit(" thumbnail"))
        .when(col("doc_id") % 10 === 6 && col("doc_id") >= 16 &&
          col("doc_id") % 3 =!= 0, lit(" alt"))
        .otherwise(lit(""))
      val captions = docs.select(col("doc_id"), capSrc.as("_src"), suffix.as("_suf"))
        .join(docs.select(col("doc_id").as("_src"), col("text")), Seq("_src"))
        .select(col("doc_id").as("asset_id"), concat(col("text"), col("_suf")).as("caption"))
      Dedup.crossModalPairs(Dedup.dhashPairs(assets), captions)
    }),
    // perceptual VIDEO dedup (Dedup.videoPairs): in-plan synthesized
    // containers (GVID + real ISO-BMFF/MP4 via the q163-era box walk)
    // with planted trimmed+brightness-shifted, PNG-re-muxed, and
    // MP4-re-muxed duplicate twins — the MP4 twins oracle-gate the
    // stsz/stsc/stco demux: a broken box walk loses their pairs and the
    // hash diverges; scan-side signature = consecutive
    // 2-frame shingles over per-frame dHash fingerprints, paired by the
    // inverted-index jaccard discipline. The oracle replays the ENTIRE
    // integer pipeline — per-frame pixel formula -> luma -> grid ->
    // gradient bits -> band fold -> temporal shingles -> df-capped
    // postings -> exact jaccard — so container parse, per-frame hashing,
    // the fingerprint fold, shingling, and verification are all
    // cross-engine hash-gated (the q133/q136 discipline on the temporal
    // modality)
    "q141_video_dedup_pairs" -> ((s, d) =>
      Dedup.videoPairs(Multimodal.syntheticVideoAssets(
        Tables.documents(s, d).select(col("doc_id"))))),
    // video dedup RESOLUTION (the q135 rule on the temporal modality):
    // q141's verified pair graph -> connected components -> keep the
    // RICHEST copy per perceptual cluster (most distinct temporal
    // shingles = longest content — the trim twins lose to their seeds),
    // tie to min id; unpaired videos and non-videos with no signature
    // behave per the q117/q135 contract (unpaired kept, unsigned absent
    // from the metadata frame)
    "q144_video_dedup_resolve" -> ((s, d) => {
      val assets = Multimodal.syntheticVideoAssets(
        Tables.documents(s, d).select(col("doc_id")))
      // synthesize + container-parse + hash the corpus ONCE: the shared
      // signature frame feeds the pair engine AND the richness metadata
      // (the r9 plan audit flagged the old two-pass form); meta is a
      // tiny checkpointed frame, so the signature cache releases as soon
      // as the eager cluster rounds inside resolveDuplicates finish
      val sigs = assets.select(col("asset_id").as("video_id"),
          Exprs.videoShingles(col("media")).as("sh"))
        .where(col("sh").isNotNull && size(col("sh")) > 0)
        .persist()
      val pairs = Dedup.videoPairsFromSignatures(sigs)
        .select(col("video_a").as("doc_a"), col("video_b").as("doc_b"))
      val meta = sigs
        .select(col("video_id").as("asset_id"),
          size(col("sh")).cast("long").as("n_shingles"))
        .localCheckpoint(true)
      val out = Curate.resolveDuplicates(meta, pairs, idCol = "asset_id",
        scoreCol = "n_shingles")
      sigs.unpersist(false)
      out
    }),
    // video container metadata (Exprs.mediaFormat + videoFrameCount +
    // videoShingles): the corpus-composition report a 100 TB media scan
    // runs FIRST — container by magic, frame count by container parse
    // alone (no frame decode), temporal-evidence size — all scan-side;
    // the oracle replays the container class rule, nf − trim, and the
    // full shingle pipeline's distinct count per video (so the MP4 box
    // walk is gated here a second way: a broken demux NULLs the +8
    // class's rows out of the count)
    "q165_video_meta" -> ((s, d) => {
      val assets = Multimodal.syntheticVideoAssets(
        Tables.documents(s, d).select(col("doc_id")))
      assets.select(col("asset_id"),
          Exprs.mediaFormat(col("media")).as("container"),
          Exprs.videoFrameCount(col("media")).as("n_frames"),
          size(Exprs.videoShingles(col("media"))).cast("long").as("n_shingles"))
        .where(col("container").isNotNull)
    }))

  val oracleSql: Map[String, String] = Map(
    "q31_multimodal_meta" ->
      """WITH m AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) n,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END mt
        |  FROM documents)
        |SELECT doc_id asset_id, mt media_type, n n_bytes,
        |  CASE WHEN mt <> 'audio' THEN n % 640 + 16 END width,
        |  CASE WHEN mt <> 'audio' THEN (n * 7) % 480 + 16 END height,
        |  CASE WHEN mt = 'audio' THEN 16000 END sample_rate,
        |  CASE WHEN mt <> 'image' THEN (n * 13) % 60000 + 1000 END duration_ms
        |FROM m""".stripMargin,
    "q32_frame_sample" ->
      """WITH m AS (SELECT doc_id asset_id,
        |    (octet_length(CAST(text AS BLOB)) * 13) % 60000 + 1000 duration_ms
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT asset_id, duration_ms, offset_ms // 1000 frame_idx, offset_ms
        |FROM (SELECT asset_id, duration_ms,
        |        unnest(range(0, duration_ms + 1, 1000)) offset_ms FROM m)""".stripMargin,
    // byte histogram of the UTF-8 payload via hex(): char 2i+1 of the hex
    // string is byte i's HIGH nibble = its bin; each f-column is that bin's
    // count / total bytes, one exact-int double division in both engines
    "q33_media_features" -> {
      val bins = "0123456789ABCDEF".zipWithIndex.map { case (c, j) =>
        f"  CAST(LEN(list_filter(hs, c -> c = '$c')) AS DOUBLE) / GREATEST(n, 1) f$j%02d"
      }.mkString(",\n")
      s"""WITH h AS (SELECT doc_id, hex(CAST(text AS BLOB)) hx,
         |            octet_length(CAST(text AS BLOB)) n FROM documents),
         |nib AS (SELECT doc_id, n,
         |          list_transform(range(0, n), i -> substr(hx, CAST(2*i+1 AS INT), 1)) hs
         |        FROM h)
         |SELECT doc_id asset_id, CAST(n AS INT) n_bytes,
         |$bins
         |FROM nib""".stripMargin
    },
    "q96_codec_real" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |img AS (SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) w,
        |    CAST((doc_id*3) % 16 + 8 AS INT) h
        |  FROM ids WHERE doc_id % 2 = 0 AND doc_id % 97 <> 0),
        |ix AS (SELECT doc_id, w, h, unnest(range(w)) x FROM img),
        |icell AS (SELECT doc_id, w, h, x, unnest(range(h)) y FROM ix),
        |isum AS (SELECT doc_id, w, h,
        |    CAST(SUM((x*7 + y*13 + doc_id) % 256) AS BIGINT) sr,
        |    CAST(SUM((x*3 + y*5 + 2*doc_id) % 256) AS BIGINT) sg,
        |    CAST(SUM((x + y + 3*doc_id) % 256) AS BIGINT) sb
        |  FROM icell GROUP BY 1,2,3),
        |aud AS (SELECT doc_id, CAST(doc_id % 1000 + 100 AS INT) n FROM ids
        |  WHERE doc_id % 2 = 1 AND doc_id % 97 <> 0),
        |acell AS (SELECT doc_id, n, unnest(range(n)) i FROM aud),
        |asum AS (SELECT doc_id, n,
        |    CAST(SUM(ABS((i*37 + doc_id*11) % 65536 - 32768)) AS BIGINT) sa
        |  FROM acell GROUP BY 1,2)
        |SELECT doc_id asset_id, 'image' media_type, w width, h height,
        |  sr sum_r, sg sum_g, sb sum_b, CAST(NULL AS INT) sample_rate,
        |  CAST(NULL AS INT) n_samples, CAST(NULL AS BIGINT) sum_abs FROM isum
        |UNION ALL
        |SELECT doc_id, 'audio', NULL, NULL, NULL, NULL, NULL, 16000, n, sa FROM asum
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |FROM ids WHERE doc_id % 97 = 0""".stripMargin,
    "q112_codec_png" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |img AS (SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) w,
        |    CAST((doc_id*3) % 16 + 8 AS INT) h
        |  FROM ids WHERE doc_id % 97 <> 0),
        |ix AS (SELECT doc_id, w, h, unnest(range(w)) x FROM img),
        |icell AS (SELECT doc_id, w, h, x, unnest(range(h)) y FROM ix),
        |isum AS (SELECT doc_id, w, h,
        |    CAST(SUM((x*7 + y*13 + doc_id) % 256) AS BIGINT) sr,
        |    CAST(SUM((x*3 + y*5 + 2*doc_id) % 256) AS BIGINT) sg,
        |    CAST(SUM((x + y + 3*doc_id) % 256) AS BIGINT) sb
        |  FROM icell GROUP BY 1,2,3)
        |SELECT doc_id asset_id, 'image' media_type, w width, h height,
        |  sr sum_r, sg sum_g, sb sum_b, CAST(NULL AS INT) sample_rate,
        |  CAST(NULL AS INT) n_samples, CAST(NULL AS BIGINT) sum_abs FROM isum
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |FROM ids WHERE doc_id % 97 = 0""".stripMargin,
    "q133_image_dhash_pairs" ->
      ("WITH " + dhashPairsCte + """
        |SELECT ia asset_a, ib2 asset_b, CAST(d AS BIGINT) hamming
        |FROM hm WHERE d <= 3""".stripMargin),
    "q135_image_dedup_resolve" ->
      ("WITH RECURSIVE " + dhashPairsCte + """,
        |pr AS (SELECT ia a, ib2 b FROM hm WHERE d <= 3),
        |e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
        |reach(node, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node),
        |cl AS (SELECT node, MIN(r) cluster_id FROM reach GROUP BY node),
        |reps AS (SELECT node FROM (
        |  SELECT cl.node, row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY i.w * i.h DESC, cl.node ASC) rn
        |  FROM cl JOIN img i ON i.id = cl.node) WHERE rn = 1)
        |SELECT i.id asset_id, CAST(i.w AS INT) width, CAST(i.h AS INT) height,
        |  CAST(i.w * i.h AS BIGINT) pixels
        |FROM img i WHERE i.id NOT IN (SELECT node FROM cl)
        |   OR i.id IN (SELECT node FROM reps)""".stripMargin),
    "q136_audio_ahash_pairs" ->
      ("WITH " + ahashPairsCte + """
        |SELECT ia asset_a, ib2 asset_b, CAST(d AS BIGINT) hamming
        |FROM hm WHERE d <= 3""".stripMargin),
    // q139 oracle note: DuckDB's parser rejects raw control bytes inside
    // string literals, so the control-char class and the planted BEL are
    // built with chr() at runtime (probe-verified incl. chr(0) in an RE2
    // class); the mojibake artifacts and U+FFFD are plain literals
    "q139_encoding_report" ->
      """WITH x AS (SELECT doc_id, CASE
        |    WHEN doc_id % 7 = 1 THEN text || ' cafÃ© naÃ¯ve seÃ±or'
        |    WHEN doc_id % 7 = 2 THEN text || ' bad�char�'
        |    WHEN doc_id % 7 = 3 THEN text || ' ctl' || chr(7) || 'here'
        |    WHEN doc_id % 7 = 4 THEN text || ' â€œquoteâ€” and â€™s'
        |    ELSE text END t FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(length(t) - length(replace(t, '�', '')) AS BIGINT) n_repl,
        |    CAST((length(t) - length(replace(t, 'Ã©', ''))) // 2
        |       + (length(t) - length(replace(t, 'Ã¯', ''))) // 2
        |       + (length(t) - length(replace(t, 'Ã±', ''))) // 2
        |       + (length(t) - length(replace(t, 'â€™', ''))) // 3
        |       + (length(t) - length(replace(t, 'â€œ', ''))) // 3
        |       + (length(t) - length(replace(t, 'â€”', ''))) // 3 AS BIGINT) n_moji,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[' || chr(0) || '-' || chr(8) || chr(11) || chr(12) ||
        |      chr(14) || '-' || chr(31) || chr(127) || ']', '', 'g')) AS BIGINT) n_ctrl
        |  FROM x)
        |SELECT doc_id, n_repl, n_moji, n_ctrl,
        |  CASE WHEN n_repl > 0 OR n_ctrl > 0 THEN 'damaged'
        |       WHEN n_moji > 0 THEN 'suspect' ELSE 'clean' END verdict
        |FROM c""".stripMargin,
    "q140_crossmodal_dedup" ->
      ("WITH " + dhashPairsCte + """,
        |cap AS (SELECT i.id, d.text || CASE
        |    WHEN i.id % 10 = 3 AND i.id >= 13 THEN ' thumbnail'
        |    WHEN i.id % 10 = 6 AND i.id >= 16 AND i.id % 3 <> 0 THEN ' alt'
        |    ELSE '' END caption
        |  FROM (SELECT doc_id id FROM documents) i JOIN documents d
        |    ON d.doc_id = CASE
        |      WHEN i.id % 10 = 6 AND i.id % 3 = 0 THEN i.id
        |      WHEN i.id % 10 = 3 AND i.id >= 13 THEN i.id - 3
        |      WHEN i.id % 10 = 6 AND i.id >= 16 THEN i.id - 6
        |      ELSE i.id END),
        |gs AS (SELECT id, list_distinct(
        |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) sh
        |  FROM (SELECT id, list_filter(
        |      regexp_split_to_array(lower(caption), '\s+'), t -> t <> '') tk FROM cap))
        |SELECT h.ia asset_a, h.ib2 asset_b, CAST(h.d AS BIGINT) hamming,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) n_inter,
        |  CAST(len(list_distinct(a.sh || b.sh)) AS BIGINT) n_union
        |FROM hm h JOIN gs a ON a.id = h.ia JOIN gs b ON b.id = h.ib2
        |WHERE h.d <= 3 AND len(list_intersect(a.sh, b.sh)) * 100
        |  >= 50 * len(list_distinct(a.sh || b.sh))""".stripMargin),
    "q141_video_dedup_pairs" ->
      ("WITH " + videoPairsCte + """
        |SELECT ia video_a, ib2 video_b, CAST(c AS BIGINT) n_shared,
        |  j jaccard
        |FROM jac WHERE j >= 0.5""".stripMargin),
    "q144_video_dedup_resolve" ->
      ("WITH RECURSIVE " + videoPairsCte + """,
        |vp AS (SELECT ia a, ib2 b FROM jac WHERE j >= 0.5),
        |e AS (SELECT a, b FROM vp UNION SELECT b, a FROM vp),
        |reach(node, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node),
        |cl AS (SELECT node, MIN(r) cluster_id FROM reach GROUP BY node),
        |vsz AS (SELECT id, len(sps) ns FROM shl),
        |reps AS (SELECT node FROM (
        |  SELECT cl.node, row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY v.ns DESC, cl.node ASC) rn
        |  FROM cl JOIN vsz v ON v.id = cl.node) WHERE rn = 1)
        |SELECT v.id asset_id, CAST(v.ns AS BIGINT) n_shingles
        |FROM vsz v WHERE v.id NOT IN (SELECT node FROM cl)
        |   OR v.id IN (SELECT node FROM reps)""".stripMargin),
    "q165_video_meta" ->
      ("WITH " + videoPairsCte + """
        |SELECT g.id asset_id,
        |  CASE WHEN g.id % 10 = 8 AND g.id >= 18 THEN 'mp4'
        |       ELSE 'gvid' END container,
        |  CAST(g.nf - g.tr AS BIGINT) n_frames,
        |  COALESCE(CAST(len(s.sps) AS BIGINT), 0) n_shingles
        |FROM (SELECT c.id, c.tr, seed % 5 + 4 nf FROM cls c) g
        |LEFT JOIN shl s ON s.id = g.id""".stripMargin))
}
