package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scale smoke: synthesize a large doc corpus (plants exact+near dups),
  * run the full minhash dedup pipeline, report wall-clock + survivors.
  * Evidence for the shuffle-profile claims in ops/Dedup.scala at corpus
  * sizes 20x the bench testdata. Writes nothing outside /tmp. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    import spark.implicits._
    // ~120-token docs; every 10th doc is a near-dup of doc i-1 (one token
    // changed), every 50th an exact dup of doc i-2
    val docs = spark.range(n).select(col("id").as("doc_id"),
      transform(sequence(lit(1), lit(120)),
        j => concat(lit("tok"), pmod(col("id") * 131 + j * 7, lit(1000003)), lit("_"), j)).as("toks"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0 && col("doc_id") >= 10,
          concat_ws(" ", transform(sequence(lit(1), lit(120)),
            j => concat(lit("tok"), pmod((col("doc_id") - 1) * 131 + j * 7, lit(1000003)), lit("_"),
              when(j === 60, lit("CHANGED")).otherwise(j.cast("string"))))))
        .when(pmod(col("doc_id"), lit(50)) === 0 && col("doc_id") >= 50,
          concat_ws(" ", transform(sequence(lit(1), lit(120)),
            j => concat(lit("tok"), pmod((col("doc_id") - 2) * 131 + j * 7, lit(1000003)), lit("_"), j))))
        .otherwise(concat_ws(" ", col("toks"))).as("text"))
      .repartition(32).persist()
    println(s"corpus: ${docs.count()} docs")
    var t0 = System.nanoTime()
    val survivors = Dedup.minhashSurvivors(docs, tau = 0.7).count()
    println(f"minhashSurvivors($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $survivors survivors, ${n-survivors} dropped")
    t0 = System.nanoTime()
    val exact = Dedup.exact(docs).count()
    println(f"exact($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $exact distinct texts")
    // incremental dedup: index the corpus ONCE, then dedup a 5% batch
    // against it — the steady-state cost a streaming ingest pays per batch
    // (index build is the amortized one-off)
    t0 = System.nanoTime()
    val index = Dedup.minhashIndex(docs).persist()
    val idxRows = index.count()
    println(f"minhashIndex($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $idxRows rows")
    val bn = n / 20
    // even batch ids: near-dup of corpus doc 2*id+1 (re-synthesized from
    // the corpus formula with token 60 changed) — ODD targets only, since
    // every 10th/50th corpus doc's text was itself replaced by the
    // near/exact-dup branch and no longer follows its own id's formula;
    // odd batch ids: fresh content
    val batch = spark.range(bn).select((col("id") + n).as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0,
        concat_ws(" ", transform(sequence(lit(1), lit(120)),
          j => concat(lit("tok"), pmod((col("id") * 2 + 1) * 131 + j * 7, lit(1000003)), lit("_"),
            when(j === 60, lit("BATCHMUT")).otherwise(j.cast("string"))))))
      .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(120)),
        j => concat(lit("fresh"), col("id"), lit("_"), j)))).as("text"))
    t0 = System.nanoTime()
    val incHits = Dedup.incrementalDuplicates(batch, index).count()
    println(f"incrementalDuplicates($bn-doc batch vs $n-doc index): ${(System.nanoTime()-t0)/1e9}%.1f s, $incHits cross-dup pairs")
    index.unpersist(false)
    // --- curation operators at the same corpus size ---
    t0 = System.nanoTime()
    val nChunks = ops.Curate.chunks(docs, chunkLen = 50, stride = 40).count()
    println(f"chunks($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nChunks chunks")
    t0 = System.nanoTime()
    val sampled = ops.Curate.hashSample(docs, "doc_id", 0.1).count()
    println(f"hashSample($n docs, 0.1): ${(System.nanoTime()-t0)/1e9}%.1f s, $sampled kept")
    // dup-cluster resolution: n/10 star components of size 10 (the shape
    // real dedup pairs take — many dups of one canonical doc)
    val pairs = spark.range(n.toLong).where(pmod(col("id"), lit(10)) =!= 0)
      .select((col("id") - pmod(col("id"), lit(10))).as("doc_a"), col("id").as("doc_b"))
    t0 = System.nanoTime()
    val clusters = ops.Curate.dupClusters(pairs)
    val nNodes = clusters.count()
    val nClusters = clusters.select("cluster_id").distinct().count()
    println(f"dupClusters(${n * 9 / 10} pairs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nNodes nodes -> $nClusters clusters")
    // CDC latest-image at 10x corpus rows, ~10 versions/key
    val changes = spark.range(n * 10L).select(
      pmod(col("id"), lit(n.toLong)).as("k"), col("id").as("change_id"),
      when(pmod(col("id"), lit(11)) === 0, "d").otherwise("u").as("op"))
    t0 = System.nanoTime()
    val image = ops.Cdc.latestImage(changes, Seq("k"), Seq("change_id")).count()
    println(f"cdcLatestImage(${n * 10L} changes, $n keys): ${(System.nanoTime()-t0)/1e9}%.1f s, $image live keys")
    // decontamination exact vs bloom at the full corpus size: benchmark =
    // every 20th doc's text (so real overlap exists via the planted dups);
    // same output both paths, the bloom path is the one that still works
    // when the bench shingle set outgrows a broadcast
    val benchDocs = docs.where(pmod(col("doc_id"), lit(20)) === 1)
      .select((col("doc_id") + n).as("doc_id"), col("text"))
    t0 = System.nanoTime()
    val exCont = ops.Curate.decontaminate(docs, benchDocs)
      .where(col("contaminated")).count()
    println(f"decontaminate($n docs vs ${n / 20}-doc bench): ${(System.nanoTime()-t0)/1e9}%.1f s, $exCont contaminated")
    t0 = System.nanoTime()
    val blCont = ops.Curate.decontaminateBloom(docs, benchDocs)
      .where(col("contaminated")).count()
    println(f"decontaminateBloom($n docs vs ${n / 20}-doc bench): ${(System.nanoTime()-t0)/1e9}%.1f s, $blCont contaminated")
    assert(exCont == blCont, s"bloom path diverged: $exCont vs $blCont")
    // --- winnow partial-overlap detection at the same corpus size ---
    // every 100th doc pair (i, i+1) shares a planted 24-token run at
    // DIFFERENT offsets (the overlap doc-level hashing cannot see); all
    // other tokens are xxhash64-derived, i.e. effectively random text.
    // Random filler matters: an earlier arithmetic formula
    // (id*131+j*7 mod 1000003) made token strings whose per-character
    // hash deltas were CONSTANT across positions for a fixed doc-id
    // difference, so whole families of k-gram hashes collided together
    // (~10x planted extra pairs at 1M docs, shared_fps 2-5, periodic
    // doc-id diffs) — an adversarial-input artifact of the fixture, not
    // the operator. With random tokens the birthday bound at minShared=2
    // predicts ~0 collision pairs, so the smoke asserts precision too.
    // A 24-token run holds 21 grams => >=4 selected interior positions
    // (the w-window coverage guarantee), comfortably >= minShared=2.
    type C = org.apache.spark.sql.Column
    def formulaToks(id: C, from: Int, cnt: Int): C =
      transform(sequence(lit(from), lit(from + cnt - 1)),
        j => concat(lit("t"), pmod(xxhash64(id * 120 + j, lit(7741)), lit(100000000019L))))
    def runToks(base: C): C =
      transform(sequence(lit(1), lit(24)), j => concat(lit("shared"), base, lit("_"), j))
    val wdocs = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(100)) === 0,
        concat_ws(" ", concat(formulaToks(col("id"), 1, 40),
          runToks(col("id")), formulaToks(col("id"), 41, 30))))
      .when(pmod(col("id"), lit(100)) === 1,
        concat_ws(" ", concat(formulaToks(col("id"), 1, 25),
          runToks(col("id") - 1), formulaToks(col("id"), 26, 45))))
      .otherwise(concat_ws(" ", formulaToks(col("id"), 1, 120))).as("text"))
      .repartition(32).persist()
    wdocs.count()
    t0 = System.nanoTime()
    val fpCount = ops.TextAnalysis.winnow(wdocs).count()
    println(f"winnow($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $fpCount fingerprints")
    t0 = System.nanoTime()
    val wp = ops.TextAnalysis.winnowPairs(wdocs, minShared = 2)
    val nPairs = wp.count()
    val planted = wp.where(pmod(col("doc_a"), lit(100)) === 0 &&
      col("doc_b") === col("doc_a") + 1).count()
    val expected = n / 100
    println(f"winnowPairs($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$nPairs pairs, $planted/$expected planted overlaps recovered")
    assert(planted >= expected * 99 / 100,
      s"winnow partial-overlap recall broke at scale: $planted/$expected")
    assert(nPairs - planted <= expected / 100 + 5,
      s"winnow pair precision broke at scale: ${nPairs - planted} non-planted pairs")
    wdocs.unpersist(false)
    // SemDeDup at n synthetic 32-dim vectors, every 10th an identical twin
    // of its predecessor; components are hash-uniform in [-0.5, 0.5] (a
    // sin(id*k) formula phase-locks ids into near-parallel vectors);
    // nlist scales with n to hold cluster width
    val dim = 32
    val comp = (id: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(id, j), lit(100003)).cast("double") / 100003.0 - 0.5).cast("float")
    val vecs = spark.range(n.toLong).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(10)) === 0 && col("id") >= 10,
        transform(sequence(lit(1), lit(dim)), j => comp(col("id") - 1, j)))
      .otherwise(transform(sequence(lit(1), lit(dim)), j => comp(col("id"), j)))
      .as("embedding"))
      .repartition(32).persist()
    vecs.count()
    val nlist = math.max(16, n / 1000)
    t0 = System.nanoTime()
    val kept = ops.Similarity.semDedup(vecs, nlist = nlist).count()
    println(f"semDedup($n vecs, nlist=$nlist): ${(System.nanoTime()-t0)/1e9}%.1f s, $kept survivors, ${n - kept} dropped")
    // IVF-PQ at the same vector count: train (bounded sample), encode the
    // corpus (scan-speed codegen pass), search with 10 exact-copy probes
    // through the residual path — self must come back at minimal ADC
    t0 = System.nanoTime()
    val pqCents = ops.Similarity.fitCentroids(vecs, nlist = 64)
    val pqBooks = ops.Similarity.pqTrainResidual(vecs, pqCents, m = 8, ksub = 16)
    println(f"pq train($n vecs, nlist=64, m=8, ksub=16): ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val nCodes = ops.Similarity.pqEncode(vecs, pqBooks).where(col("codes").isNotNull).count()
    println(f"pqEncode($n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nCodes coded (${n/((System.nanoTime()-t0)/1e9)}%.0f vecs/s)")
    val pqProbes = vecs.where(col("vec_id") < 10)
      .select((col("vec_id") + n).as("vec_id"), col("embedding"))
    t0 = System.nanoTime()
    val pqRows = ops.Similarity.ivfPqKnnResidual(pqProbes, vecs, pqCents, pqBooks,
      k = 5, nprobe = 1).select("qid", "nid", "adist")
      .as[(Long, Long, Double)].collect()
    val selfOk = pqRows.groupBy(_._1).count { case (q, rs) =>
      val mn = rs.map(_._3).min
      rs.exists(r => r._2 == q - n && r._3 == mn)
    }
    println(f"ivfPqKnnResidual(10 probes vs $n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, $selfOk/10 self-retrievals at minimal ADC")
    assert(selfOk == 10, s"residual PQ self-retrieval broke at scale: $selfOk/10")
    // BQ + rescore at the same vector count: sign-bit encode is a
    // scan-speed pass; 10 scaled-copy probes must come back top-1
    // through the Hamming-0 shortlist + exact rescore
    t0 = System.nanoTime()
    val nBq = vecs.select(graft.expr.Exprs.bqPack(col("embedding")).as("bq"))
      .where(col("bq").isNotNull).count()
    println(f"bqPack($n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nBq coded (${n/((System.nanoTime()-t0)/1e9)}%.0f vecs/s)")
    val bqProbes = vecs.where(col("vec_id") < 10)
      .select((col("vec_id") + n).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    t0 = System.nanoTime()
    val bqTop = ops.Similarity.bqKnn(bqProbes, vecs, k = 1, shortlist = 20)
      .where(col("rank") === 1 && col("nid") === col("qid") - n).count()
    println(f"bqKnn(10 probes vs $n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, $bqTop/10 scaled-copy self-retrievals")
    assert(bqTop == 10, s"BQ rescore self-retrieval broke at scale: $bqTop/10")
    vecs.unpersist(false)
    // --- round-7 corpus-shaping ops at the same corpus size ---
    // URL canonicalization: scan-speed string pass over n synthesized
    // messy URLs (4 surface-form families)
    val urls = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(4)) === 0,
        concat(lit("HTTP://WWW.h"), pmod(col("id"), lit(1000)),
          lit(".Example.COM:80/p/"), col("id"), lit("/?utm_source=x&b=2&a=1#f")))
      .when(pmod(col("id"), lit(4)) === 1,
        concat(lit("https://h"), pmod(col("id"), lit(1000)),
          lit(".example.com:8443/x?z=9&fbclid=Q&y=8")))
      .when(pmod(col("id"), lit(4)) === 2,
        concat(lit("HTTPS://Sub.h"), pmod(col("id"), lit(1000)),
          lit(".Example.com:443/only/Path/")))
      .otherwise(concat(lit("http://h"), pmod(col("id"), lit(1000)),
        lit(".example.com/?q="), col("id"), lit("&ref=r"))).as("url"))
    t0 = System.nanoTime()
    val nHosts = ops.Web.canonicalizeUrls(urls)
      .select("host").distinct().count()
    println(f"canonicalizeUrls($n urls): ${(System.nanoTime()-t0)/1e9}%.1f s, $nHosts distinct hosts")
    // per-domain cap under adversarial skew: HALF the corpus in one
    // mega-domain, the rest spread over 1000 small domains; the salted
    // two-level rank must keep exactly k from the mega-domain without a
    // single-task sort of n/2 rows
    val domained = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, lit("mega"))
        .otherwise(concat(lit("d"), pmod(col("id"), lit(1000)))).as("source"))
    t0 = System.nanoTime()
    val capped = ops.Curate.capPerDomain(domained, "source", "doc_id", k = 100)
    val megaKept = capped.where(col("source") === "mega").count()
    val totKept = capped.count()
    println(f"capPerDomain($n docs, mega=${n / 2}): ${(System.nanoTime()-t0)/1e9}%.1f s, mega kept $megaKept/100, total $totKept")
    assert(megaKept == 100, s"mega-domain cap broke: $megaKept")
    // Gopher repetition (round-8 single-pass expression): all gram
    // counting happens scan-side in the per-row hash map — the former
    // ~237M-gram-row shuffle (31-43 s here) is gone entirely
    t0 = System.nanoTime()
    val gr = ops.Quality.gopherRepetitionFast(docs)
    val nRep = gr.where(col("dup3_frac") > 0.5).count()
    println(f"gopherRepetitionFast($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nRep docs >50%% dup-3-gram chars")
    // C4 line dedup: 3-line docs where line 1 is one of 1000 boilerplates
    // (each duplicated ~n/1000 times — the hot-key case the min-struct
    // aggregation absorbs map-side), line 2 one of n/10 segment lines,
    // line 3 unique
    val lined = spark.range(n.toLong).select(col("id").as("doc_id"),
      concat(lit("BOILER "), pmod(col("id"), lit(1000)), lit("\n"),
        lit("SEG "), pmod(col("id"), lit(n.toLong / 10)), lit("\n"),
        lit("body "), col("id")).as("text"))
    t0 = System.nanoTime()
    val survivedDocs = ops.Curate.dedupLines(lined).count()
    println(f"dedupLines($n docs, ${3 * n} lines): ${(System.nanoTime()-t0)/1e9}%.1f s, $survivedDocs docs with surviving lines")
    assert(survivedDocs == n, s"every doc keeps its unique body line: $survivedDocs")
    // dedup resolution over the star pair graph (every id clustered in
    // decades): exactly one survivor per 10-doc cluster
    t0 = System.nanoTime()
    val resolved = ops.Curate.resolveDuplicates(
      docs.withColumn("score", length(col("text"))), pairs, scoreCol = "score").count()
    println(f"resolveDuplicates($n docs, ${n / 10} clusters): ${(System.nanoTime()-t0)/1e9}%.1f s, $resolved survivors")
    assert(resolved == n / 10, s"resolveDuplicates survivor count broke: $resolved != ${n / 10}")
    // DSIR importance resampling: weight on a 1%-of-corpus target, score
    // everything — two corpus scans + a broadcast join; the weight table
    // is capped at `buckets` rows no matter the corpus size
    t0 = System.nanoTime()
    val scored = ops.Importance.dsirScore(docs,
      ops.Importance.dsirWeights(docs, docs.where(pmod(col("doc_id"), lit(100)) === 0)))
    val nScored = scored.count()
    println(f"dsirScore($n docs, 1%% target): ${(System.nanoTime()-t0)/1e9}%.1f s, $nScored docs scored")
    assert(nScored == n, s"dsirScore dropped docs: $nScored != $n")
    // Exact substring dedup (Lee et al. ExactSubstr): every 100th doc
    // carries the same planted 30-token boilerplate span mid-document
    // (1% of the corpus — a 10k-way duplicated span, the hot-key case
    // for the gram postings), surrounded by id-unique tokens; with
    // minLen=20 the removal must be exactly the 30 planted positions in
    // every planted doc and nothing anywhere else
    val spanDocs = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(100)) === 0,
        concat_ws(" ",
          concat_ws(" ", transform(sequence(lit(1), lit(30)),
            j => concat(lit("pre"), col("id"), lit("_"), j))),
          concat_ws(" ", transform(sequence(lit(1), lit(30)),
            j => concat(lit("BOILERPLATE_"), j))),
          concat_ws(" ", transform(sequence(lit(1), lit(30)),
            j => concat(lit("post"), col("id"), lit("_"), j)))))
      .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(90)),
        j => concat(lit("solo"), col("id"), lit("_"), j)))).as("text"))
    // CCNet perplexity tiers: target = every 100th doc; model tables are
    // bounded (4096 rows) so the cost is the two target scans + one
    // corpus scan + the broadcast-join aggregation
    t0 = System.nanoTime()
    val tiers = ops.Perplexity.perplexityBuckets(docs,
      docs.where(pmod(col("doc_id"), lit(100)) === 0))
    val tierCounts = tiers.groupBy("ppl_bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"perplexityBuckets($n docs, 1%% target): ${(System.nanoTime()-t0)/1e9}%.1f s, tiers $tierCounts")
    assert(tierCounts.values.sum == n.toLong, s"ppl dropped docs: $tierCounts")
    // perplexityBuckets' internal persist (~5 longs/doc) is left to die
    // with the process — clearCache here would also evict `docs`
    // fastText-style lang-id: 4 synthetic "languages" with distinct char
    // textures (suffix alphabets); self-classification must be near-perfect
    val langDocs = docs.withColumn("lang",
      concat(lit("l"), pmod(col("doc_id"), lit(4))))
      .withColumn("text", concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit(" ætherwise wyrd gecynd"))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit(" zhongwen hanzi pinyin"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit(" ñandú jalapeño señal"))
          .otherwise(lit(" fjord smörgås kvæld"))))
    t0 = System.nanoTime()
    val lid = ops.LangId.langIdFasttext(langDocs)
    val lidAcc = lid.where(col("lang") === col("lang_pred")).count()
    println(f"langIdFasttext($n docs, 4 langs): ${(System.nanoTime()-t0)/1e9}%.1f s, $lidAcc/$n correct")
    assert(lidAcc >= n * 95L / 100L, s"lang-id accuracy collapsed: $lidAcc/$n")
    t0 = System.nanoTime()
    val cut = ops.Dedup.exactSubstrDedup(spanDocs, minLen = 20)
    val cutStats = cut.agg(
      sum(when(col("n_removed") === 30, 1L).otherwise(0L)),
      sum(when(col("n_removed") =!= 0 && col("n_removed") =!= 30, 1L).otherwise(0L))).first()
    println(f"exactSubstrDedup($n docs, ${n / 100} planted spans): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      s"${cutStats.getLong(0)} spans removed, ${cutStats.getLong(1)} mis-cuts")
    assert(cutStats.getLong(0) == n / 100, s"planted span removal broke: ${cutStats.getLong(0)}")
    assert(cutStats.getLong(1) == 0, s"non-planted docs were cut: ${cutStats.getLong(1)}")
    // unigram-entropy gate: pure scan-side per-row counting (no joins,
    // no shuffles) — wall-clock is the corpus scan itself
    t0 = System.nanoTime()
    val entN = ops.Quality.unigramEntropy(docs).count()
    println(f"unigramEntropy($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $entN docs scored")
    assert(entN == n.toLong, s"entropy gate dropped docs: $entN")
    // BM25 retrieval: postings build is the ONE token shuffle; 5 queries
    // of 4 formula tokens each (ids ≡ 1 mod 20, never overwritten by the
    // near/exact-dup branches, and formula tokens are id-unique mod the
    // prime) — the source doc must come back rank 1 on its own tokens
    val bmQs = spark.range(5).select(col("id").as("query_id"),
      concat_ws(" ", transform(sequence(lit(58), lit(61)),
        j => concat(lit("tok"), pmod((col("id") * 20 + 1) * 131 + j * 7, lit(1000003)),
          lit("_"), j))).as("text"))
    t0 = System.nanoTime()
    val bmPost = ops.Retrieval.bm25Postings(docs).persist()
    val nPost = bmPost.count()
    println(f"bm25Postings($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $nPost postings")
    t0 = System.nanoTime()
    val bmHits = ops.Retrieval.bm25Search(bmPost, bmQs, k = 5)
    val bmSelf = bmHits.where(col("rank") === 1 &&
      col("doc_id") === col("query_id") * 20 + 1).count()
    println(f"bm25Search(5 queries vs $n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, $bmSelf/5 source docs at rank 1")
    assert(bmSelf == 5, s"BM25 self-retrieval broke at scale: $bmSelf/5")
    bmPost.unpersist(false)
    // --- perceptual image dedup at the same corpus size ---
    // the q133 fixture at n images: brightness-shifted + cross-codec PNG
    // twins per seed form identical-hash cliques; every planted pair must
    // surface at Hamming 0. Cross-seed hashes are effectively random, so
    // banding also exercises realistic collision-candidate load
    // (~n^2 * 4/2^16 candidate probes Hamming-rejected).
    val imgIds = spark.range(n).select(col("id").as("doc_id"))
    val assets = ops.Multimodal.syntheticDhashAssets(imgIds)
      .repartition(32).persist()
    assets.count() // materialize encode outside the dedup timer
    t0 = System.nanoTime()
    val imgPairs = ops.Dedup.dhashPairs(assets).persist()
    val zeroDist = imgPairs.where(col("hamming") === 0).count()
    val nearDist = imgPairs.where(col("hamming") > 0).count()
    // planted identical-hash pairs from the class rules (twin cliques)
    val grp = scala.collection.mutable.Map[Long, List[Long]]()
    for (id <- 0L until n.toLong) if (id % 97 != 0) {
      val seed =
        if (id % 10 == 3 && id >= 13) id - 3
        else if (id % 10 == 6 && id >= 16) id - 6
        else id
      grp(seed) = id :: grp.getOrElse(seed, Nil)
    }
    val plantedImg = grp.values.flatMap { ms =>
      val s = ms.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSeq
    val foundPlanted = plantedImg.toDF("asset_a", "asset_b")
      .join(imgPairs.where(col("hamming") === 0), Seq("asset_a", "asset_b"), "left_semi")
      .count()
    println(f"dhashPairs($n images): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      s"$zeroDist hamming-0 pairs ($foundPlanted/${plantedImg.size} planted recalled), " +
      s"$nearDist at 1..3")
    // RECALL: every planted twin/re-encode pair surfaces UNLESS its
    // hash value coincides with an identical-hash cluster larger than
    // maxBucket (1000) — the documented degenerate-bucket cap. At 100k
    // that never happens (recall is total); at 1M the structured
    // synthetic family (shared slope-residue classes + dims produce
    // genuinely identical 9x8 gradient patterns across seeds) grows a
    // few cross-seed megaclusters, whose planted members the cap
    // excludes (~0.4%). Real corpora route identical-hash megaclusters
    // through exact-signature dedup before pairing; the smoke bounds
    // the loss instead of forbidding it.
    assert(foundPlanted * 100L >= plantedImg.size * 99L,
      s"planted image-dup recall broke: $foundPlanted/${plantedImg.size}")
    assert(zeroDist - foundPlanted <= n / 100L,
      s"coincidental hamming-0 volume exploded: ${zeroDist - foundPlanted}")
    assets.unpersist(false)
    imgPairs.unpersist(false)
    // --- perceptual video dedup at the same corpus size ---
    // the q141 fixture at n videos (4-8 frames each): the image
    // fixture's twin rules (trim+shift at +3, PNG re-mux at +6) PLUS
    // the MP4 re-mux class at +8 (ISO-BMFF box walk under load), so the
    // planted set is the 4-clique expansion of plantedImg. Trim twins
    // must pair at jaccard (nf-2)/(nf-1) >= 2/3, re-mux twins at 1.0;
    // tau=0.5 filters the isolated-frame coincidences the quadratic
    // frame mix still allows (never a shared 2-frame shingle, see the
    // syntheticVideoAssets scale notes).
    val grpV = scala.collection.mutable.Map[Long, List[Long]]()
    for (id <- 0L until n.toLong) if (id % 97 != 0) {
      val seedV =
        if (id % 10 == 3 && id >= 13) id - 3
        else if (id % 10 == 6 && id >= 16) id - 6
        else if (id % 10 == 8 && id >= 18) id - 8
        else id
      grpV(seedV) = id :: grpV.getOrElse(seedV, Nil)
    }
    val plantedVid = grpV.values.flatMap { ms =>
      val s = ms.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSeq
    val vidAssets = ops.Multimodal.syntheticVideoAssets(imgIds)
      .repartition(32).persist()
    vidAssets.count() // materialize encode outside the dedup timer
    t0 = System.nanoTime()
    val vidPairs = ops.Dedup.videoPairs(vidAssets).persist()
    val nVidPairs = vidPairs.count()
    val exactVid = vidPairs.where(col("jaccard") === 1.0).count()
    val foundVid = plantedVid.toDF("video_a", "video_b")
      .join(vidPairs, Seq("video_a", "video_b"), "left_semi").count()
    println(f"videoPairs($n videos): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      s"$nVidPairs pairs ($foundVid/${plantedVid.size} planted recalled, $exactVid at jaccard 1.0)")
    assert(foundVid == plantedVid.size,
      s"planted video-dup recall broke: $foundVid/${plantedVid.size}")
    assert(nVidPairs - foundVid <= n / 1000L,
      s"coincidental video-pair volume exploded: ${nVidPairs - foundVid}")
    // --- KMV distinct sketch at 10x corpus rows ---
    // 10n rows over n/2 distinct keys (heavy dups, the streaming-id
    // shape); k=1024 -> expected relative error ~1/sqrt(k) ~ 3%
    val kmvRows = spark.range(n * 10L)
      .select(pmod(col("id") * 2654435761L, lit(n.toLong / 2)).as("key"))
    t0 = System.nanoTime()
    val kmvEst = ops.Kmv.estimate(
      ops.Kmv.sketch(kmvRows.toDF(), "key", 1024), 1024).head()
    val est = kmvEst.getLong(2)
    println(f"kmvSketch(${n * 10L} rows, k=1024): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      s"est $est vs true ~${n / 2}")
    assert(math.abs(est - n / 2.0) / (n / 2.0) < 0.15,
      s"KMV estimate $est drifted >15% from ${n / 2}")
    // --- bot-regularity at 10x corpus rows ---
    // 10n events over n/100 users (~1000 events/user); users on
    // uid % 7 == 2 fire on an exact 60 s timer, the rest get bursty
    // pseudo-random gaps (hash-derived, CV ~ high). The per-user lag
    // window is the q35 sessionization shape — bounded by events/user.
    val nUsers = math.max(n / 100, 7)
    val botEvents = spark.range(n * 10L).select(
      col("id").as("event_id"),
      pmod(col("id"), lit(nUsers.toLong)).as("user_id"),
      timestamp_micros(
        when(pmod(pmod(col("id"), lit(nUsers.toLong)), lit(7)) === 2,
          lit(1700000000000000L) +
            expr(s"id div $nUsers") * 60000000L)
          .otherwise(lit(1700000000000000L) +
            expr(s"id div $nUsers") * 60000000L +
            pmod(col("id") * 2654435761L, lit(59000000L)))).as("ts"))
    t0 = System.nanoTime()
    val reg = ops.Analytics.timingRegularity(botEvents).persist()
    val nBots = reg.where(col("bot_like")).count()
    val nUsersSeen = reg.count()
    println(f"timingRegularity(${n * 10L} events, $nUsers users): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $nBots/$nUsersSeen flagged")
    val expectBots = (0L until nUsers.toLong).count(_ % 7 == 2)
    assert(nBots == expectBots,
      s"bot flagging drifted: $nBots flagged, expected $expectBots")
    reg.unpersist(false)
    // --- SFT chat preparation at corpus size ---
    // n transcripts of 2-5 turns (the q167 synthesis over the smoke
    // corpus text); flatten + packed loss-mask spans. The packing's
    // global-offset discipline is the scale claim under test: two
    // bounded passes, no global window, fragment rows ~ spans + splits.
    t0 = System.nanoTime()
    val tkSmoke = filter(split(col("text"), "\\s+"), x => length(x) > 0)
    def roleAt(i: Int) = when(pmod(col("doc_id") + i, lit(2)) === 0, "user")
      .otherwise("assistant")
    val turns5 = array((0 until 5).map(i => struct(roleAt(i).as("role"),
      concat_ws(" ", slice(tkSmoke, i * 20 + 1, 20)).as("content"))): _*)
    val convSmoke = docs.select(col("doc_id"),
      slice(turns5, lit(1), (pmod(col("doc_id"), lit(4)) + 2).cast("int")).as("turns"))
    val flatN = ops.Chat.flatten(convSmoke).count()
    val spans = ops.Chat.packSpans(convSmoke, seqLen = 2048L).persist()
    val nFrags = spans.count()
    val nSplit = spans.groupBy(col("doc_id"), col("turn_idx"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1).count()
    println(f"chatFlatten+packSpans($n transcripts): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      s"$flatN rendered, $nFrags mask fragments ($nSplit boundary-split spans)")
    assert(flatN == docs.count(), "every transcript must render")
    assert(nSplit > 0, "fixture must exercise boundary splits")
    // fragments never leave their block and are non-empty
    assert(spans.where(col("frag_start") < 0 || col("frag_end") > 2048L ||
      col("frag_start") >= col("frag_end")).count() == 0)
    spans.unpersist(false)
    // --- thousand-phrase blocklist at corpus size (round 11) ---
    // 1000 planted single-token phrases (doc k's 60th token hits exactly
    // the docs carrying that token) + multi-word phrases; the AC
    // automaton's one-pass claim is the scale story — the unrolled
    // rlike form would be 1000 regex passes over the corpus, so it runs
    // only on a 2k-doc sample as the equality witness.
    t0 = System.nanoTime()
    val phrases = (0 until 1000).map(k =>
      s"tok${(k * 131 + 60 * 7) % 1000003}_60") ++
      Seq("tok138_1 tok145_2", "never matches anything")
    val acRep = ops.Curate.blocklistReportAC(docs, phrases).persist()
    val acHits = acRep.where(col("blocked")).count()
    println(f"blocklistAC($n docs, ${phrases.size} phrases): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $acHits docs hit")
    assert(acHits >= 900, s"planted phrases must fire: $acHits")
    val sample = docs.where(col("doc_id") < 2000)
    val acS = ops.Curate.blocklistReportAC(sample, phrases)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val unS = ops.Curate.blocklistReport(sample, phrases)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(acS == unS, "AC != unrolled on the sample")
    acRep.unpersist(false)
    // --- length-grouped batching at corpus size (round 11) ---
    // the two-pass metadata rank discipline: #batches exact, per-batch
    // pad targets nondecreasing in batch order (sorted layout), zero
    // negative padding.
    t0 = System.nanoTime()
    val lgb = ops.Curate.lengthGroupedBatches(docs, batchSize = 256).persist()
    val nb = lgb.select(col("batch_idx")).distinct().count()
    val pads = lgb.groupBy(col("batch_idx")).agg(max(col("pad_to")).as("p"))
      .orderBy(col("batch_idx")).collect().map(_.getLong(1)) // bounded: #batches
    println(f"lengthGroupedBatches($n docs, 256/batch): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $nb batches")
    assert(nb == (docs.count() + 255) / 256)
    assert(pads.zip(pads.tail).forall { case (a, b) => a <= b },
      "sorted batching must give nondecreasing pad targets")
    assert(lgb.where(col("pad_tokens") < 0).count() == 0)
    lgb.unpersist(false)
    // --- unigram tokenizer at corpus size (round 12) ---
    // sample-bounded training + one scan-side segmentation pass; the
    // invariant n_words <= n_pieces <= n_chars must hold corpus-wide
    // (every word splits into >= 1 piece of >= 1 char each)
    t0 = System.nanoTime()
    val uVocab = ops.Unigram.trainVocab(docs)
    val uSeg = ops.Unigram.segment(docs, uVocab).persist()
    val uBad = uSeg.where(col("n_pieces") < col("n_words") ||
      col("n_pieces") > col("n_chars")).count()
    val uTotals = uSeg.agg(sum("n_words"), sum("n_pieces")).head()
    println(f"unigram train+segment($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"${uTotals.getLong(0)} words -> ${uTotals.getLong(1)} pieces")
    assert(uBad == 0, s"piece-count bound violated on $uBad docs")
    uSeg.unpersist(false)
    // --- gram novelty at corpus size (round 12) ---
    // the planted near-dups (every 10th doc copies doc i-1 with one
    // token changed) must read as high-dup: all but the ~5 grams
    // overlapping the changed position are shared with the source
    t0 = System.nanoTime()
    val gn = Dedup.gramNovelty(docs, n = 5).persist()
    val nearDup = gn.where(pmod(col("doc_id"), lit(10)) === 0 &&
      col("doc_id") >= 10)
    val nearHigh = nearDup.where(col("dup_ppm") >= 900000L).count()
    val nearAll = nearDup.count()
    val zeroCnt = gn.where(col("dup_ppm") === 0L).count()
    println(f"gramNovelty($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$nearHigh/$nearAll planted near-dups >= 900k ppm, $zeroCnt fully novel")
    assert(nearHigh == nearAll, "every planted near-dup must read high-dup")
    assert(zeroCnt >= (n * 7L) / 10, "the unplanted bulk must read novel")
    gn.unpersist(false)
    // --- anneal mixture at corpus size (round 12) ---
    // both invariants corpus-wide: per-source anneal cost <= share cap,
    // global anneal cost <= budget; every row carries a phase
    t0 = System.nanoTime()
    val aBudget = 1000000L
    val aDocs = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(20)).cast("string").as("source"),
      length(col("text")).cast("long").as("n_chars"),
      (pmod(col("doc_id"), lit(3)) === 0).as("elig"))
    val am = ops.Curate.annealMix(aDocs, "doc_id", "source", "n_chars",
      "elig", annealBudget = aBudget, maxSourcePermille = 100).persist()
    val amTotal = am.count()
    val annealed = am.where(col("phase") === "anneal")
    val gSum = annealed.agg(coalesce(sum("n_chars"), lit(0L))).head().getLong(0)
    val worstSrc = annealed.groupBy("source").agg(sum("n_chars").as("s"))
      .agg(coalesce(max("s"), lit(0L))).head().getLong(0)
    println(f"annealMix($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"global $gSum/$aBudget, worst source $worstSrc/${aBudget / 10}")
    assert(amTotal == n, "phase totality")
    assert(gSum <= aBudget && worstSrc <= aBudget / 10)
    am.unpersist(false)
    // --- Bradley-Terry at 10x corpus rows (round 12) ---
    // 1M games between 64 players: ONE corpus aggregation, then 8 MM
    // rounds over the 64-row strength frame — iteration cost must be
    // corpus-independent (tiny-frame joins only)
    t0 = System.nanoTime()
    val g10 = spark.range(10L * n).select(
      pmod(col("id"), lit(64L)).as("a"),
      pmod(expr("id div 64"), lit(64L)).as("b"),
      pmod(xxhash64(col("id")), lit(128L)).as("h"))
      .where(col("a") =!= col("b"))
      .select(when(col("h") <= col("b"), col("a")).otherwise(col("b")).as("winner"),
        when(col("h") <= col("b"), col("b")).otherwise(col("a")).as("loser"))
    val bt = ops.Chat.bradleyTerry(g10, iters = 8).persist()
    val btRows = bt.count()
    val btPos = bt.where(col("strength_ppm") <= 0L).count()
    println(f"bradleyTerry(${10L * n} games, 64 players): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $btRows items")
    assert(btRows == 64L && btPos == 0L)
    bt.unpersist(false)
    // --- Luhn audit at corpus size (round 12, second leg) ---
    // corpus text carries no >=13-digit run (token digits break on _),
    // so candidates are EXACTLY the 3 injected per doc; plant 0 always
    // valid, plant 1 never, plant 2 exercises both branches
    t0 = System.nanoTime()
    val luhn = ops.Curate.luhnAudit(ops.Curate.injectCards(
      docs.select(col("doc_id"), col("text")))).persist()
    val luhnN = luhn.count()
    val v0 = luhn.where(col("cand_idx") === 0 && col("luhn_valid")).count()
    val v1 = luhn.where(col("cand_idx") === 1 && col("luhn_valid")).count()
    val v2 = luhn.where(col("cand_idx") === 2)
      .agg(sum(when(col("luhn_valid"), 1L).otherwise(0L))).head().getLong(0)
    println(f"luhnAudit($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$luhnN candidates, plant2 valid $v2")
    assert(luhnN == 3L * n && v0 == n && v1 == 0L)
    assert(v2 > 0 && v2 < n, "the varying plant must hit both branches")
    luhn.unpersist(false)
    // --- PCA projection at 100k vectors (round 12, second leg) ---
    // truncated-mean centering keeps Gram entries O(n·|m|²) — this run
    // is exactly the size the first (n-scaled) formulation wrapped at
    t0 = System.nanoTime()
    val pvecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), j =>
        ((pmod(col("id") * 31 + j * 7, lit(2001)) - 1000) / 1000.0)
          .cast("float")).as("embedding"))
      .repartition(32).persist()
    pvecs.count()
    val proj = ops.Similarity.pcaProjection(pvecs).persist()
    val projN = proj.count()
    val projSum = proj.agg(sum(col("proj").cast("decimal(38,0)")))
      .head().getDecimal(0)
    println(f"pcaProjection($n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"sum $projSum")
    assert(projN == n)
    assert(projSum.abs().longValueExact() < n.toLong * 64L * (1L << 20),
      "Σproj must sit inside the mean-truncation envelope")
    proj.unpersist(false)
    // --- distributed k-means + waterfilled coreset at 100k (round 12) ---
    t0 = System.nanoTime()
    val asg = ops.Similarity.kmeansClusters(pvecs, k = 16, rounds = 4).persist()
    val asgN = asg.count()
    val kUsed = asg.select(countDistinct(col("cluster"))).head().getLong(0)
    println(f"kmeansClusters($n vecs, k=16): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$kUsed clusters populated")
    assert(asgN == n)
    t0 = System.nanoTime()
    val coreN = ops.Similarity.clusterCoreset(pvecs, budgetPpm = 250000L,
      k = 16, rounds = 4).count()
    println(f"clusterCoreset($n vecs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$coreN picked")
    assert(coreN == n.toLong * 250000L / 1000000L,
      "coreset size must equal the exact integer budget")
    asg.unpersist(false); pvecs.unpersist(false)
    // --- Heaps fit at corpus size (round 12, second leg) ---
    t0 = System.nanoTime()
    val heaps = ops.TextAnalysis.heapsFit(
      docs.select(col("doc_id"), col("text"))).persist()
    val hRows = heaps.count()
    val hSlope = heaps.select(max(col("slope_milli"))).head().getLong(0)
    println(f"heapsFit($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"$hRows octaves, slope $hSlope")
    assert(hRows > 15, "a 12M-token stream spans >15 octaves")
    assert(hSlope > 0 && hSlope <= 1000,
      "Heaps exponent must land in (0, 1] for a growing vocabulary")
    heaps.unpersist(false)
    // --- GloVe co-occurrence at corpus size (round 13) ---
    // evidence for the explode-AFTER-center-restriction ordering: the
    // generator emits window(=3)x rows only for in-vocab centers, so its
    // output is 3·|in-vocab tokens| instead of 3·|all tokens| (the
    // pre-fix shape). On this hash-vocabulary corpus the top-256 vocab
    // covers a tiny token fraction, so the cut is the worst-case-honest
    // number, not a friendly one.
    t0 = System.nanoTime()
    val co = ops.TextAnalysis.cooccurrence(
      docs.select(col("doc_id"), col("text"))).persist()
    val coRows = co.count()
    val coSecs = (System.nanoTime() - t0) / 1e9
    val allTok = docs.select(explode(ops.TextAnalysis.tokens(col("text"))).as("token"))
    val totTok = allTok.count()
    val vocab256 = allTok.groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc).limit(256).select("token")
    val inVocab = allTok.join(broadcast(vocab256), Seq("token")).count()
    println(f"cooccurrence($n docs): $coSecs%.1f s, $coRows pairs; " +
      f"explode input $inVocab in-vocab centers vs $totTok tokens " +
      f"(pre-fix generator output 3x${totTok}, post-fix 3x${inVocab})")
    assert(coRows > 0 && coRows <= 256L * 257L / 2,
      "matrix must stay topK^2-bounded")
    co.unpersist(false)
    // --- domain opt-out governance at corpus size (round 13) ---
    // 100k URLs over 1000 hosts (h0..h999.example.com, every 3rd under a
    // sub. prefix); registry = the 100 domains h0..h99.example.com.
    // Expected drops: docs whose host index < 100 — the sub. prefix and
    // the :8443 port variants must both still match by suffix.
    t0 = System.nanoTime()
    val crawl = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("http://"),
        when(pmod(col("id"), lit(3)) === 0, lit("sub.")).otherwise(lit("")),
        lit("h"), pmod(col("id"), lit(1000)), lit(".example.com"),
        when(pmod(col("id"), lit(7)) === 0, lit(":8443")).otherwise(lit("")),
        lit("/p/"), col("id")).as("url"))
    val optReg = spark.range(100).select(
      concat(lit("h"), col("id"), lit(".example.com")).as("domain"))
    val verdict = ops.Web.domainOptOut(crawl, optReg).persist()
    val vN = verdict.count()
    val nDropped = verdict.where(!col("kept")).count()
    println(f"domainOptOut($n urls, 100-domain registry): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $nDropped dropped")
    assert(vN == n, "verdict totality: one row per doc")
    assert(nDropped == spark.range(n)
      .where(pmod(col("id"), lit(1000)) < 100).count(),
      "every host under a registry domain (any prefix/port) must drop")
    verdict.unpersist(false)
    // --- MaxSim late-interaction at 100k chunk vectors (round 13) ---
    // 25k docs x 4 chunks; 8 probes, 2 tokens each = scaled copies of
    // chunks (4q, 4q+2) -> the source doc must come back at rank 1 with
    // the exact integer score 2000. Components are xxhash64-derived
    // (the winnow-fixture lesson: the arithmetic pvecs formula is
    // periodic mod 2001, so ~50 docs carry IDENTICAL chunks and tie).
    t0 = System.nanoTime()
    def hvec(id: C): C = transform(sequence(lit(1), lit(64)), j =>
      ((pmod(xxhash64(id * 64 + j, lit(9173)), lit(2001)) - 1000) / 1000.0)
        .cast("float"))
    val chunks2 = spark.range(n).select(expr("id div 4").as("doc_id"),
      hvec(col("id")).as("embedding"))
    val probeIds = (0L until 8L).flatMap(q => Seq(q * 4000, q * 4000 + 2))
    val qvecs = spark.range(n).where(col("id").isin(probeIds: _*))
      .select(expr("id div 4").as("qid"), (col("id") % 4).as("qtok"),
        transform(hvec(col("id")), x => x * lit(2.0f)).as("embedding"))
    val ms = ops.Retrieval.maxSim(chunks2, qvecs, k = 5, minCosMilli = 600L)
      .persist()
    val top1 = ms.where(col("rank") === 1)
      .select(col("qid"), col("doc_id"), col("maxsim_milli")).collect()
    println(f"maxSim($n chunks, 8x2-token probes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, ${ms.count()} ranked rows")
    assert(top1.length == 8)
    assert(top1.forall(r => r.getLong(1) == r.getLong(0) &&
      r.getLong(2) == 2000L),
      s"planted source doc must win with exact 2000: ${top1.mkString(",")}")
    ms.unpersist(false)
    // --- round-13 eval/curation audits at corpus size ---
    // readability: scan-side regexp counts over the wdocs text corpus
    t0 = System.nanoTime()
    val fre = ops.Quality.readability(wdocs)
    val freBands = fre.groupBy(col("fre_band")).count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    println(f"readability($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"bands=$freBands")
    assert(freBands.values.sum == n, "one verdict per doc")
    // distinct-n diversity: n/4 prompts x 4 candidates over wdocs text;
    // every candidate is hash-unique, so distinct-1 == total_1 for every
    // prompt (d1_ppm exactly 1e6) — the all-diverse upper bound
    t0 = System.nanoTime()
    val dn = ops.Chat.distinctNgrams(wdocs.select(
      expr("doc_id div 4").as("prompt_id"), col("doc_id").as("cand_id"),
      col("text")))
    val dnBad = dn.where(col("d1_ppm") < 990000L).count()
    println(f"distinctNgrams($n cands, ${n / 4} prompts): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, ${dn.count()} prompts, " +
      f"$dnBad below 0.99")
    // rocAuc: n scored rows, scores hash-spread over the ppm alphabet,
    // labels planted by threshold -> AUC must land at the analytic value
    // for "label = score > 500k with 10% flips": wins dominated by the
    // clean mass; assert the exact symmetric-construction bound instead
    // of an approximation: every label here IS score>500000, so AUC = 1.
    t0 = System.nanoTime()
    val aucRows = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(4099)), lit(1000001L)).as("score_ppm"),
      (pmod(xxhash64(col("id"), lit(4099)), lit(1000001L)) > 500000L)
        .as("label"))
    val auc = ops.QualityModel.rocAuc(aucRows).head()
    println(f"rocAuc($n rows): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"auc_ppm=${auc.getLong(5)}, pos=${auc.getLong(0)}")
    assert(auc.getLong(5) == 1000000L,
      "threshold-consistent labels must read AUC exactly 1")
    // majorityVote: n samples over n/8 problems; even hashes vote gold
    // (>= half the votes in expectation), so corpus accuracy stays high
    t0 = System.nanoTime()
    val mv = ops.Chat.majorityVote(spark.range(n).select(
      expr("id div 8").as("problem_id"),
      when(pmod(xxhash64(col("id"), lit(7717)), lit(2)) === 0,
        concat(lit("a"), pmod(expr("id div 8"), lit(4)).cast("string")))
        .otherwise(concat(lit("a"), pmod(xxhash64(col("id"), lit(7717)),
          lit(5)).cast("string"))).as("answer"),
      concat(lit("a"), pmod(expr("id div 8"), lit(4)).cast("string"))
        .as("gold")))
    val mvAcc = mv.head().getLong(7)
    println(f"majorityVote($n samples, ${n / 8} problems): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, acc_ppm=$mvAcc")
    assert(mvAcc > 900000L, "gold majority must dominate")
    // lengthBias: n validated pairs, deltas hash-spread over both signs
    t0 = System.nanoTime()
    val lb = ops.Chat.lengthBias(spark.range(n).select(col("id").as("pair_id"),
      (lit(1000L) + pmod(xxhash64(col("id"), lit(31)), lit(512L)))
        .as("chosen_chars"),
      (lit(1000L) + pmod(xxhash64(col("id"), lit(37)), lit(512L)))
        .as("rejected_chars"), lit(true).as("ok")))
    val lbRows = lb.collect()
    println(f"lengthBias($n pairs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"${lbRows.length} bands, global=${lbRows.head.getLong(5)}")
    assert(lbRows.length <= 11, "bands bounded by the delta bit width")
    // --- link graph at corpus scale: extraction rides the page scan
    // (bodies never shuffle), the host rollup is ONE map-side-combined
    // exchange, and PageRank iterates over a host census ~1000x smaller
    // than the page count. Every page carries three links: the hub
    // (h0 — must rank first), a formula-spread cross-host link, and an
    // internal ../-relative link (resolution exercised at volume).
    val nLgHosts = math.max(n / 1000, 16)
    t0 = System.nanoTime()
    val pages = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("https://h"), pmod(col("id"), lit(nLgHosts)).cast("string"),
        lit(".example.com/p/"), col("id").cast("string")).as("url"),
      concat(
        lit("<html><body><a href=\"https://h0.example.com/\">hub</a>"),
        lit("<a href=\"//h"), pmod(col("id") * 7 + 1, lit(nLgHosts)).cast("string"),
        lit(".example.com/p/"), pmod(col("id") * 13 + 5, lit(n)).cast("string"),
        lit("?utm_source=x&a=1\">x</a>"),
        lit("<a href='../p/"), pmod(col("id") + 1, lit(n)).cast("string"),
        lit("'>n</a></body></html>")).as("html"))
    val pageLinks = ops.LinkGraph.outlinks(pages)
    val nLinks = pageLinks.count()
    println(f"outlinks($n pages): ${(System.nanoTime()-t0)/1e9}%.1f s, $nLinks links")
    assert(nLinks == 3L * n, "every page contributes exactly 3 edges")
    t0 = System.nanoTime()
    val nHostPairs = ops.LinkGraph.hostGraph(pageLinks).count()
    println(f"hostGraph: ${(System.nanoTime()-t0)/1e9}%.1f s, $nHostPairs host pairs")
    t0 = System.nanoTime()
    val topHost = ops.LinkGraph.hostRank(pageLinks)
      .orderBy(col("rank_e6").desc, col("host")).head()
    println(f"hostRank($nLgHosts hosts): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"top=${topHost.getString(0)} rank_e6=${topHost.getLong(1)}")
    assert(topHost.getString(0) == "h0.example.com",
      "the universally-linked hub must rank first")
    // --- graph ANN at corpus size (round 15): NN-descent build + beam
    // search. planes sizes to the corpus (bucket ~ n / 2^planes; the
    // candidate volume is n * bucket * tables, so planes ~ log2(n)-4
    // keeps it ~16n scored pairs at ANY n — the 100 TB sizing rule).
    // degree 4 bounds the NN-descent round at n * (2*degree)^2 = 64n
    // candidate pairs. 16 planted twins (2v at id+n) + probes (4v at
    // id+2n) certify BOTH search legs at scale: entry pinned to the
    // twin forces a real hop across the provably-present twin edge;
    // LSH routing must find the source among bucket-mates.
    t0 = System.nanoTime()
    def gvec(id: C): C = transform(sequence(lit(1), lit(32)), j =>
      ((pmod(xxhash64(id * 32 + j, lit(5581)), lit(2001)) - 1000) / 1000.0)
        .cast("float"))
    val gplanes = math.max(6, (math.log(n.toDouble) / math.log(2)).ceil.toInt - 4)
    val gSrcIds = (0 until 16).map(i => i.toLong * (n / 16)).toArray
    val gBase = spark.range(n).select(col("id").as("vec_id"),
      gvec(col("id")).as("embedding"))
    val gTwins = spark.range(n).where(col("id").isin(gSrcIds: _*))
      .select((col("id") + n).as("vec_id"),
        transform(gvec(col("id")), x => x * lit(2.0f)).as("embedding"))
    val gCorpus = gBase.unionByName(gTwins).persist()
    val gEdges = ops.GraphAnn.knnGraph(gCorpus, degree = 4, planes = gplanes,
      maxBucket = 1024, refineRounds = 1).persist()
    val nEdges = gEdges.count()
    println(f"knnGraph($n vecs, planes=$gplanes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $nEdges edges")
    assert(nEdges <= 4L * (n + 16), "degree cap violated")
    val gProbes = spark.range(n).where(col("id").isin(gSrcIds: _*))
      .select((col("id") + 2L * n).as("vec_id"),
        transform(gvec(col("id")), x => x * lit(4.0f)).as("embedding"))
    t0 = System.nanoTime()
    val gEntries = gProbes.select(col("vec_id").as("qid"),
      (col("vec_id") - n).as("nid"))
    val hopTop1 = ops.GraphAnn.beamSearch(gProbes, gCorpus, gEdges,
        Some(gEntries), k = 3, beam = 16, hops = 2)
      .where(col("rank") === 1)
      .select(col("qid"), col("nid")).collect()
    println(f"beamSearch pinned-entry (16 probes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s")
    assert(hopTop1.length == 16 &&
      hopTop1.forall(r => r.getLong(1) == r.getLong(0) - 2L * n),
      s"hop certificate failed at scale: ${hopTop1.mkString(",")}")
    t0 = System.nanoTime()
    val routedTop1 = ops.GraphAnn.beamSearch(gProbes, gCorpus, gEdges,
        None, k = 3, beam = 16, hops = 2, planes = gplanes)
      .where(col("rank") === 1)
      .select(col("qid"), col("nid")).collect()
    println(f"beamSearch LSH-routed (16 probes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s")
    assert(routedTop1.length == 16 &&
      routedTop1.forall(r => r.getLong(1) == r.getLong(0) - 2L * n),
      s"routed certificate failed at scale: ${routedTop1.mkString(",")}")
    // near-dup resolve over the SAME graph: tau-thresholded edges ->
    // components -> exactly the 16 planted twins drop (random dim-32
    // hash vectors concentrate at |cos| ~ 0.18/sqrt(1), so a false
    // 0.99-pair among ~16n scored candidates is ~impossible)
    t0 = System.nanoTime()
    val gDropped = ops.Curate.dupClusters(
        gEdges.where(col("sim") >= 0.99)
          .select(col("src").as("doc_a"), col("dst").as("doc_b")))
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
    println(f"graph nearDup resolve($n+16 vecs): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, ${gDropped.size} dropped")
    assert(gDropped == gSrcIds.map(_ + n).toSet,
      s"exactly the planted twins must drop: ${gDropped.take(5)}...")
    // persisted-index leg (round 16): build -> REPLAYED append ->
    // compact. Compaction must be search-invariant while restoring the
    // degree bound and folding replay duplicates — the LSM contract
    // exercised at corpus size, not just spec size. The ingest batch
    // (8v at id+3n) ties cos 1.0 with source and twin, so each probe's
    // deterministic top-3 is (v, 2v at id+n, 8v at id+3n) — the
    // appended node MUST appear, proving the append indexed it.
    t0 = System.nanoTime()
    val gPath = java.nio.file.Files
      .createTempDirectory("graft-smoke-gann").toString
    ops.GraphAnn.buildGraphIndex(gCorpus, gPath, degree = 4,
      planes = gplanes, maxBucket = 1024, refineRounds = 0)
    println(f"buildGraphIndex($n+16 vecs): ${(System.nanoTime()-t0)/1e9}%.1f s")
    val gBatch = spark.range(n).where(col("id").isin(gSrcIds: _*))
      .select((col("id") + 3L * n).as("vec_id"),
        transform(gvec(col("id")), x => x * lit(8.0f)).as("embedding"))
    t0 = System.nanoTime()
    ops.GraphAnn.appendToGraphIndex(spark, gPath, gBatch)
    ops.GraphAnn.appendToGraphIndex(spark, gPath, gBatch) // crash replay
    println(f"appendToGraphIndex x2 (16 vecs): ${(System.nanoTime()-t0)/1e9}%.1f s")
    def idxSearch(): Set[(Long, Long, Int)] =
      ops.GraphAnn.searchGraphIndex(spark, gPath, gProbes,
          k = 3, beam = 16, hops = 2)
        .select(col("qid"), col("nid"), col("rank"))
        .as[(Long, Long, Int)].collect().toSet
    t0 = System.nanoTime()
    val preCompact = idxSearch()
    println(f"searchGraphIndex pre-compact (16 probes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s")
    assert(preCompact.count(_._3 == 1) == 16 &&
      preCompact.filter(_._3 == 1).forall(r => r._2 == r._1 - 2L * n) &&
      preCompact.filter(_._3 == 3).forall(r => r._2 == r._1 + n),
      s"index certificate failed at scale: ${preCompact.take(5)}...")
    t0 = System.nanoTime()
    ops.GraphAnn.compactGraphIndex(spark, gPath)
    println(f"compactGraphIndex: ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val postCompact = idxSearch()
    println(f"searchGraphIndex post-compact (16 probes): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s")
    assert(postCompact == preCompact,
      "compaction changed search results at corpus size")
    val maxDeg = spark.read.parquet(s"${ops.GraphAnn.indexRoot(spark, gPath)}/edges")
      .groupBy(col("src")).count().agg(max(col("count"))).as[Long].head()
    assert(maxDeg <= 4, s"degree bound after compact: $maxDeg")
    gEdges.unpersist(false); gCorpus.unpersist(false)
    spark.stop()
  }
}
