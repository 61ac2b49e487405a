package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level boilerplate classification — the jusText shape
  * (Pomikalek '11): split a page into blocks, classify each block
  * context-free from link density / stopword density / length, then
  * re-classify the ambiguous blocks from their nearest unambiguous
  * neighbors. Navigation bars, footers, and link lists die; prose
  * survives — the extraction step every web-corpus pipeline runs before
  * any text filter can work (C4/Gopher quality rules assume prose, and
  * boilerplate is exactly what they cannot see: a nav bar repeated on
  * every page of a site is high-frequency, short, link-dense — a
  * per-DOCUMENT quality score never isolates it).
  *
  * Deliberate deviations from the paper, for engine-exactness (every
  * rule is integer / string arithmetic two engines replay bit-for-bit —
  * the q137 oracle):
  *   - link density is over TOKENS (a link token starts with `@lnk` or
  *     `https?://`), not anchor-tag characters — HTML tag handling is
  *     [[Web.stripHtml]]'s job upstream; this operator classifies
  *     already-textified blocks,
  *   - densities compare by integer cross-multiplication (no floats),
  *   - the context pass is ONE deterministic sweep (the paper iterates):
  *     near-good promotes to good if EITHER nearest unambiguous neighbor
  *     is good; short promotes only if BOTH are (edges count as bad).
  *
  * Scale shape: the corpus is scanned once; blocks explode to tokens and
  * aggregate straight back to per-block counting rows (map-side combine;
  * only ~40-byte stat rows shuffle, never block text), and the context
  * pass windows over per-block stats within each doc. Block text itself
  * never leaves the scan stage except in [[mainContent]], whose
  * reassembly join is the same shape as Curate.dedupLines. No
  * higher-order-function lambdas — stopword membership is a codegen'd
  * IN list, the LambdaCostAudit discipline.
  */
object Boilerplate {

  /** The q50 stopword list — one list on purpose, shared with the
    * curation rules so density thresholds mean the same thing here. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  private val LinkToken: Column => Column = t =>
    t.startsWith("@lnk") || t.rlike("^https?://")

  /** Per-block classification report: (doc_id, bidx, n_chars, n_tokens,
    * n_links, n_stops, cls, final_cls). `cls` is the context-free class
    * (good / near_good / short / bad); `final_cls` collapses to
    * good / bad after the neighbor sweep. */
  def classifyBlocks(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     blockSep: String = "\n\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(blockSep)
    val blocks = docs.select(col(idCol),
      posexplode(split(col(textCol), sepRe)).as(Seq("bidx", "_blk")))
    val stats = blocks.select(col(idCol), col("bidx"),
        explode(split(col("_blk"), "\\s+")).as("_tok"))
      .where(length(col("_tok")) > 0)
      .select(col(idCol), col("bidx"), lower(col("_tok")).as("_tok"))
      .groupBy(col(idCol), col("bidx"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(LinkToken(col("_tok")), 1L).otherwise(0L)).as("n_links"),
        sum(when(col("_tok").isin(Stopwords: _*), 1L).otherwise(0L)).as("n_stops"))
    // empty blocks (zero tokens) keep their row: left join, zero counts
    val cn = blocks
      .select(col(idCol), col("bidx"), length(col("_blk")).cast("long").as("n_chars"))
      .join(stats, Seq(idCol, "bidx"), "left")
      .select(col(idCol), col("bidx").cast("long").as("bidx"), col("n_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_links"), lit(0L)).as("n_links"),
        coalesce(col("n_stops"), lit(0L)).as("n_stops"))
    val cls = when(col("n_links") * 3 > col("n_tokens"), "bad")
      .when(col("n_chars") < 80, "short")
      .when(col("n_stops") * 10 >= col("n_tokens") * 3, "good")
      .when(col("n_stops") * 20 >= col("n_tokens") * 3, "near_good")
      .otherwise("bad")
    val anchor = when(col("cls").isin("good", "bad"), col("cls"))
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("bidx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(idCol)).orderBy(col("bidx"))
      .rowsBetween(1, Window.unboundedFollowing)
    val prevA = coalesce(last(anchor, ignoreNulls = true).over(wPrev), lit("bad"))
    val nextA = coalesce(first(anchor, ignoreNulls = true).over(wNext), lit("bad"))
    cn.withColumn("cls", cls)
      .withColumn("final_cls",
        when(col("cls") === "good", "good")
          .when(col("cls") === "bad", "bad")
          .when(col("cls") === "near_good",
            when(prevA === "good" || nextA === "good", "good").otherwise("bad"))
          .otherwise( // short
            when(prevA === "good" && nextA === "good", "good").otherwise("bad")))
  }

  /** Main-content extraction: the blocks [[classifyBlocks]] keeps,
    * reassembled in order — one (id, text) row per doc that has at least
    * one good block. The reassembly is the only place block TEXT moves:
    * the classification frame is stats-only and broadcast-joins back
    * onto the block scan. */
  def mainContent(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  blockSep: String = "\n\n"): DataFrame = {
    val keep = classifyBlocks(docs, idCol, textCol, blockSep)
      .where(col("final_cls") === "good")
      .select(col(idCol).as("_kid"), col("bidx").as("_kb"))
    val sepRe = java.util.regex.Pattern.quote(blockSep)
    docs.select(col(idCol),
        posexplode(split(col(textCol), sepRe)).as(Seq("_b", "_blk")))
      .join(keep, col(idCol) === col("_kid") && col("_b") === col("_kb"))
      .select(col(idCol), col("_b"), col("_blk"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_b"), col("_blk")))),
          s => s.getField("_blk")), blockSep).as(textCol))
  }
}
