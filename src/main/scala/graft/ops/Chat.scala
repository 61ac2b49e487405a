package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT) data preparation — the supervised-fine-tuning leg
  * of the training-data pipeline: multi-turn (role, content) transcripts
  * rendered to a fixed chat template, per-turn LOSS-MASK character
  * spans, and structural validation. The pretraining surface
  * (dedup/quality/mixture) treats a document as one string; SFT data is
  * structured, and the three operations every SFT pipeline runs before
  * tokenization are exactly these: flatten to template text, know which
  * character ranges are assistant-authored (only those take loss), and
  * quarantine transcripts whose structure is broken (role gaps, empty
  * turns, truncated endings).
  *
  * Template (ChatML-shaped, fixed):
  *   piece(role, content) = "<|" + role + "|>\n" + content + "\n<|end|>\n"
  * rendered = concat of pieces in turn order. All span arithmetic is
  * integer length bookkeeping — piece_start via a per-doc cumsum window
  * over turn lengths, content_start = piece_start + len(role) + 5
  * (`<|`+`|>`+`\n`), content_end exclusive — so a SQL engine replays
  * every offset exactly (the q109/q152 window-cumsum discipline;
  * lengths are in CHARACTERS, both engines' `length` on the same
  * strings).
  *
  * Shape at scale: one posexplode (rows = total turns, each carrying
  * one turn's text, never the whole transcript), one per-doc window
  * over turn counts (bounded per doc — the q35 argument), one ordered
  * per-doc concat for the rendered text (window collect_list, no
  * interpreted higher-order functions). No corpus-sized shuffle beyond
  * the per-doc window.
  */
object Chat {

  private def piece(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>\n"), content, lit("\n<|end|>\n"))

  /** Per-turn rows with template offsets: (doc_id, turn_idx, role,
    * content_start, content_end) — content_end exclusive; the
    * assistant-role rows ARE the loss mask. Turns with NULL role or
    * content are dropped (they cannot be rendered; [[validate]] reports
    * them). `turnsCol` is array<struct<role: string, content: string>>. */
  def maskSpans(conv: DataFrame, idCol: String = "doc_id",
                turnsCol: String = "turns"): DataFrame = {
    val t = conv.select(col(idCol),
        posexplode(col(turnsCol)).as(Seq("turn_idx", "t")))
      .select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
      .where(col("role").isNotNull && col("content").isNotNull)
      .withColumn("_plen", length(piece(col("role"), col("content"))).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("_pstart", coalesce(sum(col("_plen")).over(w), lit(0L)))
      .withColumn("content_start",
        col("_pstart") + length(col("role")).cast("long") + 5L)
      .withColumn("content_end",
        col("content_start") + length(col("content")).cast("long"))
      .select(col(idCol), col("turn_idx"), col("role"),
        col("content_start"), col("content_end"))
  }

  /** One row per transcript: turn count, assistant-turn count, rendered
    * template text, its length, and the assistant-character total (the
    * loss-bearing fraction's numerator — SFT mixes are budgeted on
    * ASSISTANT tokens, not document tokens). Transcripts whose every
    * turn was droppable are absent (nothing to render — [[validate]]
    * reports them). */
  def flatten(conv: DataFrame, idCol: String = "doc_id",
              turnsCol: String = "turns"): DataFrame = {
    val t = conv.select(col(idCol),
        posexplode(col(turnsCol)).as(Seq("turn_idx", "t")))
      .select(col(idCol), col("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
      .where(col("role").isNotNull && col("content").isNotNull)
      .withColumn("_piece", piece(col("role"), col("content")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rn = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
    t.withColumn("rendered", array_join(collect_list(col("_piece")).over(w), ""))
      .withColumn("n_turns", count(lit(1)).over(w))
      .withColumn("n_assistant",
        count(when(col("role") === "assistant", 1)).over(w))
      .withColumn("assistant_chars", coalesce(sum(
        when(col("role") === "assistant", length(col("content")).cast("long")))
        .over(w), lit(0L)))
      .withColumn("_rn", row_number().over(rn))
      .where(col("_rn") === 1)
      .select(col(idCol), col("n_turns"), col("n_assistant"),
        length(col("rendered")).cast("long").as("rendered_len"),
        col("assistant_chars"), col("rendered"))
  }

  /** Structural validation — the quarantine report: per transcript,
    * booleans for the four SFT-data contracts (openers may be system or
    * user; roles must alternate after an optional leading system turn;
    * no empty/NULL turn; the last turn is the assistant's — a
    * transcript cut mid-user-turn trains the model to stop asking).
    * `ok` is their conjunction; empty transcripts fail all. */
  def validate(conv: DataFrame, idCol: String = "doc_id",
               turnsCol: String = "turns"): DataFrame = {
    val t = conv.select(col(idCol),
        posexplode(col(turnsCol)).as(Seq("turn_idx", "t")))
      .select(col(idCol), col("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
    val wAll = Window.partitionBy(col(idCol))
      .orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rn = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
    val flagged = t
      .withColumn("_prev_role", lag(col("role"), 1).over(w))
      .withColumn("_opener_ok",
        col("turn_idx") > 0 ||
          col("role").isin("system", "user"))
      // alternation: consecutive equal roles are the violation; a
      // leading system turn followed by user is fine, but system
      // anywhere else is not
      .withColumn("_alt_ok",
        col("_prev_role").isNull ||
          (col("role") =!= col("_prev_role") && col("role") =!= "system"))
      .withColumn("_turn_ok",
        col("role").isNotNull && col("content").isNotNull &&
          length(col("content")) > 0)
    flagged
      .withColumn("opener_ok", min(when(col("_opener_ok"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("alternation_ok", min(when(col("_alt_ok"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("turns_ok", min(when(col("_turn_ok"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("_last_role", last(col("role")).over(wAll))
      .withColumn("ends_assistant", col("_last_role") === "assistant")
      .withColumn("_rn", row_number().over(rn))
      .where(col("_rn") === 1)
      .select(col(idCol), col("opener_ok"), col("alternation_ok"),
        col("turns_ok"), col("ends_assistant"),
        (col("opener_ok") && col("alternation_ok") && col("turns_ok") &&
          col("ends_assistant")).as("ok"))
  }
}
