package graft

import org.apache.spark.sql.functions._
import graft.ops.Curate

/** Luhn payment-card audit (q204): hand-computed checksum verdicts,
  * the pattern's 13–19-digit window, separator stripping, masking, and the
  * injectCards contract. */
class LuhnSpec extends SparkTestBase {
  import spark.implicits._

  private def audit(texts: (Long, String)*) =
    Curate.luhnAudit(texts.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getBoolean(4))).toMap

  test("known-valid and known-invalid numbers, spaced and bare") {
    val got = audit(
      1L -> "pay with 4111 1111 1111 1111 today",
      2L -> "ref 4111111111111112 rejected",
      3L -> "thirteen 4222222222222 ok")
    // classic Visa test number: valid; last-digit bump: invalid
    assert(got((1L, 0L)) == (16L, "************1111", true))
    assert(got((2L, 0L)) == (16L, "************1112", false))
    // 13-digit boundary case, Luhn sum 40 -> valid
    assert(got((3L, 0L)) == (13L, "*********2222", true))
    assert(got.size == 3, "exactly one candidate per doc")
  }

  test("pattern window: <13 digits never a candidate, 20-digit run truncates to 19") {
    val got = audit(
      1L -> "zip 12345 and 123456789012 end",      // 5 and 12 digits
      2L -> "long 12345678901234567890 run")        // 20 digits
    assert(!got.keySet.exists(_._1 == 1L), "short runs must not surface")
    // greedy {12,18} caps the match at 19 digits; the orphan 20th digit
    // cannot form a second candidate
    // candidate = digits 1..19 = "1234567890123456789"; last 4 = "6789"
    val (n, masked, _) = got((2L, 0L))
    assert(n == 19L && masked == "***************6789")
    assert(got.size == 1)
  }

  test("mixed dash/space separators strip before the checksum") {
    val got = audit(1L -> "card 4111-1111 1111-1111 thanks")
    assert(got((1L, 0L)) == (16L, "************1111", true))
  }

  test("no digits -> doc emits nothing (no-evidence drop rule)") {
    assert(audit(1L -> "no numbers here", 2L -> "").isEmpty)
  }

  test("injectCards: valid plant, invalid plant, doc-varying third run, ZIP rejected") {
    val docs = Seq((7L, "alpha beta"), (42L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    val rows = Curate.luhnAudit(Curate.injectCards(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(4))).toMap
    for (id <- Seq(7L, 42L)) {
      assert(rows((id, 0L)) == (16L, true), "plant 0 is the valid Visa")
      assert(rows((id, 1L)) == (16L, false), "plant 1 is the bumped twin")
      assert(rows((id, 2L))._1 == 18L, "plant 2 is the 18-digit dashed run")
    }
    // 3 candidates per doc: the 5-digit ZIP must not appear
    assert(rows.size == 6)
  }

  test("doc-varying run: both verdict branches occur across ids") {
    val docs = (0L until 20L).map(i => (i, "x")).toDF("doc_id", "text")
    val verdicts = Curate.luhnAudit(Curate.injectCards(docs))
      .where(col("cand_idx") === 2).select("luhn_valid")
      .collect().map(_.getBoolean(0)).toSeq
    assert(verdicts.contains(true) && verdicts.contains(false),
      "the 18-digit plant must exercise both checksum branches")
  }
}
