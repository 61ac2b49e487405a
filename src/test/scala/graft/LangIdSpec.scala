package graft

import graft.ops.{LangId, TextAnalysis}

/** fastText-style hashed char-gram lang-id vs the marker-word heuristic
  * (q23): on a fixture whose languages differ in character distribution
  * (scripts, diacritics, n-gram texture), the trained scorer must beat
  * the heuristic — including on the language the heuristic cannot even
  * name — and the integer weight/argmax discipline must be deterministic.
  */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  // Three scripts/orthographies with genuinely different char texture;
  // the heuristic's marker lists know en/de/fr only, so sv is beyond it.
  private val fixture = Seq(
    (1L, "en", "the cat and the dog are in the house with the children"),
    (2L, "en", "this is the best of all possible worlds and we know it"),
    (3L, "en", "a king of infinite space were it not that i have bad dreams"),
    (4L, "de", "der hund und die katze sind in dem haus mit den kindern"),
    (5L, "de", "das ist die beste aller möglichen welten und wir wissen es"),
    (6L, "de", "über den wolken muss die freiheit wohl grenzenlos sein"),
    (7L, "fr", "le chien et le chat sont dans la maison avec les enfants"),
    (8L, "fr", "c'est le meilleur des mondes possibles et nous le savons"),
    (9L, "fr", "au dessus des nuages la liberté doit être sans limites"),
    (10L, "sv", "hunden och katten är i huset med barnen på kvällen"),
    (11L, "sv", "det är den bästa av alla möjliga världar och vi vet det"),
    (12L, "sv", "över molnen måste friheten vara gränslös tänker jag")
  ).toDF("doc_id", "lang", "text")

  test("trained scorer beats the marker heuristic on a 4-language fixture") {
    val ft = LangId.langIdFasttext(fixture)
      .select("doc_id", "lang", "lang_pred")
      .as[(Long, String, String)].collect()
    val ftAcc = ft.count(r => r._2 == r._3)
    // self-classification on cleanly separated scripts should be perfect
    assert(ftAcc == 12, s"fasttext-style got $ftAcc/12: ${ft.mkString(", ")}")

    val heur = TextAnalysis.langId(fixture)
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    val truth = fixture.select("doc_id", "lang").as[(Long, String)].collect().toMap
    val heurAcc = truth.count { case (id, l) => heur(id) == l }
    // the heuristic cannot name sv at all, so it loses at least those 3
    assert(heurAcc <= 9, s"heuristic unexpectedly strong: $heurAcc/12")
    assert(ftAcc > heurAcc)
  }

  test("confusion matrix diagonal dominates per language") {
    val cm = LangId.langIdFasttext(fixture)
      .groupBy("lang", "lang_pred").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Seq("en", "de", "fr", "sv").foreach { l =>
      val diag = cm.getOrElse((l, l), 0L)
      val offMax = cm.collect { case ((t, p), c) if t == l && p != l => c }
        .foldLeft(0L)(math.max)
      assert(diag > offMax, s"$l: diag $diag vs off $offMax")
    }
  }

  test("deterministic argmax: ties break to the smallest lang") {
    // two identical one-doc languages -> identical scores for both langs
    val tied = Seq((1L, "zza", "same text"), (2L, "aaz", "same text"))
      .toDF("doc_id", "lang", "text")
    val got = LangId.langIdFasttext(tied)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "aaz" && got(2L) == "aaz")
  }

  test("docs under two codepoints are dropped") {
    val d = Seq((1L, "en", "x"), (2L, "en", ""), (3L, "en", "ok then"))
      .toDF("doc_id", "lang", "text")
    val ids = LangId.langIdFasttext(d).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(3L))
  }
}
