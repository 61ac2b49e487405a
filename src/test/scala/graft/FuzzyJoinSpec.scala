package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("token join: multi-token typos matched; documented single-token limitation") {
    val clean = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "unrelated words here")).toDF("cid", "cname")
    val dirty = Seq(
      (10L, "alpha beta gamm"),   // 1 edit in last token
      (11L, "delta epsilom zeta"), // 1 edit mid token
      (12L, "totally different")   // no match
    ).toDF("did", "dname")
    val got = FuzzyJoin.join(dirty, clean, "did", "dname", "cid", "cname", maxDist = 2)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 2L)))

    // the honest limitation: single-token pair within the budget shares
    // no whole token -> word-token candidates CANNOT see it
    val c1 = Seq((1L, "jonathan")).toDF("cid", "cname")
    val d1 = Seq((10L, "jonathon")).toDF("did", "dname")
    assert(FuzzyJoin.join(d1, c1, "did", "dname", "cid", "cname", 2).isEmpty)
    // ...which is exactly what joinQgram exists for
    val qg = FuzzyJoin.joinQgram(d1, c1, "did", "dname", "cid", "cname", 2)
      .as[(Long, Long, Long)].collect().toList
    assert(qg == List((10L, 1L, 1L)))
  }

  test("low-vocabulary corpus (p_name shape): pruning cuts candidates >=5x, output identical") {
    // adversarial shape from TPC-H p_name: every name is 5 words drawn
    // from a tiny vocabulary, so nearly every pair shares >= 1 token and
    // single-token postings degenerate toward the full |L|x|R| matrix
    val vocab = Vector("almond", "antique", "azure", "beige", "bisque",
      "blanched", "blue", "blush", "brown", "burlywood", "burnished", "chartreuse")
    val rnd = new scala.util.Random(11)
    val clean = (1L to 150L).map(i =>
      (i, (1 to 5).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("cid", "cname")
    // dirty = 3rd char deleted (the q71 corruption)
    val dirty = clean.select((col("cid") + 1000L).as("did"),
      concat(substring(col("cname"), 1, 2), substring(col("cname"), 4, 10000)).as("dname"))

    // the pre-round-4 candidate set: postings equi-join + pair distinct,
    // no length band, single shared token — the degenerate baseline
    val old = {
      val lt = dirty.select(col("did"), col("dname"),
        explode(array_distinct(graft.ops.TextAnalysis.tokens(lower(col("dname"))))).as("_tok"))
      val rt = clean.select(col("cid"), col("cname"),
        explode(array_distinct(graft.ops.TextAnalysis.tokens(lower(col("cname"))))).as("_tok"))
      lt.join(rt, Seq("_tok")).select("did", "cid").distinct().count()
    }
    val tight = FuzzyJoin.candidates(dirty, clean, "did", "dname", "cid", "cname",
      maxDist = 2, minSharedTokens = 2).count()
    assert(tight * 5 <= old, s"pruning too weak: old=$old tight=$tight")

    val got = FuzzyJoin.join(dirty, clean, "did", "dname", "cid", "cname",
      maxDist = 2, minSharedTokens = 2)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    val expected = dirty.crossJoin(clean)
      .where(levenshtein(col("dname"), col("cname")) <= 2)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
    // every corrupted name found its source
    assert((1L to 150L).forall(i => got.contains((i + 1000L, i))))
  }

  test("q-gram join == naive theta join on random mutated names") {
    val rnd = new scala.util.Random(7)
    val base = (1L to 60L).map(i =>
      (i, (1 to 8).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString))
    val clean = base.toDF("cid", "cname")
    val dirty = base.map { case (i, s) =>
      val m = rnd.nextInt(3) match {
        case 0 => s.updated(rnd.nextInt(s.length), 'z') // substitute
        case 1 => s.take(3) + s.drop(4)                  // delete
        case _ => s.take(5) + "q" + s.drop(5)            // insert
      }
      (i + 1000L, m)
    }.toDF("did", "dname")
    val got = FuzzyJoin.joinQgram(dirty, clean, "did", "dname", "cid", "cname",
      maxDist = 2, q = 3)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    val expected = dirty.crossJoin(clean)
      .where(levenshtein(col("dname"), col("cname")) <= 2)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    assert(got == expected, s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
    // every planted mutation found its source
    assert((1L to 60L).forall(i => expected.contains((i + 1000L, i))))
  }

  test("q-gram join: very short names meet in the short bucket") {
    val clean = Seq((1L, "ab"), (2L, "xy")).toDF("cid", "cname")
    val dirty = Seq((10L, "ac"), (11L, "xz")).toDF("did", "dname")
    val got = FuzzyJoin.joinQgram(dirty, clean, "did", "dname", "cid", "cname",
      maxDist = 1, q = 3)
      .select("did", "cid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 2L)))
  }
}
