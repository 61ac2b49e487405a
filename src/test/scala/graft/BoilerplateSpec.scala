package graft

import graft.ops.Boilerplate

/** jusText-style boilerplate classification: each context-free rule on a
  * planted block, both neighbor promotion rules (near-good OR, short
  * AND), document-edge defaults, empty blocks, and main-content
  * reassembly.
  */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // stopword-rich prose, > 80 chars, density >= 30%
  private val good1 = "the cat sat on the mat and the dog lay in the sun " +
    "and a bird is on a branch of the old tree in the garden"
  // some stopwords (>=15%, <30%), > 80 chars
  // 4 stopwords of 21 tokens (~19%): >= 15% tier, below the 30% good tier
  private val nearGood = "the quick brown fox jumps over lazy dogs while " +
    "seventeen astronauts calibrate titanium gyroscopes beneath a luminous sky in the night"
  private val nav = "@lnk home @lnk about @lnk contact menu"
  private val prose0 = "quick brown foxes jump over lazy dogs while " +
    "seventeen astronauts calibrate titanium gyroscopes during quiet nights" // ~0 stopwords

  private def classify(pages: Seq[(Long, String)]): Map[(Long, Long), (String, String)] =
    Boilerplate.classifyBlocks(pages.toDF("doc_id", "text"))
      .select("doc_id", "bidx", "cls", "final_cls")
      .as[(Long, Long, String, String)].collect()
      .map { case (d, b, c, f) => (d, b) -> (c, f) }.toMap

  test("context-free rules: link density, length, stopword tiers") {
    val m = classify(Seq((1L, Seq(nav, good1, "posted 2024", nearGood, prose0).mkString("\n\n"))))
    assert(m((1L, 0L))._1 == "bad", "link-dense nav")
    assert(m((1L, 1L))._1 == "good", "stopword-rich prose")
    assert(m((1L, 2L))._1 == "short", "under 80 chars")
    assert(m((1L, 3L))._1 == "near_good", "medium stopword density")
    assert(m((1L, 4L))._1 == "bad", "long but stopword-free")
  }

  test("near-good promotes if EITHER unambiguous neighbor is good") {
    // doc 1: near_good between good and bad -> good
    val m1 = classify(Seq((1L, Seq(good1, nearGood, nav).mkString("\n\n"))))
    assert(m1((1L, 1L)) == ("near_good", "good"))
    // doc 2: near_good between two bads -> bad
    val m2 = classify(Seq((2L, Seq(nav, nearGood, nav).mkString("\n\n"))))
    assert(m2((2L, 1L)) == ("near_good", "bad"))
    // near-good neighbors are NOT anchors: good, near_good, near_good, bad
    // -> both promote through the second (nearest ANCHORS are good/bad)
    val m3 = classify(Seq((3L, Seq(good1, nearGood, nearGood, nav).mkString("\n\n"))))
    assert(m3((3L, 1L))._2 == "good" && m3((3L, 2L))._2 == "good")
  }

  test("short promotes only if BOTH unambiguous neighbors are good; edges are bad") {
    val m1 = classify(Seq((1L, Seq(good1, "posted 17", good1).mkString("\n\n"))))
    assert(m1((1L, 1L)) == ("short", "good"))
    val m2 = classify(Seq((2L, Seq(good1, "posted 17", nav).mkString("\n\n"))))
    assert(m2((2L, 1L)) == ("short", "bad"))
    // leading short: missing left anchor counts bad
    val m3 = classify(Seq((3L, Seq("posted 17", good1).mkString("\n\n"))))
    assert(m3((3L, 0L)) == ("short", "bad"))
  }

  test("empty blocks keep a zero-count row and classify short->context rule") {
    val m = classify(Seq((1L, good1 + "\n\n\n\n" + good1)))
    assert(m.size == 3)
    assert(m((1L, 1L))._1 == "short") // 0 chars < 80
    assert(m((1L, 1L))._2 == "good")  // between two goods
  }

  test("mainContent reassembles surviving blocks in order, drops docs with none") {
    val pages = Seq(
      (1L, Seq(nav, good1, "posted 3", good1, nav).mkString("\n\n")),
      (2L, Seq(nav, prose0, nav).mkString("\n\n")))
    val out = Boilerplate.mainContent(pages.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == Seq(good1, "posted 3", good1).mkString("\n\n"))
  }
}
