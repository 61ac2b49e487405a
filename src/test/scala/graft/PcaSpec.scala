package graft

import graft.ops.Similarity

/** PCA power-iteration projection (q206): exact hand-solvable rank-1
  * data, the Σproj = 0 centering invariant, and order invariance. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  // rank-1 data: row_i = t_i · u with u = (0.5, 0.25, -0.25, 0) — every
  // element an exact binary fraction, so milli-quantization is exact:
  // m_i = t_i · uq, uq = (500, 250, -250, 0). When Σt divides n, the
  // truncated mean is EXACT (μ = mean(t)·uq), the Gram is α·uq·uqᵀ, the
  // iteration locks onto uq after one round (uq·v0 > 0), and the
  // infinity-norm step divides exactly: v = (2^20, 2^19, -2^19, 0).
  // proj_i = (t_i − mean(t)) · (uq·v), uq·v = 500·2^20 + 2·250·2^19
  //        = 786432000.
  private def rank1(ts: Seq[Long]) =
    ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(0.5f * t, 0.25f * t, -0.25f * t, 0.0f))
    }.toDF("vec_id", "embedding")

  test("rank-1 corpus: exact projections from the closed form") {
    val ts = Seq(1L, 2L, 3L, 10L) // n=4, Σt=16, mean 4 -> t−4 = -3,-2,-1,6
    val got = Similarity.pcaProjection(rank1(ts)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = 786432000L
    assert(got == Map(0L -> -3L * k, 1L -> -2L * k,
      2L -> -1L * k, 3L -> 6L * k))
  }

  test("projections center to within the truncation envelope") {
    // Σ_i c_ij = S_j − n·μ_j, |·| < n by mean truncation, so
    // |Σ proj| < n · Σ_j |v_j| ≤ n·d·2^20
    val docs = Seq(
      (1L, Array(0.125f, -0.75f, 0.5f, 1.0f)),
      (2L, Array(-0.25f, 0.375f, 0.0f, -0.5f)),
      (3L, Array(1.0f, 0.0f, -1.0f, 0.25f)),
      (4L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (5L, Array(-0.125f, 0.875f, 0.25f, -1.0f))
    ).toDF("vec_id", "embedding")
    val projs = Similarity.pcaProjection(docs).collect().map(_.getLong(1))
    assert(math.abs(projs.sum) < 5L * 4L * (1L << 20),
      s"Σproj = ${projs.sum} outside the truncation envelope")
    assert(projs.exists(_ != 0L), "non-degenerate data must project")
  }

  test("row order and partitioning do not change the component") {
    val ts = Seq(5L, -3L, 8L, 1L, 2L, 2L, -7L)
    val a = Similarity.pcaProjection(rank1(ts)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.pcaProjection(rank1(ts.reverse).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same t multiset, ids reversed: projection depends only on t_i
    val n = ts.length
    val byT = ts.zipWithIndex.map { case (t, i) => a(i.toLong) -> t }.toMap
    val byTRev = ts.reverse.zipWithIndex.map { case (t, i) => b(i.toLong) -> t }.toMap
    assert(byT == byTRev, "projection must be a function of the row alone")
  }

  test("anisotropy: rank-1 data carries ALL variance on the component") {
    // v is exactly proportional to uq, so the Rayleigh quotient equals
    // λ_max and trace = λ_max (rank 1): the division is exact 10⁶
    val rep = Similarity.pcaAnisotropy(rank1(Seq(1L, 2L, 3L, 10L)))
      .collect().head
    assert(rep.getLong(0) == 4L && rep.getLong(1) == 4L)
    assert(rep.getLong(3) == 1000000L,
      s"rank-1 anisotropy must be exactly 1e6, got ${rep.getLong(3)}")
  }

  test("anisotropy: spread data reads strictly below 1e6") {
    // NOT the 4-way symmetric identity fixture: there every centered
    // row sums to 0, so G's row sums vanish and the all-ones start is
    // EXACTLY the w = 0 fixed point (v stays v0, Rayleigh 0) — a
    // correct, documented degeneracy, not a bug. Mixed directions:
    val docs = Seq(
      (1L, Array(1.0f, 0.2f, 0.0f, 0.0f)),
      (2L, Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.3f)),
      (4L, Array(0.2f, 0.0f, 0.4f, 1.0f)),
      (5L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val ppm = Similarity.pcaAnisotropy(docs).collect().head.getLong(3)
    assert(ppm > 0L && ppm < 1000000L, s"spread data read $ppm")
  }

  test("empty corpus is rejected loudly") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pcaProjection(empty)
    }
  }
}
