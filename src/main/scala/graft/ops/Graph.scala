package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the dup-cluster connected components
  * (Curate.dupClusters): fixed-iteration PageRank in INTEGER-EXACT
  * arithmetic, the influence ranking a link/citation/interaction graph
  * gets before sampling "important" documents.
  *
  * Determinism is the point of the formulation: classic PageRank iterates
  * doubles, whose sums depend on reduction order — useless for a
  * cross-engine hash gate. Here ranks live as integers scaled by 1e6
  * ("micro-rank"); each iteration floors the per-edge contribution
  * (rank / out-degree, integer division) and the damping mix, so every
  * engine computes bit-identical ranks (q102 runs the same unrolled
  * iterations in DuckDB). The floor drops at most out_degree micro-units
  * per node per round — quantization noise of ~1e-6, irrelevant to
  * ranking, in exchange for exactness.
  *
  * Scale shape per iteration: one equi-join of ranks onto edges (edges
  * shuffle ONCE up front by src and stay partitioned; ranks are the
  * moving side) + one groupBy(dst) aggregation with map-side combine.
  * Dangling mass: nodes without out-edges leak their rank — the classic
  * simplification (GraphX's default does the same); the damping constant
  * keeps totals bounded. `iters` is fixed (3-5 captures ordering on real
  * graphs); convergence-driven stopping would re-introduce
  * floating-point epsilons. */
object Graph {

  /** @param edges (src, dst) directed edge list; parallel edges count.
    * @return (node, rank_e6) — micro-rank, Σ initial mass = n * 1e6. */
  def pageRankFixed(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    // Loop-invariant frames materialize ONCE (eager localCheckpoint, the
    // GraphX edge-caching discipline): without this every iteration
    // re-scans the raw edge source for the join, the degree table, and
    // the node set — 4-5 source scans per round at 100 TB.
    val e = edges.select(col("src"), col("dst")).transform(graft.plans.CheckpointAudit.local)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .transform(graft.plans.CheckpointAudit.local)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .transform(graft.plans.CheckpointAudit.local)
    // base (damping) term: floor(0.15 * 1e6) per node
    val base = 150000L
    var rank = nodes.withColumn("rank_e6", lit(1000000L))
    for (_ <- 1 to iters) {
      // integral DIV, not `/`: double division rounds to nearest and can
      // cross an integer boundary, silently diverging from an engine
      // doing exact integer floor division
      val contrib = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank_e6 DIV deg").as("c"))
      val in = contrib.groupBy(col("node")).agg(sum(col("c")).as("in_c"))
      rank = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(85 * coalesce(in_c, 0L)) DIV 100")).as("rank_e6"))
    }
    rank
  }
}
