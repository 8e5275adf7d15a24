package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INTEGER-exact damped PageRank over a directed edge list — the
  * iterative graph-analytics member of the engine (connected components
  * lives in `dedup/Dedup.connectedComponents`). Exactness makes the
  * ranks portable: with rank_0 = scale and
  *
  * {{{ rank_{k+1}(v) = (scale*15) div 100
  *                     + sum over (u,v) in E of (rank_k(u)*85) div (100*deg(u)) }}}
  *
  * every value is a 64-bit integer, every `div` is truncated division of
  * POSITIVE operands (== floor, so DuckDB's `//` replays it bit-for-bit),
  * and the per-node sum is associative — the result is independent of
  * partitioning, shuffle order, and engine. This is the standard damped
  * (0.85) PageRank up to integer flooring, the sink-dropping variant:
  * mass flowing into a node with no out-edges leaves the system (a
  * symmetric/undirected edge list — each edge in both directions — has
  * no sinks, so callers wanting conservation symmetrize).
  *
  * Scale shape (100 TB): the edge list is local-checkpointed ONCE (a
  * leaf plan — the caller's edge-building lineage never replays) and is
  * the only O(edges) table; each iteration re-clusters those edge
  * blocks into the rank join (the standard per-superstep Pregel cost —
  * see the note inside `run`) and shuffles O(edges) partial
  * contributions DOWN to O(nodes) via map-side combine. Lineage stays
  * shallow (one join + one agg per iteration), so a fixed small
  * iteration count needs no per-round checkpoint; checkpoint blocks are
  * reclaimed by the context cleaner when the returned frame is
  * collected and dropped.
  *
  * Reference analog: none (the reference has no graph layer) — this
  * generalizes the transitive-closure clustering the dedup layer
  * already needs to weighted influence scoring over the same pair
  * lists.
  */
object PageRank {

  /** `edges` must have `src`/`dst` long columns (duplicates allowed but
    * each distinct parallel edge counts separately in both deg and
    * contribution — pre-`distinct` for simple-graph semantics). Returns
    * (node, rank) for every node that appears as a SOURCE (pure sinks
    * hold no outflow and are dropped; absent on symmetric inputs).
    */
  def run(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(scale >= 100L, s"scale must be >= 100: $scale")
    val base = scale * 15L / 100L
    // NOTE a lazy localCheckpoint surfaces as UnknownPartitioning, so
    // each iteration's join re-clusters the edge blocks on src — the
    // standard per-superstep Pregel cost (GraphX pays the same); what
    // the checkpoint buys is that the caller's edge-BUILD lineage
    // (scans, joins, distinct) runs exactly once. For a long-lived
    // 100 TB graph the edge list would live as a src-bucketed TABLE,
    // which removes the per-iteration edge exchange entirely.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    var ranks = deg.select(col("node"), col("deg"),
      lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(rank * 85) div (100 * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      // left join: a source node may receive nothing this round (its
      // in-neighbors can be sinks only on asymmetric inputs) — it still
      // keeps the damping base
      ranks = deg.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + coalesce(col("m"), lit(0L))).as("rank"))
    }
    ranks.select("node", "rank")
  }
}
