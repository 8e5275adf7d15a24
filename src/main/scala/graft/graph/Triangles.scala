package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}

/** Degree-oriented triangle counting — the canonical "make the join
  * provably subquadratic" graph pattern. Orienting every undirected
  * edge from its (degree, id)-smaller endpoint to the larger one turns
  * each triangle into exactly ONE wedge-plus-closing-edge, and bounds
  * every node's OUT-degree by O(√m) (no node can point at more than
  * √(2m) neighbors of equal-or-higher degree), so the wedge join
  * generates at most m^1.5 candidates regardless of skew — a star
  * node of degree 10⁶ contributes zero wedges because all its edges
  * point INTO it. That is the difference between "works on the
  * co-purchase graph" and "works when one part is in every order":
  * the hot node's fan-out is capped by the orientation itself, no
  * salting needed.
  *
  * Everything is equi-joins and partial-aggregated counts — no
  * cartesian, no driver-side adjacency, and the oracle replays the
  * same count with naive id-ordered joins (both orientations count
  * each triangle exactly once, so the integers agree).
  */
object Triangles {

  /** Count nodes, edges, and triangles of an undirected graph given
    * as one row per edge with `u` < `v` (distinct, no self-loops).
    * Returns a single row (n_nodes, n_edges, n_triangles).
    *
    * The canonical edge list is checkpointed once: degrees, the
    * orientation join, and the closing-edge join all reuse it rather
    * than replaying the caller's (possibly expensive) edge-build
    * lineage three times.
    */
  def count(edges: DataFrame,
      maxBroadcastEdges: Long = 20L * 1000 * 1000): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(false)
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(cnt(lit(1)).as("d"))
    // orient each edge from the (d, n)-smaller endpoint to the larger:
    // a TOTAL order, so orientation is acyclic and each triangle
    // x≺y≺z appears exactly once — as the wedge (x→y, x→z) closed by
    // the undirected {y,z} edge
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(false)
    // edge-iterator close: for each oriented edge (a, b), triangles
    // through it are |N⁺(a) ∩ N⁺(b)| — the Σ-wedge work happens INSIDE
    // a fused sorted-array intersection per edge row, so nothing
    // wedge-sized is ever materialized or shuffled (a wedge-pair join
    // would ship Σ C(outdeg,2) rows — 34x the edge count on the
    // co-purchase graph). Adjacency rows total m entries and the
    // largest array is the max OUT-degree ≤ √(2m); broadcast them when
    // the graph fits (the count is ~free, e is checkpointed), else
    // two linear shuffles on src/dst — the scale path.
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val adjSide =
      if (e.count() <= maxBroadcastEdges) broadcast(adj) else adj
    val tri = oriented
      .join(adjSide.select(col("src"), col("nbrs").as("nbrs_a")), "src")
      .join(adjSide.select(col("src").as("dst"),
        col("nbrs").as("nbrs_b")), "dst")
      .select(size(array_intersect(col("nbrs_a"), col("nbrs_b")))
        .cast("long").as("c"))
      // inner adjacency joins drop edges whose endpoint has no
      // out-neighbors (they close nothing) — an all-dropped graph
      // (e.g. a star) must still report 0, not null
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    deg.agg(cnt(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(cnt(lit(1)).as("n_edges")))
      .crossJoin(tri)
  }
}
