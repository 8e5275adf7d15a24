package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dependency-parsing evaluation (UAS / LAS) — the reduce layer of
  * `/root/reference/edsnlp/metrics/dep_parsing.py:7-60` restated
  * relationally. The reference builds SETS of arcs per example —
  * `(eg_idx, token.i, token.head.i)` for UAS and the same plus `dep_` for
  * LAS — then scores `prf(pred, gold)["f"]` with
  * `f = 2·|p∩g| / max(1, |p|+|g|)` (`metrics/__init__.py:33-46`).
  *
  * Arc tables: `(sent_id, token_i, head_i, dep)`; `sent_id` plays the
  * reference's `eg_idx` role (any per-example key works). Set semantics
  * via `distinct` + an inner join on the arc key; all counts partial-
  * aggregate map-side, so the only data-sized exchanges are the two
  * distincts — no windows, no cartesian.
  */
object DepParsing {

  /** One row per metric (`las`, `uas`): f (rounded 4dp), tp, n_pred,
    * n_gold. When pred and gold annotate the same tokens (the usual
    * parser-eval case), |p| = |g| and f reduces to attachment accuracy.
    */
  def uasLas(pred: DataFrame, gold: DataFrame): DataFrame = {
    def score(name: String, key: Seq[String]): DataFrame = {
      val p = pred.select(key.map(col): _*).distinct()
      val g = gold.select(key.map(col): _*).distinct()
      // single-row aggregates; the joins below are 1x1
      val tp = p.join(g, key).agg(count(lit(1)).as("tp"))
      val np = p.agg(count(lit(1)).as("np"))
      val ng = g.agg(count(lit(1)).as("ng"))
      tp.crossJoin(np).crossJoin(ng).select(
        lit(name).as("metric"),
        round(lit(2.0) * col("tp") /
          greatest(col("np") + col("ng"), lit(1L)), 4).as("f"),
        col("tp"), col("np").as("n_pred"), col("ng").as("n_gold"))
    }
    score("uas", Seq("sent_id", "token_i", "head_i"))
      .unionByName(score("las", Seq("sent_id", "token_i", "head_i", "dep")))
  }
}
