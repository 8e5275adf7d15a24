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
    *
    * ONE pass over each input: pred/gold union with side flags, a
    * groupBy on the full LAS arc key (this IS the distinct + the
    * intersection, via max-flags), then a second groupBy projecting
    * away `dep` for UAS — both metrics from one data-sized shuffle,
    * instead of the 4-scan/4-distinct/2-join naive shape.
    */
  def uasLas(pred: DataFrame, gold: DataFrame): DataFrame = {
    val key = Seq("sent_id", "token_i", "head_i", "dep")
    val u = pred.select(key.map(col) :+ lit(1).as("p") :+ lit(0).as("g"): _*)
      .unionByName(
        gold.select(key.map(col) :+ lit(0).as("p") :+ lit(1).as("g"): _*))
    val las = u.groupBy(key.map(col): _*)
      .agg(max(col("p")).as("in_p"), max(col("g")).as("in_g"))
    val uas = las.groupBy(col("sent_id"), col("token_i"), col("head_i"))
      .agg(max(col("in_p")).as("in_p"), max(col("in_g")).as("in_g"))
    def counts(arcs: DataFrame, name: String): DataFrame =
      arcs.agg(
        sum(col("in_p") * col("in_g")).as("tp0"),
        sum(col("in_p")).as("np"),
        sum(col("in_g")).as("ng"))
      .select(
        lit(name).as("metric"),
        round(lit(2.0) * col("tp0") /
          greatest(col("np") + col("ng"), lit(1L)), 4).as("f"),
        col("tp0").as("tp"), col("np").as("n_pred"), col("ng").as("n_gold"))
    counts(uas, "uas").unionByName(counts(las, "las"))
  }
}
