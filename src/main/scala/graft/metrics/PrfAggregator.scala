package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed P/R/F1 aggregator (`Aggregator[IN, BUF, OUT]`) — the typed-API
  * twin of NerMetrics' relational form, for `Dataset` pipelines
  * (`prf` arithmetic of `/root/reference/edsnlp/metrics/__init__.py:
  * 33-46`). Input rows are per-span outcomes: (isPred, isGold) — a
  * true-positive row carries both flags. Partial-aggregates map-side like
  * any Spark aggregate.
  */
object PrfAggregator {

  case class SpanOutcome(isPred: Boolean, isGold: Boolean)
  case class PrfBuffer(tp: Long, nPred: Long, nGold: Long)
  case class Prf(precision: Double, recall: Double, f1: Double,
      tp: Long, nPred: Long, nGold: Long)

  val prf: Aggregator[SpanOutcome, PrfBuffer, Prf] =
    new Aggregator[SpanOutcome, PrfBuffer, Prf] {
      def zero: PrfBuffer = PrfBuffer(0L, 0L, 0L)
      def reduce(b: PrfBuffer, a: SpanOutcome): PrfBuffer = PrfBuffer(
        b.tp + (if (a.isPred && a.isGold) 1L else 0L),
        b.nPred + (if (a.isPred) 1L else 0L),
        b.nGold + (if (a.isGold) 1L else 0L))
      def merge(x: PrfBuffer, y: PrfBuffer): PrfBuffer =
        PrfBuffer(x.tp + y.tp, x.nPred + y.nPred, x.nGold + y.nGold)
      def finish(b: PrfBuffer): Prf = {
        val p = if (b.nPred > 0) b.tp.toDouble / b.nPred else 0.0
        val r = if (b.nGold > 0) b.tp.toDouble / b.nGold else 0.0
        val f = if (p + r > 0) 2 * p * r / (p + r) else 0.0
        Prf(p, r, f, b.tp, b.nPred, b.nGold)
      }
      def bufferEncoder: Encoder[PrfBuffer] = Encoders.product[PrfBuffer]
      def outputEncoder: Encoder[Prf] = Encoders.product[Prf]
    }

  /** Average precision over (score, isRelevant) pairs
    * (`metrics/__init__.py:16-32`): rank by score desc, mean of
    * precision@k at each relevant k.
    */
  def averagePrecision(scored: Seq[(Double, Boolean)]): Double = {
    val ranked = scored.sortBy(-_._1)
    var hits = 0
    var sumPrec = 0.0
    ranked.zipWithIndex.foreach { case ((_, rel), i) =>
      if (rel) {
        hits += 1
        sumPrec += hits.toDouble / (i + 1)
      }
    }
    if (hits == 0) 0.0 else sumPrec / hits
  }
}
