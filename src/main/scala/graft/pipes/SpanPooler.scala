package graft.pipes

/** The pooling math of the `eds.span_pooler` embedding component
  * (`/root/reference/edsnlp/pipes/trainable/embeddings/span_pooler/
  * span_pooler.py`): a span's embedding is the mean/max/sum of its
  * tokens' embeddings. Token embeddings come from an injected model
  * stage ([[TrainableStages.embedTokens]] / [[graft.operators.GpuStage]]);
  * the pooling itself is row-local arithmetic.
  */
object SpanPooler {

  sealed trait Mode
  case object Mean extends Mode
  case object Max extends Mode
  case object Sum extends Mode

  /** Pool token embeddings over [begin, end) TOKEN ranges. Empty or
    * out-of-range spans yield a zero vector of the embedding dim (the
    * degenerate-span behavior a batch pipeline needs — never a throw).
    */
  def pool(
      embeddings: IndexedSeq[Array[Float]],
      spans: Seq[(Int, Int)],
      mode: Mode = Mean): Seq[Array[Float]] = {
    val dim = embeddings.headOption.map(_.length).getOrElse(0)
    spans.map { case (b0, e0) =>
      val b = math.max(0, b0)
      val e = math.min(embeddings.length, e0)
      if (e <= b || dim == 0) new Array[Float](dim)
      else {
        val acc = mode match {
          case Max => Array.fill(dim)(Float.NegativeInfinity)
          case _ => new Array[Float](dim)
        }
        var t = b
        while (t < e) {
          val v = embeddings(t)
          var d = 0
          while (d < dim) {
            mode match {
              case Max => if (v(d) > acc(d)) acc(d) = v(d)
              case _ => acc(d) += v(d)
            }
            d += 1
          }
          t += 1
        }
        if (mode == Mean) {
          var d = 0
          val n = (e - b).toFloat
          while (d < dim) { acc(d) /= n; d += 1 }
        }
        acc
      }
    }
  }
}
