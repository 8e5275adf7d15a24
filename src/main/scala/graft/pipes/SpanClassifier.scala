package graft.pipes

/** Decode side of the `eds.span_classifier` trainable attribute predictor
  * (`/root/reference/edsnlp/pipes/trainable/span_classifier/
  * span_classifier.py:488-557`): a model stage scores every (attribute,
  * value) binding for each span; decoding argmaxes WITHIN each exclusive
  * binding group and assigns the winning value to spans whose NER label
  * the group applies to. The scores come from an injected forward (no
  * torch in this container); grouping/argmax/assignment — the part that
  * must agree with the reference — is exact row-local logic here.
  */
object SpanClassifier {

  /** One exclusive binding group: an attribute (e.g. "negation"), the
    * span labels it applies to (None = all labels, like `labels is True`
    * in the reference), and the candidate values in score order.
    */
  final case class Binding(
      attr: String,
      labels: Option[Set[String]],
      values: IndexedSeq[String])

  /** Flat score-vector layout: group g's scores occupy the slice
    * [offset(g), offset(g) + values(g).size) — the reference's
    * bindings_indexer. Returned so callers can build score vectors that
    * line up with [[decode]].
    */
  def offsets(bindings: Seq[Binding]): Seq[Int] =
    bindings.scanLeft(0)(_ + _.values.size).init

  /** Decode one span: for each applicable group, argmax its slice of
    * `scores` and emit (attr -> value). Groups whose label filter
    * excludes the span's label assign nothing (reference postprocess
    * skips them). Ties break toward the LOWEST value index (torch
    * argmax semantics).
    */
  def decode(
      bindings: Seq[Binding],
      spanLabel: String,
      scores: Array[Double]): Map[String, String] = {
    val offs = offsets(bindings)
    bindings.zip(offs).flatMap { case (b, off) =>
      val applies = b.labels.forall(_.contains(spanLabel))
      if (!applies || b.values.isEmpty) None
      else {
        var best = 0
        var i = 1
        while (i < b.values.size) {
          if (scores(off + i) > scores(off + best)) best = i
          i += 1
        }
        Some(b.attr -> b.values(best))
      }
    }.toMap
  }

  /** Batch decode: spans as (label, scores) pairs — the postprocess
    * loop over a collated batch. Row-local; at scale this runs inside
    * the same `mapPartitions`/Arrow stage that produced the scores, so
    * no extra shuffle is introduced.
    */
  def decodeBatch(
      bindings: Seq[Binding],
      spans: Seq[(String, Array[Double])]): Seq[Map[String, String]] =
    spans.map { case (label, scores) => decode(bindings, label, scores) }
}
