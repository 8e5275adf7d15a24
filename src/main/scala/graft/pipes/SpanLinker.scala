package graft.pipes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decode side of the `eds.span_linker` trainable entity linker
  * (`/root/reference/edsnlp/pipes/trainable/span_linker/span_linker.py`):
  * a span embedding is scored against a reference embedding matrix —
  * one row per concept (`reference_mode = "concept"`) or one row per
  * SYNONYM mapping to its concept (`"synonym"`) — and the span links to
  * the argmax concept if its probability clears a threshold, else None.
  *
  * Row-local [[decode]] mirrors the reference forward/postprocess with
  * injected scores (no torch here). At corpus scale the synonym matrix
  * is itself a table (UMLS-sized), so [[linkTable]] expresses the same
  * decode as a DataFrame join against the concept-embedding table using
  * the ANN machinery ([[graft.similarity.Ann.bruteForceTopK]] k=1 shape:
  * broadcast the small side, partial top-1 aggregation — never N·M rows
  * to the shuffle); swap in `Ann.lshTopK`/`ivfTopK` when the synonym
  * table outgrows a broadcast.
  */
object SpanLinker {

  sealed trait ProbabilityMode
  case object Softmax extends ProbabilityMode
  case object Sigmoid extends ProbabilityMode

  /** Score one span embedding against the reference matrix by cosine
    * similarity; rows whose concept group is not in `allowed` (when
    * label-restricted candidates are configured) are masked out — the
    * reference classifier's `group_indices`.
    */
  def scores(
      spanEmbed: Array[Double],
      matrix: IndexedSeq[Array[Double]],
      allowed: Option[Set[Int]] = None): Array[Double] = {
    val qn = math.sqrt(spanEmbed.map(x => x * x).sum)
    matrix.indices.map { i =>
      if (allowed.exists(a => !a.contains(i))) Double.NegativeInfinity
      else {
        val row = matrix(i)
        var dot = 0.0; var nn = 0.0; var d = 0
        while (d < row.length) {
          dot += row(d) * spanEmbed(d); nn += row(d) * row(d); d += 1
        }
        val den = qn * math.sqrt(nn)
        if (den == 0) 0.0 else dot / den
      }
    }.toArray
  }

  /** Argmax + probability + threshold: returns (concept, prob) with
    * concept None below the threshold (reference postprocess). In
    * synonym mode `rowConcept` maps matrix rows to concept ids (several
    * rows per concept); in concept mode it is the identity.
    */
  def decode(
      rawScores: Array[Double],
      rowConcept: Int => String,
      mode: ProbabilityMode = Softmax,
      threshold: Double = 0.0): (Option[String], Double) = {
    if (rawScores.isEmpty) return (None, 0.0)
    var best = 0
    var i = 1
    while (i < rawScores.length) {
      if (rawScores(i) > rawScores(best)) best = i
      i += 1
    }
    val prob = mode match {
      case Sigmoid => 1.0 / (1.0 + math.exp(-rawScores(best)))
      case Softmax =>
        val mx = rawScores(best)
        val z = rawScores.map(s => math.exp(s - mx)).sum
        1.0 / z // exp(mx - mx) / sum
    }
    (if (prob >= threshold) Some(rowConcept(best)) else None, prob)
  }

  /** DataFrame-scale linking: spans (span_id, vec) x concepts
    * (concept_id, vec) -> (span_id, concept_id, sim), keeping each
    * span's best concept at sim >= threshold. Same partial top-1
    * aggregation shape as the declared ANN queries: the concept side
    * broadcasts, only 1 row per partition per span reaches the shuffle.
    */
  def linkTable(
      spans: DataFrame, concepts: DataFrame,
      threshold: Double): DataFrame = {
    val ranked = graft.similarity.Ann.bruteForceTopK(
      spans.select(col("span_id").as("id"), col("vec")),
      concepts.select(col("concept_id").as("id"), col("vec")),
      k = 1, excludeSelf = false)
    val winner = ranked.select(col("query_id").as("span_id"),
      col("neighbor_id").as("concept_id"))
    winner
      .join(spans.select(col("span_id"), col("vec").as("sv")), "span_id")
      .join(broadcast(concepts.select(col("concept_id"),
        col("vec").as("cv"))), "concept_id")
      .withColumn("sim", graft.similarity.Ann.cosine(col("sv"), col("cv")))
      .filter(col("sim") >= threshold)
      .select(col("span_id"), col("concept_id"), round(col("sim"), 4).as("sim"))
  }
}
