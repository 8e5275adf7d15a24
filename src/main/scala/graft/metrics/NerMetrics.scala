package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NER / span-attribute evaluation aggregations — the reduce layer of the
  * reference (`/root/reference/edsnlp/metrics/ner.py:34-190`,
  * `span_attribute.py:52-340`, prf `metrics/__init__.py:33-46`), restated
  * relationally: set semantics via joins on the (doc, begin, end, label)
  * key, per-label AND micro P/R/F1 in one pass via grouping sets.
  *
  * Inputs are entity tables: (doc_id, begin, end, label [, attr...]).
  * All aggregations are partial-aggregated map-side; the grouping-sets
  * form computes per-label and micro rows in a single shuffle.
  */
object NerMetrics {

  private def prf(tp: Column, nPred: Column, nGold: Column): Seq[Column] = {
    val p = tp / greatest(nPred, lit(1L))
    val r = tp / greatest(nGold, lit(1L))
    Seq(
      round(p, 4).as("precision"),
      round(r, 4).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 4)
        .as("f1"),
      tp.as("tp"), nPred.as("n_pred"), nGold.as("n_gold"))
  }

  /** Exact-span NER metric: per-label rows plus a micro row
    * (label = 'micro'), one pass (`ner.py:34-64` computes both
    * simultaneously; here via GROUPING SETS).
    */
  def nerExact(pred: DataFrame, gold: DataFrame): DataFrame = {
    val key = Seq("doc_id", "begin", "end", "label")
    val p = pred.select(key.map(col): _*)
    val g = gold.select(key.map(col): _*)
    val tp = p.intersect(g).withColumn("kind", lit("tp"))
    val allPred = p.withColumn("kind", lit("pred"))
    val allGold = g.withColumn("kind", lit("gold"))
    val counts = tp.unionByName(allPred).unionByName(allGold)
      .groupBy(col("label"), col("kind")).agg(count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(
        sum(when(col("kind") === "tp", col("n")).otherwise(0L)).as("tp"),
        sum(when(col("kind") === "pred", col("n")).otherwise(0L)).as("np"),
        sum(when(col("kind") === "gold", col("n")).otherwise(0L)).as("ng"))
    val perLabel = counts.select(
      col("label") +: prf(col("tp").cast("double"), col("np"), col("ng")): _*)
    val micro = counts.agg(sum("tp").as("tp"), sum("np").as("np"),
      sum("ng").as("ng"))
      .select(lit("micro").as("label") +:
        prf(col("tp").cast("double"), col("np"), col("ng")): _*)
    perLabel.unionByName(micro)
  }

  /** Token-level NER metric: explode each span into its char positions
    * (`sequence(begin, end-1)`) then exact-set logic (`ner.py:66-99`).
    */
  def nerToken(pred: DataFrame, gold: DataFrame): DataFrame = {
    def toTokens(df: DataFrame): DataFrame =
      df.filter(col("end") > col("begin")) // zero-length spans (legal in
        // BRAT) would make sequence() count DOWN and fabricate positions
        .select(col("doc_id"), col("label"),
          explode(sequence(col("begin"), col("end") - 1)).as("pos"))
        .distinct()
        .withColumnRenamed("pos", "begin")
        .withColumn("end", col("begin") + 1)
    nerExact(toTokens(pred), toTokens(gold))
  }

  /** Overlap-tolerant metric: a predicted span counts as TP if it overlaps
    * any gold span with the same label (`ner.py:101-190`, dice-style).
    */
  def nerOverlap(pred: DataFrame, gold: DataFrame): DataFrame = {
    val p = pred.select(col("doc_id"), col("begin"), col("end"),
      col("label")).alias("p")
    val g = gold.select(col("doc_id"), col("begin"), col("end"),
      col("label")).alias("g")
    val overlap = col("p.begin") < col("g.end") &&
      col("p.end") > col("g.begin")
    val tpPred = p.join(g,
      col("p.doc_id") === col("g.doc_id") &&
        col("p.label") === col("g.label") && overlap, "left_semi")
    val tpGold = g.join(p,
      col("p.doc_id") === col("g.doc_id") &&
        col("p.label") === col("g.label") && overlap, "left_semi")
    val counts = tpPred.select(col("label")).withColumn("kind", lit("tp"))
      .unionByName(p.select(col("p.label").as("label"))
        .withColumn("kind", lit("pred")))
      .unionByName(tpGold.select(col("label")).withColumn("kind", lit("tpg")))
      .unionByName(g.select(col("g.label").as("label"))
        .withColumn("kind", lit("gold")))
      .groupBy("label", "kind").agg(count(lit(1)).as("n"))
      .groupBy("label")
      .agg(
        sum(when(col("kind") === "tp", col("n")).otherwise(0L)).as("tp"),
        sum(when(col("kind") === "pred", col("n")).otherwise(0L)).as("np"),
        sum(when(col("kind") === "tpg", col("n")).otherwise(0L)).as("tpg"),
        sum(when(col("kind") === "gold", col("n")).otherwise(0L)).as("ng"))
    counts.select(
      col("label"),
      round(col("tp") / greatest(col("np"), lit(1L)), 4).as("precision"),
      round(col("tpg") / greatest(col("ng"), lit(1L)), 4).as("recall"))
  }

  /** Span-attribute accuracy/P-R-F over matched spans
    * (`span_attribute.py:52-340`): join pred<->gold on the span key, then
    * per-attribute-value agreement.
    */
  def spanAttribute(
      pred: DataFrame, gold: DataFrame, attr: String): DataFrame = {
    val key = Seq("doc_id", "begin", "end", "label")
    val joined = pred.select((key :+ attr).map(col): _*)
      .withColumnRenamed(attr, "pred_value")
      .join(gold.select((key :+ attr).map(col): _*)
        .withColumnRenamed(attr, "gold_value"), key)
    joined.agg(
      count(lit(1)).as("n_spans"),
      round(avg(when(col("pred_value") === col("gold_value"), 1.0)
        .otherwise(0.0)), 4).as("accuracy"))
  }
}
