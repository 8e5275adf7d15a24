package graft.pipes

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TRAINED endlines classifier. The reference `EndLinesModel`
  * (`edsnlp/pipes/core/endlines/model.py`) standardizes line lengths per
  * document (B features, `model.py:621-651`) and fits supervised
  * MultinomialNB models over encoded features; that needs labeled
  * newlines. This is a deliberate UNSUPERVISED reformulation on the same
  * core signal: newline sites featurize as the standardized lengths of
  * the lines before/after (`(l - mu_doc) / sigma_doc`), and a 2-cluster
  * Spark-ML KMeans separates real paragraph ends from hard-wrap
  * artifacts with no labels. The cluster whose mean b1 is higher is the
  * SPACE class — wrapped lines run up against the page width (long,
  * uniform), true ends fall short.
  *
  * Fit is two Spark jobs (feature aggregation + MLlib KMeans on the
  * 2-dim feature space); the per-doc stats join and the lead() window
  * share one shuffle on doc_id; predict is a row-local expression over
  * the two centroids. The rule-based [[Endlines]] remains the
  * no-training path, as in the reference.
  */
object EndlinesModel {

  /** (doc_id, line_idx, pos, b1, b2) per newline site: `pos` is the
    * char offset of the '\n'; b1/b2 standardize the lengths of the
    * lines before/after it within the doc.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .withColumn("l", length(col("line")).cast("double"))
    val stats = lines.groupBy("doc_id")
      .agg(avg(col("l")).as("mu"),
        coalesce(stddev_samp(col("l")), lit(0.0)).as("sigma"))
    // plain shuffle join: stats is one row per DOCUMENT (broadcast would
    // collect a corpus-sized table to the driver), and the following
    // window already shuffles on doc_id — the exchange is shared
    val byDoc = Window.partitionBy("doc_id").orderBy("line_idx")
    lines.join(stats, "doc_id")
      .withColumn("b", (col("l") - col("mu")) /
        when(col("sigma") > 0, col("sigma")).otherwise(lit(1.0)))
      .withColumn("b2_next", lead(col("b"), 1).over(byDoc))
      .withColumn("pos",
        sum(col("l").cast("long") + 1L)
          .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      // one row per NEWLINE: every line except the doc's last
      .filter(col("b2_next").isNotNull)
      .select(col("doc_id"), col("line_idx"), col("pos"),
        col("b").as("b1"), col("b2_next").as("b2"))
  }

  /** Two centroids in (b1, b2) space + which cluster means "space"
    * (spurious wrap). Broadcastable predict state.
    */
  case class Model(
      centers: Seq[(Double, Double)], spaceCluster: Int)
      extends Serializable

  private val toVec = udf((b1: Double, b2: Double) =>
    Vectors.dense(b1, b2))

  /** Unsupervised fit (reference `fit_and_predict` M2 path). */
  def fit(features: DataFrame, seed: Long = 42L): Model = {
    val fv = features.select(toVec(col("b1"), col("b2")).as("features"))
    val km = new KMeans().setK(2).setSeed(seed).setFeaturesCol("features")
    val m = km.fit(fv)
    val centers = m.clusterCenters.toSeq.map(v => (v(0), v(1)))
    // higher mean b1 = line ran to the wrap width = newline is a space
    val space = if (centers(0)._1 >= centers(1)._1) 0 else 1
    Model(centers, space)
  }

  /** Adds `end_line`: true = a real line ending, false = spurious wrap
    * (the reference rewrites those newlines' NORM to space /
    * `excluded`). Pure expression over the broadcast centroids.
    */
  def predict(model: Model, features: DataFrame): DataFrame = {
    val Seq((c0b1, c0b2), (c1b1, c1b2)) = model.centers
    val d0 = pow(col("b1") - c0b1, 2) + pow(col("b2") - c0b2, 2)
    val d1 = pow(col("b1") - c1b1, 2) + pow(col("b2") - c1b2, 2)
    val cluster = when(d0 <= d1, lit(0)).otherwise(lit(1))
    features.withColumn("end_line",
      cluster =!= lit(model.spaceCluster))
  }
}
