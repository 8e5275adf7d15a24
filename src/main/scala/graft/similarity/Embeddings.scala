package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space diagnostics for labeled/clustered corpora. */
object Embeddings {

  /** Per-label cluster compactness, INTEGER-exact: components quantize
    * to `round(x * 10^scaleDigits)` (float→double is exact, the product
    * fits a double's mantissa, HALF_UP rounding matches ANSI engines),
    * then the mean-squared-distance-to-centroid identity
    *
    *   n * Σ_vectors ||q||² − Σ_j (Σ_vectors q_j)²   =  n² * msd_quantized
    *
    * keeps every aggregate a 64-bit integer — no float sum exists
    * anywhere, so an independent engine replays the exact value with no
    * rounding convention. Recover the real-unit msd as
    * `dispersion_num / n² / 10^(2·scaleDigits)` when a human-readable
    * number is wanted; comparisons/monitoring can use the exact
    * numerator directly.
    *
    * Plan shape: one posexplode → two partial-aggregated groupBys
    * ((label, pos), then label) → a join with per-label counts that is
    * label-cardinality-sized (broadcast). Nothing wider than
    * (label, pos, long) rows ever shuffles; vectors never move whole.
    * Overflow bound: |q| ≤ 10^scaleDigits·max|x|, so with unit-norm-ish
    * embeddings and scaleDigits=4, n up to ~10^4 per label stays far
    * inside Long; raise awareness, not scaleDigits, for larger labels.
    */
  def labelDispersion(df: DataFrame, labelCol: Column, vecCol: Column,
      scaleDigits: Int = 4): DataFrame = {
    val factor = math.pow(10, scaleDigits)
    val qv = df.select(labelCol.as("label"),
      posexplode(transform(vecCol,
        x => round(x.cast("double") * factor).cast("long"))))
      .toDF("label", "pos", "qc")
    val comp = qv.groupBy(col("label"), col("pos"))
      .agg(sum(col("qc")).as("sv"), sum(col("qc") * col("qc")).as("sq"))
    val perLabel = comp.groupBy(col("label"))
      .agg(sum(col("sq")).as("ssq"), sum(col("sv") * col("sv")).as("svsq"))
    val counts = df.groupBy(labelCol.as("label"))
      .agg(count(lit(1)).as("n"))
    perLabel.join(counts, "label")
      .select(col("label"), col("n"),
        (col("ssq") * col("n") - col("svsq")).as("dispersion_num"))
  }
}
