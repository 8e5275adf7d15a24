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

  /** Whole-corpus covariance matrix of the embedding components,
    * INTEGER-exact with the same quantization as [[labelDispersion]]
    * (whose per-label dispersion is this matrix's trace restricted to a
    * label): cov_num(i, j) = n·Σ qᵢqⱼ − (Σ qᵢ)(Σ qⱼ) = n²·cov. The
    * PCA/whitening input for embedding-space diagnostics, produced
    * without any float aggregate. Emits the upper triangle (i ≤ j).
    *
    * Plan shape: each vector explodes to its d·(d+1)/2 component pairs
    * (row-local generator), one partial-aggregated groupBy on
    * (i, j) — d²-bounded state per task regardless of corpus size —
    * then the d-row marginal-sum table joins in broadcast-sized. For
    * d = 16 that is 136 running sums per task; vectors never shuffle.
    */
  def covariance(df: DataFrame, vecCol: Column, scaleDigits: Int = 4)
      : DataFrame = {
    val factor = math.pow(10, scaleDigits)
    val q = df.select(transform(vecCol,
      x => round(x.cast("double") * factor).cast("long")).as("q"))
    val d = q.select(size(col("q"))).head().getInt(0)
    val pairs = q.select(explode(flatten(transform(col("q"),
      (qi, i) => transform(slice(col("q"), i + lit(1), lit(d) - i),
        (qj, j) => struct(i.as("i"), (i + j).as("j"),
          (qi * qj).as("p")))))).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
    val sums = pairs.groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("sp"))
    val marg = q.select(posexplode(col("q")).as(Seq("k", "qk")))
      .groupBy(col("k")).agg(sum(col("qk")).as("s"))
    val n = df.count()
    sums
      .join(broadcast(marg.select(col("k").as("i"), col("s").as("si"))), "i")
      .join(broadcast(marg.select(col("k").as("j"), col("s").as("sj"))), "j")
      .select(col("i"), col("j"),
        (col("sp") * n - col("si") * col("sj")).as("cov_num"))
  }
}
