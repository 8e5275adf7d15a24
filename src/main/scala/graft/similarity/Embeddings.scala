package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoder}
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
    val spark = df.sparkSession
    import spark.implicits._
    val factor = math.pow(10, scaleDigits)
    val qds = df.select(transform(vecCol,
      x => round(x.cast("double") * factor).cast("long")).as("q"))
      .as[Seq[Long]]
    val first = qds.take(1)
    if (first.isEmpty)
      return spark.createDataFrame(Seq.empty[(Int, Int, Long)])
        .toDF("i", "j", "cov_num")
    val d = first.head.size
    val nPairs = d * (d + 1) / 2
    // One typed Aggregator pass: the buffer is the full running moment
    // vector — d(d+1)/2 pair sums, d marginal sums, the row count —
    // partial-aggregated per task and merged associatively. No pair
    // ROWS ever exist (the first-cut posexplode form materialized
    // n·d(d+1)/2 structs and was 10x slower at sf0.1); per-task state
    // is d²-bounded regardless of corpus size.
    val agg = new MomentAggregator(d, nPairs)
    // the finished moment vector is d²-bounded (2,145 longs at d = 64)
    // — a documented driver-side bound, like the IVF centroid collects
    val m = qds.select(agg.toColumn).head()
    val n = m(nPairs + d)
    val rows = for {
      i <- 0 until d; j <- i until d
    } yield {
      val idx = i * d - i * (i - 1) / 2 + (j - i)
      (i, j, m(idx) * n - m(nPairs + i) * m(nPairs + j))
    }
    spark.createDataFrame(rows).toDF("i", "j", "cov_num")
  }

  /** The running-moment Aggregator of [[covariance]], a TOP-LEVEL
    * class on purpose: an anonymous Aggregator inside the method
    * closed over the SparkSession (through `spark.implicits`
    * encoders), and a session reference in an executor-serialized
    * object is a landmine — it serializes only while the session's
    * lazily-initialized fields (e.g. the observation manager, which
    * initializes the first time ANY `Dataset.observe` runs) are
    * still null. Session-free `ExpressionEncoder`s capture nothing.
    */
  private final class MomentAggregator(d: Int, nPairs: Int)
      extends org.apache.spark.sql.expressions
        .Aggregator[Seq[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](nPairs + d + 1)
    def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
      val qa = q.toArray
      var idx = 0
      var i = 0
      while (i < d) {
        val qi = qa(i)
        var j = i
        while (j < d) { b(idx) += qi * qa(j); idx += 1; j += 1 }
        b(nPairs + i) += qi
        i += 1
      }
      b(nPairs + d) += 1
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
