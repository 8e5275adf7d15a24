package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Scalar quantization (the FAISS `IndexScalarQuantizer`/SQ8 shape): each
  * dimension is affinely mapped to one unsigned byte against the corpus
  * per-dimension [min, max] envelope — `dim` BYTES per vector instead of
  * `dim` doubles (8x), with none of PQ's codebook machinery. The codes
  * column is plain `binary`, so it prunes/scans/shuffles like any column
  * and a 100-TB corpus keeps 1/8 of the raw embedding footprint hot.
  *
  * Ranking here is SDC (symmetric distance computation): queries are
  * encoded with the SAME envelope and candidates rank by the integer
  * dot product of the two code arrays. That keeps the declared query
  * oracle-exact — byte codes and their dot are exact integers, so the
  * score is order-free and independently replayable — and it is the
  * cheap path at scale (pure int multiply-adds, no per-candidate float
  * reconstruction). The fit is one distributed min/max aggregate; only
  * O(dim) envelope values land on the driver.
  */
object Sq {

  /** Per-dimension (min, max) envelope — the SQ train() step. One
    * distributed aggregate over 2·dim columns; no sample, no collect of
    * vectors.
    */
  def fitMinMax(corpus: DataFrame, dim: Int): Array[(Double, Double)] = {
    val aggs = (0 until dim).flatMap { j =>
      Seq(min(element_at(col("vec"), j + 1)).as(s"mn$j"),
        max(element_at(col("vec"), j + 1)).as(s"mx$j"))
    }
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    Array.tabulate(dim)(j => (r.getDouble(2 * j), r.getDouble(2 * j + 1)))
  }

  /** vec → dim-byte SQ8 code (binary column): round-half-up of the
    * affine map onto [0, 255], clamped (out-of-envelope queries encode
    * to the boundary, as in FAISS). A constant dimension encodes to 0.
    */
  def encodeUdf(minmax: Array[(Double, Double)]): UserDefinedFunction =
    udf((v: Seq[Double]) => {
      val out = new Array[Byte](minmax.length)
      var j = 0
      while (j < minmax.length) {
        val (mn, mx) = minmax(j)
        val c =
          if (mx == mn) 0
          else math.floor((v(j) - mn) * 255.0 / (mx - mn) + 0.5).toInt
        out(j) = (if (c < 0) 0 else if (c > 255) 255 else c).toByte
        j += 1
      }
      out
    })

  private val sdcDot: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      var s = 0L; var i = 0
      while (i < a.length) { s += (a(i) & 0xff).toLong * (b(i) & 0xff); i += 1 }
      s.toDouble // exact: 16 dims x 255^2 << 2^53
    })

  /** SDC top-k of `queries` (id, vec) against `codes` (id, code): the
    * query side encodes through the same envelope and is broadcast; the
    * corpus side streams dim-byte codes; candidates feed the
    * partial-aggregating top-k (k rows per partition-query, as
    * [[Ann.bruteForceTopK]]). Like q34/q77, the scan is the declared
    * O(N·Q) baseline shape — SQ bounds the MEMORY traffic; compose with
    * IVF cells (as [[Pq.ivfpqTopK]]) to bound compute too.
    */
  def sdcTopK(queries: DataFrame, codes: DataFrame,
      minmax: Array[(Double, Double)], k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val qs = queries.select(col("id").as("query_id"),
      encodeUdf(minmax)(col("vec")).as("qcode"))
    val cs = codes.select(col("id").as("neighbor_id"), col("code"))
    val scored = cs.crossJoin(broadcast(qs))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .withColumn("sim", sdcDot(col("qcode"), col("code")))
    Pq.rankTopK(scored, k)
  }
}
