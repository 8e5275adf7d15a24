package graft.similarity

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Product quantization (the FAISS `IndexPQ` shape — Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * memory answer at corpus scale. Vectors are cut into `m` subspaces;
  * each subspace gets its own `ksub`-codeword k-means codebook; a
  * vector is stored as `m` BYTES of codeword ids instead of `dim`
  * doubles (16 bytes vs 128 for a 16-dim double vector — and the ratio
  * widens with dim). Search is ADC (asymmetric distance computation):
  * per QUERY, one small table of query-subvector·codeword products is
  * built once, and every candidate's similarity is `m` table lookups —
  * no decode, no per-candidate float vector in memory or shuffle.
  *
  * The codes column is a plain `binary` DataFrame column: it prunes,
  * scans, and shuffles like any other column, so a 100-TB corpus keeps
  * its PQ codes in ~m/(8·dim) of the raw footprint and the ADC scan
  * streams codes instead of vectors. Reference counterpart: the
  * embedding-similarity gates of edsnlp's span linker
  * (`span_linker.py`) rank against a fixed concept table — this is the
  * same ranking made memory-bounded.
  *
  * Exactness contract: PQ is approximate in general (reconstruction
  * error moves rankings); when every distinct subvector has its own
  * codeword (`distinct <= ksub`, as on the integer-lattice test
  * corpus) the encoding is LOSSLESS and ADC ranking is exact — which
  * is what lets q77 be DuckDB-oracle-checked against the true top-k.
  * Generic-data recall is spec-asserted on Gaussian clusters instead.
  */
object Pq {

  /** Per-subspace codebooks fit on a bounded driver-side sample (the
    * FAISS train() step; each subspace reuses the seeded local k-means
    * of the IVF quantizer). Returned shape: m × ks_s × dsub, where
    * ks_s <= ksub (k-means returns the distinct subvectors themselves
    * when there are fewer than ksub — the lossless case).
    */
  def fitCodebooks(corpus: DataFrame, dim: Int, m: Int,
      ksub: Int = 256, seed: Long = 42L,
      sampleSize: Int = 16384): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    require(ksub > 1 && ksub <= 256, "ksub must fit one byte")
    val dsub = dim / m
    val sample = corpus.select(col("vec")).limit(sampleSize).collect()
      .map(_.getSeq[Double](0).toArray)
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(
        v, s * dsub, (s + 1) * dsub))
      Ann.fitCentersLocal(sub, ksub, seed + s)
    }
  }

  private def nearest(cb: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bd = Double.MaxValue; var j = 0
    while (j < cb.length) {
      var d = 0.0; var i = 0
      val c = cb(j)
      while (i < c.length) { val t = c(i) - v(i); d += t * t; i += 1 }
      if (d < bd) { bd = d; best = j }
      j += 1
    }
    best
  }

  /** vec → m-byte PQ code (binary column). */
  def encodeUdf(codebooks: Array[Array[Array[Double]]])
      : UserDefinedFunction = {
    val dsub = codebooks(0)(0).length
    udf((v: Seq[Double]) => {
      val arr = v.toArray
      val out = new Array[Byte](codebooks.length)
      var s = 0
      while (s < codebooks.length) {
        out(s) = nearest(codebooks(s), java.util.Arrays.copyOfRange(
          arr, s * dsub, (s + 1) * dsub)).toByte
        s += 1
      }
      out
    })
  }

  /** ADC cosine top-k of `queries` (id, vec) against `codes`
    * (id, code): the query side builds its dot-product table ONCE (m ×
    * ks_s entries against every codeword) and is broadcast; the
    * corpus side streams `m`-byte codes through a scoring expression
    * that is `2m` array lookups + one sqrt per candidate —
    * `cos(q, recon(c)) = Σ dotTab / (‖q‖ · sqrt(Σ norm2Tab))`, exact
    * with respect to the reconstructed vectors. Candidates feed the
    * partial-aggregating top-k (same exchange bound as
    * [[Ann.bruteForceTopK]]: k rows per partition-query). Like q34,
    * the scan is the declared O(N·Q) baseline shape — PQ bounds its
    * MEMORY traffic, IVF cells bound its compute; compose both for
    * FAISS's IndexIVFPQ.
    */
  def adcTopK(queries: DataFrame, codes: DataFrame,
      codebooks: Array[Array[Array[Double]]], k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    // offsets flatten the jagged m × ks_s tables into one array
    val offsets = codebooks.scanLeft(0)(_ + _.length)
    // ‖codeword‖² is query-independent: one global table in the closure
    val norm2Tab: Array[Double] = codebooks.flatMap(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })
    val tabUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      val tab = new Array[Double](offsets.last)
      var s = 0
      while (s < m) {
        val cb = codebooks(s)
        var j = 0
        while (j < cb.length) {
          var d = 0.0; var i = 0
          while (i < dsub) { d += arr(s * dsub + i) * cb(j)(i); i += 1 }
          tab(offsets(s) + j) = d
          j += 1
        }
        s += 1
      }
      tab.toSeq
    })
    val qnorm = udf((v: Seq[Double]) => {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    })
    val scoreUdf = udf((tab: Seq[Double], qn: Double, code: Array[Byte]) => {
      var dot = 0.0; var n2 = 0.0; var s = 0
      while (s < m) {
        val idx = offsets(s) + (code(s) & 0xff)
        dot += tab(idx); n2 += norm2Tab(idx)
        s += 1
      }
      val den = qn * math.sqrt(n2)
      if (den == 0.0 || den.isNaN) 0.0 else dot / den
    })
    val qs = queries.select(col("id").as("query_id"),
      tabUdf(col("vec")).as("tab"), qnorm(col("vec")).as("qn"))
    val cs = codes.select(col("id").as("neighbor_id"), col("code"))
    val scored = cs.crossJoin(broadcast(qs))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .withColumn("sim", scoreUdf(col("tab"), col("qn"), col("code")))
    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    scored.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("sim")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"))
  }
}
