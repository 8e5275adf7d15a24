package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection of an embedding column — the
  * sketch that halves (here: 8x) the bytes every downstream shuffle,
  * index build, or brute-force scan moves per vector (reference
  * counterpart: the embedding side of the dedup/similarity family,
  * SURVEY's ANN ladder; FAISS calls the same preprocessing `RandomRotation`
  * / `PCAMatrix` — this is the data-independent member).
  *
  * The projection matrix is sign-only (Achlioptas 2003: +-1 entries
  * preserve JL guarantees), with each sign derived from the portable md5
  * convention — `sign(j,k) = +1 iff ('0x'||substr(md5('rp:j:k'),1,15))
  * ::BIGINT` is odd — so the "fit artifact" is a pure function both
  * engines evaluate independently; nothing is trained, shipped, or
  * collected. Input floats are first quantized to the 1e-6 lattice
  * (`round(v * 1e6)` as BIGINT), making every projected coordinate an
  * exact integer SUM — order-free across engines and partitionings (the
  * q79/q85 float-safety argument applied to vectors).
  *
  * Scale shape: projection is ROW-LOCAL codegen'd arithmetic fused into
  * the scan (no shuffle, no state); a 64-dim float vector (256 B) leaves
  * the scan as 8 longs that pack to 64 B, and integer distance compares
  * replace float dot products downstream.
  */
object RandomProjection {

  /** Deterministic +-1 sign for (row j, input dim k) — driver-side
    * replica of the md5 parity both engines' query text recomputes.
    */
  private[graft] def sign(j: Int, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$j:$k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1L
    else -1L
  }

  /** Project a float-array column to `dOut` integer coordinates:
    * proj[j] = sum_k sign(j,k) * round(vec[k] * 1e6), as ONE fused
    * JVM pass (the dedup-walker pattern): quantize each component
    * once, then dOut add/negate sweeps over the long array. Both
    * expression formulations lose — `transform`/`aggregate` lambdas
    * evaluate interpreted (1.9 s at sf0.1), and unrolling dOut x dIn
    * literal-sign terms blows the codegen method budget and falls
    * back to interpreted eval of a 512-node tree (7.5 s); the walker
    * measures ~0.4 s. Rounding replicates `functions.round` (HALF_UP
    * on the double) via BigDecimal only when the value is not already
    * integral — the common exact case stays arithmetic.
    */
  def project(vec: Column, dIn: Int, dOut: Int): Column =
    projectUdf(dIn, dOut)(vec)

  private def projectUdf(dIn: Int, dOut: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val signs: Array[Array[Long]] =
      Array.tabulate(dOut, dIn)((j, k) => sign(j, k))
    udf((v: Seq[Float]) => {
      if (v == null) null
      else {
        val q = new Array[Long](dIn)
        var k = 0
        while (k < dIn) {
          val x = v(k).toDouble * 1e6
          // functions.round semantics: BigDecimal(Double.toString(x))
          // .setScale(0, HALF_UP) — must match the expression form the
          // oracle replays. Integral fast path: when x is already a
          // whole number (the common exact-lattice case) HALF_UP is the
          // identity, so the BigDecimal allocation is skipped.
          q(k) =
            if (x == Math.rint(x)) x.toLong
            else BigDecimal(x)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          k += 1
        }
        val out = new Array[Long](dOut)
        var j = 0
        while (j < dOut) {
          val s = signs(j)
          var acc = 0L
          var i = 0
          while (i < dIn) {
            acc += (if (s(i) > 0) q(i) else -q(i))
            i += 1
          }
          out(j) = acc
          j += 1
        }
        out.toSeq
      }
    })
  }

  /** Brute-force top-`k` neighbors per probe query ON THE SKETCH:
    * squared L2 over the dOut integer coordinates (exact integer
    * arithmetic), rank (d2 asc, neighbor_id) via the partial-
    * aggregating long-keyed top-k (the `Ann.bruteForceTopK` exchange
    * bound: k rows per partition-query, never an N*Q window sort —
    * measured 4.1 s -> 0.6 s at sf0.1 over the window form). Same
    * declared O(N*Q) baseline scan shape as q34/q87 — the point is
    * the 8x narrower operand, not a better join. Returns
    * (query_id, rnk, neighbor_id, d2).
    */
  def sketchTopK(vecs: DataFrame, queryFilter: Column, dIn: Int,
      dOut: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    // materialize the sketch BEFORE the N*Q join: CollapseProject
    // happily inlines the projection UDF into the post-join d2 project,
    // re-quantizing all dIn components per JOINED ROW instead of per
    // vector (measured 4.4 s vs 0.9 s at sf0.1). Persisting the sketch
    // is also the production shape — an 8-long sketch table is the
    // artifact you build once and scan many times.
    val sk = vecs.select(col("id"), project(col("vec"), dIn, dOut).as("p"))
      .localCheckpoint()
    val q = sk.filter(queryFilter)
      .select(col("id").as("query_id"), col("p").as("pq"))
    val d2 = (0 until dOut).map { j =>
      val diff = element_at(col("pq"), j + 1) -
        element_at(col("p"), j + 1)
      diff * diff
    }.reduce(_ + _)
    val scored = sk.join(broadcast(q),
        col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"), d2.as("d2"))
    val topk = udaf(new TopKLongAggregator(k), Encoders.product[ScoredL])
    scored.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("d2")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.neighbor_id").as("neighbor_id"), col("col.d2").as("d2"))
  }
}
