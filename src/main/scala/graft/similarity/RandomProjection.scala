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
    * proj[j] = sum_k sign(j,k) * round(vec[k] * 1e6). The sign matrix
    * enters the plan as a literal nested array (dOut x dIn longs).
    */
  def project(vec: Column, dIn: Int, dOut: Int): Column = {
    val signs = array((0 until dOut).map(j =>
      array((0 until dIn).map(k => lit(sign(j, k))): _*)): _*)
    transform(sequence(lit(0), lit(dOut - 1)), j =>
      aggregate(sequence(lit(0), lit(dIn - 1)), lit(0L),
        (acc, k) => acc +
          round(element_at(vec, k + 1).cast("double") * 1e6).cast("long") *
          element_at(element_at(signs, j + 1), k + 1)))
  }

  /** Brute-force top-`k` neighbors per probe query ON THE SKETCH:
    * squared L2 over the dOut integer coordinates (exact integer
    * arithmetic), rank (d2 asc, neighbor_id). Same declared O(N*Q)
    * baseline shape as the exact scans (q34/q87) — the point is the 8x
    * narrower operand, not a better join. Returns
    * (query_id, rnk, neighbor_id, d2).
    */
  def sketchTopK(vecs: DataFrame, queryFilter: Column, dIn: Int,
      dOut: Int, k: Int): DataFrame = {
    val sk = vecs.select(col("id"), project(col("vec"), dIn, dOut).as("p"))
    val q = sk.filter(queryFilter)
      .select(col("id").as("query_id"), col("p").as("pq"))
    val d2 = aggregate(sequence(lit(0), lit(dOut - 1)), lit(0L),
      (acc, j) => {
        val diff = element_at(col("pq"), j + 1) -
          element_at(col("p"), j + 1)
        acc + diff * diff
      })
    val scored = sk.join(broadcast(q),
        col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"), d2.as("d2"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("d2"))
  }
}
