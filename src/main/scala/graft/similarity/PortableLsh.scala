package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PORTABLE banded sign-LSH (hyperplane LSH, Charikar 2002) whose whole
  * candidate structure an independent SQL oracle can replay: every
  * hyperplane entry is a +-1 Achlioptas sign derived from the shared md5
  * parity convention (`('0x' || substr(md5('pl:b:p:j'), 1, 15))::BIGINT
  * % 2` — the q33/q64/q94 trick), and the input vectors are integer, so
  * the per-plane dot products, the sign bits, and the r-bit band
  * signatures are exact integers in both engines. Two vectors are
  * candidates when ANY band signature matches — the classic OR-of-ANDs
  * recall/selectivity dial: r bits per band sharpen selectivity, more
  * bands recover recall.
  *
  * This exists for the DECLARED recall measurement (q104): the engine's
  * production path ([[Ann.lshTopK]]) keeps its fused engine-internal
  * hash family; this portable family makes the approximate candidate
  * set itself oracle-replayable, so recall@k against the exact baseline
  * is a hash-checked integer, not a trust-me number.
  *
  * Scale shape: signatures are row-local (one UDF pass over the
  * vector), candidates come from a band+signature equi-join, and
  * nothing is all-pairs. Reference analog: the capped-recall tradeoff
  * of edsnlp's simstring matcher (edsnlp/matchers/simstring.py)
  * made measurable.
  */
object PortableLsh {

  /** +-1 plane entry for (band b, bit p, input dim j) — driver-side
    * replica of the md5 parity the oracle SQL recomputes.
    */
  private[graft] def planeSign(b: Int, p: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pl:$b:$p:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1L
    else -1L
  }

  /** Integer vector -> `bands` band signatures, each the r-bit pattern
    * of `dot(plane, vec) > 0` signs. One fused JVM pass; the plane
    * table is precomputed once per call site (pure function of the
    * shape, nothing trained or shipped).
    */
  def bandSigs(vec: Column, dIn: Int, bands: Int, rBits: Int): Column =
    bandSigsUdf(dIn, bands, rBits)(vec)

  /** Exact integer-L2 top-k neighbor ids per query — the declared
    * O(N·Q) ground-truth baseline, factored out for reuse (recall
    * measurement, kNN-by-retrieval classification). Returns
    * (query_id, neighbor_id) rows under the (d2 asc, id asc) total
    * order; queries are broadcast (the small side by contract) and
    * the top-k aggregator ships k rows per (partition, query).
    */
  def exactTopK(vecs: DataFrame, queryFilter: Column, dIn: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val v = vecs.localCheckpoint()
    val qv = v.filter(queryFilter)
      .select(col("id").as("query_id"), col("vec").as("qv"))
    val cv = v.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val d2 = (0 until dIn).map { j =>
      val diff = element_at(col("qv"), j + 1) -
        element_at(col("cv"), j + 1)
      diff * diff
    }.reduce(_ + _)
    val topk = udaf(new TopKLongAggregator(k), Encoders.product[ScoredL])
    cv.join(broadcast(qv), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("d2")).as("t"))
      .select(col("query_id"), explode(col("t")).as("s"))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
  }

  /** MEASURED recall@k of the banded sign-LSH path against the exact
    * integer-L2 top-k baseline, one row per query: (query_id, n_hits)
    * with n_hits = |approx top-k ∩ exact top-k| — an integer both
    * engines reproduce bit-for-bit (integer vectors, integer distances,
    * (d2 asc, id) total order, md5-parity planes). `vecs` must be
    * (id, vec array<bigint>); `queryFilter` (over `id`) picks the query
    * sample, which is expected to be the small side.
    *
    * Plan shape: vectors materialize ONCE (five consumers); the
    * approximate side is signature projection + band equi-join + a
    * candidate-bounded top-k; the exact side is the declared O(N*Q)
    * baseline with the partial-aggregating top-k (k rows per
    * partition-query shuffle). Nothing all-pairs beyond the declared
    * exact baseline the measurement needs as ground truth.
    */
  def recallAtK(vecs: DataFrame, queryFilter: Column, dIn: Int,
      bands: Int, rBits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val v = vecs.localCheckpoint()
    val sigs = v.select(col("id"),
        posexplode(bandSigs(col("vec"), dIn, bands, rBits)))
      .select(col("id"), col("pos").as("band"), col("col").as("sig"))
    val cands = sigs.filter(queryFilter)
      .select(col("id").as("query_id"), col("band"), col("sig"))
      .join(sigs.select(col("id").as("neighbor_id"), col("band"),
        col("sig")), Seq("band", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = v.select(col("id").as("query_id"), col("vec").as("qv"))
    val cv = v.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val d2 = (0 until dIn).map { j =>
      val diff = element_at(col("qv"), j + 1) -
        element_at(col("cv"), j + 1)
      diff * diff
    }.reduce(_ + _)
    val topk = udaf(new TopKLongAggregator(k), Encoders.product[ScoredL])
    def topkOf(scored: DataFrame): DataFrame =
      scored.groupBy("query_id")
        .agg(topk(col("neighbor_id"), col("d2")).as("t"))
        .select(col("query_id"), explode(col("t")).as("s"))
        .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val approx = topkOf(
      cands.join(qv, "query_id").join(cv, "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), d2.as("d2")))
    val queries = v.filter(queryFilter)
      .select(col("id").as("query_id"), col("vec").as("qv"))
    val exact = topkOf(
      cv.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), d2.as("d2")))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).cast("int").as("n_hits"))
    queries.select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0)).as("n_hits"))
  }

  /** The recall CURVE over several band counts in one pass — the q140
    * shape. Equivalent to one [[recallAtK]] per level unioned with a
    * `bands` literal, but the level-INDEPENDENT work is shared: the
    * plane signs are a pure function of the band INDEX (`planeSign(b,
    * p, j)` never sees the level), so the signature table computed at
    * max(levels) contains every smaller level as its `band < level`
    * prefix; the exact integer-L2 ground truth does not depend on the
    * level at all. One vector checkpoint, one signature projection,
    * one O(N·Q) exact baseline — instead of one of each PER level
    * (measured: the exact baseline was 3x-recomputed in q140).
    * Returns (bands, query_id, n_hits), bit-identical per level to
    * [[recallAtK]].
    */
  def recallCurve(vecs: DataFrame, queryFilter: Column, dIn: Int,
      bandLevels: Seq[Int], rBits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(bandLevels.nonEmpty, "bandLevels must be non-empty")
    val v = vecs.localCheckpoint()
    val maxBands = bandLevels.max
    val sigs = v.select(col("id"),
        posexplode(bandSigs(col("vec"), dIn, maxBands, rBits)))
      .select(col("id"), col("pos").as("band"), col("col").as("sig"))
      .localCheckpoint()
    val qv = v.select(col("id").as("query_id"), col("vec").as("qv"))
    val cv = v.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val d2 = (0 until dIn).map { j =>
      val diff = element_at(col("qv"), j + 1) -
        element_at(col("cv"), j + 1)
      diff * diff
    }.reduce(_ + _)
    val topk = udaf(new TopKLongAggregator(k), Encoders.product[ScoredL])
    def topkOf(scored: DataFrame): DataFrame =
      scored.groupBy("query_id")
        .agg(topk(col("neighbor_id"), col("d2")).as("t"))
        .select(col("query_id"), explode(col("t")).as("s"))
        .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val queries = v.filter(queryFilter)
      .select(col("id").as("query_id"), col("vec").as("qv"))
    val exact = topkOf(
      cv.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), d2.as("d2")))
      .localCheckpoint(false)
    bandLevels.map { lvl =>
      val lvlSigs = sigs.filter(col("band") < lvl)
      val cands = lvlSigs.filter(queryFilter)
        .select(col("id").as("query_id"), col("band"), col("sig"))
        .join(lvlSigs.select(col("id").as("neighbor_id"), col("band"),
          col("sig")), Seq("band", "sig"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
      val approx = topkOf(
        cands.join(qv, "query_id").join(cv, "neighbor_id")
          .select(col("query_id"), col("neighbor_id"), d2.as("d2")))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).cast("int").as("n_hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(lit(lvl).as("bands"), col("query_id"),
          coalesce(col("n_hits"), lit(0)).as("n_hits"))
    }.reduce(_ unionByName _)
  }

  private def bandSigsUdf(dIn: Int, bands: Int, rBits: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(rBits > 0 && rBits < 63, "rBits must be in [1, 62]")
    val signs: Array[Array[Array[Long]]] =
      Array.tabulate(bands, rBits, dIn)((b, p, j) => planeSign(b, p, j))
    udf((v: Seq[Long]) => {
      if (v == null) null
      else {
        val arr = new Array[Long](dIn)
        var i = 0
        while (i < dIn) { arr(i) = v(i); i += 1 }
        val out = new Array[Long](bands)
        var b = 0
        while (b < bands) {
          var sig = 0L
          var p = 0
          while (p < rBits) {
            val s = signs(b)(p)
            var dot = 0L
            var j = 0
            while (j < dIn) {
              dot += (if (s(j) > 0) arr(j) else -arr(j))
              j += 1
            }
            if (dot > 0) sig |= (1L << p)
            p += 1
          }
          out(b) = sig
          b += 1
        }
        out.toSeq
      }
    })
  }
}
