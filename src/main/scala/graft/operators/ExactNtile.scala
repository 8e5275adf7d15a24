package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT `ntile(k)` over (value, id) order WITHOUT a global sort — the
  * curriculum/length-bucketing primitive ("assign every doc its
  * length decile", "quality quartile"): Spark's own `ntile` is a
  * Window over an un-partitioned ORDER BY, which funnels the whole
  * corpus through ONE reducer — the classic 100-TB cliff. Here the
  * k-1 bucket boundaries are located by histogram descent and the
  * assignment is a stateless expression over k-1 broadcast literals:
  * scan → filter/project, no Window, no sort, no wide shuffle.
  *
  * Bucket sizes match SQL `ntile`: the first (n mod k) buckets hold
  * ceil(n/k) rows, the rest floor(n/k), in ascending (value, id)
  * order — so a SQL engine replays the assignment bit-for-bit.
  *
  * Plan: one slim (id, value) projection is lazily checkpointed (the
  * value column may be expensive upstream — computed once, never
  * re-derived per descent round); one bounded value-histogram job
  * finds each boundary's VALUE and the residual rank inside its tie
  * set; tie sets are resolved to exact ids by three 16-bit id-prefix
  * descent rounds (all boundaries share each round's single job, the
  * `tokenBudgetSelection` shape) plus one final exact pass. Driver
  * state: O(distinct values) for the first histogram (guarded by
  * `maxDistinct` — above it, fall back to the bit-identical Window
  * form), O(2^16) per later round.
  *
  * Ids must be non-negative 64-bit and unique; values non-negative
  * longs (shift-based descent; scale fixed-point doubles to their
  * integer grid first — e.g. a 4dp-rounded score times 10^4).
  */
object ExactNtile {

  def ntile(docs: DataFrame, idCol: String, valueCol: String, k: Int,
      maxDistinct: Int = 1 << 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession

    val slim = docs
      .select(col(idCol).cast("long").as("_id"),
        col(valueCol).cast("long").as("_v"))
      .localCheckpoint(false)
    try {
      val hist = slim.groupBy(col("_v")).agg(count(lit(1)).as("_c"))
      val nDistinct = hist.count()
      if (nDistinct > maxDistinct)
        return ntileWindow(docs, idCol, valueCol, k)
      val buckets = hist.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      require(buckets.forall(_._1 >= 0),
        "exact ntile requires non-negative values (shift descent)")
      val total = buckets.iterator.map(_._2).sum
      if (total == 0L) return ntileWindow(docs, idCol, valueCol, k)

      // SQL ntile boundary ranks: R_j = j*floor(n/k) + min(j, n mod k)
      val q = total / k
      val rem = total % k
      val ranks = (1 until k).map(j => j * q + math.min(j, rem))
        .filter(r => r > 0 && r < total) // k > n: empty tail buckets

      // boundary rank -> (value, residual rank inside the tie set)
      var cum = 0L
      var bi = 0
      val atValue = ranks.map { r =>
        while (cum + buckets(bi)._2 < r) { cum += buckets(bi)._2; bi += 1 }
        (r, buckets(bi)._1, r - cum) // 1-based rank within value's ties
      }

      // resolve each boundary's exact id: rr-th smallest id among
      // docs with that value, via shared-round 16-bit prefix descent
      var state = atValue.map { case (r, v, rr) => r -> (v, 0L, rr) }
        .toMap // rank -> (value, resolved id prefix, residual rank)
      val shifts = Seq(48, 32, 16)
      shifts.zipWithIndex.foreach { case (shift, level) =>
        import spark.implicits._
        val probe = broadcast(state.toSeq
          .map { case (r, (v, pfx, _)) => (r, v, pfx) }
          .toDF("_r", "_bv", "_pfx"))
        val cond = col("_v") === col("_bv") &&
          (if (level == 0) lit(true)
           else shiftright(col("_id"), shift + 16) === col("_pfx"))
        val rows = slim.join(probe, cond)
          .groupBy(col("_r"), shiftright(col("_id"), shift).as("_b"))
          .agg(count(lit(1)).as("_c"))
          .collect()
          .groupBy(_.getLong(0))
        state = state.map { case (r, (v, _, rr)) =>
          val bs = rows(r).map(x => (x.getLong(1), x.getLong(2)))
            .sortBy(_._1)
          var rem2 = rr
          var i = 0
          while (bs(i)._2 < rem2) { rem2 -= bs(i)._2; i += 1 }
          r -> (v, bs(i)._1, rem2)
        }
      }
      // final exact pass inside each boundary's 16-bit id bucket
      val fin = {
        import spark.implicits._
        val probe = broadcast(state.toSeq
          .map { case (r, (v, pfx, _)) => (r, v, pfx) }
          .toDF("_r", "_bv", "_pfx"))
        slim.join(probe, col("_v") === col("_bv") &&
            shiftright(col("_id"), 16) === col("_pfx"))
          .select(col("_r"), col("_id"))
          .collect().groupBy(_.getLong(0))
      }
      val bounds = state.toSeq.map { case (r, (v, _, rr)) =>
        val ids = fin(r).map(_.getLong(1)).sorted
        (v, ids(rr.toInt - 1))
      }.sorted

      // assignment: 1 + #boundaries strictly before this (value, id) —
      // a pure codegen expression over k-1 literals, no join at all
      val arr = bounds.map { case (v, i) =>
        s"named_struct('v', CAST($v AS BIGINT), 'i', CAST($i AS BIGINT))"
      }.mkString("array(", ", ", ")")
      val v = col(valueCol).cast("long")
      val id = col(idCol).cast("long")
      val bucket =
        if (bounds.isEmpty) lit(1)
        else expr("1 + size(filter(" + arr + ", b -> b.v < __v OR " +
          "(b.v = __v AND b.i < __i)))")
      docs.withColumn("__v", v).withColumn("__i", id)
        .withColumn("bucket", bucket)
        .drop("__v", "__i")
    } finally {
      // release the slim checkpoint blocks (unpersist the RDD itself:
      // Dataset.unpersist is a no-op for localCheckpoint)
      slim.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))
    }
  }

  /** High-cardinality fallback: the classic Window `ntile(k)` over the
    * same (value, id) order — bit-identical buckets, paid for in the
    * single-reducer sort this operator exists to avoid.
    */
  private def ntileWindow(docs: DataFrame, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(valueCol).cast("long"), col(idCol).cast("long"))
    docs.withColumn("bucket", org.apache.spark.sql.functions.ntile(k).over(w))
  }
}
