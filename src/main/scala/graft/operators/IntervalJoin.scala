package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bounded interval join (attribution join): all (left, right) pairs
  * with equal keys and `rightTime` in `[leftTime - window, leftTime]`,
  * both ends inclusive — the "every view within 15 minutes before the
  * click" shape, where [[AsOfJoin]] keeps only the nearest match.
  *
  * Implementation is an EQUI-join on (key, time bucket) with the exact
  * range check folded into the join condition. Bucket width = the window:
  * a right row at time t can only match left rows in [t, t+w], which
  * spans at most two buckets, so the right side is exploded into exactly
  * two (bucket, bucket+1) copies and every candidate pair is produced
  * once — no dedup pass. Catalyst plans a shuffled hash/sort-merge join
  * on (key, bucket); candidates per task are bounded by 2 windows of one
  * key's traffic, never a whole key's history, so a plain key-equi-join's
  * quadratic blowup on hot keys (and the unbounded state it implies) is
  * structurally avoided. At 100 TB: the 2× right-side duplication costs
  * one narrow map; residual same-(key, bucket) skew is AQE skew-join
  * territory; same-instant and exact-window-edge matches are inclusive by
  * contract on both ends.
  *
  * Reference analog: interval alignment of spans against section/date
  * windows (`/root/reference/edsnlp/pipes/misc/sections/sections.py`,
  * qualifier context windows) re-expressed as a relational operator.
  */
object IntervalJoin {

  /** Left/right must share no column names; time columns are TimestampType.
    * `leftOuter = true` keeps unmatched left rows (right columns null) —
    * each unmatched left row emits exactly once (the left side is never
    * duplicated; only right rows fan out to their two candidate buckets).
    */
  def pairs(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      windowMicros: Long,
      leftOuter: Boolean = false): DataFrame = {
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    // Buckets use integer `div` (truncated division) — exact in codegen,
    // no double rounding. Truncation (not floor) is still bucket-correct
    // for ALL timestamps, negatives included: trunc(x - 1) = trunc(x) - 1
    // for every real x, so r in [l - w, l] always lands in bucket(l) or
    // bucket(l) - 1 — exactly the two copies the right side fans into.
    val lb = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__lb", expr(s"__lt div ${windowMicros}L"))
    val rb = right
      .withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__rb0", expr(s"__rt div ${windowMicros}L"))
      .withColumn("__rb", explode(array(col("__rb0"), col("__rb0") + 1)))
      .drop("__rb0")
    val cond = col("__lb") === col("__rb") &&
      col(leftKey) === col(rightKey) &&
      col("__rt").between(col("__lt") - windowMicros, col("__lt"))
    lb.join(rb, cond, if (leftOuter) "left_outer" else "inner")
      .drop("__lb", "__rb", "__lt", "__rt")
  }
}
