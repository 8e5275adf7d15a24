package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate neighbor. */
case class Scored(neighbor_id: Long, sim: Double)

/** Bounded buffer wrapper so the aggregation state has a product encoder
  * (kept best-first, never longer than k).
  */
case class TopKBuf(items: Seq[Scored])

/** Partition-local top-k by (sim desc, neighbor_id asc) — the same total
  * order `row_number` over `Window.partitionBy(query).orderBy(sim.desc,
  * neighbor_id)` uses, so swapping the window for this aggregator is
  * output-identical.
  *
  * Scale rationale: a window top-k shuffles EVERY scored row to the
  * query's partition and sorts there (N·Q rows for brute-force ANN). A
  * typed Aggregator gets map-side partial aggregation, so at most k rows
  * per (input partition, query) ever reach the exchange — the shuffle is
  * O(partitions · queries · k) regardless of corpus size. Mirrors the
  * reference's per-worker batching of scored candidates
  * (edsnlp/processing/multiprocessing.py keeps per-worker partial results)
  * re-expressed as Spark partial aggregation.
  */
/** Element-wise running sum + count for a vector column — the partial
  * state of a distributed mean. Seeded lazily from the first vector so
  * the aggregator needs no dimension parameter.
  */
case class VecSumBuf(sums: Seq[Double], n: Long)

/** Element-wise MEAN of a vector column as a typed Aggregator: map-side
  * partial sums, one (dim-doubles, count) pair per (partition, group)
  * at the exchange. The reduction layer of the distributed Lloyd step
  * in [[Ann.fitCentersDistributed]].
  */
class VecMeanAggregator
    extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {
  override def zero: VecSumBuf = VecSumBuf(Nil, 0L)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf =
    if (v == null) b
    else if (b.n == 0L) VecSumBuf(v, 1L)
    else {
      val s = b.sums.toArray
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VecSumBuf(s.toSeq, b.n + 1)
    }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sums.toArray
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VecSumBuf(s.toSeq, a.n + b.n)
    }

  override def finish(b: VecSumBuf): Seq[Double] =
    if (b.n == 0L) Nil else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecSumBuf] =
    Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

class TopKAggregator(k: Int)
    extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def better(x: Scored, y: Scored): Boolean =
    x.sim > y.sim || (x.sim == y.sim && x.neighbor_id < y.neighbor_id)

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(buf: TopKBuf, r: Scored): TopKBuf = {
    val items = buf.items
    if (items.size >= k && !better(r, items.last)) buf
    else TopKBuf(((items :+ r).sortWith(better)).take(k))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sortWith(better).take(k))

  override def finish(buf: TopKBuf): Seq[Scored] = buf.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[Scored]]()
  }
}

/** One candidate under an exact integer distance (smaller = better). */
case class ScoredL(neighbor_id: Long, d2: Long)

case class TopKLBuf(items: Seq[ScoredL])

/** [[TopKAggregator]] with an exact LONG distance key ordered
  * ascending — (d2 asc, neighbor_id asc). Exists because squared
  * integer distances can exceed 2^53, where routing them through the
  * double-keyed aggregator could merge distinct keys at the top-k
  * boundary; the integer comparison has no such cliff.
  */
class TopKLongAggregator(k: Int)
    extends Aggregator[ScoredL, TopKLBuf, Seq[ScoredL]] {
  require(k > 0, "k must be positive")

  private def better(x: ScoredL, y: ScoredL): Boolean =
    x.d2 < y.d2 || (x.d2 == y.d2 && x.neighbor_id < y.neighbor_id)

  override def zero: TopKLBuf = TopKLBuf(Nil)

  override def reduce(buf: TopKLBuf, r: ScoredL): TopKLBuf = {
    val items = buf.items
    if (items.size >= k && !better(r, items.last)) buf
    else TopKLBuf(((items :+ r).sortWith(better)).take(k))
  }

  override def merge(a: TopKLBuf, b: TopKLBuf): TopKLBuf =
    TopKLBuf((a.items ++ b.items).sortWith(better).take(k))

  override def finish(buf: TopKLBuf): Seq[ScoredL] = buf.items

  override def bufferEncoder: Encoder[TopKLBuf] =
    Encoders.product[TopKLBuf]
  override def outputEncoder: Encoder[Seq[ScoredL]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[ScoredL]]()
  }
}
