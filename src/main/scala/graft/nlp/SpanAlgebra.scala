package graft.nlp

import scala.collection.mutable.ArrayBuffer

/** Span set/interval operations (`/root/reference/edsnlp/utils/filter.py`).
  * All char-interval based; per-document (row-local) — the distributed form
  * is just `transform`/`filter` over the spans array column.
  */
object SpanAlgebra {

  /** Greedy overlap resolution, longest-leftmost first
    * (`filter.py:45-129`). With `labelToRemove` set (pseudo-cue
    * suppression): spans of that label claim their range and are dropped
    * from the result; other spans are dropped only when overlapping a
    * claimed range — and do NOT claim ranges themselves.
    */
  def filterSpans(
      spans: Seq[Ent],
      labelToRemove: Option[String] = None): Seq[Ent] = {
    val sorted = spans.sortBy(s => (-(s.end - s.begin), s.begin))
    val claimed = new ArrayBuffer[(Int, Int)]
    val result = new ArrayBuffer[Ent]
    def overlaps(b: Int, e: Int): Boolean =
      claimed.exists { case (cb, ce) => b < ce && e > cb }
    sorted.foreach { s =>
      if (!overlaps(s.begin, s.end)) {
        if (!labelToRemove.contains(s.label)) result += s
        if (labelToRemove.forall(_ == s.label)) claimed += ((s.begin, s.end))
      }
    }
    result.sortBy(_.begin).toSeq
  }

  /** Split spans by predicate: (matching, remainder) (`filter.py:131-188`). */
  def consumeSpans(
      spans: Seq[Ent],
      pred: Ent => Boolean): (Seq[Ent], Seq[Ent]) =
    spans.partition(pred)

  /** For each target span, the source spans overlapping it
    * (`filter.py:234-289`). Begin-sorted array + max-end prefix: binary
    * search to the target's begin, then walk back only while some earlier
    * source can still reach past t.begin (overlaps are not contiguous in
    * begin order — a long early span can overlap when its neighbors
    * don't, so the prune must use the prefix maximum of ends).
    */
  def alignSpans(sources: Seq[Ent], targets: Seq[Ent]): Seq[Seq[Ent]] = {
    val srt = sources.sortBy(_.begin).toArray
    val maxEnd = new Array[Int](srt.length)
    var m = Int.MinValue
    var k = 0
    while (k < srt.length) {
      m = math.max(m, srt(k).end)
      maxEnd(k) = m
      k += 1
    }
    targets.map { t =>
      var lo = 0
      var hi = srt.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (srt(mid).begin < t.begin) lo = mid + 1 else hi = mid
      }
      var start = lo
      while (start > 0 && maxEnd(start - 1) > t.begin) start -= 1
      val acc = new ArrayBuffer[Ent]
      var i = start
      while (i < srt.length && srt(i).begin < t.end) {
        if (srt(i).end > t.begin) acc += srt(i)
        i += 1
      }
      acc.toSeq
    }
  }

  /** Token-overlap dice coefficient between two spans
    * (`filter.py:212-233`), on char intervals.
    */
  def spanF1(a: Ent, b: Ent): Double = {
    val inter = math.max(0, math.min(a.end, b.end) - math.max(a.begin, b.begin))
    val denom = (a.end - a.begin) + (b.end - b.begin)
    if (denom == 0) 0.0 else 2.0 * inter / denom
  }
}
