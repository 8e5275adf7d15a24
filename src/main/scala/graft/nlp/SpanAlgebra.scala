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
    * (`filter.py:234-289`). Sort + sweep, O((n+m) log) not O(n·m).
    */
  def alignSpans(sources: Seq[Ent], targets: Seq[Ent]): Seq[Seq[Ent]] = {
    val srt = sources.sortBy(_.begin).toArray
    targets.map { t =>
      // binary search for first source with end > t.begin
      var lo = 0
      var hi = srt.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (srt(mid).begin < t.begin) lo = mid + 1 else hi = mid
      }
      // walk back over sources starting before t.begin but overlapping
      var start = lo
      while (start > 0 && srt(start - 1).end > t.begin) start -= 1
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
