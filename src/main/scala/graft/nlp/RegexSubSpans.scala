package graft.nlp

import java.util.regex.{Matcher, Pattern}
import scala.collection.mutable.ArrayBuffer

/** Span-tracking regex substitution — the re-expression of
  * `/root/reference/edsnlp/utils/fuzzy_alignment.py:11-115`
  * (`DeltaCollection`, `regex_sub_with_spans`,
  * `regex_multisub_with_spans`): apply a chain of regex replacements to a
  * text while recording, for every edit, the replaced interval and its
  * length delta, so that annotation offsets can be mapped forward into
  * the edited text (`apply`) or backward into the original (`unapply`).
  *
  * This is the offset bookkeeping that lets a cleaning pass (space
  * normalization, pollution removal, markup stripping) compose with
  * span-producing pipes without losing alignment — the same contract as
  * the normalizer's clean-text realignment, but for arbitrary
  * length-CHANGING substitutions rather than 1:1 character rewrites.
  */
object RegexSubSpans {

  /** A set of edits: interval [begin, end) in the ORIGINAL text was
    * replaced by a string whose length differs by `delta`. Intervals are
    * kept sorted by (begin, end); `apply`/`unapply` scan them per
    * position (edit counts are small — one per regex match).
    */
  final case class DeltaCollection(
      begins: IndexedSeq[Int], ends: IndexedSeq[Int],
      deltas: IndexedSeq[Int]) {

    /** Map original-text positions to edited-text positions. A position
      * at or past an edit's end shifts by its delta; a position strictly
      * INSIDE an edited interval snaps to the interval's replacement
      * boundary: `left` to its begin, `right` to its (shifted) end —
      * the first covering interval wins, as in the reference.
      */
    def apply(positions: Seq[Int], side: String = "left"): Seq[Int] =
      positions.map { p =>
        var toAdd = 0
        var i = 0
        while (i < begins.length) {
          if (p >= ends(i)) toAdd += deltas(i)
          i += 1
        }
        val covering = begins.indices.find(i =>
          begins(i) < p && p < ends(i))
        covering match {
          case Some(i) if side == "right" =>
            p + toAdd + (ends(i) - p + deltas(i))
          case Some(i) => p + toAdd + (begins(i) - p)
          case None => p + toAdd
        }
      }

    /** Map edited-text positions back to original-text positions.
      * Positions inside a replacement snap to the ORIGINAL interval's
      * begin (`left`) or end (`right`).
      */
    def unapply(positions: Seq[Int], side: String = "left"): Seq[Int] = {
      val newBegins = apply(begins, side = "left")
      val newEnds = apply(ends, side = "right")
      positions.map { p =>
        var toRemove = 0
        var i = 0
        while (i < newEnds.length) {
          if (p >= newEnds(i)) toRemove -= deltas(i)
          i += 1
        }
        val covering = newBegins.indices.find(i =>
          newBegins(i) < p && p < newEnds(i))
        covering match {
          case Some(i) if side == "right" => ends(i)
          case Some(i) => begins(i)
          case None => p + toRemove
        }
      }
    }

    /** Compose: `this` maps original -> text1, `other` maps
      * text1 -> text2; the sum maps original -> text2. Other's
      * intervals are pulled back into original coordinates and the edit
      * lists merged in (begin, end) order.
      */
    def +(other: DeltaCollection): DeltaCollection = {
      if (begins.isEmpty) return other
      if (other.begins.isEmpty) return this
      val pulledBegins = unapply(other.begins, side = "left")
      val pulledEnds = unapply(other.ends, side = "right")
      val all = (pulledBegins.zip(pulledEnds).zip(other.deltas) ++
        begins.zip(ends).zip(deltas))
        .map { case ((b, e), d) => (b, e, d) }
        .sortBy { case (b, e, _) => (b, e) }
      DeltaCollection(all.map(_._1).toIndexedSeq,
        all.map(_._2).toIndexedSeq, all.map(_._3).toIndexedSeq)
    }
  }

  object DeltaCollection {
    val empty: DeltaCollection =
      DeltaCollection(IndexedSeq.empty, IndexedSeq.empty, IndexedSeq.empty)
  }

  private val GroupRef = Pattern.compile("\\\\([0-9]+)|\\\\g<([0-9]+)>")

  /** Expand `\N` / `\g<N>` references in a replacement template with the
    * match's group texts (standard semantics: `\N` is group N — the
    * reference's `make_str_from_groups` substitutes groups in order of
    * first appearance instead, which coincides for the common
    * ascending-reference case and is surprising otherwise).
    */
  private def expandReplacement(template: String, m: Matcher): String = {
    // java.lang.StringBuilder explicitly: the Scala one resolves
    // append(s, from, to) by AUTO-TUPLING into append(Any)
    val sb = new java.lang.StringBuilder
    val gm = GroupRef.matcher(template)
    var last = 0
    while (gm.find()) {
      sb.append(template, last, gm.start)
      val n = (if (gm.group(1) != null) gm.group(1) else gm.group(2)).toInt
      val g = if (n <= m.groupCount) Option(m.group(n)).getOrElse("") else ""
      sb.append(g)
      last = gm.end
    }
    sb.append(template, last, template.length)
    sb.toString
  }

  /** One pattern: replace every match (DOTALL, as in the reference) and
    * record each edit. Edits are applied right-to-left so earlier
    * offsets stay valid while editing; the returned collection is in
    * left-to-right order.
    */
  def subWithSpans(pattern: String, replacement: String, text: String)
      : (String, DeltaCollection) =
    subWithSpans(Pattern.compile(pattern, Pattern.DOTALL), replacement,
      text)

  /** Pre-compiled variant — use inside per-row UDFs so the pattern
    * compiles once per executor, not once per document.
    */
  def subWithSpans(p: Pattern, replacement: String, text: String)
      : (String, DeltaCollection) = {
    val matches = {
      val m = p.matcher(text)
      val buf = new ArrayBuffer[(Int, Int, String)]
      while (m.find()) buf += ((m.start, m.end, expandReplacement(replacement, m)))
      buf.toSeq
    }
    var out = text
    matches.reverseIterator.foreach { case (s, e, mid) =>
      out = out.substring(0, s) + mid + out.substring(e)
    }
    val ds = matches.map { case (s, e, mid) => (s, e, mid.length - (e - s)) }
    (out, DeltaCollection(ds.map(_._1).toIndexedSeq,
      ds.map(_._2).toIndexedSeq, ds.map(_._3).toIndexedSeq))
  }

  /** Chain several (pattern, replacement) substitutions, composing their
    * deltas so the result maps ORIGINAL offsets to final-text offsets.
    */
  def multisubWithSpans(
      patterns: Seq[String], replacements: Seq[String], text: String)
      : (String, DeltaCollection) = {
    var t = text
    var acc = DeltaCollection.empty
    patterns.zip(replacements).foreach { case (p, r) =>
      val (t2, d) = subWithSpans(p, r, t)
      t = t2
      acc = acc + d
    }
    (t, acc)
  }
}
