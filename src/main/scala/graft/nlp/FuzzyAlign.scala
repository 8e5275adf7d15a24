package graft.nlp

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Fuzzy annotation alignment between two similar-but-not-identical
  * texts — the re-expression of
  * `/root/reference/edsnlp/utils/fuzzy_alignment.py:180-460`: every
  * source fragment is searched in the target text (whitespace-tolerant
  * literal match), each occurrence is scored by MULTI-SCALE CONTEXT
  * SIMILARITY (difflib-style ratio of the left/right contexts at several
  * window sizes, weighted), and the best candidate wins if it clears the
  * threshold. Unlike diff-based transfer this survives insertions,
  * deletions and block swaps (the reference built it to migrate
  * annotations across document versions; here it also anchors LLM
  * echo-drifted output, [[graft.pipes.LlmAnnotator]]).
  *
  * Differences from the reference, by construction: instead of
  * space-normalizing both documents and un-applying offset deltas at the
  * end, the search regex itself is whitespace-tolerant
  * (`\s+`-joined literal parts), so candidate offsets are RAW target
  * offsets and no delta bookkeeping exists to get wrong; the similarity
  * is plain Ratcliff-Obershelp (difflib without the autojunk
  * heuristic).
  */
object FuzzyAlign {

  /** (context chars, weight) pairs — the reference `sim_scheme`. */
  val defaultScheme: Seq[(Int, Double)] =
    Seq(20 -> 0.70, 50 -> 0.20, 100 -> 0.15, 400 -> 0.10, 1000 -> 0.05)

  /** Alignment outcome: `aligned` are the GOOD fragments re-anchored in
    * the target text; unsure/missing counts surface the rest (the
    * reference returns the same tallies).
    */
  case class Result(
      aligned: Seq[Ent], good: Int, unsure: Int, missing: Int, total: Int)

  /** difflib `SequenceMatcher.ratio` semantics: 2·M / (|a|+|b|) where M
    * is the total size of Ratcliff-Obershelp matching blocks.
    */
  def ratio(a: String, b: String): Double = {
    val t = a.length + b.length
    if (t == 0) return 1.0
    2.0 * matchingChars(a, 0, a.length, b, 0, b.length) / t
  }

  private def matchingChars(
      a: String, ab: Int, ae: Int, b: String, bb: Int, be: Int): Int = {
    if (ab >= ae || bb >= be) return 0
    // longest common substring of a[ab,ae) x b[bb,be) via rolling DP
    val bn = be - bb
    var prev = new Array[Int](bn + 1)
    var cur = new Array[Int](bn + 1)
    var bestLen = 0
    var bestAi = 0
    var bestBi = 0
    var i = ab
    while (i < ae) {
      var j = bb
      while (j < be) {
        val v = if (a.charAt(i) == b.charAt(j)) prev(j - bb) + 1 else 0
        cur(j - bb + 1) = v
        if (v > bestLen) {
          bestLen = v; bestAi = i - v + 1; bestBi = j - v + 1
        }
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    if (bestLen == 0) 0
    else bestLen +
      matchingChars(a, ab, bestAi, b, bb, bestBi) +
      matchingChars(a, bestAi + bestLen, ae, b, bestBi + bestLen, be)
  }

  private def collapse(s: String): String = s.replaceAll("\\s+", " ")

  private def leftCtx(text: String, pos: Int, n: Int): String = {
    val c = collapse(text.substring(0, math.max(0, pos)))
    c.substring(math.max(0, c.length - n))
  }

  private def rightCtx(text: String, pos: Int, n: Int): String = {
    val c = collapse(text.substring(math.min(pos, text.length)))
    c.substring(0, math.min(n, c.length))
  }

  /** Whitespace-tolerant literal search: all raw-offset occurrences.
    * Second element of the result is true when the safety cap was hit —
    * the caller then treats the fragment as missing rather than risk
    * anchoring to a wrong occurrence it never scored (the reference
    * enumerates everything; the cap bounds adversarial boilerplate).
    */
  private def occurrences(
      needle: String, hay: String,
      cap: Int = 1000): (Seq[(Int, Int)], Boolean) = {
    val parts = needle.trim.split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return (Nil, false)
    val pat = Pattern.compile(parts.map(Pattern.quote).mkString("\\s+"))
    val m = pat.matcher(hay)
    val out = new ArrayBuffer[(Int, Int)]
    while (m.find() && out.size < cap) out += ((m.start, m.end))
    (out.toSeq, out.size >= cap)
  }

  /** Align `ents` (offsets in `oldText`) onto `newText`. Fragments whose
    * best candidate scores above `threshold` (range [0, 2]: summed
    * left+right similarity, weight-averaged) are re-anchored; the rest
    * are counted unsure/missing and dropped, like the reference.
    */
  def align(
      oldText: String, ents: Seq[Ent], newText: String,
      scheme: Seq[(Int, Double)] = defaultScheme,
      threshold: Double = 1.0): Result = {
    var good = 0; var unsure = 0; var missing = 0
    val out = new ArrayBuffer[Ent]
    val wSum = scheme.map(_._2).sum
    ents.foreach { e =>
      val origLen = e.end - e.begin
      var fragText = oldText.substring(
        math.max(0, e.begin), math.min(oldText.length, e.end))
      val tiny = fragText.length <= 2
      if (tiny) {
        // reference small-fragment fallback: first word from begin, else
        // a 10-char snippet
        val rest = oldText.substring(math.max(0, e.begin))
        fragText = rest.split("\\s+").find(_.nonEmpty).getOrElse("")
        if (fragText.length <= 2)
          fragText = rest.substring(0, math.min(10, rest.length))
      }
      var anchorEnd = false
      var anchorPos = e.begin
      var (cands, capped) = occurrences(fragText, newText)
      if ((tiny && cands.size > 20) || capped) { missing += 1 }
      else {
        if (cands.isEmpty) {
          // end-anchor fallback: snippet just AFTER the fragment
          anchorEnd = true
          anchorPos = e.end
          val after = oldText.substring(
            math.min(e.end, oldText.length))
          fragText = after.substring(0, math.min(10, after.length))
          val (c2, cap2) = occurrences(fragText, newText)
          cands = c2; capped = cap2
        }
        if ((tiny && cands.size > 20) || capped) missing += 1
        else if (cands.isEmpty) missing += 1
        else {
          // both sides' right context starts AFTER the search snippet
          // (the reference's virtual_fragment end — fuzzy_alignment.py
          // :317-329); including the snippet on one side only would
          // systematically deflate the score at small scales
          val oldCtx = scheme.map { case (n, _) =>
            (leftCtx(oldText, anchorPos, n),
              rightCtx(oldText, anchorPos + fragText.length, n))
          }
          val scored = cands.map { case (cb, ce) =>
            val s = scheme.zip(oldCtx).map {
              case ((n, w), (ol, or)) =>
                w * (ratio(ol, leftCtx(newText, cb, n)) +
                  ratio(or, rightCtx(newText, ce, n)))
            }.sum / wSum
            (cb, ce, s)
          }
          val (cb, ce, best) = scored.maxBy(_._3)
          if (best > threshold) {
            good += 1
            out += (if (anchorEnd) {
              // snippet sits after the (unfound) fragment: the entity
              // ends where the snippet begins; clamp so begin/end/text
              // stay mutually consistent near the doc start
              val b = math.max(0, cb - origLen)
              e.copy(begin = b, end = cb,
                text = newText.substring(b, cb))
            } else if (!tiny)
              // fragText == entity text: the match itself is the span
              // (ce accounts for whitespace differences inside it)
              e.copy(begin = cb, end = ce,
                text = newText.substring(cb, ce))
            else {
              val en = math.min(newText.length, cb + origLen)
              e.copy(begin = cb, end = en,
                text = newText.substring(cb, en))
            })
          } else unsure += 1
        }
      }
    }
    Result(out.toSeq, good, unsure, missing, ents.size)
  }
}
