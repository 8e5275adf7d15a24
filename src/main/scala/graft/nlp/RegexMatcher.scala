package graft.nlp

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Named-regex matcher over raw text or over the normalized "clean text"
  * with offset re-alignment back to the original, the re-expression of
  * `/root/reference/edsnlp/matchers/regex.py:166-494` (realignment
  * `:68-165`): matching on clean text sees pollution/space-free normalized
  * chars, and the prefix-sum offset array maps every clean offset back to a
  * raw char offset so spans stay anchored in the original document.
  */
final class RegexMatcher private (
    compiled: Seq[(String, Pattern)],
    attrNorm: Boolean) extends Serializable {

  def findMatches(tokens: Array[Token], text: String): Seq[Ent] = {
    if (text == null) return Nil
    val (hay, cleanToRaw) =
      if (attrNorm) Normalizer.cleanTextWithOffsets(tokens, useNorm = true)
      else (text, null)
    val out = new ArrayBuffer[Ent]
    compiled.foreach { case (label, pat) =>
      val m = pat.matcher(hay)
      while (m.find()) {
        val (b, e) =
          if (cleanToRaw == null) (m.start, m.end)
          else {
            val rb = cleanToRaw(m.start)
            val re =
              if (m.end > m.start) cleanToRaw(m.end - 1) + 1
              else rb
            (rb, re)
          }
        out += Ent(b, e, label,
          if (b <= e && e <= text.length) text.substring(b, e) else m.group())
      }
    }
    out.toSeq
  }
}

object RegexMatcher {
  def build(
      patterns: Map[String, Seq[String]],
      attrNorm: Boolean = false,
      flags: Int = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
      : RegexMatcher =
    new RegexMatcher(
      patterns.toSeq.flatMap { case (label, ps) =>
        ps.map(p => label -> Pattern.compile(p, flags))
      },
      attrNorm)
}
