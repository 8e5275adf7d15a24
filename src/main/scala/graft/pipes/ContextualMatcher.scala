package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.{Ent, RegexMatcher => RM, Sent, Token}

/** Anchor-plus-context matching — re-expression of
  * `/root/reference/edsnlp/pipes/core/contextual_matcher/
  * contextual_matcher.py:20-466` (window/config models `models.py:46-310`):
  * an anchor match survives only if no `exclude` pattern fires in its
  * context window and every `include` pattern does; `assign` patterns
  * extract sub-fields from the window into the entity's attrs, optionally
  * expanding the entity span.
  *
  * Relationally this is anchor spans anti-joined / semi-joined against
  * pattern matches within a char window — done row-locally over the
  * annotation arrays, so it distributes as a narrow map.
  */
object ContextualMatcher {

  /** window: chars before/after the anchor; 0,0 = same sentence. */
  case class SideRule(
      regex: Seq[String],
      windowBefore: Int = 0,
      windowAfter: Int = 0,
      sentenceWindow: Boolean = false)

  case class AssignRule(
      name: String,
      regex: String, // group 1 captured (or whole match)
      windowBefore: Int = 0,
      windowAfter: Int = 0,
      sentenceWindow: Boolean = false,
      expandEntity: Boolean = false)

  case class Config(
      label: String,
      terms: Seq[String] = Seq.empty,
      regex: Seq[String] = Seq.empty,
      exclude: Seq[SideRule] = Seq.empty,
      include: Seq[SideRule] = Seq.empty,
      assign: Seq[AssignRule] = Seq.empty)

  final class Matcher(config: Config) extends Serializable {
    private val phrase =
      if (config.terms.nonEmpty)
        Some(graft.nlp.PhraseMatcher.build(Map(config.label -> config.terms)))
      else None
    private val regex =
      if (config.regex.nonEmpty)
        Some(RM.build(Map(config.label -> config.regex)))
      else None
    private val excludePats = config.exclude.map(r =>
      (r, r.regex.map(p =>
        Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE))))
    private val includePats = config.include.map(r =>
      (r, r.regex.map(p =>
        Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE))))
    private val assignPats = config.assign.map(r =>
      (r, Pattern.compile(r.regex,
        Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)))

    private def window(
        text: String, sents: Seq[Sent], ent: Ent,
        before: Int, after: Int, sentence: Boolean): (Int, Int) =
      if (sentence) {
        sents.find(s => ent.begin < s.end && ent.end > s.begin)
          .map(s => (s.begin, s.end))
          .getOrElse((0, text.length))
      } else {
        (math.max(0, ent.begin - before),
          math.min(text.length, ent.end + after))
      }

    def findMatches(
        text: String, tokens: Array[Token], sents: Seq[Sent]): Seq[Ent] = {
      val anchors =
        phrase.map(_.findMatches(tokens, text)).getOrElse(Nil) ++
          regex.map(_.findMatches(tokens, text)).getOrElse(Nil)
      val out = new ArrayBuffer[Ent]
      graft.nlp.SpanAlgebra.filterSpans(anchors).foreach { anchor =>
        var keep = true
        excludePats.foreach { case (rule, pats) =>
          val (wb, we) = window(text, sents, anchor,
            rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
          val ctx = text.substring(wb, we)
          if (pats.exists(_.matcher(ctx).find())) keep = false
        }
        includePats.foreach { case (rule, pats) =>
          val (wb, we) = window(text, sents, anchor,
            rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
          val ctx = text.substring(wb, we)
          if (!pats.forall(_.matcher(ctx).find())) keep = false
        }
        if (keep) {
          var ent = anchor
          assignPats.foreach { case (rule, pat) =>
            val (wb, we) = window(text, sents, ent,
              rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
            val m = pat.matcher(text.substring(wb, we))
            if (m.find()) {
              val value =
                if (m.groupCount() >= 1 && m.group(1) != null) m.group(1)
                else m.group()
              ent = ent.copy(attrs = ent.attrs + (rule.name -> value))
              if (rule.expandEntity) {
                val nb = math.min(ent.begin, wb + m.start)
                val ne = math.max(ent.end, wb + m.end)
                ent = ent.copy(begin = nb, end = ne,
                  text = text.substring(nb, ne))
              }
            }
          }
          out += ent
        }
      }
      out.toSeq
    }
  }

  def matcher(config: Config): Matcher = new Matcher(config)
}
