package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.{Ent, RegexMatcher => RM, Sent, Token}

/** Anchor-plus-context matching — re-expression of
  * `/root/reference/edsnlp/pipes/core/contextual_matcher/
  * contextual_matcher.py:20-466` (window/config models `models.py:46-310`):
  * an anchor match survives only if no `exclude` pattern fires in its
  * context window and every `include` rule does; `assign` patterns
  * extract sub-fields from the window into the entity's attrs.
  *
  * Full reference semantics carried over:
  *   - exclude/include matches that fall ENTIRELY INSIDE the anchor span
  *     do not count (`contextual_matcher.py:210-243` — "ASA 5" is not
  *     excluded by its own "5");
  *   - assign rules collect ALL window matches; `reduceMode`
  *     `keep_first`/`keep_last` keeps the match closest/farthest from the
  *     anchor (`assign_one`, `:321-327`), `None` keeps the whole list;
  *   - `required` assigns veto the entity when unmatched (`:314-316`);
  *   - `replaceEntity` re-anchors the entity on the assign matches — one
  *     entity per remaining match (`:331-400`);
  *   - `includeAssigned` widens the entity to cover the anchor plus all
  *     assigned spans (`:359-391`);
  *   - `spanFromGroup` narrows a regex anchor to its first capture group
  *     (`models.py` span_from_group).
  *
  * Windows here are CHARACTER windows (the reference counts tokens);
  * callers scale by ~7-8 chars/token. Relationally this is anchor spans
  * anti-/semi-joined against pattern matches within a window — done
  * row-locally over the annotation arrays, so it distributes as a
  * narrow map.
  */
object ContextualMatcher {

  /** window: chars before/after the anchor; 0,0 = same sentence.
    * `windowQuery` overrides both with a ContextWindow expression
    * (`"words[-5:5] & sent"`, `"sents[-1:1]"` — the reference's window
    * DSL, token/sentence units).
    */
  case class SideRule(
      regex: Seq[String],
      windowBefore: Int = 0,
      windowAfter: Int = 0,
      sentenceWindow: Boolean = false,
      windowQuery: String = null)

  case class AssignRule(
      name: String,
      regex: String, // group 1 captured (or whole match)
      windowBefore: Int = 0,
      windowAfter: Int = 0,
      sentenceWindow: Boolean = false,
      expandEntity: Boolean = false,
      replaceEntity: Boolean = false,
      reduceMode: Option[String] = None, // keep_first | keep_last | None
      required: Boolean = false,
      windowQuery: String = null)

  case class Config(
      label: String,
      terms: Seq[String] = Seq.empty,
      regex: Seq[String] = Seq.empty,
      exclude: Seq[SideRule] = Seq.empty,
      include: Seq[SideRule] = Seq.empty,
      assign: Seq[AssignRule] = Seq.empty,
      includeAssigned: Boolean = false,
      spanFromGroup: Boolean = false,
      // regex_flags=0 in the reference (ADICAP codes are uppercase);
      // patterns opt back in with inline (?i)
      caseSensitive: Boolean = false)

  /** An assign result: the reduced single value, or the full match list
    * when the rule has no reduce mode (the reference's scalar-vs-list
    * `_.assigned` values).
    */
  sealed trait AssignedValue { def first: String }
  case class One(value: String) extends AssignedValue {
    def first: String = value
  }
  case class Many(values: Seq[String]) extends AssignedValue {
    def first: String = values.head
  }

  final class Matcher(config: Config) extends Serializable {
    private val flags =
      if (config.caseSensitive) 0
      else Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
    private val phrase =
      if (config.terms.nonEmpty)
        Some(graft.nlp.PhraseMatcher.build(Map(config.label -> config.terms)))
      else None
    private val regex =
      if (config.regex.nonEmpty)
        Some(RM.build(Map(config.label -> config.regex), flags = flags))
      else None
    private val anchorPats =
      if (config.spanFromGroup)
        config.regex.map(p => Pattern.compile(p, flags))
      else Nil
    private val excludePats = config.exclude.map(r =>
      (r, r.regex.map(p => Pattern.compile(p, flags)),
        Option(r.windowQuery).map(graft.nlp.ContextWindows.parse)))
    private val includePats = config.include.map(r =>
      (r, r.regex.map(p => Pattern.compile(p, flags)),
        Option(r.windowQuery).map(graft.nlp.ContextWindows.parse)))
    private val assignPats = config.assign.map(r =>
      (r, Pattern.compile(r.regex, flags),
        Option(r.windowQuery).map(graft.nlp.ContextWindows.parse)))

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

    /** One collected assign match: (value text, value span, full span). */
    private case class AMatch(value: String, vb: Int, ve: Int,
        fb: Int, fe: Int)

    /** Entities with their full assigned structure. */
    def findDetailed(
        text: String, tokens: Array[Token], sents: Seq[Sent])
        : Seq[(Ent, Map[String, AssignedValue])] = {
      // spaCy alignment_mode="expand": a regex anchor that ends inside a
      // token widens to the token's boundary ("GCS 1" over "GCS 15"
      // becomes "GCS 15")
      def expand(e: Ent): Ent = {
        val words = tokens.filterNot(graft.nlp.Normalizer.isSpace)
        val b = words.find(w => w.begin <= e.begin && w.end > e.begin)
          .map(_.begin).getOrElse(e.begin)
        val ee = words.find(w => w.begin < e.end && w.end >= e.end)
          .map(_.end).getOrElse(e.end)
        if (b == e.begin && ee == e.end) e
        else Ent(b, ee, e.label, text.substring(b, ee), e.attrs)
      }
      val anchors0 =
        phrase.map(_.findMatches(tokens, text)).getOrElse(Nil) ++
          (if (config.spanFromGroup) {
            // regex anchors narrowed to group 1 when present
            val out = new ArrayBuffer[Ent]
            anchorPats.foreach { p =>
              val m = p.matcher(text)
              while (m.find()) {
                val (b, e) =
                  if (m.groupCount() >= 1 && m.group(1) != null)
                    (m.start(1), m.end(1))
                  else (m.start, m.end)
                out += Ent(b, e, config.label, text.substring(b, e))
              }
            }
            out.toSeq.map(expand)
          } else
            regex.map(_.findMatches(tokens, text)).getOrElse(Nil)
              .map(expand))
      val out = new ArrayBuffer[(Ent, Map[String, AssignedValue])]
      graft.nlp.SpanAlgebra.filterSpans(anchors0).foreach { anchor =>
        processOne(text, tokens, sents, anchor).foreach(out += _)
      }
      // final overlap resolution, longest-first: two anchors producing
      // the same replaced span (e.g. "Codification ADICAP" has two
      // prefix anchors) collapse to one entity, mirroring the span
      // setter's ents filtering in the reference
      val claimed = new ArrayBuffer[(Int, Int)]
      out.toSeq
        .sortBy { case (e, _) => (-(e.end - e.begin), e.begin) }
        .filter { case (e, _) =>
          val free = !claimed.exists { case (b, en) =>
            e.begin < en && e.end > b
          }
          if (free) claimed += ((e.begin, e.end))
          free
        }
        .sortBy(_._1.begin)
    }

    private def processOne(
        text: String, tokens: Array[Token], sents: Seq[Sent], anchor: Ent)
        : Seq[(Ent, Map[String, AssignedValue])] = {
      def ruleWindow(
          q: Option[graft.nlp.ContextWindows.Win],
          before: Int, after: Int, sentence: Boolean): (Int, Int) =
        q match {
          case Some(w) => w(anchor.begin, anchor.end, tokens, sents)
          case None =>
            window(text, sents, anchor, before, after, sentence)
        }
      // a context match entirely inside the anchor span does not count
      // as an exclude/include hit (contextual_matcher.py:210-243)
      def outsideAnchorHits(
          pats: Seq[Pattern], wb: Int, ctx: String): Boolean =
        pats.exists { p =>
          val m = p.matcher(ctx)
          var hit = false
          while (!hit && m.find()) {
            val mb = wb + m.start
            val me = wb + m.end
            if (!(mb >= anchor.begin && me <= anchor.end)) hit = true
          }
          hit
        }
      val excluded = excludePats.exists { case (rule, pats, q) =>
        val (wb, we) = ruleWindow(q,
          rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
        outsideAnchorHits(pats, wb, text.substring(wb, we))
      }
      if (excluded) return Nil
      val includeOk = includePats.forall { case (rule, pats, q) =>
        val (wb, we) = ruleWindow(q,
          rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
        outsideAnchorHits(pats, wb, text.substring(wb, we))
      }
      if (!includeOk) return Nil

      // collect ALL assign matches per rule, then reduce
      var replaceKey: Option[String] = None
      var expandKeys: Set[String] = Set.empty
      val assigned = scala.collection.mutable.LinkedHashMap
        .empty[String, (AssignRule, Seq[AMatch])]
      assignPats.foreach { case (rule, pat, q) =>
        val (wb, we) = ruleWindow(q,
          rule.windowBefore, rule.windowAfter, rule.sentenceWindow)
        val m = pat.matcher(text.substring(wb, we))
        val ms = new ArrayBuffer[AMatch]
        while (m.find()) {
          val (vb, ve, v) =
            if (m.groupCount() >= 1 && m.group(1) != null)
              (wb + m.start(1), wb + m.end(1), m.group(1))
            else (wb + m.start, wb + m.end, m.group())
          ms += AMatch(v, vb, ve, wb + m.start, wb + m.end)
        }
        if (rule.required && ms.isEmpty) return Nil
        if (ms.nonEmpty) {
          if (rule.replaceEntity) replaceKey = Some(rule.name)
          if (rule.expandEntity) expandKeys += rule.name
          val reduced = rule.reduceMode match {
            case Some("keep_first") =>
              Seq(ms.minBy(a => math.abs(a.fb - anchor.begin)))
            case Some("keep_last") =>
              Seq(ms.maxBy(a => math.abs(a.fb - anchor.begin)))
            case _ => ms.toSeq
          }
          assigned += (rule.name -> (rule, reduced))
        }
      }

      // replacement matches, closest to the anchor first (:336-341)
      val sortedAssigned = replaceKey.fold(assigned) { k =>
        val (rule, ms) = assigned(k)
        assigned += (k -> (rule,
          ms.sortBy(a => math.abs(a.fb - anchor.begin))))
        assigned
      }
      def valueOf(rule: AssignRule, ms: Seq[AMatch]): AssignedValue =
        if (rule.reduceMode.isDefined) One(ms.head.value)
        else Many(ms.map(_.value))
      val ext: Map[String, AssignedValue] = sortedAssigned.map {
        case (n, (rule, ms)) => n -> valueOf(rule, ms)
      }.toMap

      def merge(spans: Seq[(Int, Int)]): Ent = {
        val b = spans.map(_._1).min
        val e = spans.map(_._2).max
        Ent(b, e, config.label, text.substring(b, e))
      }

      replaceKey match {
        case None =>
          val expandSpans = sortedAssigned.iterator.flatMap {
            case (n, (_, ms))
                if config.includeAssigned || expandKeys.contains(n) =>
              ms.map(a => (a.fb, a.fe))
            case _ => Nil
          }.toSeq
          val ent = merge((anchor.begin, anchor.end) +: expandSpans)
          Seq((ent, ext))
        case Some(k) =>
          val repl = sortedAssigned(k)._2
          val others = sortedAssigned.iterator.collect {
            case (n, (_, ms)) if n != k => ms.map(a => (a.fb, a.fe))
          }.flatten.toSeq
          val listReduce = sortedAssigned(k)._1.reduceMode.isEmpty
          val newEnts: Seq[Ent] =
            if (config.includeAssigned) {
              val head = merge(Seq((repl.head.fb, repl.head.fe),
                (anchor.begin, anchor.end)) ++ others)
              head +: repl.tail.map(a =>
                Ent(a.fb, a.fe, config.label, text.substring(a.fb, a.fe)))
            } else repl.map(a =>
              Ent(a.fb, a.fe, config.label, text.substring(a.fb, a.fe)))
          newEnts.zipWithIndex.map { case (e, idx) =>
            val perEnt = ext.map {
              case (n, v) if n == k && listReduce =>
                n -> One(v.asInstanceOf[Many].values(idx))
              case kv => kv
            }
            (e, perEnt)
          }
      }
    }

    /** Flat entity surface: attrs carry each assign's first value (the
      * legacy shape used by the NER pipes and declared queries).
      */
    def findMatches(
        text: String, tokens: Array[Token], sents: Seq[Sent]): Seq[Ent] =
      findDetailed(text, tokens, sents).map { case (e, ext) =>
        e.copy(attrs = e.attrs ++ ext.map { case (n, v) => n -> v.first })
      }
  }

  def matcher(config: Config): Matcher = new Matcher(config)
}
