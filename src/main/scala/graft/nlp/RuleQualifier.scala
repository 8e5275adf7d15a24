package graft.nlp

import scala.collection.mutable.ArrayBuffer

/** Cue-pattern config for one qualifier (negation, family, hypothesis, ...).
  */
case class QualifierPatterns(
    name: String,
    pseudo: Seq[String],
    preceding: Seq[String],
    following: Seq[String],
    precedingRegex: Seq[String],
    termination: Seq[String],
    /** Containment cues: an entity qualifies when one of these regex
      * matches CONTAINS it (the reference's quotation cue in
      * reported_speech/patterns.py — quoted content is reported speech
      * regardless of cue position). Scope boundaries do not apply.
      */
    containingRegex: Seq[String] = Nil)

/** The shared rule-based qualifier engine (the reference's "window
  * functions" — `/root/reference/edsnlp/pipes/qualifiers/base.py:63` and the
  * per-qualifier `process` methods, e.g. negation
  * `/root/reference/edsnlp/pipes/qualifiers/negation/negation.py:298-364`):
  *
  *  1. match cue terms (phrase, NORM attr) + cue regexes;
  *  2. suppress cues overlapping pseudo-cue matches
  *     (`filter_spans(label_to_remove="pseudo")`);
  *  3. cut the document into scopes at sentence starts and termination
  *     cues (`pipes/base.py:105-142`);
  *  4. an entity is qualified iff its scope contains a preceding cue
  *     ending before the entity, or a following cue starting after it.
  *
  * Row-local: distributed as an expression over (text, tokens, sents, ents)
  * columns — zero shuffle, embarrassingly parallel at 100 TB.
  */
final class RuleQualifier(patterns: QualifierPatterns) extends Serializable {

  private val phraseMatcher = PhraseMatcher.build(Map(
    "pseudo" -> patterns.pseudo,
    "preceding" -> patterns.preceding,
    "following" -> patterns.following,
    "termination" -> patterns.termination))

  private val regexMatcher =
    if (patterns.precedingRegex.isEmpty) None
    else Some(RegexMatcher.build(
      Map("preceding" -> patterns.precedingRegex), attrNorm = false))

  private val containingMatcher =
    if (patterns.containingRegex.isEmpty) None
    else Some(RegexMatcher.build(
      Map("containing" -> patterns.containingRegex), attrNorm = false))

  /** For each entity (in input order), whether the qualifier fires, plus
    * the triggering cues.
    */
  def qualify(
      text: String,
      tokens: Array[Token],
      sents: Array[Sent],
      ents: Seq[Ent]): Seq[(Boolean, Seq[Ent])] = {
    if (ents.isEmpty) return Nil
    val cues = phraseMatcher.findMatches(tokens, text) ++
      regexMatcher.map(_.findMatches(tokens, text)).getOrElse(Nil)

    // terminations derive from RAW matches, before pseudo suppression —
    // the reference order (negation.py:303-307): even a termination word
    // embedded in a longer cue cuts the scope ("avec" inside
    // "incompatible avec" self-terminates that cue, faithfully).
    val terminations = cues.filter(_.label == "termination")
    val docEnd = if (text == null) 0 else text.length
    val starts =
      (sents.map(_.begin) ++ terminations.map(_.begin) :+ docEnd)
        .distinct.sorted
    val boundaries = starts.zip(starts.drop(1))

    val matches = SpanAlgebra.filterSpans(cues, Some("pseudo"))

    val results = Array.fill[(Boolean, Seq[Ent])](ents.size)((false, Nil))

    // containment cues: independent of scopes/terminations — the cue
    // match must span the entity (quotation semantics)
    containingMatcher.foreach { cm =>
      val spans = cm.findMatches(tokens, text)
      ents.zipWithIndex.foreach { case (ent, i) =>
        val hit = spans.filter(s =>
          s.begin <= ent.begin && s.end >= ent.end)
        if (hit.nonEmpty)
          results(i) = (true, results(i)._2 ++ hit)
      }
    }

    boundaries.foreach { case (bStart, bEnd) =>
      val inScope = matches.filter(m => bStart <= m.begin && m.begin < bEnd)
      lazy val preceding = inScope.filter(_.label == "preceding")
      lazy val following = inScope.filter(_.label == "following")
      ents.zipWithIndex.foreach { case (ent, i) =>
        if (ent.begin < bEnd && ent.end > bStart) {
          val cuesHit = new ArrayBuffer[Ent]
          cuesHit ++= preceding.filter(_.end <= ent.begin)
          cuesHit ++= following.filter(_.begin >= ent.end)
          if (cuesHit.nonEmpty)
            results(i) = (true, results(i)._2 ++ cuesHit)
        }
      }
    }
    results.toSeq
  }

  /** Qualify and write the boolean into each entity's attrs map. */
  def apply(
      text: String,
      tokens: Array[Token],
      sents: Array[Sent],
      ents: Seq[Ent]): Seq[Ent] = {
    val res = qualify(text, tokens, sents, ents)
    ents.zip(res).map { case (e, (hit, _)) =>
      e.copy(attrs = e.attrs + (patterns.name -> hit.toString))
    }
  }
}
