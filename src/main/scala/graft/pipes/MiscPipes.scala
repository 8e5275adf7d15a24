package graft.pipes

import graft.nlp.{Ent, Sent, Token}

/** Hospitalisation-reason extraction (`eds.reason`,
  * `/root/reference/edsnlp/pipes/misc/reason/reason.py:13-208`): reason
  * trigger regexes, optionally restricted to the `motif` section —
  * relationally a regex match semi-joined against section spans.
  */
object Reason {
  private val matcher = graft.nlp.RegexMatcher.build(Map("reason" -> Seq(
    "(?i)motif\\s+(?:de\\s+)?(?:l[a']\\s*)?(?:hospitalisation|admission|consultation)",
    "(?i)(?:hospitalis[ée]e?|admise?)\\s+(?:pour|en raison de)\\s+([^.\\n]{3,80})",
    "(?i)pris[e]?\\s+en\\s+charge\\s+pour\\s+([^.\\n]{3,80})")))

  def extract(
      text: String,
      tokens: Array[Token],
      sections: Seq[Ent] = Nil): Seq[Ent] = {
    val hits = matcher.findMatches(tokens, text)
    val motif = sections.filter(_.label == "motif")
    if (motif.isEmpty) hits
    else hits.map { h =>
      val inMotif = motif.exists(s => h.begin < s.end && h.end > s.begin)
      h.copy(attrs = h.attrs + ("in_motif_section" -> inMotif.toString))
    }
  }
}

/** Consultation/report date extraction (`eds.consultation_dates`,
  * `/root/reference/edsnlp/pipes/misc/consultation_dates/
  * consultation_dates.py:14-218`): date mentions (from the dates pipe)
  * semi-joined with consultation trigger terms in a preceding window.
  */
object ConsultationDates {
  private val triggers = Seq(
    "consultation", "consult", "cs", "examen du", "visite du",
    "compte rendu du", "cr du", "vu le", "vue le")
  private val trigPat = java.util.regex.Pattern.compile(
    triggers.sortBy(-_.length).map(java.util.regex.Pattern.quote)
      .mkString("(?i)(?:", "|", ")"))

  def extract(text: String, window: Int = 30): Seq[Ent] = {
    val dates = Dates.extract(text)
    dates.filter(_.attrs.get("kind").contains("absolute")).flatMap { d =>
      val ctxStart = math.max(0, d.begin - window)
      val ctx = text.substring(ctxStart, d.begin)
      if (trigPat.matcher(ctx).find())
        Some(d.copy(label = "consultation_date"))
      else None
    }
  }
}

/** History qualifier refinement using sections + dates (`eds.history`,
  * `/root/reference/edsnlp/pipes/qualifiers/history/history.py`): an
  * entity is history-of-illness if the cue-based qualifier fires, OR the
  * entity sits in an antecedents section, OR its sentence holds a date
  * older than `historyYears` before note_datetime.
  */
object History {
  def qualify(
      text: String,
      tokens: Array[Token],
      sents: Array[Sent],
      ents: Seq[Ent],
      sections: Seq[Ent] = Nil,
      noteDatetime: Option[java.time.LocalDateTime] = None,
      historyYears: Int = 1): Seq[Ent] = {
    val cueBased = new graft.nlp.RuleQualifier(graft.nlp.Patterns.history)
      .qualify(text, tokens, sents, ents)
    val atcdSections = sections.filter(s =>
      s.label == "antecedents" || s.label == "antecedents_familiaux")
    val dates = Dates.extract(text, noteDatetime)
    ents.zip(cueBased).map { case (e, (cueHit, _)) =>
      val inAtcd = atcdSections.exists(s => e.begin < s.end && e.end > s.begin)
      val sent = sents.find(s => e.begin < s.end && e.end > s.begin)
      val oldDate = (noteDatetime, sent) match {
        case (Some(ref), Some(sn)) =>
          dates.exists { d =>
            d.begin < sn.end && d.end > sn.begin &&
            d.attrs.get("datetime").exists { iso =>
              try java.time.LocalDateTime.parse(iso)
                .isBefore(ref.minusYears(historyYears))
              catch { case _: Exception => false }
            }
          }
        case _ => false
      }
      e.copy(attrs = e.attrs +
        ("history" -> (cueHit || inAtcd || oldDate).toString))
    }
  }
}
