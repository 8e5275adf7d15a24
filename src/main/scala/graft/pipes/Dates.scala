package graft.pipes

import java.time.{Duration, LocalDateTime}
import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** French clinical date/duration extraction with normalization — the
  * re-expression of `/root/reference/edsnlp/pipes/misc/dates/dates.py:
  * 28-503` and its pattern bank (`dates/patterns/`): absolute dates
  * (numeric and letter months, optional time), relative dates ("il y a
  * trois jours", "depuis 2 semaines", "dans un mois"), and bare durations
  * ("pendant trois semaines").
  *
  * Output entities carry typed attrs: `kind` (absolute|relative|duration),
  * calendar fields for absolute dates, `direction`/`value`/`unit` for
  * relative+duration, and — when a reference instant is supplied (the
  * `note_datetime` resolution of `dates/models.py:283-380`) — a resolved
  * ISO `datetime`.
  */
object Dates {

  private val monthMap: Map[String, Int] = Map(
    "janvier" -> 1, "janv" -> 1, "jan" -> 1,
    "fevrier" -> 2, "février" -> 2, "fev" -> 2, "fév" -> 2,
    "mars" -> 3, "avril" -> 4, "avr" -> 4, "mai" -> 5,
    "juin" -> 6, "juillet" -> 7, "juil" -> 7,
    "aout" -> 8, "août" -> 8,
    "septembre" -> 9, "sept" -> 9, "sep" -> 9,
    "octobre" -> 10, "oct" -> 10,
    "novembre" -> 11, "nov" -> 11,
    "decembre" -> 12, "décembre" -> 12, "dec" -> 12, "déc" -> 12)

  private val numberMap: Map[String, Int] = Map(
    "un" -> 1, "une" -> 1, "deux" -> 2, "trois" -> 3, "quatre" -> 4,
    "cinq" -> 5, "six" -> 6, "sept" -> 7, "huit" -> 8, "neuf" -> 9,
    "dix" -> 10, "onze" -> 11, "douze" -> 12, "quinze" -> 15,
    "vingt" -> 20, "trente" -> 30, "quarante" -> 40, "cinquante" -> 50)

  private val unitSeconds: Map[String, Long] = Map(
    "seconde" -> 1L, "minute" -> 60L, "heure" -> 3600L, "jour" -> 86400L,
    "semaine" -> 604800L, "mois" -> 2592000L, "an" -> 31536000L,
    "annee" -> 31536000L)

  private val monthAlt = monthMap.keys.toSeq.sortBy(-_.length).mkString("|")
  private val numAlt = numberMap.keys.toSeq.sortBy(-_.length).mkString("|")
  private val unitAlt =
    "secondes?|minutes?|heures?|jours?|semaines?|mois|ans?|ann[ée]es?"

  // numeric absolute: dd/mm/yyyy, dd-mm-yy, yyyy-mm-dd, with optional time
  private val numericAbs = Pattern.compile(
    "(?<![/\\d-])(?:(?<d>0?[1-9]|[12]\\d|3[01])[/.\\-\\s](?<m>0?[1-9]|1[0-2])[/.\\-\\s](?<y>\\d{4}|\\d{2})" +
      "|(?<y2>\\d{4})-(?<m2>0?[1-9]|1[0-2])-(?<d2>0?[1-9]|[12]\\d|3[01]))" +
      "(?:\\s+[àa]?\\s*(?<h>[01]?\\d|2[0-3])[h:](?<min>[0-5]\\d)?)?(?![/\\d-])",
    Pattern.CASE_INSENSITIVE)

  // letter-month absolute: "3 janvier 2021", "1er mars", "mars 2020".
  // Word-boundary lookaheads keep month/unit alternations from matching
  // inside ordinary words ("mai" in "maisons", "an" in "analyses").
  private val letterAbs = Pattern.compile(
    s"(?<![\\d/\\p{L}])(?:(?<d>0?[1-9]|[12]\\d|3[01])(?:er)?\\s+)?(?<mon>$monthAlt)(?![\\p{L}])(?:\\s+(?<y>\\d{4}))?(?![\\d/])",
    Pattern.CASE_INSENSITIVE)

  // relative: "il y a N unit", "depuis N unit", "dans N unit"
  private val relative = Pattern.compile(
    s"(?<trig>il\\s+y\\s+a|depuis|dans)\\s+(?<n>\\d+|$numAlt)\\s+(?<u>$unitAlt)(?![\\p{L}])",
    Pattern.CASE_INSENSITIVE)

  // day-relative specials: aujourd'hui / hier / demain / avant-hier /
  // après-demain (dates/patterns/relative.py "specific" bank)
  private val daySpecial = Pattern.compile(
    "(?i)\\b(?<w>aujourd['’]hui|avant[- ]hier|hier|apr[èe]s[- ]demain|demain)\\b")
  private val daySpecialOffsets: Map[String, Int] = Map(
    "aujourd'hui" -> 0, "hier" -> -1, "avant-hier" -> -2,
    "avant hier" -> -2, "demain" -> 1, "apres-demain" -> 2,
    "apres demain" -> 2)

  // duration: "pendant N unit", "durant N unit", "pour N unit"
  private val duration = Pattern.compile(
    s"(?<trig>pendant|durant|pour)\\s+(?<n>\\d+|$numAlt)\\s+(?<u>$unitAlt)(?![\\p{L}])",
    Pattern.CASE_INSENSITIVE)

  private def parseNum(s: String): Int =
    numberMap.getOrElse(s.toLowerCase, s.toIntOption.getOrElse(0))

  private def canonUnit(u: String): String = {
    val base = graft.nlp.Normalizer.mapChars(u.toLowerCase)
    if (base == "mois") "mois"
    else if (base.startsWith("anne")) "annee"
    else base.stripSuffix("s")
  }

  /** Extract all date/duration mentions from raw text. `noteDatetime`
    * resolves relative dates when present.
    */
  def extract(
      text: String,
      noteDatetime: Option[LocalDateTime] = None): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]

    val nm = numericAbs.matcher(text)
    while (nm.find()) {
      val (d, m, y) =
        if (nm.group("d") != null)
          (nm.group("d").toInt, nm.group("m").toInt, nm.group("y"))
        else (nm.group("d2").toInt, nm.group("m2").toInt, nm.group("y2"))
      val year = y.toInt match {
        case v if v < 100 => if (v > 30) 1900 + v else 2000 + v
        case v => v
      }
      var attrs = Map("kind" -> "absolute", "year" -> year.toString,
        "month" -> m.toString, "day" -> d.toString)
      if (nm.group("h") != null) {
        attrs += ("hour" -> nm.group("h").toInt.toString)
        attrs += ("minute" ->
          Option(nm.group("min")).map(_.toInt).getOrElse(0).toString)
      }
      attrs += ("datetime" -> "%04d-%02d-%02dT%02d:%02d:00".format(
        year, m, d,
        Option(nm.group("h")).map(_.toInt).getOrElse(0),
        Option(nm.group("min")).map(_.toInt).getOrElse(0)))
      out += Ent(nm.start, nm.end, "date", text.substring(nm.start, nm.end),
        attrs)
    }

    val lm = letterAbs.matcher(text)
    while (lm.find()) {
      // require at least day+month or month+year to avoid bare month noise
      if (lm.group("d") != null || lm.group("y") != null) {
        val month = monthMap(graft.nlp.Normalizer
          .mapChars(lm.group("mon").toLowerCase))
        var attrs = Map("kind" -> "absolute", "month" -> month.toString)
        Option(lm.group("d")).foreach(d => attrs += ("day" -> d.toInt.toString))
        Option(lm.group("y")).foreach(y => attrs += ("year" -> y))
        if (lm.group("y") != null && lm.group("d") != null)
          attrs += ("datetime" -> "%04d-%02d-%02dT00:00:00".format(
            lm.group("y").toInt, month, lm.group("d").toInt))
        out += Ent(lm.start, lm.end, "date",
          text.substring(lm.start, lm.end), attrs)
      }
    }

    val rm = relative.matcher(text)
    while (rm.find()) {
      val n = parseNum(rm.group("n"))
      val unit = canonUnit(rm.group("u"))
      val trig = rm.group("trig").toLowerCase.replaceAll("\\s+", " ")
      val dir = if (trig == "dans") "future" else "past"
      var attrs = Map("kind" -> "relative", "direction" -> dir,
        "value" -> n.toString, "unit" -> unit)
      noteDatetime.foreach { ref =>
        val secs = unitSeconds.getOrElse(unit, 0L) * n
        val resolved =
          if (dir == "past") ref.minus(Duration.ofSeconds(secs))
          else ref.plus(Duration.ofSeconds(secs))
        attrs += ("datetime" -> resolved.format(
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
      }
      out += Ent(rm.start, rm.end, "date", text.substring(rm.start, rm.end),
        attrs)
    }

    val sm = daySpecial.matcher(text)
    while (sm.find()) {
      val word = graft.nlp.Normalizer.mapChars(sm.group("w").toLowerCase)
      val offset = daySpecialOffsets(word)
      var attrs = Map("kind" -> "relative",
        "direction" -> (if (offset < 0) "past" else "future"),
        "value" -> math.abs(offset).toString, "unit" -> "jour")
      noteDatetime.foreach { ref =>
        attrs += ("datetime" -> ref.plusDays(offset).format(
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
      }
      out += Ent(sm.start, sm.end, "date", text.substring(sm.start, sm.end),
        attrs)
    }

    val dm = duration.matcher(text)
    while (dm.find()) {
      val n = parseNum(dm.group("n"))
      val unit = canonUnit(dm.group("u"))
      out += Ent(dm.start, dm.end, "duration",
        text.substring(dm.start, dm.end),
        Map("kind" -> "duration", "value" -> n.toString, "unit" -> unit,
          "duration_seconds" ->
            (unitSeconds.getOrElse(unit, 0L) * n).toString))
    }

    graft.nlp.SpanAlgebra.filterSpans(out.toSeq)
  }
}
