package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.{Ent, Normalizer}

/** Section segmentation: match known section titles, then each section is
  * the span from its title to the next title (or document end) — the
  * gap-fill of `/root/reference/edsnlp/pipes/misc/sections/sections.py:
  * 13-200` with the title bank of `sections/patterns.py` (title lists
  * extracted at AP-HP; representative subset, extensible by config).
  *
  * Row-local form here; the relational form of the gap-fill is
  * `lead(begin) OVER (PARTITION BY note_id ORDER BY begin)` on the exploded
  * title table (SURVEY.md §2.11 window surface).
  */
object Sections {

  /** label -> title variants (matched on accent-folded lowercase norm). */
  val defaultTitles: Map[String, Seq[String]] = Map(
    "allergies" -> Seq("allergies"),
    "antecedents" -> Seq("antecedents", "antecedents medicaux",
      "antecedents chirurgicaux", "antecedents personnels", "atcd"),
    "antecedents_familiaux" -> Seq("antecedents familiaux"),
    "traitements_entree" -> Seq("traitement a l'entree",
      "traitement actuel", "traitement en cours", "traitements a l'entree"),
    "conclusion" -> Seq("au total", "conclusion", "synthese",
      "synthese medicale", "conclusion de sortie"),
    "habitus" -> Seq("mode de vie", "habitus", "contexte familial et social"),
    "diagnostic" -> Seq("diagnostic retenu"),
    "examens" -> Seq("examen clinique", "examens cliniques",
      "examen clinique a l'entree"),
    "examens_complementaires" -> Seq("examens complementaires",
      "examen complementaire", "biologie", "imagerie"),
    "facteurs_de_risques" -> Seq("facteurs de risque",
      "facteurs de risques"),
    "histoire_de_la_maladie" -> Seq("histoire de la maladie",
      "histoire recente", "histoire recente de la maladie",
      "rappel clinique", "resume clinique"),
    "motif" -> Seq("motif", "motif de l'hospitalisation",
      "motif d'hospitalisation", "motif de consultation"),
    "prescriptions" -> Seq("prescriptions de sortie", "ordonnance",
      "prescriptions medicales de sortie"),
    "traitements_sortie" -> Seq("traitement de sortie"),
    "evolution" -> Seq("evolution", "evolution dans le service"),
    "modalites_sortie" -> Seq("modalites de sortie"),
    "vaccinations" -> Seq("vaccinations", "vaccins"))

  final class Matcher(titles: Map[String, Seq[String]]) extends Serializable {
    // title must sit at line start, optionally followed by ':'
    private val pattern: Pattern = {
      val alts = titles.toSeq.flatMap { case (label, ts) =>
        ts.map(t => (label, t))
      }.sortBy(-_._2.length)
        .map(_._2).map(Pattern.quote).mkString("|")
      Pattern.compile(s"(?im)^[ \\t]*(?<t>$alts)[ \\t]*:?[ \\t]*$$|(?im)^[ \\t]*(?<t2>$alts)[ \\t]*:")
    }
    private val labelOf: Map[String, String] =
      titles.flatMap { case (label, ts) => ts.map(t => t -> label) }

    /** (titles, sections): title spans and gap-filled section spans. */
    def apply(text: String): (Seq[Ent], Seq[Ent]) = {
      if (text == null) return (Nil, Nil)
      // match on accent-folded lowercase text. Per-CHAR lowercase is
      // locale-independent and fixed-length (String.toLowerCase is
      // neither: U+0130 expands to two chars and tr locales break 'I'),
      // which keeps every matched offset valid in the original text.
      val folded = Normalizer.mapChars(text.map(Character.toLowerCase))
      val m = pattern.matcher(folded)
      val titleSpans = new ArrayBuffer[Ent]
      while (m.find()) {
        val g = if (m.group("t") != null) "t" else "t2"
        val b = m.start(g)
        val e = m.end(g)
        titleSpans += Ent(b, e, labelOf(folded.substring(b, e)),
          text.substring(b, e))
      }
      val titlesKept = graft.nlp.SpanAlgebra.filterSpans(titleSpans.toSeq)
      val sections = titlesKept.zipWithIndex.map { case (t, i) =>
        val end =
          if (i + 1 < titlesKept.size) titlesKept(i + 1).begin
          else text.length
        Ent(t.begin, end, t.label, "", Map("title" -> t.text))
      }
      (titlesKept, sections)
    }
  }

  def matcher(titles: Map[String, Seq[String]] = defaultTitles): Matcher =
    new Matcher(titles)
}
