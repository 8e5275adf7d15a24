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

  /** label -> title variants (matched on accent-folded lowercase norm) —
    * the full reference bank (`sections/patterns.py`, all 25 labels) with
    * its two regex-ish entries expanded to literal variants (this matcher
    * is a norm-level phrase trie), plus a few common extras kept from
    * round 1 (ordonnance, biologie, imagerie, motif de consultation).
    */
  val defaultTitles: Map[String, Seq[String]] = Map(
    "allergies" -> Seq("allergies"),
    "antecedents" -> Seq("antecedents",
      "antecedents medicaux et chirurgicaux", "antecedents medicaux",
      "antecedents chirurgicaux", "antecedents personnels", "atcd"),
    "antecedents_familiaux" -> Seq("antecedents familiaux"),
    "traitements_entree" -> Seq("attitude therapeutique initiale",
      "traitement a l'entree", "traitement actuel", "traitement en cours",
      "traitements a l'entree"),
    "conclusion" -> Seq("au total", "conclusion", "conclusion de sortie",
      "syntese medicale / conclusion", "synthese", "synthese medicale",
      "synthese medicale/conclusion", "conclusion medicale"),
    "conclusion_entree" -> Seq("conclusion a l'entree"),
    "habitus" -> Seq("contexte familial et social", "habitus",
      "mode de vie", "mode de vie - scolarite",
      "situation sociale, mode de vie"),
    "correspondants" -> Seq("correspondants"),
    "diagnostic" -> Seq("diagnostic retenu"),
    "donnees_biometriques_entree" -> Seq(
      "donnees biometriques et parametres vitaux a l'entree",
      "parametres vitaux et donnees biometriques a l'entree"),
    "examens" -> Seq("examen clinique", "examens cliniques",
      "examen clinique a l'entree"),
    "examens_complementaires" -> Seq("examens complementaires",
      "examen complementaire", "examen(s) complementaire(s)",
      "examens complementaires a l'entree",
      "examens complementaires realises a l'entree",
      "examens complementaires realises pendant le sejour",
      "examens para-cliniques", "imagerie post-operatoire",
      "biologie", "imagerie"),
    "facteurs_de_risques" -> Seq("facteurs de risque",
      "facteurs de risques"),
    "histoire_de_la_maladie" -> Seq("histoire de la maladie",
      "histoire de la maladie - explorations",
      "histoire de la maladie actuelle", "histoire du poids",
      "histoire recente", "histoire recente de la maladie",
      "rappel clinique", "resume", "resume clinique",
      "resume clinique - histoire de la maladie",
      "antecedents et histoire de la maladie"),
    "actes" -> Seq("intervention"),
    "motif" -> Seq("motif", "motif d'hospitalisation",
      "motif de l'hospitalisation", "motif medical",
      "motif de consultation"),
    "prescriptions" -> Seq("prescriptions de sortie", "ordonnance",
      "prescriptions medicales de sortie"),
    "traitements_sortie" -> Seq("traitement de sortie"),
    "evolution" -> Seq("evolution",
      "evolution et examen clinique aux lits portes",
      "evolution dans le service"),
    "modalites_sortie" -> Seq("modalites de sortie", "devenir du patient"),
    "vaccinations" -> Seq("vaccinations", "vaccination", "vaccins"),
    "introduction" -> Seq("compte rendu d'hospitalisation",
      "compte-rendu d'hospitalisation"))

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
