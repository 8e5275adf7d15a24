package graft.nlp

/** Cue-term banks for the rule-based qualifiers. Pattern banks are DATA, not
  * code (SURVEY.md §7.0): representative French clinical cue lists following
  * the reference's banks — negation `/root/reference/edsnlp/pipes/
  * qualifiers/negation/patterns.py`, family `.../family/patterns.py`,
  * hypothesis `.../hypothesis/patterns.py`, reported speech
  * `.../reported_speech/patterns.py`, terminations
  * `/root/reference/edsnlp/pipes/terminations.py`. Users can supply their
  * own lists per pipe, exactly like the reference.
  */
object Patterns {

  /** Proposition delimiters bounding a cue's scope. */
  val termination: Seq[String] = Seq(
    "et", "bien que", "même si", "mais", "or", "alors que", "sauf",
    "cependant", "pourtant", "cause de", "source de", "hormis", "car",
    "parce que", "puisque", "ni", "en raison de", "qui", "que", "ainsi que",
    "avec", "toutefois", "en dehors", "dans le cadre", "du fait", ".", ",",
    ";", "...", "(", ")")

  val negation: QualifierPatterns = QualifierPatterns(
    name = "negation",
    pseudo = Seq(
      "aucun changement", "aucun doute", "aucune hésitation",
      "aucune diminution", "ne permet pas d'", "ne permet pas de",
      "n'exclut pas", "non négligeable", "pas d'autre", "pas de changement",
      "pas de doute", "pas exclu", "pas exclue", "sans doute",
      "sans aucun doute", "sans certitude", "sans changement"),
    preceding = Seq(
      "absence", "aucun", "aucune", "aucuns", "aucunes", "décline",
      "dépourvu", "dépourvue", "disparition de", "disparition des",
      "élimination", "exclusion", "exclut", "excluent", "impossibilité de",
      "immunisé", "immunisée", "incapable de", "incapacité de", "jamais",
      "ne", "n'", "négatif", "négative", "ni", "non", "pas", "pas d'",
      "pas de", "plus d'", "plus de", "sans", "zéro", "élimine", "éliminé",
      "éliminée", "éliminer", "éliminant", "exclue", "exclure", "excluant",
      "infirme", "infirmé", "infirmer", "infirmant", "réfute", "réfuté",
      "réfuter", "réfutant", "rejette", "rejeté", "rejeter", "rejetant"),
    following = Seq(
      ": non", ": aucun", ": aucune", ": négatif", ": négative",
      "négatif", "négatifs", "négative", "négatives", "nul", "nulle",
      "exclu", "exclue", "exclus", "éliminé", "éliminée", "infirmé",
      "infirmée", "réfuté", "réfutée"),
    precedingRegex = Seq("(?i)aucun(e)?\\s+signe\\s+(de|d')"),
    termination = termination)

  val family: QualifierPatterns = QualifierPatterns(
    name = "family",
    pseudo = Seq.empty,
    preceding = Seq(
      "antécédents familiaux", "antécédent familial", "atcd familiaux",
      "aux parents", "chez le père", "chez la mère", "chez les parents",
      "côté maternel", "côté paternel", "familial", "familiale",
      "familiales", "familiaux", "père", "mère", "frère", "soeur", "sœur",
      "cousin", "cousine", "oncle", "tante", "grand-père", "grand-mère",
      "grands-parents", "papa", "maman", "fils", "fille", "parents"),
    following = Seq.empty,
    precedingRegex = Seq.empty,
    termination = termination)

  val hypothesis: QualifierPatterns = QualifierPatterns(
    name = "hypothesis",
    pseudo = Seq(
      "pas de suspicion", "sans suspicion", "suspicion écartée"),
    preceding = Seq(
      "à la recherche de", "au conditionnel", "conditionnel", "doute",
      "éventuel", "éventuelle", "éventuellement", "éventuels",
      "éventuelles", "hypothèse", "hypothèses", "hypothétique",
      "peut-être", "possibilité", "possible", "possiblement",
      "potentiel", "potentielle", "potentiellement", "probable",
      "probablement", "présomption", "recherche de", "recherche d'",
      "semble", "semblerait", "soupçon", "soupçonne", "suspecte",
      "suspectée", "suspicion", "suspicions", "susceptible de"),
    following = Seq(
      "envisagé", "envisagée", "envisageable", "possible", "potentiel",
      "potentielle", "probable", "suspecté", "suspectée", "à confirmer"),
    precedingRegex = Seq("(?i)suspicion(s)?\\s+(de|d')"),
    termination = termination)

  val reportedSpeech: QualifierPatterns = QualifierPatterns(
    name = "reported_speech",
    pseudo = Seq.empty,
    preceding = Seq(
      "affirme", "affirmant", "ajoute", "d'après le patient",
      "d'après la patiente", "décrit", "décrivant", "dit", "disant",
      "déclare", "déclarant", "évoque", "évoquant", "explique",
      "expliquant", "mentionne", "mentionnant", "plaint", "se plaignant",
      "rapporte", "rapportant", "raconte", "racontant", "signale",
      "signalant", "selon le patient", "selon la patiente",
      "aux dires du patient", "aux dires de la patiente"),
    following = Seq.empty,
    precedingRegex = Seq.empty,
    termination = termination)

  /** History-of-illness section triggers (used by the history qualifier
    * together with section spans; `.../history/patterns.py`).
    */
  val history: QualifierPatterns = QualifierPatterns(
    name = "history",
    pseudo = Seq.empty,
    preceding = Seq(
      "antécédents", "antécédent", "atcd", "atcds", "antérieur",
      "antérieure", "antérieurement", "ancien", "ancienne", "anciens",
      "à l'âge de", "dans l'enfance", "dans sa jeunesse", "en 19",
      "il y a", "historique de", "précédemment", "précédent",
      "opéré en", "opérée en"),
    following = Seq(
      "dans l'enfance", "il y a"),
    precedingRegex = Seq("(?i)en\\s+(19|20)\\d\\d"),
    termination = termination)
}
