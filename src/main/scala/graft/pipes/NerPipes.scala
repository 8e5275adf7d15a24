package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.{Ent, PhraseMatcher, Token}

/** Terminology matching with concept ids — the `eds.terminology` /
  * `eds.cim10` / `eds.drugs` / `eds.umls` surface
  * (`/root/reference/edsnlp/pipes/core/terminology/terminology.py:15-205`;
  * factories instantiate it over shipped dictionaries). Terminologies are
  * `concept_id -> variants` data; matches carry `kb_id` in attrs. At scale
  * the dictionary rides the task closure (broadcast-equivalent); matching
  * stays row-local — the broadcast-hash-join shape of SURVEY §2.4.
  */
object Terminology {
  final class Matcher(
      label: String, concepts: Map[String, Seq[String]])
      extends Serializable {
    private val pm = PhraseMatcher.build(concepts)
    def findMatches(tokens: Array[Token], text: String): Seq[Ent] =
      graft.nlp.SpanAlgebra.filterSpans(pm.findMatches(tokens, text)).map {
        e => Ent(e.begin, e.end, label, e.text, Map("kb_id" -> e.label))
      }
  }
  def matcher(label: String, concepts: Map[String, Seq[String]]): Matcher =
    new Matcher(label, concepts)
}

/** Named clinical score extraction: trigger mention + value regex +
  * normalization (`/root/reference/edsnlp/pipes/ner/scores/base_score.py:
  * 13-190`; per-score factories, e.g. Charlson/SOFA/Glasgow).
  */
object Scores {
  case class Config(
      name: String,
      triggers: Seq[String],
      valueRegex: String = "(\\d+(?:[.,]\\d+)?)",
      window: Int = 20,
      normalize: Double => Double = identity)

  val charlson: Config = Config("charlson",
    Seq("charlson", "score de charlson"))
  val sofa: Config = Config("sofa", Seq("sofa", "score sofa"))
  val glasgow: Config = Config("glasgow",
    Seq("glasgow", "score de glasgow", "gcs"))
  // emergency scores (`edsnlp/pipes/ner/scores/emergency/`): CCMU and
  // GEMSA triage classes, value range clamped by normalize
  val ccmu: Config = Config("emergency_ccmu",
    Seq("ccmu", "classe ccmu"),
    normalize = v => if (v >= 1 && v <= 5) v else Double.NaN)
  val gemsa: Config = Config("emergency_gemsa",
    Seq("gemsa", "classe gemsa"),
    normalize = v => if (v >= 1 && v <= 6) v else Double.NaN)
  val priority: Config = Config("emergency_priority",
    Seq("priorité", "priorite", "tri iao"))
  // Elston-Ellis / SBR histologic grade (`scores/elston_ellis/`)
  val elstonEllis: Config = Config("elston_ellis",
    Seq("elston", "elston-ellis", "elston et ellis", "sbr", "grade sbr"),
    normalize = v => if (v >= 1 && v <= 3) v else Double.NaN)

  val all: Seq[Config] =
    Seq(charlson, sofa, glasgow, ccmu, gemsa, priority, elstonEllis)

  final class Matcher(config: Config) extends Serializable {
    private val trigPat = Pattern.compile(
      config.triggers.sortBy(-_.length).map(Pattern.quote)
        .mkString("(?i)(?:", "|", ")"))
    private val valPat = Pattern.compile(config.valueRegex)

    def findMatches(text: String): Seq[Ent] = {
      if (text == null) return Nil
      val out = new ArrayBuffer[Ent]
      val m = trigPat.matcher(text)
      while (m.find()) {
        val winEnd = math.min(text.length, m.end + config.window)
        val vm = valPat.matcher(text.substring(m.end, winEnd))
        if (vm.find()) {
          val raw = vm.group(1).replace(',', '.').toDouble
          out += Ent(m.start, m.end + vm.end(1), config.name,
            text.substring(m.start, m.end + vm.end(1)),
            Map("score_name" -> config.name,
              "value" -> config.normalize(raw).toString))
        }
      }
      out.toSeq
    }
  }
  def matcher(config: Config): Matcher = new Matcher(config)
}

/** TNM cancer staging parser — the full reference grammar
  * (`/root/reference/edsnlp/pipes/ner/tnm/patterns.py:1-30`, keep-filter
  * and span resolution `tnm.py:102-137`, value coercion and `norm()`
  * `model.py:77-141`): prefix, tumour with specification and
  * parenthesized suffix, node section with its own optional prefix,
  * metastasis, resection completeness, and a trailing edition tag whose
  * 2-digit year is expanded (<40 -> 2000s, else 1900s). The one omitted
  * reference feature is the LEADING version lookbehind (`(?<=uicc...)`)
  * — Python's `regex` module allows the unbounded form, Java does not,
  * and no reference test exercises it.
  */
object Tnm {
  private val pat = Pattern.compile(
    "(?:\\b|^)(?<prefix>[cpPyraum]p?)\\s{0,2}" +
      "T\\s?(?<tumour>[0-4o]|is)?(?<tspec>[abcdx]|mi)?" +
      "(?:\\((?<tsuf>[^()]{1,10})\\))?" +
      "(?:\\s{0,2}/?\\s{0,2}(?:[cpPyraum]p?)?\\s{0,2}" +
      "N\\s?(?<node>[0-3o]|x)(?<nspec>[abcdx]|mi)?" +
      "(?:\\((?<nsuf>[^()]{1,10})\\))?)?" +
      "(?:\\s{0,2}/?\\s{0,2}(?:[cpPyraum]p?)?\\s{0,2}" +
      "M\\s?(?<meta>[01o]|x)x?)?" +
      "(?:\\s{0,2}/?\\s{0,2}R\\s?(?<res>[012]))?" +
      "(?:(?:.|\\n){1,5}\\(?(?<ver>(?i:uicc|accj|tnm))\\s+" +
      "(?:(?i:[é]ditions?|[é]d\\.?))?\\s{0,2}" +
      "(?<vyear>\\d{4}|\\d{2})\\)?)?" +
      "(?:\\b|$)")

  private def coerce(v: String): String = v.replace('o', '0')

  def extract(text: String): Seq[Ent] = {
    if (text == null) return Nil
    val raw = new ArrayBuffer[Ent]
    val m = pat.matcher(text)
    while (m.find()) {
      val span = m.group()
      val clean = span.replace(" ", "").replace("\n", "")
      // tnm.py:126-134: keep iff >2 significant chars, or a tight
      // lowercase-prefixed pair ("pT" yes, "PT"/"a T" no)
      val keep = clean.length > 2 ||
        (span.length >= 1 && !span.lift(1).exists(_.isWhitespace) &&
          span.head.isLower)
      if (keep) {
        var attrs = Map("prefix" -> m.group("prefix"))
        def put(name: String, key: String, f: String => String = identity)
            : Unit =
          Option(m.group(name)).foreach(v => attrs += (key -> f(v)))
        put("tumour", "tumour", coerce)
        put("tspec", "tumour_specification")
        put("tsuf", "tumour_suffix")
        put("node", "node", coerce)
        put("nspec", "node_specification")
        put("nsuf", "node_suffix")
        put("meta", "metastasis", coerce)
        put("res", "resection_completeness")
        put("ver", "version", _.toUpperCase)
        Option(m.group("vyear")).foreach { y =>
          val n = y.toInt
          val full =
            if (n < 40) n + (if (n < 100) 2000 else 0)
            else if (n < 100) n + 1900
            else n
          attrs += ("version_year" -> full.toString)
        }
        // model.py:108-141 norm(): sections appear only when any of
        // their parts matched
        val sb = new StringBuilder(attrs("prefix"))
        def section(tag: String, keys: Seq[String]): Unit =
          if (keys.exists(attrs.contains)) {
            sb.append(tag)
            keys.foreach(k => sb.append(attrs.getOrElse(k, "")))
          }
        section("T", Seq("tumour", "tumour_specification", "tumour_suffix"))
        section("N", Seq("node", "node_specification", "node_suffix"))
        attrs.get("metastasis").foreach(v => sb.append("M").append(v))
        attrs.get("resection_completeness")
          .foreach(v => sb.append("R").append(v))
        if (attrs.contains("version") && attrs.contains("version_year"))
          sb.append(
            s" (${attrs("version")} ${attrs("version_year")})")
        attrs += ("norm" -> sb.toString)
        raw += Ent(m.start, m.end, "tnm", span, attrs)
      }
    }
    graft.nlp.SpanAlgebra.filterSpans(raw.toSeq)
  }
}

/** ADICAP pathology code detection + dictionary decode
  * (`/root/reference/edsnlp/pipes/ner/adicap/adicap.py:18-260`,
  * `decoder.py`): code = 4 letters (sampling/technique/organ) + 4
  * digits/letters; decode maps are broadcast data.
  */
object Adicap {
  val samplingModes: Map[String, String] = Map(
    "B" -> "biopsie chirurgicale",
    "H" -> "biopsie transcutanee",
    "O" -> "pièce opératoire",
    "P" -> "ponction",
    "E" -> "examen direct",
    "C" -> "cytoponction",
    "F" -> "frottis")

  private val pat =
    Pattern.compile("\\b(?<code>[BHOPECF][A-Z]{3}[A-Z0-9]{4})\\b")

  def extract(text: String): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]
    val m = pat.matcher(text)
    while (m.find()) {
      val code = m.group("code")
      var attrs = Map("code" -> code)
      samplingModes.get(code.substring(0, 1))
        .foreach(v => attrs += ("sampling_mode" -> v))
      out += Ent(m.start, m.end, "adicap", code, attrs)
    }
    out.toSeq
  }
}

/** Disorder/behavior detector configs: `ContextualMatcher` instances with
  * per-disorder pattern data (`/root/reference/edsnlp/pipes/ner/disorders/
  * base.py:14`, per-disorder `patterns.py`; behaviors alcohol/tobacco).
  * Representative bank; the full reference set is config, not code.
  */
object Disorders {
  import ContextualMatcher.{Config, SideRule}

  val diabetes: Config = Config(
    label = "diabetes",
    terms = Seq("diabète", "diabétique", "dnid", "did"),
    exclude = Seq(SideRule(Seq("insipide"), windowAfter = 20)))

  val covid: Config = Config(
    label = "covid",
    terms = Seq("covid", "covid-19", "coronavirus", "sars-cov-2"))

  val hypertension: Config = Config(
    label = "hypertension",
    terms = Seq("hypertension", "hta", "hypertendu", "hypertendue"),
    exclude = Seq(SideRule(Seq("oculaire", "portale"), windowAfter = 15)))

  val tobacco: Config = Config(
    label = "tobacco",
    terms = Seq("tabac", "tabagisme", "fumeur", "fumeuse"),
    assign = Seq(ContextualMatcher.AssignRule(
      name = "pack_years",
      regex = "(\\d+)\\s*(?:pa|paquets?[- ]ann[ée]es?)",
      windowAfter = 30)))

  val alcohol: Config = Config(
    label = "alcohol",
    terms = Seq("alcool", "alcoolisme", "éthylisme", "oh chronique"),
    exclude = Seq(SideRule(Seq("sans alcool", "pas d'alcool"),
      windowBefore = 15, windowAfter = 5)))

  val ckd: Config = Config(
    label = "ckd",
    terms = Seq("insuffisance rénale chronique", "irc", "néphropathie chronique",
      "dialyse", "hémodialyse", "maladie rénale chronique"))

  val copd: Config = Config(
    label = "copd",
    terms = Seq("bpco", "bronchopneumopathie chronique obstructive",
      "emphysème", "insuffisance respiratoire chronique"))

  val cerebrovascularAccident: Config = Config(
    label = "cerebrovascular_accident",
    terms = Seq("avc", "accident vasculaire cérébral", "ait",
      "accident ischémique transitoire", "hémorragie cérébrale"))

  val congestiveHeartFailure: Config = Config(
    label = "congestive_heart_failure",
    terms = Seq("insuffisance cardiaque", "oedème aigu du poumon", "oap",
      "décompensation cardiaque"))

  val connectiveTissueDisease: Config = Config(
    label = "connective_tissue_disease",
    terms = Seq("lupus", "sclérodermie", "polyarthrite rhumatoïde",
      "connectivite", "sjögren"))

  val dementia: Config = Config(
    label = "dementia",
    terms = Seq("démence", "alzheimer", "troubles cognitifs majeurs",
      "démence vasculaire"))

  val hemiplegia: Config = Config(
    label = "hemiplegia",
    terms = Seq("hémiplégie", "hémiparésie", "paraplégie", "tétraplégie"))

  val leukemia: Config = Config(
    label = "leukemia",
    terms = Seq("leucémie", "lal", "lam", "llc", "leucémie aiguë"))

  val liverDisease: Config = Config(
    label = "liver_disease",
    terms = Seq("cirrhose", "hépatite chronique", "insuffisance hépatique",
      "hépatopathie"))

  val lymphoma: Config = Config(
    label = "lymphoma",
    terms = Seq("lymphome", "hodgkin", "lymphome non hodgkinien", "lnh"))

  val myocardialInfarction: Config = Config(
    label = "myocardial_infarction",
    terms = Seq("infarctus du myocarde", "idm", "syndrome coronarien aigu",
      "sca", "infarctus"))

  val peripheralVascularDisease: Config = Config(
    label = "peripheral_vascular_disease",
    terms = Seq("artériopathie", "aomi",
      "artériopathie oblitérante des membres inférieurs",
      "ischémie des membres inférieurs"))

  val pepticUlcerDisease: Config = Config(
    label = "peptic_ulcer_disease",
    terms = Seq("ulcère gastrique", "ulcère duodénal",
      "ulcère gastro-duodénal"))

  val solidTumor: Config = Config(
    label = "solid_tumor",
    terms = Seq("cancer", "carcinome", "adénocarcinome", "néoplasie",
      "tumeur maligne", "métastase", "métastases"),
    exclude = Seq(SideRule(Seq("bénin", "bénigne"), windowAfter = 20)))

  val aids: Config = Config(
    label = "aids",
    terms = Seq("sida", "vih", "séropositif", "séropositive"),
    assign = Seq(ContextualMatcher.AssignRule(
      name = "stade", regex = "stade\\s+(a|b|c|\\d)", windowAfter = 20)))

  /** Suicide-attempt mentions with modality
    * (`edsnlp/pipes/ner/suicide_attempt/suicide_attempt.py:15-171`).
    */
  val suicideAttempt: Config = Config(
    label = "suicide_attempt",
    terms = Seq("tentative de suicide", "tentative d'autolyse", "ts",
      "intoxication médicamenteuse volontaire", "imv",
      "phlébotomie", "autolyse"),
    exclude = Seq(SideRule(Seq("idées", "idéation", "risque de"),
      windowBefore = 25)))

  /** The disorder + behavior configs of the reference's bank
    * (`edsnlp/pipes/ner/disorders/`, `behaviors/`, `suicide_attempt/`).
    */
  val all: Seq[Config] = Seq(
    diabetes, covid, hypertension, ckd, copd, cerebrovascularAccident,
    congestiveHeartFailure, connectiveTissueDisease, dementia, hemiplegia,
    leukemia, liverDisease, lymphoma, myocardialInfarction,
    peripheralVascularDisease, pepticUlcerDisease, solidTumor, aids,
    tobacco, alcohol, suicideAttempt)
}
