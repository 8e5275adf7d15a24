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

  /** Explicit-broadcast variant for DICTIONARY-scale terminologies (the
    * licensed UMLS is ~1M concepts, `umls/factory.py:6`): the trie is
    * built once on the driver, shipped via `SparkContext.broadcast`
    * (torrent, once per EXECUTOR and reused across stages), and the UDF
    * closure captures only this lightweight handle. The closure-ship
    * [[Matcher]] stays the right default below ~100k concepts — one
    * fewer moving part, same row-local matching.
    */
  final class BroadcastMatcher private[Terminology] (
      bc: org.apache.spark.broadcast.Broadcast[Matcher])
      extends Serializable {
    def findMatches(tokens: Array[Token], text: String): Seq[Ent] =
      bc.value.findMatches(tokens, text)
    /** Release executor-side copies when the pipeline is done. */
    def unpersist(): Unit = bc.unpersist()
  }

  def broadcast(
      spark: org.apache.spark.sql.SparkSession,
      label: String,
      concepts: Map[String, Seq[String]]): BroadcastMatcher =
    new BroadcastMatcher(
      spark.sparkContext.broadcast(new Matcher(label, concepts)))
}

/** A dictionary-SCALE concept catalog with the public structure of
  * ICD-10 (chapter letter + two-digit category + dotted subcode), built
  * deterministically: 25 letters (A–Y) × categories 00–99, each with its
  * ten .0–.9 subcodes — 27,500 concepts. Subcodes carry two mention
  * variants (dotted `A07.3` and compact `A073`, the forms clinical text
  * uses); category codes match bare mentions. Letter Z is deliberately
  * absent so membership is a real test, not a formality.
  *
  * This closes the scale gap of the licensed cim10/drugs/umls
  * dictionaries (`/root/reference/edsnlp/pipes/ner/cim10/factory.py:6`
  * ships ~40k licensed concepts): the [[Terminology]] engine is
  * data-driven, and this catalog exercises the broadcast-terminology
  * trie at real dictionary size with data that can legally ship.
  */
object IcdLikeCatalog {
  val concepts: Map[String, Seq[String]] = {
    val b = Map.newBuilder[String, Seq[String]]
    for (l <- 'A' to 'Y'; n <- 0 until 100) {
      val parent = f"$l$n%02d"
      b += parent -> Seq(parent)
      for (s <- 0 until 10) {
        val code = s"$parent.$s"
        // the dotted form needs BOTH cases as variants: the tokenizer's
        // acronym rule keeps the period on uppercase "K35." (one token)
        // but splits lowercase "k35.2" as ["k","35.2"] — two distinct
        // trie paths for the same surface form
        b += code -> Seq(code, code.toLowerCase, parent + s.toString)
      }
    }
    b.result()
  }
}

/** Named clinical score extraction — the reference machinery
  * (`/root/reference/edsnlp/pipes/ner/scores/base_score.py:59-161`): a
  * trigger regex, a `value` assign with `replace_entity` semantics (the
  * ENTITY is the extracted value span), per-score token windows
  * (char-scaled here), optional method assigns (SOFA), and a
  * normalization that DROPS the mention when the value is out of range.
  * The canonical value idiom `^.*?[\n\W]*?(\d+)` reaches a number on
  * the trigger's own line, or on the next line only across non-word
  * characters — "Charlson:\n- IMC: 21" therefore yields nothing.
  */
object Scores {
  val defaultValueExtract: String = """^.*?[\n\W]*?(\d+)"""

  case class Config(
      name: String,
      triggers: Seq[String], // regex alternatives, matched on folded text
      valueExtract: String = defaultValueExtract,
      window: Int = 56, // chars (~7 tokens, the base_score default)
      methods: Seq[(String, String)] = Nil, // (regex, method label)
      normalize: String => Option[Double] = Scores.rangeNorm(0, 29))

  def rangeNorm(lo: Int, hi: Int): String => Option[Double] =
    s => s.trim.toIntOption.filter(v => v >= lo && v <= hi)
      .map(_.toDouble)

  // per-score configs (each `scores/<name>/patterns.py` + factory window)
  val charlson: Config = Config("charlson", Seq("charlson"),
    window = 56, normalize = rangeNorm(0, 29))
  val sofa: Config = Config("sofa", Seq("""\bsofa\b"""),
    valueExtract = """^.*?[\n\W]*?(\d+)(?![h0-9])""",
    window = 80,
    methods = Seq(("(max)", "Maximum"), ("(24h)", "24H"),
      ("(admission)", "Admission")),
    normalize = rangeNorm(0, 29))
  val glasgow: Config = Config("glasgow",
    Seq("glasgow", """\bgcs\b"""), window = 80,
    normalize = rangeNorm(3, 15))
  val ccmu: Config = Config("emergency_ccmu", Seq("""\bccmu\b"""),
    window = 160, normalize = rangeNorm(1, 5))
  val gemsa: Config = Config("emergency_gemsa", Seq("""\bgemsa\b"""),
    window = 160, normalize = rangeNorm(1, 6))
  val priority: Config = Config("emergency_priority",
    Seq("""\bpriorite\b"""), window = 56, normalize = rangeNorm(0, 5))
  // Elston-Ellis / SBR histologic grade: the value is the
  // "(architecture : a + noyaux : b + mitoses : c)" triple; the grade
  // derives from a+b+c (elston_ellis/patterns.py:6-36)
  val elstonEllis: Config = Config("elston_ellis",
    Seq("""elston (& |et |and )?ellis""", """\bee\b"""),
    valueExtract = """(?s).(\([^\d()]*[0-3].{0,2}[+,][^\d()]*[0-3]""" +
      """.{0,2}[+,][^\d()]*[0-3]\))""",
    window = 160,
    normalize = s => {
      val sum = """[0-3]""".r.findAllIn(s).map(_.toInt).sum
      Some(if (sum <= 5) 1.0 else if (sum <= 7) 2.0 else 3.0)
    })

  val all: Seq[Config] =
    Seq(charlson, sofa, glasgow, ccmu, gemsa, priority, elstonEllis)

  final class Matcher(config: Config) extends Serializable {
    private val trigPat = Pattern.compile(
      config.triggers.mkString("(?:", "|", ")"))
    private val valPat = Pattern.compile(config.valueExtract)
    private val methodPats = config.methods.map { case (re, label) =>
      (Pattern.compile(re, Pattern.CASE_INSENSITIVE), label)
    }

    def findMatches(text: String): Seq[Ent] = {
      if (text == null) return Nil
      val folded = graft.nlp.Normalizer
        .mapChars(text.map(Character.toLowerCase))
      val out = new ArrayBuffer[Ent]
      val m = trigPat.matcher(folded)
      while (m.find()) {
        // window runs from the ANCHOR START (value regexes are
        // ^-anchored there) to anchor end + window
        val winEnd = math.min(text.length, m.end + config.window)
        val snippet = text.substring(m.start, winEnd)
        val vm = valPat.matcher(snippet)
        if (vm.find() && vm.groupCount() >= 1 && vm.group(1) != null) {
          config.normalize(vm.group(1)).foreach { value =>
            val b = m.start + vm.start(1)
            val e = m.start + vm.end(1)
            var attrs = Map("score_name" -> config.name,
              "value" ->
                (if (value == math.rint(value)) value.toInt.toString
                else value.toString))
            methodPats.foreach { case (p, label) =>
              if (p.matcher(snippet).find())
                attrs += ("score_method" -> label)
            }
            out += Ent(b, e, config.name, text.substring(b, e), attrs)
          }
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

/** ADICAP pathology code detection (`/root/reference/edsnlp/pipes/ner/
  * adicap/adicap.py:139-180`, patterns `patterns.py:8-29`): a
  * codification/adicap PREFIX anchors the mention; every code in the
  * trailing window becomes its own entity (replace_entity + unreduced
  * assign). Codes accept the dotted local spelling ("B.H.HP.A7A0") and
  * the four tail variants; the stored `code` attr is dot-stripped. The
  * full decode dictionary is licensed reference data (`decoder.py`
  * get_adicap_dict); the D1 sampling-mode axis ships here as config so
  * decode plumbing stays exercised.
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

  private val d14 = """[A-Z]\.?[A-Z]\.?[A-Z]{2}\.?"""
  private val tail =
    """(?:\d{4}|[A-Z][0-9A-Z][A-Z][0-9]|[0-9A-Z][0-9][09A-Z][0-9]|0[A-Z][0-9]{2})"""
  private val config = ContextualMatcher.Config(
    label = "adicap",
    regex = Seq("""(?i)(codification|adicap)"""),
    assign = Seq(ContextualMatcher.AssignRule(
      name = "code",
      regex = "(" + d14 + tail + ")",
      windowAfter = 4000, // the reference's 500-token window, in chars
      replaceEntity = true,
      reduceMode = None,
      required = true)),
    caseSensitive = true)
  private val matcher = ContextualMatcher.matcher(config)

  def extract(text: String): Seq[Ent] = {
    if (text == null) return Nil
    val tokens = graft.nlp.Tokenizer.tokenize(text)
    val sents = graft.nlp.Sentencizer.sentences(tokens)
    matcher.findMatches(text, tokens, sents).map { e =>
      val code = e.attrs("code").replaceAll("[^A-Za-z0-9 ]+", "")
      var attrs = Map("code" -> code)
      samplingModes.get(code.substring(0, 1))
        .foreach(v => attrs += ("sampling_mode" -> v))
      e.copy(attrs = attrs)
    }
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
