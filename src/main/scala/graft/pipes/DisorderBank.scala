package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.{Ent, Sent, Token}

/** Full-fidelity disorder/behavior detectors: the complete per-disorder
  * pattern banks of the reference re-expressed as config data, plus the
  * multi-source matching semantics of its `DisorderMatcher`
  * (`/root/reference/edsnlp/pipes/ner/disorders/base.py:14-133`, pattern
  * dicts under `disorders/<name>/patterns.py` and
  * `behaviors/{alcohol,tobacco}/patterns.py`).
  *
  * Semantics mirrored here:
  *   - each disorder = several SOURCES, each with its own regexes, matched
  *     against the NORM text (lowercase, accent-stripped) or the RAW text
  *     (case-sensitive acronyms, `regex_attr="TEXT"`);
  *   - per-source exclude/assign rules run in TOKEN windows around the
  *     anchor (window `(a, b)` = tokens `[start+a, end+b)`, anchor
  *     included, clamped to the sentence unless `limit_to_sentence=False`);
  *   - overlapping anchors across sources resolve longest-first
  *     (`filter_spans`), then a per-disorder post rule keeps/drops spans
  *     and grades status 1/2, mapped to a detailed-status string
  *     (`base.py:76-80` detailed_status_mapping).
  *
  * Everything is per-document and row-local: on Spark this runs inside a
  * map over the annotation arrays — the pattern bank rides the task
  * closure like any broadcast dictionary, so it distributes as a narrow
  * map with no shuffle.
  */
object DisorderBank {

  /** Token window around an anchor: `before` tokens before the anchor
    * start to `after` tokens after the anchor end, anchor included.
    */
  case class Win(
      before: Int, after: Int, limitToSentence: Boolean = true)

  case class Exclude(regex: Seq[String], win: Win)

  /** `hidden = true` = an internal context probe feeding the post rule
    * only: the reference computes it with a separate matcher rather than
    * an `assign` (e.g. diabetes' far-complication scan,
    * `diabetes.py:138-147`), so it must not surface as an ent attr.
    */
  case class Assign(
      name: String, regex: String, win: Win, hidden: Boolean = false)

  /** One pattern source (`dict(source=..., regex=..., ...)` in the
    * reference). `raw = true` = `regex_attr="TEXT"`: case-sensitive over
    * the raw text (acronyms). Exclude/assign contexts always match the
    * NORM window (the reference's dominant regex_attr).
    */
  case class Source(
      name: String,
      regex: Seq[String],
      raw: Boolean = false,
      exclude: Seq[Exclude] = Nil,
      assign: Seq[Assign] = Nil)

  /** post(source, assigned, rawEntText) -> None to drop, or
    * Some((status, negation)). Status maps through `statusMapping` to the
    * `detailed_status` attr. `modalityAttr` additionally exposes the
    * winning source name as a `modality` attr (the suicide-attempt
    * surface, `suicide_attempt.py`'s `suicide_attempt_modality`).
    */
  case class Spec(
      label: String,
      sources: Seq[Source],
      statusMapping: Map[Int, Option[String]] = Map(1 -> None),
      modalityAttr: Boolean = false,
      post: (String, Map[String, String], String) =>
        Option[(Int, Option[Boolean])] = (_, _, _) => Some((1, None)))

  final class Matcher(spec: Spec) extends Serializable {
    private val hiddenNames =
      spec.sources.flatMap(_.assign).filter(_.hidden).map(_.name).toSet
    private val normFlags =
      Pattern.DOTALL | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
    private val compiled = spec.sources.map { s =>
      val flags = if (s.raw) Pattern.DOTALL else normFlags
      (s,
        s.regex.map(Pattern.compile(_, flags)),
        s.exclude.map(r => (r, r.regex.map(Pattern.compile(_, normFlags)))),
        s.assign.map(r => (r, Pattern.compile(r.regex, normFlags))))
    }

    private case class Cand(
        ti: Int, tj: Int, rawB: Int, rawE: Int,
        source: Source, assigned: Map[String, String])

    def findMatches(
        text: String, tokens: Array[Token], sents: Seq[Sent]): Seq[Ent] = {
      if (text == null || tokens.isEmpty) return Nil
      // drop pollution-excluded AND whitespace tokens: token windows
      // count words, and the hay rebuilds spacing from raw adjacency
      val kept = tokens.filterNot(t =>
        t.excluded || graft.nlp.Normalizer.isSpace(t))
      if (kept.isEmpty) return Nil
      val n = kept.length
      // NORM haystack: kept-token norms, preserving raw adjacency — a
      // space is inserted only where the raw text had one, so
      // "pace-maker" stays one unbroken string (the reference's NORM is
      // the doc text with per-token norms in place)
      val normStart = new Array[Int](n)
      val normEnd = new Array[Int](n)
      val hayB = new StringBuilder
      var i = 0
      while (i < n) {
        if (i > 0 && kept(i).begin > kept(i - 1).end) hayB.append(' ')
        normStart(i) = hayB.length
        hayB.append(
          if (kept(i).norm != null && kept(i).norm.nonEmpty) kept(i).norm
          else kept(i).text.toLowerCase(java.util.Locale.ROOT))
        normEnd(i) = hayB.length
        i += 1
      }
      val hay = hayB.toString

      // token index of a NORM-haystack offset (token containing it, or
      // the nearest preceding token for offsets in inter-token spaces)
      def tokAtNorm(off: Int): Int = {
        var lo = 0; var hi = n - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (normStart(mid) <= off) lo = mid else hi = mid - 1
        }
        lo
      }
      // max idx with begin <= off: correct for both start and end
      // offsets — a char at a token's begin belongs to THAT token, and
      // an offset in an inter-token gap clamps to the previous token
      def tokAtRaw(off: Int): Int = {
        var lo = 0; var hi = n - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (kept(mid).begin <= off) lo = mid else hi = mid - 1
        }
        lo
      }
      // sentence bounds of token ti, as kept-token indices
      def sentRange(ti: Int): (Int, Int) = {
        val t = kept(ti)
        sents.find(s => t.begin < s.end && t.end > s.begin) match {
          case Some(s) =>
            var lo = ti; var hi = ti
            while (lo > 0 && kept(lo - 1).begin >= s.begin) lo -= 1
            while (hi < n - 1 && kept(hi + 1).end <= s.end) hi += 1
            (lo, hi)
          case None => (0, n - 1)
        }
      }
      def ctx(c: Cand, w: Win): String = {
        var lo = c.ti - w.before
        var hi = c.tj + w.after
        if (w.limitToSentence) {
          val (slo, shi) = sentRange(c.ti)
          lo = math.max(lo, slo); hi = math.min(hi, shi)
        }
        lo = math.max(0, lo); hi = math.min(n - 1, hi)
        if (lo > hi) "" else hay.substring(normStart(lo), normEnd(hi))
      }

      val cands = new ArrayBuffer[Cand]
      compiled.foreach { case (src, pats, excls, assigns) =>
        val srcHay = if (src.raw) text else hay
        pats.foreach { p =>
          val m = p.matcher(srcHay)
          while (m.find()) {
            if (m.end > m.start) {
              val (ti, tj) =
                if (src.raw) (tokAtRaw(m.start), tokAtRaw(m.end - 1))
                else (tokAtNorm(m.start), tokAtNorm(m.end - 1))
              var c = Cand(ti, tj, kept(ti).begin, kept(tj).end, src,
                Map.empty)
              val dropped = excls.exists { case (rule, ps) =>
                val w = ctx(c, rule.win)
                ps.exists(_.matcher(w).find())
              }
              if (!dropped) {
                assigns.foreach { case (rule, pat) =>
                  if (!c.assigned.contains(rule.name)) {
                    val am = pat.matcher(ctx(c, rule.win))
                    if (am.find()) {
                      var v: String = null
                      var g = 1
                      while (v == null && g <= am.groupCount()) {
                        if (am.group(g) != null) v = am.group(g)
                        g += 1
                      }
                      if (v == null) v = am.group()
                      c = c.copy(assigned = c.assigned + (rule.name -> v))
                    }
                  }
                }
                cands += c
              }
            }
          }
        }
      }

      // longest-first overlap resolution across sources (filter_spans)
      val claimed = new ArrayBuffer[(Int, Int)]
      val winners = new ArrayBuffer[Cand]
      cands.sortBy(c => (-(c.rawE - c.rawB), c.rawB)).foreach { c =>
        if (!claimed.exists { case (b, e) => c.rawB < e && c.rawE > b }) {
          claimed += ((c.rawB, c.rawE))
          winners += c
        }
      }

      winners.sortBy(_.rawB).iterator.flatMap { c =>
        val entText = text.substring(c.rawB, c.rawE)
        spec.post(c.source.name, c.assigned, entText).map {
          case (status, negation) =>
            var attrs = (c.assigned -- hiddenNames) +
              ("source" -> c.source.name, "status" -> status.toString)
            if (spec.modalityAttr)
              attrs += ("modality" -> c.source.name)
            spec.statusMapping.get(status).flatten
              .foreach(s => attrs += ("detailed_status" -> s))
            negation.foreach(v => attrs += ("negation" -> v.toString))
            Ent(c.rawB, c.rawE, spec.label, entText, attrs)
        }
      }.toSeq
    }
  }

  def matcher(spec: Spec): Matcher = new Matcher(spec)

  // ---- shared anatomical term lists (disorders/terms.py:1-77) ----
  private val HEART = Seq(
    """cardi""", """coronari""", """coronair""", """\bcd\b""",
    """\biva\d?\b""", """\bivp\d?\b""", """\bivg\d?\b""", """\bivd\d?\b""",
    """intra.?va\b""", """intra.?vp\b""", """intra.?vg\b""",
    """intra.?vd\b""", """circonflexe""", """\bcx\b""", """marginale""",
    """\bmg\b""", """\bdiago""", """\brvp\b""", """myocard""", "apical",
    "septal", "ventricul", "coeur", "auriculaire", "parietal", "septum")
  private val BRAIN = Seq(
    """cerveau""", """cereb""", """cran""", """v4""", """m1""", """aica""",
    """\bpica""", """basilaire""", """polygone de willis""",
    """cercle de willis""", """sylvien""", """arachnoi""", """meninge""",
    """dura(?:l|ux)""", """puncti""", """front""", """tempo""",
    """occipi""", """parieta""")
  private val PERIPHERAL = Seq(
    "pied", "main", """\bmi\b""", """\bmig\b""", """\bmid\b""", "membre",
    "jambe", "bras", "doigt", "digital", "orteil")
  private val ASYMPTOMATIC =
    Seq("""asympto""", """sans.decompens""", """non.decompens""")

  // ---- AIDS (disorders/aids/patterns.py:1-55, aids.py:134-158) ----
  val aids: Spec = Spec(
    label = "aids",
    sources = Seq(
      Source("aids", Seq("""(vih.{1,5}stade.{1,5})?\bsida\b""")),
      Source("hiv", Seq("""\bhiv\b""", """\bvih\b"""),
        exclude = Seq(Exclude(Seq("serologie", "prelevement"),
          Win(20, 20, limitToSentence = false))),
        assign = Seq(
          Assign("opportunist",
            "(" + Seq("kapo[sz]i", "toxoplasmose",
              "meningo.?encephalite.toxo", "pneumocystose", """\bpep\b""",
              "pneumocystis", "cryptococcose", "cytomegalovirus",
              "myobact", "opportunist", "co.?infect").mkString("|") +
              ")" + """(?!.{0,20}(?:non|0))""",
            Win(10, 30, limitToSentence = false)),
          Assign("stage", """stade.{0,5}\b(b|c)\b""", Win(0, 10))))),
    post = (source, assigned, _) =>
      if (source == "hiv" &&
        !assigned.contains("opportunist") && !assigned.contains("stage"))
        None
      else Some((1, None)))

  // ---- CKD (disorders/ckd/patterns.py:1-121, ckd.py:117-139) ----
  val ckd: Spec = Spec(
    label = "ckd",
    sources = Seq(
      Source("main", Seq(
        """glomerulo\s*neph\w+""", """(?<!pyelo)nephrite.{1,10}chron\w+""",
        """glomerulo\s*path\w+""", """\bGNIgA""",
        """syndrome?.{1,5}nephroti\w+""", """nephro\s*angio\s*sclerose""",
        """mal.de.bright""", """(maladie|syndrome?).{1,7}berger""",
        """(maladie|syndrome?).{1,7}bright""", """rachitisme.{1,5}renal""",
        """sydrome?.{1,5}alport""", """good.?pasture""", """siadh""",
        """tubulopath\w+"""),
        exclude = Seq(Exclude(Seq("aigu"), Win(0, 4)))),
      Source("transplantation", Seq(
        """transplant.{1,15}(rein|renal)""", """greff?.{1,10}(rein|renal)""")),
      Source("acute_on_chronic", Seq(
        """insuff?isan.{1,10}(rein|renal).{1,5}aig.{1,10}chron""")),
      Source("dialysis", Seq(
        """\beer\b""", """epuration extra.*renale""", """dialys"""),
        assign = Seq(Assign("chronic",
          "(" + Seq("long", "chronique", "peritoneal", "depuis",
            "intermitten", "quotidien", "hebdo", "seances", "reprise",
            "poursuite", "programme", """\blun""", """\bmar""",
            """\bmer""", """\bjeu""", """\bven""", """\bsam""",
            """\bdim""").mkString("|") + ")",
          Win(5, 5)))),
      Source("general", Seq(
        """(insuff?isan|fonction|malad).{1,10}\b(rein|rena)""",
        """\bmrc[^a-z]""", """\birc[^a-z]""", """nephropath\w+"""),
        assign = Seq(
          Assign("stage", """\b(iii|iv|v|3|4|5)\b""", Win(0, 7)),
          Assign("status",
            """\b(moder|sever|terminal|pre.?greffe|post.?greffe|dialys|pre.?terminal)""",
            Win(0, 7)),
          Assign("dfg",
            """(?:dfg|debit.{1,10}filtration.{1,5}glomerulaire).*?(\d+[\.,]?\d+)""",
            Win(0, 20)))),
      Source("acronym",
        Seq("""\bDPCA\b""", """\bGNMP\b""", """\bGEM\b""", """\bNCM\b"""),
        raw = true)),
    post = (source, assigned, _) => source match {
      case "dialysis" if !assigned.contains("chronic") => None
      case "general" =>
        if (assigned.contains("stage") || assigned.contains("status"))
          Some((1, None))
        else assigned.get("dfg").flatMap { v =>
          val dfg = try Some(v.replace(',', '.').trim.toDouble)
          catch { case _: Exception => None }
          // keep only moderate-to-severe CKD (ckd.py:126)
          if (dfg.exists(_ < 60)) Some((1, None)) else None
        }
      case _ => Some((1, None))
    })

  // ---- COPD (disorders/copd/patterns.py:1-110, copd.py:104-109) ----
  val copd: Spec = Spec(
    label = "copd",
    sources = Seq(
      Source("main", Seq(
        """alveolites?.{1,5}fibrosante""", """asthm""",
        """broncho.?pneumopath\w+.{1,5}chroni\w+.{1,5}obstru""",
        """bronchites?.{1,5}chroni\w+.{1,5}obstru""",
        """fibro.{1,20}(poumon|pulmo|pleur)""",
        """fibrose.{1,5}interstitiell?e.{1,5}dif?fuse.{1,5}idiopathi\w+""",
        """fibrose.{1,5}intersti""",
        """obstruction.{1,5}chroni\w+.{1,10}voie.{1,5}aerienne""",
        """pneumoconiose""",
        """pneumo(nie|pathie).{0,15}(intersti|radiq|infiltr|fibro|organis)""",
        """poumon.{1,5}noir""", """sclerose.{1,5}pulmo""",
        """fibro.?elastose.{1,5}pleuro.?paren""",
        """apnee.{1,25}sommeil""", """emphyseme""",
        """insuff?isan.{1,5}respiratoire.{1,5}chron\w+""",
        """mucoviscidose""",
        """bronchiolite.obliterante.{1,10}pneumo.{1,20}organis""")),
      Source("htap", Seq(
        """\bhtap\b""", """hyper\s*tension.{0,10}pulmo""",
        """hyper\s*tension.{1,5}arter.{1,15}(poumon|pulmo)"""),
        exclude = Seq(Exclude(Seq("minime"), Win(0, 3)))),
      Source("oxygen", Seq(
        """oxygeno.?dependance""", """oxygeno.?requeran""",
        """oxygenation""", """oxygeno.?ther""", """oxygene?"""),
        assign = Seq(
          Assign("long", """(long.{1,10}(?:cour|dure)|chroni|domicil)""",
            Win(0, 6)),
          Assign("long_bis", """(persist|major|minor)""", Win(6, 0)),
          Assign("need", """(besoin)""", Win(6, 6)))),
      Source("acronym", Seq(
        """\bBPCO\b""", """\bFPI\b""", """\bOLD\b""", """\bFEPP\b""",
        """\bPINS\b""", """\bPID\b""", """\bSAOS\b""", """\bSAS\b""",
        """\bSAHOS\b""", """\bBOOP\b"""), raw = true),
      Source("fid", Seq("""\bfid\b"""),
        exclude = Seq(Exclude(Seq("""\bfig\b""", "palpation"),
          Win(7, 7))))),
    post = (source, assigned, _) =>
      if (source == "oxygen" && assigned.isEmpty) None
      else Some((1, None)))

  // ---- cerebrovascular accident (disorders/cerebrovascular_accident/
  // patterns.py:1-140, cerebrovascular_accident.py:105-116; the
  // hospital-name slice of AVC_CARE_SITES_REGEX is site-specific data and
  // is represented by its generic tail) ----
  val cerebrovascularAccident: Spec = Spec(
    label = "cerebrovascular_accident",
    sources = Seq(
      Source("avc", Seq("""\bavc\b"""),
        exclude = Seq(
          Exclude(Seq("""h[oô]p""", """\brcp""", """service""",
            """\bsau""", """ap.?hp""", """\burg""", """finess""",
            """\bsiret""", """[àa] avc""", """consult"""),
            Win(5, 5, limitToSentence = false)),
          Exclude(Seq("""\b[a-z]\."""), Win(0, 2, limitToSentence = false)))),
      Source("with_localization", Seq(
        """(hemorr?agie|hematome)""", """angiopath""", """angioplasti""",
        """infarctus""", """occlusion""", """saignement""", """embol""",
        """vascularite""", """\bhsd\b""", """thrombos""",
        """thrombol[^y]""", """thrombophi""", """thrombi[^n]""",
        """thrombus""", """thrombectomi""", """phleb"""),
        exclude = Seq(Exclude(Seq("""pulmo|poumon"""), Win(0, 4))),
        assign = Seq(Assign("brain_localized",
          "(" + BRAIN.mkString("|") + ")",
          Win(15, 15, limitToSentence = false)))),
      Source("general", Seq(
        """acc?ident.{1,5}\s*vasculaire?.{1,6}\s*cereb.{1,5}""",
        """acc?ident.{1,5}\s*vasculaire?.{1,6}\s*ischemi\w+""",
        """acc?ident.{1,5}ischemi\w+""", """moya.?moya""",
        """oc?clusion.{1,5}(arter|veine).{1,20}retine""",
        """vasculo\s*path\w+.cerebr?a\w+.isch\w+""",
        """maladies?.des.petites.arter\w+""",
        """maladies?.des.petits.vaisseaux""", """thromboly?i?se""",
        """\bsusac\b""")),
      Source("acronym",
        Seq("""\bAIC\b""", """\bOACR\b""", """\bOVCR\b""", """\bAIT\b"""),
        raw = true),
      Source("ischemia", Seq("""ischemi"""),
        exclude = Seq(Exclude(PERIPHERAL ++ HEART, Win(7, 7))),
        assign = Seq(Assign("brain", "(" + BRAIN.mkString("|") + ")",
          Win(10, 15))))),
    post = (source, assigned, _) => source match {
      case "with_localization" if !assigned.contains("brain_localized") =>
        None
      case "ischemia" if !assigned.contains("brain") => None
      case _ => Some((1, None))
    })

  // ---- congestive heart failure (disorders/congestive_heart_failure/
  // patterns.py:1-90; no process override) ----
  val congestiveHeartFailure: Spec = Spec(
    label = "congestive_heart_failure",
    sources = Seq(
      Source("main", Seq(
        """defaill?ance.{1,10}cardi\w+""", """(œ|oe)deme?.{1,10}pulmon""",
        """decompensation.{1,10}card""", """choc.{1,30}cardio""",
        """greff?e.{1,10}c(œ|oe)ur""", """greff?e.{1,10}cardia""",
        """transplantation.{1,10}c(œ|oe)ur""",
        """transplantation.{1,10}cardia""", """arret.{1,10}cardi""",
        """c(œ|oe)ur pulmo""", """foie.card""", """pace.?maker""",
        """stimulateur.cardiaque""", """valve.{1,30}(meca|artific)""")),
      Source("symptomatic", Seq(
        """cardio\s*path\w+""", """cardio\s*myopath\w+""",
        """d(i|y)sfonction.{1,15}(ventricul|\bvg|cardiaque)""",
        """valvulo\s*path\w+?""", """\bic\b.{1,10}(droite|gauche)"""),
        exclude = Seq(Exclude(
          ASYMPTOMATIC :+ """(?<!\bnon.)ischem""", Win(0, 5)))),
      Source("min_severity", Seq(
        """insuf?fisance.{1,10}(\bcardi|\bdiasto|\bventri|\bmitral|tri.?cusp)""",
        """(retrecissement|stenose).(aortique|mitral)""", """\brac\b""",
        """\brm\b"""),
        exclude = Seq(Exclude(
          ASYMPTOMATIC ++ Seq("minime", "modere", """non.serre"""),
          Win(0, 5)))),
      Source("acronym", Seq("""\bOAP\b""", """\bCMH\b"""), raw = true),
      Source("AF_main", Seq(
        """fibrill?ation.{1,3}(atriale|auriculaire|ventriculaire)""",
        """flutter""", """brady.?arythmie""", """pace.?maker""")),
      Source("AF_acronym", Seq("""\bFA\b""", """\bAC.?FA\b"""),
        raw = true)))

  // ---- connective tissue disease (disorders/connective_tissue_disease/
  // patterns.py:1-80, connective_tissue_disease.py:101-107) ----
  private val ctdExclude =
    """(?<!a )((\bacc\b)|anti.?coag|anti.?corps|buschke|(\bac\b)|(\bbio))"""
  val connectiveTissueDisease: Spec = Spec(
    label = "connective_tissue_disease",
    sources = Seq(
      Source("main", Seq(
        """arth?rites?.{1,5}juveniles?.{1,5}idiopa\w+""", """myosite""",
        """myopath\w+.{1,5}inflammatoire""",
        """polyarth?rite.{1,5}chroni\w+.{1,5}evol""", """polymyosie""",
        """polyarth?rites?.{1,5}(rhizo|rhuma)""", """scleroderm\w+""",
        """connectivite""", """sarcoidose"""),
        exclude = Seq(Exclude(Seq(ctdExclude), Win(7, 7)))),
      Source("lupus", Seq("""\blupus""")),
      Source("lupique", Seq("""\blupique""", """\blupic"""),
        exclude = Seq(Exclude(Seq(ctdExclude), Win(7, 7)))),
      Source("acronyms", Seq(
        """\bAJI\b""", """\bLED\b""", """\bPCE\b""", """\bCREST\b""",
        """\bPPR\b""", """\bMICI\b""", """\bMNAI\b"""), raw = true),
      Source("named_disease", Seq(
        """libman.?lack""", """\bstill""", """felty""",
        """forestier.?certon""", """gou(g|j)erot""", """raynaud""",
        """thibierge.?weiss""", """sjogren""",
        """gou(g|j)erot.?sjogren"""))),
    post = (source, _, entText) =>
      // an all-caps LUPUS is a title/section false positive
      // (connective_tissue_disease.py:103-105)
      if (source == "lupus" && entText.nonEmpty &&
        entText == entText.toUpperCase(java.util.Locale.ROOT)) None
      else Some((1, None)))

  // ---- dementia (disorders/dementia/patterns.py:1-90; no override) ----
  val dementia: Spec = Spec(
    label = "dementia",
    sources = Seq(
      Source("main", Seq(
        """demence""", """demense""", """dementiel""",
        """corps\s*de\s*le[vw]y""", """deficits?.chroniques?.cognitifs?""",
        """troubles?.mnesique?""", """troubles?.praxique""",
        """troubles?.att?entionel""",
        """troubles?.degeneratifs?.{1,15}fonctions.{1,5}sup""",
        """maladies?.cerebrales?.degen""", """troubles?.neurocogn\w+""",
        """deficits?.cogniti\w+""", """atteinte.{1,7}spheres?cogniti""",
        """syndrome?.{1,10}(frontal|neuro.deg)""",
        """(trouble|d(y|i)sfonction).{1,25}cogni\w+""",
        """(?<!specialisee)alzheimer""",
        """demence.{1,20}(\balz|\bpark)""", """binswanger""",
        """gehring""", """\bpick""", """de\s*guam""",
        """[kc]reutzfeld.{1,5}ja[ck]ob""", """huntington""",
        """korsako[fv]""",
        """atrophie.{1,10}(cortico|hip?pocamp|cereb|lobe)""")),
      Source("acronym", Seq(
        """\bSLA\b""", """\bDFT\b""", """\bDFT""", """\bTNC\b""",
        """\bHTT\b""", """\bALS\b"""), raw = true,
        exclude = Seq(Exclude(Seq("""\banti"""), Win(15, 0)))),
      Source("charcot", Seq(
        """maladie.{1,10}charcot""", """maladie.{1,10}lou\s*gehrig"""),
        exclude = Seq(Exclude(Seq("pied de", """marie.?tooth"""),
          Win(3, 3))))))

  // ---- diabetes (disorders/diabetes/patterns.py:1-100,
  // diabetes.py:120-147) ----
  private val diabetesComplications = Seq(
    """nephropat""", """neuropat""", """retinopat""", """glomerulopathi""",
    """glomeruloscleros""", """angiopathi""", """origine""")
  val diabetes: Spec = Spec(
    label = "diabetes",
    statusMapping =
      Map(1 -> Some("WITHOUT_COMPLICATION"), 2 -> Some("WITH_COMPLICATION")),
    sources = Seq(
      Source("main", Seq(
        """\bds?n?id\b""", """\bdiabet[^o]""", """\bdiab""", """\bdb\b""",
        """\bdt.?(i|ii|1|2)\b"""),
        exclude = Seq(Exclude(Seq(
          "insipide", "nephrogenique", "aigu", """\bdr\b""", "endocrino",
          "soins aux pieds", "nutrition",
          """\s?:\n+\W+(?!oui|non|\W)"""), Win(5, 5))),
        assign = Seq(
          Assign("complicated_before",
            "(" + diabetesComplications.mkString("|") + ")", Win(3, 0)),
          Assign("complicated_after",
            "(" + (Seq("""(?<!sans )compli""", """(?<!a)symptomatique""") ++
              diabetesComplications).mkString("|") + ")", Win(0, 12)),
          Assign("type", """type.?\s*(ii|i|1|2)""", Win(0, 6)),
          Assign("insulin",
            """((?:(?:non(?:\s+|-)?)|(?:sans\s+(?:etre\s+)?)|(?:pas(?:\s+de\s+|\s+d['’]?|\s+)))?insulino.?(?:dep|req))""",
            Win(0, 6)),
          Assign("corticoid", """(\bctc\b|cortico(?:.?induit)?)""",
            Win(0, 6)),
          // the reference's has_far_complications bullet-list scan
          // (diabetes.py:138-147): span start..end+50 TOKENS, not
          // sentence-limited — checked LAST in the post chain, after the
          // "db" false-positive drop (which must see it absent)
          Assign("far_complications",
            "(" + diabetesComplications.mkString("|") + ")",
            Win(0, 50, limitToSentence = false), hidden = true))),
      Source("complicated", Seq(
        """(mal|maux).perforants?(.plantaire)?""", """pieds? diabeti"""),
        exclude = Seq(Exclude(Seq("soins aux"), Win(2, 0))))),
    post = (source, assigned, entText) => {
      val norm = graft.nlp.Normalizer
        .mapChars(entText.toLowerCase(java.util.Locale.ROOT)).trim
      // `near` mirrors the reference's span._.assigned, which never
      // holds the far-complication probe (a separate matcher there)
      val near = assigned - "far_complications"
      if (source == "complicated") Some((2, None))
      else if (near.keys.exists(_.startsWith("complicated")))
        Some((2, None))
      else if (norm == "db" && near.isEmpty) None // mostly FP
      else if (assigned.contains("far_complications")) Some((2, None))
      else Some((1, None))
    })

  // ---- hemiplegia (disorders/hemiplegia/patterns.py:1-32) ----
  val hemiplegia: Spec = Spec(
    label = "hemiplegia",
    sources = Seq(
      Source("main", Seq(
        """hemipleg\w+""", """tetrapleg\w+""", """quadripleg\w+""",
        """parapleg\w+""",
        """neuropath\w+.{1,25}motrice.{1,30}type\s*[5V]""",
        """charcot.?marie.?tooth""", """loc?ked.?in""",
        """syndrome?.{1,5}(enfermement|verrouillage)|(desafferen)""",
        """paralysie.{1,10}hemicorps""", """paralysie.{1,10}jambe""",
        """paralysie.{1,10}membre""", """paralysie.{1,10}cote""",
        """paralysie.{1,5}cerebrale.{1,5}spastique""")),
      Source("acronym", Seq("""\bLIS\b""", """\bNMSH\b"""), raw = true)))

  // ---- leukemia (disorders/leukemia/patterns.py:1-60) ----
  val leukemia: Spec = Spec(
    label = "leukemia",
    sources = Seq(
      Source("main", Seq(
        """leucemie?""", """(syndrome?.)?myelo\s*proliferatif""",
        """m[yi]eloprolifer"""),
        exclude = Seq(Exclude(Seq("plasmocyte", "benin", "benign"),
          Win(0, 5)))),
      Source("acronym", Seq(
        """\bLAM\b""", """\bLAM.?[0-9]""", """\bLAL\b""", """\bLMC\b""",
        """\bLCE\b""", """\bLMM[JC]\b""", """\bLCN\b""", """\bAREB\b""",
        """\bAPMF\b""", """\bLLC\b""", """\bSMD\b""",
        """LA my[éèe]lomonocytaire"""), raw = true,
        exclude = Seq(Exclude(Seq("anti"), Win(20, 0)))),
      Source("other", Seq(
        """myelofibrose""", """vaquez""",
        """thrombocytem\w+.{1,3}essentiell?e?""",
        """splenomegal\w+.{1,3}myeloide""", """mastocytose.{1,5}maligne?""",
        """polyglobul\w+.{1,10}essentiell?e?""", """letterer.?siwe""",
        """anemie.refractaire.{1,20}blaste""", """m[iy]elod[iy]splasi""",
        """syndrome.myelo.?dysplasique"""))))

  // ---- liver disease (disorders/liver_disease/patterns.py:1-52,
  // liver_disease.py:98-110) ----
  val liverDisease: Spec = Spec(
    label = "liver_disease",
    statusMapping = Map(1 -> Some("MILD"), 2 -> Some("MODERATE_TO_SEVERE")),
    sources = Seq(
      Source("mild", Seq(
        """cholangites?.{1,10}(sclero|secondaire)""",
        """fibrose.{1,10}(hepatique|foie)""",
        """hepatite.{1,15}chroni\w+""", """hepatopath\w+""",
        """\bnash\b""", """(maladie|sydrome?).{1,10}hanot""",
        """surinfections?.{1,5}delta""", """\bcbp\b""", """\bmaf\b"""),
        exclude = Seq(Exclude(Seq("""\bdots?\b"""), Win(5, 0)))),
      Source("moderate_severe", Seq(
        """cirr?hose""", """necrose.{1,10}(hepati|foie)""",
        """varice.{1,10}(estomac|oesopha|gastr)""",
        """\bvo\b.{1,5}(stade|grade).(1|2|3|i{1,3})""",
        """hypertension.{1,5}portale?""",
        """scleroses?.{1,5}hepato\s*portale?""",
        """sydrome?.{1,10}hepato.?ren""", """insuff?isance.{1,5}hepa""",
        """encephalopath\w+.{1,5}hepa""", """\btips\b""")),
      Source("transplant", Seq(
        """(?<!pre.?)(gref?fe|transplant).{1,12}(hepatique|foie)"""),
        exclude = Seq(Exclude(Seq("chc"), Win(5, 5))))),
    post = (source, _, _) =>
      if (source == "moderate_severe" || source == "transplant")
        Some((2, None))
      else Some((1, None)))

  // ---- lymphoma (disorders/lymphoma/patterns.py:1-70) ----
  val lymphoma: Spec = Spec(
    label = "lymphoma",
    sources = Seq(
      Source("main", Seq(
        """lymphom(?:.{1,10}hodgkin)""", """lymphom""", """lymphangio""",
        """sezary""", """burkitt?""", """kaposi""", """hodgkin""",
        """amylose""", """plasm[ao]cytome""", """lympho.{1,3}sarcome""",
        """lympho.?prolif""", """hemopathie.{1,10}lymphoide""",
        """macroglobulinemie""", """imm?unocytome""",
        """maladie.des.chaines?""",
        """histi?ocytose.{1,5}(maligne|langerhans?)""",
        """waldenst(ro|or)m""", """mycos.{1,10}fongoide""", """myelome""",
        """maladie.{1,5}imm?uno\s*proliferative.{1,5}maligne""",
        """leucemie.{1,10}plasmocyte""")),
      Source("acronym", Seq(
        """\bLNH\b""", """\bLH\b""", """\bEATL\b""", """\bLAGC\b""",
        """\bLDGCB\b"""), raw = true,
        exclude = Seq(Exclude(Seq("/L", "/mL"), Win(0, 10))))))

  // ---- myocardial infarction (disorders/myocardial_infarction/
  // patterns.py:1-57, myocardial_infarction.py:106-114) ----
  val myocardialInfarction: Spec = Spec(
    label = "myocardial_infarction",
    sources = Seq(
      Source("main", Seq(
        """coronaropath\w+""", """angor.{1,5}instable""",
        """cardiopathie(?!.{0,20}non).{0,20}(ischem|arteriosc)""",
        """cardio.?myopathie(?!.{0,20}non).{0,20}(ischem|arteriosc)""",
        """ischemi.{1,15}myocard""", """syndrome?.{1,5}corona.{1,10}aigu""",
        """syndrome?.{1,5}corona.{1,10}st""", """pontage.{1,5}mammaire""")),
      Source("with_localization", Seq(
        """\bstent""", """endoprothese""", """pontage""",
        """anevr[iy]sme""", """infa?r?a?ctus""", """angioplast\w+"""),
        assign = Seq(Assign("heart_localized",
          "(" + HEART.mkString("|") + ")", Win(10, 10)))),
      Source("acronym", Seq("""\bidm\b""", """\bsca\b""", """\batl\b"""),
        assign = Seq(Assign("segment", """st([+-])""", Win(0, 2))))),
    post = (source, assigned, _) =>
      if (source == "with_localization" &&
        !assigned.contains("heart_localized")) None
      else Some((1, None)))

  // ---- peptic ulcer disease (disorders/peptic_ulcer_disease/
  // patterns.py:1-40, peptic_ulcer_disease.py:101-106) ----
  val pepticUlcerDisease: Spec = Spec(
    label = "peptic_ulcer_disease",
    sources = Seq(
      Source("main", Seq(
        """ulcere?.{1,10}gastr""", """ulcere?.{1,10}duoden""",
        """ulcere?.{1,10}antra""", """ulcere?.{1,10}pept""",
        """ulcere?.{1,10}estomac?""", """ulcere?.{1,10}curling""",
        """ulcere?.{1,10}bulb""",
        """(œ|oe)sophagites?.{1,5}pepti.{1,10}ulcer""",
        """gastrite.{1,20}ulcer""", """antrite.{1,5}ulcer""")),
      Source("acronym", Seq("""\bUGD\b"""), raw = true),
      Source("generic", Seq("""ulcere?"""),
        assign = Seq(Assign("is_peptic", """\b(gastr|digest)""",
          Win(20, 20, limitToSentence = false))))),
    post = (source, assigned, _) =>
      if (source == "generic" && assigned.isEmpty) None
      else Some((1, None)))

  // ---- peripheral vascular disease (disorders/
  // peripheral_vascular_disease/patterns.py:1-190,
  // peripheral_vascular_disease.py:105-111) ----
  val peripheralVascularDisease: Spec = Spec(
    label = "peripheral_vascular_disease",
    sources = Seq(
      Source("acronym", Seq(
        """\bAOMI\b""", """\bACOM\b""", """\bTAO\b""", """\bSAPL\b""",
        """\bOACR\b""", """\bOVCR\b""", """\bSCS\b""", """\bTVP\b""",
        """\bCAPS\b""", """\bMTEV\b""", """\bPTT\b""", """\bMAT\b""",
        """\bSHU\b"""), raw = true),
      Source("other", Seq(
        """\bbuerger""", """takayasu""", """\bhorton""", """wegener""",
        """churg.{1,10}strauss""", """\bsnedd?on""", """budd.chiari""",
        """infa?r?a?ctus.{1,5}(renal|spleni\w+|polaire|pulmo)""",
        """ulcere?.{1,5}arter""",
        """syndrome?.?hemolytique.{1,8}uremi\w+""",
        """granulomatose.{1,10}polyangeite""",
        """occlusion.{1,10}(artere?|veine).{1,20}retine""",
        """syndrome?.{1,20}anti.?phospho""", """embolie.{1,5}pulm""")),
      Source("with_localization", Seq(
        """angiopath\w+""", """arteriopathies?.{1,5}obliterante?""",
        """gangren""", """claudication""",
        """dissection.{1,10}(aort|arter)""", """tromboangeit""",
        """tromboarterit""",
        """(pontage|angioplastie).{1,10}(\bfem|\bpop|\bren|\bjamb)""",
        """arterite""", """(ischemie|infa?r?a?ctus).{1,10}mesenteri\w+""",
        """endarteriectom\w+""", """vascularite""",
        """occlusion.{1,10}terminaisons?\s*carotid""",
        """cryoglobulinemie""", """colite.{1,5}ischemi""",
        """embole.{1,10}cholesterol""",
        """purpura.?thrombopenique.?idiopa""",
        """micro.?angiopathie.?th?rombotique"""),
        exclude = Seq(Exclude(
          BRAIN ++ HEART ++ ASYMPTOMATIC :+
            """inr\srecommande\ssous\savk""",
          Win(8, 8, limitToSentence = false)))),
      Source("thrombosis", Seq(
        """thrombos""", """thrombol[^y]""", """thrombophi""",
        """thrombi[^n]""", """thrombus""", """thrombectomi""",
        """thrombo.?embo""", """phlebit"""),
        exclude = Seq(
          Exclude(BRAIN ++ HEART ++
            Seq("superficiel", """\biv\b""", """intra.?vein"""),
            Win(15, 15, limitToSentence = false)),
          Exclude(Seq("pre", "anti", "bilan"), Win(4, 0)))),
      Source("ep", Seq("""\bEP(?![\w\./-])"""), raw = true,
        exclude = Seq(
          Exclude(Seq("fibreux", "retin", """\bfove""", """\boct\b""",
            """\bmacula""", "prosta", """\bip\b""", "protocole",
            "seance", "echange", "ritux", "ivig", """ig.?iv""",
            """\bctc""", "corticoide", "serum", """\bcure""", "plasma",
            "mensuel", "semaine", "serologi", """espaces.porte""",
            "projet", "bolus"), Win(25, 25, limitToSentence = false)),
          Exclude(Seq("""rdv""", """\bles\b""", """\bdes\b""",
            "angine"), Win(3, 0)))),
      Source("ischemia", Seq("""ischemi"""),
        exclude = Seq(Exclude(BRAIN ++ HEART, Win(7, 7))),
        assign = Seq(Assign("peripheral",
          "(" + PERIPHERAL.mkString("|") + ")", Win(0, 15)))),
      Source("main", Seq(
        """\bhta\b""", """hyper.?tension.?arte""", """hyper.?tendu""",
        """hyper.?tension.?essenti""",
        """hypertensi(?!\w{0,10}(?:pulmo|porta))"""),
        exclude = Seq(Exclude(Seq("(pulmo|porta)"), Win(0, 3))))),
    post = (source, assigned, _) =>
      if (source == "ischemia" && !assigned.contains("peripheral")) None
      else Some((1, None)))

  // ---- solid tumor (disorders/solid_tumor/patterns.py:1-115,
  // solid_tumor.py:112-158) ----
  private val BENINE = """benign|benin|(grade.?\b[i1]\b)"""
  private def solidTumorSources(useCtScan: Boolean): Seq[Source] = {
    val base = Seq(
      Source("main", Seq(
        """carcinom(?!.{0,10}in.?situ)""", """seminome""",
        """(?<!lympho)(?<!lympho-)sarcome""", """blastome""",
        """cancer([^o]|\s|\b)""", """adamantinome""", """chordome""",
        """cranio\s*pharyngiome""", """melanome""", """neoplasie""",
        """neoplasme""", """linite""", """mesoth?eliome""", """myxome""",
        """paragangliome""", """k\s*.{0,5}(prostate|sein)""",
        """pancoast.?tobias""", """syndrome?.{1,10}lynch""",
        """li.?fraumeni""", """germinome""", """adeno[\s-]?k""",
        """thymome""", """\bnut\b""", """\bgist\b""", """\bchc\b""",
        """\badk\b""", """\btves\b""", """\btv.tves\b""",
        """lesion.{1,20}tumor""", """tumeur""", """carcinoid""",
        """histiocytome""", """ependymome"""),
        exclude = Seq(Exclude(Seq(BENINE), Win(0, 5))),
        assign = Seq(
          Assign("metastasis", """(metasta|multinodul)""", Win(3, 7)),
          Assign("stage", """stade ([^\s]*)""", Win(0, 7)))),
      Source("metastasis", Seq(
        """cellule.{1,5}tumorale.{1,5}circulantes""", """metasta""",
        """multinodul""", """carcinose""", """ruptures?.{1,5}corticale""",
        """envahissement.{0,15}parties\s*molle""",
        """(localisation|lesion)s?.{0,20}second""",
        """(lymphangite|meningite).{1,5}carcinomateuse"""),
        exclude = Seq(Exclude(Seq("goitre"), Win(3, 0)))))
    val ctScan = Source("metastasis_ct_scan", Seq(
      """m[ée]tasta(se|tique)s?""", """diss[ée]min[ée]e?s?""",
      """carcinose""",
      """((allure|l[ée]sion|localisation|progression)s?\s)(suspecte?s?)?.{0,50}(secondaire)s?""",
      """l(a|â)ch(é|e|er)\sde\sballons?""",
      """l[ée]sions?\s(non\s)?cibles?""", """rupture.{1,20}corticale""",
      """envahissement.{0,15}parties\smolles""",
      """((l[i,y]se).{1,20}os)|ost[eé]ol[i,y]|ost[eé]ocondensa.{1,20}(suspect|secondaire|[ée]volutive)""",
      """(l[ée]sion|anomalie|image).{1,20}os.{1,30}(suspect|secondaire|[ée]volutive)""",
      """os.{1,30}(l[ée]sion|anomalie|image).{1,20}(suspect|secondaire|[ée]volutive)""",
      """(l[ée]sion|anomalie|image).{1,20}l[i,y]tique""",
      """(l[ée]sion|anomalie|image).{1,20}condensant.{1,20}(suspect|secondaire|[ée]volutive)""",
      """fracture.{1,30}(suspect|secondaire|[ée]volutive)""",
      """(l[ée]sion|anomalie|image|nodule).{1,80}secondaire""",
      """(l[ée]sion|anomalie|image|nodule)s.{1,40}suspec?ts?"""))
    if (useCtScan) base :+ ctScan else base
  }

  def solidTumor(useCtScan: Boolean = false): Spec = Spec(
    label = "solid_tumor",
    statusMapping = Map(1 -> Some("LOCALIZED"), 2 -> Some("METASTASIS")),
    sources = solidTumorSources(useCtScan),
    post = (source, assigned, _) => {
      val metastatic =
        source == "metastasis" || source == "metastasis_ct_scan" ||
          assigned.contains("metastasis") ||
          // stage 4 grades metastatic (solid_tumor.py:146-153)
          assigned.get("stage").exists(s =>
            s.trim == "4" || s.trim.toLowerCase == "iv")
      Some((if (metastatic) 2 else 1, None))
    })

  /** Solid tumor with the TNM option: merges engine matches with parsed
    * TNM mentions — M1 grades METASTASIS (solid_tumor.py:127-137).
    */
  def solidTumorMatches(
      text: String, tokens: Array[Token], sents: Seq[Sent],
      useCtScan: Boolean = false, useTnm: Boolean = false): Seq[Ent] = {
    val base = matcher(solidTumor(useCtScan)).findMatches(text, tokens, sents)
    val tnm = if (!useTnm) Nil else Tnm.extract(text).map { e =>
      val status = if (e.attrs.get("metastasis").contains("1")) 2 else 1
      Ent(e.begin, e.end, "solid_tumor", e.text,
        e.attrs + ("source" -> "tnm", "status" -> status.toString,
          "detailed_status" ->
            (if (status == 2) "METASTASIS" else "LOCALIZED")))
    }
    (base ++ tnm).sortBy(_.begin)
  }

  // ---- alcohol (behaviors/alcohol/patterns.py:1-42,
  // alcohol.py:103-127) ----
  private def stoppedNeg(win: Win) = Assign("stopped_neg",
    """\b(non|ne|pas|sans|aucun|jamais)\b[^.]{0,15}(\bex\b|sevr|arret|stop|ancien)""",
    win)
  val alcohol: Spec = Spec(
    label = "alcohol",
    statusMapping = Map(1 -> None, 2 -> Some("ABSTINENCE")),
    sources = Seq(
      Source("alcohol", Seq(
        """\balco[ol]""", """\bethyl""", """(?<!(25.{0,10}))\boh\b""",
        """exogenose""", """delirium.tremens"""),
        exclude = Seq(
          Exclude(Seq("occasion", "episod", "festi", "rare", "libre",
            "aigu"), Win(3, 5)),
          Exclude(Seq("pansement", "compress"), Win(3, 0))),
        assign = Seq(
          Assign("stopped", """(\bex\b|sevr|arret|stop|ancien)""",
            Win(3, 15)),
          stoppedNeg(Win(3, 15)),
          Assign("zero_after",
            """(?=^[a-z]*\s*:?[\s-]*(0|non|aucun|jamais))""",
            Win(0, 3))))),
    post = (_, assigned, _) =>
      if (assigned.contains("stopped")) {
        // the reference re-runs eds.negation over the span; the cue
        // test on the same window reproduces its bank behavior
        // (alcohol.py:116-121)
        if (assigned.contains("stopped_neg")) Some((1, None))
        else Some((2, None))
      } else if (assigned.contains("zero_after")) Some((1, Some(true)))
      else Some((1, None)))

  // ---- tobacco (behaviors/tobacco/patterns.py:1-55,
  // tobacco.py:122-143) ----
  val tobacco: Spec = Spec(
    label = "tobacco",
    statusMapping = Map(1 -> None, 2 -> Some("ABSTINENCE")),
    sources = Seq(
      Source("tobacco", Seq(
        """tabagi""", """tabac""", """\bfume\b""", """\bfumeu""",
        """\bpipes?\b"""),
        exclude = Seq(Exclude(Seq("occasion", "moder", "quelqu",
          "festi", "rare", "sujet"), Win(3, 5))),
        assign = Seq(
          Assign("stopped", """(\bex\b|sevr|arret|stop|ancien)""",
            Win(3, 15)),
          stoppedNeg(Win(3, 15)),
          Assign("zero_after",
            """(?=^[a-z]*\s*:?[\s-]*(0|non|aucun|jamais))""",
            Win(0, 3)),
          Assign("PA",
            """(\d{1,3})[^.,\-;()]{0,10}(?:\bp/?a\b|paquets?.?annees?)|(?:\bp/?a\b|paquets?.?annees?)[^.,\-;()]{0,10}(\d{1,3})""",
            Win(10, 10)),
          Assign("secondhand", "(passif)", Win(0, 5))))),
    post = (_, assigned, _) => {
      val stopped = assigned.contains("stopped")
      val status =
        if (stopped && !assigned.contains("stopped_neg")) 2 else 1
      var neg: Option[Boolean] = None
      if (assigned.contains("zero_after")) neg = Some(true)
      if (assigned.contains("secondhand")) neg = Some(true)
      if (!stopped && assigned.get("PA").exists(v =>
        v.forall(_.isDigit) && v.toInt == 0)) neg = Some(true)
      Some((status, neg))
    })

  // ---- covid (ner/covid/patterns.py:1-11) ----
  val covid: Spec = Spec(
    label = "covid",
    sources = Seq(Source("covid", Seq(
      """((pneumopathies?|infections?)\s[àa]u?\s)?""" +
        """(covid([-\s]?19)?|sars[-\s]?cov[-\s]?2|corona[-\s]?virus)"""))))

  // ---- suicide attempt with modalities (ner/suicide_attempt/
  // patterns.py:1-40): one source per modality, matched on the RAW text
  // (the TS family is deliberately case-sensitive; the rest carry their
  // own (?i) flags) ----
  val suicideAttempt: Spec = Spec(
    label = "suicide_attempt",
    modalityAttr = true,
    sources = Seq(
      Source("suicide_attempt_unspecific", Seq(
        """\b(?<!\.)(?<!Voie\s\d\s\:\s)(?<!Voie\sd.abord\s\:\s)""" +
          """(?<!surface\s)(?<!d[ée]sorientation\s)(?<!abord\s)""" +
          """(?<!ECG\s:\s)(?<!volume\s)(?<!\d\s[mc]m\sde\sla\s)""" +
          """(?<!\d[mc]m\sde\sla\s)(?<!au\scontact\sde\sla\s)""" +
          """T\.?S\.?(?![\.A-Za-z])(?!\sapyr[eé]tique)""" +
          """(?!.+TRANSSEPTAL)(?!.+T[34])(?!.+en\sr.gression)\b""",
        """(?<!\.)T\.S\.(?![A-Za-z])""",
        """\b(?<!.)TS\.\B""",
        """(?i)tentative[s]?\s+de\s+sui?cide""",
        """(?i)tent[ée]\s+de\s+((se\s+(suicider|tuer))|(mettre\s+fin\s+[àa]\s+((ses\s+jours?)|(sa\s+vie))))"""),
        raw = true),
      Source("autolysis", Seq(
        """(?i)tentative\s+d'autolyse""", """(?i)autolyse"""),
        raw = true),
      Source("intentional_drug_overdose", Seq(
        """(?i)(intoxication|ingestion)\s+m[ée]dicamenteuse\s+volontaire""",
        """(?i)\b(i\.?m\.?v\.?)\b""",
        """(?i)(intoxication|ingestion)\s*([a-zA-Z0-9_éàèôê\-]+\s*){0,3}\s*volontaire""",
        """TS\s+med\s+polymedicamenteuse""",
        """TS\s+(poly)?([\s-])?m[ée]dicamenteuse"""), raw = true),
      Source("jumping_from_height", Seq(
        """(?i)tentative[s]?\s+de\s+d[ée]fenestration""",
        """(?i)(?<!id[ée]es?\sde\s)d[ée]fenestration(?!\saccidentelle)""",
        """(?i)d[ée]fenestration\s+volontaire""",
        """(?i)d[ée]fenestration\s+intentionnelle""",
        """(?i)jet.r?\sd.un\spont"""), raw = true),
      Source("cuts", Seq("""(?i)phl[ée]botomie"""), raw = true),
      Source("strangling", Seq("""(?i)pendaison"""), raw = true),
      Source("self_destructive_behavior", Seq("""(?i)autodestruction"""),
        raw = true),
      Source("burn_gas_caustic", Seq(
        """(?i)ing[eé]stion\sde\s(produit\s)?caustique"""), raw = true)))

  /** All full-bank specs. */
  val all: Seq[Spec] = Seq(
    aids, ckd, copd, cerebrovascularAccident, congestiveHeartFailure,
    connectiveTissueDisease, dementia, diabetes, hemiplegia, leukemia,
    liverDisease, lymphoma, myocardialInfarction, pepticUlcerDisease,
    peripheralVascularDisease, solidTumor(), alcohol, tobacco, covid,
    suicideAttempt)
}
