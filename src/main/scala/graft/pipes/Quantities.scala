package graft.pipes

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** Quantity extraction with composable units, ranges, and unit conversion —
  * re-expression of `/root/reference/edsnlp/pipes/misc/quantities/
  * quantities.py` (UnitRegistry `:142`, SimpleQuantity `:169`,
  * RangeQuantity `:276`): numbers (French decimal comma), unit token with
  * per-denominator composition (mg/l, 10^9/l, /mm3), and "entre X et Y" /
  * "X - Y" ranges. Values are normalized to the unit's base scale so
  * downstream comparisons are unit-free.
  */
object Quantities {

  /** unit -> (dimension, scale-to-base). Base units: g, l, m, s, °C, %. */
  val registry: Map[String, (String, Double)] = Map(
    "kg" -> ("mass", 1000.0), "g" -> ("mass", 1.0),
    "mg" -> ("mass", 1e-3), "µg" -> ("mass", 1e-6),
    "ug" -> ("mass", 1e-6), "ng" -> ("mass", 1e-9),
    "l" -> ("volume", 1.0), "dl" -> ("volume", 0.1),
    "m3" -> ("volume", 1000.0), "dm3" -> ("volume", 1.0),
    "cm3" -> ("volume", 1e-3),
    "cl" -> ("volume", 0.01), "ml" -> ("volume", 1e-3),
    "µl" -> ("volume", 1e-6), "mm3" -> ("volume", 1e-6),
    "m" -> ("length", 1.0), "dm" -> ("length", 0.1),
    "cm" -> ("length", 0.01), "mm" -> ("length", 1e-3),
    "µm" -> ("length", 1e-6), "um" -> ("length", 1e-6),
    "h" -> ("time", 3600.0), "min" -> ("time", 60.0), "s" -> ("time", 1.0),
    "°c" -> ("temperature", 1.0), "%" -> ("fraction", 0.01),
    "ui" -> ("unit_intl", 1.0), "mmhg" -> ("pressure", 1.0),
    // lab chemistry (base: mol) and counts (base: count)
    "mol" -> ("amount", 1.0), "mmol" -> ("amount", 1e-3),
    "µmol" -> ("amount", 1e-6), "umol" -> ("amount", 1e-6),
    "nmol" -> ("amount", 1e-9),
    "g/24h" -> ("mass_per_day", 1.0),
    "10^9/l" -> ("count_per_volume", 1e9), "10*9/l" -> ("count_per_volume", 1e9),
    "giga/l" -> ("count_per_volume", 1e9),
    "cp" -> ("tablet", 1.0), "gouttes" -> ("drop", 1.0),
    "bpm" -> ("per_minute", 1.0),
    // quantities.py:142-378 registry breadth: word time units, day
    // abbreviations (for "/j" per-day composition), area (BMI kg/m2)
    "m2" -> ("area", 1.0), "cm2" -> ("area", 1e-4),
    "j" -> ("time", 86400.0), "24h" -> ("time", 86400.0),
    "seconde" -> ("time", 1.0), "secondes" -> ("time", 1.0),
    "minute" -> ("time", 60.0), "minutes" -> ("time", 60.0),
    "heure" -> ("time", 3600.0), "heures" -> ("time", 3600.0),
    "jour" -> ("time", 86400.0), "jours" -> ("time", 86400.0),
    "semaine" -> ("time", 604800.0), "semaines" -> ("time", 604800.0),
    // word-form unit aliases (quantities.py registry breadth)
    "gramme" -> ("mass", 1.0), "grammes" -> ("mass", 1.0),
    "kilo" -> ("mass", 1000.0), "kilos" -> ("mass", 1000.0),
    "kilogramme" -> ("mass", 1000.0), "kilogrammes" -> ("mass", 1000.0),
    "milligramme" -> ("mass", 1e-3), "milligrammes" -> ("mass", 1e-3),
    "litre" -> ("volume", 1.0), "litres" -> ("volume", 1.0),
    "millilitre" -> ("volume", 1e-3), "millilitres" -> ("volume", 1e-3),
    "centimetre" -> ("length", 0.01), "centimetres" -> ("length", 0.01),
    "metre" -> ("length", 1.0), "metres" -> ("length", 1.0),
    "comprime" -> ("tablet", 1.0), "comprimes" -> ("tablet", 1.0),
    "goutte" -> ("drop", 1.0),
    "ui/l" -> ("unit_intl_per_volume", 1.0),
    "kg/m2" -> ("mass_per_area", 1.0))

  private val unitAlt = registry.keys.toSeq.sortBy(-_.length)
    .map(Pattern.quote).mkString("|")
  // French numbers: space- or NBSP-grouped thousands with optional
  // decimal tail ("4 500", "4 500,5") or plain with decimal comma/point
  private val num =
    "(?:\\d{1,3}(?:[ \\u00A0]\\d{3})+(?:[.,]\\d+)?|\\d+(?:[.,]\\d+)?)"
  // simple: "12 mg", "37,2 °C", "1.80 m"; composed: "5 mg/l", "4 500 /mm3"
  private val simple = Pattern.compile(
    s"(?<![\\d,.])(?<v>$num)\\s*(?<u>(?:$unitAlt)(?:/(?:$unitAlt))?|/(?:$unitAlt))(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)
  private val range = Pattern.compile(
    s"(?:entre\\s+(?<a>$num)\\s+et\\s+(?<b>$num)|(?<a2>$num)\\s*[-–]\\s*(?<b2>$num))\\s*(?<u>(?:$unitAlt)(?:/(?:$unitAlt))?)(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)
  // generalized lab powers beyond the fixed 10^9 entries: "250 x10*6/L",
  // "4,5 10E3/mm3" (quantities.py power tokens "x10*N")
  private val power = Pattern.compile(
    s"(?<![\\d,.])(?<v>$num)\\s*(?:x\\s*)?10\\s*[\\^*eE]\\s*(?<p>\\d{1,2})\\s*/\\s*(?<du>l|dl|cl|ml|µl|mm3)(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)
  // spelled-out and vulgar-fraction values (quantities.py number
  // tokens): "deux m", "⅛ m"
  private val wordValues: Map[String, Double] = Map(
    "zero" -> 0.0, "un" -> 1.0, "une" -> 1.0, "deux" -> 2.0,
    "trois" -> 3.0, "quatre" -> 4.0, "cinq" -> 5.0, "six" -> 6.0,
    "sept" -> 7.0, "huit" -> 8.0, "neuf" -> 9.0, "dix" -> 10.0,
    "onze" -> 11.0, "douze" -> 12.0, "quinze" -> 15.0, "vingt" -> 20.0,
    "trente" -> 30.0, "½" -> 0.5, "⅓" -> 1.0 / 3,
    "¼" -> 0.25, "⅕" -> 0.2, "⅙" -> 1.0 / 6,
    "⅛" -> 0.125, "¾" -> 0.75)
  private val wordValAlt = wordValues.keys.toSeq.sortBy(-_.length)
    .map(Pattern.quote).mkString("|")

  // spelled-out values: "deux m", "⅛ m"
  private val wordSimple = Pattern.compile(
    s"(?<![\\p{L}\\d])(?<v>$wordValAlt)\\s+(?<u>(?:$unitAlt))(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)
  // "entre X et Y unit" / "de X à Y unit" with digit or word values
  private val wordRange = Pattern.compile(
    s"(?i)(?<![\\p{L}])(?:entre|de)\\s+(?<a>$num|$wordValAlt)\\s+(?:et|[àa])\\s+(?<b>$num|$wordValAlt)\\s*(?<u>(?:$unitAlt))(?![\\p{L}\\d])")
  // compact/composite metre form: "1m50" / "1 m 50" = 1.5 m — only when
  // the trailing pair is NOT itself united ("1 m 50 kg" stays two
  // quantities, quantities.py composite handling)
  private val composite = Pattern.compile(
    s"(?<![\\d,.])(?<v>\\d+)\\s*(?<u>m|kg|g|l)\\s*(?<sub>\\d{1,2})(?![\\d,.])(?!\\s*(?:$unitAlt)(?![\\p{L}\\d]))",
    Pattern.CASE_INSENSITIVE)
  // enumeration / backward unit propagation: bare numbers chained to a
  // united quantity by , et x par ou ("8, 13 et 15dm", "2 par 1mm")
  private val chainBefore = Pattern.compile(
    s"(?<n>$num)\\s*(?:,|\\bet\\b|x|\\bpar\\b|\\bou\\b)\\s*$$",
    Pattern.CASE_INSENSITIVE)
  // fraction values: "57/22 kg" = 2.59 kg, "1 / 50 kg" = 0.02 kg — the
  // reference evaluates the slash-joined number text as a division
  // (test_quantity_snippets). Both operands exclude preceding [\d,./]
  // so chained "57/3/22" never yields a partial fraction.
  private val fraction = Pattern.compile(
    s"(?<![\\d,./])(?<a>\\d+(?:[.,]\\d+)?)\\s*/\\s*(?<b>\\d+(?:[.,]\\d+)?)\\s*(?<u>(?:$unitAlt))(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)
  // compact time forms: "1h30" (hours+minutes) and the minute/second
  // quote notation "5'14''" (test_time_quantities)
  private val timeCompact = Pattern.compile(
    "(?<![\\d,.])(?<h>\\d{1,2})\\s*h\\s*(?<min>[0-5]\\d)(?![\\d\\p{L}])")
  private val timeQuotes = Pattern.compile(
    "(?<![\\d,.])(?<min>\\d{1,3})'(?<sec>[0-5]?\\d)(?:''|\u2033)?(?![\\d'])")
  // scaled power WITHOUT a denominator: "2.4 x10*9µl" (value*10^N unit)
  private val powerUnit = Pattern.compile(
    s"(?<![\\d,.])(?<v>$num)\\s*(?:x\\s*)?10\\s*[\\^*eE]\\s*(?<p>\\d{1,2})\\s*(?<u>(?:$unitAlt))(?![\\p{L}\\d])",
    Pattern.CASE_INSENSITIVE)

  // comparison operators before a quantity ("< 5 µl",
  // "supérieur à 8 ui" -> operator attr, span extended)
  private val opBefore = Pattern.compile(
    "(?i)(?<op><=|>=|<|>|inf[ée]rieure?s?\\s+[àa]|sup[ée]rieure?s?\\s+[àa])\\s*$")

  // unitless values with a measurement trigger (quantities.py unitless
  // configs): taille/mesure -> m under 3 else cm; poids/pèse -> kg;
  // IMC/BMI -> kg/m2
  private val unitless = Pattern.compile(
    s"(?i)(?<trig>mesure|taille|p[èe]se|poids|imc|bmi)\\s*:?\\s*(?<v>$num)(?![\\d,.]|\\s*/\\s*\\d|\\s*(?:$unitAlt)(?![\\p{L}\\d]))")
  // unitless TRIGGER SEQUENCES (quantities.py unitless sequence
  // handling, test_unitless_sequences): "poids / IMC : 57/22",
  // "poids, taille, IMC : 57 et 170 et 22", headers with explicit
  // units "Poids (Kg) Taille (m) IMC\n57,0 1,70 22". Triggers and
  // values must have the SAME arity and every trigger must be known —
  // otherwise the whole group is ambiguous and yields nothing.
  private val seqTrig = "(?:mesure|taille|p[èe]se|poids|imc|bmi)"
  private val seqSep = "(?:\\s*(?:/|-|,|\\bet\\b)\\s*|\\s+)"
  private val unitlessSeq = Pattern.compile(
    s"(?i)(?<![\\p{L}])(?<trigs>$seqTrig(?:\\s*\\(\\s*[\\p{L}/0-9]{1,8}\\s*\\))?(?:$seqSep$seqTrig(?:\\s*\\(\\s*[\\p{L}/0-9]{1,8}\\s*\\))?)+)" +
      // values may be glued to a repeated trigger ("57imc22")
      s"\\s*:?\\s*(?<vals>$num(?:(?:$seqSep|$seqTrig)$num)+)")
  private val seqTrigToken = Pattern.compile(
    s"(?i)(?<t>$seqTrig)(?:\\s*\\((?<u>[\\p{L}/0-9]{1,8})\\))?")
  private val seqValToken = Pattern.compile(num)

  /** Reference label taxonomy (the size/weight/bmi quantity configs). */
  def labelOf(dimension: String): String = dimension match {
    case "length" => "size"
    case "mass" => "weight"
    case "mass_per_area" => "bmi"
    case other => other
  }

  private def parseVal(s: String): Double = {
    val t = s.trim.toLowerCase
    wordValues.getOrElse(t,
      t.replace(" ", "").replace(" ", "").replace(',', '.').toDouble)
  }

  /** (dimension, normalized scale) of a possibly composed unit "a/b".
    * Registry entries that themselves contain '/' (g/24h, 10^9/l) win
    * over per-denominator composition. Total: an unresolvable unit (e.g.
    * "g/24h/l" assembled by the regex) yields None and the match is
    * skipped — one odd token must never kill a 100 TB job.
    */
  def normalizeUnit(u: String): Option[(String, Double)] = {
    val lu = u.toLowerCase
    registry.get(lu).orElse {
      if (lu.startsWith("/"))
        registry.get(lu.drop(1)).map { case (dim, sc) =>
          (s"per_$dim", 1.0 / sc)
        }
      else if (lu.contains("/")) {
        val Array(a, b) = lu.split("/", 2)
        for ((da, sa) <- registry.get(a); (db, sb) <- registry.get(b))
          yield (s"${da}_per_$db", sa / sb)
      } else None
    }
  }

  def extract(text: String): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]
    val pm = power.matcher(text)
    while (pm.find()) {
      val v = parseVal(pm.group("v"))
      val p = pm.group("p").toInt
      registry.get(pm.group("du").toLowerCase).foreach { case (_, volScale) =>
        val scale = math.pow(10.0, p) / volScale
        out += Ent(pm.start, pm.end, "quantity",
          text.substring(pm.start, pm.end),
          Map("kind" -> "simple", "dimension" -> "count_per_volume",
            "label" -> labelOf("count_per_volume"),
            "raw_unit" ->
              s"10^$p/${pm.group("du").toLowerCase}",
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    val rm = range.matcher(text)
    while (rm.find()) {
      val a = parseVal(Option(rm.group("a")).getOrElse(rm.group("a2")))
      val b = parseVal(Option(rm.group("b")).getOrElse(rm.group("b2")))
      normalizeUnit(rm.group("u")).foreach { case (dim, scale) =>
        out += Ent(rm.start, rm.end, "quantity",
          text.substring(rm.start, rm.end),
          Map("kind" -> "range", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> rm.group("u").toLowerCase,
            "from_value" -> (a * scale).toString,
            "to_value" -> (b * scale).toString))
      }
    }
    val tcm = timeCompact.matcher(text)
    while (tcm.find()) {
      val secs = tcm.group("h").toInt * 3600.0 +
        tcm.group("min").toInt * 60.0
      out += Ent(tcm.start, tcm.end, "quantity",
        text.substring(tcm.start, tcm.end),
        Map("kind" -> "simple", "dimension" -> "time",
          "label" -> "time", "raw_unit" -> "s",
          "raw_value" -> secs.toString, "value" -> secs.toString))
    }
    val tqm = timeQuotes.matcher(text)
    while (tqm.find()) {
      val secs = tqm.group("min").toInt * 60.0 + tqm.group("sec").toInt
      out += Ent(tqm.start, tqm.end, "quantity",
        text.substring(tqm.start, tqm.end),
        Map("kind" -> "simple", "dimension" -> "time",
          "label" -> "time", "raw_unit" -> "s",
          "raw_value" -> secs.toString, "value" -> secs.toString))
    }
    val pum = powerUnit.matcher(text)
    while (pum.find()) {
      normalizeUnit(pum.group("u")).foreach { case (dim, scale) =>
        val v = parseVal(pum.group("v")) *
          math.pow(10.0, pum.group("p").toInt)
        out += Ent(pum.start, pum.end, "quantity",
          text.substring(pum.start, pum.end),
          Map("kind" -> "simple", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> pum.group("u").toLowerCase,
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    val wrm = wordRange.matcher(text)
    while (wrm.find()) {
      val a = parseVal(wrm.group("a"))
      val b = parseVal(wrm.group("b"))
      normalizeUnit(wrm.group("u")).foreach { case (dim, scale) =>
        out += Ent(wrm.start, wrm.end, "quantity",
          text.substring(wrm.start, wrm.end),
          Map("kind" -> "range", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> wrm.group("u").toLowerCase,
            "from_value" -> (a * scale).toString,
            "to_value" -> (b * scale).toString))
      }
    }
    val cm = composite.matcher(text)
    while (cm.find()) {
      normalizeUnit(cm.group("u")).foreach { case (dim, scale) =>
        val v = cm.group("v").toDouble + cm.group("sub").toDouble / 100.0
        out += Ent(cm.start, cm.end, "quantity",
          text.substring(cm.start, cm.end),
          Map("kind" -> "simple", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> cm.group("u").toLowerCase,
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    val fm = fraction.matcher(text)
    while (fm.find()) {
      val b = parseVal(fm.group("b"))
      if (b != 0.0) {
        val v = parseVal(fm.group("a")) / b
        normalizeUnit(fm.group("u")).foreach { case (dim, scale) =>
          out += Ent(fm.start, fm.end, "quantity",
            text.substring(fm.start, fm.end),
            Map("kind" -> "simple", "dimension" -> dim,
              "label" -> labelOf(dim),
              "raw_unit" -> fm.group("u").toLowerCase,
              "raw_value" -> v.toString,
              "value" -> (v * scale).toString))
        }
      }
    }
    val sm = simple.matcher(text)
    while (sm.find()) {
      val v = parseVal(sm.group("v"))
      normalizeUnit(sm.group("u")).foreach { case (dim, scale) =>
        out += Ent(sm.start, sm.end, "quantity",
          text.substring(sm.start, sm.end),
          Map("kind" -> "simple", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> sm.group("u").toLowerCase,
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    val wsm = wordSimple.matcher(text)
    while (wsm.find()) {
      val v = parseVal(wsm.group("v"))
      normalizeUnit(wsm.group("u")).foreach { case (dim, scale) =>
        out += Ent(wsm.start, wsm.end, "quantity",
          text.substring(wsm.start, wsm.end),
          Map("kind" -> "simple", "dimension" -> dim,
            "label" -> labelOf(dim),
            "raw_unit" -> wsm.group("u").toLowerCase,
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    def defaultUnit(trig: String, v: Double): String = trig match {
      case "pese" | "poids" => "kg"
      case "imc" | "bmi" => "kg/m2"
      case _ => if (v < 3) "m" else "cm" // taille 1.5 -> m, 170 -> cm
    }
    // trigger sequences first; their value spans suppress the singles
    val seqClaims = new ArrayBuffer[(Int, Int)]
    val sq = unitlessSeq.matcher(text)
    while (sq.find()) {
      val trigs = new ArrayBuffer[(String, Option[String])]
      val tm = seqTrigToken.matcher(sq.group("trigs"))
      while (tm.find()) trigs += ((graft.nlp.Normalizer
        .mapChars(tm.group("t").toLowerCase),
        Option(tm.group("u")).map(_.toLowerCase)))
      val vals = new ArrayBuffer[(Int, Int)]
      val vm = seqValToken.matcher(sq.group("vals"))
      while (vm.find())
        vals += ((sq.start("vals") + vm.start, sq.start("vals") + vm.end))
      // arity mismatch = ambiguous group: emit nothing (the reference
      // drops "poids : 57/3/22" entirely)
      if (trigs.length == vals.length) {
        trigs.zip(vals).foreach { case ((trig, explicitUnit), (vb, ve)) =>
          val v = parseVal(text.substring(vb, ve))
          val unit = explicitUnit
            .filter(u => normalizeUnit(u).isDefined)
            .getOrElse(defaultUnit(trig, v))
          normalizeUnit(unit).foreach { case (dim, scale) =>
            seqClaims += ((vb, ve))
            out += Ent(vb, ve, "quantity", text.substring(vb, ve),
              Map("kind" -> "simple", "dimension" -> dim,
                "label" -> labelOf(dim), "raw_unit" -> unit,
                "raw_value" -> v.toString, "source" -> "unitless",
                "value" -> (v * scale).toString))
          }
        }
      } else seqClaims += ((sq.start, sq.end)) // ambiguous: block singles
    }
    val um = unitless.matcher(text)
    while (um.find()) {
      val claimed = seqClaims.exists { case (b, e) =>
        um.start("v") < e && um.end("v") > b }
      if (!claimed) {
        val v = parseVal(um.group("v"))
        val trig = graft.nlp.Normalizer
          .mapChars(um.group("trig").toLowerCase)
        val unit = defaultUnit(trig, v)
        normalizeUnit(unit).foreach { case (dim, scale) =>
          out += Ent(um.start("v"), um.end("v"), "quantity",
            um.group("v"),
            Map("kind" -> "simple", "dimension" -> dim,
              "label" -> labelOf(dim), "raw_unit" -> unit,
              "raw_value" -> v.toString, "source" -> "unitless",
              "value" -> (v * scale).toString))
        }
      }
    }
    // backward unit propagation: bare numbers chained ahead of a united
    // match inherit its unit ("8, 13 et 15dm" -> three dm quantities)
    val claimed = out.map(e => (e.begin, e.end)).toSet
    val chained = new ArrayBuffer[Ent]
    out.foreach { e =>
      (e.attrs.get("raw_unit"), e.attrs.get("dimension")) match {
        case (Some(unit), Some(dim)) if e.attrs.get("kind")
            .contains("simple") =>
          val scale = normalizeUnit(unit).map(_._2).getOrElse(1.0)
          var pos = e.begin
          var continue = true
          while (continue) {
            val m = chainBefore.matcher(text.substring(0, pos))
            if (m.find()) {
              val (nb, ne) = (m.start("n"), m.end("n"))
              val free = !claimed.exists { case (b, en) =>
                nb < en && ne > b }
              if (free) {
                val v = parseVal(m.group("n"))
                chained += Ent(nb, ne, "quantity", m.group("n"),
                  Map("kind" -> "simple", "dimension" -> dim,
                    "label" -> labelOf(dim), "raw_unit" -> unit,
                    "raw_value" -> v.toString,
                    "value" -> (v * scale).toString))
                pos = nb
              } else continue = false
            } else continue = false
          }
        case _ =>
      }
    }
    out ++= chained
    // comparison-operator prefixes extend the span and set `operator`
    val withOps = out.map { e =>
      val m = opBefore.matcher(text.substring(0, e.begin))
      if (m.find()) {
        val raw = m.group("op").toLowerCase
        val op = if (raw.startsWith("sup") || raw.startsWith(">")) ">"
          else "<"
        val op2 = raw match {
          case "<=" | ">=" => raw
          case _ => op
        }
        Ent(m.start("op"), e.end, e.label,
          text.substring(m.start("op"), e.end),
          e.attrs + ("operator" -> op2))
      } else e
    }
    // ranges win over the simple matches they contain
    graft.nlp.SpanAlgebra.filterSpans(withOps.toSeq)
  }

  /** Value-from-table context — the reference's column-classification
    * algorithm (`quantities.py:961-1100` `prep_table` /
    * `infer_unit_from_table`):
    *   1. classify each column as VALUE / UNIT / POWER by majority of
    *      its non-empty cells (threshold `max(1, nonEmpty / 2)`);
    *   2. vote the table's unit direction — do unit columns tend to sit
    *      before or after value columns (`choose_before_or_after`,
    *      default after = `prefer_measure_before_unit = False`);
    *   3. link each value column to the CLOSEST unit (and power) column
    *      on the preferred side, falling back to the other side;
    *   4. a number resolves through its column's linked unit cell, then
    *      a `(unit)` suffix in the column's header, times any linked
    *      power cell.
    * The vote is what lets "mg | 5 | mL | 0.3" link left while
    * "Valeur | Unite | Valeur2 | Unite2" links right in the same
    * engine. Runs over `TextTables.findTables` spans (the `eds.tables`
    * upstream dependency). Emitted entities carry `source=table`.
    */
  def extractFromTables(text: String): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]
    val headerUnitRe = Pattern.compile("\\(([^)]{1,12})\\)\\s*$")
    // a numeric cell may carry a comparison operator ("> 5" — the
    // reference's complex-table scenario, test_quantities.py:583-631);
    // the operator survives into the entity attrs like the inline path
    val opNumRe = Pattern.compile("(>=|<=|[<>≥≤])?\\s*(" + num + ")")
    def opOf(raw: String): Option[String] = raw match {
      case ">" => Some(">")
      case "<" => Some("<")
      case "≥" | ">=" => Some(">=")
      case "≤" | "<=" => Some("<=")
      case _ => None
    }
    val powerRe = Pattern.compile("(?i)x?\\s*10\\s*[*^]\\s*(\\d{1,2})")
    for (table <- TextTables.findTables(text)) {
      val cells = TextTables.toCells(text, table)
      if (cells.nonEmpty) {
        val byRow = cells.groupBy(_.row)
        def isNum(c: TextTables.Cell) = opNumRe.matcher(c.text).matches()
        def isPower(c: TextTables.Cell) = powerRe.matcher(c.text).matches()
        def isUnit(c: TextTables.Cell) = !isPower(c) &&
          !c.text.exists(_.isDigit) && normalizeUnit(c.text).isDefined
        // the reference counts any cell CONTAINING a unit mention toward
        // the unit classification — notably a header like "duration (s)"
        // — which makes such a value column self-link and resolve
        // through its own header (test_table_header_units)
        def isUnitish(c: TextTables.Cell) = isUnit(c) || {
          val m = headerUnitRe.matcher(c.text)
          m.find() && normalizeUnit(m.group(1)).isDefined
        }
        val headerRows = byRow.collect {
          case (r, cs) if !cs.exists(isNum) => r
        }.toSet
        val nCols = cells.map(_.col).max + 1
        val cellAt = cells.map(c => (c.row, c.col) -> c).toMap

        // 1. column classification by majority over non-empty cells
        def classify(pred: TextTables.Cell => Boolean): Seq[Int] =
          (0 until nCols).filter { col =>
            val colCells = cells.filter(c =>
              c.col == col && c.text.trim.nonEmpty)
            colCells.count(pred) >= math.max(1, colCells.size / 2) &&
              colCells.exists(pred)
          }
        val valueCols = classify(isNum)
        val unitCols = classify(isUnitish)
        val powerCols = classify(isPower)

        // 2. direction vote (reference default: unit AFTER the value)
        def preferBefore(targets: Seq[Int]): Boolean = {
          if (valueCols.isEmpty || targets.isEmpty) return false
          val before = valueCols.count(v => targets.exists(_ < v))
          val after = valueCols.count(v => targets.exists(_ > v))
          before > after
        }
        // 3. closest target column on the preferred side, else other side
        def pickClosest(base: Int, others: Seq[Int],
            before: Boolean): Option[Int] =
          others.minByOption(col =>
            (if (before) col >= base else col < base, math.abs(col - base)))
        val unitBefore = preferBefore(unitCols)
        val powerBefore = preferBefore(powerCols)
        val links: Map[Int, (Option[Int], Option[Int])] =
          valueCols.map(v => v -> (
            pickClosest(v, unitCols, unitBefore),
            pickClosest(v, powerCols, powerBefore))).toMap

        // 4. resolve each numeric cell of a value column
        def headerUnitOf(cols: Seq[Int]): Option[String] =
          cols.iterator.flatMap { col =>
            cells.filter(c => headerRows(c.row) && c.col == col)
              .sortBy(_.row)
              .flatMap { hc =>
                val m = headerUnitRe.matcher(hc.text)
                if (m.find() && normalizeUnit(m.group(1)).isDefined)
                  Some(m.group(1))
                else None
              }.headOption
          }.nextOption()
        for (c <- cells
             if !headerRows(c.row) && isNum(c) && links.contains(c.col)) {
          val (unitCol, powerCol) = links(c.col)
          val cellUnit = unitCol
            .flatMap(uc => cellAt.get((c.row, uc)))
            .filter(isUnit).map(_.text)
          val u = cellUnit.orElse(
            headerUnitOf((unitCol.toSeq :+ c.col).distinct))
          val mult = powerCol
            .flatMap(pc => cellAt.get((c.row, pc)))
            .collect { case pcell if isPower(pcell) =>
              val pm = powerRe.matcher(pcell.text)
              pm.matches()
              math.pow(10.0, pm.group(1).toInt)
            }.getOrElse(1.0)
          for (uu <- u; (dim, scale) <- normalizeUnit(uu)) {
            val cm = opNumRe.matcher(c.text)
            require(cm.matches()) // isNum guaranteed it
            val v = parseVal(cm.group(2)) * mult
            var attrs = Map("kind" -> "simple", "dimension" -> dim,
              "label" -> labelOf(dim),
              "raw_unit" -> uu.toLowerCase, "raw_value" -> v.toString,
              "value" -> (v * scale).toString, "source" -> "table")
            Option(cm.group(1)).flatMap(opOf)
              .foreach(op => attrs += ("operator" -> op))
            out += Ent(c.begin, c.end, "quantity", c.text, attrs)
          }
        }
      }
    }
    out.toSeq
  }

  /** Config-driven VALUELESS quantities (quantities.py
    * valueless_patterns, test_valueless_patterns): term/regex mentions
    * that stand for a fixed (value, unit) — "positif" -> 1 bool.
    */
  case class ValuelessPattern(
      regex: Seq[String], value: Double, unit: String)

  def extractValueless(
      text: String, patterns: Seq[ValuelessPattern],
      label: String = "quantity"): Seq[Ent] = {
    if (text == null) return Nil
    val out = new ArrayBuffer[Ent]
    patterns.foreach { vp =>
      vp.regex.foreach { re =>
        val m = Pattern.compile(re,
          Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE).matcher(text)
        while (m.find())
          out += Ent(m.start, m.end, label, m.group(),
            Map("kind" -> "valueless", "raw_unit" -> vp.unit,
              "raw_value" -> vp.value.toString,
              "value" -> vp.value.toString))
      }
    }
    graft.nlp.SpanAlgebra.filterSpans(out.toSeq)
  }

  /** Inline + table-inferred quantities, deduped longest-leftmost. */
  def extractWithTables(text: String): Seq[Ent] =
    graft.nlp.SpanAlgebra.filterSpans(
      extract(text) ++ extractFromTables(text))

  /** The reference's `merge_mode` composition with a span getter
    * (shared by quantities/dates, `dates.py:356-377` and
    * test_quantities.py test_merge_align/test_merge_intersect):
    *   - `"align"`: each CANDIDATE span keeps its own bounds AND label
    *     (identity/provenance preserved, quantities.py:1910-1917) and
    *     has the parsed value of its best-overlapping quantity (largest
    *     char overlap, `sort_by_overlap`) merged into its attrs;
    *     candidates with no overlapping quantity drop;
    *   - `"intersect"`: the quantity spans overlapping any candidate
    *     zone are kept as themselves.
    */
  def mergeWithSpans(
      text: String, candidates: Seq[Ent], mode: String): Seq[Ent] = {
    val qs = extractWithTables(text)
    def overlap(a: Ent, b: Ent): Int =
      math.min(a.end, b.end) - math.max(a.begin, b.begin)
    mode match {
      case "align" =>
        candidates.flatMap { c =>
          qs.filter(q => overlap(q, c) > 0)
            .sortBy(q => (-overlap(q, c), q.begin))
            .headOption
            .map(q => c.copy(attrs = c.attrs ++ q.attrs))
        }
      case "intersect" =>
        qs.filter(q => candidates.exists(c => overlap(q, c) > 0))
      case other =>
        throw new IllegalArgumentException(
          s"unknown merge_mode '$other' (align|intersect)")
    }
  }
}
