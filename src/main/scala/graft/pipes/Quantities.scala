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
    "cl" -> ("volume", 0.01), "ml" -> ("volume", 1e-3),
    "µl" -> ("volume", 1e-6), "mm3" -> ("volume", 1e-6),
    "m" -> ("length", 1.0), "cm" -> ("length", 0.01),
    "mm" -> ("length", 1e-3),
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
    "bpm" -> ("per_minute", 1.0))

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

  private def parseVal(s: String): Double =
    s.replace(" ", "").replace(" ", "").replace(',', '.').toDouble

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
    val rm = range.matcher(text)
    while (rm.find()) {
      val a = parseVal(Option(rm.group("a")).getOrElse(rm.group("a2")))
      val b = parseVal(Option(rm.group("b")).getOrElse(rm.group("b2")))
      normalizeUnit(rm.group("u")).foreach { case (dim, scale) =>
        out += Ent(rm.start, rm.end, "quantity",
          text.substring(rm.start, rm.end),
          Map("kind" -> "range", "dimension" -> dim,
            "raw_unit" -> rm.group("u").toLowerCase,
            "from_value" -> (a * scale).toString,
            "to_value" -> (b * scale).toString))
      }
    }
    val sm = simple.matcher(text)
    while (sm.find()) {
      val v = parseVal(sm.group("v"))
      normalizeUnit(sm.group("u")).foreach { case (dim, scale) =>
        out += Ent(sm.start, sm.end, "quantity",
          text.substring(sm.start, sm.end),
          Map("kind" -> "simple", "dimension" -> dim,
            "raw_unit" -> sm.group("u").toLowerCase,
            "raw_value" -> v.toString,
            "value" -> (v * scale).toString))
      }
    }
    // ranges win over the simple matches they contain
    graft.nlp.SpanAlgebra.filterSpans(out.toSeq)
  }
}
