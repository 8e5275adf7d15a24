package graft.io

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** Inline-annotated markup converter — the golden-fixture format of the
  * reference test suite (`/root/reference/edsnlp/data/converters.py:
  * 714-950`, presets `md`/`xml`): parse `"[lesion](disease negation=true)"`
  * or `"<disease negation=true>lesion</disease>"` into (clean text,
  * expected entities with attrs). Offsets in the returned entities are
  * positions in the CLEAN text.
  */
object Markup {

  /** One markup dialect: `pattern` must expose named groups `txt`,
    * `label`, `attrs`; `render` receives (entity text, label, attr
    * string incl. leading space or empty).
    */
  final case class Preset(
      pattern: Pattern,
      render: (String, String, String) => String) extends Serializable

  private val mdPat = Pattern.compile(
    "\\[(?<txt>[^\\]]*)\\]\\((?<label>[^\\s)]+)(?<attrs>[^)]*)\\)")
  private val xmlPat = Pattern.compile(
    "<(?<label>[a-zA-Z_][\\w-]*)(?<attrs>[^>]*)>(?<txt>.*?)</\\k<label>>",
    Pattern.DOTALL)
  private val curlyPat = Pattern.compile(
    "\\{(?<txt>[^}]*)\\}\\((?<label>[^\\s)]+)(?<attrs>[^)]*)\\)")

  /** Name-resolved preset registry (the reference's `PRESETS` +
    * opener/closer customization, `converters.py:744-829`): `md` and
    * `xml` match the reference; `curly` (`{lesion}(disease neg=true)`)
    * ships as the extension example; users register their own dialects
    * with [[registerPreset]].
    */
  private val presets =
    scala.collection.concurrent.TrieMap[String, Preset](
      "md" -> Preset(mdPat, (t, l, a) => s"[$t]($l$a)"),
      "xml" -> Preset(xmlPat, (t, l, a) => s"<$l$a>$t</$l>"),
      "curly" -> Preset(curlyPat, (t, l, a) => s"{$t}($l$a)"))

  /** Registration is DRIVER-JVM state: a name registered here does not
    * exist on executors. Code that parses inside Spark tasks must
    * resolve the [[Preset]] on the driver ([[preset]]) and capture the
    * (serializable) object in the closure — as [[Converters]] does —
    * rather than shipping the name.
    */
  def registerPreset(name: String, preset: Preset): Unit =
    presets.put(name, preset)

  def availablePresets: Seq[String] = presets.keys.toSeq.sorted

  /** Resolve a preset by name (throws with the available list). */
  def preset(name: String): Preset =
    presets.getOrElse(name, throw new IllegalArgumentException(
      s"Unknown markup preset '$name'. " +
        s"Available presets are ${availablePresets.mkString(", ")}"))

  private def resolvePreset(name: String): Preset = preset(name)

  private val attrPat =
    Pattern.compile("([\\w.]+)\\s*=\\s*\"?([^\\s\"]+)\"?")

  private def parseAttrs(s: String): Map[String, String] = {
    if (s == null) return Map.empty
    val m = attrPat.matcher(s)
    val out = scala.collection.mutable.Map.empty[String, String]
    while (m.find()) out += (m.group(1) -> m.group(2))
    out.toMap
  }

  /** Parse markup -> (clean text, entities with clean-text offsets). */
  def parse(markup: String, preset: String = "md"): (String, Seq[Ent]) =
    parseWith(markup, resolvePreset(preset))

  /** Preset-object variant — executor-safe (no name lookup at task
    * time).
    */
  def parseWith(markup: String, preset: Preset): (String, Seq[Ent]) = {
    val m = preset.pattern.matcher(markup)
    val sb = new StringBuilder
    val ents = new ArrayBuffer[Ent]
    var last = 0
    while (m.find()) {
      sb.append(markup.substring(last, m.start))
      val begin = sb.length
      val txt = m.group("txt")
      sb.append(txt)
      ents += Ent(begin, begin + txt.length, m.group("label"), txt,
        parseAttrs(m.group("attrs")))
      last = m.end
    }
    sb.append(markup.substring(last))
    (sb.toString, ents.toSeq)
  }

  /** Render (text, ents) back to markup (round-trip / debugging).
    * Overlapping entities are legal upstream (PhraseMatcher emits
    * overlapping matches) but markup is strictly nested-free, so any
    * entity starting before the render cursor is skipped rather than
    * crashing the substring arithmetic.
    */
  def render(text: String, ents: Seq[Ent], preset: String = "md"): String = {
    val p = resolvePreset(preset)
    val sorted = ents.sortBy(e => (e.begin, -e.end))
    val sb = new StringBuilder
    var last = 0
    sorted.foreach { e =>
      if (e.begin >= last) {
      sb.append(text.substring(last, e.begin))
      val attrs = e.attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      val a = if (attrs.isEmpty) "" else s" $attrs"
      sb.append(p.render(text.substring(e.begin, e.end), e.label, a))
      last = e.end
      }
    }
    sb.append(text.substring(last))
    sb.toString
  }
}
