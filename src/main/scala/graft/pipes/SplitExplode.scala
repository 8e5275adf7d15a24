package graft.pipes

import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** 1→N document generators (`eds.split`, `eds.explode`):
  * `/root/reference/edsnlp/pipes/misc/split/split.py:92-227` (`subset_doc`
  * span remapping `:50-88`) and `/root/reference/edsnlp/pipes/misc/explode/
  * explode.py:11-116`. Distributed form: `flatMap`/`posexplode` over the
  * computed fragments — a narrow 1→N map, the relational UNNEST of
  * SURVEY §2.11.
  */
object SplitExplode {

  case class Fragment(
      index: Int, begin: Int, end: Int, text: String, ents: Seq[Ent])

  /** Token-budget split — the reference's `max_length` (in TOKENS,
    * split.py): one fragment per run of `maxTokens` word tokens, each
    * fragment carrying the trailing whitespace up to the next fragment's
    * first token. Entities remap as in [[split]].
    */
  def splitByTokens(
      text: String,
      ents: Seq[Ent] = Nil,
      maxTokens: Int = 12): Seq[Fragment] = {
    if (text == null || text.isEmpty) return Nil
    val words = graft.nlp.Tokenizer.tokenize(text)
      .filterNot(graft.nlp.Normalizer.isSpace)
    if (words.isEmpty) return Seq(Fragment(0, 0, text.length, text, ents))
    val groups = words.grouped(maxTokens).toSeq
    groups.zipWithIndex.map { case (g, i) =>
      val b = if (i == 0) 0 else g.head.begin
      val e =
        if (i + 1 < groups.length) groups(i + 1).head.begin
        else text.length
      val sub = ents.filter(en => en.begin >= b && en.end <= e)
        .map(en => en.copy(begin = en.begin - b, end = en.end - b))
      Fragment(i, b, e, text.substring(b, e), sub)
    }
  }

  /** Split a document at regex boundaries (default: blank lines), with
    * optional max fragment length (split at the last word boundary before
    * the cap). Entities are remapped into fragment-local offsets; entities
    * crossing a cut are dropped (reference behavior: spans outside the
    * subset are discarded).
    */
  def split(
      text: String,
      ents: Seq[Ent] = Nil,
      boundary: String = "\n{2,}",
      maxLength: Int = Int.MaxValue): Seq[Fragment] = {
    if (text == null || text.isEmpty) return Nil
    val cuts = new ArrayBuffer[(Int, Int)] // (begin, end) of fragments
    val m = java.util.regex.Pattern.compile(boundary).matcher(text)
    var start = 0
    while (m.find()) {
      if (m.start() > start) cuts += ((start, m.start()))
      start = m.end()
    }
    if (start < text.length) cuts += ((start, text.length))

    // enforce maxLength by re-cutting at word boundaries
    val bounded = cuts.flatMap { case (b, e) =>
      if (e - b <= maxLength) Seq((b, e))
      else {
        val parts = new ArrayBuffer[(Int, Int)]
        var s = b
        while (e - s > maxLength) {
          val cap = s + maxLength
          val sp = text.lastIndexOf(' ', cap)
          val cut = if (sp > s) sp else cap
          parts += ((s, cut))
          s = cut + (if (sp > s) 1 else 0)
        }
        if (s < e) parts += ((s, e))
        parts
      }
    }

    bounded.zipWithIndex.map { case ((b, e), i) =>
      val sub = ents.filter(en => en.begin >= b && en.end <= e)
        .map(en => en.copy(begin = en.begin - b, end = en.end - b))
      Fragment(i, b, e, text.substring(b, e), sub)
    }.toSeq
  }

  /** One output doc per selected entity (label filter), each carrying only
    * its own span — `eds.explode` semantics.
    */
  def explodeBySpan(
      text: String, ents: Seq[Ent],
      labels: Option[Set[String]] = None): Seq[(Ent, String)] =
    ents.filter(e => labels.forall(_.contains(e.label)))
      .map(e => (e, text))
}
