package graft.nlp

/** Span getter/setter CONFIGS — the re-expression of the reference's
  * `SpanGetterArg`/`SpanSetterArg` resolution
  * (`/root/reference/edsnlp/utils/span_getters.py:40-134`): a mapping
  * from span-group name to either "all spans" (`True` there) or a label
  * subset, usable both to SELECT spans feeding a pipe and to ROUTE a
  * pipe's output into groups. `"ents"` addresses the main entity layer,
  * like `doc.ents`; other names address `doc.spans[name]` groups (here a
  * `Map[String, Seq[Ent]]` column).
  */
object SpanGetters {

  type SpanGroups = Map[String, Seq[Ent]]

  sealed trait GroupFilter extends Serializable
  /** the reference's `True`: every span of the group */
  case object All extends GroupFilter
  /** the reference's label list */
  final case class WithLabels(labels: Seq[String]) extends GroupFilter

  /** The main-entity pseudo-group name. */
  val Ents = "ents"

  /** Select spans per config, preserving the CONFIG's order (the
    * reference iterates dict insertion order) then span order, and
    * deduplicating spans reachable through several groups (the `seen`
    * guard of `get_spans`, span_getters.py:46-69).
    */
  def getSpans(
      ents: Seq[Ent], groups: SpanGroups,
      config: Seq[(String, GroupFilter)]): Seq[Ent] = {
    val seen = scala.collection.mutable.Set.empty[Ent]
    config.flatMap { case (name, f) =>
      val src = if (name == Ents) ents else groups.getOrElse(name, Nil)
      val admitted = f match {
        case All => src
        case WithLabels(ls) =>
          val set = ls.toSet
          src.filter(e => set.contains(e.label))
      }
      admitted.filter(seen.add)
    }
  }

  /** Route spans into groups per config (`set_spans` semantics): each
    * configured group receives the spans its filter admits; the `ents`
    * group additionally drops overlaps (doc.ents must be non-overlapping
    * in the reference — longest-leftmost like spaCy).
    */
  def setSpans(
      spans: Seq[Ent],
      config: Seq[(String, GroupFilter)]): (Seq[Ent], SpanGroups) = {
    var ents: Seq[Ent] = Nil
    val groups = scala.collection.mutable.Map.empty[String, Seq[Ent]]
    config.foreach { case (name, f) =>
      val admitted = f match {
        case All => spans
        case WithLabels(ls) =>
          val set = ls.toSet
          spans.filter(e => set.contains(e.label))
      }
      if (name == Ents) ents = SpanAlgebra.filterSpans(admitted)
      else groups(name) = admitted
    }
    (ents, groups.toMap)
  }
}

/** Context-window algebra — the reference's `ContextWindow` DSL
  * (`/root/reference/edsnlp/utils/span_getters.py:352-540`): leaf windows
  * `words[a:b]` (token offsets around the span) and `sents[a:b]`
  * (sentence offsets around the span's sentence; `sent` = `sents[0:0]`),
  * combined with `|` (union) and `&` (intersection). Windows evaluate to
  * char ranges over the original text, so they compose with every
  * char-offset operator here.
  */
object ContextWindows {

  sealed trait Win extends Serializable {
    def apply(
        begin: Int, end: Int,
        tokens: Array[Token], sents: Seq[Sent]): (Int, Int)
  }

  final case class Words(before: Int, after: Int) extends Win {
    def apply(begin: Int, end: Int,
        tokens: Array[Token], sents: Seq[Sent]): (Int, Int) = {
      val words = tokens.filterNot(Normalizer.isSpace)
      if (words.isEmpty) return (begin, end)
      var ti = words.indexWhere(w => w.end > begin)
      if (ti < 0) ti = words.length - 1
      var tj = words.lastIndexWhere(w => w.begin < end)
      if (tj < 0) tj = 0
      val lo = math.max(0, ti + before)
      val hi = math.min(words.length - 1, tj + after)
      (words(lo).begin, words(hi).end)
    }
  }

  /** `dropLast` reproduces the reference class's end computation
    * (`span_getters.py:514-519`): the window ends one TOKEN before the
    * next sentence's start — dropping the final token of the last
    * covered sentence — except when no sentence follows (then the
    * window runs to the end of the document). make_span_context_getter
    * uses full sentence spans instead; [[spanContextGetter]] mirrors
    * that.
    */
  final case class Sents(
      before: Int, after: Int, dropLast: Boolean = false) extends Win {
    def apply(begin: Int, end: Int,
        tokens: Array[Token], sents: Seq[Sent]): (Int, Int) = {
      if (sents.isEmpty) return (begin, end)
      val si = sents.indexWhere(s => begin < s.end && end > s.begin) match {
        case -1 => if (begin >= sents.last.end) sents.length - 1 else 0
        case i => i
      }
      val lo = math.max(0, si + before)
      val hi = math.min(sents.length - 1, si + after)
      val hiEnd =
        if (!dropLast || si + after >= sents.length - 1) {
          if (si + after >= sents.length - 1 && dropLast) tokens.lastOption
            .map(_.end).getOrElse(sents(hi).end).max(sents(hi).end)
          else sents(hi).end
        } else {
          // drop the last non-space token of the final covered sentence
          val words = tokens.filter(t => !Normalizer.isSpace(t) &&
            t.begin >= sents(hi).begin && t.end <= sents(hi).end)
          if (words.length >= 2) words(words.length - 2).end
          else sents(hi).begin
        }
      (sents(lo).begin, hiEnd)
    }
  }

  final case class Or(l: Win, r: Win) extends Win {
    def apply(begin: Int, end: Int,
        tokens: Array[Token], sents: Seq[Sent]): (Int, Int) = {
      val (lb, le) = l(begin, end, tokens, sents)
      val (rb, re) = r(begin, end, tokens, sents)
      (math.min(lb, rb), math.max(le, re))
    }
  }

  final case class And(l: Win, r: Win) extends Win {
    def apply(begin: Int, end: Int,
        tokens: Array[Token], sents: Seq[Sent]): (Int, Int) = {
      val (lb, le) = l(begin, end, tokens, sents)
      val (rb, re) = r(begin, end, tokens, sents)
      val b = math.max(lb, rb)
      val e = math.min(le, re)
      if (b <= e) (b, e) else (begin, end)
    }
  }

  private val leafPat = java.util.regex.Pattern.compile(
    """\s*(words|sents)\[(-?\d+):(-?\d+)\]\s*|\s*(sent)\s*""")

  /** Parse `"words[-5:5] & sent"` / `"words[-5:8] | sents[-1:1]"`.
    * `&` binds tighter than `|`, matching the reference where the query
    * is evaluated as a Python expression over window objects
    * (`span_getters.py:352-540`): `a | b & c` is `a | (b & c)`.
    */
  def parse(query: String): Win = {
    def leaf(s: String): Win = {
      val m = leafPat.matcher(s)
      require(m.matches(), s"cannot parse context window '$s' " +
        "(expected words[a:b], sents[a:b], or sent)")
      if (m.group(4) != null) Sents(0, 0, dropLast = true)
      else {
        val (a, b) = (m.group(2).toInt, m.group(3).toInt)
        if (m.group(1) == "words") Words(a, b)
        else Sents(a, b, dropLast = true)
      }
    }
    val terms = query.split('|').map { seg =>
      val factors = seg.split('&').map(_.trim)
      require(factors.forall(_.nonEmpty), s"cannot parse context '$query'")
      factors.map(leaf).reduceLeft[Win](And(_, _))
    }
    terms.reduceLeft[Win](Or(_, _))
  }

  /** The reference's `make_span_context_getter`: symmetric-or-pair word
    * and sentence context, unioned. `contextSents` counts SENTENCES
    * INCLUDING the span's own on each side (n=1 -> own sentence only),
    * as the reference getter does.
    */
  def spanContextGetter(
      contextWords: (Int, Int),
      contextSents: (Int, Int)): Win = {
    val w = Words(-contextWords._1, contextWords._2)
    if (contextSents == ((0, 0))) w
    else {
      val s = Sents(-(contextSents._1 - 1).max(0),
        (contextSents._2 - 1).max(0))
      if (contextWords == ((0, 0))) s else Or(w, s)
    }
  }
}
