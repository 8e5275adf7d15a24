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
