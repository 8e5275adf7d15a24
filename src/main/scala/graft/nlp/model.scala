package graft.nlp

/** Core annotation model (SURVEY.md §1.1). Documents are plain nested
  * columns: a token layer, sentence spans, and entity spans with a
  * string-keyed attribute map (the `span._.x` escape hatch of the reference,
  * `edsnlp/data/converters.py:594-608`). Everything is char-offset based —
  * token indices never cross an operator boundary, so operators compose even
  * if re-tokenization happens in between.
  */
case class Token(
    begin: Int,
    end: Int,
    text: String,
    norm: String,
    excluded: Boolean)

/** A sentence (or any segment) as a char interval. */
case class Sent(begin: Int, end: Int)

/** An annotated span. `attrs` carries qualifier outputs ("negation" ->
  * "true"), terminology ids ("kb_id" -> ...), parsed values, etc. — coerced
  * to typed columns at the converter layer, mirroring the reference's
  * bool-coercion on export (`edsnlp/data/converters.py:297-306`).
  */
case class Ent(
    begin: Int,
    end: Int,
    label: String,
    text: String,
    attrs: Map[String, String] = Map.empty)
