package graft.io

import scala.collection.mutable.ArrayBuffer

import graft.nlp.Ent

/** HuggingFace text/NER converters — token lists + BIO(-UL) tag sequences
  * to/from documents with char-offset spans
  * (`/root/reference/edsnlp/data/converters.py:1086-1413`): text is the
  * space-joined tokens; spans are reconstructed by run-length over the
  * tag sequence; the inverse tags each token by its covering span.
  */
object HuggingFace {

  /** (tokens, tags) -> (text, entities). Accepts BIO and BIOUL
    * (B/I/O/U/L prefixes, "PREFIX-LABEL" or bare "O").
    */
  def nerToDoc(tokens: Seq[String], tags: Seq[String]): (String, Seq[Ent]) = {
    require(tokens.length == tags.length,
      s"${tokens.length} tokens vs ${tags.length} tags")
    val text = tokens.mkString(" ")
    val offsets = new Array[Int](tokens.length)
    var pos = 0
    tokens.indices.foreach { i =>
      offsets(i) = pos
      pos += tokens(i).length + 1
    }
    val ents = new ArrayBuffer[Ent]
    var start = -1
    var curLabel = ""
    def flush(endIdx: Int): Unit = {
      if (start >= 0) {
        val b = offsets(start)
        val e = offsets(endIdx) + tokens(endIdx).length
        ents += Ent(b, e, curLabel, text.substring(b, e))
      }
      start = -1
    }
    tags.indices.foreach { i =>
      val tag = tags(i)
      val (prefix, label) = tag.split("-", 2) match {
        case Array(p, l) => (p.toUpperCase, l)
        case _ => (tag.toUpperCase, "")
      }
      prefix match {
        case "B" | "U" =>
          flush(i - 1); start = i; curLabel = label
          if (prefix == "U") flush(i)
        case "I" | "L" =>
          if (start < 0 || curLabel != label) { // tolerate broken BIO
            flush(i - 1); start = i; curLabel = label
          }
          if (prefix == "L") flush(i)
        case _ => flush(i - 1)
      }
    }
    flush(tokens.length - 1)
    (text, ents.toSeq)
  }

  /** (text tokens with offsets, entities) -> BIO tags, inverse of
    * `nerToDoc` for token boundaries aligned with spans.
    */
  def docToNer(tokens: Seq[String], ents: Seq[Ent]): Seq[String] = {
    val offsets = new Array[Int](tokens.length)
    var pos = 0
    tokens.indices.foreach { i =>
      offsets(i) = pos
      pos += tokens(i).length + 1
    }
    tokens.indices.map { i =>
      val b = offsets(i)
      val e = b + tokens(i).length
      ents.find(en => b >= en.begin && e <= en.end) match {
        case Some(en) if b == en.begin => s"B-${en.label}"
        case Some(en) => s"I-${en.label}"
        case None => "O"
      }
    }
  }
}
