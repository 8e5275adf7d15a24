package graft.nlp

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Multi-term exact matcher over the token stream, the Spark-side
  * re-expression of the reference's compiled phrase matcher
  * (`/root/reference/edsnlp/matchers/phrase.pyx:25-171`): terminology terms
  * are tokenized + normalized once into a token-level trie; matching walks
  * the document's non-space, non-excluded tokens, yielding every (possibly
  * overlapping) occurrence as a char span.
  *
  * Distribution model: the matcher object is built once on the driver and
  * captured in the UDF closure — Spark ships it to each executor once per
  * stage (equivalent to a broadcast hash join of token n-grams against the
  * terminology; with multi-GB terminologies, switch to an explicit
  * `SparkContext.broadcast`). Matching is row-local: no shuffle.
  */
final class PhraseMatcher private (
    root: PhraseMatcher.Node,
    attrNorm: Boolean) extends Serializable {
  import PhraseMatcher._

  def findMatches(tokens: Array[Token], text: String): Seq[Ent] = {
    // visible = indices of matchable tokens, in order
    val visible = new ArrayBuffer[Int](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!t.excluded && !Normalizer.isSpace(t)) visible += i
      i += 1
    }
    val out = new ArrayBuffer[Ent]
    var s = 0
    while (s < visible.length) {
      var node = root
      var j = s
      var broke = false
      while (j < visible.length && !broke) {
        val tok = tokens(visible(j))
        val key = if (attrNorm) tok.norm else tok.text
        node.children.get(key) match {
          case Some(next) =>
            next.labels.foreach { lab =>
              val b = tokens(visible(s)).begin
              val e = tok.end
              out += Ent(b, e, lab, safeSlice(text, b, e))
            }
            node = next
            j += 1
          case None => broke = true
        }
      }
      s += 1
    }
    out.toSeq
  }
}

object PhraseMatcher {
  private[nlp] final class Node extends Serializable {
    val children: mutable.HashMap[String, Node] = mutable.HashMap.empty
    var labels: List[String] = Nil
  }

  private def safeSlice(text: String, b: Int, e: Int): String =
    if (text == null || b < 0 || e > text.length) "" else text.substring(b, e)

  /** Build from label -> terms. Terms are tokenized and normalized with the
    * same pipeline as documents so "sans doute" matches across any
    * whitespace.
    */
  def build(
      terms: Map[String, Seq[String]],
      attrNorm: Boolean = true,
      normOpts: Normalizer.Options = Normalizer.Options()): PhraseMatcher = {
    val root = new Node
    terms.foreach { case (label, termList) =>
      termList.foreach { term =>
        val toks = Normalizer
          .normalize(term, Tokenizer.tokenize(term), normOpts)
          .filter(t => !t.excluded && !Normalizer.isSpace(t))
        if (toks.nonEmpty) {
          var node = root
          toks.foreach { t =>
            val key = if (attrNorm) t.norm else t.text
            node = node.children.getOrElseUpdate(key, new Node)
          }
          node.labels ::= label
        }
      }
    }
    new PhraseMatcher(root, attrNorm)
  }
}
