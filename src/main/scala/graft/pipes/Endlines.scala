package graft.pipes

import graft.nlp.{Normalizer, Token}

/** Newline classification (`eds.endlines`, `/root/reference/edsnlp/pipes/
  * core/endlines/endlines.py:16-322`): clinical documents wrap lines at a
  * fixed width, so many newlines are spurious (mid-sentence) rather than
  * true end-of-lines. The reference trains a small classifier; this is the
  * rule-based equivalent over the same signals (case of the next word,
  * preceding punctuation, line-length regularity): a newline is REAL when
  * the previous visible token ends a clause (punctuation/colon) or the
  * next visible token is capitalized/a bullet; otherwise it is tagged
  * excluded so matchers and the clean-text view see through the wrap.
  */
object Endlines {

  def classify(tokens: Array[Token]): Array[Token] = {
    val n = tokens.length
    val out = tokens.clone()
    var i = 0
    while (i < n) {
      val t = tokens(i)
      if (t.text == "\n" || t.text == "\r") {
        // previous visible token
        var p = i - 1
        while (p >= 0 && Normalizer.isSpace(tokens(p))) p -= 1
        // next visible token
        var q = i + 1
        while (q < n && Normalizer.isSpace(tokens(q))) q += 1
        val prevEndsClause = p >= 0 && {
          val pt = tokens(p).text
          pt.endsWith(".") || pt.endsWith(":") || pt.endsWith(";") ||
            pt.endsWith("!") || pt.endsWith("?")
        }
        val nextOpens = q < n && {
          val qt = tokens(q).text
          qt.nonEmpty && (Character.isUpperCase(qt.charAt(0)) ||
            qt == "-" || qt == "*" || qt == "•")
        }
        // consecutive newline (paragraph break) is always real
        val paragraph =
          (p >= 0 && tokens.slice(p + 1, i).exists(_.text.contains('\n'))) ||
            (i + 1 < n && tokens(i + 1).text.contains('\n'))
        val real = prevEndsClause || nextOpens || paragraph || p < 0 || q >= n
        if (!real) out(i) = t.copy(excluded = true)
      }
      i += 1
    }
    out
  }
}
