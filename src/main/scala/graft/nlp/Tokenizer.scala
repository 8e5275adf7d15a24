package graft.nlp

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Word-level tokenizer with the semantics of the reference's clinical
  * tokenizer (`/root/reference/edsnlp/language.py:47-117`):
  *
  *  - numbers split from letters ("ACR5" -> "ACR", "5"), with decimal
  *    point/comma kept inside the number ("3,5" is one token);
  *  - every newline is its own token (so "\n \n" -> "\n", "\n");
  *  - punctuation chars are single tokens;
  *  - runs of non-newline whitespace are single (excluded) tokens;
  *  - clinical abbreviations ("Dr.", "Pr.", "M.", "Mme.", "Mlle.") and
  *    acronyms ("C.P.G") keep their trailing period;
  *  - a trailing apostrophe is kept on the word when followed by a letter
  *    ("l'" + "estomac").
  *
  * Pure JVM function — wrapped as a Spark UDF in [[graft.functions]]; the
  * regex compiles once per JVM (executor), not per row.
  */
object Tokenizer {
  private val exceptions = "Dr\\.|Pr\\.|M\\.|Mme\\.|Mlle\\.|(?i:ep\\.)"
  private val acronym = "[A-Z][A-Z0-9]*\\.(?=[^\\W])"
  private val numLike = "\\d+(?:[.,]\\d(?![.,]?[0-9])|(?![.,]?[0-9]))?"
  // Unicode punctuation + symbols + the quote variants the reference adds.
  private val punctCls = "\\p{P}\\p{S}\"'ˊ＂〃ײ᳓″״‶˶ʺ“”˝"
  private val default =
    s"[^\\d$punctCls\\n\\s]+(?:['ˊ](?=[\\p{L}]|$$))?"

  private val wordRegex: Pattern = Pattern.compile(
    s"($exceptions|$acronym|$numLike|[$punctCls]|[\\n\\r\\t]|[^\\S\\r\\n\\t]+|$default)")

  /** Tokenize; whitespace runs become tokens flagged excluded-on-normalize.
    * Unlike the reference we do not attach trailing single spaces to the
    * previous token — spaces are ordinary (excluded) tokens, which keeps
    * `begin`/`end` a partition of the text.
    */
  def tokenize(text: String): Array[Token] = {
    if (text == null) return Array.empty
    val m = wordRegex.matcher(text)
    val out = new ArrayBuffer[Token](text.length / 5 + 4)
    while (m.find()) {
      val t = m.group(1)
      out += Token(m.start(1), m.end(1), t, t, excluded = false)
    }
    out.toArray
  }
}
