package graft.nlp

import scala.collection.mutable.ArrayBuffer

/** Rule-based sentence segmentation with the semantics of the reference's
  * compiled segmenter (`/root/reference/edsnlp/pipes/core/sentences/
  * fast_sentences.pyx:14-148`, defaults from `sentences.py:160-210`):
  * a sentence starts after closing punctuation (. ! ? …) or after >=
  * `minNewlineCount` newline tokens followed by a capitalized word; a digit
  * right after a period cancels the boundary (decimal numbers, section
  * numbering); excluded (pollution) tokens are invisible to the rules.
  */
object Sentencizer {
  private val punctChars: Set[String] =
    Set("!", ".", "?", "܂", "‼", "‽", "⁇", "⁈", "⁉", "﹖", "﹗", "！", "．", "？")

  case class Options(
      minNewlineCount: Int = 1,
      hardNewlineCount: Int = -1,
      checkCapitalized: Boolean = true,
      ignoreExcluded: Boolean = true)

  private def isDigitTok(t: Token): Boolean =
    t.text.nonEmpty && t.text.forall(Character.isDigit)

  private def isPunctTok(t: Token): Boolean =
    t.text.nonEmpty && t.text.forall(c =>
      Character.getType(c) match {
        case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
            Character.START_PUNCTUATION | Character.END_PUNCTUATION |
            Character.INITIAL_QUOTE_PUNCTUATION |
            Character.FINAL_QUOTE_PUNCTUATION | Character.OTHER_PUNCTUATION =>
          true
        case _ => false
      })

  private def isCapitalized(t: Token): Boolean =
    t.text.nonEmpty && Character.isUpperCase(t.text.charAt(0))

  /** Token indices that start a sentence. */
  def sentenceStarts(tokens: Array[Token], opts: Options = Options())
      : Array[Boolean] = {
    val starts = Array.fill(tokens.length)(false)
    if (tokens.isEmpty) return starts
    starts(0) = true
    var seenPeriod = false
    var newlineCount = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!(opts.ignoreExcluded && t.excluded)) {
        val isInPunct = punctChars.contains(t.text)
        val isNewline = t.text.contains('\n') || t.text.contains('\r')
        val hardNewline =
          opts.hardNewlineCount >= 0 && newlineCount >= opts.hardNewlineCount
        var continued = false
        if (seenPeriod || newlineCount >= opts.minNewlineCount) {
          if (seenPeriod && isDigitTok(t)) {
            seenPeriod = false
            continued = true
          } else if (!(isInPunct || isNewline || isPunctTok(t))) {
            if (seenPeriod) starts(i) = true
            else
              starts(i) =
                hardNewline || !opts.checkCapitalized || isCapitalized(t)
            newlineCount = 0
            seenPeriod = false
            continued = true
          }
        }
        if (!continued) {
          if (isInPunct) seenPeriod = true
          if (isNewline) newlineCount += 1 else newlineCount = 0
        }
      }
      i += 1
    }
    starts
  }

  /** Sentences as char spans: begin of first token to end of last token. */
  def sentences(tokens: Array[Token], opts: Options = Options())
      : Array[Sent] = {
    val starts = sentenceStarts(tokens, opts)
    val out = new ArrayBuffer[Sent]
    var sb = -1
    var se = -1
    var i = 0
    while (i < tokens.length) {
      if (starts(i)) {
        if (sb >= 0) out += Sent(sb, se)
        sb = tokens(i).begin
      }
      se = tokens(i).end
      i += 1
    }
    if (sb >= 0) out += Sent(sb, se)
    out.toArray
  }
}
