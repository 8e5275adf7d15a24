package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.nlp.RegexSubSpans

/** PII-style redaction with span tracking: replace every regex match and
  * keep the offset bookkeeping, so annotations produced on the ORIGINAL
  * text can be mapped into the redacted text (and back) instead of being
  * invalidated — the composition contract of
  * [[graft.nlp.RegexSubSpans]] (reference:
  * `/root/reference/edsnlp/utils/fuzzy_alignment.py:11-115`), surfaced
  * as a DataFrame column op for the scrubbing stage of a training-data
  * pipeline (emails, phone numbers, MRNs — any pattern bank).
  *
  * Row-local by construction: no shuffle, runs inside the scan stage.
  * The UDF returns a struct so one pass yields the redacted text, the
  * edit count, and a mapped offset witness (the redacted-text begin of
  * the LAST edit — -1 when nothing matched), which downstream spans
  * consume via the same DeltaCollection mechanics.
  */
object Redact {

  final case class Redacted(text: String, n_redactions: Int,
      last_begin: Int)

  /** Redact every match of `pattern` with `replacement` (group refs
    * `\1`/`\g<1>` supported). Returns struct(text, n_redactions,
    * last_begin) where last_begin is the begin offset of the final
    * redaction IN THE REDACTED TEXT — i.e. an original-coordinate
    * position mapped forward through all preceding edits.
    */
  def redactWithSpans(text: Column, pattern: String, replacement: String)
      : Column = {
    // compile once per executor (Pattern is Serializable); compiling
    // inside the row fn would re-parse the regex per document
    val compiled = java.util.regex.Pattern.compile(pattern,
      java.util.regex.Pattern.DOTALL)
    val f = udf((s: String) => {
      if (s == null) Redacted(null, 0, -1)
      else {
        val (out, dc) = RegexSubSpans.subWithSpans(compiled, replacement, s)
        val lastBegin =
          if (dc.begins.isEmpty) -1
          else dc.apply(Seq(dc.begins.last), side = "left").head
        Redacted(out, dc.begins.length, lastBegin)
      }
    })
    f(text)
  }
}
