package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document EXACT-substring duplication analysis — the
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2022) ExactSubstr shape, re-expressed relationally: a token
  * n-gram occurring in two or more DISTINCT documents marks its token
  * range as duplicated; per document we report how much of the token
  * stream that duplicated mass covers. (The paper removes the spans;
  * the coverage report is the decision input — the removal itself is
  * the q56-style span surgery downstream.) Reference counterpart: the
  * paragraph/repeated-run dedup family (q53/q61) generalized from
  * within-doc runs to corpus-wide collisions.
  *
  * This is the relational answer to the paper's suffix array: instead
  * of one O(corpus) suffix structure on one machine, fixed-width gram
  * hashes shuffle to their hash partition and count distinct holders —
  * fully data-parallel, no global structure. With n = 8 a duplicated
  * region of length L >= 8 is covered by its L - 7 grams, so coverage
  * equals the paper's within 7 tokens at each region edge.
  *
  * Gram hashing is the FUSED single-pass walker the dedup family uses
  * (FNV-1a words -> polynomial gram mix -> splitmix finalizer): the
  * first draft built grams with `transform(sequence, p -> md5(
  * concat_ws(slice(...))))` and the interpreted higher-order lambdas
  * dominated the whole pipeline (~12 s of a 6.6 s query's lineage at
  * sf0.1; the walker does the same work in ~1 s). The DuckDB oracle
  * hashes gram STRINGS with md5 instead — any injective-in-practice
  * hash family yields identical OUTPUTS (counts, never hash values),
  * the q31/q32 argument: P(64-bit collision) ~ 1e-14 per gram pair.
  *
  * Scale shape: only (doc_id, position, 64-bit gram hash) rows ever
  * shuffle — text never moves. The duplicated-gram set is the output of
  * a partial-aggregating groupBy; flagged positions explode x n only
  * for the flagged subset. All arithmetic is exact integers; the one
  * ratio rounds to 4dp.
  */
object ExactSubstring {

  /** Positional n-gram hashes of whitespace-split text, one fused pass:
    * element i = hash of words [i, i+n). Docs shorter than `n` words
    * emit nothing (no full-width gram exists). Trim replicates
    * `functions.trim` (0x20 only), split replicates `split(_, "\\s+")`.
    */
  private[dedup] def gramHashesUdf(n: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => {
      if (s == null) Seq.empty[Long]
      else {
        var from = 0
        var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        val ws = s.substring(from, to).split("\\s+", -1)
        if (ws.length < n) Seq.empty[Long]
        else {
          val wh = new Array[Long](ws.length)
          var i = 0
          while (i < ws.length) {
            var h = 0xCBF29CE484222325L
            val w = ws(i)
            var j = 0
            while (j < w.length) {
              h = (h ^ w.charAt(j)) * 0x100000001B3L
              j += 1
            }
            wh(i) = h
            i += 1
          }
          val out = new Array[Long](ws.length - n + 1)
          var p = 0
          while (p < out.length) {
            var sh = 0L
            var k = 0
            while (k < n) {
              sh = sh * 0x9E3779B97F4A7C15L + wh(p + k)
              k += 1
            }
            var z = sh
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            out(p) = z ^ (z >>> 31)
            p += 1
          }
          out.toSeq
        }
      }
    })

  /** Per-document duplicated-gram coverage. Returns
    * (doc_id, n_tokens, flagged_grams, covered_tokens, keep_ratio)
    * where keep_ratio = round(1 - covered/n_tokens, 4).
    */
  def flaggedCoverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    // g feeds two branches (the dup-set aggregate and the join back)
    // and is DELIBERATELY recomputed rather than checkpointed: the
    // positional gram stream is ~24 bytes/token — LARGER than the
    // corpus text it derives from — so at scale materializing it costs
    // more than a second scan + fused-walker pass (the opposite call
    // from tf in tfidfKeywords, whose (id, word, tf) frame is far
    // smaller than the token stream). Callers with an expensive
    // upstream (q100's gated pool) checkpoint THAT input instead.
    val g = docs.select(col(idCol).as("doc_id"),
      posexplode(gramHashesUdf(n)(col(textCol))).as(Seq("p", "gh")))
    // grams held by >= 2 distinct documents; the groupBy key is the
    // 64-bit hash, so this partial-aggregates map-side and the join
    // back is a plain hash equi-join on the same key
    val dup = g.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("gh")
    val flagged = g.join(dup, "gh").select(col("doc_id"), col("p"))
    val cov = flagged
      .select(col("doc_id"), col("p"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
      .groupBy("doc_id")
      .agg(countDistinct(col("p")).as("flagged_grams"),
        countDistinct(col("pos")).as("covered_tokens"))
    docs.select(col(idCol).as("doc_id"),
        size(words).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("flagged_grams"), lit(0L)).as("flagged_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(lit(1.0) - coalesce(col("covered_tokens"), lit(0L))
          .cast("double") / greatest(col("n_tokens"), lit(1L)), 4)
          .as("keep_ratio"))
  }
}
