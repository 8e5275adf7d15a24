package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: only (doc_id, position, 60-bit gram hash) rows ever
  * shuffle — text never moves. The duplicated-gram set is the output of
  * a partial-aggregating groupBy; flagged positions explode x n only
  * for the flagged subset. All arithmetic is exact integers; the one
  * ratio rounds to 4dp.
  */
object ExactSubstring {

  private def md5Low60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-document duplicated-gram coverage. Returns
    * (doc_id, n_tokens, flagged_grams, covered_tokens, keep_ratio)
    * where keep_ratio = round(1 - covered/n_tokens, 4).
    */
  def flaggedCoverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        p => md5Low60(concat_ws(" ", slice(words, p + 1, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
    val g = docs.select(col(idCol).as("doc_id"),
      posexplode(grams).as(Seq("p", "gh")))
    // grams held by >= 2 distinct documents; the groupBy key is the
    // 60-bit hash, so this partial-aggregates map-side and the join
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
