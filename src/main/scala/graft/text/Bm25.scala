package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical member of
  * the similarity-search family (brute-force / LSH / IVF / PQ cover the
  * embedding side). Okapi BM25 with the standard (k1, b) shape and the
  * `ln(1 + (N - df + 0.5) / (df + 0.5))` non-negative idf.
  *
  * Scale shape: the per-document token stream is filtered to the |Q|
  * query terms ROW-LOCALLY before anything shuffles, so the corpus text
  * never moves — only (id, term) hits do, and those partial-aggregate
  * map-side. Document frequency and the corpus stats (N, total length)
  * are one-row / |Q|-row aggregates broadcast back into the scoring
  * join, and the final cut is a TakeOrdered — no global sort of the
  * scored corpus at 100 TB.
  *
  * Float safety across engines: each (doc, term) contribution is rounded
  * to integer BASIS POINTS before the per-doc sum, so the sum is exact
  * integer arithmetic — order-free — and the unrounded contributions
  * differ between engines only by libm ulps (every input to the
  * formula is an exact integer count). Ranking is (score_bp desc, id).
  */
object Bm25 {

  /** Top-`k` documents for the query `terms`. Returns (id, score_bp):
    * score in integer basis points (score x 10000). Documents containing
    * no query term score zero and are never candidates (BM25
    * contributions are strictly positive).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    val words = split(trim(col(textCol)), "\\s+")
    val toks = docs.select(col(idCol).as("id"),
      size(words).cast("long").as("dl"),
      explode(filter(words, w => array_contains(termArr, w))).as("term"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(words).cast("long")).cast("double").as("sum_dl"))
    val tf = toks.groupBy("id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") *
        col("n_docs") / col("sum_dl"))
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(stats))
      .withColumn("bp",
        round(idf * (col("tf") * lit(k1 + 1.0)) / denom * 10000.0)
          .cast("long"))
      .groupBy("id").agg(sum(col("bp")).as("score_bp"))
      .orderBy(col("score_bp").desc, col("id"))
      .limit(k)
  }
}
