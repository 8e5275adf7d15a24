package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-shaped model
  * the big web-corpus recipes score documents with (DCLM's fastText
  * filter, FineWeb-Edu's classifier, CCNet's linear LM gate; reference
  * counterpart: the trainable scorer family of SURVEY §2.9, reduced to
  * the inference shape a rule-label distillation can verify end to end).
  *
  * Model: Bernoulli naive-Bayes log-odds over DISTINCT hashed word
  * buckets —
  *   score(d) = prior + sum_{b in buckets(d)} w_b,
  *   w_b = ln((k_b + 1) * (nNeg + 2)) - ln((d_b + 1) * (nPos + 2))
  * where k_b / d_b count labeled reference docs containing bucket b.
  * "Training" here is the closed-form count pass (the fastText
  * supervised objective without the SGD loop); the LABELS come from an
  * existing deterministic rule gate, so fit -> score -> threshold is
  * reproducible by an independent engine.
  *
  * Scale shape: the feature map is ROW-LOCAL (split -> md5 bucket ->
  * array_distinct, fused into the scan; no tokenizer state), the fit is
  * one partial-aggregating pass bounded by `nBuckets` rows, the weight
  * table broadcasts, and scoring is a second stateless pass (explode
  * distinct buckets -> broadcast hash join -> per-doc integer sum). At
  * 100 TB nothing shuffles but (id, bucket) pairs, and those combine
  * map-side.
  *
  * Float safety across engines: every ln argument is an exact integer
  * (product of two counts, < 2^62 at any realistic reference size), each
  * weight rounds to integer BASIS POINTS before the per-doc sum, so the
  * doc score is order-free integer arithmetic (the q79/q85 argument).
  */
object QualityClassifier {

  /** Portable 60-bit md5 word hash, bucketed — the engine-neutral
    * convention every oracle replays (`('0x'||substr(md5(w),1,15))::BIGINT`).
    */
  private def md5Bucket(word: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(word), 1, 15), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** JVM-side replica of [[md5Bucket]] for the streaming twin's
    * row-local scorer (bit-identical: lowercase-hex md5, first 15
    * nibbles, nonnegative modulo).
    */
  private[graft] def bucketOf(word: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(word.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % nBuckets
  }

  /** Distinct feature buckets of one document, row-locally. */
  private[graft] def docBuckets(text: Column, nBuckets: Int): Column =
    array_distinct(transform(split(trim(text), "\\s+"),
      w => md5Bucket(w, nBuckets)))

  /** Fit per-bucket log-odds weights in basis points from a labeled
    * reference frame. Returns ((bucket, weight_bp) frame bounded by
    * `nBuckets` rows, prior_bp). The label column must be boolean.
    */
  def fit(ref: DataFrame, textCol: String, labelCol: String,
      nBuckets: Int): (DataFrame, Long) = {
    val perDoc = ref.select(col(labelCol).as("y"),
      docBuckets(col(textCol), nBuckets).as("bs"))
    // one-row class-count aggregate; collected (2 longs) so nPos/nNeg
    // enter the weight expression as plan literals
    val counts = perDoc.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("npos"),
      sum(when(col("y"), 0L).otherwise(1L)).as("nneg")).head()
    val nPos = counts.getLong(0)
    val nNeg = counts.getLong(1)
    val weights = perDoc
      .select(col("y"), explode(col("bs")).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("kb"),
        sum(when(col("y"), 0L).otherwise(1L)).as("db"))
      .select(col("bucket"),
        round((log((col("kb") + 1L) * lit(nNeg + 2L)) -
          log((col("db") + 1L) * lit(nPos + 2L))) * 10000.0)
          .cast("long").as("weight_bp"))
    val priorBp =
      math.round((math.log((nPos + 1).toDouble) -
        math.log((nNeg + 1).toDouble)) * 10000.0)
    (weights, priorBp)
  }

  /** Score `docs` under a fitted model: (id, score_bp, keep_pred).
    * Missing buckets (absent from the reference) contribute zero — the
    * broadcast join is left, the sum coalesces.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, priorBp: Long, nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(docBuckets(col(textCol), nBuckets)).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg((sum(coalesce(col("weight_bp"), lit(0L))) + lit(priorBp))
        .as("score_bp"))
      .select(col("id"), col("score_bp"),
        (col("score_bp") >= 0L).as("keep_pred"))

  /** The composed distillation query: fit on the `refFilter` slice
    * labeled by the Gopher rule gate, score the complement. One call so
    * the declared query and its stress row share a single definition.
    *
    * Honesty note: the synthetic sf corpus draws every document from
    * ONE vocabulary, and its Gopher gate is length-dominated — a signal
    * a bag-of-words NB is nearly blind to — so the student here is a
    * weak approximation BY CONSTRUCTION of the test data. The declared
    * query verifies the fit/score ENGINE (hashing, bounded fit,
    * broadcast, integer scoring) against the oracle; the classifier's
    * learning power is spec'd separately on a two-vocabulary corpus
    * where the signal exists (SketchOpsSpec "separates classes").
    */
  def distillGopherGate(docs: DataFrame, idCol: String, textCol: String,
      refFilter: Column, stopwords: Seq[String],
      nBuckets: Int = 1024): DataFrame = {
    val labeled = docs.filter(refFilter)
      .select(col(textCol),
        TextStats.gopherRules(col(textCol), stopwords)("keep").as("y"))
    val (weights, priorBp) = fit(labeled, textCol, "y", nBuckets)
    score(docs.filter(!refFilter), idCol, textCol, weights, priorBp,
      nBuckets)
  }
}
