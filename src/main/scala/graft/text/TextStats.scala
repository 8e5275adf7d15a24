package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Text analysis for training-data pipelines: quality scoring, language ID,
  * token counting, document fingerprinting. All pure column expressions
  * (codegen'd) except langId's profile lookup, which ships a small static
  * table in the closure.
  */
object TextStats {

  /** Word count on whitespace. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count estimate: word-piece regex — runs of letters
    * (split every 6 chars), digits, or single punctuation, approximating a
    * byte-pair vocabulary's granularity without shipping a vocab.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[\\p{L}]{1,6}|[0-9]{1,3}|[^\\p{L}0-9\\s]"), lit(0)))

  /** Quality heuristics: length, punctuation ratio, stopword ratio,
    * type-token ratio, mean word length — the standard pre-training
    * corpus filters (C4/Gopher-style rules).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val words = split(trim(text), "\\s+")
    val nWords = size(words).cast("double")
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(words, w => array_contains(stopArr, w)))
      .cast("double")
    val nDistinct = size(array_distinct(words)).cast("double")
    val meanLen = length(trim(text)).cast("double") / nWords
    val punctRatio =
      (length(text) - length(regexp_replace(text, "[\\p{P}]", "")))
        .cast("double") / greatest(length(text), lit(1)).cast("double")
    struct(
      nWords.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(nStop / greatest(nWords, lit(1.0)), 4).as("stopword_ratio"),
      round(nDistinct / greatest(nWords, lit(1.0)), 4).as("type_token_ratio"),
      round(punctRatio, 4).as("punct_ratio"))
  }

  /** Gopher rule GATE (Rae et al. 2021, table A1, adapted to this
    * corpus's scale): the named pass/fail verdicts a corpus build logs
    * per document, not just the raw ratios ([[qualityScore]] is the
    * diagnostic twin). Every threshold compares a 4dp-ROUNDED ratio so
    * independent engines land on the same side of each gate; `keep` is
    * the conjunction. Pure column expressions — the gate fuses into the
    * scan's codegen stage, no shuffle, trivially linear at 100 TB.
    */
  def gopherRules(text: Column, stopwords: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopHits: Int = 2, minAlphaRatio: Double = 0.8,
      minTtr: Double = 0.3): Column = {
    val words = split(trim(text), "\\s+")
    val nWords = size(words)
    val nw = greatest(nWords, lit(1)).cast("double")
    val meanLen = round(length(trim(text)).cast("double") / nw, 4)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(words, w => array_contains(stopArr, w)))
    val alphaRatio = round(
      size(filter(words, w => w.rlike("[\\p{L}]"))).cast("double") / nw, 4)
    val ttr = round(size(array_distinct(words)).cast("double") / nw, 4)
    val okWords = nWords.between(minWords, maxWords)
    val okMeanLen = meanLen.between(minMeanLen, maxMeanLen)
    val okStop = nStop >= minStopHits
    val okAlpha = alphaRatio >= minAlphaRatio
    val okTtr = ttr >= minTtr
    struct(
      nWords.cast("long").as("n_words"),
      okWords.as("ok_words"),
      okMeanLen.as("ok_mean_len"),
      okStop.as("ok_stopwords"),
      okAlpha.as("ok_alpha"),
      okTtr.as("ok_ttr"),
      (okWords && okMeanLen && okStop && okAlpha && okTtr).as("keep"))
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): split each
    * document into lines, keep a line only if it has at least `minWords`
    * words and contains no blacklisted term, then keep the document only
    * if at least `minKeptLines` lines survive; the cleaned text is the
    * surviving lines re-joined in order. C4's own line rules (terminal
    * punctuation, "lorem ipsum", curly braces) parameterize the same
    * shape — callers pass the delimiter and blacklist that discriminate
    * on their corpus.
    *
    * Scale: the whole gate is higher-order array functions over the
    * per-row split — no explode, no groupBy-reassembly shuffle, fuses
    * into the scan's codegen stage. At 100 TB this is a single map over
    * the corpus; the alternative posexplode → filter → groupBy(doc)
    * shape shuffles every surviving line's text and is never needed.
    */
  def lineGate(text: Column, delim: String, minWords: Int,
      blacklist: Seq[String], minKeptLines: Int): Column = {
    val lines = split(text, delim)
    val kept = filter(lines, l => {
      val okWords = size(split(l, " ")) >= minWords
      blacklist.foldLeft(okWords)((acc, w) => acc && !l.contains(w))
    })
    struct(
      size(lines).cast(LongType).as("n_lines"),
      size(kept).cast(LongType).as("n_kept"),
      (size(kept) >= minKeptLines).as("doc_kept"),
      array_join(kept, " ").as("text_clean"))
  }

  /** Character/stopword profiles per language for the n-gram heuristic
    * language identifier. Tiny on purpose: marker words + marker chars.
    */
  private val langProfiles: Seq[(String, Seq[String], String)] = Seq(
    ("fr", Seq("le", "la", "les", "de", "des", "et", "un", "une", "est",
      "pas", "pour", "que", "qui", "dans", "au", "aux", "du"), "éèêàçùâîô"),
    ("en", Seq("the", "of", "and", "to", "in", "is", "that", "for", "it",
      "with", "as", "was", "on", "are", "this"), ""),
    ("es", Seq("el", "la", "los", "las", "de", "y", "en", "que", "es",
      "un", "una", "por", "con", "para", "del"), "ñáéíóúü¿¡"),
    ("de", Seq("der", "die", "das", "und", "in", "den", "von", "zu",
      "mit", "ist", "des", "im", "nicht", "ein", "eine"), "äöüß"),
    ("zh", Seq.empty, "的一是不了人我在有他这中大来上国"))

  /** Heuristic language ID: argmax over per-language evidence =
    * stopword-hit ratio + marker-char ratio. Returns the language code,
    * "und" when no evidence. Fused single-pass UDF (the equivalent
    * higher-order-function formulation evaluates its lambdas interpreted,
    * dominating the query); decision logic is arithmetic-identical:
    * per-language (score, code) max with lexicographic tie-break.
    */
  def langId(text: Column): Column = {
    val profiles = langProfiles.map { case (code, stops, chars) =>
      (code, stops.toSet, chars.toSet)
    }
    val f = udf((t: String) => {
      if (t == null) "und"
      else {
        // ROOT locale: default-locale lowercase (tr-TR dotless i) would
        // diverge from the locale-independent lower() this replaced
        val words = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        val nWords = math.max(words.length, 1).toDouble
        val textLen =
          math.max(t.codePointCount(0, t.length), 1).toDouble
        var bestScore = 0.0
        var bestCode = ""
        profiles.foreach { case (code, stops, chars) =>
          var stopHits = 0
          if (stops.nonEmpty) words.foreach(w =>
            if (stops.contains(w)) stopHits += 1)
          var charHits = 0
          if (chars.nonEmpty) t.foreach(c =>
            if (chars.contains(c)) charHits += 1)
          val score = stopHits / nWords + charHits / textLen * 5.0
          if (score > bestScore ||
            (score == bestScore && code > bestCode)) {
            bestScore = score
            bestCode = code
          }
        }
        if (bestScore > 0) bestCode else "und"
      }
    })
    f(text)
  }

  /** 64-bit fingerprint of the normalized word sequence (order sensitive,
    * whitespace insensitive): xxhash64 over the canonical single-space
    * join. A polynomial rolling hash would need wraparound multiply, which
    * ANSI mode rejects; the canonicalize-then-hash form is equivalent for
    * dedup purposes and fully codegen'd.
    */
  def fingerprint(text: Column): Column =
    xxhash64(array_join(split(trim(text), "\\s+"), " "))

  /** Gopher-style repetition signals (Rae et al. 2021, table A1):
    * fraction of duplicate lines and fraction of words inside the most
    * frequent word n-gram. High values mark boilerplate/templated docs
    * that inflate LM loss. Pure column expressions:
    * `aggregate` over a frequency map for the top n-gram — no UDF, no
    * shuffle; runs inside the scan's codegen stage.
    */
  def duplicateLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val n = size(lines).cast("double")
    when(n === 0, 0.0).otherwise(
      round((n - size(array_distinct(lines)).cast("double")) / n, 4))
  }

  /** Corpus-wide unigram counts: (word, c). One map-side-combining
    * groupBy; shuffle width is the vocabulary, not the corpus.
    */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Vocabulary-based quality scores — the integer-exact stand-in for a
    * CCNet-style LM-perplexity filter (no float sums whose ordering
    * differs across engines): per doc,
    *   - n_words,
    *   - oov_ratio: fraction of word TOKENS outside the top-`topK`
    *     corpus vocabulary (C4-style "gibberish" signal),
    *   - mean_word_freq: mean corpus frequency of the doc's tokens
    *     (familiarity — low means rare/noisy vocabulary).
    * Both ratios are exact-integer divisions, so an independent engine
    * reproduces them bit-for-bit.
    *
    * Scale shape: unigram counts are one bounded shuffle ([[unigramCounts]]);
    * the counts table (vocabulary-sized) BROADCASTS by default so the
    * token->frequency join never shuffles the corpus and a hot word
    * ("the", in every doc) never becomes a shuffle key — the classic
    * join-skew trap for this op. For a vocabulary too large to broadcast
    * (a raw web corpus can exceed 100M distinct tokens of string keys),
    * pass `broadcastCounts = false`: the same plan runs as a shuffle
    * join and AQE's skew handling takes over. The top-K cut is a
    * TakeOrdered (no full sort), again vocabulary-sized. Per-doc
    * aggregation partial-aggregates map-side.
    */
  def vocabularyQuality(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int, broadcastCounts: Boolean = true): DataFrame = {
    val counts0 = unigramCounts(docs, textCol)
    val counts = if (broadcastCounts) broadcast(counts0) else counts0
    val vocab = counts0.orderBy(col("c").desc, col("word")).limit(topK)
      .select(col("word"), lit(1).as("in_vocab"))
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("word"))
    toks.join(counts, "word")
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_words"),
        round(sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("oov_ratio"),
        round(sum(col("c")).cast("double") / count(lit(1)), 4)
          .as("mean_word_freq"))
  }

  /** Unigram add-one LM cross-entropy — the log-domain CCNet/KenLM
    * quality-filter shape ([[vocabularyQuality]] is its integer-exact
    * little sibling): fit token counts on a REFERENCE corpus (CCNet
    * trains on Wikipedia; callers pass any clean slice), cap the
    * vocabulary at the top-`vocabSize` words by (count desc, word), and
    * score every target doc under
    *   p(w) = (c_w + 1) / (T + V + 1),  c_w = 0 for OOV,
    * reporting per-doc cross-entropy in nats
    *   xent = ln(T + V + 1) - (1/n) * sum_tokens ln(c_w + 1)
    * (high xent = far from the reference distribution = the docs a
    * perplexity filter drops).
    *
    * Cross-engine determinism: every ln argument is an exact integer
    * (counts), so an independent engine differs only by float-sum
    * ordering and libm ulps — bounded by ~n·ulp ≈ 1e-13 for 1k-token
    * docs, eleven orders under the 4dp rounding both sides apply; a
    * filter therefore compares the ROUNDED value.
    *
    * Scale shape, exactly [[vocabularyQuality]]'s: the LM is the small
    * side — one bounded shuffle over the REFERENCE slice fits the
    * counts, the top-V cut is a TakeOrdered, and the vocabulary-sized
    * (word, c) table BROADCASTS so scoring the 100-TB target side is a
    * stateless map (explode -> broadcast hash join -> per-doc partial
    * agg): no corpus shuffle, and a hot word never becomes a shuffle
    * key. T and V enter the plan as a broadcast one-row aggregate — no
    * separate blocking count() job.
    */
  /** Fit a capped unigram LM: top-`vocabSize` (word, count) rows by
    * (count desc, word), collected to the driver — bounded by
    * vocabSize, the size a broadcast must fit anyway — plus the
    * normalizer T (vocab token mass) and V (vocab size). Collecting
    * once makes T/V plan literals and the vocabulary a local relation:
    * leaving them as subqueries makes Catalyst re-fit the counts per
    * consumer (no exchange reuse across differently-aggregated
    * subtrees) — an extra full pass over the reference slice at 100 TB.
    */
  private[graft] def fitUnigramLm(ref: DataFrame, textCol: String,
      vocabSize: Int): (Array[(String, Long)], Long, Long) = {
    import ref.sparkSession.implicits._
    val vocab = unigramCounts(ref, textCol)
      .orderBy(col("c").desc, col("word")).limit(vocabSize)
      .as[(String, Long)].collect()
    (vocab, vocab.iterator.map(_._2).sum, vocab.length.toLong)
  }

  def lmCrossEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val (vocab, t, v) = fitUnigramLm(ref, refTextCol, vocabSize)
    val vocabDf = spark.createDataset(vocab.toSeq).toDF("word", "c")
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(vocabDf), Seq("word"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(log(coalesce(col("c"), lit(0L)) + lit(1L))).as("_s"))
      .select(col("id"), col("n_words"),
        round(lit(math.log((t + v + 1).toDouble)) -
          col("_s") / col("n_words"), 4).as("xent"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", reduced from
    * hashed bigrams to the unigram bag the SQL oracle can replay): each
    * doc's log importance ratio under two add-one unigram LMs,
    *   llr = sum_tokens [ln p_target(w) - ln p_source(w)]
    *       = sum_tokens [ln(ct_w+1) - ln(cs_w+1)]
    *         + n * [ln(Ts+Vs+1) - ln(Tt+Vt+1)],
    * fit on a TARGET corpus (the distribution you want more of —
    * Wikipedia in the paper) and a SOURCE corpus (the raw pool).
    * High llr = looks like target, not like the pool average; a
    * selector keeps the top-K by (rounded llr desc, id) — the paper's
    * deterministic top-k variant (Gumbel resampling adds noise a
    * cross-engine oracle cannot share).
    *
    * Scale shape = [[lmCrossEntropy]]'s: both LMs fit driver-side
    * (bounded by vocabSize each), their UNION ships as one broadcast
    * (word, ct, cs) local relation, and scoring the pool is a
    * stateless single pass — explode -> broadcast join -> per-doc agg;
    * a top-K selector downstream is a TakeOrdered, never a full sort.
    * Float safety as in [[lmCrossEntropy]]: integer ln arguments, 4dp
    * rounding, order ties broken by id.
    */
  def dsirLogRatio(
      docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      source: DataFrame, sourceTextCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val (tv, tT, tV) = fitUnigramLm(target, targetTextCol, vocabSize)
    val (sv, sT, sV) = fitUnigramLm(source, sourceTextCol, vocabSize)
    val tMap = tv.toMap
    val sMap = sv.toMap
    val union = (tMap.keySet ++ sMap.keySet).toSeq.sorted.map { w =>
      (w, tMap.getOrElse(w, 0L), sMap.getOrElse(w, 0L))
    }
    val lmDf = spark.createDataset(union).toDF("word", "ct", "cs")
    val perDocConst = math.log((sT + sV + 1).toDouble) -
      math.log((tT + tV + 1).toDouble)
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(lmDf), Seq("word"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(log(coalesce(col("ct"), lit(0L)) + lit(1L)) -
          log(coalesce(col("cs"), lit(0L)) + lit(1L))).as("_s"))
      .select(col("id"), col("n_words"),
        round(col("_s") + col("n_words") * lit(perDocConst), 4)
          .as("llr"))
  }

  /** Corpus-wide top-`k` word `n`-grams by occurrence count (vocabulary /
    * boilerplate mining). Grams are emitted by a fused single-pass UDF
    * (the expression form evaluates its lambdas interpreted); the plan is
    * one map-side-combining groupBy + TakeOrdered — the full gram
    * distribution is never sorted or collected.
    */
  /** Exact per-key quantiles over an INTEGER value column, computed on
    * the value HISTOGRAM: the corpus-sized work is one map-side-
    * combining groupBy (key, v); the cumulative window then runs over
    * histogram rows — |distinct values| per key, NOT documents — so
    * per-key percentiles of token lengths cost a bounded window no
    * matter the corpus. Complements `ExactNtile` (q83): the histogram
    * window is the right tool when value cardinality is bounded
    * (token/char lengths, scores in basis points); the global
    * histogram DESCENT is for unbounded/continuous values. Quantile
    * definition is type-1 (lower value at position ceil(q*n),
    * 1-indexed) — and with q in {.25, .5, .75} the product q*n is
    * exact in binary floating point (dyadic fractions), so ceil is
    * integer-exact cross-engine.
    */
  def perKeyQuantiles(docs: DataFrame, keyCol: String,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs.select(col(keyCol).as("key"), value.as("v"))
      .groupBy("key", "v").agg(count(lit(1)).as("ct"))
    val cum = sum(col("ct")).over(
      Window.partitionBy("key").orderBy("v"))
    val n = sum(col("ct")).over(Window.partitionBy("key"))
    val c = hist.withColumn("cum", cum).withColumn("n", n)
    def pct(q: Double, name: String) =
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("v")))
        .as(name)
    c.groupBy("key").agg(max(col("n")).as("n_docs"),
      pct(0.25, "p25"), pct(0.50, "p50"), pct(0.75, "p75"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-Res
    * ("Weighted random sampling with a reservoir", IPL 2006): each row
    * draws u in (0,1] from the portable seed-namespaced hash and ranks
    * by ln(u)/w (monotone-equivalent to the paper's u^(1/w)); the top-k
    * ARE a weight-proportional sample without replacement. The
    * pretraining use: "give me 10k docs, long docs proportionally more
    * likely", deterministically and reproducibly — any engine replays
    * membership from (seed, id, w) alone.
    *
    * Scale shape: the draw is row-local (hash + one ln), the cut is a
    * TakeOrdered — k rows per partition shuffle, never a global sort.
    * Determinism across engines: u = (h+1)/2^60 with h the 60-bit md5
    * position hash — the long→double conversion and the division by a
    * power of two are IEEE-defined identically everywhere — and the
    * rank key rounds to 8dp before ordering with an id tie-break, so
    * libm ln ulp differences (~1e-16 relative) sit eight orders below
    * the grid.
    */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
      k: Int, seed: Long): DataFrame = {
    val h = positionHash(seed, col("id")).cast("long")
    val u = (h + lit(1L)).cast("double") /
      lit(1152921504606846976.0) // 2^60: exact power-of-two scaling
    // Contract: integer weights >= 1. Rows with w <= 0 are filtered out
    // BEFORE the draw — in Efraimidis-Spirakis a zero-weight item must
    // never be drawn (u^(1/0) is undefined, and clamping would silently
    // make unweightable rows sampleable).
    docs.select(col(idCol).as("id"), weight.as("w"))
      .filter(col("w") > 0)
      .withColumn("key_8dp",
        round(log(u) / col("w").cast("double"), 8))
      .orderBy(col("key_8dp").desc, col("id"))
      .limit(k)
  }

  /** Per-document top-`k` TF-IDF keywords — the datasheet/card-level
    * "what is this document about" extractor (and the classic
    * relevance-weighting twin of the q85 BM25 scorer, document-side
    * instead of query-side). Scores are integer basis points of
    * `tf * (ln(N+1) - ln(df+1))` — every ln argument an exact integer
    * count, one float product in a fixed association both engines
    * share, rounded before any comparison — and ranking is
    * (score desc, word), fully deterministic.
    *
    * Scale shape: tf is the one corpus-sized shuffle (map-side
    * combining groupBy on (id, word)); df derives from tf — one row
    * per (doc, word), NOT a second corpus pass; the vocabulary
    * aggregate broadcasts (Zipf-bounded; switch to a shuffle join past
    * broadcast size); the rank Window partitions BY DOCUMENT, so there
    * is no global sort anywhere.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val toks = docs.select(col(idCol).as("id"), explode(words).as("word"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    // materialize tf: df aggregates FROM it, and without the
    // checkpoint Catalyst column-prunes the df branch into a SECOND
    // corpus explode (the count column differs, so no exchange reuse —
    // plan-audited). (id, word, tf) carries no text, so this is the
    // small frame to persist.
    val tf = toks.groupBy("id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "word")
      .join(broadcast(stats))
      .withColumn("score_bp", round(col("tf").cast("double") *
        (log(col("n_docs") + lit(1L)) - log(col("df") + lit(1L))) *
        10000.0).cast("long"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score_bp").desc, col("word"))
    scored.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("word"), col("score_bp"))
  }

  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int)
      : DataFrame = {
    val gramsUdf = udf((s: String) => {
      if (s == null) Seq.empty[String]
      else {
        val ws = s.split(" ", -1)
        if (ws.length < n) Seq(ws.mkString(" "))
        else (0 to ws.length - n).map(i =>
          ws.slice(i, i + n).mkString(" "))
      }
    })
    docs.select(explode(gramsUdf(col(textCol))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(k)
  }

  /** Fixed-budget sequence chunking with stride — the training-sequence
    * packing shape: each doc yields word-index windows
    * `[k*stride, min(k*stride + width, n))` for `k*stride < n`, so a
    * tokenizer downstream gets bounded inputs and overlapping context
    * (`stride < width`) is preserved across chunk boundaries, exactly
    * the windowing `eds.transformer` applies to long docs — surfaced
    * here at the corpus level. Pure column expressions (sequence /
    * explode inside whole-stage codegen): no UDF, no shuffle; the only
    * exchange a caller adds is their own ordering.
    */
  def chunkWindows(
      docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val n = size(split(col(textCol), " "))
    docs
      .withColumn("n", n)
      .select(col(idCol), col("n"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "begin_word")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("begin_word").cast("long").as("begin_word"),
        least(col("begin_word") + width, col("n")).cast("long")
          .as("end_word"))
  }

  /** EXACT deterministic stratified sampling — the corpus-mixing /
    * train-split operator: within each stratum (language, source,
    * domain), keep exactly `ceil(fraction * stratum_size)` rows, chosen
    * by rank under a deterministic pseudo-random order (a multiplicative
    * integer hash of the id — reproducible across engines and runs,
    * unlike `sampleBy`, which is both approximate and RNG-dependent).
    * Training-data pipelines need the EXACT quota form when mixing
    * proportions are part of the data recipe.
    *
    * Scale shape: exact per-stratum quotas WITHOUT a per-stratum sort.
    * A `row_number` window partitioned by stratum funnels each stratum
    * through one reducer — with a handful of strata (languages) that is
    * the whole corpus through ~5 tasks at 100 TB. Instead, the quota-th
    * smallest hash per stratum is found by histogram descent on the
    * bounded 32-bit hash: one groupBy over (stratum, high 16 hash bits),
    * the driver picks each stratum's boundary bucket (strata x <=65536
    * count rows), one narrow groupBy inside the boundary buckets over
    * the low 16 bits, and a tie pass on the exact threshold hash. Every
    * pass is a map-side-combining aggregate; the returned plan is
    * scan -> broadcast threshold join -> filter. Same hash, same quota,
    * same (hash, id) tie order as the window form — bit-identical
    * output.
    *
    * Ties: two rows share a hash iff their ids collide mod 2^31, so the
    * threshold-hash tie set holds ~stratum_size/2^31 rows (a few hundred
    * at 10^12 rows) — safe to collect for the exact id tie-break.
    *
    * Quota is computed in exact decimal arithmetic
    * (`BigDecimal(fraction.toString)`), matching a SQL engine's DECIMAL
    * literal — double `ceil(n * 0.2)` can round up one row extra when
    * `n*fraction` is an exact integer. Ids must be non-negative: the
    * hash uses `pmod`, where SQL `%` is sign-preserving, so a negative
    * id would rank differently in another engine. Ids must also be
    * UNIQUE within each stratum: the final filter admits every row whose
    * id equals the per-stratum tie id, so a duplicated id could overshoot
    * the quota — duplicates always share a hash, so the harmful case
    * (duplicate AT the threshold hash) is detected in the tie pass and
    * rejected with a clear error.
    *
    * Driver safety: the histogram passes collect up to
    * `strata x 65536` count rows. A cheap distinct-stratum count runs
    * first; above `maxStrata` (default 1024 — ~64M collected rows worst
    * case) the operator falls back to the `row_number` window form —
    * bit-identical output, degrading in shuffle time instead of driver
    * memory. High-cardinality stratum columns (e.g. date-hour) take the
    * fallback automatically.
    */
  def stratifiedSample(
      docs: DataFrame, idCol: String, stratumCol: String,
      fraction: Double, maxStrata: Int = 1024): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val frac = BigDecimal(fraction.toString)
    quotaSelect(docs, idCol, stratumCol, maxStrata,
      n => (BigDecimal(n) * frac)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong,
      cnt => ceil(cnt * lit(new java.math.BigDecimal(fraction.toString))))
  }

  /** Keep at most `cap` rows per stratum — the RefinedWeb/CCNet
    * "limit documents per domain" anti-boilerplate step (a handful of
    * crawl domains otherwise dominate a web corpus), under the same
    * deterministic hash order as [[stratifiedSample]] so the kept set
    * is reproducible across engines. Strata under the cap pass through
    * whole. Same histogram-descent plan and `row_number` fallback —
    * only the quota rule differs (`min(cap, n)` vs `ceil(f*n)`).
    */
  def cappedPerStratum(
      docs: DataFrame, idCol: String, stratumCol: String,
      cap: Long, maxStrata: Int = 1024): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    quotaSelect(docs, idCol, stratumCol, maxStrata,
      n => math.min(cap, n),
      cnt => least(cnt, lit(cap)))
  }

  /** The shared exact-quota selector behind [[stratifiedSample]] and
    * [[cappedPerStratum]]: per stratum, keep the `quotaOf(n)` smallest
    * rows under the deterministic (hash, id) order, located by
    * histogram descent (no per-stratum sort); `quotaExpr` is the same
    * rule as a Column for the high-cardinality window fallback.
    */
  /** The quota-selection order hash — multiplicative hash kept INSIDE
    * Long range for any non-negative 64-bit id: the id is first reduced
    * mod 2^31, so the product is < 2^31 * 2^32 < 2^63 — no silent
    * wraparound (Spark non-ANSI would wrap, another engine would error,
    * and the two would sample DIFFERENT rows). (id mod 2^31) *
    * 2654435761 mod 2^32 is the classic Knuth mix, exact in 64-bit
    * arithmetic so any engine reproduces it; for ids < 2^31 it equals
    * the unreduced form. ONE definition shared by [[stratifiedSample]],
    * [[cappedPerStratum]], and the streaming cap twin — the replay-
    * equality contract breaks the moment two copies drift.
    */
  def selectionHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  private def quotaSelect(
      docs: DataFrame, idCol: String, stratumCol: String,
      maxStrata: Int, quotaOf: Long => Long,
      quotaExpr: Column => Column): DataFrame = {
    val h = selectionHash(col(idCol))
    val spark = docs.sparkSession
    val base = docs.select(
      col(stratumCol).as("_s"), col(idCol).as("_id"), h.as("_h"))

    val nStrata = base.select(col("_s")).distinct().count()
    if (nStrata > maxStrata)
      return quotaSelectWindow(docs, idCol, stratumCol, quotaExpr, h)

    // Pass 1: per-(stratum, high-16-bits) counts. Driver walks each
    // stratum's buckets in hash order to locate the bucket containing
    // the quota-th smallest hash and the rank remaining inside it.
    val hiCounts = base
      .groupBy(col("_s"), shiftright(col("_h"), 16).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .groupBy(_.getAs[Any]("_s"))
    // stratum -> (hiBucket, rank remaining within the bucket)
    val hiBoundary = hiCounts.map { case (s, rows) =>
      val buckets = rows.map(r =>
        (r.getAs[Long]("_b"), r.getAs[Long]("_c"))).sortBy(_._1)
      val q = quotaOf(buckets.map(_._2).sum)
      var cum = 0L
      var i = 0
      while (cum + buckets(i)._2 < q) { cum += buckets(i)._2; i += 1 }
      (s, (buckets(i)._1, q - cum))
    }

    // Boundary rows carry the ORIGINAL typed stratum/id values (not a
    // toString round-trip, which silently fails to match for floats,
    // scaled decimals, binary, ...).
    val sType = base.schema("_s").dataType
    def boundaryDf(m: Map[Any, Long], valName: String): DataFrame = {
      val rows = m.toSeq.map { case (s, v) => Row(s, v) }
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(
          StructField("_bs", sType), StructField(valName, LongType))))
    }
    val hiDf = boundaryDf(hiBoundary.map { case (s, (b, _)) => (s, b) },
      "_bhi")

    // Pass 2: inside each stratum's boundary bucket only (narrow scan),
    // per-low-16-bits counts -> the exact threshold hash per stratum and
    // the rank remaining among rows that tie on it.
    val loCounts = base
      .join(broadcast(hiDf), col("_s") <=> col("_bs") &&
        shiftright(col("_h"), 16) === col("_bhi"))
      .groupBy(col("_s"), col("_h").bitwiseAND(lit(65535L)).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .groupBy(_.getAs[Any]("_s"))
    // stratum -> (threshold hash, rank remaining among ties)
    val thresholds = loCounts.map { case (s, rows) =>
      val buckets = rows.map(r =>
        (r.getAs[Long]("_b"), r.getAs[Long]("_c"))).sortBy(_._1)
      var rem = hiBoundary(s)._2
      var i = 0
      while (buckets(i)._2 < rem) { rem -= buckets(i)._2; i += 1 }
      (s, ((hiBoundary(s)._1 << 16) | buckets(i)._1, rem))
    }

    // Pass 3: exact id tie-break at the threshold hash. The tie set is
    // the mod-2^31 collision class of one hash value — tiny (see doc).
    val thrDf = boundaryDf(thresholds.map { case (s, (t, _)) => (s, t) },
      "_thr")
    val tieIds = base
      .join(broadcast(thrDf), col("_s") <=> col("_bs") &&
        col("_h") === col("_thr"))
      .groupBy(col("_s"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .collect()
      .map { r =>
        val s = r.getAs[Any]("_s")
        val ids = r.getSeq[Any](1)
        require(ids.distinct.size == ids.size,
          s"stratifiedSample requires unique ids per stratum: stratum " +
            s"'$s' has duplicated id(s) at the threshold hash " +
            s"(${ids.diff(ids.distinct).distinct.take(5).mkString(", ")})")
        (s, ids(thresholds(s)._2.toInt - 1))
      }.toMap

    // Final plan: scan -> broadcast (stratum -> threshold, tieId) join
    // -> filter. No window, no sort, no per-stratum serialization.
    val cutRows = thresholds.toSeq.map { case (s, (t, _)) =>
      Row(s, t, tieIds(s))
    }
    val cuts = spark.createDataFrame(
      java.util.Arrays.asList(cutRows: _*),
      StructType(Seq(
        StructField("_bs", sType), StructField("_thr", LongType),
        StructField("_tie", base.schema("_id").dataType))))
    docs
      .join(broadcast(cuts), col(stratumCol) <=> col("_bs") &&
        (h < col("_thr") ||
          (h === col("_thr") && col(idCol) <= col("_tie"))))
      .select(docs.columns.map(docs.col): _*)
  }

  /** High-cardinality fallback for [[quotaSelect]]: the classic
    * per-stratum `row_number` under the same (hash, id) order with the
    * same exact quota rule — bit-identical rows, paid for in shuffle
    * time (each stratum funnels through one reducer) instead of driver
    * memory. Only reached when the stratum cardinality exceeds
    * `maxStrata`.
    */
  private def quotaSelectWindow(
      docs: DataFrame, idCol: String, stratumCol: String,
      quotaExpr: Column => Column, h: Column): DataFrame = {
    val byStratum = Window.partitionBy(col(stratumCol))
    val rn = row_number().over(byStratum.orderBy(col("_h"), col(idCol)))
    val quota = quotaExpr(count(lit(1)).over(byStratum))
    docs.withColumn("_h", h)
      .withColumn("_rn", rn)
      .withColumn("_q", quota)
      .filter(col("_rn") <= col("_q"))
      .select(docs.columns.map(docs.col): _*)
  }

  /** Cross-document GPT-style sequence packing: the corpus token stream
    * is concatenated in deterministic (shard, id) order and cut into
    * fixed `budget`-token training sequences, docs splitting across
    * boundaries — the standard pretraining packing (every token used,
    * zero padding), as opposed to [[chunkWindows]]' per-doc windowing.
    * Token count is the whitespace word count; swap in
    * [[subwordCount]]'s regex or a real tokenizer upstream without
    * touching the packing plan.
    *
    * Returns one row per (sequence, doc piece):
    * (shard, seq_id, id, piece_start, piece_end) — word offsets WITHIN
    * the doc, so a downstream `slice(split(text), ...)` materializes
    * the sequence text without this operator ever shuffling text.
    *
    * Scale shape: packing is inherently sequential, so determinism at
    * 100 TB comes from sharding: each of `shards` streams packs
    * independently under one cumulative-sum window partitioned by
    * `id % shards` — pick shards ~ O(cluster parallelism) and each
    * window sorts 1/shards of the corpus ids (ids + counts only, text
    * never enters the window). The boundary explode is
    * `sequence(first_seq, last_seq)` — one extra row only when a doc
    * actually straddles a boundary. No global sort, no driver state.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    packCumsum(
      tokenized(docs, idCol, textCol)
        .withColumn("shard", pmod(col("id"), lit(shards.toLong))),
      idCol, budget, Seq(col("id")))
  }

  /** [[packSequences]] over a deterministic SEEDED SHUFFLE of the corpus
    * — the pretraining recipe's shuffle step, made portable: each doc's
    * position is the low 60 bits of `md5(seed + ":" + id)`, so the
    * permutation is reproducible bit-for-bit across engines, runs and
    * partitionings (an RNG-based shuffle is not), and changing `seed`
    * gives an independent epoch order. The position hash ALSO assigns
    * the shard (`pos % shards`), so shard membership and within-shard
    * order are both shuffled — adjacent input ids land in different
    * shards at scattered offsets, breaking any source-order locality
    * (the entire point of shuffling before packing).
    *
    * Same output schema and scale shape as [[packSequences]]: the only
    * exchange is the per-shard cumsum window over (pos, id, count)
    * rows — text never shuffles, no global sort, no driver state.
    */
  /** Low 60 bits of `md5(seed ":" id)` — the deterministic position
    * hash shared by the seeded shuffle, token-budget selection, and the
    * streaming budget twin. ONE definition: the cross-operator
    * bit-equality contract (a stream replaying a corpus in this order
    * reproduces the batch selection exactly) breaks the moment two
    * copies drift.
    */
  def positionHash(seed: Long, id: Column): Column = conv(substring(
    md5(concat_ws(":", lit(seed), id.cast("long"))), 1, 15), 16, 10)
    .cast("long")

  /** Deterministic TRAIN/VAL/TEST split assignment: a basis-point cut
    * on the portable [[positionHash]] (seed-namespaced md5), so any
    * engine, any partitioning, and any later rerun reproduces the same
    * membership — the property a dataset split must have to be citable.
    * Row-local (fuses into the scan; no shuffle at any scale);
    * proportions are exact in expectation over the hash. Pass a CLUSTER
    * REPRESENTATIVE id instead of the doc id to make the split
    * leakage-proof (near-duplicates move as one — q91).
    */
  def datasetSplit(id: Column, seed: Long,
      trainBp: Int = 8000, valBp: Int = 9000): Column = {
    require(0 <= trainBp && trainBp <= valBp && valBp <= 10000,
      "cut points must satisfy 0 <= trainBp <= valBp <= 10000")
    val bp = pmod(positionHash(seed, id), lit(10000L))
    when(bp < trainBp, "train").when(bp < valBp, "val").otherwise("test")
  }

  def shuffledPackSequences(docs: DataFrame, idCol: String,
      textCol: String, budget: Int, shards: Int, seed: Long): DataFrame = {
    require(shards > 0, "shards must be positive")
    val pos = positionHash(seed, col("id"))
    packCumsum(
      tokenized(docs, idCol, textCol)
        .withColumn("pos", pos)
        .withColumn("shard", pmod(col("pos"), lit(shards.toLong))),
      idCol, budget, Seq(col("pos"), col("id")))
  }

  // null-safe single tokenization definition: a null text counts like
  // the empty string (1 whitespace token, same as wordCount('')), so
  // toks >= 1 always — size(split(null)) would be -1, which corrupts
  // the shard cumsum and flips sequence() into descending mode
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      wordCount(coalesce(col(textCol), lit(""))).cast("long").as("toks"))

  // the shared packing tail: per-shard cumsum in `order`, then the
  // boundary explode — one row per (sequence, doc piece)
  private def packCumsum(base: DataFrame, idCol: String, budget: Int,
      order: Seq[Column]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy("shard").orderBy(order: _*)
    base
      .withColumn("tok_end", sum(col("toks")).over(w))
      .withColumn("tok_start", col("tok_end") - col("toks"))
      .select(col("shard"), col("id"), col("tok_start"), col("tok_end"),
        explode(sequence(
          expr(s"tok_start div $budget"),
          expr(s"(tok_end - 1) div $budget"))).as("seq_id"))
      .select(col("shard"), col("seq_id"), col("id").as(idCol),
        (greatest(col("tok_start"), col("seq_id") * budget) -
          col("tok_start")).as("piece_start"),
        (least(col("tok_end"), (col("seq_id") + 1) * budget) -
          col("tok_start")).as("piece_end"))
  }

  /** Deterministic weighted corpus mixture — the data-recipe operator
    * that up/down-samples by a metadata key (language, source, domain):
    * a doc with weight w is kept `floor(w)` times always, plus one more
    * with probability `frac(w)`, decided by a PORTABLE hash of its id
    * (not an RNG), so the mixture is exactly reproducible across
    * engines, runs, and partitionings — mixing proportions are part of
    * the training recipe, not noise. Weights are integer basis points
    * per 10000 (13500 = 1.35x) so the keep decision is pure integer
    * arithmetic — no float drift between engines.
    *
    * The coin is the low 60 bits of md5(id) mod 10000 — md5 because
    * every engine (Spark, DuckDB, Python) exposes it bit-identically;
    * the per-id cost is noise next to reading the row. Returns the doc
    * columns plus (n_copies, copy_idx), one row per kept copy.
    *
    * Scale shape: a broadcast map-join on the tiny weight table plus a
    * narrow explode — ZERO shuffles; the mixture of a 100-TB corpus is
    * a single map pass. Keys absent from `weightsBp` default to weight
    * 0 (dropped) — mixtures enumerate their sources explicitly.
    */
  def corpusMixture(docs: DataFrame, idCol: String, keyCol: String,
      weightsBp: Map[String, Int]): DataFrame = {
    require(weightsBp.values.forall(_ >= 0), "weights must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = broadcast(
      weightsBp.toSeq.toDF(keyCol, "weight_bp"))
    val coin = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(10000L))
    docs.join(weights, Seq(keyCol), "inner")
      .withColumn("n_copies",
        expr("weight_bp div 10000").cast("long") +
          when(coin < col("weight_bp") % 10000, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select((docs.columns.map(col) :+ col("n_copies") :+
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx")): _*)
  }

  /** Exact DOWNSAMPLE-TO-TOKEN-BUDGET per corpus slice — the data-
    * selection step of a pretraining recipe ("keep 20 B tokens of
    * English"): docs are ordered by the same deterministic md5 position
    * hash as [[shuffledPackSequences]] (so the kept prefix is a
    * reproducible uniform sample, not a source-order prefix) and a doc
    * is kept iff the cumulative token count of docs BEFORE it in that
    * order is `< budget` — the greedy prefix rule, so the kept mass
    * can overshoot by at most one document and budget 0 keeps nothing.
    * Keys absent from `budgets` are dropped.
    *
    * Scale shape: the same histogram-descent design as
    * [[stratifiedSample]], generalized from row counts to token
    * WEIGHTS. A per-key window cumsum would shuffle every doc of a
    * language into one partition — the classic skew cliff. Instead:
    * one slim (key, id, pos, toks) projection is lazily checkpointed
    * (text never leaves its scan), three 12-bit descent rounds walk
    * per-key token histograms (≤ 4096 × |keys| rows collected per
    * round, driver state O(|keys|)) to locate each key's boundary in a
    * 1/2^36 slice of the corpus, the boundary slice is resolved
    * exactly, and the final plan is scan → broadcast cut join →
    * filter: no window, no sort, no wide shuffle anywhere.
    */
  def tokenBudgetSelection(docs: DataFrame, idCol: String,
      textCol: String, keyCol: String, budgets: Map[String, Long],
      seed: Long): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    def posOf(id: Column): Column = positionHash(seed, id)
    val slim = docs.select(col(keyCol).as("_k"),
      col(idCol).cast("long").as("_id"), posOf(col(idCol)).as("_p"),
      wordCount(coalesce(col(textCol), lit(""))).cast("long").as("_t"))
      .localCheckpoint(false)
    // per-key descent state: resolved pos-prefix and tokens before it
    var prefix = Map.empty[String, Long]
    var cumBase = budgets.collect { case (k, b) if b > 0 => k -> 0L }
    // zero-budget keys resolve immediately to the empty cut
    var cuts = budgets.collect { case (k, 0L) => k -> (-1L, -1L) }
    var active = cumBase.keySet
    val shifts = Seq(48, 36, 24)
    shifts.zipWithIndex.foreach { case (shift, level) =>
      if (active.nonEmpty) {
        val scoped =
          if (level == 0) slim
          else {
            val pdf = broadcast(active.toSeq
              .map(k => (k, prefix(k))).toDF("_pk", "_pfx"))
            slim.join(pdf, col("_k") === col("_pk") &&
              shiftright(col("_p"), shift + 12) === col("_pfx"))
          }
        val hist = scoped
          .groupBy(col("_k"), shiftright(col("_p"), shift).as("_b"))
          .agg(sum(col("_t")).as("_c"))
          .collect()
          .groupBy(_.getString(0))
        active.toSeq.foreach { k =>
          hist.get(k) match {
            case None => // key absent from the corpus: nothing to keep
              cuts += k -> (-1L, -1L); active -= k
            case Some(rows) =>
              val buckets = rows.map(r =>
                (r.getLong(1), r.getLong(2))).sortBy(_._1)
              var acc = cumBase(k)
              var i = 0
              while (i < buckets.length &&
                  acc + buckets(i)._2 < budgets(k)) {
                acc += buckets(i)._2; i += 1
              }
              if (i == buckets.length) { // whole key fits the budget
                cuts += k -> (Long.MaxValue, Long.MaxValue); active -= k
              } else {
                prefix += k -> buckets(i)._1
                cumBase += k -> acc
              }
          }
        }
      }
    }
    if (active.nonEmpty) {
      // boundary slice (top 36 of 60 pos bits fixed — 1/2^36 of the
      // corpus): resolve the last kept doc exactly
      val fdf = broadcast(active.toSeq
        .map(k => (k, prefix(k))).toDF("_pk", "_pfx"))
      val fin = slim.join(fdf, col("_k") === col("_pk") &&
          shiftright(col("_p"), 24) === col("_pfx"))
        .select(col("_k"), col("_p"), col("_id"), col("_t"))
        .collect()
        .groupBy(_.getString(0))
      active.foreach { k =>
        val rows = fin(k).map(r =>
          (r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(r => (r._1, r._2))
        var acc = cumBase(k)
        var cut = (-1L, -1L)
        var i = 0
        while (i < rows.length && acc < budgets(k)) {
          cut = (rows(i)._1, rows(i)._2); acc += rows(i)._3; i += 1
        }
        cuts += k -> cut
      }
    }
    // release the slim table's checkpoint blocks (the final plan below
    // re-derives pos from the raw scan; Dataset.unpersist is a no-op
    // for localCheckpoint — unpersist the checkpointed RDD itself)
    slim.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
    val cutDf = broadcast(cuts.toSeq
      .map { case (k, (p, id)) => (k, p, id) }
      .toDF("_ck", "_cp", "_cid"))
    val p = posOf(col(idCol))
    docs.join(cutDf, col(keyCol) === col("_ck") &&
        (p < col("_cp") ||
          (p === col("_cp") && col(idCol).cast("long") <= col("_cid"))))
      .select(docs.columns.map(docs.col): _*)
  }

  /** Integer-exact square-root TEMPERATURE weights (alpha = 1/2, the
    * multilingual resampling rule): with `n_k` tokens per key,
    * `p_k = sqrt(n_k) / SUM sqrt(n_j)` and the per-doc copy factor in
    * basis points is `10000 * p_k * N / n_k`, capped at `maxWeightBp`
    * (upweighting a tiny slice 100x is never what anyone wants).
    * All arithmetic is exact — integer sqrt plus BigInt ratio — so any
    * engine reproduces the same weights bit-for-bit; no float sum
    * order or pow() libm drift can flip a rounding. The per-key token
    * aggregate collapses to one row per key before the collect, so the
    * driver state is O(|keys|) at any corpus size.
    */
  def temperatureWeightsBp(docs: DataFrame, keyCol: String,
      textCol: String, maxWeightBp: Int = 1000000): Map[String, Int] = {
    val stats = docs
      .groupBy(col(keyCol))
      .agg(sum(wordCount(coalesce(col(textCol), lit("")))
        .cast("long")).as("_n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sq = stats.map { case (k, n) => k -> isqrt(n) }
    val bigS = sq.values.map(BigInt(_)).sum
    val bigN = stats.values.map(BigInt(_)).sum
    stats.map { case (k, n) =>
      val bp = BigInt(10000) * sq(k) * bigN / (bigS * n)
      k -> bp.min(BigInt(maxWeightBp)).toInt
    }
  }

  /** [[corpusMixture]] under [[temperatureWeightsBp]] — the standard
    * sqrt-temperature rebalance applied as a deterministic mixture,
    * with the computed weight attached to every output row so the
    * weight computation itself is part of any downstream check.
    */
  def temperatureMixture(docs: DataFrame, idCol: String, keyCol: String,
      textCol: String, maxWeightBp: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bp = temperatureWeightsBp(docs, keyCol, textCol, maxWeightBp)
    val wdf = broadcast(bp.toSeq.toDF(keyCol, "weight_bp"))
    corpusMixture(docs, idCol, keyCol, bp).join(wdf, Seq(keyCol))
  }

  /** Exact integer square root (floor). `math.sqrt` is correctly
    * rounded so the initial guess is off by at most one for any
    * Long < 2^52; the two correction loops make it exact everywhere.
    * The 3037000499 clamp (= isqrt(Long.MaxValue)) keeps both `x*x`
    * sites inside Long — without it `(x+1)^2` overflows negative for
    * n >= 3037000499^2 and the increment loop runs away.
    */
  private[graft] def isqrt(n: Long): Long = {
    require(n >= 0, "isqrt of a negative")
    val max = 3037000499L
    var x = math.min(max, math.floor(math.sqrt(n.toDouble)).toLong)
    while (x > 0 && x * x > n) x -= 1
    while (x < max && (x + 1) * (x + 1) <= n) x += 1
    x
  }

  /** Occurrence count of the most frequent word `n`-gram. With the
    * total n-gram count this gives the top-n-gram fraction; exposed as
    * a count so oracles compare integers.
    */
  def topNgramCount(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => array_join(slice(words, i + 1, lit(n)), " "))
    // frequency of the mode: sort the grams, count the longest run —
    // expressible with aggregate over the sorted array
    val sorted = array_sort(grams)
    val counts = aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    counts
  }
}
