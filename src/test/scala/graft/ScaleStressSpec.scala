package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** sf1-scale stress for the CAPPED near-dup/ANN operators: the caps
  * (bucket limits, prefix pruning, multi-probe bounds) are designed and
  * unit-spec'd, but only ever measured at sf0.1 — this spec scales the
  * corpus ~10x (≈ sf1) and asserts that output and candidate volumes
  * grow ≈ linearly and stay inside the cap-implied bounds, i.e. nothing
  * degenerates toward the quadratic cliff that would sink a 100-TB run.
  *
  * Corpus construction: 10 copies of the sf0.1 tables. Document copy k
  * rotates the vowels through a per-copy alphabet (copy 0 is the
  * original), so in-copy near-dup structure is preserved while copies
  * stay textually distinct — near-dup pair counts must therefore scale
  * ~10x, not ~100x. Embedding copies shift vec_id by k*N, preserving
  * the id-derived cluster structure the ANN queries build on.
  *
  * Tagged [[SlowStress]] — exclude with `testOnly -- -l graft.SlowStress`
  * when iterating.
  */
object SlowStress extends Tag("graft.SlowStress")

class ScaleStressSpec extends AnyFunSuite {
  import TestSpark.spark

  private val baseDir = "/root/testdata/sf0.1"
  private val scaledDir = "target/stress-sf1"
  private val docCopies = 10
  // embeddings scale 8x, not 10x: the ANN queries derive cluster
  // directions from `vec_id div 8` MOD 2003, so ids past 8*2003 would
  // wrap onto earlier clusters — identical vectors across "different"
  // clusters, i.e. REAL extra near-dup pairs that are an artifact of
  // the synthetic lattice, not of the operators under test
  private val embCopies = 8

  private def ensureScaled(): Unit = synchronized {
    if (new File(s"$scaledDir/embeddings.parquet/_SUCCESS").exists()) return
    val alpha = "aeioubcdfghjklmn" // substring(k+1, 5) per copy; k=0 = identity
    relational.Tables.documents(spark, baseDir)
      .crossJoin(spark.range(docCopies.toLong).toDF("k"))
      .select((col("k") * 1000000L + col("doc_id")).as("doc_id"),
        expr(s"translate(text, 'aeiou', substring('$alpha', k + 1, 5))")
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
    val emb = relational.Tables.embeddings(spark, baseDir)
    val n = emb.count()
    emb.crossJoin(spark.range(embCopies.toLong).toDF("k"))
      .select((col("k") * n + col("vec_id")).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")
  }

  test("capped operators: outputs and wall-time scale ~linearly at 10x corpus",
      SlowStress) {
    ensureScaled()
    // q34 (exact brute-force top-k) is EXCLUDED by design: it is the
    // labeled quadratic baseline — a broadcast crossJoin per its own
    // contract — so a 10x corpus is ~100x work by specification, not a
    // scale defect. Its scale path is q45/q51, which ARE measured here.
    // q69 (pairs -> connected components) rides along: its pair input
    // scales like q32's and the star-contraction rounds must stay
    // O(log n), so ~linear wall-time is exactly the claim under test.
    // q74's outputs are budget-bound (en/fr rows stay ~flat; only the
    // keep-all zh slice scales), so it exercises the "not shrunk /
    // not quadratic" band plus the fixed-round histogram descent at
    // 10x; q75 recomputes its weights from the 10x corpus — uniform
    // scaling leaves sqrt-ratios unchanged, so output must be ~10x
    // q78 (IVF+PQ) is a scale-path query like q51: cells scale with the
    // corpus and candidates stream as codes, so ~linear wall-time is
    // the claim; at 10x the codebooks go genuinely lossy (2003 distinct
    // directions > 256 codewords) which changes recall, not row counts
    // (top-k always emits k per query). q77 stays out like q34: it is
    // the declared O(N*Q) baseline scan by contract.
    // q80's outputs are cap-bound like q74's budget-bound ones (20
    // sources stay 20 at 10x, so rows stay flat at 15/source) — the
    // band's "not shrunk / not quadratic" then pins the fixed-round
    // histogram descent. q79 is stressed separately below: its FILTER
    // count is not scale-stable by construction (a 10x vowel-rotated
    // corpus dilutes the shared top-V vocabulary, shifting every score),
    // so the band assertions would test the synthetic corpus, not the
    // operator; the scoring pass itself is the linear claim.
    // q84's survivor set scales with the corpus (copies keep their %5
    // split and per-copy vowel rotation mirrors the base contamination
    // structure); q85/q88's outputs are k-bound (rows stay 25 — the
    // band then pins the scan+broadcast plan shape at 10x; q88 adds
    // the index build each rep, the honest build+probe cost); q86 is a
    // pure per-row gate, rows scale exactly 10x. q87 stays OUT like
    // q34/q77: it is the declared O(N*Q) baseline scan by contract.
    // Round-10 rows: q93's scoring rows = pool docs (exact 10x; the fit
    // stays bounded at 1024 buckets); q95's rows = docs (exact 10x; its
    // gram groupBy key space scales with the corpus, the claim under
    // test); q96/q97 emit FIXED-cardinality summaries (5 langs / 5
    // probes) — the band's "not shrunk / not quadratic" then pins the
    // bounded register state at 10x token volume. q94 stays OUT like
    // q34/q77/q87: it is the declared O(N*Q) baseline scan by contract
    // (both query count and corpus scale, so work is ~64x by design).
    val names = Seq("q31_jaccard_pairs", "q32_minhash_lsh", "q45_ann_lsh",
      "q51_ann_ivf", "q52_cosine_neardup", "q58_semantic_dedup",
      "q61_repeated_runs", "q69_dedup_components", "q70_sequence_pack",
      "q74_token_budget", "q75_temperature_mixture", "q78_ann_ivfpq",
      "q80_source_cap", "q83_length_deciles", "q84_bloom_decontaminate",
      "q85_bm25", "q86_gopher_gate", "q88_bm25_index_probe",
      "q90_dataset_split", "q91_leakage_split", "q92_snapshot_diff",
      "q93_fasttext_gate", "q95_exact_substring", "q96_hll_distinct",
      "q97_cms_heavy_hitters",
      // q98: in-copy containment structure only (vowel rotation keeps
      // copies textually disjoint) -> pairs ~10x; candidate volume is
      // df-capped like the LSH band caps. q99: rows = 3 per doc, exact
      // 10x; the rank window partitions by doc, so no global sort can
      // appear at any scale.
      "q98_containment_pairs", "q99_tfidf_keywords",
      // q100 emits one row per language (flat) — the band pins the
      // composed gate -> coverage -> profile pipeline's wall-time at
      // 10x token volume; q101's output is k-bound (100 rows) — the
      // band pins the row-local draw + TakeOrdered shape
      "q100_corpus_profile", "q101_weighted_sample",
      // q102: cross-slice near-dup hits live inside each vowel-rotated
      // copy -> ~10x rows; the build+probe pair pins index-write and
      // bucket-join wall-time at 10x
      "q102_neardup_index_probe",
      // q103 emits one row per language (flat); its window runs over
      // the length histogram, so 10x documents cannot widen it
      "q103_length_quartiles",
      // q107 is a pure per-row line gate like q86: rows scale exactly
      // 10x and the whole filter fuses into the scan
      "q107_line_gate",
      // maintenance family: outputs are lang-cardinality flat (q123/
      // q124/q126) or key-count flat (q127), so the band pins the
      // WALL-TIME claims — merge cost scales with touched partitions
      // (10x fr/xx/de data), CDC feed + incremental stats stay
      // batch-sized, time travel inverts with batch-sized joins, and
      // the bloom build is one linear pass. q125 stays out only
      // because the scaled dir carries no events table.
      "q123_merge_upsert", "q124_cdc_incremental_stats",
      "q126_time_travel", "q127_bloom_lookup",
      // q130 reads the batch-sized feed (4 flat rows); q131's fusion
      // windows rank K-BOUNDED retrieved lists (10 flat rows), so the
      // band pins the two retrievals' linear wall-time
      "q130_change_audit", "q131_hybrid_rrf",
      // q135 emits one row per language — the band pins the one-pass
      // checksum scan's linear wall-time (sum is associative, so the
      // 10x corpus cannot change the shape, only the scan length)
      "q135_table_checksum",
      // versioned family (round 12): outputs are lang-cardinality flat;
      // the band pins the WALL-TIME claims — the versioned merge's
      // blast radius is the touched-partition file set (10x fr/xx/de),
      // version resolution is one listing + one small JSON read at any
      // scale, the DV delete writes a key list and the DV read is one
      // broadcast anti-join over the corpus scan, and compaction
      // repacks only over-fragmented groups. q137/q138 stay out only
      // because the scaled dir carries no events table (like q125);
      // q140 stays out like q34/q77/q87 — its exact-baseline side is
      // the declared O(N*Q) scan by contract (covered by the dedicated
      // q104 recall stress below).
      "q136_versioned_merge", "q139_dv_point_delete",
      "q141_versioned_compact",
      // round 13: q149's replace blast radius is the named partitions'
      // file set; q150's clone is O(live files) hard links + a merge
      // whose blast radius is the touched partitions — both flat
      // lang-cardinality outputs, so the band pins the wall-time claims
      "q149_replace_partition", "q150_shallow_clone")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val baseRows = fn(spark, baseDir).count()
      val tBase = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bigRows = fn(spark, scaledDir).count()
      val tBig = (System.nanoTime() - t1) / 1e9
      info(f"$name: rows $baseRows -> $bigRows, " +
        f"$tBase%.1fs -> $tBig%.1fs at 10x")
      // ~linear OUTPUT growth: a quadratic near-dup explosion would be
      // ~100x. Copy-0-only structures (planted clusters) keep some
      // queries sublinear, hence the lower bound is just "not shrunk".
      assert(bigRows <= 12L * baseRows + 100,
        s"$name output grew superlinearly: $baseRows -> $bigRows")
      assert(bigRows >= baseRows,
        s"$name output shrank at 10x: $baseRows -> $bigRows")
      // ~linear WALL TIME, with wide contention slack (expected ~10x on
      // a quiet box; quadratic would be ~100x)
      assert(tBig <= 40.0 * math.max(tBase, 1.0),
        f"$name wall-time superlinear: $tBase%.1fs -> $tBig%.1fs")
    }
  }

  test("LM cross-entropy scoring scales ~linearly at 10x corpus",
      SlowStress) {
    ensureScaled()
    def score(dir: String): (Long, Double) = {
      val all = relational.Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val n = graft.text.TextStats.lmCrossEntropy(
        all.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        all.filter(col("doc_id") % 5 === 0), "text",
        vocabSize = 4096).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (baseRows, tBase) = score(baseDir)
    val (bigRows, tBig) = score(scaledDir)
    info(f"lmCrossEntropy: rows $baseRows -> $bigRows, " +
      f"$tBase%.1fs -> $tBig%.1fs at 10x")
    // scoring emits exactly one row per target doc — linear by shape
    assert(bigRows === 10L * baseRows)
    assert(tBig <= 40.0 * math.max(tBase, 1.0),
      f"lmCrossEntropy wall-time superlinear: $tBase%.1fs -> $tBig%.1fs")
  }

  test("q104 ANN recall stays above the declared floor at 10x corpus",
      SlowStress) {
    ensureScaled()
    // the recall floor must be a property of the GEOMETRY (noise-to-
    // signal angles, fixed by construction), not of corpus size: more
    // clusters add near-orthogonal directions that the 16-bit bands
    // keep separable, so recall at 8x embeddings must hold the same
    // declared floor as the base corpus
    def recall(dir: String): (Double, Long) = {
      val r = SparkEntry.queries("q104_ann_recall")(spark, dir)
        .agg(sum(col("n_hits")), count(lit(1))).head()
      (r.getLong(0).toDouble / (7.0 * r.getLong(1)), r.getLong(1))
    }
    val (rBase, nBase) = recall(baseDir)
    val (rBig, nBig) = recall(scaledDir)
    info(f"q104 recall: $rBase%.3f ($nBase queries) -> " +
      f"$rBig%.3f ($nBig queries) at 8x embeddings")
    assert(nBig > nBase, "scaled corpus did not add queries")
    assert(rBase >= 0.85, f"base recall $rBase%.3f below floor")
    assert(rBig >= 0.85, f"10x recall $rBig%.3f below floor")
    assert(rBig < 1.0, "10x recall is total — misses no longer exercised")
  }

  test("broadcast terminology: 110k-concept trie over the 10x corpus",
      SlowStress) {
    ensureScaled()
    import org.apache.spark.sql.functions._
    // UMLS-scale dictionary: the IcdLikeCatalog grammar extended with a
    // second subcode digit — 25 letters x 100 categories x 40 two-digit
    // subcodes = 100k concepts + the 27.5k base forms' parents, built
    // as label -> variants exactly like the shipped catalogs would be
    val concepts: Map[String, Seq[String]] = {
      val b = Map.newBuilder[String, Seq[String]]
      for (l <- 'A' to 'Y'; n <- 0 until 100) {
        val parent = f"$l$n%02d"
        b += parent -> Seq(parent)
        for (s <- 0 until 40) {
          val code = f"$parent.$s%02d"
          b += code -> Seq(code, code.toLowerCase)
        }
      }
      b.result()
    }
    assert(concepts.size >= 100000, s"catalog too small: ${concepts.size}")
    val t0 = System.nanoTime()
    val bm = graft.pipes.Terminology.broadcast(spark, "icd10", concepts)
    val tBuild = (System.nanoTime() - t0) / 1e9
    // one valid dotted mention per doc, letter/category/sub from doc_id
    val docs = relational.Tables.documents(spark, scaledDir)
    val mention = concat(
      expr("char(65 + doc_id % 25)"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("."),
      lpad(((col("doc_id") / 100) % 40).cast("long").cast("string"), 2, "0"))
    val matchUdf = udf((s: String) => {
      val toks = graft.nlp.Normalizer
        .normalize(s, graft.nlp.Tokenizer.tokenize(s))
      bm.findMatches(toks, s).map(_.attrs("kb_id"))
    })
    val n = docs.count()
    val t1 = System.nanoTime()
    val hits = docs
      .select(concat(lit("Diagnostic retenu "), mention,
        lit(" confirme.")).as("t"))
      .select(explode(matchUdf(col("t"))).as("kb_id"))
      .count()
    val tMatch = (System.nanoTime() - t1) / 1e9
    info(f"build $tBuild%.1fs, match $n rows in $tMatch%.1fs")
    // every doc's mention is a real catalog member -> exactly one
    // longest-match hit per row (filterSpans drops the bare category)
    assert(hits === n, s"expected $n single hits, got $hits")
    bm.unpersist()
  }

  test("LSH candidate volume stays inside the cap-implied linear bound at 10x",
      SlowStress) {
    ensureScaled()
    def candidates(dir: String): (Long, Long, Long) = {
      val docs = relational.Tables.documents(spark, dir)
      val n = docs.count()
      val sigs = docs.select(col("doc_id").as("id"),
        dedup.Dedup.minHashSignatureFromText(col("text"), 3, 64).as("sig"))
      val acc = spark.sparkContext.longAccumulator("droppedBuckets")
      val cands = dedup.Dedup.lshCandidatePairs(sigs, "id", bands = 16,
        sigLength = 64, maxBucket = 1000, droppedBuckets = Some(acc))
        .count()
      (n, cands, acc.value)
    }
    val (nBase, candBase, _) = candidates(baseDir)
    val (nBig, candBig, droppedBig) = candidates(scaledDir)
    assert(nBig === docCopies * nBase)
    // cap-implied hard bound: every row pairs with at most
    // (maxBucket - 1) others per band
    assert(candBig <= nBig * 16L * 999L / 2L)
    // and the empirical growth is ~linear (vowel rotation keeps copies
    // from colliding with each other)
    assert(candBig <= 12L * candBase + 1000L,
      s"candidate pairs superlinear: $candBase -> $candBig " +
        s"(dropped buckets: $droppedBig)")
    info(s"candidates $candBase -> $candBig, dropped buckets $droppedBig")
  }

  test("product analytics: 10 disjoint population copies give EXACTLY " +
      "10x every count", SlowStress) {
    // scale events 10x with per-copy user/event shifts: 10 disjoint
    // copies of the SAME population. Funnel reach counts, transition
    // cells, retention cells, and outlier counts must then be EXACTLY
    // 10x the base (the z-test is scale-invariant: n,S,SS all scale by
    // 10, so (cn - S)^2 > 9(n*SS - S^2) multiplies both sides by 100) —
    // an off-by-anything in the per-user state machinery cannot hide in
    // a tolerance band. Wall time must stay ~linear.
    val dir = s"$scaledDir-events"
    if (!new File(s"$dir/events.parquet/_SUCCESS").exists()) {
      relational.Tables.events(spark, baseDir)
        .crossJoin(spark.range(10L).toDF("k"))
        .select((col("k") * 100000000L + col("event_id")).as("event_id"),
          col("ts"), (col("k") * 1000000L + col("user_id")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    for (name <- Seq("q113_funnel", "q114_retention_cohorts",
        "q115_transitions", "q116_value_outliers")) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val base = fn(spark, baseDir).collect()
      val tBase = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val big = fn(spark, dir).collect()
      val tBig = (System.nanoTime() - t1) / 1e9
      info(f"$name: $tBase%.1fs -> $tBig%.1fs at 10x")
      assert(tBig <= 40.0 * math.max(tBase, 1.0),
        f"$name wall-time superlinear: $tBase%.1fs -> $tBig%.1fs")
      // every count column must be exactly 10x, key columns unchanged
      val countCols = name match {
        case "q113_funnel" => Seq("signup_users", "view_users",
          "click_users", "purchase_users")
        case "q114_retention_cohorts" => Seq("n_users")
        case "q115_transitions" => Seq("n")
        case _ => Seq("n_outliers")
      }
      val keyOf = (r: org.apache.spark.sql.Row) =>
        r.schema.fieldNames.filterNot(f => countCols.contains(f) ||
          f == "first_id" || f == "last_id").map(r.getAs[Any]).toSeq
      val baseM = base.map(r => keyOf(r) ->
        countCols.map(r.getAs[Long]).toSeq).toMap
      val bigM = big.map(r => keyOf(r) ->
        countCols.map(r.getAs[Long]).toSeq).toMap
      assert(bigM === baseM.map { case (k, v) => k -> v.map(_ * 10L) },
        s"$name counts are not exactly 10x")
    }
  }

  test("product analytics under a HOT KEY: one user holding 10% of " +
      "all events stays inside the uniform-10x wall-time band", SlowStress) {
    // The uniform 10x band (previous test) cannot see key skew — every
    // user has the base corpus's event count. This corpus gives ONE
    // user the entire k=0 copy (10% of all rows): the funnel /
    // retention / transition plans are chained running-min windows and
    // lag-pairs PARTITIONED BY user, so the hot key serializes into a
    // single task's sort — the design claim is that this is still one
    // in-memory sort of 10%-of-corpus rows, not a cliff. Asserted as a
    // wall-time band against the uniform-10x run of the SAME queries
    // on the SAME box; a blowup (spill loop, quadratic state) breaks
    // the band long before correctness tests could see it.
    val uniform = s"$scaledDir-events"
    val hot = s"$scaledDir-events-hot"
    assume(new File(s"$uniform/events.parquet/_SUCCESS").exists(),
      "uniform 10x corpus is built by the preceding test")
    if (!new File(s"$hot/events.parquet/_SUCCESS").exists()) {
      // k=0 copy -> user 424242 (10% of rows on one key); other copies
      // keep their disjoint per-copy user spaces
      spark.read.parquet(s"$uniform/events.parquet")
        .withColumn("user_id",
          when(col("event_id") < 100000000L, lit(424242L))
            .otherwise(col("user_id")))
        .write.mode("overwrite").parquet(s"$hot/events.parquet")
    }
    val hotShare = {
      val ev = spark.read.parquet(s"$hot/events.parquet")
      ev.filter(col("user_id") === 424242L).count().toDouble / ev.count()
    }
    assert(hotShare >= 0.09, f"corpus shape: hot share $hotShare%.3f")
    for (name <- Seq("q113_funnel", "q114_retention_cohorts",
        "q115_transitions", "q116_value_outliers")) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val uniformRows = fn(spark, uniform).collect()
      val tUniform = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hotRows = fn(spark, hot).collect()
      val tHot = (System.nanoTime() - t1) / 1e9
      info(f"$name: uniform $tUniform%.1fs -> hot-key $tHot%.1fs")
      assert(hotRows.nonEmpty && uniformRows.nonEmpty)
      assert(tHot <= 4.0 * math.max(tUniform, 1.0),
        f"$name hot-key cliff: uniform $tUniform%.1fs -> hot $tHot%.1fs")
    }
  }

  test("pagerank: 10 disjoint graph copies keep ranks invariant, " +
      "wall time ~linear", SlowStress) {
    // 10 shifted copies of the co-purchase graph are 10 disjoint
    // components with IDENTICAL structure: every node's rank must equal
    // its copy-0 twin's, so the scaled top-20 rank VALUES are a prefix
    // of the base rank multiset scaled 10x in multiplicity.
    val dir = s"$scaledDir-graph"
    if (!new File(s"$dir/lineitem.parquet/_SUCCESS").exists()) {
      relational.Tables.lineitem(spark, baseDir)
        .select(col("l_orderkey"), col("l_partkey"))
        .crossJoin(spark.range(10L).toDF("k"))
        .select((col("k") * 100000000L + col("l_orderkey")).as("l_orderkey"),
          (col("k") * 10000000L + col("l_partkey")).as("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      relational.Tables.orders(spark, baseDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .crossJoin(spark.range(10L).toDF("k"))
        .select((col("k") * 100000000L + col("o_orderkey")).as("o_orderkey"),
          (col("k") * 10000000L + col("o_custkey")).as("o_custkey"))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
    val fn = SparkEntry.queries("q117_pagerank")
    val t0 = System.nanoTime()
    val base = fn(spark, baseDir).collect()
    val tBase = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val big = fn(spark, dir).collect()
    val tBig = (System.nanoTime() - t1) / 1e9
    info(f"pagerank: $tBase%.1fs -> $tBig%.1fs at 10x edges")
    assert(tBig <= 40.0 * math.max(tBase, 1.0),
      f"pagerank wall-time superlinear: $tBase%.1fs -> $tBig%.1fs")
    assert(big.length === 20)
    // structure-invariance: the scaled #1 rank equals the base #1 rank
    assert(big.head.getLong(2) === base.head.getLong(2),
      "top rank changed under disjoint copying")
  }

  test("CDC replay plan depth is FLAT in feed-batch count: a 50-commit " +
      "history replays with zero joins and one window, and converges " +
      "to the live table", SlowStress) {
    import spark.implicits._
    import graft.io.VersionLog
    // depth is the dimension under test, not volume: many SMALL
    // commits — the pre-r14 foldLeft replay built one anti-join+union
    // PER BATCH (lineage linear in history); the window replay must
    // not
    def build(dir: String, commits: Int): Unit = {
      VersionLog.init(spark, dir,
        (0L until 20L).map(k => (k, s"v$k", s"p${k % 3}"))
          .toDF("k", "v", "p"), partitionBy = Some("p"))
      for (i <- 1 to commits) {
        if (i % 3 == 0) // update an existing key (merge images)
          VersionLog.mergeByKeyCdc(spark, dir,
            Seq((i % 20L, s"u$i", s"p${i % 20 % 3}")).toDF("k", "v", "p"),
            "k", "p")
        else if (i % 3 == 1) // append a new key (synthesized insert)
          VersionLog.append(spark, dir,
            Seq((1000L + i, s"a$i", s"p${i % 3}")).toDF("k", "v", "p"),
            partitionBy = Some("p"))
        else { // equality-delete an appended key (synthesized delete),
          // folded immediately (merges refuse manifest debt) — the
          // apply-deletes rewrite's verbose-but-convergent images ride
          // through the replay too
          VersionLog.deleteKeysCommit(spark, dir,
            Seq(1000L + i - 1).toDF("k"), "k")
          VersionLog.applyDeletesCommit(spark, dir)
        }
      }
    }
    def replay(dir: String) = {
      val feed = spark.read.format("graft-cdc").load(dir)
      val opRank = when($"_op".isin("insert", "update_post"), 2)
        .when($"_op" === "delete", 1).otherwise(lit(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"_feed_batch".desc, opRank.desc)
      feed.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1 && $"_op".isin("insert", "update_post"))
        .select($"k", $"v", $"p")
    }
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => q.nodeName +: nodes(q.plan)
      case other => other.nodeName +: other.children.flatMap(nodes)
    }
    // exact "Window" — Spark 4 also inserts WindowGroupLimit nodes
    // (the rank-limit pushdown that keeps only each key's top row
    // before the sort: an optimization, not added depth)
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val ns = nodes(df.queryExecution.executedPlan)
      (ns.count(_.contains("Join")), ns.count(_ == "Window"))
    }
    val shallow = java.nio.file.Files
      .createTempDirectory("cdc-depth-5").toString
    val deep = java.nio.file.Files
      .createTempDirectory("cdc-depth-50").toString
    build(shallow, 5)
    build(deep, 50)
    val rs = replay(shallow); rs.collect()
    val rd = replay(deep)
    val mirrored = rd.as[(Long, String, String)].collect().toSet
    // flat shape at BOTH depths: no join chain, one window
    assert(shape(rs) === ((0, 1)), s"shallow plan shape ${shape(rs)}")
    assert(shape(rd) === ((0, 1)), s"deep plan shape ${shape(rd)}")
    // convergence: the 50-commit replay equals the live table
    val live = VersionLog.read(spark, deep)
      .select($"k", $"v", $"p").as[(Long, String, String)]
      .collect().toSet
    assert(mirrored === live)
  }

  test("STRESS: write-time stats skipping holds at 40-batch depth — " +
      "a point probe opens ONE file of 40, planning stays sane") {
    import spark.implicits._
    import graft.io.VersionLog
    val dir = java.nio.file.Files
      .createTempDirectory("stress-skip").toString
    VersionLog.init(spark, dir,
      (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    (1 until 40).foreach { b =>
      val lo = b * 1000L
      VersionLog.append(spark, dir,
        (lo until lo + 1000L).map(i => (i, s"v$i")).toDF("k", "v")
          .coalesce(1))
    }
    assert(VersionLog.snapshot(spark, dir, None).files.size === 40)
    val hit = VersionLog.read(spark, dir).filter($"k" === 25500L)
    assert(hit.select($"v").as[String].collect().toSeq === Seq("v25500"))
    hit.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => scans(q.plan)
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(sc)
      case other => other.children.flatMap(scans)
    }
    val opened = scans(hit.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(opened === 1L,
      s"40-batch point probe must open exactly one file, opened $opened")
  }

  test("STRESS: 8 concurrent appenders + 1 MIRROR MERGER on one " +
      "table — every CAS loser auto-rebases (the by-source precision " +
      "vet admits the provably-disjoint appends), all 9 land exactly " +
      "once, no batch is ever rewritten, the delta-log chain resolves") {
    import spark.implicits._
    import graft.io.VersionLog
    val dir = java.nio.file.Files
      .createTempDirectory("stress-race").toString
    VersionLog.init(spark, dir,
      Seq((0L, "seed", "a"), (9L, "stale", "z"))
        .toDF("k", "v", "p").coalesce(1),
      partitionBy = Some("p"))
    val writers = 8
    val pool =
      java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val barrier = new java.util.concurrent.CyclicBarrier(writers + 1)
    val futures = (1 to writers).map { i =>
      scala.concurrent.Future {
        val df = Seq((i.toLong * 100L, s"w$i", "a"))
          .toDF("k", "v", "p").coalesce(1)
        // materialize the batch, then race the commits as tightly as
        // the barrier allows — maximal parent staleness
        df.count()
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
        VersionLog.append(spark, dir, df, Some("p"))
      }
    } :+ scala.concurrent.Future {
      // the mirror merger: upserts into its OWN partition b and
      // by-source-deletes the stale z row — condition p='z', which no
      // appended row can satisfy, so the precision vet must rebase it
      // across every interleaved append instead of aborting
      val df = Seq((50L, "m", "b")).toDF("k", "v", "p").coalesce(1)
      df.count()
      barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
      VersionLog.mergeByKeyCdc(spark, dir, df, "k", "p",
        bySourceDelete = Some(col("p") === "z"))._3
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // all 9 landed on distinct consecutive versions
    assert(versions.toSet === (2L to 10L).toSet,
      s"every writer must land exactly once, got $versions")
    val t = VersionLog.read(spark, dir)
    assert(t.select($"k").as[Long].collect().toSet ===
      (Set(0L, 50L) ++ (1 to writers).map(_.toLong * 100L)),
      "no row lost, none duplicated, the z row by-source-deleted")
    // each writer wrote its batch exactly once: seed + 9 batch dirs
    val batchDirs = VersionLog.snapshot(spark, dir, None).files
      .map(_.split("/")(1)).distinct
    assert(batchDirs.length === 1 + writers + 1, s"got $batchDirs")
    // the raced history is a healthy delta-log chain: every version
    // resolves and time-travels. Exact per-version counts depend on
    // the interleave order (the merge is row-neutral: +1 upsert,
    // -1 by-source delete; each append +1), so the walk asserts the
    // count lands in the feasible band instead of one fixed value.
    (1L to 10L).foreach { v =>
      val n = VersionLog.read(spark, dir, Some(v)).count()
      assert(n >= 2L && n <= 10L, s"v$v resolved to $n rows")
    }
    assert(VersionLog.read(spark, dir, Some(10L)).count() === 10L)
  }

  test("STRESS: DDL racers in the writer band — 6 appenders race a " +
      "RENAMER and a RETYPER on one table; every append lands " +
      "exactly once (blind appends rebase across metadata-only DDL: " +
      "physical names never change), each DDL lands exactly once or " +
      "aborts loudly, and the raced history resolves under whichever " +
      "mapping won") {
    import spark.implicits._
    import graft.io.VersionLog
    val dir = java.nio.file.Files
      .createTempDirectory("stress-ddl").toString
    VersionLog.init(spark, dir,
      Seq((0L, "seed", 0, "a")).toDF("k", "v", "w", "p").coalesce(1),
      partitionBy = Some("p"))
    val appenders = 6
    val pool =
      java.util.concurrent.Executors.newFixedThreadPool(appenders + 2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val barrier = new java.util.concurrent.CyclicBarrier(appenders + 2)
    def guarded(body: => Long):
        scala.concurrent.Future[Either[Throwable, Long]] =
      scala.concurrent.Future {
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
        try Right(body)
        catch {
          case e: java.util.ConcurrentModificationException => Left(e)
        }
      }
    val appends = (1 to appenders).map { i =>
      val df = Seq((i.toLong, s"w$i", i, "a"))
        .toDF("k", "v", "w", "p").coalesce(1)
      df.count() // materialize, then race the commits tightly
      guarded(VersionLog.append(spark, dir, df, Some("p")))
    }
    val racers = appends :+
      guarded(VersionLog
        .alterRenameColumnCommit(spark, dir, "v", "label")) :+
      guarded(VersionLog.alterColumnTypeCommit(spark, dir, "w",
        org.apache.spark.sql.types.LongType))
    val rs = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(racers),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    // appends NEVER abort (blind-append rule: a metadata-only DDL
    // interleave rewrites no file and retires no physical the batch
    // carries)
    assert(rs.take(appenders).forall(_.isRight),
      s"an append aborted: ${rs.take(appenders)}")
    val landed = rs.collect { case Right(v) => v }
    assert(landed.distinct.size === landed.size,
      s"two writers claimed one version: $landed")
    assert(landed.forall(v => v >= 2L && v <= 9L), landed.toString)
    val t = VersionLog.read(spark, dir)
    // whichever name won, every appended row's value flows through it
    val valueCol = if (t.columns.contains("label")) "label" else "v"
    assert(t.select(col(valueCol)).as[String].collect().toSet ===
      (Set("seed") ++ (1 to appenders).map(i => s"w$i")))
    if (rs.last.isRight)
      assert(t.schema("w").dataType ===
        org.apache.spark.sql.types.LongType)
    assert(t.selectExpr("sum(w)").as[Long].head() ===
      (1 to appenders).sum.toLong)
    // the raced history is healthy: every retained version resolves
    VersionLog.listVersions(spark, dir).foreach(v =>
      VersionLog.read(spark, dir, Some(v)).count())
  }

  test("STRESS: contended rebase on a DEEP delta history — the vet " +
      "reads per-commit diffs (raw version JSON), so 4 racers over a " +
      "40-commit chain all land without resolving a snapshot per " +
      "interleaved commit") {
    import spark.implicits._
    import graft.io.VersionLog
    val dir = java.nio.file.Files
      .createTempDirectory("stress-deep").toString
    VersionLog.init(spark, dir,
      Seq((0L, "seed", "a")).toDF("k", "v", "p").coalesce(1),
      partitionBy = Some("p"))
    // 39 delta-form appends -> a 40-commit chain (checkpoints every
    // 16 keep resolution bounded; the vet must not even need them)
    (1 to 39).foreach { i =>
      VersionLog.append(spark, dir,
        Seq((i.toLong, s"c$i", "a")).toDF("k", "v", "p").coalesce(1),
        Some("p"))
    }
    val writers = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val futures = (1 to writers).map { i =>
      scala.concurrent.Future {
        val df = Seq((1000L + i, s"r$i", "a"))
          .toDF("k", "v", "p").coalesce(1)
        df.count()
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
        VersionLog.append(spark, dir, df, Some("p"))
      }
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    assert(versions.toSet === (41L to 44L).toSet,
      s"every racer must land exactly once on the deep chain, got " +
        s"$versions")
    assert(VersionLog.read(spark, dir).count() === 44L)
    // the whole raced-deep history still time-travels
    assert(VersionLog.read(spark, dir, Some(40L)).count() === 40L)
  }
}
