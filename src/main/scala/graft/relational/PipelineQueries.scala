package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, ExactSubstring, SimHash}
import graft.io.{Compact, DeletionVectors, KeyBloom, Manifest, MergeInto, StatsMaintenance, VersionLog, ZOrder}
import graft.multimodal.Multimodal
import graft.similarity.{Ann, PortableLsh, Pq, RandomProjection, Sq}
import graft.text.{Sketches, TextStats}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) as declared queries. MinHash-LSH, prefix-join exact Jaccard,
  * brute-force ANN and hyperplane-LSH ANN have exact DuckDB oracles (the
  * corpus's near-dup structure is bimodal — planted pairs at J >= 0.9 vs
  * background <= 0.07 — so LSH at threshold 0.8 is exhaustive by
  * construction, and q45 constructs clustered vectors where LSH recall is
  * provably total); q33's simhash uses MD5 shingle hashes so even the
  * fingerprint arithmetic is recomputed independently by DuckDB — every
  * query in this module is oracle-checked, none is rows-only.
  * No declared query shuffles a cartesian: q31 is a prefix-filtered
  * inverted-index join, q45/q51/q52 LSH/IVF equi-joins; q34 (the declared EXACT
  * baseline) is a broadcast nested-loop whose quadratic part is compute
  * only — its top-k aggregator ships just k rows per partition per query.
  */
object PipelineQueries {
  import Tables.{documents, embeddings, events}

  /** The deterministic spread-lattice embedding corpus shared by the ANN
    * family (q45/q51/q52/q58/q76/q77/q78): clusters of 8 ids share ONE
    * pseudo-random 16-dim integer lattice direction (nonlinear in the
    * component index so directions are genuinely spread — max
    * cross-cluster cosine 0.983 at sf0.1 vs within-cluster 1.0), making
    * LSH/IVF cell agreement and the oracle's brute-force top-k exact by
    * construction. `scaled = true` (q45) additionally stretches each id
    * by a positive integer factor, exercising sign-LSH scale invariance.
    * Corpus size enters the plan as a broadcast one-row aggregate — no
    * separate blocking count() job.
    */
  private def latticeVecs(
      s: SparkSession, d: String, scaled: Boolean = false): DataFrame = {
    import s.implicits._
    val m = embeddings(s, d)
      .agg(expr("(count(1) div 8) * 8").as("m"))
    val component = "CAST((vec_id div 8 * 1009 + j * j * 571 + " +
      "vec_id div 8 * j * 37) % 2003 - 1001 AS DOUBLE)" +
      (if (scaled) " * CAST(1 + vec_id % 5 AS DOUBLE)" else "")
    embeddings(s, d).join(broadcast(m))
      .filter($"vec_id" < $"m")
      .select($"vec_id".as("id"),
        expr(s"transform(sequence(0, 15), j -> $component)").as("vec"))
  }

  /** NOISY clustered vectors for the recall measurement (q104): the
    * q51 lattice direction per cluster of 8 ids, scaled x16, PLUS a
    * per-(id, component) md5-derived integer perturbation in
    * [-512, 512] — so cluster mates are L2-near but NOT identical, and
    * approximate recall is a genuine (sub-unity) quantity instead of
    * total-by-construction. Everything is exact integer arithmetic
    * derived from vec_id, replayable bit-for-bit by the oracle.
    */
  private[graft] def noisyVecs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = embeddings(s, d)
      .agg(expr("(count(1) div 8) * 8").as("m"))
    val component =
      "CAST((vec_id div 8 * 1009 + j * j * 571 + " +
        "vec_id div 8 * j * 37) % 2003 - 1001 AS BIGINT) * 16 + " +
        "CAST(conv(substring(md5(concat('nz:', CAST(vec_id AS STRING), " +
        "':', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1025 - 512"
    embeddings(s, d).join(broadcast(m))
      .filter($"vec_id" < $"m")
      .select($"vec_id".as("id"),
        expr(s"transform(sequence(0, 15), j -> $component)").as("vec"))
  }

  /** Distinct word-trigram shingles as full 64-bit hashes, via the fused
    * [[graft.dedup.Shingling]] walker (FNV-1a words, mixed + splitmix-
    * finalized per shingle) — ONE pass, no intermediate shingle strings.
    * Jaccard over these equals Jaccard over the shingle strings up to
    * 64-bit collisions (P ~ 1e-14 per pair) — oracle-exact in practice,
    * since the DuckDB oracle recomputes Jaccard from the strings and the
    * compare is on the VALUES, never the hashes. The expression form
    * (transform + slice + array_join + xxhash64) evaluated its lambdas
    * interpreted at ~15us/shingle and dominated q31's wall time; it also
    * used a different hash family than the fused MinHash signatures,
    * which the banding-probability contract wants to be the same
    * (Shingling.scala:3-9).
    */
  private[graft] val shingleHashes64 = udf((s: String) => {
    if (s == null) Seq.empty[Long]
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      graft.dedup.Shingling.foreachShingleHash(s, 3) { z =>
        if (seen.add(z)) buf += z
      }
      buf.toSeq
    }
  })

  /** Verified near-dup pairs — the shared q32/q69 pipeline (and the
    * ProfCc profiling target): fused MinHash signatures -> LSH banding
    * (16 bands / 64 mins) -> candidate equi-join -> EXACT shingle
    * Jaccard verification, keeping pairs with round(J, 4) >= threshold.
    * One definition so the declared query, the cluster query built on
    * it, and the profiler can never drift apart.
    */
  private[graft] def verifiedNearDupPairs(s: SparkSession, d: String,
      threshold: Double = 0.8): DataFrame =
    verifiedNearDupPairsOf(documents(s, d), threshold)

  /** The same pipeline over an arbitrary (doc_id, text) frame — q89
    * composes it over the gated/deduped pool instead of the raw table.
    */
  private[graft] def verifiedNearDupPairsOf(docs0: DataFrame,
      threshold: Double): DataFrame = {
    // the fused MinHash walk (64 universal-hash minima per shingle) is
    // this pipeline's dominant CPU and runs in the scan stage — spread
    // it when the corpus arrives as fewer splits than cores (measured
    // q69: 2.45 -> 1.71 s; no-op at real corpus sizes)
    val docs = graft.core.Spread.cpuFloor(docs0)
    val withShingles = docs.select(col("doc_id"),
      shingleHashes64(col("text")).as("sh"))
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minHashSignatureFromText(col("text"), 3, 64).as("sig"))
    val cands = Dedup.lshCandidatePairs(sigs, "id", bands = 16,
      sigLength = 64)
    val sa = withShingles.select(col("doc_id").as("id_a"),
      col("sh").as("sh_a"))
    val sb = withShingles.select(col("doc_id").as("id_b"),
      col("sh").as("sh_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        round(graft.functions.JaccardDistinctLongs
          .jaccard64(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Build-once gate for the probe-only bench twins (q76p/q88p/q102p):
    * run `build` only when the completion marker is absent, so within a
    * process the FIRST invocation pays the build and every later rep
    * times the probe alone. The marker lands AFTER the build completes,
    * so a crash mid-build never leaves a half-index for later reps to
    * probe. Local-FS File API on purpose — the twins' per-(sf, pid)
    * directories live in java.io.tmpdir by construction.
    */
  private def buildOnce(dir: String)(build: => Unit): Unit = {
    val marker = new java.io.File(dir, "_graft_built")
    if (!marker.exists()) {
      build
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
  }

  /** Shared build for the VERSIONED-table queries (q126/q136): the
    * documents corpus seeded as version 1 of a [[VersionLog]] table
    * (lang-partitioned), then the same deterministic CDC merge the
    * in-place twin applies (fr%17 updates, %31 inserts into 'xx',
    * de%13 tombstone deletes) committed as version 2 by ONE atomic
    * version-file create. Built once per (sf, process).
    */
  private def versionedTableDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-vlog-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val docs = documents(s, d)
      // seed deliberately fragmented (4 files per lang) so the
      // versioned compaction (q141) has real repacking to do
      VersionLog.init(s, dir, docs.repartition(4),
        partitionBy = Some("lang"))
      val batch = docs
        .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
        .withColumn("text", concat($"text", lit(" [v2]")))
        .withColumn("_del", lit(false))
        .unionByName(docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx"))
          .withColumn("_del", lit(false)))
        .unionByName(docs
          .filter($"lang" === "de" && $"doc_id" % 13 === 0)
          .withColumn("_del", lit(true)))
      VersionLog.mergeByKeyCdc(s, dir, batch, "doc_id", "lang",
        deleteWhen = Some($"_del"))
    }
    dir
  }

  /** Build for the all-doors CDC query (q146): a versioned table whose
    * history interleaves EVERY write door — v1 init, v2 CDC merge
    * (explicit images), v3 append (synthesized inserts), v4 equality
    * deletes (synthesized delete images), v5 partition overwrite
    * (synthesized delete+insert images) — so the row-level feed must
    * cover commits no merge ever saw. Deterministic; built once per
    * (sf, process).
    */
  private def cdcDoorsDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-doors-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val docs = documents(s, d)
      VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
      VersionLog.mergeByKeyCdc(s, dir,
        docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .withColumn("text", concat($"text", lit(" [v2]")))
          .withColumn("_del", lit(false))
          .unionByName(docs
            .filter($"lang" === "de" && $"doc_id" % 13 === 0)
            .withColumn("_del", lit(true))),
        "doc_id", "lang", deleteWhen = Some($"_del"))
      VersionLog.append(s, dir,
        docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx")),
        partitionBy = Some("lang"))
      VersionLog.deleteKeysCommit(s, dir,
        docs.filter($"lang" === "en" && $"doc_id" % 19 === 0)
          .select($"doc_id"), "doc_id")
      VersionLog.overwritePartitions(s, dir,
        docs.filter($"lang" === "fr" && $"doc_id" % 3 === 0)
          .withColumn("text", concat($"text", lit(" [rw]"))),
        "lang", Seq("fr"))
    }
    dir
  }

  /** Shared build for the graft-FORMAT queries (q137/q138): the
    * events fact table z-ordered by (user_id, cents) into 16 tight-
    * boxed files, committed as version 1 of a [[VersionLog]] table,
    * with the min/max manifest on both z dimensions and the key bloom
    * on event_id — the full statistics stack the `graft` data source
    * consults at planning time. Built once per (sf, process).
    */
  private def graftTableDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-gtable-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val ev = events(s, d).select($"event_id", $"user_id",
        $"event_type", round($"value" * 100).cast("long").as("cents"))
      VersionLog.init(s, dir,
        ZOrder.zOrdered(ev, $"user_id", $"cents", numFiles = 16))
      val live = VersionLog.read(s, dir)
      Manifest.buildManifestFor(s, dir, live, Seq("user_id", "cents"))
      KeyBloom.buildKeyBloomFor(s, dir, live, "event_id")
    }
    dir
  }

  /** Shared build for the history/tail queries (q143/q144): a small
    * versioned table with a DETERMINISTIC commit sequence — v1 init
    * (fr), v2 append (de), v3 tombstone merge (fr%7 deletes) — and
    * never compacted, so every version's added-row counts replay from
    * the pristine table. Built once per (sf, process).
    */
  private def histTableDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-hist-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val docs = documents(s, d)
      VersionLog.init(s, dir, docs.filter($"lang" === "fr"),
        partitionBy = Some("lang"))
      VersionLog.append(s, dir, docs.filter($"lang" === "de"),
        partitionBy = Some("lang"))
      VersionLog.mergeByKeyCdc(s, dir,
        docs.filter($"lang" === "fr" && $"doc_id" % 7 === 0)
          .withColumn("_del", lit(true)),
        "doc_id", "lang", deleteWhen = Some($"_del"))
    }
    dir
  }

  /** Shared build for the catalog-SQL query (q145): the same
    * deterministic post-merge state as q136, produced ENTIRELY
    * through the SQL front door — the versioned table addressed as a
    * catalog path identifier, the CDC batch applied by a `MERGE INTO`
    * statement (parsed by Spark, routed by the graft parser to the
    * versioned CDC merge), and read back with
    * `SELECT … FROM graft.`dir``. Built once per (sf, process).
    */
  private def catalogSqlTableDir(s: SparkSession, d: String): String = {
    import s.implicits._
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-cat-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val docs = documents(s, d)
      VersionLog.init(s, dir, docs.repartition(4),
        partitionBy = Some("lang"))
      docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
        .withColumn("text", concat($"text", lit(" [v2]")))
        .withColumn("_del", lit(false))
        .unionByName(docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx"))
          .withColumn("_del", lit(false)))
        .unionByName(docs
          .filter($"lang" === "de" && $"doc_id" % 13 === 0)
          .withColumn("_del", lit(true)))
        .createOrReplaceTempView("q145_updates")
      s.sql(s"""MERGE INTO graft.`$dir` AS t USING q145_updates AS u
          ON t.doc_id = u.doc_id
          WHEN MATCHED AND u._del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    }
    dir
  }

  /** Shared build for the partition-overwrite query (q149): the
    * documents corpus seeded lang-partitioned into a versioned table,
    * then two `overwrite_where` commits — replace the fr partition
    * with a transformed slice (fr%3, text + " [rw]") and DRAIN the de
    * partition with an empty slice. Deterministic; built once per
    * (sf, process).
    */
  private def replacePartitionDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-rw-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      val docs = documents(s, d)
      VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
      VersionLog.overwritePartitions(s, dir,
        docs.filter($"lang" === "fr" && $"doc_id" % 3 === 0)
          .withColumn("text", concat($"text", lit(" [rw]"))),
        "lang", Seq("fr"))
      VersionLog.overwritePartitions(s, dir,
        docs.filter(lit(false)), "lang", Seq("de"))
    }
    dir
  }

  /** Shared build for the clone query (q150): a pristine versioned
    * source table plus a hard-link SHALLOW CLONE that then diverges by
    * one CDC merge (fr%17 text updates, de%13 tombstones) — zero bytes
    * copied at clone time, and the source must remain bit-identical
    * through the clone's mutation. Built once per (sf, process).
    */
  private def cloneTableDirs(s: SparkSession, d: String): (String, String) = {
    import s.implicits._
    val tag = s"${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    val src = s"${System.getProperty("java.io.tmpdir")}/graft-clsrc-$tag"
    val dst = s"${System.getProperty("java.io.tmpdir")}/graft-cldst-$tag"
    buildOnce(src) {
      VersionLog.init(s, src, documents(s, d), partitionBy = Some("lang"))
    }
    buildOnce(dst) {
      VersionLog.cloneTable(s, src, dst)
      val docs = documents(s, d)
      VersionLog.mergeByKeyCdc(s, dst,
        docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .withColumn("text", concat($"text", lit(" [c2]")))
          .withColumn("_del", lit(false))
          .unionByName(docs
            .filter($"lang" === "de" && $"doc_id" % 13 === 0)
            .withColumn("_del", lit(true))),
        "doc_id", "lang", deleteWhen = Some($"_del"))
    }
    (src, dst)
  }

  /** Shared build for the feed/audit queries (q124/q130): the
    * documents corpus seeded lang-partitioned, then ONE CDC merge
    * (fr%17 updates, %31 inserts into 'xx', de%13 tombstone deletes)
    * whose feed lands at `<dir>._cdc/batch-00000`. Built once per
    * (sf, process); both queries read the same deterministic state.
    */
  private def mergedSnapshotDir(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft-travel-${Integer.toHexString(d.hashCode)}" +
      s"-${ProcessHandle.current().pid()}"
    buildOnce(dir) {
      documents(s, d).write.mode("overwrite")
        .partitionBy("lang").parquet(dir)
      val docs = documents(s, d)
      val batch = docs
        .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
        .withColumn("text", concat($"text", lit(" [v2]")))
        .withColumn("_del", lit(false))
        .unionByName(docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx"))
          .withColumn("_del", lit(false)))
        .unionByName(docs
          .filter($"lang" === "de" && $"doc_id" % 13 === 0)
          .withColumn("_del", lit(true)))
      MergeInto.mergeByKeyCdc(s, dir, batch, "doc_id", "lang",
        deleteWhen = Some($"_del"))
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_exact_dedup" -> { (s, d) =>
      import s.implicits._
      Dedup.exactDuplicates(documents(s, d), "doc_id", "text")
        .select($"keep_id", $"n_copies")
        .orderBy($"keep_id")
    },
    "q31_jaccard_pairs" -> { (s, d) =>
      import s.implicits._
      // exact n-gram Jaccard WITHOUT a cartesian: prefix-filtered
      // inverted-index self-join (Dedup.jaccardPairsPrefix) under the
      // rarest-first (document-frequency) token order, with the
      // sampled-side restriction PUSHED into the a-side prefix explode
      // (id_a is always the smaller id, so filtering the left input
      // cuts the join 10x before it happens). Exact-result counterpart
      // to the approximate LSH path (q32) — same oracle, linear-ish
      // plan instead of crossJoin, and no hot-prefix-key skew.
      // Threshold slack: the kept filter is on round(J, 4) — a pair at
      // J in [0.3 - 5e-5, 0.3) can round UP to 0.3, so prefix + size
      // pruning run at 0.2999 (< 0.3 - 5e-5) to stay a semantic no-op.
      val sh = documents(s, d)
        .select($"doc_id".as("id"), shingleHashes64($"text").as("sh"))
      Dedup.jaccardPairsPrefix(sh, threshold = 0.2999,
          aFilter = $"id" % 10 === 0)
        .withColumn("jaccard", round($"jaccard", 4))
        .filter($"jaccard" >= 0.3)
        .select($"id_a", $"id_b", $"jaccard")
        .orderBy($"id_a", $"id_b")
    },
    "q32_minhash_lsh" -> { (s, d) =>
      import s.implicits._
      // MinHash (k=64) -> LSH banding (16 bands) -> candidate pairs ->
      // exact verification on shingle strings (verifiedNearDupPairs —
      // the fused single-pass signature, no intermediate shingle
      // arrays). Linear-shuffle scale path.
      verifiedNearDupPairs(s, d, threshold = 0.8)
        .orderBy($"id_a", $"id_b")
    },
    "q33_simhash" -> { (s, d) =>
      import s.implicits._
      // PORTABLE simhash (MD5 shingle hashes, 60-bit fingerprint): the
      // oracle recomputes fingerprints, pigeonhole radius and Hamming
      // distances bit-for-bit in DuckDB — this was the one rows-only
      // query; now fully oracle-checked. The corpus is bimodal by
      // construction (planted near-dups at hamming <= 7, background
      // >= 15), so radius 8 is a robust cut on both sides. The fused
      // FNV fingerprint (SimHash.nearDuplicates) stays the fast
      // engine-internal path; recall spec-asserted in ScalaTest.
      SimHash.nearDuplicatesPortable(documents(s, d), "doc_id", "text",
        n = 3, radius = 8)
        .select($"id_a", $"id_b", $"hamming".cast("int").as("hamming"))
        .orderBy($"id_a", $"id_b")
    },
    "q134_declarative_hamming" -> { (s, d) =>
      import s.implicits._
      // The HammingJoinRewrite OPTIMIZER RULE on the oracle path: this
      // is the q33 near-dup question written the way a USER would —
      // a plain theta-join `bit_count(a.fp ^ b.fp) <= 8` with no
      // banding — which Catalyst alone can only plan as a cartesian.
      // GraftExtensions' rule rewrites it into 9 disjoint pigeonhole
      // band equi-joins (result bit-equal by the rule's contract), so
      // the declared surface itself proves the rewrite: the oracle is
      // q33's verbatim, and PlanLintSpec bans the cartesian this query
      // would otherwise plan.
      // spread + materialize the fingerprints once: the rewrite's 9
      // band joins otherwise re-evaluate the per-shingle MD5 UDF on
      // every side of every band (the 8-byte fingerprint table is the
      // artifact to share, not recompute)
      val fp = graft.core.Spread.cpuFloor(
          documents(s, d).filter($"text".isNotNull))
        .select($"doc_id",
          SimHash.simhashPortable($"text", n = 3).as("fp"))
        .localCheckpoint()
      fp.as("a").join(fp.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
            expr("bit_count(a.fp ^ b.fp) <= 8"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          expr("cast(bit_count(a.fp ^ b.fp) as int)").as("hamming"))
        .orderBy($"id_a", $"id_b")
    },
    "q34_embedding_topk" -> { (s, d) =>
      import s.implicits._
      val emb = embeddings(s, d).select($"vec_id".as("id"),
        transform($"embedding", x => x.cast("double")).as("vec"))
      Ann.bruteForceTopK(emb.filter($"id" % 25 === 0), emb, k = 10)
        .select($"query_id", $"rank".as("rnk"), $"neighbor_id")
        .orderBy($"query_id", $"rnk")
    },
    "q45_ann_lsh" -> { (s, d) =>
      import s.implicits._
      // hyperplane-LSH ANN as the DECLARED scale path, oracle-checked
      // against DuckDB's exact brute-force top-k. The corpus embeddings
      // are unclustered Gaussians (recall there is meaningless), so both
      // sides derive the same deterministic clustered vectors from
      // vec_id with exact integer arithmetic: clusters of 8 ids share a
      // direction (the q51 NONLINEAR spread lattice — a linear ramp in
      // the component index puts every direction on one 1-D curve that
      // sign-LSH cannot split, and bucket population then grows with
      // the corpus; measured 28x wall-time at 10x in ScaleStressSpec)
      // and differ only by positive integer scale, so each id's 7 true
      // nearest neighbors are exactly its cluster-mates (cosine 1 vs
      // <=0.983 across clusters) and LSH bucket equality within a
      // cluster is exact by construction (sign(dot) is scale-invariant).
      // The plan is the linear one: signature projection + multi-probe
      // equi-join, no cartesian. corpus size enters the plan as a
      // broadcast one-row aggregate — no separate blocking count() job
      val vecs = latticeVecs(s, d, scaled = true)
      // nbits = 0 -> corpus-scaled signature width (floor 12, so the
      // sf0.1 plan is unchanged): a fixed width goes quadratic in the
      // per-bucket population as the corpus grows (ScaleStressSpec)
      Ann.lshTopK(vecs, vecs, dim = 16, k = 7, nbits = 0)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q51_ann_ivf" -> { (s, d) =>
      import s.implicits._
      // IVF-flat ANN (KMeans coarse quantizer + nprobe cells) as a
      // DECLARED oracle-checked query. Construction: clusters of 8 ids
      // share ONE exact vector (a pseudo-random 16-dim integer lattice
      // direction, nonlinear in the component index so directions are
      // genuinely spread — max cross-cluster cosine 0.983 at sf0.1 vs
      // within-cluster 1.0). Identical in-cluster vectors make IVF cell
      // agreement EXACT by construction (assignment is a function of the
      // vector value), so the approximate path provably returns the 7
      // cluster-mates and the oracle brute-forces the same top-7.
      val vecs = latticeVecs(s, d)
      // nlist = 0 -> corpus-scaled cell count (floor 16, so the sf0.01/
      // sf0.1 plans are unchanged): a fixed nlist makes cell population
      // grow with the corpus and the probe join quadratic when queries
      // ARE the corpus — measured 60x wall-time at 10x in ScaleStressSpec
      Ann.ivfTopK(vecs, vecs, k = 7, nlist = 0, nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q52_cosine_neardup" -> { (s, d) =>
      import s.implicits._
      // embedding-cosine near-duplicate pairs (multi-table hyperplane
      // LSH + exact verify) as a DECLARED oracle-checked query, on the
      // same spread-lattice construction: within-cluster pairs are
      // identical vectors (cosine 1, and EVERY LSH table's signature
      // matches — recall is total by construction, not probability),
      // cross-cluster cosine <= 0.983 < the 0.995 threshold by a margin
      // vastly wider than FP noise. The oracle recomputes all pairs.
      val vecs = latticeVecs(s, d)
      // nbits = 0 -> corpus-scaled per-table signature width, keeping
      // bucket populations flat as the corpus grows
      Ann.cosineNearDuplicates(vecs, dim = 16, threshold = 0.995,
          nbits = 0)
        .select($"id_a", $"id_b", $"sim")
        .orderBy($"id_a", $"id_b")
    },
    "q53_paragraph_dedup" -> { (s, d) =>
      import s.implicits._
      // corpus-wide paragraph-level dedup (the CCNet/RefinedWeb shape):
      // a paragraph survives only at its globally FIRST occurrence
      // (doc_id, position order); docs are reassembled from surviving
      // paragraphs. Sentence-split on '. ' stands in for newline
      // paragraphs (the synthetic corpus is single-line). Entirely
      // SQL-expressible, so the oracle recomputes survivorship and the
      // reassembled text verbatim.
      Dedup.dedupParagraphs(documents(s, d), "doc_id", "text", "\\. ")
        .orderBy($"doc_id")
    },
    "q35_quality" -> { (s, d) =>
      import s.implicits._
      documents(s, d)
        .withColumn("q", TextStats.qualityScore($"text", Seq("the", "a")))
        .select($"doc_id", $"q.n_words".as("n_words"),
          $"q.mean_word_len".as("mean_word_len"),
          $"q.stopword_ratio".as("stopword_ratio"),
          $"q.type_token_ratio".as("type_token_ratio"))
        .orderBy($"doc_id")
    },
    "q36_langid" -> { (s, d) =>
      import s.implicits._
      // heuristic language ID vs the metadata label: confusion counts.
      // Full DuckDB oracle: on this corpus (en text with/without 'the'
      // vs non-en) the heuristic's decision reduces to a stopword test
      // the oracle replays exactly; semantic accuracy on real
      // multi-language text is asserted separately in ScalaTest.
      documents(s, d)
        .withColumn("predicted", TextStats.langId($"text"))
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    },
    "q37_fingerprint" -> { (s, d) =>
      import s.implicits._
      // order-sensitive rolling fingerprint; grouping by it finds exact
      // word-sequence dups regardless of whitespace. Full DuckDB oracle:
      // it groups by the canonical word-join itself, which partitions
      // docs identically to the 64-bit fingerprint (collision-free at
      // this scale).
      documents(s, d)
        .select($"doc_id", TextStats.fingerprint($"text").as("fp"))
        .groupBy($"fp").agg(min($"doc_id").as("keep_id"),
          count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies")
        .orderBy($"keep_id")
    },
    "q38_media_features" -> { (s, d) =>
      import s.implicits._
      // multimodal plumbing: binary payloads -> partition-local stub
      // decode -> fixed-width features. n_bytes/brightness are exact
      // integer arithmetic, so DuckDB recomputes them from the chars —
      // valid only for ASCII payloads (bytes == codepoints), so both
      // sides restrict to ASCII docs explicitly rather than assuming
      // the corpus stays that way.
      val media = Multimodal.mediaFromDocuments(s,
        documents(s, d).filter($"text".rlike("^[\\x00-\\x7F]*$")))
      Multimodal.extractFeatures(media).toDF()
        .select($"media_id", $"n_bytes", $"brightness")
        .orderBy($"media_id")
    },
    "q44_split_generator" -> { (s, d) =>
      import s.implicits._
      // registered Catalyst Generator (plan-level 1->N split): one row
      // per fragment between " the " boundaries, with exact offsets.
      documents(s, d)
        .select($"doc_id", graft.functions.SplitTextGenerator
          .splitText($"text", lit(" the ")))
        .select($"doc_id", $"idx", $"begin", $"end")
        .orderBy($"doc_id", $"idx")
    },
    "q43_fuzzy_match" -> { (s, d) =>
      import s.implicits._
      // approximate terminology matching: the misspelled term 'sparc'
      // matches 'spark' tokens at dice >= 0.5 (next-nearest vocab word is
      // below 0.4, so the oracle is the exact token count).
      val fm = graft.nlp.FuzzyMatcher.build("spark", Seq("sparc"),
        threshold = 0.5, maxTokens = 2)
      val fuzzyUdf = udf((text: String) => {
        val tokens = graft.nlp.Normalizer.normalize(text,
          graft.nlp.Tokenizer.tokenize(text))
        fm.findMatches(tokens, text).size
      })
      documents(s, d)
        .select($"doc_id", fuzzyUdf($"text").as("n_hits"))
        .orderBy($"doc_id")
    },
    "q42_batched_inference" -> { (s, d) =>
      import s.implicits._
      // map_gpu-shaped stage: partition-local content-aware rebatching
      // ("1024 words" policy) around a batch forward function. The stub
      // forward emits per-item word counts, so results are independent of
      // batch boundaries and oracle-checkable; a real model forward slots
      // into the same signature.
      val docs = documents(s, d).select($"doc_id", $"text")
        .as[(Long, String)]
      docs.mapPartitions { rows =>
        graft.operators.Batching.inferenceStage[(Long, String),
            Seq[Array[String]], Int](
          sizeExpr = "1024 words",
          sizeOf = r => r._2.split(" ").length.toLong,
          prepare = batch => batch.map(_._2.split(" ")),
          forward = prepared => prepared.map(_.length))(rows)
          .map { case ((id, _), n) => (id, n) }
      }.toDF("doc_id", "n_words")
        .orderBy($"doc_id")
    },
    "q39_subword_count" -> { (s, d) =>
      import s.implicits._
      documents(s, d)
        .select($"doc_id",
          TextStats.subwordCount($"text").as("n_subwords"),
          TextStats.wordCount($"text").as("n_words"))
        .orderBy($"doc_id")
    },
    "q50_repetition" -> { (s, d) =>
      import s.implicits._
      // Gopher-style repetition filters: duplicate-line fraction (every
      // even doc doubled into two identical lines — DuckDB knows the
      // closed form) and the occurrence count of the most frequent word
      // bigram, recomputed independently by the oracle's group-by.
      documents(s, d)
        .select($"doc_id",
          TextStats.duplicateLineFraction(
            when($"doc_id" % 2 === 0, concat($"text", lit("\n"), $"text"))
              .otherwise($"text")).as("dup_line_frac"),
          TextStats.topNgramCount($"text", 2).as("top_bigram_count"))
        .orderBy($"doc_id")
    },
    "q47_arrow_stage" -> { (s, d) =>
      import s.implicits._
      // the map_gpu-shaped Arrow stage on the declared surface: rows
      // serialize to Arrow record batches, cross the stage boundary (the
      // model runtime's wire format), deserialize back — end-to-end
      // through ArrowConverters, oracle-checked. The forward here is the
      // identity batch fn (no torch in this container); a model client
      // consumes/returns the same Arrow IPC bytes.
      val src = documents(s, d)
        .select($"doc_id", length($"text").as("n_chars"))
      graft.operators.GpuStage.mapInArrow(src, src.schema,
        maxRecordsPerBatch = 256)(identity)
        .orderBy($"doc_id")
    },
    "q54_decontaminate" -> { (s, d) =>
      import s.implicits._
      // benchmark decontamination (the GPT-3/Llama n-gram overlap test):
      // docs with doc_id % 5 == 0 stand in for the eval set; every other
      // doc reports how many distinct word 8-grams it shares with ANY
      // benchmark doc. Plan: benchmark grams broadcast, corpus side
      // explodes distinct gram hashes map-locally — no corpus shuffle
      // before the per-doc count. The oracle recomputes the overlap on
      // the gram STRINGS (hash-vs-string equality up to 64-bit
      // collisions, as q31).
      val docs = documents(s, d)
      Dedup.decontaminate(
          docs.filter($"doc_id" % 5 =!= 0),
          docs.filter($"doc_id" % 5 === 0),
          "doc_id", "text", n = 8)
        .select($"id".as("doc_id"), $"n_shared")
        .orderBy($"doc_id")
    },
    "q55_vocab_quality" -> { (s, d) =>
      import s.implicits._
      // vocabulary-familiarity quality scores (integer-exact stand-in
      // for a CCNet LM filter): corpus unigram counts -> broadcast ->
      // per-doc OOV ratio vs the top-25 vocabulary + mean token corpus
      // frequency. Every ratio is a division of exact integers, so the
      // oracle reproduces it bit-for-bit (no cross-engine float-sum
      // ordering hazard).
      graft.text.TextStats
        .vocabularyQuality(documents(s, d), "doc_id", "text", topK = 25)
        .select($"id".as("doc_id"), $"n_words", $"oov_ratio",
          $"mean_word_freq")
        .orderBy($"doc_id")
    },
    "q79_lm_perplexity" -> { (s, d) =>
      import s.implicits._
      // CCNet-style LM quality filter, log-domain (q55 is the
      // integer-exact sibling): fit a unigram add-one LM on the clean
      // reference slice (doc_id % 5 == 0 plays Wikipedia), score the
      // rest, and DROP the far-from-reference tail (xent > 3.45 —
      // cuts a real band of this corpus, so the filter branch is
      // exercised, not vacuous). Both engines filter on the ROUNDED
      // xent: the unrounded values differ only by float-sum ordering
      // and libm ulps (~1e-13), eleven orders under the 4dp grid.
      val all = documents(s, d)
      val sel = TextStats.lmCrossEntropy(
        all.filter($"doc_id" % 5 =!= 0), "doc_id", "text",
        all.filter($"doc_id" % 5 === 0), "text",
        vocabSize = 4096)
      sel.filter($"xent" <= 3.45)
        .select($"id".as("doc_id"), $"n_words", $"xent")
        .orderBy($"doc_id")
    },
    "q56_redact_spans" -> { (s, d) =>
      import s.implicits._
      // span-tracking redaction (PII-scrub shape): every \bcustomer\b
      // becomes [REDACTED]; the query returns the redacted text AND a
      // mapped-offset witness (redacted-text begin of the last edit,
      // computed through DeltaCollection — the machinery that keeps
      // annotations aligned across length-changing cleanup). Row-local,
      // no shuffle; the oracle recomputes text, count and offset with
      // its own regex engine.
      documents(s, d)
        .select($"doc_id",
          graft.text.Redact.redactWithSpans($"text",
            "\\bcustomer\\b", "[REDACTED]").as("r"))
        .select($"doc_id", $"r.text".as("redacted"),
          $"r.n_redactions".as("n_redactions"),
          $"r.last_begin".as("last_begin"))
        .orderBy($"doc_id")
    },
    "q57_top_ngrams" -> { (s, d) =>
      import s.implicits._
      // corpus-wide top-25 word bigrams (vocabulary / boilerplate
      // mining): fused gram UDF -> map-side-combining groupBy ->
      // TakeOrdered. The gram distribution is never fully sorted; ties
      // at the cut break on (count desc, gram) — a total order both
      // engines share.
      graft.text.TextStats.topNgrams(documents(s, d), "text", n = 2,
          k = 25)
        .orderBy($"n".desc, $"gram")
    },
    "q58_semantic_dedup" -> { (s, d) =>
      import s.implicits._
      // SemDeDup-style survivor set over the q52 lattice construction:
      // drop every vector with a lower-id cosine>=0.995 neighbor, keep
      // greedy min-id representatives with their anchored near-dup
      // counts. Candidates come from the capped multi-table LSH (total
      // recall by construction — in-cluster vectors are identical), so
      // the oracle's brute-force survivor set is provably the same.
      val vecs = latticeVecs(s, d)
      Ann.semanticDedup(vecs, dim = 16, threshold = 0.995, nbits = 0)
        .select($"id".as("vec_id"), $"n_near")
        .orderBy($"vec_id")
    },
    "q63_chunk_windows" -> { (s, d) =>
      import s.implicits._
      // training-sequence packing: 40-word windows at stride 30 (10
      // words of cross-chunk context), pure codegen expressions. The
      // oracle recomputes the window arithmetic from the word counts.
      graft.text.TextStats.chunkWindows(documents(s, d), "doc_id",
          "text", width = 40, stride = 30)
        .orderBy($"doc_id", $"chunk_idx")
    },
    "q64_lsh_observability" -> { (s, d) =>
      import s.implicits._
      // dropped-bucket observability: the LSH maxBucket cap is a recall
      // tradeoff that must be MEASURED, not just designed. Plant a
      // 50-copy boilerplate cluster (every band bucket of it exceeds
      // the cap), run capped candidate generation, and emit one row:
      // how many buckets the cap dropped and how many candidate pairs
      // survived. FULLY ORACLE-CHECKED since round 11: the band
      // signature is the PORTABLE md5 r=1 MinHash family
      // (Dedup.portableBandSigs — the q33/q96 portability convention),
      // so DuckDB replays every bucket id, the cap cut, and both
      // counts bit-for-bit. 8 bands is plenty for an observability
      // probe — the planted cluster floods every band, and the probe
      // should not dominate the bench. The corpus side is a BOUNDED
      // deterministic sample (pushed-down id filter): the nonzero-drop
      // assertion only needs the planted cluster, and a probe must
      // stay O(1) as the corpus grows
      val sample = documents(s, d).filter($"doc_id" < 256)
        .select($"doc_id", $"text")
      // the planted cluster is a CONSTANT boilerplate string (not a
      // corpus doc): deterministic at every scale factor, and it saves
      // the seed-selection job a TakeOrdered scan would cost per rep
      val boilerText = Seq.fill(24)(
        "subscribe to our newsletter for weekly updates and offers")
        .mkString(" ")
      val boiler = s.range(1000000L, 1000050L).toDF("doc_id")
        .select($"doc_id", lit(boilerText).as("text"))
      val corpus = sample.union(boiler)
      // the probe is O(1) rows by construction (<=256 sample + 50
      // planted), so: one partition (every downstream shuffle becomes
      // trivial instead of 32-way) and persist (the signature subtree
      // appears four times across the pairs/dropped branches — without
      // the persist each occurrence re-scans the parquet sample and
      // recomputes signatures)
      // COST FLOOR, measured (BenchOne, quiet local[32], sf0.1): the
      // r6 0.5 s target is not reachable for this plan shape — with
      // one action, one shuffle partition, AQE off, and the cache, the
      // median is ~0.7 s and is all FIXED per-rep overhead (driver
      // analysis/optimization of the 5-operator plan + 3 stage rounds
      // + codegen cache lookups), independent of corpus size. It was
      // 1.12 s before this round's one-action rewrite; the remaining
      // floor would shrink only by abandoning the real capped-banding
      // operator, which would defeat the probe. O(1) in corpus size is
      // the contract, spec-asserted in PipelineOpsSpec.
      val buckets = corpus.select($"doc_id".as("id"),
          posexplode(Dedup.portableBandSigs($"text", 3, 8)))
        .select($"id", concat_ws("_", $"pos", $"col").as("bucket"))
        .coalesce(1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      // the probe is O(1) rows by construction, so size the shuffle to
      // it: 1 shuffle partition and no AQE re-planning rounds — a
      // 32-way (or adaptively re-planned) exchange over ~300 rows is
      // pure scheduling overhead. Session conf is restored in finally;
      // the declared queries run sequentially.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "1")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        // declarative dropped-bucket count + kept-pairs count combined
        // into ONE action (one job instead of two)
        val (pairs, dropped) =
          Dedup.cappedBucketPairsWithDropped(buckets, maxBucket = 32)
        val row = dropped
          .crossJoin(pairs.agg(count(lit(1)).as("kept_pairs"))).head()
        Seq((row.getLong(0), row.getLong(1)))
          .toDF("dropped_buckets", "kept_pairs")
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.conf.set("spark.sql.adaptive.enabled", prevAqe)
        buckets.unpersist(false)
      }
    },
    "q62_frame_sample" -> { (s, d) =>
      import s.implicits._
      // video-as-bytes frame sampling on the declared surface: every
      // 2nd 16-byte block becomes a frame row (lazy 1->N per partition,
      // payloads never shuffle), scored by the stub brightness. ASCII
      // payloads make the arithmetic exact for the oracle, as q38.
      val media = Multimodal.mediaFromDocuments(s,
        documents(s, d).filter($"text".rlike("^[\\x00-\\x7F]*$")))
      Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
        .map { case (id, fidx, bytes) =>
          var sum = 0L
          bytes.foreach(b => sum += (b & 0xFF))
          (id, fidx, BigDecimal(sum.toDouble / bytes.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .toDF("media_id", "frame_idx", "brightness")
        .orderBy($"media_id", $"frame_idx")
    },
    "q61_repeated_runs" -> { (s, d) =>
      import s.implicits._
      // cross-doc repeated-substring spans (the substring-dedup shape):
      // maximal merged ranges of 15-word windows occurring in >= 2
      // distinct docs. The oracle rebuilds windows, the distinct-doc
      // repeat test, and the interval merge from the gram STRINGS.
      Dedup.repeatedRuns(documents(s, d), "doc_id", "text", n = 15)
        .select($"id".as("doc_id"), $"begin_word", $"end_word")
        .orderBy($"doc_id", $"begin_word")
    },
    "q60_stratified_sample" -> { (s, d) =>
      import s.implicits._
      // exact-quota stratified sampling (corpus mixing / train-split):
      // per language, keep exactly ceil(20%) of docs under a
      // deterministic multiplicative-hash order — reproducible across
      // engines, unlike RNG sampleBy. The oracle recomputes quota and
      // rank with the same integer arithmetic.
      graft.text.TextStats.stratifiedSample(
          documents(s, d).select($"doc_id", $"lang"),
          "doc_id", "lang", fraction = 0.2)
        .orderBy($"lang", $"doc_id")
    },
    "q83_length_deciles" -> { (s, d) =>
      import s.implicits._
      // exact length-decile assignment (curriculum / length-bucketed
      // batching): SQL ntile(10) over (token count, doc_id) WITHOUT
      // the un-partitioned Window that funnels the corpus through one
      // reducer — boundaries by histogram descent, assignment a pure
      // codegen expression over 9 broadcast literals. The oracle IS
      // the Window form, so the descent must replay SQL ntile
      // bit-for-bit including its first-buckets-larger size rule.
      graft.operators.ExactNtile.ntile(
          documents(s, d)
            .select($"doc_id",
              size(split($"text", " ")).cast("long").as("n_words")),
          "doc_id", "n_words", k = 10)
        .select($"doc_id", $"n_words", $"bucket")
        .orderBy($"doc_id")
    },
    "q82_corpus_card" -> { (s, d) =>
      import s.implicits._
      // per-language corpus DATASHEET row (the "corpus card" a corpus
      // build publishes): doc/token counts, exact-dup incidence, size
      // stats — composing the q20 token convention with q30's
      // content-hash dedup key. The dup side joins on sha2(text), not
      // raw text, so the shuffle key is 32 bytes regardless of doc
      // size at 100 TB; the final per-lang agg is map-side partial.
      val docs = documents(s, d)
      val dup = Dedup.exactDuplicates(docs, "doc_id", "text")
      docs.join(dup, sha2($"text", 256) === $"content_hash")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", " ")).cast("long")).as("n_tokens"),
          sum(when($"n_copies" > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          round(avg($"n_chars"), 4).as("mean_chars"))
        .orderBy($"lang")
    },
    "q81_dsir_select" -> { (s, d) =>
      import s.implicits._
      // DSIR data selection (Xie et al. 2023): importance = target-LM
      // vs pool-LM log-likelihood ratio; keep the 50 pool docs that
      // look MOST like the reference slice (the paper's deterministic
      // top-k variant). Both LMs fit driver-side (bounded), scoring is
      // one broadcast-join pass, the cut is a TakeOrdered — no full
      // sort at 100 TB. Engines rank the ROUNDED llr with id
      // tie-break, the same float-safety argument as q79.
      val all = documents(s, d)
      val pool = all.filter($"doc_id" % 5 =!= 0)
      TextStats.dsirLogRatio(pool, "doc_id", "text",
          all.filter($"doc_id" % 5 === 0), "text",
          pool, "text", vocabSize = 4096)
        .select($"id".as("doc_id"), $"n_words", $"llr")
        .orderBy($"llr".desc, $"doc_id")
        .limit(50)
    },
    "q80_source_cap" -> { (s, d) =>
      import s.implicits._
      // RefinedWeb/CCNet per-domain cap: keep at most 15 docs per
      // source under the shared deterministic hash order (a handful of
      // crawl domains otherwise dominate a web corpus). Cuts every
      // source at sf0.01 (25/source) and sf0.1 (250/source). Same
      // histogram-descent plan as q60 — scan -> broadcast cut join ->
      // filter, no Window, no per-source sort.
      graft.text.TextStats.cappedPerStratum(
          documents(s, d).select($"doc_id", $"source"),
          "doc_id", "source", cap = 15L)
        .orderBy($"source", $"doc_id")
    },
    "q59_filter_pipeline" -> { (s, d) =>
      import s.implicits._
      // end-to-end training-set assembly: language gate (metadata) ->
      // Gopher/C4-style quality gates (length band + stopword ratio) ->
      // exact-dedup survivorship — the composed shape a real corpus
      // build runs, as ONE declarative plan (filters fuse into the scan;
      // the dedup survivor join is the only shuffle).
      val docs = documents(s, d)
      val scored = docs
        .withColumn("q",
          graft.text.TextStats.qualityScore($"text", Seq("the", "a")))
        .filter($"lang" === "en" &&
          $"q.n_words".between(40, 70) && $"q.stopword_ratio" >= 0.02)
      val keep = Dedup.exactDuplicates(docs, "doc_id", "text")
        .select($"keep_id".as("doc_id"))
      scored.join(keep, Seq("doc_id"), "left_semi")
        .select($"doc_id", $"q.n_words".as("n_words"),
          $"q.stopword_ratio".as("stopword_ratio"))
        .orderBy($"doc_id")
    },
    "q69_dedup_components" -> { (s, d) =>
      import s.implicits._
      // pair list -> transitive CLUSTERS: near-dup pairs (the exact q32
      // MinHash -> LSH -> Jaccard-verify path, whose pair set is
      // hash-proven equal to exact all-pairs Jaccard >= 0.8) fed into
      // large-star/small-star connected components. Pairwise survivor
      // picks under-delete when duplication is transitive (a~b, b~c,
      // a!~c); the component form is what production dedups actually
      // run at scale — O(log n) rounds of bounded groupBy/equi-join,
      // no driver-side graph (Dedup.connectedComponents). The oracle
      // recomputes the clusters independently via a recursive CTE over
      // the exact-Jaccard pair set.
      // Cost structure (BenchOne, quiet local[32]/sf0.1): the q32 pair
      // generation IS ~1.35 s of the ~2.6 s median; the component loop
      // adds ONE fused job per star round (pair gen + round + star-
      // forest convergence test fuse via lazy localCheckpoint; near-dup
      // graphs converge in 1 round) plus the mapping/size join — fixed
      // job overhead at bench scale, O(pairs) work at 100 TB.
      val pairs = verifiedNearDupPairs(s, d, threshold = 0.8)
        .select($"id_a", $"id_b")
      val comp = Dedup.connectedComponents(pairs)
      val sizes = comp.groupBy($"component")
        .agg(count(lit(1)).as("csize"))
      comp.join(sizes, "component")
        .select($"id".as("doc_id"), $"component", $"csize")
        .orderBy($"doc_id")
    },
    "q70_sequence_pack" -> { (s, d) =>
      import s.implicits._
      // GPT-style cross-document sequence packing: the sharded corpus
      // token stream cut into 512-token training sequences, docs
      // splitting across boundaries (TextStats.packSequences). The
      // plan's only exchange is the per-shard cumsum window over
      // (id, count) pairs — text never shuffles; the oracle replays
      // the identical cumsum + boundary arithmetic in SQL.
      TextStats.packSequences(documents(s, d), "doc_id", "text",
          budget = 512, shards = 32)
        .orderBy($"shard", $"seq_id", $"doc_id")
    },
    "q71_corpus_mixture" -> { (s, d) =>
      import s.implicits._
      // deterministic weighted language mixture (the data-recipe
      // operator): en upsampled 1.35x, fr kept, zh/de/es downsampled,
      // coin = portable md5(doc_id) so the oracle reproduces the exact
      // copy set. Broadcast weight join + narrow explode — the whole
      // mixture pass has ZERO shuffles (the orderBy here is
      // presentation only).
      TextStats.corpusMixture(documents(s, d), "doc_id", "lang",
          Map("en" -> 13500, "fr" -> 10000, "zh" -> 7500,
            "de" -> 5000, "es" -> 2500))
        .select($"doc_id", $"lang", $"n_copies", $"copy_idx")
        .orderBy($"doc_id", $"copy_idx")
    },
    "q73_recipe_shuffle_pack" -> { (s, d) =>
      import s.implicits._
      // The full data-recipe composed in ONE declared plan — the q65/q68
      // composed-evidence pattern applied to the pretraining layer:
      //   weighted mixture (q71's operator) -> deterministic seeded
      //   shuffle -> cross-document sequence packing (q70's operator).
      // Each kept copy gets a unique pack id (doc_id * 8 + copy index;
      // weights <= 1.35x so n_copies <= 2 << 8), is placed by the
      // portable md5 position hash, and packs into 512-token sequences.
      // The oracle replays mixture coin, position hash, and cumsum
      // arithmetic end-to-end in SQL, so a drift in ANY of the three
      // stages (or in how they hand off) breaks the hash.
      // Scale shape: broadcast mixture join + narrow explode, then the
      // per-shard cumsum window over (pos, id, count) rows — text never
      // shuffles, no global sort; the orderBy is presentation only.
      val mixed = TextStats.corpusMixture(
          documents(s, d).select($"doc_id", $"text", $"lang"),
          "doc_id", "lang",
          Map("en" -> 13500, "fr" -> 10000, "zh" -> 7500,
            "de" -> 5000, "es" -> 2500))
        .withColumn("pack_id", $"doc_id" * 8 + ($"copy_idx" - 1))
      TextStats.shuffledPackSequences(mixed, "pack_id", "text",
          budget = 512, shards = 32, seed = 42L)
        .orderBy($"shard", $"seq_id", $"pack_id")
    },
    "q74_token_budget" -> { (s, d) =>
      import s.implicits._
      // Exact token-budget downsampling ("keep N tokens of English"):
      // docs ordered by the deterministic md5 position hash, kept while
      // the tokens BEFORE them stay under the per-language budget. The
      // chosen budgets exercise every branch: en/fr cross mid-corpus,
      // zh's budget exceeds its corpus (keep-all), de is 0 (empty),
      // es is absent (dropped key). Scale shape: histogram descent —
      // slim checkpointed (key,pos,toks) projection + three bounded
      // per-key histogram rounds + final broadcast-cut filter; NO
      // per-language window (that cumsum would shuffle a whole
      // language into one partition at 100 TB).
      val sel = TextStats.tokenBudgetSelection(
        documents(s, d).select($"doc_id", $"text", $"lang"),
        "doc_id", "text", "lang",
        Map("en" -> 6000L, "fr" -> 1500L, "zh" -> 10000000L,
          "de" -> 0L),
        seed = 7L)
      sel.select($"lang", $"doc_id",
          TextStats.wordCount(coalesce($"text", lit("")))
            .cast("long").as("toks"))
        .orderBy($"lang", $"doc_id")
    },
    "q75_temperature_mixture" -> { (s, d) =>
      import s.implicits._
      // sqrt-temperature (alpha = 1/2) corpus rebalance: per-language
      // weights computed FROM the corpus itself with integer-exact
      // arithmetic (isqrt + BigInt ratio — no pow()/float-sum drift an
      // oracle could disagree with), then applied as the deterministic
      // md5-coin mixture. The oracle replays token sums, corrected
      // integer sqrt, the HUGEINT weight ratio, and the coin — so the
      // green hash pins the whole weight computation, not just the
      // explode. Scale shape: one per-language agg (|langs| rows
      // collected) + broadcast weight join + narrow explode.
      TextStats.temperatureMixture(
          documents(s, d).select($"doc_id", $"text", $"lang"),
          "doc_id", "lang", "text")
        .select($"doc_id", $"lang", $"weight_bp".cast("long").as("weight_bp"),
          $"n_copies", $"copy_idx")
        .orderBy($"doc_id", $"copy_idx")
    },
    "q76_ivf_index_probe" -> { (s, d) =>
      import s.implicits._
      // BUILD-ONCE / PROBE-MANY IVF persistence on the declared
      // surface: the q51 construction, but the quantizer fit + cell
      // assignment are WRITTEN as a parquet index (small centroids
      // file + corpus partitionBy(cell)) and the probe runs against
      // the saved index with a static partition-pruning cut to the
      // probed cells — query-time I/O is nprobe/nlist of the corpus,
      // the production ANN serving shape at 100 TB. The oracle is the
      // exact brute-force top-7 (agreement exact by the same
      // identical-in-cluster-vector construction as q51). The declared
      // query rebuilds the index each run — honest build+probe cost;
      // a real deployment builds once and probes many.
      val vecs = latticeVecs(s, d)
      // per-process path: keyed by sf dir AND pid, so a concurrently
      // running Verify/Bench pair can never overwrite an index the
      // other is mid-probe on; stable within a process so bench reps
      // exercise the overwrite path rather than leaking a dir per rep
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-ivf-index-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      Ann.buildIvfIndex(vecs, dir)
      Ann.probeIvfIndex(s, dir, vecs, k = 7, nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q77_ann_pq" -> { (s, d) =>
      import s.implicits._
      // product-quantized ADC ranking (FAISS IndexPQ): vectors stored
      // as 4 one-byte codeword ids, candidates scored by per-query
      // table lookups — the MEMORY-bounded member of the similarity
      // family (q34 exact / q45 LSH / q51 IVF / q76 persisted index).
      // On this corpus every distinct subvector gets its own codeword
      // (<=256 distinct per subspace), so the encoding is lossless and
      // the ADC top-7 is exactly the brute-force top-7 the oracle
      // computes; mates tie at sim 1 and the shared (sim desc, id)
      // order breaks them identically. Like q34, the scan is the
      // declared O(N*Q) baseline shape with a bounded query set.
      val vecs = latticeVecs(s, d)
      val cb = Pq.fitCodebooks(vecs, dim = 16, m = 4)
      val codes = vecs.select($"id", Pq.encodeUdf(cb)($"vec").as("code"))
      Pq.adcTopK(vecs.filter($"id" % 25 === 0), codes, cb, k = 7)
        .select($"query_id", $"rank".as("rnk"), $"neighbor_id")
        .orderBy($"query_id", $"rnk")
    },
    "q78_ann_ivfpq" -> { (s, d) =>
      import s.implicits._
      // the COMPOSED index (FAISS IndexIVFPQ): IVF cells bound compute
      // (probe equi-join, no corpus scan per query), PQ codes bound
      // memory (m-byte candidates stream through the join, no float
      // vectors). Exactness composes on this corpus: cell agreement is
      // exact (identical in-cluster vectors) and the encoding lossless
      // (<=256 distinct subvectors), so the oracle is the same exact
      // brute-force top-7 as q51's.
      val vecs = latticeVecs(s, d)
      Pq.ivfpqTopK(vecs, vecs, dim = 16, k = 7, nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q84_bloom_decontaminate" -> { (s, d) =>
      import s.implicits._
      // decontamination as the ingest FILTER it is at 100 TB (q54 is
      // the per-doc diagnostic twin): keep pool docs sharing NO 8-gram
      // with the benchmark slice. A broadcast Bloom filter over the
      // benchmark's gram hashes admits the clean majority ROW-LOCALLY
      // (zero shuffle for bloom-negative docs); only bloom-positive
      // grams reach the exact confirmation join, so the result is
      // EXACT whatever the false positives — the oracle is the
      // unpruned gram-overlap anti-join.
      val docs = documents(s, d)
      Dedup.decontaminateFilter(
          docs.filter($"doc_id" % 5 =!= 0),
          docs.filter($"doc_id" % 5 === 0),
          "doc_id", "text", n = 8)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    "q85_bm25" -> { (s, d) =>
      import s.implicits._
      // the LEXICAL member of the similarity-search family (q34/q45/
      // q51/q77 cover the embedding side): Okapi BM25 top-25 for a
      // 3-term query. Corpus text never shuffles — tokens filter to
      // the query terms row-locally; df and the corpus stats are
      // broadcast aggregates; the cut is a TakeOrdered, no global
      // sort. Per-(doc, term) contributions round to integer basis
      // points BEFORE the per-doc sum, so the cross-engine score is
      // order-free integer arithmetic (q79's float-safety argument,
      // hardened against summation order).
      graft.text.Bm25.topK(documents(s, d), "doc_id", "text",
          terms = Seq("customer", "merge", "window"), k = 25)
        .select($"id".as("doc_id"), $"score_bp")
        .orderBy($"score_bp".desc, $"doc_id")
    },
    "q86_gopher_gate" -> { (s, d) =>
      import s.implicits._
      // the Gopher rule GATE — named pass/fail verdicts plus the keep
      // conjunction, the form a corpus build logs and audits (q35 is
      // the raw-ratio diagnostic twin). Every threshold compares a
      // 4dp-ROUNDED ratio so independent engines land on the same side
      // of each gate. Pure codegen expressions fused into the scan —
      // no shuffle at any scale.
      documents(s, d)
        .withColumn("g", TextStats.gopherRules($"text",
          Seq("the", "a", "of", "to", "in", "and")))
        .select($"doc_id", $"g.n_words".as("n_words"),
          $"g.ok_words", $"g.ok_mean_len", $"g.ok_stopwords",
          $"g.ok_alpha", $"g.ok_ttr", $"g.keep")
        .orderBy($"doc_id")
    },
    "q87_ann_sq8" -> { (s, d) =>
      import s.implicits._
      // scalar quantization (FAISS SQ8) completes the ANN memory
      // ladder (exact q34 / LSH q45 / IVF q51 / PQ q77 / IVF+PQ q78):
      // one byte per dimension against the corpus min/max envelope,
      // candidates ranked by the SYMMETRIC integer code dot (SDC) —
      // exact integers end to end, so the oracle replays fit, encoding
      // and ranking bit-for-bit. In-cluster mates share identical
      // codes and tie-break on neighbor id, the shared order. Like
      // q34/q77, the scan is the declared O(N·Q) baseline shape with a
      // bounded query set.
      val vecs = latticeVecs(s, d)
      val mm = Sq.fitMinMax(vecs, dim = 16)
      val codes = vecs.select($"id", Sq.encodeUdf(mm)($"vec").as("code"))
      Sq.sdcTopK(vecs.filter($"id" % 25 === 0), codes, mm, k = 7)
        .select($"query_id", $"rank".as("rnk"), $"neighbor_id")
        .orderBy($"query_id", $"rnk")
    },
    "q88_bm25_index_probe" -> { (s, d) =>
      import s.implicits._
      // BUILD-ONCE / PROBE-MANY for lexical retrieval — the q76
      // pattern on the text side: postings persisted partitionBy a
      // term-hash bucket, so the probe prunes to the query terms'
      // buckets at PLAN time and query I/O is O(postings of the query
      // terms), independent of vocabulary breadth. Scoring shares
      // q85's integer basis-point contract, so the oracle is the SAME
      // SQL — the index path must reproduce the direct scan exactly.
      // The declared query rebuilds the index each run (honest
      // build+probe cost); a deployment builds once and probes many.
      // Path is per-(sf, pid) for the same concurrency reason as q76.
      // COST FLOOR (BenchOne, quiet local[32], sf0.1): ~4.2 s median,
      // dominated by the three partitioned-write ACTIONS of the build
      // (postings, terms, stats — committer renames + per-action plan/
      // codegen), not by data volume; the probe alone is sub-second.
      // That write cost IS the product here (the index on disk), the
      // same argument the q76 rebuild carries.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-bm25-index-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      graft.text.Bm25.buildIndex(documents(s, d), "doc_id", "text", dir)
      graft.text.Bm25.probeIndex(s, dir,
          Seq("customer", "merge", "window"), k = 25)
        .select($"id".as("doc_id"), $"score_bp")
        .orderBy($"score_bp".desc, $"doc_id")
    },
    "q89_assembly_recipe" -> { (s, d) =>
      import s.implicits._
      // END-TO-END corpus assembly (the FineWeb/RefinedWeb build
      // shape), composed from individually oracle-checked stages:
      // Gopher rule gate (q86) -> exact-dedup survivorship (q30) ->
      // transitive near-dup CLUSTER survivorship (q32's verified pair
      // pipeline + q69's connected components; keep each component's
      // min-id representative) -> greedy token budget under the shared
      // deterministic hash order (q74). The oracle replays the whole
      // composition including the recursive-CTE clustering, so the
      // STAGE WIRING is pinned, not just the stages. Plan shape: the
      // gate fuses into the scan; the pair pipeline and the budget's
      // histogram descent are the only wide stages; the dropped
      // near-dup members come back as a broadcast anti-join (the drop
      // set is bounded by the duplicate mass, not the corpus).
      // SPREAD AT ENTRY (r19, guide §2.5): the gopher gate, the exact-dup
      // sha2, the broadcast semi-join back to text, and the MinHash +
      // shingle walks all FUSE into one stage rooted at the docs scan —
      // on a single-split corpus that whole chain ran as ~2.5 s of
      // sequential single-task CPU (ProfQuery stages 70/73/74/75
      // at 0.2-0.7 s each). One round-robin exchange of the raw rows
      // spreads every downstream walk; no-op at >= cores splits. (The
      // r18 attempt gated on the JOINED pool, where cpuFloor refuses
      // non-narrow plans and correctly no-ops — entry is the right
      // place.)
      val docs = graft.core.Spread.cpuFloor(documents(s, d))
      val gated = docs
        .withColumn("g", TextStats.gopherRules($"text",
          Seq("the", "a", "of", "to", "in", "and")))
        .filter($"g.keep")
        .select($"doc_id", $"text")
      // Exact-dedup survivorship as ONE aggregate (r19, guide §2.4):
      // keep the min-id row per content hash via min_by — semantically
      // identical to the old exactDuplicates + left-semi self-join
      // (both keep exactly the rows whose doc_id == min(doc_id) over
      // sha2(text)), but with one exchange instead of two plan branches
      // over the gated scan (measured: the branched shape re-ran the
      // scan+spread map per branch per action — 5 single-task ~0.25 s
      // stages per run). At scale the partial min_by keeps one row per
      // distinct text per map task, so the exchange carries less than
      // the old agg+join pair did.
      val pool0 = gated
        .groupBy(sha2($"text", 256))
        .agg(min_by(struct($"doc_id", $"text"), $"doc_id").as("r"))
        .select($"r.doc_id".as("doc_id"), $"r.text".as("text"))
      // LAZY-CHECKPOINT the survivor pool — consumed by the pair
      // pipeline (sig + shingle walks), the rep anti-join, and through
      // it the budget descent; without the cut every consumer re-ran
      // the gate+dedup lineage. The tiny post-agg output coalesces to
      // ~1 partition, so give the CPU-dense downstream walks the
      // session's parallelism again (block-read exchange, ~0.03 s).
      val pool = graft.core.Spread.cpuFloor(pool0.localCheckpoint(false))
      val nonReps = Dedup.connectedComponents(
          verifiedNearDupPairsOf(pool, threshold = 0.8)
            .select($"id_a", $"id_b"))
        .filter($"id" =!= $"component")
        .select($"id".as("doc_id"))
      // materialize the survivor pool ONCE (lazy local checkpoint,
      // first budget-descent job pays it): the budget operator walks
      // its input twice (histogram rounds + final cut join), and
      // without the cut here each walk re-runs the whole
      // gate+pair+cluster pipeline (measured 4.7 -> 4.1 s at sf0.1;
      // the rest is the q69-shaped pair+CC job count, the composed
      // cost this query declares). A production build writes this
      // intermediate corpus anyway.
      val reps = pool.join(broadcast(nonReps), Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
      TextStats.tokenBudgetSelection(
          reps.withColumn("slice", lit("all")),
          "doc_id", "text", "slice", Map("all" -> 6000L), seed = 7L)
        .select($"doc_id",
          TextStats.wordCount($"text").cast("long").as("toks"))
        .orderBy($"doc_id")
    },
    "q90_dataset_split" -> { (s, d) =>
      import s.implicits._
      // deterministic train/val/test assignment (80/10/10) on the
      // portable seed-namespaced hash: citable membership — any
      // engine, partitioning, or rerun reproduces it. Row-local, fuses
      // into the scan; the oracle replays the md5 cut exactly.
      documents(s, d)
        .select($"doc_id",
          TextStats.datasetSplit($"doc_id", seed = 99L).as("split"))
        .orderBy($"doc_id")
    },
    "q91_leakage_split" -> { (s, d) =>
      import s.implicits._
      // LEAKAGE-PROOF split: per-doc hashing puts near-duplicates on
      // both sides of the train/test fence (exactly the eval leak
      // decontamination exists to prevent); here every near-dup
      // CLUSTER moves as one — each member inherits its component
      // representative's hash. Composes the verified pair pipeline +
      // connected components (q32/q69) with the q90 split convention;
      // the oracle replays clustering AND assignment, so the
      // same-cluster-same-split guarantee is hash-checked, not just
      // spec'd. The component map is bounded by the duplicate mass →
      // broadcast left join; everything else is row-local.
      val docs = documents(s, d)
      val comp = Dedup.connectedComponents(
        verifiedNearDupPairsOf(docs, threshold = 0.8)
          .select($"id_a", $"id_b"))
      docs.join(broadcast(comp), docs("doc_id") === comp("id"), "left")
        .select($"doc_id",
          coalesce($"component", $"doc_id").as("rep_id"),
          TextStats.datasetSplit(
            coalesce($"component", $"doc_id"), seed = 99L).as("split"))
        .orderBy($"doc_id")
    },
    "q92_snapshot_diff" -> { (s, d) =>
      import s.implicits._
      // corpus VERSION DIFF (dataset lineage: what changed between two
      // corpus snapshots): two deterministic snapshot views of the
      // documents table — v2 adds the %11 slice, drops the %13 slice,
      // and revises the %7 slice's text — classified added / removed /
      // changed by content hash. The join carries (id, 32-byte hash),
      // never text; the id-keyed full-outer join is the one shuffle,
      // co-located for free under id-bucketed snapshot storage.
      val docs = documents(s, d)
      val v1 = docs.filter($"doc_id" % 11 =!= 0)
      val v2 = docs.filter($"doc_id" % 13 =!= 0)
        .select($"doc_id",
          when($"doc_id" % 7 === 0, concat($"text", lit(" rev2")))
            .otherwise($"text").as("text"))
      Dedup.snapshotDiff(v1, v2, "doc_id", "text")
        .filter($"status" =!= "unchanged")
        .select($"id".as("doc_id"), $"status")
        .orderBy($"doc_id")
    },
    "q93_fasttext_gate" -> { (s, d) =>
      import s.implicits._
      // the fastText-shaped quality classifier (DCLM / FineWeb-Edu
      // filter): hashed-word Bernoulli NB log-odds DISTILLED from the
      // Gopher rule gate on the %5 reference slice, scored over the
      // complement. Fit = one pass bounded by 1024 buckets; weights
      // broadcast; scoring = row-local feature map -> broadcast join ->
      // integer basis-point sum. Nothing but (id, bucket) ever
      // shuffles, and those combine map-side.
      graft.text.QualityClassifier.distillGopherGate(
          documents(s, d), "doc_id", "text",
          refFilter = $"doc_id" % 5 === 0,
          stopwords = Seq("the", "a", "of", "to", "in", "and"))
        .select($"id".as("doc_id"), $"score_bp", $"keep_pred")
        .orderBy($"doc_id")
    },
    "q94_random_projection" -> { (s, d) =>
      import s.implicits._
      // JL sign-projection sketch of the REAL 64-dim embeddings table
      // down to 8 integer coordinates (Achlioptas +-1 entries from the
      // portable md5 parity — a pure function, nothing trained or
      // shipped), then the declared O(N*Q) brute-force top-7 ON THE
      // SKETCH: 8x narrower operands, integer distance compares. The
      // projection is row-local codegen fused into the scan.
      RandomProjection.sketchTopK(
          embeddings(s, d).select($"vec_id".as("id"),
            $"embedding".as("vec")),
          queryFilter = $"id" % 25 === 0, dIn = 64, dOut = 8, k = 7)
        .select($"query_id", $"rnk", $"neighbor_id", $"d2")
        .orderBy($"query_id", $"rnk")
    },
    "q95_exact_substring" -> { (s, d) =>
      import s.implicits._
      // cross-doc EXACT-substring duplication coverage (Lee et al. 2022
      // ExactSubstr, relationally): token 8-grams held by >= 2 distinct
      // docs mark their range; per doc, the covered-token count and
      // keep ratio. Only (id, pos, 60-bit hash) shuffles — text never
      // moves; the dup set is a partial-aggregating groupBy on the
      // hash.
      ExactSubstring.flaggedCoverage(documents(s, d), "doc_id", "text")
        .orderBy($"doc_id")
    },
    "q96_hll_distinct" -> { (s, d) =>
      import s.implicits._
      // HyperLogLog per-language distinct-token estimate with FULLY
      // REPLAYABLE registers (portable md5 hash -> every register an
      // exact integer): state is 256 buckets per language no matter the
      // vocabulary, partials combine map-side, registers merge
      // associatively across corpus shards. The exact countDistinct
      // column is the demo-only comparison — the production path at
      // 100 TB is registers-only (that groupBy's state is the
      // vocabulary; the sketch's is 256 rows).
      val toks = documents(s, d).select($"lang",
        explode(split(trim($"text"), "\\s+")).as("word"))
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(toks, "lang", "word"))
      val exact = toks.groupBy($"lang".as("key"))
        .agg(countDistinct($"word").as("exact_distinct"))
      est.join(exact, "key")
        .select($"key".as("lang"), $"zeros", $"s",
          $"est".as("est_hll"), $"exact_distinct")
        .orderBy($"lang")
    },
    "q97_cms_heavy_hitters" -> { (s, d) =>
      import s.implicits._
      // count-min sketch term frequencies: 4x512 integer registers
      // (bounded state vs the vocabulary-sized exact groupBy),
      // point-queried for a fixed probe list and joined against the
      // exact counts to EXHIBIT the sketch's one-sided error
      // (est >= exact always; inflation = hash-collision mass). The
      // absent probe shows est driven by collisions alone.
      val probes = Seq("join", "hash", "customer", "window", "zzzqx")
      val toks = documents(s, d).select(
        explode(split(trim($"text"), "\\s+")).as("word"))
      val est = Sketches.cmsQuery(
        Sketches.cmsRegisters(toks, "word"), probes)
      val exact = toks.filter($"word".isin(probes: _*))
        .groupBy("word").agg(count(lit(1)).as("exact"))
      est.join(exact, Seq("word"), "left")
        .select($"word", $"est",
          coalesce($"exact", lit(0L)).as("exact"),
          ($"est" - coalesce($"exact", lit(0L))).as("inflation"))
        .orderBy($"word")
    },
    "q98_containment_pairs" -> { (s, d) =>
      import s.implicits._
      // asymmetric containment |A∩B|/|A| over distinct shingles — the
      // small-doc-inside-big-doc detector symmetric Jaccard (q31/q32)
      // structurally misses. Inverted-index equi-join on the 64-bit
      // shingle hash (never a cartesian), df-capped candidate
      // generation, exact re-verification on the full sets.
      Dedup.containmentPairs(documents(s, d), "doc_id", "text",
          n = 3, minContainment = 0.8)
        .orderBy($"id_in", $"id_out")
    },
    "q99_tfidf_keywords" -> { (s, d) =>
      import s.implicits._
      // per-doc top-3 TF-IDF keywords: tf = the one corpus shuffle,
      // df derived FROM tf (no second corpus pass), vocabulary
      // broadcast, rank window partitioned by document — no global
      // sort. Integer basis-point scores (exact-integer ln args).
      TextStats.tfidfKeywords(documents(s, d), "doc_id", "text", k = 3)
        .select($"id".as("doc_id"), $"rnk", $"word", $"score_bp")
        .orderBy($"doc_id", $"rnk")
    },
    "q100_corpus_profile" -> { (s, d) =>
      import s.implicits._
      // the composed ROUND-10 datasheet recipe (q89's composition
      // argument applied to the new layer): Gopher gate -> cross-doc
      // exact-substring coverage over the GATED pool (thresholds the
      // 4dp keep_ratio, so both engines cut the same docs) -> per-lang
      // profile carrying the HLL distinct-token estimate NEXT TO the
      // exact count. The oracle replays the whole composition — gate,
      // gram flagging, coverage join, registers, estimate — pinning
      // stage wiring, not just each stage. At 100 TB the exact column
      // drops and the registers (256/lang) ARE the datasheet.
      val stop = Seq("the", "a", "of", "to", "in", "and")
      val words = split(trim($"text"), "\\s+")
      // the q89 checkpoint pattern, applied at BOTH fan-out points:
      // `gated` feeds the coverage pipeline three ways (gram stream
      // twice, token-count side once) and the Gopher HOF filter is the
      // expensive part of each walk; `pool` then feeds three
      // aggregates (card, HLL registers, exact distinct). One local
      // checkpoint each → every stage runs once (measured 7.6 → ~4 s
      // at sf0.1)
      val gated = documents(s, d)
        .filter(TextStats.gopherRules($"text", stop)("keep"))
        .localCheckpoint()
      val pool = gated.join(
        ExactSubstring.flaggedCoverage(gated, "doc_id", "text")
          .filter($"keep_ratio" >= 0.7).select("doc_id"),
        "doc_id").localCheckpoint()
      val toks = pool.select($"lang", explode(words).as("word"))
      val est = Sketches.hllEstimate(
          Sketches.hllRegisters(toks, "lang", "word"))
        .select($"key".as("lang"), $"est".as("est_distinct"))
      val exact = toks.groupBy("lang")
        .agg(countDistinct($"word").as("exact_distinct"))
      pool.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(words).cast("long")).as("n_tokens"))
        .join(est, "lang").join(exact, "lang")
        .select($"lang", $"n_docs", $"n_tokens", $"est_distinct",
          $"exact_distinct")
        .orderBy($"lang")
    },
    "q102_neardup_index_probe" -> { (s, d) =>
      import s.implicits._
      // BUILD-ONCE / PROBE-MANY near-dup index — the persistence triad
      // completed (q76 embeddings / q88 lexical / here near-dup): the
      // %7 != 0 slice is the standing corpus (buckets + shingle sets
      // persisted once), the %7 == 0 slice is the arriving delta
      // batch probed against it — LSH bucket equi-join then exact
      // Jaccard, no corpus signature ever recomputed at ingest. LSH at
      // threshold 0.8 is exhaustive on this corpus's bimodal near-dup
      // structure (the q32 argument), so the oracle recomputes the
      // cross-slice pairs directly. Rebuilds the index each run like
      // q76/q88 (honest build+probe cost).
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-neardup-index-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      val docsDf = documents(s, d)
      Dedup.buildNearDupIndex(docsDf.filter($"doc_id" % 7 =!= 0),
        "doc_id", "text", dir)
      Dedup.probeNearDupIndex(s, dir,
          docsDf.filter($"doc_id" % 7 === 0), "doc_id", "text",
          threshold = 0.8)
        .orderBy($"new_id", $"corpus_id")
    },
    "q104_ann_recall" -> { (s, d) =>
      import s.implicits._
      // MEASURED ANN recall (round-10 verdict item 3): the lattice
      // corpora make LSH/IVF recall total by construction, so this
      // query measures recall@7 on a NOISY corpus (noisyVecs: cluster
      // direction x16 plus md5 integer noise in [-512, 512]) where the
      // banded sign-LSH genuinely misses — recall is a sub-unity
      // number, not a tautology. Both the approximate candidate set
      // (PortableLsh: md5-parity hyperplanes, 2 bands x 16 bits) and
      // the exact integer-L2 top-7 baseline are replayed bit-for-bit
      // by the oracle, so every per-query hit count is hash-checked.
      // The aggregate floor (recall >= 0.9 here and at 10x) is
      // spec-asserted in PipelineOpsSpec / ScaleStressSpec.
      PortableLsh.recallAtK(noisyVecs(s, d), col("id") % 25 === 0,
          dIn = 16, bands = 2, rBits = 16, k = 7)
        .orderBy($"query_id")
    },
    "q106_media_neardup" -> { (s, d) =>
      import s.implicits._
      // MEDIA near-dup — the multimodal member of the dedup family
      // (LAION-style image dedup on the declared stub surface): aHash
      // perceptual fingerprint (60 block-mean bits, exact integer
      // cross-multiplication) over binary payloads, pigeonhole band
      // join, Hamming <= 8 pairs. Payloads never shuffle — only
      // (id, fp) longs move. ASCII restriction makes bytes ==
      // codepoints so the oracle replays the fingerprint from the
      // chars (the q38 convention); length >= 60 keeps all 60 blocks
      // nonempty, so no engine-vs-oracle empty-block convention can
      // diverge. A CONSTANT near-dup payload pair is planted (the q64
      // pattern: deterministic at every scale factor, hamming 3 by
      // construction) so the declared query is non-empty even on a
      // tiny corpus slice with no organic payload near-dups.
      val baseText = Seq.fill(3)(
        "the quick brown fox jumps over the lazy dog again and again")
        .mkString(" ")
      val planted = Seq(
        (2000000L, baseText),
        (2000001L, baseText.replace("lazy", "LAZY")))
        .toDF("doc_id", "text")
      val corpus = documents(s, d)
        .filter($"text".rlike("^[\\x00-\\x7F]*$") &&
          length($"text") >= 60)
        .select($"doc_id", $"text")
        .union(planted)
      val media = Multimodal.mediaFromDocuments(s, corpus)
      Multimodal.mediaNearDuplicates(media, radius = 8, blocks = 60)
        .select($"id_a", $"id_b", $"hamming".cast("int").as("hamming"))
        .orderBy($"id_a", $"id_b")
    },
    "q112_embedding_covariance" -> { (s, d) =>
      import s.implicits._
      // the PCA/whitening input: the 16x16 covariance matrix of the
      // embedding components, integer-exact via the q111 quantization
      // (n * sum(qi*qj) - Si*Sj = n^2 * cov) — upper triangle, 136
      // rows regardless of corpus size. Vectors explode to component
      // pairs ROW-LOCALLY; per-task aggregate state is d^2-bounded.
      graft.similarity.Embeddings
        .covariance(embeddings(s, d), $"embedding")
        .orderBy($"i", $"j")
    },
    "q111_embedding_dispersion" -> { (s, d) =>
      import s.implicits._
      // embedding-space DIAGNOSTICS for a labeled corpus: per-label
      // cluster compactness. Components quantize to integers
      // (round(x * 1e4), float->double exact), then the mean-squared-
      // distance-to-centroid identity n*sum||q||^2 - sum_j (sum q_j)^2
      // keeps EVERYTHING integer — no float aggregate exists anywhere,
      // so the oracle replays the exact value with zero rounding
      // convention. Plan: one posexplode -> two partial-aggregated
      // groupBys (label,pos then label) -> broadcast-sized join with
      // the per-label counts; nothing wider than (label, pos) rows
      // ever shuffles, embeddings never move whole.
      graft.similarity.Embeddings
        .labelDispersion(embeddings(s, d), $"label", $"embedding")
        .orderBy($"label")
    },
    "q110_scene_changes" -> { (s, d) =>
      import s.implicits._
      // shot-boundary detection on the declared multimodal stub
      // surface: 16-byte "frames", a change = consecutive-frame mean
      // brightness jumping by > 4 — exact integer arithmetic in one
      // fused row-local pass (payloads never shuffle; only the three
      // counters move). ASCII restriction keeps bytes == codepoints so
      // the oracle replays frame sums from the chars (q38 convention).
      val media = Multimodal.mediaFromDocuments(s,
        documents(s, d).filter($"text".rlike("^[\\x00-\\x7F]*$")))
      Multimodal.sceneChanges(media, frameBytes = 16, threshold = 4)
        .toDF("media_id", "n_frames", "n_changes")
        .orderBy($"media_id")
    },
    "q107_line_gate" -> { (s, d) =>
      import s.implicits._
      // C4-style LINE-level cleaning (Raffel et al. 2020 §2.2) as a
      // declared query: lines = ' the '-delimited segments (the q44
      // boundary — this corpus has no newlines/punctuation), a line
      // survives with >= 4 words and no blacklisted term ('slow'
      // stands in for C4's bad-word list), and a document survives
      // with >= 3 surviving lines (C4's >= 3 sentences). The whole
      // gate is higher-order array functions per row — no explode, no
      // reassembly shuffle — and the oracle replays every rule and
      // the re-joined cleaned text verbatim.
      documents(s, d)
        .withColumn("g", TextStats.lineGate($"text", " the ",
          minWords = 4, blacklist = Seq("slow"), minKeptLines = 3))
        .select($"doc_id", $"g.n_lines".as("n_lines"),
          $"g.n_kept".as("n_kept"), $"g.doc_kept".as("doc_kept"),
          $"g.text_clean".as("text_clean"))
        .orderBy($"doc_id")
    },
    "q105_pq_index_probe" -> { (s, d) =>
      import s.implicits._
      // BUILD-ONCE / PROBE-MANY for the composed IVF+PQ index — the
      // persistence family completed with the billion-vector serving
      // shape (q76 float IVF / q88 lexical / q102 near-dup / here
      // memory-bounded codes): coarse centroids + PQ codebooks land as
      // one-file parquet, the corpus as m-byte codes partitionBy(cell)
      // — the probe prunes to the probed cells at PLAN time and
      // streams codes, never float vectors. Lossless on this corpus
      // (<=256 distinct subvectors), so the oracle is q78's exact
      // brute-force top-7. Rebuilds each run (honest build+probe cost)
      // like q76/q88/q102; q105p is the probe-only serving twin.
      val vecs = latticeVecs(s, d)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-pq-index-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      Pq.buildPqIndex(vecs, dir, dim = 16)
      Pq.probePqIndex(s, dir, vecs, k = 7, nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    // ---- PROBE-ONLY twins of the persistence triad (round-10 verdict
    // item 2): q76/q88/q102 honestly charge build+probe in one number,
    // which is dominated by the build's partitioned-write actions. The
    // twins time the SERVING path alone — the per-query latency a
    // build-once/probe-many deployment at 100 TB actually pays: the
    // index builds once per process (first rep, behind a completion
    // marker) and every later rep runs only the probe, so the bench
    // median over 3+ reps is the probe latency. Same oracles as the
    // build+probe forms — the probe must reproduce the same result
    // whichever rep built the index.
    "q76p_ivf_probe" -> { (s, d) =>
      import s.implicits._
      // queries are a %25 SAMPLE (the online-lookup shape probeIvfIndex
      // documents — "queries is expected to be the small side"), unlike
      // q76 which probes with the whole corpus; own oracle below.
      val vecs = latticeVecs(s, d)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-ivf-ponly-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir)(Ann.buildIvfIndex(vecs, dir))
      Ann.probeIvfIndex(s, dir, vecs.filter($"id" % 25 === 0), k = 7,
          nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q88p_bm25_probe" -> { (s, d) =>
      import s.implicits._
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-bm25-ponly-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir)(
        graft.text.Bm25.buildIndex(documents(s, d), "doc_id", "text", dir))
      graft.text.Bm25.probeIndex(s, dir,
          Seq("customer", "merge", "window"), k = 25)
        .select($"id".as("doc_id"), $"score_bp")
        .orderBy($"score_bp".desc, $"doc_id")
    },
    "q105p_pq_probe" -> { (s, d) =>
      import s.implicits._
      val vecs = latticeVecs(s, d)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-pq-ponly-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir)(Pq.buildPqIndex(vecs, dir, dim = 16))
      Pq.probePqIndex(s, dir, vecs.filter($"id" % 25 === 0), k = 7,
          nprobe = 2)
        .select($"query_id", $"neighbor_id")
        .orderBy($"query_id", $"neighbor_id")
    },
    "q102p_neardup_probe" -> { (s, d) =>
      import s.implicits._
      val docsDf = documents(s, d)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-neardup-ponly-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir)(
        Dedup.buildNearDupIndex(docsDf.filter($"doc_id" % 7 =!= 0),
          "doc_id", "text", dir))
      Dedup.probeNearDupIndex(s, dir,
          docsDf.filter($"doc_id" % 7 === 0), "doc_id", "text",
          threshold = 0.8)
        .orderBy($"new_id", $"corpus_id")
    },
    "q123_merge_upsert" -> { (s, d) =>
      import s.implicits._
      // Copy-on-write MERGE (io/MergeInto): the documents corpus lives
      // as a lang-partitioned snapshot; one update batch revises the
      // 'fr' docs with doc_id % 17 = 0 (appending a version tag) and
      // inserts brand-new docs (shifted ids, new partition 'xx').
      // Only the touched partitions ('fr', 'xx') are rewritten — the
      // incremental-maintenance contract a 100 TB corpus needs (the
      // untouched-files assertion lives in IoSpec; the summary here
      // proves the MERGE semantics against a DuckDB replay of
      // anti-join + union). Re-merging the same batch is idempotent,
      // so bench reps after the first time merge + summary on an
      // already-merged snapshot.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-merge-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir)(documents(s, d).write.mode("overwrite")
        .partitionBy("lang").parquet(dir))
      val docs = documents(s, d)
      val updates = docs
        .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
        .withColumn("text", concat($"text", lit(" [v2]")))
        .unionByName(docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx")))
      MergeInto.mergeByKey(s, dir, updates, "doc_id", "lang")
      s.read.parquet(dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q124_cdc_incremental_stats" -> { (s, d) =>
      import s.implicits._
      // CDC merge + incremental view maintenance: per-lang corpus
      // stats refreshed from the CHANGE FEED alone — after the seed,
      // the base table is never rescanned for stats (the 100 TB
      // maintenance shape; see io/StatsMaintenance). One batch
      // revises fr docs (%17, '[v2]' tag), inserts new xx docs (%31,
      // shifted ids), and DELETES de docs (%13) via tombstone rows
      // (`_del`, the WHEN MATCHED AND _del THEN DELETE clause). The
      // maintained view must equal a recompute over the merged table
      // — which is exactly what the DuckDB oracle computes. Reps
      // after the first re-merge an already-merged batch: the feed
      // degenerates to pre==post updates and no-op deletes, so every
      // delta is zero and the persisted view is a fixed point.
      val metrics = Seq("sum_len" -> length(col("text")),
        "sum_ids" -> col("doc_id"))
      val base = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-cdc-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      val statsDir = base + "-stats"
      buildOnce(base) {
        documents(s, d).write.mode("overwrite")
          .partitionBy("lang").parquet(base)
        StatsMaintenance.recompute(documents(s, d), "lang", metrics)
          .write.mode("overwrite").parquet(statsDir)
      }
      val docs = documents(s, d)
      val batch = docs
        .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
        .withColumn("text", concat($"text", lit(" [v2]")))
        .withColumn("_del", lit(false))
        .unionByName(docs.filter($"doc_id" % 31 === 0)
          .withColumn("doc_id", $"doc_id" + 100000000L)
          .withColumn("lang", lit("xx"))
          .withColumn("_del", lit(false)))
        .unionByName(docs.filter($"lang" === "de" && $"doc_id" % 13 === 0)
          .withColumn("_del", lit(true)))
      val (_, feed) = MergeInto.mergeByKeyCdc(s, base, batch,
        "doc_id", "lang", deleteWhen = Some($"_del"))
      val updated = StatsMaintenance.applyCdc(
        s.read.parquet(statsDir), feed, "lang", metrics)
      // persist the maintained view crash-safely (staging write runs
      // while the old view is still live, so the self-read is safe)
      Compact.stagedSwap(s, statsDir)(
        staging => updated.write.parquet(staging))
      s.read.parquet(statsDir).orderBy($"lang")
    },
    "q125_manifest_scan" -> { (s, d) =>
      import s.implicits._
      // Manifest-pruned box scan: the events fact laid out z-ordered
      // by (user_id, cents) with a per-file min/max manifest
      // (io/Manifest) — a 2-D box predicate keeps only the files
      // whose stats box intersects it, WITHOUT opening any parquet
      // footer (the Iceberg/Delta planning step reduced to one
      // manifest table; at 100 TB this is the difference between one
      // tiny manifest read and 100k footer round trips). Pruning is
      // conservative, so the result must equal the plain full scan —
      // which is exactly what the oracle runs; the files-touched
      // accounting is spec-asserted (IoSpec) where the layout is
      // controlled.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-manifest-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val ev = events(s, d).select($"event_id", $"user_id",
          $"event_type", round($"value" * 100).cast("long").as("cents"))
        ZOrder.writeZOrdered(ev, dir, $"user_id", $"cents",
          numFiles = 16)
        Manifest.buildManifest(s, dir, Seq("user_id", "cents"))
      }
      val (pruned, _) = Manifest.prunedRead(s, dir,
        Seq(("user_id", 3L, 9L), ("cents", 1000L, 20000L)))
      pruned
        .filter($"user_id".between(3, 9) &&
          $"cents".between(1000, 20000))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
          sum($"event_id").as("sum_ids"))
        .orderBy($"event_type")
    },
    "q126_time_travel" -> { (s, d) =>
      import s.implicits._
      // TIME TRAVEL by VERSION ID: the build seeds version 1 of a
      // VersionLog table and commits one CDC merge as version 2; the
      // query reads `version = 1` — which resolves v-00000001.json
      // and plans a scan over exactly its (immutable) file list. No
      // feed-chain inversion, no history replay: reading yesterday's
      // table costs the same as reading today's. The oracle is the
      // pristine documents table: stats over the pinned snapshot must
      // be bit-identical to the table before the merge. (The feed-
      // inversion alternative, MergeInto.snapshotBefore, is pinned
      // equal to the version read in VersionLogSpec.)
      val dir = versionedTableDir(s, d)
      VersionLog.read(s, dir, Some(1L))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q136_versioned_merge" -> { (s, d) =>
      import s.implicits._
      // SNAPSHOT-ISOLATED MERGE: the same deterministic CDC batch the
      // in-place merge family applies (fr%17 updates, %31 inserts,
      // de%13 deletes), executed against a PINNED version-1 snapshot
      // and published by ONE atomic version-file create — readers
      // resolved mid-merge keep version 1's file list (immutable
      // files, no partition delete+rename anywhere), then flip to
      // version 2 whole. The query reads the LATEST version; the
      // oracle independently reconstructs the post-merge state from
      // the pristine table, so a lost survivor row, a leaked
      // tombstone, or a torn partition cannot hash-match.
      val dir = versionedTableDir(s, d)
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q135_table_checksum" -> { (s, d) =>
      import s.implicits._
      // Order- and partition-independent CONTENT CHECKSUM — the
      // anti-entropy primitive for validating a 100 TB copy without
      // sorting either side: per-row md5-low-60 of the
      // SOH-delimited (\u0001) canonical row string, SUMMED per group in
      // DECIMAL(38,0) (sum is commutative/associative, so layout,
      // partitioning, and row order cannot change it; 10^12 rows of
      // 2^60 values stay ~10^30, far inside 38 digits). Emitted as a
      // string so both engines compare digits, not decimal dtypes.
      // Two tables agree iff every (lang, n_rows, checksum) row
      // agrees — which is exactly what the oracle's independent
      // recomputation checks.
      // The canonical row string is NULL-SAFE for text via a presence
      // tag (`V<text>` vs `N`): a bare concat_ws would silently SKIP a
      // null text (row hashed without it) while an engine
      // concatenating with explicit separators nulls the whole hash
      // (row dropped from the sum but still counted) — the tag makes
      // null and empty text distinct and both engines hash the
      // identical string for every row.
      val rowHash = conv(substring(md5(concat(
        $"doc_id".cast("string"), lit("\u0001"), $"lang",
        lit("\u0001"),
        coalesce(concat(lit("V"), $"text"), lit("N")))), 1, 15), 16, 10)
        .cast("decimal(38,0)")
      documents(s, d)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(rowHash).cast("string").as("checksum"))
        .orderBy($"lang")
    },
    "q137_graft_box_scan" -> { (s, d) =>
      import s.implicits._
      // The graft FORMAT as the front door: the same 2-D box workload
      // as q125, but the pruning happens inside Spark's planner — the
      // custom FileIndex behind spark.read.format("graft") resolves
      // the version-pinned file list and drops files whose manifest
      // box misses the pushed predicates, so the scan plans over a
      // file subset with no explicit pruning API in the query at all.
      // Pruning is conservative; the result must equal the oracle's
      // plain full scan bit-for-bit. File-count effectiveness is
      // plan-asserted in GraftTableSourceSpec via the scan's numFiles
      // metric.
      val dir = graftTableDir(s, d)
      s.read.format("graft").load(dir)
        .filter($"user_id".between(3, 9) &&
          $"cents".between(1000, 20000))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
          sum($"event_id").as("sum_ids"))
        .orderBy($"event_type")
    },
    "q138_graft_point_lookup" -> { (s, d) =>
      import s.implicits._
      // Point lookups through the graft format's bloom layer: the
      // layout is z-ordered by (user_id, cents), so event_id min/max
      // stats are useless — every file spans the id range; the
      // per-file key bloom (option bloomKey) prunes the IN-list probe
      // to the files that can hold the keys (no false negatives, so
      // the rows equal the oracle's plain IN scan; the absent sentinel
      // key exercises pruning without rows).
      val dir = graftTableDir(s, d)
      s.read.format("graft").option("bloomKey", "event_id").load(dir)
        .filter($"event_id".isin(5L, 77L, 424L, 999999999L))
        .select($"event_id", $"user_id", $"event_type", $"cents")
        .orderBy($"event_id")
    },
    "q139_dv_point_delete" -> { (s, d) =>
      import s.implicits._
      // MERGE-ON-READ deletes: the build writes the lang-partitioned
      // corpus once, then records two delete sets (de%13, fr%29) as
      // per-partition deletion-vector key lists — a KB-sized write
      // that touches NO data file, where the copy-on-write tombstone
      // merge would rewrite both partitions. The query is the
      // merge-on-read path itself: table anti-join the broadcast DV
      // keys. The oracle computes the post-delete stats independently
      // from the pristine table, so a swallowed survivor or a leaked
      // deleted row cannot hash-match. Write-cost independence and
      // the compaction that folds the debt (applyAndClear) are
      // spec-pinned in IoSpec.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-dv-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        documents(s, d).write.mode("overwrite")
          .partitionBy("lang").parquet(dir)
        val del = documents(s, d)
          .filter(($"lang" === "de" && $"doc_id" % 13 === 0) ||
            ($"lang" === "fr" && $"doc_id" % 29 === 0))
          .select($"doc_id", $"lang")
        DeletionVectors.deleteKeys(s, dir, del, "doc_id", "lang")
      }
      DeletionVectors.readWithDeletes(s, dir, "doc_id", "lang")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q141_versioned_compact" -> { (s, d) =>
      import s.implicits._
      // COMPACTION AS A COMMIT: repack the versioned table's
      // fragmented groups (the seed writes 4 files per lang) into one
      // file each and publish the result as a new version — no
      // delete, no rename, readers of ANY version undisturbed; the
      // old fragments age out via vacuum once unreferenced. The query
      // reads the latest snapshot; the oracle is the same post-merge
      // reconstruction as q136 — compaction that changed ANY row,
      // lost a fragment, or resurrected a retired one cannot
      // hash-match. File-count shrinkage, carry-by-reference, and
      // pinned-reader stability are spec-asserted (VersionLogSpec).
      val dir = versionedTableDir(s, d)
      val marker = new java.io.File(dir, "_graft_compacted")
      if (!marker.exists()) {
        VersionLog.compactSnapshot(s, dir, targetBytes = 1L << 30)
        marker.createNewFile()
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q142_graft_write_roundtrip" -> { (s, d) =>
      import s.implicits._
      // The graft SINK as the front door: seed the table through
      // `df.write.format("graft")` (version 1 = everything but fr),
      // then APPEND the fr slice (version 2) — both writes are
      // version-log commits, so the table was never half-written for
      // any reader. The query reads the latest snapshot back through
      // the format; the oracle is the pristine documents table — a
      // lost batch, a double-applied append, or a torn commit cannot
      // hash-match. SaveMode semantics (error/append/overwrite/
      // ignore + time travel across them) are spec-pinned in
      // GraftTableSourceSpec.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-sink-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        docs.filter($"lang" =!= "fr").write.format("graft")
          .option("partitionBy", "lang").save(dir)
        docs.filter($"lang" === "fr").write.format("graft")
          .option("partitionBy", "lang").mode("append").save(dir)
      }
      s.read.format("graft").load(dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q143_table_history" -> { (s, d) =>
      import s.implicits._
      // DESCRIBE HISTORY for the versioned table: one row per commit
      // with parent, action, and the snapshot's exact row count —
      // the operational "what happened to this table" question
      // answered from metadata + footer counts, never a data decode.
      // The build is its own table (init fr -> append de -> tombstone
      // merge) so the history is DETERMINISTIC; the oracle recomputes
      // every version's row count independently from the pristine
      // table, so a commit that lost or duplicated rows — or a
      // history that misordered parents — cannot hash-match.
      // (n_files is in the API but not the query: file counts depend
      // on task parallelism, not semantics.)
      val dir = histTableDir(s, d)
      VersionLog.history(s, dir)
        .select($"version", $"parent", $"action", $"n_rows")
        .orderBy($"version")
    },
    "q144_version_tail" -> { (s, d) =>
      import s.implicits._
      // The COMMIT TAIL as a data source (format "graft-versions"):
      // one row per (version, added file), emitted when the version
      // file appears — the incremental-consumer front door (streaming
      // twin spec-pinned in GraftTableSourceSpec). The query is the
      // consumer pattern itself: per commit, read exactly the files
      // that commit added (driver collect = the metadata-sized file
      // list) and count their rows. The oracle recomputes every
      // commit's added-row count from the pristine table — a commit
      // that streamed a missing, extra, or uncommitted file cannot
      // hash-match.
      val dir = histTableDir(s, d)
      val tail = s.read.format("graft-versions").load(dir)
        .select($"version", $"parent", $"action", $"file").collect()
      val perVersion = tail
        .groupBy(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sortBy(_._1._1)
        .map { case ((v, p, a), rows) =>
          val n = s.read
            .parquet(rows.map(r => s"$dir/${r.getString(3)}").toIndexedSeq: _*)
            .count()
          (v, p, a, n)
        }
      perVersion.toDF("version", "parent", "action", "n_added_rows")
        .orderBy($"version")
    },
    "q145_catalog_sql" -> { (s, d) =>
      // THE LAKEHOUSE AS PLAIN SQL: the V2 TableCatalog
      // (catalog/GraftCatalog) makes the versioned table a catalog
      // citizen — this build applies q136's deterministic CDC batch
      // via a MERGE INTO *statement* (Spark's parse tree, the graft
      // parser's command, the versioned copy-on-write merge
      // underneath) and this query reads the committed result back
      // through `SELECT … FROM graft.`dir``, planned by the SAME
      // pruning FileIndex as format("graft"). The oracle is q136's
      // independent reconstruction: a merge that the SQL route
      // applied differently from the API route cannot hash-match.
      // Catalog mechanics (CREATE/CTAS/INSERT/OVERWRITE/history/
      // plan-pruning parity) are spec-pinned in GraftCatalogSpec.
      val dir = catalogSqlTableDir(s, d)
      s.sql(s"""SELECT lang, count(*) AS n_rows,
          sum(length(text)) AS sum_len, sum(doc_id) AS sum_ids
        FROM graft.`$dir`
        GROUP BY lang ORDER BY lang""")
    },
    "q148_history_sql" -> { (s, d) =>
      import s.implicits._
      // DESCRIBE HISTORY as SQL TEXT: the same deterministic commit
      // log as q143 (init fr -> append de -> tombstone merge), read
      // through the statement the graft parser adds to Spark's
      // grammar and routed by the catalog — the operational audit
      // question answered with no API in sight. The oracle recomputes
      // every version's row count independently; the q143 API twin
      // and this SQL door must both hash-match it.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = histTableDir(s, d)
      s.sql(s"DESCRIBE HISTORY graft.`$dir`")
        .select($"version", $"parent", $"action", $"n_rows")
        .orderBy($"version")
    },
    "q147_versioned_dv" -> { (s, d) =>
      import s.implicits._
      // EQUALITY-DELETE COMMITS: q139's merge-on-read workload on the
      // VERSIONED layout — the delete writes only a KB-sized key-list
      // manifest and ONE version-file create (no data file touched;
      // v1 still time-travels to the pre-delete corpus), and this
      // read is the snapshot protocol's own merge-on-read path: the
      // pinned scan anti-joins the broadcast manifests. The oracle
      // recomputes the post-delete stats from the pristine table — a
      // swallowed survivor or a leaked deleted row cannot hash-match.
      // No-data-file writes, raw-door refusal, compaction carry, the
      // applyDeletesCommit fold, and manifest vacuum are spec-pinned
      // in VersionLogSpec.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-vdv-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        VersionLog.deleteKeysCommit(s, dir,
          docs.filter(($"lang" === "de" && $"doc_id" % 13 === 0) ||
              ($"lang" === "fr" && $"doc_id" % 29 === 0))
            .select($"doc_id"),
          "doc_id")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q150_shallow_clone" -> { (s, d) =>
      import s.implicits._
      // ZERO-COPY SHALLOW CLONE, divergence-proofed: the clone is
      // hard-linked from the source's pinned snapshot (no data
      // copied), then diverges by one CDC merge — and BOTH sides are
      // read back in one result. The oracle recomputes the source
      // side from the pristine corpus (a clone mutation that leaked
      // into the source cannot hash-match) and the clone side from
      // the merge recipe (a clone missing source bytes cannot
      // either). Hard-link nlink>=2 and vacuum independence are
      // spec-pinned in VersionLogSpec.
      val (src, dst) = cloneTableDirs(s, d)
      def agg(dir: String, side: String) =
        VersionLog.read(s, dir)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(length($"text")).as("sum_len"),
            sum($"doc_id").as("sum_ids"))
          .select(lit(side).as("side"), $"lang", $"n_rows",
            $"sum_len", $"sum_ids")
      agg(src, "source").unionByName(agg(dst, "clone"))
        .orderBy($"side", $"lang")
    },
    "q149_replace_partition" -> { (s, d) =>
      import s.implicits._
      // PARTITION-SCOPED OVERWRITE (Delta's replaceWhere / SQL
      // `INSERT OVERWRITE ... PARTITION (p=v)`) on the versioned
      // table: one commit replaces exactly the fr partition with a
      // transformed slice, a second DRAINS de with an empty slice —
      // file-granular copy-on-write (untouched partitions carry by
      // reference; blast radius = the named partitions, never the
      // table), full history still time-travelable. The oracle
      // recomputes the end state from the pristine corpus: a
      // widened overwrite (eaten partition), a leaked replaced row,
      // or an undrained de row cannot hash-match. Scope refusal and
      // the SQL door are spec-pinned in VersionLogSpec /
      // GraftCatalogSpec.
      val dir = replacePartitionDir(s, d)
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q151_schema_evolution" -> { (s, d) =>
      import s.implicits._
      // DDL SCHEMA EVOLUTION, full cycle: `ALTER TABLE ADD COLUMN`
      // as a METADATA-ONLY commit, an append populating it, then the
      // COLUMN-MAPPING alters (r15) — RENAME flag->marker (data
      // carried by physical identity, no file touched), an add+drop
      // round trip (tmp), and a RE-ADD of the original name `flag`,
      // which must mint a FRESH physical identity: the old flag
      // bytes still sit in every pre-rename file under the physical
      // name, and leaking them into the re-added column is the
      // classic column-mapping bug (the reason Delta assigns field
      // ids). The oracle recomputes rows, the carried marker counts/
      // sums, and the re-added column's count (0 — all NULL) from
      // the pristine corpus: a lost rename, a leak into the fresh
      // column, or a mis-bound insert cannot hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-evo-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        s.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN flag BIGINT")
        VersionLog.append(s, dir,
          docs.filter($"doc_id" % 5 === 0)
            .withColumn("doc_id", $"doc_id" + 200000000L)
            .withColumn("flag", $"doc_id" % 7),
          partitionBy = Some("lang"))
        s.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN flag TO marker")
        s.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN tmp STRING")
        s.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN tmp")
        s.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN flag BIGINT")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          count($"marker").as("n_flagged"),
          sum($"marker").as("sum_flag"),
          count($"flag").as("n_fresh"))
        .orderBy($"lang")
    },
    "q152_stats_skipping" -> { (s, d) =>
      import s.implicits._
      // WRITE-TIME STATS SKIPPING end-to-end: a versioned FLAT table
      // (no partition directories — any file skipped is the
      // commit-time `_stats.json` layer's work, io.BatchStats) built
      // as four range-disjoint append batches over doc_id, probed
      // with a quarter-range predicate that box-prunes three of the
      // four batches at PLAN time (executed numFiles pinned in
      // GraftTableSourceSpec; pruning is conservative so results
      // cannot depend on it). The oracle recomputes the same quarter
      // from the pristine corpus: a box that over-prunes (dropping a
      // live file) or a mis-normalized bound cannot hash-match.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-skip-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        val m = docs.agg(max($"doc_id")).as[Long].head()
        val cuts = Seq(m / 4, m / 2, 3 * m / 4)
        VersionLog.init(s, dir,
          docs.filter($"doc_id" <= cuts(0)).coalesce(1))
        VersionLog.append(s, dir,
          docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1))
            .coalesce(1))
        VersionLog.append(s, dir,
          docs.filter($"doc_id" > cuts(1) && $"doc_id" <= cuts(2))
            .coalesce(1))
        VersionLog.append(s, dir,
          docs.filter($"doc_id" > cuts(2)).coalesce(1))
      }
      val docs = documents(s, d)
      val m = docs.agg(max($"doc_id")).as[Long].head()
      VersionLog.read(s, dir)
        .filter($"doc_id" > m / 2 && $"doc_id" <= 3 * m / 4)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy($"lang")
    },
    "q153_sql_dml" -> { (s, d) =>
      import s.implicits._
      // SQL DELETE + UPDATE as copy-on-write COMMITS through the
      // catalog front door: DELETE FROM drops the short-document
      // tail, UPDATE stamps half the French corpus — each rewriting
      // ONLY the files holding matching rows (blast radius pinned in
      // GraftCatalogSpec), each a time-travelable version, both
      // feeding graft-cdc delete/insert images (spec-pinned). The
      // oracle replays both statements relationally over the pristine
      // corpus: an over-eager rewrite (dropping a survivor), a
      // misapplied assignment, or an UPDATE evaluated against
      // already-updated rows cannot hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-dml-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        VersionLog.init(s, dir, documents(s, d),
          partitionBy = Some("lang"))
        s.sql(s"DELETE FROM graft.`$dir` WHERE length(text) < 80")
        s.sql(s"UPDATE graft.`$dir` SET text = concat(text, ' [u]') " +
          "WHERE lang = 'fr' AND doc_id % 2 = 0")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_id"))
        .orderBy($"lang")
    },
    "q154_merge_mirror" -> { (s, d) =>
      import s.implicits._
      // FULL-SYNC MIRROR MERGE: the three-clause `MERGE INTO` with
      // `WHEN NOT MATCHED BY SOURCE AND t.lang = 'de' THEN DELETE`
      // through the catalog SQL front door — matched rows update (or
      // tombstone-delete), source-only keys insert, and target rows
      // the source no longer covers are deleted where the condition
      // holds (Delta's mirror clause; public protocol semantics
      // re-implemented on the version-log commit). One copy-on-write
      // commit; the CDC feed carries delete images for the by-source
      // victims (spec-pinned in GraftCatalogSpec). The oracle replays
      // the statement relationally over the pristine corpus: a
      // by-source delete that over- or under-fires, or an upsert
      // misclassified by the widened blast radius, cannot hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-mirror-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .withColumn("text", concat($"text", lit(" [v2]")))
          .withColumn("_del", lit(false))
          .unionByName(docs.filter($"doc_id" % 31 === 0)
            .withColumn("doc_id", $"doc_id" + 100000000L)
            .withColumn("lang", lit("xx"))
            .withColumn("_del", lit(false)))
          .unionByName(docs
            .filter($"lang" === "de" && $"doc_id" % 13 === 0)
            .withColumn("_del", lit(true)))
          .createOrReplaceTempView("q154_source")
        s.sql(s"""MERGE INTO graft.`$dir` AS t USING q154_source AS u
            ON t.doc_id = u.doc_id
            WHEN MATCHED AND u._del THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND t.lang = 'de' THEN DELETE""")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q155_dml_mor" -> { (s, d) =>
      import s.implicits._
      // SQL DML OVER A MERGE-ON-READ TABLE: the q153 statements run
      // against a table carrying outstanding equality-delete
      // manifests (q147's shape: de%13 ∪ fr%29 keys deleted as a
      // KB-sized manifest, no data rewritten). The doors fold the
      // manifests into the victim rewrite — the UPDATE/DELETE see
      // only live rows, a victim file's manifest-deleted rows drop
      // out of its replacement, and the manifests carry unchanged
      // for non-victim files. The oracle replays manifest + DELETE +
      // UPDATE relationally: a resurrected manifest key, a DML
      // statement touching a dead row, or a dropped survivor cannot
      // hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-dmlmor-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        VersionLog.deleteKeysCommit(s, dir,
          docs.filter(($"lang" === "de" && $"doc_id" % 13 === 0) ||
              ($"lang" === "fr" && $"doc_id" % 29 === 0))
            .select($"doc_id"), "doc_id")
        s.sql(s"DELETE FROM graft.`$dir` WHERE length(text) < 80")
        s.sql(s"UPDATE graft.`$dir` SET text = concat(text, ' [u]') " +
          "WHERE lang = 'fr' AND doc_id % 2 = 0")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_id"))
        .orderBy($"lang")
    },
    "q156_type_widening" -> { (s, d) =>
      import s.implicits._
      // ALTER COLUMN TYPE WIDENING end-to-end: a versioned table
      // whose `score` column starts INT, widens to BIGINT through
      // the SQL front door as a METADATA-ONLY commit (no file
      // touched — the scan decodes the narrow files into the wide
      // read schema natively, Spark 4 scan-level widening / Delta's
      // type-widening idea), then an append lands values beyond int
      // range. The oracle recomputes the union in BIGINT from the
      // pristine corpus: a lost widen (overflowing int arithmetic),
      // a mis-decoded narrow file, or a dropped append cannot
      // hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-widen-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir,
          docs.select($"doc_id", $"lang", $"text",
            (length($"text") % 1000).cast("int").as("score")),
          partitionBy = Some("lang"))
        s.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN score " +
          "TYPE BIGINT")
        VersionLog.append(s, dir,
          docs.filter($"doc_id" % 7 === 0)
            .select(($"doc_id" + 300000000L).as("doc_id"), $"lang",
              $"text",
              (length($"text").cast("long") + 3000000000L)
                .as("score")),
          partitionBy = Some("lang"))
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum($"score").as("sum_score"),
          max($"score").as("max_score"),
          sum(when($"score" > 2000000000L, 1L).otherwise(0L))
            .as("n_wide"))
        .orderBy($"lang")
    },
    "q157_cdc_rename_replay" -> { (s, d) =>
      import s.implicits._
      // CDC REPLAY ACROSS A COLUMN-MAPPING CHANGE: the table renames
      // text -> body MID-HISTORY (a metadata-only commit), and the
      // row-level feed must keep serving every older version's
      // images under the CURRENT name — projected through physical
      // identity, the fix for "a cheap rename bricks every
      // downstream graft-cdc mirror". History: v1 init, v2 CDC merge
      // (explicit image files written under the OLD name), v3
      // RENAME, v4 append under the new name. The mirror
      // reconstructs the final state from the feed alone
      // (last-op-wins per key, one window — q146's consumer shape);
      // the oracle recomputes it from the pristine corpus: a
      // null-filled renamed column, a dropped pre-rename image, or a
      // mis-projected name cannot hash-match. The streaming twin
      // (checkpoint crossing the rename boundary) is spec-pinned in
      // GraftTableSourceSpec.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-cdcren-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
          .select($"doc_id", $"text", $"lang")
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        VersionLog.mergeByKeyCdc(s, dir,
          docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
            .withColumn("text", concat($"text", lit(" [v2]")))
            .withColumn("_del", lit(false))
            .unionByName(docs
              .filter($"lang" === "de" && $"doc_id" % 13 === 0)
              .withColumn("_del", lit(true))),
          "doc_id", "lang", deleteWhen = Some($"_del"))
        s.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN text TO body")
        VersionLog.append(s, dir,
          docs.filter($"doc_id" % 31 === 0)
            .withColumn("doc_id", $"doc_id" + 100000000L)
            .withColumn("lang", lit("xx"))
            .withColumnRenamed("text", "body"),
          partitionBy = Some("lang"))
      }
      val feed = s.read.format("graft-cdc").load(dir)
      val opRank = when($"_op".isin("insert", "update_post"), 2)
        .when($"_op" === "delete", 1).otherwise(lit(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id")
        .orderBy($"_feed_batch".desc, opRank.desc)
      feed.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1 && $"_op".isin("insert", "update_post"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"body")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q158_merge_schema_evolution" -> { (s, d) =>
      import s.implicits._
      // MERGE WITH SCHEMA EVOLUTION (Delta autoMerge / Spark 4's
      // keyword) through the catalog front door: the source carries a
      // column the target lacks (`rev`) plus a tombstone helper
      // (`_del`) — the merge auto-ADDS `rev` as a metadata-only
      // commit (existing rows NULL, merged rows populate), while the
      // helper (referenced only by the tombstone clause) never
      // becomes a table column. The oracle replays update + insert +
      // delete + the new column relationally: a leaked helper column,
      // a lost auto-add, or a mis-populated NULL cannot hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-mevo-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
          .select($"doc_id", $"text", $"lang")
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .withColumn("text", concat($"text", lit(" [v2]")))
          .withColumn("rev", $"doc_id" % 5)
          .withColumn("_del", lit(false))
          .unionByName(docs.filter($"doc_id" % 31 === 0)
            .withColumn("doc_id", $"doc_id" + 100000000L)
            .withColumn("lang", lit("xx"))
            .withColumn("rev", $"doc_id" % 5)
            .withColumn("_del", lit(false)))
          .unionByName(docs
            .filter($"lang" === "de" && $"doc_id" % 13 === 0)
            .withColumn("rev", lit(0L)).withColumn("_del", lit(true)))
          .createOrReplaceTempView("q158_source")
        s.sql(
          s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` AS t
              USING q158_source AS u ON t.doc_id = u.doc_id
              WHEN MATCHED AND u._del THEN DELETE
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          count($"rev").as("n_rev"),
          sum($"rev").as("sum_rev"),
          sum(length($"text")).as("sum_len"))
        .orderBy($"lang")
    },
    "q159_nested_rename_replay" -> { (s, d) =>
      import s.implicits._
      // NESTED schema evolution end-to-end: the canonical doc schema
      // is nested, and a field INSIDE a struct column renames
      // mid-history as a metadata-only commit (dotted colMap path;
      // the read side rebuilds the struct via UpdateFields so null
      // parents stay null and pushdown survives). History: v1 init
      // with `meta: struct<len,src>`, v2 CDC merge (explicit images
      // under the OLD nested name), v3 `RENAME COLUMN meta.len TO
      // chars` through the SQL door, v4 append under the NEW name.
      // The mirror reconstructs the final state from the feed alone —
      // every replayed version's struct projected into the CURRENT
      // nested names; the oracle recomputes relationally, so a
      // null-filled renamed leaf, a scrambled struct rebuild, or a
      // dropped pre-rename image cannot hash-match. The numFiles
      // pruning twin (the renamed leaf still box-prunes) is
      // spec-pinned in GraftTableSourceSpec.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-nestren-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d).select($"doc_id",
          struct($"n_chars".as("len"), $"source".as("src"))
            .as("meta"),
          $"lang")
        VersionLog.init(s, dir, docs, partitionBy = Some("lang"))
        VersionLog.mergeByKeyCdc(s, dir,
          documents(s, d)
            .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
            .select($"doc_id",
              struct(($"n_chars" + 1000L).as("len"),
                $"source".as("src")).as("meta"),
              $"lang"),
          "doc_id", "lang")
        s.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.len " +
          "TO chars")
        VersionLog.append(s, dir,
          documents(s, d).filter($"doc_id" % 31 === 0)
            .select(($"doc_id" + 100000000L).as("doc_id"),
              struct($"source".as("src"),
                $"n_chars".as("chars")).as("meta"),
              lit("xx").as("lang")),
          partitionBy = Some("lang"))
      }
      val feed = s.read.format("graft-cdc").load(dir)
      val opRank = when($"_op".isin("insert", "update_post"), 2)
        .when($"_op" === "delete", 1).otherwise(lit(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id")
        .orderBy($"_feed_batch".desc, opRank.desc)
      feed.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1 && $"_op".isin("insert", "update_post"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum($"meta.chars").as("sum_chars"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q160_merge_widen" -> { (s, d) =>
      import s.implicits._
      // MERGE WITH SCHEMA EVOLUTION x TYPE WIDENING through the SQL
      // keyword door: the source arrives WIDER on two axes — int
      // where the target wrote tinyint (values past Byte.MaxValue),
      // decimal(14,4) where it wrote decimal(10,2) — and the merge
      // rides the same widen machinery as ALTER COLUMN TYPE: the
      // batch lands wide, untouched partitions keep narrow footers,
      // the footer merge widens the READ schema, no declared-schema
      // rewrite. A lossy pair (e.g. double x long) refuses before any
      // file is written (spec-pinned in VersionLogSpec). The oracle
      // replays the update relationally in exact DECIMAL arithmetic —
      // a truncated value, a lost scale, or a miscoerced partition
      // cannot hash-match.
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-mwiden-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        val docs = documents(s, d)
        VersionLog.init(s, dir,
          docs.select($"doc_id",
            ($"n_chars" % 100).cast("tinyint").as("score"),
            ($"n_chars" % 1000).cast("decimal(10,2)").as("price"),
            $"lang"),
          partitionBy = Some("lang"))
        docs.filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .select($"doc_id",
            ($"n_chars" + 1000L).cast("int").as("score"),
            (($"n_chars" * 7).cast("decimal(14,4)") +
              lit("0.1234").cast("decimal(14,4)"))
              .cast("decimal(14,4)").as("price"),
            $"lang")
          .createOrReplaceTempView("q160_source")
        s.sql(
          s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` AS t
              USING q160_source AS u ON t.doc_id = u.doc_id
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
      }
      VersionLog.read(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum($"score").as("sum_score"),
          sum($"price").cast("string").as("sum_price"))
        .orderBy($"lang")
    },
    "q146_cdc_replay" -> { (s, d) =>
      import s.implicits._
      // ALL-DOORS CHANGE-DATA-CAPTURE REPLAY: reconstruct the CURRENT
      // snapshot from NOTHING but the row-level feed, read through
      // format("graft-cdc") over a history that interleaved every
      // write door — init, CDC merge (the only door with explicit
      // image files), append, equality delete, and partition
      // overwrite (all synthesized from the commit log at read time,
      // zero write amplification). The downstream-mirror consumer is
      // ONE flat plan regardless of history depth: last-op-wins per
      // key — rank images by (_feed_batch, op class) and keep the
      // keys whose newest image is an addition — one shuffle + one
      // window sort, never a per-commit join chain. The oracle
      // independently recomputes the final state from the pristine
      // corpus: a door whose changes the feed missed (the silent-
      // mirror-drift failure), a phantom image, or a mis-tagged op
      // cannot hash-match. Exactly-once streaming delivery, rate
      // limiting, and per-door image shapes are spec-pinned in
      // GraftTableSourceSpec.
      val dir = cdcDoorsDir(s, d)
      val feed = s.read.format("graft-cdc").load(dir)
      val opRank = when($"_op".isin("insert", "update_post"), 2)
        .when($"_op" === "delete", 1).otherwise(lit(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id")
        .orderBy($"_feed_batch".desc, opRank.desc)
      feed.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1 && $"_op".isin("insert", "update_post"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(length($"text")).as("sum_len"),
          sum($"doc_id").as("sum_ids"))
        .orderBy($"lang")
    },
    "q140_recall_curve" -> { (s, d) =>
      import s.implicits._
      // The serving family's accuracy knob as a MEASURED CURVE, not
      // one operating point: recall@7 on the noisy corpus at 1, 2,
      // and 4 sign-LSH bands (more bands = more candidate probes =
      // higher recall — the same latency/accuracy dial as IVF's
      // nprobe, in the one indexing scheme whose candidate selection
      // the oracle replays bit-for-bit: md5-parity hyperplanes).
      // Integer hit counts and basis-point recalls, so every point on
      // the curve is hash-checked; monotonicity and per-level floors
      // are spec-asserted (PipelineOpsSpec).
      // one-pass curve: the vector checkpoint, the signature table
      // (plane signs are a pure function of the band INDEX, so the
      // max-level table contains every level as its band < lvl prefix)
      // and the exact O(N·Q) ground truth are shared across the three
      // levels instead of recomputed per level — bit-identical hits
      // (PortableLsh.recallCurve; spec-pinned against per-level
      // recallAtK)
      PortableLsh.recallCurve(noisyVecs(s, d), col("id") % 25 === 0,
          dIn = 16, bandLevels = Seq(1, 2, 4), rBits = 16, k = 7)
        .groupBy($"bands")
        .agg(count(lit(1)).as("n_queries"),
          sum($"n_hits").cast("long").as("n_hits"))
        .withColumn("recall_bp",
          expr("n_hits * 10000 div (n_queries * 7)"))
        .orderBy($"bands")
    },
    "q132_knn_classify" -> { (s, d) =>
      import s.implicits._
      // kNN-by-retrieval classification — the eval loop every
      // embedding pipeline runs (label a query by the majority label
      // of its exact top-7 neighbors): integer-L2 ground truth under
      // the (d2, id) total order, vote counts and the
      // (votes desc, label asc) winner all integers, so the oracle
      // replays prediction AND correctness bit-for-bit. The exact
      // baseline is the declared O(N·Q) shape (queries broadcast,
      // top-k partial-aggregated — k rows per partition-query); the
      // scale path for the same vote is any ANN candidate source
      // (q45/q51/q78) feeding the identical vote.
      val labeled = embeddings(s, d).select($"vec_id", $"label")
      val exact = PortableLsh.exactTopK(noisyVecs(s, d),
        col("id") % 25 === 0, dIn = 16, k = 7)
      val votes = exact
        .join(labeled.select($"vec_id".as("neighbor_id"),
          $"label"), "neighbor_id")
        .groupBy($"query_id", $"label")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"n".desc, $"label")
      votes.withColumn("r", row_number().over(w)).filter($"r" === 1)
        .join(labeled.select($"vec_id".as("query_id"),
          $"label".as("true_label")), "query_id")
        .select($"query_id", $"label".cast("long").as("pred_label"),
          $"n".as("votes"), $"true_label".cast("long").as("true_label"),
          when($"label" === $"true_label", 1L).otherwise(0L)
            .as("correct"))
        .orderBy($"query_id")
    },
    "q131_hybrid_rrf" -> { (s, d) =>
      import s.implicits._
      // HYBRID retrieval rank fusion — the step every two-signal
      // search stack (lexical + semantic, here BM25 + query-word
      // occurrence density as the second portable signal) needs:
      // reciprocal-rank fusion over the two retrieved top-25 lists,
      // integer-exact (1e6 div (60 + rank) — positive trunc div is
      // identical on both engines). Fusion operates on K-BOUNDED
      // lists, so the windows rank 25 rows regardless of corpus size;
      // the corpus-sized work is the two retrievals, each already
      // scale-shaped (BM25: row-local term filter + broadcast stats;
      // occurrence: one fused scan).
      val terms = Seq("customer", "merge", "window")
      val wA = Window.orderBy($"score_bp".desc, $"doc_id")
      val a = graft.text.Bm25.topK(documents(s, d), "doc_id", "text",
          terms, k = 25)
        .select($"id".as("doc_id"), $"score_bp")
        .withColumn("ra", row_number().over(wA))
        .select($"doc_id", expr("1000000 div (60 + ra)").as("fa"))
      val qwords = array(Seq("stream", "merge", "sort", "query",
        "group", "hash").map(lit): _*)
      val wB = Window.orderBy($"occ".desc, $"doc_id")
      val b = documents(s, d)
        .select($"doc_id",
          size(filter(split(trim($"text"), "\\s+"),
            w => array_contains(qwords, w))).cast("long").as("occ"))
        .orderBy($"occ".desc, $"doc_id").limit(25)
        .withColumn("rb", row_number().over(wB))
        .select($"doc_id", expr("1000000 div (60 + rb)").as("fb"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select($"doc_id",
          (coalesce($"fa", lit(0L)) + coalesce($"fb", lit(0L)))
            .as("rrf"))
        .orderBy($"rrf".desc, $"doc_id")
        .limit(10)
    },
    "q130_change_audit" -> { (s, d) =>
      import s.implicits._
      // The change feed AS the audit log: per (op, lang) counts, id
      // sums, and text-length sums of merge batch 0 — the "what
      // changed, where, how much" question a maintained corpus
      // answers from the feed alone (batch-sized read, the table is
      // never touched). Row-level classification is hash-pinned: the
      // oracle re-derives every op class from the pristine table
      // (update_pre = the original fr%17 rows, update_post = their
      // '[v2]' images, insert = the shifted xx rows, delete = the
      // de%13 rows), so a misclassified or lost change cannot match.
      val dir = mergedSnapshotDir(s, d)
      s.read.parquet(s"$dir._cdc/batch-00000")
        .groupBy($"_op", $"lang")
        .agg(count(lit(1)).as("n"),
          sum($"doc_id").as("sum_ids"),
          sum(length($"text")).as("sum_len"))
        .orderBy($"_op", $"lang")
    },
    "q127_bloom_lookup" -> { (s, d) =>
      import s.implicits._
      // Point lookups through the per-file key bloom (io/KeyBloom) on
      // a layout DELIBERATELY scattered by a non-key column
      // (repartition by text hash), where min/max file stats are
      // useless — every file spans the whole id range. The bloom
      // prunes the scan to the few files that can hold the probed
      // ids (plus the absent key 999999, which exercises pruning
      // without rows); blooms have no false negatives, so the result
      // must equal the plain IN-list scan the oracle runs. File-count
      // effectiveness and the driver/engine hash agreement are
      // spec-pinned (IoSpec).
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-bloom-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        documents(s, d).repartition(16, $"text")
          .write.mode("overwrite").parquet(dir)
        KeyBloom.buildKeyBloom(s, dir, "doc_id")
      }
      val keys = Seq(3L, 17L, 41L, 444L, 999999L)
      val (hits, _) = KeyBloom.lookupRead(s, dir, keys)
      hits.filter($"doc_id".isin(keys: _*))
        .select($"doc_id", $"lang",
          length($"text").cast("long").as("len"))
        .orderBy($"doc_id")
    },
    "q129_sidecar_refresh" -> { (s, d) =>
      import s.implicits._
      // The statistics-maintenance loop end to end: a lang-partitioned
      // corpus carries a min/max manifest AND a key bloom; one CDC
      // merge revises/inserts/deletes; both sidecars refresh
      // INCREMENTALLY (io/Sidecar: only touched-partition rows are
      // recomputed, the rest carry over byte-identical — spec-pinned
      // in IoSpec). The query then serves a range scan through the
      // manifest plus point lookups of the INSERTED ids through the
      // bloom — row-level output, so a stale sidecar (missed insert,
      // retired file, unrefreshed stats) cannot hash-match the
      // oracle's replay of the merged table.
      val dir = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-refresh-${Integer.toHexString(d.hashCode)}" +
        s"-${ProcessHandle.current().pid()}"
      buildOnce(dir) {
        documents(s, d).write.mode("overwrite")
          .partitionBy("lang").parquet(dir)
        Manifest.buildManifest(s, dir, Seq("doc_id"))
        KeyBloom.buildKeyBloom(s, dir, "doc_id")
        val docs = documents(s, d)
        val batch = docs
          .filter($"lang" === "fr" && $"doc_id" % 17 === 0)
          .withColumn("text", concat($"text", lit(" [v2]")))
          .withColumn("_del", lit(false))
          .unionByName(docs.filter($"doc_id" % 31 === 0)
            .withColumn("doc_id", $"doc_id" + 100000000L)
            .withColumn("lang", lit("xx"))
            .withColumn("_del", lit(false)))
          .unionByName(docs
            .filter($"lang" === "de" && $"doc_id" % 13 === 0)
            .withColumn("_del", lit(true)))
        val (stats, _) = MergeInto.mergeByKeyCdc(s, dir, batch,
          "doc_id", "lang", deleteWhen = Some($"_del"))
        Manifest.refreshManifest(s, dir, Seq("doc_id"), "lang",
          stats.touchedPartitions)
        KeyBloom.refreshKeyBloom(s, dir, "doc_id", "lang",
          stats.touchedPartitions)
      }
      val (ranged, _) = Manifest.prunedRead(s, dir,
        Seq(("doc_id", 0L, 300L)))
      val keys = Seq(100000000L, 100000031L)
      val (looked, _) = KeyBloom.lookupRead(s, dir, keys)
      ranged.filter($"doc_id".between(0, 300))
        .unionByName(looked.filter($"doc_id".isin(keys: _*)))
        .select($"doc_id", $"lang",
          length($"text").cast("long").as("len"))
        .orderBy($"doc_id")
    },
    "q103_length_quartiles" -> { (s, d) =>
      import s.implicits._
      // per-language token-length quartiles computed on the length
      // HISTOGRAM — the cumulative window runs over distinct lengths
      // per language, never over documents (q83's descent covers the
      // unbounded-value case; this is the bounded-cardinality tool).
      // Type-1 quantiles at dyadic q, integer-exact cross-engine.
      TextStats.perKeyQuantiles(documents(s, d), "lang",
          TextStats.wordCount($"text").cast("long"))
        .select($"key".as("lang"), $"n_docs", $"p25", $"p50", $"p75")
        .orderBy($"lang")
    },
    "q101_weighted_sample" -> { (s, d) =>
      import s.implicits._
      // Efraimidis-Spirakis A-Res weighted sampling WITHOUT
      // replacement: token-weighted top-100 by the portable-hash rank
      // key — long docs proportionally likelier, membership citable
      // from (seed, id, weight) alone. Row-local draw + TakeOrdered
      // cut; no global sort, no state.
      TextStats.weightedSample(documents(s, d), "doc_id",
          TextStats.wordCount($"text").cast("long"), k = 100, seed = 17L)
        .select($"id".as("doc_id"), $"w".as("toks"), $"key_8dp")
        .orderBy($"key_8dp".desc, $"doc_id")
    }
  )

  private val baseOracleSql: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "q31_jaccard_pairs" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) AS jaccard
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE a.doc_id % 10 = 0
           AND round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.3
         ORDER BY id_a, id_b""",
    "q32_minhash_lsh" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) AS jaccard
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.8
         ORDER BY id_a, id_b""",
    "q33_simhash" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(ws) - 2, 1) + 1),
             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS shs
           FROM w),
         u AS (SELECT doc_id, unnest(shs) AS s FROM sh),
         h AS (SELECT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS hv FROM u),
         bits AS (SELECT doc_id, b,
             sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM h, range(0, 60) t(b) GROUP BY 1, 2),
         fp AS (SELECT doc_id,
             sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS fp
           FROM bits GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 8
         ORDER BY id_a, id_b""",
    "q135_table_checksum" ->
      """SELECT lang, count(*) AS n_rows,
           CAST(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1) ||
             lang || chr(1) || coalesce('V' || text, 'N')),
             1, 15))::BIGINT) AS VARCHAR)
             AS checksum
         FROM documents GROUP BY lang ORDER BY lang""",
    "q134_declarative_hamming" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(ws) - 2, 1) + 1),
             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS shs
           FROM w),
         u AS (SELECT doc_id, unnest(shs) AS s FROM sh),
         h AS (SELECT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS hv FROM u),
         bits AS (SELECT doc_id, b,
             sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM h, range(0, 60) t(b) GROUP BY 1, 2),
         fp AS (SELECT doc_id,
             sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS fp
           FROM bits GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 8
         ORDER BY id_a, id_b""",
    "q51_ann_ivf" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b WHERE a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, neighbor_id""",
    "q52_cosine_neardup" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.vec, b.vec), 4) AS sim
         FROM v a, v b
         WHERE a.vec_id < b.vec_id
           AND list_cosine_similarity(a.vec, b.vec) >= 0.995
         ORDER BY id_a, id_b""",
    "q53_paragraph_dedup" ->
      """WITH sp AS (SELECT doc_id,
             string_split_regex(text, '\. ') AS ps FROM documents),
         paras AS (SELECT doc_id, unnest(ps) AS para,
             generate_subscripts(ps, 1) - 1 AS idx FROM sp),
         r AS (SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY para
               ORDER BY doc_id, idx) AS rn
           FROM paras)
         SELECT doc_id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
             ' ' ORDER BY idx), '') AS text,
           count(*) AS n_paragraphs,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    "q34_embedding_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
             FROM embeddings WHERE vec_id % 25 = 0),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv
             FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
             list_cosine_similarity(qv, cv) AS sim
           FROM q, c WHERE query_id != neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, rnk, neighbor_id FROM ranked
         WHERE rnk <= 10 ORDER BY query_id, rnk""",
    "q45_ann_lsh" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571
                    + vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE
                  * (1 + vec_id % 5)) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b WHERE a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, neighbor_id""",
    "q44_split_generator" ->
      """WITH f AS (
           SELECT doc_id, unnest(string_split(text, ' the ')) AS frag,
             generate_subscripts(string_split(text, ' the '), 1) AS i
           FROM documents),
         pos AS (
           SELECT doc_id, i - 1 AS idx, frag,
             CAST(coalesce(sum(length(frag) + 5) OVER (PARTITION BY doc_id
               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS INTEGER) AS begin
           FROM f)
         SELECT doc_id, CAST(idx AS INTEGER) AS idx, begin,
           CAST(begin + length(frag) AS INTEGER) AS "end"
         FROM pos ORDER BY doc_id, idx""",
    "q38_media_features" ->
      """SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
         round(list_sum(list_transform(string_split(text, ''),
           c -> ord(c)))::DOUBLE / length(text), 4) AS brightness
         FROM documents
         WHERE regexp_matches(text, '^[\x00-\x7F]*$')
         ORDER BY media_id""",
    "q47_arrow_stage" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars
         FROM documents ORDER BY doc_id""",
    "q50_repetition" ->
      """WITH g AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1]))) AS gram
           FROM documents),
         t AS (
           SELECT doc_id, CAST(max(c) AS INTEGER) AS top_bigram_count
           FROM (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
           GROUP BY doc_id)
         SELECT d.doc_id,
           CASE WHEN d.doc_id % 2 = 0 THEN 0.5 ELSE 0.0 END
             AS dup_line_frac,
           t.top_bigram_count
         FROM documents d JOIN t ON d.doc_id = t.doc_id
         ORDER BY d.doc_id""",
    "q39_subword_count" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[a-z]{1,6}|[0-9]{1,3}|[^a-z0-9 ]')) AS INTEGER) AS n_subwords,
         CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_words
         FROM documents ORDER BY doc_id""",
    "q36_langid" ->
      """SELECT lang,
         CASE WHEN list_contains(string_split(text, ' '), 'the')
           THEN 'en' ELSE 'und' END AS predicted, count(*) AS n
         FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""",
    "q37_fingerprint" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents
         GROUP BY array_to_string(string_split(text, ' '), ' ')
         ORDER BY keep_id""",
    "q43_fuzzy_match" ->
      """SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w = 'spark'))
           AS INTEGER) AS n_hits
         FROM documents ORDER BY doc_id""",
    "q42_batched_inference" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
         FROM documents ORDER BY doc_id""",
    "q54_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(ws) - 7, 1) + 1),
             i -> array_to_string(ws[i:i+7], ' ')))) AS gram
           FROM w),
         b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 = 0)
         SELECT g.doc_id, count(*) AS n_shared
         FROM g JOIN b USING (gram)
         WHERE g.doc_id % 5 != 0
         GROUP BY g.doc_id ORDER BY g.doc_id""",
    "q55_vocab_quality" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         cnt AS (SELECT word, count(*) AS c FROM w GROUP BY word),
         voc AS (SELECT word FROM cnt ORDER BY c DESC, word LIMIT 25)
         SELECT w.doc_id, count(*) AS n_words,
           round(sum(CASE WHEN voc.word IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS oov_ratio,
           round(sum(cnt.c)::DOUBLE / count(*), 4) AS mean_word_freq
         FROM w JOIN cnt USING (word) LEFT JOIN voc USING (word)
         GROUP BY w.doc_id ORDER BY w.doc_id""",
    "q56_redact_spans" ->
      """WITH r AS (SELECT doc_id,
             regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g')
               AS redacted,
             len(regexp_extract_all(text, '\bcustomer\b'))
               AS n_redactions,
             regexp_split_to_array(text, '\bcustomer\b') AS parts,
             length(text) AS tlen
           FROM documents)
         SELECT doc_id, redacted,
           CAST(n_redactions AS INTEGER) AS n_redactions,
           CAST(CASE WHEN n_redactions = 0 THEN -1
             ELSE tlen - length(parts[-1]) - length('customer')
               + (n_redactions - 1)
                 * (length('[REDACTED]') - length('customer'))
             END AS INTEGER) AS last_begin
         FROM r ORDER BY doc_id""",
    "q57_top_ngrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT unnest(CASE WHEN len(ws) < 2
             THEN [array_to_string(ws, ' ')]
             ELSE list_transform(range(1, len(ws)),
               i -> concat_ws(' ', ws[i], ws[i+1])) END) AS gram
           FROM w)
         SELECT gram, count(*) AS n FROM g GROUP BY gram
         ORDER BY n DESC, gram LIMIT 25""",
    "q58_semantic_dedup" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         pairs AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM v a, v b
           WHERE a.vec_id < b.vec_id
             AND list_cosine_similarity(a.vec, b.vec) >= 0.995),
         surv AS (SELECT vec_id FROM v
           WHERE vec_id NOT IN (SELECT id_b FROM pairs))
         SELECT s.vec_id,
           CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near
         FROM surv s LEFT JOIN
           (SELECT id_a, count(*) AS n_near FROM pairs GROUP BY id_a) n
           ON s.vec_id = n.id_a
         ORDER BY s.vec_id""",
    "q63_chunk_windows" ->
      """WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS n
           FROM documents),
         c AS (SELECT doc_id, n,
             unnest(range(0, greatest(n, 1), 30)) AS b
           FROM w)
         SELECT doc_id, CAST(b // 30 AS BIGINT) AS chunk_idx,
           CAST(b AS BIGINT) AS begin_word,
           CAST(least(b + 40, n) AS BIGINT) AS end_word
         FROM c ORDER BY doc_id, chunk_idx""",
    "q62_frame_sample" ->
      """WITH a AS (SELECT doc_id, text FROM documents
           WHERE regexp_matches(text, '^[\x00-\x7F]*$')),
         f AS (SELECT doc_id,
             unnest(range(0, greatest(length(text) // 16, 0), 2)) AS fidx
           FROM a)
         SELECT f.doc_id AS media_id, CAST(f.fidx AS INTEGER) AS frame_idx,
           round(list_sum(list_transform(
             string_split(substr(a.text, CAST(f.fidx AS INTEGER) * 16 + 1,
               16), ''), c -> ord(c)))::DOUBLE / 16, 4) AS brightness
         FROM f JOIN a ON f.doc_id = a.doc_id
         ORDER BY media_id, frame_idx""",
    "q61_repeated_runs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS idx,
             array_to_string(ws[i:i+14], ' ') AS gram
           FROM w, UNNEST(range(1, greatest(len(ws) - 14, 0) + 1)) AS t(i)),
         rep AS (SELECT gram FROM g GROUP BY gram
           HAVING count(DISTINCT doc_id) >= 2),
         hits AS (SELECT DISTINCT g.doc_id, g.idx
           FROM g JOIN rep USING (gram)),
         m AS (SELECT doc_id, idx,
             CASE WHEN lag(idx) OVER (PARTITION BY doc_id ORDER BY idx)
                 IS NULL
               OR idx > lag(idx) OVER (PARTITION BY doc_id ORDER BY idx)
                 + 15
               THEN 1 ELSE 0 END AS brk
           FROM hits),
         s AS (SELECT doc_id, idx, sum(brk) OVER (PARTITION BY doc_id
             ORDER BY idx ROWS UNBOUNDED PRECEDING) AS grp
           FROM m)
         SELECT doc_id, CAST(min(idx) AS BIGINT) AS begin_word,
           CAST(max(idx) + 15 AS BIGINT) AS end_word
         FROM s GROUP BY doc_id, grp
         ORDER BY doc_id, begin_word""",
    "q60_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ((doc_id % 2147483648) * 2654435761)
                 % 4294967296, doc_id)
               AS rnk,
             count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT doc_id, lang FROM r
         WHERE rnk <= CAST(ceil(n * 0.2) AS BIGINT)
         ORDER BY lang, doc_id""",
    "q83_length_deciles" ->
      """WITH t AS (SELECT doc_id,
             len(string_split(text, ' ')) AS n_words
           FROM documents)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(ntile(10) OVER (ORDER BY n_words, doc_id) AS INTEGER)
             AS bucket
         FROM t ORDER BY doc_id""",
    "q82_corpus_card" ->
      """WITH dup AS (
           SELECT sha256(text) AS h, count(*) AS n_copies
           FROM documents GROUP BY 1)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(avg(n_chars), 4) AS mean_chars
         FROM documents JOIN dup ON sha256(text) = h
         GROUP BY lang ORDER BY lang""",
    "q81_dsir_select" ->
      """WITH tcnt AS (
           SELECT word, count(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents WHERE doc_id % 5 = 0)
           GROUP BY word),
         tv AS (SELECT word, c FROM tcnt ORDER BY c DESC, word LIMIT 4096),
         tn AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM tv),
         scnt AS (
           SELECT word, count(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents WHERE doc_id % 5 <> 0)
           GROUP BY word),
         sv AS (SELECT word, c FROM scnt ORDER BY c DESC, word LIMIT 4096),
         sn AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM sv),
         toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents WHERE doc_id % 5 <> 0),
         scored AS (
           SELECT tk.doc_id, count(*) AS n_words,
                  sum(ln(coalesce(tv.c, 0) + 1) -
                      ln(coalesce(sv.c, 0) + 1)) AS s
           FROM toks tk
           LEFT JOIN tv USING (word)
           LEFT JOIN sv USING (word)
           GROUP BY tk.doc_id)
         SELECT doc_id, n_words,
                round(s + n_words *
                  (ln(sn.t + sn.v + 1) - ln(tn.t + tn.v + 1)), 4) AS llr
         FROM scored, tn, sn
         ORDER BY llr DESC, doc_id LIMIT 50""",
    "q80_source_cap" ->
      """WITH r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY ((doc_id % 2147483648) * 2654435761)
                 % 4294967296, doc_id)
               AS rnk
           FROM documents)
         SELECT doc_id, source FROM r
         WHERE rnk <= 15
         ORDER BY source, doc_id""",
    "q59_filter_pipeline" ->
      """WITH s AS (SELECT doc_id, lang, text,
             len(string_split(trim(text), ' ')) AS nw,
             round(len(list_filter(string_split(trim(text), ' '),
                 w -> w IN ('the', 'a')))::DOUBLE /
               len(string_split(trim(text), ' ')), 4) AS sr
           FROM documents),
         keep AS (SELECT min(doc_id) AS doc_id FROM documents
           GROUP BY text)
         SELECT s.doc_id, CAST(nw AS BIGINT) AS n_words,
           sr AS stopword_ratio
         FROM s JOIN keep USING (doc_id)
         WHERE lang = 'en' AND nw BETWEEN 40 AND 70 AND sr >= 0.02
         ORDER BY s.doc_id""",
    "q35_quality" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round(length(text)::DOUBLE / len(string_split(text, ' ')), 4)
           AS mean_word_len,
         round(len(list_filter(string_split(text, ' '),
             w -> w IN ('the', 'a')))::DOUBLE /
           len(string_split(text, ' ')), 4) AS stopword_ratio,
         round(len(list_distinct(string_split(text, ' ')))::DOUBLE /
           len(string_split(text, ' ')), 4) AS type_token_ratio
         FROM documents ORDER BY doc_id""",
    "q69_dedup_components" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.8),
         edges AS (
           SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
           WHERE e.v <> r.u),
         comp AS (
           SELECT u AS doc_id, least(u, min(v)) AS component
           FROM reach GROUP BY u),
         sizes AS (
           SELECT component, count(*) AS csize FROM comp GROUP BY 1)
         SELECT c.doc_id, c.component, s.csize
         FROM comp c JOIN sizes s USING (component)
         ORDER BY c.doc_id""",
    "q70_sequence_pack" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 32 AS shard,
             len(string_split_regex(trim(text), '\s+')) AS toks
           FROM documents),
         c AS (
           SELECT doc_id, shard, toks,
             CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id)
               AS BIGINT) AS tok_end
           FROM t),
         p AS (
           SELECT doc_id, shard, tok_end - toks AS tok_start, tok_end
           FROM c),
         x AS (
           SELECT doc_id, shard, tok_start, tok_end,
             unnest(range(tok_start // 512, (tok_end - 1) // 512 + 1))
               AS seq_id
           FROM p)
         SELECT shard, seq_id, doc_id,
           greatest(tok_start, seq_id * 512) - tok_start AS piece_start,
           least(tok_end, (seq_id + 1) * 512) - tok_start AS piece_end
         FROM x
         ORDER BY shard, seq_id, doc_id""",
    "q71_corpus_mixture" ->
      """WITH w(lang, weight_bp) AS (VALUES
           ('en', 13500), ('fr', 10000), ('zh', 7500),
           ('de', 5000), ('es', 2500)),
         k AS (
           SELECT doc_id, d.lang,
             CAST(weight_bp // 10000 AS BIGINT) +
               CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                 ::BIGINT % 10000 < weight_bp % 10000
               THEN 1 ELSE 0 END AS n_copies
           FROM documents d JOIN w USING (lang)),
         x AS (
           SELECT doc_id, lang, n_copies,
             unnest(range(1, n_copies + 1)) AS copy_idx
           FROM k WHERE n_copies >= 1)
         SELECT doc_id, lang, n_copies, copy_idx
         FROM x ORDER BY doc_id, copy_idx""",
    "q73_recipe_shuffle_pack" ->
      """WITH w(lang, weight_bp) AS (VALUES
           ('en', 13500), ('fr', 10000), ('zh', 7500),
           ('de', 5000), ('es', 2500)),
         k AS (
           SELECT doc_id, text,
             CAST(weight_bp // 10000 AS BIGINT) +
               CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                 ::BIGINT % 10000 < weight_bp % 10000
               THEN 1 ELSE 0 END AS n_copies
           FROM documents d JOIN w USING (lang)),
         m AS (
           SELECT doc_id, text,
             unnest(range(1, n_copies + 1)) AS copy_idx
           FROM k WHERE n_copies >= 1),
         t AS (
           SELECT doc_id * 8 + (copy_idx - 1) AS pack_id, text,
             ('0x' || substr(md5('42:' ||
               (doc_id * 8 + (copy_idx - 1))::VARCHAR), 1, 15))::BIGINT
               AS pos,
             len(string_split_regex(trim(text), '\s+')) AS toks
           FROM m),
         c AS (
           SELECT pack_id, pos, pos % 32 AS shard, toks,
             CAST(sum(toks) OVER (PARTITION BY pos % 32
               ORDER BY pos, pack_id) AS BIGINT) AS tok_end
           FROM t),
         p AS (
           SELECT pack_id, shard, tok_end - toks AS tok_start, tok_end
           FROM c),
         x AS (
           SELECT pack_id, shard, tok_start, tok_end,
             unnest(range(tok_start // 512, (tok_end - 1) // 512 + 1))
               AS seq_id
           FROM p)
         SELECT shard, seq_id, pack_id,
           greatest(tok_start, seq_id * 512) - tok_start AS piece_start,
           least(tok_end, (seq_id + 1) * 512) - tok_start AS piece_end
         FROM x
         ORDER BY shard, seq_id, pack_id""",
    "q79_lm_perplexity" ->
      """WITH cnt AS (
           SELECT word, count(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents WHERE doc_id % 5 = 0)
           GROUP BY word),
         vocab AS (SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT 4096),
         norm AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                         count(*) AS nv FROM vocab),
         toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents WHERE doc_id % 5 <> 0),
         scored AS (
           SELECT tk.doc_id, count(*) AS n_words,
                  sum(ln(coalesce(v.c, 0) + 1)) AS s
           FROM toks tk LEFT JOIN vocab v USING (word)
           GROUP BY tk.doc_id)
         SELECT doc_id, n_words,
                round(ln(t + nv + 1) - s / n_words, 4) AS xent
         FROM scored, norm
         WHERE round(ln(t + nv + 1) - s / n_words, 4) <= 3.45
         ORDER BY doc_id""",
    "q74_token_budget" ->
      """WITH b(lang, budget) AS (VALUES
           ('en', 6000), ('fr', 1500), ('zh', 10000000), ('de', 0)),
         t AS (
           SELECT lang, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS toks,
             ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT AS pos
           FROM documents),
         c AS (
           SELECT lang, doc_id, toks,
             CAST(sum(toks) OVER (PARTITION BY lang
               ORDER BY pos, doc_id) AS BIGINT) - toks AS cum_before
           FROM t)
         SELECT lang, doc_id, toks
         FROM c JOIN b USING (lang)
         WHERE cum_before < budget
         ORDER BY lang, doc_id""",
    "q75_temperature_mixture" ->
      """WITH n AS (
           SELECT lang,
             CAST(sum(len(string_split_regex(trim(text), '\s+')))
               AS BIGINT) AS ntok
           FROM documents GROUP BY lang),
         s AS (
           SELECT lang, ntok,
             CASE WHEN (f+1)*(f+1) <= ntok THEN f+1
                  WHEN f*f > ntok THEN f-1 ELSE f END AS sq
           FROM (SELECT lang, ntok,
             CAST(floor(sqrt(CAST(ntok AS DOUBLE))) AS BIGINT) AS f
             FROM n)),
         w AS (
           SELECT lang, CAST(least(
             (10000::HUGEINT * sq * (SELECT sum(ntok) FROM s)) //
               ((SELECT sum(sq) FROM s) * ntok),
             1000000::HUGEINT) AS BIGINT) AS weight_bp
           FROM s),
         k AS (
           SELECT d.doc_id, d.lang, w.weight_bp,
             weight_bp // 10000 +
               CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))
                 ::BIGINT % 10000 < weight_bp % 10000
               THEN 1 ELSE 0 END AS n_copies
           FROM documents d JOIN w USING (lang)),
         x AS (
           SELECT doc_id, lang, weight_bp, n_copies,
             unnest(range(1, n_copies + 1)) AS copy_idx
           FROM k WHERE n_copies >= 1)
         SELECT doc_id, lang, weight_bp, n_copies, copy_idx
         FROM x ORDER BY doc_id, copy_idx""",
    "q76_ivf_index_probe" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b WHERE a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, neighbor_id""",
    "q77_ann_pq" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b
           WHERE a.vec_id % 25 = 0 AND a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, rnk, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, rnk""",
    "q78_ann_ivfpq" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b WHERE a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, neighbor_id""",
    "q84_bloom_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(ws) - 7, 1) + 1),
             i -> array_to_string(ws[i:i+7], ' ')))) AS gram
           FROM w),
         b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 = 0),
         bad AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (gram)
           WHERE g.doc_id % 5 != 0)
         SELECT d.doc_id, d.lang FROM documents d
         WHERE d.doc_id % 5 != 0
           AND d.doc_id NOT IN (SELECT doc_id FROM bad)
         ORDER BY d.doc_id""",
    "q85_bm25" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws
           FROM documents),
         st AS (SELECT count(*)::DOUBLE AS n_docs,
             sum(len(ws))::DOUBLE AS sum_dl FROM t),
         tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf,
             any_value(dl) AS dl
           FROM (SELECT doc_id, len(ws) AS dl,
               unnest(list_filter(ws,
                 w -> w IN ('customer', 'merge', 'window'))) AS word
             FROM t)
           GROUP BY doc_id, word),
         dfx AS (SELECT word, count(*)::DOUBLE AS df FROM tf
           GROUP BY word),
         c AS (SELECT doc_id,
             CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * (1.2 + 1.0)) /
               (tf + 1.2 * ((1.0 - 0.75) +
                 0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)) *
               10000.0) AS BIGINT) AS bp
           FROM tf JOIN dfx USING (word), st)
         SELECT doc_id, CAST(sum(bp) AS BIGINT) AS score_bp
         FROM c GROUP BY doc_id
         ORDER BY score_bp DESC, doc_id LIMIT 25""",
    "q86_gopher_gate" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws,
             length(trim(text)) AS lc
           FROM documents),
         m AS (SELECT doc_id, len(ws) AS nw,
             round(lc::DOUBLE / greatest(len(ws), 1), 4) AS mean_len,
             len(list_filter(ws, w -> w IN
               ('the', 'a', 'of', 'to', 'in', 'and'))) AS nstop,
             round(len(list_filter(ws,
                 w -> regexp_matches(w, '[\pL]')))::DOUBLE /
               greatest(len(ws), 1), 4) AS alpha,
             round(len(list_distinct(ws))::DOUBLE /
               greatest(len(ws), 1), 4) AS ttr
           FROM t)
         SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
           nw BETWEEN 50 AND 100000 AS ok_words,
           mean_len BETWEEN 3.0 AND 10.0 AS ok_mean_len,
           nstop >= 2 AS ok_stopwords,
           alpha >= 0.8 AS ok_alpha,
           ttr >= 0.3 AS ok_ttr,
           (nw BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
             AND nstop >= 2 AND alpha >= 0.8 AND ttr >= 0.3 AS keep
         FROM m ORDER BY doc_id""",
    "q87_ann_sq8" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         mm AS (SELECT j, min(vec[j + 1]) AS mn, max(vec[j + 1]) AS mx
           FROM v, range(0, 16) t(j) GROUP BY j),
         c AS (SELECT vec_id, list(code ORDER BY j) AS code FROM (
             SELECT vec_id, j,
               CASE WHEN mx = mn THEN 0 ELSE
                 least(greatest(CAST(floor((vec[j + 1] - mn) * 255.0 /
                   (mx - mn) + 0.5) AS BIGINT), 0), 255) END AS code
             FROM v, range(0, 16) t(j) JOIN mm USING (j))
           GROUP BY vec_id),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 17),
               i -> a.code[i] * b.code[i])) AS sim
           FROM c a JOIN c b ON a.vec_id % 25 = 0
             AND a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, rnk, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, rnk""",
    // identical to q85 on purpose: the persisted-index probe must
    // reproduce the direct-scan BM25 bit-for-bit
    "q88_bm25_index_probe" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws
           FROM documents),
         st AS (SELECT count(*)::DOUBLE AS n_docs,
             sum(len(ws))::DOUBLE AS sum_dl FROM t),
         tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf,
             any_value(dl) AS dl
           FROM (SELECT doc_id, len(ws) AS dl,
               unnest(list_filter(ws,
                 w -> w IN ('customer', 'merge', 'window'))) AS word
             FROM t)
           GROUP BY doc_id, word),
         dfx AS (SELECT word, count(*)::DOUBLE AS df FROM tf
           GROUP BY word),
         c AS (SELECT doc_id,
             CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * (1.2 + 1.0)) /
               (tf + 1.2 * ((1.0 - 0.75) +
                 0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)) *
               10000.0) AS BIGINT) AS bp
           FROM tf JOIN dfx USING (word), st)
         SELECT doc_id, CAST(sum(bp) AS BIGINT) AS score_bp
         FROM c GROUP BY doc_id
         ORDER BY score_bp DESC, doc_id LIMIT 25""",
    "q89_assembly_recipe" ->
      """WITH RECURSIVE t0 AS (SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS ws,
             length(trim(text)) AS lc
           FROM documents),
         m AS (SELECT doc_id, text, len(ws) AS nw,
             round(lc::DOUBLE / greatest(len(ws), 1), 4) AS mean_len,
             len(list_filter(ws, w -> w IN
               ('the', 'a', 'of', 'to', 'in', 'and'))) AS nstop,
             round(len(list_filter(ws,
                 w -> regexp_matches(w, '[\pL]')))::DOUBLE /
               greatest(len(ws), 1), 4) AS alpha,
             round(len(list_distinct(ws))::DOUBLE /
               greatest(len(ws), 1), 4) AS ttr
           FROM t0),
         gated AS (SELECT doc_id, text FROM m
           WHERE nw BETWEEN 50 AND 100000
             AND mean_len BETWEEN 3.0 AND 10.0 AND nstop >= 2
             AND alpha >= 0.8 AND ttr >= 0.3),
         keepx AS (SELECT min(doc_id) AS doc_id FROM gated
           GROUP BY text),
         pool AS (SELECT g.doc_id, g.text FROM gated g
           JOIN keepx USING (doc_id)),
         sh AS (SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1],
               string_split(text, ' ')[i+2]))) AS sh
           FROM pool),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.8),
         edges AS (
           SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
           WHERE e.v <> r.u),
         comp AS (
           SELECT u AS doc_id, least(u, min(v)) AS component
           FROM reach GROUP BY u),
         reps AS (SELECT p.doc_id, p.text FROM pool p
           WHERE p.doc_id NOT IN
             (SELECT doc_id FROM comp WHERE component <> doc_id)),
         t AS (SELECT doc_id, text,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS toks,
             ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT AS pos
           FROM reps),
         c AS (SELECT doc_id, toks,
             CAST(sum(toks) OVER (ORDER BY pos, doc_id) AS BIGINT)
               - toks AS cum_before
           FROM t)
         SELECT doc_id, toks FROM c
         WHERE cum_before < 6000
         ORDER BY doc_id""",
    "q90_dataset_split" ->
      """SELECT doc_id,
           CASE WHEN ('0x' || substr(md5('99:' || doc_id::VARCHAR),
                 1, 15))::BIGINT % 10000 < 8000 THEN 'train'
                WHEN ('0x' || substr(md5('99:' || doc_id::VARCHAR),
                 1, 15))::BIGINT % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q91_leakage_split" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.8),
         edges AS (
           SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
           WHERE e.v <> r.u),
         comp AS (
           SELECT u AS doc_id, least(u, min(v)) AS component
           FROM reach GROUP BY u),
         r AS (SELECT d.doc_id,
             coalesce(c.component, d.doc_id) AS rep_id
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         SELECT doc_id, rep_id,
           CASE WHEN ('0x' || substr(md5('99:' || rep_id::VARCHAR),
                 1, 15))::BIGINT % 10000 < 8000 THEN 'train'
                WHEN ('0x' || substr(md5('99:' || rep_id::VARCHAR),
                 1, 15))::BIGINT % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM r ORDER BY doc_id""",
    "q92_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 11 != 0),
         v2 AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
               ELSE text END AS text
           FROM documents WHERE doc_id % 13 != 0),
         j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN v1.text != v2.text THEN 'changed'
                  ELSE 'unchanged' END AS status
           FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
         SELECT doc_id, status FROM j
         WHERE status != 'unchanged' ORDER BY doc_id""",
    "q93_fasttext_gate" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws,
             length(trim(text)) AS lc
           FROM documents),
         lab AS (SELECT doc_id,
             (len(ws) BETWEEN 50 AND 100000)
               AND (round(lc::DOUBLE / greatest(len(ws), 1), 4)
                 BETWEEN 3.0 AND 10.0)
               AND len(list_filter(ws, w -> w IN
                 ('the', 'a', 'of', 'to', 'in', 'and'))) >= 2
               AND round(len(list_filter(ws,
                   w -> regexp_matches(w, '[\pL]')))::DOUBLE /
                 greatest(len(ws), 1), 4) >= 0.8
               AND round(len(list_distinct(ws))::DOUBLE /
                 greatest(len(ws), 1), 4) >= 0.3 AS y,
             list_distinct(list_transform(ws,
               w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1024)) AS bs
           FROM t WHERE doc_id % 5 = 0),
         cls AS (SELECT
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS npos,
             CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nneg
           FROM lab),
         bw AS (SELECT bucket,
             CAST(round((ln((kb + 1) * (nneg + 2)) -
               ln((db + 1) * (npos + 2))) * 10000.0) AS BIGINT)
               AS weight_bp
           FROM (SELECT bucket,
               CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS kb,
               CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS db
             FROM (SELECT y, unnest(bs) AS bucket FROM lab)
             GROUP BY bucket), cls),
         pr AS (SELECT CAST(round((ln(npos + 1) - ln(nneg + 1)) * 10000.0)
             AS BIGINT) AS prior_bp FROM cls),
         pool AS (SELECT doc_id,
             unnest(list_distinct(list_transform(ws,
               w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1024)))
               AS bucket
           FROM t WHERE doc_id % 5 <> 0)
         SELECT p.doc_id,
           CAST(sum(coalesce(w.weight_bp, 0)) + pr.prior_bp AS BIGINT)
             AS score_bp,
           CAST(sum(coalesce(w.weight_bp, 0)) + pr.prior_bp AS BIGINT)
             >= 0 AS keep_pred
         FROM pool p LEFT JOIN bw w USING (bucket), pr
         GROUP BY p.doc_id, pr.prior_bp ORDER BY p.doc_id""",
    "q94_random_projection" ->
      """WITH sgn AS (SELECT j, k,
             CASE WHEN ('0x' || substr(md5('rp:' || j::VARCHAR || ':' ||
               k::VARCHAR), 1, 15))::BIGINT % 2 = 1
             THEN 1 ELSE -1 END AS s
           FROM range(0, 8) tj(j), range(0, 64) tk(k)),
         p AS (SELECT vec_id AS id, j,
             CAST(sum(s * CAST(round(CAST(embedding[k + 1] AS DOUBLE)
               * 1000000.0) AS BIGINT)) AS BIGINT) AS pj
           FROM embeddings, sgn GROUP BY vec_id, j),
         v AS (SELECT id, list(pj ORDER BY j) AS pv FROM p GROUP BY id),
         scored AS (SELECT a.id AS query_id, b.id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 9),
               i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i])))
               AS BIGINT) AS d2
           FROM v a JOIN v b ON a.id % 25 = 0 AND a.id <> b.id),
         ranked AS (SELECT query_id, neighbor_id, d2,
             row_number() OVER (PARTITION BY query_id
               ORDER BY d2, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, rnk, neighbor_id, d2 FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, rnk""",
    "q95_exact_substring" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws
           FROM documents),
         g AS (SELECT doc_id, p,
             ('0x' || substr(md5(array_to_string(
               list_slice(ws, p + 1, p + 8), ' ')), 1, 15))::BIGINT AS gh
           FROM (SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - 7, 0))) AS p FROM t)),
         dup AS (SELECT gh FROM g GROUP BY gh
           HAVING count(DISTINCT doc_id) >= 2),
         f AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (gh)),
         cov AS (SELECT doc_id,
             CAST(count(DISTINCT p) AS BIGINT) AS flagged_grams,
             CAST(count(DISTINCT pos) AS BIGINT) AS covered_tokens
           FROM (SELECT doc_id, p, unnest(range(p, p + 8)) AS pos FROM f)
           GROUP BY doc_id)
         SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
           coalesce(flagged_grams, 0) AS flagged_grams,
           coalesce(covered_tokens, 0) AS covered_tokens,
           round(1.0 - coalesce(covered_tokens, 0)::DOUBLE /
             greatest(len(ws), 1), 4) AS keep_ratio
         FROM t LEFT JOIN cov USING (doc_id) ORDER BY t.doc_id""",
    "q96_hll_distinct" -> s"""
         WITH toks AS (SELECT lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS word
           FROM documents),
         h AS (SELECT lang, word,
             ('0x' || substr(md5(word), 1, 15))::BIGINT AS gh FROM toks),
         r AS (SELECT lang, gh % 256 AS bucket,
             CASE WHEN gh // 256 = 0 THEN 53
               ELSE 53 - length(bin(gh // 256)) END AS rho
           FROM h),
         regs AS (SELECT lang, bucket, max(rho) AS rho FROM r
           GROUP BY lang, bucket),
         agg AS (SELECT lang,
             CAST(256 - count(*) AS BIGINT) AS zeros,
             CAST(sum(1::BIGINT << (53 - rho)) AS BIGINT) AS s_filled
           FROM regs GROUP BY lang),
         est AS (SELECT lang, zeros,
             CAST(s_filled + zeros * (1::BIGINT << 53) AS BIGINT) AS s
           FROM agg),
         ex AS (SELECT lang, CAST(count(DISTINCT word) AS BIGINT)
             AS exact_distinct FROM toks GROUP BY lang)
         SELECT est.lang, zeros, s,
           round(CASE WHEN zeros > 0 AND ${Sketches.hllNumLit} / s <= 640.0
             THEN 256.0 * ln(256.0 / zeros)
             ELSE ${Sketches.hllNumLit} / s END, 4) AS est_hll,
           exact_distinct
         FROM est JOIN ex USING (lang) ORDER BY est.lang""",
    "q97_cms_heavy_hitters" ->
      """WITH toks AS (SELECT
             unnest(string_split_regex(trim(text), '\s+')) AS word
           FROM documents),
         cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS ct FROM (
             SELECT r, ('0x' || substr(md5('cms:' || r::VARCHAR || ':' ||
               word), 1, 15))::BIGINT % 512 AS c
             FROM toks, range(0, 4) tr(r)) GROUP BY r, c),
         probes(word) AS (VALUES ('join'), ('hash'), ('customer'),
           ('window'), ('zzzqx')),
         pc AS (SELECT word, r,
             ('0x' || substr(md5('cms:' || r::VARCHAR || ':' || word),
               1, 15))::BIGINT % 512 AS c
           FROM probes, range(0, 4) tr(r)),
         est AS (SELECT word, CAST(min(coalesce(ct, 0)) AS BIGINT) AS est
           FROM pc LEFT JOIN cells USING (r, c) GROUP BY word),
         ex AS (SELECT word, CAST(count(*) AS BIGINT) AS exact FROM toks
           WHERE word IN ('join', 'hash', 'customer', 'window', 'zzzqx')
           GROUP BY word)
         SELECT e.word, e.est, coalesce(x.exact, 0) AS exact,
           e.est - coalesce(x.exact, 0) AS inflation
         FROM est e LEFT JOIN ex x USING (word) ORDER BY e.word""",
    "q98_containment_pairs" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents),
         j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) AS inter,
             len(a.sh) AS na, len(b.sh) AS nb
           FROM s a JOIN s b ON a.doc_id < b.doc_id),
         u AS (
           SELECT id_a AS id_in, id_b AS id_out,
             round(inter::DOUBLE / greatest(na, 1), 4) AS containment
           FROM j
           UNION ALL
           SELECT id_b, id_a, round(inter::DOUBLE / greatest(nb, 1), 4)
           FROM j)
         SELECT id_in, id_out, containment FROM u
         WHERE containment >= 0.8 ORDER BY id_in, id_out""",
    "q99_tfidf_keywords" ->
      """WITH st AS (SELECT count(*) AS n_docs FROM documents),
         t AS (SELECT doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS word
           FROM documents),
         tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY doc_id, word),
         df AS (SELECT word, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY word),
         scored AS (SELECT doc_id, word,
             CAST(round(tf * (ln(n_docs + 1) - ln(df + 1)) * 10000.0)
               AS BIGINT) AS score_bp
           FROM tf JOIN df USING (word), st),
         ranked AS (SELECT doc_id, word, score_bp,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_bp DESC, word) AS rnk
           FROM scored)
         SELECT doc_id, rnk, word, score_bp FROM ranked
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q100_corpus_profile" -> s"""
         WITH t AS (SELECT doc_id, lang,
             string_split_regex(trim(text), '\\s+') AS ws,
             length(trim(text)) AS lc
           FROM documents),
         gated AS (SELECT doc_id, lang, ws FROM t
           WHERE (len(ws) BETWEEN 50 AND 100000)
             AND (round(lc::DOUBLE / greatest(len(ws), 1), 4)
               BETWEEN 3.0 AND 10.0)
             AND len(list_filter(ws, w -> w IN
               ('the', 'a', 'of', 'to', 'in', 'and'))) >= 2
             AND round(len(list_filter(ws,
                 w -> regexp_matches(w, '[\\pL]')))::DOUBLE /
               greatest(len(ws), 1), 4) >= 0.8
             AND round(len(list_distinct(ws))::DOUBLE /
               greatest(len(ws), 1), 4) >= 0.3),
         g AS (SELECT doc_id, p,
             ('0x' || substr(md5(array_to_string(
               list_slice(ws, p + 1, p + 8), ' ')), 1, 15))::BIGINT AS gh
           FROM (SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - 7, 0))) AS p
             FROM gated)),
         dup AS (SELECT gh FROM g GROUP BY gh
           HAVING count(DISTINCT doc_id) >= 2),
         f AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (gh)),
         cov AS (SELECT doc_id,
             CAST(count(DISTINCT pos) AS BIGINT) AS covered
           FROM (SELECT doc_id, p, unnest(range(p, p + 8)) AS pos FROM f)
           GROUP BY doc_id),
         pool AS (SELECT gated.doc_id, lang, ws
           FROM gated LEFT JOIN cov USING (doc_id)
           WHERE round(1.0 - coalesce(covered, 0)::DOUBLE /
             greatest(len(ws), 1), 4) >= 0.7),
         toks AS (SELECT lang, unnest(ws) AS word FROM pool),
         h AS (SELECT lang, word,
             ('0x' || substr(md5(word), 1, 15))::BIGINT AS gh FROM toks),
         r AS (SELECT lang, gh % 256 AS bucket,
             CASE WHEN gh // 256 = 0 THEN 53
               ELSE 53 - length(bin(gh // 256)) END AS rho
           FROM h),
         regs AS (SELECT lang, bucket, max(rho) AS rho FROM r
           GROUP BY lang, bucket),
         agg AS (SELECT lang,
             CAST(256 - count(*) AS BIGINT) AS zeros,
             CAST(sum(1::BIGINT << (53 - rho)) AS BIGINT) AS s_filled
           FROM regs GROUP BY lang),
         hll AS (SELECT lang, zeros,
             CAST(s_filled + zeros * (1::BIGINT << 53) AS BIGINT) AS s
           FROM agg),
         est AS (SELECT lang,
             round(CASE WHEN zeros > 0 AND
               ${graft.text.Sketches.hllNumLit} / s <= 640.0
               THEN 256.0 * ln(256.0 / zeros)
               ELSE ${graft.text.Sketches.hllNumLit} / s END, 4)
               AS est_distinct
           FROM hll),
         ex AS (SELECT lang, CAST(count(DISTINCT word) AS BIGINT)
             AS exact_distinct FROM toks GROUP BY lang),
         card AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(ws)) AS BIGINT) AS n_tokens
           FROM pool GROUP BY lang)
         SELECT card.lang, n_docs, n_tokens, est_distinct, exact_distinct
         FROM card JOIN est USING (lang) JOIN ex USING (lang)
         ORDER BY card.lang""",
    "q102_neardup_index_probe" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> concat_ws(' ', string_split(text, ' ')[i],
               string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
             AS sh
           FROM documents)
         SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) AS jaccard
         FROM s a JOIN s b
           ON a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
         WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(a.sh || b.sh)), 4) >= 0.8
         ORDER BY new_id, corpus_id""",
    "q123_merge_upsert" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q124_cdc_incremental_stats" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q125_manifest_scan" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(sum(event_id) AS BIGINT) AS sum_ids
         FROM events
         WHERE user_id BETWEEN 3 AND 9
           AND CAST(round(value * 100) AS BIGINT) BETWEEN 1000 AND 20000
         GROUP BY event_type ORDER BY event_type""",
    "q137_graft_box_scan" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(sum(event_id) AS BIGINT) AS sum_ids
         FROM events
         WHERE user_id BETWEEN 3 AND 9
           AND CAST(round(value * 100) AS BIGINT) BETWEEN 1000 AND 20000
         GROUP BY event_type ORDER BY event_type""",
    "q138_graft_point_lookup" ->
      """SELECT event_id, user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM events
         WHERE event_id IN (5, 77, 424, 999999999)
         ORDER BY event_id""",
    "q140_recall_curve" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (SELECT vec_id, list_transform(range(0, 16), j ->
             ((vec_id // 8 * 1009 + j * j * 571 +
               vec_id // 8 * j * 37) % 2003 - 1001) * 16
             + ('0x' || substr(md5('nz:' || vec_id::VARCHAR || ':' ||
                 j::VARCHAR), 1, 15))::BIGINT % 1025 - 512) AS vec
           FROM embeddings, p WHERE vec_id < m),
         planes AS (SELECT b, pp, j,
             CASE WHEN ('0x' || substr(md5('pl:' || b::VARCHAR || ':' ||
                 pp::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT % 2
               = 1 THEN 1 ELSE -1 END AS s
           FROM range(0, 4) t1(b), range(0, 16) t2(pp),
             range(0, 16) t3(j)),
         comps AS (SELECT vec_id, j, vec[j + 1] AS c
           FROM v, range(0, 16) t(j)),
         dots AS (SELECT c.vec_id, pl.b, pl.pp, sum(pl.s * c.c) AS dot
           FROM comps c JOIN planes pl ON pl.j = c.j GROUP BY 1, 2, 3),
         sigs AS (SELECT vec_id, b,
             sum(CASE WHEN dot > 0 THEN 1::BIGINT << pp ELSE 0 END)
               AS sig
           FROM dots GROUP BY 1, 2),
         levels(bands) AS (VALUES (1), (2), (4)),
         cands AS (SELECT l.bands, q.vec_id AS query_id,
             s2.vec_id AS neighbor_id
           FROM levels l, sigs q JOIN sigs s2 ON q.b = s2.b
             AND q.sig = s2.sig AND q.vec_id != s2.vec_id
           WHERE q.vec_id % 25 = 0 AND q.b < l.bands
           GROUP BY 1, 2, 3),
         cd AS (SELECT c.bands, c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(range(1, 17), i ->
               (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i])))
               AS BIGINT) AS d2
           FROM cands c JOIN v a ON a.vec_id = c.query_id
             JOIN v b ON b.vec_id = c.neighbor_id),
         approx AS (SELECT bands, query_id, neighbor_id FROM (
             SELECT bands, query_id, neighbor_id, row_number() OVER (
               PARTITION BY bands, query_id ORDER BY d2, neighbor_id)
               AS rnk
             FROM cd) WHERE rnk <= 7),
         ed AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 17), i ->
               (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i])))
               AS BIGINT) AS d2
           FROM v a JOIN v b ON a.vec_id % 25 = 0
             AND a.vec_id != b.vec_id),
         exact AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY d2, neighbor_id) AS rnk
             FROM ed) WHERE rnk <= 7),
         hits AS (SELECT a.bands, count(*) AS h FROM approx a
           JOIN exact e ON a.query_id = e.query_id
             AND a.neighbor_id = e.neighbor_id GROUP BY 1),
         nq AS (SELECT count(*) AS n FROM v WHERE vec_id % 25 = 0)
         SELECT CAST(l.bands AS INTEGER) AS bands,
           CAST(nq.n AS BIGINT) AS n_queries,
           CAST(coalesce(h.h, 0) AS BIGINT) AS n_hits,
           CAST((coalesce(h.h, 0) * 10000) // (nq.n * 7) AS BIGINT)
             AS recall_bp
         FROM levels l CROSS JOIN nq
         LEFT JOIN hits h ON h.bands = l.bands
         ORDER BY bands""",
    "q139_dv_point_delete" ->
      """SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM documents
         WHERE NOT ((lang = 'de' AND doc_id % 13 = 0)
                 OR (lang = 'fr' AND doc_id % 29 = 0))
         GROUP BY lang ORDER BY lang""",
    "q147_versioned_dv" ->
      """SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM documents
         WHERE NOT ((lang = 'de' AND doc_id % 13 = 0)
                 OR (lang = 'fr' AND doc_id % 29 = 0))
         GROUP BY lang ORDER BY lang""",
    "q126_time_travel" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM documents GROUP BY lang ORDER BY lang""",
    "q149_replace_partition" ->
      """SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM (
           SELECT doc_id, lang, text FROM documents
           WHERE lang NOT IN ('fr', 'de')
           UNION ALL
           SELECT doc_id, lang, text || ' [rw]' FROM documents
           WHERE lang = 'fr' AND doc_id % 3 = 0)
         GROUP BY lang ORDER BY lang""",
    "q150_shallow_clone" ->
      """SELECT * FROM (
           SELECT 'source' AS side, lang, count(*) AS n_rows,
             CAST(sum(length(text)) AS BIGINT) AS sum_len,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids
           FROM documents GROUP BY lang
           UNION ALL
           SELECT 'clone', lang, count(*),
             CAST(sum(length(text)) AS BIGINT),
             CAST(sum(doc_id) AS BIGINT)
           FROM (
             SELECT doc_id, lang, text || ' [c2]' AS text
             FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
             UNION ALL
             SELECT doc_id, lang, text FROM documents
             WHERE NOT (lang = 'fr' AND doc_id % 17 = 0)
               AND NOT (lang = 'de' AND doc_id % 13 = 0))
           GROUP BY lang)
         ORDER BY side, lang""",
    "q143_table_history" ->
      """WITH fr AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr'),
         de AS (SELECT count(*) AS c FROM documents WHERE lang = 'de'),
         del AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr' AND doc_id % 7 = 0)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT)
               AS parent, 'init' AS action, CAST(fr.c AS BIGINT)
               AS n_rows FROM fr
           UNION ALL
           SELECT 2, 1, 'append', CAST(fr.c + de.c AS BIGINT)
           FROM fr, de
           UNION ALL
           SELECT 3, 2, 'merge', CAST(fr.c + de.c - del.c AS BIGINT)
           FROM fr, de, del)
         ORDER BY version""",
    "q148_history_sql" ->
      """WITH fr AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr'),
         de AS (SELECT count(*) AS c FROM documents WHERE lang = 'de'),
         del AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr' AND doc_id % 7 = 0)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT)
               AS parent, 'init' AS action, CAST(fr.c AS BIGINT)
               AS n_rows FROM fr
           UNION ALL
           SELECT 2, 1, 'append', CAST(fr.c + de.c AS BIGINT)
           FROM fr, de
           UNION ALL
           SELECT 3, 2, 'merge', CAST(fr.c + de.c - del.c AS BIGINT)
           FROM fr, de, del)
         ORDER BY version""",
    "q144_version_tail" ->
      """WITH fr AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr'),
         de AS (SELECT count(*) AS c FROM documents WHERE lang = 'de'),
         del AS (SELECT count(*) AS c FROM documents
             WHERE lang = 'fr' AND doc_id % 7 = 0)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT)
               AS parent, 'init' AS action, CAST(fr.c AS BIGINT)
               AS n_added_rows FROM fr
           UNION ALL
           SELECT 2, 1, 'append', CAST(de.c AS BIGINT) FROM de
           UNION ALL
           SELECT 3, 2, 'merge', CAST(fr.c - del.c AS BIGINT)
           FROM fr, del)
         ORDER BY version""",
    "q142_graft_write_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM documents GROUP BY lang ORDER BY lang""",
    "q141_versioned_compact" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q136_versioned_merge" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q151_schema_evolution" ->
      """WITH allrows AS (
           SELECT doc_id, lang, CAST(NULL AS BIGINT) AS marker
           FROM documents
           UNION ALL
           SELECT doc_id + 200000000, lang,
             (doc_id + 200000000) % 7 AS marker
           FROM documents WHERE doc_id % 5 = 0)
         SELECT lang, count(*) AS n_rows,
           count(marker) AS n_flagged,
           CAST(sum(marker) AS BIGINT) AS sum_flag,
           CAST(0 AS BIGINT) AS n_fresh
         FROM allrows GROUP BY lang ORDER BY lang""",
    "q152_stats_skipping" ->
      """WITH cuts AS (SELECT max(doc_id) AS m FROM documents)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM documents, cuts
         WHERE doc_id > m // 2 AND doc_id <= (3 * m) // 4
         GROUP BY lang ORDER BY lang""",
    "q153_sql_dml" ->
      """WITH survivors AS (
           SELECT doc_id, lang,
             CASE WHEN lang = 'fr' AND doc_id % 2 = 0
               THEN text || ' [u]' ELSE text END AS text
           FROM documents WHERE NOT (length(text) < 80))
         SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_id
         FROM survivors GROUP BY lang ORDER BY lang""",
    "q154_merge_mirror" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND d.lang <> 'de'
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q155_dml_mor" ->
      """WITH live AS (
           SELECT doc_id, lang, text FROM documents
           WHERE NOT ((lang = 'de' AND doc_id % 13 = 0)
                   OR (lang = 'fr' AND doc_id % 29 = 0))),
         survivors AS (
           SELECT doc_id, lang,
             CASE WHEN lang = 'fr' AND doc_id % 2 = 0
               THEN text || ' [u]' ELSE text END AS text
           FROM live WHERE NOT (length(text) < 80))
         SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_id
         FROM survivors GROUP BY lang ORDER BY lang""",
    "q156_type_widening" ->
      """WITH allrows AS (
           SELECT doc_id, lang,
             CAST(length(text) % 1000 AS BIGINT) AS score
           FROM documents
           UNION ALL
           SELECT doc_id + 300000000, lang,
             CAST(length(text) AS BIGINT) + 3000000000 AS score
           FROM documents WHERE doc_id % 7 = 0)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(score) AS BIGINT) AS sum_score,
           CAST(max(score) AS BIGINT) AS max_score,
           CAST(sum(CASE WHEN score > 2000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_wide
         FROM allrows GROUP BY lang ORDER BY lang""",
    "q157_cdc_rename_replay" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS body, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         finalstate AS (
           SELECT d.doc_id, d.text AS body, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, body, lang FROM upd
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(body)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM finalstate GROUP BY lang ORDER BY lang""",
    "q158_merge_schema_evolution" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang,
             doc_id % 5 AS rev
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0),
         ins AS (
           SELECT doc_id + 100000000 AS doc_id, text, 'xx' AS lang,
             (doc_id + 100000000) % 5 AS rev
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         finalstate AS (
           SELECT d.doc_id, d.text, d.lang,
             CAST(NULL AS BIGINT) AS rev
           FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang, rev FROM upd
           UNION ALL SELECT doc_id, text, lang, rev FROM ins)
         SELECT lang, count(*) AS n_rows, count(rev) AS n_rev,
           CAST(sum(rev) AS BIGINT) AS sum_rev,
           CAST(sum(length(text)) AS BIGINT) AS sum_len
         FROM finalstate GROUP BY lang ORDER BY lang""",
    "q159_nested_rename_replay" ->
      """WITH upd AS (
           SELECT doc_id, n_chars + 1000 AS chars, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0),
         finalstate AS (
           SELECT d.doc_id, d.n_chars AS chars, d.lang
           FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, chars, lang FROM upd
           UNION ALL
           SELECT doc_id + 100000000, n_chars, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM finalstate GROUP BY lang ORDER BY lang""",
    "q160_merge_widen" ->
      """WITH upd AS (
           SELECT doc_id, n_chars + 1000 AS score,
             CAST(CAST(n_chars * 7 AS DECIMAL(14,4)) +
                  CAST(0.1234 AS DECIMAL(14,4)) AS DECIMAL(14,4))
               AS price, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0),
         finalstate AS (
           SELECT d.doc_id, d.n_chars % 100 AS score,
             CAST(CAST(d.n_chars % 1000 AS DECIMAL(10,2))
               AS DECIMAL(14,4)) AS price, d.lang
           FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, score, price, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(score) AS BIGINT) AS sum_score,
           CAST(sum(price) AS VARCHAR) AS sum_price
         FROM finalstate GROUP BY lang ORDER BY lang""",
    "q146_cdc_replay" ->
      """WITH finalstate AS (
           SELECT doc_id, text || ' [rw]' AS text, 'fr' AS lang
           FROM documents WHERE lang = 'fr' AND doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, text, lang FROM documents
           WHERE lang = 'de' AND doc_id % 13 <> 0
           UNION ALL
           SELECT doc_id, text, lang FROM documents
           WHERE lang NOT IN ('fr', 'de')
             AND NOT (lang = 'en' AND doc_id % 19 = 0)
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM finalstate GROUP BY lang ORDER BY lang""",
    "q145_catalog_sql" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT lang, count(*) AS n_rows,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM merged GROUP BY lang ORDER BY lang""",
    "q132_knn_classify" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (SELECT vec_id, list_transform(range(0, 16), j ->
             ((vec_id // 8 * 1009 + j * j * 571 +
               vec_id // 8 * j * 37) % 2003 - 1001) * 16
             + ('0x' || substr(md5('nz:' || vec_id::VARCHAR || ':' ||
                 j::VARCHAR), 1, 15))::BIGINT % 1025 - 512) AS vec
           FROM embeddings, p WHERE vec_id < m),
         ed AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 17), i ->
               (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i])))
               AS BIGINT) AS d2
           FROM v a JOIN v b ON a.vec_id % 25 = 0
             AND a.vec_id != b.vec_id),
         exact AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY d2, neighbor_id) AS rnk
             FROM ed) WHERE rnk <= 7),
         votes AS (SELECT e.query_id,
             CAST(emb.label AS BIGINT) AS label, count(*) AS n
           FROM exact e JOIN embeddings emb
             ON emb.vec_id = e.neighbor_id
           GROUP BY 1, 2),
         best AS (SELECT query_id, label, n FROM (
             SELECT query_id, label, n, row_number() OVER (
               PARTITION BY query_id ORDER BY n DESC, label) AS r
             FROM votes) WHERE r = 1)
         SELECT b.query_id, b.label AS pred_label,
           CAST(b.n AS BIGINT) AS votes,
           CAST(emq.label AS BIGINT) AS true_label,
           CAST(CASE WHEN b.label = CAST(emq.label AS BIGINT)
             THEN 1 ELSE 0 END AS BIGINT) AS correct
         FROM best b JOIN embeddings emq ON emq.vec_id = b.query_id
         ORDER BY query_id""",
    "q131_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws
           FROM documents),
         st AS (SELECT count(*)::DOUBLE AS n_docs,
             sum(len(ws))::DOUBLE AS sum_dl FROM t),
         tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf,
             any_value(dl) AS dl
           FROM (SELECT doc_id, len(ws) AS dl,
               unnest(list_filter(ws,
                 w -> w IN ('customer', 'merge', 'window'))) AS word
             FROM t)
           GROUP BY doc_id, word),
         dfx AS (SELECT word, count(*)::DOUBLE AS df FROM tf
           GROUP BY word),
         bm AS (SELECT doc_id, CAST(sum(bp) AS BIGINT) AS score_bp
           FROM (SELECT doc_id,
               CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
                 (tf * (1.2 + 1.0)) /
                 (tf + 1.2 * ((1.0 - 0.75) +
                   0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)) *
                 10000.0) AS BIGINT) AS bp
             FROM tf JOIN dfx USING (word), st)
           GROUP BY doc_id),
         ra AS (SELECT doc_id,
             1000000 // (60 + row_number() OVER
               (ORDER BY score_bp DESC, doc_id)) AS fa
           FROM bm ORDER BY score_bp DESC, doc_id LIMIT 25),
         occ AS (SELECT doc_id,
             CAST(len(list_filter(ws, w -> w IN
               ('stream', 'merge', 'sort', 'query', 'group', 'hash')))
               AS BIGINT) AS occ
           FROM t),
         rb AS (SELECT doc_id,
             1000000 // (60 + row_number() OVER
               (ORDER BY occ DESC, doc_id)) AS fb
           FROM occ ORDER BY occ DESC, doc_id LIMIT 25)
         SELECT doc_id,
           CAST(coalesce(fa, 0) + coalesce(fb, 0) AS BIGINT) AS rrf
         FROM ra FULL OUTER JOIN rb USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "q130_change_audit" ->
      """WITH feed AS (
           SELECT 'update_pre' AS _op, lang, doc_id,
             length(text) AS len
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT 'update_post', lang, doc_id, length(text) + 5
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT 'insert', 'xx', doc_id + 100000000, length(text)
           FROM documents WHERE doc_id % 31 = 0
           UNION ALL
           SELECT 'delete', lang, doc_id, length(text)
           FROM documents WHERE lang = 'de' AND doc_id % 13 = 0)
         SELECT _op, lang, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           CAST(sum(len) AS BIGINT) AS sum_len
         FROM feed GROUP BY _op, lang ORDER BY _op, lang""",
    "q127_bloom_lookup" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len
         FROM documents
         WHERE doc_id IN (3, 17, 41, 444, 999999)
         ORDER BY doc_id""",
    "q129_sidecar_refresh" ->
      """WITH upd AS (
           SELECT doc_id, text || ' [v2]' AS text, lang
           FROM documents WHERE lang = 'fr' AND doc_id % 17 = 0
           UNION ALL
           SELECT doc_id + 100000000, text, 'xx' AS lang
           FROM documents WHERE doc_id % 31 = 0),
         del AS (
           SELECT doc_id FROM documents
           WHERE lang = 'de' AND doc_id % 13 = 0),
         merged AS (
           SELECT d.doc_id, d.text, d.lang FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM upd u
                             WHERE u.doc_id = d.doc_id)
             AND NOT EXISTS (SELECT 1 FROM del x
                             WHERE x.doc_id = d.doc_id)
           UNION ALL SELECT doc_id, text, lang FROM upd)
         SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len
         FROM merged
         WHERE doc_id BETWEEN 0 AND 300
            OR doc_id IN (100000000, 100000031)
         ORDER BY doc_id""",
    "q103_length_quartiles" ->
      """WITH t AS (SELECT lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS v
           FROM documents),
         h AS (SELECT lang, v, count(*) AS ct FROM t GROUP BY lang, v),
         c AS (SELECT lang, v, ct,
             sum(ct) OVER (PARTITION BY lang ORDER BY v) AS cum,
             sum(ct) OVER (PARTITION BY lang) AS n
           FROM h)
         SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(min(CASE WHEN cum >= ceil(0.25 * n) THEN v END)
             AS BIGINT) AS p25,
           CAST(min(CASE WHEN cum >= ceil(0.50 * n) THEN v END)
             AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum >= ceil(0.75 * n) THEN v END)
             AS BIGINT) AS p75
         FROM c GROUP BY lang ORDER BY lang""",
    "q64_lsh_observability" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 256
           UNION ALL
           SELECT 1000000 + r AS doc_id, trim(repeat(
             'subscribe to our newsletter for weekly updates and offers ',
             24)) AS text
           FROM range(0, 50) t(r)),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
         sh AS (SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(ws) - 2, 1) + 1),
             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS shs
           FROM w),
         u AS (SELECT doc_id, unnest(shs) AS g FROM sh),
         b AS (SELECT doc_id, band,
             min(('0x' || substr(md5(band::VARCHAR || '|' || g), 1, 15))
               ::BIGINT) AS sigval
           FROM u, range(0, 8) t(band) GROUP BY 1, 2),
         cnt AS (SELECT band, sigval, count(*) AS n FROM b GROUP BY 1, 2),
         dropped AS (SELECT count(*) AS dropped_buckets FROM cnt
           WHERE n > 32),
         kept AS (SELECT band, sigval FROM cnt WHERE n <= 32),
         cb AS (SELECT b.doc_id, b.band, b.sigval FROM b
           JOIN kept USING (band, sigval)),
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cb a JOIN cb c ON a.band = c.band
             AND a.sigval = c.sigval AND a.doc_id < c.doc_id),
         kp AS (SELECT count(*) AS kept_pairs FROM pairs)
         SELECT dropped_buckets, kept_pairs FROM dropped, kp""",
    "q106_media_neardup" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           WHERE regexp_matches(text, '^[\x00-\x7F]*$')
             AND length(text) >= 60
           UNION ALL
           SELECT 2000000 AS doc_id, trim(repeat(
             'the quick brown fox jumps over the lazy dog again and again ',
             3)) AS text
           UNION ALL
           SELECT 2000001 AS doc_id, replace(trim(repeat(
             'the quick brown fox jumps over the lazy dog again and again ',
             3)), 'lazy', 'LAZY') AS text),
         dd AS (SELECT doc_id, text, length(text) AS n FROM corpus),
         u0 AS (SELECT doc_id, text, n, unnest(range(1, n + 1)) AS i
           FROM dd),
         u AS (SELECT doc_id, n, i,
             ord(substr(text, CAST(i AS INTEGER), 1)) AS v,
             CAST((i - 1) * 60 // n AS INTEGER) AS b
           FROM u0),
         bsum AS (SELECT doc_id, b, sum(v) AS s, count(*) AS c
           FROM u GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(v) AS ts, max(n) AS n
           FROM u GROUP BY 1),
         fp AS (SELECT t.doc_id,
             sum(CASE WHEN b.s * t.n > t.ts * b.c
               THEN 1::BIGINT << b.b ELSE 0 END) AS fp
           FROM bsum b JOIN tot t USING (doc_id) GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 8
         ORDER BY id_a, id_b""",
    "q112_embedding_covariance" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
           FROM embeddings),
         e AS (SELECT vec_id, generate_subscripts(qv, 1) - 1 AS i,
             unnest(qv) AS qi
           FROM q),
         p AS (SELECT a.i AS i, b.i AS j, a.qi * b.qi AS p
           FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i),
         sums AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS sp
           FROM p GROUP BY 1, 2),
         marg AS (SELECT i AS k, CAST(sum(qi) AS BIGINT) AS s
           FROM e GROUP BY 1),
         nn AS (SELECT count(*) AS n FROM embeddings)
         SELECT sums.i AS i, sums.j AS j,
           CAST(sp * n - si.s * sj.s AS BIGINT) AS cov_num
         FROM sums, nn
         JOIN marg si ON si.k = sums.i
         JOIN marg sj ON sj.k = sums.j
         ORDER BY i, j""",
    "q111_embedding_dispersion" ->
      """WITH q AS (SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
               AS BIGINT) AS qc
           FROM embeddings),
         comp AS (SELECT label, pos, CAST(sum(qc) AS BIGINT) AS sv,
             CAST(sum(qc * qc) AS BIGINT) AS sq
           FROM q GROUP BY 1, 2),
         pl AS (SELECT label, CAST(sum(sq) AS BIGINT) AS ssq,
             CAST(sum(sv * sv) AS BIGINT) AS svsq
           FROM comp GROUP BY 1),
         c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
         SELECT pl.label AS label, c.n AS n,
           CAST(ssq * n - svsq AS BIGINT) AS dispersion_num
         FROM pl JOIN c ON pl.label = c.label
         ORDER BY label""",
    "q110_scene_changes" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
           WHERE regexp_matches(text, '^[\x00-\x7F]*$')),
         dd AS (SELECT doc_id, text, length(text) // 16 AS nf
           FROM corpus),
         u AS (SELECT doc_id, text, nf, unnest(range(0, nf * 16)) AS i
           FROM dd),
         v AS (SELECT doc_id, nf, i // 16 AS f,
             ord(substr(text, CAST(i + 1 AS INTEGER), 1)) AS b
           FROM u),
         fs AS (SELECT doc_id, nf, f, sum(b) AS s FROM v GROUP BY 1, 2, 3),
         d AS (SELECT doc_id, nf, f,
             abs(s - lag(s) OVER (PARTITION BY doc_id ORDER BY f)) AS diff
           FROM fs)
         SELECT doc_id AS media_id, CAST(max(nf) AS INTEGER) AS n_frames,
           CAST(count(CASE WHEN diff > 4 * 16 THEN 1 END) AS INTEGER)
             AS n_changes
         FROM d GROUP BY doc_id
         UNION ALL
         SELECT doc_id AS media_id, 0 AS n_frames, 0 AS n_changes
         FROM corpus WHERE length(text) < 16
         ORDER BY media_id""",
    "q107_line_gate" ->
      """WITH sp AS (SELECT doc_id,
             string_split(text, ' the ') AS ls FROM documents),
         lines AS (SELECT doc_id, unnest(ls) AS line,
             generate_subscripts(ls, 1) - 1 AS idx FROM sp),
         g AS (SELECT doc_id, idx, line,
             (length(string_split(line, ' ')) >= 4
              AND line NOT LIKE '%slow%') AS kept
           FROM lines)
         SELECT doc_id, count(*) AS n_lines,
           count(CASE WHEN kept THEN 1 END) AS n_kept,
           count(CASE WHEN kept THEN 1 END) >= 3 AS doc_kept,
           coalesce(string_agg(CASE WHEN kept THEN line END,
             ' ' ORDER BY idx), '') AS text_clean
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    "q104_ann_recall" ->
      """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (SELECT vec_id, list_transform(range(0, 16), j ->
             ((vec_id // 8 * 1009 + j * j * 571 +
               vec_id // 8 * j * 37) % 2003 - 1001) * 16
             + ('0x' || substr(md5('nz:' || vec_id::VARCHAR || ':' ||
                 j::VARCHAR), 1, 15))::BIGINT % 1025 - 512) AS vec
           FROM embeddings, p WHERE vec_id < m),
         planes AS (SELECT b, pp, j,
             CASE WHEN ('0x' || substr(md5('pl:' || b::VARCHAR || ':' ||
                 pp::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT % 2
               = 1 THEN 1 ELSE -1 END AS s
           FROM range(0, 2) t1(b), range(0, 16) t2(pp),
             range(0, 16) t3(j)),
         comps AS (SELECT vec_id, j, vec[j + 1] AS c
           FROM v, range(0, 16) t(j)),
         dots AS (SELECT c.vec_id, pl.b, pl.pp, sum(pl.s * c.c) AS dot
           FROM comps c JOIN planes pl ON pl.j = c.j GROUP BY 1, 2, 3),
         sigs AS (SELECT vec_id, b,
             sum(CASE WHEN dot > 0 THEN 1::BIGINT << pp ELSE 0 END)
               AS sig
           FROM dots GROUP BY 1, 2),
         cands AS (SELECT DISTINCT q.vec_id AS query_id,
             s2.vec_id AS neighbor_id
           FROM sigs q JOIN sigs s2 ON q.b = s2.b AND q.sig = s2.sig
             AND q.vec_id != s2.vec_id
           WHERE q.vec_id % 25 = 0),
         cd AS (SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(range(1, 17), i ->
               (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i])))
               AS BIGINT) AS d2
           FROM cands c JOIN v a ON a.vec_id = c.query_id
             JOIN v b ON b.vec_id = c.neighbor_id),
         approx AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY d2, neighbor_id) AS rnk
             FROM cd) WHERE rnk <= 7),
         ed AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 17), i ->
               (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i])))
               AS BIGINT) AS d2
           FROM v a JOIN v b ON a.vec_id % 25 = 0
             AND a.vec_id != b.vec_id),
         exact AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY d2, neighbor_id) AS rnk
             FROM ed) WHERE rnk <= 7),
         hits AS (SELECT a.query_id, count(*) AS h FROM approx a
           JOIN exact e ON a.query_id = e.query_id
             AND a.neighbor_id = e.neighbor_id GROUP BY 1)
         SELECT q.vec_id AS query_id,
           CAST(coalesce(h.h, 0) AS INTEGER) AS n_hits
         FROM (SELECT vec_id FROM v WHERE vec_id % 25 = 0) q
         LEFT JOIN hits h ON h.query_id = q.vec_id
         ORDER BY query_id""",
    "q101_weighted_sample" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS toks,
             ('0x' || substr(md5('17:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT AS h
           FROM documents)
         SELECT doc_id, toks,
           round(ln((h + 1) / 1152921504606846976.0) /
             toks, 8) AS key_8dp
         FROM t
         WHERE toks > 0
         ORDER BY key_8dp DESC, doc_id
         LIMIT 100"""
  )

  /** The probe-only twins share their build+probe forms' oracles: the
    * served result must be identical whichever rep built the index.
    */
  // the q51/q76 exact-brute-force oracle restricted to the %25 query
  // sample the serving probes use (q76p float IVF, q105p IVF+PQ — both
  // exact on this corpus, so one ground truth serves both)
  private val sampledExactTop7Sql: String =
    """WITH p AS (SELECT (count(*) // 8) * 8 AS m FROM embeddings),
         v AS (
           SELECT vec_id, list_transform(range(0, 16),
             j -> ((vec_id // 8 * 1009 + j * j * 571 +
                    vec_id // 8 * j * 37) % 2003 - 1001)::DOUBLE) AS vec
           FROM embeddings, p WHERE vec_id < m),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.vec, b.vec) AS sim
           FROM v a, v b
           WHERE a.vec_id % 25 = 0 AND a.vec_id != b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rnk
           FROM scored)
         SELECT query_id, neighbor_id FROM ranked
         WHERE rnk <= 7 ORDER BY query_id, neighbor_id"""

  val oracleSql: Map[String, String] = baseOracleSql ++ Map(
    "q76p_ivf_probe" -> sampledExactTop7Sql,
    "q88p_bm25_probe" -> baseOracleSql("q88_bm25_index_probe"),
    "q102p_neardup_probe" -> baseOracleSql("q102_neardup_index_probe"),
    // q105: lossless encoding on this corpus -> the persisted-index
    // probe must reproduce q78's exact brute-force top-7
    "q105_pq_index_probe" -> baseOracleSql("q78_ann_ivfpq"),
    "q105p_pq_probe" -> sampledExactTop7Sql)
}
