package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ExactSubstring
import graft.similarity.RandomProjection
import graft.text.{QualityClassifier, Sketches, TextStats}

/** Round-10 layer: hashed linear quality classifier, JL sign-projection
  * sketch, cross-doc exact-substring coverage, HLL / CMS sketches.
  */
class SketchOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs =
    relational.Tables.documents(spark, sf).cache()

  // ------------------------------------------------- quality classifier

  test("classifier fit replays hand-computed Bernoulli NB log-odds") {
    // two keep docs containing word 'good', one drop doc with 'bad':
    // bucket(good): kb=2, db=0; bucket(bad): kb=0, db=1; nPos=2, nNeg=1
    val ref = Seq(("good", true), ("good", true), ("bad", false))
      .toDF("text", "y")
    val (weights, priorBp) = QualityClassifier.fit(ref, "text", "y", 64)
    val w = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(word: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 64
    }
    val expGood = math.round(
      (math.log((2 + 1) * (1 + 2).toDouble) -
        math.log((0 + 1) * (2 + 2).toDouble)) * 10000.0)
    val expBad = math.round(
      (math.log((0 + 1) * (1 + 2).toDouble) -
        math.log((1 + 1) * (2 + 2).toDouble)) * 10000.0)
    assert(w(bucket("good")) === expGood)
    assert(w(bucket("bad")) === expBad)
    assert(priorBp ===
      math.round((math.log(3.0) - math.log(2.0)) * 10000.0))
  }

  private def md5Bucket64(word: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(word.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % nBuckets
  }

  test("classifier scoring: unseen buckets contribute zero, sum is exact") {
    val ref = Seq(("good", true), ("bad", false)).toDF("text", "y")
    val (weights, priorBp) = QualityClassifier.fit(ref, "text", "y", 64)
    val scored = QualityClassifier.score(
      Seq((1L, "good bad"), (2L, "unseen words only")).toDF("id", "text"),
      "id", "text", weights, priorBp, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expectations computed through the SAME bucket map, so hash
    // collisions between test words can never break the arithmetic
    def expected(text: String): Long =
      text.split(" ").map(md5Bucket64(_, 64)).distinct
        .map(b => w.getOrElse(b, 0L)).sum + priorBp
    assert(scored(1L) === expected("good bad"))
    assert(scored(2L) === expected("unseen words only"))
  }

  test("classifier separates classes when the vocabulary carries signal") {
    // the synthetic sf corpus has ONE shared vocabulary (even the lang
    // tag is decorative), so no bag-of-words label is learnable there —
    // like the LSH-recall spec, this builds the regime the operator is
    // FOR: two classes with distinct vocabularies (quality prose vs
    // keyboard-mash spam), fit on half, predict the held-out half
    val goodWords = Seq("insight", "method", "result", "careful",
      "measure", "evidence", "context", "detail")
    val spamWords = Seq("zzz", "xxx", "qqq", "kkk", "www", "jjj",
      "vvv", "ppp")
    val rng = new scala.util.Random(17)
    val rows = (0 until 200).map { i =>
      val good = i % 2 == 0
      val vocab = if (good) goodWords else spamWords
      val text = Seq.fill(12)(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
      (i.toLong, text, good)
    }
    val df = rows.toDF("id", "text", "y")
    val (weights, priorBp) = QualityClassifier.fit(
      df.filter($"id" < 100), "text", "y", 1024)
    val holdout = df.filter($"id" >= 100)
    val pred = QualityClassifier.score(holdout, "id", "text",
      weights, priorBp, 1024)
    val agree = pred.join(holdout.select($"id", $"y"), "id")
      .filter($"keep_pred" === $"y").count()
    val n = holdout.count()
    assert(agree.toDouble / n >= 0.95,
      s"separable-vocab accuracy ${agree.toDouble / n}")
  }

  // --------------------------------------------------- random projection

  test("JL projection replays a hand-computed sign sum") {
    val vec = Seq((1L, Seq(0.5f, -0.25f, 1.0f, 0.0f))).toDF("id", "vec")
    val p = vec.select(
      RandomProjection.project($"vec", dIn = 4, dOut = 2).as("p"))
      .head().getSeq[Long](0)
    def sgn(j: Int, k: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rp:$j:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1L
      else -1L
    }
    val q = Seq(500000L, -250000L, 1000000L, 0L)
    val expected = (0 until 2).map(j =>
      (0 until 4).map(k => sgn(j, k) * q(k)).sum)
    assert(p === expected)
  }

  test("sketch top-k: identical vectors land at distance zero, rank 1") {
    // ids 0 and 1 share a vector; id 0 is a probe (0 % 25 == 0)
    val base = (0 until 60).map { i =>
      val src = if (i == 1) 0 else i
      (i.toLong, (0 until 16).map(k =>
        ((src * 31 + k * 7) % 11 - 5).toFloat))
    }.toDF("id", "vec")
    val top = RandomProjection.sketchTopK(base, col("id") % 25 === 0,
        dIn = 16, dOut = 8, k = 3)
      .filter($"query_id" === 0L && $"rnk" === 1).head()
    assert(top.getAs[Long]("neighbor_id") === 1L)
    assert(top.getAs[Long]("d2") === 0L)
  }

  // ----------------------------------------------------- exact substring

  test("exact-substring coverage flags a planted cross-doc 10-token run") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta"),
      (2L, s"one two three $shared four five six seven eight"),
      (3L, "nothing shared here at all beyond short words"))
      .toDF("doc_id", "text")
    val out = ExactSubstring.flaggedCoverage(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    // a 10-token shared run yields 10 - 8 + 1 = 3 shared grams covering
    // exactly the 10 run tokens (no other 8-gram repeats cross-doc)
    assert(out(1L) === ((3L, 10L)))
    assert(out(2L) === ((3L, 10L)))
    assert(out(3L) === ((0L, 0L)))
  }

  test("exact-substring: docs shorter than the gram width produce no grams") {
    val out = ExactSubstring.flaggedCoverage(
      Seq((1L, "too short"), (2L, "too short")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  // ------------------------------------------------------------ sketches

  test("HLL estimate lands within 15% of a 5000-distinct truth") {
    // m=256 -> expected standard error ~1.04/sqrt(256) = 6.5%; the
    // fixed md5 hash makes this ONE deterministic draw, so the bound is
    // ~2.3 sigma, not a flaky tail (this item set lands at +11%)
    val items = spark.range(5000L).select(lit("k").as("key"),
      concat(lit("item-"), $"id").as("v"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(items, "key", "v"))
      .head().getAs[Double]("est")
    assert(math.abs(est - 5000.0) / 5000.0 <= 0.15, s"estimate $est")
  }

  test("HLL registers merge associatively across shards (max)") {
    val a = spark.range(0L, 3000L).select(lit("k").as("key"),
      concat(lit("item-"), $"id").as("v"))
    val b = spark.range(2000L, 5000L).select(lit("k").as("key"),
      concat(lit("item-"), $"id").as("v"))
    val whole = Sketches.hllRegisters(a.union(b), "key", "v")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val merged = Sketches.hllRegisters(a, "key", "v")
      .union(Sketches.hllRegisters(b, "key", "v"))
      .groupBy("key", "bucket").agg(max($"rho").as("rho"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged === whole)
  }

  test("CMS is one-sided: estimate >= exact for every corpus word") {
    val toks = docs.select(
      explode(split(trim($"text"), "\\s+")).as("word"))
    val regs = Sketches.cmsRegisters(toks, "word")
    // register mass conservation: each of the 4 rows holds every token
    val total = toks.count()
    val perRow = regs.groupBy("r").agg(sum($"ct").as("s"))
      .collect().map(_.getLong(1))
    assert(perRow.length === 4 && perRow.forall(_ === total))
    val words = toks.distinct().limit(50).as[String].collect().toSeq
    val est = Sketches.cmsQuery(regs, words)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.filter($"word".isin(words: _*))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(est(w) >= exact(w), s"CMS underestimated '$w'")
    }
  }

  test("CMS registers merge associatively across shards (sum)") {
    val a = docs.filter($"doc_id" % 2 === 0)
      .select(explode(split(trim($"text"), "\\s+")).as("word"))
    val b = docs.filter($"doc_id" % 2 =!= 0)
      .select(explode(split(trim($"text"), "\\s+")).as("word"))
    val whole = Sketches.cmsRegisters(a.union(b), "word")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = Sketches.cmsRegisters(a, "word")
      .union(Sketches.cmsRegisters(b, "word"))
      .groupBy("r", "c").agg(sum($"ct").as("ct"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged === whole)
  }

  test("persisted sketch registers: append is indistinguishable from fresh") {
    // the Bm25.appendToIndex maintenance pattern for sketches: write
    // half the corpus, append the other half, compare bit-for-bit with
    // a fresh single-pass build over the union
    def toks(half: org.apache.spark.sql.DataFrame) =
      half.select($"lang", explode(split(trim($"text"), "\\s+")).as("word"))
    val a = toks(docs.filter($"doc_id" % 2 === 0))
    val b = toks(docs.filter($"doc_id" % 2 =!= 0))
    val dirH = java.nio.file.Files
      .createTempDirectory("graft-hll").toString
    Sketches.writeHllRegisters(a, "lang", "word", dirH)
    Sketches.appendHllRegisters(b, "lang", "word", dirH)
    val appendedH = spark.read.parquet(dirH)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val freshH = Sketches.hllRegisters(a.union(b), "lang", "word")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(appendedH === freshH)
    val dirC = java.nio.file.Files
      .createTempDirectory("graft-cms").toString
    Sketches.writeCmsRegisters(a, "word", dirC)
    Sketches.appendCmsRegisters(b, "word", dirC)
    val appendedC = spark.read.parquet(dirC)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toSet
    val freshC = Sketches.cmsRegisters(a.union(b), "word")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toSet
    assert(appendedC === freshC)
  }

  test("persisted corpus profile: append is indistinguishable from fresh") {
    // the operational datasheet: write half the corpus, append the
    // other half, and the published view must equal a fresh build over
    // the union — counts/sums add, registers max-merge, so shard
    // arrival order cannot drift the datasheet
    import graft.text.CorpusProfile
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val dirInc = java.nio.file.Files
      .createTempDirectory("graft-profile-inc").toString
    val dirFresh = java.nio.file.Files
      .createTempDirectory("graft-profile-fresh").toString
    CorpusProfile.write(a, "lang", "text", dirInc)
    CorpusProfile.append(b, "lang", "text", dirInc)
    CorpusProfile.write(a.union(b), "lang", "text", dirFresh)
    def view(dir: String) = CorpusProfile.read(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val inc = view(dirInc)
    val fresh = view(dirFresh)
    assert(inc === fresh)
    assert(inc.nonEmpty && inc.values.forall(_._1 > 0))
  }

  test("parquet compaction: fewer files, identical rows, no-op when tight") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/docs.parquet"
    docs.repartition(40).write.mode("overwrite").parquet(dir)
    val before = docs.collect().map(_.toString).sorted.toSeq
    val (nBefore, nAfter, bytes) =
      graft.io.Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(nBefore >= 40 && nAfter < 5 && bytes > 0,
      s"expected a real compaction, got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // already compact -> untouched (same file count back)
    val (b2, a2, _) =
      graft.io.Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(b2 === nAfter && a2 === nAfter)
    // hive-partitioned layout -> loud refusal, never a silent no-op
    // (a plain read+rewrite would fold partition columns into data)
    val pdir = java.nio.file.Files
      .createTempDirectory("graft-compact-part").toString + "/t.parquet"
    docs.write.partitionBy("lang").parquet(pdir)
    intercept[UnsupportedOperationException] {
      graft.io.Compact.compactParquet(spark, pdir, targetBytes = 1L << 30)
    }
  }

  test("near-dup index: probe equals the direct scan; append equals fresh") {
    import graft.dedup.Dedup
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val delta = docs.filter($"doc_id" % 7 === 0)
    // ground truth: brute-force cross-slice verified Jaccard
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes($"text", 3).as("hs"))
    val direct = sh.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("new_id"), $"hs".as("ha"))
      .crossJoin(sh.filter($"doc_id" % 7 =!= 0)
        .select($"doc_id".as("corpus_id"), $"hs".as("hb")))
      .withColumn("j", round(Dedup.jaccard($"ha", $"hb"), 4))
      .filter($"j" >= 0.8)
      .select($"new_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct.nonEmpty, "expected cross-slice near-dup pairs")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ndix").toString
    Dedup.buildNearDupIndex(corpus, "doc_id", "text", dir)
    def probe(d: String) =
      Dedup.probeNearDupIndex(spark, d, delta, "doc_id", "text", 0.8)
        .select("new_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(dir) === direct)
    // incremental build: half the corpus up front, half appended later —
    // a probe afterwards must be indistinguishable from the fresh build
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-ndix-inc").toString
    Dedup.buildNearDupIndex(corpus.filter($"doc_id" % 2 === 0),
      "doc_id", "text", dir2)
    Dedup.appendToNearDupIndex(corpus.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text", dir2)
    assert(probe(dir2) === direct)
  }

  // ------------------------------------------- containment / tf-idf

  test("containment catches a doc INSIDE another that Jaccard misses") {
    val inner = (1 to 12).map(i => s"w$i").mkString(" ")
    val outer = inner + " " + (13 to 60).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, inner), (2L, outer),
      (3L, "completely different words here nothing shared at all"))
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.containmentPairs(
        corpus, "doc_id", "text", n = 3, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1-in-2 is total containment; 2-in-1 is far below threshold
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    // and symmetric Jaccard on the same pair sits under ANY usable
    // near-dup threshold — the blind spot this operator exists for
    val sh = corpus.select($"doc_id",
      graft.dedup.Dedup.shingleHashes($"text", 3).as("hs"))
    val j = sh.filter($"doc_id" === 1L).select($"hs".as("a"))
      .crossJoin(sh.filter($"doc_id" === 2L).select($"hs".as("b")))
      .select(graft.dedup.Dedup.jaccard($"a", $"b")).head().getDouble(0)
    assert(j < 0.3, s"jaccard $j should miss the contained pair")
  }

  test("containment pairs equal the brute-force computation on the corpus") {
    val brute = {
      val sh = docs.select($"doc_id",
        graft.dedup.Dedup.shingleHashes($"text", 3).as("hs"))
      val a = sh.select($"doc_id".as("id_in"), $"hs".as("sh_in"))
      val b = sh.select($"doc_id".as("id_out"), $"hs".as("sh_out"))
      a.crossJoin(b).filter($"id_in" =!= $"id_out")
        .select($"id_in", $"id_out",
          round(size(array_intersect($"sh_in", $"sh_out")).cast("double") /
            greatest(size($"sh_in"), lit(1)), 4).as("c"))
        .filter($"c" >= 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    }
    val got = graft.dedup.Dedup.containmentPairs(
        docs, "doc_id", "text", n = 3, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(brute.nonEmpty, "corpus should contain containment pairs")
    assert(got === brute)
  }

  test("containment prefix filter equals brute force on randomized corpora") {
    // fuzz the prefix-length math (incl. the rounding-relaxed
    // threshold): random corpora with heavy planted overlap — excerpt
    // docs (true containment), concatenations, and background noise —
    // across three thresholds; the prefix path must reproduce the
    // brute force exactly every time
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val vocab = (0 until 40).map(i => s"w${trial}_$i")
      def sentence(n: Int) =
        Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val bases = (0 until 12).map(i => (i.toLong, sentence(12 + rng.nextInt(30))))
      val excerpts = bases.take(4).zipWithIndex.map { case ((_, t), i) =>
        val ws = t.split(" ")
        val from = rng.nextInt(math.max(ws.length - 8, 1))
        (100L + i, ws.slice(from, from + 8 + rng.nextInt(6)).mkString(" "))
      }
      val concats = bases.sliding(2, 3).zipWithIndex.map { case (pair, i) =>
        (200L + i, pair.map(_._2).mkString(" "))
      }.toSeq
      val corpus = (bases ++ excerpts ++ concats).toDF("doc_id", "text")
      val sh = corpus.select($"doc_id",
        graft.dedup.Dedup.shingleHashes($"text", 3).as("hs"))
      for (t <- Seq(0.5, 0.8, 0.9)) {
        val brute = sh.select($"doc_id".as("id_in"), $"hs".as("a"))
          .crossJoin(sh.select($"doc_id".as("id_out"), $"hs".as("b")))
          .filter($"id_in" =!= $"id_out")
          .select($"id_in", $"id_out",
            round(size(array_intersect($"a", $"b")).cast("double") /
              greatest(size($"a"), lit(1)), 4).as("c"))
          .filter($"c" >= t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = graft.dedup.Dedup.containmentPairs(
            corpus, "doc_id", "text", n = 3, minContainment = t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === brute, s"trial $trial threshold $t")
      }
    }
  }

  test("containment maxDf cap drops boilerplate shingles and says so") {
    // every doc shares one boilerplate trigram; with maxDf = 2 that
    // shingle is dropped from candidate generation and counted
    val corpus = (0 until 6).map(i =>
      (i.toLong, s"common shared prefix unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("droppedShingles")
    val got = graft.dedup.Dedup.containmentPairs(corpus, "doc_id",
      "text", n = 3, minContainment = 0.9, maxDf = 2,
      droppedShingles = Some(acc))
    assert(got.count() === 0L)
    // EXACT count: one boilerplate shingle type was dropped — the cap
    // filter must run once per shingle type, not once per consuming
    // branch (the kept frame is checkpointed for precisely this)
    assert(acc.value === 1L,
      s"dropped-shingle count inflated or missing: ${acc.value}")
  }

  test("tf-idf keywords replay hand arithmetic, rank ties on word") {
    // 3 docs; 'rare' appears twice in doc 1 only; 'shared' in all docs
    val corpus = Seq((1L, "rare rare shared"), (2L, "shared other"),
      (3L, "shared more things")).toDF("doc_id", "text")
    val got = TextStats.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getString(2), r.getLong(3)))).toMap
    def bp(tf: Long, df: Long): Long =
      math.round(tf.toDouble * (math.log(4.0) - math.log(df + 1.0)) *
        10000.0)
    assert(got((1L, 1)) === (("rare", bp(2, 1))))
    assert(got((1L, 2)) === (("shared", bp(1, 3))))
    // doc 2: 'other' (df=1) outranks 'shared' (df=3)
    assert(got((2L, 1))._1 === "other")
  }

  test("per-key histogram quantiles equal the sorted type-1 definition") {
    // hand example: values 1..4 in one key -> p25=1 (pos ceil(.25*4)=1),
    // p50=2, p75=3; plus randomized agreement with the brute-force
    // sorted computation across keys with ties
    val hand = TextStats.perKeyQuantiles(
        Seq(("k", 3L), ("k", 1L), ("k", 4L), ("k", 2L)).toDF("g", "v"),
        "g", $"v")
      .head()
    assert((hand.getLong(1), hand.getLong(2), hand.getLong(3),
      hand.getLong(4)) === ((4L, 1L, 2L, 3L)))
    val rng = new scala.util.Random(31)
    val rows = (0 until 400).map(i =>
      (s"g${i % 3}", (rng.nextInt(12) + 1).toLong))
    val got = TextStats.perKeyQuantiles(rows.toDF("g", "v"), "g", $"v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def q(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      assert(got(g) === ((n.toLong, q(0.25), q(0.5), q(0.75))), g)
    }
  }

  test("weighted sample replays the A-Res rank bit-for-bit") {
    val k = 20
    val got = TextStats.weightedSample(docs, "doc_id",
        TextStats.wordCount($"text").cast("long"), k, seed = 5L)
      .collect().map(_.getLong(0)).toSeq
    val brute = docs.select($"doc_id",
        TextStats.wordCount($"text").cast("long").as("w"))
      .collect().filter(_.getLong(1) > 0).map { r =>
        val id = r.getLong(0)
        val w = r.getLong(1)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"5:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val key = BigDecimal(
          math.log((h + 1).toDouble / math.pow(2, 60)) / w)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, key)
      }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSeq
    assert(got === brute)
    // and a different seed draws a different sample (same sizes)
    val other = TextStats.weightedSample(docs, "doc_id",
        TextStats.wordCount($"text").cast("long"), k, seed = 6L)
      .collect().map(_.getLong(0)).toSeq
    assert(other.length === k)
    assert(other !== got)
  }

  test("weighted sample never draws zero- or negative-weight rows") {
    // Efraimidis-Spirakis: w = 0 items must have draw probability 0 —
    // they are filtered before the draw, not clamped to weight 1
    val wdocs = Seq((1L, 5L), (2L, 0L), (3L, -3L), (4L, 7L), (5L, 1L))
      .toDF("doc_id", "w")
    val ids = TextStats.weightedSample(wdocs, "doc_id", $"w", k = 5,
        seed = 11L)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 5L))
  }

  test("q99 window is document-partitioned; q101 cut is a TakeOrdered") {
    val p99 = TextStats.tfidfKeywords(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(p99.contains("Window"), "rank window expected")
    // per-partition group-limit before the window = the rank runs
    // partitioned by document; a global sort would print `Sort [...],
    // true` (the only legitimate SinglePartition exchange is the
    // one-row corpus-count aggregate)
    assert(p99.contains("WindowGroupLimit"), "expected group-limit rank")
    assert(!p99.contains(", true, 0"), "unexpected global sort")
    val p101 = TextStats.weightedSample(docs, "doc_id",
        TextStats.wordCount(col("text")).cast("long"), 100, 17L)
      .queryExecution.executedPlan.toString
    assert(p101.contains("TakeOrderedAndProject"),
      "weighted-sample cut must be a TakeOrdered, not a global sort")
  }

  test("round-10 scan-fused operators stay Window/global-Sort free") {
    // q93 scoring and q96/q97 register builds must never plan an
    // un-partitioned Window or a global Sort — their 100-TB claim
    val stop = Seq("the", "a", "of", "to", "in", "and")
    val plans = Seq(
      QualityClassifier.distillGopherGate(docs, "doc_id", "text",
        col("doc_id") % 5 === 0, stop),
      Sketches.hllEstimate(Sketches.hllRegisters(
        docs.select($"lang", explode(split(trim($"text"), "\\s+"))
          .as("word")), "lang", "word")),
      Sketches.cmsRegisters(
        docs.select(explode(split(trim($"text"), "\\s+")).as("word")),
        "word"))
    plans.foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), "unexpected Window in plan")
      assert(!p.contains("Sort [") || p.contains("SortAggregate"),
        "unexpected global sort in plan")
    }
  }
}
