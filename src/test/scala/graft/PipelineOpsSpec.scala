package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, SimHash}
import graft.multimodal.Multimodal
import graft.similarity.Ann
import graft.text.TextStats

class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs =
    relational.Tables.documents(spark, sf).cache()

  test("minhash LSH finds every exact-Jaccard near-dup pair (recall=1 here)") {
    val exact = {
      val sh = docs.select($"doc_id",
        Dedup.shingleHashes($"text", 3).as("hs"))
      val a = sh.select($"doc_id".as("id_a"), $"hs".as("hs_a"))
      val b = sh.select($"doc_id".as("id_b"), $"hs".as("hs_b"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .filter(Dedup.jaccard($"hs_a", $"hs_b") >= 0.8)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val lsh = Dedup.minHashNearDuplicates(docs, "doc_id", "text",
      threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh === exact)
  }

  test("simhash near-dups cover the high-Jaccard planted pairs") {
    val exact = Dedup.minHashNearDuplicates(docs, "doc_id", "text",
      threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = SimHash.nearDuplicates(docs, "doc_id", "text", radius = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(sim.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"simhash recall $recall on ${exact.size} pairs")
  }

  test("LSH maxBucket cap surfaces the dropped-bucket count") {
    // 30 identical docs: every band bucket holds all 30, so a cap of 10
    // drops every bucket — pairs vanish AND the accumulator says so
    // (the "no silent caps" rule).
    val sigs = (0 until 30).map(i => (i.toLong, "same same same text"))
      .toDF("doc_id", "text")
      .select($"doc_id".as("id"),
        Dedup.minHashSignatureFromText($"text", 3, 16).as("sig"))
    val acc = spark.sparkContext.longAccumulator("droppedBuckets")
    val pairs = Dedup.lshCandidatePairs(sigs, "id", bands = 4,
      sigLength = 16, maxBucket = 10, droppedBuckets = Some(acc))
    assert(pairs.count() === 0L)
    assert(acc.value === 4L, "one dropped bucket per band")
    // and without the cap triggering, nothing is counted
    val acc2 = spark.sparkContext.longAccumulator("droppedBuckets2")
    val pairs2 = Dedup.lshCandidatePairs(sigs, "id", bands = 4,
      sigLength = 16, maxBucket = 1000, droppedBuckets = Some(acc2))
    assert(pairs2.count() === (30L * 29 / 2))
    assert(acc2.value === 0L)
  }

  test("q64 observability reports a nonzero drop on planted boilerplate") {
    val out = relational.PipelineQueries
      .queries("q64_lsh_observability")(spark, sf).collect()
    assert(out.length === 1)
    val row = out.head
    // the 50-copy boilerplate cluster floods all 8 band buckets past
    // the cap of 32 — at minimum one dropped bucket per band
    assert(row.getAs[Long]("dropped_buckets") >= 8L,
      s"dropped=${row.getAs[Long]("dropped_buckets")}")
    assert(row.getAs[Long]("kept_pairs") >= 0L)
    // bounded-shape contract (the probe's perf target is met BY DESIGN,
    // not by a ms budget — see the q64 cost-floor note in
    // PipelineQueries): the corpus side must stay a pushed-down
    // deterministic O(1) sample, so the probe's cost cannot grow with
    // the corpus. Assert the pushdown is really in the scan.
    val sampled = relational.Tables.documents(spark, sf)
      .filter($"doc_id" < 256)
    val scan = sampled.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("doc_id"),
      s"sample filter not pushed to the parquet scan:\n$scan")
  }

  test("q104 ANN recall is sub-unity and above the declared floor") {
    // the POINT of the noisy corpus: recall must be a genuine quantity
    // (some query misses a true neighbor), not total-by-construction —
    // and still above the floor the operator declares (0.85)
    val rows = relational.PipelineQueries
      .queries("q104_ann_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hits = rows.map(_.getAs[Int]("n_hits"))
    assert(hits.forall(h => h >= 0 && h <= 7))
    val recall = hits.sum.toDouble / (7.0 * hits.length)
    assert(recall >= 0.85, f"recall $recall%.3f below declared floor")
    assert(recall < 1.0,
      "recall is total — the noisy corpus no longer exercises misses")
  }

  test("q140 recall curve is monotone in bands and holds per-level " +
      "floors — the accuracy/latency dial is a measured function") {
    val rows = relational.PipelineQueries
      .queries("q140_recall_curve")(spark, sf).collect()
      .map(r => r.getAs[Int]("bands") -> r.getAs[Long]("recall_bp"))
      .toMap
    assert(rows.keySet === Set(1, 2, 4))
    // more bands = more candidate probes = recall can only grow
    assert(rows(1) <= rows(2) && rows(2) <= rows(4),
      s"recall not monotone in bands: $rows")
    // floors: one band already beats a coin flip by far; the declared
    // q104 operating point (2 bands, 0.85) sits on this curve; 4
    // bands is near-exhaustive on the noisy corpus
    assert(rows(1) >= 5000L, s"1-band recall ${rows(1)}bp < 0.50")
    assert(rows(2) >= 8500L, s"2-band recall ${rows(2)}bp < 0.85")
    assert(rows(4) >= 9000L, s"4-band recall ${rows(4)}bp < 0.90")
    assert(rows(4) <= 10000L)
  }

  test("recallCurve equals per-level recallAtK bit-for-bit — the " +
      "shared signature table and shared exact baseline change nothing") {
    import graft.similarity.PortableLsh
    val vecs = relational.PipelineQueries.noisyVecs(spark, sf)
    val curve = PortableLsh.recallCurve(vecs, col("id") % 25 === 0,
        dIn = 16, bandLevels = Seq(1, 2, 4), rBits = 16, k = 7)
      .collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Long]("query_id")) ->
        r.getAs[Int]("n_hits")).toMap
    Seq(1, 2, 4).foreach { b =>
      val single = PortableLsh.recallAtK(vecs, col("id") % 25 === 0,
          dIn = 16, bands = b, rBits = 16, k = 7)
        .collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Int]("n_hits"))
        .toMap
      val atLevel = curve.collect { case ((`b`, q), h) => q -> h }
      assert(atLevel === single, s"recallCurve diverges at bands=$b")
    }
  }

  test("text-hash expressions survive CODEGEN_ONLY and match interpreted") {
    // the simhash/minhash projections are native expressions now —
    // forcing codegen-only evaluation proves doGenCode's generated Java
    // compiles (a fallback would silently run interpreted otherwise)
    val df = Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four five six")).toDF("doc_id", "text")
    val interpreted = df.select($"doc_id",
      SimHash.simhashPortable($"text", 3).as("fp"),
      Dedup.minHashSignatureFromText($"text", 3, 8).as("sig"))
      .orderBy("doc_id").collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val forced = df.select($"doc_id",
        SimHash.simhashPortable($"text", 3).as("fp"),
        Dedup.minHashSignatureFromText($"text", 3, 8).as("sig"))
        .orderBy("doc_id").collect()
      assert(forced.toSeq === interpreted.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("prefix-join exact Jaccard equals the brute-force pairs") {
    val sh = docs.select($"doc_id".as("id"),
      Dedup.shingleHashes($"text", 3).as("sh"))
    val brute = {
      val a = sh.select($"id".as("id_a"), $"sh".as("sh_a"))
      val b = sh.select($"id".as("id_b"), $"sh".as("sh_b"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .withColumn("j", Dedup.jaccard($"sh_a", $"sh_b"))
        .filter($"j" >= 0.5)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val prefix = Dedup.jaccardPairsPrefix(sh, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(prefix === brute)
  }

  test("top-k aggregator and prefix join are partition-invariant") {
    // the Aggregator's merge path and the prefix join's distinct only
    // fully exercise across partitions: results must not depend on
    // layout (the 1000-executor invariance the operators claim)
    val rng = new scala.util.Random(11)
    val emb = (0 until 120).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian()))).toDF("id", "vec")
    def topk(parts: Int) =
      Ann.bruteForceTopK(emb.filter($"id" < 10),
        emb.repartition(parts), 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    assert(topk(1) === topk(13))
    val sh = docs.select($"doc_id".as("id"),
      Dedup.shingleHashes($"text", 3).as("sh"))
    def pairs(parts: Int) =
      Dedup.jaccardPairsPrefix(sh.repartition(parts), 0.5)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(1) === pairs(7))
  }

  test("LSH ANN: high recall on clustered vectors, bounded candidate set") {
    // deterministic clustered corpus: 10 centroids, small noise — the
    // regime LSH is built for (the driver's random-Gaussian embeddings
    // have no neighborhood structure, so recall there is meaningless).
    val rng = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(16)(rng.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = centroids(i % 10)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.15).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val q = emb.filter($"id" < 20)
    val exact = Ann.bruteForceTopK(q, emb, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(q, emb, dim = 16, k = 10, nbits = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall on clustered data")
  }

  test("repetition signals: duplicate lines and top n-gram") {
    val df = Seq(
      (1L, "a b\na b\nc d"),          // 3 lines, 1 dup -> 1/3
      (2L, "x y x y x y"),            // "x y" bigram x3, "y x" x2
      (3L, "unique words only here")) // all distinct bigrams
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextStats.duplicateLineFraction($"text").as("dup"),
      TextStats.topNgramCount($"text", 2).as("top2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2)))
      .toMap
    assert(got(1L)._1 === 0.3333)
    assert(got(2L) === ((0.0, 3)))
    assert(got(3L) === ((0.0, 1)))
  }

  test("IVF ANN and cosine near-dup: high recall on clustered vectors") {
    val rng = new scala.util.Random(23)
    val centroids = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    val rows = (0 until 320).map { i =>
      val c = centroids(i % 8)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.12).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val q = emb.filter($"id" < 16)
    val exact = Ann.bruteForceTopK(q, emb, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(q, emb, k = 10, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall")
    // cosine near-dup vs brute force: precision exact, recall amplified
    // by the multi-table banding
    val sub = emb.filter($"id" < 64)
    val vecs = rows.take(64).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val brute = (for {
      x <- 0L until 64L; y <- (x + 1) until 64L
      if cos(vecs(x), vecs(y)) >= 0.9
    } yield (x, y)).toSet
    val pairs = Ann.cosineNearDuplicates(sub, dim = 16, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    pairs.foreach { case (x, y) =>
      assert(cos(vecs(x), vecs(y)) >= 0.9 - 1e-9) }
    val ndRecall = brute.count(pairs.contains).toDouble / brute.size
    assert(ndRecall >= 0.85, s"near-dup recall $ndRecall of ${brute.size}")
  }

  test("distributed quantizer fit: planted clusters resolved, means exact") {
    // VecMeanAggregator arithmetic on a hand-checkable group
    val g = Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0, 6.0)), (1, Seq(5.0, 5.0)))
      .toDF("cell", "vec")
    val vm = udaf(new graft.similarity.VecMeanAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val got = g.repartition(3).groupBy("cell").agg(vm($"vec").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got === Map(0 -> Seq(2.0, 4.0), 1 -> Seq(5.0, 5.0)))
    // distributed Lloyd on well-separated planted clusters: the probe
    // sets built from its centers must preserve true-neighbor recall
    // (the quantizer contract), even if individual Lloyd runs split or
    // merge a cluster
    val rng = new scala.util.Random(47)
    val centroids = Array.fill(8)(Array.fill(16)(rng.nextGaussian() * 3))
    val rows = (0 until 320).map { i =>
      (i.toLong, centroids(i % 8).map(_ + rng.nextGaussian() * 0.1).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val centers = graft.similarity.Ann.fitCentersDistributed(
      emb, nlist = 8, seed = 42L)
    assert(centers.length === 8)
    def d2(a: Array[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def probes(v: Seq[Double], n: Int): Set[Int] =
      centers.zipWithIndex.sortBy { case (c, _) => d2(c, v) }
        .take(n).map(_._2).toSet
    def cell(v: Seq[Double]): Int = probes(v, 1).head
    // recall: for every vector, its 10 true nearest (= cluster-mates
    // by construction) land in its 2 probed cells
    val byId = rows.toMap
    val hits = rows.count { case (id, v) =>
      val mates = rows.filter(r => r._1 % 8 == id % 8 && r._1 != id)
      val pr = probes(v, 2)
      mates.count(m => pr.contains(cell(m._2))) >= (mates.size * 9) / 10
    }
    assert(hits >= 300, s"only $hits/320 vectors keep cluster recall")
    assert(byId.size === 320)
  }

  test("PQ-ADC: m-byte codes, lossless-case exactness, generic recall") {
    import graft.similarity.Pq
    // generic Gaussian clusters: PQ is approximate — assert recall
    val rng = new scala.util.Random(53)
    val centroids = Array.fill(8)(Array.fill(16)(rng.nextGaussian() * 3))
    val rows = (0 until 320).map { i =>
      (i.toLong, centroids(i % 8).map(_ + rng.nextGaussian() * 0.1).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val cb = Pq.fitCodebooks(emb, dim = 16, m = 4, ksub = 32)
    val codes = emb.select($"id", Pq.encodeUdf(cb)($"vec").as("code"))
    // the memory contract: a code is exactly m bytes
    codes.collect().foreach(r =>
      assert(r.getAs[Array[Byte]]("code").length === 4))
    val q = emb.filter($"id" < 16)
    // PQ erases within-cluster micro-distances by design (mates become
    // near-ties), so exact-set recall is the wrong bar for generic
    // data — the quantizer contract is NEIGHBORHOOD recall: every
    // ADC top-10 entry must be a true cluster mate of its query
    val adc = Pq.adcTopK(q, codes, cb, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(adc.length === 160)
    val inCluster = adc.count { case (qid, nid) => qid % 8 == nid % 8 }
    assert(inCluster >= 152, // >= 95%
      s"only $inCluster/160 ADC neighbors are cluster mates")
    // lossless case: fewer distinct subvectors than codewords -> every
    // subvector IS a codeword and ADC ranking equals brute force
    val lat = (0 until 160).map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((i / 8) * 37 + j * j * 11) % 97 - 48.0))
    }.toDF("id", "vec")
    val cbl = Pq.fitCodebooks(lat, dim = 16, m = 4)
    val codesL = lat.select($"id", Pq.encodeUdf(cbl)($"vec").as("code"))
    val exactL = Ann.bruteForceTopK(lat.filter($"id" < 24), lat, 7)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val adcL = Pq.adcTopK(lat.filter($"id" < 24), codesL, cbl, k = 7)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(adcL === exactL)
    // the composed IVF+PQ path: same exactness on the lossless corpus,
    // and its candidate generation is the cell equi-join (no cartesian)
    val ivfpq = Pq.ivfpqTopK(lat.filter($"id" < 24), lat, dim = 16,
      k = 7, nlist = 8, nprobe = 3)
    val gotC = ivfpq.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotC === exactL)
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("persisted IVF index: probe equals in-memory IVF, scan is pruned") {
    val rng = new scala.util.Random(31)
    val centroids = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    val emb = (0 until 320).map { i =>
      (i.toLong, centroids(i % 8).map(_ + rng.nextGaussian() * 0.12).toSeq)
    }.toDF("id", "vec")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    Ann.buildIvfIndex(emb, dir, nlist = 8)
    val q = emb.filter($"id" < 16)
    val probed = Ann.probeIvfIndex(spark, dir, q, k = 10, nprobe = 2)
    // identical to the fit-inline path under the same quantizer params
    // (both fit from the same seeded sample, so centers coincide)
    val inline = Ann.ivfTopK(q, emb, k = 10, nlist = 8, nprobe = 2)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = probed.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === inline)
    // the probed scan must be partition-pruned: the cell filter shows
    // up as PartitionFilters on the parquet scan, and the number of
    // read partition directories is the probed cell set, not nlist
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))
    // 16 queries x 2 probes on 8 clusters of equal size -> strictly
    // fewer distinct probed cells than the full 8 only if clusters
    // repeat; assert at minimum the pruning predicate is selective in
    // form (isin over collected cell ids, not a trivial true)
    assert(plan.contains("cell#") && plan.contains("IN ("),
      plan.take(2000))
    // incremental maintenance (the FAISS add() path): half the corpus
    // up front, the rest appended against the PERSISTED centroids —
    // a probe afterwards must equal the probe of the full fresh build
    // (assignment is a function of the vector under a fixed quantizer)
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-ivf-index-inc").toString
    Ann.buildIvfIndex(emb.filter($"id" % 2 === 0), dir2, nlist = 8)
    Ann.appendToIvfIndex(emb.filter($"id" % 2 =!= 0), dir2)
    // fresh full build under the SAME quantizer: rebuild dir with the
    // half-fit centers is not available, so compare against a probe of
    // dir2 recomputed in memory — the appended index must contain the
    // whole corpus and rank it under its own persisted quantizer
    val got2 = Ann.probeIvfIndex(spark, dir2, q, k = 10, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // nprobe = nlist -> exhaustive: must equal exact brute force
    val exact = Ann.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got2 === exact,
      "appended index probed exhaustively must equal brute force")
  }

  test("persisted IVF+PQ index: probe = in-memory, pruned scan, append = fresh") {
    import graft.similarity.Pq
    // the lossless lattice corpus of the ADC spec: every distinct
    // subvector gets its own codeword, so the persisted probe must
    // reproduce the in-memory ivfpqTopK exactly
    val lat = (0 until 160).map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((i / 8) * 37 + j * j * 11) % 97 - 48.0))
    }.toDF("id", "vec")
    val q = lat.filter($"id" < 24)
    val inline = Pq.ivfpqTopK(q, lat, dim = 16, k = 7, nlist = 8,
        nprobe = 3)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-index").toString
    Pq.buildPqIndex(lat, dir, dim = 16, nlist = 8)
    val probed = Pq.probePqIndex(spark, dir, q, k = 7, nprobe = 3)
    val got = probed.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === inline)
    // the probed code scan must be partition-pruned at plan time
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))
    // incremental build: half the corpus up front, the rest appended
    // against the PERSISTED artifacts (no refit) — on the lossless
    // corpus a probe afterwards is indistinguishable from fresh.
    // note: the build half must cover the subvector vocabulary (its
    // ids span all clusters here), the documented add() contract
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-pq-index-inc").toString
    Pq.buildPqIndex(lat.filter($"id" % 2 === 0), dir2, dim = 16,
      nlist = 8)
    Pq.appendToPqIndex(lat.filter($"id" % 2 =!= 0), dir2)
    val got2 = Pq.probePqIndex(spark, dir2, q, k = 7, nprobe = 3)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got2 === inline)
  }

  test("embedding-LSH bucket cap drops skew buckets and surfaces the count") {
    // a degenerate spike: 50 identical vectors (a padding embedding)
    // plus a handful of spread ones — the spike collapses into ONE
    // bucket per table whose self-join would be quadratic in the spike
    val spike = (0 until 50).map(i => (i.toLong, Seq.fill(16)(1.0)))
    val spread = (50 until 60).map(i =>
      (i.toLong, (0 until 16).map(j => ((i * 7 + j * 13) % 11 - 5).toDouble)))
    val emb = (spike ++ spread).toDF("id", "vec")
    val acc = spark.sparkContext.longAccumulator("droppedBuckets")
    val pairs = Ann.cosineNearDuplicates(emb, dim = 16, threshold = 0.99,
      maxBucket = 10, droppedBuckets = Some(acc))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every spike bucket (one per table) exceeds the cap -> dropped,
    // accounted; no spike pair survives, and the count is surfaced
    assert(acc.value >= 1, "cap must surface a dropped-bucket count")
    assert(!pairs.exists { case (a, b) => a < 50 && b < 50 })
    // without the cap the spike pairs all come back
    val uncapped = Ann.cosineNearDuplicates(emb, dim = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 50).combinations(2).forall { c =>
      uncapped.contains((c(0).toLong, c(1).toLong)) })
    // lshTopK: same guard on the corpus side
    val acc2 = spark.sparkContext.longAccumulator("droppedBuckets2")
    val q = emb.filter($"id" >= 50)
    Ann.lshTopK(q, emb, dim = 16, k = 3, nbits = 8,
      maxBucket = 10, droppedBuckets = Some(acc2)).collect()
    assert(acc2.value >= 1)
    // scaledNbits grows with corpus size and stays bounded
    assert(Ann.scaledNbits(1000) === 10)
    assert(Ann.scaledNbits(1000000) === 20)
    assert(Ann.scaledNbits(100L * 1000 * 1000 * 1000) === 24)
    assert(Ann.scaledNbits(10) === 8)
  }

  test("local IVF quantizer fit partitions space without Spark jobs") {
    val rng = new scala.util.Random(5)
    val cents = Array.fill(4)(Array.fill(8)(rng.nextGaussian() * 10))
    val sample = Array.tabulate(400) { i =>
      val c = cents(i % 4); c.map(_ + rng.nextGaussian() * 0.05)
    }
    val fitted = Ann.fitCentersLocal(sample, nlist = 4, seed = 11L)
    assert(fitted.length === 4)
    // every true centroid has a fitted center within noise distance
    cents.foreach { c =>
      val d = fitted.map(f =>
        math.sqrt(c.zip(f).map { case (x, y) => (x - y) * (x - y) }.sum)).min
      assert(d < 0.5, s"no fitted center near a true centroid (d=$d)")
    }
    // degenerate: fewer distinct points than nlist -> just the points
    val two = Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(3.0, 4.0))
    assert(Ann.fitCentersLocal(two, nlist = 8, seed = 1L).length === 2)
  }

  test("langId identifies real sentences") {
    val samples = Seq(
      ("Le patient est admis pour une douleur à l'estomac", "fr"),
      ("The patient was admitted to the hospital with pain", "en"),
      ("El paciente fue admitido en el hospital con dolor", "es"),
      ("Der Patient wurde mit Schmerzen in die Klinik gebracht", "de"))
      .toDF("text", "expected")
    val got = samples.withColumn("predicted", TextStats.langId($"text"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("predicted") === r.getAs[String]("expected"),
        r.getAs[String]("text"))
    }
  }

  test("multimodal stub features are deterministic and sane") {
    val media = Multimodal.mediaFromDocuments(spark, docs.limit(50))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 50)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.entropy > 0 && f.entropy <= 4.0) // 16 buckets -> max 4 bits
      assert(f.histogram.sum === f.n_bytes)
    }
    // resize shrinks payloads in place to the byte budget
    val resized = Multimodal.resize(media, 32).collect()
    assert(resized.forall(_.content.length <= 32))
    assert(resized.map(_.media_id).toSet ===
      media.collect().map(_.media_id).toSet)
    // frame sampling: 1->N lazily
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    assert(frames.count() > 0)
  }

  test("IVF and IVF+PQ recall on the noisy corpus stays above the floor") {
    // q104 pins the LSH path's recall WITH an oracle; the kmeans-based
    // paths cannot be SQL-replayed, so their recall on the SAME noisy
    // corpus is pinned engine-side against the exact baseline.
    import graft.similarity.Pq
    val vecs = relational.PipelineQueries
      .noisyVecs(spark, "/root/testdata/sf0.01")
      .select($"id", transform($"vec", x => x.cast("double")).as("vec"))
      .localCheckpoint()
    val q = vecs.filter($"id" % 25 === 0)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = asSet(Ann.bruteForceTopK(q, vecs, 7))
    def recall(s: Set[(Long, Long)]): Double =
      s.intersect(exact).size.toDouble / exact.size
    val rIvf = recall(asSet(Ann.ivfTopK(q, vecs, 7, nlist = 0,
      nprobe = 2)))
    val rIvfpq = recall(asSet(Pq.ivfpqTopK(q, vecs, dim = 16, k = 7,
      nprobe = 2)))
    info(f"noisy-corpus recall@7: IVF $rIvf%.3f, IVF+PQ $rIvfpq%.3f")
    // measured 1.000 / 1.000: the ±512 noise never moves a mate out of
    // its cluster's cell, and the ADC reconstruction error is far
    // below the inter-cluster margin — the quantizer paths are robust
    // where the banding path (q104, 0.92) trades recall for
    // selectivity. Floor at 0.9 so a quantizer regression (bad fit,
    // wrong assignment, broken ADC tables) still fails loudly.
    assert(rIvf >= 0.9, f"IVF noisy recall $rIvf%.3f below floor")
    assert(rIvfpq >= 0.9, f"IVF+PQ noisy recall $rIvfpq%.3f below floor")
  }

  test("media near-dup: planted payload variants found, hamming exact") {
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    val rng = new scala.util.Random(71)
    val meta = MediaMeta("stub/bin", 0, 0, 0L)
    val base = Array.fill(240)((rng.nextInt(200) + 30).toByte)
    // variant: flip a handful of bytes hard enough to move a few
    // block-mean bits but stay within the radius
    val variant = base.clone()
    Seq(3, 77, 141).foreach(i => variant(i) = (variant(i) + 90).toByte)
    val others = (0 until 30).map(_ =>
      Array.fill(240)((rng.nextInt(200) + 30).toByte))
    val rows = (Seq(base, variant) ++ others).zipWithIndex
      .map { case (c, i) => MediaRow(i.toLong, c, meta) }
    val media = rows.toDS()
    val got = Multimodal.mediaNearDuplicates(media, radius = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    // brute-force ground truth over the same fingerprints: the
    // pigeonhole join must be COMPLETE within the radius
    val fps = rows.map(r => r.media_id -> Multimodal.aHash(r.content))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 8
    } yield (ia, ib, h.toLong)).toSet
    assert(got === brute)
    assert(got.exists { case (a, b, _) => a == 0L && b == 1L },
      "planted variant pair must be within the radius")
    // an empty payload fingerprints to 0, not an exception
    assert(Multimodal.aHash(Array.emptyByteArray) === 0L)
  }

  test("fingerprint is whitespace-insensitive and order-sensitive") {
    val df = Seq("a b c", "a  b   c", "c b a").toDF("text")
      .select(TextStats.fingerprint($"text").as("fp")).collect().map(_.getLong(0))
    assert(df(0) === df(1))
    assert(df(0) !== df(2))
  }

  test("portable simhash agrees with a scala reimplementation") {
    // independent recomputation of the MD5/60-bit fingerprint for a few
    // docs — guards the Spark expression chain (split/slice/md5/conv)
    // against drift from the declared oracle semantics
    def md5hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def fingerprint(text: String): Long = {
      val words = text.split(" ", -1)
      val n = math.max(words.length - 2, 1)
      val shingles = (0 until n)
        .map(i => words.slice(i, i + 3).mkString(" ")).distinct
      val votes = new Array[Long](60)
      shingles.foreach { sh =>
        val h = md5hash60(sh)
        (0 until 60).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 60).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val sample = docs.limit(5).select("text").as[String].collect()
    val got = docs.limit(5)
      .select(SimHash.simhashPortable($"text", 3).as("fp"))
      .as[Long].collect()
    assert(got.toSeq === sample.map(fingerprint).toSeq)
  }

  test("paragraph dedup keeps only globally-first occurrences") {
    val df = Seq(
      (0L, "alpha beta. gamma delta. alpha beta"),
      (1L, "gamma delta. epsilon zeta"),
      (2L, "alpha beta")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(df, "doc_id", "text", "\\. ")
      .orderBy("doc_id").collect()
    // doc 0: "alpha beta" kept at idx 0, "gamma delta" kept at idx 1,
    // the REPEAT of "alpha beta" (same doc, idx 2) dropped
    assert(out(0).getAs[String]("text") === "alpha beta gamma delta")
    assert(out(0).getAs[Long]("n_paragraphs") === 3L)
    assert(out(0).getAs[Long]("n_kept") === 2L)
    // doc 1: "gamma delta" already seen in doc 0 -> only "epsilon zeta"
    assert(out(1).getAs[String]("text") === "epsilon zeta")
    // doc 2: everything seen -> empty text, zero kept
    assert(out(2).getAs[String]("text") === "")
    assert(out(2).getAs[Long]("n_kept") === 0L)
  }

  test("span linker table join links each span to its best concept") {
    import graft.pipes.SpanLinker
    val spans = Seq(
      (100L, Seq(1.0, 0.05)), // -> concept 1 (x-axis)
      (101L, Seq(0.0, 2.0)),  // -> concept 2 (y-axis)
      (102L, Seq(1.0, 1.0))   // equidistant -> below threshold
    ).toDF("span_id", "vec")
    val concepts = Seq(
      (1L, Seq(5.0, 0.0)),
      (2L, Seq(0.0, 1.0))
    ).toDF("concept_id", "vec")
    val out = SpanLinker.linkTable(spans, concepts, threshold = 0.9)
      .orderBy("span_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((100L, 1L), (101L, 2L)))
    // span 102 at cosine ~0.707 to both: filtered by the threshold
    assert(!out.map(_.getLong(0)).contains(102L))
  }

  test("decontaminate counts distinct shared n-grams vs the benchmark") {
    val corpus = Seq(
      (0L, "a b c d e f"),    // shares 3-grams "b c d","c d e","d e f"
      (1L, "x y z w v u"),    // shares nothing
      (2L, "b c d b c d")     // shares "b c d" (distinct: counted ONCE)
    ).toDF("doc_id", "text")
    val benchmark = Seq((9L, "q b c d e f")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, benchmark, "doc_id", "text",
        n = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 0: benchmark 3-grams {q b c, b c d, c d e, d e f} — 3 shared;
    // doc 2: only "b c d", its own repeat deduped
    assert(out === Seq((0L, 3L), (2L, 1L)))
  }

  test("vocabularyQuality: OOV vs top-K vocab and mean corpus frequency") {
    val docs = Seq(
      (0L, "the the cat"),   // freqs: the=4, cat=2 -> mean (4+4+2)/3
      (1L, "the the cat zz") // zz freq 1, OOV vs top-3 vocab {the,cat,zz}?
    ).toDF("doc_id", "text")
    // corpus counts: the=4, cat=2, zz=1; top-2 vocab = {the, cat}
    val out = TextStats.vocabularyQuality(docs, "doc_id", "text", topK = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_words") === 3L)
    assert(out(0).getAs[Double]("oov_ratio") === 0.0)
    assert(out(0).getAs[Double]("mean_word_freq") === 3.3333)
    assert(out(1).getAs[Long]("n_words") === 4L)
    assert(out(1).getAs[Double]("oov_ratio") === 0.25) // zz not in top-2
    assert(out(1).getAs[Double]("mean_word_freq") === 2.75) // (4+4+2+1)/4
  }

  test("topNgrams returns the k most frequent grams, ties by gram") {
    val docs = Seq(
      (0L, "a b a b c"),  // bigrams: "a b","b a","a b","b c"
      (1L, "a b")         // "a b"
    ).toDF("doc_id", "text")
    val out = TextStats.topNgrams(docs, "text", n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a b", 3L), ("b a", 1L))) // "b a" < "b c" tie
  }

  test("semanticDedup keeps min-id representatives with anchored counts") {
    // two identical-vector clusters {0,1,2} and {10,11}, one singleton
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (10L, Seq(0.0, 1.0)), (11L, Seq(0.0, 1.0)),
      (20L, Seq(1.0, 1.0))
    ).toDF("id", "vec")
    val out = Ann.semanticDedup(vecs, dim = 2, threshold = 0.999)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cluster {1.0,1.0} vs {1,1}/sqrt2 ~ 0.707 < threshold: no cross pair
    assert(out === Seq((0L, 2L), (10L, 1L), (20L, 0L)))
  }

  test("repeatedRuns merges flagged windows into maximal cross-doc spans") {
    // docs 0 and 1 share the run "a b c d e" (5 words); doc 2 is clean;
    // doc 3 is too short for n=3? no — use n=3 windows
    val docs = Seq(
      (0L, "x a b c d e y z"), // windows over the run: idx 1,2,3
      (1L, "a b c d e q r s"), // idx 0,1,2
      (2L, "m n o p q1 r1 s1 t"),
      (3L, "a b")              // < n words: emits nothing
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedRuns(docs, "doc_id", "text", n = 3)
      .orderBy("id", "begin_word").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 0: flagged windows at word idx 1..3 merge into [1, 6);
    // doc 1: idx 0..2 -> [0, 5); docs 2/3: nothing
    assert(out === Seq((0L, 1L, 6L), (1L, 0L, 5L)))
  }

  test("chunkWindows packs word windows with stride overlap") {
    val docs = Seq(
      (0L, Seq.fill(70)("w").mkString(" ")), // 70 words
      (1L, "a b c")                          // shorter than one window
    ).toDF("doc_id", "text")
    val out = TextStats.chunkWindows(docs, "doc_id", "text",
        width = 40, stride = 30)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: starts 0/30/60 -> [0,40) [30,70) [60,70); doc 1: [0,3)
    assert(out.toSeq === Seq(
      (0L, 0L, 0L, 40L), (0L, 1L, 30L, 70L), (0L, 2L, 60L, 70L),
      (1L, 0L, 0L, 3L)))
  }

  test("stratifiedSample keeps exact ceil-quotas per stratum, reproducibly") {
    val docs = (0L until 100L).map(i =>
      (i, if (i % 3 == 0) "en" else "fr")).toDF("doc_id", "lang")
    val out = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.25)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: 34 docs -> ceil(8.5) = 9; fr: 66 -> ceil(16.5) = 17
    assert(byLang === Map("en" -> 9L, "fr" -> 17L))
    // deterministic: the same call yields the same ids
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("stratifiedSample matches the brute-force (hash, id) rank order") {
    // irregular ids, including mod-2^31 hash collisions (i and
    // i + 2^31 share a hash -> the id tie-break must decide)
    val ids = (0L until 40L).map(_ * 7L + 3L) ++
      Seq(5L, 5L + 2147483648L, 12L + 2147483648L)
    val docs = ids.zipWithIndex.map { case (id, i) =>
      (id, if (i % 2 == 0) "a" else "b") }.toDF("doc_id", "lang")
    def hash(id: Long): Long = ((id % 2147483648L) * 2654435761L) %
      4294967296L
    val expected = ids.zipWithIndex
      .map { case (id, i) => (id, if (i % 2 == 0) "a" else "b") }
      .groupBy(_._2).flatMap { case (_, rows) =>
        val q = (BigDecimal(rows.size) * BigDecimal("0.3"))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
        rows.sortBy { case (id, _) => (hash(id), id) }.take(q)
      }.map(_._1).toSet
    val got = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("stratifiedSample: randomized brute-force property trials") {
    // seeded random corpora: skewed strata, sparse/dense ids, assorted
    // fractions — output must equal the (hash, id)-rank brute force
    val rnd = new scala.util.Random(20260813L)
    def hash(id: Long): Long = ((id % 2147483648L) * 2654435761L) %
      4294967296L
    (1 to 4).foreach { trial =>
      val nStrata = 1 + rnd.nextInt(4)
      val rows = (0 until 200 + rnd.nextInt(300)).map { _ =>
        val id = math.abs(rnd.nextLong()) % (if (rnd.nextBoolean())
          100000L else Long.MaxValue - 1)
        // skew: stratum 0 takes half the corpus
        val s = if (rnd.nextBoolean()) 0 else rnd.nextInt(nStrata)
        (id, s"s$s")
      }.distinct
      val fraction = Seq(0.1, 0.2, 0.25, 0.5, 1.0)(rnd.nextInt(5))
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val q = (BigDecimal(rs.size) * BigDecimal(fraction.toString))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
        rs.sortBy { case (id, _) => (hash(id), id) }.take(q)
      }.map(_._1).toSet
      val got = TextStats.stratifiedSample(
        rows.toDF("doc_id", "lang"), "doc_id", "lang", fraction)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected,
        s"trial $trial fraction $fraction strata $nStrata")
    }
  }

  test("exactNtile matches Window ntile on randomized tied data") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val k = Seq(3, 7, 10)(trial - 1)
      // heavy ties (values 0..9) + sparse ids, boundary mid-tie likely
      val rows = (0 until 150 + rnd.nextInt(200)).map { i =>
        (i * 17L + rnd.nextInt(5), rnd.nextInt(10).toLong)
      }.distinct.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("doc_id", "v")
      val got = graft.operators.ExactNtile
        .ntile(df, "doc_id", "v", k)
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      val want = rows.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), rank) =>
          // SQL ntile: first (n mod k) buckets hold ceil(n/k)
          val n = rows.size; val q = n / k; val rem = n % k
          val big = (q + 1) * rem
          id -> (if (rank < big) rank / (q + 1) + 1
                 else (rank - big) / math.max(q, 1) + rem + 1)
        }.toMap
      assert(got === want, s"trial $trial k=$k n=${rows.size}")
      // degenerate k=1: everything bucket 1
      assert(graft.operators.ExactNtile.ntile(df, "doc_id", "v", 1)
        .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
        === Seq(1))
    }
  }

  test("exactNtile plan is Window/sort-free; fallback is bit-identical") {
    val rows = (0L until 300L).map(i => (i, i % 7))
    val df = rows.toDF("doc_id", "v")
    val out = graft.operators.ExactNtile.ntile(df, "doc_id", "v", 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sort "), plan)
    val viaWindow = graft.operators.ExactNtile
      .ntile(df, "doc_id", "v", 4, maxDistinct = 1)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(out.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
      === viaWindow)
  }

  test("cappedPerStratum caps big strata, passes small ones, matches brute force") {
    def hash(id: Long): Long = ((id % 2147483648L) * 2654435761L) %
      4294967296L
    // stratum "big" has 40 rows (capped to 7), "small" 3 (kept whole)
    val rows = (0L until 40L).map(i => (i * 13L + 1L, "big")) ++
      Seq((500L, "small"), (501L, "small"), (502L, "small"))
    val docs = rows.toDF("doc_id", "source")
    val got = TextStats.cappedPerStratum(docs, "doc_id", "source", cap = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.sortBy { case (id, _) => (hash(id), id) }.take(7)
    }.toSet
    assert(got === expected)
    assert(got.count(_._2 == "big") === 7)
    assert(got.count(_._2 == "small") === 3)
    // same kept set through the high-cardinality window fallback
    val viaWindow = TextStats.cappedPerStratum(docs, "doc_id", "source",
        cap = 7L, maxStrata = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaWindow === got)
    // descent-path plan stays Window/sort-free (q60's scale contract)
    val plan = TextStats.cappedPerStratum(docs, "doc_id", "source", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sort "), plan)
  }

  test("stratifiedSample quota is decimal-exact and its plan is sort-free") {
    // n*fraction an exact integer: double ceil(10 * 0.2) = 3 (0.2 is
    // 0.2000...0001 in binary); the decimal quota must give exactly 2
    val docs = (0L until 10L).map((_, "x")).toDF("doc_id", "lang")
    val out = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.2)
    assert(out.count() === 2L)
    // scale shape: no window / per-stratum sort anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sort "), plan)
  }

  test("stratifiedSample carries typed stratum values (no string round-trip)") {
    // double strata whose toString does not round-trip under a SQL cast
    // (e.g. 0.1 + 0.2 prints as 0.30000000000000004) must still join
    // against their own boundary rows
    val docs = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) 0.1 + 0.2 else 1.0 / 3.0))
      .toDF("doc_id", "stratum")
    val out = TextStats.stratifiedSample(docs, "doc_id", "stratum", 0.5)
    val byS = out.groupBy("stratum").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byS === Map((0.1 + 0.2) -> 15L, (1.0 / 3.0) -> 15L))
  }

  test("stratifiedSample rejects duplicated ids at the threshold hash") {
    // every id duplicated -> whichever hash is the threshold, its tie
    // set holds a duplicate; the overshoot must fail loudly, not pass
    val docs = ((0L until 20L) ++ (0L until 20L)).map((_, "x"))
      .toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      TextStats.stratifiedSample(docs, "doc_id", "lang", 0.5).count()
    }
    assert(e.getMessage.contains("unique ids"))
  }

  test("stratifiedSample falls back to the window form above maxStrata, bit-identically") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 7}"))
    val docs = rows.toDF("doc_id", "lang")
    val hist = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.3)
    val fell = TextStats.stratifiedSample(docs, "doc_id", "lang", 0.3,
      maxStrata = 3)
    assert(fell.select("doc_id").collect().map(_.getLong(0)).toSet ===
      hist.select("doc_id").collect().map(_.getLong(0)).toSet)
    // and the fallback really is the window plan
    assert(fell.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("redactWithSpans maps the last edit begin through prior deltas") {
    val docs = Seq(
      (0L, "call customer now customer end"),
      (1L, "no match here")
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        graft.text.Redact.redactWithSpans($"text", "\\bcustomer\\b",
          "[X]").as("r"))
      .select($"doc_id", $"r.text", $"r.n_redactions", $"r.last_begin")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "call [X] now [X] end")
    assert(out(0).getInt(2) === 2)
    // original last begin 18, first edit shrinks by 5 -> 13; verify it
    // is the actual index in the REDACTED text
    assert(out(0).getInt(3) === out(0).getString(1).lastIndexOf("[X]"))
    assert(out(1).getInt(2) === 0 && out(1).getInt(3) === -1)
  }

  test("connectedComponents matches union-find on random graphs") {
    // brute-force referee
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 25
      // mixture of shapes: chains (worst diameter), random pairs, a hub
      val edges = (
        (0 until n / 3).map(i => (i.toLong, (i + 1).toLong)) ++
        Seq.fill(n) {
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
        } ++
        (0 until 5).map(i => ((n + 100).toLong, rnd.nextInt(n).toLong))
      ).filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("connectedComponents: transitive chain collapses; empty is empty") {
    // a~b, b~c but no a~c pair: pairwise min-survivor would keep c
    val chain = Seq((10L, 20L), (20L, 30L), (30L, 40L), (50L, 60L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 50L, 60L -> 50L))
    // orientation/duplicates don't matter; self-loops are dropped
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 2L)).toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(messy).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 1L)))
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
  }

  test("packSequences: exact budget cuts, straddling pieces, conservation") {
    // shard 0: docs 0,2,4 (ids mod 2); budget 5
    // doc 0: 3 toks [0,3) ; doc 2: 4 toks [3,7) straddles seq 0/1 ;
    // doc 4: 5 toks [7,12) straddles seq 1/2
    val docs = Seq(
      (0L, "a b c"), (2L, "d e f g"), (4L, "h i j k l"),
      (1L, "m n o p q r")
    ).toDF("doc_id", "text")
    val out = TextStats.packSequences(docs, "doc_id", "text",
        budget = 5, shards = 2)
      .orderBy("shard", "seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 0L, 0L, 3L),   // doc 0 whole
      (0L, 0L, 2L, 0L, 2L),   // doc 2 first 2 toks complete seq 0
      (0L, 1L, 2L, 2L, 4L),   // doc 2 rest
      (0L, 1L, 4L, 0L, 3L),   // doc 4 fills seq 1
      (0L, 2L, 4L, 3L, 5L),   // doc 4 rest
      (1L, 0L, 1L, 0L, 5L),   // doc 1 fills shard 1 seq 0
      (1L, 1L, 1L, 5L, 6L)))  // doc 1 rest
    // conservation: pieces of a doc tile [0, toks) exactly
    val byDoc = out.groupBy(_._3).view.mapValues(ps =>
      ps.sortBy(_._4).map(p => (p._4, p._5)).toSeq)
    byDoc.foreach { case (_, ps) =>
      assert(ps.head._1 == 0L)
      ps.sliding(2).foreach {
        case Seq((_, e), (s2, _)) => assert(e == s2)
        case _ =>
      }
    }
    // every seq except each shard's last holds exactly `budget` tokens
    val seqTok = out.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(p => p._5 - p._4).sum).toMap
    val lastSeq = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    seqTok.foreach { case ((sh, sq), tok) =>
      if (sq < lastSeq(sh)) assert(tok === 5L, s"shard $sh seq $sq")
      else assert(tok <= 5L)
    }
  }

  test("shuffledPackSequences: permutes, conserves, deterministic") {
    val input = (0L until 400L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextStats.shuffledPackSequences(input, "doc_id", "text",
        budget = 16, shards = 4, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // conservation: each doc's pieces tile [0, toks) exactly, same
    // guarantee as the id-ordered packer
    val byDoc = out.groupBy(_._3)
    assert(byDoc.size === 400)
    byDoc.foreach { case (id, ps) =>
      val sorted = ps.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      assert(sorted.last._5 === id % 7 + 1)
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, e), (_, _, _, s2, _)) => assert(e == s2)
        case _ =>
      }
    }
    // total token mass matches the unshuffled packer bit-for-bit
    val massShuffled = out.map(p => p._5 - p._4).sum
    val massPlain = TextStats.packSequences(input, "doc_id", "text",
        budget = 16, shards = 4).collect()
      .map(r => r.getLong(4) - r.getLong(3)).sum
    assert(massShuffled === massPlain)
    // the shuffle is REAL: shard membership must not be id % shards
    // (400 docs into 4 shards — identity assignment has ~0 chance)
    val moved = out.count(p => p._1 != p._3 % 4)
    assert(moved > 100, s"only $moved pieces left their id-mod shard")
    // and within a shard, first-piece order must not be id order
    val firstSeq = out.filter(p => p._1 == 0L && p._4 == 0L)
      .sortBy(p => (p._2, p._3)).map(_._3)
    assert(firstSeq.length > 10)
    assert(firstSeq.toSeq !== firstSeq.sorted.toSeq,
      "shard 0 packed docs in id order — shuffle did nothing")
    // bit-exact across partitionings (the permutation is content-
    // addressed, not RNG or partition-order dependent)
    val again = TextStats.shuffledPackSequences(input.repartition(7),
        "doc_id", "text", budget = 16, shards = 4, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(again === out.toSet)
    // a different seed yields a genuinely different epoch order
    val other = TextStats.shuffledPackSequences(input, "doc_id", "text",
        budget = 16, shards = 4, seed = 43L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(other !== out.toSet)
    assert(other.toSeq.map(p => p._5 - p._4).sum === massPlain)
  }

  test("corpusMixture: integer-exact copies, drops, and determinism") {
    val docs = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "keep" else "mix", s"text $i"))
      .toDF("doc_id", "lang", "text")
    // 25000 bp = exactly 2.5x: every doc gets 2 or 3 copies; 0 bp drops
    val out = TextStats.corpusMixture(docs, "doc_id", "lang",
      Map("keep" -> 25000, "mix" -> 0))
    val copies = out.groupBy("doc_id")
      .agg(max("n_copies").as("n"), count(lit(1)).as("c")).collect()
    assert(copies.length === 100) // 'mix' docs all dropped
    copies.foreach { r =>
      assert(r.getLong(1) === r.getLong(2)) // copy_idx exploded fully
      assert(r.getLong(1) === 2L || r.getLong(1) === 3L)
    }
    // frac part: ~50% of keep docs get the 3rd copy (hash-decided)
    val n3 = copies.count(_.getLong(1) == 3L)
    assert(n3 > 20 && n3 < 80, s"3-copy count $n3 not near half")
    // bit-exact reproducibility across runs/partitionings
    val again = TextStats.corpusMixture(docs.repartition(7), "doc_id",
        "lang", Map("keep" -> 25000, "mix" -> 0))
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === out.select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  // the operator's md5 position hash, replayed driver-side
  private def budgetPos(seed: Long, id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("tokenBudgetSelection matches the greedy (hash, id)-prefix rule") {
    // every branch in one corpus: en/fr cut mid-key, zh keeps all
    // (budget > corpus), de budget 0 (empty), es absent from budgets
    // (dropped), and a budgeted key absent from the corpus (no rows)
    val rnd = new scala.util.Random(8L)
    val docs = (0L until 500L).map { i =>
      val lang = Seq("en", "en", "fr", "zh", "de", "es")(rnd.nextInt(6))
      (i, Seq.fill(1 + rnd.nextInt(9))("w").mkString(" "), lang)
    }
    val budgets = Map("en" -> 300L, "fr" -> 120L, "zh" -> 100000L,
      "de" -> 0L, "xx" -> 50L)
    val expected = docs.groupBy(_._3).flatMap { case (k, rs) =>
      budgets.get(k).fold(Seq.empty[Long]) { b =>
        var acc = 0L
        rs.sortBy(r => (budgetPos(11L, r._1), r._1)).takeWhile { r =>
          val keep = acc < b
          acc += r._2.split(" ").length
          keep
        }.map(_._1)
      }
    }.toSet
    assert(expected.nonEmpty)
    val out = TextStats.tokenBudgetSelection(
      docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
      budgets, seed = 11L)
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // kept mass overshoots each budget by at most one document
    val mass = out.groupBy("lang")
      .agg(sum(TextStats.wordCount(col("text"))).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mass.foreach { case (k, t) =>
      assert(t < budgets(k) + 10, s"$k kept $t of ${budgets(k)}")
    }
    assert(!mass.contains("de") && !mass.contains("es"))
    // partition invariance: the cut is content-addressed
    val again = TextStats.tokenBudgetSelection(
      docs.toDF("doc_id", "text", "lang").repartition(7),
      "doc_id", "text", "lang", budgets, seed = 11L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === expected)
  }

  test("tokenBudgetSelection: randomized brute-force property trials") {
    // seeded random corpora: sparse/dense ids, skewed keys, budgets
    // drawn across the whole range (0, tiny, mid, over-corpus) — output
    // must equal the greedy (hash, id)-prefix brute force every time
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val seed = rnd.nextLong()
      val nKeys = 1 + rnd.nextInt(4)
      val rows = (0 until 150 + rnd.nextInt(250)).map { _ =>
        val id = math.abs(rnd.nextLong()) % (if (rnd.nextBoolean())
          50000L else Long.MaxValue - 1)
        (id, Seq.fill(1 + rnd.nextInt(12))("w").mkString(" "),
          s"k${rnd.nextInt(nKeys)}")
      }.distinctBy(_._1)
      val budgets = (0 until nKeys).map { k =>
        s"k$k" -> (rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => 1L + rnd.nextInt(20)
          case 2 => 50L + rnd.nextInt(400)
          case _ => 100000L
        })
      }.toMap
      val expected = rows.groupBy(_._3).flatMap { case (k, rs) =>
        var acc = 0L
        rs.sortBy(r => (budgetPos(seed, r._1), r._1)).takeWhile { r =>
          val keep = acc < budgets(k)
          acc += r._2.split(" ").length
          keep
        }.map(_._1)
      }.toSet
      val got = TextStats.tokenBudgetSelection(
        rows.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang",
        budgets, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"trial $trial seed $seed budgets $budgets")
    }
  }

  test("tokenBudgetSelection's final plan is window- and sort-free") {
    val docs = (0L until 50L).map(i => (i, "a b c", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextStats.tokenBudgetSelection(docs, "doc_id", "text",
      "lang", Map("en" -> 40L), seed = 1L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sort "), plan)
    // the cut table is broadcast, not shuffled
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("isqrt is exact at boundaries and beyond 2^52") {
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L,
      (1L << 52) - 1, 1L << 52, (1L << 52) + 1,
      3037000498L * 3037000498L,       // isqrt(Long.MaxValue)^2
      3037000498L * 3037000498L - 1, Long.MaxValue)
    cases.foreach { n =>
      val r = TextStats.isqrt(n)
      assert(r * r <= n, s"isqrt($n) = $r overshoots")
      assert(r === 3037000499L || (r + 1) * (r + 1) > n,
        s"isqrt($n) = $r undershoots")
    }
    assertThrows[IllegalArgumentException](TextStats.isqrt(-1L))
  }

  test("temperatureWeightsBp: exact integer weights, cap applies") {
    // en: 100 tokens, fr: 400 -> sq 10/20, N=500, S=30
    // en bp = 10000*10*500/(30*100) = 16666; fr = 10000*20*500/(30*400)
    val docs = ((0L until 10L).map(i => (i, Seq.fill(10)("w").mkString(" "), "en")) ++
      (10L until 50L).map(i => (i, Seq.fill(10)("w").mkString(" "), "fr")))
      .toDF("doc_id", "text", "lang")
    val w = TextStats.temperatureWeightsBp(docs, "lang", "text")
    assert(w === Map("en" -> 16666, "fr" -> 8333))
    // the cap bites when one slice is tiny
    val skewed = ((0L until 1L).map(i => (i, "w", "tiny")) ++
      (1L until 1000L).map(i => (i, Seq.fill(100)("w").mkString(" "), "big")))
      .toDF("doc_id", "text", "lang")
    val wc = TextStats.temperatureWeightsBp(skewed, "lang", "text",
      maxWeightBp = 50000)
    assert(wc("tiny") === 50000)
    assert(wc("big") < 10100 && wc("big") >= 9900)
  }

  test("temperatureMixture attaches weights and replays corpusMixture") {
    val docs = ((0L until 10L).map(i => (i, "a b c", "en")) ++
      (10L until 40L).map(i => (i, "d e", "fr")))
      .toDF("doc_id", "text", "lang")
    val bp = TextStats.temperatureWeightsBp(docs, "lang", "text")
    val out = TextStats.temperatureMixture(docs, "doc_id", "lang", "text")
      .collect()
    // every row carries its key's computed weight
    out.foreach { r =>
      assert(r.getAs[Int]("weight_bp") === bp(r.getAs[String]("lang")))
    }
    // and the explode equals corpusMixture under those weights
    val direct = TextStats.corpusMixture(docs, "doc_id", "lang", bp)
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet === direct)
  }

  test("bloom decontaminate filter = unpruned anti-join, bloom FPs harmless") {
    val pool = docs.filter($"doc_id" % 5 =!= 0)
    val bench = docs.filter($"doc_id" % 5 === 0)
    val contaminated = Dedup.decontaminate(pool, bench, "doc_id", "text",
        n = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty, "gate must actually drop docs here")
    val expected = pool.select("doc_id").collect()
      .map(_.getLong(0)).toSet -- contaminated
    val got = Dedup.decontaminateFilter(pool, bench, "doc_id", "text",
        n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // saturate the bloom (fpp 0.5 -> most grams read as suspect): the
    // exact confirmation join owns correctness, the bloom only prunes,
    // so the survivor set must be bit-identical
    val saturated = Dedup.decontaminateFilter(pool, bench, "doc_id",
        "text", n = 8, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(saturated === expected)
  }

  test("BM25 replays the hand-computed Okapi example") {
    // N=4, sum_dl=12, query {dog}: df=2, idf=ln(2); doc 2 tf=2 dl=3,
    // doc 3 tf=1 dl=2 -> contributions ln(2)*1.375 and ln(2)*2.2/1.9,
    // i.e. 9531 and 8026 basis points (hand-checked)
    val corpus = Seq(
      (1L, "cat sat mat"), (2L, "dog dog cat"),
      (3L, "dog bird"), (4L, "fish fish fish fish"))
      .toDF("doc_id", "text")
    val out = graft.text.Bm25.topK(corpus, "doc_id", "text",
        terms = Seq("dog"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 9531L), (3L, 8026L)),
      s"got ${out.toSeq}")
    // multi-term scores are the sum of per-term basis points
    val two = graft.text.Bm25.topK(corpus, "doc_id", "text",
        terms = Seq("dog", "cat"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dogOnly = graft.text.Bm25.topK(corpus, "doc_id", "text",
        terms = Seq("dog"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val catOnly = graft.text.Bm25.topK(corpus, "doc_id", "text",
        terms = Seq("cat"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(2L) === dogOnly(2L) + catOnly(2L))
    // k cuts on (score desc, id): k=1 keeps only doc 2
    val cut = graft.text.Bm25.topK(corpus, "doc_id", "text",
        terms = Seq("dog"), k = 1).collect()
    assert(cut.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("gopher gate flags flip at their declared boundaries") {
    def gate(t: String) = Seq((1L, t)).toDF("doc_id", "text")
      .select(TextStats.gopherRules($"text", Seq("the", "a")).as("g"))
      .select("g.*").head()
    val distinct60 = (0 until 60).map(i => s"the w$i").mkString(" ")
    val ok = gate(distinct60) // 120 words, stop hits 60, ttr ~0.51
    assert(ok.getAs[Boolean]("ok_words") && ok.getAs[Boolean]("ok_ttr") &&
      ok.getAs[Boolean]("ok_stopwords") && ok.getAs[Boolean]("ok_alpha") &&
      ok.getAs[Boolean]("keep"))
    // 49 words misses the floor by one; 50 passes
    val short49 = (0 until 49).map(i => s"the$i").mkString(" ")
    assert(!gate(short49).getAs[Boolean]("ok_words"))
    assert(!gate(short49).getAs[Boolean]("keep"))
    val at50 = (0 until 50).map(i => s"the$i").mkString(" ")
    assert(gate(at50).getAs[Boolean]("ok_words"))
    // one repeated word: ttr = 1/60 fails, stopword hits 60 pass
    val repeated = Seq.fill(60)("the").mkString(" ")
    val r = gate(repeated)
    assert(!r.getAs[Boolean]("ok_ttr") && r.getAs[Boolean]("ok_stopwords")
      && !r.getAs[Boolean]("keep"))
    // no stopwords at all
    val noStop = (0 until 60).map(i => s"w$i").mkString(" ")
    assert(!gate(noStop).getAs[Boolean]("ok_stopwords"))
    // two-char words: mean_word_len (2 + separators) under 3.0
    val tiny = (0 until 60).map(_ => "aa").mkString(" ")
    assert(!gate(tiny).getAs[Boolean]("ok_mean_len"))
    // digit-only words fail the alphabetic gate
    val digits = (0 until 60).map(i => s"$i$i").mkString(" ")
    assert(!gate(digits).getAs[Boolean]("ok_alpha"))
  }

  test("label dispersion matches hand arithmetic and zeroes on singletons") {
    import graft.similarity.Embeddings
    val df = Seq(
      ("a", Seq(0.1f, 0.3f)), ("a", Seq(0.3f, 0.1f)),
      ("b", Seq(0.5f, 0.5f)), // singleton: dispersion must be 0
      ("c", Seq(0.2f, 0.2f)), ("c", Seq(0.2f, 0.2f)) // identical pair: 0
    ).toDF("label", "vec")
    val got = Embeddings.labelDispersion(df, $"label", $"vec")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // a: q = (1000,3000),(3000,1000); ssq = 2*(1e6+9e6) = 2e7;
    // sv = (4000,4000) -> svsq = 3.2e7; num = 2e7*2 - 3.2e7 = 8e6.
    // Sanity: msd = 8e6 / n^2 / 1e8 = 0.02 = mean of the two 0.02
    // squared distances to centroid (0.2, 0.2).
    assert(got("a") === ((2L, 8000000L)))
    assert(got("b") === ((1L, 0L)))
    assert(got("c") === ((2L, 0L)))
  }

  test("covariance matches hand arithmetic; trace equals dispersion") {
    import graft.similarity.Embeddings
    val df = Seq(Seq(0.1f, 0.3f), Seq(0.3f, 0.1f)).toDF("vec")
    val got = Embeddings.covariance(df, $"vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // q = (1000,3000),(3000,1000), n = 2, S = (4000,4000):
    // (0,0): 2*1e7 - 1.6e7 = 4e6; (0,1): 2*6e6 - 1.6e7 = -4e6
    assert(got === Map((0, 0) -> 4000000L, (0, 1) -> -4000000L,
      (1, 1) -> 4000000L))
    // trace == labelDispersion's numerator on the same (single-label) set
    val disp = Embeddings.labelDispersion(
        df.withColumn("label", lit("x")), $"label", $"vec")
      .collect().head.getLong(2)
    assert(got((0, 0)) + got((1, 1)) === disp)
    // regression (r15): the moment Aggregator must NOT capture the
    // SparkSession — it serialized only while the session's lazy
    // observation manager was uninitialized, so the first
    // Dataset.observe anywhere in the session (the DML doors use it)
    // broke every later covariance with Task-not-serializable
    val o = org.apache.spark.sql.Observation()
    df.observe(o, count(lit(1)).as("n")).collect()
    assert(o.get("n").asInstanceOf[Long] === 2L)
    assert(Embeddings.covariance(df, $"vec").collect().length === 3)
  }

  test("scene-change counts flip exactly at the threshold boundary") {
    import graft.multimodal.Multimodal
    // frames of 4 bytes; threshold 2 -> change iff |sum diff| > 8
    def media(id: Long, bytes: Array[Byte]) =
      Seq((id, bytes, ("stub/bin", 0, 0, 0L)))
        .toDF("media_id", "content", "meta")
        .select($"media_id", $"content",
          $"meta".cast("struct<format:string,width:int,height:int," +
            "durationMs:bigint>").as("meta"))
        .as[Multimodal.MediaRow]
    def run(bytes: Int*) : (Int, Int) = {
      val r = Multimodal.sceneChanges(
        media(1L, bytes.map(_.toByte).toArray), frameBytes = 4,
        threshold = 2).collect().head
      (r._2, r._3)
    }
    // frame sums: 40, 49, 40 -> diffs 9, 9: both > 8 -> 2 changes
    assert(run(10, 10, 10, 10, 10, 10, 10, 19, 10, 10, 10, 10) === (3, 2))
    // diff exactly 8 is NOT a change (strict >)
    assert(run(10, 10, 10, 10, 10, 10, 10, 18, 10, 10, 10, 10) === (3, 0))
    // trailing partial frame is ignored: 13 bytes -> 3 frames
    assert(run(10, 10, 10, 10, 10, 10, 10, 19, 10, 10, 10, 10, 99) === (3, 2))
    // payloads under one frame: 0 frames, 0 changes
    assert(run(1, 2, 3) === (0, 0))
  }

  test("C4 line gate keeps/drops lines and docs at declared boundaries") {
    def gate(t: String) = Seq((1L, t)).toDF("doc_id", "text")
      .select(TextStats.lineGate($"text", " the ",
        minWords = 4, blacklist = Seq("slow"), minKeptLines = 3).as("g"))
      .select("g.*").head()
    // three 4-word clean lines -> all kept, doc kept, text re-joined
    val ok = gate("a b c d the e f g h the i j k l")
    assert(ok.getAs[Long]("n_lines") === 3L)
    assert(ok.getAs[Long]("n_kept") === 3L)
    assert(ok.getAs[Boolean]("doc_kept"))
    assert(ok.getAs[String]("text_clean") === "a b c d e f g h i j k l")
    // a 3-word line misses the floor by one word
    val short = gate("a b c the e f g h the i j k l")
    assert(short.getAs[Long]("n_kept") === 2L)
    assert(!short.getAs[Boolean]("doc_kept"))
    assert(short.getAs[String]("text_clean") === "e f g h i j k l")
    // a blacklisted term anywhere in the line drops it
    val bad = gate("a b slow d the e f g h the i j k l")
    assert(bad.getAs[Long]("n_kept") === 2L)
    assert(!bad.getAs[Boolean]("doc_kept"))
    // no delimiter -> one line = the whole doc; survives alone but the
    // doc fails the >=3 surviving-lines rule
    val one = gate("a b c d e f")
    assert(one.getAs[Long]("n_lines") === 1L && one.getAs[Long]("n_kept") === 1L)
    assert(!one.getAs[Boolean]("doc_kept"))
    // all lines dropped -> empty cleaned text, never null
    val none = gate("x slow y z w the slow b c d")
    assert(none.getAs[Long]("n_kept") === 0L)
    assert(none.getAs[String]("text_clean") === "")
  }

  test("SQ8 encode clamps and quantizes as declared") {
    import graft.similarity.Sq
    val mm = Array((0.0, 10.0), (5.0, 5.0))
    val df = Seq((1L, Seq(-5.0, 7.0)), (2L, Seq(15.0, 5.0)),
      (3L, Seq(5.0, 5.0))).toDF("id", "vec")
    val codes = df.select($"id", Sq.encodeUdf(mm)($"vec").as("code"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    assert((codes(1L)(0) & 0xff) === 0) // below envelope -> clamp 0
    assert((codes(2L)(0) & 0xff) === 255) // above envelope -> clamp 255
    assert((codes(3L)(0) & 0xff) === 128) // midpoint -> round-half-up 128
    assert(codes(1L)(1) === 0 && codes(2L)(1) === 0) // constant dim -> 0
  }

  test("SQ8 SDC top-k equals the brute-force integer code ranking") {
    val rng = new scala.util.Random(23)
    val emb = (0 until 160).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian() * 10))).toDF("id", "vec")
    val mm = graft.similarity.Sq.fitMinMax(emb, dim = 8)
    val codes = emb.select($"id",
      graft.similarity.Sq.encodeUdf(mm)($"vec").as("code"))
    val byId = codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    def dot(a: Array[Byte], b: Array[Byte]): Long =
      a.indices.map(i => (a(i) & 0xff).toLong * (b(i) & 0xff)).sum
    val queries = emb.filter($"id" % 40 === 0)
    val expected = byId.keys.filter(_ % 40 == 0).toSeq.sorted.flatMap { q =>
      byId.toSeq.filter(_._1 != q)
        .map { case (id, c) => (id, dot(byId(q), c)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }
    val got = graft.similarity.Sq.sdcTopK(queries, codes, mm, k = 5)
      .orderBy($"query_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("persisted BM25 index: probe equals direct scan, buckets pruned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-index").toString
    val terms = Seq("customer", "merge", "window")
    graft.text.Bm25.buildIndex(docs, "doc_id", "text", dir)
    val probed = graft.text.Bm25.probeIndex(spark, dir, terms, k = 25)
    val direct = graft.text.Bm25.topK(docs, "doc_id", "text", terms,
        k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(direct.nonEmpty)
    assert(got === direct)
    // the postings scan must be partition-pruned to the query terms'
    // hash buckets — plan-time PartitionFilters, not a runtime filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"), plan.take(2000))
    assert(plan.contains("bucket#") && plan.contains("IN ("),
      plan.take(2000))
  }

  test("BM25 index append: probe indistinguishable from a fresh build") {
    val terms = Seq("customer", "merge", "window")
    val base = docs.filter($"doc_id" % 3 =!= 0)
    val delta = docs.filter($"doc_id" % 3 === 0)
    val incDir = java.nio.file.Files
      .createTempDirectory("graft-bm25-inc").toString
    graft.text.Bm25.buildIndex(base, "doc_id", "text", incDir)
    // a probe between build and append sees only the base corpus
    val baseOnly = graft.text.Bm25.probeIndex(spark, incDir, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val baseDirect = graft.text.Bm25.topK(base, "doc_id", "text", terms,
        k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(baseOnly === baseDirect)
    graft.text.Bm25.appendToIndex(delta, "doc_id", "text", incDir)
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft-bm25-full").toString
    graft.text.Bm25.buildIndex(docs, "doc_id", "text", fullDir)
    val inc = graft.text.Bm25.probeIndex(spark, incDir, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = graft.text.Bm25.probeIndex(spark, fullDir, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc === full)
    assert(inc !== baseOnly, "append must actually change the ranking")
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("dataset split: stable proportions; cluster-keyed split stops leakage") {
    val ids = spark.range(10000L).toDF("doc_id")
    val split = ids.select($"doc_id",
      TextStats.datasetSplit($"doc_id", 99L).as("split"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 7600L && counts("train") < 8400L,
      counts.toString)
    assert(counts("val") > 800L && counts("val") < 1200L, counts.toString)
    assert(counts("test") > 800L && counts("test") < 1200L, counts.toString)
    // membership is a pure function of (seed, id): layout-invariant
    val again = ids.repartition(7).select($"doc_id",
        TextStats.datasetSplit($"doc_id", 99L).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === split.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet)
    // this corpus HAS near-dup pairs the naive per-doc split separates
    // (train/test leakage); the cluster-keyed split must never
    val pairs = relational.PipelineQueries
      .verifiedNearDupPairs(spark, sf, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val naive = relational.PipelineQueries
      .queries("q90_dataset_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.count { case (a, b) => naive(a) != naive(b) } >= 1,
      "corpus must exhibit naive-split leakage for this test to bite")
    val safe = relational.PipelineQueries
      .queries("q91_leakage_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(safe(a) === safe(b), s"pair ($a,$b) split apart")
    }
  }
}
