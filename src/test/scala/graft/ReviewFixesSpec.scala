package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes._

/** Regressions for the round-1 code-review findings — each test encodes
  * the reported failure scenario.
  */
class ReviewFixesSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  test("sections: length-changing lowercase input cannot shift offsets") {
    // U+0130 expands under String.toLowerCase; with per-char folding the
    // trailing title still matches at the correct offsets.
    val text = "İİİİ bruit\nConclusion :\nRAS."
    val (titles, _) = Sections.matcher()(text)
    assert(titles.map(_.label) === Seq("conclusion"))
    val t = titles.head
    assert(text.substring(t.begin, t.end).equalsIgnoreCase("conclusion"))
  }

  test("dates: month/unit alternations do not fire inside words") {
    assert(Dates.extract("Il a 3 maisons en ville.").isEmpty)
    assert(Dates.extract("Depuis 2 analyses successives.").isEmpty)
    assert(Dates.extract("Une semaine de repos.").isEmpty)
    // real mentions still fire
    assert(Dates.extract("Vu en mai 2021.").nonEmpty)
    assert(Dates.extract("Depuis 2 ans.").nonEmpty)
  }

  test("dates: typographic apostrophe in aujourd’hui") {
    val ref = java.time.LocalDateTime.parse("2021-08-23T10:00:00")
    val es = Dates.extract("Consultation aujourd’hui.", Some(ref))
    assert(es.nonEmpty)
    assert(es.head.attrs("datetime").startsWith("2021-08-23"))
  }

  test("quantities: space-grouped thousands parse as one number") {
    val es = Quantities.extract("Leucocytes 4 500 /mm3.")
    assert(es.nonEmpty)
    assert(es.head.attrs("raw_value").toDouble === 4500.0)
  }

  test("quantities: unresolvable composed unit is skipped, not fatal") {
    // "g/24h/l" assembles from the regex but resolves to no unit
    val es = Quantities.extract("Valeur 3 g/24h/l incohérente, poids 70 kg.")
    assert(es.exists(_.attrs("raw_unit") == "kg"))
    assert(!es.exists(_.attrs("raw_unit").contains("24h/l")))
  }

  test("normalizer: accents and quotes fold independently") {
    val t = "Lésion “citée”"
    val accentsOnly = Normalizer.normalize(t, Tokenizer.tokenize(t),
      Normalizer.Options(accents = true, quotes = false))
    assert(accentsOnly.exists(_.norm == "lesion"))
    assert(accentsOnly.exists(_.norm == "“")) // quote untouched
    val quotesOnly = Normalizer.normalize(t, Tokenizer.tokenize(t),
      Normalizer.Options(accents = false, quotes = true))
    assert(quotesOnly.exists(_.norm == "lésion")) // accent untouched
    assert(quotesOnly.exists(_.norm == "\""))
  }

  test("nerChar: zero-length spans contribute no phantom positions") {
    import TestSpark.spark
    import spark.implicits._
    val pred = Seq(("d1", 5, 5, "x"), ("d1", 0, 2, "x"))
      .toDF("doc_id", "begin", "end", "label")
    val gold = Seq(("d1", 0, 2, "x")).toDF("doc_id", "begin", "end", "label")
    val m = graft.metrics.NerMetrics.nerChar(pred, gold).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("micro").getAs[Long]("n_pred") === 2L) // not 2 + phantoms
    assert(m("micro").getAs[Double]("precision") === 1.0)
  }

  test("asof join: atomic right row, null values, deterministic ties") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // right rows: (t=1: id=7, code=null), (t=2: id=null, code=X)
    val left = Seq((1L, "u", 100L)).toDF("lid", "k", "t")
      .withColumn("t", timestamp_micros($"t"))
    val right = Seq(
      (Some(7L), Option.empty[String], "u", 10L),
      (Option.empty[Long], Some("X"), "u", 20L))
      .toDF("rid", "rcode", "rk", "rt")
      .withColumn("rt", timestamp_micros($"rt"))
    val out = graft.operators.AsOfJoin.backward(left, right,
      $"k", $"rk", $"t", $"rt", Seq($"rid", $"rcode")).head()
    // the LATEST right ROW is (null, X) — not a mix of both rows
    assert(out.isNullAt(out.fieldIndex("rid")))
    assert(out.getAs[String]("rcode") === "X")
  }

  test("cosine of a zero vector is 0, never NaN/rank-1") {
    import TestSpark.spark
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val top = graft.similarity.Ann.bruteForceTopK(
      emb.filter($"id" === 1), emb, k = 1).head()
    assert(top.getAs[Long]("neighbor_id") === 2L) // not the zero vector
  }

  test("standoff: malformed span line skipped; relations round-trip") {
    import TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("brat-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "d.txt"), "abc def")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "d.ann"),
      "T1\tx 10\tbroken-single-offset\n" +   // malformed: skipped
      "T2\tok 0 3\tabc\n" +
      "R1\trel Arg1:T2 Arg2:T2\n")
    val df = graft.io.Standoff.read(spark, dir)
    val row = df.head()
    val ents = row.getSeq[org.apache.spark.sql.Row](2)
    assert(ents.map(_.getString(0)) === Seq("T2"))
    val out = java.nio.file.Files.createTempDirectory("brat-bad-out").toString
    graft.io.Standoff.write(df, out)
    val ann = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "d.ann"))
    assert(ann.contains("R1\trel Arg1:T2 Arg2:T2"))
  }

  test("conll: truncated data line yields null fields, not a job failure") {
    import TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("conll-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "s.conllu"),
      "1\tLe\tle\tDET\t_\t_\t2\tdet\t_\t_\n2\ttruncated\n")
    val words = graft.io.Conll.read(spark, s"$dir/*.conllu")
      .selectExpr("explode(words) as w").select("w.FORM", "w.MISC").collect()
    assert(words.length === 2)
    assert(words(1).getString(0) === "truncated")
    assert(words(1).isNullAt(1)) // missing field -> null
  }

  test("lsh bands guard is mandatory") {
    import TestSpark.spark
    import spark.implicits._
    val sigs = Seq((1L, Seq(1L, 2L))).toDF("id", "sig")
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.lshCandidatePairs(sigs, "id", bands = 16,
        sigLength = 2)
    }
  }

  test("asof join tie-break works with map-typed right values") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, "u", 100L)).toDF("lid", "k", "t")
      .withColumn("t", timestamp_micros($"t"))
    val right = Seq((7L, "u", 10L)).toDF("rid", "rk", "rt")
      .withColumn("rt", timestamp_micros($"rt"))
      .withColumn("rattrs", map(lit("a"), lit("b")))
    val out = graft.operators.AsOfJoin.backward(left, right,
      $"k", $"rk", $"t", $"rt", Seq($"rid", $"rattrs")).head()
    assert(out.getAs[Long]("rid") === 7L)
    assert(out.getAs[Map[String, String]]("rattrs") === Map("a" -> "b"))
  }

  test("quantities: grouped thousands with decimal tail") {
    val es = graft.pipes.Quantities.extract("Plaquettes 4 500,5 /mm3.")
    assert(es.nonEmpty)
    assert(es.head.attrs("raw_value").toDouble === 4500.5)
  }

  test("fuzzy similarity attr uses ROOT-locale decimal point") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      val m = graft.nlp.FuzzyMatcher.build("x", Seq("paracetamol"))
      val s = "paracetemol pris"
      val toks = graft.nlp.Normalizer.normalize(s,
        graft.nlp.Tokenizer.tokenize(s))
      val hit = m.findMatches(toks, s).head
      assert(hit.attrs("similarity").contains("."))
      assert(hit.attrs("similarity").toDouble > 0.5)
    } finally java.util.Locale.setDefault(saved)
  }

  test("short docs get content-dependent fingerprints and signatures") {
    import TestSpark.spark
    import spark.implicits._
    // one- and two-word docs must NOT be mutual near-duplicates
    val docs = Seq((1L, "foo bar"), (2L, "lorem ipsum"), (3L, "foo bar"))
      .toDF("doc_id", "text")
    val dups = graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text",
      radius = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups === Set((1L, 3L))) // identical short docs only
    val mh = graft.dedup.Dedup.minHashNearDuplicates(docs, "doc_id",
      "text", threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === Set((1L, 3L)))
  }

  test("cosine accepts float arrays and neutralizes ragged/null vectors") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val sim = df.select(graft.similarity.Ann.cosine($"a", $"b")).head()
      .getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    // ragged lengths score 0, not a truncated partial similarity
    val ragged = Seq((Seq(1.0, 0.0), Seq(1.0))).toDF("a", "b")
      .select(graft.similarity.Ann.cosine($"a", $"b")).head().getDouble(0)
    assert(ragged === 0.0)
  }

  test("LLM annotator stays lazy over large partitions") {
    // 1000 one-doc batches with concurrency 2: if the operator
    // materialized all batches eagerly, callCount would hit 1000 before
    // the first result; lazily it stays near the in-flight bound.
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val it = LlmAnnotator.annotatePartition(
      (1L to 1000L).iterator.map(i => (i, s"doc $i")),
      callModel = { b => calls.incrementAndGet(); b },
      batchSize = 1,
      config = LlmAnnotator.Config(concurrency = 2, retryBackoffMs = 1))
    val first = it.next()
    assert(first._1 === 1L)
    assert(calls.get() <= 8, s"eager materialization: ${calls.get()} calls")
    assert(it.size === 999) // drain the rest
  }
}
