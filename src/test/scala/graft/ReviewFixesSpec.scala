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

  test("nerToken: zero-length spans contribute no phantom positions") {
    import TestSpark.spark
    import spark.implicits._
    val pred = Seq(("d1", 5, 5, "x"), ("d1", 0, 2, "x"))
      .toDF("doc_id", "begin", "end", "label")
    val gold = Seq(("d1", 0, 2, "x")).toDF("doc_id", "begin", "end", "label")
    val m = graft.metrics.NerMetrics.nerToken(pred, gold).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("micro").getAs[Long]("n_pred") === 2L) // not 2 + phantoms
    assert(m("micro").getAs[Double]("precision") === 1.0)
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
