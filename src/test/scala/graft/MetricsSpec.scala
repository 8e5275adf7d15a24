package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.NerMetrics

class MetricsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val pred = Seq(
    ("d1", 0, 5, "dis", true),   // exact match
    ("d1", 10, 18, "dis", false), // overlaps gold (10,15) only
    ("d2", 0, 4, "sym", true),   // exact match
    ("d2", 20, 25, "sym", false) // no gold
  ).toDF("doc_id", "begin", "end", "label", "negation")

  private lazy val gold = Seq(
    ("d1", 0, 5, "dis", true),
    ("d1", 10, 15, "dis", true),
    ("d2", 0, 4, "sym", false),
    ("d3", 1, 2, "dis", false) // missed entirely
  ).toDF("doc_id", "begin", "end", "label", "negation")

  test("nerExact: per-label + micro") {
    val m = NerMetrics.nerExact(pred, gold).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("dis").getAs[Double]("precision") === 0.5)   // 1 of 2
    assert(m("dis").getAs[Double]("recall") === 0.3333)  // 1 of 3 gold, 4dp
    assert(m("sym").getAs[Double]("precision") === 0.5)
    assert(m("micro").getAs[Long]("n_pred") === 4L)
    assert(m("micro").getAs[Long]("n_gold") === 4L)
    assert(m("micro").getAs[Double]("precision") === 0.5)
  }

  test("nerOverlap: overlapping spans count as hits") {
    val m = NerMetrics.nerOverlap(pred, gold).collect()
      .map(r => r.getString(0) -> r).toMap
    // dis: both preds overlap some gold -> precision 1.0;
    // gold (d3) unmatched -> recall 2/3
    assert(m("dis").getAs[Double]("precision") === 1.0)
    assert(m("dis").getAs[Double]("recall") === 0.6667) // 2 of 3, 4dp
    assert(m("sym").getAs[Double]("precision") === 0.5)
  }

  test("NER scorers: reference micro goldens (test_metrics.py:27-109)") {
    // the reference fixture, parsed from its markup form; spans are
    // converted to TOKEN indices (the unit the reference scores in)
    val fixtures = Seq(
      ("d1", "Le patient a [le covid](covid) 19.",
        "Le patient a [le covid](covid) 19."),
      ("d2", "[Corona](covid): positif. Le [cvid](covid) est " +
        "une [maladie très très grave](disease).",
        "[Corona:](covid) positif. Le cvid est une [maladie](disease) " +
          "très très grave."))
    def tokenSpans(docId: String, markup: String) = {
      val (text, ents) = io.Markup.parse(markup, "md")
      val words = graft.nlp.Tokenizer.tokenize(text)
        .filterNot(graft.nlp.Normalizer.isSpace)
      ents.map { e =>
        val ti = words.indexWhere(w => w.begin < e.end && w.end > e.begin)
        val tj = words.lastIndexWhere(w =>
          w.begin < e.end && w.end > e.begin)
        (docId, ti, tj + 1, e.label)
      }
    }
    val goldTok = fixtures.flatMap { case (id, g, _) => tokenSpans(id, g) }
      .toDF("doc_id", "begin", "end", "label")
    val predTok = fixtures.flatMap { case (id, _, p) => tokenSpans(id, p) }
      .toDF("doc_id", "begin", "end", "label")
    def micro(df: org.apache.spark.sql.DataFrame): Map[String, Any] = {
      val r = df.filter($"label" === "micro").collect().head
      r.schema.fieldNames.zip(r.toSeq).toMap
    }
    // exact: tp=1, positives=3, support=4 -> p=1/3, r=1/4, f=0.2857
    val ex = micro(NerMetrics.nerExact(predTok, goldTok))
    assert(ex("tp") === 1L && ex("n_pred") === 3L && ex("n_gold") === 4L)
    assert(ex("precision") === 0.3333 && ex("recall") === 0.25)
    // overlap any: tp=3/3, gold side 3/4 -> f=0.8571
    val any = micro(NerMetrics.nerOverlap(predTok, goldTok,
      threshold = 0.00001))
    assert(any("precision") === 1.0 && any("recall") === 0.75 &&
      any("f1") === 0.8571)
    // overlap half: p=2/3, r=2/4 -> f=0.5714
    val half = micro(NerMetrics.nerOverlap(predTok, goldTok))
    assert(half("precision") === 0.6667 && half("recall") === 0.5 &&
      half("f1") === 0.5714)
    // overlap full: p=1/3, r=1/4 -> f=0.2857
    val full = micro(NerMetrics.nerOverlap(predTok, goldTok,
      threshold = 1.0))
    assert(full("precision") === 0.3333 && full("recall") === 0.25 &&
      full("f1") === 0.2857)
    // token scorer: tp=4, positives=5, support=8 (test_token_ner_scorer)
    val docsDf = fixtures.map { case (id, g, _) =>
      (id, io.Markup.parse(g, "md")._1) }.toDF("doc_id", "text")
    val tokGold = fixtures.flatMap { case (id, g, _) =>
      io.Markup.parse(g, "md")._2.map(e => (id, e.begin, e.end, e.label))
    }.toDF("doc_id", "begin", "end", "label")
    val tokPred = fixtures.flatMap { case (id, _, p) =>
      io.Markup.parse(p, "md")._2.map(e => (id, e.begin, e.end, e.label))
    }.toDF("doc_id", "begin", "end", "label")
    val tok = micro(NerMetrics.nerToken(tokPred, tokGold, docsDf,
      "doc_id", "text"))
    assert(tok("tp") === 4L && tok("n_pred") === 5L &&
      tok("n_gold") === 8L)
    assert(tok("precision") === 0.8 && tok("recall") === 0.5)
  }

  test("spanAttribute: reference scorer goldens (test_metrics.py:111-216)") {
    // negation scorer: pred flags covid true where gold says false;
    // include_falsy=False drops falsy items, so gold has ONE item
    val predNeg = Seq(("d1", 0, 8, "true"), ("d1", 10, 21, "true"))
      .toDF("doc_id", "begin", "end", "negation")
    val goldNeg = Seq(("d1", 0, 8, "false"), ("d1", 10, 21, "true"))
      .toDF("doc_id", "begin", "end", "negation")
    val neg = NerMetrics.spanAttribute(predNeg, goldNeg, Seq("negation"))
      .collect().map(r => r.getString(0) -> r).toMap
    val m = neg("micro")
    assert(m.getAs[Long]("tp") === 1L && m.getAs[Long]("n_pred") === 2L &&
      m.getAs[Long]("n_gold") === 1L)
    assert(m.getAs[Double]("precision") === 0.5 &&
      m.getAs[Double]("recall") === 1.0 &&
      m.getAs[Double]("f1") === 0.6667)
    // split_by_values over a 3-span status fixture
    // (test_span_attribute_metric_split_by_values)
    val predSt = Seq(("d1", 0, 1, "present"), ("d1", 1, 2, "absent"),
      ("d1", 2, 3, "present")).toDF("doc_id", "begin", "end", "status")
    val goldSt = Seq(("d1", 0, 1, "present"), ("d1", 1, 2, "absent"),
      ("d1", 2, 3, "absent")).toDF("doc_id", "begin", "end", "status")
    val st = NerMetrics.spanAttribute(predSt, goldSt, Seq("status"),
      splitByValues = true).collect().map(r => r.getString(0) -> r).toMap
    val sm = st("micro")
    assert(sm.getAs[Long]("tp") === 2L && sm.getAs[Long]("n_pred") === 3L
      && sm.getAs[Long]("n_gold") === 3L)
    assert(sm.getAs[Double]("f1") === 0.6667)
    val present = st("status=present")
    assert(present.getAs[Long]("tp") === 1L &&
      present.getAs[Long]("n_pred") === 2L &&
      present.getAs[Long]("n_gold") === 1L)
    assert(present.getAs[Double]("precision") === 0.5 &&
      present.getAs[Double]("recall") === 1.0)
    val absent = st("status=absent")
    assert(absent.getAs[Long]("tp") === 1L &&
      absent.getAs[Long]("n_pred") === 1L &&
      absent.getAs[Long]("n_gold") === 2L)
    assert(absent.getAs[Double]("precision") === 1.0 &&
      absent.getAs[Double]("recall") === 0.5)
  }

  test("nerChar: char-position sets") {
    val m = NerMetrics.nerChar(
      pred.filter($"doc_id" === "d1"), gold.filter($"doc_id" === "d1"))
      .collect().map(r => r.getString(0) -> r).toMap
    // pred chars: 0-4 (5) + 10-17 (8) = 13; gold: 0-4 + 10-14 = 10; tp = 10
    assert(m("micro").getAs[Long]("n_pred") === 13L)
    assert(m("micro").getAs[Long]("n_gold") === 10L)
    assert(m("micro").getAs[Double]("recall") === 1.0)
  }

  test("nerToken: counts tokens, not chars (ner.py:66-99 parity)") {
    // doc d1 = "aaaa bb cc dd": tokens 0:(0,4) 1:(5,7) 2:(8,10) 3:(11,13)
    val docs = Seq(("d1", "aaaa bb cc dd")).toDF("doc_id", "text")
    val p = Seq(("d1", 0, 7, "x"), ("d1", 8, 10, "x"))
      .toDF("doc_id", "begin", "end", "label") // tokens {0,1} + {2}
    val g = Seq(("d1", 0, 4, "x"), ("d1", 8, 13, "x"))
      .toDF("doc_id", "begin", "end", "label") // tokens {0} + {2,3}
    val m = NerMetrics.nerToken(p, g, docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("micro").getAs[Long]("n_pred") === 3L) // token items, not 9 chars
    assert(m("micro").getAs[Long]("n_gold") === 3L)
    assert(m("micro").getAs[Double]("precision") === 0.6667) // tp = {0,2}
  }

  test("nerExact: duplicate spans do not deflate set-semantics counts") {
    val p = Seq(("d1", 0, 5, "x"), ("d1", 0, 5, "x"))
      .toDF("doc_id", "begin", "end", "label")
    val g = Seq(("d1", 0, 5, "x")).toDF("doc_id", "begin", "end", "label")
    val m = NerMetrics.nerExact(p, g).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("micro").getAs[Long]("n_pred") === 1L)
    assert(m("micro").getAs[Double]("precision") === 1.0)
    assert(m("micro").getAs[Double]("recall") === 1.0)
  }

  test("spanAttribute: set items over both sides, per-attr + micro PRF") {
    // items (truthy only): pred negation -> (d1,0,5), (d2,0,4);
    // gold negation -> (d1,0,5), (d1,10,15). tp = 1, np = 2, ng = 2.
    val m = NerMetrics.spanAttribute(pred, gold, Seq("negation")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("negation").getAs[Long]("tp") === 1L)
    assert(m("negation").getAs[Long]("n_pred") === 2L)
    assert(m("negation").getAs[Long]("n_gold") === 2L)
    assert(m("negation").getAs[Double]("precision") === 0.5)
    assert(m("negation").getAs[Double]("f1") === 0.5)
    assert(m("micro").getAs[Long]("tp") === 1L)
  }

  test("spanAttributeAccuracy: accuracy over matched spans") {
    val r = NerMetrics.spanAttributeAccuracy(pred, gold, "negation").head()
    // matched spans: (d1,0,5), (d2,0,4); negation agrees on first only
    assert(r.getAs[Long]("n_spans") === 2L)
    assert(r.getAs[Double]("accuracy") === 0.5)
  }

  test("depParsing: UAS/LAS match the reference arc-set prf") {
    import graft.metrics.DepParsing
    // 4 tokens; pred wrong head on token 2, wrong dep on token 3
    val g = Seq((1L, 0, 0, "root"), (1L, 1, 0, "a"), (1L, 2, 1, "b"),
      (1L, 3, 2, "c")).toDF("sent_id", "token_i", "head_i", "dep")
    val p = Seq((1L, 0, 0, "root"), (1L, 1, 0, "a"), (1L, 2, 0, "b"),
      (1L, 3, 2, "x")).toDF("sent_id", "token_i", "head_i", "dep")
    val m = DepParsing.uasLas(p, g).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("uas").getAs[Double]("f") === 0.75) // head wrong on 1 of 4
    assert(m("las").getAs[Double]("f") === 0.5)  // +1 dep-only error
    assert(m("uas").getAs[Long]("n_pred") === 4L)
  }
}
