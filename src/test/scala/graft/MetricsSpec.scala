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
