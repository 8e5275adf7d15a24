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

  test("nerToken: char-position sets") {
    val m = NerMetrics.nerToken(
      pred.filter($"doc_id" === "d1"), gold.filter($"doc_id" === "d1"))
      .collect().map(r => r.getString(0) -> r).toMap
    // pred chars: 0-4 (5) + 10-17 (8) = 13; gold: 0-4 + 10-14 = 10; tp = 10
    assert(m("micro").getAs[Long]("n_pred") === 13L)
    assert(m("micro").getAs[Long]("n_gold") === 10L)
    assert(m("micro").getAs[Double]("recall") === 1.0)
  }

  test("spanAttribute: accuracy over matched spans") {
    val r = NerMetrics.spanAttribute(pred, gold, "negation").head()
    // matched spans: (d1,0,5), (d2,0,4); negation agrees on first only
    assert(r.getAs[Long]("n_spans") === 2L)
    assert(r.getAs[Double]("accuracy") === 0.5)
  }
}
