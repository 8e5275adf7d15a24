package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipes.TrainableStages

class TrainableStagesSpec extends AnyFunSuite {

  test("windows: strided coverage with clamped tail") {
    assert(TrainableStages.windows(10, 4, 2) ===
      Seq((0, 4), (2, 6), (4, 8), (6, 10)))
    assert(TrainableStages.windows(3, 8, 4) === Seq((0, 3)))
    assert(TrainableStages.windows(0, 8, 4) === Nil)
    // no-overlap mode (training_stride=False shape): stride == window
    assert(TrainableStages.windows(10, 4, 4) ===
      Seq((0, 4), (4, 8), (8, 10)))
  }

  test("pooling: every token picks its most-central occurrence") {
    val n = 10
    val pick = TrainableStages.pooling(n, 4, 2)
    // every token assigned exactly one valid occurrence
    val ws = TrainableStages.windows(n, 4, 2)
    pick.zipWithIndex.foreach { case ((wi, off), i) =>
      val (s, e) = ws(wi)
      assert(s + off === i && i < e)
    }
    // token 4 occurs in windows (0,4)x? no, in (2,6) and (4,8): centers
    // 3.5 and 5.5 -> distance 0.5 vs 1.5 -> window 1 wins
    assert(pick(4)._1 === 1)
    // token 5: windows (2,6) center 3.5 (d=1.5), (4,8) center 5.5
    // (d=0.5) -> window 2
    assert(pick(5)._1 === 2)
  }

  test("CRF: constrained Viterbi only emits legal BIOUL paths") {
    import graft.pipes.NerCrf
    // 1 label -> tags O=0 I=1 B=2 L=3 U=4. Emissions push a raw argmax
    // toward an ILLEGAL sequence (I with no B, dangling B at the end):
    val e = Array(
      Array(0.0, 5.0, 1.0, 0.0, 0.0), // argmax I (illegal start)
      Array(0.0, 5.0, 0.0, 1.0, 0.0), // argmax I
      Array(0.0, 0.0, 5.0, 0.0, 0.0)) // argmax B (illegal end)
    val raw = e.map(r => r.indexOf(r.max))
    assert(raw.toSeq === Seq(1, 1, 2), "premise: raw argmax is illegal")
    val path = NerCrf.viterbi(e, NerCrf.bioulConstraints(1))
    // legal decode: B I L — starts with B, ends with L, keeps the high
    // I scores in the middle
    assert(path.toSeq === Seq(2, 1, 3))
    assert(NerCrf.tagsToSpans(path) === Seq((0, 3, 0)))
  }

  test("CRF: multi-label spans and singletons decode to spans") {
    import graft.pipes.NerCrf
    // 2 labels; build emissions that spell "U(0) O B(1) L(1)"
    def oneHot(tag: Int, n: Int = 9) =
      Array.tabulate(n)(j => if (j == tag) 10.0 else 0.0)
    val U0 = 4; val B1 = 6; val L1 = 7
    val e = Array(oneHot(U0), oneHot(0), oneHot(B1), oneHot(L1))
    val spans = NerCrf.decodeToSpans(e, numLabels = 2)
    assert(spans === Seq((0, 1, 0), (2, 4, 1)))
  }

  test("dep decoder: MST matches brute force on random score matrices") {
    import graft.pipes.DepDecoder
    val rng = new scala.util.Random(17)
    // brute force: enumerate every head assignment, keep trees
    // (reachable from root, acyclic), maximize score
    def brute(s: Array[Array[Double]], oneRoot: Boolean): Double = {
      val n = s.length
      def assignments(v: Int): Seq[List[Int]] =
        if (v == n) Seq(Nil)
        else for {
          h <- 0 until n; if h != v
          rest <- assignments(v + 1)
        } yield h :: rest
      val valid = assignments(1).filter { hs =>
        val heads = 0 :: hs
        val arr = heads.toArray
        // acyclic + all reachable from 0
        (1 until n).forall { v =>
          var cur = v; var steps = 0
          while (cur != 0 && steps <= n) { cur = arr(cur); steps += 1 }
          cur == 0
        } && (!oneRoot || hs.count(_ == 0) == 1)
      }
      valid.map(hs => hs.zipWithIndex.map {
        case (h, i) => s(i + 1)(h)
      }.sum).max
    }
    def score(s: Array[Array[Double]], heads: Array[Int]): Double =
      (1 until s.length).map(v => s(v)(heads(v))).sum
    for (_ <- 0 until 30; n <- Seq(3, 4, 5)) {
      val s = Array.fill(n, n)(rng.nextDouble() * 10 - 5)
      val t = DepDecoder.mst(s)
      assert(math.abs(score(s, t) - brute(s, oneRoot = false)) < 1e-9,
        s"mst suboptimal on ${s.map(_.mkString(",")).mkString(";")}")
      val t1 = DepDecoder.mstOneRoot(s)
      assert((1 until n).count(t1(_) == 0) === 1)
      assert(math.abs(score(s, t1) - brute(s, oneRoot = true)) < 1e-9,
        "one-root mst suboptimal")
    }
  }

  test("dep decoder: greedy is the per-token argmax") {
    import graft.pipes.DepDecoder
    val s = Array(
      Array(0.0, 0.0, 0.0),
      Array(5.0, 0.0, 1.0),
      Array(0.0, 9.0, 0.0))
    assert(DepDecoder.greedy(s).toSeq === Seq(0, 0, 1))
  }

  test("QA decoder: best span and greedy non-overlapping top-k") {
    import graft.pipes.QaDecoder
    val start = Array(0.1, 5.0, 0.0, 3.0, 0.0)
    val end = Array(0.0, 1.0, 4.0, 0.0, 2.0)
    // best: s=1 (5.0) + e=2 (4.0) = 9.0 -> span [1, 3)
    assert(QaDecoder.bestSpan(start, end, maxLen = 3) ===
      Some((1, 3, 9.0)))
    // maxLen binds: with maxLen 1, best is s=1,e=1 -> 6.0
    assert(QaDecoder.bestSpan(start, end, maxLen = 1) ===
      Some((1, 2, 6.0)))
    // top-2 non-overlapping: [1,3) then the best disjoint span [3,5)
    val top = QaDecoder.topSpans(start, end, k = 2, maxLen = 3)
    assert(top.map(t => (t._1, t._2)) === Seq((1, 3), (3, 5)))
    // brute-force: no candidate under maxLen scores above the best
    val all = for {
      s <- 0 until 5; e <- s until math.min(5, s + 3)
    } yield start(s) + end(e)
    assert(all.max === 9.0)
  }

  test("span pooler: mean/max/sum over token ranges") {
    import graft.pipes.SpanPooler
    val emb = IndexedSeq(
      Array(1f, 0f), Array(3f, 2f), Array(5f, 4f))
    val spans = Seq((0, 2), (1, 3), (5, 9))
    val mean = SpanPooler.pool(emb, spans, SpanPooler.Mean)
    assert(mean(0).toSeq === Seq(2f, 1f))
    assert(mean(1).toSeq === Seq(4f, 3f))
    assert(mean(2).toSeq === Seq(0f, 0f)) // out-of-range -> zeros
    val mx = SpanPooler.pool(emb, Seq((0, 3)), SpanPooler.Max)
    assert(mx.head.toSeq === Seq(5f, 4f))
    val sm = SpanPooler.pool(emb, Seq((0, 3)), SpanPooler.Sum)
    assert(sm.head.toSeq === Seq(9f, 6f))
  }

  test("embedTokens: overlapping windows keep the contextualized vector") {
    // fake forward: embedding of a token = [token value, window sum] so
    // the same token embeds DIFFERENTLY per window — the output must
    // carry the most-central window's version
    val tokens = (0 until 10).map(_.toFloat)
    val got = TrainableStages.embedTokens(tokens, 4, 2) { batches =>
      batches.map { w =>
        val sum = w.sum
        w.map(t => Array(t, sum))
      }
    }
    assert(got.length === 10)
    (0 until 10).foreach(i => assert(got(i)(0) === i.toFloat))
    // token 4's vector comes from window (2,6): sum 2+3+4+5 = 14
    assert(got(4)(1) === 14f)
    // token 5's vector comes from window (4,8): sum 4+5+6+7 = 22
    assert(got(5)(1) === 22f)
  }

  test("span classifier: per-group argmax with label filters") {
    import graft.pipes.SpanClassifier
    import graft.pipes.SpanClassifier.Binding
    val bindings = Seq(
      Binding("negation", None, IndexedSeq("false", "true")),
      Binding("event", Some(Set("date")), IndexedSeq("start", "stop")))
    assert(SpanClassifier.offsets(bindings) === Seq(0, 2))
    // scores: negation slice [0,2) argmax -> "true"; event slice [2,4)
    // argmax -> "start"
    val scores = Array(0.1, 0.9, 3.0, 2.0)
    // a "date" span gets both attributes
    assert(SpanClassifier.decode(bindings, "date", scores) ===
      Map("negation" -> "true", "event" -> "start"))
    // a "drug" span: event group's label filter excludes it
    assert(SpanClassifier.decode(bindings, "drug", scores) ===
      Map("negation" -> "true"))
    // tie breaks toward the lowest value index (torch argmax)
    val tied = Array(0.5, 0.5, 1.0, 1.0)
    assert(SpanClassifier.decode(bindings, "date", tied) ===
      Map("negation" -> "false", "event" -> "start"))
  }

  test("span linker: cosine scores, synonym rows, threshold to None") {
    import graft.pipes.SpanLinker
    val matrix = IndexedSeq(
      Array(1.0, 0.0), // row 0 -> concept C1
      Array(0.0, 1.0), // row 1 -> concept C2
      Array(1.0, 1.0)) // row 2 -> concept C2 (synonym mode: 2 rows)
    val rowConcept = Map(0 -> "C1", 1 -> "C2", 2 -> "C2")
    val s = SpanLinker.scores(Array(2.0, 2.1), matrix)
    // nearest row is 2 (cosine ~1), so synonym mode links to C2
    val (c, p) = SpanLinker.decode(s, rowConcept, SpanLinker.Softmax)
    assert(c === Some("C2"))
    assert(p > 0.3 && p <= 1.0)
    // group restriction masks out row 2: winner becomes row 1 (C2 still,
    // via the y-axis synonym) — and restricting to row 0 only gives C1
    val s0 = SpanLinker.scores(Array(2.0, 2.1), matrix,
      allowed = Some(Set(0)))
    assert(SpanLinker.decode(s0, rowConcept)._1 === Some("C1"))
    // threshold above the achievable probability -> None, prob reported
    val (none, prob) = SpanLinker.decode(s, rowConcept,
      SpanLinker.Softmax, threshold = 1.1)
    assert(none === None && prob > 0.0)
    // sigmoid mode: monotone in the raw score
    val (cs, ps) = SpanLinker.decode(s, rowConcept, SpanLinker.Sigmoid)
    assert(cs === Some("C2") && ps > 0.5)
  }

  test("text_cnn: conv padding/taps match a hand-computed example") {
    import graft.pipes.TextCnn
    import graft.pipes.TextCnn.{Conv, Linear, Weights}
    // dim=1, x = [1, 2, 3]
    // k=3 kernel, taps (1, 10, 100), pad 1 left / 1 right:
    //   c(t) = x[t-1] + 10 x[t] + 100 x[t+1]  -> 210, 321, 32
    // k=2 kernel, taps (1, 1000), bias -5, pad 1 left / 0 right:
    //   c2(t) = x[t-1] + 1000 x[t] - 5        -> 995, 1996, 2997
    // relu no-op (all positive), linear [1, -1] bias 0.5:
    //   y(t) = c - c2 + 0.5 -> -784.5, -1674.5, -2964.5
    val w = Weights(
      convs = Seq(
        Conv(Array(Array(Array(1.0, 10.0, 100.0))), Array(0.0)),
        Conv(Array(Array(Array(1.0, 1000.0))), Array(-5.0))),
      linear = Linear(Array(Array(1.0, -1.0)), Array(0.5)),
      residual = false)
    val x = IndexedSeq(Array(1.0), Array(2.0), Array(3.0))
    val got = TextCnn.forward(x, w)
    assert(got.map(_.toSeq) ===
      Seq(Seq(-784.5), Seq(-1674.5), Seq(-2964.5)))
    assert(TextCnn.forward(IndexedSeq.empty, w).isEmpty)
  }

  test("text_cnn: residual pre/post/none layer-norm arithmetic") {
    import graft.pipes.TextCnn
    import graft.pipes.TextCnn.{Conv, Linear, Weights}
    // dim=2, center-tap identity conv (k=3), linear doubles: y = 2x.
    val idConv = Conv(
      Array(Array(Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0)),
        Array(Array(0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))),
      Array(0.0, 0.0))
    val lin = Linear(Array(Array(2.0, 0.0), Array(0.0, 2.0)),
      Array(0.0, 0.0))
    val x = IndexedSeq(Array(1.0, 2.0), Array(3.0, 4.0))
    // pre: out = x + layer_norm(2x); 2x=(2,4): mean 3, var 1
    //   -> ln = -/+ 1/sqrt(1 + 1e-5) = -/+ 0.9999950
    val pre = TextCnn.forward(x,
      Weights(Seq(idConv), lin, residual = true, TextCnn.Pre))
    assert(math.abs(pre(0)(0) - (1.0 - 0.9999950)) < 1e-6)
    assert(math.abs(pre(0)(1) - (2.0 + 0.9999950)) < 1e-6)
    assert(math.abs(pre(1)(0) - (3.0 - 0.9999950)) < 1e-6)
    // post: out = layer_norm(x + 2x) = layer_norm(3x); 3x=(3,6):
    //   mean 4.5, sd 1.5 -> -/+ 1.4999925/1.5
    val post = TextCnn.forward(x,
      Weights(Seq(idConv), lin, residual = true, TextCnn.Post))
    assert(math.abs(post(0)(0) + 1.5 / math.sqrt(2.25 + 1e-5)) < 1e-6)
    assert(math.abs(post(0)(1) - 1.5 / math.sqrt(2.25 + 1e-5)) < 1e-6)
    // none: out = x + 2x = 3x
    val none = TextCnn.forward(x,
      Weights(Seq(idConv), lin, residual = true, TextCnn.NoNorm))
    assert(none.map(_.toSeq) === Seq(Seq(3.0, 6.0), Seq(9.0, 12.0)))
  }
}
