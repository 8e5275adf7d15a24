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
}
