package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Batching

/** Batch-boundary goldens from the reference batching suite
  * (`/root/reference/tests/utils/test_batching.py:41-128`): a batch
  * closes exactly when admitting the next item would exceed the budget,
  * under each policy. (Sentinel modes are n/a by design — explicit
  * partitions/files in batch, watermarks in streaming.)
  */
class BatchingSpec extends AnyFunSuite {

  private def run[T](items: Seq[T], limit: Long,
      policy: Batching.Policy, sizeOf: T => Long): Seq[Seq[T]] =
    Batching.batchify(items.iterator, limit, policy, sizeOf).toSeq

  test("batchify by count (test_batchify_simple)") {
    assert(run(Seq(1, 2, 3, 4, 5), 2, Batching.Docs, (_: Int) => 1L) ===
      Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
  }

  test("batchify by length sum (test_batchify_by_length_sum_simple)") {
    val data = Seq("a", "bb", "ccc", "dddd", "eeeee")
    assert(run(data, 5, Batching.Words, (s: String) => s.length.toLong)
      === Seq(Seq("a", "bb"), Seq("ccc"), Seq("dddd"), Seq("eeeee")))
  }

  test("batchify by padded cost (test_batchify_by_padded_simple)") {
    // padded cost = max_len * count: [a,bb] costs 4, +ccc would be 9
    val data = Seq("a", "bb", "ccc", "dddd")
    assert(run(data, 6, Batching.PaddedWords,
      (s: String) => s.length.toLong) ===
      Seq(Seq("a", "bb"), Seq("ccc"), Seq("dddd")))
  }

  test("size-expression parser covers the reference spellings") {
    assert(Batching.parseSizeExpr("1024 words") ===
      ((1024L, Batching.Words)))
    assert(Batching.parseSizeExpr("16 docs") === ((16L, Batching.Docs)))
    assert(Batching.parseSizeExpr("8000 padded_words") ===
      ((8000L, Batching.PaddedWords)))
  }

  test("an oversized single item still forms its own batch") {
    // no item is ever dropped: a document larger than the budget rides
    // alone (the reference yields it as a singleton batch too)
    assert(run(Seq("aaaaaaaaaa", "b"), 5, Batching.Words,
      (s: String) => s.length.toLong) ===
      Seq(Seq("aaaaaaaaaa"), Seq("b")))
  }
}
