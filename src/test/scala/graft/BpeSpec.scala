package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** BPE trainer goldens — the Sennrich et al. 2016 worked example,
  * hand-computed (no end-of-word marker), plus corpus-level sanity on
  * the real documents table.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("merge sequence matches the hand-computed Sennrich example") {
    val counts = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.fitFromCounts(counts, 5)
    // round 1: (e,s)=9 ties (s,t)=9 -> lexicographic; then (es,t)=9;
    // then (l,o)=(o,w)=7 -> lexicographic; then (lo,w)=7; then the
    // 6-count tie (e,w)/(n,e)/(w,est) -> (e,w)
    assert(merges.map(m => (m.left, m.right)) === Seq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
    assert(merges.map(_.rank) === Seq(0, 1, 2, 3, 4))
  }

  test("encoder applies merges by rank: unseen word segments correctly") {
    val counts = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.fitFromCounts(counts, 5)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // "lowest" is NOT in the training dictionary; classic result
    assert(Bpe.encodeWord("lowest", ranks) === Vector("low", "est"))
    // open vocabulary: fully unseen words fall back to characters
    assert(Bpe.encodeWord("xyz", ranks) === Vector("x", "y", "z"))
    // single char passes through
    assert(Bpe.encodeWord("a", ranks) === Vector("a"))
  }

  test("merge loop stops early when no pairs remain") {
    val merges = Bpe.fitFromCounts(Array(("ab", 3L)), 10)
    assert(merges === Seq(Bpe.Merge(0, "a", "b")))
  }

  test("corpus fit is deterministic and token counts are bounded") {
    val docs = relational.Tables.documents(spark, sf)
    val a = Bpe.fit(docs, "text", numMerges = 64)
    val b = Bpe.fit(docs, "text", numMerges = 64)
    assert(a === b)
    assert(a.size === 64)
    // per doc: words <= bpe tokens <= non-space chars, and the token
    // concatenation must reconstruct the words exactly (lossless)
    val stats = docs.select(
        graft.text.TextStats.wordCount($"text").cast("long").as("w"),
        Bpe.tokenCount(a, $"text").cast("long").as("t"),
        length(regexp_replace($"text", " ", "")).cast("long").as("ch"),
        (concat_ws("", Bpe.tokens(a, $"text")) ===
          regexp_replace($"text", " ", "")).as("lossless"))
      .agg(sum(when($"t" < $"w" || $"t" > $"ch", 1).otherwise(0)),
        sum(when(!$"lossless", 1).otherwise(0)))
      .collect()(0)
    assert(stats.getLong(0) === 0L, "token count out of [words, chars]")
    assert(stats.getLong(1) === 0L, "BPE tokenization not lossless")
  }
}
