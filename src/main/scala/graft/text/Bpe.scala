package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a corpus — the missing
  * step between the engine's token-count heuristics
  * (`TextStats.wordCount` / `subwordCount`) and a real subword
  * vocabulary (Sennrich et al. 2016; the HF `tokenizers` BPE trainer
  * architecture).
  *
  * Scale shape — the part that matters at 100 TB: BPE never needs the
  * corpus, only the WORD-COUNT DICTIONARY (merging is defined on
  * word types weighted by frequency, not on tokens). So training is
  * ONE distributed pass (`unigramCounts`: map-side-combining groupBy)
  * cut to the top-`maxWords` types by a TakeOrdered, and the merge
  * loop runs on the driver over that bounded dictionary — the same
  * split the HF trainer uses (corpus pass → word counts → in-memory
  * merges). Encoding then broadcasts the merge ranks and is a
  * stateless row-local map, usable identically in batch and streams.
  *
  * Determinism: merge selection orders by (pair count desc, left,
  * right) — a total order both across runs and across engines; the
  * word-count cut reuses `unigramCounts`' (count desc, word) order.
  * No end-of-word marker symbols (the HF default), documented so a
  * downstream consumer can add one as a pre-tokenization step.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbols (left, right)
    * fuse into left+right. Lower rank = earlier = higher priority.
    */
  case class Merge(rank: Int, left: String, right: String)

  /** Train `numMerges` merges from the corpus word-count dictionary.
    * `maxWords` bounds the driver collect (word TYPES, not tokens —
    * 65k types cover a tokenizer-training corpus slice; raise with a
    * thought to driver memory, it is the only non-distributed state).
    */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 65536): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be positive")
    import docs.sparkSession.implicits._
    val wordCounts = TextStats.unigramCounts(docs, textCol)
      .filter(length(col("word")) > 0)
      .orderBy(col("c").desc, col("word")).limit(maxWords)
      .as[(String, Long)].collect()
    fitFromCounts(wordCounts, numMerges)
  }

  /** The driver-side merge loop, exposed for golden tests: classic
    * greedy BPE over (word, count) pairs. O(numMerges * dictionary
    * symbols) — bounded by `maxWords`, never by the corpus.
    */
  private[graft] def fitFromCounts(wordCounts: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    // each word as its current symbol sequence (starts as code points)
    var words = wordCounts.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c)
    }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // total order: count desc, then lexicographic (left, right) —
        // deterministic across runs, JVMs, and hash-map iteration
        val ((l, r), _) = pairCounts.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        merges += Merge(rank, l, r)
        val fused = l + r
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l &&
                  syms(i + 1) == r) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one word with the learned merges — the standard BPE
    * encoder: repeatedly fuse the adjacent pair with the LOWEST merge
    * rank until none applies. Words with unseen pairs stay at the
    * character level (open vocabulary — the point of BPE).
    */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.toCharArray.map(_.toString).toVector
    var go = syms.length > 1
    while (go) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) go = false
      else {
        syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
          syms.drop(at + 2)
        go = syms.length > 1
      }
    }
    syms
  }

  /** Column of BPE subword tokens for whitespace-split `textCol` —
    * merge ranks travel in the UDF closure (Spark broadcasts it per
    * task; for multi-use register the returned column once per plan).
    * Null-safe: null text → empty token array.
    */
  def tokens(merges: Seq[Merge], textCol: Column): Column = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf((s: String) => {
      if (s == null) Seq.empty[String]
      else s.split(" ", -1).iterator.filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, ranks)).toSeq
    })
    enc(textCol)
  }

  /** Per-doc BPE token count under a fitted vocabulary — the REAL
    * form of `TextStats.subwordCount`'s regex estimate; same shape
    * (stateless scalar), so recipe operators downstream (packing,
    * budgets) can swap it in without plan changes.
    */
  def tokenCount(merges: Seq[Merge], textCol: Column): Column =
    size(tokens(merges, textCol))
}
