package graft.dedup

/** Shared single-pass shingle hashing for the fused dedup UDFs.
  *
  * Tokenization is SINGLE-SPACE splitting — exactly `split(text, " ")`
  * (empty tokens between doubled spaces included) — so fused signatures
  * stay consistent with the expression-built verification shingles
  * (`shingleHashes64`) and the DuckDB oracles: LSH banding probability
  * must track the same shingle sets the verifier measures.
  *
  * Degenerate docs (fewer than n words but at least one) emit ONE shingle
  * over all available words, mirroring `sequence(0, greatest(size-n, 0))`
  * in the expression form — without this, every short doc hashes
  * identically (empty set) and becomes a false near-duplicate of every
  * other short doc.
  */
private[graft] object Shingling {

  /** Apply `f` to the splitmix-finalized hash of every n-gram shingle of
    * `text`. Duplicate shingles are NOT deduplicated here (min-hash is
    * multiset-invariant; simhash dedups with its own seen-set).
    */
  def foreachShingleHash(text: String, n: Int)(f: Long => Unit): Unit = {
    if (text == null) return
    // FNV-1a per single-space-separated token
    val wordHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == ' ') {
        wordHashes += h
        h = 0xCBF29CE484222325L
      } else {
        h = (h ^ c) * 0x100000001B3L
      }
      i += 1
    }
    wordHashes += h
    val count = math.max(wordHashes.length - n + 1, 1)
    val width = math.min(n, wordHashes.length)
    var j = 0
    while (j < count) {
      var sh = 0L
      var k = 0
      while (k < width) {
        sh = sh * 0x9E3779B97F4A7C15L + wordHashes(j + k)
        k += 1
      }
      var z = sh
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      f(z)
      j += 1
    }
  }
}
