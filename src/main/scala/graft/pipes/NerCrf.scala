package graft.pipes

/** The inference-time math of the `eds.ner_crf` pipe — a faithful
  * re-expression of the reference's constrained linear-chain CRF decoder
  * (`/root/reference/edsnlp/pipes/trainable/layers/crf.py:311-364`
  * `MultiLabelBIOULDecoder`, `decode` at `:108-170`): BIOUL hard
  * constraints as forbidden-transition masks (IMPOSSIBLE = -10000),
  * Viterbi argmax over emission scores, and tag-path → span conversion.
  * The EMISSIONS come from a model (torch stays out of this container);
  * everything after the linear layer — the part that turns scores into
  * legal spans — is pure math and runs row-local on executors.
  *
  * Tag layout (reference `crf.py:328-331`): `O = 0`, then per label `i`
  * the four tags `I = 1+4i, B = 2+4i, L = 3+4i, U = 4+4i`;
  * `numTags = 1 + 4·numLabels`.
  */
object NerCrf {

  val Impossible: Double = -10000.0

  case class Constraints(
      forbidden: Array[Array[Boolean]],
      startForbidden: Array[Boolean],
      endForbidden: Array[Boolean])

  /** The BIOUL constraint masks (`crf.py:332-364`). */
  def bioulConstraints(numLabels: Int): Constraints = {
    val numTags = 1 + 4 * numLabels
    val fb = Array.fill(numTags, numTags)(true)
    val O = 0
    def I(i: Int) = 1 + 4 * i
    def B(i: Int) = 2 + 4 * i
    def L(i: Int) = 3 + 4 * i
    def U(i: Int) = 4 + 4 * i
    fb(O)(O) = false
    for (i <- 0 until numLabels) {
      for (j <- 0 until numLabels) {
        fb(L(i))(B(j)) = false; fb(L(i))(U(j)) = false
        fb(U(i))(B(j)) = false; fb(U(i))(U(j)) = false
      }
      fb(O)(B(i)) = false
      fb(B(i))(I(i)) = false
      fb(I(i))(I(i)) = false
      fb(I(i))(L(i)) = false
      fb(B(i))(L(i)) = false
      fb(L(i))(O) = false
      fb(O)(U(i)) = false
      fb(U(i))(O) = false
    }
    val startFb = Array.fill(numTags)(false)
    val endFb = Array.fill(numTags)(false)
    for (i <- 0 until numLabels) {
      startFb(I(i)) = true; startFb(L(i)) = true
      endFb(I(i)) = true; endFb(B(i)) = true
    }
    Constraints(fb, startFb, endFb)
  }

  /** Constrained Viterbi decode (`crf.py:108-170`): learned transitions
    * are zero (the reference ner_crf uses `learnable_transitions=False`)
    * masked to IMPOSSIBLE where forbidden; start/end constraint scores
    * apply when `withStartEnd` (window < 1 in the reference).
    */
  def viterbi(
      emissions: Array[Array[Double]],
      c: Constraints,
      withStartEnd: Boolean = true): Array[Int] = {
    val n = emissions.length
    if (n == 0) return Array.empty
    val numTags = emissions(0).length
    val trans = Array.tabulate(numTags, numTags)((i, j) =>
      if (c.forbidden(i)(j)) Impossible else 0.0)
    val start = Array.tabulate(numTags)(j =>
      if (withStartEnd && c.startForbidden(j)) Impossible else 0.0)
    val end = Array.tabulate(numTags)(j =>
      if (withStartEnd && c.endForbidden(j)) Impossible else 0.0)
    val score = Array.ofDim[Double](n, numTags)
    val back = Array.ofDim[Int](n, numTags)
    var j = 0
    while (j < numTags) {
      score(0)(j) = emissions(0)(j) + start(j); j += 1
    }
    var t = 1
    while (t < n) {
      j = 0
      while (j < numTags) {
        var bestI = 0
        var best = Double.NegativeInfinity
        var i = 0
        while (i < numTags) {
          val s = score(t - 1)(i) + trans(i)(j)
          if (s > best) { best = s; bestI = i }
          i += 1
        }
        score(t)(j) = best + emissions(t)(j)
        back(t)(j) = bestI
        j += 1
      }
      t += 1
    }
    var last = 0
    var best = Double.NegativeInfinity
    j = 0
    while (j < numTags) {
      val s = score(n - 1)(j) + end(j)
      if (s > best) { best = s; last = j }
      j += 1
    }
    val path = new Array[Int](n)
    path(n - 1) = last
    t = n - 1
    while (t > 0) { path(t - 1) = back(t)(path(t)); t -= 1 }
    path
  }

  /** BIOUL tag path → (tokenBegin, tokenEnd exclusive, label) spans
    * (`crf.py tags_to_spans`). A constrained decode always yields legal
    * sequences; stray tags from an unconstrained path are skipped.
    */
  def tagsToSpans(path: Array[Int]): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var t = 0
    var open = -1 // token index where current span opened
    var openLabel = -1
    while (t < path.length) {
      val tag = path(t)
      if (tag == 0) { open = -1 }
      else {
        val label = (tag - 1) / 4
        (tag - 1) % 4 match {
          case 0 => // I: continue (only valid inside an open span)
          case 1 => open = t; openLabel = label // B
          case 2 => // L: close
            if (open >= 0 && openLabel == label) {
              out += ((open, t + 1, label)); open = -1
            }
          case 3 => out += ((t, t + 1, label)); open = -1 // U
        }
      }
      t += 1
    }
    out.toSeq
  }

  /** Full decode: emissions → spans. */
  def decodeToSpans(
      emissions: Array[Array[Double]], numLabels: Int,
      withStartEnd: Boolean = true): Seq[(Int, Int, Int)] =
    tagsToSpans(viterbi(emissions, bioulConstraints(numLabels),
      withStartEnd))
}

/** The decode side of `eds.extractive_qa` (the reference frames QA as
  * prompt-conditioned span extraction): from per-token START and END
  * logits pick the best-scoring spans with `start <= end <
  * start + maxLen` — the standard reading-comprehension decode. Top-k
  * selection is greedy non-overlapping (the usual answer-list shape).
  * Logits come from an injected model; the decode is row-local math.
  */
object QaDecoder {

  /** All candidate spans scored `startLogit + endLogit`, best first. */
  private def candidates(
      startLogits: Array[Double], endLogits: Array[Double],
      maxLen: Int): Seq[(Int, Int, Double)] = {
    val n = math.min(startLogits.length, endLogits.length)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Double)]
    var s = 0
    while (s < n) {
      var e = s
      while (e < math.min(n, s + maxLen)) {
        out += ((s, e + 1, startLogits(s) + endLogits(e)))
        e += 1
      }
      s += 1
    }
    out.sortBy { case (b, en, sc) => (-sc, b, en) }.toSeq
  }

  /** Best single answer span [begin, end) with its score. */
  def bestSpan(
      startLogits: Array[Double], endLogits: Array[Double],
      maxLen: Int = 30): Option[(Int, Int, Double)] =
    candidates(startLogits, endLogits, maxLen).headOption

  /** Greedy top-k NON-OVERLAPPING answer spans, best first. */
  def topSpans(
      startLogits: Array[Double], endLogits: Array[Double],
      k: Int, maxLen: Int = 30): Seq[(Int, Int, Double)] = {
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Double)]
    candidates(startLogits, endLogits, maxLen).foreach { c =>
      if (picked.size < k &&
        !picked.exists(p => c._1 < p._2 && c._2 > p._1))
        picked += c
    }
    picked.toSeq
  }
}
