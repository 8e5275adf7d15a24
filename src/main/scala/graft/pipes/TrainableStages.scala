package graft.pipes

/** The Spark-side mechanics of the trainable embedding pipes — the
  * windowing/pooling math of the reference transformer component
  * (`/root/reference/edsnlp/pipes/trainable/embeddings/transformer/
  * transformer.py:69-127`): long documents split into strided token
  * windows before the model forward, and tokens that appear in several
  * overlapping windows keep the embedding of their "most contextualized"
  * occurrence — the one closest to its window's center. The model
  * forward itself stays injected (no torch in this container); on a GPU
  * cluster the stage runs through [[graft.operators.GpuStage]] so the
  * window batches cross as Arrow batches on a ResourceProfile-pinned
  * stage.
  */
object TrainableStages {

  /** Strided [begin, end) token windows covering all `n` tokens:
    * starts at 0, `stride`, 2·stride, ...; the last window clamps to
    * `n`. `window = 128, stride = 96` are the reference defaults.
    */
  def windows(n: Int, window: Int, stride: Int): Seq[(Int, Int)] = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window (got window=$window stride=$stride)")
    if (n <= 0) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var done = false
    while (!done) {
      val end = math.min(start + window, n)
      out += ((start, end))
      if (end >= n) done = true else start += stride
    }
    out.toSeq
  }

  /** For each token 0..n-1, the (windowIdx, offsetInWindow) occurrence
    * closest to its window's center (ties -> earlier window) — the
    * reference's most-contextualized-occurrence selection for
    * overlapping windows.
    */
  def pooling(n: Int, window: Int, stride: Int): Seq[(Int, Int)] = {
    val ws = windows(n, window, stride)
    (0 until n).map { i =>
      var best = -1
      var bestOff = 0
      var bestDist = Double.MaxValue
      ws.zipWithIndex.foreach { case ((s, e), wi) =>
        if (i >= s && i < e) {
          val center = s + (e - s - 1) / 2.0
          val d = math.abs(i - center)
          if (d < bestDist) { bestDist = d; best = wi; bestOff = i - s }
        }
      }
      (best, bestOff)
    }
  }

  /** Per-token embeddings for one document: run `forward` over the
    * token windows (one batch, the device round-trip) and keep each
    * token's most-contextualized occurrence. `forward` maps a batch of
    * token windows to one vector per position per window.
    */
  def embedTokens[T](
      tokens: IndexedSeq[T], window: Int, stride: Int)(
      forward: Seq[IndexedSeq[T]] => Seq[IndexedSeq[Array[Float]]])
      : IndexedSeq[Array[Float]] = {
    val n = tokens.length
    if (n == 0) return IndexedSeq.empty
    val ws = windows(n, window, stride)
    val batches = ws.map { case (s, e) => tokens.slice(s, e) }
    val out = forward(batches)
    require(out.size == ws.size,
      s"forward returned ${out.size} windows for ${ws.size}")
    val pick = pooling(n, window, stride)
    (0 until n).map { i =>
      val (wi, off) = pick(i)
      out(wi)(off)
    }
  }
}
