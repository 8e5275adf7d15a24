package graft.pipes

/** The `eds.text_cnn` contextualizer's forward math
  * (`/root/reference/edsnlp/pipes/trainable/layers/text_cnn.py:25-135`,
  * `/root/reference/edsnlp/pipes/trainable/embeddings/text_cnn/
  * text_cnn.py:25-120`) with injected weights — the same
  * decode-mechanics-without-torch pattern as [[NerCrf]] / [[SpanPooler]]:
  * the container has no torch, so training/autograd are out of scope, but
  * the inference arithmetic is exact and spec-verified.
  *
  * Per token window w and kernel size k the reference convolves the
  * sequence zero-padded by `k / 2` on the left and `(k - 1) / 2` on the
  * right (so every kernel emits exactly one vector per token); kernel
  * outputs are concatenated channel-wise, passed through ReLU (the
  * reference's forward hardcodes `torch.relu` regardless of its
  * `activation` parameter — text_cnn.py:110), then a linear projection,
  * then an optional residual with layer normalization: `pre` adds the
  * normalized conv output to the input, `post` normalizes the sum,
  * `none` adds raw. `F.layer_norm(x, x.shape[-1:])` carries no learnable
  * affine, so the normalization here is plain (x - mean) / sqrt(var + eps).
  *
  * The reference's sequence-packing (flattening all docs into one long
  * conv with inter-doc zero gaps of `max_k - 1`) is a GPU memory layout
  * optimization, not semantics: gaps are sized so no window mixes two
  * docs, making packed output identical to per-doc convolution — which is
  * what a Spark row (one doc per row) gives for free.
  */
object TextCnn {

  sealed trait Normalize
  case object Pre extends Normalize
  case object Post extends Normalize
  case object NoNorm extends Normalize

  /** One conv kernel: `weight(outChannel)(inChannel)(tap)` + bias. */
  final case class Conv(weight: Array[Array[Array[Double]]],
      bias: Array[Double]) {
    def k: Int = weight(0)(0).length
    def outChannels: Int = weight.length
  }

  /** Linear projection: `weight(out)(in)` + bias. */
  final case class Linear(weight: Array[Array[Double]], bias: Array[Double])

  final case class Weights(
      convs: Seq[Conv],
      linear: Linear,
      residual: Boolean = true,
      normalize: Normalize = Pre)

  private val LayerNormEps = 1e-5

  private def layerNorm(v: Array[Double]): Array[Double] = {
    val n = v.length
    var mean = 0.0
    var i = 0
    while (i < n) { mean += v(i); i += 1 }
    mean /= n
    var varr = 0.0
    i = 0
    while (i < n) { val d = v(i) - mean; varr += d * d; i += 1 }
    varr /= n
    val inv = 1.0 / math.sqrt(varr + LayerNormEps)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = (v(i) - mean) * inv; i += 1 }
    out
  }

  /** Contextualize one doc's token embeddings. Output length equals input
    * length; an empty doc yields an empty output (the reference's
    * zero-size early return). With `residual`, input and output dims must
    * match (as in the reference, where residual implies
    * `output_size == input_size`).
    */
  def forward(embeddings: IndexedSeq[Array[Double]], w: Weights)
      : IndexedSeq[Array[Double]] = {
    val nWords = embeddings.length
    if (nWords == 0) return IndexedSeq.empty
    val dim = embeddings(0).length
    val channels = w.convs.map(_.outChannels).sum
    val outDim = w.linear.bias.length
    (0 until nWords).map { t =>
      // concatenated conv channels at token t, each kernel padded
      // k/2 left, (k-1)/2 right so it emits exactly one value per token
      val cat = new Array[Double](channels)
      var base = 0
      w.convs.foreach { conv =>
        val k = conv.k
        val offset = k / 2
        var oc = 0
        while (oc < conv.outChannels) {
          var acc = conv.bias(oc)
          var tap = 0
          while (tap < k) {
            val src = t + tap - offset
            if (src >= 0 && src < nWords) {
              val x = embeddings(src)
              val wrow = conv.weight(oc)
              var d = 0
              while (d < dim) { acc += wrow(d)(tap) * x(d); d += 1 }
            }
            tap += 1
          }
          cat(base + oc) = acc
          oc += 1
        }
        base += conv.outChannels
      }
      // relu (hardcoded in the reference forward), then linear
      var i = 0
      while (i < channels) { if (cat(i) < 0) cat(i) = 0.0; i += 1 }
      val y = new Array[Double](outDim)
      var o = 0
      while (o < outDim) {
        var acc = w.linear.bias(o)
        val wrow = w.linear.weight(o)
        var c = 0
        while (c < channels) { acc += wrow(c) * cat(c); c += 1 }
        y(o) = acc
        o += 1
      }
      if (!w.residual) y
      else {
        val x = embeddings(t)
        w.normalize match {
          case Pre =>
            val ln = layerNorm(y)
            Array.tabulate(outDim)(d => x(d) + ln(d))
          case Post =>
            layerNorm(Array.tabulate(outDim)(d => x(d) + y(d)))
          case NoNorm =>
            Array.tabulate(outDim)(d => x(d) + y(d))
        }
      }
    }
  }
}
