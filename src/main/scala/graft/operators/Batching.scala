package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Content-aware batching policies + the batched-inference stage — the
  * re-expression of `/root/reference/edsnlp/utils/batching.py` (policies
  * `:70-356`, size-expression parser `:26-63`) and `map_gpu` / the
  * TorchComponent lifecycle (`edsnlp/core/stream.py:617-673`,
  * `edsnlp/core/torch_component.py:169-505`).
  *
  * In Spark these are PARTITION-LOCAL rebatching inside `mapPartitions`:
  * Arrow/Tungsten batches are row-count based, so cost-aware batching
  * (sum-of-lengths, padded max*count) has to be done by the stage itself.
  * The inference stage runs prepare -> forward -> postprocess per batch
  * with at most one batch of device memory live at a time; on a GPU
  * cluster the stage maps 1:1 onto a `ResourceProfile`-pinned stage.
  */
object Batching {

  /** A batching policy measures the cost an item adds to a batch. */
  sealed trait Policy {
    /** cost of the batch if `item` (with item size `n`) joins a batch
      * whose current stats are (count, sumSizes, maxSize).
      */
    def batchCost(count: Long, sum: Long, max: Long, n: Long): Long
  }

  /** Fixed item count ("docs"/"samples"). */
  case object Docs extends Policy {
    def batchCost(count: Long, sum: Long, max: Long, n: Long): Long =
      count + 1
  }

  /** Sum of item sizes ("words", "tokens"). */
  case object Words extends Policy {
    def batchCost(count: Long, sum: Long, max: Long, n: Long): Long =
      sum + n
  }

  /** Padded cost: max item size x item count — the padded-tensor memory
    * model ("padded_words", `batching.py:181-238`).
    */
  case object PaddedWords extends Policy {
    def batchCost(count: Long, sum: Long, max: Long, n: Long): Long =
      math.max(max, n) * (count + 1)
  }

  /** Parse "<int>", "<int> docs", "1024 words", "8000 padded_words"
    * (`batching.py:26-63`).
    */
  def parseSizeExpr(expr: String): (Long, Policy) = {
    val parts = expr.trim.split("\\s+")
    val n = parts(0).toLongOption.getOrElse(
      throw new IllegalArgumentException(s"Invalid batch size: $expr"))
    val policy = parts.lift(1).getOrElse("docs") match {
      case "docs" | "samples" => Docs
      case "words" | "tokens" => Words
      case "padded_words" => PaddedWords
      case other =>
        throw new IllegalArgumentException(s"Unknown batch policy: $other")
    }
    (n, policy)
  }

  /** Group an iterator into batches under `limit` for `policy`, with item
    * size given by `sizeOf`. An oversized single item forms its own batch
    * (reference `batchify` behavior). Lazy: holds one batch at a time.
    */
  def batchify[T](
      items: Iterator[T], limit: Long, policy: Policy,
      sizeOf: T => Long): Iterator[Seq[T]] = new Iterator[Seq[T]] {
    private var pending: Option[T] = None
    def hasNext: Boolean = pending.isDefined || items.hasNext
    def next(): Seq[T] = {
      val batch = new ArrayBuffer[T]
      var count = 0L
      var sum = 0L
      var max = 0L
      var full = false
      while (!full && (pending.isDefined || items.hasNext)) {
        val item = pending.getOrElse(items.next())
        pending = None
        val n = sizeOf(item)
        if (batch.nonEmpty && policy.batchCost(count, sum, max, n) > limit) {
          pending = Some(item)
          full = true
        } else {
          batch += item
          count += 1; sum += n; max = math.max(max, n)
        }
      }
      batch.toSeq
    }
  }

  /** The prepare/forward/postprocess inference stage (`map_gpu`): rebatch
    * a partition by `sizeExpr`, run `forward` once per batch (the device
    * round-trip), emit per-item outputs. `forward` is typically a model
    * call; here any batch function (stubbed deterministically in tests —
    * this container has no GPU/torch).
    */
  def inferenceStage[T, P, O](
      sizeExpr: String,
      sizeOf: T => Long,
      prepare: Seq[T] => P,
      forward: P => Seq[O])(rows: Iterator[T]): Iterator[(T, O)] = {
    val (limit, policy) = parseSizeExpr(sizeExpr)
    batchify(rows, limit, policy, sizeOf).flatMap { batch =>
      val out = forward(prepare(batch))
      require(out.size == batch.size,
        s"forward returned ${out.size} outputs for ${batch.size} inputs")
      batch.zip(out)
    }
  }
}
