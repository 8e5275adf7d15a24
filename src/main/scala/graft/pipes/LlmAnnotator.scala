package graft.pipes

import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import graft.nlp.Ent

/** Async micro-batch LLM annotation operator — the stage shape of
  * `eds.llm_markup_extractor` (`/root/reference/edsnlp/pipes/trainable/
  * llm_markup_extractor/llm_markup_extractor.py:33-430`): documents go to
  * a chat endpoint in bounded-concurrency micro-batches, answers come
  * back as inline markup, get parsed and aligned to the source text, with
  * a per-batch retry/error policy.
  *
  * This container has no network, so `callModel` is injected: tests/demos
  * pass a deterministic stub; production passes the HTTP client. The
  * Spark shape is the real thing: partition-local executor pool (bounded
  * in-flight requests per task), retries with backoff, failed docs
  * degrade to empty annotations instead of failing the job — at 100 TB a
  * flaky endpoint must not kill a stage.
  *
  * Alignment: the model may echo text imperfectly; entities whose quoted
  * text is found verbatim anchor exactly, others realign by searching the
  * source for the entity text (first occurrence after the previous
  * anchor) — the pragmatic core of the reference's fuzzy alignment
  * (`edsnlp/utils/fuzzy_alignment.py`).
  */
object LlmAnnotator {

  case class Config(
      concurrency: Int = 4,
      maxRetries: Int = 2,
      retryBackoffMs: Long = 100)

  /** Align entities parsed from (possibly drifted) model output to the
    * source text. Fast paths: identical echo keeps offsets; a clean
    * in-order verbatim scan re-anchors simple prefix/suffix drift. When
    * either fails (reordered blocks, paraphrased surroundings,
    * whitespace churn), fall through to the full context-similarity
    * alignment ([[graft.nlp.FuzzyAlign]], the reference
    * `fuzzy_alignment.py` algorithm). Entities that still cannot be
    * anchored are dropped (degrade, don't poison).
    */
  def align(source: String, modelText: String, ents: Seq[Ent]): Seq[Ent] = {
    if (source == modelText) return ents
    val anchored = new ArrayBuffer[Ent]
    val failed = new ArrayBuffer[Ent]
    var searchFrom = 0
    ents.sortBy(_.begin).foreach { e =>
      val idx = source.indexOf(e.text, searchFrom)
      if (idx >= 0) {
        anchored += e.copy(begin = idx, end = idx + e.text.length)
        searchFrom = idx + e.text.length
      } else failed += e
    }
    // fuzzy-align ONLY the entities the verbatim scan missed — a
    // hallucinated entity must not demote its verbatim-anchored
    // neighbors into the threshold-gated path
    if (failed.isEmpty) anchored.toSeq
    else (anchored.toSeq ++
      graft.nlp.FuzzyAlign.align(modelText, failed.toSeq, source).aligned)
      .sortBy(_.begin)
  }

  /** Annotate an iterator of (id, text) rows. `callModel` maps a prompt
    * batch to marked-up answers (one per input, same order).
    */
  def annotatePartition(
      rows: Iterator[(Long, String)],
      callModel: Seq[String] => Seq[String],
      batchSize: Int = 8,
      config: Config = Config()): Iterator[(Long, Seq[Ent])] = {
    // daemon threads: a consumer that abandons the iterator early (limit,
    // take, task failure) must not pin the JVM; the pool is additionally
    // shut down on drain and on Spark task completion.
    val pool = Executors.newFixedThreadPool(config.concurrency, r => {
      val t = new Thread(r, "graft-llm-annotator")
      t.setDaemon(true)
      t
    })
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)

    def callWithRetry(batch: Seq[(Long, String)]): Seq[(Long, Seq[Ent])] = {
      var attempt = 0
      while (attempt <= config.maxRetries) {
        Try(callModel(batch.map(_._2))) match {
          case Success(answers) if answers.size == batch.size =>
            return batch.zip(answers).map { case ((id, text), answer) =>
              val (clean, ents) = graft.io.Markup.parse(answer, "xml")
              (id, align(text, clean, ents))
            }
          case Success(_) | Failure(_) =>
            attempt += 1
            if (attempt <= config.maxRetries)
              Thread.sleep(config.retryBackoffMs * attempt)
        }
      }
      batch.map { case (id, _) => (id, Seq.empty[Ent]) } // degrade
    }

    // lazy pipeline: at most `concurrency` batches in flight; the row
    // iterator is drained batch-by-batch, never materialized (bounded
    // memory on arbitrarily large partitions).
    val batches = rows.grouped(batchSize)
    val inFlight =
      scala.collection.mutable.Queue.empty[Future[Seq[(Long, Seq[Ent])]]]
    new Iterator[Seq[(Long, Seq[Ent])]] {
      private def fill(): Unit =
        while (inFlight.size < config.concurrency && batches.hasNext) {
          val b = batches.next()
          inFlight.enqueue(Future(callWithRetry(b)))
        }
      def hasNext: Boolean = {
        fill()
        val more = inFlight.nonEmpty
        if (!more) {
          pool.shutdown()
          pool.awaitTermination(60, TimeUnit.SECONDS)
        }
        more
      }
      def next(): Seq[(Long, Seq[Ent])] = {
        fill()
        Await.result(inFlight.dequeue(), Duration.Inf)
      }
    }.flatten
  }
}
