package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes.{Endlines, LlmAnnotator}

class LlmEndlinesSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  test("endlines: wrap newlines excluded, clause/paragraph newlines kept") {
    val s = "Douleur au bras\ndepuis hier.\nLe scanner est normal.\n\nConclusion :\nRAS"
    val classified = Endlines.classify(toks(s))
    val newlines = classified.filter(_.text == "\n")
    // "bras\ndepuis" wraps mid-sentence -> excluded
    assert(newlines(0).excluded)
    // "hier.\nLe" follows a period and precedes a capital -> real
    assert(!newlines(1).excluded)
    // paragraph break -> both real
    assert(!newlines(2).excluded && !newlines(3).excluded)
    // after "Conclusion :" -> real
    assert(!newlines(4).excluded)
    // clean text now sees through the wrap
    val (clean, _) = Normalizer.cleanTextWithOffsets(classified, useNorm = false)
    assert(clean.startsWith("Douleur au bras depuis hier."))
  }

  test("LLM annotator: micro-batches, markup parse, alignment, degraded errors") {
    val docs = (1L to 20L).map(i => (i, s"Le patient $i a une fracture."))
    val calls = new AtomicInteger(0)
    val failOnce = new AtomicInteger(0)
    val out = LlmAnnotator.annotatePartition(
      docs.iterator,
      callModel = { batch =>
        calls.incrementAndGet()
        // first call fails (retry path); model echoes with drifted prefix
        if (failOnce.getAndIncrement() == 0)
          throw new RuntimeException("transient 503")
        batch.map(t =>
          "ANSWER: " + t.replace("fracture",
            "<disease negation=false>fracture</disease>"))
      },
      batchSize = 6,
      config = LlmAnnotator.Config(concurrency = 2, retryBackoffMs = 1)
    ).toSeq
    assert(out.size === 20)
    // every doc got its aligned entity despite the "ANSWER: " drift
    out.foreach { case (id, ents) =>
      assert(ents.size === 1, s"doc $id")
      val e = ents.head
      val src = docs.find(_._1 == id).get._2
      assert(src.substring(e.begin, e.end) === "fracture")
      assert(e.attrs("negation") === "false")
    }
    assert(calls.get() >= 4) // 4 batches + >=1 retry
  }

  test("LLM annotator: permanently failing batch degrades to empty") {
    val out = LlmAnnotator.annotatePartition(
      Iterator((1L, "texte")),
      callModel = _ => throw new RuntimeException("down"),
      config = LlmAnnotator.Config(maxRetries = 1, retryBackoffMs = 1)).toSeq
    assert(out === Seq((1L, Seq.empty)))
  }
}
