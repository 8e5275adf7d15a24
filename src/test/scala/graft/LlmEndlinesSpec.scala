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

  test("endlines trained model: separates hard wraps from paragraph ends") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg, when}
    import graft.pipes.EndlinesModel
    // synthetic corpus: documents hard-wrapped at ~40 chars (wrapped
    // lines are long/uniform) with true paragraph ends on short lines
    val rng = new scala.util.Random(3)
    def doc(): String = {
      val paras = (0 until 4).map { _ =>
        val words = (0 until 30 + rng.nextInt(20))
          .map(_ => "mot" + rng.nextInt(100))
        // wrap at 40 chars
        val sb = new StringBuilder; var lineLen = 0
        words.foreach { w =>
          if (lineLen + w.length + 1 > 40) { sb.append("\n"); lineLen = 0 }
          else if (lineLen > 0) { sb.append(" "); lineLen += 1 }
          sb.append(w); lineLen += w.length
        }
        sb.toString
      }
      paras.mkString("\n") // paragraph-final short lines precede these
    }
    val docs = (1L to 30L).map(i => (i, doc())).toDF("doc_id", "text")
    val feats = EndlinesModel.featurize(docs, "doc_id", "text")
    val model = EndlinesModel.fit(feats)
    val pred = EndlinesModel.predict(model, feats)
    // offsets point at actual newlines
    val sample = pred.join(docs, "doc_id")
      .select($"text", $"pos").limit(50).collect()
    sample.foreach(r =>
      assert(r.getString(0).charAt(r.getLong(1).toInt) === '\n'))
    // wrapped newlines (long previous line) are classified spurious far
    // more often than short-line newlines
    val byLen = pred.withColumn("longPrev", $"b1" > 0)
      .groupBy("longPrev")
      .agg(avg(when($"end_line", 1.0).otherwise(0.0)).as("endRate"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLen(false) > byLen(true),
      s"short-line newlines should be real ends: $byLen")
  }

  test("fuzzy alignment: context similarity picks the right occurrence") {
    import graft.nlp.{Ent, FuzzyAlign}
    // two occurrences of "fracture"; context must disambiguate even
    // after an insertion shifts everything
    val oldText = "Ancienne fracture du poignet. Nouvelle fracture du radius."
    val ents = Seq(Ent(39, 47, "dis", "fracture")) // the radius one
    val newText =
      "Note ajoutée au dossier. Ancienne fracture du poignet. " +
        "Nouvelle fracture du radius."
    val r = FuzzyAlign.align(oldText, ents, newText)
    assert(r.good === 1 && r.missing === 0)
    val a = r.aligned.head
    assert(newText.substring(a.begin, a.end) === "fracture")
    assert(newText.substring(a.begin).startsWith("fracture du radius"))
  }

  test("fuzzy alignment: survives block swap and whitespace churn") {
    import graft.nlp.{Ent, FuzzyAlign}
    val oldText = "Paragraphe A avec douleur persistante. Paragraphe B avec fracture nette."
    val ents = Seq(
      Ent(18, 25, "sym", "douleur"),
      Ent(57, 65, "dis", "fracture"))
    // blocks swapped + extra whitespace
    val newText = "Paragraphe B avec  fracture nette. Paragraphe A avec\ndouleur persistante."
    val r = FuzzyAlign.align(oldText, ents, newText)
    assert(r.good === 2)
    val byLabel = r.aligned.map(e => e.label ->
      newText.substring(e.begin, e.end)).toMap
    assert(byLabel("sym") === "douleur")
    assert(byLabel("dis") === "fracture")
  }

  test("fuzzy alignment: ratio matches difflib on known cases") {
    import graft.nlp.FuzzyAlign.ratio
    assert(ratio("abcd", "abcd") === 1.0)
    assert(ratio("abcd", "bcde") === 0.75) // difflib: 2*3/8
    assert(ratio("", "") === 1.0)
    assert(ratio("abc", "xyz") === 0.0)
  }

  test("fuzzy alignment: whitespace inside a fragment keeps span exact") {
    import graft.nlp.{Ent, FuzzyAlign}
    val oldText = "Patient avec douleur persistante au bras."
    val ents = Seq(Ent(13, 32, "sym", "douleur persistante"))
    // double space INSIDE the entity in the target text
    val newText = "Patient avec douleur  persistante au bras."
    val r = FuzzyAlign.align(oldText, ents, newText)
    assert(r.good === 1)
    val a = r.aligned.head
    // span must cover the whole (now 20-char) match, not truncate it
    assert(newText.substring(a.begin, a.end) === "douleur  persistante")
    assert(a.text === "douleur  persistante")
  }

  test("fuzzy alignment: unmatchable fragments are counted, not guessed") {
    import graft.nlp.{Ent, FuzzyAlign}
    val r = FuzzyAlign.align("le mot disparu ici", Seq(Ent(7, 14, "x", "disparu")),
      "texte totalement différent sans rapport")
    assert(r.aligned.isEmpty)
    assert(r.missing + r.unsure === 1)
  }

  test("LLM annotator: permanently failing batch degrades to empty") {
    val out = LlmAnnotator.annotatePartition(
      Iterator((1L, "texte")),
      callModel = _ => throw new RuntimeException("down"),
      config = LlmAnnotator.Config(maxRetries = 1, retryBackoffMs = 1)).toSeq
    assert(out === Seq((1L, Seq.empty)))
  }
}
