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

  test("regex sub with spans: reference apply/unapply golden numbers") {
    // ported from /root/reference/tests/utils/test_fuzzy_aligment.py
    // :12-37 (test_regex_multi_sub_with_spans) — exact offsets
    import graft.nlp.RegexSubSpans
    val text = "=== hello world! This is a hello world example.==="
    val (newText, deltas) = RegexSubSpans.multisubWithSpans(
      Seq("===", "hello (world)", "example"),
      Seq(" ", "hi \\1", "sample"), text)
    assert(newText === "  hi world! This is a hi world sample. ")
    assert(RegexSubSpans.multisubWithSpans(
      Seq("===", "hello (world)", "example"),
      Seq(" ", "hi \\g<1>", "sample"), text)._1 === newText)
    // GREET [4,9) HELLO, WORLD [10,16), EXAMPLE [39,46)
    assert(deltas.apply(Seq(4, 10, 39), side = "left") === Seq(2, 2, 31))
    // "hello" expands to the whole "hi world" replacement: end 10 not 4+
    assert(deltas.apply(Seq(9, 16, 46), side = "right") === Seq(10, 11, 37))
    assert(deltas.unapply(Seq(2, 5, 31, 33), side = "left") ===
      Seq(4, 4, 39, 39))
    assert(deltas.unapply(Seq(10, 11, 37, 35), side = "right") ===
      Seq(15, 16, 46, 46))
  }

  test("fuzzy alignment: reference test_align distortions (both thresholds)") {
    // ported from test_fuzzy_aligment.py:75-109 (test_align), markdown
    // stripped to plain offsets: insertion (" modified "), multi-space
    // inside an entity, deleted blank lines, and a changed fragment
    // ("texts" -> "text", recoverable only via the end-anchor fallback)
    import graft.nlp.{Ent, FuzzyAlign}
    val oldText = "This is a small sample\n\n\ndoc\n  . " +
      "It contains some texts to be annotated. "
    val newText = "This is a  modified  small   sample \ndoc\n . " +
      "It contains some text to be annotated."
    val ents = Seq(
      Ent(oldText.indexOf("small sample"),
        oldText.indexOf("small sample") + 12, "SAMPLE", "small sample"),
      Ent(oldText.indexOf("\ndoc\n"),
        oldText.indexOf("\ndoc\n") + 5, "DOC", "\ndoc\n"),
      Ent(oldText.indexOf("texts"),
        oldText.indexOf("texts") + 5, "TEXT", "texts"))
    val r = FuzzyAlign.align(oldText, ents, newText)
    assert(r.good === 3 && r.missing === 0 && r.unsure === 0)
    val byLabel = r.aligned.map(e => e.label -> e).toMap
    assert(newText.substring(byLabel("SAMPLE").begin,
      byLabel("SAMPLE").end) === "small   sample")
    // the whitespace-tolerant matcher anchors the TOKEN "doc"; the
    // reference recovers the flanking newlines only through spaCy's
    // alignment_mode="expand" at token level, so trim-equality is the
    // faithful port of the guarantee
    assert(byLabel("DOC").text.trim === "doc")
    assert(byLabel("TEXT").text.trim === "text")
    // threshold 20 is unreachable (scores cap at 2): everything unsure
    val strict = FuzzyAlign.align(oldText, ents, newText, threshold = 20)
    assert(strict.aligned.isEmpty && strict.good === 0)
    assert(strict.total === 3)
  }

  test("fuzzy alignment: ambiguous tiny fragments stay missing, not guessed") {
    // ported from test_fuzzy_aligment.py:112-144 (test_ambiguous_exact_
    // match / test_ambiguous_inexact_match): a 2-char fragment whose
    // snippet occurs in every one of 50 identical lines must NOT anchor
    val line = "this is ambiguous: xy , where should we annotate ?\n"
    val oldExact = line * 25 +
      "this is ambiguous xy , where should we annotate ?\n" + line * 24
    val b = oldExact.indexOf("ambiguous xy") + 10
    val newText = line * 50
    val scheme = Seq(10 -> 0.7)
    val rExact = graft.nlp.FuzzyAlign.align(oldExact,
      Seq(graft.nlp.Ent(b, b + 2, "AMBIGUOUS", "xy")), newText,
      scheme = scheme)
    assert(rExact.aligned.isEmpty && rExact.missing === 1)
    // inexact: the fragment text itself ("xz") never occurs; the
    // end-anchor snippet occurs 50 times -> still missing
    val oldInexact = line * 25 +
      "this is ambiguous xz , where should we annotate ?\n" + line * 24
    val b2 = oldInexact.indexOf("ambiguous xz") + 10
    val rInexact = graft.nlp.FuzzyAlign.align(oldInexact,
      Seq(graft.nlp.Ent(b2, b2 + 2, "AMBIGUOUS", "xz")), newText,
      scheme = scheme)
    assert(rInexact.aligned.isEmpty && rInexact.missing === 1)
  }

  test("fuzzy alignment: unrelated target and empty fragment are missing") {
    // ported from test_fuzzy_aligment.py:147-158 (test_missing)
    import graft.nlp.{Ent, FuzzyAlign}
    val oldText = "this is a sample: abcd, where should we annotate ?"
    val newText = "the cat sat on the mat, and eat mice when he is hungry."
    val bA = oldText.indexOf("abcd")
    val bE = oldText.indexOf(" should")
    val r = FuzzyAlign.align(oldText,
      Seq(Ent(bA, bA + 4, "MISSING", "abcd"), Ent(bE, bE, "EMPTY", "")),
      newText, scheme = Seq(10 -> 0.7))
    assert(r.aligned.isEmpty)
    assert(r.missing === 2 && r.total === 2)
  }

  test("LLM annotator: permanently failing batch degrades to empty") {
    val out = LlmAnnotator.annotatePartition(
      Iterator((1L, "texte")),
      callModel = _ => throw new RuntimeException("down"),
      config = LlmAnnotator.Config(maxRetries = 1, retryBackoffMs = 1)).toSeq
    assert(out === Seq((1L, Seq.empty)))
  }
}
