package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes.ContextualMatcher
import graft.pipes.ContextualMatcher.{Config, SideRule}

/** The reference context-window DSL goldens
  * (`/root/reference/tests/utils/test_span_getters.py:28-190`) plus the
  * sentence-window include scenario of the contextual matcher
  * (`test_contextual_matcher.py` test_contextual_matcher_include).
  */
class ContextWindowSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  private def snippet(text: String, term: String, win: String): String = {
    val tokens = toks(text)
    val sents = Sentencizer.sentences(tokens)
    val b = text.indexOf(term)
    val (wb, we) = ContextWindows.parse(win)(
      b, b + term.length, tokens, sents)
    text.substring(wb, we).trim
  }

  test("context syntax: words, words & sent, words | sents (test_context_getter_syntax)") {
    val text = "There was a snake. " +
      "His friend was a dog. " +
      "He liked baking cakes. " +
      "But since he had no hands, he was a bad baker. "
    assert(snippet(text, "dog", "words[-5:5]") ===
      ". His friend was a dog. He liked baking cakes")
    assert(snippet(text, "dog", "words[-5:5] & sent") ===
      "His friend was a dog")
    assert(snippet(text, "dog", "words[-5:8] | sents[-1:1]") ===
      "There was a snake. His friend was a dog. He liked baking " +
        "cakes. But since")
  }

  test("mixed-operator precedence: & binds tighter than | (Python eval order)") {
    val text = "There was a snake. " +
      "His friend was a dog. " +
      "He liked baking cakes. " +
      "But since he had no hands, he was a bad baker. "
    // a | b & c must parse as a | (b & c): with left-flat association the
    // leading union would be clipped by the trailing intersection
    val mixed = snippet(text, "dog", "sents[-1:1] | words[-5:5] & sent")
    val expected = {
      val tokens = toks(text)
      val sents = Sentencizer.sentences(tokens)
      val b = text.indexOf("dog")
      val win = ContextWindows.Or(
        ContextWindows.parse("sents[-1:1]"),
        ContextWindows.And(
          ContextWindows.parse("words[-5:5]"),
          ContextWindows.parse("sent")))
      val (wb, we) = win(b, b + "dog".length, tokens, sents)
      text.substring(wb, we).trim
    }
    assert(mixed === expected)
    assert(mixed !== snippet(text, "dog", "words[-5:5] & sent"))
  }

  test("span context getter: symmetric and asymmetric (test_span_context_getter)") {
    val text = "This is a sentence. " +
      "This is another sentence with a kangaroo. " +
      "This is a third one. " +
      "Last sentence."
    def get(words: (Int, Int), sents: (Int, Int)): String = {
      val tokens = toks(text)
      val ss = Sentencizer.sentences(tokens)
      val b = text.indexOf("kangaroo")
      val w = ContextWindows.spanContextGetter(words, sents)
      val (wb, we) = w(b, b + "kangaroo".length, tokens, ss)
      text.substring(wb, we).trim
    }
    assert(get((2, 2), (0, 0)) === "with a kangaroo. This")
    assert(get((2, 1), (0, 0)) === "with a kangaroo.")
    assert(get((1, 2), (0, 0)) === "a kangaroo. This")
    assert(get((0, 0), (1, 2)) ===
      "This is another sentence with a kangaroo. This is a third one.")
    assert(get((0, 0), (2, 2)) === "This is a sentence. This is " +
      "another sentence with a kangaroo. This is a third one.")
    assert(get((0, 0), (1, 1)) ===
      "This is another sentence with a kangaroo.")
    assert(get((1000, 0), (0, 0)) === "This is a sentence. This is " +
      "another sentence with a kangaroo")
    assert(get((1000, 0), (1, 2)) === "This is a sentence. This is " +
      "another sentence with a kangaroo. This is a third one.")
  }

  test("contextual matcher include with a sents[-1:1] window (test_contextual_matcher_include)") {
    // the reference scenario: 'mamm' required within the prev-to-next
    // sentence window AND a required size in the SAME sentence — only
    // the first tumor survives
    val text = "Bilan mammaire:\n" +
      "La tumeur est de 3 cm.\n" +
      "Tumeur au pied sans changement.\n" +
      "Tumeur mammaire benigne.\n"
    val cfg = Config(
      label = "tumor_size",
      terms = Seq("tumeur"),
      include = Seq(SideRule(Seq("mamm"), windowQuery = "sents[-1:1]")),
      assign = Seq(ContextualMatcher.AssignRule("size",
        """(\d+ ?cm)""", sentenceWindow = true, required = true)))
    val tokens = toks(text)
    val ents = ContextualMatcher.matcher(cfg)
      .findDetailed(text, tokens, Sentencizer.sentences(tokens))
    assert(ents.length === 1)
    assert(ents.head._1.begin === text.indexOf("tumeur"))
    assert(ents.head._2("size").first === "3 cm")
  }
}
