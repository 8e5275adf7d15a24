package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes.ContextualMatcher
import graft.pipes.ContextualMatcher.{AssignRule, Config, Many, One, SideRule}

/** The reference's contextual-matcher machinery bank
  * (`/root/reference/tests/pipelines/core/test_contextual_matcher.py`):
  * every (include_assigned, replace_entity, reduce_mode_stage,
  * reduce_mode_metastase) combination over the cancer scenario, plus the
  * exclude-outside-anchor regression (#394) and span_from_group. Windows
  * here are char-scaled (~8 chars/token) and the assign regexes are
  * accent-tolerant because this matcher runs on raw text where the
  * reference matches NORM.
  */
class ContextualMatcherSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  private val text = "Le patient présente une métastasis sur un " +
    "cancer métastasé au stade 3 voire au stade 4."

  private def run(
      includeAssigned: Boolean, replaceEntity: Boolean,
      reduceStage: Option[String], reduceMeta: Option[String]) = {
    val cfg = Config(
      label = "Cancer",
      terms = Seq("cancer", "tumeur"),
      regex = Seq("""adeno(carcinom|[\s-]?k)""", "neoplas", "melanom"),
      exclude = Seq(SideRule(Seq("benign|benin"), windowAfter = 24)),
      assign = Seq(
        AssignRule("stage", """stade (I{1,3}V?|[1234])""",
          windowBefore = 80, windowAfter = 80,
          replaceEntity = replaceEntity, reduceMode = reduceStage),
        AssignRule("metastase", """(m[ée]tasta)""", windowAfter = 80,
          reduceMode = reduceMeta)),
      includeAssigned = includeAssigned)
    val tokens = toks(text)
    ContextualMatcher.matcher(cfg)
      .findDetailed(text, tokens, Sentencizer.sentences(tokens))
  }

  // expected assigned values per ent: stage then metastase
  private def stages(v: ContextualMatcher.AssignedValue): Seq[String] =
    v match { case One(x) => Seq(x); case Many(xs) => xs }

  test("include_assigned + replace_entity (EXAMPLES 1-9)") {
    for (rm <- Seq(None, Some("keep_first"), Some("keep_last"))) {
      // stage reduce None: one ent per stage match, first merged with
      // anchor + metastase spans
      val a = run(includeAssigned = true, replaceEntity = true, None, rm)
      assert(a.map(_._1.text) ===
        Seq("cancer métastasé au stade 3", "stade 4"))
      assert(stages(a(0)._2("stage")) === Seq("3"))
      assert(stages(a(1)._2("stage")) === Seq("4"))
      assert(stages(a(0)._2("metastase")) === Seq("métasta"))
      // keep_first: closest stage wins, single merged ent
      val b = run(includeAssigned = true, replaceEntity = true,
        Some("keep_first"), rm)
      assert(b.map(_._1.text) === Seq("cancer métastasé au stade 3"))
      assert(stages(b(0)._2("stage")) === Seq("3"))
      // keep_last: farthest stage wins, merge spans the whole range
      val c = run(includeAssigned = true, replaceEntity = true,
        Some("keep_last"), rm)
      assert(c.map(_._1.text) ===
        Seq("cancer métastasé au stade 3 voire au stade 4"))
      assert(stages(c(0)._2("stage")) === Seq("4"))
    }
  }

  test("include_assigned without replace (EXAMPLES 10-18)") {
    for (rm <- Seq(None, Some("keep_first"), Some("keep_last"))) {
      val a = run(includeAssigned = true, replaceEntity = false, None, rm)
      assert(a.map(_._1.text) ===
        Seq("cancer métastasé au stade 3 voire au stade 4"))
      assert(stages(a(0)._2("stage")) === Seq("3", "4"))
      val b = run(includeAssigned = true, replaceEntity = false,
        Some("keep_first"), rm)
      assert(b.map(_._1.text) === Seq("cancer métastasé au stade 3"))
      assert(stages(b(0)._2("stage")) === Seq("3"))
      val c = run(includeAssigned = true, replaceEntity = false,
        Some("keep_last"), rm)
      assert(c.map(_._1.text) ===
        Seq("cancer métastasé au stade 3 voire au stade 4"))
      assert(stages(c(0)._2("stage")) === Seq("4"))
    }
  }

  test("replace_entity without include_assigned (EXAMPLES 19-27)") {
    for (rm <- Seq(None, Some("keep_first"), Some("keep_last"))) {
      val a = run(includeAssigned = false, replaceEntity = true, None, rm)
      assert(a.map(_._1.text) === Seq("stade 3", "stade 4"))
      assert(stages(a(0)._2("stage")) === Seq("3"))
      assert(stages(a(1)._2("stage")) === Seq("4"))
      val b = run(includeAssigned = false, replaceEntity = true,
        Some("keep_first"), rm)
      assert(b.map(_._1.text) === Seq("stade 3"))
      val c = run(includeAssigned = false, replaceEntity = true,
        Some("keep_last"), rm)
      assert(c.map(_._1.text) === Seq("stade 4"))
    }
  }

  test("plain anchor (EXAMPLES 28-36)") {
    for (rm <- Seq(None, Some("keep_first"), Some("keep_last"))) {
      val a = run(includeAssigned = false, replaceEntity = false,
        None, rm)
      assert(a.map(_._1.text) === Seq("cancer"))
      assert(stages(a(0)._2("stage")) === Seq("3", "4"))
      val b = run(includeAssigned = false, replaceEntity = false,
        Some("keep_first"), rm)
      assert(stages(b(0)._2("stage")) === Seq("3"))
      val c = run(includeAssigned = false, replaceEntity = false,
        Some("keep_last"), rm)
      assert(stages(c(0)._2("stage")) === Seq("4"))
    }
  }

  test("exclude matches inside the anchor do not count (issue #394)") {
    val cfg = Config(
      label = "asa",
      regex = Seq("""\basa\b ?:? ?([1-5]|[A-Z]{1,3})"""),
      exclude = Seq(SideRule(Seq("5"), windowBefore = 40)))
    def ents(text: String): Seq[String] = {
      val tokens = toks(text)
      ContextualMatcher.matcher(cfg)
        .findMatches(text, tokens, Sentencizer.sentences(tokens))
        .map(_.text)
    }
    // the 5 inside "ASA 5" does not exclude it...
    assert(ents("ASA 5") === Seq("ASA 5"))
    // ...but a 5 before it does
    assert(ents("5 ASA 5") === Seq.empty)
  }

  test("span_from_group narrows the entity to the capture group") {
    val asa = Config(label = "score",
      regex = Seq("""\basa\b ?:? ?([1-5]|[A-Z]{1,3})"""),
      spanFromGroup = true)
    val gcs = Config(label = "score",
      regex = Seq("""\bgcs\b ?:? ?([1-9]|1[0-5])"""))
    val text = "ASA 3 et GCS 15"
    val tokens = toks(text)
    val sents = Sentencizer.sentences(tokens)
    val a = ContextualMatcher.matcher(asa).findMatches(text, tokens, sents)
    val g = ContextualMatcher.matcher(gcs).findMatches(text, tokens, sents)
    assert((a ++ g).map(_.text).sorted === Seq("3", "GCS 15"))
  }
}
