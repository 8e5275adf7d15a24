package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp._

class NlpCoreSpec extends AnyFunSuite {

  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  test("tokenizer splits numbers from letters and keeps offsets exact") {
    val t = Tokenizer.tokenize("ACR5 mg")
    assert(t.map(_.text).toSeq === Seq("ACR", "5", " ", "mg"))
    t.foreach(tok => assert(tok.text === "ACR5 mg".substring(tok.begin, tok.end)))
  }

  test("tokenizer: newlines are single tokens, decimals stay together") {
    assert(Tokenizer.tokenize("\n \n").map(_.text).toSeq === Seq("\n", " ", "\n"))
    assert(Tokenizer.tokenize("3,5 mg").map(_.text).toSeq === Seq("3,5", " ", "mg"))
    assert(Tokenizer.tokenize("Dr. X").map(_.text).toSeq === Seq("Dr.", " ", "X"))
  }

  test("tokenizer partitions text (offsets contiguous, no gaps)") {
    val s = "Le patient, vu par le Dr. X le 03/05/2021 (10h: 37,2°C) !\nOK."
    val t = Tokenizer.tokenize(s)
    assert(t.head.begin === 0 && t.last.end === s.length)
    t.sliding(2).foreach {
      case Array(a, b) => assert(a.end === b.begin, s"gap between ${a.text}|${b.text}")
      case _ =>
    }
  }

  test("normalizer: accents and case fold into norm, offsets unchanged") {
    val t = toks("Lésion à l'estomac")
    assert(t.filter(tok => !Normalizer.isSpace(tok)).map(_.norm).toSeq ===
      Seq("lesion", "a", "l'", "estomac"))
    t.foreach(tok => assert(tok.norm.length === tok.end - tok.begin))
  }

  test("normalizer: reference scenario goldens (test_normalisation.py)") {
    val text =
      "L'aïeul ʺnˊest pas malade”, écrit-il. Fièvre NBNbWbWbNbWbNB jaune."
    def clean(opts: Normalizer.Options): String = {
      val tk = Normalizer.normalize(text, Tokenizer.tokenize(text), opts)
      Normalizer.cleanTextWithOffsets(tk, useNorm = true)._1
    }
    // full normalization (test_full_normalization)
    assert(clean(Normalizer.Options()) ===
      "l'aieul \"n'est pas malade\", ecrit-il. fievre jaune.")
    // accents only
    assert(clean(Normalizer.Options(lowercase = false, quotes = false,
      pollution = false)) ===
      "L'aieul ʺnˊest pas malade” , ecrit-il. Fievre NBNbWbWbNbWbNB jaune."
        .replace("” ,", "”,"))
    // quotes only
    assert(clean(Normalizer.Options(lowercase = false, accents = false,
      pollution = false)) ===
      "L'aïeul \"n'est pas malade\", écrit-il. Fièvre NBNbWbWbNbWbNB jaune.")
    // lowercase only
    assert(clean(Normalizer.Options(accents = false, quotes = false,
      pollution = false)).startsWith("l'aïeul"))
    // pollution only
    assert(clean(Normalizer.Options(lowercase = false, accents = false,
      quotes = false)) ===
      "L'aïeul ʺnˊest pas malade”, écrit-il. Fièvre jaune.")
  }

  test("normalizer: print-footer pollution blocks (test_normalisation.py:86-110)") {
    def clean(text: String): String = {
      val tk = Normalizer.normalize(text, Tokenizer.tokenize(text),
        Normalizer.Options(lowercase = false, accents = false,
          quotes = false))
      Normalizer.cleanTextWithOffsets(tk, useNorm = true)._1
    }
    val text2 = "Le jour de \n" +
      "2/2Pat : <NOM> <Prenom> le <date> IPP <ipp> Intitulé RCP" +
      " : Urologie HMN le <date>\nRéunion de Concertation" +
      " Pluridisciplinaire\nHôpital Henri Mondor"
    assert(clean(text2) === "Le jour de Réunion de Concertation " +
      "Pluridisciplinaire Hôpital Henri Mondor")
    val text3 = "Le jour de \n" +
      "3/5CRH service ABC HC SOINS INTENSIFS CARDIOLOGIE - " +
      "CARDIOLOGIE-2EME ETAGE-B    Pat.: Prenom NOM | M | 13/10/1789 " +
      "| 8012345678 | xxxxxxxx \nconsultation"
    assert(clean(text3) === "Le jour de consultation")
  }

  test("normalizer: intraword line split heals (test_normalisation.py:113-124)") {
    val text = "Le patient a un diab-\nète de type II."
    val tk = Normalizer.normalize(text, Tokenizer.tokenize(text),
      Normalizer.Options(lowercase = false, accents = false,
        quotes = false))
    assert(Normalizer.cleanTextWithOffsets(tk, useNorm = true)._1 ===
      "Le patient a un diabète de type II.")
  }

  test("sentencizer: period always opens a sentence; newline needs capitalization") {
    // after a period the next word starts a sentence regardless of case
    // (capitalization is only checked for newline-triggered boundaries)
    val s = "Il va bien. Le scanner est normal. pas de changement."
    val sents = Sentencizer.sentences(toks(s))
    assert(sents.length === 3)
    assert(s.substring(sents(0).begin, sents(0).end) === "Il va bien.")
    // lowercase continuation after newline does NOT split
    val s2 = "Douleur au bras\nsans fièvre. OK."
    assert(Sentencizer.sentences(toks(s2)).length === 2)
  }

  test("sentencizer: newline + capitalized opens sentence; digit after period does not split") {
    val s = "Douleur à l'estomac\nIl y a 2 ans. 3,5 mg donnés."
    val sents = Sentencizer.sentences(toks(s))
    assert(s.substring(sents(0).begin, sents(0).end).startsWith("Douleur"))
    assert(sents.length === 3)
  }

  test("sentencizer: reference scenario golden (test_sentences.py)") {
    // the reference's main segmentation scenario (tests/pipelines/core/
    // test_sentences.py:12-59, use_endlines=False): punctuation splits,
    // newline+capitalized splits, lowercase continuation does not,
    // E.Coli / ? boundaries
    val text =
      "Le patient est admis pour des douleurs dans le bras droit. " +
        "mais n'a pas de problème de locomotion. \n" +
        "Historique d'AVC dans la famille\n" +
        "Mais ne semble pas en être un\n" +
        "Pourrait être un cas de rhume.\n" +
        "Motif :\n" +
        "Douleurs dans le bras droit !" +
        "Il est contaminé à E.Coli? c'est un problème, il faut s'en occuper."
    val sents = Sentencizer.sentences(toks(text))
      .map(s => text.substring(s.begin, s.end).trim).filter(_.nonEmpty)
    assert(sents === Seq(
      "Le patient est admis pour des douleurs dans le bras droit.",
      "mais n'a pas de problème de locomotion.",
      "Historique d'AVC dans la famille",
      "Mais ne semble pas en être un",
      "Pourrait être un cas de rhume.",
      "Motif :",
      "Douleurs dans le bras droit !",
      "Il est contaminé à E.Coli?",
      "c'est un problème, il faut s'en occuper."))
  }

  test("sentencizer: dotted dates and E.Coli are one sentence (test_sentences.py:64-88)") {
    Seq("02.04.2018", "E.Coli", "10.10.2010:RCP", "10.10.2010 : RCP",
      "02.04.2018 : RCP", "10/10/2010 : RCP").foreach { fp =>
      assert(Sentencizer.sentences(toks(fp)).length === 1,
        s"'$fp' should stay one sentence")
    }
  }

  test("filter_spans keeps longest-leftmost on overlap") {
    val spans = Seq(
      Ent(0, 5, "a", ""), Ent(3, 10, "b", ""), Ent(3, 8, "c", ""),
      Ent(12, 14, "d", ""))
    val kept = SpanAlgebra.filterSpans(spans)
    assert(kept.map(_.label) === Seq("b", "d")) // b is longest; a,c overlap it
  }

  test("filter_spans with label_to_remove drops only overlapping spans") {
    val spans = Seq(
      Ent(0, 10, "pseudo", ""), Ent(2, 5, "preceding", ""),
      Ent(12, 15, "preceding", ""))
    val kept = SpanAlgebra.filterSpans(spans, Some("pseudo"))
    assert(kept.map(s => (s.begin, s.label)) === Seq((12, "preceding")))
  }

  test("align_spans finds overlapping sources per target") {
    val sources = Seq(Ent(0, 4, "s", ""), Ent(3, 8, "s", ""), Ent(10, 12, "s", ""))
    val targets = Seq(Ent(2, 6, "t", ""), Ent(9, 15, "t", ""))
    val aligned = SpanAlgebra.alignSpans(sources, targets)
    assert(aligned(0).map(_.begin) === Seq(0, 3))
    assert(aligned(1).map(_.begin) === Seq(10))
  }

  test("phrase matcher matches multi-token terms on norm across case/accents") {
    val m = PhraseMatcher.build(Map("covid" -> Seq("covid", "coronavirus"),
      "dl" -> Seq("douleur au bras")))
    val s = "Douleur au bras et Covid-19 ; covid suspecté."
    val hits = m.findMatches(toks(s), s)
    assert(hits.map(h => (h.label, h.text)).toSet ===
      Set(("dl", "Douleur au bras"), ("covid", "Covid"), ("covid", "covid")))
  }

  test("regex matcher on clean text realigns offsets to raw text") {
    // pollution bars are excluded; clean-text match must map back around them
    val s = "Fracture NBNBNBNBNBNB du radius"
    val tokens = toks(s)
    val m = RegexMatcher.build(Map("frac" -> Seq("fracture du radius")),
      attrNorm = true)
    val hits = m.findMatches(tokens, s)
    assert(hits.size === 1)
    assert(hits.head.begin === 0 && hits.head.end === s.length)
  }

  test("regex matcher: clean-text match spans pollution (test_regex.py:66-100)") {
    // the reference matches "pneumopathie à coronavirus" THROUGH an
    // excluded pollution bar; the matched raw span covers the bar
    // (here with the norm accent-folded, so the pattern is folded too)
    val text = "pneumopathie à " +
      "NBNbWbWbNbWbNBNbNbWbWbNBNbWbNbNbWbNBNbWbNbNB coronavirus"
    val tokens = toks(text)
    val m = RegexMatcher.build(
      Map("test" -> Seq("pneumopathie a coronavirus")), attrNorm = true)
    val hits = m.findMatches(tokens, text)
    assert(hits.length === 1)
    assert(hits.head.text === text)
    // mid-document variant (test_regex_with_norm_on_span)
    val text2 = "le patient a une " + text
    val hits2 = m.findMatches(toks(text2), text2)
    assert(hits2.length === 1)
    assert(hits2.head.text === text)
  }

  test("regex matcher: norm alignment keeps ent spans tight (test_regex.py:142-152)") {
    val text = "test " + ("bla… " * 4) + "test " + ("bla" * 10)
    val m = RegexMatcher.build(Map("test" -> Seq("""\btest\b""")),
      attrNorm = true)
    val hits = m.findMatches(toks(text), text)
    assert(hits.nonEmpty)
    hits.foreach(h => assert(h.text === "test"))
  }

  test("negation: NegEx-style golden examples") {
    val pipe = DocFixtures.pipeline
    def negated(text: String, term: String): Boolean = {
      val anns = pipe.annotate(text)
      val ent = anns.ents.find(_.text.toLowerCase.contains(term))
        .getOrElse(fail(s"no entity '$term' in '$text': ${anns.ents}"))
      ent.attrs("negation").toBoolean
    }
    // from the reference's negation examples (negation.py docstring)
    assert(negated("Le scanner ne détecte aucune fracture.", "fracture"))
    assert(!negated("Le patient est admis pour une douleur au bras.", "douleur"))
    // termination bounds the cue scope
    assert(!negated("Pas de fièvre mais une fracture du radius.", "fracture"))
    // pseudo-negation does not negate
    assert(!negated("Sans doute une fracture du radius.", "fracture"))
    // following cue
    assert(negated("Fracture du radius : exclue.", "fracture"))
  }

  test("null and empty note_text flow through the distributed pipeline") {
    import TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "Douleur au bras sans fracture."), (2L, null),
      (3L, ""), (4L, "   \n  "))
      .toDF("doc_id", "text")
    val ents = DocFixtures.pipeline.entsTable(df, "doc_id", "text")
    val byDoc = ents.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.getOrElse(2L, 0L) === 0L)
    assert(byDoc.getOrElse(3L, 0L) === 0L)
    assert(byDoc.getOrElse(4L, 0L) === 0L)
    assert(byDoc(1L) >= 1L) // real text still annotates
  }

  test("negation: widened reference-bank cues fire") {
    val pipe = DocFixtures.pipeline
    def negated(text: String, term: String): Boolean = {
      val anns = pipe.annotate(text)
      anns.ents.find(_.text.toLowerCase.contains(term))
        .getOrElse(fail(s"no entity '$term'")).attrs("negation").toBoolean
    }
    // "ne ... <3 words> ... jamais/pas" regex cue (negation patterns.py
    // preceding_regex)
    assert(negated("On ne retrouve par ailleurs jamais de fracture.",
      "fracture"))
    // new preceding cues
    assert(negated("Infirmation de fracture du radius.", "fracture"))
    assert(negated("Nullement de fracture visible.", "fracture"))
    // new following cues
    assert(negated("Fracture du radius improbable.", "fracture"))
    assert(negated("Fracture : 0.", "fracture"))
    // new pseudo-negations stay positive
    assert(!negated("Pas d'amélioration de la fracture du radius.",
      "fracture"))
    assert(!negated("Ne permet pas d'exclure une fracture.", "fracture"))
  }

  test("pollution: doctor margins and print footers are excluded") {
    import graft.nlp.{Normalizer, Tokenizer}
    val text = "Dr Martin Service ORL\nDouleur au bras.\n" +
      "Imprimé le 01/02/2021 page 1"
    val toks = Normalizer.normalize(text, Tokenizer.tokenize(text))
    def excludedAt(sub: String): Boolean = {
      val i = text.indexOf(sub)
      toks.filter(t => t.begin >= i && t.end <= i + sub.length)
        .forall(_.excluded)
    }
    assert(excludedAt("Dr Martin Service ORL"))
    assert(excludedAt("Imprimé le 01/02/2021 page 1"))
    assert(!excludedAt("Douleur au bras."))
    // narrative mention of a print date is NOT a footer
    val nar = "Compte rendu imprimé le 01/02/2021 et remis au patient, " +
      "fracture du radius confirmée."
    val narToks = Normalizer.normalize(nar, Tokenizer.tokenize(nar))
    assert(narToks.filter(t => !t.text.isBlank).forall(!_.excluded))
  }

  test("markup render: overlapping entities skip instead of crashing") {
    import graft.nlp.Ent
    val text = "fracture du radius gauche"
    val ents = Seq(
      Ent(0, 18, "dis", "fracture du radius"),
      Ent(9, 25, "loc", "du radius gauche")) // overlaps the first
    val rendered = graft.io.Markup.render(text, ents)
    assert(rendered === "[fracture du radius](dis) gauche")
  }

  test("pipeline builds from a JSON config spec") {
    import graft.pipes.PipelineConfig
    val pipe = PipelineConfig.fromJson(
      """{ "terms": { "fracture": ["fracture", "fracture du radius"] },
           "qualifiers": ["negation", "family"] }""")
    val neg = pipe.annotate("Pas de fracture du radius.").ents.head
    assert(neg.text === "fracture du radius")
    assert(neg.attrs("negation").toBoolean)
    val fam = pipe
      .annotate("Antécédents familiaux de fracture du radius.").ents.head
    assert(fam.attrs("family").toBoolean && !fam.attrs("negation").toBoolean)
    // unknown qualifier name fails with the available list
    val err = intercept[IllegalArgumentException] {
      PipelineConfig.fromJson("""{ "qualifiers": ["negatoin"] }""")
    }
    assert(err.getMessage.contains("negation"))
  }

  test("faithful-date mode is reachable through the config layer") {
    import graft.pipes.PipelineConfig
    // "en août" is a bare letter month: accepted ONLY by the faithful
    // reference grammar, rejected by the default precision-first one —
    // the same toggle Dates.extract(faithful = ...) exposes, now
    // addressable from a JSON pipeline spec like the reference's config
    val text = "Il est venu en août."
    val faithful = PipelineConfig.fromJson(
      """{ "dates": { "faithful": "true" } }""")
    assert(faithful.annotate(text).dates.map(_.text) === Seq("août"))
    val default = PipelineConfig.fromJson("""{ "dates": {} }""")
    assert(default.annotate(text).dates.isEmpty)
    // absolute dates extract in both modes, alongside matcher entities
    val both = PipelineConfig.fromJson(
      """{ "terms": { "visite": ["venu"] }, "dates": {} }""")
    val anno = both.annotate("Il est venu le 23/08/2021.")
    assert(anno.ents.map(_.text) === Seq("venu"))
    assert(anno.dates.map(_.attrs("datetime")) === Seq("2021-08-23T00:00:00"))
    // a pipeline WITHOUT the dates stage emits no date layer
    assert(both.copy(dates = None).annotate(text).dates.isEmpty)
    // unknown dates option fails loudly
    val err2 = intercept[IllegalArgumentException] {
      PipelineConfig.fromJson("""{ "dates": { "fiathful": "true" } }""")
    }
    assert(err2.getMessage.contains("faithful"))
  }

  test("span getter/setter configs resolve like the reference") {
    import graft.nlp.{Ent, SpanGetters}
    import SpanGetters.{All, WithLabels}
    val ents = Seq(Ent(0, 3, "dis", "abc"), Ent(5, 8, "sym", "def"))
    val groups = Map(
      "dates" -> Seq(Ent(10, 14, "date", "2021")),
      "quantities" -> Seq(Ent(20, 24, "dose", "5 mg")))
    // {"ents": ["dis"], "dates": True} — CONFIG order preserved
    val got = SpanGetters.getSpans(ents, groups,
      Seq("ents" -> WithLabels(Seq("dis")), "dates" -> All))
    assert(got.map(_.label) === Seq("dis", "date"))
    // a span reachable through two groups comes out once (seen guard)
    val dup = SpanGetters.getSpans(ents, Map("extra" -> ents),
      Seq("ents" -> All, "extra" -> All))
    assert(dup.size === ents.size)
    // setter: route by label; ents layer drops overlaps
    val produced = Seq(Ent(0, 6, "dis", "abcdef"), Ent(2, 4, "dis", "cd"),
      Ent(9, 12, "date", "jan"))
    val (mainEnts, outGroups) = SpanGetters.setSpans(produced,
      Seq("ents" -> WithLabels(Seq("dis")), "dates" -> WithLabels(Seq("date"))))
    assert(mainEnts.map(_.text) === Seq("abcdef")) // overlap filtered
    assert(outGroups("dates").map(_.text) === Seq("jan"))
  }

  test("family qualifier") {
    val pipe = DocFixtures.pipeline
    val anns = pipe.annotate("Antécédents familiaux de diabète. Le patient a une fracture.")
    val fam = anns.ents.find(_.text.toLowerCase.contains("diabète")).get
    val self = anns.ents.find(_.text.toLowerCase.contains("fracture")).get
    assert(fam.attrs("family").toBoolean)
    assert(!self.attrs("family").toBoolean)
  }

  test("family: reference test-bank goldens (test_family.py)") {
    // ported from /root/reference/tests/pipelines/qualifiers/
    // test_family.py:9-28 — all nine examples, over a matcher for
    // their entities
    val pipe = graft.pipes.DocPipeline(
      terms = Map(
        "asthme" -> Seq("asthmatique"), "covid" -> Seq("COVID"),
        "cancer" -> Seq("cancer du colon"),
        "diabete" -> Seq("diabète", "diabète de type II"),
        "releve" -> Seq("relevé"), "detecte" -> Seq("détecté")),
      qualifiers = Seq(Patterns.family))
    def fam(text: String, term: String): Boolean = {
      val anns = pipe.annotate(text)
      anns.ents.find(_.text.toLowerCase.contains(term))
        .getOrElse(fail(s"no entity '$term' in '$text'"))
        .attrs("family").toBoolean
    }
    assert(fam("Le père est asthmatique, sans traitement particulier.",
      "asthmatique"))
    assert(fam("Son père est atteint de la COVID", "covid"))
    assert(fam("Son père a une infection au COVID", "covid"))
    assert(fam("Son père a une possible infection au COVID", "covid"))
    assert(fam("Le père du patient a eu un cancer du colon. " +
      "La mère se porte bien.", "cancer"))
    assert(fam("Antécédents familiaux : diabète.", "diabète"))
    assert(!fam("Un relevé sanguin a été effectué.", "relevé"))
    // "mais" terminates the familiaux cue's scope before the entity
    assert(!fam("Antécédent familiaux de diabète mais pas détecté " +
      "jusqu'ici.", "détecté"))
    assert(fam("mère : diabète de type II", "type ii"))
  }

  test("negation: reference test-bank goldens (test_negation.py)") {
    // ported from /root/reference/tests/pipelines/qualifiers/
    // test_negation.py:10-35 — the examples expressible without the
    // reference's French lemmatizer, over a matcher for their entities
    val pipe = graft.pipes.DocPipeline(
      terms = Map(
        "meta" -> Seq("métastases", "métastase"),
        "malade" -> Seq("malade"), "traitement" -> Seq("traitement"),
        "scan" -> Seq("scan"), "smd" -> Seq("SMD"),
        "fume" -> Seq("fume"), "maladie" -> Seq("maladie")),
      qualifiers = Seq(Patterns.negation))
    def negation(text: String, term: String): Boolean = {
      val anns = pipe.annotate(text)
      anns.ents.find(_.text.toLowerCase.contains(term))
        .getOrElse(fail(s"no entity '$term' in '$text'"))
        .attrs("negation").toBoolean
    }
    assert(negation("il n'y a pas de métastases", "métastases"))
    assert(negation("il n'y a pas d'métastases", "métastases"))
    assert(!negation("il y a des métastases", "métastases"))
    assert(!negation("aucun doute sur les métastases", "métastases"))
    assert(negation("Le patient n'est pas malade.", "malade"))
    assert(negation("Aucun traitement.", "traitement"))
    assert(!negation("Le scan révèle une grosseur.", "scan"))
    assert(negation("Le résultat exclut un SMD", "smd"))
    assert(!negation("Le résultat ne permet pas d'exclure un SMD", "smd"))
    assert(negation("Le patient ne fume pas.", "fume"))
    assert(negation("Le patient ne fume vraiment vraiment pas.", "fume"))
    // past-participle verb as a FOLLOWING cue (load_verbs:270)
    assert(negation("maladie écartée", "maladie"))
  }

  test("hypothesis: reference test-bank goldens (test_hypothesis.py)") {
    val pipe = graft.pipes.DocPipeline(
      terms = Map(
        "covid" -> Seq("covid-19"), "diag" -> Seq("diagnostics"),
        "diabete" -> Seq("diabète"), "rompu" -> Seq("rompu"),
        "cecite" -> Seq("cécité"), "jeune" -> Seq("jeune")),
      qualifiers = Seq(Patterns.hypothesis))
    def hyp(text: String, term: String): Boolean = {
      val anns = pipe.annotate(text)
      anns.ents.find(_.text.toLowerCase.contains(term))
        .getOrElse(fail(s"no entity '$term' in '$text'"))
        .attrs("hypothesis").toBoolean
    }
    assert(hyp("Possible covid-19", "covid"))
    assert(hyp("Suspicion de diabète.", "diabète"))
    assert(!hyp("Le ligament est rompu.", "rompu"))
    // "même si" is a pseudo cue: no hypothesis fires on the clause
    assert(!hyp("même si le patient est jeune.", "jeune"))
    // termination ("mais") bounds the cue scope
    assert(!hyp("Probablement du diabète mais pas de cécité.", "cécité"))
    // conditional-mood cues added from the verbs_eds conditional family
    assert(hyp("Il pourrait s'agir d'un diabète.", "diabète"))
    assert(hyp("Ce serait un diabète débutant.", "diabète"))
  }

  test("pollution: footer family and opt-in biology/coding banks") {
    import graft.nlp.{Normalizer, Tokenizer}
    // page-counter + patient footer, and a date + IPP line
    val text = "Douleur au bras.\n2/3 \nPat : DUPONT Jean\n" +
      "le 01/02/2021 IPP 8012345678 suite"
    val toks = Normalizer.normalize(text, Tokenizer.tokenize(text))
    def excludedAt(sub: String): Boolean = {
      val i = text.indexOf(sub)
      toks.filter(t => t.begin >= i && t.end <= i + sub.length)
        .filter(t => !t.text.isBlank).forall(_.excluded)
    }
    assert(excludedAt("Pat : DUPONT Jean"))
    assert(excludedAt("IPP 8012345678"))
    assert(!excludedAt("Douleur au bras."))
    // biology tables are OFF by default (disease-name false positives,
    // reference default_enabled) and ON on request
    val bio = "Hb | 12.3 | g/dl\nNa | 140 | mmol/l\nDouleur au bras."
    val defToks = Normalizer.normalize(bio, Tokenizer.tokenize(bio))
    assert(defToks.filter(t => !t.text.isBlank).forall(!_.excluded))
    val bioToks = Normalizer.normalize(bio, Tokenizer.tokenize(bio),
      Normalizer.Options(pollutionBiology = true))
    val hb = bioToks.filter(t => t.begin < bio.indexOf("Douleur"))
    assert(hb.filter(t => !t.text.isBlank).forall(_.excluded))
    assert(!bioToks.filter(t => t.begin >= bio.indexOf("Douleur"))
      .exists(_.excluded))
  }

  test("reported speech: demander/faire remarquer/vouloir verb forms") {
    val pipe = graft.pipes.DocPipeline(
      terms = Map("dlr" -> Seq("douleur")),
      qualifiers = Seq(Patterns.reportedSpeech))
    def reported(text: String): Boolean = {
      val anns = pipe.annotate(text)
      anns.ents.headOption.getOrElse(fail(s"no entity in '$text'"))
        .attrs("reported_speech").toBoolean
    }
    assert(reported("Le patient fait remarquer une douleur au bras."))
    assert(reported("Il demande si la douleur va passer."))
    assert(!reported("Examen clinique: douleur au bras."))
  }
}

object DocFixtures {
  val pipeline: graft.pipes.DocPipeline = graft.pipes.DocPipeline(
    terms = Map(
      "fracture" -> Seq("fracture", "fracture du radius"),
      "douleur" -> Seq("douleur", "douleur au bras"),
      "diabete" -> Seq("diabète"),
      "fievre" -> Seq("fièvre")),
    qualifiers = Seq(Patterns.negation, Patterns.family, Patterns.hypothesis))
}
