package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes._

class MiscPipesSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  test("text tables: detection and cell explode") {
    val text = "Bilan :\nNa | 140 | mmol/l\nK | 4,1 | mmol/l\nConclusion."
    val tables = TextTables.findTables(text)
    assert(tables.length === 1)
    assert(tables.head.attrs("n_rows") === "2")
    val cells = TextTables.toCells(text, tables.head)
    assert(cells.count(_.row == 0) === 3)
    assert(cells.find(c => c.row == 1 && c.col == 1).get.text === "4,1")
    cells.foreach(c => assert(text.substring(c.begin, c.end) === c.text))
  }

  test("reason: trigger extraction with section restriction attr") {
    val text = "Motif :\nHospitalisé pour douleur thoracique.\nConclusion :\nRAS."
    val (_, sections) = Sections.matcher()(text)
    val hits = Reason.extract(text, toks(text), sections)
    assert(hits.nonEmpty)
    assert(hits.exists(_.attrs.get("in_motif_section").contains("true")))
  }

  test("reason: reference scenario golden (test_reason.py)") {
    val text =
      "COMPTE RENDU D'HOSPITALISATION du 11/07/2018 au 12/07/2018\n" +
        "MOTIF D'HOSPITALISATION\n" +
        "Monsieur Dupont Jean Michel, de sexe masculin, âgée de 39 ans, " +
        "née le 23/11/1978,\n" +
        "a été hospitalisé du 11/08/2019 au 17/08/2019 pour une quinte " +
        "de toux.\n\n" +
        "ANTÉCÉDENTS\n" +
        "Antécédents médicaux :\n" +
        "Premier épisode: il a été hospitalisé pour asthme en mai 2018."
    val tokens = toks(text)
    val (_, sections) = Sections.matcher()(text)
    // eds.matcher entities: toux (in MOTIF), asthme (in ANTÉCÉDENTS)
    val ents = Seq("toux", "asthme").map { t =>
      val i = text.indexOf(t)
      Ent(i, i + t.length, "respiratoire", t)
    }
    Seq(true, false).foreach { useSections =>
      val (reasons, annotated) =
        Reason.qualify(text, tokens, sections, ents, useSections)
      // the first reason span contains the "toux" entity
      // (test_reason.py:38-41)
      assert(reasons.nonEmpty, s"useSections=$useSections")
      assert(annotated.head.attrs("is_reason") === "true",
        s"toux should be a reason (useSections=$useSections)")
      // asthme's reason line sits in ANTÉCÉDENTS: vetoed when sections
      // are on, kept when off (test_reason.py:42)
      assert(annotated(1).attrs("is_reason") === (!useSections).toString,
        s"asthme is_reason (useSections=$useSections)")
    }
  }

  test("sections: reference scenario goldens (test_sections.py)") {
    // entity "Douleurs" after "Motif :" belongs to the motif section
    val text1 =
      "Le patient est admis pour des douleurs dans le bras droit, " +
        "mais n'a pas de problème de locomotion. " +
        "Historique d'AVC dans la famille. pourrait être un cas de " +
        "rhume.\n" +
        "NBNbWbWbNbWbNBNbNbWbWbNBNbWbNbNbWbNBNbWbNbNBWbWbNbNbNBWbNb" +
        "WbNbWBNbNbWbNbNBNbWbWbNbWBNbNbWbNBNbWbWbNb\n" +
        "Pourrait être un cas de rhume.\n" +
        "Motif :\n" +
        "Douleurs dans le bras droit.\n" +
        "Pas d'anomalie détectée."
    val (_, sections1) = Sections.matcher()(text1)
    val d = text1.indexOf("Douleurs dans le bras droit.")
    val sec = sections1.find(s => d >= s.begin && d < s.end)
    assert(sec.map(_.label) === Some("motif"))
    // empty back-to-back sections: the entity lands in conclusion, not
    // the empty antecedents section (test_empty_sections)
    val text2 = "\nAntécédents :\nConclusion :\nPatient va mieux\n\n" +
      "Au total:\nsortie du patient\n"
    val (_, sections2) = Sections.matcher()(text2)
    val p = text2.indexOf("Patient")
    val sec2 = sections2.find(s => p >= s.begin && p < s.end)
    assert(sec2.map(_.label) === Some("conclusion"))
  }

  test("consultation dates require a trigger before the date") {
    val hits = ConsultationDates.extract(
      "Consultation du 12/03/2021. Né le 01/01/1950.")
    assert(hits.length === 1)
    assert(hits.head.attrs("datetime").startsWith("2021-03-12"))
  }

  test("tables: reference scenario with min_rows=3 (test_tables.py)") {
    val text =
      "\nLe patientqsfqfdf bla bla bla\n" +
        "Leucocytes ¦x10*9/L ¦4.97 ¦4.09-11\n" +
        "Hématies ¦x10*12/L¦4.68 ¦4.53-5.79\n" +
        "Hémoglobine ¦g/dL ¦14.8 ¦13.4-16.7\n" +
        "Hématocrite ¦% ¦44.2 ¦39.2-48.6\n" +
        "VGM ¦fL ¦94.4 + ¦79.6-94\n" +
        "TCMH ¦pg ¦31.6 ¦27.3-32.8\n" +
        "CCMH ¦g/dL ¦33.5 ¦32.4-36.3\n" +
        "Plaquettes ¦x10*9/L ¦191 ¦172-398\n" +
        "VMP ¦fL ¦11.5 + ¦7.4-10.8\n\n" +
        "qdfsdf\n\n" +
        "2/2Pat : <NOM> <Prenom> |<date> | <ipp> |Intitulé RCP\n\n" +
        "Table de taille <= 3 :\n\n" +
        " |Libellé | Unité | Valeur | Intervalle |\n" +
        " |Leucocytes |x10*9/L |4.97 | 4.09-11 |\n\n" +
        "qdfsdf\n\n" +
        " |Libellé | Unité | Valeur | Intervalle |\n" +
        " |Leucocytes |x10*9/L |4.97 | 4.09-11 |\n" +
        " |Hématies |x10*12/L|4.68 | 4.53-5.79 |\n" +
        " |Hémoglobine |g/dL |14.8 | 13.4-16.7 |\n" +
        " |Hématocrite ||44.2 | 39.2-48.6 |\n" +
        " |VGM |fL | 94.4 + | 79.6-94 |\n" +
        " |TCMH |pg |31.6 |\n" +
        " |CCMH |g/dL\n" +
        " |Plaquettes |x10*9/L |191 | 172-398 |\n" +
        " |VMP |fL |11.5 + | 7.4-10.8 |\n\n"
    // min_rows=3 keeps the two big tables and drops the 2-line one and
    // the single patient-banner line (test_tables.py:44-46)
    val tables = TextTables.findTables(text, minRows = 3)
    assert(tables.length === 2)
    // first table: 9 rows x 4 columns, cell [5,0] = TCMH
    val cells0 = TextTables.toCells(text, tables.head)
    assert(cells0.map(_.row).distinct.length === 9)
    assert(cells0.map(_.col).max === 3)
    assert(cells0.find(c => c.row == 5 && c.col == 0)
      .map(_.text) === Some("TCMH"))
    // second table: header row + 9 body rows; the TCMH body row's cell
    // under the "Valeur" header is "31.6" (to_pd_table(header, index))
    val cells1 = TextTables.toCells(text, tables(1))
    val header = cells1.filter(_.row == 0)
    assert(header.map(_.text) ===
      Seq("Libellé", "Unité", "Valeur", "Intervalle"))
    val index = cells1.filter(c => c.row > 0 && c.col == header.head.col)
      .sortBy(_.row)
    assert(index.map(_.text) === Seq("Leucocytes", "Hématies",
      "Hémoglobine", "Hématocrite", "VGM", "TCMH", "CCMH",
      "Plaquettes", "VMP"))
    val valeurCol = header.find(_.text == "Valeur").get.col
    val tcmhRow = index.find(_.text == "TCMH").get.row
    assert(cells1.find(c => c.row == tcmhRow && c.col == valeurCol)
      .map(_.text) === Some("31.6"))
  }

  test("consultation dates: reference scenario (test_consultation_date.py)") {
    val text =
      "\nRéférences : AMO/AMO\n" +
        "Objet : Compte-Rendu de Consultation du 07/10/2018\n" +
        "Madame BEESLY Pamela, âgée de 45 ans, née le 05/10/1987, a été " +
        "vue en consultation\n" +
        "dans le service de NCK CS RHUMATO. Tel: 01-02-03-04-05\n\n" +
        "####\n\nCR CS 3-1-2019 1/2\n\n####\n\n" +
        "Paris, le 24 janvier 2020\n\n####\n\n" +
        "Document signé le 10/02/2020\n\n"
    def ymd(e: Ent): (Int, Int, Int) =
      (e.attrs("year").toInt, e.attrs("month").toInt,
        e.attrs("day").toInt)
    // base: consultation mentions only -> 2 dates
    assert(ConsultationDates.extract(text).map(ymd) ===
      Seq((2018, 10, 7), (2019, 1, 3)))
    // + town datelines -> 3
    assert(ConsultationDates.extract(text, townMention = true).map(ymd)
      === Seq((2018, 10, 7), (2019, 1, 3), (2020, 1, 24)))
    // + document-date mentions -> 4
    assert(ConsultationDates.extract(text, townMention = true,
      documentDateMention = true).map(ymd) ===
      Seq((2018, 10, 7), (2019, 1, 3), (2020, 1, 24), (2020, 2, 10)))
    // hyphenated town dateline (test_consultation_date_berck_sur_mer)
    val berck = ConsultationDates.extract(
      "Berck-sur-Mer, le 30/04/2025", townMention = true)
    assert(berck.map(ymd) === Seq((2025, 4, 30)))
  }

  test("history: cue, section, and old-date paths") {
    val ref = java.time.LocalDateTime.parse("2021-08-23T10:00:00")
    val text = "Antécédents\nInfarctus en 2010.\nConclusion :\nFracture du radius le 20/08/2021."
    val tokens = toks(text)
    val sents = Sentencizer.sentences(tokens)
    val (_, sections) = Sections.matcher()(text)
    val ents = Seq(
      Ent(12, 21, "disease", "Infarctus"),
      Ent(text.indexOf("Fracture"), text.indexOf("Fracture") + 8, "disease",
        "Fracture"))
    val out = History.qualify(text, tokens, sents, ents, sections, Some(ref))
    assert(out(0).attrs("history") === "true")  // in antecedents section
    assert(out(1).attrs("history") === "false") // recent date, no cue
  }

  test("history: reference scenario goldens (test_history.py)") {
    // ported from /root/reference/tests/pipelines/qualifiers/
    // test_history.py:12-97 (history_limit=15 days, note 2020-08-11,
    // birth 1978-11-23): recency VETOES section cues, text cues win
    // when the relative date exceeds the limit, birthdates are excluded
    val note = java.time.LocalDateTime.parse("2020-08-11T00:00:00")
    val birth = java.time.LocalDateTime.parse("1978-11-23T00:00:00")
    def run(text: String, term: String,
        useSections: Boolean = true): String = {
      val tokens = toks(text)
      val sents = Sentencizer.sentences(tokens)
      val sections =
        if (useSections) Sections.matcher()(text)._2 else Seq.empty
      val i = text.indexOf(term)
      val ents = Seq(Ent(i, i + term.length, "disease", term))
      History.qualify(text, tokens, sents, ents, sections, Some(note),
        historyLimitDays = 15, birthDatetime = Some(birth))
        .head.attrs("history")
    }
    // text cue + relative date BEYOND the 15-day limit -> history
    assert(run("Il a un antécédent d'asthme il y a 25 jours.",
      "asthme") === "true")
    // ANTÉCÉDENTS section but a recent date in the sentence -> the
    // recency veto wins over the section cue
    assert(run("Antécédents\nhospitalisé pour asthme il y a 3 jours.",
      "asthme") === "false")
    // ANTÉCÉDENTS section, no date -> history (default section behavior)
    assert(run("Antécédents\nasthme critique.", "asthme") === "true")
    // birthdate excluded: the only old date is the birth date -> not
    // history; with excludeBirthdate=false it WOULD be a history cue
    assert(run("Patient né le 23/11/1978, admis pour une toux.",
      "toux", useSections = false) === "false")
    val bdText = "Patient né le 23/11/1978, admis pour une toux."
    val bdToks = toks(bdText)
    val bdSents = Sentencizer.sentences(bdToks)
    val bdEnts = {
      val i = bdText.indexOf("toux")
      Seq(Ent(i, i + 4, "disease", "toux"))
    }
    assert(History.qualify(bdText, bdToks, bdSents, bdEnts, Seq.empty,
      Some(note), historyLimitDays = 15, birthDatetime = Some(birth),
      excludeBirthdate = false).head.attrs("history") === "true")
    // PARTIAL absolute dates resolve with the reference defaults
    // (models.py:85-178, default_day=15): bare year "en 2015" ->
    // 2015-01-15, far past -> history even without a cue word
    assert(run("Patient opéré pour asthme en 2015.", "asthme",
      useSections = false) === "true")
    // month/year "en 08/2020" -> 2020-08-15, within the 15-day limit
    // of note 2020-08-11 -> RECENT, vetoes the section cue
    assert(run("Antécédents\nhospitalisé pour asthme en 08/2020.",
      "asthme") === "false")
    // relative past dates classify WITHOUT a note datetime
    // (history.py:415-421 compares the duration to the limit directly)
    val relText = "Il a un antécédent d'asthme il y a 25 jours."
    val relToks = toks(relText)
    val relSents = Sentencizer.sentences(relToks)
    val relEnts = {
      val i = relText.indexOf("asthme")
      Seq(Ent(i, i + 6, "disease", "asthme"))
    }
    assert(History.qualify(relText, relToks, relSents, relEnts, Seq.empty,
      noteDatetime = None, historyLimitDays = 15)
      .head.attrs("history") === "true")
  }

  test("all 20 disorder/behavior configs build and detect their term") {
    val examples = Map(
      "ckd" -> "Patient en hémodialyse depuis 2019.",
      "copd" -> "BPCO post-tabagique.",
      "cerebrovascular_accident" -> "AVC ischémique en 2018.",
      "congestive_heart_failure" -> "Décompensation cardiaque récente.",
      "dementia" -> "Maladie d'Alzheimer débutante.",
      "myocardial_infarction" -> "Infarctus du myocarde inférieur.",
      "solid_tumor" -> "Adénocarcinome pulmonaire métastatique.",
      "aids" -> "Patient VIH stade C.")
    Disorders.all.foreach { cfg =>
      val m = ContextualMatcher.matcher(cfg) // every config must build
      examples.get(cfg.label).foreach { ex =>
        val t = toks(ex)
        val hits = m.findMatches(ex, t, Sentencizer.sentences(t))
        assert(hits.nonEmpty, s"${cfg.label} missed in: $ex")
      }
    }
    // exclusion rule: benign tumor is not a solid_tumor hit
    val st = ContextualMatcher.matcher(Disorders.solidTumor)
    val benign = "Tumeur bénigne du sein."
    val tb = toks(benign)
    assert(st.findMatches(benign, tb, Sentencizer.sentences(tb)).isEmpty)
    // assign rule: VIH stade extraction
    val aids = ContextualMatcher.matcher(Disorders.aids)
    val ta = toks("Patient VIH stade C.")
    val hit = aids.findMatches("Patient VIH stade C.", ta,
      Sentencizer.sentences(ta))
    assert(hit.head.attrs.get("stade").map(_.toLowerCase) === Some("c"))
  }

  test("hypothesis and reported speech golden examples") {
    val hyp = new RuleQualifier(Patterns.hypothesis)
    val rep = new RuleQualifier(Patterns.reportedSpeech)
    def run(q: RuleQualifier, text: String, entText: String): Boolean = {
      val tokens = toks(text)
      val sents = Sentencizer.sentences(tokens)
      val b = text.indexOf(entText)
      val out = q.qualify(text, tokens, sents,
        Seq(Ent(b, b + entText.length, "ent", entText)))
      out.head._1
    }
    assert(run(hyp, "Suspicion de fracture du radius.", "fracture"))
    assert(!run(hyp, "Fracture du radius confirmée.", "fracture"))
    assert(run(rep, "Le patient rapporte une douleur thoracique.", "douleur"))
    assert(!run(rep, "Douleur thoracique constatée à l'examen.", "douleur"))
    // quotation containment cue (reference patterns.py `quotation`):
    // entities inside quotes are reported speech even with no verb cue
    // in their scope; guillemets and straight quotes both count
    assert(run(rep, "Au dossier : « douleur thoracique » depuis hier.", "douleur"))
    assert(run(rep, "Au dossier : \"douleur thoracique\" depuis hier.", "douleur"))
    assert(!run(rep, "Au dossier : douleur thoracique depuis hier.", "douleur"))
  }

  test("reported speech: full reference bank (test_reported_speech.py)") {
    // ported from /root/reference/tests/pipelines/qualifiers/
    // test_reported_speech.py:9-43 — every annotated example, span +
    // expected reported_speech value
    val rep = new RuleQualifier(Patterns.reportedSpeech)
    def runAt(text: String, entText: String, from: Int = 0): Boolean = {
      val tokens = toks(text)
      val sents = Sentencizer.sentences(tokens)
      val b = text.indexOf(entText, from)
      assert(b >= 0, s"'$entText' not in '$text'")
      rep.qualify(text, tokens, sents,
        Seq(Ent(b, b + entText.length, "ent", entText))).head._1
    }
    // 1: quote containment, no verb needed
    assert(runAt("Elles sont décrites par X.x. comme des appels à " +
      "l'aide « La pendaison a permis mon hospitalisation ».",
      "pendaison"))
    // 2: preceding verb "rapporte"
    assert(runAt("Rapporte une tristesse de l'humeur avec des idées " +
      "suicidiares à type de pendaison,", "suicidiares"))
    // 3: preceding verb "décrit", entity later in the same sentence
    assert(runAt("Décrit un fléchissement thymique depuis environ " +
      "1 semaine avec idées suicidaires scénarisées (intoxication " +
      "médicamenteuse volontaire)", "intoxication"))
    // 4: "dit" verb scope
    assert(runAt("Dit ne pas savoir comment elle est tombé. " +
      "Minimise la chute. Dit que \"ça arrive. Badaboum\". " +
      "Dit ne pas avoir fait IMV.", "IMV"))
    // 5: "dit qu'" scope reaching the entity in the same sentence
    assert(runAt("Le patient parle \"d'en finir\", et dit qu'il a " +
      "pensé plusieurs fois à se pendre où à se faire une phlébotomie " +
      "lorsqu'il était dans la rue, diminution de ces idées noires " +
      "depuis qu'il vit chez son fils", "phlébotomie"))
    // 6: NO leakage across sentences — first "malade" is inside the
    // "dit qu'" sentence, the second is a plain statement
    val leak = "le patient est admis pour coronavirus. il dit qu'il " +
      "n'est pas malade.\nles tests sont positifs.\nil est malade"
    val first = leak.indexOf("malade")
    assert(runAt(leak, "malade"))
    assert(!runAt(leak, "malade", from = first + 1))
  }

  test("hypothesis: full reference bank (test_hypothesis.py)") {
    // ported from /root/reference/tests/pipelines/qualifiers/
    // test_hypothesis.py:9-19 — every annotated example
    val hyp = new RuleQualifier(Patterns.hypothesis)
    def run(text: String, entText: String): Boolean = {
      val tokens = toks(text)
      val sents = Sentencizer.sentences(tokens)
      val b = text.indexOf(entText)
      assert(b >= 0, s"'$entText' not in '$text'")
      hyp.qualify(text, tokens, sents,
        Seq(Ent(b, b + entText.length, "ent", entText))).head._1
    }
    // 1: "possible" preceding cue
    assert(run("Possible covid-19", "covid-19"))
    // 2: "envisagés" following hypothesis verb
    assert(run("Plusieurs diagnostics sont envisagés. " +
      "Le patient est informé.", "diagnostics"))
    // 3: pseudo cue "même si" -> NOT hypothesis
    assert(!run("même si le patient est jeune.", "le patient est jeune"))
    // 4: "suspicion de" preceding cue
    assert(run("Suspicion de diabète.", "diabète"))
    // 5: plain statement -> certain
    assert(!run("Le ligament est rompu.", "rompu"))
    // 6: "mais" terminates the "probablement" scope -> certain
    assert(!run("Probablement du diabète mais pas de cécité.", "cécité"))
  }
}
