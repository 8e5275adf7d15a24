package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.pipes._

/** Golden ledgers: every annotated example of the reference's disorder
  * and behavior test banks
  * (`/root/reference/tests/pipelines/ner/disorders/<name>.py`), asserted with
  * the reference harness's semantics (`test_all.py:82-113`):
  *   - `has_match = true` -> at least one entity;
  *   - if entities were found, the FIRST entity's detailed status must
  *     equal the expected value (None = no detailed status);
  *   - where a negation expectation is given, every entity must carry it.
  * `has_match = false` entries assert NOTHING when no entity is found
  * (the reference's `len(ents) >= int(has_match)` is vacuous for false) —
  * here they additionally assert zero entities, with the documented
  * exception of CKD's acute-on-chronic sentence, which the reference
  * patterns DO match (its bank relies on the vacuous check).
  */
class DisorderBankSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  /** One bank example: text, has_match, expected detailed status of the
    * first entity, expected negation (None = unchecked), and whether a
    * no-match expectation is strict (see class doc).
    */
  case class Ex(
      text: String,
      hasMatch: Boolean,
      status: Option[String] = None,
      negation: Option[Boolean] = None,
      strictAbsence: Boolean = true)

  private def check(spec: DisorderBank.Spec, examples: Seq[Ex]): Unit = {
    val m = DisorderBank.matcher(spec)
    examples.foreach { ex =>
      val tokens = toks(ex.text)
      val sents = Sentencizer.sentences(tokens)
      val ents = m.findMatches(ex.text, tokens, sents)
      if (ex.hasMatch)
        assert(ents.nonEmpty, s"${spec.label} missed: '${ex.text}'")
      else if (ex.strictAbsence)
        assert(ents.isEmpty,
          s"${spec.label} spurious ${ents.map(_.text)} in: '${ex.text}'")
      if (ents.nonEmpty) {
        assert(ents.head.attrs.get("detailed_status") === ex.status,
          s"${spec.label} status in: '${ex.text}'")
        ex.negation.foreach { n =>
          assert(ents.forall(_.attrs.get("negation").contains(n.toString)),
            s"${spec.label} negation in: '${ex.text}'")
        }
      }
    }
  }

  test("aids bank (disorders/AIDS.py)") {
    check(DisorderBank.aids, Seq(
      Ex("Patient atteint du VIH au stade SIDA.", hasMatch = true),
      Ex("Patient atteint du VIH.", hasMatch = false),
      Ex("Il y a un VIH avec coinfection pneumocystose", hasMatch = true),
      Ex("Présence d'un VIH stade C", hasMatch = true)))
  }

  test("ckd bank (disorders/CKD.py)") {
    check(DisorderBank.ckd, Seq(
      Ex("Patient atteint d'une glomérulopathie.", hasMatch = true),
      Ex("Patient atteint d'une tubulopathie aigüe.", hasMatch = false),
      Ex("Patient transplanté rénal", hasMatch = true),
      // the reference's acute_on_chronic regex DOES match this sentence;
      // its bank marks it False but only via the vacuous >=0 check
      // (test_all.py:98), so absence is not asserted there either
      Ex("Présence d'une insuffisance rénale aigüe sur chronique",
        hasMatch = false, strictAbsence = false),
      Ex("Le patient a été dialysé", hasMatch = false),
      Ex("Le patient est dialysé chaque lundi", hasMatch = true),
      Ex("Présence d'une IRC", hasMatch = false),
      Ex("Présence d'une IRC sévère", hasMatch = true),
      Ex("Présence d'une IRC de classe IV", hasMatch = true),
      Ex("Présence d'une IRC avec DFG à 30", hasMatch = true),
      Ex("Présence d'une maladie rénale avec DFG à 110",
        hasMatch = false)))
  }

  test("copd bank (disorders/COPD.py)") {
    check(DisorderBank.copd, Seq(
      Ex("Une fibrose interstitielle diffuse idiopathique",
        hasMatch = true),
      Ex("Patient atteint de pneumoconiose", hasMatch = true),
      Ex("Présence d'une HTAP.", hasMatch = true),
      Ex("On voit une hypertension pulmonaire minime", hasMatch = false),
      Ex("La patiente a été mis sous oxygénorequérance",
        hasMatch = false),
      Ex("La patiente est sous oxygénorequérance au long cours",
        hasMatch = true)))
  }

  test("cerebrovascular accident bank (disorders/cerebrovascular_accident.py)") {
    check(DisorderBank.cerebrovascularAccident, Seq(
      Ex("Patient hospitalisé à AVC.", hasMatch = false),
      Ex("Hospitalisation pour un AVC.", hasMatch = true),
      Ex("Saignement intracranien", hasMatch = true),
      Ex("Thrombose périphérique", hasMatch = false),
      Ex("Thrombose sylvienne", hasMatch = true),
      Ex("Infarctus cérébral", hasMatch = true),
      Ex("Soigné via un thrombolyse", hasMatch = true)))
  }

  test("congestive heart failure bank (disorders/congestive_heart_failure.py)") {
    check(DisorderBank.congestiveHeartFailure, Seq(
      Ex("Présence d'un oedème pulmonaire", hasMatch = true),
      Ex("Le patient est équipé d'un pace-maker", hasMatch = true),
      Ex("Un cardiopathie non décompensée", hasMatch = false),
      Ex("Insuffisance cardiaque", hasMatch = true),
      Ex("Insuffisance cardiaque minime", hasMatch = false)))
  }

  test("connective tissue disease bank (disorders/connective_tissue_disease.py)") {
    check(DisorderBank.connectiveTissueDisease, Seq(
      Ex("Présence d'une sclérodermie.", hasMatch = true),
      Ex("Patient atteint d'un lupus.", hasMatch = true),
      Ex("Présence d'anticoagulants lupiques,", hasMatch = false),
      Ex("Il y a une MICI.", hasMatch = true),
      Ex("Syndrome de Raynaud", hasMatch = true)))
  }

  test("dementia bank (disorders/dementia.py)") {
    check(DisorderBank.dementia, Seq(
      Ex("D'importants déficits cognitifs", hasMatch = true),
      Ex("Patient atteint de démence", hasMatch = true),
      Ex("On retrouve des anti-SLA", hasMatch = false),
      Ex("Une maladie de Charcot", hasMatch = true)))
  }

  test("diabetes bank (disorders/diabetes.py)") {
    val without = Some("WITHOUT_COMPLICATION")
    val withC = Some("WITH_COMPLICATION")
    check(DisorderBank.diabetes, Seq(
      Ex("Présence d'un DT2", hasMatch = true, status = without),
      Ex("Présence d'un DNID", hasMatch = true, status = without),
      Ex("Patient diabétique", hasMatch = true, status = without),
      Ex("Un diabète insipide", hasMatch = false),
      Ex("Atteinte neurologique d'origine diabétique",
        hasMatch = true, status = withC),
      Ex("Une rétinopathie diabétique", hasMatch = true, status = withC),
      Ex("Il y a un mal perforant plantaire",
        hasMatch = true, status = withC),
      Ex("Le patient a un diabète non insulino-dépendant",
        hasMatch = true, status = without),
      Ex("Il est diabétique sans insulino dépendance",
        hasMatch = true, status = without)))
  }

  test("diabetes far-complications scan (diabetes.py:138-147)") {
    val without = Some("WITHOUT_COMPLICATION")
    val withC = Some("WITH_COMPLICATION")
    // bullet-list complications land past the sentence-limited
    // complicated_after window but inside the +50-token far scan
    check(DisorderBank.diabetes, Seq(
      Ex("Diabète de type 2.\n- HTA bien contrôlée\n" +
        "- insuffisance veineuse\n- néphropathie sévère",
        hasMatch = true, status = withC),
      // past the 50-token far window -> stays uncomplicated
      Ex("Diabète de type 2.\n" +
        ("- le bilan du jour reste strictement normal\n" * 8) +
        "- néphropathie sévère",
        hasMatch = true, status = without),
      // the "db" false-positive drop runs BEFORE the far scan
      // (diabetes.py:128-134 elif order): a far complication alone
      // must not resurrect a bare "db" mention
      Ex("db.\n- néphropathie sévère", hasMatch = false)))
    // the probe is post-rule-internal: never surfaced as an attr
    val m = DisorderBank.matcher(DisorderBank.diabetes)
    val text = "Diabète de type 2.\n- HTA\n- néphropathie sévère"
    val tokens = toks(text)
    val ents = m.findMatches(text, tokens, Sentencizer.sentences(tokens))
    assert(ents.nonEmpty && !ents.exists(_.attrs.contains("far_complications")))
  }

  test("hemiplegia bank (disorders/hemiplegia.py)") {
    check(DisorderBank.hemiplegia, Seq(
      Ex("Patient hémiplégique", hasMatch = true),
      Ex("Paralysie des membres inférieurs", hasMatch = true),
      Ex("Patient en LIS", hasMatch = true)))
  }

  test("leukemia bank (disorders/leukemia.py)") {
    check(DisorderBank.leukemia, Seq(
      Ex("Sydrome myéloprolifératif", hasMatch = true),
      Ex("Sydrome myéloprolifératif bénin", hasMatch = false),
      Ex("Patient atteint d'une LAM", hasMatch = true),
      Ex("Une maladie de Vaquez", hasMatch = true)))
  }

  test("liver disease bank (disorders/liver_disease.py)") {
    val mild = Some("MILD")
    val severe = Some("MODERATE_TO_SEVERE")
    check(DisorderBank.liverDisease, Seq(
      Ex("Il y a une fibrose hépatique", hasMatch = true, status = mild),
      Ex("Une hépatite B chronique", hasMatch = true, status = mild),
      Ex("Le patient consulte pour une cirrhose",
        hasMatch = true, status = severe),
      Ex("Greffe hépatique.", hasMatch = true, status = severe)))
  }

  test("lymphoma bank (disorders/lymphoma.py)") {
    check(DisorderBank.lymphoma, Seq(
      Ex("Un lymphome de Hodgkin.", hasMatch = true),
      Ex("Atteint d'un Waldenstörm", hasMatch = true),
      Ex("Un LAGC", hasMatch = true),
      Ex("anti LAGC: 10^4/mL", hasMatch = false)))
  }

  test("myocardial infarction bank (disorders/myocardial_infarction.py)") {
    check(DisorderBank.myocardialInfarction, Seq(
      Ex("Une cardiopathie ischémique", hasMatch = true),
      Ex("Une cardiopathie non-ischémique", hasMatch = false),
      Ex("Présence d'un stent sur la marginale", hasMatch = true),
      Ex("Présence d'un stent périphérique", hasMatch = false),
      Ex("infarctus du myocarde", hasMatch = true)))
  }

  test("peptic ulcer disease bank (disorders/peptic_ulcer_disease.py)") {
    check(DisorderBank.pepticUlcerDisease, Seq(
      Ex("Beaucoup d'ulcères gastriques", hasMatch = true),
      Ex("Présence d'UGD", hasMatch = true),
      Ex("La patient à des ulcères", hasMatch = false),
      Ex("Au niveau gastrique: blabla blabla blabla blabla blabla " +
        "quelques ulcères", hasMatch = true)))
  }

  test("peripheral vascular disease bank (disorders/peripheral_vascular_disease.py)") {
    check(DisorderBank.peripheralVascularDisease, Seq(
      Ex("Un AOMI", hasMatch = true),
      Ex("Présence d'un infarctus rénal", hasMatch = true),
      Ex("Une angiopathie cérébrale", hasMatch = false),
      Ex("Une angiopathie", hasMatch = true),
      Ex("Une thrombose cérébrale", hasMatch = false),
      Ex("Une thrombose des veines superficielles", hasMatch = false),
      Ex("Une thrombose", hasMatch = true),
      Ex("Effectuer un bilan pre-trombose", hasMatch = false),
      Ex("Une ischémie des MI est remarquée.", hasMatch = true),
      Ex("Plusieurs cas d'EP", hasMatch = true),
      Ex("Effectuer des cures d'EP", hasMatch = false),
      Ex("Le patient est hypertendu", hasMatch = true),
      Ex("Une hypertension portale", hasMatch = false)))
  }

  test("solid tumor bank (disorders/solid_tumor.py, ct-scan + tnm config)") {
    // the bank runs with use_patterns_metastasis_ct_scan + use_tnm
    // (test_all.py:22 solid_tumor_config)
    val loc = Some("LOCALIZED")
    val met = Some("METASTASIS")
    val examples = Seq(
      Ex("Présence d'un carcinome intra-hépatique.",
        hasMatch = true, status = loc),
      Ex("Patient avec un K sein.", hasMatch = true, status = loc),
      Ex("Il y a une tumeur bénigne", hasMatch = false),
      Ex("Tumeur métastasée", hasMatch = true, status = met),
      Ex("Cancer du poumon au stade 4", hasMatch = true, status = met),
      Ex("Cancer du poumon au stade 2", hasMatch = true, status = loc),
      Ex("Présence de nombreuses lésions secondaires",
        hasMatch = true, status = met),
      Ex("Patient avec fracture abcddd secondaire. Cancer de",
        hasMatch = true, status = met),
      Ex("Patient avec lesions non ciblées", hasMatch = true,
        status = met),
      Ex("TNM: pTx N1 M1", hasMatch = true, status = met))
    examples.foreach { ex =>
      val tokens = toks(ex.text)
      val sents = Sentencizer.sentences(tokens)
      val ents = DisorderBank.solidTumorMatches(ex.text, tokens, sents,
        useCtScan = true, useTnm = true)
      if (ex.hasMatch)
        assert(ents.nonEmpty, s"solid_tumor missed: '${ex.text}'")
      else assert(ents.isEmpty,
        s"solid_tumor spurious ${ents.map(_.text)} in: '${ex.text}'")
      if (ents.nonEmpty)
        assert(ents.head.attrs.get("detailed_status") === ex.status,
          s"solid_tumor status in: '${ex.text}'")
    }
  }

  test("alcohol bank (disorders/alcohol.py)") {
    val abst = Some("ABSTINENCE")
    check(DisorderBank.alcohol, Seq(
      Ex("Patient alcoolique.", hasMatch = true),
      Ex("OH chronique.", hasMatch = true),
      Ex("Prise d'alcool occasionnelle", hasMatch = false),
      Ex("Application d'un pansement alcoolisé", hasMatch = false),
      Ex("Alcoolisme sevré", hasMatch = true, status = abst),
      Ex("Alcoolisme non sevré", hasMatch = true),
      Ex("Alcool: 0", hasMatch = true, negation = Some(true)),
      Ex("Le patient est en cours de sevrage éthylotabagique",
        hasMatch = true, status = abst),
      Ex("Patient alcoolique: non.", hasMatch = true,
        negation = Some(true))))
  }

  test("tobacco bank (disorders/tobacco.py)") {
    val abst = Some("ABSTINENCE")
    check(DisorderBank.tobacco, Seq(
      Ex("Tabagisme évalué à 15 PA", hasMatch = true),
      Ex("Patient tabagique", hasMatch = true),
      Ex("Tabagisme festif", hasMatch = false),
      Ex("On a un tabagisme ancien", hasMatch = true, status = abst),
      Ex("Tabac: 0", hasMatch = true, negation = Some(true)),
      Ex("Tabagisme passif", hasMatch = true, negation = Some(true)),
      Ex("Tabac: sevré depuis 5 ans", hasMatch = true, status = abst),
      Ex("Le patient ne fume aucun truc.", hasMatch = true,
        negation = Some(true)),
      Ex("Le patient fume 0 PA.", hasMatch = true,
        negation = Some(true))))
  }

  test("covid bank (ner/test_covid.py)") {
    // the pipe expands to the disease-of-covid phrase when present
    val m = DisorderBank.matcher(DisorderBank.covid)
    Seq(
      ("Patient admis pour coronavirus", "coronavirus"),
      ("Patient admis pour pneumopathie à coronavirus",
        "pneumopathie à coronavirus")).foreach { case (text, expected) =>
      val tokens = toks(text)
      val ents = m.findMatches(text, tokens,
        Sentencizer.sentences(tokens))
      assert(ents.nonEmpty, s"covid missed in '$text'")
      assert(ents.head.text === expected, s"span in '$text'")
    }
  }

  test("suicide attempt bank with modalities (ner/test_suicide_attempt.py)") {
    val m = DisorderBank.matcher(DisorderBank.suicideAttempt)
    // (text, expected (entText, modality) — None = no match)
    val bank: Seq[(String, Option[(String, String)])] = Seq(
      ("J'ai vu le patient à cause d'une TS médicamenetuse." +
        "J'ai vu le patient à cause d'une ts médicamenetuse.",
        Some(("TS", "suicide_attempt_unspecific"))),
      ("J'ai vu le patient à cause d'une IMV.",
        Some(("IMV", "intentional_drug_overdose"))),
      ("surface TS", None),
      ("Patiente hospitalisée à cause d'une Tentative d'autolyse.",
        Some(("Tentative d'autolyse", "autolysis"))),
      ("Le patient exprime des idées de défenestration", None),
      ("vu aux urgences suite à une défenestration volontaire",
        Some(("défenestration volontaire", "jumping_from_height"))),
      ("amené par les pompiers à cause d'une phlebotomie",
        Some(("phlebotomie", "cuts"))),
      ("Antécédents :\n- pendaison (2010)",
        Some(("pendaison", "strangling"))),
      ("copain du patient : plusieurs événements d'autodestruction",
        Some(("autodestruction", "self_destructive_behavior"))),
      ("suspicion d'ingestion de caustique avec des idées suicidaires",
        Some(("ingestion de caustique", "burn_gas_caustic"))))
    bank.foreach { case (text, expected) =>
      val tokens = toks(text)
      val ents = m.findMatches(text, tokens,
        Sentencizer.sentences(tokens))
      expected match {
        case None =>
          assert(ents.isEmpty,
            s"spurious ${ents.map(_.text)} in '$text'")
        case Some((entText, modality)) =>
          assert(ents.length === 1,
            s"expected 1 ent in '$text', got ${ents.map(_.text)}")
          assert(ents.head.text === entText, s"span in '$text'")
          assert(ents.head.attrs("modality") === modality,
            s"modality in '$text'")
      }
    }
  }

  test("all bank specs build and are label-distinct") {
    val labels = DisorderBank.all.map(_.label)
    assert(labels.distinct.size === labels.size)
    DisorderBank.all.foreach(s => DisorderBank.matcher(s))
  }
}
