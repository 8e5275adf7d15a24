package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp._
import graft.io.{HfDatasetDisk, HuggingFace, Standoff}

class FuzzyHfSpec extends AnyFunSuite {
  private def toks(s: String) =
    Normalizer.normalize(s, Tokenizer.tokenize(s))

  test("fuzzy matcher catches misspellings above threshold") {
    val m = FuzzyMatcher.build("drug",
      Seq("paracetamol", "amoxicilline", "doliprane"))
    def hits(s: String) = m.findMatches(toks(s), s)
    // exact
    assert(hits("Prise de paracetamol ce matin.").map(_.attrs("term"))
      === Seq("paracetamol"))
    // one-letter typo
    val typo = hits("Prise de paracetemol ce matin.")
    assert(typo.nonEmpty && typo.head.attrs("term") === "paracetamol")
    // accent/case variants fold through normalization
    assert(hits("Amoxicilline prescrite.").nonEmpty)
    // unrelated words do not match
    assert(hits("Le patient mange des pommes de terre.").isEmpty)
  }

  test("fuzzy matcher multi-token terms and similarity ordering") {
    val m = FuzzyMatcher.build("dx", Seq("douleur thoracique"),
      threshold = 0.7)
    val s = "Se plaint de douleurs thoraciques depuis hier."
    val hits = m.findMatches(toks(s), s)
    assert(hits.nonEmpty)
    assert(hits.head.attrs("similarity").toDouble >= 0.7)
    assert(hits.head.text.toLowerCase.startsWith("douleurs"))
  }

  test("HF NER round trip: BIO -> spans -> BIO") {
    val tokens = Seq("Le", "patient", "a", "une", "fracture", "du", "radius")
    val tags = Seq("O", "B-PER", "O", "O", "B-DIS", "I-DIS", "I-DIS")
    val (text, ents) = HuggingFace.nerToDoc(tokens, tags)
    assert(text === "Le patient a une fracture du radius")
    assert(ents.map(e => (e.label, e.text)) ===
      Seq(("PER", "patient"), ("DIS", "fracture du radius")))
    assert(HuggingFace.docToNer(tokens, ents) === tags)
  }

  test("HF NER: BIOUL and broken-BIO tolerance") {
    val (_, ents) = HuggingFace.nerToDoc(
      Seq("a", "b", "c", "d"), Seq("U-X", "O", "B-Y", "L-Y"))
    assert(ents.map(_.label) === Seq("X", "Y"))
    // I- without B- starts a new span (lenient)
    val (_, e2) = HuggingFace.nerToDoc(
      Seq("a", "b"), Seq("I-Z", "I-Z"))
    assert(e2.map(_.label) === Seq("Z"))
    assert(e2.head.text === "a b")
  }

  test("HF dataset disk layout: sharded Arrow IPC round trip into the NER converter") {
    import TestSpark.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = new java.io.File("target/hf-ds-spec")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType),
      StructField("tokens", ArrayType(StringType)),
      StructField("ner_tags", ArrayType(StringType)),
      StructField("score", DoubleType),
      StructField("ok", BooleanType)))
    val rows = Seq(
      Row(0L, "Pas de fracture", Seq("Pas", "de", "fracture"),
        Seq("O", "O", "B-lesion"), 0.5, true),
      Row(1L, null, Seq("fracture", "du", "radius"),
        Seq("B-lesion", "I-lesion", "O"), 1.5, false),
      Row(2L, "rien", Seq.empty[String], Seq.empty[String], -1.0, true))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    HfDatasetDisk.write(df, dir.getPath)
    // the save_to_disk layout is present
    assert(new java.io.File(dir, "state.json").exists())
    assert(new java.io.File(dir, "dataset_info.json").exists())
    assert(dir.listFiles().count(_.getName.endsWith(".arrow")) === 2)
    // bit-faithful round trip, shards ordered by state.json
    val back = HfDatasetDisk.read(spark, dir.getPath)
    assert(back.schema === schema)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.map(r => (r.getLong(0), r.getString(1),
      r.getSeq[String](2), r.getSeq[String](3), r.getDouble(4),
      r.getBoolean(5))).toSeq ===
      rows.map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2),
        r.getSeq[String](3), r.getDouble(4), r.getBoolean(5))))
    // and the payload feeds the HF NER converter directly
    val (text, ents) = HuggingFace.nerToDoc(
      got(1).getSeq[String](2), got(1).getSeq[String](3))
    assert(text === "fracture du radius")
    assert(ents.map(e => (e.text, e.label)) === Seq(
      ("fracture du", "lesion")))
    // IN-PLACE rewrite: the input is a LAZY read of the same directory
    // — the staged write must finish its job before touching the old
    // shards (an up-front delete would destroy the input mid-plan) and
    // must not leave stale higher-numbered shards behind
    val rewritten = HfDatasetDisk.read(spark, dir.getPath)
      .filter("id < 2").repartition(1)
    HfDatasetDisk.write(rewritten, dir.getPath)
    assert(dir.listFiles().count(_.getName.endsWith(".arrow")) === 1)
    assert(!dir.listFiles().exists(_.getName.startsWith(".stage-")))
    val after = HfDatasetDisk.read(spark, dir.getPath).collect()
      .map(_.getLong(0)).sorted
    assert(after.toSeq === Seq(0L, 1L))
  }

  test("BRAT relations parse") {
    val ann = "T1\tdisease 0 8\tfracture\n" +
      "T2\tbody_part 12 18\tradius\n" +
      "R1\tlocated_in Arg1:T1 Arg2:T2\n"
    val (ents, rels) = Standoff.parseAnnFull("fracture du radius", ann)
    assert(ents.size === 2)
    assert(rels === Seq(Standoff.BratRelation("R1", "located_in", "T1", "T2")))
  }
}
