package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Conll, Standoff}

class IoSpec extends AnyFunSuite {
  import TestSpark._

  private def mkBratDir(): String = {
    val dir = Files.createTempDirectory("brat").toString
    Files.writeString(Paths.get(dir, "doc-1.txt"),
      "Le patient a une fracture du radius.\nPas de lésion pulmonaire.")
    Files.writeString(Paths.get(dir, "doc-1.ann"),
      "T1\tdisease 17 35\tfracture du radius\n" +
        "T2\tdisease 44 61;62 62\tlésion pulmonaire\n" +
        "A1\tnegation T2 true\n" +
        "A2\tetat T1 present\n" +
        "#1\tAnnotatorNotes T1\tvu sur radio\n")
    Files.writeString(Paths.get(dir, "doc-2.txt"), "RAS.")
    Files.writeString(Paths.get(dir, "doc-2.ann"), "")
    dir
  }

  test("standoff read: entities, attributes, notes, fragment merge") {
    val dir = mkBratDir()
    val df = Standoff.read(spark, dir).orderBy("doc_id")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("doc-1", "doc-2"))
    val ents = rows(0).getSeq[org.apache.spark.sql.Row](2)
    assert(ents.size === 2)
    val t1 = ents.find(_.getString(0) == "T1").get
    assert(t1.getAs[String]("label") === "disease")
    assert(t1.getAs[Map[String, String]]("attributes") ===
      Map("etat" -> "present"))
    assert(t1.getSeq[String](5) === Seq("vu sur radio"))
    val t2 = ents.find(_.getString(0) == "T2").get
    assert(t2.getAs[Map[String, String]]("attributes")("negation") === "true")
    assert(rows(1).getSeq[org.apache.spark.sql.Row](2).isEmpty)
  }

  test("standoff round-trip write -> read") {
    val dir = mkBratDir()
    val df = Standoff.read(spark, dir)
    val out = Files.createTempDirectory("brat-out").toString
    Standoff.write(df, out)
    val back = Standoff.read(spark, out)
    val a = df.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toString).toSeq
    // notes are not re-emitted by the writer; compare id/label/fragments
    assert(back.count() === df.count())
    val entsBack = back.filter("doc_id = 'doc-1'")
      .selectExpr("explode(entities) as e")
      .selectExpr("e.entity_id", "e.label", "e.attributes")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(entsBack === Set(("T1", "disease"), ("T2", "disease")))
  }

  test("conll-u read: sentences and word fields") {
    val dir = Files.createTempDirectory("conll").toString
    Files.writeString(Paths.get(dir, "sample.conllu"),
      """# sent_id = 1
        |1	Le	le	DET	_	_	2	det	_	_
        |2	patient	patient	NOUN	_	_	0	root	_	_
        |
        |# sent_id = 2
        |1	RAS	ras	NOUN	_	_	0	root	_	_
        |""".stripMargin)
    val df = Conll.read(spark, s"$dir/*.conllu")
    assert(df.count() === 2)
    val first = df.orderBy("sent_id").collect()(0)
    val words = first.getSeq[org.apache.spark.sql.Row](2)
    assert(words.map(_.getAs[String]("FORM")) === Seq("Le", "patient"))
    assert(words.head.getAs[String]("UPOS") === "DET")
  }
}
