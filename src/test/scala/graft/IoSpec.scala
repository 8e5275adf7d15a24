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

  test("omop converter: bool attribute coercion (test_converters.py:18-53)") {
    import spark.implicits._
    val note = Seq((1234L, "This is a test.")).toDF("note_id", "note_text")
    // entity 1 never carried the negation attribute -> reads false
    val noteNlp = Seq(
      (0L, 1234L, 0, 4, "This", "test", Some(true)),
      (1L, 1234L, 5, 7, "is", "test", None))
      .toDF("note_nlp_id", "note_id", "start_char", "end_char",
        "lexical_variant", "note_nlp_source_value", "negation")
    val docs = graft.io.Omop.toDocs(note, noteNlp,
      boolAttributes = Seq("negation")).collect()
    assert(docs.length === 1)
    val ents = docs.head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("entities")
    assert(ents.length === 2)
    assert(ents.head.getAs[String]("lexical_variant") === "This")
    assert(ents.head.getAs[Boolean]("negation") === true)
    assert(ents(1).getAs[Boolean]("negation") === false)
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

  test("standoff events (E lines), strict mode, corrupt-line counts") {
    val dir = Files.createTempDirectory("brat-evt").toString
    Files.writeString(Paths.get(dir, "doc-3.txt"), "Opéré puis surveillé.")
    Files.writeString(Paths.get(dir, "doc-3.ann"),
      "T1\tprocedure 0 5\tOpéré\n" +
        "T2\tsurveillance 11 20\tsurveillé\n" +
        "E1\tProcedure:T1 After:T2\n" +
        "A1\tstatus E1 done\n" +
        "T9\tbroken NOPE\tgarbage\n" + // corrupt span -> counted
        "Xjunk line without annotation prefix\n") // ignored, not counted
    // lenient read: events parsed, corrupt surfaced, junk ignored
    val row = Standoff.read(spark, dir).filter("doc_id = 'doc-3'").head()
    val events = row.getSeq[org.apache.spark.sql.Row](
      row.fieldIndex("events"))
    assert(events.size === 1)
    val e1 = events.head
    assert(e1.getString(0) === "E1")
    val args = e1.getSeq[org.apache.spark.sql.Row](1)
      .map(a => (a.getString(0), a.getString(1)))
    assert(args === Seq(("Procedure", "T1"), ("After", "T2")))
    assert(e1.getAs[Map[String, String]](2) === Map("status" -> "done"))
    assert(row.getAs[Int]("n_corrupt_lines") === 1)
    assert(row.getSeq[String](row.fieldIndex("corrupt_lines"))
      .head.startsWith("T9"))
    // events survive the writer round-trip
    val out = Files.createTempDirectory("brat-evt-out").toString
    Standoff.write(Standoff.read(spark, dir), out)
    val back = Standoff.read(spark, out).filter("doc_id = 'doc-3'").head()
    assert(back.getSeq[org.apache.spark.sql.Row](
      back.fieldIndex("events")).size === 1)
    assert(back.getAs[Int]("n_corrupt_lines") === 0)
    // strict mode: the corrupt line fails the job, reference-style
    val thrown = intercept[org.apache.spark.SparkException] {
      Standoff.read(spark, dir, strict = true).collect()
    }
    assert(thrown.getMessage != null)
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

  test("zValue matches a bit-by-bit Morton reference incl. 31-bit extremes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val rng = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x7FFFFFFFL, 0L)) ++
      Seq.fill(50)((rng.nextLong().abs & 0x7FFFFFFFL,
        rng.nextLong().abs & 0x7FFFFFFFL))
    val got = cases.toDF("x", "y")
      .select($"x", $"y", graft.io.ZOrder.zValue($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // interleave is a bijection on the sampled pairs
    assert(got.map(_.getLong(2)).distinct.length === cases.distinct.length)
    // monotone per dimension (the doc's box-containment claim): growing
    // either coordinate never decreases the code
    val zs = cases.map { case (x, y) => (x, y, morton(x, y)) }
    for ((x1, y1, z1) <- zs; (x2, y2, z2) <- zs
         if x1 <= x2 && y1 <= y2)
      assert(z1 <= z2, s"($x1,$y1) -> ($x2,$y2)")
  }

  test("z-ordered layout concentrates a 2-D box predicate in few files") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val orders = relational.Tables.table(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("day"))
    val zDir = Files.createTempDirectory("zorder").toString
    val baseDir = Files.createTempDirectory("zbase").toString
    graft.io.ZOrder.writeZOrdered(orders, zDir,
      col("o_custkey"), col("day"), numFiles = 8)
    // baseline: the same 8 files but hash-scattered (the layout a plain
    // repartition produces)
    orders.repartition(8).write.mode("overwrite").parquet(baseDir)
    val (cLo, cHi) = (10L, 40L)
    val dayBounds = orders.agg(min($"day"), max($"day")).head()
    val (dLo, dHi) = (dayBounds.getInt(0).toLong,
      dayBounds.getInt(0).toLong + 365)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter($"o_custkey".between(cLo, cHi) && $"day".between(dLo, dHi))
        .select(input_file_name()).distinct().count()
    val zf = filesTouched(zDir)
    val bf = filesTouched(baseDir)
    assert(bf === 8L, s"hash layout should scatter the box over all files, got $bf")
    assert(zf < bf, s"z-order must beat hash layout: $zf vs $bf")
    assert(zf <= 4L, s"z-order box should stay within a few files, got $zf")
    // and the layout preserves the data exactly
    assert(spark.read.parquet(zDir).count() === orders.count())
  }

  test("dynamic partition overwrite rewrites ONLY the partitions in the " +
      "incoming frame") {
    // the warehouse-maintenance shape at 100 TB: re-landing one day/type
    // must not truncate the table (static overwrite mode would).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("dynpart").toString
    val ev = relational.Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // re-land ONLY the 'click' partition, halved
    val clicksHalf = ev.filter($"event_type" === "click" &&
      $"event_id" % 2 === 0)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try clicksHalf.write.partitionBy("event_type").mode("overwrite")
      .parquet(dir)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("click") < before("click"), "click partition replaced")
    (before.keySet - "click").foreach { t =>
      assert(after(t) === before(t), s"partition $t must be untouched")
    }
  }

  test("schema evolution: mergeSchema unions generations, old files " +
      "read the new column as null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("mergeschema").toString
    Seq((1L, "a")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", "fr")).toDF("id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "lang", "text"))
    val rows = merged.orderBy($"id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("lang"))))
    assert(rows.toSeq === Seq((1L, None), (2L, Some("fr"))))
  }

  test("csv scan (SURVEY 2.11 scans row): header/delimiter/quote round " +
      "trip equals the parquet read") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("csvio").toString
    val n = relational.Tables.nation(spark, sf)
    // pipe delimiter forces the quoting path on free-text comments
    n.write.option("header", "true").option("delimiter", "|")
      .mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").option("delimiter", "|")
      .schema(n.schema).csv(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col(df.columns.head)).collect().toSeq
    assert(back.schema === n.schema, "explicit schema must win over inference")
    assert(rows(back) === rows(n))
  }
}
