package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Stream

class StreamFacadeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stream combinators: map, flatMap, mapBatches, shuffle, local iterator") {
    val s = Stream.fromSeq(spark, (1 to 100).toSeq)
    // map/flatten arithmetic mirror of tests/data/test_stream.py:14-37
    val out = s.map(_ * 2).flatMap(x => Seq(x, x + 1))
      .toLocalIterator.toSeq
    assert(out.size === 200)
    assert(out.toSet === (1 to 100).flatMap(x => Seq(2 * x, 2 * x + 1)).toSet)

    // batch-wise map under a words-style budget: batches respect the cap
    val batched = s.mapBatches[Int]("25 words", sizeOf = _ => 5L) { batch =>
      assert(batch.size <= 5) // 25 budget / 5 per item
      Seq(batch.sum)
    }.toLocalIterator.toSeq
    assert(batched.sum === (1 to 100).sum)

    // seeded shuffle is a permutation and deterministic
    val sh1 = s.shuffle(7).toLocalIterator.toSeq
    val sh2 = s.shuffle(7).toLocalIterator.toSeq
    assert(sh1 === sh2)
    assert(sh1.sorted === (1 to 100).toSeq)
    assert(sh1 !== (1 to 100).toSeq)
  }

  test("stream loop yields reshuffled epochs; parquet write round-trips") {
    val s = Stream.fromSeq(spark, (1 to 50).toSeq)
    val epochs = s.loop(3).map(_.toLocalIterator.toSeq).toSeq
    assert(epochs.size === 3)
    assert(epochs.map(_.sorted).distinct.size === 1)
    assert(epochs.distinct.size === 3) // different orders

    val dir = java.nio.file.Files.createTempDirectory("stream-out").toString
    s.map(x => x * 10).writeParquet(s"$dir/p", maxRecordsPerFile = 10)
    val back = spark.read.parquet(s"$dir/p").as[Int].collect().sorted
    assert(back.toSeq === (1 to 50).map(_ * 10))
  }

  test("typed ClinicalDoc view: annotate and project to note_nlp") {
    val df = Seq(
      ("n1", "Le scanner ne détecte aucune fracture.", "2021-08-23 10:00:00"),
      ("n2", "Douleur au bras.", "2021-08-24 09:00:00"))
      .toDF("note_id", "note_text", "dt")
    val docs = graft.core.ClinicalDoc.annotate(df, NlpFixture.pipeline,
      datetimeCol = Some("dt"))
    val collected = docs.collect().map(d => d.note_id -> d).toMap
    assert(collected("n1").sents.nonEmpty)
    assert(collected("n1").entities.exists(e =>
      e.text.toLowerCase.contains("fracture") &&
        e.attrs("negation") == "true"))
    assert(collected("n1").note_datetime.isDefined)
    val nlpRows = graft.core.ClinicalDoc.toNoteNlp(docs)
    assert(nlpRows.columns.toSeq.take(2) === Seq("note_nlp_id", "note_id"))
    assert(nlpRows.count() >= 2)
  }

  test("graft_jaccard64 is SQL-callable once registered") {
    // GraftExtensions does this at session build via injectFunction; an
    // already-running session registers through the function registry.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard64",
      exprs => functions.JaccardDistinctLongs(exprs(0), exprs(1)),
      "built-in")
    val j = spark.sql(
      "SELECT graft_jaccard64(array(1L,2L,3L), array(2L,3L,4L)) AS j")
      .head().getDouble(0)
    assert(j === 0.5)
  }
}

object NlpFixture {
  val pipeline: graft.pipes.DocPipeline = graft.pipes.DocPipeline(
    terms = Map("fracture" -> Seq("fracture"), "douleur" -> Seq("douleur")),
    qualifiers = Seq(graft.nlp.Patterns.negation))
}
