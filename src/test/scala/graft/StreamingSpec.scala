package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val streamDir: String = {
    // stage the batch events parquet as a file-stream source directory
    val dir = Files.createTempDirectory("events-stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dir, "events.parquet"))
    dir
  }

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window counts match the batch computation") {
    val ev = EventStreams.readEvents(spark, streamDir)
    val got = runToCompletion(
      EventStreams.tumblingCounts(ev, "1 hour", "0 seconds"), "tumbling",
      mode = "append")
    // batch reference on the same data
    val batch = relational.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // append mode emits only watermark-closed windows; every emitted row
    // must match the batch row exactly
    val b = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val emitted = got.collect()
    assert(emitted.nonEmpty)
    emitted.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      assert(b(key) === r.getLong(2), s"window $key")
    }
  }

  test("streaming sessionization matches batch q16 session count") {
    val ev = EventStreams.readEvents(spark, streamDir)
      .select($"user_id", $"ts", $"value").as[EventStreams.SessionEvent]
    val sessions = runToCompletion(
      EventStreams.sessionize(ev).toDF(), "sessions")
    // batch count of CLOSED sessions: all sessions whose end is at least
    // 30min before the max ts (watermark at end-of-stream = max ts).
    val batch = SparkEntry.queries("q16_sessionize")(spark, sf)
    val totalSessions = batch.count()
    val emitted = sessions.count()
    assert(emitted > 0, "no sessions emitted")
    assert(emitted <= totalSessions)
    // the vast majority of sessions closed before end-of-stream
    assert(emitted >= totalSessions / 2,
      s"$emitted of $totalSessions sessions emitted")
  }

  test("sliding window rates emit watermark-closed windows") {
    val ev = EventStreams.readEvents(spark, streamDir)
    val got = runToCompletion(
      EventStreams.slidingRates(ev, "1 hour", "15 minutes", "0 seconds"),
      "sliding")
    assert(got.count() > 0)
    // each 1h window slid by 15min: counts are positive and approx_users
    // bounded by event count
    got.collect().foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Long]("approx_users") <= r.getAs[Long]("n") * 2)
    }
  }

  test("streaming near-dup finds the batch minhash pairs") {
    // stage documents as a stream with synthetic timestamps
    val docsDir = Files.createTempDirectory("docs-stream").toString
    graft.relational.Tables.documents(spark, sf)
      .withColumn("ts",
        expr("timestamp_micros(1600000000000000 + doc_id * 1000000)"))
      .select("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .parquet(docsDir)
    val hits = runToCompletion(
      EventStreams.nearDupDocs(stream, threshold = 0.9).toDF(), "neardup")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch truth: the planted exact-Jaccard >= 0.9 pairs
    val batch = graft.dedup.Dedup
      .minHashNearDuplicates(
        graft.relational.Tables.documents(spark, sf), "doc_id", "text",
        threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    val recall = batch.count(hits.contains).toDouble / batch.size
    assert(recall >= 0.9, s"stream recall $recall on ${batch.size} pairs")
    // estimator precision: background pairs sit at Jaccard <= 0.07 in
    // this corpus, far under the 0.9 signature bar, so genuine jitter
    // yields ~0 non-batch pairs — a tight bound catches estimator
    // regressions (e.g. comparing wrong signature slices)
    val extras = hits -- batch
    assert(extras.size <= 2,
      s"non-batch pairs: ${extras.take(5)}")
  }

  test("streaming decontamination matches the batch overlap counts") {
    val docsDir = Files.createTempDirectory("decon-stream").toString
    val docs = graft.relational.Tables.documents(spark, sf)
    docs.filter($"doc_id" % 5 =!= 0)
      .withColumn("ts",
        expr("timestamp_micros(1600000000000000 + doc_id * 1000000)"))
      .select("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(docsDir)
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .parquet(docsDir)
    val benchmark = docs.filter($"doc_id" % 5 === 0)
    val got = runToCompletion(
      EventStreams.decontaminateDocs(stream, benchmark, n = 8),
      "decontaminated")
      .select("doc_id", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.dedup.Dedup.decontaminate(
        docs.filter($"doc_id" % 5 =!= 0), benchmark, "doc_id", "text",
        n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batch.nonEmpty, "corpus should contain contaminated docs")
    assert(got === batch)
  }

  test("stateful dedup drops duplicate event ids") {
    // duplicate the source file so every event appears twice
    val dir = Files.createTempDirectory("events-dup").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dir, "a.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dir, "b.parquet"))
    val ev = EventStreams.readEvents(spark, dir)
    val got = runToCompletion(EventStreams.dedupEvents(ev), "dedup")
    val n = relational.Tables.events(spark, sf).count()
    assert(got.count() === n)
  }

  private lazy val docStreamDir: String = {
    val dir = Files.createTempDirectory("docs-stream").toString
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    dir
  }

  private def docStream = spark.readStream
    .schema(relational.Tables.documents(spark, sf).schema)
    .parquet(docStreamDir)

  test("streaming sequence packing equals the batch packing in id order") {
    // one micro-batch + per-group doc_id sort = arrival order == id
    // order, so the stream must reproduce the batch cumsum EXACTLY
    val got = runToCompletion(
      EventStreams.packDocs(docStream, budget = 512, shards = 32).toDF(),
      "packed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = graft.text.TextStats.packSequences(
        relational.Tables.documents(spark, sf), "doc_id", "text",
        budget = 512, shards = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
    // per-shard state is ONE long: a second identical batch appended to
    // the stream must CONTINUE each shard's offset, not restart it —
    // verified by the doc piece count doubling without collisions
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(docStreamDir, "again.parquet"))
    val twice = runToCompletion(
      EventStreams.packDocs(docStream, budget = 512, shards = 32).toDF(),
      "packed2").collect()
    assert(twice.length >= 2 * got.size - 64,
      s"${twice.length} pieces after replaying the corpus " +
        s"(first pass ${got.size})")
  }

  test("the corpus-mixture operator runs unchanged on a stream") {
    // corpusMixture is a broadcast join + narrow explode — stateless,
    // so the BATCH operator itself is streaming-compatible; the stream
    // must emit exactly the batch copy set
    val weights = Map("en" -> 13500, "fr" -> 10000, "zh" -> 7500,
      "de" -> 5000, "es" -> 2500)
    val got = runToCompletion(
      graft.text.TextStats.corpusMixture(docStream, "doc_id", "lang",
          weights)
        .select($"doc_id", $"copy_idx"),
      "mixed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.text.TextStats.corpusMixture(
        relational.Tables.documents(spark, sf), "doc_id", "lang", weights)
      .select($"doc_id", $"copy_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
  }
}
