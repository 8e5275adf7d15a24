package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{HfDatasetDisk, Standoff}

/** DataSource V2 behavior of the custom sources: short-name
  * registration, column pruning visible in the executed plan, and
  * pruning reaching the FILE level for brat (.ann never parsed when no
  * annotation column is required).
  */
class DataSourceV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bratDir(): String = {
    val dir = Files.createTempDirectory("brat-v2").toString
    Files.writeString(java.nio.file.Path.of(dir, "a.txt"),
      "Patient admis pour asthme.")
    Files.writeString(java.nio.file.Path.of(dir, "a.ann"),
      "T1\tmaladie 19 25\tasthme\nA1\tnegation T1\n")
    Files.writeString(java.nio.file.Path.of(dir, "b.txt"),
      "Aucun antecedent.")
    Files.writeString(java.nio.file.Path.of(dir, "b.ann"), "")
    dir
  }

  test("brat V2: format(\"brat\") reads with full schema and values") {
    val df = spark.read.format("brat").load(bratDir()).orderBy("doc_id")
    assert(df.columns.toSeq === Seq("doc_id", "text", "entities",
      "relations", "events", "corrupt_lines", "n_corrupt_lines"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
    val ents = rows.head.getSeq[org.apache.spark.sql.Row](2)
    assert(ents.length === 1)
    assert(ents.head.getAs[String]("label") === "maladie")
    assert(ents.head.getAs[Map[String, String]]("attributes")
      === Map("negation" -> "true"))
  }

  test("brat V2: column pruning reaches the plan and the .ann files") {
    val dir = bratDir()
    val pruned = spark.read.format("brat").load(dir).select("doc_id")
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan node must carry ONLY the pruned column, and its
    // description must say the .ann side is skipped entirely
    assert(plan.contains("BatchScan"), plan)
    assert(!plan.contains("entities"), plan)
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq
      === Seq("a", "b"))
    val desc = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(desc.contains("annFiles=SKIPPED"), desc)
    // proof by behavior: a CORRUPT .ann under strict=true fails only
    // when an annotation column forces the parse
    Files.writeString(java.nio.file.Path.of(dir, "a.ann"),
      "T1\tbroken-grammar-line\n")
    val strict = spark.read.format("brat")
      .option("strict", "true").load(dir)
    assert(strict.select("doc_id", "text").collect().length === 2)
    intercept[org.apache.spark.SparkException] {
      strict.select("entities").collect()
    }
  }

  test("hfdataset V2: pruned read decodes only required vectors") {
    val dir = Files.createTempDirectory("hf-v2").toString
    val df = spark.range(0, 100).selectExpr("id", "cast(id * 2 as double) as d",
      "concat('t', id) as s", "array(id, id + 1) as xs")
    HfDatasetDisk.write(df.repartition(3), dir)
    val full = spark.read.format("hfdataset").load(dir)
    assert(full.columns.toSeq === Seq("id", "d", "s", "xs"))
    assert(full.count() === 100)
    val pruned = full.select("s", "id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
    assert(!plan.contains("xs"), plan)
    val got = pruned.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._2)
    assert(got.length === 100)
    assert(got.head === ("t0", 0L) && got.last === ("t99", 99L))
    // nested list column survives the unpruned path
    val xs = full.orderBy("id").select("xs").head().getSeq[Long](0)
    assert(xs === Seq(0L, 1L))
  }

  test("hfdataset V2: one input partition per shard") {
    val dir = Files.createTempDirectory("hf-v2-shards").toString
    HfDatasetDisk.write(
      spark.range(0, 30).selectExpr("id").repartition(5), dir)
    val df = spark.read.format("hfdataset").load(dir)
    assert(df.rdd.getNumPartitions === 5)
    assert(df.count() === 30)
  }

  test("missing corpus paths fail loudly, not as empty DataFrames") {
    // a mistyped corpus dir must never report "0 documents" with a
    // green exit: brat throws at split planning, hfdataset at schema
    // inference
    val brat = spark.read.format("brat").load("/no/such/brat-dir")
    assertThrows[org.apache.spark.sql.AnalysisException](brat.count())
    assertThrows[IllegalArgumentException](
      spark.read.format("hfdataset").load("/no/such/hf-dir"))
  }
}
