package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The correctness harness must fail LOUDLY: a declared query that throws
  * has to surface as an explicit red marker in the verify output, never as
  * a silently-missing key (round 8 lost a real regression that way — the
  * artifact simply had no row for the broken query).
  */
class VerifyHarnessSpec extends AnyFunSuite {
  import TestSpark._

  test("a throwing query leaves _ERROR.txt + an errors.json row") {
    val out = Files.createTempDirectory("verify-harness").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "good_query" -> ((s, d) => relational.Tables.region(s, d)),
      "bad_query" -> ((_, _) =>
        throw new IllegalStateException("deliberate failure")))
    val errors = Verify.dumpQueries(spark, sf, out, queries)

    assert(errors.keySet == Set("bad_query"))
    assert(errors("bad_query").contains("deliberate failure"))
    // the good query still dumped normally
    assert(spark.read.parquet(s"$out/good_query").count() > 0)
    // the bad query's directory exists and is poisoned — a parquet read
    // of it must FAIL (the driver sees red, not absence)
    val marker = Paths.get(out, "bad_query", "_ERROR.txt")
    assert(Files.exists(marker))
    assert(Files.readString(marker).contains("deliberate failure"))
    // errors.json names the failed query with its message
    val ej = Files.readString(Paths.get(out, "errors.json"))
    assert(ej.contains("\"bad_query\""))
    assert(ej.contains("deliberate failure"))
  }

  test("an all-green run still writes an (empty) errors.json") {
    val out = Files.createTempDirectory("verify-harness-green").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "good_query" -> ((s, d) => relational.Tables.region(s, d)))
    val errors = Verify.dumpQueries(spark, sf, out, queries)
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(out, "errors.json")) == "{}")
  }
}
