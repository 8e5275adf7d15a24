package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySmokeSpec extends AnyFunSuite {
  test("entry returns note_nlp rows at sf0.001 (driver smoke contract)") {
    import TestSpark.spark
    val df = SparkEntry.entry(spark)
    assert(df.columns.take(2).toSeq === Seq("note_nlp_id", "note_id"))
    assert(df.count() > 0)
  }
}
