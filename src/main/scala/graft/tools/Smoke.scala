package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-run the driver contract: SparkEntry.entry must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY ROWS >>> " + df.count())
    df.show(5, truncate = false)
    // typed P/R/F aggregator over the entry output vs a gold sample
    import spark.implicits._
    import graft.metrics.PrfAggregator._
    val outcomes = df.selectExpr("negation as isPred",
      "note_nlp_source_value = 'join' as isGold")
      .as[SpanOutcome]
    val prfRow = outcomes.select(prf.toColumn).head()
    println(f"PRF >>> p=${prfRow.precision}%.4f r=${prfRow.recall}%.4f f1=${prfRow.f1}%.4f tp=${prfRow.tp} np=${prfRow.nPred} ng=${prfRow.nGold}")
    spark.stop()
  }
}
