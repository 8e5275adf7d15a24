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
    spark.stop()
  }
}
