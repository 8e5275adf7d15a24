package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-pattern pollution-regex cost on the real corpus (dev tool).
  * Iterates the LIVE bank (`Normalizer.defaultPollutionBank`) so the
  * numbers always describe the shipped patterns.
  */
object ProfRegex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .appName("prof-regex").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sample = graft.relational.Tables.documents(spark, sfDir)
      .select("text").limit(2000).collect().map(_.getString(0))
    graft.nlp.Normalizer.defaultPollutionBank.foreach { p =>
      val t0 = System.nanoTime()
      var hits = 0
      sample.foreach { t =>
        val m = p.matcher(t)
        while (m.find()) hits += 1
      }
      val label = p.pattern.replaceAll("\\s+", " ").take(48)
      println(f"PROFR ${(System.nanoTime() - t0) / 1e9}%8.3f s  hits=$hits%-4d $label")
    }
    spark.stop()
  }
}
