package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler for a query's phases (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("prof").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.relational.Tables.documents(spark, sfDir)
    docs.count() // warm
    // driver-side single-thread pass over a sample: isolates the
    // per-doc cost of tokenize/normalize with and without pollution
    val sample = docs.select("text").limit(2000)
      .collect().map(_.getString(0))
    def localPass(name: String, opts: graft.nlp.Normalizer.Options): Unit =
      time(name) {
        var acc = 0L
        sample.foreach { t =>
          val toks = graft.nlp.Tokenizer.tokenize(t)
          acc += graft.nlp.Normalizer.normalize(t, toks, opts).length
        }
        acc
      }
    localPass("local tokenize+normalize (pollution ON)",
      graft.nlp.Normalizer.Options())
    localPass("local tokenize+normalize (pollution OFF)",
      graft.nlp.Normalizer.Options(pollution = false))
    (1 to 2).foreach { i =>
      time(s"full q22 run $i") {
        graft.SparkEntry.queries("q22_ents_explode")(spark, sfDir).count()
      }
      time(s"full q23 run $i") {
        graft.SparkEntry.queries("q23_qualifier")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
