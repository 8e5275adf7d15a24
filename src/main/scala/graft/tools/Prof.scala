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
    // warm
    docs.count()
    time("fp only") {
      docs.select($"doc_id",
        graft.dedup.SimHash.simhashFromText($"text", 3).as("fp"))
        .agg(count($"fp"), max($"fp")).collect()
    }
    time("full nearDuplicates") {
      graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text", radius = 8)
        .count()
    }
    time("full q33 with orderBy") {
      graft.SparkEntry.queries("q33_simhash")(spark, sfDir).count()
    }
    spark.stop()
  }
}
