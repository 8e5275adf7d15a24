package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-probe: isolate the cost of round-robin spreading a
  * small text scan before a CPU-dense projection.
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("spread-probe").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000L).selectExpr("max(id * 2 + 1)").collect()
    val docs = graft.relational.Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name rep$i n=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val sig = (df: org.apache.spark.sql.DataFrame) =>
      df.select(graft.dedup.Dedup
          .minHashSignatureFromText(col("text"), 3, 64).as("sig"))
        .select(xxhash64(col("sig")).as("h"))
        .agg(count(lit(1))).head().getLong(0)
    time("minhash no-spread")(sig(docs))
    time("minhash spread32")(sig(docs.repartition(cpus)))
    time("minhash spread8")(sig(docs.repartition(8)))
    val sha = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(sha2(col("text"), 256).as("h"))
        .agg(count(lit(1))).count()
    time("sha2agg no-spread")(sha(docs))
    time("sha2agg spread32")(sha(docs.repartition(cpus)))
    spark.stop()
  }
}
