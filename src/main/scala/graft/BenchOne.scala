package graft

import org.apache.spark.sql.SparkSession

/** Time a single declared query: `runMain graft.BenchOne <name> [reps]`.
  * Same session shape as [[Bench]]; prints per-rep seconds and median.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same default as Bench: the real core count, so numbers from an
    // env-less run are comparable to the headline bench on any box
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("max(id * 2 + 1)").collect()
    val fn = SparkEntry.queries(name)
    // SPARK_GRAFT_EXPLAIN=1: dump the formatted physical plan before
    // timing (the plan-audit loop: check pushdown/exchange-reuse/codegen
    // spans without editing code)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    // one untimed warm-up rep (codegen + page cache), like Bench's global
    // warm-up pass
    fn(spark, sfDir).count()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(times.length / 2)
    println(f"[benchone] $name reps=${times.map(t => f"$t%.3f").mkString(",")} median=$med%.3f")
    spark.stop()
  }
}
