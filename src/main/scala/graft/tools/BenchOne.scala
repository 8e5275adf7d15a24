package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: time named queries (exact names or prefixes)
  * over several reps in one warmed session — the per-query iteration
  * loop, so plan work doesn't need a full Bench pass.
  *
  * Usage: runMain graft.tools.BenchOne <sfDir> <name>[,<name>...] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val picked = graft.SparkEntry.queries
      .filter { case (k, _) => wanted.exists(k.startsWith) }
    require(picked.nonEmpty, s"no query matches: ${args(1)}")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .appName("bench-one").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000L).selectExpr("max(id * 2 + 1)").collect()
    picked.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name median=${times.sorted.apply(reps / 2)}%.3f " +
        s"reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
