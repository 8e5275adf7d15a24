package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only single/subset verify: dump named queries (exact names or
  * prefixes) + their oracle SQL to outDir, then compare with
  * `python3 tools/selfcheck.py <sfDir> <outDir>`. Full-surface runs stay
  * with [[graft.Verify]]; this exists so iterating on ONE query does not
  * cost a 110-query dump.
  *
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <name>[,<name>...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    val all = graft.SparkEntry.queries
    val picked = all.filter { case (k, _) => wanted.exists(k.startsWith) }
    require(picked.nonEmpty, s"no query matches: $names")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .appName("verify-one").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    picked.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[verify-one] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val oracles = graft.SparkEntry.oracleSql.filter(k => picked.contains(k._1))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      JsonOut.obj(oracles))
    spark.stop()
  }
}
