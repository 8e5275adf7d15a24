package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump one (or a few) declared queries for a targeted oracle check:
  * `runMain graft.VerifyOne <outDir> <name> [name...]`. Writes the same
  * layout as [[Verify]] (result parquet per query + oracle_sql.json
  * restricted to the requested names, plus the same fail-loudly
  * `_ERROR.txt`/`errors.json` markers) so `tools/selfcheck.py` works on
  * the output unchanged. Dev-only; the driver always runs full Verify.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = names.map(n => n -> SparkEntry.queries(n)).toMap
    Verify.dumpQueries(spark, sfDir, outDir, selected)
    val json = graft.tools.JsonOut.obj(
      SparkEntry.oracleSql.filter(kv => names.contains(kv._1)))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
