package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that throws must show as a RED row, never as absence: the
  * failure writes `<outDir>/<name>/_ERROR.txt` (so the driver's parquet
  * read of that name fails loudly instead of finding nothing) and an
  * aggregate `<outDir>/errors.json` — a correctness artifact with a
  * silently-missing key once hid a real regression for a whole round.
  */
object Verify {

  /** Run each query, parquet-dump it, and return name → error message for
    * every query that threw (empty when all green). Package-visible so the
    * fail-loudly contract is spec'd with a deliberately-throwing query.
    */
  private[graft] def dumpQueries(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, String] = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name FAILED: $msg")
        val qd = Paths.get(outDir, name)
        Files.createDirectories(qd)
        Files.writeString(qd.resolve("_ERROR.txt"), msg + "\n")
        errors(name) = msg
      }
    }
    // Always written, even when empty — the driver can merge unconditionally
    Files.writeString(Paths.get(outDir, "errors.json"),
      graft.tools.JsonOut.obj(errors))
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = dumpQueries(spark, sfDir, outDir, SparkEntry.queries)
    val json = graft.tools.JsonOut.obj(SparkEntry.oracleSql)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Exit 0 even on per-query failure: the driver must still run the
    // DuckDB compare over the green queries; the red ones are visible via
    // _ERROR.txt (poisons that name's parquet read) and errors.json.
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"}" +
          s" FAILED: ${errors.keys.mkString(", ")}")
  }
}
