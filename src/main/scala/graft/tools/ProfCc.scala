package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-profiler for q69's phases: pair generation vs the
  * connected-components rounds vs the final mapping — run with
  * `sbt "runMain graft.tools.ProfCc [sfDir]"`. Pair generation is the
  * SHARED `PipelineQueries.verifiedNearDupPairs` (the exact q32/q69
  * pipeline), so the profile always measures the shipped plan.
  */
object ProfCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("profcc").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(2000000L).selectExpr("max(id * 2 + 1)").collect()
    graft.relational.Tables.documents(spark, sfDir).count()
    (1 to 3).foreach { rep =>
      val pairs = graft.relational.PipelineQueries
        .verifiedNearDupPairs(spark, sfDir)
        .select($"id_a", $"id_b")
      time(s"rep$rep pairs.count")(pairs.count())
      val cp = time(s"rep$rep checkpoint")(
        pairs.select(least($"id_a", $"id_b").as("a"),
            greatest($"id_a", $"id_b").as("b"))
          .filter($"a" =!= $"b").distinct().localCheckpoint(true))
      val comp = time(s"rep$rep cc-loop")(
        graft.dedup.Dedup.connectedComponents(cp.select(
          $"a".as("id_a"), $"b".as("id_b"))))
      time(s"rep$rep mapping+sizes") {
        val sizes = comp.groupBy($"component")
          .agg(count(lit(1)).as("csize"))
        comp.join(sizes, "component")
          .select($"id".as("doc_id"), $"component", $"csize")
          .orderBy($"doc_id").count()
      }
    }
    spark.stop()
  }
}
