package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only skew profiler for the prefix-filtered Jaccard self-join
  * (q31): reproduces the join inputs of `Dedup.jaccardPairsPrefix` and
  * prints the per-key fan-out distribution — the quantity that decides
  * whether one shuffle partition can serialize the candidate join.
  *
  * For every prefix hash h the candidate join emits |a(h)| * |b(h)|
  * rows; a straggler from KEY skew requires max_h(product) to rival
  * sum_h(product) / shufflePartitions. Prints both, plus the top keys.
  *
  * Usage: runMain graft.tools.SkewProfile <sfDir> [threshold]
  */
object SkewProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.2999
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("skew-profile").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.relational.Tables.documents(spark, sfDir)
    val sh = docs.select($"doc_id".as("id"),
      graft.relational.PipelineQueries.shingleHashes64($"text").as("sh"))
    val tok = sh.select($"id", explode($"sh").as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "h").groupBy("id")
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(struct($"df", $"h"))).as("sorted"))
    val prefLen = ($"n" - ceil($"n" * lit(threshold)).cast("int") + 1)
    val pref = ranked.select($"id", $"n",
      explode(transform(slice($"sorted", lit(1), prefLen),
        s => s("h"))).as("h")).localCheckpoint()

    val aCnt = pref.filter($"id" % 10 === 0).groupBy("h")
      .agg(count(lit(1)).as("ca"))
    val bCnt = pref.groupBy("h").agg(count(lit(1)).as("cb"))
    val prod = aCnt.join(bCnt, "h")
      .select($"h", ($"ca" * $"cb").as("product"), $"ca", $"cb")
      .localCheckpoint()

    val stats = prod.agg(
      sum($"product").as("total"), max($"product").as("maxKey"),
      count(lit(1)).as("keys"),
      expr("approx_percentile(product, array(0.5, 0.99, 0.999))")
        .as("pcts")).collect()(0)
    val total = stats.getLong(0); val maxKey = stats.getLong(1)
    println(s"[skew] prefix tokens: ${pref.count()} rows, " +
      s"${stats.getLong(2)} distinct join keys")
    println(s"[skew] candidate-join output: total=$total maxKey=$maxKey " +
      s"p50/p99/p999=${stats.getSeq[Double](3).mkString("/")}")
    println(f"[skew] maxKey/total = ${maxKey.toDouble / total}%.4f " +
      f"(even split over $cpus partitions = ${1.0 / cpus}%.4f)")
    prod.orderBy($"product".desc).limit(10).collect().foreach { r =>
      println(s"[skew] top key h=${r.getLong(0)} product=${r.getLong(1)} " +
        s"ca=${r.getLong(2)} cb=${r.getLong(3)}")
    }
    spark.stop()
  }
}
