package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence for the co-located join strategy (README "Scale notes"):
  * bucketing both fact tables on the join key makes the join shuffle-free
  * — at 100 TB this converts the dominant exchange of fact-fact joins
  * into local zipped scans. Asserts on the actual physical plan.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is a static conf; managed tables land in the default
    // ./spark-warehouse and are dropped (with data) in the finally block.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    relational.Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    relational.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable broadcast so the join strategy itself is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = relational.Tables.lineitem(spark, sf)
        .join(relational.Tables.orders(spark, sf),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
