package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Project, Filter, SubqueryAlias}

/** Parallelism floor for CPU-DENSE stages fed by a small scan.
  *
  * A small corpus arrives as ONE parquet split (single row group —
  * unsplittable, the optimization guide's §2.5 "input skew" case), so a
  * map stage running heavy per-row work (shingling + MinHash, postings
  * explode, ADC scoring) executes single-task no matter how many cores
  * the session has — measured: the q88 postings build spent 3.2 s in
  * one task on a 32-core box. When (and only when) the input yields
  * fewer partitions than the session's parallelism, pay one tiny
  * round-robin exchange of the raw rows to spread the CPU work.
  *
  * Scale behavior: at real corpus sizes the scan already has >= cores
  * splits and this is a NO-OP — the gate is the measured partition
  * count, so nothing here is tuned to local mode. Deliberately applied
  * ONLY at call sites whose single-task CPU was measured ≥ ~1 s:
  * blanket spreading (every loader) was measured a net LOSS at bench
  * scale — dozens of cheap stages each paid ~30-80 ms of extra
  * scheduling for parallelism they could not use.
  */
object Spread {

  /** True when the analyzed plan is a narrow chain over leaves (scan +
    * project/filter/alias). Only there is `df.rdd.getNumPartitions` a
    * free question — on a plan with exchanges (joins, aggregates) AQE
    * must EXECUTE the intermediate stages to answer it (measured: the
    * gate itself silently ran q89's whole gate+dedup subtree), and such
    * frames inherit their parallelism from upstream anyway.
    */
  private def narrowOverLeaf(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case _: LeafNode           => true
      case Project(_, c)         => narrowOverLeaf(c)
      case Filter(_, c)          => narrowOverLeaf(c)
      case SubqueryAlias(_, c)   => narrowOverLeaf(c)
      case _                     => false
    }

  def cpuFloor(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (narrowOverLeaf(df.queryExecution.analyzed) &&
        df.rdd.getNumPartitions < p) df.repartition(p)
    else df
  }
}
