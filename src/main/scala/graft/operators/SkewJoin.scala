package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys — the explicit skew tool for
  * when AQE's skew-join splitting cannot see the problem (it only
  * rewrites sort-merge/shuffled-hash joins with skewed SHUFFLE
  * partitions; a pre-partitioned layout, a bucketed table, or a join
  * whose skew emerges only after filters can still serialize one hot
  * key into one straggler task).
  *
  * The probe side's rows are spread across `salts` sub-keys and the
  * build side is replicated once per salt value, so the join key becomes
  * (key, salt) and a hot key's rows land on `salts` tasks instead of
  * one. Build-side cost is `salts ×` its row count — use a small
  * `salts` (8–32) and a build side that is small-ish but too big or too
  * skew-prone to broadcast outright (a broadcast join needs no salting
  * at all: it never shuffles the probe side).
  *
  * The salt is `pmod(hash(entire probe row), salts)` — deterministic
  * (re-runs and retries see the same salt, keeping the plan
  * speculative-execution-safe), at the cost that byte-identical
  * duplicate probe rows share a salt; for hot keys made of MANY
  * DISTINCT rows (the common skew shape: one user's million events)
  * the spread is uniform.
  */
object SkewJoin {

  /** Inner equi-join of `probe` (big, possibly skewed) with `build`
    * (smaller) on `probeKey === buildKey`. Column names must not
    * collide across the two sides.
    */
  def salted(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val p = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, p("__salt") === b("__salt") &&
        col(probeKey) === col(buildKey))
      .drop("__salt")
  }
}
