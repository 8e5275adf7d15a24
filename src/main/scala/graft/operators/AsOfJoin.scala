package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join, an operator Spark lacks natively.
  *
  * Semantics: for every left row, attach the requested value columns of the
  * latest right row with the same key and `rightTime <= leftTime` (inclusive,
  * i.e. DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`).
  *
  * Implementation is the union + windowed last-value trick rather than a
  * range join: both sides are tagged, unioned, hash-partitioned by key and
  * sorted once by (time, side); `last(value, ignoreNulls)` over the
  * unbounded-preceding frame then carries the most recent right value onto
  * each left row. One shuffle + one sort total, no O(n·m) interval
  * explosion — this survives 100 TB where a theta-join `l.t >= r.t`
  * (a broadcast-nested-loop plan) would not. Right rows sort before left
  * rows at equal timestamps so same-instant matches are included.
  *
  * Reference analog: nearest-cue lookups (consultation dates semi-joined to
  * trigger terms, `/root/reference/edsnlp/pipes/misc/consultation_dates/
  * consultation_dates.py:14-218`) and `note_datetime`-relative resolution.
  */
object AsOfJoin {
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightValues: Seq[Column]): DataFrame = {
    val leftSchema = left.schema
    val valueSchema = right.select(rightValues: _*).schema
    val valueType = org.apache.spark.sql.types.StructType(valueSchema)

    // The right row's values travel as ONE struct so the match is atomic:
    // per-column last() windows could mix columns from different right
    // rows (and skip a newer row whose value is legitimately NULL).
    val lpart = left.select(
      leftSchema.map(f => col(f.name)) ++
        Seq(leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
          lit(null).cast(valueType).as("__v")): _*)
    val rpart = right.select(
      leftSchema.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        Seq(rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
          struct(rightValues: _*).as("__v")): _*)

    // Tie-break equal (key, time) right rows by the JSON rendering of the
    // value struct: deterministic under any partitioning, and — unlike
    // ordering (or hashing) the struct itself — works when a value column
    // is non-orderable/non-hashable (MapType, e.g. entity attrs).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), to_json(col("__v")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = lpart.unionByName(rpart)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
    valueSchema.map(_.name).foldLeft(
      filled.filter(col("__side") === 1)) { (df, v) =>
      df.withColumn(v, col(s"__v.$v"))
    }.drop("__k", "__t", "__side", "__v")
  }
}
