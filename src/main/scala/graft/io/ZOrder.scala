package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton curve) data layout: interleave the bits of two
  * integer key columns so that sorting by the single z-value keeps rows
  * close in BOTH dimensions close on disk. Written with
  * `repartitionByRange(z).sortWithinPartitions(z)`, each parquet file
  * covers a tight z-range and therefore a tight box in (x, y) — parquet
  * min/max statistics on the ORIGINAL columns then prune files and row
  * groups for 2-D box predicates, where a single-column sort helps only
  * its own column. This is the layout story for the 100 TB fact table:
  * no new operator at read time, just ordinary pushed-down filters
  * hitting statistics that the layout made selective.
  *
  * The z-value is pure bit arithmetic (the classic spread-bits
  * shift-mask chain) on native columns — whole-stage codegen, no UDF,
  * and exactly replayable in ANSI SQL with the same five mask constants.
  */
object ZOrder {

  /** Spread the low 31 bits of `c` into the even bit positions of a
    * 64-bit value: 0b...b2b1b0 -> 0b..0b2_0b1_0b0.
    */
  private def spread(c: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(c.cast(LongType).bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** Morton code of two non-negative integer columns (each capped to 31
    * bits): x occupies even bits, y odd bits. Monotone per dimension:
    * growing either coordinate never decreases the code's box.
    */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** `df` laid out z-ordered by (`xCol`, `yCol`) across `numFiles`
    * range partitions — the frame a writer (plain parquet or a
    * [[VersionLog]] init/commit) lands as one tight-boxed file per
    * partition. The z column itself is dropped — the layout is carried
    * by row order, the schema stays the caller's.
    */
  def zOrdered(df: DataFrame, xCol: Column, yCol: Column,
      numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(xCol, yCol))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Write `df` z-ordered by (`xCol`, `yCol`) into `dir` as
    * `numFiles` range-partitioned parquet files.
    */
  def writeZOrdered(df: DataFrame, dir: String, xCol: Column, yCol: Column,
      numFiles: Int): Unit =
    zOrdered(df, xCol, yCol, numFiles)
      .write.mode("overwrite").parquet(dir)
}
