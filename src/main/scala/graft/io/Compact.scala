package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet datasets — the maintenance pass
  * every long-lived 100 TB table needs after streaming sinks,
  * incremental appends (`Bm25.appendToIndex`-style), or over-parallel
  * writes leave thousands of KB-scale fragments: each task then pays
  * open/footer costs that dwarf the data read, and the driver's file
  * index balloons. (Reference counterpart: `write_parquet`'s sized
  * "fragments" — `edsnlp/data/parquet.py` accumulates rows until a
  * target batch size before flushing a fragment; this is the same
  * contract enforced after the fact.)
  *
  * Strategy: measure actual on-disk bytes via the FileSystem (not row
  * counts — compression ratios vary), choose
  * `ceil(totalBytes / targetBytes)` output files, rewrite via
  * `repartition(n)` (a round-robin exchange — `coalesce` would chain
  * the small files' locality and can skew output sizes), land in a
  * staging directory, then atomically swap. The swap order —
  * staging → rename old out of the way → rename staging in → delete
  * old — means a crash at any point leaves either the old or the new
  * complete dataset, never a mix (the `HfDatasetDisk` staged-shard
  * lesson).
  */
object Compact {

  /** Returns (filesBefore, filesAfter, bytes). No-op (returns with
    * zero rewrite) when the dataset already has <= the target count.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytes).toInt)
    if (files.length <= nOut) return (files.length, files.length, totalBytes)
    val staging = new Path(dir + "._compact_staging")
    val retired = new Path(dir + "._compact_retired")
    fs.delete(staging, true)
    fs.delete(retired, true)
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    // atomic-enough swap: old moves aside whole, staging moves in
    // whole; a crash between the renames leaves `retired` intact for
    // manual recovery, never a half-dataset at `dir`
    if (!fs.rename(path, retired))
      throw new java.io.IOException(s"could not retire $dir")
    if (!fs.rename(staging, path)) {
      fs.rename(retired, path) // roll back
      throw new java.io.IOException(s"could not promote staging for $dir")
    }
    fs.delete(retired, true)
    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after, totalBytes)
  }
}
