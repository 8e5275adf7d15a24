package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Janitor for the maintenance family's on-disk leftovers. Two kinds
  * of garbage accumulate next to a long-lived dataset:
  *
  *  - crash orphans: `._staging` / `._retired` ([[Compact.stagedSwap]]),
  *    `._merge_staging` ([[MergeInto]]), `._manifest_staging`
  *    ([[Manifest]]) — all are safe to delete once the writer that
  *    created them is gone, because every publish protocol in this
  *    family keeps the live copy at the plain path (the one exception,
  *    stagedSwap's retire-to-promote window, is why a TTL guards the
  *    delete: a `._retired` younger than the TTL may belong to a swap
  *    still in flight — or be the only copy after a mid-swap crash,
  *    which needs MANUAL recovery, not a vacuum);
  *  - CDC feed batches (`._cdc/batch-N`): durable by design, but
  *    consumers that have caught up no longer need the old ones.
  *
  * Deletion is the one operation the copy-on-write protocols never do
  * to live data, so it lives here, explicit and TTL-guarded, instead
  * of inside the writers.
  */
object Vacuum {

  private val orphanSuffixes = Seq(
    "._staging", "._merge_staging", "._manifest_staging",
    "._keybloom_staging", "._manifest_retired", "._keybloom_retired",
    "._retired")

  /** Delete crash-orphan staging/retired directories among the
    * DIRECT children of `parent` older than `ttlMs` (by modification
    * time). Returns the deleted paths. Single-writer contract: run
    * this only when no compact/merge over these datasets is in
    * flight, and AFTER confirming any `._retired` is not the sole
    * surviving copy of a crashed swap.
    */
  def vacuumOrphans(spark: SparkSession, parent: String,
      ttlMs: Long): Seq[String] = {
    val p = new Path(parent)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - ttlMs
    val victims = fs.listStatus(p).filter { s =>
      s.isDirectory &&
        orphanSuffixes.exists(s.getPath.getName.endsWith(_)) &&
        s.getModificationTime < cutoff
    }
    victims.foreach(s => fs.delete(s.getPath, true))
    victims.map(_.getPath.toString).toSeq.sorted
  }

  /** Retire consumed CDC feed batches, keeping the newest
    * `keepLast`. Batch indexes are monotone ([[MergeInto]] allocates
    * max+1), so "newest" is by index, not mtime. Returns the deleted
    * batch directories. Do not run below the lag of the slowest
    * consumer (a stream reading `batch-*` that has not yet listed an
    * old batch would silently skip it).
    */
  def pruneCdcBatches(spark: SparkSession, tableDir: String,
      keepLast: Int): Seq[String] = {
    require(keepLast >= 0, "keepLast must be >= 0")
    val root = new Path(tableDir.stripSuffix("/") + "._cdc")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    // on a VERSIONED table, a batch named by a RETAINED version file
    // is the version's merge images — the graft-cdc source serves it
    // for as long as the version resolves, so it is never a victim
    // here (run VersionLog.vacuumVersions first to shrink retention)
    val referenced: Set[String] =
      VersionLog.listVersions(spark, tableDir).flatMap(v =>
        VersionLog.snapshot(spark, tableDir, Some(v)).feed).toSet
    val batches = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .sortBy(_.getPath.getName.stripPrefix("batch-").toInt)
    val victims = batches.dropRight(keepLast)
      .filterNot(s => referenced.contains(s.getPath.getName))
    victims.foreach { s =>
      fs.delete(s.getPath, true)
      // the batch's index-reservation marker lives exactly as long as
      // the batch (keeping it parked blocks nothing, but the root
      // listing should not grow forever)
      fs.delete(new Path(root,
        "." + s.getPath.getName.replaceFirst("^batch", "alloc")), false)
    }
    victims.map(_.getPath.toString).toSeq
  }
}
