package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.VersionLog

/** `spark.readStream.format("graft-versions").load(dir)` — the
  * versioned table's COMMIT TAIL as a micro-batch stream: one row per
  * (version, file) with the commit's parent and action, emitted
  * exactly when the version file appears. The Delta "streaming from a
  * table" idea reduced to its scale-honest core:
  *
  *  - the OFFSET is the version id — resuming from a checkpoint
  *    replays nothing and misses nothing, because commits are the
  *    unit of atomicity;
  *  - each micro-batch is METADATA-sized (the new version's added
  *    file list — the same short strings the planner materializes),
  *    never a data pass; a consumer that wants the rows does
  *    `spark.read.parquet(files)` inside `foreachBatch`, on Spark's
  *    vectorized reader, exactly like the batch paths;
  *  - "added" is the file-list diff against the parent snapshot, so
  *    an append streams only its batch, a merge streams its rewritten
  *    partition files, and a compaction streams the repacked files —
  *    the action column says which it was (consumers typically filter
  *    `action = 'append'` or route merges through the CDC feed
  *    stream, which carries row-level before/after images).
  *
  * Uncommitted data directories are invisible by construction (the
  * stream reads the log, not the filesystem), so the source inherits
  * snapshot isolation. A vacuumed parent snapshot degrades gracefully:
  * the diff falls back to the version's full file list (flagged by
  * `action`-as-committed — retention must exceed consumer lag, the
  * same contract the CDC feed documents).
  */
final class GraftVersionTailSource extends TableProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-versions"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftVersionTailSource.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new VersionTailTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-versions requires a path: " +
          "spark.readStream.format(\"graft-versions\").load(dir)")),
      Option(properties.get("maxBatchesPerTrigger")).map(_.toLong)
        .map { n =>
          require(n >= 1, s"maxBatchesPerTrigger must be >= 1, got $n")
          n
        }.getOrElse(Long.MaxValue))
}

object GraftVersionTailSource {
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("parent", LongType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("file", StringType, nullable = false)))

  /** (version, parent, action, addedFile) rows for every version in
    * (start, end] — the driver-side diff both the stream and the
    * batch fallback share. File lists are metadata-sized.
    */
  private[sources] def tailRows(spark: SparkSession, dir: String,
      start: Long, end: Long): Seq[(Long, Long, String, String)] = {
    val versions = VersionLog.listVersions(spark, dir)
      .filter(v => v > start && v <= end)
    versions.flatMap { v =>
      // delta-form commits carry their added files verbatim — one
      // small read per commit, no snapshot resolution. This source
      // emits FILE-level adds (no row images), so a vacuumed parent
      // can safely degrade to "all files added" — the documented
      // bootstrap shape (graft-cdc, which synthesizes row images,
      // fails loudly instead: a degraded diff would be silent drift)
      try {
        val diff = VersionLog.commitDiff(spark, dir, v)
        diff.added.map(f => (v, diff.parent, diff.action, f))
      } catch {
        case _: IllegalStateException =>
          val snap = VersionLog.snapshot(spark, dir, Some(v))
          snap.files.map(f => (v, snap.parent, snap.action, f))
      }
    }
  }
}

private final class VersionTailTable(path: String, maxPerTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-versions($path)"
  override def schema(): StructType = GraftVersionTailSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new VersionTailScan(path, maxPerTrigger)
    }
}

private final class VersionTailScan(path: String, maxPerTrigger: Long)
    extends Scan {
  override def readSchema(): StructType = GraftVersionTailSource.schema
  override def description(): String = s"graft version tail of $path"
  override def toMicroBatchStream(loc: String): MicroBatchStream =
    new VersionTailStream(path, maxPerTrigger)
  // batch form: the whole retained history (same rows `history` keys)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val spark = SparkSession.active
      Array(VersionTailPartition(GraftVersionTailSource
        .tailRows(spark, path, 0L, Long.MaxValue)))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new VersionTailReaderFactory
  }
}

/** Version-id offset: the checkpointable resume point IS the commit
  * log's own coordinate.
  */
private final case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private final class VersionTailStream(path: String, maxPerTrigger: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def spark = SparkSession.active

  override def initialOffset(): Offset = VersionOffset(0L)

  override def latestOffset(): Offset = {
    val vs = VersionLog.listVersions(spark, path)
    VersionOffset(if (vs.isEmpty) 0L else vs.max)
  }

  /** Rate-limited offset advance (`maxBatchesPerTrigger`): a consumer
    * resuming after a long lag drains the commit backlog at most
    * `maxPerTrigger` VERSIONS per micro-batch instead of replanning
    * the whole tail as one batch — exactly-once is untouched (the
    * offset is still the version id, checkpointed per batch).
    */
  override def latestOffset(startOffset: Offset,
      limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[VersionOffset].version
    val vs = VersionLog.listVersions(spark, path)
    val latest = if (vs.isEmpty) 0L else vs.max
    val capped =
      if (Long.MaxValue - maxPerTrigger < start) Long.MaxValue
      else start + maxPerTrigger
    VersionOffset(math.max(start, math.min(latest, capped)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) Array.empty
    else Array(VersionTailPartition(
      GraftVersionTailSource.tailRows(spark, path, s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionTailReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The micro-batch's rows ride in the partition itself — they are
  * commit metadata (short strings, bounded by the version diff), not
  * data; no executor-side IO exists to distribute.
  */
private final case class VersionTailPartition(
    rows: Seq[(Long, Long, String, String)]) extends InputPartition

private final class VersionTailReaderFactory
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[VersionTailPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (v, p, a, f) = it.next()
        current = InternalRow(v, p,
          UTF8String.fromString(a), UTF8String.fromString(f))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
