package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.io.VersionLog

/** `format("graft-cdc")` — the maintained table's CHANGE FEED
  * (`<dir>._cdc/batch-<n>`, row-level before/after images tagged
  * `_op` ∈ update_pre/update_post/insert/delete) as a first-class
  * source, batch and streaming:
  *
  *  - `spark.read.format("graft-cdc").load(dir)` — every published
  *    feed batch, with the batch index surfacing as a `_feed_batch`
  *    partition column (a custom [[FileIndex]] maps each batch
  *    directory to its index, so `WHERE _feed_batch >= n` prunes to
  *    the new batches at PLANNING time — the incremental-consumer
  *    read is a file-list operation, not a feed scan);
  *  - `spark.readStream.format("graft-cdc").load(dir)` — a
  *    micro-batch stream whose OFFSET is the feed's own coordinate
  *    (the next unconsumed batch index), so a checkpointed restart
  *    replays nothing and misses nothing. Each micro-batch is the
  *    vectorized parquet read of exactly the new batch directories
  *    (the V1 `Source.getBatch` shape, like Spark's own
  *    FileStreamSource) — rows never ride the driver.
  *
  * Together with `format("graft-versions")` (file-level commit tail)
  * this completes the consumer pair: versions for snapshot-level
  * consumers (compaction-aware mirrors), the CDC feed for row-level
  * ones (downstream merge, audit, incremental aggregation).
  *
  * Ordering contract: batch indexes are consumed in index order. The
  * in-place merge is single-writer; the versioned merge publishes
  * feeds post-commit in commit order with heal-at-entry (a batch can
  * never become visible below a consumed offset). Retention is
  * `Vacuum.pruneCdcBatches` — it must exceed consumer lag, the same
  * contract every changelog documents. Torn/staged/discarded batches
  * are dot-prefixed and never visible here.
  */
final class GraftCdcSource extends StreamSourceProvider
    with RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdc requires the TABLE path: " +
        "spark.read[Stream].format(\"graft-cdc\").load(tableDir)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftCdcSource.feedSchema(
      sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new CdcFeedStreamSource(sqlContext.sparkSession, pathOf(parameters))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val index = new CdcFeedFileIndex(spark, dir)
    HadoopFsRelation(
      location = index,
      partitionSchema = CdcFeedFileIndex.partitionSchema,
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = parameters)(spark)
  }
}

object GraftCdcSource {

  private[sources] def feedRoot(dir: String): Path =
    new Path(dir.stripSuffix("/") + "._cdc")

  /** Published (index, directory) pairs, ascending. One listing of the
    * feed root — bounded by retained batches, never data.
    */
  private[sources] def publishedBatches(spark: SparkSession,
      dir: String): Seq[(Long, Path)] = {
    val root = feedRoot(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .map(s => (s.getPath.getName.stripPrefix("batch-").toLong, s.getPath))
      .sortBy(_._1)
  }

  /** The feed's row schema plus `_feed_batch`: taken from the OLDEST
    * published batch's footer merged forward (schema evolution widens
    * the feed exactly like the table), or, before any batch exists,
    * the table's own schema + `_op` — so a stream can start on a
    * table that has never merged.
    */
  private[sources] def feedSchema(spark: SparkSession,
      dir: String): StructType = {
    val batches = publishedBatches(spark, dir)
    val base =
      if (batches.nonEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(batches.map(_._2.toString): _*).schema
      else {
        val table =
          if (VersionLog.listVersions(spark, dir).nonEmpty)
            VersionLog.read(spark, dir)
          else spark.read.parquet(dir)
        table.withColumn("_op", lit("insert")).schema
      }
    StructType(base.fields :+ StructField("_feed_batch", LongType))
  }
}

/** Micro-batch stream over the feed. Offset semantics: `n` = "every
  * published batch with index < n is consumed"; `getBatch(a, b)`
  * reads exactly the published batches in [a, b) as ONE vectorized
  * parquet plan (older, schema-narrower batches null-fill the evolved
  * columns).
  */
private final class CdcFeedStreamSource(spark: SparkSession,
    dir: String) extends Source {

  override val schema: StructType = GraftCdcSource.feedSchema(spark, dir)

  private def parseOffset(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val batches = GraftCdcSource.publishedBatches(spark, dir)
    if (batches.isEmpty) None
    else Some(CdcFeedOffset(batches.last._1 + 1L))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(parseOffset).getOrElse(0L)
    val hi = parseOffset(end)
    val picked = GraftCdcSource.publishedBatches(spark, dir)
      .filter { case (i, _) => i >= lo && i < hi }
    val batch =
      if (picked.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else picked.map { case (i, p) =>
          spark.read.parquet(p.toString)
            .withColumn("_feed_batch", lit(i))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
    // align to the declared schema (order + evolution null-fill)
    val aligned = schema.fields.foldLeft(batch) { (df, f) =>
        if (df.columns.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    Bridge.internalCreateDataFrame(spark, aligned, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftCdcSource[$dir]"
}

private final case class CdcFeedOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

/** Batch-read FileIndex: every published feed file, with the batch
  * index as a LONG partition value parsed from its `batch-<n>` parent
  * directory — `_feed_batch` predicates prune batch directories on
  * the driver's file list, so "changes since offset n" plans over
  * only the new batches.
  */
private final class CdcFeedFileIndex(spark: SparkSession, dir: String)
    extends FileIndex {

  private val root = GraftCdcSource.feedRoot(dir)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val filesByBatch: Seq[(Long, Seq[FileStatus])] =
    GraftCdcSource.publishedBatches(spark, dir).map { case (i, p) =>
      (i, fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
    }

  val dataSchema: StructType = {
    require(filesByBatch.nonEmpty,
      s"no published CDC feed batches under $root")
    // one footer per batch, oldest first — same merge order as the
    // stream's schema (evolution appends)
    spark.read.option("mergeSchema", "true")
      .parquet(filesByBatch.map(_._2.head.getPath.toString): _*).schema
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def inputFiles: Array[String] =
    filesByBatch.flatMap(_._2.map(_.getPath.toString)).toArray

  override def sizeInBytes: Long =
    filesByBatch.flatMap(_._2.map(_.getLen)).sum

  override def refresh(): Unit = ()

  override def partitionSchema: StructType =
    CdcFeedFileIndex.partitionSchema

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // evaluate pushed _feed_batch predicates against the parsed batch
    // index (the planner does not re-apply partition-only conjuncts
    // above the scan — applying them here is a correctness
    // obligation, exactly like GraftFileIndex.prunePartitions)
    val pred = CdcFeedFileIndex.bindIndexPredicate(
      spark, partitionFilters)
    filesByBatch.filter { case (i, _) => pred(i) }.map { case (i, fls) =>
      PartitionDirectory(InternalRow(i), fls.toArray)
    }
  }
}

private object CdcFeedFileIndex {
  val partitionSchema: StructType =
    StructType(Seq(StructField("_feed_batch", LongType)))

  private[sources] def bindIndexPredicate(spark: SparkSession,
      filters: Seq[Expression]): Long => Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BasePredicate, BoundReference, Predicate}
    val usable = filters.filter(_.references.forall(a =>
      spark.sessionState.conf.resolver(a.name, "_feed_batch")))
    if (usable.isEmpty) return _ => true
    val bound = usable.reduce(And).transform {
      case _: AttributeReference =>
        BoundReference(0, LongType, nullable = true)
    }
    val p: BasePredicate = Predicate.createInterpreted(bound)
    (i: Long) => p.eval(InternalRow(i))
  }
}
