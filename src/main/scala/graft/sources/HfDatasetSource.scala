package graft.sources

import java.io.FileInputStream
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Row

import graft.io.HfDatasetDisk

/** DataSource V2 reader for the HuggingFace `save_to_disk` layout —
  * `spark.read.format("hfdataset").load(dir)` (reference counterpart:
  * `/root/reference/edsnlp/data/huggingface_dataset.py:13-348`; hub/
  * network IO stays the declared non-goal, this is the DISK format).
  *
  * Scale/pruning shape:
  *   - one input partition per `.arrow` shard (the shard IS the natural
  *     split unit of the format — HF writes them independently);
  *   - column pruning happens at DECODE time: only the required Arrow
  *     vectors are materialized into row values, the rest of each
  *     record batch is never touched;
  *   - schema inference opens only the FIRST shard's stream header.
  */
final class HfDatasetSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hfdataset"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HfDatasetDisk.schemaOf(
      Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
        "hfdataset source requires a path: " +
          "spark.read.format(\"hfdataset\").load(dir)")))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HfTable(properties.get("path"), schema)
}

private final class HfTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"hfdataset($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new HfScanBuilder(path, tableSchema)
}

private final class HfScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(full.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new HfScan(path, required)
}

private final class HfScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"hfdataset $path, columns=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    HfDatasetDisk.shardPaths(path)
      .map(p => HfInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new HfReaderFactory(required)
}

private final case class HfInputPartition(shard: String)
    extends InputPartition

private final class HfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new HfPartitionReader(
      partition.asInstanceOf[HfInputPartition].shard, required)
}

/** Streams one shard batch-by-batch; only required vectors decode. */
private final class HfPartitionReader(
    shard: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)
  private val alloc = new RootAllocator()
  private val in = new FileInputStream(shard)
  private val reader = new ArrowStreamReader(in, alloc)
  private val root = reader.getVectorSchemaRoot
  // map each REQUIRED output column to its vector index in the shard
  private val vecIdx: Array[Int] = {
    val names = root.getSchema.getFields.asScala.map(_.getName)
    required.fieldNames.map { n =>
      val i = names.indexOf(n)
      require(i >= 0, s"column '$n' not in shard $shard")
      i
    }
  }
  private var rowInBatch = 0
  private var batchRows = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (rowInBatch >= batchRows) {
      if (!reader.loadNextBatch()) return false
      batchRows = root.getRowCount
      rowInBatch = 0
    }
    val i = rowInBatch
    val values = vecIdx.toSeq.map { c =>
      val v = root.getVector(c)
      if (v.isNull(i)) null else HfDatasetDisk.fromArrowValue(v.getObject(i))
    }
    current = toCatalyst(Row.fromSeq(values)).asInstanceOf[InternalRow]
    rowInBatch += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = {
    // reader first — it owns the vector buffers the allocator tracks
    reader.close(); in.close(); alloc.close()
  }
}
