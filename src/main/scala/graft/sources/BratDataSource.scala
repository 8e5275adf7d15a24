package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Encoders, Row}

import graft.io.Standoff

/** DataSource V2 BRAT/standoff reader — `spark.read.format("brat")
  * .load(dir)` (reference reader: `/root/reference/edsnlp/data/
  * standoff.py:278-343`; SURVEY §7.3 names DataSource V2 as the target
  * shape for custom sources).
  *
  * Scale/pruning shape:
  *   - split planning on the driver lists `{doc}.txt` files once and
  *     packs them into at most `maxPartitions` input partitions, so a
  *     million-file corpus does not become a million tasks;
  *   - column pruning reaches the FILE level: when none of the
  *     annotation columns (`entities`/`relations`/`events`/
  *     `corrupt_lines`/`n_corrupt_lines`) are required, the `.ann`
  *     files are never opened or parsed; pruning `text` away skips
  *     nothing only if annotations still need it for fragment merging;
  *   - each partition reader streams its files one at a time — no
  *     whole-corpus materialization anywhere.
  *
  * Options: `strict` (default false) mirrors the reference's
  * `BratParsingError` behavior — the first malformed annotation line
  * fails the task instead of being surfaced in `corrupt_lines`.
  */
final class BratDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "brat"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BratDataSource.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BratTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException(
          "brat source requires a path: spark.read.format(\"brat\").load(dir)")),
      properties.asScala.get("strict").exists(_.toBoolean))
}

object BratDataSource {
  /** Same shape `Standoff.read` always produced. */
  val fullSchema: StructType = {
    val parsed = Encoders.product[Standoff.ParsedAnn].schema
    StructType(
      Seq(StructField("doc_id", StringType), StructField("text", StringType))
        ++ parsed.fields
        :+ StructField("n_corrupt_lines", IntegerType, nullable = false))
  }

  private[sources] val annColumns: Set[String] = Set(
    "entities", "relations", "events", "corrupt_lines", "n_corrupt_lines")
}

private final class BratTable(path: String, strict: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"brat($path)"
  override def schema(): StructType = BratDataSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new BratScanBuilder(path, strict)
}

private final class BratScanBuilder(path: String, strict: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BratDataSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level pruning only; nested-field pruning inside the entity
    // struct would save little (the .ann line must be parsed whole)
    required = StructType(BratDataSource.fullSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new BratScan(path, strict, required)
}

private final class BratScan(
    path: String, strict: Boolean, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val needAnn =
      required.fieldNames.exists(BratDataSource.annColumns.contains)
    s"brat $path, columns=[${required.fieldNames.mkString(",")}], " +
      s"annFiles=${if (needAnn) "parsed" else "SKIPPED"}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    // fail LOUDLY on a missing/unlistable path: listFiles() null would
    // otherwise plan zero splits and a mistyped corpus dir reports
    // "0 documents" with a green exit (the pre-V2 reader threw via
    // spark.read.text). Local-filesystem paths only, like the rest of
    // this source — a remote-FS corpus goes through the parquet/HF
    // layouts.
    if (!dir.isDirectory) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "PATH_NOT_FOUND",
        messageParameters = Map("path" -> path))
    }
    val txts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".txt")).map(_.getAbsolutePath).sorted
    val maxPartitions = math.max(1, SparkSession.active
      .sparkContext.defaultParallelism * 2)
    val perPart = math.max(1, math.ceil(
      txts.length.toDouble / maxPartitions).toInt)
    txts.grouped(perPart)
      .map(fs => BratInputPartition(fs.toSeq): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BratReaderFactory(strict, required)
}

private final case class BratInputPartition(txtFiles: Seq[String])
    extends InputPartition

private final class BratReaderFactory(
    strict: Boolean, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new BratPartitionReader(
      partition.asInstanceOf[BratInputPartition].txtFiles,
      strict, required)
}

private final class BratPartitionReader(
    txtFiles: Seq[String], strict: Boolean, required: StructType)
    extends PartitionReader[InternalRow] {

  private val needAnn =
    required.fieldNames.exists(BratDataSource.annColumns.contains)
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)
  private val files = txtFiles.iterator
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!files.hasNext) return false
    val txtPath = files.next()
    val name = new java.io.File(txtPath).getName.stripSuffix(".txt")
    val text = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(txtPath)), "UTF-8")
    // pruning reaches the FILE level: no annotation column required ->
    // the .ann file is never opened, let alone parsed
    val parsed = if (!needAnn) Standoff.ParsedAnn(Nil, Nil, Nil, Nil) else {
      val annFile = new java.io.File(txtPath.stripSuffix(".txt") + ".ann")
      val ann = if (annFile.exists())
        new String(java.nio.file.Files.readAllBytes(annFile.toPath), "UTF-8")
      else ""
      Standoff.parseAnnAll(text, ann, strict = strict)
    }
    val full = Map[String, Any](
      "doc_id" -> name,
      "text" -> text,
      "entities" -> parsed.entities,
      "relations" -> parsed.relations,
      "events" -> parsed.events,
      "corrupt_lines" -> parsed.corrupt_lines,
      "n_corrupt_lines" -> parsed.corrupt_lines.length)
    current = toCatalyst(Row.fromSeq(
      required.fieldNames.toSeq.map(full))).asInstanceOf[InternalRow]
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
