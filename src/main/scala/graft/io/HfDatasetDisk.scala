package graft.io

import java.io.{File, FileInputStream, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Local HuggingFace-dataset interchange — the on-disk layout
  * `datasets.Dataset.save_to_disk` produces and
  * `datasets.load_from_disk` consumes
  * (`/root/reference/edsnlp/data/huggingface_dataset.py:13-348` reads
  * the same datasets from the hub; hub/network IO stays a declared
  * non-goal, the DISK format is fully supported here): a directory of
  * Arrow IPC STREAM files (`data-00000-of-00003.arrow`, ...) plus
  * `state.json` (ordered file list) and `dataset_info.json`.
  *
  * Scale shape: each `.arrow` shard is one input partition
  * (`binaryFiles` split = shard), decoding is row-local, and the column
  * subset covers what HF text/NER datasets actually use — utf8,
  * integers, floats, bool, and (nested) lists thereof — feeding
  * directly into [[HuggingFace.nerToDoc]]'s (tokens, tags) converters.
  * The writer emits one shard per partition (single-node sink, like the
  * BRAT writer; at cluster scale shards land on executor-local disks —
  * use the parquet sink for distributed storage).
  */
object HfDatasetDisk {

  // ---- schema mapping (Arrow <-> Spark), the HF-practical subset ----

  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Utf8 => StringType
    case i: ArrowType.Int => i.getBitWidth match {
      case 64 => LongType
      case 32 => IntegerType
      case 16 => ShortType
      case _ => ByteType
    }
    case fp: ArrowType.FloatingPoint =>
      if (fp.getPrecision == FloatingPointPrecision.DOUBLE) DoubleType
      else FloatType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.List =>
      ArrayType(sparkType(f.getChildren.get(0)))
    case other => throw new IllegalArgumentException(
      s"unsupported Arrow type $other for column '${f.getName}' " +
        "(supported: utf8, int, float, bool, list)")
  }

  private def arrowField(name: String, dt: DataType): Field = dt match {
    case StringType =>
      new Field(name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
    case LongType =>
      new Field(name, FieldType.nullable(new ArrowType.Int(64, true)), null)
    case IntegerType =>
      new Field(name, FieldType.nullable(new ArrowType.Int(32, true)), null)
    case DoubleType =>
      new Field(name, FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    case BooleanType =>
      new Field(name, FieldType.nullable(ArrowType.Bool.INSTANCE), null)
    case ArrayType(inner, _) =>
      new Field(name, FieldType.nullable(ArrowType.List.INSTANCE),
        Seq(arrowField("item", inner)).asJava)
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type $other for HF-dataset column '$name'")
  }

  private def fromArrow(v: Any): Any = v match {
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] => l.asScala.map(fromArrow).toSeq
    case other => other
  }

  /** Arrow accessor value -> external Spark value (shared with the
    * DataSource V2 reader, [[graft.sources.HfDatasetSource]]).
    */
  def fromArrowValue(v: Any): Any = fromArrow(v)

  /** Ordered absolute shard paths (V2 split planning: shard = split). */
  def shardPaths(dir: String): Seq[String] =
    shardFiles(dir).map(_.getAbsolutePath)

  /** Spark schema from the FIRST shard's stream header only. */
  def schemaOf(dir: String): StructType = {
    val files = shardFiles(dir)
    require(files.nonEmpty, s"no .arrow shards under $dir")
    val alloc = new RootAllocator()
    val in = new FileInputStream(files.head)
    var reader: ArrowStreamReader = null
    try {
      reader = new ArrowStreamReader(in, alloc)
      val arrowSchema = reader.getVectorSchemaRoot.getSchema
      StructType(arrowSchema.getFields.asScala.toSeq.map(f =>
        StructField(f.getName, sparkType(f))))
    } finally {
      // reader first: it owns vector buffers the allocator accounts for
      if (reader != null) reader.close()
      in.close(); alloc.close()
    }
  }

  // ---- read ----

  /** Ordered shard list: `state.json`'s `_data_files` when present
    * (the authoritative order HF wrote), else `data-*.arrow` sorted.
    */
  private def shardFiles(dir: String): Seq[File] = {
    val state = new File(dir, "state.json")
    val byGlob = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".arrow")).sortBy(_.getName).toSeq
    if (!state.exists()) return byGlob
    val json = new String(
      java.nio.file.Files.readAllBytes(state.toPath), "UTF-8")
    val m = java.util.regex.Pattern
      .compile("\"filename\"\\s*:\\s*\"([^\"]+)\"").matcher(json)
    val listed = Iterator.continually(m)
      .takeWhile(_.find()).map(_.group(1)).toSeq
    if (listed.nonEmpty) listed.map(new File(dir, _)) else byGlob
  }

  /** Routed through the DataSource V2 path
    * ([[graft.sources.HfDatasetSource]]): shard = input split, column
    * pruning at decode time, streamed batch-by-batch with try/finally
    * resource handling in the partition reader.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("hfdataset").load(dir)

  // ---- write ----

  private def fillVector(
      v: FieldVector, dt: DataType, values: Seq[Any]): Unit = {
    v.setInitialCapacity(values.length)
    v.allocateNew()
    (v, dt) match {
      case (sv: VarCharVector, StringType) =>
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (s, i) => sv.setSafe(i,
            s.asInstanceOf[String].getBytes("UTF-8"))
        }
      case (lv: BigIntVector, LongType) =>
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (x, i) => lv.setSafe(i, x.asInstanceOf[Long])
        }
      case (iv: IntVector, IntegerType) =>
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (x, i) => iv.setSafe(i, x.asInstanceOf[Int])
        }
      case (dv: Float8Vector, DoubleType) =>
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (x, i) => dv.setSafe(i, x.asInstanceOf[Double])
        }
      case (bv: BitVector, BooleanType) =>
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (x, i) => bv.setSafe(i,
            if (x.asInstanceOf[Boolean]) 1 else 0)
        }
      case (lv: ListVector, ArrayType(inner, _)) =>
        // rows hand arrays back as mutable.ArraySeq — match the
        // collection root, not the immutable alias
        val elems = values.flatMap {
          case null => Nil
          case s: scala.collection.Seq[_] => s.toSeq
        }
        fillVector(lv.getDataVector, inner, elems)
        lv.getDataVector.setValueCount(elems.length)
        values.zipWithIndex.foreach {
          case (null, _) =>
          case (s: scala.collection.Seq[_], i) =>
            lv.startNewValue(i)
            lv.endValue(i, s.length)
          case (x, _) => throw new IllegalArgumentException(
            s"expected a sequence, got $x")
        }
      case (vec, t) => throw new IllegalArgumentException(
        s"unsupported vector/type pair ${vec.getClass.getSimpleName}/$t")
    }
    v.setValueCount(values.length)
  }

  /** One Arrow IPC stream shard per input partition + `state.json` +
    * `dataset_info.json`, the `save_to_disk` layout.
    */
  def write(df: DataFrame, dir: String, batchRows: Int = 1024): Unit = {
    val schema = df.schema
    new File(dir).mkdirs()
    // Write the new shard set into a staging directory and swap in
    // AFTER the job succeeds. Deleting the old shards up front (the
    // previous behavior) destroys the INPUT when df lazily reads from
    // this same directory (read → filter → write-in-place: the scan
    // plans its splits after the delete and finds nothing); staging
    // also means a mid-job failure leaves the old dataset intact
    // rather than half-deleted. The final delete+rename window is the
    // same one any non-transactional layout rewrite has.
    val stage = new File(dir,
      s".stage-${java.util.UUID.randomUUID().toString.take(8)}")
    stage.mkdirs()
    val stagePath = stage.getAbsolutePath
    val n = df.rdd.getNumPartitions
    val names = (0 until n).map(i => f"data-$i%05d-of-$n%05d.arrow")
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val alloc = new RootAllocator()
      val fields = schema.fields.map(f => arrowField(f.name, f.dataType))
      val root = VectorSchemaRoot.create(
        new ArrowSchema(fields.toSeq.asJava), alloc)
      val out = new FileOutputStream(
        new File(stagePath, f"data-$idx%05d-of-$n%05d.arrow"))
      val writer = new ArrowStreamWriter(root, null, out)
      try {
        writer.start()
        rows.grouped(batchRows).foreach { batch =>
          root.getFieldVectors.asScala.zipWithIndex.foreach { case (v, c) =>
            v.reset()
            fillVector(v, schema.fields(c).dataType,
              batch.map(_.get(c)))
          }
          root.setRowCount(batch.length)
          writer.writeBatch()
        }
        writer.end()
      } finally {
        out.close(); root.close(); alloc.close()
      }
      Iterator.single(idx)
    }.count()
    // job done — old shards can no longer be an input; swap
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrow")).foreach(_.delete())
    names.foreach { f =>
      java.nio.file.Files.move(new File(stage, f).toPath,
        new File(dir, f).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    stage.delete()
    val filesJson = names
      .map(f => s"""{"filename": "$f"}""").mkString(", ")
    java.nio.file.Files.write(new File(dir, "state.json").toPath,
      s"""{"_data_files": [$filesJson], "_format_type": null}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(new File(dir, "dataset_info.json").toPath,
      s"""{"builder_name": "graft", "splits": {}}""".getBytes("UTF-8"))
  }
}
