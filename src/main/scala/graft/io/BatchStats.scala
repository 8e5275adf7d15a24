package graft.io

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession

/** WRITE-TIME per-file min/max statistics for the versioned table —
  * the Delta "stats collected on write" idea: every commit harvests
  * its NEW files' parquet footers (the data was just written; one
  * metadata read per batch file, O(change) like the commit itself)
  * into one `_stats.json` per batch directory, immutable alongside
  * the batch. The reader's FileIndex folds these into the same
  * min/max box pruning the explicit `._manifest` feeds — so a
  * versioned table data-skips OUT OF THE BOX, no OPTIMIZE required,
  * and time travel prunes with each batch's own stats.
  *
  * Everything here is CONSERVATIVE: a column whose footer statistics
  * are absent, unordered (parquet nulls them out for unreliable sort
  * orders, e.g. pre-fix signed binary), non-finite (NaN bounds), or
  * of an unmapped type simply contributes no box — the file is kept.
  * Parquet's truncated binary bounds stay valid bounds (the
  * truncation rounds min down and max up), so string boxes prune
  * correctly even when inexact.
  *
  * Values normalize AT HARVEST into the two families the pruner
  * compares: decimal strings (integers, floats, decimals, dates as
  * epoch days, timestamps as epoch micros — the same scalars pushed
  * literals carry) and UTF-8 strings, matching Spark's binary string
  * ordering. Reference layout pattern: Iceberg manifests / Delta
  * per-AddFile stats (public protocol knowledge, re-implemented).
  */
object BatchStats {

  val FileName = "_stats.json"

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(BatchStats.getClass)

  /** One column's harvested stat in on-disk form. DATE columns carry
    * their own tag (`days`): the bounds are epoch DAYS, and a reader
    * serving the column under a WIDENED timestamp_ntz declaration
    * must scale them to micros at plan time — an untagged day bound
    * compared against a micros literal inside one numeric family
    * would over-prune (wrong results).
    */
  private sealed trait Stat
  private case object AllNull extends Stat
  private final case class Num(min: BigDecimal, max: BigDecimal)
    extends Stat
  private final case class Days(min: BigDecimal, max: BigDecimal)
    extends Stat
  private final case class Str(min: String, max: String) extends Stat

  /** Harvest stats for `adds` (dir-relative paths of files a commit
    * is adding), writing one `_stats.json` per NEW batch root. Roots
    * that already carry a stats file are skipped whole — a rebase,
    * restore, or clone re-listing old batches never re-harvests.
    * Best-effort by contract: any failure leaves no stats file and
    * the reader keeps those files conservatively.
    */
  def harvest(spark: SparkSession, dir: String,
      adds: Seq[String]): Unit = {
    if (adds.isEmpty) return
    val base = dir.stripSuffix("/")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    adds.filter(_.endsWith(".parquet")).groupBy(batchRootOf)
      .foreach { case (root, files) =>
        try {
          val target = new Path(s"$base/$root", FileName)
          if (!fs.exists(target)) {
            // footer reads are independent metadata round trips —
            // overlap them (an object store's ~10ms latency would
            // otherwise serialize a 10k-file batch into 100s)
            import scala.collection.parallel.CollectionConverters._
            val entries = files.sorted.par
              .map { rel =>
                fileStats(spark, fs, new Path(s"$base/$rel"))
                  .map(rel -> _)
              }.seq.flatten
            if (entries.nonEmpty) {
              // publish through the same tmp + atomic no-replace path
              // as version files: a crash mid-write must never leave a
              // torn sidecar (it would both disable skipping for the
              // batch AND block re-harvest via the exists-check above)
              VersionLog.atomicCreate(fs, new Path(s"$base/$root"),
                target, renderJson(entries))
              ()
            }
          }
        } catch {
          // conservative contract: the reader keeps un-stat'd files —
          // but a SYSTEMATICALLY failing harvest (permissions, codec)
          // would silently degrade every future scan, so it is LOGGED
          // per root (DESCRIBE DETAIL surfaces the sidecar-coverage
          // gap: n_stats_sidecars vs n_batch_roots)
          case e: Exception => log.warn(
            s"stats harvest failed for batch $root of $dir — files " +
              "will be kept conservatively (no data skipping for " +
              s"this batch): $e")
        }
      }
  }

  private[graft] def batchRootOf(file: String): String = {
    val segs = file.split("/")
    if (segs.length >= 2 && segs(0) == "data") segs.take(2).mkString("/")
    else segs.dropRight(1).mkString("/")
  }

  /** Per-column stats of one file, folded across its row groups:
    * top-level primitives plus struct leaves at ANY depth (keyed by
    * their dotted path `a.b.c` — the same name the reader's chained
    * `GetStructField` pruning binds). List/map-annotated and repeated
    * groups contribute nothing (their leaves are multi-valued per
    * row; a min/max box still holds but the engine's canonical nested
    * filters are struct leaves — conservative). A key claimed by more
    * than one distinct column path (a literally-dotted column name
    * colliding with a struct leaf, at any level) is ambiguous: none
    * of its claimants is harvested.
    */
  private def fileStats(spark: SparkSession, fs: FileSystem,
      p: Path): Option[Map[String, Stat]] = {
    val meta = ParquetFileReader.readFooter(
      spark.sparkContext.hadoopConfiguration, p,
      ParquetMetadataConverter.NO_FILTER)
    val schema = meta.getFileMetaData.getSchema
    val blocks = meta.getBlocks.asScala.toSeq
    if (blocks.isEmpty) return None
    // recursive leaf walk: plain (unannotated, non-repeated) groups
    // are structs — descend; list/map annotations and repeated types
    // stop the walk (multi-valued leaves)
    def walk(prefix: Seq[String], t: org.apache.parquet.schema.Type):
        Seq[(Seq[String], String, PrimitiveType)] =
      if (t.isRepetition(
          org.apache.parquet.schema.Type.Repetition.REPEATED)) Nil
      else if (t.isPrimitive) {
        val path = prefix :+ t.getName
        Seq((path, path.mkString("."), t.asPrimitiveType()))
      } else if (t.getLogicalTypeAnnotation == null)
        t.asGroupType().getFields.asScala.toSeq
          .flatMap(walk(prefix :+ t.getName, _))
      else Nil
    // a key claimed by BOTH a literally-dotted column and a struct
    // leaf is dropped WHOLE: keeping either side would let the
    // pruner apply the wrong column's box (over-pruning = wrongness)
    val cols = schema.getFields.asScala.toSeq.flatMap(walk(Nil, _))
    val dupKeys = cols.groupBy(_._2).filter(_._2.size > 1).keySet
    val stats = cols.filterNot(c => dupKeys.contains(c._2))
      .flatMap { case (path, key, pt) =>
        foldColumn(path, pt, blocks).map(key -> _)
      }.toMap
    if (stats.isEmpty) None else Some(stats)
  }

  private def foldColumn(path: Seq[String], pt: PrimitiveType,
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]):
      Option[Stat] = {
    // match the exact SEGMENT path (never a dot-joined string): a
    // top-level column literally named "a.b" and the leaf of a
    // nested group a -> b both render "a.b" but have different paths
    val chunks = blocks.flatMap(_.getColumns.asScala.find { c =>
      c.getPath.toArray.toSeq == path
    })
    if (chunks.size != blocks.size) return None // absent in a block
    val sts = chunks.map(_.getStatistics)
    // every row group must carry trustworthy statistics — parquet-mr
    // already nulls out stats with unreliable sort orders
    if (sts.exists(s => s == null || s.isEmpty)) return None
    val allNull = sts.forall(s =>
      s.isNumNullsSet && s.getNumNulls >= 0 && !s.hasNonNullValue) &&
      sts.zip(blocks).forall { case (s, b) => s.getNumNulls == b.getRowCount }
    if (allNull) return Some(AllNull)
    if (sts.exists(!_.hasNonNullValue)) return None
    val mins = sts.map(s => convert(pt, s, isMin = true))
    val maxs = sts.map(s => convert(pt, s, isMin = false))
    if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty)) return None
    val isDate = pt.getLogicalTypeAnnotation
      .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
    (mins.flatten, maxs.flatten) match {
      case (ms: Seq[Any], xs: Seq[Any])
          if ms.forall(_.isInstanceOf[BigDecimal]) =>
        val lo = ms.map(_.asInstanceOf[BigDecimal]).min
        val hi = xs.map(_.asInstanceOf[BigDecimal]).max
        Some(if (isDate) Days(lo, hi) else Num(lo, hi))
      case (ms, xs) if ms.forall(_.isInstanceOf[String]) =>
        // binary (unsigned byte) order — the order parquet used
        def bin(s: String) = Binary.fromString(s)
        val cmp = org.apache.parquet.schema.PrimitiveComparator
          .UNSIGNED_LEXICOGRAPHICAL_BINARY_COMPARATOR
        Some(Str(
          ms.map(_.asInstanceOf[String]).reduce((a, b) =>
            if (cmp.compare(bin(a), bin(b)) <= 0) a else b),
          xs.map(_.asInstanceOf[String]).reduce((a, b) =>
            if (cmp.compare(bin(a), bin(b)) >= 0) a else b)))
      case _ => None
    }
  }

  /** One footer bound -> the normalized scalar family, or None for
    * anything unmappable (conservative keep). Decimal strings carry
    * integers, finite floats, decimals, dates (epoch days) and
    * timestamps (epoch micros).
    */
  private def convert(pt: PrimitiveType, s: Statistics[_],
      isMin: Boolean): Option[Any] = {
    import LogicalTypeAnnotation._
    import PrimitiveType.PrimitiveTypeName._
    def raw: AnyRef = if (isMin) s.genericGetMin().asInstanceOf[AnyRef]
      else s.genericGetMax().asInstanceOf[AnyRef]
    val logical = pt.getLogicalTypeAnnotation
    (pt.getPrimitiveTypeName, logical) match {
      case (_, d: DecimalLogicalTypeAnnotation) =>
        val unscaled: Option[java.math.BigInteger] = raw match {
          case i: java.lang.Integer =>
            Some(java.math.BigInteger.valueOf(i.longValue))
          case l: java.lang.Long =>
            Some(java.math.BigInteger.valueOf(l.longValue))
          case b: Binary => Some(new java.math.BigInteger(b.getBytes))
          case _ => None
        }
        unscaled.map(u =>
          BigDecimal(new java.math.BigDecimal(u, d.getScale)))
      case (INT32, _: DateLogicalTypeAnnotation) =>
        Some(BigDecimal(raw.asInstanceOf[java.lang.Integer].intValue))
      case (INT64, t: TimestampLogicalTypeAnnotation) =>
        val v = raw.asInstanceOf[java.lang.Long].longValue
        t.getUnit match {
          case TimeUnit.MICROS => Some(BigDecimal(v))
          case TimeUnit.MILLIS => Some(BigDecimal(v) * 1000)
          case TimeUnit.NANOS => Some(BigDecimal(v) / 1000)
        }
      case (INT32 | INT64, _) => raw match {
        case n: java.lang.Number => Some(BigDecimal(n.longValue))
        case _ => None
      }
      case (FLOAT | DOUBLE, _) => raw match {
        case n: java.lang.Number
            if java.lang.Double.isFinite(n.doubleValue) =>
          Some(BigDecimal(n.doubleValue))
        case _ => None // NaN / infinite bound: unknowable
      }
      case (BINARY, _: StringLogicalTypeAnnotation) =>
        Some(raw.asInstanceOf[Binary].toStringUsingUTF8)
      case _ => None // INT96, booleans, raw binary: no box
    }
  }

  // ---- serialization ------------------------------------------------

  private def esc(x: String): String = {
    val sb = new StringBuilder
    x.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def renderJson(
      entries: Seq[(String, Map[String, Stat])]): String = {
    val files = entries.map { case (rel, cols) =>
      val body = cols.toSeq.sortBy(_._1).map {
        case (c, AllNull) => s""""${esc(c)}":{"t":"allnull"}"""
        case (c, Num(mi, ma)) =>
          s""""${esc(c)}":{"t":"num","min":"$mi","max":"$ma"}"""
        case (c, Days(mi, ma)) =>
          s""""${esc(c)}":{"t":"days","min":"$mi","max":"$ma"}"""
        case (c, Str(mi, ma)) =>
          s""""${esc(c)}":{"t":"str","min":"${esc(mi)}","max":"${esc(ma)}"}"""
      }.mkString(",")
      s""""${esc(rel)}":{$body}"""
    }.mkString(",")
    s"""{"files":{$files}}"""
  }

  /** Parse one batch's `_stats.json` into (relative file path ->
    * column -> (tag, min, max)) — the reader converts tags into its
    * own pruning representation. Returns empty on any malformation
    * (conservative).
    */
  def parse(json: String):
      Map[String, Map[String, (String, String, String)]] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("files")
      node.fields().asScala.map { e =>
        e.getKey -> e.getValue.fields().asScala.map { c =>
          val t = c.getValue.get("t").asText
          val mi = Option(c.getValue.get("min")).map(_.asText).getOrElse("")
          val ma = Option(c.getValue.get("max")).map(_.asText).getOrElse("")
          c.getKey -> ((t, mi, ma))
        }.toMap
      }.toMap
    } catch { case _: Exception => Map.empty }
}
