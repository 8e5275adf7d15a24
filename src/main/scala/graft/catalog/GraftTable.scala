package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType

import graft.io.VersionLog
import graft.sources.GraftTableSource

/** A versioned graft table as a Spark V2 [[Table]] — the object
  * [[GraftCatalog]] hands the analyzer so `SELECT`, `INSERT INTO`,
  * `INSERT OVERWRITE`, `MERGE INTO` and `VERSION AS OF` plan against
  * the version log with no helper APIs in sight.
  *
  * Reads do NOT go through a bespoke V2 scan: [[GraftCatalogRules]]
  * rewrites the analyzer's `DataSourceV2Relation` over this table
  * into the V1 `HadoopFsRelation` built by [[GraftTableSource]] — the
  * Delta integration shape — so the catalog path and the
  * `format("graft")` path share one planner-pruning FileIndex
  * (manifest boxes, key blooms, partition pruning, snapshot pinning)
  * and Spark's own vectorized parquet scan.
  *
  * Writes use the V1 write fallback (`V1_BATCH_WRITE`): the
  * InsertableRelation maps INSERT INTO to a version-log append,
  * INSERT OVERWRITE to an overwrite commit, and the first insert into
  * a `CREATE TABLE`-declared empty table to `init` — every SQL write
  * is one atomic snapshot commit with time travel across it.
  */
final class GraftTable(spark: SparkSession, val dir: String,
    identName: String, val versionAsOf: Option[Long],
    declaredSchema: Option[StructType], declaredPartCol: Option[String],
    declaredProps: Seq[(String, String)] = Nil)
    extends Table with SupportsWrite {

  /** Live = at least one committed version. Checked per call site so
    * a CREATE TABLE handle observes its own first insert.
    */
  def exists: Boolean = VersionLog.listVersions(spark, dir).nonEmpty

  /** The V1 relation over the pinned snapshot (None for a declared
    * table with no commits yet — readers see an empty relation via
    * [[GraftCatalogRules]]).
    */
  lazy val v1Relation: Option[BaseRelation] =
    if (!exists) None
    // acceptDeletes: the catalog read path ([[GraftCatalogRules]])
    // anti-joins any equality-delete manifests above this relation
    // acceptPhysicalNames: the catalog read path projects physical ->
    // logical (GraftCatalogRules routes mapped tables through
    // VersionLog.read) and schema() maps names itself
    else Some(new GraftTableSource().createRelation(spark.sqlContext,
      Map("path" -> dir, "acceptDeletes" -> "true",
        "acceptPhysicalNames" -> "true") ++
        versionAsOf.map(v => "versionAsOf" -> v.toString)))

  /** The table's single hive partition column: discovered from the
    * snapshot's `part=value` path segments for a live table, the
    * declared identity transform otherwise.
    */
  def partColOpt: Option[String] =
    if (exists) {
      val snap = VersionLog.snapshot(spark, dir, None)
      snap.files.flatMap(_.split("/").filter(_.contains("="))
        .map(_.split("=", 2)(0))).distinct match {
        case Seq(one) => Some(one)
        case Seq() => None
        case many => throw new IllegalStateException(
          s"graft table at $dir has multiple partition levels: " +
            many.mkString(","))
      }
    } else declaredPartCol

  override def name(): String = identName

  /** The table schema in DECLARED column order. The V1 relation
    * surfaces data columns first and the partition column last
    * (HadoopFsRelation's shape); positional `INSERT INTO` binds
    * against THIS schema, so for a `CREATE TABLE (k, p, v)
    * PARTITIONED BY (p)` table the live relation's (k, v, p) order
    * must be re-ordered back to the declaration — otherwise the first
    * insert (empty table: declared order) and every later one (live:
    * relation order) would bind the same positions to different
    * columns, silently landing values in the wrong columns whenever
    * the types happen to coincide. Evolution-added columns (absent
    * from the declaration) keep their relation order at the end.
    * [[GraftCatalogRules.GraftV2ToV1Reads]] re-projects reads from
    * the relation's order to this one.
    */
  /** physical -> logical name map of the pinned snapshot, resolved
    * ONCE per table handle (schema() is called repeatedly during
    * analysis; a snapshot resolution per call would tax every
    * catalog query for a feature most tables never use).
    */
  private lazy val logicalOf: Map[String, String] =
    VersionLog.snapshot(spark, dir, versionAsOf).colMap
      .map(_.swap).toMap

  override def schema(): StructType = v1Relation match {
    case None => declaredSchema.getOrElse(
      throw new IllegalStateException(
        s"graft table at $dir has no data and no declared schema"))
    case Some(rel) =>
      // the V1 relation is PHYSICAL; surface LOGICAL names (identity
      // unless the snapshot carries a column mapping)
      val live = StructType(rel.schema.fields.map(f =>
        f.copy(name = logicalOf.getOrElse(f.name, f.name))))
      declaredSchema.fold(live) { decl =>
        val inDecl = decl.fieldNames.flatMap(n =>
          live.fields.find(f =>
            spark.sessionState.conf.resolver(f.name, n)))
        val extra = live.fields.filterNot(f => decl.fieldNames.exists(
          spark.sessionState.conf.resolver(_, f.name)))
        StructType((inDecl ++ extra).toSeq)
      }
  }

  override def partitioning(): Array[Transform] =
    partColOpt.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] = {
    // the snapshot's persisted TBLPROPERTIES surface here (SHOW
    // TBLPROPERTIES / DESCRIBE EXTENDED read this map); the two
    // reserved keys always win
    val persisted =
      if (exists)
        VersionLog.snapshot(spark, dir, versionAsOf).properties.toMap
      else declaredProps.toMap // CREATE-declared, pre-first-commit
    (persisted ++
      Map("location" -> dir, "provider" -> "graft")).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionAsOf.isEmpty,
      s"cannot write to a time-travel read of $dir (VERSION AS OF)")
    new WriteBuilder with SupportsOverwrite {
      private var replace = false
      // INSERT OVERWRITE t PARTITION (p='x'): the static partition
      // spec arrives as pushed filters on the partition column —
      // scope the commit to exactly those partitions (replaceWhere)
      private var replaceValues: Option[Seq[String]] = None
      override def truncate(): WriteBuilder = { replace = true; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        if (filters.forall(_.isInstanceOf[AlwaysTrue])) replace = true
        else {
          val pc = partColOpt.getOrElse(
            throw new UnsupportedOperationException(
              "partition-scoped INSERT OVERWRITE on an unpartitioned " +
                s"graft table ($dir)"))
          require(filters.length == 1,
            "graft supports one partition predicate per INSERT " +
              s"OVERWRITE, got: ${filters.mkString(", ")}")
          replaceValues = Some(filters.head match {
            case org.apache.spark.sql.sources.EqualTo(c, v) if c == pc =>
              Seq(String.valueOf(v))
            case org.apache.spark.sql.sources.EqualNullSafe(c, v)
                if c == pc && v != null => Seq(String.valueOf(v))
            case org.apache.spark.sql.sources.In(c, vs) if c == pc =>
              vs.toSeq.map(String.valueOf)
            case other => throw new UnsupportedOperationException(
              "graft INSERT OVERWRITE filters must address the " +
                s"partition column $pc (got: $other)")
          })
        }
        this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              val pb = partColOpt
              if (!exists) {
                require(replaceValues.isEmpty,
                  s"cannot partition-overwrite an empty table ($dir)")
                // root the DECLARED column order in the snapshot so
                // the schema survives independent of file footers;
                // CREATE-declared TBLPROPERTIES seed the first commit
                VersionLog.init(spark, dir, data, pb,
                  schemaJson = declaredSchema.map(_.json),
                  properties =
                    if (declaredProps.nonEmpty) Some(declaredProps)
                    else None)
              } else replaceValues match {
                case Some(vals) =>
                  VersionLog.overwritePartitions(spark, dir, data,
                    pb.get, vals)
                case None =>
                  if (replace || overwrite)
                    VersionLog.overwrite(spark, dir, data, pb)
                  else VersionLog.append(spark, dir, data, pb)
              }
            }
          }
      }
    }
  }
}
