package graft.catalog

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, LocalRelation, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{CatalogNotFoundException, Identifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.graftbridge.Bridge

import graft.io.{MergeSql, VersionLog}

/** Analyzer/parser glue that makes [[GraftCatalog]] tables plain SQL
  * citizens — the three seams a V1-relation-backed lakehouse needs:
  *
  *  - [[GraftV2ToV1Reads]]: reads of a catalog graft table rewrite
  *    from the analyzer's `DataSourceV2Relation` to the
  *    [[graft.sources.GraftTableSource]] `HadoopFsRelation`, so the
  *    catalog front door gets the same planner-time pruning
  *    (snapshot pinning, manifest boxes, key blooms, partition
  *    filters) and vectorized scan as `format("graft")` — one
  *    FileIndex, two doors. Write targets are left as V2 relations
  *    for the V1-fallback write path.
  *  - [[GraftSqlParser]]: `MERGE INTO graft...` is captured at PARSE
  *    time — the exact unresolved `MergeIntoTable` shape
  *    [[graft.io.MergeSql]] already interprets — and replaced by
  *    [[GraftCatalogMergeCommand]], which executes the versioned CDC
  *    merge. (Spark's own row-level rewrite demands a
  *    SupportsRowLevelOperations V2 scan; the graft merge is a
  *    file-granular copy-on-write commit, so interception beats
  *    reimplementing the operator inside Spark's delete-and-insert
  *    protocol.) The parser also adds `DESCRIBE HISTORY <table>`,
  *    which standard Spark SQL lacks.
  */
object GraftCatalogRules {

  /** Resolve a raw multipart identifier to (graft catalog, ident):
    * `graft.ns….t` when the head names a [[GraftCatalog]], or any
    * bare identifier while the CURRENT catalog is one. Non-graft
    * plans resolve to None and are left for Spark's analyzer.
    */
  def resolveGraftIdent(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    def catalogOf(name: String): Option[GraftCatalog] =
      try session.sessionState.catalogManager.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      } catch { case _: CatalogNotFoundException => None }
    parts match {
      case head +: rest if rest.nonEmpty && catalogOf(head).isDefined =>
        Some((catalogOf(head).get,
          Identifier.of(rest.init.toArray, rest.last)))
      case _ =>
        session.sessionState.catalogManager.currentCatalog match {
          case g: GraftCatalog if parts.nonEmpty =>
            Some((g, Identifier.of(parts.init.toArray, parts.last)))
          case _ => None
        }
    }
  }
}

/** Rewrite catalog-table READS to the shared V1 planner-pruning
  * relation (write targets stay V2 so the V1-fallback write planner
  * sees them; a declared-but-empty table reads as an empty relation).
  */
case class GraftV2ToV1Reads(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val writeTargets: Set[LogicalPlan] = plan.collect {
      case w: V2WriteCommand => w.table.collectLeaves()
      case i: InsertIntoStatement => i.table.collectLeaves()
    }.flatten.toSet
    plan.resolveOperators {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !writeTargets(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        // r.output follows GraftTable.schema() (DECLARED column
        // order); the V1 relation's schema puts data columns first
        // and the partition column last — match by NAME, never by
        // position, and restore the declared order with a Project
        // (free: it reuses the same attributes / column pruning)
        val resolver = session.sessionState.conf.resolver
        t.v1Relation match {
          case None => LocalRelation(r.output)
          case Some(rel)
              if {
                val snap =
                  VersionLog.snapshot(session, t.dir, t.versionAsOf)
                // merge-on-read manifests AND column mapping both
                // take the projection branch below (the V1 relation
                // is physical; renamed/dropped columns need the
                // logical re-projection VersionLog.read builds)
                snap.deletes.isEmpty && snap.colMap.isEmpty &&
                  snap.droppedPhys.isEmpty
              } =>
            val natural = rel.schema.fieldNames.map(n =>
              r.output.find(a => resolver(a.name, n)).getOrElse(
                throw new IllegalStateException(
                  s"graft table ${t.dir}: relation column $n missing " +
                    s"from the table schema ${r.output.map(_.name)}")))
            val lr = LogicalRelation(rel, natural.toIndexedSeq, None,
              isStreaming = false, None)
            if (natural.toSeq == r.output) lr
            else org.apache.spark.sql.catalyst.plans.logical.Project(
              r.output, lr)
          case Some(_) =>
            // merge-on-read: wrap the scan with the manifest
            // anti-join (VersionLog.read's plan) and re-root its
            // output on this relation's attribute ids
            val df = VersionLog.read(session, t.dir, t.versionAsOf)
            val child = df.queryExecution.analyzed
            org.apache.spark.sql.catalyst.plans.logical.Project(
              r.output.map { to =>
                val from = child.output.find(a =>
                  resolver(a.name, to.name)).getOrElse(
                  throw new IllegalStateException(
                    s"graft table ${t.dir}: column ${to.name} missing " +
                      s"from the read plan ${child.output.map(_.name)}"))
                org.apache.spark.sql.catalyst.expressions.Alias(
                  from, to.name)(exprId = to.exprId)
              }, child)
        }
    }
  }
}

/** Delegating parser: intercepts `DESCRIBE HISTORY` (not Spark
  * grammar) and re-roots graft-catalog `MERGE INTO` plans as
  * [[GraftCatalogMergeCommand]]; everything else passes through.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val historyRe: Regex =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*$""".r

  private val cloneRe: Regex =
    ("""(?is)^\s*CREATE\s+TABLE\s+(\S+)\s+(?:SHALLOW\s+)?CLONE\s+""" +
      """(\S+?)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""").r

  private val vacuumRe: Regex =
    ("""(?is)^\s*VACUUM\s+(\S+?)""" +
      """(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r

  private val optimizeRe: Regex =
    ("""(?is)^\s*OPTIMIZE\s+(\S+?)""" +
      """(?:\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*;?\s*$""").r

  private val restoreRe: Regex =
    ("""(?is)^\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+VERSION\s+AS\s+OF""" +
      """\s+(\d+)\s*;?\s*$""").r

  private val restoreTsRe: Regex =
    ("""(?is)^\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+TIMESTAMP\s+AS\s+""" +
      """OF\s+'([^']+)'\s*;?\s*$""").r

  private val detailRe: Regex =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+(\S+)\s*;?\s*$""".r

  private val addConstraintRe: Regex =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+""" +
      """CHECK\s*\((.+)\)\s*;?\s*$""").r

  private val dropConstraintRe: Regex =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+CONSTRAINT\s+""" +
      """(\w+)\s*;?\s*$""").r

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(sqlText, () => delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    intercept(sqlText,
      () => delegate.parsePlanWithParameters(sqlText, ctx))

  /** Every graft-only statement (not Spark grammar) is GATED on its
    * identifier resolving to a graft catalog table: a non-graft
    * `VACUUM x` / `DESCRIBE HISTORY x` / … FALLS THROUGH to the
    * delegate (Spark's own parse error, or a coexisting extension
    * that implements the same statement) instead of failing here —
    * this parser must never capture another catalog's tables.
    */
  private def intercept(sqlText: String,
      parse: () => LogicalPlan): LogicalPlan = {
    def orDelegate(cmd: Option[LogicalPlan]): LogicalPlan =
      cmd.getOrElse(parse())
    historyRe.findFirstMatchIn(sqlText) match {
      case Some(m) => orDelegate(graftDir(m.group(1))
        .map(GraftDescribeHistoryCommand))
      case None => cloneRe.findFirstMatchIn(sqlText) match {
        case Some(m) =>
          orDelegate(for {
            src <- graftDir(m.group(2))
            dst <- graftDir(m.group(1))
          } yield GraftCloneCommand(src, dst,
            Option(m.group(3)).map(_.toLong)))
        case None => vacuumRe.findFirstMatchIn(sqlText) match {
          case Some(m) =>
            val hours = Option(m.group(3))
              .exists(_.equalsIgnoreCase("HOURS"))
            orDelegate(graftDir(m.group(1)).map(d =>
              GraftVacuumCommand(d,
                keepLast =
                  if (hours) 1
                  else Option(m.group(2)).map(_.toInt).getOrElse(2),
                retainHours =
                  if (hours) Option(m.group(2)).map(_.toInt) else None,
                dryRun = m.group(4) != null,
                explicitRetain = m.group(2) != null)))
          case None => optimizeRe.findFirstMatchIn(sqlText) match {
            case Some(m) =>
              orDelegate(graftDir(m.group(1)).map(d =>
                GraftOptimizeCommand(d,
                  Option(m.group(2)).map(x => (x, m.group(3))))))
            case None => restoreRe.findFirstMatchIn(sqlText) match {
              case Some(m) =>
                orDelegate(graftDir(m.group(1)).map(d =>
                  GraftRestoreCommand(d, m.group(2).toLong)))
              case None => restoreTsRe.findFirstMatchIn(sqlText) match {
                case Some(m) =>
                  orDelegate(graftDir(m.group(1)).map(d =>
                    GraftRestoreTimestampCommand(d, m.group(2))))
                case None => detailRe.findFirstMatchIn(sqlText) match {
                  case Some(m) => orDelegate(graftDir(m.group(1))
                    .map(GraftDescribeDetailCommand))
                  case None => interceptConstraint(sqlText)
                    .getOrElse(rewriteMerge(parse()))
                }
              }
            }
          }
        }
      }
    }
  }

  /** The statement's raw table identifier resolved to a graft table
    * directory — None (delegate) when it does not parse as an
    * identifier or does not name a graft catalog table.
    */
  private def graftDir(raw: String): Option[String] =
    (try GraftCatalogRules.resolveGraftIdent(session,
        delegate.parseMultipartIdentifier(raw))
     catch { case _: Exception => None })
      .map { case (cat, ident) => cat.dirFor(ident) }

  /** `ALTER TABLE t ADD CONSTRAINT n CHECK (e)` / `DROP CONSTRAINT n`
    * on a GRAFT table only — non-graft ALTERs fall through to Spark's
    * own grammar (None).
    */
  private def interceptConstraint(sqlText: String): Option[LogicalPlan] =
    addConstraintRe.findFirstMatchIn(sqlText)
      .flatMap(m => graftDir(m.group(1)).map(d =>
        GraftConstraintCommand(d, m.group(2), Some(m.group(3)))))
      .orElse(dropConstraintRe.findFirstMatchIn(sqlText)
        .flatMap(m => graftDir(m.group(1)).map(d =>
          GraftConstraintCommand(d, m.group(2), None))))

  /** Re-root graft-catalog DML (MERGE / DELETE / UPDATE) parse trees
    * as eager graft commands; non-graft targets pass through
    * untouched to Spark's own row-level machinery.
    */
  private def rewriteMerge(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      graftTargetDir(m.targetTable) match {
        case Some(dir) =>
          val (keyCol, deleteWhenSql, bySourceDel, bySourceUpd) =
            MergeSql.interpretShape(m)
          GraftCatalogMergeCommand(dir, m.sourceTable,
            keyCol, deleteWhenSql, bySourceDel, bySourceUpd,
            schemaEvolution = m.withSchemaEvolution)
        case None => m
      }
    case d @ DeleteFromTable(target, condition) =>
      graftTargetDir(target) match {
        case Some(dir) =>
          GraftDeleteCommand(dir,
            stripQualifiers(condition, targetQualifiers(target)).sql)
        case None => d
      }
    case u @ UpdateTable(target, assignments, condition) =>
      graftTargetDir(target) match {
        case Some(dir) =>
          val quals = targetQualifiers(target)
          val sets = assignments.map {
            case Assignment(k: UnresolvedAttribute, v) =>
              val bare = stripQualifiers(k, quals) match {
                case a: UnresolvedAttribute => a
                case other => throw new IllegalArgumentException(
                  s"UPDATE SET target must be a column, got: $other")
              }
              // dotted targets (`SET s.x = e`) pass through whole:
              // the door rewrites them into one withField-based
              // struct assignment per head
              (bare.nameParts.mkString("."),
                stripQualifiers(v, quals).sql)
            case a => throw new IllegalArgumentException(
              s"UPDATE SET target must be a column, got: ${a.sql}")
          }
          GraftUpdateCommand(dir, sets,
            condition.map(c => stripQualifiers(c, quals).sql))
        case None => u
      }
    case other => other
  }

  /** The names that may QUALIFY a column reference in this statement:
    * the target's alias (if any) and its table identifier's last part.
    */
  private def targetQualifiers(target: LogicalPlan): Seq[String] =
    target match {
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        Seq(id.name, u.multipartIdentifier.last)
      case u: UnresolvedRelation => Seq(u.multipartIdentifier.last)
      case _ => Nil
    }

  /** The statement target's graft table directory, or None when the
    * target is not an (aliased) identifier of a graft catalog table.
    */
  private def graftTargetDir(target: LogicalPlan): Option[String] = {
    val rel = target match {
      case SubqueryAlias(_, u: UnresolvedRelation) => Some(u)
      case u: UnresolvedRelation => Some(u)
      case _ => None
    }
    rel.flatMap(u => GraftCatalogRules
        .resolveGraftIdent(session, u.multipartIdentifier))
      .map { case (cat, ident) => cat.dirFor(ident) }
  }

  /** Strip the LEADING table/alias qualifier — and only that — so
    * predicates and assignment values evaluate over the bare table
    * frame (`t.k` -> `k`, `t.meta.ts` -> `meta.ts`). A multi-part
    * reference whose head is NOT the statement's table name or alias
    * is left intact: `meta.ts` stays a struct-field access instead of
    * being silently collapsed to a bare `ts` (which could rebind to a
    * same-named top-level column and mutate the wrong rows).
    */
  private def stripQualifiers(e: Expression,
      quals: Seq[String]): Expression = {
    val resolver = session.sessionState.conf.resolver
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          quals.exists(resolver(_, a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `MERGE INTO <graft table> USING <source> ON t.k = s.k …` as an
  * eagerly-executed command: the captured (unresolved) source plan
  * resolves at run time, and the merge is
  * [[VersionLog.mergeByKeyCdc]] — a pinned-snapshot copy-on-write
  * commit with a CDC feed, published by one version-file CAS. Output
  * mirrors the commit: the new version id, rows written, touched and
  * drained partition counts.
  */
case class GraftCatalogMergeCommand(dir: String, source: LogicalPlan,
    keyCol: String, deleteWhenSql: Option[String],
    bySourceDeleteSql: Option[String] = None,
    bySourceUpdateSql: Option[(String, Seq[(String, String)])] = None,
    schemaEvolution: Boolean = false)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("output_rows", LongType, nullable = false)(),
    AttributeReference("touched_partitions", IntegerType,
      nullable = false)(),
    AttributeReference("drained_partitions", IntegerType,
      nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = Bridge.ofRows(spark, source)
    require(VersionLog.listVersions(spark, dir).nonEmpty,
      s"MERGE INTO target $dir is not a versioned graft table")
    val snap = VersionLog.snapshot(spark, dir, None)
    // directory segments only: a data file basename containing '='
    // must not be misparsed as a partition column
    val partCol = snap.files.flatMap(_.split("/").dropRight(1)
        .filter(_.contains("=")).map(_.split("=", 2)(0))).distinct match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"MERGE INTO requires exactly one partition level at $dir, " +
          s"found: ${other.mkString(",")}")
    }
    val (stats, _, version) = VersionLog.mergeByKeyCdc(spark, dir, src,
      keyCol, partCol, deleteWhenSql.map(expr),
      bySourceDelete = bySourceDeleteSql.map(expr),
      bySourceUpdate = bySourceUpdateSql.map { case (c, sets) =>
        (expr(c), sets.map { case (k, v) => (k, expr(v)) })
      },
      schemaEvolution = schemaEvolution)
    Seq(Row(version, stats.outputRows, stats.touchedPartitions.size,
      stats.removedPartitions.size))
  }
}

/** `DELETE FROM <graft table> [WHERE cond]` — copy-on-write commit
  * via [[VersionLog.deleteWhereCommit]]: only files holding a matching
  * live row rewrite; older versions still time-travel to the
  * pre-delete state. Point-in-time semantics (a later insert of an
  * identical row lives), unlike the merge-on-read equality-delete
  * door.
  */
case class GraftDeleteCommand(dir: String, condSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("deleted_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (n, v) = VersionLog.deleteWhereCommit(spark, dir, expr(condSql))
    Seq(Row(v, n))
  }
}

/** `UPDATE <graft table> SET c = e, … [WHERE cond]` — copy-on-write
  * commit via [[VersionLog.updateWhereCommit]]: assignments evaluate
  * against the old row, values cast to the column's type, CHECK
  * constraints re-gate the rewritten batch, partition-column
  * assignments refuse loudly (use MERGE).
  */
case class GraftUpdateCommand(dir: String, sets: Seq[(String, String)],
    condSql: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("updated_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (n, v) = VersionLog.updateWhereCommit(spark, dir,
      sets.map { case (c, e) => (c, expr(e)) },
      condSql.map(expr).getOrElse(
        org.apache.spark.sql.functions.lit(true)))
    Seq(Row(v, n))
  }
}

/** `CREATE TABLE <dst> [SHALLOW] CLONE <src> [VERSION AS OF n]` —
  * Delta's clone statement (not Spark grammar), routed to
  * [[VersionLog.cloneTable]]: the pinned snapshot's files hard-link
  * into the new table's directory and commit as its version 1 — zero
  * data copied, and (unlike path-referencing clones) no cross-table
  * vacuum hazard. Returns the cloned version id and live file count.
  */
case class GraftCloneCommand(srcDir: String, dstDir: String,
    versionAsOf: Option[Long]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = VersionLog.cloneTable(spark, srcDir, dstDir, versionAsOf)
    Seq(Row(v,
      VersionLog.snapshot(spark, dstDir, None).files.size.toLong))
  }
}

/** `RESTORE TABLE <graft table> TO VERSION AS OF <n>` (Delta's
  * statement): a metadata-only rollback commit
  * ([[VersionLog.restoreCommit]]) — the new version re-lists the
  * target's files; the undone versions stay time-travelable until
  * vacuum. Returns (new version, restored-from version).
  */
case class GraftRestoreCommand(dir: String, toVersion: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_from", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(VersionLog.restoreCommit(spark, dir, toVersion), toVersion))
}

/** `RESTORE TABLE <graft table> TO TIMESTAMP AS OF '<instant>'` —
  * [[GraftRestoreCommand]] with the version resolved against the
  * in-commit instants ([[VersionLog.versionAtTimestamp]]): "the table
  * as it stood at that moment". Accepts epoch millis, a timestamp
  * literal, or a date-only literal — parsed in the SESSION time zone
  * ([[VersionLog.timestampLiteralMillis]], shared with the
  * `timestampAsOf` reader option).
  */
case class GraftRestoreTimestampCommand(dir: String, ts: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_from", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = VersionLog.versionAtTimestamp(spark, dir,
      VersionLog.timestampLiteralMillis(spark, ts))
    Seq(Row(VersionLog.restoreCommit(spark, dir, v), v))
  }
}

/** `DESCRIBE DETAIL <graft table>` (Delta's statement): one row of
  * table-level metadata from the latest snapshot — location, version,
  * live file count and bytes (one file status per live file, the
  * planner's working set, never a data read), partition column,
  * outstanding delete manifests, constraint count, and the
  * write-time-stats coverage pair (`n_batch_roots` vs
  * `n_stats_sidecars`): a gap means some batches' harvest failed or
  * predates stats-on-write, so those files never data-skip — the
  * observable for a silently degrading harvest.
  */
case class GraftDescribeDetailCommand(dir: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_col", StringType, nullable = true)(),
    AttributeReference("n_delete_manifests", LongType,
      nullable = false)(),
    AttributeReference("n_constraints", LongType, nullable = false)(),
    AttributeReference("n_batch_roots", LongType, nullable = false)(),
    AttributeReference("n_stats_sidecars", LongType,
      nullable = false)(),
    AttributeReference("n_mapped_columns", LongType,
      nullable = false)(),
    AttributeReference("n_dropped_columns", LongType,
      nullable = false)(),
    AttributeReference("properties", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val snap = VersionLog.snapshot(spark, dir, None)
    val base = dir.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = snap.files.map(f => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(base, f)).getLen).sum
    val partCol = snap.files.flatMap(_.split("/").dropRight(1)
      .filter(_.contains("=")).map(_.split("=", 2)(0))).distinct match {
      case Seq(one) => one
      case _ => null
    }
    val roots = snap.files.map(graft.io.BatchStats.batchRootOf).distinct
    val sidecars = roots.count(r => fs.exists(
      new org.apache.hadoop.fs.Path(s"$base/$r",
        graft.io.BatchStats.FileName)))
    val props = snap.properties.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(",")
    Seq(Row(dir, "graft", snap.version, snap.files.size.toLong, bytes,
      partCol, snap.deletes.size.toLong, snap.constraints.size.toLong,
      roots.size.toLong, sidecars.toLong,
      snap.colMap.size.toLong, snap.droppedPhys.size.toLong, props))
  }
}

/** `ALTER TABLE <graft table> ADD CONSTRAINT <name> CHECK (<expr>)` /
  * `DROP CONSTRAINT <name>` — CHECK constraints as version-log commits
  * ([[VersionLog.addConstraintCommit]]): ADD validates the EXISTING
  * rows first (a constraint the current state violates is refused),
  * then every later write's batch is gated at commit time in every
  * door (INSERT, MERGE, the batch and streaming sinks — they all
  * funnel through the version log's constraint gate). Time travel to
  * pre-constraint versions reads the old contract, like schema
  * history.
  */
case class GraftConstraintCommand(dir: String, name: String,
    checkExpr: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_constraints", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = checkExpr match {
      case Some(e) => VersionLog.addConstraintCommit(spark, dir, name, e)
      case None => VersionLog.dropConstraintCommit(spark, dir, name)
    }
    Seq(Row(v, VersionLog.snapshot(spark, dir, None)
      .constraints.size.toLong))
  }
}

/** `VACUUM <graft table> [RETAIN n VERSIONS]` (Delta's statement, not
  * Spark grammar): [[VersionLog.vacuumVersions]] — deletes only files
  * unreferenced by EVERY retained version (default: keep the last 2),
  * so no pinned reader of a retained snapshot can lose a file. The SQL
  * door passes ttl 0: retention-by-reference is the gate; keep the
  * TTL belt via the API when wall-clock aging matters too.
  */
case class GraftVacuumCommand(dir: String, keepLast: Int,
    retainHours: Option[Int] = None,
    dryRun: Boolean = false,
    explicitRetain: Boolean = true) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed_files", LongType, nullable = false)(),
    AttributeReference("dry_run", org.apache.spark.sql.types.BooleanType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // RETAIN n HOURS (Delta's default retention unit): keep every
    // version whose in-commit instant is inside the window — resolved
    // to a retainFromVersion floor against commitTimestamps; the
    // newest version always survives (keepLast >= 1)
    // no RETAIN clause: the TABLE's own persisted retention window
    // (`graft.retentionHours` TBLPROPERTY) governs — retention is a
    // property of the table, not of whoever happens to run VACUUM
    val effectiveHours = retainHours.orElse(
      if (explicitRetain) None
      else VersionLog.tableProperty(spark, dir, "graft.retentionHours")
        .flatMap(v => scala.util.Try(v.toInt).toOption))
    val floor = effectiveHours.flatMap { h =>
      val cutoff = System.currentTimeMillis() - h * 3600000L
      VersionLog.commitTimestamps(spark, dir)
        .find(_._2 >= cutoff).map(_._1)
    }
    Seq(Row(
      VersionLog.vacuumVersions(spark, dir, keepLast, ttlMs = 0L,
        retainFromVersion = floor, dryRun = dryRun).size.toLong,
      dryRun))
  }
}

/** `OPTIMIZE <graft table> [ZORDER BY (x, y)]` (Delta's statement, not
  * Spark grammar). Plain OPTIMIZE = [[VersionLog.compactSnapshot]]:
  * bin-pack over-fragmented partition groups as ONE commit, compact
  * groups carried by reference, readers undisturbed. ZORDER = rewrite
  * the live rows in (x, y) z-order as an overwrite commit (flat
  * tables only — interleaving across hive partitions would destroy
  * the partition addressing) and rebuild the min-max manifest on
  * (x, y) so the graft FileIndex prunes boxes against the new layout.
  */
case class GraftOptimizeCommand(dir: String,
    zorder: Option[(String, String)]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  /** Target output file size: `spark.graft.optimize.targetBytes`
    * (default 128 MiB — sized so a 100 TB table compacts toward
    * ~1M files, the planner-metadata scale every format targets).
    */
  private def targetBytes(spark: SparkSession): Long =
    spark.conf.get("spark.graft.optimize.targetBytes",
      (128L << 20).toString).toLong

  override def run(spark: SparkSession): Seq[Row] = zorder match {
    case None =>
      val (before, after, v) =
        VersionLog.compactSnapshot(spark, dir, targetBytes(spark))
      Seq(Row(v, before.toLong, after.toLong))
    case Some((x, y)) =>
      val snap = VersionLog.snapshot(spark, dir, None)
      require(!snap.files.exists(_.contains("=")),
        s"OPTIMIZE ZORDER needs a flat (unpartitioned) layout at $dir")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = snap.files.map(f => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(dir.stripSuffix("/"), f)).getLen)
        .sum
      val nOut = math.max(1,
        math.ceil(bytes.toDouble / targetBytes(spark)).toInt)
      val live = VersionLog.read(spark, dir)
      val v = VersionLog.overwrite(spark, dir,
        graft.io.ZOrder.zOrdered(live,
          org.apache.spark.sql.functions.col(x),
          org.apache.spark.sql.functions.col(y), nOut),
        partitionBy = None, actionTag = "optimize-zorder")
      graft.io.Manifest.buildManifestFor(spark, dir,
        VersionLog.read(spark, dir), Seq(x, y))
      Seq(Row(v, snap.files.size.toLong,
        VersionLog.snapshot(spark, dir, None).files.size.toLong))
  }
}

/** `DESCRIBE HISTORY <graft table>` — the commit log as a result set
  * (version, parent, action, commit_ts, n_files, n_rows), straight
  * from [[VersionLog.history]]: metadata plus parquet footer counts,
  * never a data decode.
  */
case class GraftDescribeHistoryCommand(dir: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("parent", LongType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("commit_ts", TimestampType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    VersionLog.history(spark, dir).collect().toSeq
}
