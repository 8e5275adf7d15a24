package graft.catalog

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LocalRelation, LogicalPlan, MergeIntoTable, SubqueryAlias, V2WriteCommand}
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
        t.v1Relation match {
          case None => LocalRelation(r.output)
          case Some(rel)
              if VersionLog.snapshot(session, t.dir, t.versionAsOf)
                .deletes.isEmpty =>
            LogicalRelation(rel, r.output, None, isStreaming = false, None)
          case Some(_) =>
            // merge-on-read: wrap the scan with the manifest
            // anti-join (VersionLog.read's plan) and re-root its
            // output on this relation's attribute ids
            val df = VersionLog.read(session, t.dir, t.versionAsOf)
            val child = df.queryExecution.analyzed
            org.apache.spark.sql.catalyst.plans.logical.Project(
              r.output.zip(child.output).map { case (to, from) =>
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

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(sqlText, () => delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    intercept(sqlText,
      () => delegate.parsePlanWithParameters(sqlText, ctx))

  private def intercept(sqlText: String,
      parse: () => LogicalPlan): LogicalPlan =
    historyRe.findFirstMatchIn(sqlText) match {
      case Some(m) =>
        val parts = delegate.parseMultipartIdentifier(m.group(1))
        GraftCatalogRules.resolveGraftIdent(session, parts) match {
          case Some((cat, ident)) =>
            GraftDescribeHistoryCommand(cat.dirFor(ident))
          case None => throw new IllegalArgumentException(
            s"DESCRIBE HISTORY requires a graft catalog table, got: " +
              parts.mkString("."))
        }
      case None => cloneRe.findFirstMatchIn(sqlText) match {
        case Some(m) =>
          def dirOf(raw: String, what: String): String = {
            val parts = delegate.parseMultipartIdentifier(raw)
            GraftCatalogRules.resolveGraftIdent(session, parts) match {
              case Some((cat, ident)) => cat.dirFor(ident)
              case None => throw new IllegalArgumentException(
                s"CREATE TABLE ... CLONE requires graft catalog " +
                  s"tables; $what ${parts.mkString(".")} is not one")
            }
          }
          GraftCloneCommand(dirOf(m.group(2), "source"),
            dirOf(m.group(1), "target"),
            Option(m.group(3)).map(_.toLong))
        case None => rewriteMerge(parse())
      }
    }

  private def rewriteMerge(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      val target = m.targetTable match {
        case SubqueryAlias(_, u: UnresolvedRelation) => Some(u)
        case u: UnresolvedRelation => Some(u)
        case _ => None
      }
      target.flatMap(u => GraftCatalogRules
          .resolveGraftIdent(session, u.multipartIdentifier)) match {
        case Some((cat, ident)) =>
          val (keyCol, deleteWhenSql) = MergeSql.interpretShape(m)
          GraftCatalogMergeCommand(cat.dirFor(ident), m.sourceTable,
            keyCol, deleteWhenSql)
        case None => m
      }
    case other => other
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
    keyCol: String, deleteWhenSql: Option[String])
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
    val partCol = snap.files.flatMap(_.split("/").filter(_.contains("="))
        .map(_.split("=", 2)(0))).distinct match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"MERGE INTO requires exactly one partition level at $dir, " +
          s"found: ${other.mkString(",")}")
    }
    val (stats, _, version) = VersionLog.mergeByKeyCdc(spark, dir, src,
      keyCol, partCol, deleteWhenSql.map(expr))
    Seq(Row(version, stats.outputRows, stats.touchedPartitions.size,
      stats.removedPartitions.size))
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
