package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertStarAction, MergeIntoTable, UpdateStarAction}
import org.apache.spark.sql.functions.expr

/** SQL-text front door for the maintenance family: `MERGE INTO`
  * statements executed through [[MergeInto.mergeByKeyCdc]], so the
  * lakehouse layer is reachable from the same SQL surface as the
  * query engine (the q118 pattern, applied to mutation).
  *
  * Spark's own parser produces the `MergeIntoTable` logical plan —
  * this module INTERPRETS it rather than re-parsing text, so the
  * grammar (clause order, AND-conditions, aliases) is exactly
  * Spark's. The supported shape is the one the engine's merge
  * implements, refused loudly otherwise:
  *
  * {{{
  * MERGE INTO <target> USING <source> ON <target>.<k> = <source>.<k>
  *   [WHEN MATCHED AND <cond> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]
  * }}}
  *
  * The BY SOURCE clause (Delta's full-sync mirror) deletes target
  * rows whose key is absent from the source; its condition evaluates
  * over the TARGET row.
  *
  * `<target>` resolves to a partitioned parquet directory via the
  * caller's mapping (a path-based layout has no catalog); `<source>`
  * is any registered view; the partition column is discovered from
  * the target's `part=value` layout. The DELETE condition may
  * reference source columns (qualified or not) — qualifiers are
  * stripped and the predicate evaluates over the source frame,
  * mirroring `WHEN MATCHED AND <tombstone>`.
  */
object MergeSql {

  /** Parse and execute a MERGE statement. `tableDirs` maps the target
    * table name (last identifier part) to its dataset directory.
    * Returns the same (stats, feed) as [[MergeInto.mergeByKeyCdc]].
    */
  def mergeSql(spark: SparkSession, sql: String,
      tableDirs: Map[String, String],
      maxTouchedPartitions: Int = 4096): (MergeStats, DataFrame) = {
    val m = spark.sessionState.sqlParser.parsePlan(sql) match {
      case mi: MergeIntoTable => mi
      case other => throw new IllegalArgumentException(
        s"not a MERGE statement: ${other.getClass.getSimpleName}")
    }
    // schema evolution needs the version log's metadata-only schema
    // commits — the in-place door this front end drives has none
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is supported on versioned graft " +
        "tables only (the catalog door)")
    val targetName = m.targetTable match {
      case u: UnresolvedRelation => u.multipartIdentifier.last
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE target: $other")
    }
    val dir = tableDirs.getOrElse(targetName,
      throw new IllegalArgumentException(
        s"no directory mapping for MERGE target '$targetName'"))
    val source: DataFrame = m.sourceTable match {
      case u: UnresolvedRelation =>
        spark.table(u.multipartIdentifier.mkString("."))
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE source: $other")
    }
    val (keyCol, deleteWhenSql, bySourceDel, bySourceUpd) =
      interpretShape(m)
    val partCol = discoverPartCol(spark, dir)
    // tombstone marker columns live only on the source; project the
    // target's schema plus whatever the delete predicate needs —
    // mergeByKeyCdc ignores extra columns via its own projections
    MergeInto.mergeByKeyCdc(spark, dir, source, keyCol, partCol,
      deleteWhenSql.map(expr), maxTouchedPartitions,
      bySourceDelete = bySourceDel.map(expr),
      bySourceUpdate = bySourceUpd.map { case (c, sets) =>
        (expr(c), sets.map { case (k, v) => (k, expr(v)) })
      })
  }

  /** Interpret the engine-supported MERGE shape out of Spark's raw
    * parse tree: the single key column from the ON condition, the
    * optional tombstone predicate (qualifier-stripped SQL, evaluating
    * over the bare source frame), the optional NOT MATCHED BY SOURCE
    * delete predicate (over the bare TARGET frame; `"true"` for the
    * unconditional clause), and the optional NOT MATCHED BY SOURCE
    * UPDATE form (cond + assignments over the target row — Delta's
    * "flag stale rows" variant). Refuses anything the merge does not
    * implement — shared by the view-mapped [[mergeSql]] front door
    * and the catalog's [[graft.catalog.GraftCatalogMergeCommand]].
    */
  private[graft] def interpretShape(m: MergeIntoTable):
      (String, Option[String], Option[String],
        Option[(String, Seq[(String, String)])]) = {
    val keyCol = m.mergeCondition match {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE ON must be target.<k> = source.<k> on one key column, " +
          s"got: ${other.sql}")
    }
    // the DELETE condition evaluates over the bare SOURCE frame:
    // strip only the source's alias/table qualifier, leaving other
    // multi-part references (struct fields) intact
    val srcQuals = m.sourceTable match {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
          id, u: UnresolvedRelation) =>
        Seq(id.name, u.multipartIdentifier.last)
      case u: UnresolvedRelation => Seq(u.multipartIdentifier.last)
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
          id, _) => Seq(id.name)
      case _ => Nil
    }
    // WHEN MATCHED clauses: at most one conditional DELETE plus the
    // unconditional UPDATE SET * (standard first-match-wins order)
    val deleteWhenSql = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => None
      case Seq(DeleteAction(Some(cond)), UpdateStarAction(None)) =>
        Some(stripQualifiers(cond, srcQuals).sql)
      case other => throw new IllegalArgumentException(
        "supported WHEN MATCHED forms: [AND <cond> THEN DELETE,] " +
          s"THEN UPDATE SET * — got: $other")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case other => throw new IllegalArgumentException(
        s"WHEN NOT MATCHED must be THEN INSERT *, got: $other")
    }
    // the BY SOURCE condition evaluates over the bare TARGET frame:
    // strip the target's alias/table qualifier only
    val tgtQuals = m.targetTable match {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
          id, u: UnresolvedRelation) =>
        Seq(id.name, u.multipartIdentifier.last)
      case u: UnresolvedRelation => Seq(u.multipartIdentifier.last)
      case _ => Nil
    }
    def interpretSets(
        assignments: Seq[org.apache.spark.sql.catalyst.plans.logical
          .Assignment]): Seq[(String, String)] =
      assignments.map { a =>
        val key = stripQualifiers(a.key, tgtQuals) match {
          case u: UnresolvedAttribute if u.nameParts.length == 1 =>
            u.nameParts.head
          case other => throw new IllegalArgumentException(
            "NOT MATCHED BY SOURCE UPDATE SET target must be a " +
              s"top-level column, got: ${other.sql}")
        }
        (key, stripQualifiers(a.value, tgtQuals).sql)
      }
    val (bySourceDel, bySourceUpd) = m.notMatchedBySourceActions match {
      case Seq() => (None, None)
      case Seq(DeleteAction(None)) => (Some("true"), None)
      case Seq(DeleteAction(Some(cond))) =>
        (Some(stripQualifiers(cond, tgtQuals).sql), None)
      case Seq(org.apache.spark.sql.catalyst.plans.logical
          .UpdateAction(cond, assignments, _)) =>
        (None, Some((
          cond.map(c => stripQualifiers(c, tgtQuals).sql)
            .getOrElse("true"),
          interpretSets(assignments))))
      case other => throw new IllegalArgumentException(
        "WHEN NOT MATCHED BY SOURCE supports [AND <cond>] THEN " +
          s"DELETE or [AND <cond>] THEN UPDATE SET …, got: $other")
    }
    (keyCol, deleteWhenSql, bySourceDel, bySourceUpd)
  }

  /** The partition column of a hive-layout dataset, from its
    * first-level `part=value` directory names.
    */
  private[io] def discoverPartCol(spark: SparkSession,
      dir: String): String = {
    val p = new Path(dir.stripSuffix("/"))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName.split("=", 2)(0)).distinct
    require(names.length == 1,
      s"$dir must have exactly one part=value level, found: " +
        names.mkString(","))
    names.head
  }

  /** Strip the LEADING source alias/table qualifier — and only that —
    * so the predicate evaluates over the bare source frame
    * (`updates._del` -> `_del`, `updates.meta.flag` -> `meta.flag`).
    * Other multi-part references stay intact (struct-field accesses
    * must not collapse to their leaf name). Case-insensitive match,
    * like Spark's default resolver.
    */
  private def stripQualifiers(e: Expression,
      quals: Seq[String]): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 &&
        quals.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
      UnresolvedAttribute(a.nameParts.tail)
  }
}
