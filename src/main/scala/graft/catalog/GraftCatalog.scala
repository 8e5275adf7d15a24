package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{IdentityTransform, NamedReference, Transform}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.VersionLog

/** `spark.sql.catalog.graft = graft.catalog.GraftCatalog` — the
  * versioned table as a CATALOG table, so the whole lakehouse layer
  * is plain SQL:
  *
  * {{{
  * SELECT * FROM graft.db.t                      -- latest snapshot
  * SELECT * FROM graft.db.t VERSION AS OF 2      -- time travel
  * INSERT INTO graft.db.t SELECT ...             -- append commit
  * INSERT OVERWRITE graft.db.t SELECT ...        -- overwrite commit
  * CREATE TABLE graft.db.t (...) PARTITIONED BY (p)
  * CREATE TABLE graft.db.t AS SELECT ...         -- init commit
  * MERGE INTO graft.db.t USING s ON ...          -- CDC merge commit
  * DESCRIBE HISTORY graft.db.t                   -- the commit log
  * }}}
  *
  * Layout: an identifier maps to a directory —
  * `warehouse/<ns...>/<name>` under the configured
  * `spark.sql.catalog.graft.warehouse`, or, Delta-style, the literal
  * path for `` graft.`/abs/path` `` identifiers (no warehouse
  * needed). A directory IS a table iff it has a version log or a
  * `_table.json` declaration (CREATE TABLE without data); every other
  * directory is a namespace. There is no metastore: like
  * path-addressed Delta tables, all catalog state lives next to the
  * data, so a 1000-executor cluster and a laptop resolve the same
  * table the same way.
  *
  * MERGE INTO and DESCRIBE HISTORY are routed by the companion parser
  * / rules in [[GraftCatalogRules]]; reads rewrite to the
  * [[graft.sources.GraftTableSource]] V1 relation (one shared
  * planner-pruning FileIndex for both front doors).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouseOpt: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseOpt = Option(options.get("warehouse")).map(_.stripSuffix("/"))
  }

  /** Warehouse root: the initialize-time option, else the session
    * conf at CALL time — the catalog manager caches plugin instances
    * per session, so a warehouse configured after the catalog's first
    * use (a path-identifier use needs none) must still take effect.
    */
  private def warehouse: Option[String] = warehouseOpt.orElse(
    Option(spark.conf.get(
      s"spark.sql.catalog.$catalogName.warehouse", null))
      .map(_.stripSuffix("/")))

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def fsFor(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Identifier -> directory. A name starting with `/` is a literal
    * path table (namespace must be empty); anything else resolves
    * under the warehouse.
    */
  def dirFor(ident: Identifier): String =
    if (ident.name.startsWith("/")) {
      require(ident.namespace.isEmpty,
        s"path table ${ident.name} cannot carry a namespace " +
          s"(${ident.namespace.mkString(".")})")
      ident.name.stripSuffix("/")
    } else {
      val w = warehouse.getOrElse(throw new IllegalArgumentException(
        s"catalog $catalogName has no warehouse configured; set " +
          s"spark.sql.catalog.$catalogName.warehouse or use a " +
          s"path identifier ($catalogName.`/abs/path`)"))
      (w +: (ident.namespace :+ ident.name)).mkString("/")
    }

  private def metaPath(dir: String): Path = new Path(dir, "_table.json")

  private def isTable(dir: String): Boolean = {
    val fs = fsFor(new Path(dir))
    VersionLog.listVersions(spark, dir).nonEmpty ||
      fs.exists(metaPath(dir))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirFor(ident))

  override def loadTable(ident: Identifier): Table =
    loadVersioned(ident, None)

  /** `VERSION AS OF n` — the analyzer's time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft versions are numeric commit ids, got '$version'")
    }
    loadVersioned(ident, Some(v))
  }

  /** `TIMESTAMP AS OF` — the analyzer hands micros since epoch; the
    * version log resolves it against the monotonic commit timestamps
    * ([[VersionLog.versionAtTimestamp]], the version-file-mtime
    * convention `DESCRIBE HISTORY` surfaces as `commit_ts`).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = VersionLog.versionAtTimestamp(spark, dir,
      Math.floorDiv(timestamp, 1000L))
    loadVersioned(ident, Some(v))
  }

  private def loadVersioned(ident: Identifier,
      versionAsOf: Option[Long]): GraftTable = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val (declSchema, declPart) = readMeta(dir)
    new GraftTable(spark, dir, ident.toString, versionAsOf,
      declSchema, declPart, readMetaProps(dir))
  }

  /** CREATE TABLE: persists the declared schema/partitioning as
    * `_table.json` so the empty table is loadable (and the first
    * INSERT INTO can bootstrap the version log). CTAS runs this, then
    * writes through the table's V1 write — the init commit.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = dirFor(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val partCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "identity" && t.references.length == 1 =>
        Some(t.references.head.fieldNames.mkString("."))
      case other => throw new UnsupportedOperationException(
        "graft tables support at most one identity PARTITIONED BY " +
          s"column, got: ${other.mkString(", ")}")
    }
    partCol.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in schema"))
    fsFor(metaPath(dir)).mkdirs(new Path(dir))
    // USER TBLPROPERTIES declared at CREATE persist in the meta file
    // and SEED the version log on the first insert — silently
    // dropping them would lose the table's own retention/checkpoint
    // policy. Spark-reserved entries are not user properties.
    val reserved =
      Set("provider", "location", "owner", "comment", "external")
    val userProps = properties.asScala.toSeq
      .filterNot { case (k, _) =>
        reserved(k) || k.startsWith("option.")
      }.sortBy(_._1)
    writeMeta(dir, schema, partCol, userProps, overwrite = false)
    new GraftTable(spark, dir, ident.toString, None, Some(schema),
      partCol, userProps)
  }

  /** The meta file's persisted USER properties (CREATE TABLE
    * TBLPROPERTIES, pre-first-commit) — Nil once absent.
    */
  private def readMetaProps(dir: String): Seq[(String, String)] = {
    val p = metaPath(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(bytes,
          java.nio.charset.StandardCharsets.UTF_8))
      Option(node.get("props")).toSeq.flatMap(
        _.fields().asScala.map(e => (e.getKey, e.getValue.asText))
          .toSeq)
    }
  }

  private def writeMeta(dir: String, schema: StructType,
      partCol: Option[String], props: Seq[(String, String)],
      overwrite: Boolean): Unit = {
    // control-char-safe escaping (shared with the version log): a
    // CREATE-time property value containing \n must not publish an
    // unparseable meta file
    def esc(x: String) = VersionLog.jsonEsc(x)
    val propsJson =
      if (props.isEmpty) ""
      else props.map { case (k, v) =>
        "\"" + esc(k) + "\":\"" + esc(v) + "\""
      }.mkString(""","props":{""", ",", "}")
    val p = metaPath(dir)
    val fs = fsFor(p)
    val json = s"""{"schema":${schema.json},""" +
      s""""partCol":${partCol.fold("null")(c => "\"" + esc(c) + "\"")}""" +
      propsJson + "}"
    val out = fs.create(p, overwrite)
    try out.write(json.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMeta(dir: String):
      (Option[StructType], Option[String]) = {
    val p = metaPath(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) (None, None)
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      val schema = DataType.fromJson(node.get("schema").toString)
        .asInstanceOf[StructType]
      val part = Option(node.get("partCol")).filterNot(_.isNull)
        .map(_.asText)
      (Some(schema), part)
    }
  }

  /** `ALTER TABLE ADD / RENAME / DROP COLUMN` — metadata-only
    * schema-evolution commits. ADD: existing rows read the new column
    * as NULL, later writes populate it. RENAME/DROP ride COLUMN
    * MAPPING ([[VersionLog.alterRenameColumnCommit]] /
    * [[VersionLog.alterDropColumnCommit]]): the logical name changes
    * or disappears while physical files keep theirs — no file is
    * touched, time travel reads each version's own names, and a
    * re-added dropped name gets a fresh physical identity so old
    * bytes never resurface. ALTER COLUMN TYPE commits metadata-only
    * WIDENING (integral up-chain, float -> double — Delta's
    * type-widening idea; the scan decodes narrow files into the wide
    * schema natively); narrowing/cross-family retype and reorder are
    * refused loudly (they would re-interpret existing files — a
    * rewriting INSERT OVERWRITE is the honest spelling). The
    * `_table.json` declaration (positional-INSERT binding order) is
    * kept in sync.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // SET/UNSET TBLPROPERTIES: one metadata-only commit for the whole
    // statement ([[VersionLog.setTablePropertiesCommit]]) — the
    // properties ride the SNAPSHOT, so they survive sessions and
    // every later commit inherits them
    val setProps = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value
    }
    val rmProps = changes.collect {
      case r: TableChange.RemoveProperty => r.property
    }
    if (setProps.nonEmpty || rmProps.nonEmpty) {
      require(VersionLog.listVersions(spark, dir).nonEmpty,
        s"TBLPROPERTIES need a version log at $dir (write to the " +
          "table first); an unversioned directory has nowhere " +
          "durable to keep them")
      VersionLog.setTablePropertiesCommit(spark, dir, setProps,
        rmProps)
    }
    // on a declared-but-never-written table (no version log) the
    // meta-file surgery is the ONLY door, so IT must validate the
    // dotted path — strict resolution below
    val hasLog = VersionLog.listVersions(spark, dir).nonEmpty
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty =>
        () // handled above, one commit for the statement
      case add: TableChange.AddColumn =>
        require(add.position == null,
          "graft ADD COLUMN appends at the end; FIRST/AFTER are not " +
            "supported (column order is declared order)")
        val name = add.fieldNames.mkString(".")
        if (hasLog)
          VersionLog.alterAddColumnCommit(spark, dir, name,
            add.dataType, add.isNullable)
        if (add.fieldNames.length == 1)
          appendDeclaredColumn(dir, add.fieldNames.head, add.dataType)
        else
          rewriteDeclaredSchema(dir, s =>
            VersionLog.addInSchema(s,
              resolveMetaPath(s, add.fieldNames, "ADD COLUMN",
                strict = !hasLog, lastMayBeNew = true),
              add.dataType))
      // RENAME/DROP/ALTER TYPE accept NESTED paths (`s.x`): the
      // version-log doors resolve each segment against the declared
      // schema and refuse paths through array/map element types; the
      // `_table.json` sync reuses the same schema surgery so the
      // positional-INSERT declaration tracks the commit exactly
      // (nested renames land at the END of their parent struct —
      // the read-side rebuild's order).
      case ren: TableChange.RenameColumn =>
        val path = ren.fieldNames.mkString(".")
        if (hasLog)
          VersionLog.alterRenameColumnCommit(spark, dir, path,
            ren.newName)
        rewriteDeclaredSchema(dir, s =>
          VersionLog.renameInSchema(s,
            resolveMetaPath(s, ren.fieldNames, "RENAME COLUMN",
              strict = !hasLog), ren.newName))
      case del: TableChange.DeleteColumn =>
        val path = del.fieldNames.mkString(".")
        if (hasLog)
          VersionLog.alterDropColumnCommit(spark, dir, path)
        rewriteDeclaredSchema(dir, s =>
          VersionLog.dropInSchema(s,
            resolveMetaPath(s, del.fieldNames, "DROP COLUMN",
              strict = !hasLog)))
      case upd: TableChange.UpdateColumnType =>
        val path = upd.fieldNames.mkString(".")
        if (hasLog)
          VersionLog.alterColumnTypeCommit(spark, dir, path,
            upd.newDataType)
        rewriteDeclaredSchema(dir, s =>
          VersionLog.retypeInSchema(s,
            resolveMetaPath(s, upd.fieldNames, "ALTER COLUMN TYPE",
              strict = !hasLog), upd.newDataType))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${other.getClass.getSimpleName} is not " +
          "supported on graft tables: reorder/narrowing would " +
          "re-interpret existing files — rewrite through " +
          "INSERT OVERWRITE instead")
    }
    loadTable(ident)
  }

  /** Rewrite `_table.json`'s declared schema in place (rename/drop
    * sync). Tables without a declaration (API-created) skip — the
    * snapshot's schema commit is authoritative there.
    */
  /** Resolve user-spelled path segments to the meta schema's exact
    * case (the shared surgery in [[VersionLog]] matches names
    * exactly). When a version log exists its DDL door has already
    * validated the path, so unknown segments pass through verbatim
    * (lenient). On a DECLARED-BUT-NEVER-WRITTEN table the meta file
    * is the only door — there, validate: an unknown segment or a
    * path through a non-struct refuses loudly instead of silently
    * no-oping the surgery (or hitting a raw ClassCastException in
    * the shared schema walk). ADD COLUMN's LAST segment is the new
    * field and may be unknown (`lastMayBeNew`).
    */
  private def resolveMetaPath(s: StructType,
      fieldNames: Array[String], what: String = "ALTER",
      strict: Boolean = false,
      lastMayBeNew: Boolean = false): String = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val resolver = spark.sessionState.conf.resolver
    var cur: Option[DataType] = Some(s)
    val path = fieldNames.mkString(".")
    fieldNames.zipWithIndex.map { case (seg, i) =>
      val last = i == fieldNames.length - 1
      cur match {
        // container MARKERS (the version-log doors' spelling):
        // `a.element.x`, `m.key.…`, `m.value.…`
        case Some(ArrayType(et, _)) if resolver(seg, "element") =>
          cur = Some(et); "element"
        case Some(MapType(kt, _, _)) if resolver(seg, "key") =>
          cur = Some(kt); "key"
        case Some(MapType(_, vt, _)) if resolver(seg, "value") =>
          cur = Some(vt); "value"
        case _ =>
          val f = cur.collect { case st: StructType => st }
            .flatMap(_.fields.find(x => resolver(x.name, seg)))
          if (strict && f.isEmpty && !(last && lastMayBeNew)) {
            val nonStruct = cur.exists(t =>
              !t.isInstanceOf[StructType] && !t.isInstanceOf[ArrayType]
                && !t.isInstanceOf[MapType])
            if (nonStruct) throw new IllegalArgumentException(
              s"$what $path: '${fieldNames.take(i).mkString(".")}' " +
                s"is ${cur.get.simpleString}, not a struct — it has " +
                "no fields to address")
            throw new IllegalArgumentException(
              s"$what: no column '$path' on this table (no field " +
                s"'$seg'" + (if (i == 0) "" else s" under '${fieldNames
                  .take(i).mkString(".")}'") + ")")
          }
          cur = f.map(_.dataType)
          f.map(_.name).getOrElse(seg)
      }
    }.mkString(".")
  }

  private def rewriteDeclaredSchema(dir: String,
      f: StructType => StructType): Unit = {
    val (schemaOpt, partCol) = readMeta(dir)
    schemaOpt.foreach { schema =>
      writeMeta(dir, f(schema), partCol, readMetaProps(dir),
        overwrite = true)
    }
  }

  /** Keep `_table.json` (the declared column order positional INSERT
    * binds against) in sync with an ADD COLUMN commit. A table with
    * no declaration (API-created) skips — the snapshot's schema
    * commit is authoritative there.
    */
  private def appendDeclaredColumn(dir: String, name: String,
      dataType: DataType): Unit = {
    val (schemaOpt, partCol) = readMeta(dir)
    schemaOpt.foreach { schema =>
      require(!schema.fieldNames.exists(
          spark.sessionState.conf.resolver(_, name)),
        s"column $name already declared on $dir")
      val widened = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(name, dataType))
      writeMeta(dir, widened, partCol, readMetaProps(dir),
        overwrite = true)
    }
  }

  /** DROP TABLE: removes the table directory AND its dot-named
    * sidecar siblings (`<dir>._cdc`, `<dir>._dv` …).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!isTable(dir)) return false
    val p = new Path(dir)
    val fs = fsFor(p)
    sidecarsOf(fs, p).foreach(s => fs.delete(s, true))
    fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = new Path(dirFor(oldIdent))
    val to = new Path(dirFor(newIdent))
    val fs = fsFor(from)
    if (!isTable(from.toString)) throw new NoSuchTableException(oldIdent)
    if (isTable(to.toString)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    sidecarsOf(fs, from).foreach { s =>
      val suffix = s.getName.stripPrefix(from.getName)
      require(fs.rename(s, new Path(to.getParent, to.getName + suffix)),
        s"could not move sidecar $s")
    }
    require(fs.rename(from, to), s"could not rename $from to $to")
  }

  private def sidecarsOf(fs: FileSystem, table: Path): Seq[Path] = {
    val parent = table.getParent
    if (parent == null || !fs.exists(parent)) return Nil
    fs.listStatus(parent).map(_.getPath)
      .filter(p => p.getName.startsWith(table.getName + "._")).toSeq
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = nsPath(namespace)
    val fs = fsFor(root)
    if (!fs.exists(root)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => isTable(p.toUri.getPath))
      .map(p => Identifier.of(namespace, p.getName))
  }

  // ---- namespaces = directories without a table marker -------------

  private def nsPath(namespace: Array[String]): Path = {
    val w = warehouse.getOrElse(throw new IllegalArgumentException(
      s"catalog $catalogName has no warehouse configured"))
    new Path((w +: namespace.toSeq).mkString("/"))
  }

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  /** A table's sidecar directory (`t._cdc`, `t._dv`, `t._manifest`…):
    * a sibling whose name embeds `._` — internal state, never a
    * namespace. (`.`-prefixed names are already hidden; sidecars
    * contain but do not start with the dot.)
    */
  private def isSidecarName(name: String): Boolean = name.contains("._")

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    val root = nsPath(namespace)
    val fs = fsFor(root)
    if (!fs.exists(root)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filterNot(p => isTable(p.toUri.getPath))
      .filterNot(_.getName.startsWith("."))
      .filterNot(p => isSidecarName(p.getName))
      .map(p => namespace :+ p.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    fsFor(p).exists(p) && !isTable(p.toUri.getPath) &&
      !isSidecarName(p.getName)
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    fsFor(p).mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val fs = fsFor(p)
    if (!fs.exists(p)) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(p, true)
  }
}
