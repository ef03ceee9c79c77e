package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{TxnMeta, TxnTable}

/** V2 catalog plugin for graft-txn tables — query BY NAME, the missing
  * half of the reference's publish stage for the transactional format
  * (weather_etl.py:100-106 registers in a catalog; :144-146 queries by
  * name; [[graft.sinks.Publish]] does this for plain parquet tables,
  * this does it for the format a production user would register):
  *
  * {{{
  *   spark.sql.catalog.graft_cat           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft_cat.warehouse = /path/to/warehouse
  *
  *   spark.sql("CREATE TABLE graft_cat.db.t (id BIGINT, v BIGINT)")
  *   spark.sql("SELECT * FROM graft_cat.db.t")
  *   spark.sql("SELECT * FROM graft_cat.db.t VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft_cat.db.t TIMESTAMP AS OF '...'")
  * }}}
  *
  * LAYOUT IS IDENTITY: table `db.t` lives at `<warehouse>/db/t`, which
  * IS a txn-table root — no secondary mapping store to drift out of
  * sync; the same root reads identically through the path API
  * (`TxnTable.read`) and the name API. Namespaces are directories;
  * a table exists iff its root carries a `_txn` log.
  *
  * CREATE TABLE commits an empty v1 via [[TxnTable.createEmpty]] with
  * the declared schema; `PARTITIONED BY (bucket(N, col) | days(col))`
  * maps onto the format's hidden-partitioning transforms, and the
  * table properties `statsCols`/`bloomCols` (comma-separated) seed the
  * metadata column sets appends will inherit. SQL DML routes THROUGH
  * the txn writer, never around it: INSERT INTO/OVERWRITE →
  * append/overwrite (one atomic version per statement), DELETE FROM /
  * TRUNCATE → the bounded copy-on-write delete, CTAS → CREATE + first
  * append (see [[GraftTxnTableV2]]). `alterTable` supports the format's
  * write-path evolution rules plus metadata-only RENAME/DROP COLUMN
  * (column mapping) and refuses everything else.
  *
  * Two more operational surfaces ride the same name resolution:
  * MAINTENANCE PROCEDURES under the reserved `system` namespace
  * (`CALL graft_cat.system.compact('db.t', 4)` — see
  * [[GraftProcedures]]) and Iceberg-style METADATA TABLES as a
  * name suffix (`SELECT * FROM graft_cat.db.t.history` /
  * `db.t.files` / `db.t.refs` — see [[GraftMetaTableV2]]). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableRoot(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name())).mkString("/")

  private def nsPath(ns: Array[String]): Path =
    new Path((warehouse +: ns).mkString("/"))

  private def isTable(root: String): Boolean =
    fs.exists(new Path(s"$root/_txn"))

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable((warehouse +: (namespace :+ n)).mkString("/")))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tableRoot(ident))

  /** Resolve a procedure argument like `'db.t'` to the table's root
    * path (the same warehouse-relative layout rule as name lookup). */
  private[sources] def resolveTableRoot(table: String): String = {
    val parts = table.split("\\.").map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, s"empty table name '$table'")
    val root = (warehouse +: parts).mkString("/")
    if (!isTable(root))
      throw new NoSuchTableException(
        Identifier.of(parts.init.toArray, parts.last))
    root
  }

  /** `db.t.history` / `db.t.files` / `db.t.refs` / `db.t.partitions` —
    * the metadata tables
    * as a name suffix (Iceberg's convention). The suffix only resolves
    * when the PARENT path is a table, so a real table named `history`
    * always wins. */
  private def metaTable(ident: Identifier,
                        version: Option[Long]): Option[Table] = {
    val kind = ident.name.toLowerCase
    if (!GraftMetaTableV2.kinds.contains(kind) || ident.namespace.isEmpty)
      return None
    val parent = (warehouse +: ident.namespace).mkString("/")
    if (!isTable(parent)) return None
    if (version.isDefined && kind != "files" && kind != "partitions" &&
        kind != "properties")
      throw new UnsupportedOperationException(
        s"VERSION AS OF applies to the `files`/`partitions`/`properties` " +
          s"metadata tables only; `$kind` always shows the full log")
    Some(new GraftMetaTableV2(spark, parent, kind, version))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = tableRoot(ident)
    if (!isTable(root))
      return metaTable(ident, None).getOrElse(throw new NoSuchTableException(ident))
    // catalog-resolved tables are the streaming-write surface
    // (writeStream.toTable, queryId-keyed epochs — see GraftTxnSource)
    new GraftTxnTableV2(spark, root,
      TxnTable.latest(spark, root).getOrElse(throw new NoSuchTableException(ident)),
      byName = true)
  }

  /** `VERSION AS OF` — Spark routes the SQL clause here. Accepts a
    * numeric version, a TAG name, or a BRANCH name (Iceberg's
    * convention): `VERSION AS OF 'audited'` reads the tagged snapshot,
    * `VERSION AS OF 'experiment'` reads the branch HEAD (fork content
    * plus branch appends). Numbers win; an unknown name refuses loud. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = tableRoot(ident)
    if (!isTable(root)) {
      // a metadata-table suffix: a non-numeric ref (tag / branch name)
      // resolves against the PARENT table, same rule as the table
      // itself — `db.t.files VERSION AS OF 'audited'` shows the tagged
      // snapshot's files, never silently the latest; a bogus ref
      // refuses loud inside resolveRef.
      val v = scala.util.Try(version.toLong).toOption.orElse {
        val parent = (warehouse +: ident.namespace()).mkString("/")
        if (ident.namespace().nonEmpty && isTable(parent) &&
            GraftMetaTableV2.kinds.contains(ident.name.toLowerCase))
          Some(GraftTxnSource.resolveRef(spark, parent, version).version)
        else None
      }
      return metaTable(ident, v).getOrElse(throw new NoSuchTableException(ident))
    }
    new GraftTxnTableV2(spark, root,
      GraftTxnSource.resolveRef(spark, root, version))
  }

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = tableRoot(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val ms = timestamp / 1000L
    val v = TxnTable.versionAt(spark, root, ms).getOrElse(
      throw new NoSuchTableException(ident))
    new GraftTxnTableV2(spark, root, TxnTable.snapshot(spark, root, v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val root = tableRoot(ident)
    if (isTable(root))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    // matched through the public connector API (name/arguments/
    // references) — the concrete Transform case classes are private[sql]
    val transforms = partitions.toSeq.map {
      case t if t.name == "bucket" && t.references.length == 1 =>
        val n = t.arguments.collectFirst {
          case l: V2Literal[_] => l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform without a bucket count: $t"))
        TxnTable.Transform.bucket(n, t.references.head.fieldNames.mkString("."))
      case t if t.name == "days" && t.references.length == 1 =>
        TxnTable.Transform.day(t.references.head.fieldNames.mkString("."))
      case other => throw new UnsupportedOperationException(
        s"graft-txn partitioning supports bucket(n, col) and days(col); got $other")
    }
    def csv(key: String): Seq[String] =
      Option(properties.get(key)).toSeq.flatMap(_.split(",")).map(_.trim)
        .filter(_.nonEmpty)
    TxnTable.createEmpty(spark, root, schema,
      statsCols = csv("statsCols"), bloomCols = csv("bloomCols"),
      transforms = transforms)
    loadTable(ident)
  }

  /** ALTER TABLE — the DDL face of the format's write-path evolution
    * rules ([[TxnTable.alterTable]]): `ADD COLUMNS` (trailing,
    * nullable), `ALTER COLUMN ... TYPE` (lossless widening only),
    * `RENAME COLUMN` / `DROP COLUMN` (metadata-only via the column
    * mapping — frozen physical names, reader-stripped tombstones,
    * [[graft.sinks.ColumnMapping]]), and `SET/UNSET TBLPROPERTIES
    * ('statsCols'/'bloomCols')` (what future appends record).
    * Everything else — reorder, nullability tightening, other
    * properties — refuses loud. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = tableRoot(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val cur = TxnTable.latest(spark, root).getOrElse(throw new NoSuchTableException(ident))
    // work on the LOGICAL view of the recorded schema: adds/widens apply
    // to it and go back through TxnTable.alterTable's newSchema (which
    // grafts them onto the storage schema); renames/drops are passed as
    // OPERATIONS so the mapping machinery (frozen physical names,
    // tombstones — [[graft.sinks.ColumnMapping]]) records them
    var schema = graft.sinks.ColumnMapping.logicalView(
      cur.schema.getOrElse(throw new IllegalStateException(
        s"table at $root has no recorded schema to alter — append once first")))
    var statsCols: Option[Seq[String]] = None
    var bloomCols: Option[Seq[String]] = None
    var sidecarOnly = false
    val renames = Seq.newBuilder[(String, String)]
    val drops = Seq.newBuilder[String]
    def csv(v: String): Seq[String] =
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"graft-txn ALTER TABLE adds top-level columns only, got " +
            add.fieldNames.mkString("."))
        require(add.isNullable,
          s"added column '${add.fieldNames.head}' must be nullable: " +
            "existing files have no values for it")
        require(add.position == null,
          "graft-txn ALTER TABLE appends columns at the end (parquet " +
            "resolves by name; position is cosmetic and not recorded)")
        schema = schema.add(add.fieldNames.head, add.dataType, nullable = true)
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames.length == 1,
          s"graft-txn ALTER TABLE widens top-level columns only, got " +
            upd.fieldNames.mkString("."))
        val name = upd.fieldNames.head
        require(schema.fieldNames.contains(name), s"no such column '$name'")
        schema = StructType(schema.fields.map(f =>
          if (f.name == name) f.copy(dataType = upd.newDataType) else f))
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"graft-txn ALTER TABLE renames top-level columns only, got " +
            ren.fieldNames.mkString("."))
        val from = ren.fieldNames.head
        require(schema.fieldNames.contains(from), s"no such column '$from'")
        renames += (from -> ren.newName)
        schema = StructType(schema.fields.map(f =>
          if (f.name == from) f.copy(name = ren.newName) else f))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"graft-txn ALTER TABLE drops top-level columns only, got " +
            del.fieldNames.mkString("."))
        val name = del.fieldNames.head
        if (schema.fieldNames.contains(name)) {
          drops += name
          schema = StructType(schema.fields.filterNot(_.name == name))
        } else require(del.ifExists(), s"no such column '$name'")
      case set: TableChange.SetProperty if set.property == "statsCols" =>
        statsCols = Some(csv(set.value))
      case set: TableChange.SetProperty if set.property == "bloomCols" =>
        bloomCols = Some(csv(set.value))
      case set: TableChange.SetProperty
          if set.property == TxnTable.RowLevelModeKey ||
            set.property == TxnTable.RowLevelIsolationKey ||
            set.property.startsWith(TxnTable.ConstraintKeyPrefix) =>
        // operational sidecar properties (un-versioned by design — see
        // [[TxnTable.setTableProperty]]); no manifest commit. ADD
        // CONSTRAINT spells as SET TBLPROPERTIES('constraint.<name>' =
        // '<boolean expr>') and validates the current content.
        TxnTable.setTableProperty(spark, root, set.property, set.value)
        sidecarOnly = true
      case rm: TableChange.RemoveProperty
          if rm.property == TxnTable.RowLevelModeKey ||
            rm.property == TxnTable.RowLevelIsolationKey ||
            rm.property.startsWith(TxnTable.ConstraintKeyPrefix) =>
        TxnTable.unsetTableProperty(spark, root, rm.property)
        sidecarOnly = true
      case rm: TableChange.RemoveProperty if rm.property == "statsCols" =>
        statsCols = Some(Nil)
      case rm: TableChange.RemoveProperty if rm.property == "bloomCols" =>
        bloomCols = Some(Nil)
      case other => throw new UnsupportedOperationException(
        s"graft-txn ALTER TABLE supports ADD COLUMNS (trailing, nullable), " +
          s"ALTER COLUMN TYPE (lossless widening), RENAME COLUMN, " +
          s"DROP COLUMN, and the 'statsCols'/'bloomCols'/" +
          s"'${TxnTable.RowLevelModeKey}'/" +
          s"'${TxnTable.RowLevelIsolationKey}'/" +
          s"'${TxnTable.ConstraintKeyPrefix}<name>' properties; got $other")
    }
    val rens = renames.result(); val drps = drops.result()
    val manifestChange = statsCols.isDefined || bloomCols.isDefined ||
      rens.nonEmpty || drps.nonEmpty ||
      schema != graft.sinks.ColumnMapping.logicalView(cur.schema.get)
    if (manifestChange || !sidecarOnly)
      TxnTable.alterTable(spark, root,
        newSchema = Some(schema),
        newStatsCols = statsCols, newBloomCols = bloomCols,
        renames = rens, drops = drps)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = tableRoot(ident)
    isTable(root) && fs.delete(new Path(root), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableRoot(oldIdent)
    val to = tableRoot(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    if (!fs.rename(new Path(from), new Path(to)))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ---- procedures (the reserved `system` namespace) --------------------

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    def missing: Nothing = throw new UnsupportedOperationException(
      s"no such procedure $catalogName.${ident.namespace().mkString(".")}." +
        s"${ident.name} - maintenance procedures live under the `system` " +
        s"namespace: ${GraftProcedures.names.mkString(", ")}")
    if (!(ident.namespace().length == 1 &&
        ident.namespace()(0).equalsIgnoreCase("system"))) missing
    GraftProcedures.byName(this).getOrElse(ident.name.toLowerCase, missing)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty ||
        (namespace.length == 1 && namespace(0).equalsIgnoreCase("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // ---- namespaces (directories under the warehouse) -------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(st => st.isDirectory &&
        !isTable(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    // `system` is the (virtual) procedure namespace — SHOW PROCEDURES
    // and CALL resolution may probe it before loadProcedure
    (namespace.length == 1 && namespace(0).equalsIgnoreCase("system")) ||
      fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-txn namespaces are directories; nothing to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) false
    else {
      if (!cascade && fs.listStatus(dir).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(namespace)
      fs.delete(dir, true)
    }
  }
}

/** Metadata tables by NAME — `graft_cat.db.t.history` / `.files` /
  * `.refs` / `.partitions`, the SQL face of [[graft.sinks.TxnMeta]] (Iceberg's
  * metadata-table convention: the suffix resolves only when the parent
  * path is a table). `files` additionally honors `VERSION AS OF` —
  * "which files, what ranges" for any retained snapshot.
  *
  * Served as a [[org.apache.spark.sql.connector.read.LocalScan]]:
  * TxnMeta rows ARE driver-materialized manifest state (one row per
  * commit / per file×column — megabytes while the data is terabytes),
  * so shipping them through an executor scan would add a round trip to
  * planning-scale data, not remove one. */
private[sources] class GraftMetaTableV2(spark: SparkSession, root: String,
                                        kind: String, version: Option[Long])
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  private lazy val df = kind match {
    case "history"    => TxnMeta.history(spark, root)
    case "files"      => TxnMeta.files(spark, root, version)
    case "refs"       => TxnMeta.refs(spark, root)
    case "partitions" => TxnMeta.partitions(spark, root, version)
    case "properties" => TxnMeta.properties(spark, root, version)
    case "property_history" => TxnMeta.propertyHistory(spark, root)
  }

  override def name(): String =
    s"graft-txn:$root#$kind${version.fold("")(v => s"@v$v")}"

  override def schema(): StructType = df.schema

  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = df.schema
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        df.queryExecution.executedPlan.executeCollect()
    }
}

private[sources] object GraftMetaTableV2 {
  val kinds: Set[String] =
    Set("history", "files", "refs", "partitions",
      "properties", "property_history")
}
