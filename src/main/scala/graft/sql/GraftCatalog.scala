package graft.sql

import java.util

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** DSv2 `TableCatalog` over a warehouse directory of versioned tables —
  * the SQL-text entry point (VERDICT r12 #2): register with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.wh", "graft.sql.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.wh.root", "/path/to/warehouse")
  * }}}
  *
  * and `SELECT … FROM wh.t [VERSION AS OF n | TIMESTAMP AS OF ts]`,
  * `INSERT INTO / INSERT OVERWRITE`, `CREATE TABLE`, `CTAS`, `DROP`,
  * plus — with [[GraftSparkExtensions]] on the session — `MERGE INTO`,
  * `UPDATE` and `DELETE` route to the versioned-table verbs. Reference
  * shape: the reference's canonical Gold incremental is SQL text
  * (`MERGE INTO` in /root/reference notebooks, Gincr cell 10) against a
  * Delta session catalog; this is the same surface over this engine's
  * protocol. Tables are the warehouse layout's own directories — one
  * namespace level, `wh.<table>` — so the catalog adds zero metadata of
  * its own: the commit log IS the catalog state (listing is one
  * directory scan; schema/time travel come from the lists). */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"graft catalog `$name` needs spark.sql.catalog.$name.root=<warehouse dir>")
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String = {
    require(ident.namespace().isEmpty,
      s"graft catalog `$catalogName` is single-level: use $catalogName.<table>, " +
        s"got namespace ${ident.namespace().mkString(".")}")
    s"$root/${ident.name()}"
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty,
      s"graft catalog `$catalogName` is single-level, got ${namespace.mkString(".")}")
    val f = new java.io.File(root)
    Option(f.list()).getOrElse(Array.empty[String]).sorted
      .filter(n => VersionedTable.isVersioned(s"$root/$n"))
      .map(n => Identifier.of(Array.empty[String], n))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && VersionedTable.isVersioned(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!VersionedTable.isVersioned(dir))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftTable(s"$catalogName.${ident.name()}", dir, None)
  }

  /** `VERSION AS OF <v>` — the SQL time-travel surface. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"VERSION AS OF wants a commit number, got `$version`"))
    require(VersionedTable.isReadableVersion(dir, v), // one stat; the
      // failure path lists to name what IS readable
      s"version $v is not readable at $dir " +
        s"(have ${VersionedTable.versions(dir).mkString(", ")})")
    new GraftTable(s"$catalogName.${ident.name()}@v$v", dir, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — micros since epoch from the parser;
    * resolved to a version by the protocol's own commit clocks. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    val v = VersionedTable.timestampAsOf(dir, timestamp / 1000L)
    new GraftTable(s"$catalogName.${ident.name()}@v$v", dir, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    require(!VersionedTable.isVersioned(dir),
      s"table ${ident.name()} already exists in `$catalogName`")
    val partCols = partitions.toSeq.map {
      case t if t.name() == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got $other")
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val empty = spark.createDataFrame(
      new util.ArrayList[org.apache.spark.sql.Row](), schema)
    VersionedTable.overwrite(spark, dir, empty, partitionBy = partCols)
    new GraftTable(s"$catalogName.${ident.name()}", dir, None)
  }

  /** ALTER TABLE → the metadata-only schema verbs: RENAME COLUMN /
    * DROP COLUMN ride the column-mapping headers (zero files touched),
    * ADD COLUMNS re-stamps the schema with nullable appends. Everything
    * else refuses loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    require(VersionedTable.isVersioned(dir),
      s"no table ${ident.name()} in `$catalogName`")
    val spark = org.apache.spark.sql.SparkSession.active
    def topLevel(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"$what supports top-level columns only, got ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        VersionedTable.renameColumn(spark, dir,
          topLevel(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case d: TableChange.DeleteColumn =>
        VersionedTable.dropColumn(spark, dir,
          topLevel(d.fieldNames(), "DROP COLUMN"))
      case a: TableChange.AddColumn =>
        require(a.isNullable,
          "graft ADD COLUMNS are nullable (existing rows serve NULL)")
        VersionedTable.addColumns(spark, dir, Seq(
          org.apache.spark.sql.types.StructField(
            topLevel(a.fieldNames(), "ADD COLUMNS"), a.dataType(),
            nullable = true)))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported on graft tables")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new java.io.File(dirOf(ident))
    if (!VersionedTable.isVersioned(dir.getPath)) false
    else { deepDelete(dir); true }
  }

  private def deepDelete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deepDelete)); f.delete(); ()
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = new java.io.File(dirOf(oldIdent))
    val to = new java.io.File(dirOf(newIdent))
    require(VersionedTable.isVersioned(from.getPath),
      s"no table ${oldIdent.name()} in `$catalogName`")
    require(!to.exists(), s"table ${newIdent.name()} already exists")
    require(from.renameTo(to), s"could not rename $from to $to")
  }

  // -- namespaces: exactly one, the root ----------------------------
  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (namespace.isEmpty) new util.HashMap[String, String]()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalogs are single-level")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalogs are single-level")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalogs are single-level")
}
