package graft.sources

import graft.storage.Lakehouse
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin that makes lakehouse tables first-class SQL objects:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.root", "/data/lake")
  * spark.sql("CREATE TABLE graft.mart.fact (k BIGINT, amt DECIMAL(18,2))")
  * spark.sql("INSERT INTO graft.mart.fact SELECT ...")
  * spark.sql("SELECT count(*) FROM graft.mart.fact")   // metadata-only
  * }}}
  *
  * Layout: `<root>/<namespace>/<table>/` is a normal lakehouse table
  * dir; the contract schema persists as a `_GRAFT_SCHEMA` file (Catalyst
  * StructType JSON, written atomically via temp+rename) so SQL readers
  * need no registry. Reads go through [[LakehouseScanBuilder]] — every
  * V2 planning feature (column pruning, zone-map file skipping,
  * metadata aggregates, statistics, runtime filters) applies to SQL
  * queries unchanged. Writes go through the COMMIT PROTOCOL via
  * [[V1Write]]: Spark resolves and coerces the insert against the table
  * schema, then the whole frame lands as one crash-safe commit —
  * `INSERT INTO` = delta append (CAS-claimed, rebase-safe under racing
  * maintenance), `INSERT OVERWRITE` = full snapshot. The V1 bridge is a
  * deliberate trade: it reuses Spark's vectorized parquet writer and
  * the battle-tested Lakehouse commit path (conflict detection, zone
  * maps, exactly-once machinery) instead of a hand-rolled executor-side
  * row writer — the write is still fully distributed; only the COMMIT
  * decision is driver-side, as in every lakehouse.
  *
  * CTAS works (create-then-insert; non-atomic without a staging catalog,
  * Spark's documented default). Partition transforms and ALTER are
  * rejected loudly — partitioned layouts come from the Lakehouse API's
  * writers today.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"spark.sql.catalog.$name.root must point at the lakehouse root")
  }

  override def name(): String = catalogName

  private def check(part: String): String = {
    require(part.nonEmpty && part.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_') && !part.startsWith("_"),
      s"catalog object names are [A-Za-z0-9-_]+ (no leading _): '$part'")
    part
  }

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(new Path(root))((p, n) => new Path(p, check(n)))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), check(ident.name))

  // ——— namespaces = directories ———

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(new Path(root))) Array.empty
    else fs.listStatus(new Path(root)).collect {
      case st if st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !fs.exists(new Path(st.getPath, GraftCatalog.SchemaFile)) =>
        Array(st.getPath.getName)
    }

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Array.empty // one level deep
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && fs.exists(nsPath(ns)))

  override def loadNamespaceMetadata(
      ns: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(ns: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    require(ns.length == 1, "graft namespaces are one level deep")
    fs.mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    val p = nsPath(ns)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is " +
        "not empty — use CASCADE")
    fs.delete(p, true)
  }

  // ——— tables ———

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val p = nsPath(ns)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).collect {
      case st if st.isDirectory &&
        fs.exists(new Path(st.getPath, GraftCatalog.SchemaFile)) =>
        Identifier.of(ns, st.getPath.getName)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(new Path(tablePath(ident), GraftCatalog.SchemaFile))

  override def loadTable(ident: Identifier): Table = {
    val dir = tablePath(ident)
    val schemaFile = new Path(dir, GraftCatalog.SchemaFile)
    if (!fs.exists(schemaFile)) throw new NoSuchTableException(ident)
    val schema = GraftCatalog.readSchema(fs, schemaFile)
    new GraftTable(dir.toString, ident.name, schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned (partitioned layouts come " +
        "from the Lakehouse API writers)")
    LakehouseStream.validateSchema(schema)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    GraftCatalog.writeSchema(fs, new Path(dir, GraftCatalog.SchemaFile),
      schema)
    new GraftTable(dir.toString, ident.name, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE (schema evolution goes through the widened-append path)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!tableExists(ident)) false
    else fs.delete(dir, true)
  }

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE")
}

private[graft] object GraftCatalog {
  val SchemaFile = "_GRAFT_SCHEMA"

  /** Atomic schema persist: temp + rename, so a reader never sees a
    * half-written contract.
    */
  def writeSchema(fs: FileSystem, dest: Path, schema: StructType): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      require(fs.exists(dest), s"schema persist lost the rename race " +
        s"and no winner exists: $dest")
    }
  }

  def readSchema(fs: FileSystem, src: Path): StructType = {
    val in = fs.open(src)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(new String(bytes, "UTF-8"))
      .asInstanceOf[StructType]
  }
}

/** A catalog table: the V2 read path plus commit-protocol writes. */
private[sources] class GraftTable(path: String, tableName: String,
    tschema: StructType)
    extends LakehouseBatchTable(path, tschema) with SupportsWrite {

  override def name(): String = s"graft.$tableName"

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, over: Boolean) => {
            // Spark has already resolved + coerced `data` to the table
            // schema; the commit is the lakehouse's own crash-safe path
            val dir = new Path(path)
            val lake = new Lakehouse(SparkSession.active,
              dir.getParent.toString)
            val t = dir.getName
            if (overwrite || over) lake.overwrite(t, data)
            else lake.append(t, data)
          }
      }
    }
}
