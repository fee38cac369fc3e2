package graft.connector

import java.util

import graft.registry.Registry
import graft.workflow.EventBus
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark `TableCatalog` over the metadata registry — the catalog face
  * of the reference's register-then-resolve dataset pattern
  * (af.register_dataset, workflow.py:42-44; SURVEY.md §1.1 item 4):
  * a dataset registered with format `stream` resolves BY SQL NAME to
  * the DataSource V2 log table, so
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graftcat.workdir", workdir)
  *   spark.sql("SELECT * FROM graftcat.train_stream")       // bounded
  *   spark.readStream.table("graftcat.train_stream")        // streaming
  * }}}
  *
  * both plan through the same connector (BATCH_READ /
  * MICRO_BATCH_READ). DDL is metadata-only, exactly like the
  * reference's registry: CREATE TABLE registers a dataset (uri/format
  * from table properties), DROP TABLE unregisters it; neither touches
  * stream data. File-format datasets (csv/json/parquet/orc) resolve to
  * Spark's own FileTable implementations, so
  * `SELECT * FROM graftcat.my_csv` plans the standard file scan
  * (pushdown, pruning, and schema inference included) — every
  * registered dataset is SQL-addressable, stream or file.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var workdir: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    workdir = Option(options.get("workdir")).getOrElse(
      sys.error(s"catalog $name requires option 'workdir' " +
        s"(spark.sql.catalog.$name.workdir)"))
  }

  /** A fresh view of registry.json per operation: registrations made
    * by other Registry instances (e.g. a running workflow) are visible
    * to catalog READS immediately. DDL is still an unlocked
    * read-modify-write of the file — a registration landing between a
    * DDL op's load and its persist is lost (last-writer-wins), so DDL
    * assumes a single metadata writer at a time, exactly like the
    * file-backed Registry itself. Metadata-scale I/O — one small JSON
    * file per op. */
  private def registry: Registry = new Registry(workdir, new EventBus)

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    registry.listDatasets
      .map(d => Identifier.of(namespace, d.name)).toArray

  override def loadTable(ident: Identifier): Table =
    registry.getDataset(ident.name()) match {
      case Some(meta) if meta.format == "stream" =>
        new LogTable(s"$workdir/streams/${meta.uri}")
      case Some(meta) if GraftCatalog.FileFormats.contains(meta.format) =>
        // cached per (name, format, uri): CSV/JSON resolution infers
        // the schema by reading data files — uncached, EVERY query
        // would pay that planning-time scan again. A re-registered
        // dataset under a different uri/format misses the cache; same
        // uri with rewritten file contents follows Spark's own
        // relation-cache semantics (refresh by re-create).
        graft.SessionCaches.evictStopped(GraftCatalog.tableCache)(_._1)
        GraftCatalog.tableCache.computeIfAbsent(
          (org.apache.spark.sql.SparkSession.active,
            ident.name(), meta.format, meta.uri),
          _ => GraftCatalog.fileTable(ident.name(), meta.format, meta.uri))
      case Some(meta) =>
        throw new UnsupportedOperationException(
          s"dataset '${ident.name()}' has unresolvable format " +
            s"'${meta.format}' (supported: stream, " +
            s"${GraftCatalog.FileFormats.mkString(", ")})")
      case None => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // the log table's schema is fixed (value STRING) and unpartitioned;
    // a DDL declaring anything else must fail here, loudly — not on a
    // later SELECT of a column that never existed
    if (schema.nonEmpty && schema != LogSourceV2.schema)
      throw new UnsupportedOperationException(
        "graft stream tables have the fixed schema (value STRING); " +
          s"declared ${schema.simpleString} cannot be honored")
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft stream tables are unpartitioned")
    val reg = registry
    if (reg.getDataset(ident.name()).isDefined)
      throw new TableAlreadyExistsException(ident)
    val uri = Option(properties.get("uri")).getOrElse(
      sys.error("CREATE TABLE requires TBLPROPERTIES('uri'='scope/stream')"))
    val format = Option(properties.get("format")).getOrElse("stream")
    // validate BEFORE registering — a failed CREATE must not leave a
    // durable registry entry behind
    if (format != "stream")
      throw new UnsupportedOperationException(
        s"the catalog creates stream datasets; '$format' datasets are " +
          "registered via Registry.registerDataset and read with the " +
          "DataFrame API")
    reg.registerDataset(ident.name(), format, uri)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft datasets are immutable metadata; drop and re-create")

  override def dropTable(ident: Identifier): Boolean = {
    // invalidate cached file-table resolutions for the name: a
    // drop + re-register under the same uri must not serve the old
    // table's (possibly stale) file index
    GraftCatalog.tableCache.keySet.removeIf(_._2 == ident.name()): Unit
    registry.removeDataset(ident.name())
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val reg = registry
    if (reg.getDataset(oldIdent.name()).isEmpty)
      throw new NoSuchTableException(oldIdent)
    if (reg.getDataset(newIdent.name()).isDefined)
      throw new TableAlreadyExistsException(newIdent)
    // single load-modify-persist cycle: no failure point between the
    // add and the remove can leave both identifiers registered
    GraftCatalog.tableCache.keySet.removeIf(_._2 == oldIdent.name()): Unit
    reg.renameDataset(oldIdent.name(), newIdent.name()): Unit
  }
}

object GraftCatalog {
  /** Registry formats that resolve to Spark's own FileTable
    * implementations — the standard file scan with pushdown, column
    * pruning, and schema inference. */
  val FileFormats: Set[String] = Set("csv", "json", "parquet", "orc")

  // keyed by the resolving SparkSession as well as (name, format, uri):
  // FileTable instances are session-bound (file index, inferred
  // schema), so a table resolved under one session must not be served
  // to another — a stale session reference outlives clearCache and a
  // re-created session would silently read a stale file listing
  // (round-5 advice)
  private val tableCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, String, String), Table]

  private[connector] def fileTable(name: String, format: String,
      uri: String): Table = {
    import org.apache.spark.sql.execution.datasources.{FileFormat => DSFileFormat}
    val spark = org.apache.spark.sql.SparkSession.active
    def opts(kv: (String, String)*): CaseInsensitiveStringMap =
      new CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(kv.toMap).asJava)
    format match {
      case "csv" =>
        // header + inference: a registered CSV dataset reads like a
        // table, not a blob of _c0 strings (declared-schema reads keep
        // the DataFrame API, same as the reference's CsvSource node)
        org.apache.spark.sql.execution.datasources.v2.csv.CSVTable(
          name, spark, opts("header" -> "true", "inferSchema" -> "true"),
          Seq(uri), None,
          classOf[org.apache.spark.sql.execution.datasources.csv.CSVFileFormat]
            .asInstanceOf[Class[_ <: DSFileFormat]])
      case "json" =>
        org.apache.spark.sql.execution.datasources.v2.json.JsonTable(
          name, spark, opts(), Seq(uri), None,
          classOf[org.apache.spark.sql.execution.datasources.json.JsonFileFormat]
            .asInstanceOf[Class[_ <: DSFileFormat]])
      case "parquet" =>
        org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
          name, spark, opts(), Seq(uri), None,
          classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat]
            .asInstanceOf[Class[_ <: DSFileFormat]])
      case "orc" =>
        org.apache.spark.sql.execution.datasources.v2.orc.OrcTable(
          name, spark, opts(), Seq(uri), None,
          classOf[org.apache.spark.sql.execution.datasources.orc.OrcFileFormat]
            .asInstanceOf[Class[_ <: DSFileFormat]])
    }
  }
}
