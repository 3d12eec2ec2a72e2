package graft.sources.pinot

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Filesystem Pinot catalog: `pinot.default.<table>` in Spark SQL.
  *
  * Register with:
  * {{{
  * spark.sql.catalog.pinot = graft.sources.pinot.PinotCatalog
  * spark.sql.catalog.pinot.data_dir = /path/to/pinot/data
  * }}}
  *
  * Discovery walks `data_dir` for `<table>_OFFLINE` / `<table>_REALTIME`
  * directories, strips the suffix, dedupes and sorts — the reference's
  * FileSystemMetadataProvider (metadata_provider.rs:127-155). Table lookup
  * is case-insensitive (≙ catalog.rs:304-317; Spark lowercases unquoted
  * identifiers the same way DataFusion does). OFFLINE is preferred over
  * REALTIME when both exist (≙ metadata_provider.rs:280-319).
  */
class PinotCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var dataDir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dataDir = Option(options.get("data_dir")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option data_dir"))
  }

  override def name(): String = catalogName

  private val Default = Array("default")

  private def tableDirs: Seq[(String, String)] = { // (tableName, dirName)
    val root = Paths.get(dataDir)
    if (!Files.isDirectory(root)) return Seq.empty
    Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .flatMap { dir =>
        if (dir.endsWith("_OFFLINE")) Some(dir.stripSuffix("_OFFLINE") -> dir)
        else if (dir.endsWith("_REALTIME")) Some(dir.stripSuffix("_REALTIME") -> dir)
        else None
      }
      .toSeq
      // prefer OFFLINE over REALTIME for the same logical table
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.head).toSeq
      .sortBy(_._1)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireDefault(namespace)
    tableDirs.map { case (t, _) => Identifier.of(Default, t) }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireDefault(ident.namespace())
    // case-insensitive match against stored names
    tableDirs.find(_._1.equalsIgnoreCase(ident.name())) match {
      case Some((_, dir)) => PinotSegmentTable.open(s"$dataDir/$dir")
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Default) &&
      tableDirs.exists(_._1.equalsIgnoreCase(ident.name()))

  private def requireDefault(namespace: Array[String]): Unit =
    if (!namespace.sameElements(Default))
      throw new NoSuchNamespaceException(namespace)

  // --- read-only: writes are out of scope, matching the reference
  //     (README roadmap: write support not implemented) ---

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  // --- namespaces: exactly one, `default` (≙ catalog.rs:79-89) ---

  override def listNamespaces(): Array[Array[String]] = Array(Default)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(Default)
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireDefault(namespace)
    util.Collections.emptyMap()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Default)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("pinot catalog is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("pinot catalog is read-only")
}
