package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.engine.TableCommit

/** X292: the SQL CATALOG facet — graft tables through PURE Spark SQL:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   spark.sql("CREATE TABLE graft.events (k BIGINT, v STRING)")
  *   spark.sql("INSERT INTO graft.events SELECT ...")
  *   spark.sql("DELETE FROM graft.events WHERE k % 5 = 0")  // DV delete
  *   spark.sql("SELECT v, COUNT(*) FROM graft.events GROUP BY v")
  * }}}
  *
  * The catalog is a thin identity layer over the commit log: a table
  * is `warehouse/<ns…>/<name>` with its schema persisted ONCE at
  * CREATE as `_schema.json` (create-exclusive — the same claim
  * primitive as the commit arbiter, so racing CREATEs get exactly one
  * winner), everything else is the existing connector surface —
  * INSERT rides the DSv2 two-phase write (X239), INSERT OVERWRITE the
  * truncate path, SELECT the X289 read facet (manifest-stat file
  * pruning + X290 aggregate pushdown come free), and DELETE FROM
  * translates its residual filters into a [[TableCommit
  * .commitDeleteRows]] merge-on-read deletion-vector commit — zero
  * data bytes move for the classic purge. Schema evolution, mapping,
  * lineage, tags and time travel stay API-level on purpose (the
  * engine's explicit-schema discipline); `ALTER TABLE` says so
  * loudly. */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _
  private var retain: Int = 64

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires spark.sql.catalog.$name.warehouse"))
    // SQL tables default to a REAL retention window (time travel is a
    // catalog-level expectation — VERSION AS OF on a retain=1 table
    // would dangle after every commit); override per catalog via
    // spark.sql.catalog.<name>.retain
    retain = Option(options.get("retain")).map(_.toInt).getOrElse(64)
  }
  override def name(): String = catalogName

  private def requireSegSafe(s: String): Unit = {
    require(s.nonEmpty && s != "." && s != ".." &&
      !s.exists(c => c == '/' || c < 0x20),
      s"identifier segment '$s' must be a plain directory name")
    // table-internal directory names are RESERVED: an identifier that
    // resolves into another table's internals (wh/t/data, wh/_tags, …)
    // would let plain SQL DDL destroy that table's files
    require(s != "data" && !s.startsWith("_"),
      s"identifier segment '$s' is reserved (table internals are " +
        "'data' and '_'-prefixed directories)")
  }

  /** No identifier may resolve INSIDE an existing table's root: every
    * strict ancestor between the warehouse and the target must be a
    * plain namespace directory, never a table. */
  private def requireOutsideTables(root: String): Unit = {
    var p = Paths.get(root).getParent
    val wh = Paths.get(warehouse).toAbsolutePath.normalize
    while (p != null && p.toAbsolutePath.normalize != wh &&
        p.toAbsolutePath.normalize.startsWith(wh)) {
      require(!Files.exists(p.resolve("_schema.json")),
        s"identifier resolves inside existing table at $p — namespaces " +
          "and tables cannot nest")
      p = p.getParent
    }
  }

  private def rootOf(ident: Identifier): String = {
    (ident.namespace.toSeq :+ ident.name).foreach(requireSegSafe)
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")
  }

  private def schemaPath(root: String): Path =
    Paths.get(root, "_schema.json")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    namespace.foreach(requireSegSafe)
    val dir = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) return Array.empty
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        Files.exists(p.resolve("_schema.json")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val root = rootOf(ident)
    val sp = schemaPath(root)
    if (!Files.exists(sp)) throw new NoSuchTableException(ident)
    val schema = DataType.fromJson(new String(Files.readAllBytes(sp),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]
    val props = new util.HashMap[String, String]()
    props.put("root", root)
    props.put("retain", retain.toString)
    new GraftCatalogTable(schema, props, root,
      s"$catalogName.${(ident.namespace.toSeq :+ ident.name).mkString(".")}" +
        asOf.map(v => s"@v$v").getOrElse(""),
      asOf, retain)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** X293 `VERSION AS OF <v>` — SQL time travel onto [[TableCommit
    * .entriesAtVersion]]; the version must still be retained. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.nonEmpty && version.forall(_.isDigit),
      s"graft VERSION AS OF wants a numeric commit version, got " +
        s"'$version'")
    load(ident, Some(version.toLong))
  }

  /** X293 `TIMESTAMP AS OF <ts>` — Spark hands MICROSECONDS since the
    * epoch; resolution is [[TableCommit.versionAsOf]]'s manifest-mtime
    * rule. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident,
      Some(TableCommit.versionAsOf(rootOf(ident), timestampMicros / 1000L)))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned at the catalog level — " +
        "layout is a maintenance concern (commitCompact/commitCluster)")
    val root = rootOf(ident)
    requireOutsideTables(root)
    // an existing TABLE is the already-exists case (the type Spark's
    // IF NOT EXISTS path swallows), checked before the foreign-content
    // refusal so a lost CREATE race reads as what it is
    if (Files.exists(schemaPath(root)))
      throw new TableAlreadyExistsException(ident)
    // never ADOPT an existing non-empty directory: its contents would
    // become this table's to drop
    if (Files.isDirectory(Paths.get(root))) {
      val s = Files.list(Paths.get(root))
      val nonEmpty = try s.findFirst().isPresent finally s.close()
      require(!nonEmpty,
        s"CREATE TABLE target directory $root already exists and is " +
          "not empty — refusing to adopt foreign contents")
    }
    try TableCommit.claimFile(schemaPath(root),
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new TableAlreadyExistsException(ident)
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE on graft catalog tables is API-level by design: " +
        "column mapping (commitRenameColumn/commitDropColumn/" +
        "commitAddColumn) keeps renames metadata-only and tombstones " +
        "dropped physical names — a catalog-side schema edit would " +
        "bypass those invariants")

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!Files.exists(schemaPath(root))) return false
    val dir = Paths.get(root)
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(p => Files.deleteIfExists(p))
    finally s.close()
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = rootOf(from); val dst = rootOf(to)
    if (!Files.exists(schemaPath(src)))
      throw new NoSuchTableException(from)
    requireOutsideTables(dst)
    if (Files.exists(Paths.get(dst)))
      throw new TableAlreadyExistsException(to)
    Files.createDirectories(Paths.get(dst).getParent)
    Files.move(Paths.get(src), Paths.get(dst))
  }
}

/** A catalog-resolved graft table: the full connector surface
  * (read/write/stream facets) plus SQL `DELETE FROM` via
  * merge-on-read deletion vectors. */
private[sources] class GraftCatalogTable(schema0: StructType,
    properties: util.Map[String, String], root: String,
    displayName: String, asOf: Option[Long] = None, retain: Int = 64)
    extends GraftWriteTable(schema0, properties) with SupportsDelete {
  override def name(): String = displayName
  override protected def asOfVersion: Option[Long] = asOf

  /** `TRUNCATE TABLE`: one metadata-only commit to an EMPTY file list
    * — not a whole-table deletion vector (marking every row dead would
    * write position sets proportional to the table). History is
    * retention-governed like any overwrite. */
  override def truncateTable(): Boolean = {
    TableCommit.publish(root, Seq.empty, retain = retain)
    true
  }

  /** `DELETE FROM … WHERE …`: only predicates with an exact
    * [[Filter]] → [[org.apache.spark.sql.Column]] translation are
    * accepted (Spark fails the statement otherwise — a partial
    * translation would delete the wrong rows). The delete itself is
    * the X265 DV commit: zero data bytes move. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftCatalogTable.filterCol(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.toSeq
      .map(f => GraftCatalogTable.filterCol(f).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE predicate not translatable: $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    TableCommit.commitDeleteRows(SparkSession.active, root, schema0,
      pred, retain = retain)
    ()
  }
}

private[sources] object GraftCatalogTable {
  /** Exact V1-Filter → Column translation (None = refuse, never
    * approximate). */
  def filterCol(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case EqualTo(c, v)            => Some(col(c) === lit(v))
      case EqualNullSafe(c, v)      => Some(col(c) <=> lit(v))
      case GreaterThan(c, v)        => Some(col(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case LessThan(c, v)           => Some(col(c) < lit(v))
      case LessThanOrEqual(c, v)    => Some(col(c) <= lit(v))
      case In(c, vs)                => Some(col(c).isin(vs.toSeq: _*))
      case IsNull(c)                => Some(col(c).isNull)
      case IsNotNull(c)             => Some(col(c).isNotNull)
      case StringStartsWith(c, v)   => Some(col(c).startsWith(v))
      case StringEndsWith(c, v)     => Some(col(c).endsWith(v))
      case StringContains(c, v)     => Some(col(c).contains(v))
      case And(l, r) =>
        for { a <- filterCol(l); b <- filterCol(r) } yield a && b
      case Or(l, r) =>
        for { a <- filterCol(l); b <- filterCol(r) } yield a || b
      case Not(x)        => filterCol(x).map(!_)
      case AlwaysTrue()  => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _             => None
    }
}
