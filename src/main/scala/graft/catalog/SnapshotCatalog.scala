package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.schema.SchemaCompat

/** File-backed snapshot catalog rebuilding the reference's Iceberg-JDBC
  * catalog *capabilities* on Spark-native primitives (SURVEY §1.3/§7.1;
  * init-scripts/init-iceberg-catalog.sql:10-38): the three logical
  * relations become
  *
  *  - `iceberg.tables`   → `<wh>/<ns>/<table>/metadata/version-hint.text`
  *    (the metadata-pointer; swap is the atomic commit primitive, same
  *    as `tables.metadata_location`, init-iceberg-catalog.sql:14-15),
  *  - `iceberg.snapshots`→ the `snapshots` array inside each
  *    `v<N>.metadata.json` (id, parent, sequence number, file manifest),
  *  - `iceberg.properties` → the `properties` map in the same file.
  *
  * Commit protocol (single-writer-safe, optimistic for concurrent
  * writers): write `v<N+1>.metadata.json` with CREATE_NEW — a losing
  * concurrent committer gets FileAlreadyExistsException and must retry
  * against the new state — then ATOMIC_MOVE a temp pointer file onto
  * `version-hint.text`. Readers resolve pointer → metadata → file list,
  * so they always see a consistent snapshot (never a half-committed
  * file set). Data files are immutable once written; snapshots share
  * them structurally (append = old manifest ++ new files).
  *
  * Capabilities: namespaces, create/list/describe, append with
  * BACKWARD-gated schema evolution (old files null-pad new columns on
  * read), snapshot time travel by id, format_version/properties
  * introspection (pyiceberg_rest_server.py:148-159).
  */
class SnapshotCatalog(spark: SparkSession, val warehouse: String) {

  import SnapshotCatalog._

  new File(warehouse).mkdirs()

  // -------------------------------------------------------------- paths

  private def nsDir(ns: String): Path = Paths.get(warehouse, ns)
  private def tableDir(ns: String, t: String): Path = nsDir(ns).resolve(t)
  private def metaDir(ns: String, t: String): Path = tableDir(ns, t).resolve("metadata")
  private def dataDir(ns: String, t: String): Path = tableDir(ns, t).resolve("data")
  private def pointer(ns: String, t: String): Path =
    metaDir(ns, t).resolve("version-hint.text")

  // ---------------------------------------------------------- namespaces

  def createNamespace(ns: String): Unit = Files.createDirectories(nsDir(ns))

  def listNamespaces(): Seq[String] =
    Option(new File(warehouse).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq

  // -------------------------------------------------------------- tables

  def createTable(ns: String, name: String, schema: StructType,
      properties: Map[String, String] = Map.empty): TableMeta = {
    require(!tableExists(ns, name), s"table $ns.$name already exists")
    createNamespace(ns)
    Files.createDirectories(metaDir(ns, name))
    Files.createDirectories(dataDir(ns, name))
    val meta = TableMeta(
      tableId = s"$ns.$name",
      namespace = ns,
      name = name,
      location = tableDir(ns, name).toString,
      formatVersion = 2,
      schemaJson = schema.json,
      properties = DefaultProperties ++ properties,
      currentSnapshotId = None,
      snapshots = Seq.empty)
    commit(ns, name, version = 1, meta)
    meta
  }

  def tableExists(ns: String, name: String): Boolean =
    Files.exists(pointer(ns, name))

  def listTables(ns: String): Seq[String] =
    Option(nsDir(ns).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => Files.exists(pointer(ns, f.getName)))
      .map(_.getName).sorted.toSeq

  def describe(ns: String, name: String): TableMeta = loadMeta(ns, name)._2

  def schemaOf(ns: String, name: String): StructType =
    DataType.fromJson(describe(ns, name).schemaJson).asInstanceOf[StructType]

  // -------------------------------------------------------------- append

  /** Append a batch, evolving the table schema if the incoming batch
    * adds columns (BACKWARD gate: drops/type-changes throw). Returns the
    * new table metadata.
    */
  def append(ns: String, name: String, df: DataFrame): TableMeta =
    synchronized {
      val (version, meta) = loadMeta(ns, name)
      val current = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
      val evolved = SchemaCompat.evolve(current, df.schema) match {
        case Right(s) => s
        case Left(violations) =>
          throw new IllegalArgumentException(
            "schema not BACKWARD-compatible: " +
              violations.map(v => s"${v.field}: ${v.reason}").mkString("; "))
      }
      val snapshotId = meta.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
      val snapDir = dataDir(ns, name).resolve(s"snap-$snapshotId")
      df.write.parquet(snapDir.toString)
      val newFiles = Option(snapDir.toFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted.toSeq
      val snap = SnapshotMeta(
        snapshotId = snapshotId,
        parentId = meta.currentSnapshotId,
        sequenceNumber = meta.snapshots.map(_.sequenceNumber).maxOption.getOrElse(0L) + 1,
        files = meta.currentSnapshot.map(_.files).getOrElse(Seq.empty) ++ newFiles,
        rowCount = df.count(),
        createdAtMs = System.currentTimeMillis())
      val newMeta = meta.copy(
        schemaJson = evolved.json,
        currentSnapshotId = Some(snapshotId),
        snapshots = meta.snapshots :+ snap)
      commit(ns, name, version + 1, newMeta)
      newMeta
    }

  // ---------------------------------------------------------------- read

  /** Read the table at its current snapshot, or time-travel to a
    * specific snapshot id. The declared table schema is applied, so
    * files written before a column was added null-pad it.
    */
  def read(ns: String, name: String, snapshotId: Option[Long] = None): DataFrame = {
    val meta = describe(ns, name)
    val snap = snapshotId match {
      case Some(id) => meta.snapshots.find(_.snapshotId == id)
        .getOrElse(throw new NoSuchElementException(
          s"no snapshot $id in $ns.$name"))
      case None => meta.currentSnapshot
        .getOrElse(return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]))
    }
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    spark.read.schema(schema).parquet(snap.files: _*)
  }

  // -------------------------------------------------------------- commit

  private def commit(ns: String, name: String, version: Int, meta: TableMeta): Unit = {
    val metaPath = metaDir(ns, name).resolve(f"v$version%05d.metadata.json")
    // CREATE_NEW: optimistic-concurrency guard — a losing writer throws.
    Files.write(metaPath, Mapper.writeValueAsBytes(meta),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val tmp = metaDir(ns, name).resolve(s".version-hint.$version.tmp")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(ns, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def loadMeta(ns: String, name: String): (Int, TableMeta) = {
    require(tableExists(ns, name), s"no such table: $ns.$name")
    val version = new String(Files.readAllBytes(pointer(ns, name)),
      StandardCharsets.UTF_8).trim.toInt
    val metaPath = metaDir(ns, name).resolve(f"v$version%05d.metadata.json")
    val meta = Mapper.readValue(Files.readAllBytes(metaPath), classOf[TableMeta])
    (version, meta)
  }
}

object SnapshotCatalog {

  val DefaultProperties: Map[String, String] = Map(
    // mirrors connector-config.json:24-26
    "write.format.default" -> "parquet",
    "write.parquet.compression-codec" -> "snappy")

  final case class SnapshotMeta(
      snapshotId: Long,
      // contentAs: Jackson-Scala would otherwise box Option numbers as
      // Integer and blow up on Long unboxing.
      @JsonDeserialize(contentAs = classOf[java.lang.Long])
      parentId: Option[Long],
      sequenceNumber: Long,
      files: Seq[String],
      rowCount: Long,
      createdAtMs: Long)

  final case class TableMeta(
      tableId: String,
      namespace: String,
      name: String,
      location: String,
      formatVersion: Int,
      schemaJson: String,
      properties: Map[String, String],
      @JsonDeserialize(contentAs = classOf[java.lang.Long])
      currentSnapshotId: Option[Long],
      snapshots: Seq[SnapshotMeta]) {
    def currentSnapshot: Option[SnapshotMeta] =
      currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  }

  private val Mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
}
