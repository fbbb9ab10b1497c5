package graft.query

import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.SnapshotCatalog

/** The engine facade: both of the reference's REST query surfaces as
  * Scala APIs with identical JSON envelopes (SURVEY §2.2 R6-R11, §3.1,
  * §3.2) — JSON-string in/out so an HTTP layer is a trivial wrapper.
  *
  * Divergence note (SURVEY §2.2 R4/R5): limits are pushed into the
  * plan (`df.limit` → CollectLimitExec) instead of the reference's
  * materialize-then-truncate, and the PyIceberg path's declared-but-
  * disabled limit is ENFORCED — declared semantics, not the bug.
  */
class Engine(val spark: SparkSession, val catalog: SnapshotCatalog) {

  import Engine._

  /** 3.1 — arbitrary SQL pass-through (duckdb_rest_server.py:67-84),
    * default row cap 1000 (line 74). Accepts the reference README's
    * DuckDB dialect via `rewriteDialect`.
    */
  def sqlQuery(sql: String, limit: Int = 1000): String =
    envelope(Try(spark.sql(rewriteGlob(rewriteDialect(sql))).limit(limit)))

  /** Rewrite DuckDB's `glob('<pattern>')` table function
    * (duckdb_rest_server.py:111: `SELECT * FROM glob('{path}')`) into
    * an inline VALUES relation of the matching file names (column
    * `file`, as DuckDB names it). The listing runs driver-side at
    * rewrite time — same observable semantics.
    */
  private def rewriteGlob(sql: String): String =
    Engine.GlobRe.replaceAllIn(sql, m => {
      val p = new HPath(m.group(1))
      val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
      val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
        .map(_.getPath.toString).sorted
      val rows =
        if (files.isEmpty) "(CAST(NULL AS STRING))"
        else files.map(f => s"('${f.replace("'", "''")}')").mkString(", ")
      scala.util.matching.Regex.quoteReplacement(s"(VALUES $rows) AS glob_t(file)")
    })

  /** Canned `SELECT * FROM parquet LIMIT n`
    * (duckdb_rest_server.py:126-135; default 5).
    */
  def queryParquet(path: String, limit: Int = 5): String =
    envelope(Try(spark.read.parquet(path).limit(limit)))

  /** Parquet file listing by glob (duckdb_rest_server.py:86-124). */
  def listParquet(pathGlob: String): String = {
    Try {
      val p = new HPath(pathGlob)
      val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
      Option(fs.globStatus(p)).getOrElse(Array.empty)
        .map(_.getPath.toString).sorted
    } match {
      case Success(files) =>
        s"""{"files":[${files.map(jsonStr).mkString(",")}],"count":${files.length}}"""
      case Failure(e) => errorJson(e)
    }
  }

  /** 3.2 — catalog table scan (pyiceberg_rest_server.py:173-234),
    * default limit 100 (line 184; we ENFORCE it — R5 note above).
    * Optional snapshot id = time travel.
    */
  def queryTable(ns: String = "default_db", table: String = "purchase_events",
      limit: Int = 100, snapshotId: Option[Long] = None): String =
    if (!catalog.tableExists(ns, table))
      s"""{"error":${jsonStr(s"Table $ns.$table does not exist")}}"""
    else envelope(Try(catalog.read(ns, table, snapshotId).limit(limit)))

  /** R7 (pyiceberg_rest_server.py:101-112). */
  def listNamespaces(): String =
    s"""{"namespaces":[${catalog.listNamespaces().map(jsonStr).mkString(",")}]}"""

  /** R8 (pyiceberg_rest_server.py:114-127). */
  def listTables(ns: String = "default_db"): String =
    s"""{"namespace":${jsonStr(ns)},"tables":[${
      catalog.listTables(ns).map(jsonStr).mkString(",")}]}"""

  /** R9 — schema + metadata introspection
    * (pyiceberg_rest_server.py:129-171): field name/type list,
    * location, format_version, properties; error envelope on missing.
    */
  def describeTable(ns: String = "default_db",
      table: String = "purchase_events"): String =
    if (!catalog.tableExists(ns, table))
      s"""{"error":${jsonStr(s"Table $ns.$table does not exist")}}"""
    else {
      val meta = catalog.describe(ns, table)
      val schema = catalog.schemaOf(ns, table)
      val fields = schema.fields.zipWithIndex.map { case (f, i) =>
        s"""{"id":${i + 1},"name":${jsonStr(f.name)},"type":${
          jsonStr(f.dataType.simpleString)},"required":${!f.nullable}}"""
      }
      val props = meta.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
      s"""{"namespace":${jsonStr(ns)},"table":${jsonStr(table)},""" +
        s""""schema":[${fields.mkString(",")}],""" +
        s""""metadata":{"location":${jsonStr(meta.location)},""" +
        s""""format_version":${meta.formatVersion},""" +
        s""""current_snapshot_id":${meta.currentSnapshotId.getOrElse(-1L)},""" +
        s""""properties":{${props.mkString(",")}}}}"""
    }

  /** R3 — LIMIT-0 schema probe (duckdb_rest_server.py:101-109): cheap
    * path/schema validation with no job launched (df.schema only reads
    * the parquet footer).
    */
  def schemaProbe(path: String): String =
    Try(spark.read.parquet(path).schema) match {
      case Success(schema) =>
        val fields = schema.fields.map(f =>
          s"""{"name":${jsonStr(f.name)},"type":${jsonStr(f.dataType.simpleString)}}""")
        s"""{"schema":[${fields.mkString(",")}],"valid":true}"""
      case Failure(e) => errorJson(e)
    }

  /** C8 — health probe (duckdb_rest_server.py:62-65). */
  def health(): String = """{"status":"healthy"}"""

  private def envelope(df: Try[DataFrame]): String = df match {
    case Success(d) =>
      Try(epochMillisTimestamps(d).toJSON.collect()) match {
        case Success(rows) => s"""{"records":[${rows.mkString(",")}]}"""
        case Failure(e) => errorJson(e)
      }
    case Failure(e) => errorJson(e)
  }

  /** JSON fidelity (SURVEY §7.4 risk 3): the reference's DuckDB path
    * renders timestamps as epoch MILLISECONDS (pandas
    * `to_json(orient='records')` default, duckdb_rest_server.py:81-82);
    * Spark's toJSON renders ISO strings. Convert top-level timestamp
    * columns to epoch millis so the wire format matches.
    */
  private def epochMillisTimestamps(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val cols = d.schema.fields.map {
      case f if f.dataType == TimestampType =>
        unix_millis(col(f.name)).as(f.name)
      case f if f.dataType == TimestampNTZType =>
        unix_millis(col(f.name).cast(TimestampType)).as(f.name)
      case f => col(f.name)
    }
    d.select(cols.toSeq: _*)
  }
}

object Engine {

  /** The ≤30-line DuckDB-dialect pre-rewrite (SURVEY §2.5 dialect
    * note): lets the reference README's committed query texts
    * (`read_parquet('<path>')`, README.md:288) run unchanged.
    * A string transform, deliberately not a Catalyst rule — the
    * rewrite happens before parsing.
    */
  private val ReadParquetRe =
    raw"(?i)read_parquet\(\s*'([^']+)'\s*\)".r

  private[query] val GlobRe =
    raw"(?i)glob\(\s*'([^']+)'\s*\)".r

  def rewriteDialect(sql: String): String =
    ReadParquetRe.replaceAllIn(sql, m => s"parquet.`${m.group(1)}`")

  private[query] def errorJson(e: Throwable): String =
    s"""{"error":${jsonStr(Option(e.getMessage).getOrElse(e.toString).take(500))}}"""

  private[query] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
