package graft.schema

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-Registry capability rebuilt on files (SURVEY §2.4 C2/C3;
  * kafka_publisher.py:101-141): versioned schemas per subject, reuse of
  * the latest registration when the schema is unchanged, and a BACKWARD
  * compatibility test that REJECTS incompatible registrations exactly
  * like the reference's `test_compatibility` raise (lines 120-122;
  * BACKWARD mode per s3-connector-config.json:30).
  *
  * Subjects follow the registry convention `<topic>-value`.
  */
class SchemaStore(root: String) {

  Files.createDirectories(Paths.get(root))

  private def subjectDir(subject: String): Path = Paths.get(root, subject)

  final case class Registration(subject: String, version: Int, id: String)

  def subjects(): Seq[String] =
    Option(Paths.get(root).toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq

  def versions(subject: String): Seq[Int] =
    Option(subjectDir(subject).toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).sorted.toSeq

  def latest(subject: String): Option[(Int, StructType)] =
    versions(subject).lastOption.map(v => (v, schemaAt(subject, v)))

  def schemaAt(subject: String, version: Int): StructType =
    DataType.fromJson(new String(
      Files.readAllBytes(subjectDir(subject).resolve(s"$version.json")),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]

  /** Register a schema: reuse the latest version when identical
    * (kafka_publisher.py:108-118), reject when not BACKWARD-compatible
    * (lines 120-122), otherwise create the next version.
    */
  def register(subject: String, schema: StructType): Registration = synchronized {
    latest(subject) match {
      case Some((v, existing)) if existing == schema =>
        Registration(subject, v, id(subject, v))
      case Some((v, existing)) =>
        SchemaCompat.evolve(existing, schema) match {
          case Left(violations) =>
            throw new IllegalArgumentException(
              s"schema for $subject is not BACKWARD-compatible: " +
                violations.map(x => s"${x.field}: ${x.reason}").mkString("; "))
          case Right(_) => write(subject, v + 1, schema)
        }
      case None => write(subject, 1, schema)
    }
  }

  def isCompatible(subject: String, schema: StructType): Boolean =
    latest(subject).forall { case (_, cur) => SchemaCompat.isCompatible(cur, schema) }

  private def write(subject: String, version: Int, schema: StructType): Registration = {
    Files.createDirectories(subjectDir(subject))
    Files.write(subjectDir(subject).resolve(s"$version.json"),
      schema.json.getBytes(StandardCharsets.UTF_8))
    Registration(subject, version, id(subject, version))
  }

  private def id(subject: String, version: Int): String = s"$subject-$version"
}
