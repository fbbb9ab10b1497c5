package graft.ingest

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.schema.AvroSerde

/** Avro Object Container File sink + source — the FILE-level form of
  * the wire format the reference's whole pipeline speaks (Kafka Avro
  * values, `connector-config.json:10-23`; this repo's registry-framed
  * serde lives in schema/AvroSerde.scala). Corpus drops and Kafka
  * archive dumps ship as `.avro` container files; this closes the loop
  * so the same `StructType` ↔ Avro `Schema` mapping reads and writes
  * them without Kafka in the path.
  *
  * Rides the avro-1.12 jars already on Spark's classpath
  * (`DataFileWriter`/`DataFileStream` ARE the container format — a
  * hand-rolled OCF would be re-implementing a library Spark ships).
  * Determinism: the OCF sync marker is random by default, which would
  * make every write byte-unique; we pass a FIXED 16-byte marker and
  * key-partition + sort, so identical input produces byte-identical
  * files (spec-pinned, the WebDataset discipline).
  *
  * Scale shape: `write` key-partitions into `nFiles` and streams each
  * partition's rows record-by-record through the datum writer —
  * executor memory holds one record; block boundaries (the format's
  * parallelism unit) are handled by the library. `read` rides the
  * binaryFile source (one task per file) and decodes via
  * `DataFileStream` + AvroSerde.toRow in a mapPartitions — the
  * per-partition-codec exception, a container walk is imperative.
  */
object AvroFiles {

  private val SyncMarker: Array[Byte] =
    "graft-ocf-sync!!".getBytes("US-ASCII") // exactly 16 bytes

  /** Write `df` as `nFiles` container files `part-NNNNN.avro` under
    * `outDir`, partitioned by hash of `keyCol` and key-sorted within
    * each file (deterministic layout).
    */
  def write(df: DataFrame, outDir: String, nFiles: Int, keyCol: String): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val dir = Paths.get(outDir)
    if (Files.exists(dir)) {
      val old = Files.list(dir)
      try old.iterator().forEachRemaining(p => Files.delete(p))
      finally old.close()
    } else Files.createDirectories(dir)
    val st = df.schema
    val avroJson = AvroSerde.toAvroSchema(st, "GraftRecord").toString
    df.repartition(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.hasNext) {
          val avro = new Schema.Parser().parse(avroJson)
          val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
          val tc = TaskContext.get()
          val part = tc.partitionId()
          // write-temp-then-atomic-rename: with task retries or
          // speculative execution two attempts of the same partition
          // must never interleave bytes into the final path — each
          // attempt owns a unique temp file, the rename is the commit
          val finalPath = Paths.get(outDir, f"part-$part%05d.avro")
          val tmpPath = Paths.get(outDir,
            f".part-$part%05d.avro.attempt-${tc.taskAttemptId()}%d.tmp")
          val out = new FileOutputStream(tmpPath.toFile)
          w.create(avro, out, SyncMarker)
          try rows.foreach(r => w.append(AvroSerde.toRecord(r, st, avro)))
          finally w.close()
          Files.move(tmpPath, finalPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
  }

  /** Read container files back with a PINNED Spark schema (the q51
    * no-inference posture); one binaryFile task per file.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    import spark.implicits._
    // pathGlobFilter on the real directory, NOT a glob in the load
    // path: Spark's FileStreamSink.hasMetadata probes the load path as
    // a literal file and WARN-dumps a FileNotFoundException stack
    // trace for every glob — noise that reads like a broken fixture
    // in bench/verify logs
    spark.read.format("binaryFile").option("pathGlobFilter", "*.avro")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val reader = new DataFileStream[GenericRecord](
            new ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord]())
          val recs = scala.collection.mutable.ArrayBuffer.empty[Row]
          try while (reader.hasNext) recs += AvroSerde.toRow(reader.next(), schema)
          finally reader.close()
          recs
        }
      }(Encoders.row(schema))
  }
}
