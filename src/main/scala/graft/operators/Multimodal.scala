package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata, and per-record decode/feature-extract
  * runs as partition-local batch processing (`mapPartitions`) — the
  * JVM-side analogue of a vectorized batch UDF: one decoder
  * instantiation per partition, streaming over rows, no driver
  * involvement, scales with executor count.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `StubDecoder` derives deterministic fake features from
  * the bytes. The Spark-side contract — schema, partitioning, batch
  * shape — is real and tested; swap `StubDecoder` for a real codec
  * binding without touching the plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features. For images width/height/frames; audio would
    * reuse frames as sample-frames.
    */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      content_sha: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic fake decoder standing in for a real codec.
    * Derives plausible-looking dimensions from content alone, so tests
    * are reproducible and the pipeline shape is honest.
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        r.doc_id, r.media_type, len, sha,
        width = (320 + (len % 1280)).toInt,
        height = (240 + (len * 7 % 840)).toInt,
        n_frames = (1 + (r.doc_id % 30)).toInt)
    }
  }

  /** Batch feature extraction: one decoder per partition, rows streamed
    * through it. This is where a real implementation would hold the
    * native codec handle.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point (codec/native-lib handle goes here)
      rows.map(StubDecoder.decode)
    }
  }

  /** One sampled frame sliced out of a media payload. */
  case class Frame(
      doc_id: Long, frame_idx: Long, frame_off: Long, frame_md5: String)

  /** Frame sampling over a binary media column: slice fixed-size frames
    * out of each payload and keep every `step`-th one — the video
    * frame-sample / audio window-sample pattern. Unlike
    * [[extractFeatures]]'s stubbed codec, the byte-slicing here is the
    * REAL operation (container demux is what a codec would add): one
    * digest instance per partition, payload bytes never leave the
    * executor, output size is `len/frameBytes/step` rows per record —
    * the shape that lets 100 TB of video flow through a frame-level
    * transform without materializing whole payloads downstream.
    *
    * Only complete frames are emitted (tail bytes short of
    * `frameBytes` are dropped, matching fixed-block codecs).
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameBytes: Int = 64,
      step: Int = 3): Dataset[Frame] = {
    require(frameBytes > 0 && step > 0, "frameBytes/step must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a real demuxer/codec handle goes here)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        Iterator.range(0, r.payload.length / frameBytes)
          .filter(_ % step == 0)
          .map { i =>
            val off = i * frameBytes
            md.reset()
            val digest = md.digest(
              java.util.Arrays.copyOfRange(r.payload, off, off + frameBytes))
            Frame(r.doc_id, i.toLong, off.toLong,
              digest.map("%02x".format(_)).mkString)
          }
      }
    }
  }

  /** A resized payload: original and reduced sizes plus the digest of
    * the reduced bytes (the downstream join key for resized assets).
    */
  case class Resized(
      doc_id: Long, orig_bytes: Long, resized_bytes: Long, resized_md5: String)

  /** Payload downsampling ("resize"): keep every `step`-th byte of each
    * payload — the deterministic stand-in for an image resize / audio
    * downsample (a real implementation swaps the decimation loop for a
    * codec scale call; the Spark shape is identical). Like
    * [[sampleFrames]], the byte transform itself is REAL: one digest
    * per partition, payloads never leave the executor, and the output
    * carries the reduced bytes' digest + sizes rather than the bytes —
    * at 100 TB the thumbnail store is written by the same partition
    * that decimated, never shuffled.
    */
  def resize(media: Dataset[MediaRow], step: Int): Dataset[Resized] = {
    require(step >= 1, "step must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val small = Array.range(0, r.payload.length, step).map(r.payload)
        md.reset()
        Resized(r.doc_id, r.payload.length.toLong, small.length.toLong,
          md.digest(small).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Treat the documents table's text payload as a binary media column
    * — exercises the full plumbing over real testdata. The feature
    * arithmetic below mirrors StubDecoder but stays in pure column
    * expressions so the result is DuckDB-oracle-checkable.
    */
  def documentFeatures(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val len = octet_length(col("text")).cast("long")
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      len.as("byte_len"),
      sha2(payload, 256).as("content_sha"),
      (lit(320L) + pmod(len, lit(1280L))).as("width"),
      (lit(240L) + pmod(len * 7, lit(840L))).as("height"),
      (lit(1L) + pmod(col("doc_id"), lit(30L))).as("n_frames"))
  }
}
