package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRow

/** REAL video container handling on the JVM: the JDK ships no video
  * CODEC, but AVI is a RIFF byte container and Motion-JPEG stores one
  * ordinary JPEG per frame — so an AVI demuxer (pure byte parsing,
  * reference format: the public RIFF/AVI spec) plus `javax.imageio`
  * turns MJPEG videos into genuinely decoded frames with no native
  * dependency. This replaces the round-7 posture where frame ops were
  * honest byte-slicing over SYNTHETIC layouts (Multimodal.sampleFrames)
  * and real video was documented-only.
  *
  * Same seam discipline as images (`Multimodal.ImageIoDecoder`) and
  * audio (`Audio`): per-partition batch processing via `mapPartitions`,
  * payload bytes never leave the executor (outputs carry offsets,
  * sizes, digests, hashes — 10s of bytes per frame however large the
  * video), corrupt media marks itself instead of killing the stage.
  * At 100 TB of video the demux is a single streaming pass per payload
  * and per-frame outputs are bounded, so cost ∝ frames kept, the same
  * shape as [[Multimodal.sampleFrames]].
  */
object Video {

  /** One demuxed frame: container-level facts only (no decode).
    * `fourcc` is the AVI stream-chunk id (`00db` raw / `00dc`
    * compressed / `01wb` audio — only video chunks are emitted),
    * `frame_off` the ABSOLUTE byte offset of the frame payload in the
    * media payload, `frame_md5` the digest of exactly those bytes.
    */
  case class VideoFrame(
      doc_id: Long, frame_idx: Long, fourcc: String,
      frame_off: Long, n_bytes: Long, frame_md5: String)

  /** A decoded MJPEG frame: real pixel geometry plus the 64-bit aHash
    * perceptual fingerprint (same exact-area-average luma grid as
    * still-image dedup — see [[Multimodal.perceptualHashes]]), so
    * near-duplicate FRAMES across re-encoded copies of a video pair
    * via [[Dedup.hash64Pairs]] exactly like images do. Undecodable
    * frames carry decoded=false with (-1, -1, 0) markers.
    */
  case class DecodedFrame(
      doc_id: Long, frame_idx: Long, decoded: Boolean,
      width: Int, height: Int, ahash: Long)

  // ------------------------------------------------------------ demux

  /** Parse one AVI payload into its video frame chunks. Tolerant
    * streaming parse of the RIFF chunk grammar:
    *
    *   riff  := "RIFF" size "AVI " chunk*
    *   chunk := "LIST" size type chunk*        (descend)
    *          | fourcc size data pad           (pad to even)
    *
    * Video stream-data chunks are ids `NNdb` / `NNdc` (NN = stream
    * number). Anything malformed — truncated sizes, non-RIFF bytes,
    * chunk overruns — ends the parse with the frames collected so far
    * (a 100 TB crawl always contains truncated media; partial frames
    * beat a dead stage, and fully-corrupt payloads yield zero rows,
    * the [[Audio.windows]] convention).
    */
  private[graft] def demuxOne(doc: Long,
      payload: Array[Byte]): Seq[VideoFrame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[VideoFrame]
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      if (off + 4 > payload.length) ""
      else new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("db") || id.endsWith("dc"))

    // iterative walk with an explicit bound stack (LIST nesting is
    // shallow, but untrusted bytes must not recurse unboundedly)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p)
        val sz = u32(p + 4)
        if (id.isEmpty || sz < 0 || p + 8 + sz > end) return // truncated
        if (id == "LIST" || id == "RIFF") {
          // 4-byte list type, then sub-chunks
          if (sz >= 4) walk(p + 12, p + 8 + sz.toInt, depth + 1)
        } else if (isVideoChunk(id)) {
          val off = p + 8
          md.reset()
          md.update(payload, off, sz.toInt)
          out += VideoFrame(doc, out.length.toLong, id, off.toLong, sz,
            md.digest().map("%02x".format(_)).mkString)
        }
        p += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
    }

    if (payload.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      walk(12, math.min(payload.length, 8 + u32(4).toInt), 0)
    out.toSeq
  }

  /** Demux a media column of AVI payloads into frame rows — the REAL
    * container parse (offsets/sizes/digests come from the actual RIFF
    * walk), one pass per payload, per-partition batch shape.
    */
  def demuxFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.flatMap(r => demuxOne(r.doc_id, r.payload)))
  }

  // ----------------------------------------------------------- decode

  /** Demux + REAL per-frame JPEG decode (`ImageIO`) + perceptual
    * hash — the full MJPEG path. Frames whose bytes ImageIO rejects
    * (raw `00db` streams, corrupt JPEGs) emit marker rows rather than
    * dying, so a mixed-codec corpus flows through.
    */
  def decodeMjpegFrames(media: Dataset[MediaRow]): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        demuxOne(r.doc_id, r.payload).map { f =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              r.payload, f.frame_off.toInt, f.n_bytes.toInt))
            if (img == null) DecodedFrame(r.doc_id, f.frame_idx, decoded = false, -1, -1, 0L)
            else DecodedFrame(r.doc_id, f.frame_idx, decoded = true,
              img.getWidth, img.getHeight, Multimodal.aHashOf(img))
          } catch {
            case _: Exception =>
              DecodedFrame(r.doc_id, f.frame_idx, decoded = false, -1, -1, 0L)
          }
        }
      }
    }
  }

  /** Near-duplicate frame pairs among DECODED frames of an MJPEG
    * corpus: banded 64-bit aHash join ([[Dedup.hash64Pairs]], the t08
    * machinery — pigeonhole-complete to hamming ≤ 3), undecoded
    * marker rows excluded for the same quadratic-bucket reason as
    * [[Multimodal.perceptualDupPairs]]. Ids are (doc_id, frame_idx)
    * packed as doc_id·2²⁰ + frame_idx so the pair join stays a
    * single-long key (frame counts above 2²⁰ per video would need a
    * wider packing; guarded loudly).
    */
  def frameDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    val decoded = decodeMjpegFrames(media).toDF()
      .filter(col("decoded"))
    val packed = decoded
      .select((col("doc_id") * (1L << 20) + col("frame_idx")).as("frame_id"),
        col("ahash"))
    Dedup.hash64Pairs(packed, "frame_id", "ahash", maxHamming)
  }

  // ---------------------------------------------------------- fixture

  /** Deterministic AVI FIXTURE for driver-side oracles (the video
    * analogue of [[Audio.wavFixture]]): a REAL RIFF/AVI container —
    * `hdrl` with `avih`/`strh`/`strf`, then a `movi` list of `00db`
    * frames — whose frame payloads are the 32-char ASCII hex of
    * `md5(text + ":" + frameIdx)`. Only the payload SYNTHESIS is a
    * fixture: the m08 query demuxes it through the real RIFF walk
    * ([[demuxOne]]), and because the container layout is fixed the
    * oracle can restate every output column in SQL — header bytes
    * total [[FixtureDataStart]], frame stride 8 + 32 with no padding,
    * and `frame_md5 = md5(md5(text || ':' || idx))`. Frame count is
    * `1 + doc_id % 5`.
    */
  def aviFixture(docId: Long, text: String): Array[Byte] = {
    val nFrames = (1 + docId % 5).toInt
    val frames = (0 until nFrames).map { i =>
      md5Hex(s"$text:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    val moviData = frames.map(8 + _.length).sum // 40 per frame
    val hdrlSz = 4 + 64 + 124 // "hdrl" + avih + LIST strl
    val riffSz = 4 + (8 + hdrlSz) + (8 + 4 + moviData) // "AVI " + lists
    val buf = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit =
      buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); buf.putInt(riffSz); cc("AVI ")
    cc("LIST"); buf.putInt(hdrlSz); cc("hdrl")
    cc("avih"); buf.putInt(56) // MainAVIHeader
    buf.putInt(40000).putInt(0).putInt(0).putInt(0) // usec/frame, rates
    buf.putInt(nFrames).putInt(0).putInt(1).putInt(0) // frames, streams
    buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(4 + 64 + 48); cc("strl")
    cc("strh"); buf.putInt(56); cc("vids"); cc("DIB ")
    (0 until 12).foreach(_ => buf.putInt(0))
    cc("strf"); buf.putInt(40) // BITMAPINFOHEADER
    buf.putInt(40).putInt(0).putInt(0)
    (0 until 7).foreach(_ => buf.putInt(0))
    cc("LIST"); buf.putInt(4 + moviData); cc("movi")
    frames.foreach { f => cc("00db"); buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Absolute payload offset of the FIRST fixture frame's data:
    * RIFF(12) + hdrl LIST(8+200) + movi LIST header(12) + first chunk
    * header(8). Pinned by VideoSpec against [[demuxOne]]'s actual
    * output and hardcoded in the m08 oracle's offset arithmetic —
    * layout drift breaks both loudly.
    */
  val FixtureDataStart: Long = 12 + 200 + 12 + 8 // = 232

  /** Per-frame stride in the fixture: chunk header 8 + 32 data, even. */
  val FixtureStride: Long = 40

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
}
