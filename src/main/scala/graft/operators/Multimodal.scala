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
  * Two codecs plug into the same seam: [[Multimodal.ImageIoDecoder]]
  * is a REAL pure-JVM image codec (`javax.imageio` ships with the JDK —
  * PNG, BMP, GIF, JPEG), and [[Multimodal.StubDecoder]] derives
  * deterministic fake features from the bytes for oracle-checkable
  * fixtures (the driver's DuckDB oracle cannot decode images, so the
  * m-queries run the stub; OperatorSpec drives the real codec over
  * real encoded pixels).
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

  /** Pluggable per-partition codec. Implementations must be
    * serializable (they ride into the `mapPartitions` closure) and
    * must NOT throw on malformed payloads — a 100 TB crawl always
    * contains corrupt media, and one bad record must mark itself, not
    * kill the stage. Convention: undecodable ⇒ width = height = -1,
    * n_frames = 0.
    */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRow): MediaFeatures
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Deterministic fake decoder standing in for a real codec.
    * Derives plausible-looking dimensions from content alone, so tests
    * are reproducible and the pipeline shape is honest.
    */
  object StubDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      MediaFeatures(
        r.doc_id, r.media_type, len, sha256Hex(r.payload),
        width = (320 + (len % 1280)).toInt,
        height = (240 + (len * 7 % 840)).toInt,
        n_frames = (1 + (r.doc_id % 30)).toInt)
    }
  }

  /** Real image codec on `javax.imageio` (pure JVM, headless-safe, no
    * container dependency): width/height come from the actual
    * bitstream header, n_frames from the reader's image count (>1 for
    * animated GIF). Uses the ImageReader API so `getWidth/getHeight(0)`
    * read only the header — feature extraction over a 100 TB media
    * column stays header-bound, not pixel-decode-bound. Malformed or
    * unknown payloads degrade to the (-1, -1, 0) marker per the
    * [[MediaDecoder]] contract.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      val sha = sha256Hex(r.payload)
      def marker = MediaFeatures(r.doc_id, r.media_type, len, sha, -1, -1, 0)
      // The no-throw contract covers stream CREATION too:
      // createImageInputStream can throw (it disk-caches by default —
      // a full/unwritable tmpdir on an executor is an IOException) or
      // return null, and getImageReaders(null) throws. None of that
      // may kill the stage.
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        if (iis == null) marker
        else try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) marker
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              // allowSearch=true walks the stream for the true frame
              // count (animated GIF); still header-level work
              val n = try reader.getNumImages(true)
              catch { case _: java.io.IOException => 1 }
              MediaFeatures(r.doc_id, r.media_type, len, sha, w, h, n)
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => marker }
    }
  }

  /** Batch feature extraction: one decoder per partition, rows streamed
    * through it. Defaults to the deterministic stub so driver-side
    * oracles stay restatable; pass [[ImageIoDecoder]] for real media.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point (codec/native-lib handle goes here)
      rows.map(decoder.decode)
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

  /** ViT-style 2D patch extraction over a binary payload: the payload
    * is treated as a row-major `rowBytes`-wide byte image and cut into
    * `patch`×`patch` tiles — the patchify step every vision tokenizer
    * runs before embedding, expressed as PURE built-in column
    * expressions (sequence → explode → strided `substr` gather →
    * `md5`), so the whole grid stays inside WholeStageCodegen with no
    * UDF and no mapPartitions. Contrast [[sampleFrames]]: that op is
    * the codec SEAM (per-partition decoder init); this op is the
    * post-decode geometry, and geometry needs no seam.
    *
    * Emits one row per complete tile: (doc_id, pi, pj, patch_md5) —
    * pi/pj the tile's grid coordinates, md5 over the tile's bytes in
    * row-major order (the downstream dedup/embedding-cache key).
    * Payloads shorter than one tile row emit nothing (the
    * clamp-to-empty guard — Spark's `sequence(0, -1)` counts DOWN);
    * trailing partial tiles are dropped, as vision pipelines crop.
    *
    * Scale posture: map-only — tiles are derived and hashed in the
    * scanning partition, payload bytes never shuffle, output is
    * ~40 bytes/tile. The explode fan-out is bytes/(patch·rowBytes)
    * rows per payload, each tile hashed once.
    */
  def patchGrid(media: DataFrame, rowBytes: Int = 64, patch: Int = 16,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    require(rowBytes > 0 && patch > 0 && rowBytes % patch == 0,
      s"rowBytes ($rowBytes) must be a positive multiple of patch ($patch)")
    val nCols = rowBytes / patch
    val len = length(col(payloadCol))
    val nPatches =
      floor(len / lit(rowBytes * patch)).cast("int") * lit(nCols)
    val idxs = when(nPatches >= 1, sequence(lit(0), nPatches - 1))
      .otherwise(array().cast("array<int>"))
    val pi = floor(col("pidx") / nCols).cast("long")
    val pj = (col("pidx") % nCols).cast("long")
    // one substr per in-tile row — `patch` is a compile-time constant,
    // so the concat is a fixed-width expression (constant bytecode)
    val tile = concat((0 until patch).map { r =>
      col("_p").substr(
        (col("pi") * (patch * rowBytes) + lit(r * rowBytes) +
          col("pj") * patch + 1).cast("int"),
        lit(patch))
    }: _*)
    media.select(col(idCol), col(payloadCol).as("_p"), explode(idxs).as("pidx"))
      .select(col(idCol), col("_p"), pi.as("pi"), pj.as("pj"))
      .select(col(idCol), col("pi"), col("pj"), md5(tile).as("patch_md5"))
  }

  /** A perceptual fingerprint of a decoded image: 64-bit aHash (mean-
    * luma threshold over an 8×8 downscale — robust to re-encoding,
    * scaling, and mild noise) and 64-bit dHash (horizontal gradient
    * signs over a 9×8 downscale — robust to brightness/contrast
    * shifts). Unlike [[Frame]]'s exact digest, two RE-ENCODED or
    * RESIZED copies of the same picture produce hashes within a few
    * bits of each other, which is what media dedup at crawl scale
    * actually needs (byte digests only catch bit-identical copies).
    * Undecodable payloads carry decoded=false with zero hashes.
    */
  case class PerceptualHash(
      doc_id: Long, decoded: Boolean, ahash: Long, dhash: Long)

  /** Per-partition perceptual hashing on the real JDK codec: decode,
    * reduce to a mean-luma grid by EXACT area averaging (see
    * [[lumaGrid]] — interpolating downscales point-sample near the
    * grid scale and DO flip threshold bits on detailed images),
    * threshold to bits. Same
    * mapPartitions shape as every other media op: one codec context
    * per partition, pixels never leave the executor, output is 17
    * bytes/record however large the payload.
    *
    * Near-dup pairing downstream: use [[perceptualDupPairs]] (or
    * filter `decoded` yourself before `Dedup.hash64Pairs`). Undecoded
    * rows all carry (0, 0) hashes — pairing them would put every
    * corrupt payload of a crawl shard into ONE band bucket (a
    * quadratic blowup AND hamming-0 "duplicates" between unrelated
    * documents), so the pairing entry point excludes them.
    */
  def perceptualHashes(media: Dataset[MediaRow]): Dataset[PerceptualHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) PerceptualHash(r.doc_id, decoded = false, 0L, 0L)
          else {
            val (a, d) = hashesOf(img)
            PerceptualHash(r.doc_id, decoded = true, a, d)
          }
        } catch {
          case _: Exception => PerceptualHash(r.doc_id, decoded = false, 0L, 0L)
        }
      }
    }
  }

  /** (aHash, dHash) of a decoded image — shared by still-image hashing
    * and [[Video.decodeMjpegFrames]]'s per-frame hashing.
    */
  private[operators] def hashesOf(
      img: java.awt.image.BufferedImage): (Long, Long) = {
    val luma = lumaGrid(img, 9, 8)
    // aHash: 8×8 mean threshold (left 8 columns of the 9×8 grid)
    val cells = for (y <- 0 until 8; x <- 0 until 8) yield luma(y)(x)
    val mean = cells.sum / 64.0
    val a = cells.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc
    }
    // dHash: sign of the horizontal gradient across 9 columns
    val d = (for (y <- 0 until 8; x <- 0 until 8) yield (y, x))
      .zipWithIndex.foldLeft(0L) { case (acc, ((y, x), i)) =>
        if (luma(y)(x) < luma(y)(x + 1)) acc | (1L << i) else acc
      }
    (a, d)
  }

  /** 64-bit aHash alone (the frame-dedup fingerprint). */
  private[graft] def aHashOf(img: java.awt.image.BufferedImage): Long =
    hashesOf(img)._1

  /** Perceptual near-dup pairs among DECODED images: [[Dedup.hash64Pairs]]
    * over the chosen hash (`"ahash"` default, `"dhash"` for
    * brightness-shifted corpora) — a 64-bit hash banded into 4×16-bit
    * keys catches every pair within Hamming distance 3 on at least one
    * band (pigeonhole), so the candidate-join shape, cost, and 100 TB
    * posture are identical to t08's text SimHash. Undecoded rows are
    * excluded HERE (see [[perceptualHashes]]: their shared (0,0)
    * hashes would otherwise form one quadratic bucket of false
    * hamming-0 pairs). Returns (a, b, hamming).
    */
  def perceptualDupPairs(media: Dataset[MediaRow],
      hashCol: String = "ahash", maxHamming: Int = 3): DataFrame =
    Dedup.hash64Pairs(
      perceptualHashes(media).toDF().filter(col("decoded")),
      "doc_id", hashCol, maxHamming)

  /** Deterministic perceptual-hash FIXTURE for driver-side oracles
    * (the m05 analogue of [[StubDecoder]]): the real
    * [[perceptualHashes]] needs a pixel decode no SQL oracle can
    * restate, so this derives a 60-bit signature from content alone —
    * `conv(md5(text)[1..15], 16, 10)` — and emits three "re-encode"
    * variants per document with planted bit flips chosen to mimic what
    * aHash does to near-identical images: variant 1 flips bit 0
    * (band 0), variant 2 flips bits 20 and 40 (bands 1 AND 2), so the
    * three variants of one document pair at hamming 1 / 2 / 3 and the
    * (v1, v2) pair differs in three of the four 16-bit bands — a
    * candidate only band 3 can surface, exercising the pigeonhole edge
    * of [[Dedup.hash64Pairs]]'s banding under the driver's oracle.
    * Distinct documents hash independently, so the fixture also feeds
    * realistic 16-bit band collisions (birthday-rate) that the hamming
    * verify must reject. The real codec path stays OperatorSpec-driven
    * on real encoded pixels.
    *
    * Returns (media_id = doc_id·4 + variant, phash).
    */
  def stubPerceptualHashes(docs: DataFrame): DataFrame = {
    val base = conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
    val perturb = when(col("_v") === 1, lit(1L))
      .when(col("_v") === 2, lit((1L << 40) | (1L << 20)))
      .otherwise(lit(0L))
    docs.select(col("doc_id"), col("text"))
      .withColumn("_v", explode(array(lit(0), lit(1), lit(2))))
      .select((col("doc_id") * 4 + col("_v")).as("media_id"),
        base.bitwiseXOR(perturb).as("phash"))
  }

  /** `w`×`h` mean-luma grid via EXACT area averaging: every source
    * pixel contributes to exactly one cell (cell = proportional index
    * ranges), accumulated in one bulk-row pass over the full-
    * resolution image. Downscale-then-sample alternatives (single
    * bilinear pass, or even a progressive-halving pyramid with a
    * bilinear tail) point-sample near the grid scale, so two rescaled
    * copies of a DETAILED image (text, texture, fine checkers) sample
    * different pixel neighborhoods and can hash outside the banded
    * radius — measured hamming 8 on a 3-px checker at 0.75× rescale
    * with the pyramid, vs ≤ 3 with the exact mean (OperatorSpec pins
    * the rescale-stability case). Cost is one O(W·H) pass — the same
    * order as any downscale — with `getRGB` row batching.
    */
  private def lumaGrid(img: java.awt.image.BufferedImage,
      w: Int, h: Int): Array[Array[Double]] = {
    val iw = img.getWidth
    val ih = img.getHeight
    val sums = Array.ofDim[Double](h, w)
    val counts = Array.ofDim[Long](h, w)
    val row = new Array[Int](iw)
    var y = 0
    while (y < ih) {
      img.getRGB(0, y, iw, 1, row, 0, iw)
      val cy = math.min(h - 1, y.toLong * h / ih).toInt
      var x = 0
      while (x < iw) {
        val rgb = row(x)
        val luma = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val cx = math.min(w - 1, x.toLong * w / iw).toInt
        sums(cy)(cx) += luma
        counts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    val grid = Array.tabulate(h, w) { (cy, cx) =>
      if (counts(cy)(cx) == 0) Double.NaN else sums(cy)(cx) / counts(cy)(cx)
    }
    // sources smaller than the grid leave skipped cells (a 4-px-wide
    // icon fills 4 of 9 columns) — fill from the nearest populated
    // neighbor in the row so hash bits stay content-driven, not
    // empty-cell-driven
    grid.foreach { r =>
      var i = 1
      while (i < w) { if (r(i).isNaN) r(i) = r(i - 1); i += 1 }
      i = w - 2
      while (i >= 0) { if (r(i).isNaN) r(i) = r(i + 1); i -= 1 }
    }
    // rows skipped entirely (source shorter than the grid): fill from
    // the nearest populated row
    var j = 1
    while (j < h) {
      if (grid(j)(0).isNaN) grid(j) = grid(j - 1).clone(); j += 1
    }
    j = h - 2
    while (j >= 0) {
      if (grid(j)(0).isNaN) grid(j) = grid(j + 1).clone(); j -= 1
    }
    grid
  }

  /** A really-resized image: original and new pixel geometry plus the
    * re-encoded thumbnail's size and digest (the join key for a
    * thumbnail store written by the same partition that scaled).
    */
  case class ResizedImage(
      doc_id: Long, orig_width: Int, orig_height: Int,
      width: Int, height: Int, resized_bytes: Long, resized_md5: String)

  /** REAL image resize on the JDK codec: decode the payload
    * (`ImageIO.read`), scale the longer side down to `maxDim` with
    * bilinear interpolation, re-encode as PNG, and emit geometry +
    * thumbnail digest. Same partition-local shape as [[resize]]'s
    * decimation stand-in — one codec context per partition, pixels
    * never leave the executor, output carries digests not payloads —
    * but this one does the actual pixel work, so it is what a media
    * pipeline deploys while [[resize]] remains the deterministic
    * byte-level fixture for driver-side oracles. Images already within
    * `maxDim` are re-encoded at original size (scale capped at 1.0 —
    * no upscaling). Undecodable payloads emit the (-1 … 0, "") marker
    * row, mirroring [[ImageIoDecoder]]'s corrupt-media contract.
    */
  def resizeImages(media: Dataset[MediaRow],
      maxDim: Int): Dataset[ResizedImage] = {
    require(maxDim >= 1, "maxDim must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) ResizedImage(r.doc_id, -1, -1, -1, -1, 0L, "")
          else {
            val (ow, oh) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, maxDim.toDouble / math.max(ow, oh))
            val nw = math.max(1, math.round(ow * scale).toInt)
            val nh = math.max(1, math.round(oh * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            val bytes = buf.toByteArray
            md.reset()
            ResizedImage(r.doc_id, ow, oh, nw, nh, bytes.length.toLong,
              md.digest(bytes).map("%02x".format(_)).mkString)
          }
        } catch {
          case _: Exception => ResizedImage(r.doc_id, -1, -1, -1, -1, 0L, "")
        }
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
