package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Video}
import graft.operators.Multimodal.MediaRow

/** Real video path: AVI demux on actual RIFF bytes, MJPEG frame decode
  * through ImageIO, perceptual frame dedup — plus the fixture-layout
  * pins the m08 oracle's offset arithmetic depends on.
  */
class VideoSpec extends SparkTestBase {

  import spark.implicits._

  /** A real MJPEG AVI: JPEG-encode each BufferedImage and mux into the
    * fixture container layout (the container writer is shared; only the
    * frame payloads differ — real JPEGs instead of hex text).
    */
  private def mjpegAvi(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val jpegs = frames.map { img =>
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    val moviData = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlSz = 4 + 64 + 124
    val riffSz = 4 + (8 + hdrlSz) + (8 + 4 + moviData)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(riffSz); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlSz); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(40000); (0 until 3).foreach(_ => bb.putInt(0))
    bb.putInt(jpegs.size); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    (0 until 6).foreach(_ => bb.putInt(0))
    cc("LIST"); bb.putInt(4 + 64 + 48); cc("strl")
    cc("strh"); bb.putInt(56); cc("vids"); cc("MJPG")
    (0 until 12).foreach(_ => bb.putInt(0))
    cc("strf"); bb.putInt(40); bb.putInt(40); (0 until 9).foreach(_ => bb.putInt(0))
    cc("LIST"); bb.putInt(4 + moviData); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte) // RIFF even padding
    }
    bb.array()
  }

  private def gradientImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 7 + y * 13 + seed) % 256 + 256) % 256
      img.setRGB(x, y, (v << 16) | (((x + seed) % 256) << 8) | (y % 256))
    }
    img
  }

  test("fixture layout: demux offsets/stride match the pinned constants") {
    val payload = Video.aviFixture(7L, "hello fixture world")
    val frames = Video.demuxOne(7L, payload)
    assert(frames.size == 3) // 1 + 7 % 5
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i)
      assert(f.fourcc == "00db")
      assert(f.n_bytes == 32L)
      assert(f.frame_off ==
        Video.FixtureDataStart + i * Video.FixtureStride,
        s"frame $i offset drifted — fixture layout changed, " +
          "update FixtureDataStart AND the m08 oracle together")
    }
    // digest restates md5(md5(text || ':' || idx)) — the oracle's form
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames.head.frame_md5 == md5hex(md5hex("hello fixture world:0")))
  }

  test("real MJPEG: demux finds every frame, ImageIO decodes true geometry") {
    val imgs = Seq(gradientImage(64, 48, 0), gradientImage(64, 48, 1),
      gradientImage(32, 32, 2))
    val payload = mjpegAvi(imgs)
    val media = Seq(MediaRow(1L, "video/avi", payload)).toDS()

    val demuxed = Video.demuxFrames(media).collect().sortBy(_.frame_idx)
    assert(demuxed.length == 3)
    assert(demuxed.forall(_.fourcc == "00dc"))
    // offsets point at real JPEG magic bytes
    demuxed.foreach { f =>
      assert((payload(f.frame_off.toInt) & 0xff) == 0xff &&
        (payload(f.frame_off.toInt + 1) & 0xff) == 0xd8, "not JPEG SOI")
    }

    val decoded = Video.decodeMjpegFrames(media).collect().sortBy(_.frame_idx)
    assert(decoded.forall(_.decoded))
    assert(decoded.map(d => (d.width, d.height)).toSeq ==
      Seq((64, 48), (64, 48), (32, 32)))
  }

  test("frame dedup: re-encoded identical frame pairs at hamming ~0; distinct frames do not") {
    val a = gradientImage(64, 48, 0)
    // same picture, re-encoded (JPEG encode of the decoded JPEG)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(a, "jpg", buf)
    val aReenc = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(buf.toByteArray))
    val distinct = gradientImage(64, 48, 128) // shifted gradient
    val payload = mjpegAvi(Seq(a, aReenc, distinct))
    val media = Seq(MediaRow(5L, "video/avi", payload)).toDS()

    val pairs = Video.frameDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val id = (i: Long) => 5L * (1L << 20) + i
    assert(pairs.exists { case (x, y, _) => x == id(0) && y == id(1) },
      s"re-encoded copy not paired: $pairs")
    assert(!pairs.exists { case (x, y, _) => y == id(2) || x == id(2) },
      s"distinct frame falsely paired: $pairs")
  }

  test("corrupt media: truncated/garbage payloads yield partial/zero frames, never throw") {
    val good = Video.aviFixture(3L, "abcdef")
    val truncated = good.take(Video.FixtureDataStart.toInt + 10) // mid-frame
    val garbage = Array.fill[Byte](64)(0x5a)
    val media = Seq(
      MediaRow(1L, "video/avi", truncated),
      MediaRow(2L, "video/avi", garbage),
      MediaRow(3L, "video/avi", Array.empty[Byte]),
      MediaRow(4L, "video/avi", good)).toDS()
    val byDoc = Video.demuxFrames(media).collect().groupBy(_.doc_id)
    assert(!byDoc.contains(1L) || byDoc(1L).isEmpty) // frame truncated mid-data
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
    assert(byDoc(4L).length == 4) // 1 + 3 % 5
  }

  test("non-JPEG frames mark themselves instead of dying") {
    val media = Seq(MediaRow(9L, "video/avi",
      Video.aviFixture(9L, "raw text frames"))).toDS()
    val decoded = Video.decodeMjpegFrames(media).collect()
    assert(decoded.length == 5 && decoded.forall(!_.decoded))
    assert(decoded.forall(d => d.width == -1 && d.height == -1))
  }
}
