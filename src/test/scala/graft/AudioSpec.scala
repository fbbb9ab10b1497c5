package graft

import graft.operators.Audio
import graft.operators.Multimodal.MediaRow

/** The audio operators run against REAL WAV payloads synthesized with
  * the same JDK codec that decodes them, so every assertion is against
  * known signal physics: a pure sine's RMS is amplitude/√2, its
  * zero-crossing rate is 2×frequency, silence and clipping occupy the
  * exact sample ranges we wrote.
  */
class AudioSpec extends SparkTestBase {

  import spark.implicits._

  private val Rate = 8000

  /** 16-bit mono little-endian WAV from [-1,1] samples. */
  private def wav(samples: Array[Double]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(Rate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, (s * 32767).round.toInt))
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def sine(freqHz: Double, seconds: Double, amp: Double): Array[Double] =
    Array.tabulate((Rate * seconds).toInt)(i =>
      amp * math.sin(2 * math.Pi * freqHz * i / Rate))

  test("features recover signal physics from a real WAV") {
    val tone = sine(440, 1.0, amp = 0.5)             // 1 s of A440 at -6 dB
    val silence = Array.fill(Rate / 2)(0.0)          // 0.5 s dead air
    val clipped = sine(440, 0.5, amp = 4.0).map(s => // 0.5 s hard-clipped
      math.max(-1.0, math.min(1.0, s)))
    val ds = Seq(
      MediaRow(1L, "audio/wav", wav(tone)),
      MediaRow(2L, "audio/wav", wav(tone ++ silence)),
      MediaRow(3L, "audio/wav", wav(clipped)),
      MediaRow(4L, "audio/wav", "not audio".getBytes)
    ).toDS()
    val f = Audio.features(ds).collect().map(a => a.doc_id -> a).toMap

    assert(!f(4L).decoded) // corrupt marks itself
    assert((1L to 3L).forall(f(_).decoded))
    assert(f(1L).sample_rate == Rate && f(1L).channels == 1 && f(1L).bits == 16)
    assert(f(1L).duration_ms == 1000)
    // sine RMS = amp/sqrt(2) = 0.3536
    assert(math.abs(f(1L).rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(1L).rms}")
    assert(math.abs(f(1L).peak - 0.5) < 0.01)
    // ZCR of a 440 Hz sine = 880 crossings/s
    assert(math.abs(f(1L).zero_crossing_rate - 880) < 20,
      s"zcr ${f(1L).zero_crossing_rate}")
    assert(f(1L).silence_ratio == 0.0 && f(1L).clipped_ratio == 0.0)
    // doc 2: a third of the duration is silence
    assert(math.abs(f(2L).silence_ratio - 1.0 / 3) < 0.03,
      s"silence ${f(2L).silence_ratio}")
    assert(f(2L).duration_ms == 1500)
    // doc 3: 4x-amplitude sine hard-clipped — sin(x) >= 0.25/... the
    // fraction with |4 sin| >= 1 is 1 - (2/pi) asin(1/4) ≈ 0.839; the
    // exact written value saturates at |s|=1 so clipped_ratio tracks it
    assert(f(3L).clipped_ratio > 0.7 && f(3L).clipped_ratio < 0.95,
      s"clipped ${f(3L).clipped_ratio}")
    assert(f(3L).peak >= 0.999)
  }

  test("8-bit unsigned WAV decodes with format-relative clipping") {
    // 8-bit WAV is unsigned by convention; its positive rail is
    // 127/128 = 0.992, so a fixed 0.999 cut would miss half the
    // clipping — the threshold must be format-relative
    val fmt = new javax.sound.sampled.AudioFormat(
      Rate.toFloat, 8, 1, false, false)
    val samples = sine(440, 0.5, amp = 4.0).map(s =>
      math.max(-1.0, math.min(1.0, s)))
    val bytes = samples.map(s =>
      (math.max(0, math.min(255, ((s * 127) + 128).round.toInt)) & 0xff).toByte)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val ds = Seq(MediaRow(7L, "audio/wav", out.toByteArray)).toDS()
    val f = Audio.features(ds).collect().head
    assert(f.decoded && f.bits == 8)
    // both rails must count: hard-clipped 4x sine ≈ 0.84 clipped
    assert(f.clipped_ratio > 0.7, s"8-bit clipped ${f.clipped_ratio}")
    // unsigned midpoint decodes near zero, not off by full-scale
    assert(f.rms <= 1.0 && f.peak <= 1.0)
  }

  test("a document shorter than one window still emits one window") {
    val short = sine(200, 0.05, 0.4) // 50 ms < the 100 ms window
    val ds = Seq(MediaRow(8L, "audio/wav", wav(short))).toDS()
    val ws = Audio.windows(ds, windowMs = 100, stepMs = 100).collect()
    assert(ws.length == 1, s"got ${ws.length}")
    assert(ws.head.voiced) // the tone is well above -40 dBFS
  }

  test("windowed energy gates silence exactly where it was written") {
    // 0.4 s tone, 0.4 s silence, 0.4 s tone
    val sig = sine(200, 0.4, 0.4) ++ Array.fill((Rate * 0.4).toInt)(0.0) ++
      sine(200, 0.4, 0.4)
    val ds = Seq(MediaRow(9L, "audio/wav", wav(sig))).toDS()
    val ws = Audio.windows(ds, windowMs = 100, stepMs = 100).collect()
      .sortBy(_.window_idx)
    assert(ws.length == 12, s"got ${ws.length} windows") // 1.2 s / 100 ms
    val voiced = ws.map(_.voiced)
    // windows 0-3 tone, 4-7 silence, 8-11 tone
    assert(voiced.take(4).forall(identity))
    assert(voiced.slice(4, 8).forall(!_))
    assert(voiced.drop(8).forall(identity))
    // silence-gated sampling = the filter shape used at corpus scale
    val kept = Audio.windows(ds, 100, 100).filter(_.voiced).count()
    assert(kept == 8)
  }

  test("wavFixture round-trips text bytes through the real decoder") {
    // "0A": even pos '0'(48) → (48-128)/128 = -0.625; odd pos 'A'(65)
    // flips to 190 → (190-128)/128 = 0.484375 — the exact per-char
    // arithmetic the m06/m07 DuckDB oracles restate.
    val ds = Seq(MediaRow(1L, "audio/wav", Audio.wavFixture("0A"))).toDS()
    val f = Audio.features(ds).collect().head
    assert(f.decoded && f.sample_rate == 8000 && f.channels == 1 &&
      f.bits == 8 && f.n_samples == 2L)
    val expRms = math.sqrt((0.625 * 0.625 + 0.484375 * 0.484375) / 2)
    assert(f.rms == expRms, s"rms ${f.rms} != $expRms")
    assert(f.peak == 0.625)
    assert(f.zero_crossing_rate == 1.0 * 8000 / 2) // one neg→pos flip
    assert(f.clipped_ratio == 0.0)
  }

  test("resample2x: exact integer midpoints, digest pins the sequence") {
    // "AB": k0 = 65-128 = -63 (even), k1 = 127-66 = 61 (odd flip) —
    // out = [2*-63, -63+61, 2*61] = [-126, -2, 122] over denom 256
    val ds = Seq(MediaRow(1L, "audio/wav", Audio.wavFixture("AB")),
      MediaRow(2L, "audio/wav", Array[Byte](1, 2, 3))).toDS()
    val rows = Audio.resample2x(ds).collect()
      .map(r => r.doc_id -> r).toMap
    val r1 = rows(1L)
    assert(r1.decoded && r1.n_in == 2L && r1.n_out == 3L)
    assert(r1.sum_abs == 126L + 2L + 122L)
    assert(r1.sum_sq == 126L * 126 + 4L + 122L * 122)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("-126,-2,122".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.digest == md)
    // undecodable payload keeps its row with zeros + empty digest
    val r2 = rows(2L)
    assert(!r2.decoded && r2.n_out == 0L)
    assert(r2.digest == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
