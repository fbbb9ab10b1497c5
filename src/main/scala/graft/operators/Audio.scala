package graft.operators

import org.apache.spark.sql.Dataset

import graft.operators.Multimodal.MediaRow

/** REAL audio operators on the JDK codec (`javax.sound.sampled` ships
  * with the JVM — WAV/AIFF/AU PCM): the audio half of the multimodal
  * tier, mirroring [[Multimodal.ImageIoDecoder]]'s posture — honest
  * decoding where the platform provides it, per-partition batch
  * processing, payloads never leaving the executor, corrupt media
  * marking itself instead of killing the stage.
  *
  * The per-document features are the standard audio-corpus quality
  * gates a speech-dataset pipeline filters on: duration bounds, RMS /
  * peak level (too-quiet recordings), clipping ratio (distorted
  * sources), silence ratio (dead air), zero-crossing rate (crude
  * speech/tone/noise discrimination). The windowed op is the audio
  * analogue of [[Multimodal.sampleFrames]]: fixed-length windows with
  * per-window energy, which is what silence-gated segment sampling
  * ("keep the voiced parts of 100 TB of audio") runs on.
  */
object Audio {

  /** Per-document audio features. `decoded=false` rows carry zeros —
    * exclude them before thresholding (same contract as the image
    * decoder's marker rows).
    *
    * Semantics: samples are normalized to [-1, 1]; multi-channel
    * audio is analyzed per-sample across all channels (levels and
    * clipping care about any channel; ZCR uses channel 0).
    */
  case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long, // per channel
      duration_ms: Long,
      rms: Double,
      peak: Double,
      clipped_ratio: Double, // fraction of samples at >= 0.999 full scale
      silence_ratio: Double, // fraction of 20 ms windows under -40 dBFS RMS
      zero_crossing_rate: Double) // crossings per second, channel 0

  private val SilenceRms = math.pow(10.0, -40.0 / 20.0) // -40 dBFS

  /** Decode + featurize per partition. One `AudioSystem` stream per
    * record; PCM integer formats up to 16-bit are decoded directly
    * (the WAV formats the JDK writes/reads natively).
    */
  def features(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(featuresOf))
  }

  private[operators] def featuresOf(r: MediaRow): AudioFeatures = {
    def marker = AudioFeatures(r.doc_id, decoded = false,
      0, 0, 0, 0L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if ((!signed && !unsigned) || (bits != 8 && bits != 16) || ch < 1)
          marker
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * ch
          val nFrames = bytes.length / frameBytes
          if (nFrames == 0) marker
          else {
            val full = (1 << (bits - 1)).toDouble // 128 / 32768
            def sample(frame: Int, c: Int): Double = {
              val off = frame * frameBytes + c * bytesPerSample
              val raw =
                if (bits == 8) {
                  if (unsigned) (bytes(off) & 0xff) - 128
                  else bytes(off).toInt
                } else {
                  val lo = bytes(off) & 0xff
                  val hi = bytes(off + 1)
                  val v =
                    if (fmt.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                    else (hi << 8) | lo
                  if (unsigned) v - 32768 else v
                }
              raw / full
            }
            var sumSq = 0.0
            var peak = 0.0
            var clipped = 0L
            var crossings = 0L
            var prevSign = 0
            // 20 ms silence windows on channel-0 energy
            val winLen = math.max(1, (fmt.getSampleRate * 0.02).toInt)
            var winSumSq = 0.0
            var winN = 0
            var silentWins = 0L
            var totalWins = 0L
            var f = 0
            while (f < nFrames) {
              var c = 0
              while (c < ch) {
                val s = sample(f, c)
                val a = math.abs(s)
                sumSq += s * s
                if (a > peak) peak = a
                if (a >= 0.999) clipped += 1
                c += 1
              }
              val s0 = sample(f, 0)
              val sign = if (s0 > 0) 1 else if (s0 < 0) -1 else prevSign
              if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
              if (sign != 0) prevSign = sign
              winSumSq += s0 * s0
              winN += 1
              if (winN == winLen) {
                totalWins += 1
                if (math.sqrt(winSumSq / winN) < SilenceRms) silentWins += 1
                winSumSq = 0.0
                winN = 0
              }
              f += 1
            }
            if (winN > 0) { // tail window
              totalWins += 1
              if (math.sqrt(winSumSq / winN) < SilenceRms) silentWins += 1
            }
            val n = nFrames.toLong * ch
            val durMs = (nFrames * 1000.0 / fmt.getSampleRate).round
            AudioFeatures(r.doc_id, decoded = true,
              fmt.getSampleRate.toInt, ch, bits, nFrames.toLong, durMs,
              rms = math.sqrt(sumSq / n), peak = peak,
              clipped_ratio = clipped.toDouble / n,
              silence_ratio =
                if (totalWins == 0) 0.0 else silentWins.toDouble / totalWins,
              zero_crossing_rate =
                crossings.toDouble * fmt.getSampleRate / nFrames)
          }
        }
      } finally in.close()
    } catch { case _: Exception => marker }
  }

  /** One analysis window sliced from a document's audio. */
  case class AudioWindow(
      doc_id: Long, window_idx: Long, start_ms: Long,
      rms: Double, voiced: Boolean)

  /** Windowed energy over channel 0 — the audio analogue of
    * [[Multimodal.sampleFrames]], and the substrate of silence-gated
    * segment sampling: `windows(...).filter(_.voiced)` keeps the
    * audible parts of a corpus with per-window cost independent of
    * document length (output rows ∝ duration / stepMs, each 33
    * bytes). `voiced` = window RMS above -40 dBFS.
    */
  def windows(media: Dataset[MediaRow], windowMs: Int = 200,
      stepMs: Int = 100): Dataset[AudioWindow] = {
    require(windowMs > 0 && stepMs > 0, "windowMs/stepMs must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = in.getFormat
            val bits = fmt.getSampleSizeInBits
            val signed = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            if (!signed || bits != 16) Iterator.empty
            else {
              val bytes = in.readAllBytes()
              val ch = fmt.getChannels
              val frameBytes = 2 * ch
              val nFrames = bytes.length / frameBytes
              val win = math.max(1, (fmt.getSampleRate * windowMs / 1000).toInt)
              val step = math.max(1, (fmt.getSampleRate * stepMs / 1000).toInt)
              Iterator.range(0, math.max(0, nFrames - win + 1), step)
                .zipWithIndex.map { case (start, idx) =>
                  var sumSq = 0.0
                  var f = start
                  while (f < start + win) {
                    val off = f * frameBytes
                    val v =
                      if (fmt.isBigEndian)
                        (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                      else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
                    val s = v / 32768.0
                    sumSq += s * s
                    f += 1
                  }
                  val rms = math.sqrt(sumSq / win)
                  AudioWindow(r.doc_id, idx.toLong,
                    (start * 1000.0 / fmt.getSampleRate).round,
                    rms, voiced = rms >= SilenceRms)
                }
            }
          } finally in.close()
        } catch { case _: Exception => Iterator.empty }
      }
    }
  }
}
