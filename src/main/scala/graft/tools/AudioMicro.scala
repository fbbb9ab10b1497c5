package graft.tools

/** Single-threaded microbenchmark of the per-payload audio decode cost:
  * JavaSound stream open vs PCM read vs feature arithmetic.
  */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(2000)
    val text = "the quick brown fox jumps over the lazy dog " * 10 // ~440 chars
    val wavs = (0 until n).map(i => graft.operators.Audio.wavFixture(text + i))

    def bench(label: String)(f: Array[Byte] => Unit): Unit = {
      wavs.take(200).foreach(f) // warm
      val t0 = System.nanoTime()
      wavs.foreach(f)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[micro] $label%-24s total ${ms}%.0f ms  per-doc ${ms / n}%.3f ms")
    }

    bench("open stream only") { b =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      in.close()
    }
    bench("open + readAllBytes") { b =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      in.readAllBytes(); in.close()
    }
    bench("full featuresOf") { b =>
      graft.operators.Audio.featuresOf(
        graft.operators.Multimodal.MediaRow(1L, "audio/wav", b))
    }

    // contention check: same work fanned across 32 platform threads
    for (threads <- Seq(4, 32)) {
      val t0o = System.nanoTime()
      val poolO = java.util.concurrent.Executors.newFixedThreadPool(threads)
      wavs.grouped(math.max(1, n / threads)).toSeq.foreach { chunk =>
        poolO.submit(new Runnable {
          def run(): Unit = chunk.foreach { b =>
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(b))
            in.close()
          }
        })
      }
      poolO.shutdown()
      poolO.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      println(f"[micro] open-only x$threads threads  total ${(System.nanoTime()-t0o)/1e6}%.0f ms")
      // same but through the cached-reader fast path, WAV reader probed first
      val t0c = System.nanoTime()
      val poolC = java.util.concurrent.Executors.newFixedThreadPool(threads)
      wavs.grouped(math.max(1, n / threads)).toSeq.foreach { chunk =>
        poolC.submit(new Runnable {
          def run(): Unit = chunk.foreach { b =>
            val in = graft.operators.Audio.openForTest(b); in.close()
          }
        })
      }
      poolC.shutdown()
      poolC.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      println(f"[micro] open-cached x$threads threads  total ${(System.nanoTime()-t0c)/1e6}%.0f ms")
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val per = wavs.grouped(math.max(1, n / threads)).toSeq
      per.foreach { chunk =>
        pool.submit(new Runnable {
          def run(): Unit = chunk.foreach { b =>
            graft.operators.Audio.featuresOf(
              graft.operators.Multimodal.MediaRow(1L, "audio/wav", b))
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[micro] featuresOf x$threads threads   total ${ms}%.0f ms  per-doc ${ms / n}%.3f ms (wall)")
    }
  }
}
