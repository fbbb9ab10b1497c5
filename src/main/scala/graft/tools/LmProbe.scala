package graft.tools

import org.apache.spark.sql.functions._

/** Timing probe for the UnigramLm near-bound-document path (the
  * round-9 packing-bound guard): one doc just past MaxChars through
  * pieceVocab and encode. Caught the O(B²) per-block UTF8String
  * substr scan (250 s → 16 s after the seg_chars materialization) —
  * see the scaladoc at UnigramLm.normPieces.
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val long = "a" * (graft.operators.UnigramLm.MaxChars.toInt + 2)
    val docs = Seq((1L, "the cat sat"), (2L, long)).toDF("doc_id", "text")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    t("vocab") { graft.operators.UnigramLm.pieceVocab(docs).count() }
    t("encode") { graft.operators.UnigramLm.encode(docs).count() }
    spark.stop()
  }
}
