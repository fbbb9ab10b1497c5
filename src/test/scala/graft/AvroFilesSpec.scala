package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ingest.AvroFiles

class AvroFilesSpec extends SparkTestBase {

  private def md5s(dir: String): Map[String, String] = {
    val s = Files.list(Paths.get(dir))
    try {
      val b = Map.newBuilder[String, String]
      s.iterator().forEachRemaining { p =>
        b += p.getFileName.toString ->
          MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }
      b.result()
    } finally s.close()
  }

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("container round-trip preserves every row and every column") {
    val dir = tmpDir("avrof")
    AvroFiles.write(docs, dir, nFiles = 3, keyCol = "doc_id")
    val back = AvroFiles.read(spark, dir, docs.schema)
    assert(back.schema == docs.schema)
    val orig = docs.orderBy("doc_id").collect()
    val rt = back.orderBy("doc_id").collect()
    assert(rt.length == orig.length)
    assert(rt.sameElements(orig))
  }

  test("writes are deterministic: fixed sync marker, key-sorted layout") {
    val d1 = tmpDir("avrof"); val d2 = tmpDir("avrof")
    AvroFiles.write(docs, d1, nFiles = 3, keyCol = "doc_id")
    AvroFiles.write(docs, d2, nFiles = 3, keyCol = "doc_id")
    val (m1, m2) = (md5s(d1), md5s(d2))
    assert(m1 == m2 && m1.size == 3)
    // container magic per the spec: 'O' 'b' 'j' 0x01
    val head = Files.readAllBytes(
      Paths.get(d1, m1.keys.toSeq.sorted.head)).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)))
  }

  test("a projected write decodes against its matching pinned schema") {
    val dir = tmpDir("avrof")
    AvroFiles.write(docs.select("doc_id", "lang"), dir, 2, "doc_id")
    val ok = AvroFiles.read(spark, dir,
      docs.select("doc_id", "lang").schema).count()
    assert(ok == docs.count())
  }
}
