package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ingest.WebDataset

class WebDatasetSpec extends SparkTestBase {

  import spark.implicits._

  private def samplesDf(n: Int) = {
    val k = format_string("%08d", col("id"))
    spark.range(n).select(k.as("key"),
      array(
        struct(concat(k, lit(".txt")).as("name"),
          encode(concat(lit("text for "), col("id").cast("string")), "UTF-8")
            .as("data")),
        struct(concat(k, lit(".json")).as("name"),
          encode(concat(lit("{\"id\":"), col("id").cast("string"), lit("}")),
            "UTF-8").as("data"))).as("files"))
  }

  private def md5s(dir: String): Map[String, String] =
    Files.list(Paths.get(dir)).iterator().asScala().map { p =>
      p.getFileName.toString ->
        MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
    }.toMap

  implicit private class IterOps[A](it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  test("round-trip preserves every file byte-for-byte") {
    val dir = tmpDir("wds")
    WebDataset.writeShards(samplesDf(37), dir, nShards = 4)
    val back = WebDataset.readShards(spark, dir)
      .select("name", "data").as[(String, Array[Byte])].collect()
      .map { case (n, d) => n -> new String(d, "UTF-8") }.toMap
    assert(back.size == 74)
    assert(back("00000005.txt") == "text for 5")
    assert(back("00000005.json") == "{\"id\":5}")
    assert((0 until 37).forall(i => back(f"$i%08d.txt") == s"text for $i"))
  }

  test("writes are deterministic: same input, byte-identical shards") {
    val d1 = tmpDir("wds"); val d2 = tmpDir("wds")
    WebDataset.writeShards(samplesDf(25), d1, nShards = 3)
    WebDataset.writeShards(samplesDf(25), d2, nShards = 3)
    val (m1, m2) = (md5s(d1), md5s(d2))
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("ustar structure: header fields, checksum, end marker, adjacency") {
    val dir = tmpDir("wds")
    WebDataset.writeShards(samplesDf(10), dir, nShards = 1)
    val bytes = Files.readAllBytes(Paths.get(dir, "shard-00000.tar"))
    // total length is a whole number of 512 blocks with 2 zero blocks
    assert(bytes.length % 512 == 0)
    assert(bytes.takeRight(1024).forall(_ == 0))
    // first header: ascii name, octal size, POSIX magic, valid checksum
    val h = bytes.take(512)
    val name = new String(h, 0, 100, "US-ASCII").takeWhile(_ != 0)
    assert(name.matches("\\d{8}\\.(txt|json)"))
    assert(new String(h, 257, 5, "US-ASCII") == "ustar")
    assert(h(262) == 0 && h(263) == '0' && h(264) == '0')
    val stored = Integer.parseInt(new String(h, 148, 8, "US-ASCII")
      .takeWhile(c => c != 0 && c != ' ').trim, 8)
    val c = h.clone(); java.util.Arrays.fill(c, 148, 156, ' '.toByte)
    assert(c.foldLeft(0)((a, x) => a + (x & 0xff)) == stored)
    // sample adjacency: parse names in order, every key's files adjacent
    val names = WebDataset.readShards(spark, dir)
      .select("name").as[String].collect()
    val keys = names.map(_.takeWhile(_ != '.'))
    assert(keys.distinct.length == 10)
    assert(keys.grouped(2).forall(g => g.distinct.length == 1),
      "a sample's files must be adjacent in the shard")
    assert(keys.distinct.sameElements(keys.distinct.sorted),
      "samples must be key-sorted within a shard")
  }

  test("multi-dot extensions split on the FIRST dot (the WebDataset " +
      "sample-grouping convention)") {
    val dir = tmpDir("wds")
    // one sample with a compound extension (`seg.png` — segmentation
    // masks in externally produced shards) plus a plain member
    val df = Seq(("sample00", "seg.png", "MASK"), ("sample00", "txt", "BODY"))
      .toDF("key", "ext", "body")
      .groupBy("key")
      .agg(collect_list(struct(
        concat(col("key"), lit("."), col("ext")).as("name"),
        encode(col("body"), "UTF-8").as("data"))).as("files"))
    WebDataset.writeShards(df, dir, nShards = 1)
    val back = WebDataset.readShards(spark, dir)
      .select("key", "ext").as[(String, String)].collect().toSet
    assert(back == Set(("sample00", "seg.png"), ("sample00", "txt")),
      s"got $back")
  }

  test("member names with a dotted directory component split on the " +
      "first dot of the BASENAME, not the path") {
    val dir = tmpDir("wds")
    // dir.v1/sample.jpg: key must be dir.v1/sample, ext jpg — splitting
    // at the path's first dot would yield key 'dir' and a '/' in ext
    val df = Seq(("dir.v1/sample", "jpg", "IMG"))
      .toDF("key", "ext", "body")
      .groupBy("key")
      .agg(collect_list(struct(
        concat(col("key"), lit("."), col("ext")).as("name"),
        encode(col("body"), "UTF-8").as("data"))).as("files"))
    WebDataset.writeShards(df, dir, nShards = 1)
    val back = WebDataset.readShards(spark, dir)
      .select("key", "ext").as[(String, String)].collect().toSet
    assert(back == Set(("dir.v1/sample", "jpg")), s"got $back")
  }

  test("writeShards leaves no temp files and refuses a subdirectory " +
      "in the output dir") {
    val dir = tmpDir("wds")
    WebDataset.writeShards(samplesDf(8), dir, nShards = 2)
    val leftovers = Files.list(Paths.get(dir)).iterator().asScala()
      .map(_.getFileName.toString).toVector
    assert(leftovers.forall(_.matches("shard-\\d{5}\\.tar")),
      s"unexpected files: $leftovers")
    Files.createDirectory(Paths.get(dir, "sub"))
    intercept[IllegalArgumentException] {
      WebDataset.writeShards(samplesDf(2), dir, nShards = 1)
    }
  }

  test("padding edge: file sizes at and around the 512 boundary") {
    val dir = tmpDir("wds")
    val df = Seq((f"${0}%08d", "x" * 511), (f"${1}%08d", "y" * 512),
        (f"${2}%08d", "z" * 513), (f"${3}%08d", ""))
      .toDF("key", "body")
      .select(col("key"), array(struct(
        concat(col("key"), lit(".txt")).as("name"),
        encode(col("body"), "UTF-8").as("data"))).as("files"))
    WebDataset.writeShards(df, dir, nShards = 1)
    val back = WebDataset.readShards(spark, dir)
      .select("key", "data").as[(String, Array[Byte])].collect().toMap
    assert(back(f"${0}%08d").length == 511)
    assert(back(f"${1}%08d").length == 512)
    assert(back(f"${2}%08d").length == 513)
    assert(back(f"${3}%08d").length == 0)
    assert(new String(back(f"${2}%08d"), "UTF-8") == "z" * 513)
  }
}
