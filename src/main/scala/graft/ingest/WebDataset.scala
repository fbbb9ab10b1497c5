package graft.ingest

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style POSIX-tar shard sink + source — the packaging
  * format large multimodal training pipelines actually load from
  * (the `webdataset` loader convention: a shard is a plain ustar
  * archive, a SAMPLE is the run of adjacent files sharing a basename —
  * `000123.txt`, `000123.json`, … — so sequential reads stream whole
  * samples with no index).
  *
  * The tar writer/parser here is a from-scratch USTAR implementation
  * (~60 lines): fixed 512-byte headers, octal size fields, the
  * spaces-then-store checksum rule, two zero blocks at end. Headers
  * are fully deterministic (mtime 0, uid/gid 0, mode 0644), so the
  * same input produces byte-identical shards — pinned in
  * WebDatasetSpec, which also cross-checks the parser against `tar tf`
  * conventions via round-trip.
  *
  * Scale shape: `writeShards` assigns each sample a shard by key hash,
  * `repartition(nShards, shard)` + sortWithinPartitions, then STREAMS
  * each partition's samples entry-by-entry into its shard files —
  * executor memory holds one sample, never a shard (the same posture
  * as the S7 partitioned-parquet sink; at 100 TB nShards scales with
  * the cluster and each task owns whole shards). `readShards` rides
  * Spark's `binaryFile` source (one task per shard, the natural
  * parallelism of the format) and explodes samples via the parser in
  * a mapPartitions — the established per-partition-codec exception,
  * since a tar walk is imperative by nature. Shard files are the unit
  * of both parallelism and fault recovery, exactly why the format
  * exists.
  *
  * Reference scope note: the reference repo ships no tar/WebDataset
  * surface; this extends §2.1 source/sink coverage for the
  * training-data mandate (multimodal columns ship as tar shards).
  */
object WebDataset {

  private val BlockSize = 512

  private def padLen(n: Long): Int = ((BlockSize - (n % BlockSize)) % BlockSize).toInt

  /** One USTAR header block. Name must be ≤ 100 ASCII bytes (WebDataset
    * keys are short basenames by construction).
    */
  private[ingest] def headerBlock(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"tar name too long: $name")
    val b = new Array[Byte](BlockSize)
    def put(s: String, off: Int): Unit = {
      val bs = s.getBytes("US-ASCII")
      System.arraycopy(bs, 0, b, off, bs.length)
    }
    put(name, 0)
    put("0000644\u0000", 100)              // mode
    put("0000000\u0000", 108)              // uid
    put("0000000\u0000", 116)              // gid
    put(f"$size%011o" + "\u0000", 124)     // size
    put("00000000000\u0000", 136)          // mtime 0 → deterministic
    b(156) = '0'                           // typeflag: regular file
    put("ustar\u000000", 257)              // magic + version
    // checksum: field as spaces, unsigned byte sum, 6 octal + NUL + space
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    val sum = b.foldLeft(0)((a, x) => a + (x & 0xff))
    put(f"$sum%06o" + "\u0000 ", 148)
    b
  }

  /** Parse a complete tar archive into (name, bytes) entries,
    * checksum-verified. Stops at the first zero block (end marker).
    */
  private[ingest] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + BlockSize <= bytes.length) {
      if (bytes(off) == 0) done = true // end-of-archive zero block
      else {
        val block = java.util.Arrays.copyOfRange(bytes, off, off + BlockSize)
        val name = new String(block, 0, 100, "US-ASCII").takeWhile(_ != 0)
        val sizeField = new String(block, 124, 12, "US-ASCII")
          .takeWhile(c => c != 0 && c != ' ')
        val size = java.lang.Long.parseLong(sizeField.trim, 8)
        val stored = java.lang.Integer.parseInt(
          new String(block, 148, 8, "US-ASCII")
            .takeWhile(c => c != 0 && c != ' ').trim, 8)
        java.util.Arrays.fill(block, 148, 156, ' '.toByte)
        val sum = block.foldLeft(0)((a, x) => a + (x & 0xff))
        require(sum == stored,
          s"tar checksum mismatch at offset $off for $name: $sum != $stored")
        val data = java.util.Arrays.copyOfRange(bytes,
          off + BlockSize, off + BlockSize + size.toInt)
        out += name -> data
        off += BlockSize + size.toInt + padLen(size)
      }
    }
    out.toSeq
  }

  /** Write `samples` — (key: string, files: array<struct<name:string,
    * data:binary>>) — as `nShards` tar shards `shard-NNNNN.tar` under
    * `outDir` (local/posix path; a cluster deployment points at a
    * mounted object store). Shard = xxhash64(key) mod nShards; samples
    * are laid out key-sorted within a shard, adjacent files per
    * sample, streamed entry-by-entry (memory holds one file, never a
    * shard).
    */
  def writeShards(samples: DataFrame, outDir: String, nShards: Int): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val dir = Paths.get(outDir)
    if (Files.exists(dir)) {
      // collect-then-delete (mutating a live directory stream is
      // platform-dependent), close the stream (AvroFiles.write
      // discipline), and only remove regular files — a subdirectory
      // in the output dir is a caller error worth a clear message
      val listing = Files.list(dir)
      val old = try listing.iterator().asScala.toVector finally listing.close()
      old.foreach { p =>
        require(Files.isRegularFile(p), s"writeShards: $p is not a regular file")
        Files.delete(p)
      }
    } else Files.createDirectories(dir)
    samples
      .select(col("key").cast("string").as("key"), col("files"),
        pmod(xxhash64(col("key")), lit(nShards.toLong)).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "key")
      .foreachPartition { rows: Iterator[Row] =>
        // write-temp-then-atomic-rename per shard (AvroFiles.write
        // discipline): concurrent task attempts each own a unique temp
        // file; the rename is the commit, so retries/speculation can
        // never interleave bytes into a final shard path
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        var current = -1L
        var out: BufferedOutputStream = null
        var tmp: java.nio.file.Path = null
        var fin: java.nio.file.Path = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
          out.close(); out = null
          Files.move(tmp, fin,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        rows.foreach { r =>
          val shard = r.getAs[Long]("shard")
          if (shard != current) {
            close()
            current = shard
            fin = Paths.get(outDir, f"shard-$shard%05d.tar")
            tmp = Paths.get(outDir, f".shard-$shard%05d.tar.attempt-$attempt%d.tmp")
            out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
          }
          r.getAs[Seq[Row]]("files").foreach { f =>
            val data = f.getAs[Array[Byte]]("data")
            out.write(headerBlock(f.getAs[String]("name"), data.length.toLong))
            out.write(data)
            out.write(new Array[Byte](padLen(data.length.toLong)))
          }
        }
        close()
      }
  }

  /** Read tar shards back as one row per member file:
    * (shard: string, name: string, key: string, ext: string,
    * data: binary) — `key`/`ext` split on the FIRST dot of the
    * basename, the WebDataset sample-grouping convention (extensions
    * like `seg.png` stay whole). One binaryFile task per shard.
    */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter, not a glob load path (the AvroFiles.read
    // discipline): avoids FileStreamSink's literal-path probe WARN
    // stack trace on every read
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, content) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        parseTar(content).map { case (name, data) =>
          // first dot of the BASENAME: a directory component containing
          // a dot (dir.v1/sample.jpg) must not cut the key there
          val base = name.lastIndexOf('/') + 1
          val cut = name.indexOf('.', base)
          val (key, ext) =
            if (cut < 0) (name, "") else (name.substring(0, cut), name.substring(cut + 1))
          (shard, name, key, ext, data)
        }
      })
      .toDF("shard", "name", "key", "ext", "data")
  }
}
