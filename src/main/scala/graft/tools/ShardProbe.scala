package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord

/** Design-size shard probe: exercises the one-row-per-shard memory
  * contract (SCALE.md §shard census) with shards in the 100 MB–1 GB
  * range the design actually targets — the oracle queries cover the
  * census LOGIC at one-small-shard-per-document granularity, so until
  * this probe nothing had executed a WebDataset-realistic shard (one
  * tar aggregating thousands of members) through the walk.
  *
  * Per-task bound under test: ONE raw shard byte[] for the ustar walk
  * (no member extraction — offsets are header arithmetic), plus ONE
  * inflated copy for the `.tar.gz` path (the bomb-guard's knob).
  * Synthesis and census run in the SAME stage (the map feeds the
  * flatMap pipeline-fused), so exactly `concurrency` shards are in
  * flight at once and nothing shard-sized is shuffled or collected —
  * the executor-memory shape a 1000-task cluster pass has.
  *
  * Member payloads are LCG-filled (deterministic, ~incompressible) for
  * the raw walk; the gz flavor uses zero-filled payloads on purpose:
  * a high-ratio stream is the bomb-guard-adjacent case — a ~1 GB
  * inflation from a few MB compressed — that the guard must ADMIT at
  * the design boundary and reject beyond it.
  *
  * Usage: runMain graft.tools.ShardProbe <nShards> <memberKB>
  *          <membersPerShard> <tar|targz> [concurrency]
  * Prints one JSON line: shard/member census counts, aggregate bytes,
  * wall seconds, effective GB/s.
  */
object ShardProbe extends Serializable {
  def main(args: Array[String]): Unit = {
    val nShards = args(0).toInt
    val memberKB = args(1).toInt
    val membersPerShard = args(2).toInt
    val fmt = args(3)
    val conc = if (args.length > 4) args(4).toInt else 8
    // optional 6th arg "cached": materialize the shards BEFORE the
    // clock so the number is census-only — for formats whose
    // synthesis cost (e.g. gzip-DEFLATING incompressible payloads)
    // would otherwise dominate the fused pipeline and mis-attribute
    val censusOnly = args.length > 5 && args(5) == "cached"
    require(Set("tar", "targz", "tarzst", "zip", "tfrecord", "warcgz",
      "jsonlzst").contains(fmt),
      s"fmt $fmt must be tar|targz|tarzst|zip|tfrecord|warcgz|jsonlzst")
    val spark = SparkSession.builder()
      .master(s"local[$conc]")
      .config("spark.sql.shuffle.partitions", conc)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val memberBytes = memberKB * 1024
    val paddedMember = 512 + (memberBytes + 511) / 512 * 512

    /** byte length of probe JSONL line (id, k): envelope + hex body */
    def jsonlLineLen(id: Long, k: Int): Int =
      s"""{"id":"$id-$k","body":"""".length + memberBytes + 2

    /** Exact raw (pre-gzip) bytes of warc shard `id`: the header is
      * built with a zero-length dummy payload, corrected for the
      * Content-Length digit difference, then payload added (the dummy
      * length already includes the CRLFCRLF trailer).
      */
    def warcRawOf(id: Long): Long =
      (0 until membersPerShard).map { k =>
        MultimodalOps.warcRecordBytes(id, k, "response",
          Array.emptyByteArray, 0, 0).length.toLong -
          1 + memberBytes.toString.length + memberBytes
      }.sum
    val shardBytes: Long = fmt match {
      case "tar" | "targz" | "tarzst" => membersPerShard.toLong * paddedMember + 1024L
      case "zip" => // locals (30 + 17-char name + data) + centrals + EOCD
        membersPerShard.toLong * (30 + 17 + memberBytes) +
          membersPerShard.toLong * (46 + 17) + 22L
      case "jsonlzst" => // raw JSONL bytes: per line, a fixed JSON
        // envelope around a memberKB hex body (ASCII, so raw size is
        // closed-form); REQUIRE-matched via the census's nBytes sum
        (0 until membersPerShard).map(k =>
          jsonlLineLen(0L, k).toLong + 1L).sum
      case "warcgz" => warcRawOf(0L) // raw (uncompressed) record
        // bytes of shard 0; per-shard totals vary only by URI digit
        // counts — the exact cross-shard sum feeds totalRaw below and
        // is REQUIRE-matched against the census's own recordBytes sum
      case _ => // tfrecord: 16-byte framing per record
        membersPerShard.toLong * (16 + memberBytes)
    }

    def buildZipShard(id: Long): Array[Byte] = {
      val out = new Array[Byte](shardBytes.toInt)
      var off = 0
      def u16(v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte; off += 2 }
      def u32(v: Long): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
        out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte; off += 4
      }
      var lcg = id * 6364136223846793005L + 1442695040888963407L
      val crc = new java.util.zip.CRC32
      val offs = new Array[Long](membersPerShard)
      val crcs = new Array[Long](membersPerShard)
      var m = 0
      while (m < membersPerShard) {
        offs(m) = off.toLong
        val data = new Array[Byte](memberBytes)
        var i = 0
        while (i < memberBytes) {
          lcg = lcg * 6364136223846793005L + 1442695040888963407L
          data(i) = (lcg >>> 56).toByte
          i += 1
        }
        crc.reset(); crc.update(data); crcs(m) = crc.getValue
        u32(0x04034b50L); u16(20); u16(0); u16(0); u16(0); u16(0)
        u32(crcs(m)); u32(memberBytes.toLong); u32(memberBytes.toLong)
        u16(17); u16(0)
        f"sample$m%07d.bin".getBytes("US-ASCII").copyToArray(out, off); off += 17
        System.arraycopy(data, 0, out, off, memberBytes); off += memberBytes
        m += 1
      }
      val cdOff = off.toLong
      m = 0
      while (m < membersPerShard) {
        u32(0x02014b50L); u16(20); u16(20); u16(0); u16(0); u16(0); u16(0)
        u32(crcs(m)); u32(memberBytes.toLong); u32(memberBytes.toLong)
        u16(17); u16(0); u16(0); u16(0); u16(0); u32(0L); u32(offs(m))
        f"sample$m%07d.bin".getBytes("US-ASCII").copyToArray(out, off); off += 17
        m += 1
      }
      val cdSize = off.toLong - cdOff
      u32(0x06054b50L); u16(0); u16(0); u16(membersPerShard); u16(membersPerShard)
      u32(cdSize); u32(cdOff); u16(0)
      require(off == shardBytes, s"zip layout $off != $shardBytes")
      out
    }

    def buildTfRecordShard(id: Long): Array[Byte] = {
      val out = new Array[Byte](shardBytes.toInt)
      var off = 0
      var lcg = id * 6364136223846793005L + 1442695040888963407L
      var m = 0
      while (m < membersPerShard) {
        var i = 0
        while (i < 8) { out(off + i) = (memberBytes.toLong >> (8 * i)).toByte; i += 1 }
        val lenCrc = MultimodalOps.maskedCrc32c(out, off, 8)
        i = 0
        while (i < 4) { out(off + 8 + i) = (lenCrc >> (8 * i)).toByte; i += 1 }
        off += 12
        i = 0
        while (i < memberBytes) {
          lcg = lcg * 6364136223846793005L + 1442695040888963407L
          out(off + i) = (lcg >>> 56).toByte
          i += 1
        }
        val dataCrc = MultimodalOps.maskedCrc32c(out, off, memberBytes)
        off += memberBytes
        i = 0
        while (i < 4) { out(off + i) = (dataCrc >> (8 * i)).toByte; i += 1 }
        off += 4
        m += 1
      }
      require(off == shardBytes, s"tfrecord layout $off != $shardBytes")
      out
    }

    def buildShard(id: Long): Array[Byte] = {
      val out = new Array[Byte](shardBytes.toInt)
      var off = 0
      var m = 0
      var lcg = id * 6364136223846793005L + 1442695040888963407L
      while (m < membersPerShard) {
        val h = tarHeader(f"sample$m%07d.bin", memberBytes.toLong)
        System.arraycopy(h, 0, out, off, 512)
        off += 512
        if (fmt == "tar" || fmt == "tarzst") { // LCG fill; targz keeps zeros
          var i = 0
          while (i < memberBytes) {
            lcg = lcg * 6364136223846793005L + 1442695040888963407L
            out(off + i) = (lcg >>> 56).toByte
            i += 1
          }
        }
        off += paddedMember - 512
        m += 1
      }
      out // trailing 1024 zero bytes are the two-zero-block trailer
    }

    def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(1 << 20)
      val gz = new java.util.zip.GZIPOutputStream(bos, 1 << 16)
      gz.write(b); gz.close()
      bos.toByteArray
    }

    val shards = spark.range(0, nShards, 1, nShards).as[Long].map { id =>
      fmt match {
        case "tar" => MediaRecord(id, "application/x-tar", buildShard(id))
        case "targz" => MediaRecord(id, "application/gzip", gzip(buildShard(id)))
        case "tarzst" => MediaRecord(id, "application/zstd",
          com.github.luben.zstd.Zstd.compress(buildShard(id), 3))
        case "zip" => MediaRecord(id, "application/zip", buildZipShard(id))
        case "jsonlzst" =>
          // one JSON doc per line, hex-of-LCG bodies (compressible
          // ~2:1, the realistic text-shard ratio), whole shard one
          // zstd frame (the Dolma layout)
          // capacity is only a hint — clamp it so a >2 GiB configured
          // shard size can't go negative through .toInt and throw
          // NegativeArraySizeException before the probe runs
          val sb = new java.lang.StringBuilder(
            math.min(shardBytes, (Int.MaxValue - 64).toLong).toInt + 64)
          var lcg = id * 6364136223846793005L + 1442695040888963407L
          var k = 0
          val hex = "0123456789abcdef".toCharArray
          while (k < membersPerShard) {
            sb.append("{\"id\":\"").append(id).append('-').append(k)
              .append("\",\"body\":\"")
            var i = 0
            while (i < memberBytes) {
              lcg = lcg * 6364136223846793005L + 1442695040888963407L
              sb.append(hex(((lcg >>> 60) & 0xf).toInt))
              i += 1
            }
            sb.append("\"}\n")
            k += 1
          }
          MediaRecord(id, "application/zstd",
            com.github.luben.zstd.Zstd.compress(
              sb.toString.getBytes("ISO-8859-1"), 3))
        case "warcgz" =>
          // one gzip member per response record (the Common Crawl
          // shape), LCG payloads (~incompressible — worst-case inflate)
          val out = new java.io.ByteArrayOutputStream(1 << 20)
          var lcg = id * 6364136223846793005L + 1442695040888963407L
          var k = 0
          while (k < membersPerShard) {
            val data = new Array[Byte](memberBytes)
            var i = 0
            while (i < memberBytes) {
              lcg = lcg * 6364136223846793005L + 1442695040888963407L
              data(i) = (lcg >>> 56).toByte
              i += 1
            }
            val rec = MultimodalOps.warcRecordBytes(
              id, k, "response", data, 0, data.length)
            val member = new java.io.ByteArrayOutputStream(rec.length / 2)
            val gz = new java.util.zip.GZIPOutputStream(member, 1 << 16)
            gz.write(rec); gz.close()
            member.writeTo(out)
            k += 1
          }
          MediaRecord(id, "application/warc+gz", out.toByteArray)
        case _ => MediaRecord(id, "application/x-tfrecord", buildTfRecordShard(id))
      }
    }

    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sum}
    val timedShards =
      if (censusOnly) {
        val c = shards.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        c.count() // synthesize outside the clock
        c
      } else shards
    val t0 = System.nanoTime()
    // normalize every walk to (id, size) so one agg fits all formats
    val members = fmt match {
      case "tar" => MultimodalOps.tarMembers(timedShards).toDF()
        .select(col("id"), col("size"), lit(0L).as("rec_bytes"))
      case "targz" => MultimodalOps.tarGzMembers(timedShards).toDF()
        .select(col("id"), col("size"), lit(0L).as("rec_bytes"))
      case "tarzst" => MultimodalOps.tarZstMembers(timedShards).toDF()
        .select(col("id"), col("size"), lit(0L).as("rec_bytes"))
      case "zip" => MultimodalOps.zipMembers(timedShards).toDF()
        .select(col("id"), col("uncompSize").as("size"), lit(0L).as("rec_bytes"))
      case "warcgz" => MultimodalOps.warcGzRecords(timedShards).toDF()
        .select(col("id"), col("contentLength").as("size"),
          col("recordBytes").as("rec_bytes"))
      case "jsonlzst" => MultimodalOps.jsonlZstRecords(timedShards).toDF()
        .select(col("id"), lit(memberBytes.toLong).as("size"),
          (col("nBytes") + 1L).as("rec_bytes"))
      case _ => MultimodalOps.tfRecords(timedShards).toDF()
        .select(col("id"), col("length").as("size"), lit(0L).as("rec_bytes"))
    }
    val agg = members.agg(
      count(lit(1)), countDistinct(col("id")), sum(col("size")),
      sum(col("rec_bytes"))).head()
    val (nMembers, nShardsSeen, sumSizes, sumRecBytes) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val wall = (System.nanoTime() - t0) / 1e9
    val totalRaw =
      if (fmt == "warcgz") (0L until nShards.toLong).map(warcRawOf).sum
      else if (fmt == "jsonlzst")
        (0L until nShards.toLong).map(id =>
          (0 until membersPerShard).map(k =>
            jsonlLineLen(id, k).toLong + 1L).sum).sum
      else nShards.toLong * shardBytes
    if (fmt == "warcgz" || fmt == "jsonlzst")
      require(sumRecBytes == totalRaw,
        s"census recordBytes sum $sumRecBytes != computed raw $totalRaw")
    require(nShardsSeen == nShards.toLong,
      s"census saw $nShardsSeen shards, expected $nShards (a shard failed its walk)")
    require(nMembers == nShards.toLong * membersPerShard,
      s"census saw $nMembers members, expected ${nShards.toLong * membersPerShard}")
    require(sumSizes == nShards.toLong * membersPerShard * memberBytes,
      "member size sum mismatch")
    println(
      s"""{"probe":"shard_census","fmt":"$fmt","n_shards":$nShards,""" +
      s""""shard_mb":${shardBytes / 1048576},"members_per_shard":$membersPerShard,""" +
      s""""member_kb":$memberKB,"concurrency":$conc,"n_members":$nMembers,""" +
      s""""total_raw_gb":${f"${totalRaw / 1073741824.0}%.2f"},"wall_sec":${f"$wall%.2f"},""" +
      s""""gb_per_sec":${f"${totalRaw / 1073741824.0 / wall}%.2f"},""" +
      s""""census_only":$censusOnly}""")
    spark.stop()
  }

  /** Real checksummed ustar header (the synthesizeTarShard layout). */
  private def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      var i = 0
      while (i < len - 1) { h(off + i) = padded(i).toByte; i += 1 }
      h(off + len - 1) = 0
    }
    octal(420L, 100, 8)
    octal(0L, 108, 8); octal(0L, 116, 8)
    octal(size, 124, 12)
    octal(0L, 136, 12)
    h(156) = '0'
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    h(262) = 0; h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = ("0" * (6 - cs.length)) + cs
    var j = 0
    while (j < 6) { h(148 + j) = csPad(j).toByte; j += 1 }
    h(154) = 0; h(155) = ' '
    h
  }
}
