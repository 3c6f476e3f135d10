package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) plumbing: opaque `binary` content
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages running as batched partition-local transforms —
  * the Scala analog of `mapInPandas` batch UDFs.
  *
  * Decode is REAL for the container formats whose metadata lives in
  * headers parseable with plain byte arithmetic: BMP (uncompressed
  * `BITMAPINFOHEADER` → true width/height, pixel-level stats), PNG
  * (fixed-offset IHDR → true width/height), JPEG (SOF marker walk →
  * true width/height), WAV (RIFF/WAVE PCM audio → true
  * samples-per-channel/channel count, sample-level stats, real
  * duration), MP4/MOV (ISO BMFF box walk → true tkhd dims + mvhd
  * duration, mdat-region stats), and MKV/WebM (EBML element walk →
  * true PixelWidth/Height + segment duration, Cluster-region stats);
  * declared images the strict parsers reject get a full-pixel attempt
  * through the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP, zero native
  * deps).  Only payloads none of those paths accept fall back to the
  * clearly-marked deterministic STUB (`fakeDecode`), which fabricates
  * plausible dimensions from a content hash — after the container
  * walks above, that surface is the codec PAYLOAD itself (frame
  * pixels / audio samples inside a compressed stream), for which a
  * real implementation would slot javacv/ffmpeg into the same
  * signature; the schema, encoders, batching shape, and
  * partition-preserving execution are identical for real and stub.
  */
object MultimodalOps {

  // ImageIO's default stream cache is DISK-backed: a temp file per
  // image read/write — pure overhead when every payload is already an
  // in-memory byte array, and under a 32-thread decode the /tmp
  // writeback pressure COMPOUNDS across a session (measured: the same
  // sf10 JPEG pass drifting 29 s → 126 s over one bench session).
  // Memory-cached streams are the correct mode for in-memory media;
  // one JVM-wide switch, applied when this object first loads on each
  // executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Spread a fixture-synthesis input across the cluster's cores
    * before the per-row binary build (r18 optimization).  The
    * synthesize* inputs are small parquet tables that arrive as ONE
    * scan split (a 0.6 MB file is one 128 MB split), so the expensive
    * per-row encoder map ran single-threaded regardless of core count
    * — measured 1.6 s for 5000 Puffin rows on local[32], i.e. a
    * 32-core machine doing 1-core work (guide §2.5 "input skew ...
    * repartition immediately after the read").  Round-robin
    * repartition with an EXPLICIT count (defaultParallelism) is used
    * deliberately: AQE's partition coalescing would merge a tiny
    * keyed shuffle right back to one partition (advisory size 64 MB),
    * and an explicit-N repartition is exempt from coalescing.  The
    * count rides `defaultParallelism` (total cores, any master), not
    * a constant.  Fixture synthesis is the oracle-gate's staging
    * step, bounded by the documents table — the decode operators
    * downstream inherit this partitioning, which is exactly the
    * fan-out they want.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    // idempotence: a caller that already round-robin-repartitioned the
    // input (directly or under narrow Filter/Project wrappers) has done
    // the fan-out — re-exchanging per synthesize call would pay one
    // tiny shuffle PER ARM in mixed-corpus queries (q_media_sniff's
    // nine filtered arms measured +0.3-0.75 s from nine exchanges).
    // Only explicit round-robin Repartition matches; keyed/range
    // repartitions serve other purposes and still get the fan-out.
    // Session conf `graft.spread.force=true` (per-session, visible in
    // the UI Environment tab, restorable in tests) disables the
    // idempotence skip — a diagnostic escape hatch for comparing the
    // one-exchange-per-arm shape; only an explicit `true` forces it.
    import org.apache.spark.sql.catalyst.plans.logical._
    def alreadySpread(p: LogicalPlan): Boolean = p match {
      case r: Repartition => r.shuffle
      case f: Filter => alreadySpread(f.child)
      case pr: Project => alreadySpread(pr.child)
      case _ => false
    }
    val force = df.sparkSession.conf.getOption("graft.spread.force")
      .exists(_.trim.equalsIgnoreCase("true"))
    if (!force && alreadySpread(df.queryExecution.analyzed)) df
    else df.repartition(math.max(1,
      df.sparkSession.sparkContext.defaultParallelism))
  }

  /** An opaque media row: the content bytes plus caller metadata. */
  final case class MediaRecord(id: Long, kind: String, content: Array[Byte])

  /** Decoded per-item features (what a real decoder would emit).
    * `durationMs` is REAL where the container carries timing (WAV
    * sample count/rate, MP4 mvhd, MKV segment info) and 0 for stills
    * and for the stub — the fake path fabricates no timing.
    */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      width: Int,
      height: Int,
      meanByte: Double,
      byteHistogram: Array[Long], // 16 buckets
      frameOffsets: Array[Int], // "sampled frames" for video-ish kinds
      durationMs: Long = 0L)

  /** STUB decode: deterministic pseudo-decode from the raw bytes.
    * A real implementation would call the codec here — signature and
    * batch shape stay identical.
    */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    val n = bytes.length
    var h = 1125899906842597L // FNV-ish deterministic content hash
    var i = 0
    while (i < n) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val hist = new Array[Long](16)
    var sum = 0L
    i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      hist(b / 16) += 1
      sum += b
      i += 1
    }
    val w = 64 + math.floorMod(h, 577L).toInt // fake dims, content-stable
    val ht = 64 + math.floorMod(h >>> 13, 449L).toInt
    val frames = // "frame-sample": every ~n/8 bytes as a fake frame offset
      if (n == 0) Array.empty[Int]
      else (0 until math.min(8, n)).map(j => j * math.max(1, n / 8)).toArray
    MediaFeatures(r.id, r.kind, n, w, ht,
      if (n == 0) 0.0 else sum.toDouble / n, hist, frames)
  }

  /** Byte-level stats over a region: (histogram-16, byte sum). */
  private def byteStats(bytes: Array[Byte], from: Int, until: Int): (Array[Long], Long) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = math.max(0, from)
    val end = math.min(bytes.length, until)
    while (i < end) {
      val b = bytes(i) & 0xff
      hist(b / 16) += 1
      sum += b
      i += 1
    }
    (hist, sum)
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt
  // PNG/JPEG headers are big-endian, unlike BMP/WAV
  private def u16be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** REAL decode of an uncompressed BMP (`BITMAPINFOHEADER`, BI_RGB):
    * true width/height from the fixed-offset header, byte stats over
    * the PIXEL region only.  Strict validation (magic, DIB size 40,
    * compression 0, sane dims, pixel offset in range) so arbitrary
    * binary/text payloads can never false-positive into an "image".
    */
  private[graft] def decodeBmp(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (u32(b, 14) != 40L) return None // BITMAPINFOHEADER only
    if (u32(b, 30) != 0L) return None // BI_RGB (uncompressed)
    val width = i32(b, 18)
    val heightRaw = i32(b, 22) // negative = top-down row order
    val height = math.abs(heightRaw)
    val bpp = u16(b, 28)
    val pixelOff = u32(b, 10)
    if (width <= 0 || width > 65536 || height <= 0 || height > 65536) return None
    if (bpp != 8 && bpp != 24 && bpp != 32) return None
    if (pixelOff < 54 || pixelOff >= b.length) return None
    // rows are padded to 4-byte boundaries
    val rowBytes = ((width * bpp / 8) + 3) / 4 * 4
    if (pixelOff + rowBytes.toLong * height > b.length) return None
    val (hist, sum) = byteStats(b, pixelOff.toInt, (pixelOff + rowBytes.toLong * height).toInt)
    val n = rowBytes.toLong * height
    Some(MediaFeatures(r.id, r.kind, b.length, width, height,
      if (n == 0) 0.0 else sum.toDouble / n, hist, Array.empty[Int]))
  }

  /** REAL decode of a PNG header: true width/height from the IHDR
    * chunk, whose offsets are FIXED by the spec (8-byte signature, then
    * the IHDR chunk must come first: length 13, type "IHDR", width/
    * height as big-endian u32 at offsets 16/20) — pure byte
    * arithmetic, so a SQL engine with byte access replays it exactly.
    * Byte stats cover the post-IHDR chunk stream (offset 33 onward:
    * PLTE/IDAT/IEND), the PNG analog of the BMP pixel region — the
    * IDAT payload itself is DEFLATE-compressed, so pixel-level stats
    * would need inflation (see [[imageIoDecode]] for that path).
    */
  private[graft] def decodePng(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 33) return None
    if (!((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a)) return None
    if (u32be(b, 8) != 13L) return None // IHDR data length is fixed
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = u32be(b, 16)
    val height = u32be(b, 20)
    if (width <= 0 || width > 65536 || height <= 0 || height > 65536) return None
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    if (bitDepth != 1 && bitDepth != 2 && bitDepth != 4 &&
      bitDepth != 8 && bitDepth != 16) return None
    if (colorType != 0 && colorType != 2 && colorType != 3 &&
      colorType != 4 && colorType != 6) return None
    val (hist, sum) = byteStats(b, 33, b.length)
    val n = b.length - 33
    Some(MediaFeatures(r.id, r.kind, b.length, width.toInt, height.toInt,
      if (n <= 0) 0.0 else sum.toDouble / n, hist, Array.empty[Int]))
  }

  /** REAL decode of a JPEG header: SOI then a marker walk to the first
    * SOF segment (C0-CF minus DHT/JPG/DAC), where height/width sit at
    * fixed in-segment offsets as big-endian u16.  Unlike PNG the SOF
    * position is data-dependent, so this is loop-over-markers byte
    * arithmetic — real dims, not SQL-replayable; stats cover the
    * whole post-SOI stream.
    */
  private[graft] def decodeJpeg(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var off = 2
    while (off + 2 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val marker = b(off + 1) & 0xff
      if (marker == 0xff) { off += 1 } // fill bytes before a marker
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) off += 2
      else {
        if (off + 4 > b.length) return None
        val len = u16be(b, off + 2)
        if (len < 2 || off + 2 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return None
          val height = u16be(b, off + 5)
          val width = u16be(b, off + 7)
          if (width <= 0 || width > 65536 || height <= 0 || height > 65536)
            return None
          val (hist, sum) = byteStats(b, 2, b.length)
          val n = b.length - 2
          return Some(MediaFeatures(r.id, r.kind, b.length, width, height,
            if (n <= 0) 0.0 else sum.toDouble / n, hist, Array.empty[Int]))
        }
        if (marker == 0xda) return None // entropy stream reached, no SOF
        off += 2 + len
      }
    }
    None
  }

  /** Last-chance REAL image decode via the JDK's `javax.imageio` (zero
    * native deps — PNG/JPEG/GIF/BMP readers ship with the JRE): full
    * pixel decode, true dims, stats over the raw bytes.  Used only
    * when the pure header parsers fail (exotic container layouts the
    * strict fixed-offset validation rejects) — its output is real but
    * NOT byte-arithmetic-replayable by a SQL oracle, so oracle-gated
    * surfaces synthesize containers the header parsers accept.  Any
    * decoder throw degrades to None: decode failure must not kill a
    * 100 TB pass.
    */
  private[graft] def imageIoDecode(r: MediaRecord): Option[MediaFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (hist, sum) = byteStats(r.content, 0, r.content.length)
        val n = r.content.length
        Some(MediaFeatures(r.id, r.kind, n, img.getWidth, img.getHeight,
          if (n == 0) 0.0 else sum.toDouble / n, hist, Array.empty[Int]))
      }
    } catch { case _: Throwable => None }

  /** REAL decode of a RIFF/WAVE PCM file: walks the chunk list for
    * `fmt ` + `data`, yielding true samples-per-channel (width) and
    * channel count (height), byte stats over the SAMPLE region, and 8
    * evenly-spaced frame offsets into the data chunk (the audio analog
    * of frame sampling).
    */
  private[graft] def decodeWav(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var channels = 0
    var blockAlign = 0
    var sampleRate = 0L
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = u32(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        if (u16(b, off + 8) != 1) return None // PCM only
        channels = u16(b, off + 10)
        sampleRate = u32(b, off + 12)
        blockAlign = u16(b, off + 20)
        if (channels <= 0 || channels > 64 || blockAlign <= 0) return None
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = size.toInt
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    if (channels == 0 || dataOff < 0) return None
    val (hist, sum) = byteStats(b, dataOff, dataOff + dataLen)
    // offsets are PAYLOAD-relative (dataOff added) so the field means
    // the same thing on the real and stub decode paths (ADVICE r04)
    val frames =
      if (dataLen == 0) Array.empty[Int]
      else (0 until math.min(8, dataLen)).map(j => dataOff + j * math.max(1, dataLen / 8)).toArray
    val samplesPerChannel = dataLen / blockAlign
    Some(MediaFeatures(r.id, r.kind, b.length,
      samplesPerChannel, channels,
      if (dataLen == 0) 0.0 else sum.toDouble / dataLen, hist, frames,
      // real audio duration: sample count over the fmt chunk's rate
      if (sampleRate > 0) samplesPerChannel * 1000L / sampleRate else 0L))
  }

  private def u64be(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** REAL decode of an ISO BMFF (MP4/MOV) container header: box walk
    * for `ftyp` (magic gate) then `moov`, whose `mvhd` carries
    * timescale+duration (→ true duration in ms) and whose first video
    * `trak`/`tkhd` carries width/height as 16.16 fixed-point — the
    * same pure byte arithmetic as the PNG IHDR path, so a synthesized
    * container replays in SQL.  Byte stats cover the `mdat` payload
    * region(s) — the media-bytes analog of the BMP pixel region; the
    * codec payload itself stays undecoded (that is the one remaining
    * stub surface, by design).  64-bit largesize boxes and a size-0
    * (to end of file) final box are handled; anything structurally
    * inconsistent returns None and falls through to the stub.
    *
    * FRAGMENTED MP4 (fMP4 — the layout every streaming packager
    * emits: `moov` with duration 0 + repeating `moof`/`mdat` pairs)
    * is fully walked too: duration resolves, in order, from (1) the
    * classic `mvhd` duration when non-zero, (2) `mvex`/`mehd`'s
    * whole-presentation fragment_duration (movie timescale), (3) the
    * fragments themselves — max over fragments of `tfdt` base time +
    * that fragment's `trun` sample-duration sum (falling back to
    * Σ trun durations when no `tfdt` is present), in the first
    * track's `mdhd` timescale.  Per-sample trun durations, `tfhd`
    * defaults, and `trex` defaults are honored in that priority
    * order, all pure box arithmetic (ISO 14496-12 §8.8).
    */
  private[graft] def decodeMp4(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 16) return None
    // magic gate: first box must be ftyp (ISO 14496-12 §4.3)
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    var width = 0
    var height = 0
    var durationMs = 0L
    val hist = new Array[Long](16)
    var mdatSum = 0L
    var mdatLen = 0L
    var firstMdat = -1 // payload bounds of the FIRST mdat the walk sees
    var firstMdatEnd = -1
    // fMP4 state (ISO 14496-12 §8.8): movie/track timescales, defaults,
    // and per-fragment accumulation
    var movieTimescale = 0L
    var mvhdDuration = 0L
    var mehdDuration = -1L
    var trackTimescale = 0L // first mdhd wins (dims convention: first track)
    var trexDefaultDur = 0L
    var tfhdDefaultDur = 0L // reset per traf
    var curTfdtBase = -1L // reset per traf
    var curTrafDur = 0L // trun sample-duration sum, reset per traf
    var fragEndMax = 0L // max over fragments of tfdt + Σdur
    var fragAccum = 0L // Σ over all fragments of Σdur (no-tfdt fallback)
    var sawTfdt = false

    // walk one box level in [from, until); returns false on malformed
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val size32 = u32be(b, off)
        val t0 = b(off + 4); val t1 = b(off + 5); val t2 = b(off + 6); val t3 = b(off + 7)
        var header = 8L
        val size: Long =
          if (size32 == 1L) { // 64-bit largesize
            if (off + 16 > until) return false
            header = 16L; u64be(b, off + 8)
          } else if (size32 == 0L) (until - off).toLong // box runs to end
          else size32
        if (size < header || off + size > until) return false
        val payload = off + header.toInt
        val payloadEnd = (off + size).toInt
        def is(a: Char, bb: Char, c: Char, d: Char) =
          t0 == a && t1 == bb && t2 == c && t3 == d
        if (is('m', 'o', 'o', 'v') || is('t', 'r', 'a', 'k') ||
            is('m', 'd', 'i', 'a') || is('m', 'v', 'e', 'x') ||
            is('m', 'o', 'o', 'f')) {
          if (depth < 4 && !walk(payload, payloadEnd, depth + 1)) return false
        } else if (is('t', 'r', 'a', 'f')) {
          tfhdDefaultDur = trexDefaultDur
          curTfdtBase = -1L
          curTrafDur = 0L
          if (depth < 4 && !walk(payload, payloadEnd, depth + 1)) return false
          if (curTfdtBase >= 0L) {
            sawTfdt = true
            val end = curTfdtBase + curTrafDur
            if (end > fragEndMax) fragEndMax = end
          }
          fragAccum += curTrafDur
        } else if (is('m', 'v', 'h', 'd')) {
          if (payloadEnd - payload < 4) return false
          val version = b(payload) & 0xff
          if (version == 0) {
            if (payloadEnd - payload < 20) return false
            movieTimescale = u32be(b, payload + 12)
            mvhdDuration = u32be(b, payload + 16)
          } else if (version == 1) {
            if (payloadEnd - payload < 28) return false
            movieTimescale = u32be(b, payload + 20)
            mvhdDuration = u64be(b, payload + 24)
          } else return false
        } else if (is('m', 'd', 'h', 'd')) {
          if (payloadEnd - payload < 4) return false
          val version = b(payload) & 0xff
          if (version == 0) {
            if (payloadEnd - payload < 16) return false
            if (trackTimescale == 0L) trackTimescale = u32be(b, payload + 12)
          } else if (version == 1) {
            if (payloadEnd - payload < 24) return false
            if (trackTimescale == 0L) trackTimescale = u32be(b, payload + 20)
          } else return false
        } else if (is('m', 'e', 'h', 'd')) {
          if (payloadEnd - payload < 8) return false
          val version = b(payload) & 0xff
          if (version == 0) mehdDuration = u32be(b, payload + 4)
          else if (version == 1) {
            if (payloadEnd - payload < 12) return false
            mehdDuration = u64be(b, payload + 4)
          } else return false
        } else if (is('t', 'r', 'e', 'x')) {
          if (payloadEnd - payload < 24) return false
          trexDefaultDur = u32be(b, payload + 12)
        } else if (is('t', 'f', 'h', 'd')) {
          if (payloadEnd - payload < 8) return false
          val flags = u32be(b, payload).toInt & 0xffffff
          var pos = payload + 8
          if ((flags & 0x01) != 0) pos += 8 // base-data-offset
          if ((flags & 0x02) != 0) pos += 4 // sample-description-index
          if ((flags & 0x08) != 0) { // default-sample-duration
            if (pos + 4 > payloadEnd) return false
            tfhdDefaultDur = u32be(b, pos)
          }
        } else if (is('t', 'f', 'd', 't')) {
          if (payloadEnd - payload < 8) return false
          val version = b(payload) & 0xff
          if (version == 0) curTfdtBase = u32be(b, payload + 4)
          else if (version == 1) {
            if (payloadEnd - payload < 12) return false
            curTfdtBase = u64be(b, payload + 4)
          } else return false
        } else if (is('t', 'r', 'u', 'n')) {
          if (payloadEnd - payload < 8) return false
          val flags = u32be(b, payload).toInt & 0xffffff
          val sampleCount = u32be(b, payload + 4)
          var pos = payload + 8
          if ((flags & 0x01) != 0) pos += 4 // data-offset
          if ((flags & 0x04) != 0) pos += 4 // first-sample-flags
          if ((flags & 0x100) != 0) { // per-sample durations present
            var perSample = 0
            if ((flags & 0x200) != 0) perSample += 4
            if ((flags & 0x400) != 0) perSample += 4
            if ((flags & 0x800) != 0) perSample += 4
            var i = 0L
            while (i < sampleCount) {
              if (pos + 4 > payloadEnd) return false
              curTrafDur += u32be(b, pos)
              pos += 4 + perSample
              i += 1
            }
          } else curTrafDur += sampleCount * tfhdDefaultDur
        } else if (is('t', 'k', 'h', 'd')) {
          if (payloadEnd - payload < 4) return false
          val version = b(payload) & 0xff
          // width/height are the LAST 8 payload bytes (16.16 fixed)
          // for both versions; keep the first video track's dims
          if (payloadEnd - payload < (if (version == 0) 84 else 96)) return false
          val w = (u32be(b, payloadEnd - 8) >> 16).toInt
          val h = (u32be(b, payloadEnd - 4) >> 16).toInt
          if (width == 0 && w > 0 && h > 0 && w <= 65536 && h <= 65536) {
            width = w; height = h
          }
        } else if (is('m', 'd', 'a', 't')) {
          if (firstMdat < 0) { firstMdat = payload; firstMdatEnd = payloadEnd }
          val (hs, s) = byteStats(b, payload, payloadEnd)
          var i = 0
          while (i < 16) { hist(i) += hs(i); i += 1 }
          mdatSum += s
          mdatLen += (payloadEnd - payload).toLong
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0)) return None
    // duration priority: classic mvhd → mehd whole-presentation
    // declaration → fragment accumulation (tfdt+trun in the track
    // timescale; Σ trun when no tfdt)
    durationMs =
      if (mvhdDuration > 0L && movieTimescale > 0L)
        mvhdDuration * 1000L / movieTimescale
      else if (mehdDuration >= 0L && movieTimescale > 0L)
        mehdDuration * 1000L / movieTimescale
      else if (trackTimescale > 0L)
        (if (sawTfdt) fragEndMax else fragAccum) * 1000L / trackTimescale
      else 0L
    if (width == 0 && durationMs == 0L) return None // no moov content parsed
    // evenly-spaced offsets into the FIRST mdat's own payload — bounds
    // come from the SAME validated walk that counted the bytes, and a
    // multi-mdat file must not let the total length spill the offsets
    // past the first region into unrelated boxes
    val frames =
      if (firstMdat < 0) Array.empty[Int]
      else {
        val len = firstMdatEnd - firstMdat
        if (len <= 0) Array.empty[Int]
        else (0 until math.min(8, len))
          .map(j => firstMdat + j * math.max(1, len / 8)).toArray
      }
    Some(MediaFeatures(r.id, r.kind, b.length, width, height,
      if (mdatLen == 0) 0.0 else mdatSum.toDouble / mdatLen, hist, frames,
      durationMs))
  }

  /** REAL decode of a Matroska/WebM (EBML) container header: varint
    * element walk through Segment → Info (TimestampScale + Duration →
    * true duration in ms) and Tracks → TrackEntry → Video
    * (PixelWidth/PixelHeight) — byte arithmetic only, no codec work.
    * Byte stats cover Cluster payloads (the media-bytes region).
    * Unknown-size elements (all-ones varint, common for streamed
    * Segments) are accepted for Segment only; anything else malformed
    * returns None and falls through to the stub.
    */
  private[graft] def decodeMkv(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 8) return None
    if (!((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)) return None
    var width = 0
    var height = 0
    var durationScaled = Double.NaN // in TimestampScale units
    var tsScaleNs = 1000000L // EBML default: 1ms
    val hist = new Array[Long](16)
    var clSum = 0L
    var clLen = 0L

    // EBML varints: ID keeps the marker bit, SIZE strips it
    def varint(off: Int, keepMarker: Boolean): Option[(Long, Int, Boolean)] = {
      if (off >= b.length) return None
      val first = b(off) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (len < 1 || len > 8 || off + len > b.length) return None
      var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
      var allOnes = !keepMarker && (first & (0xff >>> len)) == (0xff >>> len)
      var i = 1
      while (i < len) {
        val byte = b(off + i) & 0xff
        if (byte != 0xff) allOnes = false
        v = (v << 8) | byte
        i += 1
      }
      Some((v, len, allOnes))
    }
    def uintAt(off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }
    def floatAt(off: Int, len: Int): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(uintAt(off, 4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(off, 8))
      else Double.NaN

    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off < until) {
        val (id, idLen, _) = varint(off, keepMarker = true).getOrElse(return false)
        val (sz, szLen, unknown) = varint(off + idLen, keepMarker = false).getOrElse(return false)
        val payload = off + idLen + szLen
        val payloadEnd =
          if (unknown) { if (id == 0x18538067L) until else return false }
          else {
            val e = payload + sz
            if (e > until || sz < 0) return false
            e.toInt
          }
        id match {
          case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xAEL | 0xE0L => // Segment/Info/Tracks/TrackEntry/Video
            if (depth < 6 && !walk(payload, payloadEnd, depth + 1)) return false
          case 0x2AD7B1L => // TimestampScale (ns)
            val v = uintAt(payload, payloadEnd - payload)
            if (v > 0) tsScaleNs = v
          case 0x4489L => // Duration (float, TimestampScale units)
            durationScaled = floatAt(payload, payloadEnd - payload)
          case 0xB0L => // PixelWidth
            val v = uintAt(payload, payloadEnd - payload).toInt
            if (width == 0 && v > 0 && v <= 65536) width = v
          case 0xBAL => // PixelHeight
            val v = uintAt(payload, payloadEnd - payload).toInt
            if (height == 0 && v > 0 && v <= 65536) height = v
          case 0x1F43B675L => // Cluster: media bytes
            val (hs, s) = byteStats(b, payload, payloadEnd)
            var i = 0
            while (i < 16) { hist(i) += hs(i); i += 1 }
            clSum += s
            clLen += (payloadEnd - payload).toLong
          case _ => // skip (EBML header, codec private, ...)
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0)) return None
    val durationMs =
      if (durationScaled.isNaN || durationScaled < 0) 0L
      else (durationScaled * tsScaleNs / 1e6).toLong
    if (width == 0 && durationMs == 0L) return None
    Some(MediaFeatures(r.id, r.kind, b.length, width, height,
      if (clLen == 0) 0.0 else clSum.toDouble / clLen, hist, Array.empty[Int],
      durationMs))
  }

  /** Real decoders first (cheap header probes), stub for everything
    * else; a malformed container that passes the magic probe but fails
    * validation also falls back rather than erroring — decode failure
    * must not kill a 100 TB pass.
    *
    * Dispatch is gated on the declared `kind` prefix AND the magic
    * probe (ADVICE r04): a text payload that happens to pass BMP/WAV
    * framing validation must not silently get region-limited stats.
    * Only the media top-level types (`image/ audio/ video/`) narrow the
    * probe and only `text/` suppresses it; absent kinds AND generic
    * MIME kinds (`application/octet-stream`, vendor types, ...) probe
    * both formats (ADVICE r05), so callers without *meaningful* typed
    * metadata keep real decode.  A null content payload degrades to
    * empty-payload stub stats — decode failure must not kill a 100 TB
    * pass (ADVICE r05).
    */
  private[graft] def decode(rec: MediaRecord): MediaFeatures = {
    val r = if (rec.content == null) rec.copy(content = Array.empty[Byte]) else rec
    val k = if (r.kind == null) "" else r.kind
    val top = k.takeWhile(_ != '/')
    // typed = a top-level MIME type whose media semantics we understand;
    // anything else ("", bare tags, application/*, vendor trees) is untyped
    val typed = k.contains("/") &&
      (top == "image" || top == "audio" || top == "video" || top == "text")
    val untyped = !typed
    val tryImage = untyped || top == "image"
    val tryVideo = untyped || top == "video"
    val tryWav = untyped || top == "audio" || top == "video"
    // cheap fixed-offset header probes run for untyped payloads too;
    // the heavyweight ImageIO full decode only for DECLARED images the
    // strict parsers reject (probing every untyped payload through
    // ImageIO would put a codec attempt on each of 100 TB of rows)
    (if (tryImage) decodeBmp(r).orElse(decodePng(r)).orElse(decodeJpeg(r))
     else None)
      .orElse(if (tryVideo) decodeMp4(r).orElse(decodeMkv(r)) else None)
      .orElse(if (tryWav) decodeWav(r) else None)
      .orElse(if (top == "image") imageIoDecode(r) else None)
      .getOrElse(fakeDecode(r))
  }

  /** Batched decode over partitions: items are processed in
    * `batchSize` groups (the shape a vectorized codec / accelerator
    * wants), partition-preserving (no shuffle).
    */
  def decodeFeatures(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would decode the whole batch in one native call
        batch.map(decode)
      }
    }
  }

  /** "Resize": deterministic downscale of the fake dimensions —
    * demonstrates a second chained partition-local stage.  For REAL
    * byte-level resizing of decodable payloads see [[resizeBmp]].
    */
  def resize(ds: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** REAL pixel resize for uncompressed 24-bit BMP payloads:
    * nearest-neighbor sampling over the actual pixel rows, emitting a
    * NEW valid BMP (fresh header, re-padded rows) that [[decodeBmp]]'s
    * strict validator accepts.  Every output byte is a pure function
    * of the input bytes — deterministic across runs and partitionings.
    * Returns None for payloads the strict parser rejects or for
    * non-24-bit layouts; images already within `maxSide` pass through
    * unchanged (byte-identical).  The media analog of a projection:
    * partition-local, no shuffle, bounded memory (two row buffers).
    */
  private[graft] def resizeBmp(
      rec: MediaRecord, maxSide: Int): Option[MediaRecord] = {
    require(maxSide > 0, s"resizeBmp: maxSide=$maxSide must be positive")
    val b = rec.content
    val f = decodeBmp(rec).getOrElse(return None)
    if (u16(b, 28) != 24) return None           // pixel math is 24-bit only
    val (w, h) = (f.width, f.height)
    if (math.max(w, h) <= maxSide) return Some(rec)
    val topDown = i32(b, 22) < 0                 // row order flag survives
    val scale = maxSide.toDouble / math.max(w, h)
    val nw = math.max(1, (w * scale).toInt)
    val nh = math.max(1, (h * scale).toInt)
    val srcStride = (w * 3 + 3) / 4 * 4
    val dstStride = (nw * 3 + 3) / 4 * 4
    val pixelOff = u32(b, 10).toInt
    val out = new Array[Byte](54 + dstStride * nh)
    System.arraycopy(bmpHeader(nw, nh), 0, out, 0, 54)
    var yd = 0
    while (yd < nh) {
      // nearest source row; stored order is bottom-up unless topDown
      val ys = math.min(h - 1, (yd / scale).toInt)
      val srcRow = pixelOff + (if (topDown) ys else h - 1 - ys) * srcStride
      val dstRow = 54 + (nh - 1 - yd) * dstStride   // write bottom-up
      var xd = 0
      while (xd < nw) {
        val xs = math.min(w - 1, (xd / scale).toInt)
        out(dstRow + xd * 3) = b(srcRow + xs * 3)
        out(dstRow + xd * 3 + 1) = b(srcRow + xs * 3 + 1)
        out(dstRow + xd * 3 + 2) = b(srcRow + xs * 3 + 2)
        xd += 1
      }
      yd += 1
    }
    Some(MediaRecord(rec.id, rec.kind, out))
  }

  /** Dataset form of [[resizeBmp]]: BMPs above `maxSide` shrink,
    * everything else (other formats, rejects, already-small images)
    * passes through untouched.
    */
  def resizeBmpPayloads(
      ds: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r =>
      if (r.kind == "image/bmp") resizeBmp(r, maxSide).getOrElse(r) else r)
  }

  /** REAL PCM downsample for WAV payloads — the audio analog of
    * [[resizeBmp]]: keep every `factor`-th FRAME (all channels of one
    * sample stay together: `blockAlign` bytes), emit a fresh
    * canonical 44-byte-header WAV with the sample rate, byte rate and
    * data size rescaled, which [[decodeWav]]'s strict parser accepts.
    * Nearest-frame decimation (no filtering) — deterministic pure
    * byte function; anti-alias filtering is a numerics choice layered
    * on top, not a plumbing concern.  None for payloads the strict
    * parser rejects; factor 1 passes through.
    */
  private[graft] def downsampleWav(
      rec: MediaRecord, factor: Int): Option[MediaRecord] = {
    require(factor >= 1, s"downsampleWav: factor=$factor must be >= 1")
    if (factor == 1) return Some(rec)
    val b = rec.content
    if (decodeWav(rec).isEmpty) return None
    // re-walk the chunks for the fields decodeWav does not surface
    var off = 12
    var channels = 0; var blockAlign = 0; var sampleRate = 0L
    var bitsPerSample = 0; var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = u32(b, off + 4)
      if (id == "fmt ") {
        channels = u16(b, off + 10)
        sampleRate = u32(b, off + 12)
        blockAlign = u16(b, off + 20)
        bitsPerSample = u16(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size.toInt }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    val nFrames = dataLen / blockAlign
    val outFrames = (nFrames + factor - 1) / factor
    val outLen = outFrames * blockAlign
    val newRate = math.max(1L, sampleRate / factor)
    def u16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val header =
      "RIFF".getBytes("US-ASCII") ++ u32a(36L + outLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ u32a(16L) ++ u16a(1) ++ u16a(channels) ++
      u32a(newRate) ++ u32a(newRate * blockAlign) ++ u16a(blockAlign) ++
      u16a(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ u32a(outLen.toLong)
    val out = new Array[Byte](44 + outLen)
    System.arraycopy(header, 0, out, 0, 44)
    var i = 0
    while (i < outFrames) {
      System.arraycopy(b, dataOff + i * factor * blockAlign,
        out, 44 + i * blockAlign, blockAlign)
      i += 1
    }
    Some(MediaRecord(rec.id, rec.kind, out))
  }

  /** Dataset form of [[downsampleWav]] (pass-through for other kinds). */
  def downsampleWavPayloads(
      ds: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r =>
      if (r.kind == "audio/wav") downsampleWav(r, factor).getOrElse(r) else r)
  }

  /** Canonical 54-byte BMP header (`BITMAPINFOHEADER`, BI_RGB 24-bit)
    * for the synthesizer below — little-endian fixed offsets, the
    * exact layout [[decodeBmp]] validates.
    */
  private def bmpHeader(width: Int, height: Int): Array[Byte] = {
    def u16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def u32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val rowBytes = (width * 3 + 3) / 4 * 4
    val imgSize = rowBytes * height
    Array[Byte]('B', 'M') ++ u32(54 + imgSize) ++ u32(0) ++ u32(54) ++
      u32(40) ++ u32(width) ++ u32(height) ++ u16(1) ++ u16(24) ++ u32(0) ++
      u32(imgSize) ++ u32(2835) ++ u32(2835) ++ u32(0) ++ u32(0)
  }

  /** Synthesizes a REAL uncompressed 24-bit BMP per row: the constant
    * header literal plus the first `rowBytes(width) * height` UTF-8
    * bytes of `textCol` (zero-padded) as the pixel region — a valid
    * image whose every byte is a pure function of the source row, so a
    * SQL engine with byte access to the same text can replay the
    * decoder's width/height/mean/histogram EXACTLY.  Pure binary
    * concat/substring projection, no UDF.
    */
  def synthesizeBmp(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): Dataset[MediaRecord] = {
    val imgSize = ((width * 3 + 3) / 4 * 4) * height
    import df.sparkSession.implicits._
    // coalesce: a NULL text row must yield an all-padding (still valid)
    // image, not a NULL content that would poison the concat (ADVICE r05)
    spread(df).select(col(idCol).cast("long").as("id"),
        lit("image/bmp").as("kind"),
        concat(lit(bmpHeader(width, height)),
          substring(
            concat(coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])),
              lit(new Array[Byte](imgSize))),
            1, imgSize)).as("content"))
      .as[MediaRecord]
  }

  /** 33-byte PNG file prefix (signature + IHDR with a correct CRC,
    * 8-bit truecolor) — the exact fixed-offset layout [[decodePng]]
    * validates.  The CRC is computed once, driver-side, so the prefix
    * is a well-formed PNG start even under external validators.
    */
  private def pngHeader(width: Int, height: Int): Array[Byte] = {
    def u32be(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ihdr = Array[Byte]('I', 'H', 'D', 'R') ++
      u32be(width.toLong) ++ u32be(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, no interlace
    val crc = new java.util.zip.CRC32
    crc.update(ihdr)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      u32be(13L) ++ ihdr ++ u32be(crc.getValue)
  }

  /** Synthesizes a PNG-framed record per row: the constant signature +
    * IHDR literal (real dims, valid CRC) with the row's UTF-8 text
    * bytes as the chunk-stream region [[decodePng]] takes byte stats
    * over — every output byte is a pure function of the source row, so
    * a SQL engine replays dims (constants) and stats (bytes of the
    * text) EXACTLY.  Pure binary-concat projection, no UDF.  (The
    * stream is not inflatable IDAT — full-pixel decode is
    * [[imageIoDecode]]'s job; header fidelity is what the oracle can
    * check.)
    */
  def synthesizePng(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        lit("image/png").as("kind"),
        concat(lit(pngHeader(width, height)),
          coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])))
          .as("content"))
      .as[MediaRecord]
  }

  /** 240-byte ISO BMFF file prefix: `ftyp` + a structurally complete
    * `moov` (mvhd v0 with the given timescale-1000 duration, one trak
    * whose tkhd carries the given dims as 16.16 fixed-point) + a
    * size-0 `mdat` header (box runs to end of file — legal for the
    * final top-level box, and what keeps the prefix CONSTANT so a SQL
    * oracle replays it).  Exactly the layout [[decodeMp4]] validates.
    */
  private def mp4Header(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    def be32(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
    val matrix = // identity, 16.16 / 2.30 fixed point
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)
    val mvhd = box("mvhd",
      be32(0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++ // creation, modification
        be32(1000L) ++ be32(durationMs) ++ // timescale 1000 → ms
        be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ // rate, volume+reserved
        new Array[Byte](8) ++ matrix ++ new Array[Byte](24) ++
        be32(2L)) // next track id
    val tkhd = box("tkhd",
      be32(7L) ++ // version 0, flags: enabled|in-movie|in-preview
        be32(0) ++ be32(0) ++ // creation, modification
        be32(1L) ++ be32(0) ++ // track id, reserved
        be32(durationMs) ++ new Array[Byte](8) ++
        new Array[Byte](8) ++ // layer, alt group, volume, reserved
        matrix ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200L))
    ftyp ++ moov ++ be32(0L) ++ "mdat".getBytes("US-ASCII")
  }

  /** Synthesizes an MP4-framed record per row: the constant
    * ftyp+moov+mdat prefix (REAL dims and duration in the headers)
    * with the row's UTF-8 text bytes as the mdat payload [[decodeMp4]]
    * takes byte stats over — every output byte is a pure function of
    * the source row, so a SQL engine replays dims/duration (constants)
    * and stats (bytes of the text) EXACTLY.  The codec payload is the
    * only fabricated part, which is precisely the boundary the decode
    * family documents.
    */
  def synthesizeMp4(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int, durationMs: Long): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        lit("video/mp4").as("kind"),
        concat(lit(mp4Header(width, height, durationMs)),
          coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])))
          .as("content"))
      .as[MediaRecord]
  }

  // ---------------------------------------------------------------
  // Fragmented MP4 (fMP4) synthesis — the streaming-packager layout:
  // moov declares NO duration (mvhd/mdhd duration 0, no mehd), so the
  // decoder must accumulate it from the moof/traf/tfdt/trun chain.
  // Every byte is a pure function of the source row, so a SQL oracle
  // replays dims (constants), duration (fragment arithmetic), and
  // byte stats (the text bytes, split across the fragments' mdats).
  // ---------------------------------------------------------------

  private def bmffBe32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def bmffBe64(v: Long) = bmffBe32(v >>> 32) ++ bmffBe32(v & 0xffffffffL)
  private def bmffBox(tpe: String, payload: Array[Byte]): Array[Byte] =
    bmffBe32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  /** fMP4 timing constants (shared with the oracle SQL and the spec):
    * 90 kHz track timescale, 3600-unit (40 ms) samples, 5 samples per
    * fragment → each fragment is exactly 200 ms.
    */
  private[graft] val Fmp4TrackTimescale = 90000L
  private[graft] val Fmp4SampleDur = 3600L
  private[graft] val Fmp4SamplesPerFrag = 5
  private[graft] val Fmp4FragMs: Long =
    Fmp4SamplesPerFrag * Fmp4SampleDur * 1000L / Fmp4TrackTimescale // 200

  /** ftyp + moov for a fragmented file: mvhd duration 0, tkhd dims,
    * mdia/mdhd with the track timescale (duration 0), and mvex/trex
    * whose default_sample_duration is a DECOY (7777) — every traf
    * carries its own tfhd default, so a decoder that wrongly falls
    * back to trex diverges visibly.
    */
  private[graft] def fmp4Header(width: Int, height: Int): Array[Byte] = {
    val matrix = // identity, 16.16 / 2.30 fixed point
      bmffBe32(0x00010000L) ++ bmffBe32(0) ++ bmffBe32(0) ++
        bmffBe32(0) ++ bmffBe32(0x00010000L) ++ bmffBe32(0) ++
        bmffBe32(0) ++ bmffBe32(0) ++ bmffBe32(0x40000000L)
    val mvhd = bmffBox("mvhd",
      bmffBe32(0) ++ // version 0 + flags
        bmffBe32(0) ++ bmffBe32(0) ++ // creation, modification
        bmffBe32(1000L) ++ bmffBe32(0L) ++ // timescale, duration 0 (fMP4)
        bmffBe32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++
        new Array[Byte](8) ++ matrix ++ new Array[Byte](24) ++
        bmffBe32(2L)) // next track id
    val tkhd = bmffBox("tkhd",
      bmffBe32(7L) ++
        bmffBe32(0) ++ bmffBe32(0) ++
        bmffBe32(1L) ++ bmffBe32(0) ++
        bmffBe32(0L) ++ new Array[Byte](8) ++ // duration 0
        new Array[Byte](8) ++
        matrix ++
        bmffBe32(width.toLong << 16) ++ bmffBe32(height.toLong << 16))
    val mdhd = bmffBox("mdhd",
      bmffBe32(0) ++ // version 0 + flags
        bmffBe32(0) ++ bmffBe32(0) ++ // creation, modification
        bmffBe32(Fmp4TrackTimescale) ++ bmffBe32(0L) ++ // timescale, dur 0
        bmffBe32(0x55c40000L)) // language 'und' + pre_defined
    val trex = bmffBox("trex",
      bmffBe32(0) ++ bmffBe32(1L) ++ bmffBe32(1L) ++
        bmffBe32(7777L) ++ bmffBe32(0) ++ bmffBe32(0)) // decoy default dur
    val moov = bmffBox("moov",
      mvhd ++ bmffBox("trak", tkhd ++ bmffBox("mdia", mdhd)) ++
        bmffBox("mvex", trex))
    bmffBox("ftyp", "isom".getBytes("US-ASCII") ++ bmffBe32(0x200L)) ++ moov
  }

  /** One movie fragment header.  `perSampleDur = true` spells the five
    * sample durations explicitly in the trun (flags 0x100); otherwise
    * the trun is bare and timing comes from tfhd's default (0x08).
    * tfdt is version 1 (64-bit base) — the streaming-packager norm.
    */
  private[graft] def fmp4Moof(seq: Int, tfdtBase: Long, perSampleDur: Boolean): Array[Byte] = {
    val mfhd = bmffBox("mfhd", bmffBe32(0) ++ bmffBe32(seq.toLong))
    val tfhd = bmffBox("tfhd",
      bmffBe32(0x000008L) ++ // flags: default-sample-duration present
        bmffBe32(1L) ++ bmffBe32(Fmp4SampleDur))
    val tfdt = bmffBox("tfdt",
      Array[Byte](1, 0, 0, 0) ++ bmffBe64(tfdtBase)) // version 1
    val trun =
      if (perSampleDur)
        bmffBox("trun",
          bmffBe32(0x000100L) ++ bmffBe32(Fmp4SamplesPerFrag.toLong) ++
            Array.fill(Fmp4SamplesPerFrag)(bmffBe32(Fmp4SampleDur)).flatten)
      else
        bmffBox("trun", bmffBe32(0) ++ bmffBe32(Fmp4SamplesPerFrag.toLong))
    bmffBox("moof", mfhd ++ bmffBox("traf", tfhd ++ tfdt ++ trun))
  }

  /** Byte-size constants of the fixed fMP4 pieces, for the SQL oracle:
    * (header, non-final moof, final moof).
    */
  private[graft] lazy val fmp4Sizes: (Int, Int, Int) =
    (fmp4Header(1, 1).length, fmp4Moof(1, 0L, perSampleDur = false).length,
      fmp4Moof(1, 0L, perSampleDur = true).length)

  /** Synthesizes a FRAGMENTED MP4 record per row: the constant
    * ftyp+moov header (duration 0 everywhere) + `1 + id % 3`
    * moof/mdat pairs, the row's UTF-8 text bytes split contiguously
    * across the fragments' mdat payloads.  The LAST fragment's trun
    * spells per-sample durations; earlier fragments rely on the tfhd
    * default — both decoder paths exercise on every multi-fragment
    * row.  True duration = nFrags × [[Fmp4FragMs]].
    */
  def synthesizeFmp4(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])).as("t"))
      .as[(Long, Array[Byte])].map { case (id, text) =>
        val n = 1 + (id % 3).toInt
        val out = Array.newBuilder[Byte]
        out ++= fmp4Header(width, height)
        var i = 0
        while (i < n) {
          val lo = i * text.length / n
          val hi = (i + 1) * text.length / n
          out ++= fmp4Moof(i + 1,
            i.toLong * Fmp4SamplesPerFrag * Fmp4SampleDur,
            perSampleDur = i == n - 1)
          out ++= bmffBox("mdat", java.util.Arrays.copyOfRange(text, lo, hi))
          i += 1
        }
        MediaRecord(id, "video/mp4", out.result())
      }
  }

  // ---------------------------------------------------------------
  // H.264 METADATA path (no pixel decode): avcC → SPS bitstream parse
  // (exp-Golomb per ISO 14496-10 §7.3.2.1.1) for profile/level and the
  // TRUE coded + cropped display dimensions, and stss/stsz/stsc/stco
  // arithmetic (ISO 14496-12 §8.6.2, §8.7) for keyframe BYTE OFFSETS —
  // the sampling decisions a video-corpus user needs (which frames are
  // seekable, where they live) are pure bitstream+box arithmetic even
  // though the codec payload stays undecoded.
  // ---------------------------------------------------------------

  /** MSB-first bit writer with exp-Golomb coding, for SPS synthesis. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def ue(v: Long): Unit = {
      val code = v + 1
      val len = 63 - java.lang.Long.numberOfLeadingZeros(code)
      bits(0L, len); bits(code, len + 1)
    }
    /** rbsp_trailing_bits: stop bit + zero-pad to the byte boundary. */
    def stopAndAlign(): Array[Byte] = {
      bit(1)
      while (nb != 0) bit(0)
      buf.toArray
    }
    /** Zero-pad to the byte boundary WITHOUT a stop bit (VP9 headers
      * are raw bits, not RBSP).
      */
    def padAlign(): Array[Byte] = {
      while (nb != 0) bit(0)
      buf.toArray
    }
  }

  /** RBSP → escaped NAL payload: 0x03 inserted after any 00 00 that a
    * byte ≤ 3 would follow (ISO 14496-10 §7.4.1.1).
    */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i)
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 0x03.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.result()
  }

  /** MSB-first bit reader over a NAL payload with the 0x03 emulation-
    * prevention bytes stripped on construction.
    */
  private final class RbspReader(nal: Array[Byte], from: Int, until: Int) {
    private val b: Array[Byte] = {
      val out = Array.newBuilder[Byte]
      var zeros = 0
      var i = from
      while (i < until) {
        val v = nal(i)
        if (zeros >= 2 && v == 0x03) zeros = 0 // skip the escape byte
        else {
          out += v
          zeros = if (v == 0) zeros + 1 else 0
        }
        i += 1
      }
      out.result()
    }
    private var pos = 0
    def ok: Boolean = pos <= b.length * 8
    def bit(): Int = {
      val i = pos; pos += 1
      if (i >= b.length * 8) 0
      else (b(i >> 3) >> (7 - (i & 7))) & 1
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Long = {
      var zeros = 0
      while (bit() == 0 && zeros < 32) zeros += 1
      if (zeros >= 32) return -1L
      (1L << zeros) - 1 + bits(zeros)
    }
    def se(): Long = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Parsed H.264 stream metadata: SPS profile/level, coded (macroblock
    * grid) and display (crop-adjusted) dimensions, and the first sync
    * samples' absolute byte offsets in the file (−1 when absent).
    */
  final case class H264Meta(
      id: Long, profile: Long, level: Long,
      codedWidth: Long, codedHeight: Long,
      width: Long, height: Long,
      nKeyframes: Long, kf1Off: Long, kf2Off: Long)

  /** SPS fields this path needs (§7.3.2.1.1): returns (profile, level,
    * codedW, codedH, dispW, dispH) or None on a malformed bitstream.
    */
  private[graft] def parseSps(nal: Array[Byte], from: Int, until: Int):
      Option[(Int, Int, Int, Int, Int, Int)] = {
    if (until - from < 4) return None
    // nal_unit_type must be 7 (SPS)
    if ((nal(from) & 0x1f) != 7) return None
    val r = new RbspReader(nal, from + 1, until)
    val profile = r.bits(8).toInt
    r.bits(8) // constraint flags + reserved
    val level = r.bits(8).toInt
    if (r.ue() < 0) return None // seq_parameter_set_id
    // chroma branch for the High-family profiles
    var chromaArrayType = 1
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      val chroma = r.ue().toInt
      chromaArrayType = chroma
      if (chroma == 3 && r.bit() == 1) chromaArrayType = 0 // separate planes
      r.ue(); r.ue() // bit depths
      r.bit() // qpprime_y_zero_transform_bypass
      if (r.bit() == 1) return None // scaling matrices: out of scope
    }
    r.ue() // log2_max_frame_num_minus4
    r.ue() match { // pic_order_cnt_type
      case 0 => r.ue()
      case 1 =>
        r.bit(); r.se(); r.se()
        val n = r.ue()
        if (n < 0 || n > 255) return None
        var i = 0L
        while (i < n) { r.se(); i += 1 }
      case _ => ()
    }
    r.ue() // max_num_ref_frames
    r.bit() // gaps_in_frame_num_value_allowed
    val pwMbs = r.ue()
    val phMapUnits = r.ue()
    if (pwMbs < 0 || phMapUnits < 0 || pwMbs > 8191 || phMapUnits > 8191)
      return None
    val frameMbsOnly = r.bit()
    if (frameMbsOnly == 0) r.bit() // mb_adaptive_frame_field
    r.bit() // direct_8x8_inference
    val crop = r.bit()
    val (cl, cr, ct, cb) =
      if (crop == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0L, 0L, 0L, 0L)
    if (!r.ok || cl < 0 || cr < 0 || ct < 0 || cb < 0) return None
    val codedW = (pwMbs.toInt + 1) * 16
    val codedH = (2 - frameMbsOnly) * (phMapUnits.toInt + 1) * 16
    // crop units per chroma_format (§7.4.2.1.1 Table 6-1)
    val cropX = if (chromaArrayType == 1 || chromaArrayType == 2) 2 else 1
    val cropY =
      (if (chromaArrayType == 1) 2 else 1) * (2 - frameMbsOnly)
    val w = codedW - cropX * (cl + cr).toInt
    val h = codedH - cropY * (ct + cb).toInt
    if (w <= 0 || h <= 0) None
    else Some((profile, level, codedW, codedH, w, h))
  }

  /** Walks one file's boxes for the H.264 metadata surface.  Collects
    * the avcC SPS (through moov/trak/mdia/minf/stbl/stsd/avc1), the
    * stss sync-sample table, and the stsz/stsc/stco sample-layout
    * tables, then computes each sync sample's ABSOLUTE byte offset:
    * chunk base from stco/co64 + the sizes of the samples before it in
    * its chunk (stsc runs expanded in order).  Returns None when there
    * is no avc1 track or any table is malformed.
    */
  private[graft] def h264MetaOf(r: MediaRecord): Option[H264Meta] = {
    val b = r.content
    if (b == null || b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    var sps: Option[(Int, Int, Int, Int, Int, Int)] = None
    var stss: Array[Long] = null
    var sizes: Array[Long] = null // per-sample (after constant expand)
    var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
    var chunkOffs: Array[Long] = null
    val MaxSamples = 1 << 20 // metadata surface: bounded tables only

    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val size32 = u32be(b, off)
        val t = new String(b, off + 4, 4, "US-ASCII")
        var header = 8L
        val size: Long =
          if (size32 == 1L) {
            if (off + 16 > until) return false
            header = 16L; u64be(b, off + 8)
          } else if (size32 == 0L) (until - off).toLong
          else size32
        if (size < header || off + size > until) return false
        val payload = off + header.toInt
        val payloadEnd = (off + size).toInt
        t match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            if (depth < 6 && !walk(payload, payloadEnd, depth + 1)) return false
          case "stsd" if sps.isEmpty =>
            // FullBox header + entry_count, then sample entries
            if (payloadEnd - payload < 8) return false
            var p = payload + 8
            while (p + 8 <= payloadEnd && sps.isEmpty) {
              val esz = u32be(b, p)
              val etyp = new String(b, p + 4, 4, "US-ASCII")
              if (esz < 8 || p + esz > payloadEnd) return false
              if (etyp == "avc1" || etyp == "avc3") {
                // VisualSampleEntry: 8 + 70 bytes before the codec boxes
                var q = p + 8 + 78
                while (q + 8 <= p + esz && sps.isEmpty) {
                  val csz = u32be(b, q)
                  if (csz < 8 || q + csz > p + esz) return false
                  if (new String(b, q + 4, 4, "US-ASCII") == "avcC") {
                    val c = q + 8
                    // AVCDecoderConfigurationRecord: ver, profile,
                    // compat, level, lenSizeMinusOne, numSPS
                    if (q + csz - c < 7) return false
                    val numSps = b(c + 5) & 0x1f
                    if (numSps >= 1) {
                      val spsLen = u16be(b, c + 6)
                      val s0 = c + 8
                      if (s0 + spsLen <= q + csz)
                        sps = parseSps(b, s0, s0 + spsLen)
                    }
                  }
                  q += csz.toInt
                }
              }
              p += esz.toInt
            }
          case "stss" =>
            if (payloadEnd - payload < 8) return false
            val n = u32be(b, payload + 4)
            if (n < 0 || n > MaxSamples ||
              payload + 8 + n * 4 > payloadEnd) return false
            stss = Array.tabulate(n.toInt)(i => u32be(b, payload + 8 + i * 4))
          case "stsz" =>
            if (payloadEnd - payload < 12) return false
            val const = u32be(b, payload + 4)
            val n = u32be(b, payload + 8)
            if (n < 0 || n > MaxSamples) return false
            sizes =
              if (const != 0L) Array.fill(n.toInt)(const)
              else {
                if (payload + 12 + n * 4 > payloadEnd) return false
                Array.tabulate(n.toInt)(i => u32be(b, payload + 12 + i * 4))
              }
          case "stsc" =>
            if (payloadEnd - payload < 8) return false
            val n = u32be(b, payload + 4)
            if (n < 0 || n > MaxSamples ||
              payload + 8 + n * 12 > payloadEnd) return false
            stscRuns = Array.tabulate(n.toInt) { i =>
              (u32be(b, payload + 8 + i * 12), u32be(b, payload + 12 + i * 12))
            }
          case "stco" =>
            if (payloadEnd - payload < 8) return false
            val n = u32be(b, payload + 4)
            if (n < 0 || n > MaxSamples ||
              payload + 8 + n * 4 > payloadEnd) return false
            chunkOffs = Array.tabulate(n.toInt)(i => u32be(b, payload + 8 + i * 4))
          case "co64" =>
            if (payloadEnd - payload < 8) return false
            val n = u32be(b, payload + 4)
            if (n < 0 || n > MaxSamples ||
              payload + 8 + n * 8 > payloadEnd) return false
            chunkOffs = Array.tabulate(n.toInt)(i => u64be(b, payload + 8 + i * 8))
          case _ => ()
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0)) return None
    sps.flatMap { case (profile, level, cw, ch, w, h) =>
      if (sizes == null || stscRuns == null || chunkOffs == null ||
        stscRuns.isEmpty || chunkOffs.isEmpty) None
      else {
        // absolute offset per sample: expand the stsc runs in order
        val offs = new Array[Long](sizes.length)
        var sample = 0
        var run = 0
        var chunk = stscRuns(0)._1
        var valid = chunk >= 1
        while (valid && sample < sizes.length) {
          if (run + 1 < stscRuns.length && chunk >= stscRuns(run + 1)._1)
            run += 1
          val perChunk = stscRuns(run)._2
          if (perChunk < 1 || chunk > chunkOffs.length) valid = false
          else {
            var pos = chunkOffs(chunk.toInt - 1)
            var i = 0L
            while (i < perChunk && sample < sizes.length) {
              offs(sample) = pos
              pos += sizes(sample)
              sample += 1
              i += 1
            }
            chunk += 1
          }
        }
        if (!valid || sample < sizes.length) None
        else {
          // no stss box ⇒ every sample is a sync sample (§8.6.2)
          val sync =
            if (stss == null) Array.tabulate(sizes.length)(i => i + 1L)
            else stss
          def offOf(i: Int): Long =
            if (i < sync.length && sync(i) >= 1 && sync(i) <= sizes.length)
              offs(sync(i).toInt - 1)
            else -1L
          val nk = if (stss == null) sizes.length.toLong else stss.length.toLong
          Some(H264Meta(r.id, profile, level, cw, ch, w, h, nk,
            offOf(0), offOf(1)))
        }
      }
    }
  }

  /** Batched partition-local H.264 metadata extraction — rows without
    * an avc1 track (or with malformed tables) drop, like every decode
    * surface here a 100 TB pass must not die on one bad file.
    */
  def h264Meta(ds: Dataset[MediaRecord]): Dataset[H264Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(h264MetaOf))
  }

  // -- synthesis (the oracle side) --------------------------------

  private[graft] val Avc1SampleCount = 8
  private[graft] val Avc1HeaderBytes = 1024 // ftyp+moov free-padded
  /** Absolute file offset of the mdat payload (= first chunk). */
  private[graft] val Avc1MdatPayloadOff: Long = Avc1HeaderBytes + 8L

  /** profile_idc / level_idc per id%3: Baseline/3.0, Main/3.1,
    * High/4.1 — High exercises the SPS chroma branch.
    */
  private[graft] def avc1ProfileLevel(id: Long): (Int, Int) =
    (id % 3).toInt match {
      case 0 => (66, 30)
      case 1 => (77, 31)
      case _ => (100, 41)
    }

  /** SPS NAL (header byte + escaped RBSP) for a 4:2:0 progressive
    * stream of the given DISPLAY dims: coded dims round up to the
    * macroblock grid, the remainder becomes frame cropping (right/
    * bottom, in 2-pixel units).  Display dims must be even.
    */
  private[graft] def spsNal(profile: Int, level: Int, w: Int, h: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"spsNal: dims must be even ($w×$h)")
    val codedW = (w + 15) / 16 * 16
    val codedH = (h + 15) / 16 * 16
    val bw = new BitWriter
    bw.bits(profile.toLong, 8)
    bw.bits(0L, 8) // constraint flags + reserved
    bw.bits(level.toLong, 8)
    bw.ue(0) // seq_parameter_set_id
    if (profile == 100) {
      bw.ue(1) // chroma_format_idc 4:2:0
      bw.ue(0); bw.ue(0) // bit depths
      bw.bit(0) // qpprime_y_zero_transform_bypass
      bw.bit(0) // seq_scaling_matrix_present
    }
    bw.ue(0) // log2_max_frame_num_minus4
    bw.ue(0) // pic_order_cnt_type 0
    bw.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    bw.ue(1) // max_num_ref_frames
    bw.bit(0) // gaps_in_frame_num_value_allowed
    bw.ue(codedW / 16 - 1) // pic_width_in_mbs_minus1
    bw.ue(codedH / 16 - 1) // pic_height_in_map_units_minus1
    bw.bit(1) // frame_mbs_only
    bw.bit(1) // direct_8x8_inference
    val cropR = (codedW - w) / 2
    val cropB = (codedH - h) / 2
    if (cropR > 0 || cropB > 0) {
      bw.bit(1)
      bw.ue(0); bw.ue(cropR.toLong); bw.ue(0); bw.ue(cropB.toLong)
    } else bw.bit(0)
    bw.bit(0) // vui_parameters_present
    Array(0x67.toByte) ++ escapeRbsp(bw.stopAndAlign())
  }

  /** Minimal PPS NAL (all-default fields). */
  private[graft] def ppsNal(): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0); bw.ue(0) // pps id, sps id
    bw.bit(0); bw.bit(0) // entropy_coding_mode, pic_order_present
    bw.ue(0) // num_slice_groups_minus1
    bw.ue(0); bw.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    bw.bit(0); bw.bits(0L, 2) // weighted_pred, weighted_bipred_idc
    bw.ue(0); bw.ue(0); bw.ue(0) // init_qp/qs/chroma offsets (se(0)=ue(0))
    bw.bit(0); bw.bit(0); bw.bit(0) // deblocking/intra/redundant flags
    Array(0x68.toByte) ++ escapeRbsp(bw.stopAndAlign())
  }

  /** Per-row classic (non-fragmented) MP4 with a REAL avc1/avcC sample
    * description, a full sample layout (stts/stsc/stsz/stco), and an
    * stss sync table — the row's text bytes split across
    * [[Avc1SampleCount]] "samples" in one chunk.  Parameterization per
    * id: profile/level ([[avc1ProfileLevel]]), display dims
    * `(320 + 2(id%5)) × (180 + 2(id%3))` (so cropping is live on
    * every row), keyframes every `2 + id%3` samples.  A `free` box
    * pads the header to exactly [[Avc1HeaderBytes]], so the mdat
    * payload (= chunk) offset is the constant [[Avc1MdatPayloadOff]]
    * and the SQL oracle replays every keyframe offset from arithmetic.
    */
  def synthesizeAvc1Mp4(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])).as("t"))
      .as[(Long, Array[Byte])].map { case (id, text) =>
        val (profile, level) = avc1ProfileLevel(id)
        val w = 320 + 2 * (id % 5).toInt
        val h = 180 + 2 * (id % 3).toInt
        val gop = 2 + (id % 3).toInt
        val n = Avc1SampleCount
        val matrix =
          bmffBe32(0x00010000L) ++ bmffBe32(0) ++ bmffBe32(0) ++
            bmffBe32(0) ++ bmffBe32(0x00010000L) ++ bmffBe32(0) ++
            bmffBe32(0) ++ bmffBe32(0) ++ bmffBe32(0x40000000L)
        val sampleDur = 3600L
        val timescale = 90000L
        val mvhd = bmffBox("mvhd",
          bmffBe32(0) ++ bmffBe32(0) ++ bmffBe32(0) ++
            bmffBe32(1000L) ++ bmffBe32(n * sampleDur * 1000L / timescale) ++
            bmffBe32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++
            new Array[Byte](8) ++ matrix ++ new Array[Byte](24) ++
            bmffBe32(2L))
        val tkhd = bmffBox("tkhd",
          bmffBe32(7L) ++ bmffBe32(0) ++ bmffBe32(0) ++
            bmffBe32(1L) ++ bmffBe32(0) ++
            bmffBe32(n * sampleDur * 1000L / timescale) ++
            new Array[Byte](16) ++ matrix ++
            bmffBe32(w.toLong << 16) ++ bmffBe32(h.toLong << 16))
        val mdhd = bmffBox("mdhd",
          bmffBe32(0) ++ bmffBe32(0) ++ bmffBe32(0) ++
            bmffBe32(timescale) ++ bmffBe32(n * sampleDur) ++
            bmffBe32(0x55c40000L))
        val sps = spsNal(profile, level, w, h)
        val pps = ppsNal()
        val avcc = bmffBox("avcC",
          Array[Byte](1, profile.toByte, 0, level.toByte, 0xff.toByte, 0xe1.toByte) ++
            Array[Byte]((sps.length >> 8).toByte, sps.length.toByte) ++ sps ++
            Array[Byte](1, (pps.length >> 8).toByte, pps.length.toByte) ++ pps)
        val avc1 = bmffBox("avc1",
          new Array[Byte](6) ++ Array[Byte](0, 1) ++ // data_reference_index
            new Array[Byte](16) ++ // pre_defined/reserved
            Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++
            bmffBe32(0x00480000L) ++ bmffBe32(0x00480000L) ++ bmffBe32(0) ++
            Array[Byte](0, 1) ++ new Array[Byte](32) ++ // frame_count, name
            Array[Byte](0, 0x18, 0xff.toByte, 0xff.toByte) ++ avcc)
        val stsd = bmffBox("stsd", bmffBe32(0) ++ bmffBe32(1L) ++ avc1)
        val stts = bmffBox("stts",
          bmffBe32(0) ++ bmffBe32(1L) ++ bmffBe32(n.toLong) ++ bmffBe32(sampleDur))
        val syncSamples = (1 to n by gop).toArray
        val stss = bmffBox("stss",
          bmffBe32(0) ++ bmffBe32(syncSamples.length.toLong) ++
            syncSamples.flatMap(s => bmffBe32(s.toLong)))
        val stsc = bmffBox("stsc",
          bmffBe32(0) ++ bmffBe32(1L) ++
            bmffBe32(1L) ++ bmffBe32(n.toLong) ++ bmffBe32(1L))
        val sampleSizes =
          Array.tabulate(n)(i => (text.length / n + (if (i < text.length % n) 1 else 0)).toLong)
        val stsz = bmffBox("stsz",
          bmffBe32(0) ++ bmffBe32(0L) ++ bmffBe32(n.toLong) ++
            sampleSizes.flatMap(bmffBe32))
        val stco = bmffBox("stco",
          bmffBe32(0) ++ bmffBe32(1L) ++ bmffBe32(Avc1MdatPayloadOff))
        val stbl = bmffBox("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco ++ stss)
        val vmhd = bmffBox("vmhd", bmffBe32(1L) ++ new Array[Byte](8))
        val dref = bmffBox("dref", bmffBe32(0) ++ bmffBe32(1L) ++
          bmffBox("url ", bmffBe32(1L)))
        val minf = bmffBox("minf", vmhd ++ bmffBox("dinf", dref) ++ stbl)
        val hdlr = bmffBox("hdlr",
          bmffBe32(0) ++ bmffBe32(0) ++ "vide".getBytes("US-ASCII") ++
            new Array[Byte](12) ++ Array[Byte](0))
        val moov = bmffBox("moov",
          mvhd ++ bmffBox("trak", tkhd ++
            bmffBox("mdia", mdhd ++ hdlr ++ minf)))
        val ftyp = bmffBox("ftyp",
          "isom".getBytes("US-ASCII") ++ bmffBe32(0x200L) ++
            "avc1".getBytes("US-ASCII"))
        val head = ftyp ++ moov
        val padLen = Avc1HeaderBytes - head.length
        require(padLen >= 8,
          s"synthesizeAvc1Mp4: header ${head.length} exceeds the pad budget")
        val free = bmffBox("free", new Array[Byte](padLen - 8))
        MediaRecord(id, "video/mp4",
          head ++ free ++ bmffBox("mdat", text))
      }
  }

  // -- fMP4 keyframes: trun sample flags ---------------------------
  // A fragmented file has no stss; seekability lives in the movie-
  // fragment run boxes (ISO 14496-12 §8.8.8): a sample is a keyframe
  // iff its resolved sample_flags clear the sample_is_non_sync bit
  // (0x00010000), with the per-sample → first-sample-flags → tfhd
  // default resolution order, and its byte position is the trun
  // data_offset from the moof base plus the preceding samples' sizes.

  /** Keyframe census of a fragmented MP4: fragment count, keyframe
    * count, and the first three keyframes' absolute byte offsets
    * (−1 when absent).
    */
  final case class Fmp4Kf(
      id: Long, nFrags: Long, nKeyframes: Long,
      kf1Off: Long, kf2Off: Long, kf3Off: Long)

  private[graft] def fmp4KeyframesOf(r: MediaRecord): Option[Fmp4Kf] = {
    val b = r.content
    if (b == null || b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    var nFrags = 0L
    val kfs = scala.collection.mutable.ArrayBuffer.empty[Long]
    // trex defaults (mvex) apply when a traf carries no tfhd override
    var trexDefFlags = 0L
    var trexDefSize = 0L

    // walk the traf children; moofStart anchors default-base-is-moof
    def traf(from: Int, until: Int, moofStart: Long): Boolean = {
      var tfhdFlags = 0L
      var baseDataOffset = -1L
      var defFlags = trexDefFlags
      var defSize = trexDefSize
      var off = from
      while (off + 8 <= until) {
        val size = u32be(b, off)
        if (size < 8 || off + size > until) return false
        val payload = off + 8
        val payloadEnd = (off + size).toInt
        val t = new String(b, off + 4, 4, "US-ASCII")
        if (t == "tfhd") {
          if (payloadEnd - payload < 8) return false
          tfhdFlags = u32be(b, payload) & 0xffffff
          var pos = payload + 8
          if ((tfhdFlags & 0x01) != 0) { // base-data-offset (u64)
            if (pos + 8 > payloadEnd) return false
            baseDataOffset = u64be(b, pos); pos += 8
          }
          if ((tfhdFlags & 0x02) != 0) pos += 4 // sample-description-index
          if ((tfhdFlags & 0x08) != 0) pos += 4 // default-sample-duration
          if ((tfhdFlags & 0x10) != 0) { // default-sample-size
            if (pos + 4 > payloadEnd) return false
            defSize = u32be(b, pos); pos += 4
          }
          if ((tfhdFlags & 0x20) != 0) { // default-sample-flags
            if (pos + 4 > payloadEnd) return false
            defFlags = u32be(b, pos); pos += 4
          }
        } else if (t == "trun") {
          if (payloadEnd - payload < 8) return false
          val flags = u32be(b, payload) & 0xffffff
          val n = u32be(b, payload + 4)
          if (n < 0 || n > (1 << 20)) return false
          var pos = payload + 8
          // data_offset is SIGNED (negative never occurs in practice
          // but the field is i32 by spec) — big-endian like every
          // BMFF integer
          var dataOffset = 0L
          if ((flags & 0x01) != 0) {
            if (pos + 4 > payloadEnd) return false
            dataOffset = u32be(b, pos).toInt.toLong; pos += 4
          }
          var firstFlags = -1L
          if ((flags & 0x04) != 0) {
            if (pos + 4 > payloadEnd) return false
            firstFlags = u32be(b, pos); pos += 4
          }
          val base =
            if (baseDataOffset >= 0) baseDataOffset
            else moofStart // default-base-is-moof / first-trun convention
          var sampleOff = base + dataOffset
          var i = 0L
          while (i < n) {
            var sz = defSize
            var fl = if (i == 0 && firstFlags >= 0) firstFlags else defFlags
            if ((flags & 0x100) != 0) { // duration
              if (pos + 4 > payloadEnd) return false
              pos += 4
            }
            if ((flags & 0x200) != 0) { // size
              if (pos + 4 > payloadEnd) return false
              sz = u32be(b, pos); pos += 4
            }
            if ((flags & 0x400) != 0) { // per-sample flags win
              if (pos + 4 > payloadEnd) return false
              fl = u32be(b, pos); pos += 4
            }
            if ((flags & 0x800) != 0) { // composition offset
              if (pos + 4 > payloadEnd) return false
              pos += 4
            }
            if ((fl & 0x00010000L) == 0L) kfs += sampleOff // sync sample
            sampleOff += sz
            i += 1
          }
        }
        off = payloadEnd
      }
      off == until
    }

    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val size32 = u32be(b, off)
        var header = 8L
        val size: Long =
          if (size32 == 1L) {
            if (off + 16 > until) return false
            header = 16L; u64be(b, off + 8)
          } else if (size32 == 0L) (until - off).toLong
          else size32
        if (size < header || off + size > until) return false
        val payload = off + header.toInt
        val payloadEnd = (off + size).toInt
        val t = new String(b, off + 4, 4, "US-ASCII")
        if (t == "moov" || t == "mvex") {
          if (depth < 3 && !walk(payload, payloadEnd, depth + 1)) return false
        } else if (t == "trex") {
          if (payloadEnd - payload < 24) return false
          trexDefSize = u32be(b, payload + 16)
          trexDefFlags = u32be(b, payload + 20)
        } else if (t == "moof") {
          nFrags += 1
          // scan the moof's children for trafs
          var p = payload
          while (p + 8 <= payloadEnd) {
            val csz = u32be(b, p)
            if (csz < 8 || p + csz > payloadEnd) return false
            if (new String(b, p + 4, 4, "US-ASCII") == "traf") {
              if (!traf(p + 8, (p + csz).toInt, off.toLong)) return false
            }
            p += csz.toInt
          }
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0) || nFrags == 0) None
    else {
      def at(i: Int): Long = if (i < kfs.length) kfs(i) else -1L
      Some(Fmp4Kf(r.id, nFrags, kfs.length.toLong, at(0), at(1), at(2)))
    }
  }

  /** Batched partition-local fMP4 keyframe extraction; non-fragmented
    * or malformed rows drop.
    */
  def fmp4Keyframes(ds: Dataset[MediaRecord]): Dataset[Fmp4Kf] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(fmp4KeyframesOf))
  }

  /** One movie fragment whose trun carries REAL sample sizes and sync
    * flags: `data_offset` points just past the moof (default-base-is-
    * moof in tfhd), the first sample is a keyframe, and — on the
    * `perSampleFlags` variant — the LAST sample too (so a correct
    * offset needs the size accumulation, not just the data offset).
    * The other variant resolves the first sample from trun's
    * first-sample-flags and the rest from tfhd's non-sync default —
    * both §8.8.8 resolution paths are live in every multi-fragment
    * file.
    */
  private[graft] def fmp4MoofKf(
      seq: Int, tfdtBase: Long, sampleSizes: Array[Long],
      perSampleFlags: Boolean): Array[Byte] = {
    val NonSync = 0x00010000L
    val SyncI = 0x02000000L // depends_on=2 (I-frame), non-sync bit clear
    def build(dataOffset: Long): Array[Byte] = {
      val mfhd = bmffBox("mfhd", bmffBe32(0) ++ bmffBe32(seq.toLong))
      // default-base-is-moof | default-sample-duration | default-sample-flags
      val tfhd = bmffBox("tfhd",
        bmffBe32(0x020028L) ++ bmffBe32(1L) ++
          bmffBe32(Fmp4SampleDur) ++ bmffBe32(NonSync))
      val tfdt = bmffBox("tfdt",
        Array[Byte](1, 0, 0, 0) ++ bmffBe64(tfdtBase))
      val n = sampleSizes.length
      val trun =
        if (perSampleFlags)
          bmffBox("trun", // data-offset | size | per-sample flags
            bmffBe32(0x000601L) ++ bmffBe32(n.toLong) ++ bmffBe32(dataOffset) ++
              sampleSizes.zipWithIndex.flatMap { case (sz, i) =>
                val fl = if (i == 0 || i == n - 1) SyncI else NonSync
                bmffBe32(sz) ++ bmffBe32(fl)
              })
        else
          bmffBox("trun", // data-offset | first-sample-flags | size
            bmffBe32(0x000205L) ++ bmffBe32(n.toLong) ++ bmffBe32(dataOffset) ++
              bmffBe32(SyncI) ++ sampleSizes.flatMap(bmffBe32))
      bmffBox("moof", mfhd ++ bmffBox("traf", tfhd ++ tfdt ++ trun))
    }
    val size = build(0L).length // trun length is offset-independent
    build(size + 8L) // first media byte sits right past the mdat header
  }

  /** Byte sizes for the SQL oracle: (header, moof with
    * first-sample-flags, moof with per-sample flags) at
    * [[Fmp4SamplesPerFrag]] samples.
    */
  private[graft] lazy val fmp4KfSizes: (Int, Int, Int) = {
    val sz = Array.fill(Fmp4SamplesPerFrag)(0L)
    (fmp4Header(1, 1).length,
      fmp4MoofKf(1, 0L, sz, perSampleFlags = false).length,
      fmp4MoofKf(1, 0L, sz, perSampleFlags = true).length)
  }

  /** Per-row fragmented MP4 with REAL trun sample sizes and sync
    * flags: `1 + id % 3` fragments, text bytes split contiguously
    * across the fragments' mdats and then across each fragment's
    * [[Fmp4SamplesPerFrag]] samples (longest-first remainder split,
    * like stsz in [[synthesizeAvc1Mp4]]).  Even-index fragments use
    * the first-sample-flags resolution, odd-index fragments spell
    * per-sample flags with first AND last sample sync.
    */
  def synthesizeFmp4Kf(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])).as("t"))
      .as[(Long, Array[Byte])].map { case (id, text) =>
        val nf = 1 + (id % 3).toInt
        val out = Array.newBuilder[Byte]
        out ++= fmp4Header(width, height)
        var f = 0
        while (f < nf) {
          val lo = f * text.length / nf
          val hi = (f + 1) * text.length / nf
          val len = hi - lo
          val k = Fmp4SamplesPerFrag
          val sizes = Array.tabulate(k)(i =>
            (len / k + (if (i < len % k) 1 else 0)).toLong)
          out ++= fmp4MoofKf(f + 1,
            f.toLong * k * Fmp4SampleDur, sizes, perSampleFlags = f % 2 == 1)
          out ++= bmffBox("mdat", java.util.Arrays.copyOfRange(text, lo, hi))
          f += 1
        }
        MediaRecord(id, "video/mp4", out.result())
      }
  }

  // ---------------------------------------------------------------
  // Sample-level WAV path: PCM is uncompressed, so the "codec" work is
  // the RIFF chunk walk plus 16-bit little-endian sample extraction —
  // all real, and the synthesized sample content is closed-form, so
  // the audio analog of the PNG pixel oracle holds: DuckDB recomputes
  // per-channel sample stats from arithmetic alone.
  // ---------------------------------------------------------------

  /** Closed-form 16-bit sample for stream key k, channel ch, frame t —
    * spans the full signed range and crosses zero often enough that
    * min/max/zero-crossing stats all have signal.
    */
  @inline private[graft] def sampleValue(k: Long, ch: Int, t: Int): Int =
    (((k * 13 + ch.toLong * 7 + t.toLong * 31) % 65536).toInt + 65536) % 65536 - 32768

  /** Per-row canonical PCM WAV (44-byte header + interleaved 16-bit LE
    * samples from [[sampleValue]] with stream key `id % keyMod`) —
    * exactly the layout [[decodeWav]] walks.
    */
  def synthesizeWavPcm(
      df: DataFrame, idCol: String,
      channels: Int, samples: Int, sampleRate: Int, keyMod: Int): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val k = id % keyMod
      val dataLen = channels * samples * 2
      def u16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
      def u32a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      val header = "RIFF".getBytes("US-ASCII") ++ u32a(36 + dataLen) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ u32a(16) ++ u16a(1) ++ u16a(channels) ++
        u32a(sampleRate) ++ u32a(sampleRate * channels * 2) ++
        u16a(channels * 2) ++ u16a(16) ++
        "data".getBytes("US-ASCII") ++ u32a(dataLen)
      val body = new Array[Byte](dataLen)
      var i = 0
      var t = 0
      while (t < samples) {
        var ch = 0
        while (ch < channels) {
          val s = sampleValue(k, ch, t)
          body(i) = s.toByte
          body(i + 1) = (s >> 8).toByte
          i += 2
          ch += 1
        }
        t += 1
      }
      MediaRecord(id, "audio/wav", header ++ body)
    }
  }

  /** One row per (stream, channel) of REAL decoded-sample statistics:
    * the RIFF walk finds fmt/data, samples come off the wire as signed
    * 16-bit little-endian, and every stat is exact integer arithmetic
    * (zero crossings = sign flips between consecutive frames, sign(0)
    * counted non-negative).
    */
  final case class WavChannelStats(
      id: Long, channel: Int, n_samples: Long, s_sum: Long,
      s_min: Int, s_max: Int, zero_cross: Long)

  def wavSampleStats(ds: Dataset[MediaRecord]): Dataset[WavChannelStats] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val b = r.content
      // reuse the validated walk: dims tell us geometry, then read the
      // data chunk directly (decodeWav already rejected non-PCM)
      decodeWav(r).toSeq.flatMap { f =>
        val channels = f.height
        val samples = f.width
        // relocate the data chunk (decodeWav keeps it internal)
        var off = 12
        var dataOff = -1
        while (off + 8 <= b.length && dataOff < 0) {
          val id4 = new String(b, off, 4, "US-ASCII")
          val size = u32(b, off + 4)
          if (id4 == "data") dataOff = off + 8
          else off += 8 + size.toInt + (size.toInt & 1)
        }
        (0 until channels).map { ch =>
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var zc = 0L
          var prevNonNeg = false
          var t = 0
          while (t < samples) {
            val o = dataOff + (t * channels + ch) * 2
            val s = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
            sum += s
            if (s < mn) mn = s
            if (s > mx) mx = s
            val nonNeg = s >= 0
            if (t > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            t += 1
          }
          WavChannelStats(r.id, ch, samples.toLong, sum, mn, mx, zc)
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // Full PNG codec (pure JDK: java.util.zip Deflater/Inflater) — the
  // REAL compressed-pixel path.  Everything below is bit-deterministic:
  // the filters are spec arithmetic, inflate inverts whatever deflate
  // produced, and the pixel content of the synthesized images is a
  // closed-form function of (key, x, y, channel) that a SQL oracle
  // recomputes WITHOUT touching compression — so the whole
  // encode → deflate → inflate → unfilter → stats loop is hash-gated
  // end-to-end against pure arithmetic.  Spec compliance (not just
  // round-trip self-consistency) is pinned by decoding our encoder's
  // output with the JDK's INDEPENDENT ImageIO PNG reader in the spec.
  // ---------------------------------------------------------------

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
    def u32be(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val body = tpe.getBytes("US-ASCII") ++ payload
    val crc = new java.util.zip.CRC32
    crc.update(body)
    u32be(payload.length.toLong) ++ body ++ u32be(crc.getValue)
  }

  /** Encodes 8-bit RGB scanline-order `pixels` (3·w·h bytes) as a
    * complete, valid PNG: per-scanline filter `y % 5` (cycling all
    * five spec filters so a decoder must implement every one), zlib
    * deflate at a FIXED level (deterministic for a given JDK), one
    * IDAT, proper CRCs.  Returns a file [[decodePngPixels]] and any
    * external PNG reader accept.
    */
  private[graft] def encodePng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == 3 * w * h, s"need ${3 * w * h} bytes")
    val stride = 3 * w
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= 3) pixels(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) pixels((y - 1) * stride + i - 3) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = v.toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater(6)
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    try {
      defl.setInput(raw)
      defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    } finally defl.end() // native zlib memory — GC finalization is too late
    pngHeader(w, h) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** REAL pixel decode of an 8-bit truecolor PNG: chunk walk →
    * concatenated IDAT inflate → per-scanline unfilter (all five
    * filter types).  Returns (w, h, 3·w·h RGB bytes); anything the
    * strict path can't take (other color types, bad stream) returns
    * None — decode failure must not kill a 100 TB pass.
    */
  private[graft] def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 45) return None
    if (!((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'))
      return None
    if (u32be(b, 8) != 13L ||
      !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = u32be(b, 16).toInt
    val h = u32be(b, 20).toInt
    if (w <= 0 || w > 65536 || h <= 0 || h > 65536) return None
    if ((b(24) & 0xff) != 8 || (b(25) & 0xff) != 2) return None // depth 8, RGB
    if ((b(28) & 0xff) != 0) return None // no interlace
    val idat = new java.io.ByteArrayOutputStream(b.length)
    var off = 33
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = u32be(b, off).toInt
      if (len < 0 || off + 12 + len > b.length) return None
      val tpe = new String(b, off + 4, 4, "US-ASCII")
      if (tpe == "IDAT") idat.write(b, off + 8, len)
      else if (tpe == "IEND") done = true
      off += 12 + len
    }
    val stride = 3 * w
    val raw = new Array[Byte]((stride + 1) * h)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        if (n == 0 && infl.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally infl.end()
    if (got != raw.length) return None
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val v = raw(y * (stride + 1) + 1 + i) & 0xff
        val left = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val out = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case _ => v + paeth(left, up, ul)
        }
        px(y * stride + i) = out.toByte
        i += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** The closed-form pixel content of [[synthesizePngPixels]] images:
    * channel c of pixel (x, y) for image key k.  Pure integer
    * arithmetic — the DuckDB oracle recomputes it verbatim, which is
    * what makes the COMPRESSED pixel path hash-gateable.
    */
  @inline private[graft] def pixelValue(k: Long, x: Int, y: Int, c: Int): Int =
    (((k * 31 + x.toLong * 7 + y.toLong * 13 + c.toLong * 101) % 256) + 256).toInt % 256

  /** Per-row REAL compressed images: pixels from [[pixelValue]] with
    * image key `id % keyMod` (so `keyMod` distinct pixel contents
    * exist corpus-wide and pixel-level dedup has real work), encoded
    * through the full deflate path.  Runs as a typed map — one
    * CPU-bound codec call per row, no shuffle, exactly how a real
    * decode fleet runs at 100 TB.
    */
  def synthesizePngPixels(
      df: DataFrame, idCol: String,
      w: Int, h: Int, keyMod: Int): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val k = id % keyMod
      val px = new Array[Byte](3 * w * h)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            px(i) = pixelValue(k, x, y, c).toByte
            i += 1
            c += 1
          }
          x += 1
        }
        y += 1
      }
      MediaRecord(id, "image/png", encodePng(px, w, h))
    }
  }

  /** Decoded-pixel features (REAL codec output, all exact integers):
    * pixel sum, md5 of the lowercase hex dump of the RGB bytes (the
    * pixel-identity key — hex because the oracle engine's md5 takes
    * strings, and hex is the same ASCII on both sides), and a
    * gradient perceptual hash over the decoded luma: bit (x, y) set
    * iff gray(x+1, y) > gray(x, y) with gray = (r+g+b)/3 integer
    * division — `grad_bits` counts all of them, `grad_word` packs the
    * first 63 (kept positive so BIGINT semantics match everywhere).
    */
  final case class PngPixelFeatures(
      id: Long, width: Int, height: Int, px_sum: Long, px_md5: String,
      grad_bits: Long, grad_word: Long)

  def pngPixelFeatures(ds: Dataset[MediaRecord]): Dataset[PngPixelFeatures] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      decodePngPixels(r.content).map { case (w, h, px) =>
        var sum = 0L
        val hex = new java.lang.StringBuilder(px.length * 2)
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          sum += v
          if (v < 16) hex.append('0')
          hex.append(java.lang.Integer.toHexString(v))
          i += 1
        }
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(hex.toString.getBytes("US-ASCII"))
          .map("%02x".format(_)).mkString
        def gray(x: Int, y: Int): Int = {
          val o = (y * w + x) * 3
          ((px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)) / 3
        }
        var bits = 0L
        var word = 0L
        var k = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if (gray(x + 1, y) > gray(x, y)) {
              bits += 1
              if (k < 63) word |= 1L << k
            }
            k += 1
            x += 1
          }
          y += 1
        }
        PngPixelFeatures(r.id, w, h, sum, md5, bits, word)
      }
    }
  }

  // ---------------------------------------------------------------
  // JPEG compressed-pixel path (the JDK `javax.imageio` codec — the
  // reader/writer pair every JRE ships).  JPEG is LOSSY: for a given
  // JDK the decoded pixels are a deterministic function of the encoded
  // bytes, but they are NOT arithmetic a SQL engine can replay (DCT,
  // quantization, entropy coding).  So the hash gate uses the
  // golden-literal discipline (the q_bpe_train pattern): the
  // synthesized corpus has exactly `keyMod` distinct pixel contents,
  // the decoded-domain stats per key are pinned as literals the oracle
  // joins on `doc_id % keyMod`, and decode FIDELITY is itself part of
  // the gated output — exact integer error-vs-source columns mean a
  // broken codec path cannot reproduce both the decoded md5 AND a
  // small max error against the closed-form source pixels.
  // ---------------------------------------------------------------

  /** Encodes 8-bit RGB scanline-order `pixels` (3·w·h bytes) as a
    * baseline JPEG via the JDK writer at a FIXED explicit quality —
    * the one knob that changes the bytes; pinned so encode is
    * deterministic per JDK.
    */
  private[graft] def encodeJpeg(
      pixels: Array[Byte], w: Int, h: Int, quality: Float): Array[Byte] = {
    require(pixels.length == 3 * w * h, s"need ${3 * w * h} bytes")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y,
          ((pixels(o) & 0xff) << 16) | ((pixels(o + 1) & 0xff) << 8) |
            (pixels(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream(pixels.length / 4 + 1024)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Per-row REAL lossy-compressed images: pixels from [[pixelValue]]
    * with image key `id % keyMod` (same closed form the PNG path
    * uses), encoded through the JDK JPEG writer.  One CPU-bound codec
    * call per row, no shuffle — the decode-fleet shape at 100 TB.
    */
  /** Closed-form JPEG source pixel: a TRIANGLE wave over the same
    * (k, x, y, c) mix the PNG path uses.  The PNG form's raw mod-256
    * wraparound is adversarial for a lossy codec (step edges at every
    * wrap → large DCT ringing would drown the fidelity columns); the
    * triangle fold keeps the content smooth-gradient, which is what
    * makes `sum_abs_err`/`max_err` a real decode-fidelity pin instead
    * of a ringing measurement.
    */
  @inline private[graft] def jpegPixelValue(k: Long, x: Int, y: Int, c: Int): Int = {
    val t = ((((k * 31 + x.toLong * 7 + y.toLong * 13 + c.toLong * 101) % 510)
      + 510) % 510).toInt
    if (t < 255) t else 510 - t
  }

  private[graft] def jpegRecordOf(
      id: Long, w: Int, h: Int, keyMod: Int, quality: Float): MediaRecord = {
    val k = id % keyMod
    val px = new Array[Byte](3 * w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px(i) = jpegPixelValue(k, x, y, c).toByte
          i += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    MediaRecord(id, "image/jpeg", encodeJpeg(px, w, h, quality))
  }

  def synthesizeJpegPixels(
      df: DataFrame, idCol: String,
      w: Int, h: Int, keyMod: Int, quality: Float = 0.9f): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map(id => jpegRecordOf(id, w, h, keyMod, quality))
  }

  /** Decoded-domain JPEG features, all exact integers over the codec's
    * output: pixel sum and md5 of the decoded RGB hex dump (the
    * decoded-identity key), md5 of a `thumb`×`thumb` average-pooled
    * gray thumbnail (the downsampled perceptual key — what image
    * near-dup at scale actually hashes, robust to single-pixel codec
    * jitter), and decode-fidelity columns against the closed-form
    * SOURCE pixels: `sum_abs_err` / `max_err` (needs `keyMod` to
    * rebuild the source from the id).
    */
  final case class JpegPixelFeatures(
      id: Long, width: Int, height: Int, px_sum: Long, px_md5: String,
      thumb_md5: String, sum_abs_err: Long, max_err: Int)

  private[graft] def jpegFeaturesOf(
      r: MediaRecord, keyMod: Int, thumb: Int): Option[JpegPixelFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content)))
      catch { case _: Throwable => None } // decode failure ≠ job failure
    img.map { im =>
        val w = im.getWidth
        val h = im.getHeight
        val k = r.id % keyMod
        var sum = 0L
        var sumErr = 0L
        var maxErr = 0
        val hex = new java.lang.StringBuilder(6 * w * h)
        // pooled-gray accumulators: cell (x * thumb / w, y * thumb / h)
        val cellSum = new Array[Long](thumb * thumb)
        val cellN = new Array[Long](thumb * thumb)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val cs = Array((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            var c = 0
            var g = 0
            while (c < 3) {
              val v = cs(c)
              sum += v
              if (v < 16) hex.append('0')
              hex.append(java.lang.Integer.toHexString(v))
              val e = math.abs(v - jpegPixelValue(k, x, y, c))
              sumErr += e
              if (e > maxErr) maxErr = e
              g += v
              c += 1
            }
            val cell = (y * thumb / h) * thumb + (x * thumb / w)
            cellSum(cell) += g / 3
            cellN(cell) += 1
            x += 1
          }
          y += 1
        }
        def md5hex(s: String): String = java.security.MessageDigest
          .getInstance("MD5").digest(s.getBytes("US-ASCII"))
          .map("%02x".format(_)).mkString
        val thumbHex = new java.lang.StringBuilder(2 * thumb * thumb)
        var t = 0
        while (t < thumb * thumb) {
          val v = if (cellN(t) == 0) 0 else (cellSum(t) / cellN(t)).toInt
          if (v < 16) thumbHex.append('0')
          thumbHex.append(java.lang.Integer.toHexString(v))
          t += 1
        }
        JpegPixelFeatures(r.id, w, h, sum, md5hex(hex.toString),
          md5hex(thumbHex.toString), sumErr, maxErr)
    }
  }

  def jpegPixelFeatures(
      ds: Dataset[MediaRecord], keyMod: Int, thumb: Int = 4): Dataset[JpegPixelFeatures] = {
    import ds.sparkSession.implicits._
    ds.flatMap(jpegFeaturesOf(_, keyMod, thumb))
  }

  /** Lift the documents table into media records (text bytes as the
    * opaque payload) — the test/demo source for the pipeline.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        concat(lit("text/"), col("lang")).as("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaRecord]
  }

  /** End-to-end demo pipeline: documents → media → batched decode →
    * resize → per-kind feature aggregate.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaFromDocuments(spark, dir)
    val feats = resize(decodeFeatures(media), 256)
    feats.toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("nBytes").cast("long")).as("total_bytes"),
        max("width").as("max_width"),
        max("height").as("max_height"),
        sum(element_at(col("byteHistogram"), 7)).as("hist_bucket6_total"))
      .orderBy("kind")
  }

  // ---------------------------------------------------------------
  // MJPEG-in-MP4: the frame path made REAL.  The container's mdat is
  // a sequence of genuine JDK-encoded JPEG frames, so frame-sampling
  // + per-frame pixel decode runs the actual codec end-to-end — the
  // video analog of the still-JPEG pixel path, closing the "codec
  // payload stubbed" boundary for the one codec the JVM ships.
  // (H.264/VP9 payloads remain out of scope: no JDK decoder exists.)
  // ---------------------------------------------------------------

  /** Per-row MJPEG MP4: real ftyp/moov header (real dims, duration =
    * 40 ms/frame) + `nFrames` real JPEG frames as the mdat payload.
    * Frame `f` of stream key `k = id % keyMod` draws its source
    * pixels from key `k·nFrames + f` of the SAME closed form the
    * still-JPEG path uses — so the golden-literal discipline covers
    * frames with one more key dimension and nothing else changes.
    */
  private[graft] def mjpegRecordOf(
      id: Long, w: Int, h: Int, keyMod: Int, nFrames: Int,
      quality: Float): MediaRecord = {
    val k = id % keyMod
    val frames = (0 until nFrames).toArray.map { f =>
      jpegRecordOf(k * nFrames + f, w, h, keyMod * nFrames, quality).content
    }
    MediaRecord(id, "video/mp4",
      mp4Header(w, h, nFrames * 40L) ++ frames.flatten)
  }

  def synthesizeMjpegMp4(
      df: DataFrame, idCol: String, w: Int, h: Int, keyMod: Int,
      nFrames: Int, quality: Float = 0.9f): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map(id => mjpegRecordOf(id, w, h, keyMod, nFrames, quality))
  }

  /** JPEG frame spans inside `bytes[from, until)` by a REAL marker
    * walk (not a naive FFD8/FFD9 scan): SOI, then marker segments
    * skipped by their length fields, then entropy-coded data — where
    * 0xFF is always followed by 0x00 (stuffing) or RST/EOI markers —
    * until EOI.  A length-field walk is what makes the split immune
    * to FFD9-looking bytes inside table segments.
    */
  /** SOI→EOI frame spans inside `[from, until)`.  TOTAL on arbitrary
    * bytes: a frame whose segment walk breaks (bad marker, truncated
    * length, no EOI) is DROPPED and scanning resumes after its SOI —
    * one corrupt frame in a 100 TB pass costs that frame, not the job
    * (same contract as every other parser here; the fuzz pins it).
    */
  private[graft] def jpegFrameSpans(
      bytes: Array[Byte], from: Int, until: Int): Seq[(Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xff
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = math.max(0, from)
    while (i + 1 < until) {
      if (u8(i) == 0xff && u8(i + 1) == 0xd8) { // SOI
        val start = i
        var j = i + 2
        var inScan = false
        var end = -1
        var broken = false
        while (end < 0 && !broken && j + 1 < until) {
          if (!inScan) {
            // segment walk: FF marker [len payload]
            if (u8(j) != 0xff) broken = true
            else {
              val m = u8(j + 1)
              if (m == 0xda) { // SOS: skip its header too
                if (j + 3 >= until) broken = true
                else { inScan = true; j += 2 + ((u8(j + 2) << 8) | u8(j + 3)) }
              } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) j += 2
              else if (j + 3 >= until) broken = true
              else j += 2 + ((u8(j + 2) << 8) | u8(j + 3))
            }
          } else {
            if (u8(j) == 0xff) {
              val m = u8(j + 1)
              if (m == 0xd9) end = j + 2 // EOI
              else j += 2 // stuffing 00 or RSTn
            } else j += 1
          }
        }
        if (end > 0) { out += ((start, end)); i = end }
        else i = start + 2 // corrupt frame: drop it, rescan past its SOI
      } else i += 1
    }
    out.toSeq
  }

  final case class MjpegFrame(
      id: Long, frame_idx: Long, width: Int, height: Int,
      px_sum: Long, thumb_md5: String, max_err: Int)

  /** Frame-SAMPLE + decode: keep every `everyN`th frame of each
    * record's mdat, run the real JPEG pixel decode on just those —
    * the standard video-corpus move (decode cost ∝ sampled frames,
    * not stream length).  Per-record work is pure and partition-local.
    */
  def mjpegSampleFrames(
      ds: Dataset[MediaRecord], keyMod: Int, nFrames: Int, everyN: Int,
      thumb: Int = 4): Dataset[MjpegFrame] = {
    import ds.sparkSession.implicits._
    require(everyN >= 1, s"everyN=$everyN")
    ds.flatMap { r =>
      val bytes = r.content
      // the fixed synthesis header contains the single real 'mdat'
      val marker = "mdat".getBytes("US-ASCII")
      // a record with no mdat is malformed media: contribute nothing
      // rather than killing the pass (the parser-family contract)
      val at = bytes.indices.find(i => i + 4 <= bytes.length &&
        bytes(i) == marker(0) && bytes(i + 1) == marker(1) &&
        bytes(i + 2) == marker(2) && bytes(i + 3) == marker(3))
        .getOrElse(-1)
      if (at < 0) Nil
      else {
      val spans = jpegFrameSpans(bytes, at + 4, bytes.length)
      spans.zipWithIndex
        .filter { case (_, f) => f % everyN == 0 }
        .flatMap { case ((s, e), f) =>
          val frameKey = (r.id % keyMod) * nFrames + f
          val rec = MediaRecord(frameKey, "image/jpeg",
            java.util.Arrays.copyOfRange(bytes, s, e))
          jpegFeaturesOf(rec, keyMod * nFrames, thumb).map { jf =>
            MjpegFrame(r.id, f.toLong, jf.width, jf.height,
              jf.px_sum, jf.thumb_md5, jf.max_err)
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // VP9 METADATA path (no pixel decode): the WebM/VP9 analog of the
  // H.264 avcC/SPS surface above.  VP9 carries its stream parameters
  // in every keyframe's UNCOMPRESSED HEADER (VP9 Bitstream & Decoding
  // Process Specification §6.2, public): frame_marker, profile bits,
  // frame_type, the 0x498342 sync code, color_config (bit depth,
  // color space) and frame_size — all plain bit arithmetic before any
  // arithmetic-coded payload.  Keyframe POSITIONS come from the EBML
  // SimpleBlock walk (the WebM layer has no stss; seekability = which
  // blocks start with a frame_type==KEY header).  Together these give
  // a video-corpus user the same sampling surface as the H.264 path:
  // true coded dims, profile/depth, and where the seek points live.
  // ---------------------------------------------------------------

  /** Parsed VP9 stream metadata: profile/bit-depth/color-space and
    * TRUE coded dimensions from the first keyframe's uncompressed
    * header, plus the keyframe census (count + first two keyframes'
    * absolute byte offsets of the frame payload; −1 when absent).
    */
  final case class Vp9Meta(
      id: Long, profile: Long, bitDepth: Long, colorSpace: Long,
      width: Long, height: Long,
      nKeyframes: Long, kf1Off: Long, kf2Off: Long)

  /** MSB-first bit reader over a byte range (VP9 headers are raw bits,
    * no NAL escaping).  Reads past the end return 0 and flip `ok`.
    */
  private final class Vp9BitReader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from.toLong * 8
    private val end = until.toLong * 8
    var ok: Boolean = true
    def bit(): Int = {
      if (pos >= end) { ok = false; return 0 }
      val i = pos; pos += 1
      (b((i >> 3).toInt) >> (7 - (i & 7)).toInt) & 1
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** One VP9 uncompressed header, parsed far enough to classify the
    * frame and (for keyframes) recover the stream parameters:
    * (isKey, profile, bitDepth, colorSpace, width, height).
    * `show_existing_frame` repeats and malformed headers return None.
    */
  private def vp9FrameHeader(
      b: Array[Byte], from: Int, until: Int): Option[(Boolean, Long, Long, Long, Long, Long)] = {
    val r = new Vp9BitReader(b, from, until)
    if (r.bits(2) != 2L) return None // frame_marker
    val profLow = r.bit()
    val profHigh = r.bit()
    val profile = (profHigh << 1) + profLow
    if (profile == 3 && r.bit() != 0) return None // reserved_zero
    if (r.bit() == 1) return None // show_existing_frame: not a new frame
    val frameType = r.bit() // 0 = KEY_FRAME
    r.bit() // show_frame
    r.bit() // error_resilient_mode
    if (frameType != 0) {
      if (!r.ok) None else Some((false, profile.toLong, 0L, 0L, 0L, 0L))
    } else {
      if (r.bits(24) != 0x498342L) return None // frame_sync_code
      // color_config
      val bitDepth =
        if (profile >= 2) { if (r.bit() == 1) 12L else 10L } else 8L
      val colorSpace = r.bits(3)
      if (colorSpace != 7L) { // != CS_RGB
        r.bit() // color_range
        if (profile == 1 || profile == 3) { r.bit(); r.bit(); r.bit() }
      } else {
        if (profile == 1 || profile == 3) r.bit() // reserved_zero
      }
      val w = r.bits(16) + 1 // frame_size
      val h = r.bits(16) + 1
      if (!r.ok) None
      else Some((true, profile.toLong, bitDepth, colorSpace, w, h))
    }
  }

  /** WebM walk → VP9 keyframe census: finds the V_VP9 track, then for
    * every SimpleBlock of that track bit-parses the frame's
    * uncompressed header.  Returns None for non-WebM payloads, files
    * without a V_VP9 track, or any malformed block — decode failure
    * must not kill a 100 TB pass, rows just drop (same contract as
    * every decode surface here).
    */
  private[graft] def vp9MetaOf(r: MediaRecord): Option[Vp9Meta] = {
    val b = r.content
    if (b == null || b.length < 8) return None
    if (!((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)) return None

    def varint(off: Int, keepMarker: Boolean): Option[(Long, Int, Boolean)] = {
      if (off >= b.length) return None
      val first = b(off) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (len < 1 || len > 8 || off + len > b.length) return None
      var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
      var allOnes = !keepMarker && (first & (0xff >>> len)) == (0xff >>> len)
      var i = 1
      while (i < len) {
        val byte = b(off + i) & 0xff
        if (byte != 0xff) allOnes = false
        v = (v << 8) | byte
        i += 1
      }
      Some((v, len, allOnes))
    }
    def uintAt(off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }

    var vp9Track = -1L
    var nKey = 0L
    var kf1 = -1L
    var kf2 = -1L
    var meta: Option[(Long, Long, Long, Long, Long)] = None

    // pass inside one TrackEntry: is it the V_VP9 track, and which number?
    def trackEntry(from: Int, until: Int): Unit = {
      var num = -1L
      var isVp9 = false
      var off = from
      while (off < until) {
        val (id, idLen, _) = varint(off, keepMarker = true).getOrElse(return)
        val (sz, szLen, _) = varint(off + idLen, keepMarker = false).getOrElse(return)
        val payload = off + idLen + szLen
        // bound-check as Long BEFORE the Int cast: an 8-byte wire size
        // overflows toInt negative and would walk the buffer backwards
        if (sz < 0 || sz > (until - payload).toLong) return
        val payloadEnd = payload + sz.toInt
        id match {
          case 0xD7L => num = uintAt(payload, payloadEnd - payload) // TrackNumber
          case 0x86L => // CodecID
            isVp9 = new String(b, payload, payloadEnd - payload, "US-ASCII") == "V_VP9"
          case _ => ()
        }
        off = payloadEnd
      }
      if (isVp9 && num > 0 && vp9Track < 0) vp9Track = num
    }

    def simpleBlock(payload: Int, payloadEnd: Int): Boolean = {
      val (track, tLen, _) = varint(payload, keepMarker = false).getOrElse(return false)
      if (track != vp9Track) return true // other track: skip, not an error
      val frameOff = payload + tLen + 3 // int16 timestamp + flags byte
      if (frameOff >= payloadEnd) return false
      vp9FrameHeader(b, frameOff, payloadEnd) match {
        case Some((isKey, profile, depth, cs, w, h)) =>
          if (isKey) {
            nKey += 1
            if (kf1 < 0) kf1 = frameOff.toLong
            else if (kf2 < 0) kf2 = frameOff.toLong
            if (meta.isEmpty) meta = Some((profile, depth, cs, w, h))
          }
          true
        case None => false
      }
    }

    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off < until) {
        val (id, idLen, _) = varint(off, keepMarker = true).getOrElse(return false)
        val (sz, szLen, unknown) = varint(off + idLen, keepMarker = false).getOrElse(return false)
        val payload = off + idLen + szLen
        val payloadEnd =
          if (unknown) { if (id == 0x18538067L) until else return false }
          else {
            val e = payload + sz
            if (e > until || sz < 0) return false
            e.toInt
          }
        id match {
          case 0x18538067L | 0x1654AE6BL | 0x1F43B675L => // Segment/Tracks/Cluster
            if (depth < 4 && !walk(payload, payloadEnd, depth + 1)) return false
          case 0xAEL => trackEntry(payload, payloadEnd) // TrackEntry
          case 0xA3L if vp9Track > 0 => // SimpleBlock (document order puts Tracks first)
            if (!simpleBlock(payload, payloadEnd)) return false
          case _ => () // EBML header, Info, Timestamp, Void, ...
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0) || vp9Track < 0) return None
    meta.map { case (profile, depth, cs, w, h) =>
      Vp9Meta(r.id, profile, depth, cs, w, h, nKey, kf1, kf2)
    }
  }

  /** Batched partition-local VP9 metadata extraction — rows without a
    * V_VP9 track (or with malformed blocks) drop.
    */
  def vp9Meta(ds: Dataset[MediaRecord]): Dataset[Vp9Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(vp9MetaOf))
  }

  // -- synthesis (the oracle side) --------------------------------

  private[graft] val Vp9FrameCount = 8
  private[graft] val Vp9HeaderBytes = 512 // EBML + Info/Tracks, Void-padded
  /** Per-SimpleBlock bytes before the frame payload: element id (1) +
    * fixed 4-byte size varint + track varint (1) + int16 timestamp +
    * flags.
    */
  private[graft] val Vp9BlockOverhead = 9
  /** Frame payload bytes beyond the text split: room for the bit-packed
    * uncompressed header (≤ 10 bytes) in every frame.
    */
  private[graft] val Vp9FramePadBytes = 16
  /** Absolute offset of the FIRST frame payload: header pad + cluster
    * id/size (8) + Timestamp element (3) + block overhead.
    */
  private[graft] val Vp9FirstFrameOff: Long =
    Vp9HeaderBytes + 8L + 3L + Vp9BlockOverhead

  /** Per-row WebM with a real V_VP9 track and [[Vp9FrameCount]] frames
    * whose uncompressed headers are REAL VP9 bitstream (§6.2): frame
    * `j` is a keyframe iff `j % gop == 0` (gop = `2 + id%3`), carrying
    * sync code, color_config and frame_size; interframes carry the
    * inter header prefix.  Parameterization per id: profile `id%4`
    * (covering the profile-3 reserved bit), 10-bit for profiles ≥ 2
    * (`ten_or_twelve_bit`=0), color space `1 + id%5` (never CS_RGB),
    * dims `(426 + id%7) × (240 + id%5)` — VP9 needs no macroblock
    * rounding, `frame_size` is exact.  Frame `j`'s payload length is
    * `Vp9FramePadBytes + n/8 (+1 for j < n%8)` (n = text bytes) and a
    * Void element pads the pre-Cluster header to [[Vp9HeaderBytes]],
    * so every keyframe offset replays from SQL arithmetic.
    */
  def synthesizeVp9Webm(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])).as("t"))
      .as[(Long, Array[Byte])].map { case (id, text) =>
        val profile = (id % 4).toInt
        val cs = 1 + (id % 5).toInt
        val w = 426 + (id % 7).toInt
        val h = 240 + (id % 5).toInt
        val gop = 2 + (id % 3).toInt
        val n = text.length

        def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
          // shortest-form size varint (payloads here are < 2^14-1)
          val sz = payload.length
          val szBytes =
            if (sz < 127) Array[Byte]((0x80 | sz).toByte)
            else Array[Byte]((0x40 | (sz >> 8)).toByte, sz.toByte)
          idBytes ++ szBytes ++ payload
        }
        def be(v: Long, len: Int): Array[Byte] =
          Array.tabulate(len)(i => (v >> (8 * (len - 1 - i))).toByte)

        def vp9Frame(j: Int): Array[Byte] = {
          val bw = new BitWriter
          bw.bits(2L, 2) // frame_marker
          bw.bit(profile & 1) // profile_low_bit
          bw.bit((profile >> 1) & 1) // profile_high_bit
          if (profile == 3) bw.bit(0) // reserved_zero
          bw.bit(0) // show_existing_frame
          val isKey = j % gop == 0
          bw.bit(if (isKey) 0 else 1) // frame_type
          bw.bit(1) // show_frame
          bw.bit(0) // error_resilient_mode
          if (isKey) {
            bw.bits(0x498342L, 24) // frame_sync_code
            if (profile >= 2) bw.bit(0) // ten_or_twelve_bit → 10-bit
            bw.bits(cs.toLong, 3) // color_space (never CS_RGB here)
            bw.bit(0) // color_range
            if (profile == 1 || profile == 3) {
              bw.bit(0); bw.bit(0); bw.bit(0) // subsampling + reserved
            }
            bw.bits((w - 1).toLong, 16)
            bw.bits((h - 1).toLong, 16)
          }
          val head = bw.padAlign()
          val len = Vp9FramePadBytes + n / Vp9FrameCount +
            (if (j < n % Vp9FrameCount) 1 else 0)
          head ++ new Array[Byte](len - head.length)
        }

        val blocks = (0 until Vp9FrameCount).flatMap { j =>
          val frame = vp9Frame(j)
          val body = Array[Byte](0x81.toByte) ++ be(j * 40L, 2) ++
            Array[Byte](if (j % gop == 0) 0x80.toByte else 0x00) ++ frame
          // fixed 4-byte size varint so the offset math is constant
          Array(0xA3.toByte) ++ be(0x10000000L | body.length.toLong, 4) ++ body
        }.toArray
        val cluster = be(0x1F43B675L, 4) ++
          be(0x10000000L | (3L + blocks.length), 4) ++
          el(Array(0xE7.toByte), Array[Byte](0)) ++ blocks

        val ebmlHead = el(be(0x1A45DFA3L, 4),
          el(be(0x4286L, 2), Array[Byte](1)) ++ // EBMLVersion
            el(be(0x4282L, 2), "webm".getBytes("US-ASCII"))) // DocType
        val info = el(be(0x1549A966L, 4),
          el(be(0x2AD7B1L, 3), be(1000000L, 3)) ++ // TimestampScale
            el(be(0x4489L, 2), // Duration (float64, scale units)
              be(java.lang.Double.doubleToLongBits(Vp9FrameCount * 40.0), 8)))
        val video = el(Array(0xE0.toByte),
          el(Array(0xB0.toByte), be(w.toLong, 2)) ++
            el(Array(0xBA.toByte), be(h.toLong, 2)))
        val track = el(Array(0xAE.toByte),
          el(Array(0xD7.toByte), Array[Byte](1)) ++ // TrackNumber
            el(Array(0x83.toByte), Array[Byte](1)) ++ // TrackType video
            el(be(0x86L, 1), "V_VP9".getBytes("US-ASCII")) ++ video)
        val tracks = el(be(0x1654AE6BL, 4), track)

        // Segment with a fixed 8-byte size varint; Void pads the
        // pre-Cluster region to exactly Vp9HeaderBytes
        val preCluster = ebmlHead.length + 4 + 8 + info.length + tracks.length
        val voidLen = Vp9HeaderBytes - preCluster // total Void bytes
        require(voidLen >= 3,
          s"synthesizeVp9Webm: header $preCluster exceeds the pad budget")
        val voidEl = Array(0xEC.toByte,
          (0x40 | ((voidLen - 3) >> 8)).toByte, (voidLen - 3).toByte) ++
          new Array[Byte](voidLen - 3)
        val segPayload = info ++ tracks ++ voidEl ++ cluster
        val segment = be(0x18538067L, 4) ++
          be(0x0100000000000000L | segPayload.length.toLong, 8) ++ segPayload
        MediaRecord(id, "video/webm", ebmlHead ++ segment)
      }
  }

  // ---------------------------------------------------------------
  // AV1 METADATA path: the third modern codec, same no-pixel-decode
  // contract.  AV1 carries its stream parameters in the SEQUENCE
  // HEADER OBU (AV1 Bitstream & Decoding Process Specification
  // §5.5, public): seq_profile, seq_level_idx, color_config bit
  // depth, and max frame dimensions — and each frame OBU's
  // uncompressed header opens with show_existing_frame/frame_type,
  // which classifies keyframes.  OBU framing (§5.3.2: 1-byte header
  // + leb128 size) and the WebM V_AV1 SimpleBlock walk give the
  // keyframe census; a seek point is the START of the temporal unit
  // (the sequence OBU precedes the keyframe), so keyframe offsets
  // are block-payload starts.
  // ---------------------------------------------------------------

  /** Parsed AV1 stream metadata: profile/level/bit-depth and max
    * frame dims from the sequence header OBU, keyframe census from
    * the frame OBUs' uncompressed-header prefix.
    */
  final case class Av1Meta(
      id: Long, profile: Long, level: Long, bitDepth: Long,
      width: Long, height: Long,
      nKeyframes: Long, kf1Off: Long, kf2Off: Long)

  /** Sequence-header fields the frame-header parse depends on. */
  private final case class Av1SeqInfo(
      profile: Int, level: Int, bitDepth: Int, width: Int, height: Int,
      reducedStillPicture: Boolean, frameIdNumbers: Boolean)

  /** §5.5 sequence_header_obu — walks exactly the fields our
    * synthesis emits (single operating point, no timing info, no
    * order hint, level ≤ 7 so no tier bit) and returns None on any
    * layout this subset parser cannot prove it understood.
    */
  private def av1SeqHeader(b: Array[Byte], from: Int, until: Int): Option[Av1SeqInfo] = {
    val r = new Vp9BitReader(b, from, until)
    val profile = r.bits(3).toInt
    if (profile > 2) return None
    r.bit() // still_picture
    val reduced = r.bit() == 1
    var level = 0
    if (reduced) {
      level = r.bits(5).toInt
    } else {
      if (r.bit() == 1) return None // timing_info_present: not emitted
      if (r.bit() == 1) return None // initial_display_delay_present
      if (r.bits(5) != 0) return None // operating_points_cnt_minus_1
      r.bits(12) // operating_point_idc[0]
      level = r.bits(5).toInt
      if (level > 7) r.bit() // seq_tier[0]
    }
    val wBits = r.bits(4).toInt + 1
    val hBits = r.bits(4).toInt + 1
    val width = r.bits(wBits).toInt + 1
    val height = r.bits(hBits).toInt + 1
    val frameIds =
      if (reduced) false
      else {
        val f = r.bit() == 1
        if (f) return None // frame_id_numbers: not emitted
        f
      }
    r.bit() // use_128x128_superblock
    r.bit(); r.bit() // enable_filter_intra, enable_intra_edge_filter
    if (!reduced) {
      r.bit(); r.bit(); r.bit(); r.bit() // interintra/masked/warped/dual
      val orderHint = r.bit() == 1
      if (orderHint) return None // not emitted; shifts everything after
      val chooseSct = r.bit() == 1
      val forceSct = if (chooseSct) 2 else r.bit()
      if (forceSct > 0) {
        val chooseIntMv = r.bit() == 1
        if (!chooseIntMv) r.bit() // force_integer_mv literal
      }
      // order_hint_bits only when enable_order_hint
    }
    r.bit(); r.bit(); r.bit() // enable_superres/cdef/restoration
    // color_config (§5.5.2)
    val high = r.bit() == 1
    val twelve = if (profile == 2 && high) r.bit() == 1 else false
    val depth =
      if (profile == 2 && high) { if (twelve) 12 else 10 }
      else if (high) 10 else 8
    val mono = if (profile == 1) false else r.bit() == 1
    if (mono) return None // not emitted
    if (r.bit() == 1) return None // color_description_present: not emitted
    r.bit() // color_range
    var subX = 0
    var subY = 0
    if (profile == 0) { subX = 1; subY = 1 }
    else if (profile == 1) { subX = 0; subY = 0 }
    else { // profile 2
      if (depth == 12) { subX = r.bit(); subY = if (subX == 1) r.bit() else 0 }
      else { subX = 1; subY = r.bit() }
    }
    if (subX == 1 && subY == 1) r.bits(2) // chroma_sample_position
    r.bit() // separate_uv_delta_q
    if (!r.ok) None
    else Some(Av1SeqInfo(profile, level, depth, width, height, reduced, frameIds))
  }

  /** WebM/V_AV1 walk → sequence-header metadata + keyframe census.
    * Same drop-on-malformed contract as every decode surface here.
    */
  private[graft] def av1MetaOf(r: MediaRecord): Option[Av1Meta] = {
    val b = r.content
    if (b == null || b.length < 8) return None
    if (!((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)) return None

    def varint(off: Int, keepMarker: Boolean): Option[(Long, Int, Boolean)] = {
      if (off >= b.length) return None
      val first = b(off) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (len < 1 || len > 8 || off + len > b.length) return None
      var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
      var allOnes = !keepMarker && (first & (0xff >>> len)) == (0xff >>> len)
      var i = 1
      while (i < len) {
        val byte = b(off + i) & 0xff
        if (byte != 0xff) allOnes = false
        v = (v << 8) | byte
        i += 1
      }
      Some((v, len, allOnes))
    }
    def uintAt(off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }

    var av1Track = -1L
    var seq: Option[Av1SeqInfo] = None
    var nKey = 0L
    var kf1 = -1L
    var kf2 = -1L

    def trackEntry(from: Int, until: Int): Unit = {
      var num = -1L
      var isAv1 = false
      var off = from
      while (off < until) {
        val (id, idLen, _) = varint(off, keepMarker = true).getOrElse(return)
        val (sz, szLen, _) = varint(off + idLen, keepMarker = false).getOrElse(return)
        val payload = off + idLen + szLen
        // Long bound check BEFORE the Int cast (same rationale as vp9)
        if (sz < 0 || sz > (until - payload).toLong) return
        val payloadEnd = payload + sz.toInt
        id match {
          case 0xD7L => num = uintAt(payload, payloadEnd - payload)
          case 0x86L =>
            isAv1 = new String(b, payload, payloadEnd - payload, "US-ASCII") == "V_AV1"
          case _ => ()
        }
        off = payloadEnd
      }
      if (isAv1 && num > 0 && av1Track < 0) av1Track = num
    }

    /** §5.3.2 leb128 (up to 8 bytes). Returns (value, nBytes). */
    def leb128(off: Int, until: Int): Option[(Long, Int)] = {
      var v = 0L
      var i = 0
      while (i < 8 && off + i < until) {
        val byte = b(off + i) & 0xff
        v |= (byte & 0x7fL) << (7 * i)
        i += 1
        if ((byte & 0x80) == 0) return Some((v, i))
      }
      None
    }

    def simpleBlock(payload: Int, payloadEnd: Int): Boolean = {
      val (track, tLen, _) = varint(payload, keepMarker = false).getOrElse(return false)
      if (track != av1Track) return true
      var off = payload + tLen + 3 // int16 ts + flags byte
      val tuStart = off.toLong // temporal-unit start = the seek point
      var sawKey = false
      while (off < payloadEnd) {
        val hdr = b(off) & 0xff
        if ((hdr & 0x80) != 0) return false // forbidden bit
        val obuType = (hdr >> 3) & 0xf
        if ((hdr & 0x04) != 0) return false // extension: not emitted
        if ((hdr & 0x02) == 0) return false // must have size field
        val (sz, szLen) = leb128(off + 1, payloadEnd).getOrElse(return false)
        val p = off + 1 + szLen
        // Long bound check BEFORE the Int cast: a 8-byte leb128 size
        // overflows toInt negative and indexes behind the buffer
        if (sz < 0 || sz > (payloadEnd - p).toLong) return false
        val pEnd = p + sz.toInt
        obuType match {
          case 1 => // OBU_SEQUENCE_HEADER
            val s = av1SeqHeader(b, p, pEnd).getOrElse(return false)
            if (seq.isEmpty) seq = Some(s)
          case 6 => // OBU_FRAME: uncompressed-header prefix
            val s = seq.getOrElse(return false) // config must precede frames
            val isKey =
              if (s.reducedStillPicture) true // §5.9.2: implied KEY_FRAME
              else {
                val fr = new Vp9BitReader(b, p, pEnd)
                if (fr.bit() == 1) false // show_existing_frame: a repeat
                else fr.bits(2) == 0L // frame_type KEY_FRAME
              }
            if (isKey) sawKey = true
          case _ => () // temporal delimiter, metadata, padding...
        }
        off = pEnd
      }
      if (sawKey) {
        nKey += 1
        if (kf1 < 0) kf1 = tuStart else if (kf2 < 0) kf2 = tuStart
      }
      true
    }

    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off < until) {
        val (id, idLen, _) = varint(off, keepMarker = true).getOrElse(return false)
        val (sz, szLen, unknown) = varint(off + idLen, keepMarker = false).getOrElse(return false)
        val payload = off + idLen + szLen
        val payloadEnd =
          if (unknown) { if (id == 0x18538067L) until else return false }
          else {
            val e = payload + sz
            if (e > until || sz < 0) return false
            e.toInt
          }
        id match {
          case 0x18538067L | 0x1654AE6BL | 0x1F43B675L =>
            if (depth < 4 && !walk(payload, payloadEnd, depth + 1)) return false
          case 0xAEL => trackEntry(payload, payloadEnd)
          case 0xA3L if av1Track > 0 =>
            if (!simpleBlock(payload, payloadEnd)) return false
          case _ => ()
        }
        off = payloadEnd
      }
      off == until
    }
    if (!walk(0, b.length, 0) || av1Track < 0) return None
    seq.map { s =>
      Av1Meta(r.id, s.profile, s.level, s.bitDepth, s.width, s.height,
        nKey, kf1, kf2)
    }
  }

  /** Batched partition-local AV1 metadata extraction. */
  def av1Meta(ds: Dataset[MediaRecord]): Dataset[Av1Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(av1MetaOf))
  }

  // -- synthesis (the oracle side) --------------------------------

  private[graft] val Av1FrameCount = 8
  private[graft] val Av1HeaderBytes = 512
  private[graft] val Av1BlockOverhead = 9 // id + 4B size varint + track + ts + flags
  private[graft] val Av1FramePadBytes = 16
  /** Absolute offset of the FIRST block's temporal unit (= kf1). */
  private[graft] val Av1FirstTuOff: Long = Av1HeaderBytes + 8L + 3L + Av1BlockOverhead

  /** Byte length of the synthesized sequence-header OBU (header +
    * leb128 + payload) for a given (profile, highBitdepth) — the
    * layout constant the oracle's keyframe arithmetic needs.
    */
  private[graft] def av1SeqObuLen(profile: Int, high: Boolean): Int =
    3 + av1SeqPayload(profile, high, 0, 2, 2).length // 1B header + 2B leb128

  private def av1SeqPayload(
      profile: Int, high: Boolean, level: Int, w: Int, h: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.bits(profile.toLong, 3)
    bw.bit(0) // still_picture
    bw.bit(0) // reduced_still_picture_header
    bw.bit(0); bw.bit(0) // timing_info, initial_display_delay
    bw.bits(0L, 5) // operating_points_cnt_minus_1
    bw.bits(0L, 12) // operating_point_idc[0]
    bw.bits(level.toLong, 5) // seq_level_idx[0] (≤ 7: no tier bit)
    bw.bits(15L, 4); bw.bits(15L, 4) // frame_width/height_bits_minus_1
    bw.bits((w - 1).toLong, 16)
    bw.bits((h - 1).toLong, 16)
    bw.bit(0) // frame_id_numbers_present_flag
    bw.bit(1) // use_128x128_superblock
    bw.bit(0); bw.bit(0) // enable_filter_intra, intra_edge_filter
    bw.bit(0); bw.bit(0); bw.bit(0); bw.bit(0) // interintra/masked/warped/dual
    bw.bit(0) // enable_order_hint
    bw.bit(1) // seq_choose_screen_content_tools → SELECT (2)
    bw.bit(1) // seq_choose_integer_mv (force_sct > 0)
    bw.bit(0); bw.bit(0); bw.bit(0) // superres/cdef/restoration
    // color_config
    bw.bit(if (high) 1 else 0)
    if (profile == 2 && high) bw.bit(0) // twelve_bit → 10
    if (profile != 1) bw.bit(0) // mono_chrome
    bw.bit(0) // color_description_present
    bw.bit(0) // color_range
    val depth12 = false
    if (profile == 2) {
      if (depth12) { bw.bit(1); bw.bit(1) }
      else bw.bit(1) // subsampling_y = 1 (4:2:0)
    }
    val subXY = profile != 1 // profiles 0 and 2-as-emitted are 4:2:0
    if (subXY) bw.bits(0L, 2) // chroma_sample_position
    bw.bit(0) // separate_uv_delta_q
    // trailing_bits: stop + align (§5.3.4)
    bw.stopAndAlign()
  }

  /** Per-row WebM with a real V_AV1 track: every keyframe block opens
    * with a REAL §5.5 sequence-header OBU followed by an OBU_FRAME
    * whose uncompressed-header prefix carries the frame_type;
    * interframes are a single OBU_FRAME.  Parameterization per id:
    * profile `id%3`, 10-bit when `id%2=1`, level `4 + id%4` (≤ 7),
    * dims `(640+id%9) × (360+id%7)`, keyframes every `2 + id%3` of
    * [[Av1FrameCount]] frames.  Frame OBU payloads are
    * `Av1FramePadBytes + n/8 (+1)` bytes (text split), sizes ship as
    * fixed 2-byte leb128 so the oracle replays every offset.
    */
  def synthesizeAv1Webm(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("binary"), lit(Array.empty[Byte])).as("t"))
      .as[(Long, Array[Byte])].map { case (id, text) =>
        val profile = (id % 3).toInt
        val high = id % 2 == 1
        val level = 4 + (id % 4).toInt
        val w = 640 + (id % 9).toInt
        val h = 360 + (id % 7).toInt
        val gop = 2 + (id % 3).toInt
        val n = text.length

        def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
          val sz = payload.length
          val szBytes =
            if (sz < 127) Array[Byte]((0x80 | sz).toByte)
            else Array[Byte]((0x40 | (sz >> 8)).toByte, sz.toByte)
          idBytes ++ szBytes ++ payload
        }
        def be(v: Long, len: Int): Array[Byte] =
          Array.tabulate(len)(i => (v >> (8 * (len - 1 - i))).toByte)
        def obu(tpe: Int, payload: Array[Byte]): Array[Byte] =
          // header: type + has_size; fixed 2-byte leb128 size
          Array[Byte](((tpe << 3) | 0x02).toByte,
            (0x80 | (payload.length & 0x7f)).toByte,
            (payload.length >> 7).toByte) ++ payload

        val seqObuBytes = {
          val p = av1SeqPayload(profile, high, level, w, h)
          Array[Byte]((1 << 3 | 0x02).toByte,
            (0x80 | (p.length & 0x7f)).toByte, (p.length >> 7).toByte) ++ p
        }
        def frameObu(j: Int): Array[Byte] = {
          val bw = new BitWriter
          val isKey = j % gop == 0
          bw.bit(0) // show_existing_frame
          bw.bits(if (isKey) 0L else 1L, 2) // frame_type KEY / INTER
          bw.bit(1) // show_frame
          val head = bw.padAlign()
          val len = Av1FramePadBytes + n / Av1FrameCount +
            (if (j < n % Av1FrameCount) 1 else 0)
          obu(6, head ++ new Array[Byte](len - head.length))
        }

        val blocks = (0 until Av1FrameCount).flatMap { j =>
          val isKey = j % gop == 0
          val tu = (if (isKey) seqObuBytes else Array.empty[Byte]) ++ frameObu(j)
          val body = Array[Byte](0x81.toByte) ++ be(j * 40L, 2) ++
            Array[Byte](if (isKey) 0x80.toByte else 0x00) ++ tu
          Array(0xA3.toByte) ++ be(0x10000000L | body.length.toLong, 4) ++ body
        }.toArray
        val cluster = be(0x1F43B675L, 4) ++
          be(0x10000000L | (3L + blocks.length), 4) ++
          el(Array(0xE7.toByte), Array[Byte](0)) ++ blocks

        val ebmlHead = el(be(0x1A45DFA3L, 4),
          el(be(0x4286L, 2), Array[Byte](1)) ++
            el(be(0x4282L, 2), "webm".getBytes("US-ASCII")))
        val info = el(be(0x1549A966L, 4),
          el(be(0x2AD7B1L, 3), be(1000000L, 3)) ++
            el(be(0x4489L, 2),
              be(java.lang.Double.doubleToLongBits(Av1FrameCount * 40.0), 8)))
        val video = el(Array(0xE0.toByte),
          el(Array(0xB0.toByte), be(w.toLong, 2)) ++
            el(Array(0xBA.toByte), be(h.toLong, 2)))
        val track = el(Array(0xAE.toByte),
          el(Array(0xD7.toByte), Array[Byte](1)) ++
            el(Array(0x83.toByte), Array[Byte](1)) ++
            el(be(0x86L, 1), "V_AV1".getBytes("US-ASCII")) ++ video)
        val tracks = el(be(0x1654AE6BL, 4), track)

        val preCluster = ebmlHead.length + 4 + 8 + info.length + tracks.length
        val voidLen = Av1HeaderBytes - preCluster
        require(voidLen >= 3,
          s"synthesizeAv1Webm: header $preCluster exceeds the pad budget")
        val voidEl = Array(0xEC.toByte,
          (0x40 | ((voidLen - 3) >> 8)).toByte, (voidLen - 3).toByte) ++
          new Array[Byte](voidLen - 3)
        val segPayload = info ++ tracks ++ voidEl ++ cluster
        val segment = be(0x18538067L, 4) ++
          be(0x0100000000000000L | segPayload.length.toLong, 8) ++ segPayload
        MediaRecord(id, "video/webm", ebmlHead ++ segment)
      }
  }

  // ---------------------------------------------------------------
  // Compressed-audio metadata: MP3 frame headers (ISO/IEC 11172-3
  // §2.4.1.3 — the MPEG-1 audio frame header) and FLAC STREAMINFO
  // (xiph.org FLAC format §METADATA_BLOCK_STREAMINFO).  The audio
  // sibling of the avcC/SPS work: pure-bitstream arithmetic over
  // opaque binary columns — no codec, no pixel/PCM decode — because a
  // multimodal corpus census needs duration/rate/channel statistics
  // from billions of files WITHOUT decompressing any of them.  Both
  // parsers are per-row projections (mapPartitions, no shuffle): at
  // 100 TB they are scan-bound like every other metadata surface here.
  // ---------------------------------------------------------------

  /** MPEG-1 Layer III file census: header fields of the first frame
    * plus the whole-file frame count and the exact-integer duration
    * (MPEG-1 Layer III is 1152 samples per frame).  `firstFrameOff`
    * is where audio starts — past the ID3v2 tag when one leads the
    * file (real-world MP3s almost always carry one).
    */
  final case class Mp3Meta(
      id: Long, version: Long, layer: Long, bitrateKbps: Long,
      sampleRate: Long, channels: Long, nFrames: Long,
      durationMs: Long, firstFrameOff: Long)

  /** MPEG-1 Layer III bitrate table, index 1-14 (0 = free, 15 = bad —
    * both rejected here; a census wants well-formed CBR frames).
    */
  private[graft] val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private[graft] val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)
  private[graft] val Mp3SamplesPerFrame = 1152

  /** Frame length in bytes for MPEG-1 Layer III (spec formula,
    * integer floor): 144 · bitrate / sampleRate + padding.
    */
  @inline private[graft] def mp3FrameLen(
      bitrateKbps: Int, sampleRate: Int, padding: Int): Int =
    144 * bitrateKbps * 1000 / sampleRate + padding

  /** Size of a leading ID3v2 tag (0 when absent): 10-byte header with
    * a 28-bit SYNCSAFE length (7 data bits per byte — §3.1 of the
    * ID3v2 informal standard) counting the bytes AFTER the header.
    */
  private[graft] def id3v2Size(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') 0
    else if ((b(6) | b(7) | b(8) | b(9)) < 0) 0 // syncsafe bytes are 7-bit
    else 10 + ((b(6) & 0x7f) << 21 | (b(7) & 0x7f) << 14 |
      (b(8) & 0x7f) << 7 | (b(9) & 0x7f))
  }

  /** Walks the frame chain of one MP3 file: skip ID3v2, then validate
    * each 4-byte header (sync, MPEG-1, Layer III, sane bitrate/rate
    * indices) and hop by the computed frame length.  CBR discipline:
    * every frame must repeat the first frame's bitrate/rate/mode
    * (a mismatch or a broken sync ends in None — fail loud, not a
    * half-census).  Trailing garbage shorter than a header is ignored,
    * matching how encoders pad files.
    */
  private[graft] def mp3MetaOf(r: MediaRecord): Option[Mp3Meta] = {
    val b = r.content
    if (b == null || b.length < 14) return None
    val start = id3v2Size(b)
    if (start + 4 > b.length) return None
    var off = start
    var nFrames = 0L
    var first: (Int, Int, Int) = null // (bitrateIdx, srIdx, channelMode)
    while (off + 4 <= b.length) {
      val b0 = b(off) & 0xff
      val b1 = b(off + 1) & 0xff
      val b2 = b(off + 2) & 0xff
      val b3 = b(off + 3) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // broken sync
      if ((b1 >> 3 & 3) != 3 || (b1 >> 1 & 3) != 1) return None // not MPEG-1 L3
      val brIdx = b2 >> 4
      val srIdx = b2 >> 2 & 3
      val padding = b2 >> 1 & 1
      val mode = b3 >> 6
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      if (first == null) first = (brIdx, srIdx, mode)
      else if (first != ((brIdx, srIdx, mode))) return None // VBR/mode drift
      nFrames += 1
      off += mp3FrameLen(Mp3BitrateKbps(brIdx), Mp3SampleRates(srIdx), padding)
    }
    if (first == null || nFrames == 0) None
    else {
      val sr = Mp3SampleRates(first._2)
      Some(Mp3Meta(r.id, version = 1L, layer = 3L,
        bitrateKbps = Mp3BitrateKbps(first._1).toLong,
        sampleRate = sr.toLong,
        channels = if (first._3 == 3) 1L else 2L,
        nFrames = nFrames,
        durationMs = nFrames * Mp3SamplesPerFrame * 1000L / sr,
        firstFrameOff = start.toLong))
    }
  }

  def mp3Meta(ds: Dataset[MediaRecord]): Dataset[Mp3Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(mp3MetaOf))
  }

  /** Per-row CBR MPEG-1 Layer III synthesis (the oracle side): an
    * ID3v2 tag of `10 + id % 17` bytes, then exactly enough frames to
    * carry the document's UTF-8 bytes (ceil(n / (frameLen − 4)), min
    * 1), each a real 4-byte header + the text slice zero-padded.
    * Bitrate index `1 + id % 14`, sample-rate index `id % 3`, channel
    * mode `id % 4` — every header field and the frame census replay
    * from (id, octet_length(text)) alone, the byte-replay pattern of
    * the other q_multimodal_* oracles.
    */
  def synthesizeMp3(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val pad = (id % 17).toInt
        val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0,
          0, 0, (pad >> 7).toByte, (pad & 0x7f).toByte) ++ new Array[Byte](pad)
        val brIdx = 1 + (id % 14).toInt
        val srIdx = (id % 3).toInt
        val mode = (id % 4).toInt
        val frameLen = mp3FrameLen(Mp3BitrateKbps(brIdx), Mp3SampleRates(srIdx), 0)
        val cap = frameLen - 4
        val nFrames = math.max(1, (payload.length + cap - 1) / cap)
        val out = new Array[Byte](id3.length + nFrames * frameLen)
        System.arraycopy(id3, 0, out, 0, id3.length)
        var f = 0
        while (f < nFrames) {
          val base = id3.length + f * frameLen
          out(base) = 0xff.toByte
          out(base + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
          out(base + 2) = (brIdx << 4 | srIdx << 2).toByte // padding 0
          out(base + 3) = (mode << 6 | 1 << 2).toByte // original=1
          val from = f * cap
          val len = math.min(cap, payload.length - from)
          if (len > 0) System.arraycopy(payload, from, out, base + 4, len)
          f += 1
        }
        MediaRecord(id, "audio/mpeg", out)
      }
  }

  /** FLAC stream census from STREAMINFO — rate/channels/precision/
    * total samples and the exact-integer duration, plus where the
    * audio frames start (`audioOff`, after the metadata block chain a
    * player must skip).  No subframe decode.
    */
  final case class FlacMeta(
      id: Long, sampleRate: Long, channels: Long, bitsPerSample: Long,
      totalSamples: Long, durationMs: Long, audioOff: Long,
      nAudioBytes: Long)

  /** Walks one FLAC file: "fLaC" magic, then the metadata-block chain
    * (1-bit last flag, 7-bit type, 24-bit big-endian length) with
    * STREAMINFO mandatory-first (type 0, 34 bytes — spec).  The
    * 64-bit group holding sampleRate(20) | channels−1(3) | bps−1(5) |
    * totalSamples(36) is read as one big-endian long and shifted
    * apart.  None on any malformed structure.
    */
  private[graft] def flacMetaOf(r: MediaRecord): Option[FlacMeta] = {
    val b = r.content
    if (b == null || b.length < 42) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    // STREAMINFO must be the first block and exactly 34 bytes
    if ((b(4) & 0x7f) != 0) return None
    val siLen = (b(5) & 0xff) << 16 | (b(6) & 0xff) << 8 | (b(7) & 0xff)
    if (siLen != 34 || 8 + siLen > b.length) return None
    val packed = u64be(b, 8 + 10) // skip block/frame-size fields
    val sampleRate = packed >>> 44
    val channels = (packed >>> 41 & 0x7) + 1
    val bps = (packed >>> 36 & 0x1f) + 1
    val totalSamples = packed & 0xfffffffffL
    if (sampleRate == 0) return None
    // hop the remaining metadata blocks to the first audio byte
    var off = 8 + siLen
    var last = (b(4) & 0x80) != 0
    while (!last) {
      if (off + 4 > b.length) return None
      last = (b(off) & 0x80) != 0
      val len = (b(off + 1) & 0xff) << 16 | (b(off + 2) & 0xff) << 8 | (b(off + 3) & 0xff)
      off += 4 + len
      if (off > b.length) return None
    }
    Some(FlacMeta(r.id, sampleRate, channels, bps, totalSamples,
      durationMs = totalSamples * 1000L / sampleRate,
      audioOff = off.toLong, nAudioBytes = (b.length - off).toLong))
  }

  def flacMeta(ds: Dataset[MediaRecord]): Dataset[FlacMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(flacMetaOf))
  }

  /** Per-row FLAC synthesis (the oracle side): fLaC magic, STREAMINFO
    * (sample rate [44100, 48000, 96000][id % 3], channels 1 + id % 2,
    * bits 16/24 by id % 2, totalSamples = 4·n + id % 1000 where n is
    * the document's UTF-8 byte count), one PADDING block of id % 31
    * bytes (exercising the block hop), then the text bytes standing in
    * for the opaque audio frames.  Every output field replays from
    * (id, octet_length(text)).
    */
  def synthesizeFlac(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val sr = Array(44100L, 48000L, 96000L)((id % 3).toInt)
        val ch = 1L + id % 2
        val bps = if (id % 2 == 1) 24L else 16L
        val total = 4L * payload.length + id % 1000
        val packed = sr << 44 | (ch - 1) << 41 | (bps - 1) << 36 | total
        val streaminfo = new Array[Byte](34)
        // min/max block size 4096; min/max frame size 0 (unknown)
        streaminfo(0) = 0x10; streaminfo(1) = 0; streaminfo(2) = 0x10; streaminfo(3) = 0
        var i = 0
        while (i < 8) { streaminfo(10 + i) = (packed >>> (56 - 8 * i)).toByte; i += 1 }
        // md5 of the unencoded audio: zeros (unknown) — allowed by spec
        val padLen = (id % 31).toInt
        val padding = Array[Byte](0x81.toByte, // last block, type 1
          (padLen >> 16).toByte, (padLen >> 8).toByte, padLen.toByte) ++
          new Array[Byte](padLen)
        val head = "fLaC".getBytes("US-ASCII") ++
          Array[Byte](0, 0, 0, 34) ++ streaminfo ++ padding
        MediaRecord(id, "audio/flac", head ++ payload)
      }
  }

  /** AAC ADTS stream census (ISO/IEC 14496-3 §1.A.3 — the ADTS
    * transport every raw .aac capture and most HLS audio segments
    * use): first-frame header fields plus the whole-file frame census
    * and exact-integer duration (1024 samples per raw data block).
    * Unlike MP3, the frame length is an EXPLICIT 13-bit header field
    * (it includes the 7-byte header), so the walk hops by what the
    * stream declares and a one-bit length corruption is caught as a
    * broken next-sync rather than silently re-synced.
    */
  final case class AacMeta(
      id: Long, objectType: Long, sampleRate: Long, channels: Long,
      nFrames: Long, durationMs: Long, nBytes: Long, maxFrameLen: Long)

  private[graft] val AdtsSampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350)
  private[graft] val AdtsSamplesPerFrame = 1024

  /** Walks one ADTS stream: validate each 7-byte header (12-bit sync,
    * MPEG-4 ID, layer 00) and hop by the declared aac_frame_length.
    * Consistency discipline as [[mp3MetaOf]]: every frame must repeat
    * the first frame's profile/rate/channels (a drift or a broken
    * sync yields None, not a half-census).
    */
  private[graft] def aacMetaOf(r: MediaRecord): Option[AacMeta] = {
    val b = r.content
    if (b == null || b.length < 7) return None
    var off = 0
    var nFrames = 0L
    var maxLen = 0L
    var first: (Int, Int, Int) = null // (profile2b, srIdx, chanCfg)
    while (off + 7 <= b.length) {
      val b0 = b(off) & 0xff
      val b1 = b(off + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xf0) != 0xf0) return None // broken sync
      if ((b1 & 0x08) != 0) return None // MPEG-2 ID: out of scope here
      if ((b1 & 0x06) != 0) return None // layer must be 00
      val b2 = b(off + 2) & 0xff
      val profile = b2 >> 6
      val srIdx = b2 >> 2 & 0xf
      if (srIdx >= AdtsSampleRates.length) return None
      val chanCfg = (b2 & 1) << 2 | (b(off + 3) & 0xff) >> 6
      val frameLen = ((b(off + 3) & 0x03) << 11 |
        (b(off + 4) & 0xff) << 3 | (b(off + 5) & 0xff) >> 5)
      if (frameLen < 7 || off + frameLen > b.length) return None
      if (first == null) first = (profile, srIdx, chanCfg)
      else if (first != ((profile, srIdx, chanCfg))) return None
      nFrames += 1
      if (frameLen > maxLen) maxLen = frameLen
      off += frameLen
    }
    if (first == null || off != b.length) None
    else {
      val sr = AdtsSampleRates(first._2)
      Some(AacMeta(r.id, objectType = first._1 + 1L, sampleRate = sr.toLong,
        channels = first._3.toLong, nFrames = nFrames,
        durationMs = nFrames * AdtsSamplesPerFrame * 1000L / sr,
        nBytes = b.length.toLong, maxFrameLen = maxLen))
    }
  }

  def aacMeta(ds: Dataset[MediaRecord]): Dataset[AacMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(aacMetaOf))
  }

  private[graft] val AdtsFrameCount = 6

  /** Per-row ADTS synthesis (the oracle side): exactly
    * [[AdtsFrameCount]] frames; frame f carries `n/6 + (f < n%6)`
    * payload bytes of the document's UTF-8 text (the vp9-style split),
    * so every frame length — and therefore the census — replays from
    * (id, octet_length(text)).  Profile `id % 3`, sampling-frequency
    * index `3 + id % 5` (48000..22050), channel config `1 + id % 2`,
    * buffer fullness 0x7FF (the VBR convention).
    */
  def synthesizeAac(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val profile = (id % 3).toInt
        val srIdx = 3 + (id % 5).toInt
        val chanCfg = 1 + (id % 2).toInt
        val n = payload.length
        val out = Array.newBuilder[Byte]
        var from = 0
        var f = 0
        // ADTS carries the frame length in 13 bits (max 8191 B incl. the
        // 7-byte header); with the payload split evenly over AdtsFrameCount
        // frames, a doc over ~(8184 · AdtsFrameCount) B can't be encoded —
        // fail here with the size, not as a downstream oracle mismatch.
        require(n / AdtsFrameCount + (if (n % AdtsFrameCount > 0) 1 else 0) <= 8184,
          s"synthesizeAac: doc of $n B overflows the 13-bit ADTS frame " +
            s"length at $AdtsFrameCount frames (max ${8184L * AdtsFrameCount} B)")
        while (f < AdtsFrameCount) {
          val take = n / AdtsFrameCount + (if (f < n % AdtsFrameCount) 1 else 0)
          val frameLen = 7 + take
          out += 0xff.toByte
          out += 0xf1.toByte // MPEG-4, layer 00, no CRC
          out += (profile << 6 | srIdx << 2 | (chanCfg >> 2)).toByte
          out += ((chanCfg & 3) << 6 | (frameLen >> 11)).toByte
          out += (frameLen >> 3).toByte
          out += ((frameLen & 7) << 5 | 0x1f).toByte // fullness hi
          out += 0xfc.toByte // fullness lo + 1 raw data block
          out ++= payload.slice(from, from + take)
          from += take
          f += 1
        }
        MediaRecord(id, "audio/aac", out.result())
      }
  }

  /** VBR MP3 census — real corpora are mostly VBR, which the CBR walk
    * [[mp3MetaOf]] deliberately rejects.  This flavor allows the
    * bitrate index to change per frame (the VBR definition) while
    * still requiring a consistent sample rate and channel mode (a
    * mid-stream rate change is a new stream, not VBR), and reports the
    * bitrate RANGE plus the exact frame census.  Duration stays exact
    * integer arithmetic: every MPEG-1 Layer III frame is 1152 samples
    * regardless of its bitrate.
    */
  final case class Mp3VbrMeta(
      id: Long, sampleRate: Long, channels: Long, nFrames: Long,
      durationMs: Long, brMinKbps: Long, brMaxKbps: Long,
      firstFrameOff: Long, nBytes: Long)

  private[graft] def mp3VbrMetaOf(r: MediaRecord): Option[Mp3VbrMeta] = {
    val b = r.content
    if (b == null || b.length < 14) return None
    val start = id3v2Size(b)
    if (start + 4 > b.length) return None
    var off = start
    var nFrames = 0L
    var brMin = Int.MaxValue
    var brMax = 0
    var first: (Int, Int) = null // (srIdx, channelMode)
    while (off + 4 <= b.length) {
      val b0 = b(off) & 0xff
      val b1 = b(off + 1) & 0xff
      val b2 = b(off + 2) & 0xff
      val b3 = b(off + 3) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
      if ((b1 >> 3 & 3) != 3 || (b1 >> 1 & 3) != 1) return None
      val brIdx = b2 >> 4
      val srIdx = b2 >> 2 & 3
      val padding = b2 >> 1 & 1
      val mode = b3 >> 6
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      if (first == null) first = (srIdx, mode)
      else if (first != ((srIdx, mode))) return None // rate/mode drift
      val br = Mp3BitrateKbps(brIdx)
      if (br < brMin) brMin = br
      if (br > brMax) brMax = br
      nFrames += 1
      off += mp3FrameLen(br, Mp3SampleRates(srIdx), padding)
    }
    if (first == null || nFrames == 0) None
    else {
      val sr = Mp3SampleRates(first._1)
      Some(Mp3VbrMeta(r.id, sampleRate = sr.toLong,
        channels = if (first._2 == 3) 1L else 2L, nFrames = nFrames,
        durationMs = nFrames * Mp3SamplesPerFrame * 1000L / sr,
        brMinKbps = brMin.toLong, brMaxKbps = brMax.toLong,
        firstFrameOff = start.toLong, nBytes = b.length.toLong))
    }
  }

  def mp3VbrMeta(ds: Dataset[MediaRecord]): Dataset[Mp3VbrMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(mp3VbrMetaOf))
  }

  /** Per-row VBR MP3 synthesis: same ID3v2 lead and sample-rate /
    * channel-mode parameterization as [[synthesizeMp3]], but frame f's
    * bitrate index is `1 + (id + f) % 14` — genuinely variable — and
    * frames are appended until the cumulative payload capacity covers
    * the document's UTF-8 bytes (min 1 frame).  The oracle replays the
    * frame count by walking the same per-frame capacity series with a
    * running sum (generate_series + a window), so even the
    * variable-length layout stays pure integer arithmetic.
    */
  def synthesizeMp3Vbr(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val pad = (id % 17).toInt
        val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0,
          0, 0, (pad >> 7).toByte, (pad & 0x7f).toByte) ++ new Array[Byte](pad)
        val srIdx = (id % 3).toInt
        val sr = Mp3SampleRates(srIdx)
        val mode = (id % 4).toInt
        val out = Array.newBuilder[Byte]
        out ++= id3
        var covered = 0
        var f = 0
        while (f == 0 || covered < payload.length) {
          // The q_multimodal_mp3_vbr oracle replays the capacity walk over
          // generate_series(0, 4095): a doc needing a 4097th frame would
          // silently vanish from the oracle's inner join — fail loudly here.
          require(f < 4096,
            s"synthesizeMp3Vbr: doc of ${payload.length} B needs > 4096 " +
              "frames, beyond the oracle's replayed capacity walk")
          val brIdx = 1 + ((id + f) % 14).toInt
          val frameLen = mp3FrameLen(Mp3BitrateKbps(brIdx), sr, 0)
          val body = new Array[Byte](frameLen)
          body(0) = 0xff.toByte
          body(1) = 0xfb.toByte
          body(2) = (brIdx << 4 | srIdx << 2).toByte
          body(3) = (mode << 6 | 1 << 2).toByte
          val take = math.min(frameLen - 4, payload.length - covered)
          if (take > 0) System.arraycopy(payload, covered, body, 4, take)
          covered += take
          out ++= body
          f += 1
        }
        MediaRecord(id, "audio/mpeg", out.result())
      }
  }

  /** Ogg/Opus stream census (RFC 3533 page walk + RFC 7845 OpusHead):
    * channel count, pre-skip, original input rate from the ID header,
    * page census, and the exact duration from the last page's granule
    * position (48 kHz ticks minus pre-skip — the RFC 7845 rule).
    * Every page's CRC is VERIFIED (the RFC 3533 0x04c11db7 CRC-32,
    * non-reflected, init 0, CRC field zeroed) — a corrupt page fails
    * the census rather than mis-counting.
    */
  final case class OpusMeta(
      id: Long, channels: Long, preSkip: Long, inputSampleRate: Long,
      nPages: Long, lastGranule: Long, durationMs: Long, nBytes: Long)

  /** RFC 3533 page CRC: poly 0x04c11db7, no reflection, init/xorout 0,
    * computed with the header's CRC field as zero.
    */
  private[graft] def oggCrc(b: Array[Byte], from: Int, len: Int, crcOff: Int): Long = {
    var crc = 0L
    var i = 0
    while (i < len) {
      val v = if (i >= crcOff && i < crcOff + 4) 0 else b(from + i) & 0xff
      crc ^= v.toLong << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) (crc << 1) ^ 0x04c11db7L else crc << 1
        crc &= 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def opusMetaOf(r: MediaRecord): Option[OpusMeta] = {
    val b = r.content
    if (b == null || b.length < 47) return None
    var off = 0
    var nPages = 0L
    var lastGranule = 0L
    var head: Option[(Int, Int, Long)] = None // (channels, preSkip, inputRate)
    while (off + 27 <= b.length) {
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S')) return None
      if (b(off + 4) != 0) return None // stream_structure_version
      val flags = b(off + 5) & 0xff
      val granule = java.lang.Long.reverseBytes(u64be(b, off + 6))
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += b(off + 27 + i) & 0xff; i += 1 }
      val pageLen = 27 + nSegs + bodyLen
      if (off + pageLen > b.length) return None
      if (oggCrc(b, off, pageLen, 22) != u32(b, off + 22)) return None
      if (nPages == 0) {
        if ((flags & 0x02) == 0) return None // first page must be BOS
        val p = off + 27 + nSegs
        if (bodyLen < 19 || new String(b, p, 8, "US-ASCII") != "OpusHead")
          return None
        head = Some(((b(p + 9) & 0xff), u16(b, p + 10), u32(b, p + 12)))
      }
      // granule -1 (continuation-only page) never ends a stream here
      if (granule >= 0) lastGranule = granule
      nPages += 1
      off += pageLen
    }
    head.flatMap { case (ch, skip, rate) =>
      if (off != b.length || nPages < 2) None
      else Some(OpusMeta(r.id, ch.toLong, skip.toLong, rate,
        nPages, lastGranule,
        durationMs = math.max(0L, lastGranule - skip) * 1000L / 48000L,
        nBytes = b.length.toLong))
    }
  }

  def opusMeta(ds: Dataset[MediaRecord]): Dataset[OpusMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(opusMetaOf))
  }

  private[graft] val OpusDataPages = 4

  /** Per-row Ogg/Opus synthesis: a BOS OpusHead page (channels
    * 1 + id % 2, pre-skip 312 + id % 100, input rate [44100, 48000,
    * 16000][id % 3]), an OpusTags page, then [[OpusDataPages]] data
    * pages each carrying one packet of the text split (lacing runs of
    * 255 + remainder — the RFC 3533 segmentation), granule advancing
    * `480·(1 + id % 4)` 48 kHz ticks per page past the pre-skip, EOS
    * on the last.  All CRCs are real, so the parse verifies them.
    */
  def synthesizeOpus(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val channels = 1 + (id % 2).toInt
        val preSkip = 312 + (id % 100).toInt
        val inputRate = Array(44100L, 48000L, 16000L)((id % 3).toInt)
        val frameTicks = 480L * (1 + (id % 4).toInt)
        def u16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        def u64a(v: Long) = u32a(v & 0xffffffffL) ++ u32a(v >>> 32)
        def page(flags: Int, granule: Long, seq: Int, packet: Array[Byte]): Array[Byte] = {
          val lacing = Array.newBuilder[Byte]
          var rest = packet.length
          while (rest >= 255) { lacing += 255.toByte; rest -= 255 }
          lacing += rest.toByte
          val segs = lacing.result()
          // Ogg caps the segment table at 255 entries (RFC 3533 §6), so a
          // single page carries < ~64 KiB; this synthesizer does not do
          // packet continuation — fail at synthesis, not as an oracle drift.
          require(segs.length <= 255,
            s"synthesizeOpus: packet of ${packet.length} B needs ${segs.length} " +
              "lacing values, over the 255-per-page Ogg limit (doc too large)")
          val out = "OggS".getBytes("US-ASCII") ++ Array[Byte](0, flags.toByte) ++
            u64a(granule) ++ u32a(0x5eed + (id & 0xffff)) ++ u32a(seq.toLong) ++
            u32a(0L) ++ Array(segs.length.toByte) ++ segs ++ packet
          val crc = oggCrc(out, 0, out.length, 22)
          System.arraycopy(u32a(crc), 0, out, 22, 4)
          out
        }
        val opusHead = "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1) ++
          Array(channels.toByte) ++ u16a(preSkip) ++ u32a(inputRate) ++
          u16a(0) ++ Array[Byte](0)
        val opusTags = "OpusTags".getBytes("US-ASCII") ++ u32a(0L) ++ u32a(0L)
        val out = Array.newBuilder[Byte]
        out ++= page(0x02, 0L, 0, opusHead)
        out ++= page(0x00, 0L, 1, opusTags)
        var f = 0
        var from = 0
        val n = payload.length
        while (f < OpusDataPages) {
          val take = n / OpusDataPages + (if (f < n % OpusDataPages) 1 else 0)
          val eos = if (f == OpusDataPages - 1) 0x04 else 0x00
          out ++= page(eos, preSkip + frameTicks * (f + 1), 2 + f,
            payload.slice(from, from + take))
          from += take
          f += 1
        }
        MediaRecord(id, "audio/ogg", out.result())
      }
  }

  /** EXIF metadata census + GPS governance for JPEG columns: parse the
    * APP1 Exif TIFF block (both byte orders) for orientation, camera
    * make, and the GPS IFD's latitude/longitude — the image-side PII
    * the text family's redaction ops cannot see — and [[exifStrip]]
    * removes every APP1 segment so location never leaves the lake.
    * Pure marker/IFD arithmetic over opaque bytes; no pixel decode.
    */
  final case class ExifMeta(
      id: Long, orientation: Long, make: String, hasGps: Long,
      latRef: String, latDeg: Long, latMin: Long, latSec: Long,
      lonRef: String, lonDeg: Long, lonMin: Long, lonSec: Long)

  private[graft] def exifMetaOf(r: MediaRecord): Option[ExifMeta] = {
    val b = r.content
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None // SOI
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val marker = b(off + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no EXIF
      val segLen = u16be(b, off + 2)
      if (segLen < 2 || off + 2 + segLen > b.length) return None
      if (marker == 0xe1 && segLen >= 8 &&
        new String(b, off + 4, 4, "US-ASCII") == "Exif" &&
        b(off + 8) == 0 && b(off + 9) == 0) {
        return parseTiff(r.id, b, off + 10, off + 2 + segLen)
      }
      off += 2 + segLen
    }
    None
  }

  private def parseTiff(id: Long, b: Array[Byte], t0: Int, until: Int): Option[ExifMeta] = {
    if (t0 + 8 > until) return None
    val le = b(t0) == 'I' && b(t0 + 1) == 'I'
    val be = b(t0) == 'M' && b(t0 + 1) == 'M'
    if (!le && !be) return None
    // every offset below is attacker-controlled (a u32/u64 read off
    // the wire) — range-check before EVERY dereference: a malformed
    // block must yield None, never an exception killing a 100 TB pass
    @inline def ok(o: Int, len: Int): Boolean =
      o >= t0 && len >= 0 && o + len <= until && o + len >= o
    def rd16(o: Int): Int = if (le) u16(b, o) else u16be(b, o)
    def rd32(o: Int): Long = if (le) u32(b, o) else u32be(b, o)
    def rd64(o: Int): Long =
      if (le) (rd32(o) & 0xffffffffL) | ((rd32(o + 4) & 0xffffffffL) << 32)
      else ((rd32(o) & 0xffffffffL) << 32) | (rd32(o + 4) & 0xffffffffL)
    // version 42 = classic TIFF; 43 = BigTIFF (8-byte offsets/counts,
    // 20-byte IFD entries, u64 entry counts) — same walk, wider reads
    val version = rd16(t0 + 2)
    val big = version == 43
    if (version != 42 && !big) return None
    val ifd0off =
      if (big) {
        if (t0 + 16 > until) return None
        // BigTIFF header: offset size MUST be 8, then a reserved 0
        if (rd16(t0 + 4) != 8 || rd16(t0 + 6) != 0) return None
        rd64(t0 + 8)
      } else rd32(t0 + 4)
    if (ifd0off < 0 || ifd0off > until.toLong - t0) return None
    val ifd0 = t0 + ifd0off.toInt
    val countLen = if (big) 8 else 2 // IFD entry-count field width
    val entryLen = if (big) 20 else 12
    val inlineAt = if (big) 12 else 8 // value/offset field within entry
    if (!ok(ifd0, countLen)) return None
    def ifdCount(o: Int): Long =
      if (big) rd64(o) else rd16(o).toLong
    def entryCnt(e: Int): Long = if (big) rd64(e + 4) else rd32(e + 4)
    def entryPtr(e: Int): Long =
      if (big) rd64(e + inlineAt) else rd32(e + inlineAt)
    def asciiAt(o: Int, max: Int): String = {
      if (!ok(o, 0)) return ""
      var e = o
      while (e < o + max && e < until && b(e) != 0) e += 1
      new String(b, o, e - o, "US-ASCII")
    }
    var orientation = 0L
    var make = ""
    var gpsOff = -1
    val n0 = ifdCount(ifd0)
    if (n0 < 0 || n0 > 65535) return None
    var i = 0
    while (i < n0) {
      val e = ifd0 + countLen + i * entryLen
      if (e + entryLen > until) return None
      val tag = rd16(e)
      tag match {
        case 0x0112 => orientation = rd16(e + inlineAt).toLong
        case 0x010f =>
          val cnt = entryCnt(e)
          if (cnt >= 0 && cnt <= until.toLong - t0) {
            make =
              if (cnt <= (if (big) 8 else 4)) asciiAt(e + inlineAt, cnt.toInt)
              else {
                val off = entryPtr(e)
                if (off >= 0 && off <= until.toLong - t0)
                  asciiAt(t0 + off.toInt, cnt.toInt)
                else ""
              }
          }
        case 0x8825 =>
          val off = entryPtr(e)
          if (off >= 0 && off <= until.toLong - t0) gpsOff = t0 + off.toInt
        case _ =>
      }
      i += 1
    }
    if (gpsOff < 0)
      return Some(ExifMeta(id, orientation, make, 0L, "", 0, 0, 0, "", 0, 0, 0))
    if (!ok(gpsOff, countLen)) return None
    var latRef = ""; var lonRef = ""
    var lat = Array(0L, 0L, 0L); var lon = Array(0L, 0L, 0L)
    def rationals3(o: Int): Array[Long] =
      if (!ok(o, 24)) Array(0L, 0L, 0L)
      else Array.tabulate(3) { j =>
        val num = rd32(o + j * 8)
        val den = rd32(o + j * 8 + 4)
        if (den == 0) 0L else num / den
      }
    val ng = ifdCount(gpsOff)
    if (ng < 0 || ng > 65535) return None
    var j = 0
    while (j < ng) {
      val e = gpsOff + countLen + j * entryLen
      if (e + entryLen > until) return None
      def dataAt(e: Int): Int = {
        val off = entryPtr(e)
        if (off >= 0 && off <= until.toLong - t0) t0 + off.toInt else -1
      }
      rd16(e) match {
        case 0x0001 => latRef = asciiAt(e + inlineAt, 2)
        case 0x0002 => lat = rationals3(dataAt(e))
        case 0x0003 => lonRef = asciiAt(e + inlineAt, 2)
        case 0x0004 => lon = rationals3(dataAt(e))
        case _ =>
      }
      j += 1
    }
    Some(ExifMeta(id, orientation, make, 1L,
      latRef, lat(0), lat(1), lat(2), lonRef, lon(0), lon(1), lon(2)))
  }

  def exifMeta(ds: Dataset[MediaRecord]): Dataset[ExifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(exifMetaOf))
  }

  /** GPS/EXIF governance strip: drop every APP1 segment from a JPEG
    * stream, leaving all other segments (and the entropy-coded body)
    * byte-identical.  The blunt-and-safe erasure tool — offset-free,
    * so it cannot corrupt a TIFF it does not fully understand.
    */
  private[graft] def exifStripBytes(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return b
    val out = Array.newBuilder[Byte]
    out += b(0); out += b(1)
    var off = 2
    var copying = false // once in the entropy stream, copy verbatim
    while (off < b.length) {
      if (copying || off + 4 > b.length || (b(off) & 0xff) != 0xff) {
        out += b(off); off += 1
      } else {
        val marker = b(off + 1) & 0xff
        if (marker == 0xd9) { out += b(off); out += b(off + 1); off += 2 }
        else if (marker == 0xda) { copying = true; out += b(off); out += b(off + 1); off += 2 }
        else {
          val segLen = u16be(b, off + 2)
          if (segLen < 2 || off + 2 + segLen > b.length) { out += b(off); off += 1 }
          else {
            if (marker != 0xe1) {
              var i = 0
              while (i < 2 + segLen) { out += b(off + i); i += 1 }
            }
            off += 2 + segLen
          }
        }
      }
    }
    out.result()
  }

  def exifStrip(ds: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r => MediaRecord(r.id, r.kind, exifStripBytes(r.content)))
  }

  /** Per-row JPEG-with-EXIF synthesis: SOI + an APP1 Exif block
    * (little-endian TIFF; orientation `1 + id % 8`, make
    * `"C" + id % 5`, and — when `id % 4 != 0` — a GPS IFD with
    * deg/min/sec rationals parameterized by id) + the document's
    * UTF-8 bytes as COM segments (≤ 60000 per segment) + EOI.
    * Fixed offsets, so the whole layout replays from
    * (id, octet_length(text)).
    */
  /** The deterministic LE TIFF block both EXIF flavors share:
    * orientation + make entries, a GPS IFD with deg/min/sec rationals
    * for 3 of 4 ids — every field replays from id arithmetic.
    */
  private[graft] def exifTiffBytes(id: Long): Array[Byte] = {
    def u16a(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def entry(tag: Int, tpe: Int, cnt: Long, value: Array[Byte]): Array[Byte] =
      u16a(tag) ++ u16a(tpe) ++ u32a(cnt) ++ value.padTo(4, 0.toByte)
    val hasGps = id % 4 != 0
    val make = ("C" + (id % 5)).getBytes("US-ASCII") :+ 0.toByte // 3 incl NUL
    val ifd0Count = if (hasGps) 3 else 2
    val ifd0Len = 2 + ifd0Count * 12 + 4
    val gpsIfdOff = 8L + ifd0Len
    val ifd0 =
      u16a(ifd0Count) ++
        entry(0x010f, 2, make.length.toLong, make) ++
        entry(0x0112, 3, 1L, u16a((1 + id % 8).toInt) ++ Array[Byte](0, 0)) ++
        (if (hasGps) entry(0x8825, 4, 1L, u32a(gpsIfdOff)) else Array.empty[Byte]) ++
        u32a(0L)
    if (!hasGps) "II".getBytes("US-ASCII") ++ u16a(42) ++ u32a(8L) ++ ifd0
    else {
      val latOff = gpsIfdOff + 2 + 4 * 12 + 4
      val lonOff = latOff + 24
      val gps =
        u16a(4) ++
          entry(0x0001, 2, 2L, (if (id % 2 == 0) "N" else "S").getBytes("US-ASCII") :+ 0.toByte) ++
          entry(0x0002, 5, 3L, u32a(latOff)) ++
          entry(0x0003, 2, 2L, (if ((id / 2) % 2 == 0) "E" else "W").getBytes("US-ASCII") :+ 0.toByte) ++
          entry(0x0004, 5, 3L, u32a(lonOff)) ++
          u32a(0L)
      val latData = u32a(id % 90) ++ u32a(1L) ++ u32a(id % 60) ++ u32a(1L) ++
        u32a(id * 7 % 60) ++ u32a(1L)
      val lonData = u32a(id % 180) ++ u32a(1L) ++ u32a(id * 3 % 60) ++ u32a(1L) ++
        u32a(id * 11 % 60) ++ u32a(1L)
      "II".getBytes("US-ASCII") ++ u16a(42) ++ u32a(8L) ++ ifd0 ++ gps ++ latData ++ lonData
    }
  }

  def synthesizeExifJpeg(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val tiff = exifTiffBytes(id)
        def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
        val app1Payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
        val out = Array.newBuilder[Byte]
        out += 0xff.toByte; out += 0xd8.toByte
        out += 0xff.toByte; out += 0xe1.toByte
        out ++= be16(2 + app1Payload.length); out ++= app1Payload
        var from = 0
        do {
          val take = math.min(60000, payload.length - from)
          out += 0xff.toByte; out += 0xfe.toByte
          out ++= be16(2 + take)
          out ++= payload.slice(from, from + take)
          from += take
        } while (from < payload.length)
        out += 0xff.toByte; out += 0xd9.toByte
        MediaRecord(id, "image/jpeg", out.result())
      }
  }

  /** Standalone .tif census — a TIFF FILE is exactly the TIFF block
    * EXIF carries in APP1, so the same IFD walk applies at offset 0;
    * the two flavors share one oracle (JPEG-wrapped vs bare must
    * census identically).
    */
  private[graft] def tiffMetaOf(r: MediaRecord): Option[ExifMeta] = {
    if (r.content == null) return None
    parseTiff(r.id, r.content, 0, r.content.length)
  }

  def tiffMeta(ds: Dataset[MediaRecord]): Dataset[ExifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(tiffMetaOf))
  }

  /** Per-row standalone TIFF synthesis: [[exifTiffBytes]] verbatim. */
  def synthesizeTiff(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map(id => MediaRecord(id, "image/tiff", exifTiffBytes(id)))
  }

  /** BigTIFF (version 43) twin of [[exifTiffBytes]]: 16-byte header
    * (offset size 8 + reserved 0 + u64 IFD offset), u64 entry
    * counts, 20-byte entries with 8-byte value/offset fields, the
    * GPS IFD pointer as LONG8 — the SAME census fields, so the
    * BigTIFF flavor shares the classic oracle verbatim
    * (two-physical-paths-one-oracle).
    */
  private[graft] def exifBigTiffBytes(id: Long): Array[Byte] = {
    def u16a(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def u64a(v: Long) = u32a(v & 0xffffffffL) ++ u32a(v >>> 32)
    def entry(tag: Int, tpe: Int, cnt: Long, value: Array[Byte]): Array[Byte] =
      u16a(tag) ++ u16a(tpe) ++ u64a(cnt) ++ value.padTo(8, 0.toByte)
    val hasGps = id % 4 != 0
    val make = ("C" + (id % 5)).getBytes("US-ASCII") :+ 0.toByte
    val ifd0Count = if (hasGps) 3 else 2
    val ifd0Len = 8 + ifd0Count * 20 + 8
    val gpsIfdOff = 16L + ifd0Len
    val ifd0 =
      u64a(ifd0Count.toLong) ++
        entry(0x010f, 2, make.length.toLong, make) ++
        entry(0x0112, 3, 1L, u16a((1 + id % 8).toInt)) ++
        (if (hasGps) entry(0x8825, 16, 1L, u64a(gpsIfdOff))
         else Array.empty[Byte]) ++
        u64a(0L)
    val header = "II".getBytes("US-ASCII") ++ u16a(43) ++ u16a(8) ++
      u16a(0) ++ u64a(16L)
    if (!hasGps) header ++ ifd0
    else {
      val latOff = gpsIfdOff + 8 + 4 * 20 + 8
      val lonOff = latOff + 24
      val gps =
        u64a(4L) ++
          entry(0x0001, 2, 2L,
            (if (id % 2 == 0) "N" else "S").getBytes("US-ASCII") :+ 0.toByte) ++
          entry(0x0002, 5, 3L, u64a(latOff)) ++
          entry(0x0003, 2, 2L,
            (if ((id / 2) % 2 == 0) "E" else "W").getBytes("US-ASCII") :+ 0.toByte) ++
          entry(0x0004, 5, 3L, u64a(lonOff)) ++
          u64a(0L)
      val latData = u32a(id % 90) ++ u32a(1L) ++ u32a(id % 60) ++ u32a(1L) ++
        u32a(id * 7 % 60) ++ u32a(1L)
      val lonData = u32a(id % 180) ++ u32a(1L) ++ u32a(id * 3 % 60) ++ u32a(1L) ++
        u32a(id * 11 % 60) ++ u32a(1L)
      header ++ ifd0 ++ gps ++ latData ++ lonData
    }
  }

  /** Per-row standalone BigTIFF synthesis: [[exifBigTiffBytes]]. */
  def synthesizeBigTiff(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map(id => MediaRecord(id, "image/tiff", exifBigTiffBytes(id)))
  }

  /** WebVTT cue extraction — the video↔text ALIGNMENT surface a
    * multimodal training corpus needs (captions are how video frames
    * get text supervision).  One row per cue: index, exact start/end
    * milliseconds, and the payload text.  TOTAL on arbitrary input
    * (the parser-family contract): a malformed timing line just ends
    * that cue's candidacy — scanning continues; NOTE/STYLE blocks and
    * cue-settings after the end timestamp are skipped per the spec.
    */
  final case class VttCue(
      id: Long, cueIdx: Long, startMs: Long, endMs: Long, text: String)

  /** `HH:MM:SS.mmm` (hours unbounded) or `MM:SS.mmm` → milliseconds. */
  private[graft] def vttTimestampMs(s: String): Option[Long] = {
    val parts = s.trim.split(':')
    def msOf(secMs: String): Option[Long] = {
      val i = secMs.indexOf('.')
      if (i < 0 || secMs.length - i - 1 != 3) None
      else for {
        sec <- secMs.substring(0, i).toLongOption
        ms <- secMs.substring(i + 1).toLongOption
        if sec >= 0 && ms >= 0
      } yield sec * 1000 + ms
    }
    parts.length match {
      case 2 => for {
        m <- parts(0).toLongOption; if m >= 0
        sm <- msOf(parts(1))
      } yield m * 60000 + sm
      case 3 => for {
        h <- parts(0).toLongOption; if h >= 0
        m <- parts(1).toLongOption; if m >= 0 && m < 60
        sm <- msOf(parts(2))
      } yield h * 3600000 + m * 60000 + sm
      case _ => None
    }
  }

  private[graft] def vttCuesOf(id: Long, doc: String): Seq[VttCue] = {
    if (doc == null) return Nil
    val lines = doc.split("\\r?\\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WEBVTT")) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[VttCue]
    var i = 1
    var cueIdx = 0L
    while (i < lines.length) {
      val line = lines(i)
      if (line.contains("-->")) {
        val Array(a, rest) = line.split("-->", 2)
        // cue settings follow the end timestamp, whitespace-separated
        val bStr = rest.trim.split("\\s+", 2)(0)
        (vttTimestampMs(a), vttTimestampMs(bStr)) match {
          case (Some(st), Some(en)) if en >= st =>
            val text = scala.collection.mutable.ArrayBuffer.empty[String]
            i += 1
            while (i < lines.length && lines(i).nonEmpty) { text += lines(i); i += 1 }
            out += VttCue(id, cueIdx, st, en, text.mkString("\n"))
            cueIdx += 1
          case _ => i += 1 // malformed timing: skip the line, keep scanning
        }
      } else if (line.startsWith("NOTE") || line.startsWith("STYLE") ||
        line.startsWith("REGION")) {
        // block: skip to the next blank line
        while (i < lines.length && lines(i).nonEmpty) i += 1
      } else i += 1
    }
    out.toSeq
  }

  def vttCues(df: DataFrame, idCol: String, vttCol: String): Dataset[VttCue] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(vttCol).as("v"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, v) => vttCuesOf(id, v) })
  }

  /** Per-row WebVTT synthesis: `1 + id % 4` cues; cue k spans
    * `[k·(2000 + id % 500), +1500 + id % 300)` ms and carries the
    * document's whitespace tokens `[5k, 5k+5)` — so the cue census,
    * the exact timings, and each cue's UTF-8 payload size replay from
    * (id, text) in plain SQL.  A NOTE block and a cue-settings
    * fragment ride along so the parser's skip paths stay exercised.
    */
  def synthesizeVtt(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val nc = 1 + (id % 4).toInt
        val sb = new StringBuilder("WEBVTT\n\nNOTE synthesized corpus fixture\nsecond note line\n\n")
        def ts(ms: Long): String =
          f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
        var k = 0
        while (k < nc) {
          val st = k.toLong * (2000 + id % 500)
          val en = st + 1500 + id % 300
          sb.append(k + 1).append('\n') // optional cue identifier
          sb.append(ts(st)).append(" --> ").append(ts(en))
          if (k % 2 == 1) sb.append(" align:start position:10%")
          sb.append('\n')
          sb.append(toks.slice(k * 5, k * 5 + 5).mkString(" ")).append("\n\n")
          k += 1
        }
        (id, sb.result())
      }
      .toDF("id", "vtt")
  }

  /** ID3v2.3/v2.4 text-frame extraction — the audio-side tag census
    * (title/artist/album + total tag size), the MP3 sibling of the
    * EXIF surface: where a corpus's audio attribution/provenance
    * metadata lives.  Walks the 10-byte tag header (syncsafe size),
    * GATES on the version byte, then the frame chain (4-byte id,
    * 2 flag bytes, and the size rule the version dictates: v2.3 =
    * PLAIN u32, v2.4 = SYNCSAFE u28 — the one wire difference that
    * matters, because a v2.4 frame ≥ 128 B walked with v2.3
    * arithmetic mis-hops).  Only text frames (id `T…`, encoding
    * byte 0 = ISO-8859-1 or 3 = UTF-8) are decoded, and only when
    * their format flags claim no compression/encryption/unsync/DLI
    * transformation of the payload (such frames are still COUNTED —
    * the hop uses the stored size either way).  Versions other than
    * 3 and 4 (v2.2's 3-byte frame ids, future majors) and tag-level
    * unsynchronisation / extended-header / footer flags are rejected
    * explicitly — the walk's own envelope, enforced rather than
    * silently mis-walked.  TOTAL on arbitrary bytes: a frame that
    * overruns the tag ends the walk, never the job.
    */
  final case class Id3Meta(
      id: Long, title: String, artist: String, album: String,
      nFrames: Long, tagBytes: Long)

  private[graft] def id3MetaOf(r: MediaRecord): Option[Id3Meta] = {
    val b = r.content
    if (b == null) return None
    val total = id3v2Size(b)
    if (total <= 10 || total > b.length) return None
    val ver = b(3) & 0xff
    if (ver != 2 && ver != 3 && ver != 4) return None // unknown majors: reject, never mis-walk
    if (ver == 2) {
      // ID3v2.2 (r15): 3-char frame ids + 3-byte BE sizes, no frame
      // flags; text frames TT2/TP1/TAL with encoding 0 (ISO-8859-1)
      // decoded, encoding 1 (UTF-16) counted-not-decoded.  Tag-level
      // unsync (0x80) and whole-tag compression (0x40) re-code the
      // stream — outside this walk's envelope, reject.
      if ((b(5) & 0xc0) != 0) return None
      var off = 10
      var title = ""; var artist = ""; var album = ""
      var nFrames = 0L
      while (off + 6 <= total) {
        if (b(off) == 0)
          return Some(Id3Meta(r.id, title, artist, album, nFrames, total.toLong))
        val fid = new String(b, off, 3, "US-ASCII")
        if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
          return None
        val sz = ((b(off + 3) & 0xffL) << 16 | (b(off + 4) & 0xffL) << 8 |
          (b(off + 5) & 0xffL))
        if (sz > (total - off - 6).toLong) return None
        val p = off + 6
        if (fid.startsWith("T") && sz >= 1) {
          val enc = b(p) & 0xff
          val txt =
            if (enc == 0) new String(b, p + 1, sz.toInt - 1, "ISO-8859-1")
            else ""
          fid match {
            case "TT2" => title = txt
            case "TP1" => artist = txt
            case "TAL" => album = txt
            case _ => ()
          }
        }
        nFrames += 1
        off = p + sz.toInt
      }
      return Some(Id3Meta(r.id, title, artist, album, nFrames, total.toLong))
    }
    // tag flags: unsync (0x80) re-codes the byte stream, extended
    // header (0x40) shifts the first frame, v2.4 footer (0x10) adds
    // trailing bytes outside `total` — all outside this walk's envelope
    if ((b(5) & 0xd0) != 0) return None
    var off = 10
    var title = ""; var artist = ""; var album = ""
    var nFrames = 0L
    while (off + 10 <= total) {
      val c0 = b(off) & 0xff
      if (c0 == 0) return Some(Id3Meta(r.id, title, artist, album, nFrames, total.toLong)) // padding
      val fid = new String(b, off, 4, "US-ASCII")
      if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))) return None
      val sz =
        if (ver == 3) u32be(b, off + 4)
        else { // v2.4: syncsafe — any high bit set is a framing error
          if (((b(off + 4) | b(off + 5) | b(off + 6) | b(off + 7)) & 0x80) != 0)
            return None
          ((b(off + 4) & 0x7f) << 21 | (b(off + 5) & 0x7f) << 14 |
            (b(off + 6) & 0x7f) << 7 | (b(off + 7) & 0x7f)).toLong
        }
      if (sz < 0 || sz > (total - off - 10).toLong) return None
      // format flags that transform or shift the payload (v2.3:
      // compression 0x80 / encryption 0x40 / grouping 0x20; v2.4:
      // grouping 0x40, compression 0x08 / encryption 0x04 / unsync
      // 0x02 / data-length-indicator 0x01 — grouping prepends a group
      // byte, so the encoding byte is no longer first) — the hop is
      // still the stored size, but a raw text decode would be wrong
      val f1 = b(off + 9) & 0xff
      val decodable =
        if (ver == 3) (f1 & 0xe0) == 0
        else (f1 & 0x4f) == 0
      val p = off + 10
      if (fid.startsWith("T") && sz >= 1 && decodable) {
        val enc = b(p) & 0xff
        val txt =
          if (enc == 0) new String(b, p + 1, sz.toInt - 1, "ISO-8859-1")
          else if (enc == 3) new String(b, p + 1, sz.toInt - 1, "UTF-8")
          else ""
        fid match {
          case "TIT2" => title = txt
          case "TPE1" => artist = txt
          case "TALB" => album = txt
          case _ => ()
        }
      }
      nFrames += 1
      off = p + sz.toInt
    }
    Some(Id3Meta(r.id, title, artist, album, nFrames, total.toLong))
  }

  def id3Meta(ds: Dataset[MediaRecord]): Dataset[Id3Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(id3MetaOf))
  }

  /** Per-row MP3 with a REAL ID3 tag — v2.3 for even ids, v2.4 for
    * odd (the version byte and the frame-size wire rule both flip):
    * TIT2 = "doc <id>", TPE1 = "src<id % 5>", TALB = the document's
    * first whitespace token (or "untitled"), all ISO-8859-1... except
    * TALB, stored UTF-8 (encoding byte 3) so the non-latin path is
    * exercised.  The v2.4 arm adds a TXXX frame whose payload is
    * `128 + id % 64` bytes — a frame ≥ 128 B is exactly where the
    * syncsafe (v2.4) and plain-u32 (v2.3) size encodings diverge, so
    * a parser applying the wrong rule mis-hops and fails the oracle.
    * One CBR frame chain follows (the [[synthesizeMp3]] layout with
    * the same bitrate/rate/mode parameterization), so both the tag
    * fields and the audio census replay from (id, text).
    */
  def synthesizeMp3Id3(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val ver = if (id % 2 == 0) 3 else 4
        def szBytes(sz: Int): Array[Byte] =
          if (ver == 3)
            Array[Byte]((sz >> 24).toByte, (sz >> 16).toByte,
              (sz >> 8).toByte, sz.toByte)
          else // syncsafe: 7 data bits per byte
            Array[Byte](((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
              ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte)
        def frame(fid: String, enc: Int, txt: Array[Byte]): Array[Byte] = {
          val sz = 1 + txt.length
          fid.getBytes("US-ASCII") ++ szBytes(sz) ++
            Array[Byte](0, 0, enc.toByte) ++ txt
        }
        def rawFrame(fid: String, payload: Array[Byte]): Array[Byte] =
          fid.getBytes("US-ASCII") ++ szBytes(payload.length) ++
            Array[Byte](0, 0) ++ payload
        val firstTok = text.split("\\s+").find(_.nonEmpty).getOrElse("untitled")
        val pad128 =
          if (ver == 4) {
            // TXXX: encoding byte + "pad\0" description + value bytes;
            // payload ≥ 128 B forces the syncsafe-vs-plain divergence
            val value = Array.fill((123 + id % 64).toInt)('x'.toByte)
            rawFrame("TXXX", Array[Byte](0) ++
              "pad".getBytes("ISO-8859-1") ++ Array[Byte](0) ++ value)
          } else Array.emptyByteArray
        val frames =
          frame("TIT2", 0, s"doc $id".getBytes("ISO-8859-1")) ++
            frame("TPE1", 0, s"src${id % 5}".getBytes("ISO-8859-1")) ++
            frame("TALB", 3, firstTok.getBytes("UTF-8")) ++ pad128
        val size = frames.length // syncsafe, fits well under 2^14
        val tag = Array[Byte]('I', 'D', '3', ver.toByte, 0, 0,
          ((size >> 21) & 0x7f).toByte, ((size >> 14) & 0x7f).toByte,
          ((size >> 7) & 0x7f).toByte, (size & 0x7f).toByte) ++ frames
        // one minimal CBR frame chain behind the tag (audio present)
        val brIdx = 1 + (id % 14).toInt
        val srIdx = (id % 3).toInt
        val frameLen = mp3FrameLen(Mp3BitrateKbps(brIdx), Mp3SampleRates(srIdx), 0)
        val body = new Array[Byte](frameLen)
        body(0) = 0xff.toByte; body(1) = 0xfb.toByte
        body(2) = (brIdx << 4 | srIdx << 2).toByte
        body(3) = (((id % 4).toInt) << 6 | 1 << 2).toByte
        MediaRecord(id, "audio/mpeg", tag ++ body)
      }
  }

  /** POSIX ustar member census — the WebDataset surface: multimodal
    * training shards ship as tar files whose members pair up into
    * samples by basename key (`key.jpg` + `key.txt` + `key.json`), so
    * "list the members without extracting" is the first operation any
    * shard-level pipeline (integrity check, sample census, resharding
    * plan) runs.  One row per member with its EXACT data offset — the
    * seek table a random-access reader needs.  Every header checksum
    * is VERIFIED (the POSIX sum-with-spaced-checksum-field rule); a
    * corrupt header ends the walk with None, never a half-census.
    */
  final case class TarMember(
      id: Long, memberIdx: Long, name: String, size: Long,
      typeflag: String, dataOffset: Long)

  private def tarOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xff
      if (c == 0 || c == ' ') {
        if (seen) return Some(v)
      } else if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  /** POSIX ustar member walk with VERIFIED header checksums and the
    * three long-name mechanisms real archives use: the ustar `prefix`
    * field (paths 100–255 chars split as prefix/name), GNU `L`
    * longname entries (the data block IS the next member's name; `K`
    * longlink entries consumed likewise), and PAX `x` extended
    * headers (`len key=value\n` records, `path` overriding the next
    * member's name; `g` globals consumed but not applied).  Meta
    * entries produce NO member rows — a WebDataset shard written by
    * GNU tar with >100-char sample names censuses its REAL members,
    * not `././@LongLink` markers with truncated names.
    */
  private[graft] def tarMembersOf(r: MediaRecord): Option[Seq[TarMember]] = {
    val b = r.content
    if (b == null || b.length < 1024 || b.length % 512 != 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var off = 0
    var idx = 0L
    var pendingName: String = null // set by GNU 'L' / PAX path records
    while (off + 512 <= b.length) {
      if (b(off) == 0) {
        // end-of-archive: two zero blocks, then nothing but zeros
        var i = off
        while (i < b.length) { if (b(i) != 0) return None; i += 1 }
        if (b.length - off < 1024) return None
        return Some(out.toSeq)
      }
      // magic "ustar" at 257
      if (!(b(off + 257) == 'u' && b(off + 258) == 's' && b(off + 259) == 't' &&
        b(off + 260) == 'a' && b(off + 261) == 'r')) return None
      // checksum: header bytes with the chksum field (148, 8) as spaces
      val stored = tarOctal(b, off + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
        i += 1
      }
      if (sum != stored) return None
      var e = off
      while (e < off + 100 && b(e) != 0) e += 1
      var name = new String(b, off, e - off, "US-ASCII")
      // POSIX prefix field (345, 155): long paths split as
      // prefix "/" name — GNU tar and bsdtar both emit it
      var pe = off + 345
      while (pe < off + 345 + 155 && pe < off + 500 && b(pe) != 0) pe += 1
      if (pe > off + 345)
        name = new String(b, off + 345, pe - (off + 345), "US-ASCII") +
          "/" + name
      val size = tarOctal(b, off + 124, 12).getOrElse(return None)
      if (size < 0 || size > (b.length - off - 512).toLong) return None
      val tf = (b(off + 156) & 0xff).toChar
      val dataOff = off + 512
      val dataEnd = dataOff + size.toInt
      tf match {
        case 'L' =>
          // GNU longname: the data IS the NEXT member's full name
          // (NUL-terminated); this entry itself is not a member
          if (size <= 0 || size > 65536) return None
          var ne = dataOff
          while (ne < dataEnd && b(ne) != 0) ne += 1
          pendingName = new String(b, dataOff, ne - dataOff, "UTF-8")
        case 'K' =>
          // GNU longlink: next member's link target — consumed, no row
          if (size > 65536) return None
        case 'x' | 'g' =>
          // PAX extended header: "len key=value\n" records; `path`
          // from a per-file ('x') header overrides the next name
          if (size > (1 << 20)) return None
          val txt = new String(b, dataOff, size.toInt, "UTF-8")
          var p = 0
          while (p < txt.length) {
            val sp = txt.indexOf(' ', p)
            if (sp < 0) return None
            val lenStr = txt.substring(p, sp)
            if (lenStr.isEmpty || !lenStr.forall(_.isDigit) ||
              lenStr.length > 7) return None
            val recLen = lenStr.toInt
            if (recLen <= 0 || p + recLen > txt.length ||
              txt(p + recLen - 1) != '\n') return None
            val kv = txt.substring(sp + 1, p + recLen - 1)
            val eq = kv.indexOf('=')
            if (eq < 0) return None
            if (tf == 'x' && kv.substring(0, eq) == "path")
              pendingName = kv.substring(eq + 1)
            p += recLen
          }
        case _ =>
          val finalName = if (pendingName != null) pendingName else name
          pendingName = null
          out += TarMember(r.id, idx, finalName, size,
            if (tf == 0) "0" else tf.toString, dataOff.toLong)
          idx += 1
      }
      off += 512 + ((size + 511) / 512).toInt * 512
    }
    None // ran off the end without the end-of-archive marker
  }

  def tarMembers(ds: Dataset[MediaRecord]): Dataset[TarMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => tarMembersOf(r).getOrElse(Nil)))
  }

  /** Per-row WebDataset-style shard synthesis: `1 + id % 3` samples,
    * each contributing `s<k>.txt` (the k-th byte-split of the
    * document's UTF-8 text) and `s<k>.cls` (one class byte) — real
    * ustar headers with correct checksums, 512-padded data, and the
    * two-zero-block trailer, so member names/sizes/offsets replay
    * from (id, octet_length(text)) with a running-sum walk.
    */
  def synthesizeTarShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val ns = 1 + (id % 3).toInt
        def header(name: String, size: Long): Array[Byte] = {
          val h = new Array[Byte](512)
          val nb = name.getBytes("US-ASCII")
          System.arraycopy(nb, 0, h, 0, nb.length)
          def octal(v: Long, off: Int, len: Int): Unit = {
            val sStr = java.lang.Long.toOctalString(v)
            val padded = ("0" * (len - 1 - sStr.length)) + sStr
            var i = 0
            while (i < len - 1) { h(off + i) = padded(i).toByte; i += 1 }
            h(off + len - 1) = 0
          }
          octal(420L, 100, 8) // mode 0644
          octal(0L, 108, 8); octal(0L, 116, 8) // uid/gid
          octal(size, 124, 12)
          octal(0L, 136, 12) // mtime
          h(156) = '0' // regular file
          "ustar".getBytes("US-ASCII").copyToArray(h, 257)
          h(262) = 0; h(263) = '0'; h(264) = '0'
          // checksum over the header with the field spaced
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
        def padded(data: Array[Byte]): Array[Byte] =
          data ++ new Array[Byte]((512 - data.length % 512) % 512)
        val out = Array.newBuilder[Byte]
        var from = 0
        val n = payload.length
        var k = 0
        while (k < ns) {
          val take = n / ns + (if (k < n % ns) 1 else 0)
          out ++= header(s"s$k.txt", take.toLong)
          out ++= padded(payload.slice(from, from + take))
          from += take
          out ++= header(s"s$k.cls", 1L)
          out ++= padded(Array(('0' + (id % 10).toInt).toByte))
          k += 1
        }
        out ++= new Array[Byte](1024)
        MediaRecord(id, "application/x-tar", out.result())
      }
  }

  /** `.tar.gz` member census: inflate the gzip layer (pure JDK, the
    * PNG codec's Inflater discipline) and run the same verified ustar
    * walk — WebDataset shards ship compressed at least as often as
    * raw.  A bomb guard caps the inflated size (default 1 GiB per
    * shard — tune to the fleet's shard size); a corrupt gzip stream
    * or an over-budget inflation yields None, never a dead executor.
    */
  private[graft] def tarGzMembersOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[TarMember]] = {
    val b = r.content
    if (b == null || b.length < 18) return None
    if ((b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return None
    val out = new java.io.ByteArrayOutputStream(math.min(1 << 16, maxInflated))
    val in = try {
      new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    } catch { case _: java.io.IOException => return None }
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) {
        if (out.size() + n > maxInflated) return None // bomb guard
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => return None
    } finally in.close() // release the Inflater's native memory on EVERY exit path
    tarMembersOf(MediaRecord(r.id, "application/x-tar", out.toByteArray))
  }

  def tarGzMembers(ds: Dataset[MediaRecord]): Dataset[TarMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => tarGzMembersOf(r).getOrElse(Nil)))
  }

  /** `.tar.zst` member census — the OTHER compressed-shard convention
    * (modern WebDataset distributions ship zstd at least as often as
    * gzip; zstd-jni rides with Spark).  Same contract as the gzip
    * flavor: inflate through a streaming decompressor with the same
    * 1 GiB-default bomb guard, run the identical verified ustar walk,
    * and release the native context on EVERY exit path (the r14 gzip
    * lesson).  The compression layer must be invisible to the member
    * table — all three shard flavors share one oracle.
    */
  /** Bomb-guarded whole-buffer zstd inflate (magic gate + streaming
    * copy; the native context is released on every exit path) —
    * shared by the `.tar.zst` and `.jsonl.zst` walks.
    */
  private[graft] def zstdInflate(
      b: Array[Byte], maxInflated: Int = 1 << 30): Option[Array[Byte]] = {
    if (b == null || b.length < 4) return None
    // zstd frame magic 0xFD2FB528 (little-endian on disk)
    if (!((b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd)) return None
    val out = new java.io.ByteArrayOutputStream(math.min(1 << 16, maxInflated))
    val in = try {
      new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(b))
    } catch { case _: java.io.IOException => return None }
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) {
        if (out.size() + n > maxInflated) return None // bomb guard
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None
    } finally in.close() // native zstd context: release on every exit path
  }

  private[graft] def tarZstMembersOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[TarMember]] = {
    zstdInflate(r.content, maxInflated).flatMap(raw =>
      tarMembersOf(MediaRecord(r.id, "application/x-tar", raw)))
  }

  def tarZstMembers(ds: Dataset[MediaRecord]): Dataset[TarMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => tarZstMembersOf(r).getOrElse(Nil)))
  }

  /** [[synthesizeTarShard]] compressed with zstd at a fixed level
    * (deterministic for a fixed level and zstd-jni version, the
    * q_compress_zstd contract), so the member table replays
    * IDENTICALLY to the raw and gzip shards.
    */
  def synthesizeTarZstShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    synthesizeTarShard(df, idCol, textCol).map { r =>
      MediaRecord(r.id, "application/zstd",
        com.github.luben.zstd.Zstd.compress(r.content, 3))
    }
  }

  /** [[synthesizeTarShard]] compressed with the JDK gzip writer
    * (MTIME 0, deterministic deflate — the PNG codec's contract), so
    * the member table replays IDENTICALLY to the uncompressed shard:
    * the compression layer must not change what a reader sees.
    */
  def synthesizeTarGzShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    synthesizeTarShard(df, idCol, textCol).map { r =>
      val bos = new java.io.ByteArrayOutputStream(r.content.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r.content); gz.close()
      MediaRecord(r.id, "application/gzip", bos.toByteArray)
    }
  }

  /** safetensors header census — the checkpoint-lake surface: a
    * training pipeline's OTHER large binary population is model
    * checkpoints, and safetensors puts everything a census needs in a
    * JSON header (8-byte LE length prefix, then
    * `{"tensor": {"dtype": …, "shape": […], "data_offsets": [a, b]}}`)
    * before the weight bytes.  One row per tensor: name, dtype, rank,
    * element count, exact byte span — without reading a single weight.
    * Parsed with Spark's bundled Jackson; any malformed header yields
    * no rows (the parser-family contract).
    */
  final case class TensorMeta(
      id: Long, tensor: String, dtype: String, rank: Long,
      nElements: Long, byteOffset: Long, nBytes: Long)

  private[graft] def safetensorsOf(r: MediaRecord): Seq[TensorMeta] = {
    val b = r.content
    if (b == null || b.length < 8) return Nil
    var hlen = 0L
    var i = 0
    while (i < 8) { hlen |= (b(i) & 0xffL) << (8 * i); i += 1 }
    if (hlen <= 0 || hlen > (b.length - 8).toLong) return Nil
    val dataBase = 8L + hlen
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(new String(b, 8, hlen.toInt, "UTF-8"))
      if (root == null || !root.isObject) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[TensorMeta]
      val fields = root.fields()
      while (fields.hasNext) {
        val e = fields.next()
        if (e.getKey != "__metadata__") {
          val v = e.getValue
          val dtype = Option(v.get("dtype")).map(_.asText("")).getOrElse("")
          val shape = Option(v.get("shape")).filter(_.isArray)
          val offs = Option(v.get("data_offsets")).filter(n => n.isArray && n.size == 2)
          (shape, offs) match {
            case (Some(sh), Some(o)) =>
              var n = 1L
              var j = 0
              while (j < sh.size) { n *= math.max(0L, sh.get(j).asLong(0L)); j += 1 }
              val a = o.get(0).asLong(-1L)
              val bnd = o.get(1).asLong(-1L)
              if (a >= 0 && bnd >= a && dataBase + bnd <= b.length.toLong)
                out += TensorMeta(r.id, e.getKey, dtype, sh.size.toLong, n,
                  dataBase + a, bnd - a)
            case _ => ()
          }
        }
      }
      out.toSeq.sortBy(t => (t.byteOffset, t.tensor))
    } catch { case _: Exception => Nil }
  }

  def safetensorsMeta(ds: Dataset[MediaRecord]): Dataset[TensorMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(safetensorsOf))
  }

  /** Per-row safetensors synthesis: `1 + id % 4` tensors; tensor k is
    * `t<k>` with dtype F32/F16 alternating by (id + k) % 2, shape
    * `[k + 1, 3 + id % 5]`, contiguous data offsets, and a
    * `__metadata__` entry (skipped by the census, per spec).  Weight
    * bytes are zeros — the census never reads them; every field
    * replays from id arithmetic.
    */
  def synthesizeSafetensors(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val nt = 1 + (id % 4).toInt
      val cols = 3 + (id % 5).toInt
      val sb = new StringBuilder("{\"__metadata__\":{\"format\":\"pt\"},")
      var off = 0L
      var k = 0
      while (k < nt) {
        val f32 = (id + k) % 2 == 0
        val bytesPer = if (f32) 4 else 2
        val n = (k + 1).toLong * cols
        val end = off + n * bytesPer
        sb.append("\"t").append(k).append("\":{\"dtype\":\"")
          .append(if (f32) "F32" else "F16")
          .append("\",\"shape\":[").append(k + 1).append(',').append(cols)
          .append("],\"data_offsets\":[").append(off).append(',').append(end)
          .append("]}")
        if (k < nt - 1) sb.append(',')
        off = end
        k += 1
      }
      sb.append('}')
      val header = sb.result().getBytes("UTF-8")
      val lenLe = Array.tabulate(8)(i => (header.length.toLong >> (8 * i)).toByte)
      MediaRecord(id, "application/safetensors",
        lenLe ++ header ++ new Array[Byte](off.toInt))
    }
  }

  /** NumPy `.npy` header census — embedding dumps and intermediate
    * arrays are the other binary population of an ML data lake.  The
    * v1 format is fully described by its ASCII header (magic
    * `\x93NUMPY`, version, u16-LE header length, then a Python dict
    * literal `{'descr': '<f4', 'fortran_order': False, 'shape':
    * (r, c), }` space-padded so data starts 64-aligned): one row per
    * file with dtype, order, rank, element count, item size, and the
    * exact data offset — no array bytes read.  Malformed headers
    * yield None (the parser-family contract).
    */
  final case class NpyMeta(
      id: Long, descr: String, fortranOrder: Boolean, rank: Long,
      nElements: Long, itemSize: Long, dataOffset: Long, nBytes: Long)

  private[graft] def npyMetaOf(r: MediaRecord): Option[NpyMeta] = {
    val b = r.content
    if (b == null || b.length < 10) return None
    if (!((b(0) & 0xff) == 0x93 && b(1) == 'N' && b(2) == 'U' && b(3) == 'M' &&
      b(4) == 'P' && b(5) == 'Y')) return None
    val major = b(6) & 0xff
    val (hlen, hoff) =
      if (major == 1) (((b(8) & 0xff) | (b(9) & 0xff) << 8).toLong, 10)
      else if (major == 2 || major == 3) {
        if (b.length < 12) return None
        (u32(b, 8), 12)
      } else return None
    if (hlen <= 0 || hlen > (b.length - hoff).toLong) return None
    val header = new String(b, hoff, hlen.toInt, "US-ASCII")
    val Q = 0x27.toChar // single quote
    def strField(key: String): Option[String] = {
      val i = header.indexOf(s"$Q$key$Q:")
      if (i < 0) return None
      val q1 = header.indexOf(Q, i + key.length + 3)
      if (q1 < 0) return None
      val q2 = header.indexOf(Q, q1 + 1)
      if (q2 < 0) None else Some(header.substring(q1 + 1, q2))
    }
    val descr = strField("descr").getOrElse(return None)
    val fortran = {
      val i = header.indexOf(s"${Q}fortran_order$Q:")
      if (i < 0) return None
      val t = header.indexOf("True", i)
      t >= 0 && t < i + 24
    }
    val shape: Seq[Long] = {
      val i = header.indexOf(s"${Q}shape$Q:")
      if (i < 0) return None
      val o = header.indexOf('(', i)
      val c = header.indexOf(')', o + 1)
      if (o < 0 || c < 0) return None
      val inner = header.substring(o + 1, c).trim
      if (inner.isEmpty) Nil
      else {
        val parts = inner.split(',').map(_.trim).filter(_.nonEmpty)
        val dims = parts.map(_.toLongOption.getOrElse(return None)).toSeq
        if (dims.exists(_ < 0)) return None
        dims
      }
    }
    // item size from the descr tail: '<f4' -> 4, '|b1' -> 1, '<c16' -> 16
    val itemSize = descr.reverse.takeWhile(_.isDigit).reverse.toLongOption
      .filter(n => n > 0 && n <= 64).getOrElse(return None)
    val n = shape.foldLeft(1L)(_ * _)
    val dataOff = hoff.toLong + hlen
    if (dataOff + n * itemSize > b.length.toLong) return None
    Some(NpyMeta(r.id, descr, fortran, shape.length.toLong, n, itemSize,
      dataOff, n * itemSize))
  }

  def npyMeta(ds: Dataset[MediaRecord]): Dataset[NpyMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(npyMetaOf))
  }

  /** Per-row `.npy` synthesis (v1, 64-aligned like NumPy itself):
    * descr `['<f4', '<f2', '<i8'][id % 3]`, C order, shape
    * `(1 + id % 4, 3 + id % 5)`, zero array bytes — every census
    * field replays from id arithmetic (the header is ASCII, so its
    * padded length is digit arithmetic both engines can do).
    */
  def synthesizeNpy(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val Q = 0x27.toChar
      val descrs = Array("<f4", "<f2", "<i8")
      val descr = descrs((id % 3).toInt)
      val itemSize = descr.last.asDigit
      val rows = 1 + (id % 4)
      val cols = 3 + (id % 5)
      val dict = s"{${Q}descr$Q: $Q$descr$Q, ${Q}fortran_order$Q: False, " +
        s"${Q}shape$Q: ($rows, $cols), }"
      // numpy pads with spaces + final newline so 10 + hlen is 64-aligned
      val total = (10 + dict.length + 1 + 63) / 64 * 64
      val hlen = total - 10
      val header = dict + (" " * (hlen - dict.length - 1)) + "\n"
      val lenLe = Array[Byte](hlen.toByte, (hlen >> 8).toByte)
      MediaRecord(id, "application/x-npy",
        Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0) ++ lenLe ++
          header.getBytes("US-ASCII") ++
          new Array[Byte]((rows * cols * itemSize).toInt))
    }
  }

  // ---- WebP header census (RIFF + VP8/VP8L/VP8X) -------------------

  /** WebP header census — the third big web-image population next to
    * JPEG and PNG.  A WebP file is a RIFF container (`RIFF` + u32le
    * payload size + `WEBP`) whose first chunk picks the flavor: lossy
    * `VP8 ` (dims in the keyframe header after the 0x9d 0x01 0x2a
    * start code), lossless `VP8L` (14-bit dims packed little-endian
    * after the 0x2f signature), or extended `VP8X` (24-bit canvas
    * dims, feature flags).  Same contract as the JPEG/PNG walks: pure
    * byte arithmetic over opaque bytes, no pixel decode, TOTAL on
    * arbitrary input.
    */
  final case class WebpMeta(
      id: Long, format: String, width: Long, height: Long,
      hasAlpha: Long, nChunks: Long, nBytes: Long)

  private[graft] def webpMetaOf(r: MediaRecord): Option[WebpMeta] = {
    val b = r.content
    if (b == null || b.length < 20) return None
    def u32le(off: Int): Long =
      (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
    def u16le(off: Int): Int = (b(off) & 0xff) | (b(off + 1) & 0xff) << 8
    def u24le(off: Int): Long =
      (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 | (b(off + 2) & 0xffL) << 16
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    val riffEnd = 8L + u32le(4)
    if (riffEnd > b.length.toLong || riffEnd < 12L) return None
    var off = 12L
    var nChunks = 0L
    var format: String = null
    var width = 0L; var height = 0L; var hasAlpha = 0L
    while (off + 8 <= riffEnd) {
      val o = off.toInt
      var i = 0
      while (i < 4) { // chunk ids are printable ASCII (RIFF rule)
        val c = b(o + i) & 0xff
        if (c < 0x20 || c > 0x7e) return None
        i += 1
      }
      val fourcc = new String(b, o, 4, "US-ASCII")
      val sz = u32le(o + 4)
      val dataOff = o + 8
      if (dataOff + sz > riffEnd) return None
      if (nChunks == 0) {
        format = fourcc.trim
        fourcc match {
          case "VP8 " =>
            // 3-byte frame tag, then the keyframe start code, then
            // 14-bit dims (low bits of two u16le — high 2 bits scale)
            if (sz < 10) return None
            if ((b(dataOff) & 1) != 0) return None // not a keyframe
            if ((b(dataOff + 3) & 0xff) != 0x9d ||
              (b(dataOff + 4) & 0xff) != 0x01 ||
              (b(dataOff + 5) & 0xff) != 0x2a) return None
            width = (u16le(dataOff + 6) & 0x3fff).toLong
            height = (u16le(dataOff + 8) & 0x3fff).toLong
          case "VP8L" =>
            if (sz < 5) return None
            if ((b(dataOff) & 0xff) != 0x2f) return None // signature
            val bits = u32le(dataOff + 1)
            width = (bits & 0x3fff) + 1
            height = (bits >> 14 & 0x3fff) + 1
            hasAlpha = bits >> 28 & 1
            if ((bits >> 29 & 0x7) != 0) return None // version must be 0
          case "VP8X" =>
            if (sz < 10) return None
            hasAlpha = (b(dataOff) >> 4 & 1).toLong
            width = u24le(dataOff + 4) + 1
            height = u24le(dataOff + 7) + 1
          case _ => return None // first chunk must declare the flavor
        }
      }
      nChunks += 1
      off = dataOff + sz + (sz & 1) // chunks pad to even (RIFF rule)
    }
    if (format == null || off != riffEnd) None
    else Some(WebpMeta(r.id, format, width, height, hasAlpha, nChunks,
      b.length.toLong))
  }

  def webpMeta(ds: Dataset[MediaRecord]): Dataset[WebpMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(webpMetaOf))
  }

  /** Per-row WebP synthesis: flavor `id % 3` (VP8 / VP8L / VP8X),
    * dims `1 + id % 997` × `1 + id % 737` (inside the lossy 14-bit
    * limit), alpha `id % 2` where the flavor can carry it, and the
    * document's UTF-8 bytes ride in a second `XPAY` chunk — so every
    * census field including the total byte count replays from
    * (id, octet_length(text)) in plain SQL.
    */
  def synthesizeWebp(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val w = 1 + (id % 997).toInt
        val h = 1 + (id % 737).toInt
        val alpha = (id % 2).toInt
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        val fmtChunk: Array[Byte] = (id % 3) match {
          case 0 => // VP8 : frame tag (keyframe) + start code + dims
            "VP8 ".getBytes("US-ASCII") ++ u32a(10L) ++
              Array[Byte](0x30, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
              Array[Byte](w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte)
          case 1 => // VP8L: signature + packed 14-bit dims + alpha
            val bits = (w - 1).toLong | (h - 1).toLong << 14 | alpha.toLong << 28
            "VP8L".getBytes("US-ASCII") ++ u32a(5L) ++
              (0x2f.toByte +: u32a(bits)) ++ Array[Byte](0) // odd size: pad
          case _ => // VP8X: flags + reserved + 24-bit canvas dims
            "VP8X".getBytes("US-ASCII") ++ u32a(10L) ++
              Array[Byte]((alpha << 4).toByte, 0, 0, 0,
                (w - 1).toByte, ((w - 1) >> 8).toByte, ((w - 1) >> 16).toByte,
                (h - 1).toByte, ((h - 1) >> 8).toByte, ((h - 1) >> 16).toByte)
        }
        val payChunk = "XPAY".getBytes("US-ASCII") ++
          u32a(payload.length.toLong) ++ payload ++
          (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
        val riffLen = 4L + fmtChunk.length + payChunk.length
        val out = "RIFF".getBytes("US-ASCII") ++ u32a(riffLen) ++
          "WEBP".getBytes("US-ASCII") ++ fmtChunk ++ payChunk
        MediaRecord(id, "image/webp", out)
      }
  }

  // ---- GIF header census -------------------------------------------

  /** GIF89a structure census — the animation-bearing web-image
    * population: logical screen dims, global-color-table size, the
    * frame count (image descriptors), and the total animation delay
    * from the per-frame Graphic Control Extensions.  The LZW payload
    * is walked STRUCTURALLY (sub-block length hops — the format's own
    * skip mechanism) without decoding, like every parser in this
    * family.  Strict framing: the walk must end exactly at the 0x3B
    * trailer as the file's last byte, so a truncated tail fails the
    * census instead of under-counting.
    */
  final case class GifMeta(
      id: Long, width: Long, height: Long, nColors: Long,
      nFrames: Long, totalDelayCs: Long, nBytes: Long)

  private[graft] def gifMetaOf(r: MediaRecord): Option[GifMeta] = {
    val b = r.content
    if (b == null || b.length < 14) return None
    def u16le(off: Int): Int = (b(off) & 0xff) | (b(off + 1) & 0xff) << 8
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    val width = u16le(6).toLong
    val height = u16le(8).toLong
    val packed = b(10) & 0xff
    val nColors = if ((packed & 0x80) != 0) 1L << ((packed & 7) + 1) else 0L
    var off = 13 + (if ((packed & 0x80) != 0) 3 * nColors.toInt else 0)
    var nFrames = 0L
    var totalDelayCs = 0L
    // hop sub-blocks (len byte + payload, 0x00 terminator); -1 = overrun
    def skipSubBlocks(from: Int): Int = {
      var p = from
      while (p < b.length && b(p) != 0) {
        p += 1 + (b(p) & 0xff)
        if (p > b.length) return -1
      }
      if (p >= b.length) -1 else p + 1
    }
    while (off < b.length) {
      (b(off) & 0xff) match {
        case 0x3b => // trailer: must be the last byte (strict framing)
          return if (off == b.length - 1)
            Some(GifMeta(r.id, width, height, nColors, nFrames,
              totalDelayCs, b.length.toLong))
          else None
        case 0x21 => // extension: label + sub-blocks
          if (off + 2 > b.length) return None
          val label = b(off + 1) & 0xff
          if (label == 0xf9 && off + 7 <= b.length && (b(off + 2) & 0xff) == 4)
            totalDelayCs += u16le(off + 4).toLong // GCE delay, centiseconds
          off = skipSubBlocks(off + 2)
          if (off < 0) return None
        case 0x2c => // image descriptor
          if (off + 10 > b.length) return None
          val ipacked = b(off + 9) & 0xff
          var p = off + 10
          if ((ipacked & 0x80) != 0) p += 3 * (1 << ((ipacked & 7) + 1))
          if (p + 1 > b.length) return None
          p += 1 // LZW minimum code size
          off = skipSubBlocks(p)
          if (off < 0) return None
          nFrames += 1
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  def gifMeta(ds: Dataset[MediaRecord]): Dataset[GifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(gifMetaOf))
  }

  /** Per-row GIF89a synthesis: screen `1 + id % 500` × `1 + id % 300`,
    * a global color table of `2^(1 + id % 8)` entries, `1 + id % 3`
    * frames each preceded by a GCE with delay `id % 100` cs, and the
    * document's UTF-8 bytes split evenly across the frames' data
    * sub-blocks (≤ 255 B each, the format's own chunking) — the whole
    * census INCLUDING the total byte count replays from
    * (id, octet_length(text)) with integer arithmetic.
    */
  def synthesizeGif(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val w = 1 + (id % 500).toInt
        val h = 1 + (id % 300).toInt
        val gctBits = (id % 8).toInt
        val nColors = 1 << (gctBits + 1)
        val nFrames = 1 + (id % 3).toInt
        val delay = (id % 100).toInt
        val out = Array.newBuilder[Byte]
        out ++= "GIF89a".getBytes("US-ASCII")
        out += w.toByte; out += (w >> 8).toByte
        out += h.toByte; out += (h >> 8).toByte
        out += (0x80 | gctBits).toByte // GCT present, size bits
        out += 0; out += 0             // bg index, aspect
        out ++= new Array[Byte](3 * nColors)
        var f = 0
        var from = 0
        while (f < nFrames) {
          val take = payload.length / nFrames +
            (if (f < payload.length % nFrames) 1 else 0)
          out ++= Array[Byte](0x21, 0xf9.toByte, 4, 0,
            delay.toByte, (delay >> 8).toByte, 0, 0) // GCE
          out += 0x2c                                // image descriptor
          out += 0; out += 0; out += 0; out += 0     // left, top
          out += w.toByte; out += (w >> 8).toByte
          out += h.toByte; out += (h >> 8).toByte
          out += 0                                   // no LCT
          out += 8                                   // LZW min code size
          var rem = take
          var p = from
          while (rem > 0) {
            val blk = math.min(255, rem)
            out += blk.toByte
            out ++= java.util.Arrays.copyOfRange(payload, p, p + blk)
            p += blk; rem -= blk
          }
          out += 0 // sub-block terminator
          from += take
          f += 1
        }
        out += 0x3b
        MediaRecord(id, "image/gif", out.result())
      }
  }

  // ---- Ogg Vorbis identification-header census ---------------------

  /** Ogg Vorbis stream census — the Vorbis sibling of [[opusMetaOf]],
    * sharing the RFC 3533 page walk and real CRC verification.  The
    * identification header (packet 1, its own BOS page per spec) is
    * `0x01 "vorbis"` + u32le version (must be 0) + u8 channels +
    * u32le sample rate + the three u32le bitrate fields + the
    * blocksize byte + a framing bit.  Duration is exact integer
    * arithmetic: the last page's granule position IS the PCM sample
    * count at that page's end (Vorbis I spec §A.2).
    */
  final case class VorbisMeta(
      id: Long, channels: Long, sampleRate: Long, bitrateNominal: Long,
      nPages: Long, lastGranule: Long, durationMs: Long, nBytes: Long)

  private[graft] def vorbisMetaOf(r: MediaRecord): Option[VorbisMeta] = {
    val b = r.content
    if (b == null || b.length < 58) return None
    var off = 0
    var nPages = 0L
    var lastGranule = 0L
    var head: Option[(Int, Long, Long)] = None // (channels, rate, brNominal)
    while (off + 27 <= b.length) {
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S')) return None
      if (b(off + 4) != 0) return None
      val granule = java.lang.Long.reverseBytes(u64be(b, off + 6))
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += b(off + 27 + i) & 0xff; i += 1 }
      val pageLen = 27 + nSegs + bodyLen
      if (off + pageLen > b.length) return None
      // verify the RFC 3533 page CRC — a corrupt page fails the census
      val stored = (b(off + 22) & 0xffL) | (b(off + 23) & 0xffL) << 8 |
        (b(off + 24) & 0xffL) << 16 | (b(off + 25) & 0xffL) << 24
      if (oggCrc(b, off, pageLen, 22) != stored) return None
      if (nPages == 0) {
        // BOS page: the identification header, alone per spec
        val p = off + 27 + nSegs
        if (bodyLen < 30) return None
        if ((b(p) & 0xff) != 0x01 ||
          new String(b, p + 1, 6, "US-ASCII") != "vorbis") return None
        def u32le(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
          (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
        if (u32le(p + 7) != 0L) return None // vorbis_version
        val channels = b(p + 11) & 0xff
        val rate = u32le(p + 12)
        val brNom = u32le(p + 20)
        if (channels == 0 || rate == 0L) return None
        if ((b(p + 29) & 1) != 1) return None // framing bit
        head = Some((channels, rate, brNom))
      }
      if (granule > 0) lastGranule = granule
      nPages += 1
      off += pageLen
    }
    head match {
      case Some((ch, rate, brNom)) if off == b.length =>
        Some(VorbisMeta(r.id, ch.toLong, rate, brNom, nPages, lastGranule,
          lastGranule * 1000L / rate, b.length.toLong))
      case _ => None
    }
  }

  def vorbisMeta(ds: Dataset[MediaRecord]): Dataset[VorbisMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(vorbisMetaOf))
  }

  private[graft] val VorbisDataPages = 3

  /** Per-row Ogg Vorbis synthesis, the [[synthesizeOpus]] sibling: a
    * BOS page with the identification header (channels `1 + id % 2`,
    * rate `[44100, 48000, 32000][id % 3]`, nominal bitrate
    * `1000 · (64 + 16 · (id % 13))`), one page carrying comment +
    * setup-stub packets, then [[VorbisDataPages]] data pages splitting
    * the document's UTF-8 bytes, granule advancing `1024 · (1 + id %
    * 4)` samples per page, EOS on the last.  All page CRCs are real.
    */
  def synthesizeVorbis(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val channels = 1 + (id % 2).toInt
        val rate = Array(44100L, 48000L, 32000L)((id % 3).toInt)
        val brNom = 1000L * (64 + 16 * (id % 13))
        val ticksPerPage = 1024L * (1 + (id % 4).toInt)
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        def u64a(v: Long) = u32a(v & 0xffffffffL) ++ u32a(v >>> 32)
        def lacing(n: Int): Array[Byte] = {
          val bld = Array.newBuilder[Byte]
          var rest = n
          while (rest >= 255) { bld += 255.toByte; rest -= 255 }
          bld += rest.toByte
          bld.result()
        }
        def page(flags: Int, granule: Long, seq: Int,
            packets: Array[Array[Byte]]): Array[Byte] = {
          val segs = packets.flatMap(p => lacing(p.length))
          require(segs.length <= 255,
            s"synthesizeVorbis: ${segs.length} lacing values exceed the " +
              "255-per-page Ogg limit (doc too large)")
          val out = "OggS".getBytes("US-ASCII") ++ Array[Byte](0, flags.toByte) ++
            u64a(granule) ++ u32a(0x7a11 + (id & 0xffff)) ++ u32a(seq.toLong) ++
            u32a(0L) ++ Array(segs.length.toByte) ++ segs ++ packets.flatten
          val crc = oggCrc(out, 0, out.length, 22)
          System.arraycopy(u32a(crc), 0, out, 22, 4)
          out
        }
        val ident = Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++
          u32a(0L) ++ Array(channels.toByte) ++ u32a(rate) ++
          u32a(0L) ++ u32a(brNom) ++ u32a(0L) ++
          Array[Byte](0xb8.toByte, 0x01) // blocksizes 2^8/2^11, framing
        val vendor = "graft".getBytes("US-ASCII")
        val comment = Array[Byte](0x03) ++ "vorbis".getBytes("US-ASCII") ++
          u32a(vendor.length.toLong) ++ vendor ++ u32a(0L) ++ Array[Byte](1)
        val setupStub = Array[Byte](0x05) ++ "vorbis".getBytes("US-ASCII") ++
          new Array[Byte](8)
        val out = Array.newBuilder[Byte]
        out ++= page(0x02, 0L, 0, Array(ident))
        out ++= page(0x00, 0L, 1, Array(comment, setupStub))
        var f = 0
        var from = 0
        val n = payload.length
        while (f < VorbisDataPages) {
          val take = n / VorbisDataPages + (if (f < n % VorbisDataPages) 1 else 0)
          val eos = if (f == VorbisDataPages - 1) 0x04 else 0x00
          out ++= page(eos, ticksPerPage * (f + 1), 2 + f,
            Array(java.util.Arrays.copyOfRange(payload, from, from + take)))
          from += take
          f += 1
        }
        MediaRecord(id, "audio/vorbis", out.result())
      }
  }

  // ---- ZIP shard member census -------------------------------------

  /** One ZIP central-directory entry: index, member name, compression
    * method (0 = store, 8 = deflate), both sizes, and the local-header
    * offset a random-access reader seeks to.
    */
  final case class ZipMember(
      id: Long, memberIdx: Long, name: String, method: Long,
      compSize: Long, uncompSize: Long, localOff: Long)

  /** ZIP shard member census — the tar walk's sibling for the OTHER
    * shard convention (many corpus/checkpoint distributions ship
    * `.zip`, and a random-access reader wants exactly this seek
    * table).  Reads the format the way the spec says to: find the
    * end-of-central-directory record from the END (its fixed
    * signature within the last 64 KB + 22 bytes), then walk the
    * central directory it points at — never the local headers, whose
    * sizes lie when data descriptors are used.  Strict framing like
    * the tar walk: entry count and directory size must agree with the
    * EOCD, every referenced local header must carry its signature,
    * and the EOCD (+ its comment) must END the file — a truncated or
    * trailing-garbage shard fails the census rather than half-counts.
    * ZIP64 is first-class: the EOCD64 locator + record supply the
    * entry count / directory size / offset when the classic fields
    * carry their 0xFFFF / 0xFFFFFFFF markers (archives ≥ 4 GiB or
    * > 65,535 members — both real at shard scale), and per-entry
    * marker sizes/offsets resolve through the 0x0001 extra field in
    * spec order.  Markers without their ZIP64 structure are framing
    * errors.  TOTAL on arbitrary bytes: any violation yields None.
    */
  private[graft] def zipMembersOf(r: MediaRecord): Option[Seq[ZipMember]] = {
    val b = r.content
    if (b == null || b.length < 22) return None
    def u16le(off: Int): Int = (b(off) & 0xff) | (b(off + 1) & 0xff) << 8
    def u32le(off: Int): Long =
      (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
    def u64le(off: Int): Long = u32le(off) | u32le(off + 4) << 32
    // EOCD scan from the end (comment can push it up to 64 KB in)
    var eocd = -1
    var p = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xffff)
    while (eocd < 0 && p >= floor) {
      if (b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x05 && b(p + 3) == 0x06)
        eocd = p
      else p -= 1
    }
    if (eocd < 0) return None
    val nEntries16 = u16le(eocd + 10)
    if (u16le(eocd + 8) != nEntries16) return None // single-disk archive
    val cdSize32 = u32le(eocd + 12)
    val cdOff32 = u32le(eocd + 16)
    val commentLen = u16le(eocd + 20)
    if (eocd + 22 + commentLen != b.length) return None // strict framing
    // ZIP64: when the archive outgrows the classic fields (≥4 GiB, or
    // >65,535 members) they carry 0xFFFF/0xFFFFFFFF markers and the
    // real values live in the EOCD64 record, addressed by a 20-byte
    // locator that sits immediately before the EOCD.  Both shapes are
    // real at shard scale, so both walk here; markers WITHOUT a
    // locator are a framing error, not a silent zero-member census.
    val hasLocator = eocd >= 20 &&
      b(eocd - 20) == 0x50 && b(eocd - 19) == 0x4b &&
      b(eocd - 18) == 0x06 && b(eocd - 17) == 0x07
    val classicMarkers = nEntries16 == 0xffff ||
      cdSize32 == 0xffffffffL || cdOff32 == 0xffffffffL
    val (nEntries, cdSize, cdOff, cdEnd) =
      if (hasLocator) {
        val loc = eocd - 20
        if (u32le(loc + 4) != 0L) return None // disk holding the EOCD64
        if (u32le(loc + 16) != 1L) return None // total disks
        val e64 = u64le(loc + 8)
        if (e64 < 0 || e64 + 56 > loc.toLong) return None
        val p64 = e64.toInt
        if (!(b(p64) == 0x50 && b(p64 + 1) == 0x4b &&
          b(p64 + 2) == 0x06 && b(p64 + 3) == 0x06)) return None
        val recSize = u64le(p64 + 4) // size AFTER the first 12 bytes
        if (recSize < 44 || e64 + 12 + recSize != loc.toLong) return None
        if (u32le(p64 + 16) != 0L || u32le(p64 + 20) != 0L) return None // disk ids
        val n64 = u64le(p64 + 24)
        if (u64le(p64 + 32) != n64) return None // this-disk == total
        val cs = u64le(p64 + 40)
        val co = u64le(p64 + 48)
        // a classic field that is NOT the marker must agree with the
        // EOCD64's value — two readers, one truth
        if (nEntries16 != 0xffff && nEntries16.toLong != n64) return None
        if (cdSize32 != 0xffffffffL && cdSize32 != cs) return None
        if (cdOff32 != 0xffffffffL && cdOff32 != co) return None
        (n64, cs, co, e64)
      } else {
        if (classicMarkers) return None // zip64 markers need the locator
        (nEntries16.toLong, cdSize32, cdOff32, eocd.toLong)
      }
    if (nEntries < 0 || cdSize < 0 || cdOff < 0) return None
    if (cdSize > b.length.toLong || cdOff > b.length.toLong) return None
    if (cdOff + cdSize != cdEnd) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipMember]
    var off = cdOff.toInt
    var idx = 0L
    while (idx < nEntries) {
      if (off + 46 > cdEnd) return None
      if (!(b(off) == 0x50 && b(off + 1) == 0x4b &&
        b(off + 2) == 0x01 && b(off + 3) == 0x02)) return None
      val method = u16le(off + 10).toLong
      var compSize = u32le(off + 20)
      var uncompSize = u32le(off + 24)
      val nameLen = u16le(off + 28)
      val extraLen = u16le(off + 30)
      val cmtLen = u16le(off + 32)
      var localOff = u32le(off + 42)
      if (off + 46 + nameLen + extraLen + cmtLen > cdEnd) return None
      val name = new String(b, off + 46, nameLen, "UTF-8")
      if (compSize == 0xffffffffL || uncompSize == 0xffffffffL ||
        localOff == 0xffffffffL) {
        // the real values live in the 0x0001 extra field, packed in
        // spec order (uncomp, comp, local offset) with a slot ONLY for
        // each field that carries the marker
        var e = off + 46 + nameLen
        val eEnd = e + extraLen
        var found = false
        while (!found && e + 4 <= eEnd) {
          val hid = u16le(e)
          val hsz = u16le(e + 2)
          if (e + 4 + hsz > eEnd) return None
          if (hid == 0x0001) {
            var q = e + 4
            val qEnd = e + 4 + hsz
            if (uncompSize == 0xffffffffL) {
              if (q + 8 > qEnd) return None
              uncompSize = u64le(q); q += 8
            }
            if (compSize == 0xffffffffL) {
              if (q + 8 > qEnd) return None
              compSize = u64le(q); q += 8
            }
            if (localOff == 0xffffffffL) {
              if (q + 8 > qEnd) return None
              localOff = u64le(q); q += 8
            }
            found = true
          } else e += 4 + hsz
        }
        if (!found) return None // marker with no zip64 extra: framing error
        if (compSize < 0 || uncompSize < 0 || localOff < 0) return None
      }
      // the referenced local header must exist and carry its signature
      if (localOff + 30 > b.length.toLong) return None
      val lo = localOff.toInt
      if (!(b(lo) == 0x50 && b(lo + 1) == 0x4b &&
        b(lo + 2) == 0x03 && b(lo + 3) == 0x04)) return None
      out += ZipMember(r.id, idx, name, method, compSize, uncompSize, localOff)
      off += 46 + nameLen + extraLen + cmtLen
      idx += 1
    }
    if (off.toLong != cdEnd) return None // walk must land exactly on the CD end
    Some(out.toSeq)
  }

  def zipMembers(ds: Dataset[MediaRecord]): Dataset[ZipMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => zipMembersOf(r).getOrElse(Nil)))
  }

  /** Per-row ZIP shard synthesis, the [[synthesizeTarShard]] sibling:
    * `1 + id % 3` samples, each a `sK.txt` member carrying its slice
    * of the document's UTF-8 bytes plus a 1-byte `sK.cls` label
    * member — STORE method with real CRC-32s, so the output is a
    * spec-valid archive any unzip reads, while every census field
    * (names, sizes, exact local-header offsets, total byte count)
    * replays from (id, octet_length(text)) with a running sum.
    */
  def synthesizeZipShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val ns = 1 + (id % 3).toInt
        def u16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        val crc = new java.util.zip.CRC32
        val members = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
        var from = 0
        var k = 0
        while (k < ns) {
          val take = payload.length / ns + (if (k < payload.length % ns) 1 else 0)
          members += ((s"s$k.txt", java.util.Arrays.copyOfRange(payload, from, from + take)))
          from += take
          members += ((s"s$k.cls", Array(('0' + (id % 10).toInt).toByte)))
          k += 1
        }
        val out = Array.newBuilder[Byte]
        val locals = members.map { case (name, data) =>
          crc.reset(); crc.update(data)
          val nb = name.getBytes("US-ASCII")
          val off = out.knownSize.toLong
          out ++= Array[Byte](0x50, 0x4b, 0x03, 0x04) ++ u16a(20) ++ u16a(0) ++
            u16a(0) ++ u16a(0) ++ u16a(0) ++ u32a(crc.getValue) ++
            u32a(data.length.toLong) ++ u32a(data.length.toLong) ++
            u16a(nb.length) ++ u16a(0) ++ nb ++ data
          (name, data, crc.getValue, off)
        }.toSeq
        // odd ids ship the ZIP64 shape: per-entry marker sizes/offsets
        // resolved through the 0x0001 extra field, EOCD64 record +
        // locator, and all-marker classic EOCD fields — the wire form
        // of a ≥4 GiB / >65k-member shard, synthesized small (markers,
        // not real 4 GiB payloads).  The member TABLE is identical to
        // the classic arm's, so the oracle arithmetic never forks.
        val zip64 = id % 2 == 1
        def u64a(v: Long) = u32a(v & 0xffffffffL) ++ u32a(v >>> 32)
        val cdOff = out.knownSize.toLong
        locals.foreach { case (name, data, c, off) =>
          val nb = name.getBytes("US-ASCII")
          val extra =
            if (zip64) u16a(0x0001) ++ u16a(24) ++
              u64a(data.length.toLong) ++ u64a(data.length.toLong) ++ u64a(off)
            else Array.emptyByteArray
          val (csz, usz, lof) =
            if (zip64) (0xffffffffL, 0xffffffffL, 0xffffffffL)
            else (data.length.toLong, data.length.toLong, off)
          out ++= Array[Byte](0x50, 0x4b, 0x01, 0x02) ++ u16a(20) ++
            u16a(if (zip64) 45 else 20) ++
            u16a(0) ++ u16a(0) ++ u16a(0) ++ u16a(0) ++ u32a(c) ++
            u32a(csz) ++ u32a(usz) ++
            u16a(nb.length) ++ u16a(extra.length) ++ u16a(0) ++ u16a(0) ++
            u16a(0) ++ u32a(0L) ++ u32a(lof) ++ nb ++ extra
        }
        val cdSize = out.knownSize.toLong - cdOff
        if (zip64) {
          val e64Off = out.knownSize.toLong
          out ++= Array[Byte](0x50, 0x4b, 0x06, 0x06) ++ u64a(44L) ++
            u16a(45) ++ u16a(45) ++ u32a(0L) ++ u32a(0L) ++
            u64a(locals.length.toLong) ++ u64a(locals.length.toLong) ++
            u64a(cdSize) ++ u64a(cdOff)
          out ++= Array[Byte](0x50, 0x4b, 0x06, 0x07) ++ u32a(0L) ++
            u64a(e64Off) ++ u32a(1L)
          out ++= Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ u16a(0) ++ u16a(0) ++
            u16a(0xffff) ++ u16a(0xffff) ++
            u32a(0xffffffffL) ++ u32a(0xffffffffL) ++ u16a(0)
        } else {
          out ++= Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ u16a(0) ++ u16a(0) ++
            u16a(locals.length) ++ u16a(locals.length) ++
            u32a(cdSize) ++ u32a(cdOff) ++ u16a(0)
        }
        MediaRecord(id, "application/zip", out.result())
      }
  }

  // ---- GGUF checkpoint census ---------------------------------------

  /** One GGUF tensor: index, name, ggml type id, rank, element count,
    * the offset RELATIVE to the tensor-data region (what the header
    * stores), the absolute seek position, and the exact byte span.
    */
  final case class GgufTensor(
      id: Long, tensorIdx: Long, name: String, typeId: Long, nDims: Long,
      nElements: Long, relOffset: Long, absOffset: Long, nTensorBytes: Long,
      kvCount: Long)

  /** Byte width per element for the unquantized ggml types this
    * census supports (F32, F16 — quantized block types need a
    * block-size table and are rejected, not guessed).
    */
  private val GgufTypeSize: Map[Long, Long] = Map(0L -> 4L, 1L -> 2L)

  /** GGUF checkpoint census — the third checkpoint-lake surface next
    * to safetensors and .npy, and the format the llama.cpp ecosystem
    * distributes models in: header (magic/version/counts), the
    * metadata KV walk (strings, numerics, arrays — skipped by their
    * own declared types, never decoded into objects), then one row
    * per tensor info with name/type/rank/element count and the EXACT
    * byte span — the alignment rule (offsets are multiples of
    * `general.alignment`, default 32) comes from the file's own
    * metadata.  No weight bytes are read.  Strict framing: every
    * tensor span must land inside the file and the LAST span must end
    * exactly at EOF.
    */
  private[graft] def ggufTensorsOf(r: MediaRecord): Option[Seq[GgufTensor]] = {
    val b = r.content
    if (b == null || b.length < 24) return None
    def u32le(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
      (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
    def u64le(o: Int): Long = u32le(o) | u32le(o + 4) << 32
    if (!(b(0) == 'G' && b(1) == 'G' && b(2) == 'U' && b(3) == 'F')) return None
    if (u32le(4) != 3L) return None // GGUF v3
    val nTensors = u64le(8)
    val nKv = u64le(16)
    if (nTensors < 0 || nTensors > 1000000L) return None
    if (nKv < 0 || nKv > 1000000L) return None
    var off = 24L
    def readString(): String = {
      if (off + 8 > b.length.toLong) return null
      val len = u64le(off.toInt)
      if (len < 0 || off + 8 + len > b.length.toLong) return null
      val s = new String(b, off.toInt + 8, len.toInt, "UTF-8")
      off += 8 + len
      s
    }
    // scalar byte widths per GGUF metadata value type id
    val scalar = Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L,
      5L -> 4L, 6L -> 4L, 7L -> 1L, 10L -> 8L, 11L -> 8L, 12L -> 8L)
    var alignment = 32L // the spec default; general.alignment overrides
    def skipValue(tpe: Long, keyForAlign: String): Boolean = tpe match {
      case 8L => readString() != null
      case 9L => // array: elem type + count + payload
        if (off + 12 > b.length.toLong) return false
        val et = u32le(off.toInt)
        val n = u64le(off.toInt + 4)
        off += 12
        if (n < 0 || n > 10000000L) return false
        if (et == 8L) {
          var i = 0L
          while (i < n) { if (readString() == null) return false; i += 1 }
          true
        } else scalar.get(et) match {
          case Some(w) =>
            if (off + w * n > b.length.toLong) false
            else { off += w * n; true }
          case None => false
        }
      case t => scalar.get(t) match {
        case Some(w) =>
          if (off + w > b.length.toLong) false
          else {
            if (keyForAlign == "general.alignment" && (t == 4L || t == 5L)) {
              val a = u32le(off.toInt)
              if (a > 0 && (a & (a - 1)) == 0) alignment = a // power of two
            }
            off += w
            true
          }
        case None => false
      }
    }
    var k = 0L
    while (k < nKv) {
      val key = readString()
      if (key == null) return None
      if (off + 4 > b.length.toLong) return None
      val tpe = u32le(off.toInt)
      off += 4
      if (!skipValue(tpe, key)) return None
      k += 1
    }
    val infos = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
    var t = 0L
    while (t < nTensors) {
      val name = readString()
      if (name == null) return None
      if (off + 4 > b.length.toLong) return None
      val nDims = u32le(off.toInt)
      off += 4
      if (nDims < 1 || nDims > 8) return None
      var nElems = 1L
      var d = 0
      while (d < nDims) {
        if (off + 8 > b.length.toLong) return None
        val dim = u64le(off.toInt)
        if (dim <= 0) return None
        // crafted u64 dims can overflow Long so the later nBytes
        // wraps small and slips past the strict-framing check while
        // the reported counts are garbage — multiplyExact makes the
        // overflow a rejection instead of a wrong census row
        try nElems = Math.multiplyExact(nElems, dim)
        catch { case _: ArithmeticException => return None }
        off += 8
        d += 1
      }
      if (off + 12 > b.length.toLong) return None
      val typeId = u32le(off.toInt)
      val relOff = u64le(off.toInt + 4)
      off += 12
      val width = GgufTypeSize.getOrElse(typeId, return None)
      if (relOff % alignment != 0) return None
      infos += ((name, nDims, nElems, typeId, relOff))
      t += 1
    }
    val dataStart = (off + alignment - 1) / alignment * alignment
    val out = infos.zipWithIndex.map { case ((name, nDims, nElems, typeId, relOff), i) =>
      val nBytes =
        try Math.multiplyExact(nElems, GgufTypeSize(typeId))
        catch { case _: ArithmeticException => return None }
      if (nBytes > b.length.toLong || relOff > b.length.toLong ||
        dataStart + relOff + nBytes > b.length.toLong) return None
      GgufTensor(r.id, i.toLong, name, typeId, nDims, nElems, relOff,
        dataStart + relOff, nBytes, nKv)
    }
    // strict framing: the furthest span must end exactly at EOF
    val end = out.map(x => x.absOffset + x.nTensorBytes).maxOption.getOrElse(dataStart)
    if (end != b.length.toLong) return None
    Some(out.toSeq)
  }

  def ggufTensors(ds: Dataset[MediaRecord]): Dataset[GgufTensor] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => ggufTensorsOf(r).getOrElse(Nil)))
  }

  /** Per-row GGUF v3 synthesis: two metadata KVs (architecture string
    * + the explicit 32-byte alignment), `1 + id % 3` tensors
    * `blk.<t>.weight` with dims `(1 + (id+t) % 8) × (1 + (id+t) % 16)`
    * alternating F32/F16, zero weight bytes at 32-aligned offsets —
    * every census field replays from id arithmetic.
    */
  def synthesizeGguf(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val nt = 1 + (id % 3).toInt
      def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      def u64a(v: Long) = u32a(v & 0xffffffffL) ++ u32a(v >>> 32)
      def str(s: String): Array[Byte] = {
        val sb = s.getBytes("UTF-8"); u64a(sb.length.toLong) ++ sb
      }
      val out = Array.newBuilder[Byte]
      out ++= "GGUF".getBytes("US-ASCII") ++ u32a(3L) ++
        u64a(nt.toLong) ++ u64a(2L)
      out ++= str("general.architecture") ++ u32a(8L) ++ str("llama")
      out ++= str("general.alignment") ++ u32a(4L) ++ u32a(32L)
      var rel = 0L
      val spans = (0 until nt).map { t =>
        val d0 = 1L + (id + t) % 8
        val d1 = 1L + (id + t) % 16
        val typeId = (id + t) % 2
        val nBytes = d0 * d1 * (4L - 2L * typeId)
        out ++= str(s"blk.$t.weight") ++ u32a(2L) ++ u64a(d0) ++ u64a(d1) ++
          u32a(typeId) ++ u64a(rel)
        val mine = rel
        rel = (rel + nBytes + 31) / 32 * 32
        (mine, nBytes)
      }
      val headerLen = out.knownSize.toLong
      val dataStart = (headerLen + 31) / 32 * 32
      out ++= new Array[Byte]((dataStart - headerLen).toInt)
      val (lastOff, lastBytes) = spans.last
      out ++= new Array[Byte]((lastOff + lastBytes).toInt)
      MediaRecord(id, "application/x-gguf", out.result())
    }
  }

  // ---- Avro object-container census --------------------------------

  /** One Avro data block: index, record count, serialized byte size,
    * the block's absolute offset, and the file's codec.
    */
  final case class AvroBlock(
      id: Long, blockIdx: Long, nRecords: Long, dataSize: Long,
      offset: Long, codec: String)

  /** Decode one Avro zigzag varint long at `off`; returns
    * (value, bytesConsumed) or null on malformed/truncated input.
    */
  private[graft] def avroVarLong(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = off
    while (i < b.length && shift <= 63) {
      val x = b(i) & 0xff
      v |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) {
        return ((v >>> 1) ^ -(v & 1L), i - off + 1) // zigzag decode
      }
      shift += 7
      i += 1
    }
    null
  }

  /** Avro object-container census — the fourth lake format in the
    * shard family (tar, zip, TFRecord, Avro): parse the header's
    * metadata map for the codec, then walk the data blocks —
    * `varint record-count + varint byte-size + data + 16-byte sync` —
    * VERIFYING every block's sync marker against the header's (the
    * format's own corruption seal, the CRC discipline's sibling).
    * Record counts come from the framing, so the census never decodes
    * a record.  Strict framing: the walk must end exactly at EOF.
    */
  /** Parsed Avro container header: codec, the writer schema JSON, the
    * offset of the 16-byte sync marker, and the first block's offset.
    */
  private[graft] final case class AvroHeader(
      codec: String, schemaJson: String, syncOff: Int, firstBlockOff: Int)

  /** Walk an Avro object-container header — magic, metadata map (codec
    * + writer schema captured), sync marker.  Shared by the block
    * census and the Iceberg manifest decoder.  None on any framing
    * violation.
    */
  private[graft] def avroHeaderOf(b: Array[Byte]): Option[AvroHeader] = {
    if (b == null || b.length < 4 + 1 + 16) return None
    if (!(b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1)) return None
    var off = 4
    var codec = "null"
    var schema = ""
    // metadata map: blocks of (count, count × (string key, bytes val)),
    // a 0 count terminates; negative counts (count + size form) allowed
    var done = false
    while (!done) {
      val c = avroVarLong(b, off)
      if (c == null) return None
      off += c._2
      var n = c._1
      if (n == 0L) done = true
      else {
        if (n < 0L) { // negative count: a byte size varint follows
          n = -n
          val sz = avroVarLong(b, off)
          if (sz == null) return None
          off += sz._2
        }
        if (n > 1000000L) return None
        var e = 0L
        while (e < n) {
          val kl = avroVarLong(b, off)
          if (kl == null || kl._1 < 0 || kl._1 > b.length.toLong) return None
          off += kl._2
          if (off + kl._1 > b.length.toLong) return None
          val key = new String(b, off, kl._1.toInt, "UTF-8")
          off += kl._1.toInt
          val vl = avroVarLong(b, off)
          if (vl == null || vl._1 < 0 || vl._1 > b.length.toLong) return None
          off += vl._2
          if (off + vl._1 > b.length.toLong) return None
          if (key == "avro.codec")
            codec = new String(b, off, vl._1.toInt, "UTF-8")
          else if (key == "avro.schema")
            schema = new String(b, off, vl._1.toInt, "UTF-8")
          off += vl._1.toInt
          e += 1
        }
      }
    }
    if (off + 16 > b.length) return None
    Some(AvroHeader(codec, schema, off, off + 16))
  }

  private[graft] def avroBlocksOf(r: MediaRecord): Option[Seq[AvroBlock]] = {
    val b = r.content
    val hdr = avroHeaderOf(b).getOrElse(return None)
    val codec = hdr.codec
    val syncOff = hdr.syncOff
    var off = hdr.firstBlockOff
    val out = scala.collection.mutable.ArrayBuffer.empty[AvroBlock]
    var idx = 0L
    while (off < b.length) {
      val blockOff = off.toLong
      val cnt = avroVarLong(b, off)
      if (cnt == null || cnt._1 <= 0L) return None
      off += cnt._2
      val sz = avroVarLong(b, off)
      if (sz == null || sz._1 < 0L) return None
      off += sz._2
      // bound AFTER advancing past the varint — checking against the
      // pre-advance offset lets off + size overrun by the varint width
      if (sz._1 > (b.length - off).toLong) return None
      off += sz._1.toInt
      if (off + 16 > b.length) return None
      var i = 0
      while (i < 16) { // the sync seal: must equal the header's
        if (b(off + i) != b(syncOff + i)) return None
        i += 1
      }
      off += 16
      out += AvroBlock(r.id, idx, cnt._1, sz._1, blockOff, codec)
      idx += 1
    }
    if (off != b.length) return None
    Some(out.toSeq)
  }

  def avroBlocks(ds: Dataset[MediaRecord]): Dataset[AvroBlock] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => avroBlocksOf(r).getOrElse(Nil)))
  }

  /** Per-row Avro container synthesis: a `"bytes"`-schema file with
    * `1 + id % 3` blocks, each holding ONE record carrying its slice
    * of the document's UTF-8 bytes (varint-length-prefixed, so the
    * output is a spec-valid Avro file), null codec, sync marker
    * derived from the id — the whole block table INCLUDING varint
    * widths replays from (id, octet_length(text)).
    */
  def synthesizeAvro(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val ns = 1 + (id % 3).toInt
        def zig(v: Long): Array[Byte] = {
          var z = (v << 1) ^ (v >> 63)
          val out = Array.newBuilder[Byte]
          while ((z & ~0x7fL) != 0L) { out += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
          out += z.toByte
          out.result()
        }
        def str(s: String): Array[Byte] = {
          val sb = s.getBytes("UTF-8"); zig(sb.length.toLong) ++ sb
        }
        val sync = new Array[Byte](16)
        var i = 0
        while (i < 16) { sync(i) = ((id * 31 + i * 7 + 13) & 0xff).toByte; i += 1 }
        val out = Array.newBuilder[Byte]
        out ++= Array[Byte]('O', 'b', 'j', 1)
        out ++= zig(2L) // metadata map: one block of two entries
        out ++= str("avro.codec"); out ++= str("null")
        out ++= str("avro.schema"); out ++= str("\"bytes\"")
        out ++= zig(0L) // map terminator
        out ++= sync
        var from = 0
        var k = 0
        while (k < ns) {
          val take = payload.length / ns + (if (k < payload.length % ns) 1 else 0)
          val record = zig(take.toLong) ++
            java.util.Arrays.copyOfRange(payload, from, from + take)
          out ++= zig(1L)                    // records in this block
          out ++= zig(record.length.toLong)  // serialized size
          out ++= record
          out ++= sync
          from += take
          k += 1
        }
        MediaRecord(id, "avro/binary", out.result())
      }
  }

  // ---- Iceberg manifest census --------------------------------------

  /** One Iceberg manifest entry — the lakehouse's second open format
    * next to the Delta-log replay: status (0 = EXISTING, 1 = ADDED,
    * 2 = DELETED), the owning snapshot (-1 when the schema's nullable
    * union carried null — inherited snapshots), and the data file's
    * path / format / row and byte counts.
    */
  /** One (field-id → long) stats entry from a manifest's kv-array
    * collections (column_sizes, value_counts, …).  Key first so
    * `map_from_entries` applies directly at the query layer.
    */
  final case class IcebergKvLong(k: Long, v: Long)

  /** One (field-id → bytes) bound from lower_bounds/upper_bounds,
    * hex-encoded — bound bytes are type-tagged by the table schema,
    * which the census does not interpret (the planner layer does).
    */
  final case class IcebergKvBytes(k: Long, hex: String)

  final case class IcebergManifestEntry(
      id: Long, entryIdx: Long, status: Long, snapshotId: Long,
      filePath: String, fileFormat: String, recordCount: Long,
      fileSizeInBytes: Long, content: Long,
      sequenceNumber: Long = -1L, equalityIds: String = "",
      columnSizes: Seq[IcebergKvLong] = Nil,
      valueCounts: Seq[IcebergKvLong] = Nil,
      lowerBounds: Seq[IcebergKvBytes] = Nil,
      nullValueCounts: Seq[IcebergKvLong] = Nil,
      upperBounds: Seq[IcebergKvBytes] = Nil,
      partitionJson: String = "",
      referencedDataFile: String = "",
      contentOffset: Long = -1L,
      contentSizeInBytes: Long = -1L)

  // ---- minimal Avro schema model (schema-DRIVEN record decode) -----
  // Enough of the Avro type system to SKIP any field the census does
  // not extract — that is what makes the manifest decoder accept
  // production schemas (partition structs, column stats, v2 delete
  // entries) instead of gating on one exact schema string.
  private[graft] sealed trait AvType
  private[graft] case object AvNull extends AvType
  private[graft] case object AvBool extends AvType
  private[graft] case object AvInt extends AvType
  private[graft] case object AvLong extends AvType
  private[graft] case object AvFloat extends AvType
  private[graft] case object AvDouble extends AvType
  private[graft] case object AvBytes extends AvType
  private[graft] case object AvString extends AvType
  private[graft] case object AvEnum extends AvType
  private[graft] final case class AvFixed(size: Int) extends AvType
  private[graft] final case class AvArray(items: AvType) extends AvType
  private[graft] final case class AvMap(values: AvType) extends AvType
  private[graft] final case class AvUnion(branches: Vector[AvType])
    extends AvType
  private[graft] final case class AvRecord(
      name: String, fields: Vector[(String, AvType)]) extends AvType

  /** Parse an Avro schema JSON (a container header's writer schema)
    * into the model above: primitives, named-type back-references
    * (record/fixed/enum), unions, arrays, maps, and `{"type": prim,
    * "logicalType": ...}` wrappers (wire format is the underlying
    * type's, so logical types are ignored).  None on malformed or
    * unsupported input — never a throw.
    */
  private[graft] def parseAvroSchema(json: String): Option[AvType] = {
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return None }
    if (root == null) return None
    val named = scala.collection.mutable.HashMap.empty[String, AvType]
    def register(node: JsonNode, ns: String, t: AvType): Unit = {
      val nm = Option(node.get("name")).map(_.asText).getOrElse("")
      if (nm.nonEmpty) {
        val ons = Option(node.get("namespace")).map(_.asText).getOrElse(ns)
        named(nm) = t
        if (ons.nonEmpty && !nm.contains(".")) named(ons + "." + nm) = t
      }
    }
    def parse(node: JsonNode, ns: String, depth: Int): Option[AvType] = {
      if (node == null || depth > 32) return None
      if (node.isTextual) {
        node.asText match {
          case "null" => Some(AvNull)
          case "boolean" => Some(AvBool)
          case "int" => Some(AvInt)
          case "long" => Some(AvLong)
          case "float" => Some(AvFloat)
          case "double" => Some(AvDouble)
          case "bytes" => Some(AvBytes)
          case "string" => Some(AvString)
          case ref =>
            named.get(ref).orElse(
              if (ns.nonEmpty && !ref.contains("."))
                named.get(ns + "." + ref)
              else None)
        }
      } else if (node.isArray) {
        val bs = Vector.newBuilder[AvType]
        val it = node.elements()
        var n = 0
        while (it.hasNext) {
          bs += parse(it.next(), ns, depth + 1).getOrElse(return None)
          n += 1
          if (n > 64) return None
        }
        val v = bs.result()
        if (v.isEmpty) None else Some(AvUnion(v))
      } else if (node.isObject) {
        val tNode = node.get("type")
        if (tNode == null) return None
        if (!tNode.isTextual) return parse(tNode, ns, depth + 1)
        tNode.asText match {
          case "record" | "error" =>
            val rns =
              Option(node.get("namespace")).map(_.asText).getOrElse(ns)
            val fieldsNode = node.get("fields")
            if (fieldsNode == null || !fieldsNode.isArray) return None
            val fs = Vector.newBuilder[(String, AvType)]
            val it = fieldsNode.elements()
            var n = 0
            while (it.hasNext) {
              val f = it.next()
              val fname =
                Option(f.get("name")).map(_.asText).getOrElse(return None)
              val ft = parse(f.get("type"), rns, depth + 1)
                .getOrElse(return None)
              fs += ((fname, ft))
              n += 1
              if (n > 1000) return None
            }
            val nm = Option(node.get("name")).map(_.asText).getOrElse("")
            val rec = AvRecord(nm, fs.result())
            register(node, ns, rec)
            Some(rec)
          case "fixed" =>
            val sz = Option(node.get("size")).map(_.asInt(-1)).getOrElse(-1)
            if (sz < 0 || sz > (1 << 24)) return None
            val fx = AvFixed(sz)
            register(node, ns, fx)
            Some(fx)
          case "enum" =>
            register(node, ns, AvEnum)
            Some(AvEnum)
          case "array" => parse(node.get("items"), ns, depth + 1).map(AvArray)
          case "map" => parse(node.get("values"), ns, depth + 1).map(AvMap)
          case prim => // {"type":"long","logicalType":"..."} wrappers
            parse(mapper.getNodeFactory.textNode(prim), ns, depth + 1)
        }
      } else None
    }
    parse(root, "", 0)
  }

  /** Skip the array/map block framing shared by both collection
    * types: positive count = that many items (decoded via `item`);
    * negative count = spec's size-prefixed block, skipped wholesale.
    */
  private def avSkipBlocks(
      d: Array[Byte], p0: Int, end: Int,
      item: Int => Option[Int]): Option[Int] = {
    var p = p0
    var blocks = 0
    while (blocks < 1000000) {
      val c = avroVarLong(d, p)
      if (c == null) return None
      p += c._2
      var n = c._1
      if (n == 0) return Some(p)
      blocks += 1
      if (n < 0) { // size-prefixed block: skip without item decode
        n = -n
        val sz = avroVarLong(d, p)
        if (sz == null || sz._1 < 0 || sz._1 > (end - (p + sz._2)).toLong)
          return None
        p += sz._2 + sz._1.toInt
      } else {
        if (n > 10000000) return None
        var i = 0L
        while (i < n) {
          p = item(p).getOrElse(return None)
          i += 1
        }
      }
    }
    None
  }

  /** Skip ONE value of type `t` at `p0` — the workhorse that lets the
    * manifest decoder walk fields it does not extract.  Bounded by
    * `end`; None on any overrun or malformed framing.
    */
  private[graft] def avSkipValue(
      t: AvType, d: Array[Byte], p0: Int, end: Int,
      depth: Int = 0): Option[Int] = {
    if (depth > 32 || p0 > end) return None
    t match {
      case AvNull => Some(p0)
      case AvBool => if (p0 + 1 <= end) Some(p0 + 1) else None
      case AvInt | AvLong | AvEnum =>
        val v = avroVarLong(d, p0)
        if (v == null || p0 + v._2 > end) None else Some(p0 + v._2)
      case AvFloat => if (p0 + 4 <= end) Some(p0 + 4) else None
      case AvDouble => if (p0 + 8 <= end) Some(p0 + 8) else None
      case AvBytes | AvString =>
        val v = avroVarLong(d, p0)
        if (v == null || v._1 < 0 ||
          v._1 > (end - (p0 + v._2)).toLong) None
        else Some(p0 + v._2 + v._1.toInt)
      case AvFixed(n) => if (p0 + n <= end) Some(p0 + n) else None
      case AvUnion(bs) =>
        val v = avroVarLong(d, p0)
        if (v == null || v._1 < 0 || v._1 >= bs.length) None
        else avSkipValue(bs(v._1.toInt), d, p0 + v._2, end, depth + 1)
      case AvRecord(_, fs) =>
        var p = p0
        for ((_, ft) <- fs)
          p = avSkipValue(ft, d, p, end, depth + 1).getOrElse(return None)
        Some(p)
      case AvArray(items) =>
        avSkipBlocks(d, p0, end,
          pp => avSkipValue(items, d, pp, end, depth + 1))
      case AvMap(values) =>
        avSkipBlocks(d, p0, end, pp =>
          avSkipValue(AvString, d, pp, end, depth + 1)
            .flatMap(p2 => avSkipValue(values, d, p2, end, depth + 1)))
    }
  }

  /** Read an int/long-shaped field, unwrapping a null union branch:
    * (Some(value) | None-for-null, new position).
    */
  private def avReadLongish(
      t: AvType, d: Array[Byte], p0: Int,
      end: Int): Option[(Option[Long], Int)] = t match {
    case AvInt | AvLong =>
      val v = avroVarLong(d, p0)
      if (v == null || p0 + v._2 > end) None
      else Some((Some(v._1), p0 + v._2))
    case AvUnion(bs) =>
      val br = avroVarLong(d, p0)
      if (br == null || br._1 < 0 || br._1 >= bs.length) None
      else bs(br._1.toInt) match {
        case AvNull => Some((None, p0 + br._2))
        case b => avReadLongish(b, d, p0 + br._2, end)
      }
    case _ => None
  }

  /** Read an array-of-int/long field (Iceberg's `equality_ids`
    * shape), unwrapping a null union branch: (Some(values) |
    * None-for-null, new position).  Walks the spec's block framing
    * including size-prefixed negative-count blocks — the values are
    * wanted either way.
    */
  private def avReadLongArrayish(
      t: AvType, d: Array[Byte], p0: Int,
      end: Int): Option[(Option[Vector[Long]], Int)] = t match {
    case AvArray(it) if it == AvInt || it == AvLong =>
      val out = Vector.newBuilder[Long]
      var p = p0
      var blocks = 0
      var done = false
      while (!done && blocks < 1000000) {
        val c = avroVarLong(d, p)
        if (c == null || p + c._2 > end) return None
        p += c._2
        var n = c._1
        if (n == 0) done = true
        else {
          blocks += 1
          if (n < 0) {
            n = -n
            val sz = avroVarLong(d, p)
            if (sz == null || sz._1 < 0 ||
              sz._1 > (end - (p + sz._2)).toLong) return None
            p += sz._2
          }
          if (n > 1000000) return None // equality_ids is a column list
          var i = 0L
          while (i < n) {
            val v = avroVarLong(d, p)
            if (v == null || p + v._2 > end) return None
            out += v._1
            p += v._2
            i += 1
          }
        }
      }
      if (!done) None else Some((Some(out.result()), p))
    case AvUnion(bs) =>
      val br = avroVarLong(d, p0)
      if (br == null || br._1 < 0 || br._1 >= bs.length) None
      else bs(br._1.toInt) match {
        case AvNull => Some((None, p0 + br._2))
        case b => avReadLongArrayish(b, d, p0 + br._2, end)
      }
    case _ => None
  }

  /** Read a kv-array field (Iceberg's column_sizes/value_counts/
    * bounds shape: nullable array of record{key:int, value:long|bytes}),
    * unwrapping the null union branch.  The item record is walked
    * schema-driven — extra fields skip by wire type.  `bytesValue`
    * selects the bounds flavor (value captured as raw bytes).
    */
  private def avReadKvArrayish(
      t: AvType, d: Array[Byte], p0: Int, end: Int,
      bytesValue: Boolean): Option[(Option[Vector[(Long, Long, Array[Byte])]], Int)] = t match {
    case AvArray(rec: AvRecord) =>
      val out = Vector.newBuilder[(Long, Long, Array[Byte])]
      var p = p0
      var blocks = 0
      var done = false
      while (!done && blocks < 1000000) {
        val c = avroVarLong(d, p)
        if (c == null || p + c._2 > end) return None
        p += c._2
        var n = c._1
        if (n == 0) done = true
        else {
          blocks += 1
          if (n < 0) {
            n = -n
            val sz = avroVarLong(d, p)
            if (sz == null || sz._1 < 0 ||
              sz._1 > (end - (p + sz._2)).toLong) return None
            p += sz._2
          }
          if (n > 1000000) return None // per-column stats, not data
          var i = 0L
          while (i < n) {
            var key = Long.MinValue
            var lv = 0L
            var bv: Array[Byte] = Array.emptyByteArray
            for ((fn, ft) <- rec.fields) fn match {
              case "key" =>
                val v = avReadLongish(ft, d, p, end).getOrElse(return None)
                key = v._1.getOrElse(return None)
                p = v._2
              case "value" if !bytesValue =>
                val v = avReadLongish(ft, d, p, end).getOrElse(return None)
                lv = v._1.getOrElse(return None)
                p = v._2
              case "value" =>
                // bytes value, possibly union-wrapped; anything else
                // is not a bounds collection — reject, never misparse
                def readBytes(bt: AvType, q0: Int): Option[(Array[Byte], Int)] =
                  bt match {
                    case AvBytes | AvString | AvFixed(_) =>
                      bt match {
                        case AvFixed(fn2) =>
                          if (q0 + fn2 > end) None
                          else Some((java.util.Arrays.copyOfRange(
                            d, q0, q0 + fn2), q0 + fn2))
                        case _ =>
                          val l = avroVarLong(d, q0)
                          if (l == null || l._1 < 0 ||
                            l._1 > (end - (q0 + l._2)).toLong) None
                          else Some((java.util.Arrays.copyOfRange(
                            d, q0 + l._2, q0 + l._2 + l._1.toInt),
                            q0 + l._2 + l._1.toInt))
                      }
                    case AvUnion(ubs) =>
                      val ub = avroVarLong(d, q0)
                      if (ub == null || ub._1 < 0 || ub._1 >= ubs.length)
                        None
                      else readBytes(ubs(ub._1.toInt), q0 + ub._2)
                    case _ => None
                  }
                val r = readBytes(ft, p).getOrElse(return None)
                bv = r._1
                p = r._2
              case _ =>
                p = avSkipValue(ft, d, p, end).getOrElse(return None)
            }
            if (key == Long.MinValue) return None
            out += ((key, lv, bv))
            i += 1
          }
        }
      }
      if (!done) None else Some((Some(out.result()), p))
    case AvUnion(bs) =>
      val br = avroVarLong(d, p0)
      if (br == null || br._1 < 0 || br._1 >= bs.length) None
      else bs(br._1.toInt) match {
        case AvNull => Some((None, p0 + br._2))
        case b => avReadKvArrayish(b, d, p0 + br._2, end, bytesValue)
      }
    case _ => None
  }

  /** Render ONE Avro value as JSON text (primitives, null-unions,
    * nested records to a small depth) — the generic partition
    * -struct decode: partition specs differ per table, so the census
    * surfaces the struct as a JSON object string and leaves typed
    * interpretation to the planner holding the spec.  Unrenderable
    * shapes (maps, deep nesting) yield None — reject, never garble.
    */
  private[graft] def avJsonValue(
      t: AvType, d: Array[Byte], p0: Int, end: Int,
      depth: Int = 0): Option[(String, Int)] = {
    if (depth > 8 || p0 > end) return None
    t match {
      case AvNull => Some(("null", p0))
      case AvBool =>
        if (p0 + 1 > end) None
        else Some((if (d(p0) != 0) "true" else "false", p0 + 1))
      case AvInt | AvLong =>
        val v = avroVarLong(d, p0)
        if (v == null || p0 + v._2 > end) None
        else Some((v._1.toString, p0 + v._2))
      case AvFloat =>
        if (p0 + 4 > end) None
        else {
          var bits = 0
          var i = 3
          while (i >= 0) { bits = (bits << 8) | (d(p0 + i) & 0xff); i -= 1 }
          Some((java.lang.Float.intBitsToFloat(bits).toString, p0 + 4))
        }
      case AvDouble =>
        if (p0 + 8 > end) None
        else {
          var bits = 0L
          var i = 7
          while (i >= 0) { bits = (bits << 8) | (d(p0 + i) & 0xffL); i -= 1 }
          Some((java.lang.Double.longBitsToDouble(bits).toString, p0 + 8))
        }
      case AvString =>
        val v = avroVarLong(d, p0)
        if (v == null || v._1 < 0 || v._1 > (end - (p0 + v._2)).toLong) None
        else {
          val s = new String(d, p0 + v._2, v._1.toInt, "UTF-8")
          Some(("\"" + avJsonEscape(s) + "\"", p0 + v._2 + v._1.toInt))
        }
      case AvBytes =>
        val v = avroVarLong(d, p0)
        if (v == null || v._1 < 0 || v._1 > (end - (p0 + v._2)).toLong) None
        else Some(("\"" + (0 until v._1.toInt).map(i =>
          f"${d(p0 + v._2 + i) & 0xff}%02x").mkString + "\"",
          p0 + v._2 + v._1.toInt))
      case AvFixed(n) =>
        if (p0 + n > end) None
        else Some(("\"" + (0 until n).map(i =>
          f"${d(p0 + i) & 0xff}%02x").mkString + "\"", p0 + n))
      case AvUnion(bs) =>
        val br = avroVarLong(d, p0)
        if (br == null || br._1 < 0 || br._1 >= bs.length) None
        else avJsonValue(bs(br._1.toInt), d, p0 + br._2, end, depth + 1)
      case AvRecord(_, fs) =>
        var p = p0
        val parts = Seq.newBuilder[String]
        for ((fn, ft) <- fs) {
          val v = avJsonValue(ft, d, p, end, depth + 1).getOrElse(return None)
          // field names come from the untrusted embedded writer
          // schema — escape them like string VALUES, or a quote /
          // control char in a name garbles the promised-valid JSON
          parts += "\"" + avJsonEscape(fn) + "\":" + v._1
          p = v._2
        }
        Some(("{" + parts.result().mkString(",") + "}", p))
      case _ => None // maps/enums: not a partition-struct shape
    }
  }

  /** JSON string-body escaping shared by [[avJsonValue]]'s string
    * values and record field names — both originate in the untrusted
    * embedded writer schema / data, so both must escape identically.
    */
  private[graft] def avJsonEscape(s: String): String = {
    // fast path: almost every real string needs no escaping, and the
    // per-char flatMap allocation showed up in the Hudi log-record
    // decode (millions of strings per log file) — scan first, build
    // only when something actually needs escaping
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') clean = false
      i += 1
    }
    if (clean) s
    else s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  }

  /** Read a string-shaped field, unwrapping a null union branch. */
  private def avReadStringish(
      t: AvType, d: Array[Byte], p0: Int,
      end: Int): Option[(Option[String], Int)] = t match {
    case AvString | AvBytes =>
      val v = avroVarLong(d, p0)
      if (v == null || v._1 < 0 ||
        v._1 > (end - (p0 + v._2)).toLong) None
      else Some((Some(new String(d, p0 + v._2, v._1.toInt, "UTF-8")),
        p0 + v._2 + v._1.toInt))
    case AvUnion(bs) =>
      val br = avroVarLong(d, p0)
      if (br == null || br._1 < 0 || br._1 >= bs.length) None
      else bs(br._1.toInt) match {
        case AvNull => Some((None, p0 + br._2))
        case b => avReadStringish(b, d, p0 + br._2, end)
      }
    case _ => None
  }

  /** The v1 manifest-entry subset schema the v1 synthesizer writes —
    * the fields every Iceberg planner starts from (status, snapshot,
    * path, format, row count, byte size).  The DECODER no longer
    * gates on this string: it parses whatever writer schema the
    * header carries and walks by it ([[parseAvroSchema]]).
    */
  private[graft] val IcebergManifestSchema: String =
    """{"type":"record","name":"manifest_entry","fields":[""" +
      """{"name":"status","type":"int","field-id":0},""" +
      """{"name":"snapshot_id","type":["null","long"],"field-id":1},""" +
      """{"name":"data_file","type":{"type":"record","name":"r2","fields":[""" +
      """{"name":"file_path","type":"string","field-id":100},""" +
      """{"name":"file_format","type":"string","field-id":101},""" +
      """{"name":"record_count","type":"long","field-id":103},""" +
      """{"name":"file_size_in_bytes","type":"long","field-id":104}]},""" +
      """"field-id":2}]}"""

  /** Inflate one raw-DEFLATE span (RFC 1951, no zlib wrapper — Avro's
    * `deflate` codec frames blocks this way) with a bomb guard; None
    * on corrupt streams or guard overflow, never a throw.
    */
  private[graft] def inflateRawSpan(
      b: Array[Byte], off: Int, len: Int,
      maxInflated: Int = 1 << 30): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream(math.min(len * 4, 1 << 16))
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && !inf.finished()) return None // truncated/needs-dict
        out.write(buf, 0, n)
        if (out.size() > maxInflated) return None // bomb guard
      }
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** Raw-DEFLATE (RFC 1951, no wrapper) one buffer — the synthesis
    * side of [[inflateRawSpan]], framing blocks the way Avro's
    * `deflate` codec does.
    */
  private[graft] def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length))
      val buf = new Array[Byte](64 * 1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Decode one Avro block span per the container codec: `null`
    * (raw), `deflate` (raw RFC 1951, bomb-guarded), `snappy` (raw
    * snappy block + the Avro spec's trailing 4-byte BE CRC32 of the
    * UNCOMPRESSED bytes, VERIFIED — a flipped bit anywhere fails the
    * block).  Returns (buffer, start, end); None on unknown codecs
    * or corrupt payloads, never a throw.
    */
  private[graft] def avroDecodeSpan(
      codec: String, b: Array[Byte], off: Int,
      len: Int): Option[(Array[Byte], Int, Int)] = codec match {
    case "null" => Some((b, off, off + len))
    case "deflate" =>
      inflateRawSpan(b, off, len).map(inf => (inf, 0, inf.length))
    case "snappy" =>
      if (len < 4) None
      else {
        val compLen = len - 4
        val unc =
          try {
            if (!org.xerial.snappy.Snappy.isValidCompressedBuffer(
                b, off, compLen)) return None
            if (org.xerial.snappy.Snappy.uncompressedLength(
                b, off, compLen) > (1 << 30)) return None // bomb guard
            val src = java.util.Arrays.copyOfRange(b, off, off + compLen)
            org.xerial.snappy.Snappy.uncompress(src)
          } catch { case _: java.io.IOException => return None }
        val crc = new java.util.zip.CRC32()
        crc.update(unc)
        val want = ((b(off + compLen) & 0xffL) << 24) |
          ((b(off + compLen + 1) & 0xffL) << 16) |
          ((b(off + compLen + 2) & 0xffL) << 8) |
          (b(off + compLen + 3) & 0xffL)
        if ((crc.getValue & 0xffffffffL) != want) None
        else Some((unc, 0, unc.length))
      }
    case _ => None
  }

  /** Iceberg manifest census — decode the manifest-entry RECORDS (the
    * one step past [[avroBlocksOf]]'s container walk): per entry, the
    * status / snapshot / data-file path / format / record count / byte
    * size that every table-scan planner, compaction picker, and audit
    * job reads first.  Both container codecs real writers use are
    * in-envelope: `null` decodes the raw block span, `deflate` (the
    * Iceberg writers' default) inflates it first (raw RFC 1951,
    * bomb-guarded).  The decoder is schema-DRIVEN: the header's
    * writer schema is parsed ([[parseAvroSchema]]) and every field
    * the census does not extract — partition structs, column-stats
    * collections, split offsets, v2 sequence numbers, whatever a
    * production writer added — is SKIPPED by its own wire type, so
    * v1 and v2 manifests both decode without a fixed-schema gate.
    * The extracted fields are located by NAME (`status`,
    * `snapshot_id`, `data_file.{content, file_path, file_format,
    * record_count, file_size_in_bytes}` — the spec's stable names,
    * with v2's `content` defaulting to 0 = data when absent); a
    * schema missing the required ones rejects.  Blocks
    * walk with the same sync-seal verification as the Avro census,
    * and each block's records must consume its declared byte size
    * exactly.  TOTAL on arbitrary bytes.
    *
    * Scale shape: manifests are METADATA (KBs per data file), so a
    * full-lake manifest census is corpus-size-independent — the same
    * economics as the Delta-log replay (`StorageOps.deltaLogState`).
    */
  private[graft] def icebergManifestEntriesOf(
      r: MediaRecord): Option[Seq[IcebergManifestEntry]] = {
    val b = r.content
    val hdr = avroHeaderOf(b).getOrElse(return None)
    // null, deflate AND snappy: the codecs real Iceberg writers emit
    if (hdr.codec != "null" && hdr.codec != "deflate" &&
      hdr.codec != "snappy") return None
    val entrySchema = parseAvroSchema(hdr.schemaJson) match {
      case Some(rec: AvRecord) => rec
      case _ => return None
    }
    val dataFileSchema = entrySchema.fields.find(_._1 == "data_file")
      .map(_._2) match {
      case Some(rec: AvRecord) => rec
      case _ => return None
    }
    // required extraction targets must exist by name — a wrong schema
    // rejects up front, before any record decode
    val dfNames = dataFileSchema.fields.map(_._1).toSet
    if (!entrySchema.fields.exists(_._1 == "status") ||
      !dfNames.contains("file_path") || !dfNames.contains("file_format") ||
      !dfNames.contains("record_count") ||
      !dfNames.contains("file_size_in_bytes")) return None
    // one manifest_entry, schema-driven: extract by name, skip the rest
    def decodeEntry(d: Array[Byte], p0: Int, end: Int): Option[(IcebergManifestEntry, Int)] = {
      var p = p0
      var status = -1L
      var snap = -1L
      var content = 0L // v1 manifests carry data files only
      var path: String = null
      var fmt: String = null
      var rc = -1L
      var fsz = -1L
      var seqNum = -1L // v2 data sequence number; -1 = inherited/absent
      var eqIds = "" // v2 equality_ids, comma-joined; "" = none
      var colSizes: Vector[IcebergKvLong] = Vector.empty
      var valCounts: Vector[IcebergKvLong] = Vector.empty
      var lowBounds: Vector[IcebergKvBytes] = Vector.empty
      var nullCounts: Vector[IcebergKvLong] = Vector.empty
      var upBounds: Vector[IcebergKvBytes] = Vector.empty
      var partJson = ""
      var refDataFile = "" // v3 DV routing: which data file the
      var cOffset = -1L    // deletion vector applies to, and where
      var cSize = -1L      // its blob lives inside the Puffin file
      for ((fname, ft) <- entrySchema.fields) fname match {
        case "status" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          status = v._1.getOrElse(return None)
          p = v._2
        case "snapshot_id" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          snap = v._1.getOrElse(-1L)
          p = v._2
        case "sequence_number" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          seqNum = v._1.getOrElse(-1L)
          p = v._2
        case "data_file" =>
          for ((dfn, dft) <- dataFileSchema.fields) dfn match {
            case "content" =>
              val v = avReadLongish(dft, d, p, end).getOrElse(return None)
              content = v._1.getOrElse(0L)
              p = v._2
            case "file_path" =>
              val v = avReadStringish(dft, d, p, end).getOrElse(return None)
              path = v._1.getOrElse(return None)
              p = v._2
            case "file_format" =>
              val v = avReadStringish(dft, d, p, end).getOrElse(return None)
              fmt = v._1.getOrElse(return None)
              p = v._2
            case "record_count" =>
              val v = avReadLongish(dft, d, p, end).getOrElse(return None)
              rc = v._1.getOrElse(return None)
              p = v._2
            case "file_size_in_bytes" =>
              val v = avReadLongish(dft, d, p, end).getOrElse(return None)
              fsz = v._1.getOrElse(return None)
              p = v._2
            case "equality_ids" =>
              val v = avReadLongArrayish(dft, d, p, end).getOrElse(return None)
              eqIds = v._1.map(_.mkString(",")).getOrElse("")
              p = v._2
            case "column_sizes" =>
              val v = avReadKvArrayish(dft, d, p, end, bytesValue = false)
                .getOrElse(return None)
              colSizes = v._1.getOrElse(Vector.empty)
                .map(t => IcebergKvLong(t._1, t._2))
              p = v._2
            case "value_counts" =>
              val v = avReadKvArrayish(dft, d, p, end, bytesValue = false)
                .getOrElse(return None)
              valCounts = v._1.getOrElse(Vector.empty)
                .map(t => IcebergKvLong(t._1, t._2))
              p = v._2
            case "lower_bounds" =>
              val v = avReadKvArrayish(dft, d, p, end, bytesValue = true)
                .getOrElse(return None)
              lowBounds = v._1.getOrElse(Vector.empty)
                .map(t => IcebergKvBytes(t._1,
                  t._3.map("%02x".format(_)).mkString))
              p = v._2
            case "null_value_counts" =>
              val v = avReadKvArrayish(dft, d, p, end, bytesValue = false)
                .getOrElse(return None)
              nullCounts = v._1.getOrElse(Vector.empty)
                .map(t => IcebergKvLong(t._1, t._2))
              p = v._2
            case "upper_bounds" =>
              val v = avReadKvArrayish(dft, d, p, end, bytesValue = true)
                .getOrElse(return None)
              upBounds = v._1.getOrElse(Vector.empty)
                .map(t => IcebergKvBytes(t._1,
                  t._3.map("%02x".format(_)).mkString))
              p = v._2
            case "partition" =>
              // the FIRST-level Iceberg prune: the partition struct,
              // rendered generically as JSON (specs differ per table)
              val v = avJsonValue(dft, d, p, end).getOrElse(return None)
              partJson = v._1
              p = v._2
            case "referenced_data_file" =>
              val v = avReadStringish(dft, d, p, end).getOrElse(return None)
              refDataFile = v._1.getOrElse("")
              p = v._2
            case "content_offset" =>
              val v = avReadLongish(dft, d, p, end).getOrElse(return None)
              cOffset = v._1.getOrElse(-1L)
              p = v._2
            case "content_size_in_bytes" =>
              val v = avReadLongish(dft, d, p, end).getOrElse(return None)
              cSize = v._1.getOrElse(-1L)
              p = v._2
            case _ =>
              p = avSkipValue(dft, d, p, end).getOrElse(return None)
          }
        case _ =>
          p = avSkipValue(ft, d, p, end).getOrElse(return None)
      }
      if (status < 0L || status > 2L || content < 0L || content > 2L ||
        path == null || fmt == null || rc < 0L || fsz < 0L) return None
      Some((IcebergManifestEntry(r.id, -1L, status, snap, path, fmt,
        rc, fsz, content, seqNum, eqIds, colSizes, valCounts,
        lowBounds, nullCounts, upBounds, partJson, refDataFile,
        cOffset, cSize), p))
    }
    val syncOff = hdr.syncOff
    var off = hdr.firstBlockOff
    val out = scala.collection.mutable.ArrayBuffer.empty[IcebergManifestEntry]
    var idx = 0L
    while (off < b.length) {
      val cnt = avroVarLong(b, off)
      if (cnt == null || cnt._1 <= 0L || cnt._1 > 10000000L) return None
      off += cnt._2
      val sz = avroVarLong(b, off)
      if (sz == null || sz._1 < 0L) return None
      off += sz._2
      // bound AFTER advancing past the varint — checking against the
      // pre-advance offset lets off + size overrun by the varint width
      if (sz._1 > (b.length - off).toLong) return None
      val dataEnd = off + sz._1.toInt
      // record bytes through the codec layer (raw / inflate /
      // snappy+CRC — avroDecodeSpan)
      val (d, pStart, pEnd) =
        avroDecodeSpan(hdr.codec, b, off, sz._1.toInt)
          .getOrElse(return None)
      var p = pStart
      var k = 0L
      while (k < cnt._1) {
        val (e, p2) = decodeEntry(d, p, pEnd).getOrElse(return None)
        out += e.copy(entryIdx = idx)
        p = p2
        idx += 1
        k += 1
      }
      if (p != pEnd) return None // records must fill the block exactly
      off = dataEnd
      if (off + 16 > b.length) return None
      var i = 0
      while (i < 16) { // the sync seal, same discipline as the block census
        if (b(off + i) != b(syncOff + i)) return None
        i += 1
      }
      off += 16
    }
    if (off != b.length) return None
    Some(out.toSeq)
  }

  def icebergManifestEntries(
      ds: Dataset[MediaRecord]): Dataset[IcebergManifestEntry] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => icebergManifestEntriesOf(r).getOrElse(Nil)))
  }

  /** Per-row Iceberg manifest synthesis: a spec-valid Avro container
    * whose records are [[IcebergManifestSchema]] manifest entries —
    * `1 + id % 3` entries, entry k carrying status `(id + k) % 3`,
    * snapshot `3000 + id` (entry 0 exercises the null union branch
    * when `id % 5 == 0`), path `data/part-<id>-<k>.parquet`, format
    * PARQUET, `100 + (id + k) % 57` records, `10000 + 137·id + k`
    * bytes.  One record per block so the block walk and the record
    * decode are independently exercised; sync marker derived from the
    * id.  Every census field replays from id arithmetic.
    */
  def synthesizeIcebergManifest(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      def zig(v: Long): Array[Byte] = {
        var z = (v << 1) ^ (v >> 63)
        val out = Array.newBuilder[Byte]
        while ((z & ~0x7fL) != 0L) { out += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
        out += z.toByte
        out.result()
      }
      def str(s: String): Array[Byte] = {
        val sb = s.getBytes("UTF-8"); zig(sb.length.toLong) ++ sb
      }
      val sync = new Array[Byte](16)
      var i = 0
      while (i < 16) { sync(i) = ((id * 37 + i * 11 + 5) & 0xff).toByte; i += 1 }
      // odd ids ship DEFLATE-coded blocks — real Iceberg writers'
      // default codec; the decoded entry table is identical, so the
      // oracle never forks (the zip64 / targz sharing discipline)
      val deflate = id % 2 == 1
      val out = Array.newBuilder[Byte]
      out ++= Array[Byte]('O', 'b', 'j', 1)
      out ++= zig(2L)
      out ++= str("avro.codec"); out ++= str(if (deflate) "deflate" else "null")
      out ++= str("avro.schema"); out ++= str(IcebergManifestSchema)
      out ++= zig(0L)
      out ++= sync
      val ns = 1 + (id % 3).toInt
      var k = 0
      while (k < ns) {
        val rec = Array.newBuilder[Byte]
        rec ++= zig(((id + k) % 3).toLong) // status
        if (k == 0 && id % 5 == 0) rec ++= zig(0L) // null snapshot branch
        else { rec ++= zig(1L); rec ++= zig(3000L + id) }
        rec ++= str(s"data/part-$id-$k.parquet")
        rec ++= str("PARQUET")
        rec ++= zig(100L + (id + k) % 57)
        rec ++= zig(10000L + 137L * id + k)
        val r0 = rec.result()
        val r = if (deflate) deflateRaw(r0) else r0
        out ++= zig(1L)
        out ++= zig(r.length.toLong)
        out ++= r
        out ++= sync
        k += 1
      }
      MediaRecord(id, "application/x-iceberg-manifest", out.result())
    }
  }

  /** A v2-production-shaped manifest-entry schema: sequence-number
    * fields, `content` (data vs delete files), a partition STRUCT,
    * column-stats arrays of key/value records, bounds as bytes,
    * split offsets — the shape real Iceberg v2 writers emit, used by
    * [[synthesizeIcebergManifestV2]] through the Avro LIBRARY (the
    * independent-writer discipline: library writes, the schema-driven
    * from-spec walk reads).
    */
  private[graft] val IcebergManifestV2Schema: String =
    """{"type":"record","name":"manifest_entry","fields":[""" +
      """{"name":"status","type":"int","field-id":0},""" +
      """{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},""" +
      """{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},""" +
      """{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},""" +
      """{"name":"data_file","type":{"type":"record","name":"r2","fields":[""" +
      """{"name":"content","type":"int","field-id":134},""" +
      """{"name":"file_path","type":"string","field-id":100},""" +
      """{"name":"file_format","type":"string","field-id":101},""" +
      """{"name":"partition","type":{"type":"record","name":"r102","fields":[""" +
      """{"name":"p_bucket","type":["null","int"],"default":null,"field-id":1000},""" +
      """{"name":"p_days","type":["null","int"],"default":null,"field-id":1001}]},"field-id":102},""" +
      """{"name":"record_count","type":"long","field-id":103},""" +
      """{"name":"file_size_in_bytes","type":"long","field-id":104},""" +
      """{"name":"column_sizes","type":["null",{"type":"array","items":{"type":"record","name":"k117_v118","fields":[""" +
      """{"name":"key","type":"int","field-id":117},{"name":"value","type":"long","field-id":118}]}}],"default":null,"field-id":108},""" +
      """{"name":"value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k119_v120","fields":[""" +
      """{"name":"key","type":"int","field-id":119},{"name":"value","type":"long","field-id":120}]}}],"default":null,"field-id":109},""" +
      """{"name":"null_value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k121_v122","fields":[""" +
      """{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},""" +
      """{"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k126_v127","fields":[""" +
      """{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},""" +
      """{"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k129_v130","fields":[""" +
      """{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128},""" +
      """{"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"default":null,"field-id":132},""" +
      """{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},""" +
      """{"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140},""" +
      """{"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},""" +
      """{"name":"content_offset","type":["null","long"],"default":null,"field-id":144},""" +
      """{"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}""" +
      """]},"field-id":2}]}"""

  /** Per-row Iceberg v2 manifest synthesis THROUGH the Avro library:
    * `1 + id % 3` entries carrying the full production shape
    * ([[IcebergManifestV2Schema]]) — partition struct, column-stats
    * arrays, bounds bytes, split offsets, sequence numbers — of
    * which the census extracts status / snapshot / content / path /
    * format / rows / bytes and must SKIP the rest by schema.
    * Entry k: status `(id + k) % 3`, null snapshot on the k=0
    * `id % 5 == 0` arm, content `(id + k) % 3` (delete-file kinds
    * included), the v1 path/format/count/size arithmetic.  Odd ids
    * deflate-coded (the real writers' default).
    */
  def synthesizeIcebergManifestV2(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      // Schema parse + writer once per partition, not per row
      val schema = new org.apache.avro.Schema.Parser()
        .parse(IcebergManifestV2Schema)
      val dfSchema = schema.getField("data_file").schema()
      val partSchema = dfSchema.getField("partition").schema()
      def arrItem(field: String) =
        dfSchema.getField(field).schema().getTypes.get(1).getElementType
      val csSchema = arrItem("column_sizes")
      val vcSchema = arrItem("value_counts")
      val nvSchema = arrItem("null_value_counts")
      val lbSchema = arrItem("lower_bounds")
      val ubSchema = arrItem("upper_bounds")
      val writer = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema)
      it.map { id =>
        val dfw = new org.apache.avro.file.DataFileWriter(writer)
        // all three production codecs cycle: null / deflate / snappy
        if (id % 3 == 1)
          dfw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        else if (id % 3 == 2)
          dfw.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        val bos = new java.io.ByteArrayOutputStream(1024)
        // deterministic per-id sync marker: the no-arg create() mints
        // one via UUID.randomUUID -> a GLOBALLY LOCKED SecureRandom,
        // which convoys all 32 task threads at corpus scale (measured
        // ~27x superlinear at the x100 scratch SF) — and a seeded
        // fixture should be byte-reproducible anyway
        val sync = java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-manifest-v2-$id".getBytes("UTF-8"))
        dfw.create(schema, bos, sync)
        val ns = 1 + (id % 3).toInt
        var k = 0
        while (k < ns) {
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("status", ((id + k) % 3).toInt)
          rec.put("snapshot_id",
            if (k == 0 && id % 5 == 0) null
            else java.lang.Long.valueOf(3000L + id))
          rec.put("sequence_number", java.lang.Long.valueOf(7L + id % 9))
          rec.put("file_sequence_number", java.lang.Long.valueOf(7L + id % 9))
          val dataFile =
            new org.apache.avro.generic.GenericData.Record(dfSchema)
          dataFile.put("content", ((id + k) % 3).toInt)
          dataFile.put("file_path", s"data/part-$id-$k.parquet")
          dataFile.put("file_format", "PARQUET")
          val part =
            new org.apache.avro.generic.GenericData.Record(partSchema)
          part.put("p_bucket", Integer.valueOf((id % 16).toInt))
          part.put("p_days", Integer.valueOf((id % 365).toInt))
          dataFile.put("partition", part)
          dataFile.put("record_count",
            java.lang.Long.valueOf(100L + (id + k) % 57))
          dataFile.put("file_size_in_bytes",
            java.lang.Long.valueOf(10000L + 137L * id + k))
          def kvList(itemSchema: org.apache.avro.Schema,
              mk: Int => AnyRef): java.util.List[AnyRef] = {
            val l = new java.util.ArrayList[AnyRef](3)
            var c = 1
            while (c <= 3) {
              val kv = new org.apache.avro.generic.GenericData.Record(itemSchema)
              kv.put("key", Integer.valueOf(c))
              kv.put("value", mk(c))
              l.add(kv)
              c += 1
            }
            l
          }
          dataFile.put("column_sizes",
            kvList(csSchema, c => java.lang.Long.valueOf(1000L * c + id)))
          dataFile.put("value_counts",
            kvList(vcSchema, c => java.lang.Long.valueOf(100L + c)))
          dataFile.put("null_value_counts",
            kvList(nvSchema, c => java.lang.Long.valueOf((id + c) % 5)))
          dataFile.put("lower_bounds",
            kvList(lbSchema, c => java.nio.ByteBuffer.wrap(
              Array[Byte](c.toByte, (id & 0x7f).toByte))))
          dataFile.put("upper_bounds",
            kvList(ubSchema, c => java.nio.ByteBuffer.wrap(
              Array[Byte]((c + 1).toByte, ((id * 3) & 0x7f).toByte))))
          val so = new java.util.ArrayList[java.lang.Long](2)
          so.add(java.lang.Long.valueOf(4L))
          so.add(java.lang.Long.valueOf(4L + 512L * (k + 1)))
          dataFile.put("split_offsets", so)
          // equality-delete entries (content = 2) carry the spec's
          // equality_ids column list; data and position-delete
          // entries exercise the null union branch
          if ((id + k) % 3 == 2) {
            val eq = new java.util.ArrayList[Integer](2)
            eq.add(Integer.valueOf((id % 3).toInt + 1))
            eq.add(Integer.valueOf(5))
            dataFile.put("equality_ids", eq)
          }
          dataFile.put("sort_order_id", Integer.valueOf(0))
          // v3 DELETION-VECTOR routing on position-delete entries
          // (content = 1): which data file the DV covers, and the
          // blob's span inside its Puffin file — what a v3 scan
          // hands to the puffin DV decoder
          if ((id + k) % 3 == 1) {
            dataFile.put("referenced_data_file",
              s"data/part-$id-$k.parquet")
            dataFile.put("content_offset",
              java.lang.Long.valueOf(4L + id % 100))
            dataFile.put("content_size_in_bytes",
              java.lang.Long.valueOf(20L + id % 50))
          }
          rec.put("data_file", dataFile)
          dfw.append(rec)
          k += 1
        }
        dfw.close()
        MediaRecord(id, "application/x-iceberg-manifest", bos.toByteArray)
      }
    }
  }

  /** v3 MOR-DV manifest fixture THROUGH the Avro library: for each
    * EVEN id (the ids [[graft.ops.StorageOps.synthesizePuffin]] gives
    * a deletion-vector blob), one position-delete entry (content = 1)
    * shaped exactly as the v3 spec routes DVs — `file_path` names the
    * PUFFIN file (`puffin/dv-<id>.puffin`), `referenced_data_file`
    * the data file the DV covers, `content_offset` /
    * `content_size_in_bytes` the blob's span inside the Puffin file,
    * and `record_count` the DV's cardinality.  The span is computed
    * by building the SAME framed blob bytes the Puffin synthesizer
    * writes ([[graft.ops.StorageOps.dvFramedBlob]] over
    * [[graft.ops.StorageOps.dvPositionsFor]]), so manifest routing
    * and blob content are coherent by construction — the splice
    * query (q_iceberg_mor_dv) exercises the full v3 scan path:
    * manifest → routed blob decode → position anti-join.
    */
  def synthesizeIcebergV3DvManifest(
      df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .filter(_ % 2 == 0)
      .mapPartitions { it =>
        val schema = new org.apache.avro.Schema.Parser()
          .parse(IcebergManifestV2Schema)
        val dfSchema = schema.getField("data_file").schema()
        val partSchema = dfSchema.getField("partition").schema()
        val writer = new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema)
        it.map { id =>
          val dfw = new org.apache.avro.file.DataFileWriter(writer)
          if (id % 3 == 1)
            dfw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
          val bos = new java.io.ByteArrayOutputStream(512)
          val sync = java.security.MessageDigest.getInstance("MD5")
            .digest(s"graft-manifest-v3dv-$id".getBytes("UTF-8"))
          dfw.create(schema, bos, sync)
          val positions = graft.ops.StorageOps.dvPositionsFor(id)
          val framed = graft.ops.StorageOps.dvFramedBlob(positions)
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("status", 1) // ADDED
          rec.put("snapshot_id", java.lang.Long.valueOf(100L + id))
          rec.put("sequence_number", java.lang.Long.valueOf(id % 10))
          rec.put("file_sequence_number", java.lang.Long.valueOf(id % 10))
          val dataFile =
            new org.apache.avro.generic.GenericData.Record(dfSchema)
          dataFile.put("content", 1) // POSITION_DELETES: the DV kind
          dataFile.put("file_path", s"puffin/dv-$id.puffin")
          dataFile.put("file_format", "PUFFIN")
          dataFile.put("partition",
            new org.apache.avro.generic.GenericData.Record(partSchema))
          // spec: for DV entries record_count IS the cardinality
          dataFile.put("record_count",
            java.lang.Long.valueOf(positions.length.toLong))
          dataFile.put("file_size_in_bytes",
            java.lang.Long.valueOf(framed.length + 24L))
          dataFile.put("sort_order_id", Integer.valueOf(0))
          dataFile.put("referenced_data_file", s"data/part-$id.parquet")
          // blob 0 starts right after the 4-byte "PFA1" head — the
          // synthesizer writes the DV first, at offset 4, always
          dataFile.put("content_offset", java.lang.Long.valueOf(4L))
          dataFile.put("content_size_in_bytes",
            java.lang.Long.valueOf(framed.length.toLong))
          rec.put("data_file", dataFile)
          dfw.append(rec)
          dfw.close()
          MediaRecord(id, "application/x-iceberg-manifest", bos.toByteArray)
        }
      }
  }

  /** One Iceberg manifest-LIST entry — the index of manifests a
    * snapshot points at (the level ABOVE [[IcebergManifestEntry]]):
    * the manifest file's path and length, its partition spec, the
    * snapshot that added it, and the added/existing/deleted data-file
    * counts a scan planner uses to SKIP whole manifests.
    */
  final case class IcebergManifestFile(
      id: Long, entryIdx: Long, manifestPath: String, manifestLength: Long,
      partitionSpecId: Long, addedSnapshotId: Long, addedFilesCount: Long,
      existingFilesCount: Long, deletedFilesCount: Long,
      content: Long = 0L, sequenceNumber: Long = -1L,
      minSequenceNumber: Long = -1L)

  /** The v1 manifest-file subset schema for the manifest-list census —
    * wire order doubles as the decode order, same gate discipline as
    * [[IcebergManifestSchema]].
    */
  private[graft] val IcebergManifestListSchema: String =
    """{"type":"record","name":"manifest_file","fields":[""" +
      """{"name":"manifest_path","type":"string","field-id":500},""" +
      """{"name":"manifest_length","type":"long","field-id":501},""" +
      """{"name":"partition_spec_id","type":"int","field-id":502},""" +
      """{"name":"added_snapshot_id","type":"long","field-id":503},""" +
      """{"name":"added_files_count","type":"int","field-id":504},""" +
      """{"name":"existing_files_count","type":"int","field-id":505},""" +
      """{"name":"deleted_files_count","type":"int","field-id":506}]}"""

  /** The v2 manifest-file schema for the independent-writer fixture:
    * content kind, sequence numbers, v2-generation count names
    * (`*_data_files_count`), row counts, and a partition-summaries
    * array — the census extracts its fields and SKIPS the rest by
    * the embedded schema.
    */
  private[graft] val IcebergManifestListV2Schema: String =
    """{"type":"record","name":"manifest_file","fields":[""" +
      """{"name":"manifest_path","type":"string","field-id":500},""" +
      """{"name":"manifest_length","type":"long","field-id":501},""" +
      """{"name":"partition_spec_id","type":"int","field-id":502},""" +
      """{"name":"content","type":"int","field-id":517},""" +
      """{"name":"sequence_number","type":"long","field-id":515},""" +
      """{"name":"min_sequence_number","type":"long","field-id":516},""" +
      """{"name":"added_snapshot_id","type":"long","field-id":503},""" +
      """{"name":"added_data_files_count","type":"int","field-id":504},""" +
      """{"name":"existing_data_files_count","type":"int","field-id":505},""" +
      """{"name":"deleted_data_files_count","type":"int","field-id":506},""" +
      """{"name":"added_rows_count","type":"long","field-id":512},""" +
      """{"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[""" +
      """{"name":"contains_null","type":"boolean","field-id":509},""" +
      """{"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},""" +
      """{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},""" +
      """{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}]}}],"default":null,"field-id":508}""" +
      """]}"""

  /** Per-row v2 manifest-LIST synthesis THROUGH the Avro library:
    * `1 + id % 4` manifest-file entries carrying the v2 production
    * shape — content kind `(id + k) % 2`, sequence numbers, the
    * renamed `*_data_files_count` fields, row counts, and a
    * partition-summaries array the census must SKIP by schema.
    * Odd ids deflate-coded.
    */
  def synthesizeIcebergManifestListV2(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser()
        .parse(IcebergManifestListV2Schema)
      val partItem = schema.getField("partitions").schema()
        .getTypes.get(1).getElementType
      val writer = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema)
      it.map { id =>
        val dfw = new org.apache.avro.file.DataFileWriter(writer)
        // all three production codecs cycle: null / deflate / snappy
        if (id % 3 == 1)
          dfw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        else if (id % 3 == 2)
          dfw.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        val bos = new java.io.ByteArrayOutputStream(1024)
        // deterministic sync marker (the r16 SecureRandom-convoy fix)
        val sync = java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-mlist-v2-$id".getBytes("UTF-8"))
        dfw.create(schema, bos, sync)
        val ns = 1 + (id % 4).toInt
        var k = 0
        while (k < ns) {
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("manifest_path", s"meta/m2-$id-$k.avro")
          rec.put("manifest_length",
            java.lang.Long.valueOf(6000L + 89L * id + 11L * k))
          rec.put("partition_spec_id", Integer.valueOf((id % 3).toInt))
          rec.put("content", Integer.valueOf(((id + k) % 2).toInt))
          rec.put("sequence_number",
            java.lang.Long.valueOf(10L + (id + k) % 9))
          rec.put("min_sequence_number",
            java.lang.Long.valueOf(1L + (id + k) % 5))
          rec.put("added_snapshot_id", java.lang.Long.valueOf(3000L + id))
          rec.put("added_data_files_count",
            Integer.valueOf(((id + k) % 7).toInt))
          rec.put("existing_data_files_count",
            Integer.valueOf(((id + 2 * k) % 5).toInt))
          rec.put("deleted_data_files_count",
            Integer.valueOf(((id + 3 * k) % 3).toInt))
          rec.put("added_rows_count",
            java.lang.Long.valueOf(1000L + id + k))
          val summaries = new java.util.ArrayList[AnyRef](1)
          val sm = new org.apache.avro.generic.GenericData.Record(partItem)
          sm.put("contains_null", java.lang.Boolean.valueOf(k % 2 == 0))
          sm.put("contains_nan", java.lang.Boolean.valueOf(false))
          sm.put("lower_bound", java.nio.ByteBuffer.wrap(
            Array[Byte]((id & 0x7f).toByte)))
          sm.put("upper_bound", java.nio.ByteBuffer.wrap(
            Array[Byte](((id + k) & 0x7f).toByte)))
          summaries.add(sm)
          rec.put("partitions", summaries)
          dfw.append(rec)
          k += 1
        }
        dfw.close()
        MediaRecord(id, "application/x-iceberg-manifest-list", bos.toByteArray)
      }
    }
  }

  /** Iceberg manifest-list census — the snapshot's index of manifests,
    * one level above the manifest-entry decode: a snapshot commit
    * points at exactly one manifest list, and its added / existing /
    * deleted counts are what lets a planner skip whole manifests
    * without opening them (the same pruning role parquet footers play
    * one level further down).  Same schema-gated, sync-sealed,
    * exact-block-consumption walk as [[icebergManifestEntriesOf]];
    * TOTAL on arbitrary bytes.
    */
  private[graft] def icebergManifestListOf(
      r: MediaRecord): Option[Seq[IcebergManifestFile]] = {
    val b = r.content
    val hdr = avroHeaderOf(b).getOrElse(return None)
    if (hdr.codec != "null" && hdr.codec != "deflate" &&
      hdr.codec != "snappy") return None
    // schema-DRIVEN (the r16 manifest discipline, now on the list
    // level too): parse the embedded writer schema and walk by it —
    // v1 lists, v2 lists (content / sequence numbers / partition
    // summaries / row counts), and whatever a production writer
    // appends all decode; the exact-string gate is gone.  Counts
    // accept BOTH naming generations (v1 added_files_count, v2
    // added_data_files_count).
    val listSchema = parseAvroSchema(hdr.schemaJson) match {
      case Some(rec: AvRecord) => rec
      case _ => return None
    }
    val names = listSchema.fields.map(_._1).toSet
    if (!names.contains("manifest_path") ||
      !names.contains("manifest_length")) return None
    def decodeFile(d: Array[Byte], p0: Int, end: Int): Option[(IcebergManifestFile, Int)] = {
      var p = p0
      var path: String = null
      var len = -1L
      var spec = -1L
      var snap = -1L
      var added = -1L
      var existing = -1L
      var deleted = -1L
      var content = 0L
      var seqNum = -1L
      var minSeq = -1L
      for ((fname, ft) <- listSchema.fields) fname match {
        case "manifest_path" =>
          val v = avReadStringish(ft, d, p, end).getOrElse(return None)
          path = v._1.getOrElse(return None)
          p = v._2
        case "manifest_length" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          len = v._1.getOrElse(return None)
          p = v._2
        case "partition_spec_id" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          spec = v._1.getOrElse(-1L)
          p = v._2
        case "added_snapshot_id" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          snap = v._1.getOrElse(-1L)
          p = v._2
        case "content" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          content = v._1.getOrElse(0L)
          p = v._2
        case "sequence_number" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          seqNum = v._1.getOrElse(-1L)
          p = v._2
        case "min_sequence_number" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          minSeq = v._1.getOrElse(-1L)
          p = v._2
        case "added_files_count" | "added_data_files_count" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          added = v._1.getOrElse(-1L)
          p = v._2
        case "existing_files_count" | "existing_data_files_count" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          existing = v._1.getOrElse(-1L)
          p = v._2
        case "deleted_files_count" | "deleted_data_files_count" =>
          val v = avReadLongish(ft, d, p, end).getOrElse(return None)
          deleted = v._1.getOrElse(-1L)
          p = v._2
        case _ =>
          p = avSkipValue(ft, d, p, end).getOrElse(return None)
      }
      if (path == null || len < 0 || content < 0 || content > 1)
        return None
      Some((IcebergManifestFile(r.id, -1L, path, len, spec, snap, added,
        existing, deleted, content, seqNum, minSeq), p))
    }
    val syncOff = hdr.syncOff
    var off = hdr.firstBlockOff
    val out = scala.collection.mutable.ArrayBuffer.empty[IcebergManifestFile]
    var idx = 0L
    while (off < b.length) {
      val cnt = avroVarLong(b, off)
      if (cnt == null || cnt._1 <= 0L || cnt._1 > 10000000L) return None
      off += cnt._2
      val sz = avroVarLong(b, off)
      if (sz == null || sz._1 < 0L) return None
      off += sz._2
      // bound AFTER advancing past the varint — checking against the
      // pre-advance offset lets off + size overrun by the varint width
      if (sz._1 > (b.length - off).toLong) return None
      val dataEnd = off + sz._1.toInt
      val (d, pStart, pEnd) =
        avroDecodeSpan(hdr.codec, b, off, sz._1.toInt)
          .getOrElse(return None)
      var p = pStart
      var k = 0L
      while (k < cnt._1) {
        val (f, p2) = decodeFile(d, p, pEnd).getOrElse(return None)
        out += f.copy(entryIdx = idx)
        p = p2
        idx += 1
        k += 1
      }
      if (p != pEnd) return None
      off = dataEnd
      if (off + 16 > b.length) return None
      var i = 0
      while (i < 16) {
        if (b(off + i) != b(syncOff + i)) return None
        i += 1
      }
      off += 16
    }
    if (off != b.length) return None
    Some(out.toSeq)
  }

  def icebergManifestList(
      ds: Dataset[MediaRecord]): Dataset[IcebergManifestFile] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => icebergManifestListOf(r).getOrElse(Nil)))
  }

  /** Per-row manifest-list synthesis: `1 + id % 4` manifest-file
    * entries, entry k pointing at `meta/manifest-<id>-<k>.avro` of
    * length `5000 + 97·id + 13·k`, spec `id % 3`, snapshot
    * `3000 + id`, counts (added, existing, deleted) =
    * `(1 + (id + k) % 9, (id + 2k) % 7, (id + 3k) % 4)` — every field
    * id arithmetic.  One record per block, sync from the id.
    */
  def synthesizeIcebergManifestList(
      df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      def zig(v: Long): Array[Byte] = {
        var z = (v << 1) ^ (v >> 63)
        val out = Array.newBuilder[Byte]
        while ((z & ~0x7fL) != 0L) { out += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
        out += z.toByte
        out.result()
      }
      def str(s: String): Array[Byte] = {
        val sb = s.getBytes("UTF-8"); zig(sb.length.toLong) ++ sb
      }
      val sync = new Array[Byte](16)
      var i = 0
      while (i < 16) { sync(i) = ((id * 41 + i * 13 + 7) & 0xff).toByte; i += 1 }
      val deflate = id % 2 == 1 // same both-codecs split as the manifests
      val out = Array.newBuilder[Byte]
      out ++= Array[Byte]('O', 'b', 'j', 1)
      out ++= zig(2L)
      out ++= str("avro.codec"); out ++= str(if (deflate) "deflate" else "null")
      out ++= str("avro.schema"); out ++= str(IcebergManifestListSchema)
      out ++= zig(0L)
      out ++= sync
      val ns = 1 + (id % 4).toInt
      var k = 0
      while (k < ns) {
        val rec = Array.newBuilder[Byte]
        rec ++= str(s"meta/manifest-$id-$k.avro")
        rec ++= zig(5000L + 97L * id + 13L * k)
        rec ++= zig(id % 3)
        rec ++= zig(3000L + id)
        rec ++= zig(1L + (id + k) % 9)
        rec ++= zig((id + 2L * k) % 7)
        rec ++= zig((id + 3L * k) % 4)
        val r0 = rec.result()
        val r = if (deflate) deflateRaw(r0) else r0
        out ++= zig(1L)
        out ++= zig(r.length.toLong)
        out ++= r
        out ++= sync
        k += 1
      }
      MediaRecord(id, "application/x-iceberg-manifest-list", out.result())
    }
  }

  // ---- coherent Iceberg TABLE fixture (three linked levels) --------

  private def avZig(v: Long): Array[Byte] = {
    var z = (v << 1) ^ (v >> 63)
    val out = Array.newBuilder[Byte]
    while ((z & ~0x7fL) != 0L) { out += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
    out += z.toByte
    out.result()
  }
  private def avStr(s: String): Array[Byte] = {
    val sb = s.getBytes("UTF-8"); avZig(sb.length.toLong) ++ sb
  }
  private def avContainer(
      id: Long, schemaJson: String, records: Seq[Array[Byte]],
      saltBase: Long): Array[Byte] = {
    val sync = new Array[Byte](16)
    var i = 0
    while (i < 16) { sync(i) = ((saltBase + i * 13 + 7) & 0xff).toByte; i += 1 }
    val out = Array.newBuilder[Byte]
    out ++= Array[Byte]('O', 'b', 'j', 1)
    out ++= avZig(2L)
    out ++= avStr("avro.codec"); out ++= avStr("null")
    out ++= avStr("avro.schema"); out ++= avStr(schemaJson)
    out ++= avZig(0L)
    out ++= sync
    records.foreach { r =>
      out ++= avZig(1L)
      out ++= avZig(r.length.toLong)
      out ++= r
      out ++= sync
    }
    out.result()
  }

  /** The manifest-LIST level of the coherent table fixture: per id,
    * ONE container per snapshot (paths `ml-<id>-<k>.avro` — exactly
    * the names [[graft.ops.StorageOps.synthesizeIcebergMetadata]]
    * points at), each naming `1 + (id + k) % 2` manifests
    * `mf-<id>-<k>-<j>.avro`.  Non-current snapshots' lists are
    * DECOYS: the table-state composition must follow the current
    * pointer, not union everything it can decode.
    */
  def synthesizeIcebergTableLists(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].flatMap { id =>
      val ns = 1 + (id % 3).toInt
      (0 until ns).map { k =>
        val nm = 1 + ((id + k) % 2).toInt
        val recs = (0 until nm).map { j =>
          val rec = Array.newBuilder[Byte]
          rec ++= avStr(s"mf-$id-$k-$j.avro")
          rec ++= avZig(4000L + 31L * id + 7L * k + j)
          rec ++= avZig(id % 3)
          rec ++= avZig(3000L + id + k)
          rec ++= avZig(1L + (id + j) % 3) // added == entry count below
          rec ++= avZig(0L)
          rec ++= avZig(0L)
          rec.result()
        }
        (id, s"ml-$id-$k.avro",
          avContainer(id, IcebergManifestListSchema, recs,
            id * 41 + k * 211))
      }
    }.toDF("id", "path", "content")
  }

  /** The MANIFEST level of the coherent table fixture: one container
    * per (snapshot k, manifest j) at path `mf-<id>-<k>-<j>.avro`
    * with `1 + (id + j) % 3` entries — entry e: status
    * `(id + k + j + e) % 3` (2 = DELETED must be dropped by the
    * composition), data file `data/d-<id>-<k>-<j>-<e>.parquet`,
    * `100 + (id + e) % 57` records, `1000 + 53·id + 17·k + 5·j + e`
    * bytes.
    */
  def synthesizeIcebergTableManifests(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].flatMap { id =>
      val ns = 1 + (id % 3).toInt
      for {
        k <- 0 until ns
        j <- 0 until (1 + ((id + k) % 2).toInt)
      } yield {
        val ne = 1 + ((id + j) % 3).toInt
        val recs = (0 until ne).map { e =>
          val rec = Array.newBuilder[Byte]
          rec ++= avZig((id + k + j + e) % 3) // status
          rec ++= avZig(1L); rec ++= avZig(3000L + id + k) // snapshot union
          rec ++= avStr(s"data/d-$id-$k-$j-$e.parquet")
          rec ++= avStr("PARQUET")
          rec ++= avZig(100L + (id + e) % 57)
          rec ++= avZig(1000L + 53L * id + 17L * k + 5L * j + e)
          rec.result()
        }
        (id, s"mf-$id-$k-$j.avro",
          avContainer(id, IcebergManifestSchema, recs,
            id * 67 + k * 131 + j * 17))
      }
    }.toDF("id", "path", "content")
  }

  // ---- TFRecord shard census ---------------------------------------

  /** One TFRecord: parse-order index, the record's absolute byte
    * offset (the seek table for a random-access reader), and its
    * payload length.
    */
  final case class TfRecordMeta(
      id: Long, recIdx: Long, offset: Long, length: Long)

  /** TFRecord masked CRC-32C (the tensorflow framing rule):
    * `rot_right_15(crc) + 0xa282ead8` over the Castagnoli CRC the JDK
    * ships (`java.util.zip.CRC32C`).
    */
  private[graft] def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8L & 0xffffffffL
  }

  /** TFRecord shard census — the third shard convention next to tar
    * and zip, and the one TensorFlow training jobs actually consume:
    * each record is `u64le length + u32le masked-crc(length) + data +
    * u32le masked-crc(data)`.  BOTH checksums are VERIFIED per record
    * (the tar header-checksum discipline): a flipped byte anywhere —
    * length field, payload, or either crc — fails the census rather
    * than mis-counting or mis-seeking.  Strict framing: the walk must
    * consume the shard exactly.
    */
  private[graft] def tfRecordsOf(
      r: MediaRecord, maxRecord: Int = 1 << 30): Option[Seq[TfRecordMeta]] = {
    val b = r.content
    if (b == null || b.length < 16) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[TfRecordMeta]
    var off = 0
    var idx = 0L
    while (off < b.length) {
      if (off + 12 > b.length) return None
      var len = 0L
      var i = 0
      while (i < 8) { len |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
      if (len < 0 || len > maxRecord) return None
      def u32le(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
        (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
      if (maskedCrc32c(b, off, 8) != u32le(off + 8)) return None
      val dataOff = off + 12
      if (dataOff + len + 4 > b.length.toLong) return None
      if (maskedCrc32c(b, dataOff, len.toInt) != u32le(dataOff + len.toInt))
        return None
      out += TfRecordMeta(r.id, idx, off.toLong, len)
      off = dataOff + len.toInt + 4
      idx += 1
    }
    Some(out.toSeq)
  }

  def tfRecords(ds: Dataset[MediaRecord]): Dataset[TfRecordMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => tfRecordsOf(r).getOrElse(Nil)))
  }

  /** Per-row TFRecord shard synthesis: `1 + id % 4` records splitting
    * the document's UTF-8 bytes (the tar split rule), each framed with
    * REAL masked CRC-32Cs — offsets and lengths replay from
    * (id, octet_length(text)) as a running sum.
    */
  def synthesizeTfRecordShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val ns = 1 + (id % 4).toInt
        val out = Array.newBuilder[Byte]
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        var from = 0
        var k = 0
        while (k < ns) {
          val take = payload.length / ns + (if (k < payload.length % ns) 1 else 0)
          val lenBytes = new Array[Byte](8)
          var i = 0
          while (i < 8) { lenBytes(i) = (take.toLong >> (8 * i)).toByte; i += 1 }
          val data = java.util.Arrays.copyOfRange(payload, from, from + take)
          out ++= lenBytes
          out ++= u32a(maskedCrc32c(lenBytes, 0, 8))
          out ++= data
          out ++= u32a(maskedCrc32c(data, 0, data.length))
          from += take
          k += 1
        }
        MediaRecord(id, "application/x-tfrecord", out.result())
      }
  }

  // ---- AVIF header census ------------------------------------------

  /** AVIF image census: dimensions from the first `ispe` property,
    * the item count, and the primary item id — the HEIF metadata a
    * pairing pipeline needs before any AV1 decode.
    */
  final case class AvifMeta(
      id: Long, width: Long, height: Long, nItems: Long,
      primaryItem: Long, nBytes: Long)

  /** AVIF (HEIF/ISO 23008-12 on ISO BMFF) header census — the modern
    * web-image population next to WebP.  Box walk in the MP4 walk's
    * discipline: `ftyp` magic gate with the `avif` major brand, then
    * the `meta` fullbox's children — `pitm` (primary item), `iinf`
    * (item count), and `iprp`/`ipco`'s first `ispe` (image spatial
    * extents — the canvas the primary item decodes to).  No AV1
    * payload decode (the honest boundary, as for H.264/VP9/AV1
    * video); TOTAL on arbitrary bytes.
    */
  private[graft] def avifMetaOf(r: MediaRecord): Option[AvifMeta] = {
    val b = r.content
    if (b == null || b.length < 24) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    if (!(b(8) == 'a' && b(9) == 'v' && b(10) == 'i' && b(11) == 'f')) return None
    var width = -1L; var height = -1L
    var nItems = -1L; var primary = -1L
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val size = u32be(b, off)
        if (size < 8 || off + size > until) return false
        val t = new String(b, off + 4, 4, "US-ASCII")
        val p = off + 8
        t match {
          case "meta" | "iprp" | "ipco" =>
            // meta is a fullbox (4 version/flags bytes); iprp/ipco plain
            val inner = if (t == "meta") p + 4 else p
            if (depth < 4 && !walk(inner, (off + size).toInt, depth + 1))
              return false
          case "pitm" =>
            if (p + 6 > until) return false
            primary = u16be(b, p + 4).toLong
          case "iinf" =>
            if (p + 6 > until) return false
            nItems = u16be(b, p + 4).toLong
          case "ispe" =>
            if (p + 12 > until) return false
            if (width < 0) { // first ispe = the primary image's extents
              width = u32be(b, p + 4)
              height = u32be(b, p + 8)
            }
          case _ => // ftyp, hdlr, infe, mdat, unknown: skip
        }
        off += size.toInt
      }
      off == until
    }
    if (!walk(0, b.length, 0)) return None
    if (width < 0 || nItems < 0 || primary < 0) return None
    Some(AvifMeta(r.id, width, height, nItems, primary, b.length.toLong))
  }

  def avifMeta(ds: Dataset[MediaRecord]): Dataset[AvifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(avifMetaOf))
  }

  /** Per-row AVIF synthesis: canvas `1 + id % 1200` × `1 + id % 900`,
    * `1 + id % 2` items (an `av01` image, plus its alpha auxiliary on
    * odd ids — each with an `ispe`), primary item `1 + id % 7`, and
    * the document's UTF-8 bytes as the (undecoded) `mdat` payload —
    * the whole census including the byte count is id arithmetic.
    */
  def synthesizeAvif(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val w = 1 + (id % 1200)
        val h = 1 + (id % 900)
        val n = 1 + (id % 2).toInt
        val primary = 1 + (id % 7).toInt
        def be32(v: Long) = Array[Byte](
          (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
        def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
        def box(t: String, body: Array[Byte]): Array[Byte] =
          be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
        def fullbox(t: String, body: Array[Byte]): Array[Byte] =
          box(t, Array[Byte](0, 0, 0, 0) ++ body)
        val ftyp = box("ftyp", "avif".getBytes ++ be32(0L) ++ "avifmif1".getBytes)
        val hdlr = fullbox("hdlr", be32(0L) ++ "pict".getBytes ++
          new Array[Byte](12) ++ Array[Byte](0))
        val pitm = fullbox("pitm", be16(primary))
        val infes = (0 until n).map { i =>
          // infe carries item_type from version 2 up (ISO 14496-12 §8.11.6)
          box("infe", Array[Byte](2, 0, 0, 0) ++ be16(i + 1) ++ be16(0) ++
            (if (i == 0) "av01" else "auxl").getBytes ++ Array[Byte](0))
        }
        val iinf = fullbox("iinf", be16(n) ++ infes.flatten.toArray)
        val ispes = (0 until n).map(_ => fullbox("ispe", be32(w) ++ be32(h)))
        val iprp = box("iprp", box("ipco", ispes.flatten.toArray))
        val meta = fullbox("meta",
          hdlr ++ pitm ++ iinf ++ iprp)
        val mdat = box("mdat", payload)
        MediaRecord(id, "image/avif", ftyp ++ meta ++ mdat)
      }
  }

  // ---- HLS media playlist census -----------------------------------

  /** One HLS media-playlist segment: parse-order index, the rolling
    * media sequence number, the EXTINF duration in EXACT integer
    * milliseconds, and the segment URI.
    */
  final case class HlsSegment(
      id: Long, segIdx: Long, seqNo: Long, durationMs: Long, uri: String)

  /** HLS media-playlist (.m3u8) census — the manifest format video
    * corpora arrive in: every segment URI with its EXTINF duration
    * and rolling sequence number (RFC 8216 §4.3.2/§4.3.3).  Durations
    * are parsed as DECIMAL STRINGS into integer milliseconds (up to
    * three fractional digits, the format's own precision) — no float
    * ever exists, so the census replays exactly in SQL.  Totality
    * contract of the text family: unknown tags are skipped, an EXTINF
    * with no following URI line is dropped, a non-#EXTM3U input
    * yields no rows.
    */
  private[graft] def hlsSegmentsOf(id: Long, m3u8: String): Seq[HlsSegment] = {
    if (m3u8 == null) return Nil
    val lines = m3u8.split("\n", -1).map(_.stripLineEnd.trim)
    if (lines.isEmpty || lines(0) != "#EXTM3U") return Nil
    var seq = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[HlsSegment]
    var i = 1
    var segIdx = 0L
    def parseMs(s: String): Option[Long] = {
      val dot = s.indexOf('.')
      val (whole, frac) =
        if (dot < 0) (s, "") else (s.substring(0, dot), s.substring(dot + 1))
      if (whole.isEmpty || !whole.forall(_.isDigit)) return None
      if (frac.length > 3 || !frac.forall(_.isDigit)) return None
      val ms = (frac + "000").substring(0, 3)
      try Some(whole.toLong * 1000L + ms.toLong)
      catch { case _: NumberFormatException => None }
    }
    while (i < lines.length) {
      val line = lines(i)
      if (line.startsWith("#EXT-X-MEDIA-SEQUENCE:")) {
        val v = line.substring(22)
        if (v.nonEmpty && v.forall(_.isDigit) && v.length <= 18) seq = v.toLong
        i += 1
      } else if (line.startsWith("#EXTINF:")) {
        val spec = line.substring(8)
        val comma = spec.indexOf(',')
        val durStr = if (comma < 0) spec else spec.substring(0, comma)
        // the URI is the next non-blank, non-tag line
        var j = i + 1
        while (j < lines.length && lines(j).isEmpty) j += 1
        (parseMs(durStr), if (j < lines.length && !lines(j).startsWith("#")) Some(lines(j)) else None) match {
          case (Some(ms), Some(uri)) =>
            out += HlsSegment(id, segIdx, seq, ms, uri)
            segIdx += 1; seq += 1
            i = j + 1
          case _ => i += 1 // malformed: skip the tag, keep scanning
        }
      } else i += 1
    }
    out.toSeq
  }

  def hlsSegments(df: DataFrame, idCol: String, m3u8Col: String): Dataset[HlsSegment] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(m3u8Col).as("v"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, v) => hlsSegmentsOf(id, v) })
  }

  /** Per-row HLS playlist synthesis: `1 + id % 6` segments, media
    * sequence starting at `id % 100`, segment k lasting
    * `1500 + (id + k) % 800` ms (written as the decimal string the
    * format uses), URI `seg<k>.ts`; a VOD ENDLIST tag on `id % 4 != 0`
    * rows so the live-playlist shape stays exercised.  Every field
    * replays from id arithmetic.
    */
  def synthesizeHls(df: DataFrame, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val nSegs = 1 + (id % 6).toInt
      val sb = new StringBuilder("#EXTM3U\n#EXT-X-VERSION:3\n")
      sb.append("#EXT-X-TARGETDURATION:").append(3 + id % 9).append('\n')
      sb.append("#EXT-X-MEDIA-SEQUENCE:").append(id % 100).append('\n')
      var k = 0
      while (k < nSegs) {
        val ms = 1500 + (id + k) % 800
        sb.append("#EXTINF:").append(ms / 1000).append('.')
          .append(f"${ms % 1000}%03d").append(",\n")
        sb.append("seg").append(k).append(".ts\n")
        k += 1
      }
      if (id % 4 != 0) sb.append("#EXT-X-ENDLIST\n")
      (id, sb.result())
    }.toDF("id", "m3u8")
  }

  // ---- SRT subtitle cues -------------------------------------------

  /** One parsed SubRip cue: the declared sequence number, the cue's
    * position in parse order, exact integer millisecond bounds, and
    * the payload text.
    */
  final case class SrtCue(
      id: Long, cueIdx: Long, seqNo: Long, startMs: Long, endMs: Long,
      text: String)

  private val SrtTiming =
    """(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3}).*""".r

  /** SubRip (.srt) cue extraction — the WebVTT sibling with the
    * comma-millisecond timestamp and a mandatory numeric sequence
    * line.  Same totality contract as [[vttCuesOf]]: malformed lines
    * are skipped, never thrown on; a timing line with no preceding
    * sequence number still yields a cue (seqNo −1), matching how
    * real-world tooling tolerates renumbered files.
    */
  private[graft] def srtCuesOf(id: Long, srt: String): Seq[SrtCue] = {
    if (srt == null) return Nil
    val lines = srt.split("\n", -1).map(_.stripLineEnd)
    val out = scala.collection.mutable.ArrayBuffer.empty[SrtCue]
    var i = 0
    var cueIdx = 0L
    def ms(h: String, m: String, s: String, t: String): Long =
      h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + t.toLong
    while (i < lines.length) {
      lines(i) match {
        case SrtTiming(h1, m1, s1, t1, h2, m2, s2, t2) =>
          val seqNo =
            if (i > 0 && lines(i - 1).nonEmpty &&
              lines(i - 1).forall(_.isDigit) && lines(i - 1).length <= 9)
              lines(i - 1).toLong
            else -1L
          val st = ms(h1, m1, s1, t1)
          val en = ms(h2, m2, s2, t2)
          i += 1
          val text = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).nonEmpty) {
            text += lines(i); i += 1
          }
          out += SrtCue(id, cueIdx, seqNo, st, en, text.mkString("\n"))
          cueIdx += 1
        case _ => i += 1
      }
    }
    out.toSeq
  }

  def srtCues(df: DataFrame, idCol: String, srtCol: String): Dataset[SrtCue] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(srtCol).as("v"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, v) => srtCuesOf(id, v) })
  }

  /** Per-row SubRip synthesis: `1 + id % 5` cues; cue k is numbered
    * `k + 1`, spans `[k·(1800 + id % 400), +1200 + id % 250)` ms, and
    * carries the document's whitespace tokens `[4k, 4k + 4)` — census,
    * timings, and payload all replay from (id, text) in plain SQL.
    */
  def synthesizeSrt(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val nc = 1 + (id % 5).toInt
        val sb = new StringBuilder
        def ts(msv: Long): String =
          f"${msv / 3600000}%02d:${msv / 60000 % 60}%02d:${msv / 1000 % 60}%02d,${msv % 1000}%03d"
        var k = 0
        while (k < nc) {
          val st = k.toLong * (1800 + id % 400)
          val en = st + 1200 + id % 250
          sb.append(k + 1).append('\n')
          sb.append(ts(st)).append(" --> ").append(ts(en)).append('\n')
          sb.append(toks.slice(k * 4, k * 4 + 4).mkString(" ")).append("\n\n")
          k += 1
        }
        (id, sb.result())
      }
      .toDF("id", "srt")
  }

  // ---- WARC census (Common Crawl's record format) ------------------

  /** One WARC record's census row: type, target URI, byte geometry.
    * `offset` is the record's byte offset inside its .warc shard,
    * `headerBytes` the version-line+named-fields+blank-line span, and
    * `contentLength` the declared (and framing-verified) block size —
    * together the seek table a 100 TB crawl consumer builds once and
    * then fetches single records with ranged reads.
    */
  final case class WarcRecord(
      id: Long, recIdx: Long, warcType: String, targetUri: String,
      offset: Long, headerBytes: Long, contentLength: Long,
      payloadDigest: String)

  /** CDX-style row for per-record-gzipped .warc.gz shards (the Common
    * Crawl convention: each record its own gzip member, so a ranged
    * GET of `[offset, offset+compLen)` gunzips to exactly one record).
    * `compLen` covers the whole member — 10-byte header through the
    * CRC32/ISIZE trailer, both VERIFIED here.
    */
  final case class WarcCdxRecord(
      id: Long, recIdx: Long, warcType: String, targetUri: String,
      offset: Long, compLen: Long, recordBytes: Long, contentLength: Long)

  /** Parse ONE WARC record starting at `start`: returns (warc-type,
    * target-uri ("" when absent), content-length, header bytes, total
    * record bytes incl. the two terminating CRLFs) or None on any
    * framing violation.  Strict per ISO 28500: `WARC/1.0|1.1` version
    * line, CRLF-terminated `Name: value` fields (names
    * case-insensitive), a mandatory parseable Content-Length, the
    * block of exactly that many bytes, then CRLF CRLF.  The header
    * scan is capped (64 KiB) so adversarial bytes can't force an
    * unbounded line walk.
    */
  private[graft] def warcRecordAt(
      b: Array[Byte],
      start: Int): Option[(String, String, Long, Int, Int, String)] = {
    val maxHeader = 64 * 1024
    if (start < 0 || start + 12 > b.length) return None
    // version line
    val v = new String(b, start, 10, "ISO-8859-1")
    if (v != "WARC/1.0\r\n" && v != "WARC/1.1\r\n") return None
    var off = start + 10
    var warcType = ""
    var uri = ""
    var digest = ""
    var clen = -1L
    var done = false
    while (!done) {
      // find CRLF; cap the scan
      var eol = off
      while (eol + 1 < b.length && !(b(eol) == '\r' && b(eol + 1) == '\n') &&
        eol - start < maxHeader) eol += 1
      if (eol + 1 >= b.length || eol - start >= maxHeader) return None
      if (eol == off) done = true // blank line: header over
      else {
        val line = new String(b, off, eol - off, "UTF-8")
        val colon = line.indexOf(':')
        if (colon <= 0) return None
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "warc-type"           => warcType = value
          case "warc-target-uri"     => uri = value
          case "warc-payload-digest" => digest = value
          case "content-length" =>
            try clen = java.lang.Long.parseLong(value)
            catch { case _: NumberFormatException => return None }
          case _ => ()
        }
      }
      off = eol + 2
    }
    if (clen < 0) return None // Content-Length is mandatory
    val headerBytes = off - start
    val blockEnd = off.toLong + clen
    if (blockEnd + 4 > b.length.toLong) return None
    val be = blockEnd.toInt
    if (!(b(be) == '\r' && b(be + 1) == '\n' &&
      b(be + 2) == '\r' && b(be + 3) == '\n')) return None
    Some((warcType, uri, clen, headerBytes,
      headerBytes + clen.toInt + 4, digest))
  }

  /** WARC shard census — the crawl-archive format LLM corpora start
    * from (ISO 28500; Common Crawl, Internet Archive).  Walks
    * concatenated records with strict framing (the tar/TFRecord
    * discipline): every record must parse and the walk must consume
    * the shard exactly, else the whole shard fails the census rather
    * than mis-seeking.  TOTAL on arbitrary bytes.
    */
  private[graft] def warcRecordsOf(r: MediaRecord): Option[Seq[WarcRecord]] = {
    val b = r.content
    if (b == null || b.length < 12) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    var idx = 0L
    while (off < b.length) {
      warcRecordAt(b, off) match {
        case Some((typ, uri, clen, hb, total, dg)) =>
          out += WarcRecord(r.id, idx, typ, uri, off.toLong, hb.toLong,
            clen, dg)
          off += total
          idx += 1
        case None => return None
      }
    }
    Some(out.toSeq)
  }

  def warcRecords(ds: Dataset[MediaRecord]): Dataset[WarcRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => warcRecordsOf(r).getOrElse(Nil)))
  }

  /** Per-record-gzipped .warc.gz census → the CDX seek table.  Walks
    * concatenated gzip members by hand: RFC 1952 header (magic, CM=8,
    * FLG with FEXTRA/FNAME/FCOMMENT/FHCRC skipped and reserved bits
    * rejected), raw-deflate inflate, then BOTH trailer words VERIFIED
    * (CRC32 of the inflated bytes, ISIZE mod 2^32) — a flipped byte
    * anywhere fails the member, and strict framing fails the shard.
    * Each member must inflate to exactly one WARC record.
    */
  /** Walk concatenated gzip members: (member offset, member total
    * bytes incl. header+trailer, inflated payload) per member, or
    * None on any framing/CRC/ISIZE violation.  The shared engine
    * under [[warcGzRecordsOf]] and [[warcGzPagesOf]].
    */
  private[graft] def gzMembersOf(
      b: Array[Byte], maxInflated: Int = 1 << 30): Option[Seq[(Long, Long, Array[Byte])]] = {
    if (b == null || b.length < 18) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    var off = 0
    while (off < b.length) {
      if (off + 10 > b.length) return None
      if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
        (b(off + 2) & 0xff) != 8) return None
      val flg = b(off + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA: u16le length + payload
        if (p + 2 > b.length) return None
        val xl = (b(p) & 0xff) | (b(p + 1) & 0xff) << 8
        p += 2 + xl
        if (p > b.length) return None
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC: u16le
        p += 2
        if (p > b.length) return None
      }
      val inf = new java.util.zip.Inflater(true)
      val inflated =
        try {
          inf.setInput(b, p, b.length - p)
          val buf = new java.io.ByteArrayOutputStream(1024)
          val chunk = new Array[Byte](8192)
          while (!inf.finished()) {
            val n =
              try inf.inflate(chunk)
              catch { case _: java.util.zip.DataFormatException => return None }
            if (n == 0 && !inf.finished()) return None // truncated stream
            buf.write(chunk, 0, n)
            if (buf.size() > maxInflated) return None
          }
          p += inf.getBytesRead.toInt
          buf.toByteArray
        } finally inf.end()
      if (p + 8 > b.length) return None
      def u32le(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
        (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
      val crc = new java.util.zip.CRC32
      crc.update(inflated)
      if (crc.getValue != u32le(p)) return None
      if ((inflated.length & 0xffffffffL) != u32le(p + 4)) return None
      p += 8
      out += ((off.toLong, (p - off).toLong, inflated))
      off = p
    }
    Some(out.toSeq)
  }

  private[graft] def warcGzRecordsOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[WarcCdxRecord]] = {
    if (r.content == null || r.content.length < 28) return None
    val members = gzMembersOf(r.content, maxInflated).getOrElse(return None)
    val out = Vector.newBuilder[WarcCdxRecord]
    var idx = 0L
    for ((off, compLen, inflated) <- members) {
      warcRecordAt(inflated, 0) match {
        case Some((typ, uri, clen, _, total, _)) if total == inflated.length =>
          out += WarcCdxRecord(r.id, idx, typ, uri, off, compLen,
            inflated.length.toLong, clen)
          idx += 1
        case _ => return None
      }
    }
    Some(out.result())
  }

  /** One crawled page: the response record's target URI + its block
    * decoded as UTF-8 — the content row the text pipeline starts
    * from.
    */
  final case class WarcPage(id: Long, recIdx: Long, targetUri: String, html: String)

  /** Content extraction from per-record-gzipped WARC shards: inflate
    * each member (CRCs verified by the shared walk), parse the
    * record, and emit the BLOCK of every `response` record as UTF-8
    * text keyed by its target URI — request/metadata records are
    * framing-checked but not emitted.  The Common Crawl entry path:
    * everything downstream (HTML strip, quality, dedup) is the
    * existing text stack.
    */
  private[graft] def warcGzPagesOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[WarcPage]] = {
    if (r.content == null || r.content.length < 18) return None
    val members = gzMembersOf(r.content, maxInflated).getOrElse(return None)
    val out = Vector.newBuilder[WarcPage]
    var idx = 0L
    for ((_, _, inflated) <- members) {
      warcRecordAt(inflated, 0) match {
        case Some((typ, uri, clen, hb, total, _)) if total == inflated.length =>
          if (typ == "response")
            out += WarcPage(r.id, idx, uri,
              new String(inflated, hb, clen.toInt, "UTF-8"))
          idx += 1
        case _ => return None
      }
    }
    Some(out.result())
  }

  def warcGzPages(ds: Dataset[MediaRecord]): Dataset[WarcPage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => warcGzPagesOf(r).getOrElse(Nil)))
  }

  /** One WET `conversion` record — Common Crawl's EXTRACTED-TEXT
    * sidecar row (the .wet.gz files most LLM text pipelines actually
    * start from, one conversion record per page).
    */
  final case class WetRecord(
      id: Long, recIdx: Long, targetUri: String, text: String)

  /** WET extraction: a .wet.gz is a per-record-gzipped WARC whose
    * lead record is `warcinfo` and whose content rows are
    * `conversion` records carrying the page's extracted plain text.
    * Rides the same CRC-verified member walk as [[warcGzPagesOf]];
    * warcinfo/metadata records are framing-checked but not emitted.
    */
  private[graft] def wetGzRecordsOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[WetRecord]] = {
    if (r.content == null || r.content.length < 18) return None
    val members = gzMembersOf(r.content, maxInflated).getOrElse(return None)
    val out = Vector.newBuilder[WetRecord]
    var idx = 0L
    for ((_, _, inflated) <- members) {
      warcRecordAt(inflated, 0) match {
        case Some((typ, uri, clen, hb, total, _)) if total == inflated.length =>
          if (typ == "conversion")
            out += WetRecord(r.id, idx, uri,
              new String(inflated, hb, clen.toInt, "UTF-8"))
          idx += 1
        case _ => return None
      }
    }
    Some(out.result())
  }

  def wetGzRecords(ds: Dataset[MediaRecord]): Dataset[WetRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => wetGzRecordsOf(r).getOrElse(Nil)))
  }

  /** One WAT `metadata` record — Common Crawl's METADATA sidecar row:
    * the target URI and the record's JSON envelope, left as a string
    * for schema-explicit downstream extraction (`get_json_object`,
    * the JSON-sidecar discipline).
    */
  final case class WatRecord(
      id: Long, recIdx: Long, targetUri: String, json: String)

  /** WAT extraction: `metadata` records whose blocks are JSON
    * envelopes (link graphs, header metadata).  Same member walk;
    * the JSON is NOT parsed here — extraction stays structural, the
    * query layer parses with an explicit schema.
    */
  private[graft] def watGzRecordsOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[WatRecord]] = {
    if (r.content == null || r.content.length < 18) return None
    val members = gzMembersOf(r.content, maxInflated).getOrElse(return None)
    val out = Vector.newBuilder[WatRecord]
    var idx = 0L
    for ((_, _, inflated) <- members) {
      warcRecordAt(inflated, 0) match {
        case Some((typ, uri, clen, hb, total, _)) if total == inflated.length =>
          if (typ == "metadata")
            out += WatRecord(r.id, idx, uri,
              new String(inflated, hb, clen.toInt, "UTF-8"))
          idx += 1
        case _ => return None
      }
    }
    Some(out.result())
  }

  def watGzRecords(ds: Dataset[MediaRecord]): Dataset[WatRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => watGzRecordsOf(r).getOrElse(Nil)))
  }

  /** Per-row .wet.gz synthesis (the Common Crawl WET shape): a
    * `warcinfo` lead member, then ONE `conversion` record carrying
    * the document's full text — each record its own gzip member.
    */
  def synthesizeWetGz(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val info = "software: graft-wet\r\n".getBytes("UTF-8")
        val payload = text.getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream(1024)
        Seq(
          warcRecordBytes(id, 0, "warcinfo", info, 0, info.length),
          warcRecordBytes(id, 1, "conversion", payload, 0, payload.length))
          .foreach { rec =>
            val member = new java.io.ByteArrayOutputStream(256)
            val gz = new java.util.zip.GZIPOutputStream(member)
            gz.write(rec)
            gz.close()
            member.writeTo(out)
          }
        MediaRecord(id, "application/warc+gz", out.toByteArray)
      }
  }

  /** Per-row .wat.gz synthesis: a `warcinfo` lead member, then one
    * `metadata` record whose block is the WAT JSON envelope —
    * `1 + id % 4` outbound links replaying from id arithmetic.
    */
  def synthesizeWatGz(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map { id =>
        val links = (0 until (1 + (id % 4)).toInt).map { k =>
          s"""{"path":"A@/href","url":"https://example.com/$id/out$k"}"""
        }.mkString(",")
        val json =
          s"""{"Envelope":{"WARC-Header-Metadata":""" +
            s"""{"WARC-Target-URI":"https://example.com/$id/1"},""" +
            s""""Payload-Metadata":{"HTTP-Response-Metadata":""" +
            s"""{"HTML-Metadata":{"Links":[$links]}}}}}"""
        val info = "software: graft-wat\r\n".getBytes("UTF-8")
        val payload = json.getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream(1024)
        Seq(
          warcRecordBytes(id, 0, "warcinfo", info, 0, info.length),
          warcRecordBytes(id, 1, "metadata", payload, 0, payload.length))
          .foreach { rec =>
            val member = new java.io.ByteArrayOutputStream(256)
            val gz = new java.util.zip.GZIPOutputStream(member)
            gz.write(rec)
            gz.close()
            member.writeTo(out)
          }
        MediaRecord(id, "application/warc+gz", out.toByteArray)
      }
  }

  /** One crawled page THROUGH its HTTP envelope: status line +
    * headers parsed out of the WARC response block (real Common Crawl
    * response records carry the raw HTTP response, not bare HTML),
    * body decoded by the Content-Type charset (utf-8 / iso-8859-1 /
    * us-ascii; anything else keeps the row with an empty body — the
    * census survives, the content step skips).
    */
  final case class WarcHttpPage(
      id: Long, recIdx: Long, targetUri: String, status: Long,
      contentType: String, charset: String, headerBytes: Long,
      body: String)

  /** Parse an HTTP/1.x response head at `b[off, off+len)`: status
    * code, lowercased media type, charset parameter, the head's
    * byte length (through the blank line), whether the body is
    * `Transfer-Encoding: chunked` (RFC 9112 — the final coding; a
    * large slice of archived responses, especially older Common
    * Crawl waves, frame bodies this way instead of Content-Length),
    * and whether it is `Content-Encoding: gzip` (the archived-web
    * compression norm — transfer-coding is removed FIRST, then the
    * content-coding).  Strict status line (`HTTP/1.<0|1> NNN …`),
    * CRLF header lines, 64 KiB head cap; header NAMES are
    * case-insensitive per RFC 9112.
    */
  private[graft] def httpResponseHeadAt(
      b: Array[Byte], off: Int,
      len: Int): Option[(Int, String, String, Int, Boolean, Boolean)] = {
    val end = off + len
    if (len < 14 || end > b.length) return None
    val v = new String(b, off, 9, "ISO-8859-1")
    if (!(v.startsWith("HTTP/1.") && (v(7) == '0' || v(7) == '1') &&
      v(8) == ' ')) return None
    var p = off + 9
    if (p + 3 > end) return None
    var status = 0
    var i = 0
    while (i < 3) {
      val c = b(p + i)
      if (c < '0' || c > '9') return None
      status = status * 10 + (c - '0')
      i += 1
    }
    // after the 3-digit code: a space (reason follows) or CR (bare)
    if (p + 3 < end && b(p + 3) != ' ' && b(p + 3) != '\r') return None
    val maxHead = 64 * 1024
    var contentType = ""
    var charset = ""
    var chunked = false
    var gzipBody = false
    // finish the status line
    var eol = p + 3
    while (eol + 1 < end && !(b(eol) == '\r' && b(eol + 1) == '\n') &&
      eol - off < maxHead) eol += 1
    if (eol + 1 >= end || eol - off >= maxHead) return None
    p = eol + 2
    var done = false
    while (!done) {
      var e2 = p
      while (e2 + 1 < end && !(b(e2) == '\r' && b(e2 + 1) == '\n') &&
        e2 - off < maxHead) e2 += 1
      if (e2 + 1 >= end || e2 - off >= maxHead) return None
      if (e2 == p) done = true
      else {
        val line = new String(b, p, e2 - p, "ISO-8859-1")
        val colon = line.indexOf(':')
        if (colon <= 0) return None
        val hname = line.substring(0, colon).trim
        if (hname.equalsIgnoreCase("content-type")) {
          val value = line.substring(colon + 1).trim.toLowerCase
          val semi = value.indexOf(';')
          contentType = (if (semi >= 0) value.substring(0, semi) else value).trim
          val cs = value.indexOf("charset=")
          if (cs >= 0) {
            val rest = value.substring(cs + 8)
            val stop = rest.indexWhere(c => c == ';' || c == ' ')
            charset = (if (stop >= 0) rest.substring(0, stop) else rest)
              .stripPrefix("\"").stripSuffix("\"")
          }
        } else if (hname.equalsIgnoreCase("transfer-encoding")) {
          // chunked must be the FINAL coding per RFC 9112 §6.1
          val codings = line.substring(colon + 1).toLowerCase
            .split(',').map(_.trim).filter(_.nonEmpty)
          chunked = codings.nonEmpty && codings.last == "chunked"
        } else if (hname.equalsIgnoreCase("content-encoding")) {
          // single gzip content-coding (the archived-web norm);
          // stacked/unknown codings leave the body undecoded —
          // censused, not garbled
          val v = line.substring(colon + 1).trim.toLowerCase
          gzipBody = v == "gzip" || v == "x-gzip"
        }
      }
      p = e2 + 2
    }
    Some((status, contentType, charset, p - off, chunked, gzipBody))
  }

  /** De-chunk an RFC 9112 §7.1 chunked body occupying EXACTLY
    * `b[off, off+len)`: hex chunk-size line (optional `;ext`
    * chunk extensions dropped), CRLF, that many data bytes, CRLF,
    * repeated to the `0` last-chunk, then optional trailer header
    * lines and the final CRLF.  The body must consume the span
    * exactly (the WARC block's own Content-Length frames it) — the
    * strict-framing discipline of every census walk here.  Bomb
    * guard on the de-chunked size; None on any violation, never a
    * throw.
    */
  private[graft] def httpDechunkAt(
      b: Array[Byte], off: Int, len: Int,
      maxDechunked: Int = 1 << 30): Option[Array[Byte]] = {
    val end = off + len
    if (b == null || off < 0 || len < 0 || end > b.length) return None
    val out = new java.io.ByteArrayOutputStream(math.min(len, 1 << 16))
    var p = off
    var last = false
    while (!last) {
      var eol = p
      while (eol + 1 < end && !(b(eol) == '\r' && b(eol + 1) == '\n') &&
        eol - p < 1024) eol += 1
      if (eol + 1 >= end || eol - p >= 1024) return None
      val line = new String(b, p, eol - p, "ISO-8859-1")
      val semi = line.indexOf(';')
      val hexs = (if (semi >= 0) line.substring(0, semi) else line).trim
      if (hexs.isEmpty || hexs.length > 8 ||
        !hexs.forall(c => Character.digit(c, 16) >= 0)) return None
      val sz = java.lang.Long.parseLong(hexs, 16)
      p = eol + 2
      if (sz == 0L) {
        last = true
        // trailer section: zero or more `Name: value` lines, final CRLF
        var done = false
        while (!done) {
          var e2 = p
          while (e2 + 1 < end && !(b(e2) == '\r' && b(e2 + 1) == '\n') &&
            e2 - p < 8192) e2 += 1
          if (e2 + 1 >= end || e2 - p >= 8192) return None
          if (e2 == p) done = true
          else if (new String(b, p, e2 - p, "ISO-8859-1").indexOf(':') <= 0)
            return None
          p = e2 + 2
        }
      } else {
        if (sz > (end - p).toLong - 2L) return None
        if (out.size().toLong + sz > maxDechunked) return None
        out.write(b, p, sz.toInt)
        p += sz.toInt
        if (!(b(p) == '\r' && b(p + 1) == '\n')) return None
        p += 2
      }
    }
    if (p != end) return None // must consume the block exactly
    Some(out.toByteArray)
  }

  /** WARC response records parsed THROUGH their HTTP envelope —
    * the faithful Common Crawl content path.  Non-response records
    * are framing-checked and skipped; a response whose block is not
    * a parseable HTTP response fails the SHARD (strict, like every
    * census walk here).
    */
  private[graft] def warcGzHttpPagesOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[WarcHttpPage]] = {
    if (r.content == null || r.content.length < 18) return None
    val members = gzMembersOf(r.content, maxInflated).getOrElse(return None)
    val out = Vector.newBuilder[WarcHttpPage]
    var idx = 0L
    for ((_, _, inflated) <- members) {
      warcRecordAt(inflated, 0) match {
        case Some((typ, uri, clen, hb, total, _)) if total == inflated.length =>
          if (typ == "response") {
            httpResponseHeadAt(inflated, hb, clen.toInt) match {
              case Some((status, ct, cs, headLen, chunked, gzipBody)) =>
                val bodyOff = hb + headLen
                val bodyLen = clen.toInt - headLen
                // transfer-coding FIRST (RFC 9112 §7.1 de-chunk),
                // then the content-coding (gunzip) — the content
                // chain must be byte-identical to a plain twin; a
                // malformed framing at either layer fails the SHARD
                // like any census violation
                val (cb, co, cl) =
                  if (chunked) {
                    val d = httpDechunkAt(inflated, bodyOff, bodyLen)
                      .getOrElse(return None)
                    (d, 0, d.length)
                  } else (inflated, bodyOff, bodyLen)
                val (bb, bo, bl) =
                  if (gzipBody && cl > 0) {
                    // exactly ONE gzip member spanning the body —
                    // CRC32 + ISIZE verified by the shared walk
                    val span = java.util.Arrays
                      .copyOfRange(cb, co, co + cl)
                    gzMembersOf(span, maxInflated) match {
                      case Some(Seq((_, _, payload))) =>
                        (payload, 0, payload.length)
                      case _ => return None
                    }
                  } else (cb, co, cl)
                val body = cs match {
                  case "" | "utf-8" | "utf8" =>
                    new String(bb, bo, bl, "UTF-8")
                  case "iso-8859-1" | "us-ascii" | "latin-1" =>
                    new String(bb, bo, bl, "ISO-8859-1")
                  case _ => "" // unknown charset: censused, not decoded
                }
                out += WarcHttpPage(r.id, idx, uri, status.toLong, ct, cs,
                  headLen.toLong, body)
              case None => return None
            }
          }
          idx += 1
        case _ => return None
      }
    }
    Some(out.result())
  }

  def warcGzHttpPages(ds: Dataset[MediaRecord]): Dataset[WarcHttpPage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => warcGzHttpPagesOf(r).getOrElse(Nil)))
  }

  /** Per-row crawl-faithful .warc.gz synthesis: the response member's
    * block is a REAL HTTP response — status line (404 for id % 7 == 0
    * with a fixed not-found body, else 200), Content-Type with
    * charset, Content-Length, a Server header — wrapping the page
    * payload.  One request + one response member per page, like
    * [[synthesizeWarcGzPages]].
    */
  def synthesizeWarcGzHttp(df: DataFrame, idCol: String, htmlCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(htmlCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, html) =>
        val notFound = id % 7 == 0
        val bodyBytes =
          (if (notFound) "not found" else html).getBytes("UTF-8")
        // every third page frames its body CHUNKED (no
        // Content-Length, Transfer-Encoding: chunked, 11-byte
        // chunks, a chunk extension on the first, a trailer
        // header); every fifth-mod-2 page gzips it
        // (Content-Encoding: gzip — content-coding applied FIRST,
        // then the transfer-coding, per RFC 9110 §8.4) — the
        // content chain must be byte-identical to the plain twins
        // through every combination
        val chunkedArm = id % 3 == 1
        val gzipArm = id % 5 == 2 && bodyBytes.nonEmpty
        val encoded =
          if (gzipArm) {
            val o = new java.io.ByteArrayOutputStream(bodyBytes.length)
            val gz = new java.util.zip.GZIPOutputStream(o)
            gz.write(bodyBytes); gz.close()
            o.toByteArray
          } else bodyBytes
        val head = (s"HTTP/1.1 ${if (notFound) "404 Not Found" else "200 OK"}\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n" +
          (if (gzipArm) "Content-Encoding: gzip\r\n" else "") +
          (if (chunkedArm) "Transfer-Encoding: chunked\r\n"
           else s"Content-Length: ${encoded.length}\r\n") +
          "Server: graft\r\n\r\n").getBytes("ISO-8859-1")
        val bodyWire =
          if (chunkedArm) {
            val o = new java.io.ByteArrayOutputStream(encoded.length + 64)
            var i = 0
            var first = true
            while (i < encoded.length) {
              val take = math.min(11, encoded.length - i)
              val ext = if (first) ";x=1" else ""
              o.write(s"${take.toHexString}$ext\r\n".getBytes("ISO-8859-1"))
              o.write(encoded, i, take)
              o.write('\r'); o.write('\n')
              i += take
              first = false
            }
            o.write("0\r\nX-Trace: graft\r\n\r\n".getBytes("ISO-8859-1"))
            o.toByteArray
          } else encoded
        val block = head ++ bodyWire
        val out = new java.io.ByteArrayOutputStream(1024)
        Seq(
          warcRecordBytes(id, 0, "request", Array.emptyByteArray, 0, 0),
          warcRecordBytes(id, 1, "response", block, 0, block.length))
          .foreach { rec =>
            val member = new java.io.ByteArrayOutputStream(256)
            val gz = new java.util.zip.GZIPOutputStream(member)
            gz.write(rec)
            gz.close()
            member.writeTo(out)
          }
        MediaRecord(id, "application/warc+gz", out.toByteArray)
      }
  }

  def warcGzRecords(ds: Dataset[MediaRecord]): Dataset[WarcCdxRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => warcGzRecordsOf(r).getOrElse(Nil)))
  }

  /** Builds the per-document plain-WARC record bytes the two
    * synthesizers share: `1 + id % 3` records (type cycling
    * response/request/metadata), a fixed-width record id, a constant
    * date, the document's UTF-8 bytes split across the records by the
    * tar rule — every header field's byte length replays from
    * (doc_id, octet_length(text)) in the oracle.
    */
  /** One framed WARC record over `payload[from, from+take)`. */
  private[graft] def warcRecordBytes(
      id: Long, k: Int, typ: String, payload: Array[Byte],
      from: Int, take: Int, digest: String = null,
      uriOverride: String = null): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(typ).append("\r\n")
    if (digest != null)
      sb.append("WARC-Payload-Digest: ").append(digest).append("\r\n")
    sb.append(f"WARC-Record-ID: <urn:uuid:$id%010d-$k%d>\r\n")
    sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    if (uriOverride != null)
      sb.append("WARC-Target-URI: ").append(uriOverride).append("\r\n")
    else
      sb.append("WARC-Target-URI: https://example.com/")
        .append(id).append('/').append(k).append("\r\n")
    sb.append("Content-Type: text/plain\r\n")
    sb.append("Content-Length: ").append(take).append("\r\n")
    sb.append("\r\n")
    val header = sb.result().getBytes("ISO-8859-1")
    val rec = new Array[Byte](header.length + take + 4)
    System.arraycopy(header, 0, rec, 0, header.length)
    System.arraycopy(payload, from, rec, header.length, take)
    rec(header.length + take) = '\r'
    rec(header.length + take + 1) = '\n'
    rec(header.length + take + 2) = '\r'
    rec(header.length + take + 3) = '\n'
    rec
  }

  private def warcRecordChunks(id: Long, text: String): Seq[Array[Byte]] = {
    val payload = text.getBytes("UTF-8")
    val ns = 1 + (id % 3).toInt
    (0 until ns).map { k =>
      val take = payload.length / ns + (if (k < payload.length % ns) 1 else 0)
      val from = (0 until k).map(j =>
        payload.length / ns + (if (j < payload.length % ns) 1 else 0)).sum
      val typ = (k % 3) match {
        case 0 => "response"
        case 1 => "request"
        case _ => "metadata"
      }
      warcRecordBytes(id, k, typ, payload, from, take)
    }
  }

  /** Per-row plain .warc shard synthesis (records concatenated). */
  def synthesizeWarc(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val out = Array.newBuilder[Byte]
        warcRecordChunks(id, text).foreach(out ++= _)
        MediaRecord(id, "application/warc", out.result())
      }
  }

  /** Per-row .warc shard with the crawl's own DEDUP signal: the
    * response record (k = 0) carries a WARC-Payload-Digest
    * (`md5:<md5hex(id + ":" + text)>` — deterministic and unique per
    * document, so the oracle replays it in SQL), and even ids append
    * one `revisit` record (the convention crawlers emit instead of
    * re-storing an unchanged page: zero-length block, the SAME
    * digest, its own target URI).  The revisit→original resolution
    * is then a pure digest equi-join over the census — the step a
    * 100 TB crawl consumer runs before extraction so revisited pages
    * aren't processed twice.
    */
  def synthesizeWarcRevisit(
      df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val digest = "md5:" + java.security.MessageDigest
          .getInstance("MD5").digest(s"$id:$text".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val payload = text.getBytes("UTF-8")
        val ns = 1 + (id % 3).toInt
        val out = Array.newBuilder[Byte]
        (0 until ns).foreach { k =>
          val take =
            payload.length / ns + (if (k < payload.length % ns) 1 else 0)
          val from = (0 until k).map(j =>
            payload.length / ns + (if (j < payload.length % ns) 1 else 0)).sum
          val typ = (k % 3) match {
            case 0 => "response"
            case 1 => "request"
            case _ => "metadata"
          }
          out ++= warcRecordBytes(id, k, typ, payload, from, take,
            digest = if (typ == "response") digest else null)
        }
        if (id % 2 == 0)
          out ++= warcRecordBytes(id, ns, "revisit", payload, 0, 0,
            digest = digest,
            uriOverride = s"https://example.com/$id/re0")
        MediaRecord(id, "application/warc", out.result())
      }
  }

  /** Per-row .warc.gz shard synthesis: the SAME records as
    * [[synthesizeWarc]], each compressed as its own gzip member (the
    * Common Crawl random-access convention).
    */
  def synthesizeWarcGz(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val out = new java.io.ByteArrayOutputStream(1024)
        warcRecordChunks(id, text).foreach { rec =>
          // one member per record; close() releases the native Deflater
          val member = new java.io.ByteArrayOutputStream(256)
          val gz = new java.util.zip.GZIPOutputStream(member)
          gz.write(rec)
          gz.close()
          member.writeTo(out)
        }
        MediaRecord(id, "application/warc+gz", out.toByteArray)
      }
  }

  // ---- content sniffing ---------------------------------------------------

  /** Magic-byte format detection — the intake stage before any
    * per-format census: a production lake never promises its
    * extensions are honest, so classify-by-magic, THEN dispatch to
    * the format's walk.  Ordered checks over the headers the engine's
    * own parsers gate on; ZIP containers get a second-stage refine
    * ([[sniffZipRefine]]: `zip:epub` / `zip:ooxml` / `zip:jar` from
    * the first local-file header), and formats without any magic
    * (TFRecord, JSONL) are honestly "unknown".  TOTAL on arbitrary
    * bytes.
    */
  /** Second-stage refinement for ZIP containers: peek the FIRST
    * local-file header's name — EPUB's OCF rule puts a STORED
    * `mimetype` entry first (content `application/epub+zip`), OOXML
    * packages lead with `[Content_Types].xml`, and JARs with
    * `META-INF/` — so the intake dispatch can route packaged
    * documents to their own censuses (`zip:epub` → [[epubMetaOf]])
    * instead of the generic zip walk.  Anything else stays "zip".
    */
  private def sniffZipRefine(b: Array[Byte]): String = {
    if (b.length < 30) return "zip"
    val method = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val nameLen = (b(26) & 0xff) | ((b(27) & 0xff) << 8)
    val extraLen = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    if (nameLen == 0 || nameLen > 512 || 30 + nameLen > b.length)
      return "zip"
    val name = new String(b, 30, nameLen, "ISO-8859-1")
    val dataOff = 30 + nameLen + extraLen
    val epubMime = "application/epub+zip".getBytes("ISO-8859-1")
    if (name == "mimetype" && method == 0 &&
      dataOff + epubMime.length <= b.length && {
        var i = 0
        while (i < epubMime.length && b(dataOff + i) == epubMime(i)) i += 1
        i == epubMime.length
      }) "zip:epub"
    else if (name == "[Content_Types].xml") "zip:ooxml"
    else if (name.startsWith("META-INF/")) "zip:jar"
    else "zip"
  }

  private[graft] def sniffKind(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "empty"
    def at(off: Int, s: String): Boolean = {
      val m = s.getBytes("ISO-8859-1")
      off >= 0 && off + m.length <= b.length && {
        var i = 0
        while (i < m.length && b(off + i) == m(i)) i += 1
        i == m.length
      }
    }
    if (at(0, "%PDF-")) "pdf"
    else if (at(0, "PK") && b.length >= 4 && b(2) == 3 && b(3) == 4)
      sniffZipRefine(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) "gzip"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) "zstd"
    else if (at(0, "WARC/1.")) "warc"
    else if (at(0, "ARROW1") && b.length >= 8 && b(6) == 0 && b(7) == 0) "arrow-ipc"
    else if (at(0, "PAR1")) "parquet"
    // encrypted-footer parquet uses PARE at both ends — route it AWAY
    // from the plaintext footer census (which would throw, not None)
    else if (at(0, "PARE")) "parquet-encrypted"
    else if ((b(0) & 0xff) == 0x89 && at(1, "PNG")) "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) "jpeg"
    else if (at(0, "GIF8")) "gif"
    else if (at(0, "RIFF") && at(8, "WEBP")) "webp"
    else if (at(0, "RIFF") && at(8, "WAVE")) "wav"
    else if (at(0, "fLaC")) "flac"
    else if (at(0, "OggS")) "ogg"
    else if (at(0, "GGUF")) "gguf"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3) "webm"
    // ISO BMFF: refine by the ftyp MAJOR BRAND (bytes 8-11) so the
    // dispatch routes stills (avif/heic) and movies (mp4/mov) to
    // their own censuses; unknown brands stay the bare container
    else if (at(4, "ftyp")) {
      if (at(8, "avif") || at(8, "avis")) "isobmff:avif"
      else if (at(8, "heic") || at(8, "heix") || at(8, "hevc") ||
        at(8, "mif1")) "isobmff:heic"
      else if (at(8, "isom") || at(8, "iso2") || at(8, "mp41") ||
        at(8, "mp42") || at(8, "dash") || at(8, "avc1")) "isobmff:mp4"
      else if (at(8, "M4A ")) "isobmff:m4a"
      else if (at(8, "qt  ")) "isobmff:mov"
      else "isobmff"
    }
    else if ((b(0) & 0xff) == 0x93 && at(1, "NUMPY")) "npy"
    // tar's magic sits at offset 257 — deep, so check it BEFORE the
    // weak 2-3-byte prefixes below: a tar whose first member NAME
    // starts with "BM"/"ORC"/"ID3"/"Obj" must not misclassify
    else if (at(257, "ustar")) "tar"
    else if (at(0, "II") && b.length >= 4 && b(2) == 42 && b(3) == 0) "tiff"
    else if (at(0, "MM") && b.length >= 4 && b(2) == 0 && b(3) == 42) "tiff"
    // BigTIFF (version 43) dispatches to the same TIFF census
    else if (at(0, "II") && b.length >= 4 && b(2) == 43 && b(3) == 0) "tiff"
    else if (at(0, "MM") && b.length >= 4 && b(2) == 0 && b(3) == 43) "tiff"
    else if (at(0, "ORC")) "orc"
    else if (at(0, "BM")) "bmp"
    else if (at(0, "ID3")) "mp3-id3"
    else if (at(0, "Obj") && b.length >= 4 && b(3) == 1) "avro"
    else "unknown"
  }

  def sniff(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(r => (r.id, sniffKind(r.content))))
      .toDF("id", "kind")
  }

  // ---- EPUB census ------------------------------------------------------

  /** One EPUB's census row: the OPF package path from container.xml,
    * member/manifest/spine counts — the e-book intake metadata (the
    * PDF census's packaged-document sibling).
    */
  final case class EpubMeta(
      id: Long, opfPath: String, nMembers: Long, nManifest: Long,
      nSpine: Long, nBytes: Long)

  /** EPUB census — a constrained ZIP (OCF, ISO/IEC 23736): rides
    * [[zipMembersOf]]'s EOCD-first walk, then enforces the OCF rules
    * a reader depends on — the FIRST member must be `mimetype`,
    * STORED, with exactly `application/epub+zip` as content (read at
    * the local header's own name/extra lengths); `META-INF/
    * container.xml` must exist and name the OPF via `full-path`; the
    * OPF (also STORED here) yields manifest/spine counts by tag scan.
    * Compressed members would need the deflate step a census doesn't
    * take — non-STORE mimetype/container/OPF reject honestly.  TOTAL
    * on arbitrary bytes.
    */
  private[graft] def epubMetaOf(r: MediaRecord): Option[EpubMeta] = {
    val b = r.content
    val members = zipMembersOf(r).getOrElse(return None)
    if (members.isEmpty) return None
    def storedPayload(m: ZipMember): Option[String] = {
      if (m.method != 0L) return None
      val lo = m.localOff.toInt
      if (lo < 0 || lo + 30 > b.length) return None
      def u16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
      val dataOff = lo + 30 + u16(lo + 26) + u16(lo + 28)
      if (dataOff + m.compSize > b.length.toLong) return None
      Some(new String(b, dataOff, m.compSize.toInt, "UTF-8"))
    }
    val first = members.head
    if (first.name != "mimetype") return None
    if (!storedPayload(first).contains("application/epub+zip")) return None
    val container = members.find(_.name == "META-INF/container.xml")
      .getOrElse(return None)
    val cxml = storedPayload(container).getOrElse(return None)
    val fp = "full-path=\"([^\"]+)\"".r.findFirstMatchIn(cxml)
      .map(_.group(1)).getOrElse(return None)
    val opf = members.find(_.name == fp).getOrElse(return None)
    val oxml = storedPayload(opf).getOrElse(return None)
    val nManifest = "<item ".r.findAllMatchIn(oxml).length.toLong
    val nSpine = "<itemref".r.findAllMatchIn(oxml).length.toLong
    Some(EpubMeta(r.id, fp, members.length.toLong, nManifest, nSpine,
      b.length.toLong))
  }

  def epubMeta(ds: Dataset[MediaRecord]): Dataset[EpubMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(epubMetaOf))
  }

  /** Per-row EPUB synthesis: a spec-shaped OCF container — `mimetype`
    * first and STORED, container.xml naming `OEBPS/content.opf`, an
    * OPF with `1 + id % 3` chapters, one XHTML member per chapter
    * carrying the tar-rule text split; classic ZIP with real CRCs
    * (the JDK's ZipInputStream reads it back — the zip family's
    * independent-reader discipline applies transitively).
    */
  def synthesizeEpub(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val n = 1 + (id % 3).toInt
        val chapters = (0 until n).map { k =>
          val take = payload.length / n + (if (k < payload.length % n) 1 else 0)
          val from = (0 until k).map(j => payload.length / n +
            (if (j < payload.length % n) 1 else 0)).sum
          s"OEBPS/ch$k.xhtml" ->
            ("<html><body><p>" +
              new String(payload, from, take, "UTF-8") +
              "</p></body></html>").getBytes("UTF-8")
        }
        val opf = ("<?xml version=\"1.0\"?><package version=\"3.0\">" +
          "<manifest>" +
          (0 until n).map(k =>
            s"""<item id="c$k" href="ch$k.xhtml" media-type="application/xhtml+xml"/>""")
            .mkString +
          "</manifest><spine>" +
          (0 until n).map(k => s"""<itemref idref="c$k"/>""").mkString +
          "</spine></package>").getBytes("UTF-8")
        val container = ("<?xml version=\"1.0\"?><container version=\"1.0\">" +
          "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
          "media-type=\"application/oebps-package+xml\"/></rootfiles>" +
          "</container>").getBytes("UTF-8")
        val members: Seq[(String, Array[Byte])] =
          Seq("mimetype" -> "application/epub+zip".getBytes("US-ASCII"),
            "META-INF/container.xml" -> container,
            "OEBPS/content.opf" -> opf) ++ chapters
        // classic STORE zip with real CRCs
        def u16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def u32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        val crc = new java.util.zip.CRC32
        val out = Array.newBuilder[Byte]
        val locals = members.map { case (name, data) =>
          crc.reset(); crc.update(data)
          val nb = name.getBytes("US-ASCII")
          val off = out.knownSize.toLong
          out ++= Array[Byte](0x50, 0x4b, 0x03, 0x04) ++ u16a(20) ++
            u16a(0) ++ u16a(0) ++ u16a(0) ++ u16a(0) ++ u32a(crc.getValue) ++
            u32a(data.length.toLong) ++ u32a(data.length.toLong) ++
            u16a(nb.length) ++ u16a(0) ++ nb ++ data
          (name, data, crc.getValue, off)
        }
        val cdOff = out.knownSize.toLong
        locals.foreach { case (name, data, c, off) =>
          val nb = name.getBytes("US-ASCII")
          out ++= Array[Byte](0x50, 0x4b, 0x01, 0x02) ++ u16a(20) ++ u16a(20) ++
            u16a(0) ++ u16a(0) ++ u16a(0) ++ u16a(0) ++ u32a(c) ++
            u32a(data.length.toLong) ++ u32a(data.length.toLong) ++
            u16a(nb.length) ++ u16a(0) ++ u16a(0) ++ u16a(0) ++
            u16a(0) ++ u32a(0L) ++ u32a(off) ++ nb
        }
        val cdSize = out.knownSize.toLong - cdOff
        out ++= Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ u16a(0) ++ u16a(0) ++
          u16a(locals.length) ++ u16a(locals.length) ++
          u32a(cdSize) ++ u32a(cdOff) ++ u16a(0)
        MediaRecord(id, "application/epub+zip", out.result())
      }
  }

  // ---- JSONL shard census ---------------------------------------------

  /** One JSONL record's seek-table row: byte offset and length of its
    * line inside the shard, plus the raw line for the caller's parse
    * step — the per-record random-access index the newline-delimited
    * dataset convention (Dolma, HF datasets) implies but never ships.
    */
  final case class JsonlRecord(
      id: Long, recIdx: Long, offset: Long, nBytes: Long, line: String)

  /** JSONL shard census — the LLM-dataset staple (one JSON document
    * per line).  Structural walk only: record boundaries are newline
    * bytes, strict framing requires the shard to END with one (a
    * truncated tail line means a truncated shard — fail, never emit a
    * half record).  Line VALIDITY is the caller's parse step
    * (`get_json_object` / `from_json`), not the census's: a malformed
    * line still owns its bytes in the seek table, exactly like the
    * engine's JSONL source quarantine discipline.  TOTAL on arbitrary
    * bytes.
    */
  private[graft] def jsonlRecordsOf(r: MediaRecord): Option[Seq[JsonlRecord]] = {
    val b = r.content
    if (b == null || b.length == 0) return None
    if (b(b.length - 1) != '\n') return None // strict: no truncated tail
    val out = Vector.newBuilder[JsonlRecord]
    var start = 0
    var idx = 0L
    var i = 0
    while (i < b.length) {
      if (b(i) == '\n') {
        out += JsonlRecord(r.id, idx, start.toLong, (i - start).toLong,
          new String(b, start, i - start, "UTF-8"))
        idx += 1
        start = i + 1
      }
      i += 1
    }
    Some(out.result())
  }

  def jsonlRecords(ds: Dataset[MediaRecord]): Dataset[JsonlRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => jsonlRecordsOf(r).getOrElse(Nil)))
  }

  /** `.jsonl.zst` flavor (Dolma's actual wire format): bomb-guarded
    * zstd inflate, then the same walk — the compression layer must be
    * invisible to the record table (the .tar.gz/.tar.zst law).
    */
  private[graft] def jsonlZstRecordsOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[JsonlRecord]] = {
    zstdInflate(r.content, maxInflated).flatMap(raw =>
      jsonlRecordsOf(MediaRecord(r.id, "application/jsonl", raw)))
  }

  def jsonlZstRecords(ds: Dataset[MediaRecord]): Dataset[JsonlRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => jsonlZstRecordsOf(r).getOrElse(Nil)))
  }

  /** Per-row JSONL shard synthesis: `1 + id % 4` records of
    * `{"id":"<doc>-<k>","seq":k,"n":<take>}` (take = the tar split of
    * the text's byte length — ASCII lines, so every offset replays as
    * octet_length arithmetic); every (id + k) % 7 == 0 line loses its
    * closing brace — the malformed-line arm the caller's parse step
    * must quarantine without losing the seek-table row.
    */
  def synthesizeJsonlShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val tn = text.getBytes("UTF-8").length
        val ns = 1 + (id % 4).toInt
        val sb = new StringBuilder
        var k = 0
        while (k < ns) {
          val take = tn / ns + (if (k < tn % ns) 1 else 0)
          val full = s"""{"id":"$id-$k","seq":$k,"n":$take}"""
          sb.append(
            if ((id + k) % 7 == 0) full.substring(0, full.length - 1)
            else full)
          sb.append('\n')
          k += 1
        }
        MediaRecord(id, "application/jsonl",
          sb.result().getBytes("ISO-8859-1"))
      }
  }

  /** [[synthesizeJsonlShard]] zstd-compressed at a fixed level. */
  def synthesizeJsonlZstShard(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    synthesizeJsonlShard(df, idCol, textCol).map { r =>
      MediaRecord(r.id, "application/zstd",
        com.github.luben.zstd.Zstd.compress(r.content, 3))
    }
  }

  // ---- BGZF blocked gzip (the SAM-spec random-access convention) ----

  /** One BGZF block's census row: the declared total block size
    * (BSIZE+1 from the BC extra subfield) and the inflated size — the
    * seek geometry for ranged single-block reads.
    */
  final case class BgzfBlock(
      id: Long, blockIdx: Long, offset: Long, bsize: Long, isize: Long)

  /** BGZF census — blocked gzip with per-member BC extra subfields
    * declaring each block's compressed size (the random-access gzip
    * convention; bgzip output, also seen on large text corpora).
    * Rides the CRC-verified member walk, then REQUIRES per member:
    * FEXTRA present, a `BC` subfield with SLEN=2, and BSIZE+1 equal
    * to the member's ACTUAL compressed length (a lying BSIZE would
    * mis-seek every later block — reject).  The final block must be
    * the spec's empty EOF marker (isize 0).  TOTAL on arbitrary
    * bytes.
    */
  private[graft] def bgzfBlocksOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[BgzfBlock]] = {
    val b = r.content
    if (b == null || b.length < 28) return None
    val members = gzMembersOf(b, maxInflated).getOrElse(return None)
    if (members.isEmpty) return None
    val out = Vector.newBuilder[BgzfBlock]
    var idx = 0L
    for ((off, compLen, inflated) <- members) {
      // header: FEXTRA must be set; find the BC subfield
      val o = off.toInt
      val flg = b(o + 3) & 0xff
      if ((flg & 4) == 0) return None
      val xlen = (b(o + 10) & 0xff) | ((b(o + 11) & 0xff) << 8)
      var p = o + 12
      val xEnd = p + xlen
      if (xEnd > b.length) return None
      var bsize = -1L
      while (p + 4 <= xEnd) {
        val si1 = b(p) & 0xff
        val si2 = b(p + 1) & 0xff
        val slen = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
        if (p + 4 + slen > xEnd) return None
        if (si1 == 'B' && si2 == 'C') {
          if (slen != 2) return None
          bsize = ((b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8)) + 1
        }
        p += 4 + slen
      }
      if (bsize < 0) return None // not a BGZF member
      if (bsize != compLen) return None // lying BSIZE would mis-seek
      out += BgzfBlock(r.id, idx, off, bsize, inflated.length.toLong)
      idx += 1
    }
    // the spec's trailer: an empty EOF block ends the file
    if (members.last._3.length != 0) return None
    Some(out.result())
  }

  def bgzfBlocks(ds: Dataset[MediaRecord]): Dataset[BgzfBlock] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => bgzfBlocksOf(r).getOrElse(Nil)))
  }

  /** Build ONE BGZF block: fixed gzip header with the BC extra
    * subfield (BSIZE = total - 1), raw-deflate payload, CRC32 +
    * ISIZE trailer.
    */
  private def bgzfBlockBytes(chunk: Array[Byte]): Array[Byte] = {
    val deflated = deflateRaw(chunk)
    val total = 18 + deflated.length + 8
    require(total <= 65536, "BGZF blocks cap at 64 KiB")
    val out = new java.io.ByteArrayOutputStream(total)
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0,
      0xff.toByte)) // header, FEXTRA, XFL=0, OS=unknown
    out.write(6); out.write(0) // XLEN = 6
    out.write('B'); out.write('C'); out.write(2); out.write(0)
    val bs = total - 1
    out.write(bs & 0xff); out.write((bs >> 8) & 0xff)
    out.write(deflated)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk)
    def wLE32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    wLE32(crc.getValue)
    wLE32(chunk.length.toLong)
    out.toByteArray
  }

  /** Per-row BGZF synthesis: the document's text split into
    * `1 + id % 3` blocks plus the spec's empty EOF marker block.
    */
  def synthesizeBgzf(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val nb = 1 + (id % 3).toInt
        val out = new java.io.ByteArrayOutputStream(payload.length + 128)
        var from = 0
        var k = 0
        while (k < nb) {
          val take = payload.length / nb +
            (if (k < payload.length % nb) 1 else 0)
          out.write(bgzfBlockBytes(
            java.util.Arrays.copyOfRange(payload, from, from + take)))
          from += take
          k += 1
        }
        out.write(bgzfBlockBytes(Array.emptyByteArray)) // EOF marker
        MediaRecord(id, "application/bgzf", out.toByteArray)
      }
  }

  // ---- zstd SEEKABLE format (contrib/seekable_format spec) ----------

  /** One seekable-zstd frame's seek-table row: the (compressed,
    * decompressed) offset/size geometry a ranged reader needs to
    * fetch exactly one frame.
    */
  final case class ZstdSeekFrame(
      id: Long, frameIdx: Long, cOffset: Long, cSize: Long,
      dOffset: Long, dSize: Long)

  /** Parse a zstd SEEKABLE file's seek table (the random-access
    * convention for .zst shards — zstd's contrib/seekable_format):
    * the file is N independent zstd frames followed by ONE skippable
    * frame (magic 0x184D2A5E) holding per-frame (compressed size,
    * decompressed size[, XXH64-low32 checksum]) entries and a 9-byte
    * footer (LE frame count, descriptor byte, seekable magic
    * 0x8F92EAB1).  STRICT: the skippable frame's declared size must
    * equal the table, compressed sizes must tile the data region
    * exactly, and every frame's first 4 bytes must be the zstd frame
    * magic; when the checksum flag is set, each frame is INFLATED
    * and its XXH64 low-32 verified — a corrupt frame fails its
    * census instead of mis-seeking every later read.  TOTAL on
    * arbitrary bytes.
    */
  private[graft] def zstdSeekTableOf(
      r: MediaRecord, maxInflated: Int = 1 << 30): Option[Seq[ZstdSeekFrame]] = {
    val b = r.content
    if (b == null || b.length < 17) return None
    val n = b.length
    @inline def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (u32(n - 4) != 0x8f92eab1L) return None // seekable magic
    val descriptor = b(n - 5) & 0xff
    if ((descriptor & 0x7c) != 0) return None // reserved bits must be 0
    val hasChecksum = (descriptor & 0x80) != 0
    val nFrames = u32(n - 9)
    if (nFrames < 0 || nFrames > 10000000L) return None
    val entrySize = 8 + (if (hasChecksum) 4 else 0)
    val tableSize = nFrames * entrySize + 9
    val skipStart = n - 8 - tableSize
    if (skipStart < 0) return None
    if (u32(skipStart.toInt) != 0x184d2a5eL) return None // skippable magic
    if (u32(skipStart.toInt + 4) != tableSize) return None
    val out = Vector.newBuilder[ZstdSeekFrame]
    var cOff = 0L
    var dOff = 0L
    var e = skipStart + 8
    var i = 0L
    while (i < nFrames) {
      val cSize = u32(e.toInt)
      val dSize = u32(e.toInt + 4)
      if (cSize < 4 || cOff + cSize > skipStart) return None
      // the frame at this offset must BE a zstd frame
      if (u32(cOff.toInt) != 0xfd2fb528L) return None
      if (hasChecksum) {
        // XXH64 low 32 bits of the DECOMPRESSED frame, per spec
        val frame = java.util.Arrays.copyOfRange(
          b, cOff.toInt, (cOff + cSize).toInt)
        val plain = zstdInflate(frame, maxInflated).getOrElse(return None)
        if (plain.length.toLong != dSize) return None
        val h = net.jpountz.xxhash.XXHashFactory.fastestInstance()
          .hash64().hash(plain, 0, plain.length, 0L)
        if ((h & 0xffffffffL) != u32(e.toInt + 8)) return None
      }
      out += ZstdSeekFrame(r.id, i, cOff, cSize, dOff, dSize)
      cOff += cSize
      dOff += dSize
      e += entrySize
      i += 1
    }
    if (cOff != skipStart) return None // frames must tile exactly
    Some(out.result())
  }

  def zstdSeekTable(ds: Dataset[MediaRecord]): Dataset[ZstdSeekFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => zstdSeekTableOf(r).getOrElse(Nil)))
  }

  /** Per-row seekable-zstd synthesis: the document's text split into
    * `1 + id % 4` chunks, each an INDEPENDENT zstd frame, plus the
    * spec's seek-table skippable frame — odd ids carry per-frame
    * XXH64 checksums.  Chunk byte sizes replay from octet_length
    * arithmetic; compressed sizes are the codec's own (pinned by the
    * census's strict tiling, not by the oracle).
    */
  def synthesizeSeekableZstd(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val nf = 1 + (id % 4).toInt
        val withChecksum = id % 2 == 1
        val out = new java.io.ByteArrayOutputStream(payload.length + 256)
        val entries = new java.io.ByteArrayOutputStream(nf * 12)
        def wLE32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
          o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
          o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
        }
        var from = 0
        var k = 0
        while (k < nf) {
          val take = payload.length / nf +
            (if (k < payload.length % nf) 1 else 0)
          val chunk = java.util.Arrays.copyOfRange(payload, from, from + take)
          val frame = com.github.luben.zstd.Zstd.compress(chunk, 3)
          out.write(frame)
          wLE32(entries, frame.length.toLong)
          wLE32(entries, take.toLong)
          if (withChecksum) {
            val h = net.jpountz.xxhash.XXHashFactory.fastestInstance()
              .hash64().hash(chunk, 0, chunk.length, 0L)
            wLE32(entries, h & 0xffffffffL)
          }
          from += take
          k += 1
        }
        val table = entries.toByteArray
        wLE32(out, 0x184d2a5eL) // skippable frame magic
        wLE32(out, table.length.toLong + 9)
        out.write(table)
        wLE32(out, nf.toLong)
        out.write(if (withChecksum) 0x80 else 0x00)
        wLE32(out, 0x8f92eab1L)
        MediaRecord(id, "application/zstd-seekable", out.toByteArray)
      }
  }

  // ---- PDF census ----------------------------------------------------

  /** One PDF's census row: header version, object count from the
    * trailer's /Size, page count from the page-tree root's /Count
    * (resolved THROUGH the cross-reference entries, never a literal
    * scan), the startxref target, section count across the /Prev
    * chain, the layout kind (`classic`, `xref-stream`, or `hybrid`),
    * and total bytes — the metadata a document-corpus intake pass
    * needs before any content extraction.
    */
  final case class PdfMeta(
      id: Long, version: String, nObjects: Long, nPages: Long,
      xrefOffset: Long, nSections: Long, layout: String, nBytes: Long,
      encrypted: Boolean = false)

  // PDF lexical helpers (ISO 32000-1 §7.2): a name token ends at
  // whitespace or a delimiter — `/Type/Pages` and `/Type /Pages` are
  // the same two names, `/TypeX` is a different one.
  private def isPdfWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == '\u0000'
  private def isPdfDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Index of name `key` ("/Type") in `s` at-or-after `from`, only
    * where the token actually ENDS there (next char is whitespace, a
    * delimiter, or end-of-string).
    */
  private def pdfNameAt(s: String, key: String, from: Int = 0): Int = {
    var i = s.indexOf(key, from)
    while (i >= 0) {
      val end = i + key.length
      if (end >= s.length || isPdfWs(s(end)) || isPdfDelim(s(end)))
        return i
      i = s.indexOf(key, i + 1)
    }
    -1
  }

  /** The balanced `<< ... >>` dictionary starting at the first `<<`
    * at-or-after `from`: respects nested dicts, literal strings (with
    * backslash escapes), hex strings, and comments.  Returns the dict
    * text and the index just past its `>>`.  Bounded by `limit`.
    */
  private def pdfDictAt(
      s: String, from: Int, limit: Int = 1 << 16): Option[(String, Int)] = {
    val start = s.indexOf("<<", from)
    if (start < 0 || start - from > limit) return None
    var i = start
    var depth = 0
    val end = math.min(s.length, start + limit)
    while (i < end) {
      val c = s(i)
      if (c == '<' && i + 1 < end && s(i + 1) == '<') { depth += 1; i += 2 }
      else if (c == '>' && i + 1 < end && s(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some((s.substring(start, i), i))
      } else if (c == '(') { // literal string, \-escapes, nested parens
        var d = 1; i += 1
        while (i < end && d > 0) {
          if (s(i) == '\\') i += 2
          else {
            if (s(i) == '(') d += 1 else if (s(i) == ')') d -= 1
            i += 1
          }
        }
      } else if (c == '<') { // hex string
        i += 1
        while (i < end && s(i) != '>') i += 1
        i += 1
      } else if (c == '%') { // comment to EOL
        while (i < end && s(i) != '\r' && s(i) != '\n') i += 1
      } else i += 1
    }
    None
  }

  /** `/Key 123` → 123 (token-boundary-checked key). */
  private def pdfDictLong(dict: String, key: String): Option[Long] = {
    val at = pdfNameAt(dict, key)
    if (at < 0) return None
    val rest = dict.substring(at + key.length).dropWhile(isPdfWs)
    val d = rest.takeWhile(_.isDigit)
    if (d.isEmpty || d.length > 12) None else Some(d.toLong)
  }

  /** `/Key 12 0 R` indirect reference → object number 12. */
  private def pdfDictRef(dict: String, key: String): Option[Long] = {
    val at = pdfNameAt(dict, key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && isPdfWs(dict(i))) i += 1
    val n0 = i
    while (i < dict.length && dict(i).isDigit) i += 1
    if (i == n0 || i - n0 > 12) return None
    val num = dict.substring(n0, i).toLong
    while (i < dict.length && isPdfWs(dict(i))) i += 1
    val g0 = i
    while (i < dict.length && dict(i).isDigit) i += 1
    if (i == g0 || i - g0 > 7) return None
    while (i < dict.length && isPdfWs(dict(i))) i += 1
    if (i >= dict.length || dict(i) != 'R') return None
    Some(num)
  }

  /** `/Key /Name` → "Name" (both tokens boundary-checked). */
  private def pdfDictName(dict: String, key: String): Option[String] = {
    val at = pdfNameAt(dict, key)
    if (at < 0) return None
    val rest = dict.substring(at + key.length).dropWhile(isPdfWs)
    if (rest.isEmpty || rest(0) != '/') return None
    val nm = rest.drop(1)
      .takeWhile(c => !isPdfWs(c) && !isPdfDelim(c))
    if (nm.isEmpty) None else Some(nm)
  }

  /** `/Key [1 2 3]` → Vector(1, 2, 3); rejects non-integer items. */
  private def pdfDictIntArray(
      dict: String, key: String): Option[Vector[Long]] = {
    val at = pdfNameAt(dict, key)
    if (at < 0) return None
    val ob = dict.indexOf('[', at + key.length)
    if (ob < 0) return None
    if (!dict.substring(at + key.length, ob).forall(isPdfWs)) return None
    val cb = dict.indexOf(']', ob)
    if (cb < 0) return None
    val toks =
      dict.substring(ob + 1, cb).split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty ||
      !toks.forall(t => t.length <= 12 && t.forall(_.isDigit))) None
    else Some(toks.map(_.toLong).toVector)
  }

  // one cross-reference entry, keyed by object number
  private[graft] sealed trait PdfXrefEntry
  private[graft] final case class PdfInUse(off: Long) extends PdfXrefEntry
  private[graft] final case class PdfInObjStm(stm: Long, idx: Long)
    extends PdfXrefEntry
  private[graft] case object PdfFreeObj extends PdfXrefEntry

  /** zlib-wrapped inflate (RFC 1950 — PDF's FlateDecode), bounded. */
  private[graft] def inflateZlibSpan(
      b: Array[Byte], off: Int, len: Int,
      maxInflated: Int = 1 << 26): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(false)
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64, len * 4), 1 << 16))
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && !inf.finished()) return None
        out.write(buf, 0, n)
        if (out.size() > maxInflated) return None // bomb guard
      }
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** zlib-wrapped deflate — the synthesis side of
    * [[inflateZlibSpan]] (PDF's FlateDecode framing).
    */
  private[graft] def zlibDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length))
      val buf = new Array[Byte](64 * 1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Undo the /Predictor transform on decoded stream data: 1 = none,
    * 2 = TIFF horizontal, 10-15 = PNG per-row filters (each row is a
    * filter byte then `columns` bytes; bpp = 1 for the xref-stream
    * default Colors=1/BitsPerComponent=8).  Returns None on a length
    * that doesn't divide into rows or an unknown filter byte.
    */
  private def pdfUnpredict(
      data: Array[Byte], predictor: Int, columns: Int): Option[Array[Byte]] = {
    if (predictor <= 1) return Some(data)
    if (columns <= 0 || columns > (1 << 20)) return None
    if (predictor == 2) { // TIFF: horizontal difference per row
      if (data.length % columns != 0) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = 1
        while (i < columns) {
          out(r + i) = (out(r + i) + out(r + i - 1)).toByte
          i += 1
        }
        r += columns
      }
      return Some(out)
    }
    if (predictor < 10 || predictor > 15) return None
    val rowLen = columns + 1 // PNG: filter byte leads each row
    if (data.length % rowLen != 0) return None
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    val prior = new Array[Byte](columns) // zero row above the first
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      val src = r * rowLen + 1
      val dst = r * columns
      var i = 0
      while (i < columns) {
        val raw = data(src + i) & 0xff
        val left = if (i > 0) out(dst + i - 1) & 0xff else 0
        val up = prior(i) & 0xff
        val upLeft = if (i > 0) prior(i - 1) & 0xff else 0
        val rec = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(dst + i) = rec.toByte
        i += 1
      }
      System.arraycopy(out, dst, prior, 0, columns)
      r += 1
    }
    Some(out)
  }

  /** Parse `N G obj << dict >>` at absolute offset `off`; returns
    * (objNum, dictText, absolute index just past the dict).  The
    * window is ISO-8859-1 so string indices ARE byte offsets.
    */
  private def pdfObjHeaderAt(
      b: Array[Byte], off: Long,
      window: Int = 1 << 16): Option[(Long, String, Int)] = {
    if (off < 0 || off >= b.length - 6) return None
    val o = off.toInt
    val w = math.min(b.length - o, window)
    val s = new String(b, o, w, "ISO-8859-1")
    var i = 0
    val n0 = i
    while (i < s.length && s(i).isDigit) i += 1
    if (i == n0 || i - n0 > 12) return None
    val num = s.substring(n0, i).toLong
    if (i >= s.length || !isPdfWs(s(i))) return None
    while (i < s.length && isPdfWs(s(i))) i += 1
    val g0 = i
    while (i < s.length && s(i).isDigit) i += 1
    if (i == g0 || i - g0 > 7) return None
    while (i < s.length && isPdfWs(s(i))) i += 1
    if (!s.startsWith("obj", i)) return None
    val (dict, dEnd) = pdfDictAt(s, i + 3, w).getOrElse(return None)
    Some((num, dict, o + dEnd))
  }

  /** Raw stream bytes for an object whose dict ends at absolute
    * `dictEnd`: expects ws* `stream` EOL, then `length` bytes in
    * range.  Returns the absolute data offset.
    */
  private def pdfStreamDataAt(
      b: Array[Byte], dictEnd: Int, length: Long): Option[Int] = {
    if (length < 0 || length > (64L << 20)) return None // census bound
    var i = dictEnd
    while (i < b.length && isPdfWs((b(i) & 0xff).toChar)) i += 1
    if (i + 6 > b.length) return None
    if (!(b(i) == 's' && b(i + 1) == 't' && b(i + 2) == 'r' &&
      b(i + 3) == 'e' && b(i + 4) == 'a' && b(i + 5) == 'm')) return None
    i += 6
    // spec: the keyword is followed by CRLF or LF (not bare CR)
    if (i < b.length && b(i) == '\r') i += 1
    if (i >= b.length || b(i) != '\n') return None
    i += 1
    if (i.toLong + length > b.length) return None
    Some(i)
  }

  /** Decode one object's stream payload honoring /Filter (none or
    * FlateDecode) and /DecodeParms /Predictor + /Columns.
    */
  private def pdfDecodedStream(
      b: Array[Byte], dict: String, dictEnd: Int): Option[Array[Byte]] = {
    val length = pdfDictLong(dict, "/Length").getOrElse(return None)
    val dataOff = pdfStreamDataAt(b, dictEnd, length).getOrElse(return None)
    val filter = pdfDictName(dict, "/Filter")
    val raw = filter match {
      case None =>
        java.util.Arrays.copyOfRange(b, dataOff, dataOff + length.toInt)
      case Some("FlateDecode") =>
        inflateZlibSpan(b, dataOff, length.toInt).getOrElse(return None)
      case Some(_) => return None // out of the census envelope
    }
    val predictor =
      pdfDictLong(dict, "/Predictor").map(_.toInt).getOrElse(1)
    val columns = pdfDictLong(dict, "/Columns").map(_.toInt).getOrElse(1)
    pdfUnpredict(raw, predictor, columns)
  }

  /** One classic `xref` section at `xo`: entries (object number →
    * offset/free) and the trailer dict text.  The span is capped: a
    * lying offset near 0 of a huge file must not force a file-sized
    * string (xref+trailer is ~20 B per object — 32 MiB admits ~1.6M
    * objects).
    */
  private def pdfClassicSectionAt(
      b: Array[Byte], xo: Int): Option[(Vector[(Long, PdfXrefEntry)], String)] = {
    val span = math.min(b.length - xo, 32 << 20)
    if (span < 4) return None
    val text = new String(b, xo, span, "ISO-8859-1")
    if (!text.startsWith("xref")) return None
    val entries = Vector.newBuilder[(Long, PdfXrefEntry)]
    var nEntries = 0L
    val lines = text.split("\r\n|\r|\n").iterator
    lines.next() // the "xref" keyword line
    var trailerAt = -1
    while (trailerAt < 0 && lines.hasNext) {
      val line = lines.next().trim
      if (line.startsWith("trailer")) trailerAt = 0
      else if (line.isEmpty) () // tolerated blank
      else {
        val parts = line.split(" +")
        if (parts.length != 2 ||
          !parts.forall(p => p.length <= 12 && p.forall(_.isDigit)))
          return None
        val first = parts(0).toLong
        val count = parts(1).toLong
        if (count < 0 || count > 1000000) return None
        nEntries += count
        if (nEntries > 2000000) return None
        var i = 0L
        while (i < count) {
          if (!lines.hasNext) return None
          val e = lines.next()
          // entry: 10-digit offset, 5-digit gen, f|n
          if (e.length < 18) return None
          val off10 = e.substring(0, 10)
          val kind = e.charAt(17)
          if (!off10.forall(_.isDigit) || (kind != 'n' && kind != 'f'))
            return None
          if (kind == 'n') {
            if (off10.toLong >= b.length) return None
            entries += ((first + i, PdfInUse(off10.toLong)))
          } else entries += ((first + i, PdfFreeObj))
          i += 1
        }
      }
    }
    if (trailerAt < 0) return None
    val tAt = text.indexOf("trailer")
    if (tAt < 0) return None
    val (trailer, _) = pdfDictAt(text, tAt + 7).getOrElse(return None)
    Some((entries.result(), trailer))
  }

  /** One cross-reference STREAM section (PDF 1.5+, ISO 32000-1
    * §7.5.8) at `xo`: `N G obj` + a /Type/XRef stream whose decoded
    * rows are W-width big-endian fields over the /Index subsections;
    * type 0 = free, 1 = in-use at offset, 2 = in an object stream.
    * Returns (entries, the stream dict — which doubles as the
    * trailer).
    */
  private def pdfXrefStreamSectionAt(
      b: Array[Byte], xo: Int): Option[(Vector[(Long, PdfXrefEntry)], String)] = {
    val (_, dict, dictEnd) = pdfObjHeaderAt(b, xo.toLong).getOrElse(return None)
    if (!pdfDictName(dict, "/Type").contains("XRef")) return None
    val size = pdfDictLong(dict, "/Size").getOrElse(return None)
    if (size <= 0 || size > 2000000) return None
    val w = pdfDictIntArray(dict, "/W").getOrElse(return None)
    if (w.length != 3 || w.exists(x => x < 0 || x > 8) || w.sum == 0)
      return None
    val index = pdfDictIntArray(dict, "/Index")
      .getOrElse(Vector(0L, size))
    if (index.length % 2 != 0) return None
    val totalRows = index.grouped(2).map(_(1)).sum
    if (totalRows < 0 || totalRows > 2000000) return None
    val rowLen = w.sum.toInt
    val data = pdfDecodedStream(b, dict, dictEnd).getOrElse(return None)
    if (data.length.toLong != totalRows * rowLen) return None
    val entries = Vector.newBuilder[(Long, PdfXrefEntry)]
    var row = 0
    for (pair <- index.grouped(2)) {
      val first = pair(0)
      val count = pair(1)
      if (first < 0 || count < 0) return None
      var i = 0L
      while (i < count) {
        val base = row * rowLen
        def field(skip: Int, width: Int): Long = {
          var v = 0L
          var j = 0
          while (j < width) { v = (v << 8) | (data(base + skip + j) & 0xffL); j += 1 }
          v
        }
        // w1 == 0 → type defaults to 1 (the spec's stated default)
        val t = if (w(0) == 0) 1L else field(0, w(0).toInt)
        val f2 = field(w(0).toInt, w(1).toInt)
        val f3 = field(w(0).toInt + w(1).toInt, w(2).toInt)
        t match {
          case 0 => entries += ((first + i, PdfFreeObj))
          case 1 =>
            if (f2 >= b.length) return None
            entries += ((first + i, PdfInUse(f2)))
          case 2 => entries += ((first + i, PdfInObjStm(f2, f3)))
          case _ => return None
        }
        row += 1
        i += 1
      }
    }
    Some((entries.result(), dict))
  }

  /** PDF structure census — the document-corpus format (papers,
    * books, reports) next to the web/media families.  From-spec walk
    * of ISO 32000-1: `%PDF-1.x` header gate, `startxref` located in
    * the spec's last-1024-byte window, then the FULL cross-reference
    * chain: classic `xref` tables AND cross-reference streams (PDF
    * 1.5+ — /W field widths, /Index subsections, FlateDecode with
    * PNG/TIFF predictors, type-0/1/2 entries), following trailer
    * `/Prev` links across incremental updates and hybrid-reference
    * `/XRefStm` pointers, newest-entry-wins.  The distinct objects
    * covered by the chain must account for the newest trailer's
    * /Size, every in-use offset must lie inside the file, and the
    * page count is resolved THROUGH the xref: catalog → /Pages →
    * page-tree root's /Count, names tokenized per spec
    * (`/Type/Pages` without whitespace included), objects inside
    * object streams (/Type/ObjStm) extracted via their embedded
    * offset table.  TOTAL on arbitrary bytes.
    */
  /** The resolved cross-reference CHAIN of a PDF: entry map
    * (newest-wins), newest /Size and /Root, section count, layout
    * kind, startxref target, header version.
    */
  private[graft] final case class PdfChain(
      entries: Map[Long, PdfXrefEntry], size: Long, rootRef: Long,
      nSections: Long, layout: String, xrefOffset: Long, version: String,
      encrypted: Boolean = false)

  /** Walk the full cross-reference chain (classic tables, xref
    * streams, /Prev links, hybrid /XRefStm) — the shared first step
    * of the structure census and the text extraction.  See
    * [[pdfMetaOf]] for the envelope description.
    */
  private[graft] def pdfChainOf(b: Array[Byte]): Option[PdfChain] = {
    if (b == null || b.length < 32) return None
    // header: %PDF-1.x (ISO 32000-1) or %PDF-2.0 (ISO 32000-2)
    val head = new String(b, 0, math.min(16, b.length), "ISO-8859-1")
    if (!head.startsWith("%PDF-")) return None
    val version =
      if (head.startsWith("%PDF-1.") && head(7) >= '0' && head(7) <= '7')
        "1." + head(7)
      else if (head.startsWith("%PDF-2.0")) "2.0"
      else return None
    // startxref in the last-1024-byte window, then the offset line
    val tailStart = math.max(0, b.length - 1024)
    val tail = new String(b, tailStart, b.length - tailStart, "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return None
    val after = tail.substring(sx + 9)
    val digits = after.dropWhile(c => c == '\r' || c == '\n' || c == ' ')
      .takeWhile(_.isDigit)
    if (digits.isEmpty || digits.length > 10) return None
    val xrefOffset = digits.toLong
    if (xrefOffset < 9 || xrefOffset >= b.length - 4) return None
    // walk the chain newest→oldest; first-seen wins per object number
    val entries = scala.collection.mutable.HashMap.empty[Long, PdfXrefEntry]
    val visited = scala.collection.mutable.HashSet.empty[Long]
    var size = -1L
    var rootRef = -1L
    var nSections = 0L
    var sawClassic = false
    var sawStream = false
    var sawHybrid = false
    var encrypted = false
    var encChecked = false
    var pending = List(xrefOffset)
    while (pending.nonEmpty) {
      val off = pending.head
      pending = pending.tail
      if (!visited.add(off)) return None // cycle: corrupt chain
      if (visited.size > 64) return None // runaway chain
      if (off < 0 || off >= b.length - 4) return None
      nSections += 1
      val classic = b(off.toInt) == 'x' && b(off.toInt + 1) == 'r' &&
        b(off.toInt + 2) == 'e' && b(off.toInt + 3) == 'f'
      val (secEntries, trailer) =
        if (classic) {
          sawClassic = true
          pdfClassicSectionAt(b, off.toInt).getOrElse(return None)
        } else {
          sawStream = true
          pdfXrefStreamSectionAt(b, off.toInt).getOrElse(return None)
        }
      // hybrid-reference: the classic trailer's /XRefStm entries take
      // precedence over this section's (its in-objstm objects are
      // marked free here for pre-1.5 readers) — apply them FIRST
      if (classic) pdfDictLong(trailer, "/XRefStm").foreach { so =>
        sawHybrid = true
        if (so < 0 || so >= b.length - 4) return None
        if (!visited.add(so)) return None
        nSections += 1
        val (stmEntries, _) =
          pdfXrefStreamSectionAt(b, so.toInt).getOrElse(return None)
        stmEntries.foreach { case (n, e) =>
          if (!entries.contains(n)) entries(n) = e
        }
      }
      secEntries.foreach { case (n, e) =>
        if (!entries.contains(n)) entries(n) = e
      }
      if (size < 0)
        size = pdfDictLong(trailer, "/Size").getOrElse(return None)
      if (rootRef < 0)
        rootRef = pdfDictRef(trailer, "/Root").getOrElse(-1L)
      if (!encChecked) {
        // the NEWEST trailer rules: a standard-security-handler PDF
        // carries /Encrypt there — detect it so the census can say
        // "encrypted" instead of dropping the doc as if corrupt when
        // its FlateDecode later fails on RC4/AES stream bytes
        encChecked = true
        encrypted = pdfNameAt(trailer, "/Encrypt") >= 0
      }
      pdfDictLong(trailer, "/Prev").foreach { p => pending = p :: pending }
    }
    if (rootRef < 0) return None
    // the chain's distinct objects must account for the newest /Size
    if (size != entries.size) return None
    val layout =
      if (sawHybrid || (sawClassic && sawStream)) "hybrid"
      else if (sawStream) "xref-stream"
      else "classic"
    Some(PdfChain(entries.toMap, size, rootRef, nSections, layout,
      xrefOffset, version, encrypted))
  }

  /** Resolve an object's DICT through the xref (object streams
    * included — the /Type/ObjStm offset-table extraction); depth-
    * capped.
    */
  private[graft] def pdfObjDict(
      b: Array[Byte], entries: Map[Long, PdfXrefEntry], num: Long,
      depth: Int = 0): Option[String] = {
    if (depth > 4) return None
    entries.get(num) match {
      case Some(PdfInUse(off)) =>
        val (n, dict, _) = pdfObjHeaderAt(b, off).getOrElse(return None)
        if (n != num) None else Some(dict)
      case Some(PdfInObjStm(stm, idx)) =>
        entries.get(stm) match {
          case Some(PdfInUse(soff)) =>
            val (sn, sdict, sEnd) =
              pdfObjHeaderAt(b, soff).getOrElse(return None)
            if (sn != stm) return None
            if (!pdfDictName(sdict, "/Type").contains("ObjStm")) return None
            val nObjs = pdfDictLong(sdict, "/N").getOrElse(return None)
            val firstOff = pdfDictLong(sdict, "/First").getOrElse(return None)
            if (idx < 0 || idx >= nObjs || nObjs > 100000) return None
            val data = pdfDecodedStream(b, sdict, sEnd).getOrElse(return None)
            if (firstOff > data.length) return None
            val header = new String(data, 0, firstOff.toInt, "ISO-8859-1")
            val toks = header.split("\\s+").filter(_.nonEmpty)
            if (toks.length < 2 * nObjs) return None
            if (!toks.take(2 * nObjs.toInt)
              .forall(t => t.length <= 12 && t.forall(_.isDigit)))
              return None
            val objNum = toks(2 * idx.toInt).toLong
            if (objNum != num) return None
            val rel = firstOff + toks(2 * idx.toInt + 1).toLong
            val to = if (idx.toInt == nObjs - 1) data.length.toLong
                     else firstOff + toks(2 * idx.toInt + 3).toLong
            if (rel < firstOff || to > data.length || rel >= to) return None
            val text =
              new String(data, rel.toInt, (to - rel).toInt, "ISO-8859-1")
            pdfDictAt(text, 0).map(_._1)
          case _ => None
        }
      case _ => None
    }
  }

  /** Resolve an object's decoded STREAM payload through the xref
    * (type-1 entries only — streams cannot live inside object
    * streams, per spec).
    */
  private def pdfObjStream(
      b: Array[Byte], entries: Map[Long, PdfXrefEntry],
      num: Long): Option[Array[Byte]] = {
    entries.get(num) match {
      case Some(PdfInUse(off)) =>
        val (n, dict, dEnd) = pdfObjHeaderAt(b, off).getOrElse(return None)
        if (n != num) None else pdfDecodedStream(b, dict, dEnd)
      case _ => None
    }
  }

  private[graft] def pdfMetaOf(r: MediaRecord): Option[PdfMeta] = {
    val b = r.content
    val chain = pdfChainOf(b).getOrElse(return None)
    val catalog = pdfObjDict(b, chain.entries, chain.rootRef)
      .getOrElse(return None)
    // /Type/Catalog gate (tokenized: no-whitespace form included)
    if (!pdfDictName(catalog, "/Type").contains("Catalog")) return None
    val pagesRef = pdfDictRef(catalog, "/Pages").getOrElse(return None)
    val pages = pdfObjDict(b, chain.entries, pagesRef, 1)
      .getOrElse(return None)
    if (!pdfDictName(pages, "/Type").contains("Pages")) return None
    val nPages = pdfDictLong(pages, "/Count").getOrElse(return None)
    if (nPages < 0) return None
    Some(PdfMeta(r.id, chain.version, chain.size, nPages,
      chain.xrefOffset, chain.nSections, chain.layout, b.length.toLong,
      chain.encrypted))
  }

  def pdfMeta(ds: Dataset[MediaRecord]): Dataset[PdfMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(pdfMetaOf))
  }

  /** One extracted PDF page: its index in reading order and the text
    * shown by the page's content stream(s).
    */
  final case class PdfPageText(id: Long, pageIdx: Long, text: String)

  /** A composite (Type0) font's code→text mapping extracted from its
    * ToUnicode CMap: `codeBytes` is the code width in bytes (1 or 2 —
    * the Identity-H world), `map` sends each code to the UTF-16
    * string its bfchar/bfrange entry declares.
    */
  final case class PdfCodeMap(codeBytes: Int, map: Map[Int, String])

  /** Parse a decoded ToUnicode CMap stream (the PostScript-dialect
    * subset every producer emits): `begincodespacerange` pairs fix
    * the code width (all ranges must agree; 1 or 2 bytes supported —
    * absent ranges infer the width from the first mapping),
    * `beginbfchar` pairs map one code to a UTF-16BE string, and
    * `beginbfrange` triples map a code span either by INCREMENT
    * (`<lo> <hi> <dstStart>` — the last UTF-16 unit advances with the
    * code, the rule every reader implements) or by ARRAY
    * (`<lo> <hi> [ <d0> <d1> … ]`, one destination per code).  TOTAL
    * on arbitrary bytes: None on malformed hex, width mismatches,
    * inverted or oversized ranges, or > 65536 total mappings.
    */
  private[graft] def pdfCMapOf(data: Array[Byte]): Option[PdfCodeMap] = {
    if (data == null || data.length > (8 << 20)) return None
    val s = new String(data, "ISO-8859-1")
    val n = s.length
    var i = 0
    // tokens: hex strings (Array[Byte]), '[' / ']', keywords; numbers
    // and names are skipped — only structure-bearing tokens survive
    sealed trait Tok
    case class Hex(b: Array[Byte]) extends Tok
    case object ArrOpen extends Tok
    case object ArrClose extends Tok
    case class Kw(w: String) extends Tok
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    while (i < n) {
      val c = s(i)
      if (isPdfWs(c)) i += 1
      else if (c == '%') { while (i < n && s(i) != '\r' && s(i) != '\n') i += 1 }
      else if (c == '<' && i + 1 < n && s(i + 1) == '<') {
        i += 2 // dict open (e.g. /CIDSystemInfo << … >>): not a hex string
      } else if (c == '(') { // literal string (e.g. (Adobe)): skip whole
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s(i)
          if (ch == '\\') i += 2
          else {
            if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
            i += 1
          }
        }
        if (depth != 0) return None
      } else if (c == '<') {
        val o = new java.io.ByteArrayOutputStream(8)
        i += 1
        var hi = -1
        var closed = false
        while (i < n && !closed) {
          val ch = s(i)
          if (ch == '>') { closed = true; i += 1 }
          else if (isPdfWs(ch)) i += 1
          else {
            val v =
              if (ch >= '0' && ch <= '9') ch - '0'
              else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
              else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
              else return None
            if (hi < 0) hi = v else { o.write((hi << 4) | v); hi = -1 }
            i += 1
          }
        }
        if (!closed || hi >= 0) return None // odd digits in a CMap: reject
        toks += Hex(o.toByteArray)
        if (toks.length > 300000) return None
      } else if (c == '[') {
        toks += ArrOpen; i += 1
        // cap EVERY push: an adversarial CMap of 8 MiB of '[' would
        // otherwise accumulate ~8M tokens before any rejection
        if (toks.length > 300000) return None
      } else if (c == ']') {
        toks += ArrClose; i += 1
        if (toks.length > 300000) return None
      }
      else if (c == '/') { // name: skip
        i += 1
        while (i < n && !isPdfWs(s(i)) && !isPdfDelim(s(i))) i += 1
      } else if (isPdfDelim(c)) i += 1
      else {
        val start = i
        while (i < n && !isPdfWs(s(i)) && !isPdfDelim(s(i))) i += 1
        val w = s.substring(start, i)
        if (w.nonEmpty && (w(0).isLetter)) toks += Kw(w)
        if (toks.length > 300000) return None
      }
    }
    var codeBytes = -1
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    def codeOf(b: Array[Byte]): Option[Int] = {
      if (codeBytes < 0) {
        if (b.length != 1 && b.length != 2) return None
        codeBytes = b.length
      }
      if (b.length != codeBytes) return None
      var v = 0
      b.foreach(x => v = (v << 8) | (x & 0xff))
      Some(v)
    }
    def utf16Of(b: Array[Byte]): Option[String] = {
      if (b.length % 2 != 0 || b.length > 512) return None
      val sb = new StringBuilder(b.length / 2)
      var j = 0
      while (j < b.length) {
        sb += (((b(j) & 0xff) << 8) | (b(j + 1) & 0xff)).toChar
        j += 2
      }
      Some(sb.toString)
    }
    var t = 0
    while (t < toks.length) {
      toks(t) match {
        case Kw("begincodespacerange") =>
          t += 1
          while (t < toks.length && toks(t) != Kw("endcodespacerange")) {
            (toks(t), if (t + 1 < toks.length) toks(t + 1) else Kw("")) match {
              case (Hex(lo), Hex(hi)) =>
                if (lo.length != hi.length) return None
                if (codeBytes < 0) {
                  if (lo.length != 1 && lo.length != 2) return None
                  codeBytes = lo.length
                } else if (lo.length != codeBytes) return None
                t += 2
              case _ => return None
            }
          }
          if (t >= toks.length) return None
          t += 1
        case Kw("beginbfchar") =>
          t += 1
          while (t < toks.length && toks(t) != Kw("endbfchar")) {
            (toks(t), if (t + 1 < toks.length) toks(t + 1) else Kw("")) match {
              case (Hex(src), Hex(dst)) =>
                val c = codeOf(src).getOrElse(return None)
                map(c) = utf16Of(dst).getOrElse(return None)
                if (map.size > 65536) return None
                t += 2
              case _ => return None
            }
          }
          if (t >= toks.length) return None
          t += 1
        case Kw("beginbfrange") =>
          t += 1
          while (t < toks.length && toks(t) != Kw("endbfrange")) {
            if (t + 2 >= toks.length) return None
            (toks(t), toks(t + 1)) match {
              case (Hex(lob), Hex(hib)) =>
                val lo = codeOf(lob).getOrElse(return None)
                val hi = codeOf(hib).getOrElse(return None)
                if (hi < lo || hi - lo >= 65536) return None
                toks(t + 2) match {
                  case Hex(dst) => // increment form
                    val base = utf16Of(dst).getOrElse(return None)
                    if (base.isEmpty) return None
                    var c = lo
                    while (c <= hi) {
                      val lastUnit = (base.last + (c - lo)).toChar
                      map(c) = base.init + lastUnit
                      c += 1
                    }
                    if (map.size > 65536) return None
                    t += 3
                  case ArrOpen => // array form: one dst per code
                    t += 3
                    var c = lo
                    while (t < toks.length && toks(t) != ArrClose) {
                      toks(t) match {
                        case Hex(dst) =>
                          if (c > hi) return None
                          map(c) = utf16Of(dst).getOrElse(return None)
                          c += 1
                          t += 1
                        case _ => return None
                      }
                    }
                    if (t >= toks.length || c != hi + 1) return None
                    if (map.size > 65536) return None
                    t += 1
                  case _ => return None
                }
              case _ => return None
            }
          }
          if (t >= toks.length) return None
          t += 1
        case _ => t += 1
      }
    }
    if (codeBytes < 0) return None // no ranges and no mappings: useless
    Some(PdfCodeMap(codeBytes, map.toMap))
  }

  /** Decode a PDF name token's `#xx` escapes (ISO 32000-1 §7.3.5):
    * `F#31` → "F1".  A `#` not followed by two hex digits passes
    * through verbatim (lenient, like every reader).  Applied to font
    * RESOURCE names on both the declaration and the Tf-operand side,
    * so `/F#31` and `/F1` resolve to the same key.
    */
  private def pdfDecodeName(s: String): String = {
    if (s.indexOf('#') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    def hexV(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (i < s.length) {
      val c = s(i)
      if (c == '#' && i + 2 < s.length &&
        hexV(s(i + 1)) >= 0 && hexV(s(i + 2)) >= 0) {
        sb += ((hexV(s(i + 1)) << 4) | hexV(s(i + 2))).toChar
        i += 3
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Resolve a dict VALUE that is itself a dictionary: inline
    * `<< … >>` after the key, or an indirect reference through the
    * xref.
    */
  private def pdfDictValueDict(
      b: Array[Byte], entries: Map[Long, PdfXrefEntry],
      dict: String, key: String): Option[String] = {
    val at = pdfNameAt(dict, key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && isPdfWs(dict(i))) i += 1
    if (i + 1 < dict.length && dict(i) == '<' && dict(i + 1) == '<')
      pdfDictAt(dict, i).map(_._1)
    else pdfDictRef(dict, key).flatMap(r => pdfObjDict(b, entries, r))
  }

  /** Resolve a page (or Pages) node's font RESOURCES to code maps:
    * /Resources (inline or indirect) → /Font (inline or indirect) →
    * one entry per `/Name … ` pair (each font a ref or an inline
    * dict).  Simple fonts stay out of the map (byte passthrough); a
    * /Subtype/Type0 font contributes its parsed ToUnicode CMap.  A
    * Type0 font whose text is UNRECOVERABLE — no /ToUnicode, or one
    * that fails to parse — poisons the result (Left) so the caller
    * rejects the whole document: drop, never garble, the same
    * fail-safe direction as the delete-census.  Right(None) = node
    * has no /Resources (inheritable); Right(Some(map)) = node-level
    * resources (which REPLACE inherited ones, per spec).
    */
  private def pdfPageFontsOf(
      b: Array[Byte], entries: Map[Long, PdfXrefEntry],
      dict: String): Either[Unit, Option[Map[String, PdfCodeMap]]] = {
    if (pdfNameAt(dict, "/Resources") < 0) return Right(None)
    val res = pdfDictValueDict(b, entries, dict, "/Resources")
      .getOrElse(return Left(()))
    if (pdfNameAt(res, "/Font") < 0) return Right(Some(Map.empty))
    val fd = pdfDictValueDict(b, entries, res, "/Font")
      .getOrElse(return Left(()))
    if (fd.length < 4) return Left(())
    val inner = fd.substring(2, fd.length - 2)
    val out = Map.newBuilder[String, PdfCodeMap]
    def addFont(name: String, fdict: String): Boolean =
      if (!pdfDictName(fdict, "/Subtype").contains("Type0")) true
      else pdfDictRef(fdict, "/ToUnicode") match {
        case Some(r) =>
          pdfObjStream(b, entries, r).flatMap(pdfCMapOf) match {
            case Some(cm) => out += name -> cm; true
            case None => false
          }
        case None => false // Type0 without ToUnicode: unrecoverable
      }
    var i = 0
    var nFonts = 0
    while (i < inner.length) {
      if (inner(i) == '/') {
        val s0 = i + 1
        i += 1
        while (i < inner.length && !isPdfWs(inner(i)) &&
          !isPdfDelim(inner(i))) i += 1
        val name = pdfDecodeName(inner.substring(s0, i))
        if (name.isEmpty) return Left(())
        while (i < inner.length && isPdfWs(inner(i))) i += 1
        nFonts += 1
        if (nFonts > 256) return Left(())
        if (i + 1 < inner.length && inner(i) == '<' && inner(i + 1) == '<') {
          // inline font dict
          val (fdict, end) = pdfDictAt(inner, i).getOrElse(return Left(()))
          if (!addFont(name, fdict)) return Left(())
          i = end
        } else {
          // "N G R" indirect reference
          val n0 = i
          while (i < inner.length && inner(i).isDigit) i += 1
          if (i == n0 || i - n0 > 12) return Left(())
          val num = inner.substring(n0, i).toLong
          while (i < inner.length && isPdfWs(inner(i))) i += 1
          val g0 = i
          while (i < inner.length && inner(i).isDigit) i += 1
          if (i == g0 || i - g0 > 7) return Left(())
          while (i < inner.length && isPdfWs(inner(i))) i += 1
          if (i >= inner.length || inner(i) != 'R') return Left(())
          i += 1
          val fdict = pdfObjDict(b, entries, num).getOrElse(return Left(()))
          if (!addFont(name, fdict)) return Left(())
        }
      } else i += 1
    }
    Right(Some(out.result()))
  }

  /** Extract the SHOWN text from one decoded content stream: literal
    * strings (backslash escapes incl. octal, balanced nested parens,
    * line continuations) and hex strings consumed by the text-showing
    * operators Tj, ', ", and TJ (array form — its string pieces
    * concatenate in order, kerning numbers ignored).  Strings bound
    * to any OTHER operator are dropped.  Font state is tracked
    * through `/Name size Tf`: when the selected resource name is in
    * `fonts` (a Type0 font with a parsed ToUnicode CMap), show-string
    * bytes decode as fixed-width codes through the map — each TJ
    * piece independently, unmapped codes and trailing partial codes
    * as U+FFFD; otherwise bytes pass through verbatim (the
    * simple-font envelope; our corpus writes UTF-8).  A census-grade
    * extractor, not a renderer.  TOTAL on arbitrary bytes; output
    * capped at 16 MiB per stream.
    */
  private[graft] def pdfContentTextOf(
      data: Array[Byte],
      fonts: Map[String, PdfCodeMap] = Map.empty): Option[String] = {
    val out = new java.io.ByteArrayOutputStream(math.min(data.length, 4096))
    val pendingStrings = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var inArray = false
    var lastName: String = null // most recent /Name operand (for Tf)
    var curMap: PdfCodeMap = null // null = simple-font passthrough
    def emit(bytes: Array[Byte]): Unit =
      if (curMap == null) out.write(bytes)
      else {
        val w = curMap.codeBytes
        val sb = new StringBuilder(bytes.length / w + 1)
        var j = 0
        while (j + w <= bytes.length) {
          var code = 0
          var t = 0
          while (t < w) { code = (code << 8) | (bytes(j + t) & 0xff); t += 1 }
          sb ++= curMap.map.getOrElse(code, "\uFFFD")
          j += w
        }
        if (j < bytes.length) sb += '\uFFFD' // trailing partial code
        out.write(sb.toString.getBytes("UTF-8"))
      }
    var i = 0
    val n = data.length
    def hexVal(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (i < n) {
      val c = data(i) & 0xff
      if (c == '(') { // literal string
        val sb = new java.io.ByteArrayOutputStream(64)
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = data(i) & 0xff
          if (ch == '\\') {
            if (i + 1 >= n) return None
            val e = data(i + 1) & 0xff
            e match {
              case 'n' => sb.write('\n'); i += 2
              case 'r' => sb.write('\r'); i += 2
              case 't' => sb.write('\t'); i += 2
              case 'b' => sb.write('\b'); i += 2
              case 'f' => sb.write('\f'); i += 2
              case '(' => sb.write('('); i += 2
              case ')' => sb.write(')'); i += 2
              case '\\' => sb.write('\\'); i += 2
              case '\r' => // line continuation (CR or CRLF)
                i += 2; if (i < n && data(i) == '\n') i += 1
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' => // octal, 1-3 digits
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
                  v = v * 8 + (data(i) - '0'); i += 1; k += 1
                }
                sb.write(v & 0xff)
              case _ => sb.write(e); i += 2 // spec: stray \ is dropped
            }
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) sb.write(ch)
            i += 1
          }
        }
        if (depth != 0) return None // unterminated string
        pendingStrings += sb.toByteArray
      } else if (c == '<' && i + 1 < n && (data(i + 1) & 0xff) != '<') {
        // hex string: whitespace allowed, odd final digit pads with 0
        val sb = new java.io.ByteArrayOutputStream(32)
        i += 1
        var hi = -1
        var closed = false
        while (i < n && !closed) {
          val ch = data(i) & 0xff
          if (ch == '>') { closed = true; i += 1 }
          else if (isPdfWs(ch.toChar)) i += 1
          else {
            val v = hexVal(ch)
            if (v < 0) return None
            if (hi < 0) hi = v
            else { sb.write((hi << 4) | v); hi = -1 }
            i += 1
          }
        }
        if (!closed) return None
        if (hi >= 0) sb.write(hi << 4)
        pendingStrings += sb.toByteArray
      } else if (c == '<') { // dict (inline images' DL etc.): skip <<
        i += 2
      } else if (c == '[') {
        inArray = true; pendingStrings.clear(); i += 1
      } else if (c == ']') {
        inArray = false; i += 1 // strings stay pending for TJ
      } else if (c == '%') { // comment to EOL
        while (i < n && data(i) != '\r' && data(i) != '\n') i += 1
      } else if (c == '/') { // a name OPERAND: remember it for Tf
        val start = i + 1
        i += 1
        while (i < n && {
          val x = data(i) & 0xff
          !isPdfWs(x.toChar) && !isPdfDelim(x.toChar)
        }) i += 1
        lastName = pdfDecodeName(
          new String(data, start, i - start, "ISO-8859-1"))
      } else if (isPdfWs(c.toChar) || isPdfDelim(c.toChar)) {
        i += 1
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        c == '\'' || c == '"') {
        // an operator token
        val start = i
        if (c == '\'' || c == '"') i += 1
        else {
          while (i < n && {
            val x = data(i) & 0xff
            !isPdfWs(x.toChar) && !isPdfDelim(x.toChar)
          }) i += 1
        }
        val op = new String(data, start, i - start, "ISO-8859-1")
        op match {
          case "Tj" | "'" | "\"" =>
            if (pendingStrings.nonEmpty) emit(pendingStrings.last)
            pendingStrings.clear()
          case "TJ" =>
            pendingStrings.foreach(emit)
            pendingStrings.clear()
          case "Tf" => // select the font the last /Name operand named
            curMap = if (lastName == null) null
                     else fonts.getOrElse(lastName, null)
            pendingStrings.clear()
          case _ =>
            if (!inArray) pendingStrings.clear()
        }
        if (out.size() > (16 << 20)) return None // runaway guard
      } else {
        // numbers, signs, other non-delimiter bytes: consume one
        // token (the loop always advances — data(i) is non-ws,
        // non-delimiter here by construction)
        while (i < n && {
          val x = data(i) & 0xff
          !isPdfWs(x.toChar) && !isPdfDelim(x.toChar)
        }) i += 1
      }
    }
    Some(new String(out.toByteArray, "UTF-8"))
  }

  /** PDF TEXT extraction — the content step above [[pdfMetaOf]]'s
    * structure census (the document-corpus sibling of the WARC
    * content path): resolve the page TREE through the validated xref
    * chain (nested /Pages nodes depth-first, /Type/Page leaves), pull
    * each page's /Contents (single ref or array — streams concatenate
    * in order), decode (FlateDecode in-envelope), and extract the
    * shown text ([[pdfContentTextOf]]) with the page's font resources
    * in scope — Type0/CID fonts (the modern Unicode-producer default)
    * decode through their ToUnicode CMaps ([[pdfCMapOf]]); simple
    * fonts pass bytes through.  One row per page in reading order.
    * Rejects (None) on any structural failure, including a Type0 font
    * whose text is unrecoverable — same fail-safe discipline as the
    * census: drop, never garble.
    */
  private[graft] def pdfPageTextsOf(r: MediaRecord): Option[Seq[PdfPageText]] = {
    val b = r.content
    val chain = pdfChainOf(b).getOrElse(return None)
    // encrypted content streams are RC4/AES bytes — extraction can't
    // proceed, but the drop is ATTRIBUTABLE: the meta census surfaces
    // encrypted=true for the same doc (vs. dropped-as-corrupt)
    if (chain.encrypted) return None
    val catalog = pdfObjDict(b, chain.entries, chain.rootRef)
      .getOrElse(return None)
    if (!pdfDictName(catalog, "/Type").contains("Catalog")) return None
    val pagesRef = pdfDictRef(catalog, "/Pages").getOrElse(return None)
    // collect leaf pages depth-first through nested page-tree nodes,
    // carrying the nearest ancestor's /Resources fonts (inheritable;
    // a node-level /Resources REPLACES, per spec)
    val pageRefs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, PdfCodeMap])]
    def walk(ref: Long, depth: Int,
        inh: Option[Map[String, PdfCodeMap]]): Boolean = {
      if (depth > 16 || pageRefs.length > 100000) return false
      val dict = pdfObjDict(b, chain.entries, ref).getOrElse(return false)
      val here = pdfPageFontsOf(b, chain.entries, dict) match {
        case Left(()) => return false // unrecoverable Type0: drop doc
        case Right(h) => h.orElse(inh)
      }
      pdfDictName(dict, "/Type") match {
        case Some("Pages") =>
          val at = pdfNameAt(dict, "/Kids")
          if (at < 0) return false
          val ob = dict.indexOf('[', at + 5)
          if (ob < 0) return false
          val cb = dict.indexOf(']', ob)
          if (cb < 0) return false
          // kids: "N G R" triples
          val toks = dict.substring(ob + 1, cb).split("\\s+")
            .filter(_.nonEmpty)
          if (toks.length % 3 != 0) return false
          toks.grouped(3).forall { t =>
            t(2) == "R" && t(0).forall(_.isDigit) && t(0).length <= 12 &&
              walk(t(0).toLong, depth + 1, here)
          }
        case Some("Page") =>
          pageRefs += ((ref, here.getOrElse(Map.empty)))
          true
        case _ => false
      }
    }
    if (!walk(pagesRef, 0, None)) return None
    val out = Vector.newBuilder[PdfPageText]
    var idx = 0L
    for ((pref, fonts) <- pageRefs) {
      val pd = pdfObjDict(b, chain.entries, pref).getOrElse(return None)
      // /Contents: single "N G R" ref or an array of refs
      val contentRefs: Seq[Long] = pdfDictRef(pd, "/Contents") match {
        case Some(one) => Seq(one)
        case None =>
          val at = pdfNameAt(pd, "/Contents")
          if (at < 0) Seq.empty // a page with no contents shows nothing
          else {
            val ob = pd.indexOf('[', at + 9)
            if (ob < 0) return None
            val cb = pd.indexOf(']', ob)
            if (cb < 0) return None
            val toks = pd.substring(ob + 1, cb).split("\\s+")
              .filter(_.nonEmpty)
            if (toks.length % 3 != 0) return None
            toks.grouped(3).map { t =>
              if (t(2) != "R" || !t(0).forall(_.isDigit) ||
                t(0).length > 12) return None
              t(0).toLong
            }.toSeq
          }
      }
      val text = new StringBuilder
      for (cref <- contentRefs) {
        val data = pdfObjStream(b, chain.entries, cref).getOrElse(return None)
        text ++= pdfContentTextOf(data, fonts).getOrElse(return None)
      }
      out += PdfPageText(r.id, idx, text.toString)
      idx += 1
    }
    Some(out.result())
  }

  def pdfPageTexts(ds: Dataset[MediaRecord]): Dataset[PdfPageText] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => pdfPageTextsOf(r).getOrElse(Nil)))
  }

  /** Per-row minimal-but-VALID classic PDF synthesis: a catalog, a
    * page tree with `1 + id % 4` pages, one content stream per page
    * carrying the document's text split by the tar rule, a correct
    * xref table (real 10-digit offsets) and trailer.  Page/object
    * counts replay from id arithmetic; byte offsets are real and
    * self-consistent (the census verifies them against the file).
    */
  /** The classic-layout builder shared by [[synthesizePdf]] (whole
    * file) and [[synthesizePdfIncremental]] (original revision to
    * append an update to).  Returns the bytes and the xref offset.
    */
  private def classicPdfBytes(id: Long, text: String,
      encrypted: Boolean = false): (Array[Byte], Long) = {
    val nPages = 1 + (id % 4).toInt
    val payload = text.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = Array.newBuilder[Long]
    w("%PDF-1.4\n")
    // obj 1: catalog
    offsets += out.size().toLong
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    // obj 2: page tree
    offsets += out.size().toLong
    val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n")
    // objs 3..2+n: pages; objs 3+n..2+2n: content streams
    (0 until nPages).foreach { k =>
      offsets += out.size().toLong
      w(s"${3 + k} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${3 + nPages + k} 0 R " +
        ">> endobj\n")
    }
    (0 until nPages).foreach { k =>
      val take = payload.length / nPages +
        (if (k < payload.length % nPages) 1 else 0)
      val from = (0 until k).map(j => payload.length / nPages +
        (if (j < payload.length % nPages) 1 else 0)).sum
      offsets += out.size().toLong
      w(s"${3 + nPages + k} 0 obj << /Length $take >> stream\n")
      out.write(payload, from, take)
      w("\nendstream endobj\n")
    }
    // standard-security-handler arm: an /Encrypt dict object (V1/R2
    // RC4 shape — deterministic O/U strings) referenced from the
    // trailer; the census must surface encrypted=true, NOT drop the
    // doc as corrupt
    if (encrypted) {
      val encNum = 3 + 2 * nPages
      val oHex = (0 until 32).map(i =>
        f"${(id * 31 + i * 7) & 0xff}%02X").mkString
      val uHex = (0 until 32).map(i =>
        f"${(id * 17 + i * 13) & 0xff}%02X").mkString
      offsets += out.size().toLong
      w(s"$encNum 0 obj << /Filter /Standard /V 1 /R 2 " +
        s"/O <$oHex> /U <$uHex> /P -44 >> endobj\n")
    }
    val xrefAt = out.size().toLong
    val objOffsets = offsets.result()
    val size = 1 + objOffsets.length // entry 0 + real objects
    w(s"xref\n0 $size\n")
    w("0000000000 65535 f \n")
    objOffsets.foreach(o => w(f"$o%010d 00000 n \n"))
    val encRef =
      if (encrypted) s" /Encrypt ${3 + 2 * nPages} 0 R" +
        f" /ID [<${id}%016x> <${id}%016x>]"
      else ""
    w(s"trailer << /Size $size /Root 1 0 R$encRef >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    (out.toByteArray, xrefAt)
  }

  def synthesizePdf(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "application/pdf", classicPdfBytes(id, text)._1)
      }
  }

  /** Mixed encrypted/plain PDF corpus — even ids carry a
    * standard-security-handler /Encrypt trailer (the large
    * real-corpus slice whose content streams are RC4/AES bytes): the
    * census must surface `encrypted=true` for them instead of
    * dropping them indistinguishably from bit rot.
    */
  def synthesizePdfEncrypted(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "application/pdf",
          classicPdfBytes(id, text, encrypted = id % 2 == 0)._1)
      }
  }

  /** Per-row PDF synthesis with REAL TEXT OPERATORS — the fixture
    * for [[pdfPageTextsOf]]: page k of `1 + id % 4` shows the k-th
    * 6-token window of the document (the VTT/SRT token-window
    * convention, so the oracle replays it in SQL).  The show form
    * cycles by k % 3 — escaped literal + Tj, a two-piece TJ array
    * (concatenation must restore the exact bytes), hex string + Tj —
    * and odd ids FlateDecode their content streams.  A shared Type1
    * font object makes the layout production-shaped (/Resources on
    * every page).
    */
  def synthesizePdfText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val nPages = 1 + (id % 4).toInt
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val flate = id % 2 == 1
        def pageText(k: Int): String =
          toks.slice(k * 6, k * 6 + 6).mkString(" ")
        def escLit(s: Array[Byte]): Array[Byte] = {
          val o = new java.io.ByteArrayOutputStream(s.length + 8)
          s.foreach { b =>
            if (b == '\\' || b == '(' || b == ')') o.write('\\')
            o.write(b.toInt)
          }
          o.toByteArray
        }
        def contentOps(k: Int): Array[Byte] = {
          val pt = pageText(k).getBytes("UTF-8")
          val o = new java.io.ByteArrayOutputStream(pt.length + 64)
          def w(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
          w("BT /F1 12 Tf 72 720 Td ")
          (k % 3) match {
            case 0 =>
              w("("); o.write(escLit(pt)); w(") Tj")
            case 1 => // two-piece TJ: bytes must concatenate back
              val mid = pt.length / 2
              w("[ (")
              o.write(escLit(java.util.Arrays.copyOfRange(pt, 0, mid)))
              w(") -250 (")
              o.write(escLit(java.util.Arrays.copyOfRange(pt, mid, pt.length)))
              w(") ] TJ")
            case _ =>
              w("<")
              pt.foreach(b => w(f"${b & 0xff}%02X"))
              w("> Tj")
          }
          w(" ET\n")
          o.toByteArray
        }
        val out = new java.io.ByteArrayOutputStream(1024)
        def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
        val offsets = Array.newBuilder[Long]
        w("%PDF-1.4\n")
        offsets += out.size().toLong
        w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
        offsets += out.size().toLong
        val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
        w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n")
        val fontNum = 3 + 2 * nPages
        (0 until nPages).foreach { k =>
          offsets += out.size().toLong
          w(s"${3 + k} 0 obj << /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
            s"/Contents ${3 + nPages + k} 0 R >> endobj\n")
        }
        (0 until nPages).foreach { k =>
          val raw = contentOps(k)
          val data = if (flate) zlibDeflate(raw) else raw
          offsets += out.size().toLong
          w(s"${3 + nPages + k} 0 obj << /Length ${data.length}" +
            (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n")
          out.write(data)
          w("\nendstream endobj\n")
        }
        offsets += out.size().toLong
        w(s"$fontNum 0 obj << /Type /Font /Subtype /Type1 " +
          "/BaseFont /Helvetica >> endobj\n")
        val xrefAt = out.size().toLong
        val objOffsets = offsets.result()
        val size = 1 + objOffsets.length
        w(s"xref\n0 $size\n")
        w("0000000000 65535 f \n")
        objOffsets.foreach(o => w(f"$o%010d 00000 n \n"))
        w(s"trailer << /Size $size /Root 1 0 R >>\n")
        w(s"startxref\n$xrefAt\n%%EOF\n")
        MediaRecord(id, "application/pdf", out.toByteArray)
      }
  }

  /** Per-row PDF synthesis with a COMPOSITE (Type0/CID) font — the
    * fixture for ToUnicode decode, the modern-producer text layout
    * [[synthesizePdfText]]'s simple-font arm can't represent.  Pages
    * alternate fonts: even pages show the k-th 6-token window through
    * the simple Type1 font F1 (byte passthrough), odd pages through
    * the Type0 font F2 whose 2-byte codes are REMAPPED — code
    * `0x1100 + j` over the document's distinct UTF-16 units in sorted
    * order — so raw passthrough would garble and only the ToUnicode
    * CMap restores the text.  The CMap exercises all three mapping
    * forms: increment bfrange for sorted runs of ≥ 3 consecutive
    * units, array bfrange for 2-unit runs, bfchar for singletons.
    * /Resources placement alternates: even ids put them on the PAGES
    * node (the inheritable form), odd ids on every page.  Content
    * streams FlateDecode on odd ids; the CMap stream on id % 3 == 0.
    * CID show forms cycle per page: hex-string Tj, two-piece hex TJ
    * split at a code boundary.
    */
  def synthesizePdfCid(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val nPages = 1 + (id % 4).toInt
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val flate = id % 2 == 1
        val flateCMap = id % 3 == 0
        val resourcesOnPages = id % 2 == 0
        val units: Array[Char] = text.toCharArray.distinct.sorted
        def codeOf(c: Char): Int = {
          val j = java.util.Arrays.binarySearch(units, c)
          0x1100 + j
        }
        def pageText(k: Int): String =
          toks.slice(k * 6, k * 6 + 6).mkString(" ")
        def escLit(s: Array[Byte]): Array[Byte] = {
          val o = new java.io.ByteArrayOutputStream(s.length + 8)
          s.foreach { b =>
            if (b == '\\' || b == '(' || b == ')') o.write('\\')
            o.write(b.toInt)
          }
          o.toByteArray
        }
        def hexCodes(s: String): String =
          s.map(c => f"${codeOf(c)}%04X").mkString
        def contentOps(k: Int): Array[Byte] = {
          val pt = pageText(k)
          val o = new java.io.ByteArrayOutputStream(pt.length * 4 + 64)
          def w(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
          if (k % 2 == 0) { // simple-font page: byte passthrough
            w("BT /F1 12 Tf 72 720 Td (")
            o.write(escLit(pt.getBytes("UTF-8")))
            w(") Tj ET\n")
          } else { // CID page: 2-byte remapped codes
            w("BT /F2 12 Tf 72 720 Td ")
            if (k % 4 == 1) w(s"<${hexCodes(pt)}> Tj")
            else { // two-piece TJ split at a code (char) boundary
              var mid = pt.length / 2
              if (mid > 0 && mid < pt.length &&
                Character.isHighSurrogate(pt(mid - 1))) mid += 1
              w(s"[ <${hexCodes(pt.substring(0, mid))}> -250 " +
                s"<${hexCodes(pt.substring(mid))}> ] TJ")
            }
            w(" ET\n")
          }
          o.toByteArray
        }
        // ToUnicode CMap: runs over the sorted distinct units
        val bfchars = Vector.newBuilder[String]
        val bfranges = Vector.newBuilder[String]
        var u0 = 0
        while (u0 < units.length) {
          var u1 = u0
          while (u1 + 1 < units.length && units(u1 + 1) == units(u1) + 1)
            u1 += 1
          val len = u1 - u0 + 1
          if (len >= 3)
            bfranges += f"<${0x1100 + u0}%04X> <${0x1100 + u1}%04X> " +
              f"<${units(u0).toInt}%04X>"
          else if (len == 2)
            bfranges += f"<${0x1100 + u0}%04X> <${0x1100 + u1}%04X> " +
              f"[ <${units(u0).toInt}%04X> <${units(u1).toInt}%04X> ]"
          else
            bfchars += f"<${0x1100 + u0}%04X> <${units(u0).toInt}%04X>"
          u0 = u1 + 1
        }
        val bc = bfchars.result()
        val br = bfranges.result()
        val cmap = new StringBuilder(256)
        cmap ++= "/CIDInit /ProcSet findresource begin\n12 dict begin\n"
        cmap ++= "begincmap\n"
        // the production preamble every tool emits — the dict and the
        // literal strings must be token-invisible to the parser
        cmap ++= "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) " +
          "/Supplement 0 >> def\n"
        cmap ++= "/CMapName /Graft-UCS def\n/CMapType 2 def\n"
        cmap ++= "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        if (br.nonEmpty)
          cmap ++= s"${br.length} beginbfrange\n${br.mkString("\n")}\nendbfrange\n"
        if (bc.nonEmpty)
          cmap ++= s"${bc.length} beginbfchar\n${bc.mkString("\n")}\nendbfchar\n"
        cmap ++= "endcmap\nend\nend\n"
        val cmapRaw = cmap.toString.getBytes("ISO-8859-1")
        val cmapData = if (flateCMap) zlibDeflate(cmapRaw) else cmapRaw
        val out = new java.io.ByteArrayOutputStream(1024)
        def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
        val offsets = Array.newBuilder[Long]
        val f1 = 3 + 2 * nPages
        val f2 = f1 + 1
        val desc = f1 + 2
        val toUni = f1 + 3
        val resDict = s"/Resources << /Font << /F1 $f1 0 R /F2 $f2 0 R >> >> "
        w("%PDF-1.4\n")
        offsets += out.size().toLong
        w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
        offsets += out.size().toLong
        val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
        w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages " +
          (if (resourcesOnPages) resDict else "") + ">> endobj\n")
        (0 until nPages).foreach { k =>
          offsets += out.size().toLong
          w(s"${3 + k} 0 obj << /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 612 792] " +
            (if (resourcesOnPages) "" else resDict) +
            s"/Contents ${3 + nPages + k} 0 R >> endobj\n")
        }
        (0 until nPages).foreach { k =>
          val raw = contentOps(k)
          val data = if (flate) zlibDeflate(raw) else raw
          offsets += out.size().toLong
          w(s"${3 + nPages + k} 0 obj << /Length ${data.length}" +
            (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n")
          out.write(data)
          w("\nendstream endobj\n")
        }
        offsets += out.size().toLong
        w(s"$f1 0 obj << /Type /Font /Subtype /Type1 " +
          "/BaseFont /Helvetica >> endobj\n")
        offsets += out.size().toLong
        w(s"$f2 0 obj << /Type /Font /Subtype /Type0 " +
          "/BaseFont /Graft-CID /Encoding /Identity-H " +
          s"/DescendantFonts [$desc 0 R] /ToUnicode $toUni 0 R >> endobj\n")
        offsets += out.size().toLong
        w(s"$desc 0 obj << /Type /Font /Subtype /CIDFontType2 " +
          "/BaseFont /Graft-CID /CIDSystemInfo << /Registry (Adobe) " +
          "/Ordering (Identity) /Supplement 0 >> >> endobj\n")
        offsets += out.size().toLong
        w(s"$toUni 0 obj << /Length ${cmapData.length}" +
          (if (flateCMap) " /Filter /FlateDecode" else "") + " >> stream\n")
        out.write(cmapData)
        w("\nendstream endobj\n")
        val xrefAt = out.size().toLong
        val objOffsets = offsets.result()
        val size = 1 + objOffsets.length
        w(s"xref\n0 $size\n")
        w("0000000000 65535 f \n")
        objOffsets.foreach(o => w(f"$o%010d 00000 n \n"))
        w(s"trailer << /Size $size /Root 1 0 R >>\n")
        w(s"startxref\n$xrefAt\n%%EOF\n")
        MediaRecord(id, "application/pdf", out.toByteArray)
      }
  }

  /** Per-row PDF 1.5 synthesis with a CROSS-REFERENCE STREAM (the
    * modern-producer default layout): same document tree as
    * [[synthesizePdf]], but the xref is a /Type/XRef stream with
    * W [1 4 2] fields.  Arms cycle by id to cover the envelope:
    * even ids pack the catalog + page tree + page dicts into an
    * object stream (/Type/ObjStm, type-2 xref entries); id % 3
    * selects the xref stream's encoding (0 = FlateDecode + PNG Up
    * predictor /Columns 7, 1 = plain FlateDecode, 2 = unfiltered);
    * id % 5 == 0 writes an explicit two-subsection /Index.  The
    * catalog uses the NO-WHITESPACE `/Type/Catalog` name form — the
    * tokenizer, not a literal-with-space scan, must resolve it.
    */
  def synthesizePdfXrs(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val nPages = 1 + (id % 4).toInt
        val useObjStm = id % 2 == 0
        val payload = text.getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream(1024)
        def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
        // object numbers: 1 catalog, 2 pages, 3..2+n page dicts,
        // 3+n..2+2n content streams, then [S objstm], X xref stream
        val sNum = 3 + 2 * nPages
        val xNum = if (useObjStm) sNum + 1 else sNum
        val size = xNum + 1
        val entryByNum =
          scala.collection.mutable.HashMap.empty[Int, (Int, Long, Long)]
        w("%PDF-1.5\n")
        val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
        val catalogStr = "<< /Type/Catalog /Pages 2 0 R >>"
        val pagesStr = s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
        val pageStrs = (0 until nPages).map { k =>
          s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Contents ${3 + nPages + k} 0 R >>"
        }
        if (useObjStm) {
          // catalog + pages + page dicts live inside the object stream
          val members = Seq((1, catalogStr), (2, pagesStr)) ++
            pageStrs.zipWithIndex.map { case (s, k) => (3 + k, s) }
          members.zipWithIndex.foreach { case ((num, _), idx) =>
            entryByNum(num) = (2, sNum.toLong, idx.toLong)
          }
          val body = new StringBuilder
          val rel = members.map { case (_, s) =>
            val r = body.length; body.append(s).append('\n'); r
          }
          val header = members.zip(rel)
            .map { case ((num, _), r) => s"$num $r" }.mkString(" ") + "\n"
          val dataRaw = (header + body).getBytes("ISO-8859-1")
          val flate = id % 4 == 0
          val data = if (flate) zlibDeflate(dataRaw) else dataRaw
          entryByNum(sNum) = (1, out.size().toLong, 0L)
          w(s"$sNum 0 obj << /Type /ObjStm /N ${members.length} " +
            s"/First ${header.length} /Length ${data.length}" +
            (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
          out.write(data)
          w("\nendstream endobj\n")
        } else {
          entryByNum(1) = (1, out.size().toLong, 0L)
          w(s"1 0 obj $catalogStr endobj\n")
          entryByNum(2) = (1, out.size().toLong, 0L)
          w(s"2 0 obj $pagesStr endobj\n")
          pageStrs.zipWithIndex.foreach { case (s, k) =>
            entryByNum(3 + k) = (1, out.size().toLong, 0L)
            w(s"${3 + k} 0 obj $s endobj\n")
          }
        }
        (0 until nPages).foreach { k =>
          val take = payload.length / nPages +
            (if (k < payload.length % nPages) 1 else 0)
          val from = (0 until k).map(j => payload.length / nPages +
            (if (j < payload.length % nPages) 1 else 0)).sum
          entryByNum(3 + nPages + k) = (1, out.size().toLong, 0L)
          w(s"${3 + nPages + k} 0 obj << /Length $take >> stream\n")
          out.write(payload, from, take)
          w("\nendstream endobj\n")
        }
        // the xref stream object (self-entry included, per spec)
        val xrefAt = out.size().toLong
        entryByNum(xNum) = (1, xrefAt, 0L)
        entryByNum(0) = (0, 0L, 65535L) // free-list head
        val rows = new java.io.ByteArrayOutputStream(size * 7)
        def putField(v: Long, width: Int): Unit = {
          var j = width - 1
          while (j >= 0) { rows.write(((v >> (8 * j)) & 0xff).toInt); j -= 1 }
        }
        (0 until size).foreach { n =>
          val (t, f2, f3) = entryByNum(n)
          putField(t.toLong, 1); putField(f2, 4); putField(f3, 2)
        }
        val plain = rows.toByteArray
        val (streamData, filterStr) = (id % 3) match {
          case 0 => // PNG Up predictor over 7-byte rows, then flate
            val cols = 7
            val pred = new java.io.ByteArrayOutputStream(plain.length + size)
            var r = 0
            while (r < size) {
              pred.write(2) // PNG filter type Up
              var i = 0
              while (i < cols) {
                val up = if (r == 0) 0 else plain((r - 1) * cols + i) & 0xff
                pred.write(((plain(r * cols + i) & 0xff) - up) & 0xff)
                i += 1
              }
              r += 1
            }
            (zlibDeflate(pred.toByteArray),
              " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>")
          case 1 => (zlibDeflate(plain), " /Filter /FlateDecode")
          case _ => (plain, "")
        }
        val indexStr =
          if (id % 5 == 0) {
            val m = size / 2 // two contiguous subsections, same coverage
            s" /Index [0 $m $m ${size - m}]"
          } else ""
        w(s"$xNum 0 obj << /Type /XRef /Size $size /W [1 4 2]$indexStr" +
          s"$filterStr /Root 1 0 R /Length ${streamData.length} >>\nstream\n")
        out.write(streamData)
        w("\nendstream endobj\n")
        w(s"startxref\n$xrefAt\n%%EOF\n")
        MediaRecord(id, "application/pdf", out.toByteArray)
      }
  }

  /** Per-row INCREMENTALLY-UPDATED classic PDF: the [[synthesizePdf]]
    * original plus one appended revision — a replaced catalog (written
    * in the no-whitespace `/Type/Catalog` form) and one new info
    * object, with a second xref section whose trailer chains back via
    * /Prev.  The census must follow the chain: the newest /Size counts
    * the new object, and the replaced catalog (newest-wins) is the one
    * the page-count resolution reads.
    */
  def synthesizePdfIncremental(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (orig, prevXrefAt) = classicPdfBytes(id, text)
        val nPages = 1 + (id % 4).toInt
        val oldSize = 3 + 2 * nPages // entry 0 + objects of the original
        val out = new java.io.ByteArrayOutputStream(orig.length + 512)
        out.write(orig)
        def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
        val catAt = out.size().toLong
        w("1 0 obj << /Type/Catalog /Pages 2 0 R /PageLayout /OneColumn >> endobj\n")
        val infoAt = out.size().toLong
        w(s"$oldSize 0 obj << /Rev 2 /Doc $id >> endobj\n")
        val xrefAt = out.size().toLong
        w(s"xref\n1 1\n")
        // generation stays 0: replacement via incremental update does
        // not bump gen (that happens only after a free-list reuse)
        w(f"$catAt%010d 00000 n \n")
        w(s"$oldSize 1\n")
        w(f"$infoAt%010d 00000 n \n")
        w(s"trailer << /Size ${oldSize + 1} /Root 1 0 R /Prev $prevXrefAt >>\n")
        w(s"startxref\n$xrefAt\n%%EOF\n")
        MediaRecord(id, "application/pdf", out.toByteArray)
      }
  }

  // ---- Arrow IPC file census ---------------------------------------

  /** One encapsulated IPC message: kind (1 = Schema, 2 =
    * DictionaryBatch, 3 = RecordBatch), its byte geometry, and the
    * row count for record batches (-1 otherwise) — the block index a
    * reader seeks with.
    */
  final case class ArrowIpcMsg(
      id: Long, msgIdx: Long, headerType: Long, offset: Long,
      metaLen: Long, bodyLen: Long, nRows: Long)

  /** Arrow IPC FILE census — the in-memory columnar format's on-disk
    * framing (feature tables, embedding dumps, Spark↔pandas exchange).
    * Walks the encapsulated-message stream between the two `ARROW1`
    * magics by hand: 0xFFFFFFFF continuation + i32 LE metadata length
    * per message, then a from-spec FLATBUFFER decode of the Message
    * table (soffset→vtable, u16 slot offsets; header-type union byte,
    * bodyLength long, and the RecordBatch child table's `length`
    * field for row counts) — no Arrow library on the read path, so
    * the arrow-vector reader in the spec is a genuinely independent
    * second reader.  Strict framing: leading/trailing magic, every
    * message bounds-checked, the zero-length EOS marker mandatory,
    * the walk must end exactly where the footer (sized by the i32
    * before the trailing magic) begins.  TOTAL on arbitrary bytes.
    */
  private[graft] def arrowIpcMessagesOf(r: MediaRecord): Option[Seq[ArrowIpcMsg]] = {
    val b = r.content
    if (b == null || b.length < 24) return None
    def u16(i: Int): Int = (b(i) & 0xff) | (b(i + 1) & 0xff) << 8
    def i32(i: Int): Int = (b(i) & 0xff) | (b(i + 1) & 0xff) << 8 |
      (b(i + 2) & 0xff) << 16 | (b(i + 3) & 0xff) << 24
    def i64(i: Int): Long = (i32(i) & 0xffffffffL) | i32(i + 4).toLong << 32
    // magics
    val magic = "ARROW1".getBytes("US-ASCII")
    var k = 0
    while (k < 6) {
      if (b(k) != magic(k) || b(b.length - 6 + k) != magic(k)) return None
      k += 1
    }
    if (b(6) != 0 || b(7) != 0) return None
    val footerLen = i32(b.length - 10)
    if (footerLen <= 0 || footerLen > b.length - 18) return None
    val footerStart = b.length - 10 - footerLen
    // flatbuffer field read within [msgOff, msgOff+metaLen): returns
    // the absolute position of field `slot` of the table at absolute
    // pos `t`, or -1 when absent/out of bounds
    def fieldPos(lo: Int, hi: Int, t: Int, slot: Int): Int = {
      if (t < lo || t + 4 > hi) return -1
      val soff = i32(t)
      val vt = t - soff
      if (vt < lo || vt + 4 > hi) return -1
      val vtSize = u16(vt)
      val entry = 4 + 2 * slot
      if (entry + 2 > vtSize || vt + entry + 2 > hi) return -1
      val fo = u16(vt + entry)
      if (fo == 0) return -1
      val p = t + fo
      if (p < lo || p >= hi) -1 else p
    }
    val out = Vector.newBuilder[ArrowIpcMsg]
    var off = 8
    var idx = 0L
    var sawEos = false
    while (!sawEos) {
      if (off + 8 > footerStart) return None
      if (i32(off) != 0xffffffff) return None
      val metaLen = i32(off + 4)
      if (metaLen == 0) { sawEos = true; off += 8 }
      else {
        if (metaLen < 8 || off + 8 + metaLen > footerStart) return None
        val lo = off + 8
        val hi = off + 8 + metaLen
        if (lo + 4 > hi) return None
        val root = lo + i32(lo)
        // header-type union byte (slot 1), bodyLength (slot 3)
        val htPos = fieldPos(lo, hi, root, 1)
        val ht = if (htPos < 0) 0L else (b(htPos) & 0xff).toLong
        val blPos = fieldPos(lo, hi, root, 3)
        val bodyLen = if (blPos < 0) 0L else {
          if (blPos + 8 > hi) return None
          i64(blPos)
        }
        if (bodyLen < 0 || off + 8 + metaLen + bodyLen > footerStart) return None
        // RecordBatch child table: length field (slot 0) = row count
        var nRows = -1L
        if (ht == 3L) {
          val hPos = fieldPos(lo, hi, root, 2)
          if (hPos < 0 || hPos + 4 > hi) return None
          val child = hPos + i32(hPos)
          val lenPos = fieldPos(lo, hi, child, 0)
          nRows =
            if (lenPos < 0) 0L
            else { if (lenPos + 8 > hi) return None; i64(lenPos) }
          if (nRows < 0) return None
        }
        out += ArrowIpcMsg(r.id, idx, ht, off.toLong, metaLen.toLong,
          bodyLen, nRows)
        idx += 1
        off += 8 + metaLen + bodyLen.toInt
      }
    }
    // the stream must end exactly where the footer begins
    if (off != footerStart) return None
    Some(out.result())
  }

  def arrowIpcMessages(ds: Dataset[MediaRecord]): Dataset[ArrowIpcMsg] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r => arrowIpcMessagesOf(r).getOrElse(Nil)))
  }

  /** Per-row Arrow IPC file synthesis THROUGH the Arrow library (the
    * independent-writer discipline, inverted: library writes, the
    * from-spec walk reads): `1 + id % 4` record batches, batch k
    * carrying `1 + (id + k) % 5` rows of (bigint, varchar) — row
    * counts are id arithmetic for the oracle, byte geometry is the
    * library's own.  One allocator per partition, closed on
    * exhaustion.
    */
  def synthesizeArrowIpc(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // ONE allocator + schema + root per partition (native allocator
        // setup/teardown is not per-record money); the task completion
        // listener closes them even when a downstream limit stops the
        // iterator before exhaustion
        val alloc = new org.apache.arrow.memory.RootAllocator(1L << 28)
        val fields = java.util.Arrays.asList(
          org.apache.arrow.vector.types.pojo.Field.nullable("v",
            new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true)),
          org.apache.arrow.vector.types.pojo.Field.nullable("s",
            org.apache.arrow.vector.types.pojo.ArrowType.Utf8.INSTANCE))
        val schema = new org.apache.arrow.vector.types.pojo.Schema(fields)
        val root = org.apache.arrow.vector.VectorSchemaRoot.create(schema, alloc)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            root.close(); alloc.close()
          })
        val vv = root.getVector("v")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val sv = root.getVector("s")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        it.map { case (id, text) =>
          val baos = new java.io.ByteArrayOutputStream(1024)
          val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(
            root, null, java.nio.channels.Channels.newChannel(baos))
          try {
            writer.start()
            val nb = 1 + (id % 4).toInt
            val toks = text.split("\\s+").filter(_.nonEmpty)
            var bk = 0
            while (bk < nb) {
              val rows = 1 + ((id + bk) % 5).toInt
              root.allocateNew()
              var i = 0
              while (i < rows) {
                vv.setSafe(i, id * 100 + bk * 10 + i)
                sv.setSafe(i, (if (toks.isEmpty) "" else
                  toks((bk + i) % toks.length)).getBytes("UTF-8"))
                i += 1
              }
              root.setRowCount(rows)
              writer.writeBatch()
              bk += 1
            }
            writer.end()
          } finally writer.close()
          MediaRecord(id, "application/vnd.apache.arrow.file",
            baos.toByteArray)
        }
      }
  }

  /** Per-row crawl-shaped .warc.gz synthesis: a zero-length `request`
    * member followed by a `response` member carrying the FULL page
    * payload (the Common Crawl page shape — one response per page,
    * never split), each its own gzip member.  The response is record
    * k=1, so its target URI is `…/<id>/1`.
    */
  def synthesizeWarcGzPages(df: DataFrame, idCol: String, htmlCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    spread(df).select(col(idCol).cast("long").as("id"),
        coalesce(col(htmlCol), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, html) =>
        val payload = html.getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream(1024)
        Seq(
          warcRecordBytes(id, 0, "request", Array.emptyByteArray, 0, 0),
          warcRecordBytes(id, 1, "response", payload, 0, payload.length))
          .foreach { rec =>
            val member = new java.io.ByteArrayOutputStream(256)
            val gz = new java.util.zip.GZIPOutputStream(member)
            gz.write(rec)
            gz.close()
            member.writeTo(out)
          }
        MediaRecord(id, "application/warc+gz", out.toByteArray)
      }
  }
}
