package graft.tools

import graft.ops.MultimodalOps

/** Prints the per-key decoded-domain golden literals for the
  * `q_multimodal_jpeg_pixels` oracle as a SQL VALUES list.
  *
  * JPEG is lossy: the decoded pixels are a deterministic function of
  * the encoded bytes for a given JDK codec, but no SQL engine can
  * replay DCT + quantization + entropy decode arithmetically.  The
  * oracle therefore pins the codec's decoded-domain stats per image
  * key as literals (the q_bpe_train golden-literal discipline) and
  * lets DuckDB replay only the id → key mapping.  This tool IS the
  * derivation of those literals — same encode/decode calls the
  * distributed path runs, no Spark session needed because the codec
  * is per-row pure.  Re-run after any change to the synthesis
  * geometry, quality, or `pixelValue` closed form:
  *
  *   sbt "runMain graft.tools.JpegGolden"
  */
object JpegGolden {
  def main(args: Array[String]): Unit = {
    val keyMod = 30
    val w = 16
    val h = 12
    val quality = 0.9f
    val rows = (0 until keyMod).map { k =>
      // key k is representable by id = k (id % keyMod == k)
      val rec = MultimodalOps.jpegRecordOf(k.toLong, w, h, keyMod, quality)
      val f = MultimodalOps.jpegFeaturesOf(rec, keyMod, thumb = 4)
        .getOrElse(sys.error(s"decode failed for key $k"))
      require(f.width == w && f.height == h, s"dims off for key $k")
      s"  ($k, ${f.px_sum}, '${f.px_md5}', '${f.thumb_md5}', " +
        s"${f.sum_abs_err}, ${f.max_err})"
    }
    println(s"-- keyMod=$keyMod w=$w h=$h quality=$quality thumb=4")
    println(rows.mkString(",\n"))
    val maxErr = (0 until keyMod).map { k =>
      MultimodalOps.jpegFeaturesOf(
        MultimodalOps.jpegRecordOf(k.toLong, w, h, keyMod, quality),
        keyMod, 4).get.max_err
    }.max
    println(s"-- max per-sample decode error across keys: $maxErr")

    // ---- MJPEG frame literals for q_mp4_frames (sampled frames only)
    val fKeyMod = 10
    val fFrames = 4
    val fEvery = 2
    println(s"-- mjpeg frames: keyMod=$fKeyMod nFrames=$fFrames every=$fEvery w=$w h=$h q=$quality")
    val frameRows = for {
      k <- 0 until fKeyMod
      f <- 0 until fFrames if f % fEvery == 0
    } yield {
      val rec = MultimodalOps.mjpegRecordOf(
        k.toLong, w, h, fKeyMod, fFrames, quality)
      // decode through the real frame-sampling path
      val spans = MultimodalOps.jpegFrameSpans(
        rec.content, 0, rec.content.length)
      require(spans.length == fFrames, s"key $k: ${spans.length} frames")
      val (s0, e0) = spans(f)
      val frame = java.util.Arrays.copyOfRange(rec.content, s0, e0)
      val jf = MultimodalOps.jpegFeaturesOf(
        graft.ops.MultimodalOps.MediaRecord(
          k.toLong * fFrames + f, "image/jpeg", frame),
        fKeyMod * fFrames, 4).getOrElse(sys.error(s"frame decode $k/$f"))
      s"  ($k, $f, ${jf.px_sum}, '${jf.thumb_md5}', ${jf.max_err})"
    }
    println(frameRows.mkString(",\n"))
  }
}
