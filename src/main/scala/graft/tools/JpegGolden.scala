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
  }
}
