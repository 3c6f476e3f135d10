package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) plumbing: opaque `binary` content
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages running as batched partition-local transforms —
  * the Scala analog of `mapInPandas` batch UDFs.
  *
  * The actual media codecs are NOT in this container, so the decode
  * step is a clearly-marked deterministic STUB (`fakeDecode`): it
  * fabricates plausible dimensions/samples from a content hash.  The
  * Spark-side plumbing — schema, encoders, batching shape,
  * partition-preserving execution — is real and tested; swapping the
  * stub for javacv/ffmpeg is a one-function change.
  */
object MultimodalOps {

  /** An opaque media row: the content bytes plus caller metadata. */
  final case class MediaRecord(id: Long, kind: String, content: Array[Byte])

  /** Decoded per-item features (what a real decoder would emit). */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      width: Int,
      height: Int,
      meanByte: Double,
      byteHistogram: Array[Long], // 16 buckets
      frameOffsets: Array[Int]) // "sampled frames" for video-ish kinds

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
        batch.map(fakeDecode)
      }
    }
  }

  /** "Resize": deterministic downscale of the fake dimensions —
    * demonstrates a second chained partition-local stage.
    */
  def resize(ds: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
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
}
