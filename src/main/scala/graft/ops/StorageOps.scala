package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Storage-layout helpers — the write-side levers that delete shuffles
  * from every LATER job, which is where a 100 TB pipeline actually
  * spends its time.
  *
  * The pattern: bucket the corpus ONCE by its join/group key (doc id,
  * content hash, user id); every subsequent equi-join, groupBy, or
  * dedup membership pass on that key reads the co-located layout and
  * skips its Exchange entirely (verified by `StorageSpec`: a
  * bucket-key self-join of a bucketed table plans zero shuffles).
  * Amortized over the tens of passes a training-data pipeline makes,
  * the one-time bucketed write is the single biggest shuffle saver
  * available.
  */
object StorageOps {

  /** Fixture-synthesis fan-out — see [[MultimodalOps.spread]]. */
  private def spread(df: DataFrame): DataFrame = MultimodalOps.spread(df)

  /** Hard cap on any single ORC tail read (postscript + footer).  A
    * real ORC footer is KBs-to-MBs; a corrupt postscript can declare
    * any varint, and the cap turns that into a clean reject instead
    * of a multi-GiB allocation (or, past 2 GiB, an Int overflow).
    */
  private val MaxOrcFooterRead: Long = 256L * 1024 * 1024

  /** Driver-side file listing shared by the metadata censuses: each
    * path is either a file or a directory whose immediate `suffix`
    * files are taken; `maxFiles` makes the driver-listing bound
    * explicit and loud (see [[parquetFootersDistributed]] for the
    * beyond-the-bound shape).
    */
  private def listFilesBounded(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      suffix: String, maxFiles: Int, opName: String): Seq[String] = {
    val files = paths.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).filter(s =>
          s.isFile && s.getPath.getName.endsWith(suffix))
          .map(_.getPath.toString).toSeq
      else Seq(p)
    }
    require(files.size <= maxFiles,
      s"$opName: ${files.size} files exceeds maxFiles=$maxFiles — " +
        "the driver-side directory listing is the bottleneck at this " +
        "scale; feed the file list from the catalog instead")
    files
  }

  /** Parquet footer census — the lake introspecting its OWN format:
    * one row per column chunk per row group with the exact row,
    * value, and byte accounting a compaction/repartition planner
    * needs (are row groups sized right? which column dominates the
    * bytes? is the codec what the table spec says?).  Reads ONLY the
    * footers via Spark's bundled parquet-hadoop — never a data page —
    * parallel over files: at 100 TB this is a metadata-sized pass
    * regardless of data volume, the same economics as the tar/zip
    * member walks.  Oracled against DuckDB's own `parquet_metadata()`
    * — a genuinely independent second reader of the same footers.
    *
    * The footer READS are distributed, but the directory LISTING is
    * driver-side (`fs.listStatus` into a local Seq) — fine to ~10⁶
    * files (a few hundred MB of FileStatus), the wrong shape at a
    * 10⁷-file lake where the listing itself must be distributed (one
    * task per directory shard) or fed from the catalog's file index.
    * `maxFiles` makes that bound explicit instead of letting the
    * driver OOM discover it; callers at catalog scale should pass the
    * file list from their metastore rather than a bare directory.
    *
    * Executors open files with the SESSION'S Hadoop configuration
    * (broadcast via [[org.apache.spark.util.SerializableConfiguration]]),
    * not a bare `new Configuration()` — a bare conf drops fs.* and
    * object-store credential settings, which on S3/GCS means the
    * driver could list the directory but every footer read would
    * fail auth.
    */
  def parquetFooters(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles, "parquetFooters")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    footerRowsOf(
      spark.createDataset(files)
        .repartition(math.max(1, math.min(files.size, 32))),
      confBc)
  }

  /** The footer-read stage shared by [[parquetFooters]] and
    * [[parquetFootersDistributed]]: one parquet-hadoop footer open
    * per file path, one output row per column chunk per row group.
    */
  private def footerRowsOf(
      files: org.apache.spark.sql.Dataset[String],
      confBc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.SerializableConfiguration]): DataFrame = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.flatMap {
              case (rg, i) =>
                rg.getColumns.asScala.toVector.map { cc =>
                  (hp.getName, i.toLong, rg.getRowCount,
                    cc.getPath.toDotString, cc.getValueCount,
                    cc.getTotalSize, cc.getTotalUncompressedSize,
                    cc.getCodec.name)
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "row_group_num_rows",
        "path_in_schema", "num_values", "total_compressed_size",
        "total_uncompressed_size", "compression")
  }

  /** DISTRIBUTED-listing flavor of [[parquetFooters]] — the 10⁷-file
    * lake shape the driver-listing flavor's `maxFiles` bound points
    * at.  The driver lists ONE shallow level (each root's immediate
    * children — partition directories, O(children) FileStatus, never
    * O(files)); each child becomes a shard, and EXECUTOR tasks walk
    * their shard's subtree with the filesystem's streaming
    * `listFiles(recursive)` iterator, emitting footer rows as they
    * go.  Nothing file-count-sized ever materializes on the driver,
    * and the listing parallelism scales with the partition-dir count
    * — the standard layout of a large table.  A second `repartition`
    * between listing and footer reads re-spreads a skewed shard (one
    * partition dir holding most files) across the cluster.
    *
    * `maxFilesPerShard` bounds a runaway subtree per task (a loud
    * reject, like the driver flavor's `maxFiles`); at catalog scale
    * with a file index, prefer feeding [[parquetFooters]] the exact
    * list instead of re-listing storage at all.
    */
  /** Distributed listing shared by the `*FootersDistributed` census
    * flavors: ONE shallow level on the driver (shard seeds =
    * immediate children of each root), then executor tasks walk
    * their shards with the streaming recursive iterator — the
    * 10⁷-file lake shape that lifts [[listFilesBounded]]'s
    * driver-listing bound.  `maxFilesPerShard` is the loud per-task
    * guard.
    */
  private def listFilesDistributed(
      spark: org.apache.spark.sql.SparkSession, roots: Seq[String],
      suffix: String, shardParallelism: Int, maxFilesPerShard: Int,
      opName: String): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // ONE shallow listing level on the driver: shard seeds
    val seeds = roots.flatMap { r =>
      val path = new org.apache.hadoop.fs.Path(r)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).map(_.getPath.toString).toSeq
      else Seq(r)
    }
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    spark.createDataset(seeds)
      .repartition(math.max(1, math.min(seeds.size, shardParallelism)))
      .mapPartitions { it =>
        val c = confBc.value.value
        it.flatMap { s =>
          val p = new org.apache.hadoop.fs.Path(s)
          val fs = p.getFileSystem(c)
          val st = fs.getFileStatus(p)
          if (!st.isDirectory) {
            if (s.endsWith(suffix)) Iterator.single(s)
            else Iterator.empty
          } else {
            // streaming recursive walk of THIS shard — the remote
            // iterator never buffers the subtree
            val rit = fs.listFiles(p, true)
            var n = 0
            new Iterator[String] {
              private var nextFile: String = null
              private def advance(): Unit = {
                nextFile = null
                while (nextFile == null && rit.hasNext) {
                  val f = rit.next()
                  if (f.isFile && f.getPath.getName.endsWith(suffix)) {
                    n += 1
                    if (n > maxFilesPerShard) throw new IllegalStateException(
                      s"$opName: shard $s exceeds " +
                        s"maxFilesPerShard=$maxFilesPerShard")
                    nextFile = f.getPath.toString
                  }
                }
              }
              advance()
              override def hasNext: Boolean = nextFile != null
              override def next(): String = {
                val r = nextFile; advance(); r
              }
            }
          }
        }
      }
  }

  def parquetFootersDistributed(
      spark: org.apache.spark.sql.SparkSession, roots: Seq[String],
      shardParallelism: Int = 256,
      maxFilesPerShard: Int = 10000000): DataFrame = {
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val files = listFilesDistributed(spark, roots, ".parquet",
      shardParallelism, maxFilesPerShard, "parquetFootersDistributed")
    // re-spread before the footer reads: shard sizes are skewed in
    // real layouts, footer opens should not be
    footerRowsOf(files.repartition(32), confBc)
  }

  /** Parquet ZONE-MAP census — the min/max/null-count statistics a
    * planner prunes row groups with, read from the same footers as
    * [[parquetFooters]] (never a data page) for an explicit list of
    * integer columns: one row per (file, row group, column) with the
    * footer's own null count and long min/max.  Oracled against
    * DuckDB's `parquet_metadata()` stats columns — two independent
    * readers agreeing on the exact pruning bounds.  Columns whose
    * chunks carry no statistics are skipped (a planner treats them as
    * unprunable, not as zero).
    */
  def parquetColumnStats(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      cols: Seq[String], maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val wanted = cols.toSet
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles, "parquetColumnStats")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.flatMap {
              case (rg, i) =>
                rg.getColumns.asScala.toVector.flatMap { cc =>
                  val name = cc.getPath.toDotString
                  val st = cc.getStatistics
                  st match {
                    case ls: org.apache.parquet.column.statistics.LongStatistics
                      if wanted.contains(name) && !ls.isEmpty &&
                        ls.hasNonNullValue =>
                      Some((hp.getName, i.toLong, name, ls.getNumNulls,
                        ls.genericGetMin.longValue(),
                        ls.genericGetMax.longValue()))
                    case is: org.apache.parquet.column.statistics.IntStatistics
                      if wanted.contains(name) && !is.isEmpty &&
                        is.hasNonNullValue =>
                      Some((hp.getName, i.toLong, name, is.getNumNulls,
                        is.genericGetMin.longValue(),
                        is.genericGetMax.longValue()))
                    case _ => None
                  }
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "null_count",
        "min_v", "max_v")
  }

  /** Parquet chunk ENCODING census — the physical-layout surface a
    * compaction/rewrite planner reads: per (file, row group, column)
    * the codec, the encoding set (SORTED, so two readers agree
    * regardless of thrift list order), value count, and
    * compressed/uncompressed byte totals.  A chunk stuck on PLAIN
    * where its siblings dictionary-encode, or a codec mix across a
    * table, is exactly what this surfaces at lake scale — still a
    * footer-only pass.
    */
  def parquetChunkEncodings(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files = listFilesBounded(
      spark, paths, ".parquet", maxFiles, "parquetChunkEncodings")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.flatMap {
              case (rg, i) =>
                rg.getColumns.asScala.toVector.map { cc =>
                  (hp.getName, i.toLong, cc.getPath.toDotString,
                    cc.getCodec.name(),
                    cc.getEncodings.asScala.map(_.name()).toSeq
                      .sorted.mkString(","),
                    cc.getValueCount, cc.getTotalSize,
                    cc.getTotalUncompressedSize)
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "codec",
        "encodings", "num_values", "total_compressed",
        "total_uncompressed")
  }

  /** Parquet PAGE-level zone maps — the finer-grained sibling of
    * [[parquetColumnStats]]: one row per data page per column chunk
    * from the ColumnIndex/OffsetIndex structures (parquet-mr ≥ 1.11
    * writes them by default), with each page's null count, integer
    * min/max (null pages carry no bounds — emitted with nulls, as a
    * planner treats them), first row index, offset, and compressed
    * size.  This is what page-level predicate pushdown actually
    * prunes with; row-group stats are the coarse fallback.  Still a
    * footer+index-only pass — no data page is ever decoded — so the
    * economics stay metadata-sized at any corpus scale.
    *
    * Oracle shape: pages AGGREGATE to their chunk (min of page mins,
    * max of page maxs, sum of page null counts == the chunk's own
    * statistics), so q_parquet_page_stats replays the SAME DuckDB
    * parquet_metadata() oracle as the chunk-level census — a third
    * physical path onto that oracle.
    */
  def parquetPageIndex(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      cols: Seq[String], maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val wanted = cols.toSet
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles, "parquetPageIndex")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            def longAt(bb: java.nio.ByteBuffer, width: Int): Long = {
              // PLAIN little-endian per the column-index spec
              val b = bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
              if (width == 4) b.getInt(b.position()).toLong
              else b.getLong(b.position())
            }
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.flatMap {
              case (rg, i) =>
                rg.getColumns.asScala.toVector.flatMap { cc =>
                  val name = cc.getPath.toDotString
                  val ptype = cc.getPrimitiveType.getPrimitiveTypeName
                  val width = ptype match {
                    case org.apache.parquet.schema.PrimitiveType
                        .PrimitiveTypeName.INT32 => 4
                    case org.apache.parquet.schema.PrimitiveType
                        .PrimitiveTypeName.INT64 => 8
                    case _ => 0
                  }
                  if (!wanted.contains(name) || width == 0) Vector.empty
                  else {
                    val ci = reader.readColumnIndex(cc)
                    val oi = reader.readOffsetIndex(cc)
                    if (ci == null || oi == null) Vector.empty
                    else {
                      val nulls = ci.getNullCounts.asScala
                      val mins = ci.getMinValues.asScala
                      val maxs = ci.getMaxValues.asScala
                      val nullPages = ci.getNullPages.asScala
                      (0 until oi.getPageCount).toVector.map { pg =>
                        val isNullPage = nullPages(pg)
                        (hp.getName, i.toLong, name, pg.toLong,
                          oi.getFirstRowIndex(pg),
                          oi.getOffset(pg),
                          oi.getCompressedPageSize(pg).toLong,
                          nulls(pg).longValue(),
                          if (isNullPage) None
                          else Some(longAt(mins(pg), width)),
                          if (isNullPage) None
                          else Some(longAt(maxs(pg), width)))
                      }
                    }
                  }
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "page_idx",
        "first_row_index", "page_offset", "compressed_size",
        "null_count", "min_v", "max_v")
  }

  /** Parquet DICTIONARY-filter probe — the THIRD chunk-skipping
    * surface next to the zone maps and bloom filters, and the only
    * EXACT one: when every data page of a chunk is
    * dictionary-encoded, the dictionary page is the chunk's exact
    * value set, so an equality predicate whose value is absent
    * skips the chunk with NO false positives and NO false negatives
    * (blooms only guarantee the latter).  Emits per (file, row
    * group): whether the chunk is fully dictionary-encoded
    * (EncodingStats — absent stats read as not-dict, fail-safe),
    * the dictionary size, and probe hit counts over a bounded
    * string dictionary.  Same closure-shipped-probe economics as
    * [[parquetBloomProbe]].
    */
  def parquetDictionaryProbe(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      column: String, values: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    require(values.size <= 100000,
      s"parquetDictionaryProbe: ${values.size} probe values — use a " +
        "join for large key sets")
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles,
      "parquetDictionaryProbe")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val valuesBc = spark.sparkContext.broadcast(values.toArray)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        val probes = valuesBc.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            val descriptor = reader.getFooter.getFileMetaData.getSchema
              .getColumns.asScala
              .find(_.getPath.mkString(".") == column)
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.map {
              case (rg, i) =>
                val cc = rg.getColumns.asScala
                  .find(_.getPath.toDotString == column)
                // fully-dictionary gate: EncodingStats is the
                // writer's own page accounting; absent stats (old
                // writers) read as NOT fully dict — fail-safe, the
                // planner falls back to stats/blooms
                val fullyDict = cc.exists(c =>
                  Option(c.getEncodingStats)
                    .exists(!_.hasNonDictionaryEncodedPages))
                // string-membership probe: only BINARY columns decode
                // through decodeToBinary — a fully-dict INT32/INT64
                // column would throw from the executor task instead
                // of emitting the documented fail-safe row, so gate
                // on the primitive type like the fullyDict gate
                val isBinary = descriptor.exists(
                  _.getPrimitiveType.getPrimitiveTypeName ==
                    org.apache.parquet.schema.PrimitiveType
                      .PrimitiveTypeName.BINARY)
                if (!fullyDict || descriptor.isEmpty || !isBinary)
                  (hp.getName, i.toLong, column, false, 0L,
                    probes.length.toLong, 0L)
                else {
                  // the concrete reader class is package-private;
                  // go through the public DictionaryPageReadStore face
                  val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                    reader.getDictionaryReader(rg)
                  val page = store.readDictionaryPage(descriptor.get)
                  if (page == null)
                    (hp.getName, i.toLong, column, false, 0L,
                      probes.length.toLong, 0L)
                  else {
                    val dict = page.getEncoding
                      .initDictionary(descriptor.get, page)
                    val set = new java.util.HashSet[String](
                      dict.getMaxId + 1)
                    var di = 0
                    while (di <= dict.getMaxId) {
                      set.add(dict.decodeToBinary(di).toStringUsingUTF8)
                      di += 1
                    }
                    var hits = 0L
                    var pi = 0
                    while (pi < probes.length) {
                      if (set.contains(probes(pi))) hits += 1
                      pi += 1
                    }
                    (hp.getName, i.toLong, column, true,
                      (dict.getMaxId + 1).toLong,
                      probes.length.toLong, hits)
                  }
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "dict_encoded",
        "dict_size", "n_probed", "n_hits")
  }

  /** Row-group-SHARDED [[parquetPageIndex]] — same rows, finer task
    * grain: the per-file flavor gives a one-giant-file lake exactly
    * ONE task (the skew shape the sf10 fixture accidentally models);
    * this one enumerates row groups in a footer-only first pass,
    * then fans out one work unit per (file, row group), so a single
    * 100-row-group file engages up to 100 tasks.  Each task re-opens
    * its file and reads ONLY its row group's ColumnIndex/OffsetIndex
    * pages — the footer open is metadata-sized, so the re-open cost
    * is per-row-group KBs, not data.  Output is IDENTICAL to
    * [[parquetPageIndex]] by construction (same per-block walk).
    */
  def parquetPageIndexSharded(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      cols: Seq[String], maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val wanted = cols.toSet
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles,
      "parquetPageIndexSharded")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    // pass 1: footer-only row-group enumeration
    val shards = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { p =>
        val conf = confBc.value.value
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf))
        try (0 until reader.getFooter.getBlocks.size()).map(i => (p, i))
        finally reader.close()
      }
    // pass 2: one work unit per (file, row group)
    shards
      .repartition(32, col("_1"), col("_2"))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (p, rgIdx) =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            def longAt(bb: java.nio.ByteBuffer, width: Int): Long = {
              val b = bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
              if (width == 4) b.getInt(b.position()).toLong
              else b.getLong(b.position())
            }
            val rg = reader.getFooter.getBlocks.get(rgIdx)
            rg.getColumns.asScala.toVector.flatMap { cc =>
              val name = cc.getPath.toDotString
              val ptype = cc.getPrimitiveType.getPrimitiveTypeName
              val width = ptype match {
                case org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT32 => 4
                case org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT64 => 8
                case _ => 0
              }
              if (!wanted.contains(name) || width == 0) Vector.empty
              else {
                val ci = reader.readColumnIndex(cc)
                val oi = reader.readOffsetIndex(cc)
                if (ci == null || oi == null) Vector.empty
                else {
                  val nulls = ci.getNullCounts.asScala
                  val mins = ci.getMinValues.asScala
                  val maxs = ci.getMaxValues.asScala
                  val nullPages = ci.getNullPages.asScala
                  (0 until oi.getPageCount).toVector.map { pg =>
                    val isNullPage = nullPages(pg)
                    (hp.getName, rgIdx.toLong, name, pg.toLong,
                      oi.getFirstRowIndex(pg),
                      oi.getOffset(pg),
                      oi.getCompressedPageSize(pg).toLong,
                      nulls(pg).longValue(),
                      if (isNullPage) None
                      else Some(longAt(mins(pg), width)),
                      if (isNullPage) None
                      else Some(longAt(maxs(pg), width)))
                  }
                }
              }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "page_idx",
        "first_row_index", "page_offset", "compressed_size",
        "null_count", "min_v", "max_v")
  }

  // ---- Delta deletion vectors (protocol: Deletion Vector Format) ----

  /** Z85 (ZeroMQ base85) decode — the encoding Delta uses for INLINE
    * deletion vectors in add actions.  Input length must be a
    * multiple of 5; each 5-char group is a big-endian base-85 u32.
    */
  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  private[graft] def z85Decode(s: String): Option[Array[Byte]] = {
    if (s == null || s.length % 5 != 0) return None
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s(i + j).toInt
        if (c >= 128 || Z85Rev(c) < 0) return None
        v = v * 85 + Z85Rev(c)
        j += 1
      }
      if (v > 0xffffffffL) return None
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
      o += 4
    }
    Some(out)
  }

  /** Z85 encode (synthesis side); input length must be a multiple
    * of 4 — callers pad the bitmap bytes with zeros, which the
    * decoder tolerates as trailing slack.
    */
  private[graft] def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, "z85Encode: length must be 4-aligned")
    val sb = new java.lang.StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = Z85Chars((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(g)
      i += 4
    }
    sb.toString
  }

  @inline private def dvU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def dvU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  @inline private def dvU32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** One standard 32-bit Roaring bitmap at `off0` (the public
    * RoaringFormatSpec): both cookies (12347 with run containers +
    * per-container run flags; 12346 with a separate count), the
    * descriptive key/cardinality headers, the offset header when the
    * spec says it's present, and all three container forms — array
    * (u16 values), bitset (8 KiB), run (u16 start/length pairs).
    * Returns (values as unsigned ints in a Long, next offset).
    */
  private def roaring32At(
      b: Array[Byte], off0: Int,
      budget: Int): Option[(Vector[Long], Int)] = {
    var off = off0
    if (off + 4 > b.length) return None
    val cookie = dvU32(b, off)
    var n = 0
    var hasRun = false
    var runFlags: Array[Byte] = null
    if ((cookie & 0xffffL) == 12347L) {
      n = ((cookie >>> 16) + 1).toInt
      hasRun = true
      off += 4
      val fb = (n + 7) / 8
      if (off + fb > b.length) return None
      runFlags = java.util.Arrays.copyOfRange(b, off, off + fb)
      off += fb
    } else if (cookie == 12346L) {
      if (off + 8 > b.length) return None
      n = dvU32(b, off + 4).toInt
      off += 8
    } else return None
    if (n < 0 || n > 65536) return None
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    if (off + 4L * n > b.length) return None
    var i = 0
    while (i < n) {
      keys(i) = dvU16(b, off)
      cards(i) = dvU16(b, off + 2) + 1
      off += 4
      i += 1
    }
    // offset header: present for the no-run cookie, and with runs
    // only when n >= 4 (the spec's NO_OFFSET_THRESHOLD)
    if (!hasRun || n >= 4) {
      if (off + 4L * n > b.length) return None
      off += 4 * n
    }
    val out = Vector.newBuilder[Long]
    var emitted = 0
    i = 0
    while (i < n) {
      val keyBase = keys(i).toLong << 16
      val isRun = hasRun && ((runFlags(i / 8) & (1 << (i % 8))) != 0)
      if (isRun) {
        if (off + 2 > b.length) return None
        val nRuns = dvU16(b, off)
        off += 2
        var r = 0
        while (r < nRuns) {
          if (off + 4 > b.length) return None
          val start = dvU16(b, off)
          val len = dvU16(b, off + 2)
          off += 4
          emitted += len + 1
          if (emitted > budget) return None // bomb guard
          var v = start
          while (v <= start + len) { out += keyBase | v; v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        if (off + 2L * cards(i) > b.length) return None
        emitted += cards(i)
        if (emitted > budget) return None
        var c = 0
        while (c < cards(i)) {
          out += keyBase | dvU16(b, off)
          off += 2
          c += 1
        }
      } else {
        if (off + 8192 > b.length) return None
        emitted += cards(i)
        if (emitted > budget) return None
        var w = 0
        while (w < 1024) {
          var word = 0L
          var k = 0
          while (k < 8) { word |= (b(off + w * 8 + k) & 0xffL) << (8 * k); k += 1 }
          while (word != 0L) {
            val t = word & -word
            out += keyBase | (w * 64 + java.lang.Long.numberOfTrailingZeros(word))
            word ^= t
          }
          w += 1
        }
        off += 8192
      }
      i += 1
    }
    Some((out.result(), off))
  }

  /** Decode a serialized RoaringBitmapArray in Delta's PORTABLE
    * format (the deletion-vector bitmap): 4-byte LE magic
    * 1681511377, 8-byte LE bitmap count, then per bitmap a 4-byte LE
    * high-32 key (ascending) + a standard 32-bit Roaring bitmap.
    * Positions are (key << 32) | value.  Up to 3 trailing ZERO bytes
    * are tolerated — the Z85 inline form pads to 4-byte groups.
    * TOTAL on arbitrary bytes; `maxPositions` bounds the expansion.
    */
  private[graft] def deltaDvBitmapOf(
      b: Array[Byte], maxPositions: Int = 1 << 24): Option[Vector[Long]] = {
    if (b == null || b.length < 12) return None
    if (dvU32(b, 0) != 1681511377L) return None
    val nHi = dvU32(b, 8)
    val n = dvU32(b, 4)
    if (nHi != 0L || n < 0 || n > (1 << 20)) return None
    var off = 12
    var lastKey = -1L
    val out = Vector.newBuilder[Long]
    var emitted = 0
    var i = 0L
    while (i < n) {
      if (off + 4 > b.length) return None
      val key = dvU32(b, off)
      off += 4
      if (key <= lastKey) return None // keys strictly ascending
      lastKey = key
      val (vals, next) =
        roaring32At(b, off, maxPositions - emitted).getOrElse(return None)
      emitted += vals.length
      vals.foreach(v => out += (key << 32) | v)
      off = next
      i += 1
    }
    // trailing slack: only the inline form's zero padding
    if (b.length - off > 3) return None
    while (off < b.length) {
      if (b(off) != 0) return None
      off += 1
    }
    Some(out.result())
  }

  /** Decode a deletion vector out of its FILE form (storageType
    * `u`/`p`): version byte 1, then at `offset` a 4-byte BIG-endian
    * data size (must equal the descriptor's sizeInBytes), the bitmap
    * bytes, and a 4-byte big-endian CRC-32 of those bytes — verified,
    * so a corrupt DV fails loudly instead of resurrecting deleted
    * rows.
    */
  private[graft] def deltaDvFilePositions(
      file: Array[Byte], offset: Int,
      sizeInBytes: Int): Option[Vector[Long]] = {
    if (file == null || file.length < 1 || file(0) != 1) return None
    if (offset < 1 || sizeInBytes < 0 ||
      offset.toLong + 4 + sizeInBytes + 4 > file.length) return None
    val size = dvU32be(file, offset)
    if (size != sizeInBytes.toLong) return None
    val dataOff = offset + 4
    val crc = new java.util.zip.CRC32()
    crc.update(file, dataOff, sizeInBytes)
    if ((crc.getValue & 0xffffffffL) !=
      dvU32be(file, dataOff + sizeInBytes)) return None
    deltaDvBitmapOf(
      java.util.Arrays.copyOfRange(file, dataOff, dataOff + sizeInBytes))
  }

  /** Decode an INLINE deletion vector (storageType `i`): Z85 text →
    * bitmap bytes (4-byte padded) → positions.
    */
  private[graft] def deltaDvInlinePositions(
      inline: String): Option[Vector[Long]] =
    z85Decode(inline).flatMap(deltaDvBitmapOf(_))

  /** Deletion-vector census over DESCRIPTOR rows (the shape a Delta
    * add action carries): `storage_type` `u`/`p` rows decode
    * `file_bytes` at (`offset`, `size_bytes`); `i` rows decode the
    * Z85 `inline_dv`.  One output row per deleted position; a row
    * whose DV fails its CRC/framing yields NO rows (fail-safe — the
    * scan layer must then treat the file as unreadable, never as
    * fully live).  The positions then drive the same broadcast
    * anti-join as [[applyPositionDeletes]].
    */
  def deltaDvPositions(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("storage_type"),
        col("file_bytes"), col("inline_dv"),
        col("offset").cast("int"), col("size_bytes").cast("int"))
      .as[(Long, String, Array[Byte], String, Int, Int)]
      .flatMap { case (id, st, fb, inl, off, sz) =>
        val pos = st match {
          case "u" | "p" => deltaDvFilePositions(fb, off, sz)
          case "i" => deltaDvInlinePositions(inl)
          case _ => None
        }
        pos.getOrElse(Vector.empty).map(p => (id, p))
      }
      .toDF("id", "pos")
  }

  /** Synthesize deletion-vector DESCRIPTOR rows through the Roaring
    * LIBRARY (independent-writer discipline: the library serializes
    * the inner 32-bit bitmaps, the from-spec walk reads them): per
    * id the position set replays from id arithmetic — a base arm
    * `k*3 + id%3` for k ≤ id%17 (array container); a run arm
    * 5000..5600 on id%5==0 (runOptimize turns 601 consecutive values
    * into a run container); a high-key arm (1<<32)+{7,11} on
    * id%4==0 (a second bitmap in the array).  Even ids ship the FILE
    * form (version byte + BE size + bitmap + BE CRC32 at offset 1),
    * odd ids the INLINE Z85 form (zero-padded to 4-byte groups).
    */
  def synthesizeDeltaDv(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map { id =>
        val positions = scala.collection.mutable.ArrayBuffer.empty[Long]
        (0 to (id % 17).toInt).foreach(k => positions += k * 3L + id % 3)
        if (id % 5 == 0) (5000 to 5600).foreach(p => positions += p.toLong)
        if (id % 4 == 0) {
          positions += (1L << 32) + 7
          positions += (1L << 32) + 11
        }
        val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
        val bos = new java.io.ByteArrayOutputStream(256)
        def wLE32(v: Long): Unit = {
          bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
          bos.write(((v >> 16) & 0xff).toInt)
          bos.write(((v >> 24) & 0xff).toInt)
        }
        wLE32(1681511377L) // portable RoaringBitmapArray magic
        wLE32(byKey.length.toLong); wLE32(0L) // 8-byte LE count
        val dos = new java.io.DataOutputStream(bos)
        byKey.foreach { case (key, ps) =>
          wLE32(key.toLong)
          val rb = org.roaringbitmap.RoaringBitmap.bitmapOf(
            ps.map(p => (p & 0xffffffffL).toInt).toSeq: _*)
          rb.runOptimize()
          rb.serialize(dos) // the LIBRARY writes the spec wire format
          dos.flush()
        }
        val bitmap = bos.toByteArray
        if (id % 2 == 0) {
          val out = new java.io.ByteArrayOutputStream(bitmap.length + 16)
          out.write(1) // DV file version
          def wBE32(v: Long): Unit = {
            out.write(((v >> 24) & 0xff).toInt)
            out.write(((v >> 16) & 0xff).toInt)
            out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
          }
          wBE32(bitmap.length.toLong)
          out.write(bitmap)
          val crc = new java.util.zip.CRC32()
          crc.update(bitmap)
          wBE32(crc.getValue)
          (id, "u", out.toByteArray, null: String, 1, bitmap.length)
        } else {
          val pad = (4 - bitmap.length % 4) % 4
          val padded = bitmap ++ new Array[Byte](pad)
          (id, "i", null: Array[Byte], z85Encode(padded), -1, -1)
        }
      }
      .toDF("id", "storage_type", "file_bytes", "inline_dv", "offset",
        "size_bytes")
  }

  // ---- Iceberg Puffin (statistics / deletion-vector container) ----

  @inline private def puffinMagicAt(b: Array[Byte], o: Int): Boolean =
    o >= 0 && o + 4 <= b.length &&
      b(o) == 'P' && b(o + 1) == 'F' && b(o + 2) == 'A' && b(o + 3) == '1'

  /** Puffin FILE census — the container Iceberg stores table
    * statistics (theta sketches) and, from v3, deletion vectors in.
    * Wire framing per the public Puffin spec: head magic `PFA1`,
    * blob payloads, then the footer — magic, FooterPayload (JSON),
    * 4-byte LE payload size, 4-byte flags, magic.  This walk
    * validates the framing and returns the footer JSON as a STRING
    * (the JSON-sidecar discipline: the query layer parses it with an
    * explicit schema, never an inference scan).  A footer with the
    * compressed flag set (bit 0) carries an LZ4-FRAME payload —
    * decoded through lz4-java (the codec Spark itself ships), with a
    * 64 MiB bomb guard; a flagged payload that is not a valid frame
    * rejects.  TOTAL on arbitrary bytes.
    */
  def puffinFooterOf(
      b: Array[Byte]): Option[(Long, Long, Long, String)] = {
    if (b == null || b.length < 20) return None
    if (!puffinMagicAt(b, 0)) return None
    if (!puffinMagicAt(b, b.length - 4)) return None
    val szOff = b.length - 12
    val size = dvU32(b, szOff)
    val flags = dvU32(b, b.length - 8)
    if (size < 0 || size > szOff - 8) return None
    val payloadStart = szOff - size.toInt
    if (!puffinMagicAt(b, payloadStart - 4)) return None
    val json =
      if ((flags & 1L) == 0L) new String(b, payloadStart, size.toInt, "UTF-8")
      else { // LZ4-frame-compressed footer payload
        val decoded =
          try {
            val in = new net.jpountz.lz4.LZ4FrameInputStream(
              new java.io.ByteArrayInputStream(b, payloadStart, size.toInt))
            try {
              val out = new java.io.ByteArrayOutputStream(
                math.min(size.toInt * 4 + 64, 1 << 20))
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              var ok = true
              while (n >= 0 && ok) {
                out.write(buf, 0, n)
                if (out.size() > (64 << 20)) ok = false // bomb guard
                else n = in.read(buf)
              }
              if (ok) Some(out.toByteArray) else None
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        new String(decoded.getOrElse(return None), "UTF-8")
      }
    Some((b.length.toLong, size, flags, json))
  }

  /** DataFrame form: one row per VALID Puffin file — (id, file_size,
    * footer_size, flags, footer_json).  Invalid files yield no row.
    */
  def puffinFooters(
      df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        puffinFooterOf(b).map { case (fs, sz, fl, js) =>
          (id, fs, sz, fl, js)
        }
      }
      .toDF("id", "file_size", "footer_size", "flags", "footer_json")
  }

  /** Decode one `deletion-vector-v1` blob span (Iceberg v3): 4-byte
    * BE combined length, magic `D1 D3 39 64`, the portable
    * RoaringBitmapArray vector (same wire format as Delta's DVs — by
    * design, the two specs share it), and a 4-byte BE CRC-32 over
    * magic + vector, VERIFIED.  The decoded cardinality must equal
    * the blob metadata's declared `cardinality` — a mismatched or
    * corrupt DV yields None (drop the file, never resurrect deleted
    * rows).
    */
  private[graft] def puffinDvBlobOf(
      b: Array[Byte], offset: Long, length: Long,
      cardinality: Long): Option[Vector[Long]] = {
    if (b == null || offset < 4 || length < 12 || length > b.length ||
      offset > b.length - length) return None
    val o = offset.toInt
    val combined = dvU32be(b, o)
    if (combined + 8 != length) return None
    if ((b(o + 4) & 0xff) != 0xd1 || (b(o + 5) & 0xff) != 0xd3 ||
      (b(o + 6) & 0xff) != 0x39 || (b(o + 7) & 0xff) != 0x64) return None
    val crc = new java.util.zip.CRC32()
    crc.update(b, o + 4, combined.toInt)
    if ((crc.getValue & 0xffffffffL) !=
      dvU32be(b, o + 4 + combined.toInt)) return None
    val vec = java.util.Arrays.copyOfRange(b, o + 8, o + 4 + combined.toInt)
    deltaDvBitmapOf(vec).filter(_.length.toLong == cardinality)
  }

  /** Positions census over DV-blob descriptor rows (the shape the
    * query layer produces by exploding [[puffinFooters]]'s JSON):
    * (id, content, offset, length, cardinality) → one row per
    * deleted position.  Feeds the same broadcast anti-join as
    * [[applyPositionDeletes]].
    */
  def puffinDvPositions(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("content"),
        col("offset").cast("long"), col("length").cast("long"),
        col("cardinality").cast("long"))
      .as[(Long, Array[Byte], Long, Long, Long)]
      .flatMap { case (id, b, off, len, card) =>
        puffinDvBlobOf(b, off, len, card)
          .getOrElse(Vector.empty).map(p => (id, p))
      }
      .toDF("id", "pos")
  }

  /** Per-row Puffin synthesis: `1 + id % 3` blobs.  Blob 0 on even
    * ids is a `deletion-vector-v1` blob whose positions replay from
    * id arithmetic — `k*5 + id%5` for k ≤ id%11, plus a high-key row
    * `2^32 + 3` on id%4==0 — with the inner 32-bit bitmaps written
    * by the Roaring LIBRARY (independent-writer discipline) under
    * the portable-array header, framed per the v3 DV spec (BE length,
    * D1D33964 magic, BE CRC-32).  All other blobs are
    * `apache-datasketches-theta-v1` stand-ins with deterministic
    * payload bytes (the census reads metadata, never sketch
    * internals); odd theta blobs declare `compression-codec: zstd`
    * to exercise the optional key.  Footer JSON carries the blobs
    * array + file properties; real offsets.  On id % 5 == 2 the
    * footer payload is LZ4-FRAME compressed (flag bit 0 set),
    * written by lz4-java — the library writes, the walk reads.
    */
  /** The synthetic DV position set for id: `k*5 + id%5` for
    * k ≤ id%11, plus the high-key row `2^32 + 3` on id%4==0 —
    * id arithmetic so DuckDB oracles can replay it, shared between
    * [[synthesizePuffin]]'s blob content and the v3 manifest
    * synthesizer's routed (offset, size, cardinality) so the
    * end-to-end MOR-DV fixture is coherent by construction.
    */
  private[graft] def dvPositionsFor(id: Long): Vector[Long] = {
    val b = Vector.newBuilder[Long]
    (0 to (id % 11).toInt).foreach(j => b += j * 5L + id % 5)
    if (id % 4 == 0) b += (1L << 32) + 3
    b.result()
  }

  /** Frame a position set as one `deletion-vector-v1` blob span per
    * the Iceberg v3 spec: 4-byte BE combined length, `D1 D3 39 64`
    * magic, the portable RoaringBitmapArray (inner 32-bit bitmaps
    * written by the Roaring LIBRARY — independent-writer discipline),
    * 4-byte BE CRC-32 over magic + vector.  The exact bytes
    * [[puffinDvBlobOf]] decodes.
    */
  private[graft] def dvFramedBlob(positions: Seq[Long]): Array[Byte] = {
    val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val vb = new java.io.ByteArrayOutputStream(128)
    def vLE32(v: Long): Unit = {
      vb.write((v & 0xff).toInt); vb.write(((v >> 8) & 0xff).toInt)
      vb.write(((v >> 16) & 0xff).toInt)
      vb.write(((v >> 24) & 0xff).toInt)
    }
    vLE32(1681511377L) // portable RoaringBitmapArray magic
    vLE32(byKey.length.toLong); vLE32(0L)
    val dos = new java.io.DataOutputStream(vb)
    byKey.foreach { case (key, ps) =>
      vLE32(key.toLong)
      val rb = org.roaringbitmap.RoaringBitmap.bitmapOf(
        ps.map(p => (p & 0xffffffffL).toInt).toSeq: _*)
      rb.runOptimize()
      rb.serialize(dos)
      dos.flush()
    }
    val vector = vb.toByteArray
    val magicVec =
      Array[Byte](0xd1.toByte, 0xd3.toByte, 0x39, 0x64) ++ vector
    val out = new java.io.ByteArrayOutputStream(magicVec.length + 8)
    def wBE32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    wBE32(magicVec.length.toLong)
    out.write(magicVec)
    val crc = new java.util.zip.CRC32()
    crc.update(magicVec)
    wBE32(crc.getValue)
    out.toByteArray
  }

  def synthesizePuffin(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long]
      .map { id =>
        val nBlobs = 1 + (id % 3).toInt
        val out = new java.io.ByteArrayOutputStream(512)
        def wLE32(v: Long): Unit = {
          out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
          out.write(((v >> 16) & 0xff).toInt)
          out.write(((v >> 24) & 0xff).toInt)
        }
        def wBE32(v: Long): Unit = {
          out.write(((v >> 24) & 0xff).toInt)
          out.write(((v >> 16) & 0xff).toInt)
          out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
        }
        out.write("PFA1".getBytes("ISO-8859-1"))
        val blobJsons = Vector.newBuilder[String]
        (0 until nBlobs).foreach { k =>
          val off = out.size().toLong
          if (k == 0 && id % 2 == 0) { // deletion-vector-v1
            val positions = dvPositionsFor(id)
            val framed = dvFramedBlob(positions)
            out.write(framed)
            blobJsons += s"""{"type":"deletion-vector-v1","fields":[],""" +
              s""""snapshot-id":${100 + id},"sequence-number":${id % 10},""" +
              s""""offset":$off,"length":${framed.length},"properties":{""" +
              s""""referenced-data-file":"data/part-$id.parquet",""" +
              s""""cardinality":"${positions.length}"}}"""
          } else { // theta-sketch stand-in
            val payload =
              s"theta-$id-$k-${"x" * (8 + (id % 7).toInt)}"
                .getBytes("ISO-8859-1")
            out.write(payload)
            val codec =
              if (k % 2 == 1) s""","compression-codec":"zstd"""" else ""
            blobJsons += s"""{"type":"apache-datasketches-theta-v1",""" +
              s""""fields":[${k + 1}],"snapshot-id":${100 + id},""" +
              s""""sequence-number":${id % 10},"offset":$off,""" +
              s""""length":${payload.length}$codec}"""
          }
        }
        val json = s"""{"blobs":[${blobJsons.result().mkString(",")}],""" +
          s""""properties":{"created-by":"graft-synth"}}"""
        val raw = json.getBytes("UTF-8")
        val (payload, flags) =
          if (id % 5 == 2) {
            val bo = new java.io.ByteArrayOutputStream(raw.length + 64)
            val fo = new net.jpountz.lz4.LZ4FrameOutputStream(bo)
            fo.write(raw)
            fo.close()
            (bo.toByteArray, 1L)
          } else (raw, 0L)
        out.write("PFA1".getBytes("ISO-8859-1"))
        out.write(payload)
        wLE32(payload.length.toLong)
        wLE32(flags)
        out.write("PFA1".getBytes("ISO-8859-1"))
        (id, out.toByteArray)
      }
      .toDF("id", "content")
  }

  /** Apply Iceberg v2 POSITION DELETES — the merge-on-read step a v2
    * table scan performs: data rows keyed by their physical position
    * (`_metadata.file_path` + `_metadata.row_index`, which Spark's
    * parquet scan emits natively) anti-joined against the delete
    * tuples (file_path, pos).  Delete files are metadata-sized
    * relative to data (KBs per data file), so the delete side is
    * BROADCAST — the corpus never shuffles to drop rows, exactly the
    * shape a 100 TB MOR scan needs.  Pairs with the r16 manifest
    * decode surfacing `content = 1` (position-delete) entries: the
    * planner routes those files here.
    */
  def applyPositionDeletes(
      data: DataFrame, deletes: DataFrame,
      fileCol: String = "file_path", posCol: String = "pos"): DataFrame = {
    data.join(
      org.apache.spark.sql.functions.broadcast(
        deletes.select(fileCol, posCol)),
      Seq(fileCol, posCol), "left_anti")
  }

  /** Apply Iceberg v2 EQUALITY DELETES — the merge-on-read step the
    * CDC/streaming-upsert writers (Flink et al.) demand: a data row
    * is dropped when ANY equality-delete tuple matches it on ALL the
    * `equality_ids` columns AND the delete's sequence number is
    * STRICTLY greater than the data row's (spec: equality deletes
    * apply only to data files with a LOWER data sequence number —
    * a later-sequence data row survives an earlier delete, which is
    * what makes upsert-then-reinsert round-trips correct).  Matching
    * is NULL-SAFE (`<=>`): the spec's equality semantics treat null
    * as equal to null, unlike SQL `=` which would silently never
    * delete null-keyed rows.
    *
    * Scale shape: like position deletes, equality-delete files are
    * metadata-sized relative to data, so the delete side is
    * BROADCAST — the equi-keys keep the join a BroadcastHashJoin
    * with the sequence inequality as its post-join residual; the
    * corpus never shuffles to drop rows.
    */
  def applyEqualityDeletes(
      data: DataFrame, deletes: DataFrame, eqCols: Seq[String],
      dataSeqCol: String = "data_seq",
      deleteSeqCol: String = "delete_seq"): DataFrame = {
    require(eqCols.nonEmpty, "applyEqualityDeletes: empty equality_ids")
    val d = deletes.select(
      eqCols.map(c => col(c).as(s"__eq_$c")) :+
        col(deleteSeqCol).cast("long").as("__eq_seq"): _*)
    val cond = eqCols.map(c => data(c) <=> d(s"__eq_$c"))
      .reduce(_ && _) &&
      data(dataSeqCol).cast("long") < d("__eq_seq")
    data.join(org.apache.spark.sql.functions.broadcast(d), cond, "left_anti")
  }

  /** Parquet BLOOM-FILTER probe census — the point-lookup skipping
    * surface next to the zone maps: for each row group of each file,
    * read the column's bloom filter (written when
    * `parquet.bloom.filter.enabled#col=true`) and probe the given
    * long values against it.  Emits per (file, row group): whether a
    * filter exists, how many values were probed, and how many hit.
    * The contract a planner relies on is NO FALSE NEGATIVES — every
    * value actually present in the chunk MUST hit — which is exactly
    * what the oracle can pin in closed form (probing the chunk's own
    * values ⇒ hits == probes); false-positive rate on absent values
    * is probabilistic and only bounded in tests.  `values` is
    * broadcast with the task closure — keep it bounded (thousands,
    * not millions); this is a dictionary-of-keys probe, not a join.
    */
  def parquetBloomProbe(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      column: String, values: Seq[Long],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    require(values.size <= 100000,
      s"parquetBloomProbe: ${values.size} probe values — use a join " +
        "for large key sets, the closure-shipped probe is for bounded " +
        "dictionaries")
    val files = listFilesBounded(spark, paths, ".parquet", maxFiles, "parquetBloomProbe")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val valuesBc = spark.sparkContext.broadcast(values.toArray)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        val probes = valuesBc.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toVector.zipWithIndex.map {
              case (rg, i) =>
                val cc = rg.getColumns.asScala
                  .find(_.getPath.toDotString == column)
                val bloom = cc.flatMap { c =>
                  Option(reader.getBloomFilterDataReader(rg))
                    .flatMap(r => Option(r.readBloomFilter(c)))
                }
                bloom match {
                  case Some(bf) =>
                    var hits = 0L
                    var j = 0
                    while (j < probes.length) {
                      if (bf.findHash(bf.hash(probes(j)))) hits += 1
                      j += 1
                    }
                    (hp.getName, i.toLong, column, true,
                      probes.length.toLong, hits)
                  case None =>
                    (hp.getName, i.toLong, column, false, 0L, 0L)
                }
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "path_in_schema", "has_bloom",
        "n_probed", "n_hits")
  }

  /** One ORC stripe's census row (file-level fields repeated, the
    * parquetFooters shape): exact stripe geometry + row accounting
    * from the file's own footer — the per-stripe view a compaction
    * planner needs.
    */
  final case class OrcStripeRow(
      fileName: String, compression: String, nTypes: Long,
      totalRows: Long, contentLength: Long, nStripes: Long,
      stripeId: Long, stripeOffset: Long, indexLength: Long,
      dataLength: Long, stripeFooterLength: Long, stripeRows: Long)

  /** One (stripe, column) zone-map row from the ORC Metadata section:
    * `kind` names the statistics message that carried bounds ("int",
    * "double", "string", "date", "timestamp" — dates as epoch-days
    * and timestamps as UTC epoch-millis in the int columns); unset
    * bounds stay None (ORC stats fields are all optional).
    */
  final case class OrcStripeColStats(
      stripeId: Long, columnId: Long, nValues: Long, hasNull: Boolean,
      kind: String, intMin: Option[Long], intMax: Option[Long],
      dblMin: Option[Double], dblMax: Option[Double],
      strMin: Option[String], strMax: Option[String])

  private[graft] final case class OrcFooterMeta(
      compression: String, nTypes: Long, totalRows: Long,
      contentLength: Long,
      stripes: Vector[(Long, Long, Long, Long, Long)],
      rowIndexStride: Long = 0L)

  /** Bounds-less ColumnStatistics value (before stripe/column ids are
    * attached): kind is null when the message carried no prunable
    * bounds.  Shared by the stripe-statistics and row-index walks —
    * the SAME protobuf message appears in both places, per spec.
    */
  private final case class OrcColStatsVal(
      nValues: Long, hasNull: Boolean, kind: String,
      intMin: Option[Long], intMax: Option[Long],
      dblMin: Option[Double], dblMax: Option[Double],
      strMin: Option[String], strMax: Option[String])

  /** Parse one ORC ColumnStatistics message at [o, o+l) of `buf`:
    * Integer (sint64 zigzag), Double (fixed64), String (exact
    * minimum/maximum only), Date (sint32 zigzag epoch-days through
    * the int fields), Timestamp (UTC epoch-millis through the int
    * fields).  None on malformed bytes.
    */
  private def orcColumnStatsAt(
      buf: Array[Byte], o: Int, l: Int): Option[OrcColStatsVal] = {
    @inline def unzig(z: Long): Long = (z >>> 1) ^ -(z & 1)
    val cr = new PbReader(buf, o, o + l)
    var nValues = -1L
    var hasNull = false
    var kind: String = null
    var intMin: Option[Long] = None
    var intMax: Option[Long] = None
    var dblMin: Option[Double] = None
    var dblMax: Option[Double] = None
    var strMin: Option[String] = None
    var strMax: Option[String] = None
    while (cr.hasMore) {
      val (cf, cw) = cr.tag()
      if (cr.bad) return None
      (cf, cw) match {
        case (1, 0) => nValues = cr.varint()
        case (2, 2) => // IntegerStatistics (sint64 zigzag)
          val (io, il) = cr.lenDelim()
          if (cr.bad) return None
          val ir = new PbReader(buf, io, io + il)
          while (ir.hasMore) {
            val (inf, iw) = ir.tag()
            if (ir.bad) return None
            (inf, iw) match {
              case (1, 0) => intMin = Some(unzig(ir.varint())); kind = "int"
              case (2, 0) => intMax = Some(unzig(ir.varint())); kind = "int"
              case (_, wire) => ir.skip(wire)
            }
            if (ir.bad) return None
          }
        case (3, 2) => // DoubleStatistics (fixed64 IEEE-754)
          val (io, il) = cr.lenDelim()
          if (cr.bad) return None
          val ir = new PbReader(buf, io, io + il)
          while (ir.hasMore) {
            val (inf, iw) = ir.tag()
            if (ir.bad) return None
            (inf, iw) match {
              case (1, 1) =>
                dblMin = Some(
                  java.lang.Double.longBitsToDouble(ir.fixed64()))
                kind = "double"
              case (2, 1) =>
                dblMax = Some(
                  java.lang.Double.longBitsToDouble(ir.fixed64()))
                kind = "double"
              case (_, wire) => ir.skip(wire)
            }
            if (ir.bad) return None
          }
        case (4, 2) => // StringStatistics (exact min/max only)
          val (io, il) = cr.lenDelim()
          if (cr.bad) return None
          val ir = new PbReader(buf, io, io + il)
          while (ir.hasMore) {
            val (inf, iw) = ir.tag()
            if (ir.bad) return None
            (inf, iw) match {
              case (1, 2) =>
                val (so, sl) = ir.lenDelim()
                if (ir.bad) return None
                strMin = Some(new String(buf, so, sl, "UTF-8"))
                kind = "string"
              case (2, 2) =>
                val (so, sl) = ir.lenDelim()
                if (ir.bad) return None
                strMax = Some(new String(buf, so, sl, "UTF-8"))
                kind = "string"
              case (_, wire) => ir.skip(wire)
            }
            if (ir.bad) return None
          }
        case (7, 2) => // DateStatistics (sint32 zigzag epoch-days)
          val (io, il) = cr.lenDelim()
          if (cr.bad) return None
          val ir = new PbReader(buf, io, io + il)
          while (ir.hasMore) {
            val (inf, iw) = ir.tag()
            if (ir.bad) return None
            (inf, iw) match {
              case (1, 0) => intMin = Some(unzig(ir.varint())); kind = "date"
              case (2, 0) => intMax = Some(unzig(ir.varint())); kind = "date"
              case (_, wire) => ir.skip(wire)
            }
            if (ir.bad) return None
          }
        case (9, 2) => // TimestampStatistics: UTC epoch-millis only
          // (fields 3/4 — the well-defined pair every modern writer
          // emits; the writer-timezone fields 1/2 are skipped)
          val (io, il) = cr.lenDelim()
          if (cr.bad) return None
          val ir = new PbReader(buf, io, io + il)
          while (ir.hasMore) {
            val (inf, iw) = ir.tag()
            if (ir.bad) return None
            (inf, iw) match {
              case (3, 0) =>
                intMin = Some(unzig(ir.varint())); kind = "timestamp"
              case (4, 0) =>
                intMax = Some(unzig(ir.varint())); kind = "timestamp"
              case (_, wire) => ir.skip(wire)
            }
            if (ir.bad) return None
          }
        case (10, 0) => hasNull = cr.varint() != 0L
        case (_, wire) => cr.skip(wire)
      }
      if (cr.bad) return None
    }
    Some(OrcColStatsVal(nValues, hasNull, kind, intMin, intMax,
      dblMin, dblMax, strMin, strMax))
  }

  /** Minimal bounds-checked protobuf walker for the ORC metadata
    * messages (varint + length-delimited only is what they use; the
    * fixed wire types are skipped correctly anyway).  Every read is
    * range-guarded; malformed input surfaces as None in the callers,
    * never an exception.
    */
  private final class PbReader(b: Array[Byte], var pos: Int, val end: Int) {
    var bad = false
    def hasMore: Boolean = !bad && pos < end
    def varint(): Long = {
      var v = 0L; var shift = 0; var n = 0
      while (n < 10) {
        if (pos >= end) { bad = true; return 0L }
        val x = b(pos); pos += 1; n += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      bad = true; 0L
    }
    /** (fieldNo, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    /** For wire type 2: (offset, length) of the payload; advances past it. */
    def lenDelim(): (Int, Int) = {
      val len = varint()
      if (bad || len < 0 || len > end - pos) { bad = true; (0, 0) }
      else { val off = pos; pos += len.toInt; (off, len.toInt) }
    }
    /** Wire type 1: 8 bytes little-endian. */
    def fixed64(): Long = {
      if (pos + 8 > end) { bad = true; return 0L }
      var v = 0L
      var k = 7
      while (k >= 0) { v = (v << 8) | (b(pos + k) & 0xffL); k -= 1 }
      pos += 8
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8; if (pos > end) bad = true
      case 2 => lenDelim(); ()
      case 5 => pos += 4; if (pos > end) bad = true
      case _ => bad = true
    }
  }

  private val OrcCompressionNames = Map(
    0L -> "NONE", 1L -> "ZLIB", 2L -> "SNAPPY", 3L -> "LZO",
    4L -> "LZ4", 5L -> "ZSTD")

  /** Decode one ORC metadata SECTION spanning [start, end) of `tail`
    * through the compressed-stream chunk framing (3-byte LE header =
    * chunkLen·2 + isOriginal): NONE copies, ZLIB inflates per chunk
    * (raw DEFLATE, bomb-guarded), other codecs reject — shared by the
    * footer and stripe-statistics walks.
    */
  private def orcSectionBytes(
      tail: Array[Byte], start: Int, end: Int,
      compression: Long): Option[Array[Byte]] = {
    if (start < 0 || end > tail.length || start > end) return None
    if (compression == 0L)
      Some(java.util.Arrays.copyOfRange(tail, start, end))
    else if (compression == 1L) {
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, (end - start) * 2))
      var p = start
      while (p < end) {
        if (p + 3 > end) return None
        val h = (tail(p) & 0xff) | (tail(p + 1) & 0xff) << 8 |
          (tail(p + 2) & 0xff) << 16
        val original = (h & 1) == 1
        val chunkLen = h >>> 1
        p += 3
        if (chunkLen <= 0 || p + chunkLen > end) return None
        if (original) out.write(tail, p, chunkLen)
        else out.write(graft.ops.MultimodalOps.inflateRawSpan(
          tail, p, chunkLen, 64 << 20).getOrElse(return None))
        if (out.size() > (64 << 20)) return None // bomb guard
        p += chunkLen
      }
      Some(out.toByteArray)
    } else None // SNAPPY/LZO/LZ4/ZSTD metadata: honest reject
  }

  /** Parse an ORC file's metadata from its TAIL bytes (the last
    * `tail.length` bytes of a `fileLen`-byte file): postscript →
    * (footer length, compression kind, "ORC" magic), then the footer
    * — through the ORC compressed-stream chunk framing (3-byte LE
    * header = chunkLen·2 + isOriginal) with a raw-DEFLATE inflate for
    * ZLIB — decoded as protobuf by hand: content length, stripe list
    * (offset/index/data/footer/rows), type count, total rows.
    * From-spec and library-free, so StorageSpec's orc-core
    * cross-check is a genuinely independent second reader.  Strict:
    * the magic must match at both ends, SNAPPY/LZO/LZ4/ZSTD metadata
    * reject loudly as None (size-guessing a codec we don't decode
    * would mis-census), and the stripe rows must sum to the footer's
    * own total.  TOTAL on arbitrary bytes.
    */
  /** Read an ORC file's tail metadata with the two-step big-footer
    * fallback [[parquetFooters]]' ORC censuses use inline: try a
    * 16 KiB read first (covers small files in one IO), and when the
    * footer is larger — a few hundred stripes of stripe entries
    * already overflow 16 KiB — re-read exactly `1 + psLen +
    * footerLen` bytes as the postscript declares.  None when neither
    * read yields a parseable tail.
    */
  private[graft] def orcTailOfFile(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, len: Long): Option[OrcFooterMeta] = {
    def readTail(n: Long): Array[Byte] = {
      require(n > 0 && n <= MaxOrcFooterRead,
        s"orcTailOfFile: $path declares a tail read of $n bytes")
      val want = math.min(len, n).toInt
      val buf = new Array[Byte](want)
      val in = fs.open(path)
      try in.readFully(len - want, buf, 0, want) finally in.close()
      buf
    }
    val first = readTail(16384L)
    orcTailOf(first, len).orElse {
      if (first.length < 2) None
      else {
        val psLen = first(first.length - 1) & 0xff
        if (psLen < 1 || psLen + 1 > first.length) None
        else {
          val psStart = first.length - 1 - psLen
          val ps = new PbReader(first, psStart, psStart + psLen)
          var footerLen = -1L
          while (ps.hasMore) {
            val (f, w) = ps.tag()
            if (ps.bad) return None
            if (f == 1 && w == 0) footerLen = ps.varint()
            else ps.skip(w)
            if (ps.bad) return None
          }
          if (footerLen <= 0) None
          else orcTailOf(readTail(1L + psLen + footerLen), len)
        }
      }
    }
  }

  private[graft] def orcTailOf(
      tail: Array[Byte], fileLen: Long): Option[OrcFooterMeta] = {
    if (tail == null || tail.length < 4 || fileLen < tail.length) return None
    val psLen = tail(tail.length - 1) & 0xff
    if (psLen < 1 || psLen + 1 > tail.length) return None
    val psStart = tail.length - 1 - psLen
    // postscript: uncompressed always
    val ps = new PbReader(tail, psStart, psStart + psLen)
    var footerLen = -1L
    var compression = 0L
    var magicOk = false
    while (ps.hasMore) {
      val (f, w) = ps.tag()
      if (ps.bad) return None
      (f, w) match {
        case (1, 0) => footerLen = ps.varint()
        case (2, 0) => compression = ps.varint()
        case (8000, 2) =>
          val (o, l) = ps.lenDelim()
          magicOk = !ps.bad && l == 3 && tail(o) == 'O' &&
            tail(o + 1) == 'R' && tail(o + 2) == 'C'
        case (_, wire) => ps.skip(wire)
      }
      if (ps.bad) return None
    }
    if (!magicOk || footerLen <= 0 || footerLen > psStart) return None
    val codec = OrcCompressionNames.getOrElse(compression, return None)
    val footerStart = psStart - footerLen.toInt
    // footer: through the compressed-stream chunk framing when coded
    val footer: Array[Byte] =
      orcSectionBytes(tail, footerStart, psStart, compression)
        .getOrElse(return None)
    val fr = new PbReader(footer, 0, footer.length)
    var contentLength = -1L
    var totalRows = -1L
    var rowIndexStride = 0L
    var nTypes = 0L
    val stripes = Vector.newBuilder[(Long, Long, Long, Long, Long)]
    var nStripes = 0
    while (fr.hasMore) {
      val (f, w) = fr.tag()
      if (fr.bad) return None
      (f, w) match {
        case (2, 0) => contentLength = fr.varint()
        case (6, 0) => totalRows = fr.varint()
        case (8, 0) => rowIndexStride = fr.varint()
        case (3, 2) => // StripeInformation
          val (o, l) = fr.lenDelim()
          if (fr.bad) return None
          val sr = new PbReader(footer, o, o + l)
          var off = -1L; var idx = 0L; var dat = 0L; var sfl = 0L; var rows = -1L
          while (sr.hasMore) {
            val (sf, sw) = sr.tag()
            if (sr.bad) return None
            (sf, sw) match {
              case (1, 0) => off = sr.varint()
              case (2, 0) => idx = sr.varint()
              case (3, 0) => dat = sr.varint()
              case (4, 0) => sfl = sr.varint()
              case (5, 0) => rows = sr.varint()
              case (_, wire) => sr.skip(wire)
            }
            if (sr.bad) return None
          }
          if (off < 0 || rows < 0) return None
          stripes += ((off, idx, dat, sfl, rows))
          nStripes += 1
        case (4, 2) => nTypes += 1; fr.skip(2) // Type: count, don't decode
        case (_, wire) => fr.skip(wire)
      }
      if (fr.bad) return None
    }
    if (contentLength < 0 || totalRows < 0 || nTypes <= 0) return None
    val sv = stripes.result()
    // the footer's own row total must equal the stripes' sum — a
    // mismatch means a mis-walk, fail the file rather than census it
    if (sv.map(_._5).sum != totalRows) return None
    if (sv.exists { case (off, idx, dat, sfl, _) =>
      off + idx + dat + sfl > fileLen }) return None
    Some(OrcFooterMeta(codec, nTypes, totalRows, contentLength, sv,
      rowIndexStride))
  }

  /** Whole-buffer flavor (test/fuzz surface): checks the leading
    * "ORC" header magic too, then defers to [[orcTailOf]].
    */
  private[graft] def orcFooterOf(b: Array[Byte]): Option[OrcFooterMeta] = {
    if (b == null || b.length < 7) return None
    if (!(b(0) == 'O' && b(1) == 'R' && b(2) == 'C')) return None
    orcTailOf(b, b.length.toLong)
  }

  /** ORC footer census — the lake's OTHER columnar format, censused
    * with the same economics as [[parquetFooters]]: one row per
    * stripe, footers only, never a data page.  The listing/broadcast
    * discipline is parquetFooters' verbatim (driver listing bounded
    * by `maxFiles`, session Hadoop conf broadcast to executors); the
    * per-file read is two ranged reads of the TAIL (postscript sizing
    * pass, then exactly the footer span when it exceeds the first
    * guess) — at 100 TB a metadata-sized pass regardless of data
    * volume.
    */
  def orcFooters(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files = listFilesBounded(spark, paths, ".orc", maxFiles, "orcFooters")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    orcFooterRows(spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32))), confBc)
  }

  /** Distributed-listing flavor of [[orcFooters]] — the same
    * 10⁷-file-lake shape as [[parquetFootersDistributed]]: one
    * shallow driver listing seeds the shards, executor tasks walk
    * subtrees, and the footer rows must be byte-identical to the
    * driver-listing flavor (pinned by StorageSpec and the shared
    * q_orc_footer oracle).
    */
  def orcFootersDistributed(
      spark: org.apache.spark.sql.SparkSession, roots: Seq[String],
      shardParallelism: Int = 256,
      maxFilesPerShard: Int = 10000000): DataFrame = {
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val files = listFilesDistributed(spark, roots, ".orc",
      shardParallelism, maxFilesPerShard, "orcFootersDistributed")
    orcFooterRows(files.repartition(32), confBc)
  }

  private def orcFooterRows(
      files: org.apache.spark.sql.Dataset[String],
      confBc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.SerializableConfiguration]): DataFrame = {
    import files.sparkSession.implicits._
    files
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(conf)
          val len = fs.getFileStatus(hp).getLen
          def readTail(n: Long): Array[Byte] = {
            // clamp BEFORE .toInt: on a >2 GiB file whose corrupt
            // postscript reports a bogus huge footerLen, min(len, n)
            // can exceed Int.MaxValue and a bare .toInt would go
            // negative -> NegativeArraySizeException instead of the
            // intended clean reject below
            require(n > 0 && n <= MaxOrcFooterRead,
              s"orcFooters: $p declares a footer read of $n bytes " +
                s"(cap $MaxOrcFooterRead) — corrupt postscript")
            val want = math.min(len, n).toInt
            val buf = new Array[Byte](want)
            val in = fs.open(hp)
            try in.readFully(len - want, buf, 0, want) finally in.close()
            buf
          }
          val first = readTail(256L * 1024)
          val meta = orcTailOf(first, len).orElse {
            // footer larger than the first guess: size it exactly from
            // the postscript, then re-read
            if (first.length < 2) None
            else {
              val psLen = first(first.length - 1) & 0xff
              if (psLen < 1 || psLen + 1 > first.length) None
              else {
                val psStart = first.length - 1 - psLen
                val ps = new PbReader(first, psStart, psStart + psLen)
                var footerLen = -1L
                while (ps.hasMore) {
                  val (f, w) = ps.tag()
                  if (f == 1 && w == 0) footerLen = ps.varint()
                  else ps.skip(w)
                }
                if (footerLen <= 0) None
                else orcTailOf(readTail(1L + psLen + footerLen), len)
              }
            }
          }.getOrElse(throw new IllegalArgumentException(
            s"orcFooters: $p is not a readable ORC file (or uses a " +
              "metadata codec this census rejects)"))
          meta.stripes.zipWithIndex.map {
            case ((off, idx, dat, sfl, rows), i) =>
              OrcStripeRow(hp.getName, meta.compression, meta.nTypes,
                meta.totalRows, meta.contentLength,
                meta.stripes.length.toLong, i.toLong, off, idx, dat,
                sfl, rows)
          }
        }
      }
      .toDF("file_name", "compression", "n_types", "total_rows",
        "content_length", "n_stripes", "stripe_id", "stripe_offset",
        "index_length", "data_length", "stripe_footer_length",
        "stripe_rows")
  }

  /** Parse an ORC file's STRIPE STATISTICS from its tail bytes: the
    * postscript's metadataLength locates the Metadata section (it
    * sits immediately before the footer), decoded through the same
    * chunk framing; `Metadata { repeated StripeStatistics }`, one
    * `ColumnStatistics` per column per stripe (column 0 is the root
    * struct).  Rows are emitted for columns carrying Integer
    * (sint64 zigzag), Double (fixed64), String (length-delimited
    * UTF-8), or Date (sint32 zigzag epoch-days, surfaced through the
    * int columns) statistics with a min or max — a column without
    * bounds is unprunable, not zero.  String bounds follow the
    * writer's `minimum`/`maximum` fields only; a long value the
    * writer demoted to `lowerBound`/`upperBound` (truncated, ORC-2)
    * yields no row rather than an inexact one.  None on anything
    * malformed.  TOTAL on arbitrary bytes.
    */
  private[graft] def orcStripeStatsOf(
      tail: Array[Byte],
      fileLen: Long): Option[Vector[OrcStripeColStats]] = {
    if (tail == null || tail.length < 4 || fileLen < tail.length) return None
    val psLen = tail(tail.length - 1) & 0xff
    if (psLen < 1 || psLen + 1 > tail.length) return None
    val psStart = tail.length - 1 - psLen
    val ps = new PbReader(tail, psStart, psStart + psLen)
    var footerLen = -1L
    var metadataLen = -1L
    var compression = 0L
    var magicOk = false
    while (ps.hasMore) {
      val (f, w) = ps.tag()
      if (ps.bad) return None
      (f, w) match {
        case (1, 0) => footerLen = ps.varint()
        case (2, 0) => compression = ps.varint()
        case (5, 0) => metadataLen = ps.varint()
        case (8000, 2) =>
          val (o, l) = ps.lenDelim()
          magicOk = !ps.bad && l == 3 && tail(o) == 'O' &&
            tail(o + 1) == 'R' && tail(o + 2) == 'C'
        case (_, wire) => ps.skip(wire)
      }
      if (ps.bad) return None
    }
    if (!magicOk || footerLen <= 0 || metadataLen < 0 ||
      footerLen + metadataLen > psStart) return None
    if (!OrcCompressionNames.contains(compression)) return None
    val metaStart = psStart - footerLen.toInt - metadataLen.toInt
    val meta = orcSectionBytes(tail, metaStart,
      metaStart + metadataLen.toInt, compression).getOrElse(return None)
    val out = Vector.newBuilder[OrcStripeColStats]
    val mr = new PbReader(meta, 0, meta.length)
    var stripeId = 0L
    while (mr.hasMore) {
      val (f, w) = mr.tag()
      if (mr.bad) return None
      if (f == 1 && w == 2) { // StripeStatistics
        val (o, l) = mr.lenDelim()
        if (mr.bad) return None
        val sr = new PbReader(meta, o, o + l)
        var colId = 0L
        while (sr.hasMore) {
          val (sf, sw) = sr.tag()
          if (sr.bad) return None
          if (sf == 1 && sw == 2) { // ColumnStatistics
            val (co, cl) = sr.lenDelim()
            if (sr.bad) return None
            val cs = orcColumnStatsAt(meta, co, cl).getOrElse(return None)
            if (cs.kind != null && cs.nValues >= 0)
              out += OrcStripeColStats(stripeId, colId, cs.nValues,
                cs.hasNull, cs.kind, cs.intMin, cs.intMax, cs.dblMin,
                cs.dblMax, cs.strMin, cs.strMax)
            colId += 1
          } else {
            sr.skip(sw)
            if (sr.bad) return None
          }
        }
        stripeId += 1
      } else {
        mr.skip(w)
        if (mr.bad) return None
      }
    }
    Some(out.result())
  }

  /** ORC stripe-level ZONE-MAP census — the ORC sibling of
    * [[parquetColumnStats]]: per (file, stripe, column) TYPED
    * min/max/value-count/has-null (integer, double, string, and
    * date statistics) from the file's own Metadata section, the
    * bounds a planner prunes stripes with.  Same
    * listing/broadcast/tail-read economics as [[orcFooters]]; the
    * fallback tail read is sized from the postscript to cover
    * metadata + footer exactly.  Cross-checked against orc-core's
    * own `getStripeStatistics` in StorageSpec (independent reader)
    * and against DuckDB aggregates through the staged single-stripe
    * write in the oracle row.
    */
  def orcStripeStats(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files = listFilesBounded(spark, paths, ".orc", maxFiles, "orcStripeStats")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(conf)
          val len = fs.getFileStatus(hp).getLen
          def readTail(n: Long): Array[Byte] = {
            require(n > 0 && n <= MaxOrcFooterRead,
              s"orcStripeStats: $p declares a tail read of $n bytes " +
                s"(cap $MaxOrcFooterRead) — corrupt postscript")
            val want = math.min(len, n).toInt
            val buf = new Array[Byte](want)
            val in = fs.open(hp)
            try in.readFully(len - want, buf, 0, want) finally in.close()
            buf
          }
          val first = readTail(256L * 1024)
          val stats = orcStripeStatsOf(first, len).orElse {
            // tail larger than the first guess: size it exactly from
            // the postscript (footer + metadata), then re-read
            if (first.length < 2) None
            else {
              val psLen = first(first.length - 1) & 0xff
              if (psLen < 1 || psLen + 1 > first.length) None
              else {
                val psStart = first.length - 1 - psLen
                val ps = new PbReader(first, psStart, psStart + psLen)
                var footerLen = -1L
                var metadataLen = -1L
                while (ps.hasMore) {
                  val (f, w) = ps.tag()
                  (f, w) match {
                    case (1, 0) => footerLen = ps.varint()
                    case (5, 0) => metadataLen = ps.varint()
                    case (_, wire) => ps.skip(wire)
                  }
                }
                if (footerLen <= 0 || metadataLen < 0) None
                else orcStripeStatsOf(
                  readTail(1L + psLen + footerLen + metadataLen), len)
              }
            }
          }.getOrElse(throw new IllegalArgumentException(
            s"orcStripeStats: $p is not a readable ORC file (or uses " +
              "a metadata codec this census rejects)"))
          stats.map { s =>
            (hp.getName, s.stripeId, s.columnId, s.nValues, s.hasNull,
              s.kind, s.intMin, s.intMax, s.dblMin, s.dblMax,
              s.strMin, s.strMax)
          }
        }
      }
      .toDF("file_name", "stripe_id", "column_id", "n_values",
        "has_null", "kind", "int_min", "int_max", "dbl_min", "dbl_max",
        "str_min", "str_max")
  }

  /** ORC ROW-INDEX zone maps — the per-row-group (default 10k rows)
    * pruning surface BELOW [[orcStripeStats]], completing the ORC
    * symmetry with the parquet family (footer↔footer, stripe
    * stats↔row-group stats, row index↔page index): each stripe's
    * FOOTER names its streams (kind, column, length) in physical
    * order; ROW_INDEX (kind 6) streams live in the stripe's index
    * region and decode — through the same compressed-chunk framing —
    * to `RowIndex { repeated RowIndexEntry }`, one entry per row
    * group carrying the SAME ColumnStatistics message the stripe
    * statistics use ([[orcColumnStatsAt]] is shared).  Strictness:
    * index streams must lie inside the declared index region, and
    * every ROW_INDEX stream's entry count must equal
    * ceil(stripeRows / rowIndexStride) — a census that silently
    * dropped part of its pruning index would read as "nothing to
    * prune".  Files with indexes disabled (stride 0) yield no rows.
    *
    * Scale shape: per (file, stripe) this reads the stripe footer +
    * index region ONLY — KBs against the stripe's MBs of data — so a
    * whole-lake census is stripe-count-sized, never data-sized.
    */
  def orcRowIndexStats(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files =
      listFilesBounded(spark, paths, ".orc", maxFiles, "orcRowIndexStats")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { p =>
        val conf = confBc.value.value
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        val len = fs.getFileStatus(hp).getLen
        def readTail(n: Long): Array[Byte] = {
          require(n > 0 && n <= MaxOrcFooterRead,
            s"orcRowIndexStats: $p declares a tail read of $n bytes " +
              s"(cap $MaxOrcFooterRead) — corrupt postscript")
          val want = math.min(len, n).toInt
          val buf = new Array[Byte](want)
          val in = fs.open(hp)
          try in.readFully(len - want, buf, 0, want) finally in.close()
          buf
        }
        val first = readTail(256L * 1024)
        val meta = orcTailOf(first, len).orElse {
          if (first.length < 2) None
          else {
            val psLen = first(first.length - 1) & 0xff
            if (psLen < 1 || psLen + 1 > first.length) None
            else {
              val psStart = first.length - 1 - psLen
              val ps = new PbReader(first, psStart, psStart + psLen)
              var footerLen = -1L
              while (ps.hasMore) {
                val (f, w) = ps.tag()
                if (f == 1 && w == 0) footerLen = ps.varint()
                else ps.skip(w)
              }
              if (footerLen <= 0) None
              else orcTailOf(readTail(1L + psLen + footerLen), len)
            }
          }
        }.getOrElse(throw new IllegalArgumentException(
          s"orcRowIndexStats: $p is not a readable ORC file (or uses " +
            "a metadata codec this census rejects)"))
        if (meta.rowIndexStride <= 0) Iterator.empty // indexes disabled
        else {
          val codec = OrcCompressionNames.collectFirst {
            case (code, name) if name == meta.compression => code
          }.getOrElse(throw new IllegalStateException(
            s"orcRowIndexStats: unmapped codec ${meta.compression}"))
          val out = Vector.newBuilder[(String, Long, Long, Long, Long,
            Boolean, String, Option[Long], Option[Long], Option[Double],
            Option[Double], Option[String], Option[String])]
          val in = fs.open(hp)
          try {
            meta.stripes.zipWithIndex.foreach {
              case ((off, idxLen, datLen, sfl, rows), sid) =>
                require(idxLen <= (64L << 20) && sfl <= (64L << 20),
                  s"orcRowIndexStats: $p stripe $sid declares " +
                    s"index/footer of $idxLen/$sfl bytes (cap 64 MiB)")
                val sfBuf = new Array[Byte](sfl.toInt)
                in.readFully(off + idxLen + datLen, sfBuf, 0, sfl.toInt)
                val sf = orcSectionBytes(sfBuf, 0, sfl.toInt, codec)
                  .getOrElse(throw new IllegalArgumentException(
                    s"orcRowIndexStats: $p stripe $sid footer undecodable"))
                // StripeFooter: repeated Stream { kind=1, column=2,
                // length=3 } in PHYSICAL order (index region first)
                val streams = Vector.newBuilder[(Long, Long, Long)]
                val fr = new PbReader(sf, 0, sf.length)
                var ok = true
                while (fr.hasMore && ok) {
                  val (f, w) = fr.tag()
                  if (fr.bad) ok = false
                  else if (f == 1 && w == 2) {
                    val (o, l) = fr.lenDelim()
                    if (fr.bad) ok = false
                    else {
                      val sr = new PbReader(sf, o, o + l)
                      var kind = -1L; var column = -1L; var slen = -1L
                      while (sr.hasMore && ok) {
                        val (kf, kw) = sr.tag()
                        if (sr.bad) ok = false
                        else (kf, kw) match {
                          case (1, 0) => kind = sr.varint()
                          case (2, 0) => column = sr.varint()
                          case (3, 0) => slen = sr.varint()
                          case (_, wire) => sr.skip(wire); if (sr.bad) ok = false
                        }
                      }
                      if (kind < 0 || column < 0 || slen < 0) ok = false
                      else streams += ((kind, column, slen))
                    }
                  } else { fr.skip(w); if (fr.bad) ok = false }
                }
                if (!ok) throw new IllegalArgumentException(
                  s"orcRowIndexStats: $p stripe $sid footer malformed")
                val idxBuf = new Array[Byte](idxLen.toInt)
                in.readFully(off, idxBuf, 0, idxLen.toInt)
                val expectEntries =
                  (rows + meta.rowIndexStride - 1) / meta.rowIndexStride
                var running = 0L
                streams.result().foreach { case (kind, column, slen) =>
                  if (kind == 6L) { // ROW_INDEX
                    require(running + slen <= idxLen,
                      s"orcRowIndexStats: $p stripe $sid column $column " +
                        "ROW_INDEX stream escapes the index region")
                    val ri = orcSectionBytes(idxBuf, running.toInt,
                      (running + slen).toInt, codec)
                      .getOrElse(throw new IllegalArgumentException(
                        s"orcRowIndexStats: $p stripe $sid column " +
                          s"$column ROW_INDEX undecodable"))
                    val rr = new PbReader(ri, 0, ri.length)
                    var rg = 0L
                    while (rr.hasMore) {
                      val (f, w) = rr.tag()
                      if (rr.bad || f != 1 || w != 2)
                        throw new IllegalArgumentException(
                          s"orcRowIndexStats: $p stripe $sid column " +
                            s"$column RowIndex malformed")
                      val (eo, el) = rr.lenDelim()
                      if (rr.bad) throw new IllegalArgumentException(
                        s"orcRowIndexStats: $p stripe $sid column " +
                          s"$column RowIndexEntry malformed")
                      // RowIndexEntry: positions=1 (skipped),
                      // statistics=2 (the shared message)
                      val er = new PbReader(ri, eo, eo + el)
                      var stats: Option[OrcColStatsVal] = None
                      var eok = true
                      while (er.hasMore && eok) {
                        val (ef, ew) = er.tag()
                        if (er.bad) eok = false
                        else if (ef == 2 && ew == 2) {
                          val (so, sl) = er.lenDelim()
                          if (er.bad) eok = false
                          else stats = orcColumnStatsAt(ri, so, sl)
                        } else { er.skip(ew); if (er.bad) eok = false }
                      }
                      if (!eok) throw new IllegalArgumentException(
                        s"orcRowIndexStats: $p stripe $sid column " +
                          s"$column entry $rg malformed")
                      stats.foreach { cs =>
                        if (cs.kind != null && cs.nValues >= 0)
                          out += ((hp.getName, sid.toLong, column, rg,
                            cs.nValues, cs.hasNull, cs.kind, cs.intMin,
                            cs.intMax, cs.dblMin, cs.dblMax, cs.strMin,
                            cs.strMax))
                      }
                      rg += 1
                    }
                    require(rg == expectEntries,
                      s"orcRowIndexStats: $p stripe $sid column $column " +
                        s"has $rg row-index entries, expected " +
                        s"$expectEntries (rows=$rows, stride=" +
                        s"${meta.rowIndexStride})")
                  }
                  running += slen
                }
            }
          } finally in.close()
          out.result().iterator
        }
      }
      .toDF("file_name", "stripe_id", "column_id", "row_group_id",
        "n_values", "has_null", "kind", "int_min", "int_max",
        "dbl_min", "dbl_max", "str_min", "str_max")
  }

  /** Test one value against an ORC BloomFilterUtf8 bitset (the
    * little-endian long array of the `utf8bitset` field): the spec's
    * probe rule — split the 64-bit hash into two 32-bit halves,
    * combined_i = h1 + i·h2 (INT arithmetic, negatives bit-flipped),
    * bit combined_i mod numBits for i in 1..k.  No false negatives by
    * construction; false positives are the design trade.
    */
  private[graft] def orcBloomTest(
      bitset: Array[Long], numHashFunctions: Int, hash64: Long): Boolean = {
    val numBits = bitset.length * 64
    if (numBits == 0 || numHashFunctions <= 0) return false
    val h1 = hash64.toInt
    val h2 = (hash64 >>> 32).toInt
    var i = 1
    while (i <= numHashFunctions) {
      var combined = h1 + i * h2
      if (combined < 0) combined = ~combined
      val pos = combined % numBits
      if ((bitset(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** ORC BLOOM-FILTER probe census — the ORC sibling of
    * [[parquetBloomProbe]], completing the bloom symmetry the same
    * way [[orcRowIndexStats]] completes the zone-map one: each
    * stripe's BLOOM_FILTER_UTF8 (kind 8) stream for `column` decodes
    * to `BloomFilterIndex { repeated BloomFilter }` — ONE filter per
    * row group — and every probe string is tested through the spec's
    * split-hash rule with orc-core's own Murmur3 64-bit hash (the
    * hash is the library's contract; the framing walk stays
    * from-spec).  Planner contract: NO FALSE NEGATIVES — a probe
    * present in the row group always hits; emit (row group, filter
    * geometry, hit count).  `probes` ships with the closure: a
    * bounded dictionary, not a join (loud cap, as in the parquet
    * flavor).
    */
  /** The ORC v1 5-bit encoded bit-width table (codes 0-23 → 1-24,
    * then 26/28/30/32/40/48/56/64) — shared by the Direct, Delta and
    * Patched-Base RLEv2 forms.
    */
  private val OrcFbsTable: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64)

  private def orcClosestFixedBits(n: Int): Int = {
    var i = 0
    while (i < OrcFbsTable.length && OrcFbsTable(i) < n) i += 1
    if (i >= OrcFbsTable.length) 64 else OrcFbsTable(i)
  }

  /** Decode an ORC RLEv1 UNSIGNED integer stream — the LEGACY
    * encoding old-writer files carry (and the DICTIONARY column
    * encoding implies): control 0-127 = a run of control+3 values
    * stepping by the following SIGNED delta byte from a varint
    * base; control 128-255 = 256-control literal varints.  Strict
    * exact-count/exact-consumption; TOTAL on arbitrary bytes.
    */
  private[graft] def orcRleV1Unsigned(
      b: Array[Byte], expect: Int): Option[Vector[Long]] = {
    if (b == null || expect < 0 || expect > (1 << 26)) return None
    val out = Vector.newBuilder[Long]
    var total = 0
    var p = 0
    def readVuLong(): Option[Long] = {
      var v = 0L
      var shift = 0
      while (true) {
        if (p >= b.length || shift > 63) return None
        val c = b(p) & 0xff
        p += 1
        v |= (c & 0x7fL) << shift
        shift += 7
        if ((c & 0x80) == 0) return Some(v)
      }
      None
    }
    while (p < b.length) {
      if (total > expect) return None
      val control = b(p) & 0xff
      p += 1
      if (control < 128) { // run: control+3 values, signed delta byte
        val n = control + 3
        if (p >= b.length) return None
        val delta = b(p).toLong // SIGNED byte
        p += 1
        var v = readVuLong().getOrElse(return None)
        var i = 0
        while (i < n) { out += v; v += delta; i += 1 }
        total += n
      } else { // literals: 256-control varints
        val n = 256 - control
        var i = 0
        while (i < n) {
          out += readVuLong().getOrElse(return None)
          i += 1
        }
        total += n
      }
    }
    if (total != expect) None else Some(out.result())
  }

  /** Decode an ORC RLEv2 UNSIGNED integer stream — all four spec
    * sub-encodings: Short Repeat, Direct, Patched Base, Delta
    * (ORC v1 spec §"Run Length Encoding version 2").  Values are
    * big-endian bit-packed; widths come from the 5-bit encoded
    * table; the Patched-Base form restores outlier high bits via
    * the (gap, patch) list with the 255-gap skip rule; Delta applies
    * the delta-base SIGN to the packed unsigned deltas.  Strict:
    * the stream must decode to EXACTLY `expect` values and consume
    * its bytes run-by-run; None on any violation, never a throw —
    * the TOTAL-on-arbitrary-bytes discipline.
    */
  private[graft] def orcRleV2Unsigned(
      b: Array[Byte], expect: Int): Option[Vector[Long]] = {
    if (b == null || expect < 0 || expect > (1 << 26)) return None
    val out = Vector.newBuilder[Long]
    var total = 0
    var p = 0
    def readBE(widthBytes: Int): Option[Long] = {
      if (p + widthBytes > b.length) return None
      var v = 0L
      var i = 0
      while (i < widthBytes) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += widthBytes
      Some(v)
    }
    def readVuLong(): Option[Long] = {
      var v = 0L
      var shift = 0
      while (true) {
        if (p >= b.length || shift > 63) return None
        val c = b(p) & 0xff
        p += 1
        v |= (c & 0x7fL) << shift
        shift += 7
        if ((c & 0x80) == 0) return Some(v)
      }
      None
    }
    def readBits(count: Int, width: Int): Option[Array[Long]] = {
      if (count < 0 || width < 1 || width > 64) return None
      val bytes = ((count.toLong * width + 7) / 8).toInt
      if (p + bytes > b.length) return None
      val vals = new Array[Long](count)
      var bitPos = 0L
      var i = 0
      while (i < count) {
        var v = 0L
        var got = 0
        while (got < width) {
          val byteIdx = p + (bitPos >> 3).toInt
          val bitOff = (bitPos & 7).toInt
          val take = math.min(8 - bitOff, width - got)
          val bits = (b(byteIdx) >> (8 - bitOff - take)) &
            ((1 << take) - 1)
          v = (v << take) | (bits & 0xffL)
          got += take
          bitPos += take
        }
        vals(i) = v
        i += 1
      }
      p += bytes
      Some(vals)
    }
    while (p < b.length) {
      if (total > expect) return None
      val h = b(p) & 0xff
      p += 1
      (h >> 6) match {
        case 0 => // SHORT REPEAT: W-1 bytes value, L-3 repeats
          val widthBytes = ((h >> 3) & 7) + 1
          val rep = (h & 7) + 3
          val v = readBE(widthBytes).getOrElse(return None)
          var i = 0
          while (i < rep) { out += v; i += 1 }
          total += rep
        case 1 => // DIRECT: 5-bit width code, 9-bit length-1
          val width = OrcFbsTable((h >> 1) & 0x1f)
          if (p >= b.length) return None
          val len = (((h & 1) << 8) | (b(p) & 0xff)) + 1
          p += 1
          val vals = readBits(len, width).getOrElse(return None)
          vals.foreach(out += _)
          total += len
        case 2 => // PATCHED BASE
          val width = OrcFbsTable((h >> 1) & 0x1f)
          if (p + 3 > b.length) return None
          val len = (((h & 1) << 8) | (b(p) & 0xff)) + 1
          p += 1
          val b3 = b(p) & 0xff
          p += 1
          val baseBytes = ((b3 >> 5) & 7) + 1
          val pw = OrcFbsTable(b3 & 0x1f)
          val b4 = b(p) & 0xff
          p += 1
          val pgw = ((b4 >> 5) & 7) + 1
          val pll = b4 & 0x1f
          var base = readBE(baseBytes).getOrElse(return None)
          val signMask = 1L << (baseBytes * 8 - 1)
          if ((base & signMask) != 0) base = -(base & (signMask - 1))
          val data = readBits(len, width).getOrElse(return None)
          if (pll > 0) {
            val cfb = orcClosestFixedBits(pgw + pw)
            val patches = readBits(pll, cfb).getOrElse(return None)
            val patchMask = if (pw >= 64) -1L else (1L << pw) - 1
            var idx = 0L
            var i = 0
            while (i < pll) {
              val gap = patches(i) >>> pw
              val patch = patches(i) & patchMask
              idx += gap
              if (patch != 0) {
                if (idx >= len) return None
                data(idx.toInt) |= patch << width
              } // (255, 0) entries only advance the gap
              i += 1
            }
          }
          data.foreach(v => out += base + v)
          total += len
        case _ => // DELTA: base varint, signed delta base, packed deltas
          val wcode = (h >> 1) & 0x1f
          val width = if (wcode == 0) 0 else OrcFbsTable(wcode)
          if (p >= b.length) return None
          val nVals = (((h & 1) << 8) | (b(p) & 0xff)) + 1 // header: L-1
          p += 1
          val base = readVuLong().getOrElse(return None)
          val zz = readVuLong().getOrElse(return None)
          val deltaBase = (zz >>> 1) ^ -(zz & 1L) // signed varint
          out += base
          var cur = base
          var produced = 1
          if (nVals >= 2) {
            cur += deltaBase
            out += cur
            produced = 2
          }
          if (produced < nVals) {
            if (width == 0) { // fixed-delta run
              while (produced < nVals) {
                cur += deltaBase; out += cur; produced += 1
              }
            } else {
              val deltas = readBits(nVals - produced, width)
                .getOrElse(return None)
              val sign = if (deltaBase < 0) -1L else 1L
              deltas.foreach { d => cur += sign * d; out += cur }
              produced = nVals
            }
          }
          total += nVals
      }
    }
    if (total != expect) None else Some(out.result())
  }

  def orcBloomProbe(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      column: Long, probes: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    require(probes.size <= 100000,
      s"orcBloomProbe: ${probes.size} probe values — use a join for " +
        "large key sets, the closure-shipped probe is for bounded " +
        "dictionaries")
    val files =
      listFilesBounded(spark, paths, ".orc", maxFiles, "orcBloomProbe")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val probesBc = spark.sparkContext.broadcast(
      probes.map(_.getBytes("UTF-8")).toArray)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { p =>
        val conf = confBc.value.value
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        val len = fs.getFileStatus(hp).getLen
        def readTail(n: Long): Array[Byte] = {
          require(n > 0 && n <= MaxOrcFooterRead,
            s"orcBloomProbe: $p declares a tail read of $n bytes " +
              s"(cap $MaxOrcFooterRead) — corrupt postscript")
          val want = math.min(len, n).toInt
          val buf = new Array[Byte](want)
          val in = fs.open(hp)
          try in.readFully(len - want, buf, 0, want) finally in.close()
          buf
        }
        val first = readTail(256L * 1024)
        val meta = orcTailOf(first, len).orElse {
          if (first.length < 2) None
          else {
            val psLen = first(first.length - 1) & 0xff
            if (psLen < 1 || psLen + 1 > first.length) None
            else {
              val psStart = first.length - 1 - psLen
              val ps = new PbReader(first, psStart, psStart + psLen)
              var footerLen = -1L
              while (ps.hasMore) {
                val (f, w) = ps.tag()
                if (f == 1 && w == 0) footerLen = ps.varint()
                else ps.skip(w)
              }
              if (footerLen <= 0) None
              else orcTailOf(readTail(1L + psLen + footerLen), len)
            }
          }
        }.getOrElse(throw new IllegalArgumentException(
          s"orcBloomProbe: $p is not a readable ORC file (or uses a " +
            "metadata codec this census rejects)"))
        val codec = OrcCompressionNames.collectFirst {
          case (code, name) if name == meta.compression => code
        }.getOrElse(throw new IllegalStateException(
          s"orcBloomProbe: unmapped codec ${meta.compression}"))
        val probeHashes = probesBc.value
          .map(org.apache.orc.util.Murmur3.hash64)
        val out = Vector.newBuilder[
          (String, Long, Long, Long, Long, Long, Long)]
        val in = fs.open(hp)
        try {
          meta.stripes.zipWithIndex.foreach {
            case ((off, idxLen, datLen, sfl, rows), sid) =>
              require(idxLen <= (64L << 20) && sfl <= (64L << 20),
                s"orcBloomProbe: $p stripe $sid declares index/footer " +
                  s"of $idxLen/$sfl bytes (cap 64 MiB)")
              val sfBuf = new Array[Byte](sfl.toInt)
              in.readFully(off + idxLen + datLen, sfBuf, 0, sfl.toInt)
              val sf = orcSectionBytes(sfBuf, 0, sfl.toInt, codec)
                .getOrElse(throw new IllegalArgumentException(
                  s"orcBloomProbe: $p stripe $sid footer undecodable"))
              val fr = new PbReader(sf, 0, sf.length)
              var running = 0L
              var idxBuf: Array[Byte] = null
              while (fr.hasMore) {
                val (f, w) = fr.tag()
                if (fr.bad) throw new IllegalArgumentException(
                  s"orcBloomProbe: $p stripe $sid footer malformed")
                if (f == 1 && w == 2) {
                  val (o, l) = fr.lenDelim()
                  if (fr.bad) throw new IllegalArgumentException(
                    s"orcBloomProbe: $p stripe $sid stream malformed")
                  val sr = new PbReader(sf, o, o + l)
                  var kind = -1L; var scol = -1L; var slen = -1L
                  while (sr.hasMore) {
                    val (kf, kw) = sr.tag()
                    if (sr.bad) throw new IllegalArgumentException(
                      s"orcBloomProbe: $p stripe $sid stream malformed")
                    (kf, kw) match {
                      case (1, 0) => kind = sr.varint()
                      case (2, 0) => scol = sr.varint()
                      case (3, 0) => slen = sr.varint()
                      case (_, wire) => sr.skip(wire)
                    }
                  }
                  if (kind < 0 || scol < 0 || slen < 0)
                    throw new IllegalArgumentException(
                      s"orcBloomProbe: $p stripe $sid stream malformed")
                  if (kind == 8L && scol == column) { // BLOOM_FILTER_UTF8
                    require(running + slen <= idxLen,
                      s"orcBloomProbe: $p stripe $sid column $column " +
                        "bloom stream escapes the index region")
                    if (idxBuf == null) {
                      idxBuf = new Array[Byte](idxLen.toInt)
                      in.readFully(off, idxBuf, 0, idxLen.toInt)
                    }
                    val bi = orcSectionBytes(idxBuf, running.toInt,
                      (running + slen).toInt, codec)
                      .getOrElse(throw new IllegalArgumentException(
                        s"orcBloomProbe: $p stripe $sid column $column " +
                          "bloom stream undecodable"))
                    // BloomFilterIndex { repeated BloomFilter = 1 };
                    // BloomFilter { numHashFunctions=1,
                    //   utf8bitset=3 (LE longs) }
                    val br = new PbReader(bi, 0, bi.length)
                    var rg = 0L
                    while (br.hasMore) {
                      val (bf, bw) = br.tag()
                      if (br.bad || bf != 1 || bw != 2)
                        throw new IllegalArgumentException(
                          s"orcBloomProbe: $p stripe $sid column " +
                            s"$column BloomFilterIndex malformed")
                      val (bo, bl) = br.lenDelim()
                      if (br.bad) throw new IllegalArgumentException(
                        s"orcBloomProbe: $p stripe $sid column $column " +
                          "BloomFilter malformed")
                      val er = new PbReader(bi, bo, bo + bl)
                      var k = 0L
                      var bits: Array[Long] = Array.emptyLongArray
                      while (er.hasMore) {
                        val (ef, ew) = er.tag()
                        if (er.bad) throw new IllegalArgumentException(
                          s"orcBloomProbe: $p stripe $sid column " +
                            s"$column BloomFilter malformed")
                        (ef, ew) match {
                          case (1, 0) => k = er.varint()
                          case (3, 2) =>
                            val (uo, ul) = er.lenDelim()
                            if (er.bad || ul % 8 != 0)
                              throw new IllegalArgumentException(
                                s"orcBloomProbe: $p stripe $sid column " +
                                  s"$column utf8bitset not long-aligned")
                            bits = new Array[Long](ul / 8)
                            var bj = 0
                            while (bj < bits.length) {
                              var v = 0L
                              var t = 7
                              while (t >= 0) {
                                v = (v << 8) | (bi(uo + bj * 8 + t) & 0xffL)
                                t -= 1
                              }
                              bits(bj) = v
                              bj += 1
                            }
                          case (_, wire) => er.skip(wire)
                        }
                      }
                      // A BloomFilter entry with no utf8Bitset (e.g. a
                      // legacy writer emitting only fixed64 `bitset`
                      // field 2) would test false for EVERY probe —
                      // silent false negatives against the
                      // NO-FALSE-NEGATIVES planner contract.  Reject
                      // loudly instead of mis-pruning.
                      if (bits.isEmpty)
                        throw new IllegalArgumentException(
                          s"orcBloomProbe: $p stripe $sid column " +
                            s"$column row group $rg has no utf8bitset " +
                            "(legacy/unsupported bloom encoding)")
                      var hits = 0L
                      var pi = 0
                      while (pi < probeHashes.length) {
                        if (orcBloomTest(bits, k.toInt, probeHashes(pi)))
                          hits += 1
                        pi += 1
                      }
                      out += ((hp.getName, sid.toLong, column, rg,
                        k, bits.length.toLong * 64, hits))
                      rg += 1
                    }
                    val expect =
                      if (meta.rowIndexStride > 0)
                        (rows + meta.rowIndexStride - 1) / meta.rowIndexStride
                      else 0L
                    require(meta.rowIndexStride > 0 && rg == expect,
                      s"orcBloomProbe: $p stripe $sid column $column " +
                        s"has $rg bloom filters, expected $expect")
                  }
                  running += slen
                } else {
                  fr.skip(w)
                  if (fr.bad) throw new IllegalArgumentException(
                    s"orcBloomProbe: $p stripe $sid footer malformed")
                }
              }
          }
        } finally in.close()
        out.result().iterator
      }
      .toDF("file_name", "stripe_id", "column_id", "row_group_id",
        "n_hash_functions", "n_bits", "n_hits")
  }

  /** ORC per-(stripe, column) ENCODING census — the compaction
    * planner's physical-layout surface for ORC, the sibling of
    * [[parquetChunkEncodings]]: each stripe footer's ColumnEncoding
    * roster (kind: 0 DIRECT, 1 DICTIONARY, 2 DIRECT_V2, 3
    * DICTIONARY_V2; dictionary size when dictionary-coded) — the
    * first question a rewriter asks before deciding what a merge
    * would re-encode.  Footer-only: KBs per stripe.
    */
  /** The pure per-stripe-footer piece of [[orcColumnEncodings]]: walk
    * DECOMPRESSED StripeFooter bytes and return each column's
    * (encoding kind, dictionary size) in column order — field 2 of
    * the StripeFooter message, one ColumnEncoding per column.  None
    * on any malformed protobuf shape; TOTAL on arbitrary bytes
    * (fuzz-pinned in StorageSpec) so a corrupt stripe footer is a
    * clean reject in the census, never an executor-side index error.
    */
  private[graft] def orcStripeFooterEncodings(
      sf: Array[Byte]): Option[Vector[(Long, Long)]] = {
    val out = Vector.newBuilder[(Long, Long)]
    val fr = new PbReader(sf, 0, sf.length)
    while (fr.hasMore) {
      val (f, w) = fr.tag()
      if (fr.bad) return None
      if (f == 2 && w == 2) { // ColumnEncoding, column order
        val (o, l) = fr.lenDelim()
        if (fr.bad) return None
        val er = new PbReader(sf, o, o + l)
        var ekind = 0L
        var dsz = 0L
        while (er.hasMore) {
          val (ef, ew) = er.tag()
          if (er.bad) return None
          (ef, ew) match {
            case (1, 0) => ekind = er.varint()
            case (2, 0) => dsz = er.varint()
            case (_, wire) => er.skip(wire)
          }
          if (er.bad) return None
        }
        out += ((ekind, dsz))
      } else {
        fr.skip(w)
        if (fr.bad) return None
      }
    }
    Some(out.result())
  }

  def orcColumnEncodings(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    val files =
      listFilesBounded(spark, paths, ".orc", maxFiles, "orcColumnEncodings")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { p =>
        val conf = confBc.value.value
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        val len = fs.getFileStatus(hp).getLen
        def readTail(n: Long): Array[Byte] = {
          require(n > 0 && n <= MaxOrcFooterRead,
            s"orcColumnEncodings: $p declares a tail read of $n bytes")
          val want = math.min(len, n).toInt
          val buf = new Array[Byte](want)
          val in = fs.open(hp)
          try in.readFully(len - want, buf, 0, want) finally in.close()
          buf
        }
        val meta = orcTailOf(readTail(256L * 1024), len)
          .getOrElse(throw new IllegalArgumentException(
            s"orcColumnEncodings: $p is not a readable ORC file"))
        val codec = OrcCompressionNames.collectFirst {
          case (code, name) if name == meta.compression => code
        }.getOrElse(throw new IllegalStateException(
          s"orcColumnEncodings: unmapped codec ${meta.compression}"))
        val out = Vector.newBuilder[(String, Long, Long, Long, Long)]
        val in = fs.open(hp)
        try {
          meta.stripes.zipWithIndex.foreach {
            case ((off, idxLen, datLen, sfl, _), sid) =>
              require(sfl <= (64L << 20),
                s"orcColumnEncodings: $p stripe $sid absurd footer")
              val sfBuf = new Array[Byte](sfl.toInt)
              in.readFully(off + idxLen + datLen, sfBuf, 0, sfl.toInt)
              val sf = orcSectionBytes(sfBuf, 0, sfl.toInt, codec)
                .getOrElse(throw new IllegalArgumentException(
                  s"orcColumnEncodings: $p stripe $sid footer undecodable"))
              orcStripeFooterEncodings(sf)
                .getOrElse(throw new IllegalArgumentException(
                  s"orcColumnEncodings: $p stripe $sid footer malformed"))
                .zipWithIndex.foreach { case ((ekind, dsz), colId) =>
                  out += ((hp.getName, sid.toLong, colId.toLong, ekind, dsz))
                }
          }
        } finally in.close()
        out.result().iterator
      }
      .toDF("file_name", "stripe_id", "column_id", "encoding_kind",
        "dictionary_size")
  }

  /** ORC string-DICTIONARY probe — the exact-membership skipping
    * surface for ORC, the sibling of [[parquetDictionaryProbe]]: a
    * DICTIONARY_V2-encoded column's per-stripe dictionary is its
    * exact distinct set, so equality probes have NO false positives
    * and NO false negatives.  Per stripe: the stripe footer names
    * the column encodings and stream geometry; the LENGTH stream
    * (kind 2) decodes through the from-spec RLEv2 walk
    * ([[orcRleV2Unsigned]] — all four sub-encodings), the
    * DICTIONARY_DATA stream (kind 3) splits by those lengths.
    * DIRECT-encoded columns emit a fail-safe has_dict=false row
    * (the planner falls back to stats/blooms); legacy DICTIONARY
    * (kind 1) columns decode through the RLEv1 walk
    * ([[orcRleV1Unsigned]]) — same dictionary, older run-length
    * coding (COVERAGE.md fifth wave).
    */
  def orcDictionaryProbe(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      column: Long, probes: Seq[String],
      maxFiles: Int = 1000000): DataFrame = {
    import spark.implicits._
    require(probes.size <= 100000,
      s"orcDictionaryProbe: ${probes.size} probe values — use a join " +
        "for large key sets")
    val files =
      listFilesBounded(spark, paths, ".orc", maxFiles, "orcDictionaryProbe")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val probesBc = spark.sparkContext.broadcast(probes.toArray)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { p =>
        val conf = confBc.value.value
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        val len = fs.getFileStatus(hp).getLen
        def readTail(n: Long): Array[Byte] = {
          require(n > 0 && n <= MaxOrcFooterRead,
            s"orcDictionaryProbe: $p declares a tail read of $n bytes")
          val want = math.min(len, n).toInt
          val buf = new Array[Byte](want)
          val in = fs.open(hp)
          try in.readFully(len - want, buf, 0, want) finally in.close()
          buf
        }
        val meta = orcTailOf(readTail(256L * 1024), len)
          .getOrElse(throw new IllegalArgumentException(
            s"orcDictionaryProbe: $p is not a readable ORC file"))
        val codec = OrcCompressionNames.collectFirst {
          case (code, name) if name == meta.compression => code
        }.getOrElse(throw new IllegalStateException(
          s"orcDictionaryProbe: unmapped codec ${meta.compression}"))
        val probeStrs = probesBc.value
        val out = Vector.newBuilder[
          (String, Long, Long, Boolean, Long, Long, Long)]
        val in = fs.open(hp)
        try {
          meta.stripes.zipWithIndex.foreach {
            case ((off, idxLen, datLen, sfl, _), sid) =>
              require(sfl <= (64L << 20) && datLen <= (4L << 30),
                s"orcDictionaryProbe: $p stripe $sid absurd geometry")
              val sfBuf = new Array[Byte](sfl.toInt)
              in.readFully(off + idxLen + datLen, sfBuf, 0, sfl.toInt)
              val sf = orcSectionBytes(sfBuf, 0, sfl.toInt, codec)
                .getOrElse(throw new IllegalArgumentException(
                  s"orcDictionaryProbe: $p stripe $sid footer undecodable"))
              // pass 1: streams in declared order (kind, col, len) +
              // column encodings (kind, dictionarySize) in column order
              val streams = Vector.newBuilder[(Long, Long, Long)]
              val encodings = Vector.newBuilder[(Long, Long)]
              val fr = new PbReader(sf, 0, sf.length)
              while (fr.hasMore) {
                val (f, w) = fr.tag()
                if (fr.bad) throw new IllegalArgumentException(
                  s"orcDictionaryProbe: $p stripe $sid footer malformed")
                (f, w) match {
                  case (1, 2) =>
                    val (o, l) = fr.lenDelim()
                    if (fr.bad) throw new IllegalArgumentException(
                      s"orcDictionaryProbe: $p stripe $sid stream malformed")
                    val sr = new PbReader(sf, o, o + l)
                    var kind = -1L; var scol = -1L; var slen = -1L
                    while (sr.hasMore) {
                      val (kf, kw) = sr.tag()
                      if (sr.bad) throw new IllegalArgumentException(
                        s"orcDictionaryProbe: $p stripe $sid stream malformed")
                      (kf, kw) match {
                        case (1, 0) => kind = sr.varint()
                        case (2, 0) => scol = sr.varint()
                        case (3, 0) => slen = sr.varint()
                        case (_, wire) => sr.skip(wire)
                      }
                    }
                    if (kind < 0 || scol < 0 || slen < 0)
                      throw new IllegalArgumentException(
                        s"orcDictionaryProbe: $p stripe $sid stream malformed")
                    streams += ((kind, scol, slen))
                  case (2, 2) =>
                    val (o, l) = fr.lenDelim()
                    if (fr.bad) throw new IllegalArgumentException(
                      s"orcDictionaryProbe: $p stripe $sid encoding malformed")
                    val er = new PbReader(sf, o, o + l)
                    var ekind = 0L; var dsz = 0L
                    while (er.hasMore) {
                      val (ef, ew) = er.tag()
                      if (er.bad) throw new IllegalArgumentException(
                        s"orcDictionaryProbe: $p stripe $sid encoding malformed")
                      (ef, ew) match {
                        case (1, 0) => ekind = er.varint()
                        case (2, 0) => dsz = er.varint()
                        case (_, wire) => er.skip(wire)
                      }
                    }
                    encodings += ((ekind, dsz))
                  case (_, wire) =>
                    fr.skip(wire)
                    if (fr.bad) throw new IllegalArgumentException(
                      s"orcDictionaryProbe: $p stripe $sid footer malformed")
                }
              }
              val encs = encodings.result()
              require(column >= 0 && column < encs.length,
                s"orcDictionaryProbe: column $column out of range " +
                  s"(${encs.length} encodings) in $p stripe $sid")
              val (ekind, dictSize) = encs(column.toInt)
              // ColumnEncoding kinds: 0 DIRECT, 1 DICTIONARY (RLEv1),
              // 2 DIRECT_V2, 3 DICTIONARY_V2
              if (ekind == 0L || ekind == 2L) {
                out += ((hp.getName, sid.toLong, column, false, 0L,
                  probeStrs.length.toLong, 0L))
              } else {
                // 1 = legacy DICTIONARY (RLEv1 lengths), 3 =
                // DICTIONARY_V2 (RLEv2) — both decode
                require(ekind == 1L || ekind == 3L,
                  s"orcDictionaryProbe: unknown encoding $ekind")
                require(dictSize <= 10000000L,
                  s"orcDictionaryProbe: absurd dictionary size $dictSize")
                // locate the LENGTH + DICTIONARY_DATA stream spans by
                // the running offset over ALL streams (index region
                // first, then data — one contiguous accounting)
                var running = 0L
                var lenSpan: (Long, Long) = null
                var datSpan: (Long, Long) = null
                streams.result().foreach { case (kind, scol, slen) =>
                  if (scol == column && kind == 2L) lenSpan = (running, slen)
                  if (scol == column && kind == 3L) datSpan = (running, slen)
                  running += slen
                }
                require(lenSpan != null && datSpan != null,
                  s"orcDictionaryProbe: $p stripe $sid column $column " +
                    "is DICTIONARY_V2 but lacks LENGTH/DICTIONARY_DATA " +
                    "streams")
                def sectionOf(span: (Long, Long)): Array[Byte] = {
                  require(span._1 + span._2 <= idxLen + datLen,
                    s"orcDictionaryProbe: $p stripe $sid stream escapes " +
                      "the stripe")
                  val buf = new Array[Byte](span._2.toInt)
                  in.readFully(off + span._1, buf, 0, span._2.toInt)
                  orcSectionBytes(buf, 0, span._2.toInt, codec)
                    .getOrElse(throw new IllegalArgumentException(
                      s"orcDictionaryProbe: $p stripe $sid column " +
                        s"$column stream undecodable"))
                }
                val lenBytes = sectionOf(lenSpan)
                val lengths = (if (ekind == 3L)
                    orcRleV2Unsigned(lenBytes, dictSize.toInt)
                  else orcRleV1Unsigned(lenBytes, dictSize.toInt))
                  .getOrElse(throw new IllegalArgumentException(
                    s"orcDictionaryProbe: $p stripe $sid column $column " +
                      s"LENGTH stream fails the RLEv${if (ekind == 3L) 2 else 1} walk"))
                val data = sectionOf(datSpan)
                val set = new java.util.HashSet[String](lengths.length)
                var o2 = 0
                lengths.foreach { l =>
                  require(l >= 0 && o2 + l <= data.length,
                    s"orcDictionaryProbe: $p stripe $sid column $column " +
                      "dictionary lengths overrun the data stream")
                  set.add(new String(data, o2, l.toInt, "UTF-8"))
                  o2 += l.toInt
                }
                var hits = 0L
                probeStrs.foreach(s => if (set.contains(s)) hits += 1)
                out += ((hp.getName, sid.toLong, column, true,
                  dictSize, probeStrs.length.toLong, hits))
              }
          }
        } finally in.close()
        out.result().iterator
      }
      .toDF("file_name", "stripe_id", "column_id", "has_dict",
        "dict_size", "n_probed", "n_hits")
  }

  /** Iceberg `metadata.json` census — the ENTRY POINT of every
    * Iceberg read, completing the chain above the r15 manifest-list
    * and manifest censuses: schema-EXPLICIT `from_json` parse (never
    * an inference scan — the JSON sidecar discipline) of
    * format-version, table uuid, current-snapshot-id, and the
    * snapshots array (id, timestamp, manifest-list path, summary
    * operation), exploded to one row per snapshot with an
    * `is_current` flag.  Unknown format versions (not 1 or 2) yield
    * NO rows for that document — reject, never mis-read.  Pure
    * projection + explode; metadata.json is KBs per table, so a
    * whole-catalog census is table-count-sized, not data-sized.
    */
  def icebergMetadata(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val snapshotType = new StructType()
      .add("snapshot-id", LongType).add("timestamp-ms", LongType)
      .add("manifest-list", StringType)
      .add("summary", MapType(StringType, StringType))
    val schema = new StructType()
      .add("format-version", IntegerType)
      .add("table-uuid", StringType)
      .add("current-snapshot-id", LongType)
      .add("last-updated-ms", LongType)
      .add("snapshots", ArrayType(snapshotType))
    df.select(col(idCol).cast("long").as("id"),
        from_json(col(jsonCol), schema).as("m"))
      .filter(col("m.format-version").isin(1, 2))
      .select(col("id"), col("m.format-version").as("format_version"),
        col("m.table-uuid").as("table_uuid"),
        col("m.current-snapshot-id").as("current_snapshot_id"),
        explode(col("m.snapshots")).as("s"))
      .select(col("id"), col("format_version").cast("long"),
        col("table_uuid"),
        col("s.snapshot-id").as("snapshot_id"),
        col("s.timestamp-ms").as("timestamp_ms"),
        col("s.manifest-list").as("manifest_list"),
        element_at(col("s.summary"), "operation").as("operation"),
        (col("s.snapshot-id") === col("current_snapshot_id"))
          .cast("long").as("is_current"))
  }

  /** Per-row deterministic metadata.json synthesis: `1 + id % 3`
    * snapshots, the LAST one current, format version alternating 1/2
    * by id — every field replays from id arithmetic in the oracle.
    */
  def synthesizeIcebergMetadata(
      df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df).select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val ns = 1 + (id % 3).toInt
      val snaps = (0 until ns).map { k =>
        s"""{"snapshot-id":${3000 + id + k},""" +
          s""""timestamp-ms":${1690000000000L + id + k},""" +
          s""""manifest-list":"ml-$id-$k.avro",""" +
          s""""summary":{"operation":"${if (k == 0) "append" else "overwrite"}"}}"""
      }.mkString(",")
      val json = s"""{"format-version":${1 + (id % 2).toInt},""" +
        s""""table-uuid":"t-$id",""" +
        s""""current-snapshot-id":${3000 + id + ns - 1},""" +
        s""""last-updated-ms":${1700000000000L + id},""" +
        s""""snapshots":[$snaps]}"""
      (id, json)
    }.toDF("id", "metadata_json")
  }

  /** Iceberg TABLE-STATE composition — the full read chain in ONE
    * call, the [[deltaLogState]] sibling for the second lakehouse
    * format: metadata.json → CURRENT snapshot → its manifest LIST →
    * its manifests → live data-file entries (status != 2 DELETED).
    * Emits one row per live file: (id, manifest_path, file_path,
    * file_format, record_count, file_size_in_bytes).  Non-current
    * snapshots' lists and manifests are present in the inputs and
    * must be IGNORED — the composition follows the pointer chain,
    * it does not union everything it can decode.
    *
    * Scale shape: metadata.json and the manifest-list level are
    * per-table KBs — both resolve into BROADCAST rosters; the
    * manifest side (the only level proportional to file count)
    * streams through the decode and a broadcast semi-join.  The
    * corpus itself is never touched: this is the planner's
    * metadata-only question "which files would a scan read".
    */
  def icebergTableState(
      metadata: DataFrame, manifestLists: DataFrame,
      manifests: DataFrame, snapshotPicks: Option[DataFrame] = None): DataFrame = {
    val spark = metadata.sparkSession
    import spark.implicits._
    import graft.ops.MultimodalOps
    // level 1: the chosen snapshot's manifest-list path per table —
    // the CURRENT one by default, or an explicit per-table pick
    // (TIME TRAVEL: `snapshotPicks` is (id, snapshot_id) rows; any
    // retained snapshot replays through the identical chain, only
    // the entry pointer moves — picks are per-table metadata, so
    // they broadcast)
    val snaps = icebergMetadata(metadata, "id", "metadata_json")
    val current = snapshotPicks
      .map(p => snaps.join(
        org.apache.spark.sql.functions.broadcast(
          p.select(col("id").as("p_id"),
            col("snapshot_id").as("p_sid"))),
        col("id") === col("p_id") && col("snapshot_id") === col("p_sid")))
      .getOrElse(snaps.filter(col("is_current") === 1))
      .select(col("id").as("t_id"), col("manifest_list").as("ml_path"))
    // level 2: decode ONLY the pointed-at lists (broadcast roster)
    val wantedLists = manifestLists
      .join(org.apache.spark.sql.functions.broadcast(current),
        col("id") === col("t_id") && col("path") === col("ml_path"))
      .select(col("id"), col("content"))
    val wantedManifests = wantedLists
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        MultimodalOps.icebergManifestListOf(
            MultimodalOps.MediaRecord(id, "", c))
          .getOrElse(Seq.empty).map(m => (id, m.manifestPath))
      })
      .toDF("m_id", "m_path")
    // level 3: the manifest side streams; the wanted roster (KBs per
    // table) broadcasts into the semi-join
    val entries = manifests
      .join(org.apache.spark.sql.functions.broadcast(wantedManifests),
        col("id") === col("m_id") && col("path") === col("m_path"),
        "left_semi")
      .select(col("id"), col("path"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, path, c) =>
        MultimodalOps.icebergManifestEntriesOf(
            MultimodalOps.MediaRecord(id, "", c))
          .getOrElse(Seq.empty)
          .map(e => (id, path, e.status, e.filePath, e.fileFormat,
            e.recordCount, e.fileSizeInBytes))
      })
      .toDF("id", "manifest_path", "status", "file_path", "file_format",
        "record_count", "file_size_in_bytes")
    entries
      .filter(col("status") =!= 2) // DELETED entries are not live
      .drop("status")
  }

  /** Delta-style transaction-log replay — lakehouse table-state
    * reconstruction WITHOUT the table-format library: read the
    * commit log's JSON files (one per version, the filename IS the
    * version — the open Delta protocol's layout), normalize each
    * add/remove action, and resolve every path to its LATEST action
    * ("last action wins"); the live file set is the paths whose
    * latest action is an add.  This is the first question every
    * audit/compaction/vacuum job asks of a table: which files are
    * live, how big, and since when.
    *
    * Scale shape: the log is METADATA (a few KB per commit), so the
    * whole replay is one window over paths — corpus-size-independent.
    * For 10⁶-commit logs the protocol's own answer is the checkpoint
    * snapshot (replay from the last checkpoint, not version 0); this
    * reader takes the log directory it is given, so pointing it past
    * a checkpoint is the caller's one-line composition.
    */
  def deltaLogState(
      spark: org.apache.spark.sql.SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    checkDeltaProtocol(spark, logDir)
    val sch = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType))))))
    val actions = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.size").as("size"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        col("version"))
      .filter(col("path").isNotNull) // commitInfo/protocol lines carry neither
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    actions.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_add") === 1)
      .select(col("path"), col("size"),
        col("version").as("version_added"))
  }

  /** Reader features this engine's Delta replay actually implements —
    * the protocol-gate allowlist.  deletionVectors ([[deltaDvPositions]]),
    * columnMapping ([[deltaFileStats]]), v2Checkpoint
    * ([[deltaLogStateFromCheckpoint]]); timestampNtz is a pure type
    * annotation with no read-path semantics.
    */
  private[graft] val SupportedDeltaReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "v2Checkpoint", "timestampNtz")

  /** Protocol GATE for the Delta replay: a table whose newest
    * `protocol` action demands a reader version or reader feature
    * beyond the implemented set must REJECT LOUDLY, not mis-census —
    * silently replaying a log whose semantics we don't implement
    * (e.g. a future row-tracking feature) would report wrong state
    * with full confidence.  Absent protocol actions imply reader
    * version 1 (legacy tables).  Metadata-sized read, one tiny job.
    *
    * Scans JSON COMMITS only; the checkpoint path
    * ([[deltaLogStateFromCheckpoint]]) must additionally feed the
    * checkpoint's own protocol row through [[enforceDeltaProtocol]],
    * because on a real table whose pre-checkpoint commits were
    * cleaned by log retention the protocol lives ONLY in the
    * checkpoint.
    */
  private[graft] def checkDeltaProtocol(
      spark: org.apache.spark.sql.SparkSession, logDir: String): Unit =
    newestJsonProtocol(spark, logDir).foreach { case (_, mrv, feats) =>
      enforceDeltaProtocol(mrv, feats, logDir)
    }

  /** The allowlist check itself, shared by the JSON-commit and the
    * checkpoint protocol sources.  (minReaderVersion, readerFeatures)
    * beyond the implemented set → loud reject.
    */
  private[graft] def enforceDeltaProtocol(
      mrv: Int, feats: Seq[String], where: String): Unit = {
    require(mrv <= 3,
      s"delta protocol gate: minReaderVersion $mrv > 3 is beyond " +
        s"this reader ($where) — refusing to mis-census")
    if (mrv == 3) {
      val unsupported = feats.filterNot(SupportedDeltaReaderFeatures)
      require(unsupported.isEmpty,
        s"delta protocol gate: unsupported readerFeatures " +
          s"${unsupported.mkString(", ")} ($where) — refusing to " +
          "mis-census")
    }
  }

  /** Newest `protocol` action among the log's JSON commits, with its
    * commit version — None when no JSON commit carries one (legacy
    * table, or all protocol-bearing commits cleaned by retention).
    */
  private[graft] def newestJsonProtocol(
      spark: org.apache.spark.sql.SparkSession,
      logDir: String): Option[(Long, Int, Seq[String])] = {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)))))))
    val rows = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .filter(col("protocol.minReaderVersion").isNotNull)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
      .orderBy(col("version").desc)
      .select(col("version"), col("protocol.minReaderVersion"),
        col("protocol.readerFeatures"))
      .limit(1).collect()
    rows.headOption.map { r =>
      val feats: Seq[String] =
        if (r.isNullAt(2)) Seq.empty else r.getSeq[String](2)
      (r.getLong(0), r.getInt(1), feats)
    }
  }

  /** Newest metaData action's physical→logical column map (empty when
    * `delta.columnMapping.mode` is absent/none) — driver-side: table
    * metadata is KBs, never data-sized.  `raw` must carry a
    * `metaData` struct with schemaString + configuration and a
    * `version` column.
    */
  private def deltaMappingOf(raw: DataFrame): Map[String, String] = {
    import org.apache.spark.sql.types._
    val metaRow = raw.filter(col("metaData.schemaString").isNotNull)
      .orderBy(col("version").desc)
      .select(col("metaData.schemaString"), col("metaData.configuration"))
      .limit(1).collect().headOption
    metaRow match {
      case Some(r) =>
        val conf: Map[String, String] =
          if (r.isNullAt(1)) Map.empty
          else r.getMap[String, String](1).toMap
        val mode = conf.getOrElse("delta.columnMapping.mode", "none")
        if (mode != "name" && mode != "id") Map.empty
        else {
          org.apache.spark.sql.types.DataType.fromJson(r.getString(0)) match {
            case st: StructType =>
              st.fields.flatMap { f =>
                if (f.metadata.contains("delta.columnMapping.physicalName"))
                  Some(f.metadata
                    .getString("delta.columnMapping.physicalName") -> f.name)
                else None
              }.toMap
            case _ => Map.empty
          }
        }
      case None => Map.empty
    }
  }

  /** Per-live-file PARTITION VALUES from the Delta log's add actions
    * — the FIRST-level Delta prune (partition filters eliminate
    * whole directories before any stats are consulted), with the
    * same column-mapping awareness as [[deltaFileStats]]: under
    * mode=name/id the partitionValues keys are PHYSICAL names and
    * translate back to logical ones.  One row per (live file,
    * partition column); same last-action-wins window, same
    * protocol gate.
    */
  def deltaPartitionValues(
      spark: org.apache.spark.sql.SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    checkDeltaProtocol(spark, logDir)
    val sch = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType))))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("schemaString", StringType),
        StructField("configuration", MapType(StringType, StringType)))))))
    val raw = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
    val mapping = deltaMappingOf(raw)
    val actions = raw
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.partitionValues").as("pv"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        col("version"))
      .filter(col("path").isNotNull)
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    val translate: Column => Column =
      if (mapping.isEmpty) identity
      else pcol => coalesce(element_at(typedLit(mapping), pcol), pcol)
    actions.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_add") === 1 && col("pv").isNotNull)
      .select(col("path"), explode(col("pv")).as(Seq("pcol", "value")))
      .select(col("path"), translate(col("pcol")).as("column"),
        col("value"))
  }

  /** Per-live-file COLUMN STATISTICS from the Delta log's add-action
    * `stats` JSON — the zone-map surface a Delta data-skipping
    * planner prunes with, with COLUMN-MAPPING awareness: when the
    * newest metaData action sets `delta.columnMapping.mode` to
    * `name` or `id`, the stats objects are keyed by PHYSICAL column
    * names (`col-<uuid>`), and this census translates them back to
    * logical names via each schema field's
    * `delta.columnMapping.physicalName` metadata.  Unmapped modes
    * pass keys through unchanged.  Emits one row per (live file,
    * column) with min/max (as the log's own JSON strings), null
    * count, and the file's record count.
    *
    * Scale shape: the log is METADATA; the only non-metadata-sized
    * work is the same last-action-wins window as [[deltaLogState]].
    * The schema/mode lookup is a driver-side read of the newest
    * metaData action (KBs), broadcast into the key translation.
    */
  def deltaFileStats(
      spark: org.apache.spark.sql.SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    checkDeltaProtocol(spark, logDir)
    val sch = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("stats", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("schemaString", StringType),
        StructField("configuration", MapType(StringType, StringType)))))))
    val raw = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
    val mapping = deltaMappingOf(raw)
    val actions = raw
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.stats").as("stats"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        col("version"))
      .filter(col("path").isNotNull)
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    val live = actions.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_add") === 1 &&
        col("stats").isNotNull)
    val statsSchema = StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", MapType(StringType, StringType)),
      StructField("maxValues", MapType(StringType, StringType)),
      StructField("nullCount", MapType(StringType, LongType))))
    val translate: Column => Column =
      if (mapping.isEmpty) identity
      else pcol => coalesce(element_at(typedLit(mapping), pcol), pcol)
    live.withColumn("st", from_json(col("stats"), statsSchema))
      .select(col("path"), col("st.numRecords").as("num_records"),
        explode(col("st.minValues")).as(Seq("pcol", "min_v")),
        col("st.maxValues").as("maxm"), col("st.nullCount").as("nullm"))
      .select(col("path"),
        translate(col("pcol")).as("column"),
        col("min_v"),
        element_at(col("maxm"), col("pcol")).as("max_v"),
        element_at(col("nullm"), col("pcol")).as("null_count"),
        col("num_records"))
  }

  /** Tombstone / VACUUM census — the other half of [[deltaLogState]]:
    * the paths whose LATEST action is a remove, with the removing
    * version — the candidate set a vacuum pass deletes once
    * retention expires (a re-added path is NOT a tombstone: the
    * resurrection rule applies symmetrically).  Same
    * last-action-wins window, same protocol gate, same
    * metadata-only economics.
    */
  def deltaTombstones(
      spark: org.apache.spark.sql.SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    checkDeltaProtocol(spark, logDir)
    val sch = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType))))))
    val actions = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        col("version"))
      .filter(col("path").isNotNull)
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    actions.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_add") === 0)
      .select(col("path"), col("version").as("version_removed"))
  }

  /** Checkpoint-aware [[deltaLogState]] — the 10⁶-commit path the
    * protocol itself prescribes (and r14 documented as "the caller's
    * composition"; now it IS the composition): read `_last_checkpoint`
    * for the checkpoint version V, load the checkpoint parquet's
    * add/remove actions as the state AT V, and replay only the JSON
    * commits AFTER V on top — the same last-action-wins window,
    * resurrection included.  The log scan is O(commits since last
    * checkpoint) instead of O(all commits), which is the entire
    * point of checkpoints.  Falls back to the full JSON replay when
    * no `_last_checkpoint` exists.  All three checkpoint LAYOUTS
    * resolve: the classic single file, multi-part (`parts` in
    * `_last_checkpoint` → `V.checkpoint.i-of-N.parquet`), and v2
    * UUID-named checkpoints whose `sidecar` actions point at
    * `_sidecars/` files carrying the add/remove set.
    *
    * One protocol-faithful caveat: checkpoint actions do not retain
    * their original commit versions, so `version_added` for files
    * that entered via the checkpoint is CLAMPED to V (post-checkpoint
    * adds stay exact).  Consumers asking "which files are live, how
    * big" — the audit/compaction/vacuum question — are unaffected.
    */
  def deltaLogStateFromCheckpoint(
      spark: org.apache.spark.sql.SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val lastCp = new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint")
    val fs = lastCp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lastCp)) return deltaLogState(spark, logDir)
    // protocol gate fires below, AFTER the checkpoint read: on a
    // retention-cleaned log the protocol action survives only inside
    // the checkpoint, so gating on JSON commits alone would silently
    // pass an unsupported table
    val cpMeta = {
      val in = fs.open(lastCp)
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    }
    val cpVersion = "\"version\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(cpMeta)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(
        s"deltaLogStateFromCheckpoint: no version in $lastCp"))
    // multi-part checkpoints (the protocol's large-table form):
    // `parts` in _last_checkpoint names N files
    // `V.checkpoint.i-of-N.parquet`, read together — the split is a
    // layout choice, not a semantic one
    val sch = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)))))))
    // For a JSON v2 top file the file actions it carries (if any)
    // can't join the parquet multi-path read below — they ride along
    // here as a separately-parsed DataFrame instead.
    var jsonTopActions: Option[DataFrame] = None
    val cpPaths = "\"parts\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(cpMeta).map(_.group(1).toInt) match {
      case Some(n) =>
        require(n >= 1 && n <= 1000000,
          s"deltaLogStateFromCheckpoint: absurd parts=$n in $lastCp")
        (1 to n).map(i =>
          f"$logDir/$cpVersion%020d.checkpoint.$i%010d.$n%010d.parquet")
      case None =>
        val classic =
          new org.apache.hadoop.fs.Path(
            logDir, f"$cpVersion%020d.checkpoint.parquet")
        if (fs.exists(classic)) Seq(classic.toString)
        else {
          // v2 UUID-named checkpoint (checkpointPolicy v2): any ONE
          // V.checkpoint.<uuid>.parquet is complete on its own —
          // pick the lexicographically last for determinism.  Its
          // `sidecar` actions name files under _sidecars/ that carry
          // the add/remove set (read below via the same schema; the
          // sidecar column is absent there and reads as null).
          // The protocol allows BOTH parquet and json v2 top files
          // (`v2CheckpointFormat` parquet|json); sidecars are always
          // parquet.  Prefer parquet when both exist at the version.
          val prefix = f"$cpVersion%020d.checkpoint."
          val cands = fs.listStatus(
              new org.apache.hadoop.fs.Path(logDir))
            .map(_.getPath)
            .filter { q =>
              val n = q.getName
              n.startsWith(prefix) &&
                (n.endsWith(".parquet") || n.endsWith(".json"))
            }
            .sortBy(_.getName)
          require(cands.nonEmpty,
            s"deltaLogStateFromCheckpoint: _last_checkpoint names " +
              s"version $cpVersion but no checkpoint file matches " +
              s"$prefix*.{parquet,json} in $logDir")
          val top = cands.filter(_.getName.endsWith(".parquet"))
            .lastOption.getOrElse(cands.last).toString
          val topDf =
            if (top.endsWith(".json")) spark.read.schema(sch).json(top)
            else spark.read.schema(sch).parquet(top)
          val sidecars = topDf
            .select(col("sidecar.path"))
            .filter(col("path").isNotNull)
            .collect().map(_.getString(0))
          require(sidecars.length <= 1000000,
            s"deltaLogStateFromCheckpoint: absurd sidecar count " +
              s"${sidecars.length} in $top")
          val sidecarPaths =
            sidecars.map(sp => s"$logDir/_sidecars/$sp").toSeq
          if (top.endsWith(".json")) {
            jsonTopActions = Some(topDf)
            sidecarPaths
          } else top +: sidecarPaths
        }
    }
    // the checkpoint IS the state at cpVersion: its actions replay as
    // if committed there (hence the version_added clamp)
    val cpRaw = {
      val parquetPart =
        if (cpPaths.nonEmpty)
          Some(spark.read.schema(sch).parquet(cpPaths: _*))
        else None
      (parquetPart, jsonTopActions) match {
        case (Some(p), Some(j)) => p.unionByName(j)
        case (Some(p), None)    => p
        case (None, Some(j))    => j
        case (None, None) => sys.error(
          s"deltaLogStateFromCheckpoint: empty checkpoint at $cpVersion")
      }
    }
    // protocol gate, checkpoint-aware: the newest protocol between
    // (a) the checkpoint's own protocol row (committed at cpVersion —
    // checkpoint actions don't retain their original versions) and
    // (b) any JSON commit's protocol action decides.  Retention-
    // cleaned logs hit case (a) alone; a post-checkpoint protocol
    // upgrade hits (b) with a strictly larger version and wins.
    val cpProto = cpRaw
      .filter(col("protocol.minReaderVersion").isNotNull)
      .select(col("protocol.minReaderVersion"),
        col("protocol.readerFeatures"))
      .limit(1).collect().headOption
      .map { r =>
        val feats: Seq[String] =
          if (r.isNullAt(1)) Seq.empty else r.getSeq[String](1)
        (cpVersion, r.getInt(0), feats)
      }
    (cpProto.toSeq ++ newestJsonProtocol(spark, logDir).toSeq)
      .sortBy(-_._1).headOption
      .foreach { case (_, mrv, feats) =>
        enforceDeltaProtocol(mrv, feats, logDir)
      }
    val cpActions = cpRaw
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.size").as("size"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        lit(cpVersion).as("version"))
      .filter(col("path").isNotNull)
    val trailing = spark.read.schema(sch)
      .option("pathGlobFilter", "*.json").json(logDir)
      // COMMIT files only — a basename that is not purely digits
      // (a V.checkpoint.<uuid>.json v2 top file, a CRC sidecar)
      // must NOT replay as a commit: the trailing-digit extract
      // would otherwise mint a bogus high version from a uuid tail
      .filter(input_file_name().rlike("/[0-9]+\\.json$"))
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1).cast(LongType))
      .filter(col("version") > cpVersion) // pre-checkpoint commits are subsumed
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.size").as("size"),
        col("add.path").isNotNull.cast(IntegerType).as("is_add"),
        col("version"))
      .filter(col("path").isNotNull)
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    cpActions.unionByName(trailing)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_add") === 1)
      .select(col("path"), col("size"),
        col("version").as("version_added"))
  }

  /** Hudi-style timeline replay — the THIRD open-lakehouse format's
    * table state, completing the trio next to the Delta-log replay
    * and the Iceberg manifest census: read the timeline's completed
    * `<instant>.commit` / `<instant>.replacecommit` JSON files (the
    * filename carries the instant, the open Hudi layout), flatten
    * each commit's per-partition write stats to (fileId → path, size)
    * actions and each replacecommit's replaced-fileId lists to
    * tombstones, and resolve every (partition, fileId) to its LATEST
    * action — a file group whose newest action is a replace is dead
    * (clustering/compaction superseded it), otherwise the newest
    * write's file slice is the live one.  This is Hudi's core
    * copy-on-write read question: which base file per file group.
    *
    * Scale shape: the timeline is METADATA (KBs per commit), one
    * window over (partition, fileId) — corpus-size-independent, the
    * Delta-replay economics; for long timelines the archived-timeline
    * cutoff plays the checkpoint's role (point this reader at the
    * active timeline dir).
    */
  /** Hudi `hoodie.properties` census — the ENTRY POINT of every Hudi
    * read, completing the trio next to [[icebergMetadata]] and the
    * Delta `_last_checkpoint`/protocol reads: the table's identity,
    * type (COPY_ON_WRITE / MERGE_ON_READ — which read path applies),
    * table version, and partition-path fields, parsed with the JDK
    * Properties loader (the format IS java.util.Properties — using
    * the platform parser is the spec-faithful move, continuations
    * and escapes included).  One (key, value) row per property;
    * metadata-sized (the file is under a KB).
    */
  def hudiTableProperties(
      spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(
      tableDir, ".hoodie/hoodie.properties")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path),
      s"hudiTableProperties: $path missing — not a Hudi table root")
    val bytes = {
      val in = fs.open(path)
      try in.readAllBytes() finally in.close()
    }
    require(bytes.length <= (1 << 20),
      s"hudiTableProperties: ${bytes.length} bytes — not a properties file")
    val props = new java.util.Properties()
    props.load(new java.io.ByteArrayInputStream(bytes))
    import scala.jdk.CollectionConverters._
    val rows = props.stringPropertyNames().asScala.toSeq.sorted
      .map(k => (k, props.getProperty(k)))
    spark.createDataset(rows).toDF("key", "value")
  }

  def hudiTimelineState(
      spark: org.apache.spark.sql.SparkSession, timelineDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (writes, replaces) = hudiTimelineActions(spark, timelineDir)
    // a replacecommit REPLACES old groups and WRITES new ones in the
    // same instant; the replaced ids and written ids are disjoint, so
    // the is_write tiebreak only guards malformed timelines
    val w = Window.partitionBy("partition", "file_id")
      .orderBy(col("instant").desc, col("is_write").desc)
    writes.unionByName(replaces)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_write") === 1)
      .select(col("partition"), col("file_id"), col("path"), col("size"),
        col("instant").as("instant_added"))
  }

  /** The shared timeline decode under [[hudiTimelineState]] and
    * [[hudiFileSlices]]: list the completed commit files (explicitly
    * — the `.hoodie` dir is dot-prefixed and hidden to Spark's
    * FileIndex), parse them as one JSON doc per file with a corrupt-
    * record gate (a silently dropped commit reads as data loss), and
    * flatten to (write, replace) action frames.
    */
  private def hudiTimelineActions(
      spark: org.apache.spark.sql.SparkSession,
      timelineDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val writeStat = ArrayType(StructType(Seq(
      StructField("fileId", StringType),
      StructField("path", StringType),
      StructField("fileSizeInBytes", LongType))))
    val sch = StructType(Seq(
      StructField("partitionToWriteStats", MapType(StringType, writeStat)),
      StructField("partitionToReplaceFileIds",
        MapType(StringType, ArrayType(StringType))),
      // PERMISSIVE-mode corrupt capture: a timeline file that fails to
      // parse must fail the REPLAY, not silently vanish from state —
      // a dropped commit is exactly the wrong-answer mode a lakehouse
      // reader can least afford
      StructField("_corrupt_record", StringType)))
    // the timeline usually lives at `.hoodie/` — a DOT-PREFIXED dir
    // Spark's FileIndex treats as hidden and silently skips — so list
    // the completed-commit files explicitly (driver-side, O(timeline)
    // — metadata, KBs per commit) and hand Spark the file paths
    val tlPath = new org.apache.hadoop.fs.Path(timelineDir)
    val tlFs = tlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(tlFs.exists(tlPath),
      s"hudiTimelineState: timeline dir $timelineDir missing")
    val commitFiles = tlFs.listStatus(tlPath).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && (n.endsWith(".commit") || n.endsWith(".replacecommit") ||
          n.endsWith(".deltacommit")) // MOR timelines write deltacommits
      }
      .map(_.getPath.toString).sorted
    require(commitFiles.nonEmpty,
      s"hudiTimelineState: no completed .commit/.replacecommit files " +
        s"under $timelineDir — nothing to replay")
    val raw0 = spark.read.schema(sch)
      // one JSON document per timeline file (real commit files are
      // pretty-printed multi-line JSON; JSON-lines mode would shred
      // them into per-line corrupt records)
      .option("multiLine", "true")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(commitFiles: _*)
      .withColumn("instant",
        regexp_extract(input_file_name(),
          "(\\d+)\\.(?:replace|delta)?commit$", 1)
          .cast(LongType))
      // materialized before the corrupt-count: Spark (correctly)
      // refuses corrupt-record-only pruned scans over raw JSON, and
      // the timeline is metadata-sized so caching it is free
      .cache()
    val bad = raw0
      .filter(col("_corrupt_record").isNotNull || col("instant").isNull)
      .count()
    require(bad == 0L,
      s"hudiTimelineState: $bad malformed timeline file(s) under " +
        s"$timelineDir — refusing to compose table state from a " +
        "corrupt timeline (a silently dropped commit reads as data loss)")
    val raw = raw0.drop("_corrupt_record")
    val writes = raw
      .select(col("instant"),
        explode(col("partitionToWriteStats")).as(Seq("partition", "stats")))
      .select(col("instant"), col("partition"),
        explode(col("stats")).as("s"))
      .select(col("instant"), col("partition"),
        col("s.fileId").as("file_id"), col("s.path").as("path"),
        col("s.fileSizeInBytes").as("size"),
        lit(1).as("is_write"))
    val replaces = raw
      .filter(col("partitionToReplaceFileIds").isNotNull)
      .select(col("instant"),
        explode(col("partitionToReplaceFileIds")).as(Seq("partition", "fids")))
      .select(col("instant"), col("partition"),
        explode(col("fids")).as("file_id"),
        lit(null).cast(StringType).as("path"),
        lit(null).cast(LongType).as("size"),
        lit(0).as("is_write"))
    (writes, replaces)
  }

  /** MOR file-slice composition — the MERGE_ON_READ read-planning
    * question [[hudiTimelineState]]'s latest-slice answer cannot
    * express: a file group's readable state is its latest BASE file
    * (a `.parquet` write — compaction moves this forward) plus EVERY
    * `.log.` write at-or-after that base's instant.  One row per
    * (partition, file group, kind ∈ base|log, path); groups whose
    * latest action is a replace are dead and excluded, exactly as in
    * the COW resolver.  Metadata economics throughout: the timeline
    * is KBs per commit, two windows over file-group keys.
    */
  def hudiFileSlices(
      spark: org.apache.spark.sql.SparkSession, timelineDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (writes, replaces) = hudiTimelineActions(spark, timelineDir)
    val kinded = writes.withColumn("kind",
      when(col("path").contains(".log."), lit("log")).otherwise(lit("base")))
    // dead groups: latest action (write or replace) is a replace
    val wAll = Window.partitionBy("partition", "file_id")
      .orderBy(col("instant").desc, col("is_write").desc)
    val dead = kinded.select(col("instant"), col("partition"),
        col("file_id"), col("is_write"))
      .unionByName(replaces.select(col("instant"), col("partition"),
        col("file_id"), col("is_write")))
      .withColumn("rn", row_number().over(wAll))
      .filter(col("rn") === 1 && col("is_write") === 0)
      .select(col("partition"), col("file_id"))
    // latest base per live group
    val wBase = Window.partitionBy("partition", "file_id")
      .orderBy(col("instant").desc)
    val base = kinded.filter(col("kind") === "base")
      .withColumn("rn", row_number().over(wBase))
      .filter(col("rn") === 1)
      .select(col("partition"), col("file_id"), col("kind"), col("path"),
        col("size"), col("instant"))
    // logs at-or-after their group's current base
    val logs = kinded.filter(col("kind") === "log")
      .join(base.select(col("partition"), col("file_id"),
        col("instant").as("base_instant")), Seq("partition", "file_id"))
      .filter(col("instant") >= col("base_instant"))
      .select(col("partition"), col("file_id"), col("kind"), col("path"),
        col("size"), col("instant"))
    base.unionByName(logs)
      .join(dead, Seq("partition", "file_id"), "left_anti")
      .select(col("partition"), col("file_id"), col("kind"), col("path"),
        col("size"), col("instant"))
  }

  /** Hudi MERGE_ON_READ snapshot at TABLE level — the full read
    * chain, symmetric with [[hudiCowSnapshot]]: `hoodie.properties`
    * gate (MERGE_ON_READ), timeline replay to file slices
    * ([[hudiFileSlices]] — deltacommits carry the log-file writes),
    * then ONE [[hudiMorRead]] over all slices' base + log files
    * (record keys are unique across file groups, so the per-key
    * merge never crosses groups).  The slice lists are driver-side
    * metadata, same as every FileIndex; the data path inherits
    * hudiMorRead's shape — base never shuffles, log side spreads,
    * AQE picks the join.
    */
  def hudiMorSnapshot(
      spark: org.apache.spark.sql.SparkSession, tableRoot: String): DataFrame = {
    import spark.implicits._
    val props = hudiTableProperties(spark, tableRoot)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val tt = props.getOrElse("hoodie.table.type", "")
    require(tt == "MERGE_ON_READ",
      s"hudiMorSnapshot: $tableRoot declares hoodie.table.type=$tt — " +
        "COPY_ON_WRITE tables take the base-file-only hudiCowSnapshot")
    val slices = hudiFileSlices(spark, s"$tableRoot/.hoodie")
      .select(col("kind"), col("path")).as[(String, String)].collect()
    val basePaths = slices.collect { case ("base", p) => s"$tableRoot/$p" }
    val logPaths = slices.collect { case ("log", p) => s"$tableRoot/$p" }
    require(basePaths.nonEmpty,
      s"hudiMorSnapshot: $tableRoot has no live base files")
    if (logPaths.isEmpty) spark.read.parquet(basePaths.toIndexedSeq: _*)
    else hudiMorRead(spark, basePaths.toIndexedSeq, logPaths.toIndexedSeq)
  }

  /** Hudi COPY_ON_WRITE snapshot read — the table-level composition
    * the per-piece censuses build toward, symmetric with
    * [[deltaLogState]]-then-scan and the Iceberg manifest-then-scan
    * path: gate on `hoodie.properties` declaring COPY_ON_WRITE (a
    * MERGE_ON_READ table served by this path would silently miss its
    * log-file deltas — the gate turns that into a loud reject),
    * replay the `.hoodie/` timeline to the live file slice per
    * (partition, file group), and scan exactly those base files.
    *
    * Scale shape: the timeline replay is metadata (KBs per commit,
    * one window over file-group keys); the live-path list is
    * O(live files) on the driver — the same driver-side file list
    * every FileIndex holds — and the data read is a plain parquet
    * scan of those paths, so predicate pushdown / column pruning /
    * whole-stage codegen all apply untouched.
    */
  def hudiCowSnapshot(
      spark: org.apache.spark.sql.SparkSession, tableRoot: String): DataFrame = {
    import spark.implicits._
    val props = hudiTableProperties(spark, tableRoot)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val tt = props.getOrElse("hoodie.table.type", "")
    require(tt == "COPY_ON_WRITE",
      s"hudiCowSnapshot: $tableRoot declares hoodie.table.type=$tt — " +
        "only COPY_ON_WRITE tables are served by the base-file-only " +
        "path (MERGE_ON_READ needs the log-merge read, hudiMorRead)")
    val live = hudiTimelineState(spark, s"$tableRoot/.hoodie")
      .select(col("path")).as[String].collect()
    require(live.nonEmpty,
      s"hudiCowSnapshot: $tableRoot has no live file slices — empty " +
        "or fully-replaced timeline")
    spark.read.parquet(live.map(p => s"$tableRoot/$p").toIndexedSeq: _*)
  }

  /** Hudi INCREMENTAL read (COPY_ON_WRITE) — the third Hudi read
    * path next to snapshot and read-optimized, and the one the
    * format is named for: rows committed AFTER `beginInstant`.
    * Two-level pruning, both essential at scale: (1) FILE level —
    * only slices whose latest write instant is past the begin point
    * are scanned at all (the timeline answers this from metadata, so
    * an incremental poll of a 100 TB table reads only the churned
    * file groups); (2) ROW level — a COW rewrite copies UNCHANGED
    * rows forward into the new slice, so the scan filters on the
    * `_hoodie_commit_time` meta column the writer stamps per row
    * (instants are fixed-width digit strings, so the string compare
    * is the numeric compare and pushes down to parquet).
    */
  def hudiIncremental(
      spark: org.apache.spark.sql.SparkSession, tableRoot: String,
      beginInstant: String): DataFrame = {
    import spark.implicits._
    val props = hudiTableProperties(spark, tableRoot)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val tt = props.getOrElse("hoodie.table.type", "")
    require(tt == "COPY_ON_WRITE",
      s"hudiIncremental: $tableRoot declares hoodie.table.type=$tt — " +
        "the MERGE_ON_READ incremental path must also replay log " +
        "deltas and is not served here")
    val changed = hudiTimelineState(spark, s"$tableRoot/.hoodie")
      .filter(col("instant_added") > beginInstant.toLong)
      .select(col("path")).as[String].collect()
    if (changed.isEmpty)
      // legitimate empty delta: same schema as the snapshot, no rows
      hudiCowSnapshot(spark, tableRoot).limit(0)
    else
      spark.read.parquet(changed.map(p => s"$tableRoot/$p").toIndexedSeq: _*)
        .filter(col("_hoodie_commit_time") > beginInstant)
  }

  /** Hudi READ-OPTIMIZED read (MERGE_ON_READ) — the second MOR read
    * path: base files only, log deltas deliberately skipped.  The
    * trade every MOR user makes daily: columnar-scan speed and no
    * merge cost, at the price of staleness bounded by compaction
    * frequency.  Properties-gated to MOR (on COW the snapshot IS
    * read-optimized, so asking for this path there is a category
    * error worth rejecting loudly).
    */
  def hudiReadOptimized(
      spark: org.apache.spark.sql.SparkSession, tableRoot: String): DataFrame = {
    import spark.implicits._
    val props = hudiTableProperties(spark, tableRoot)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val tt = props.getOrElse("hoodie.table.type", "")
    require(tt == "MERGE_ON_READ",
      s"hudiReadOptimized: $tableRoot declares hoodie.table.type=$tt — " +
        "read-optimized is the MOR base-only path (a COW snapshot is " +
        "already base-only)")
    val bases = hudiFileSlices(spark, s"$tableRoot/.hoodie")
      .filter(col("kind") === "base")
      .select(col("path")).as[String].collect()
    require(bases.nonEmpty,
      s"hudiReadOptimized: $tableRoot has no live base files")
    spark.read.parquet(bases.map(p => s"$tableRoot/$p").toIndexedSeq: _*)
  }

  /** `HoodieLogBlockType` ordinals as they appear on the wire —
    * command / delete / corrupt / avro-data / hfile-data /
    * parquet-data / cdc-data.
    */
  private[graft] val HudiLogBlockTypes: Vector[String] = Vector(
    ":command", ":delete", ":corrupt", "avro", "hfile", "parquet", "cdc")

  private[graft] val HudiLogMagic: Array[Byte] = "#HUDI#".getBytes("UTF-8")

  /** One decoded Hudi log block: stream position, type, wire format
    * version, the header's INSTANT_TIME / SCHEMA entries, sizes, and
    * (for the avro-records shapes) the decoded record count.
    */
  final case class HudiLogBlock(
      file: String, block_seq: Long, block_type: String,
      format_version: Long, instant: String, target_instant: String,
      header_n: Long, content_length: Long, record_count: Long,
      total_length: Long, schema_json: String, rolled_back: Boolean)

  final case class HudiLogRecord(
      file: String, block_seq: Long, block_type: String,
      instant: String, record_json: String)

  @inline private def hudiBeI32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  @inline private def hudiBeI64(b: Array[Byte], p: Int): Long =
    (hudiBeI32(b, p).toLong << 32) |
      (hudiBeI32(b, p + 4).toLong & 0xffffffffL)

  /** From-spec walk of a Hudi log file's block stream (the
    * HoodieLogFormat MERGE_ON_READ delta side).  Each block is:
    * `#HUDI#` magic, i64 block size (everything after this field
    * through the trailing total-length, inclusive), i32 format
    * version, i32 block-type ordinal ([[HudiLogBlockTypes]]), a
    * header map of (i32 HeaderMetadataType ordinal, i32 len, utf8)
    * entries — INSTANT_TIME is ordinal 0, SCHEMA is 2 — then i64
    * content length + content, a footer map of the same shape, and
    * a trailing i64 total block length (magic included; the
    * reverse-traversal hook).  An avro data block's content is i32
    * content-format version, i32 record count, then count × (i32
    * size, avro-binary record), decoded against the header SCHEMA
    * through the from-spec avro walk.  This reader pins the SAME
    * sized-avro-records content shape for delete blocks (upstream
    * delete serialization varies by writer version — kryo lists
    * early, avro record lists later — so the reader standardizes on
    * the avro shape and says so here rather than guessing per file).
    *
    * ROLLBACK semantics, the part a naive walk gets wrong: a
    * `:command` block carrying TARGET_INSTANT_TIME (header ordinal 1)
    * invalidates every EARLIER block in the same file whose instant
    * equals the target — that is how a failed write's blocks are
    * fenced off without rewriting the log.  The walk is therefore
    * two-phase: structure first (every block's framing must parse —
    * a torn tail is a reject for the whole file), rollback marking,
    * then record decode ONLY for live data/delete blocks (a
    * rolled-back block's declared record count is surfaced from its
    * content header, but its payload is never interpreted — it is
    * exactly the bytes the rollback says not to trust).  Production
    * Hudi additionally tolerates a torn FINAL block by magic-scan
    * (CORRUPT_BLOCK); this reader keeps framing strict and says so.
    *
    * Returns None on ANY structural violation — bounds, ordinal
    * range, map overrun, record under/over-consuming its span, or a
    * total-length disagreeing with the block size: reject, never
    * garble.  TOTAL on arbitrary bytes (fuzz-pinned in StorageSpec).
    */
  private[graft] final case class HudiRawBlock(
      seq: Long, btype: String, version: Long, instant: String,
      target: String, schemaJson: String, headerN: Long,
      cStart: Int, cEnd: Int, totalLen: Long, rolledBack: Boolean)

  /** Phases 1+2 of the log walk, shared by [[hudiLogBlocksOf]] (the
    * census/validation flavor) and [[hudiLogRecordChunks]] (the
    * parallel-decode flavor) so rollback semantics cannot diverge:
    * structural framing walk, then `:command` rollback marking.
    */
  private[graft] def hudiLogStructure(
      b: Array[Byte]): Option[Vector[HudiRawBlock]] = {
    final case class RawBlock(
        seq: Long, btype: String, version: Long, instant: String,
        target: String, schemaJson: String, headerN: Long,
        cStart: Int, cEnd: Int, totalLen: Long)
    val raw = Vector.newBuilder[RawBlock]
    var off = 0
    var seq = 0L
    while (off < b.length) {
      if (off + 14 > b.length) return None
      var i = 0
      while (i < 6) {
        if (b(off + i) != HudiLogMagic(i)) return None
        i += 1
      }
      val bsize = hudiBeI64(b, off + 6)
      if (bsize < 28L || bsize > (b.length - off - 14).toLong) return None
      val blockEnd = off + 14 + bsize.toInt
      var p = off + 14
      val version = hudiBeI32(b, p); p += 4
      val typeOrd = hudiBeI32(b, p); p += 4
      if (version < 0 || typeOrd < 0 || typeOrd >= HudiLogBlockTypes.length)
        return None
      def readMap(p0: Int): Option[(Vector[(Int, String)], Int)] = {
        if (p0 + 4 > blockEnd - 8) return None
        val n = hudiBeI32(b, p0)
        if (n < 0 || n > 64) return None
        var q = p0 + 4
        val m = Vector.newBuilder[(Int, String)]
        var j = 0
        while (j < n) {
          if (q + 8 > blockEnd - 8) return None
          val ord = hudiBeI32(b, q)
          val len = hudiBeI32(b, q + 4)
          q += 8
          if (ord < 0 || len < 0 || len > blockEnd - 8 - q) return None
          m += ord -> new String(b, q, len, "UTF-8")
          q += len
          j += 1
        }
        Some((m.result(), q))
      }
      val hdr = readMap(p).getOrElse(return None)
      p = hdr._2
      if (p + 8 > blockEnd - 8) return None
      val contentLen = hudiBeI64(b, p); p += 8
      if (contentLen < 0 || contentLen > (blockEnd - 8 - p).toLong)
        return None
      val cStart = p
      val cEnd = p + contentLen.toInt
      val ftr = readMap(cEnd).getOrElse(return None)
      if (ftr._2 != blockEnd - 8) return None
      if (hudiBeI64(b, blockEnd - 8) != 14L + bsize) return None
      val headers = hdr._1.toMap
      raw += RawBlock(seq, HudiLogBlockTypes(typeOrd), version.toLong,
        headers.getOrElse(0, ""), headers.getOrElse(1, ""),
        headers.getOrElse(2, ""), hdr._1.length.toLong,
        cStart, cEnd, 14L + bsize)
      seq += 1
      off = blockEnd
    }
    val blocks = raw.result()
    // phase 2: rollback marking — a later :command block's target
    // instant kills every earlier block at that instant
    def dead(blk: RawBlock): Boolean = blocks.exists(c =>
      c.btype == ":command" && c.seq > blk.seq &&
        c.target.nonEmpty && c.target == blk.instant)
    Some(blocks.map(blk => HudiRawBlock(blk.seq, blk.btype, blk.version,
      blk.instant, blk.target, blk.schemaJson, blk.headerN, blk.cStart,
      blk.cEnd, blk.totalLen, dead(blk))))
  }

  private[graft] def hudiLogBlocksOf(
      file: String,
      b: Array[Byte]): Option[Vector[(HudiLogBlock, Vector[String])]] = {
    val blocks = hudiLogStructure(b).getOrElse(return None)
    // phase 3: record decode for LIVE data/delete blocks only
    val out = Vector.newBuilder[(HudiLogBlock, Vector[String])]
    for (blk <- blocks) {
      val isRecords = blk.btype == "avro" || blk.btype == ":delete"
      val contentLen = (blk.cEnd - blk.cStart).toLong
      val rolledBack = blk.rolledBack
      var declared = 0L
      val records: Vector[String] =
        if (blk.btype == "parquet") {
          // PARQUET_DATA_BLOCK: the content is a complete embedded
          // parquet file — the modern wide-table wire format; same
          // record_json contract as the avro arm, two formats one
          // merge.  Rolled-back: bytes stay uninterpreted.
          if (rolledBack) Vector.empty
          else {
            val (n, rows) = hudiParquetBlockRows(
              java.util.Arrays.copyOfRange(b, blk.cStart, blk.cEnd))
              .getOrElse(return None)
            declared = n
            rows
          }
        } else if (isRecords) {
          if (contentLen < 8L) return None
          val cnt = hudiBeI32(b, blk.cStart + 4)
          if (cnt < 0 || cnt > 10000000) return None
          declared = cnt.toLong
          if (rolledBack) Vector.empty
          else {
            val at = MultimodalOps.parseAvroSchema(blk.schemaJson)
              .getOrElse(return None)
            var q = blk.cStart + 8
            val rb = Vector.newBuilder[String]
            var j = 0
            while (j < cnt) {
              if (q + 4 > blk.cEnd) return None
              val sz = hudiBeI32(b, q)
              q += 4
              if (sz < 0 || sz > blk.cEnd - q) return None
              val v = MultimodalOps.avJsonValue(at, b, q, q + sz)
                .getOrElse(return None)
              if (v._2 != q + sz) return None
              rb += v._1
              q += sz
              j += 1
            }
            if (q != blk.cEnd) return None
            rb.result()
          }
        } else Vector.empty
      out += ((HudiLogBlock(file, blk.seq, blk.btype, blk.version,
        blk.instant, blk.target, blk.headerN, contentLen, declared,
        blk.totalLen, blk.schemaJson, rolledBack), records))
    }
    Some(out.result())
  }

  /** In-memory [[org.apache.parquet.io.InputFile]] over a byte array
    * — the PARQUET_DATA_BLOCK content of a Hudi log is a COMPLETE
    * parquet file embedded in the block, and parquet-hadoop only
    * reads through this interface.
    */
  private final class BytesInputFile(b: Array[Byte])
      extends org.apache.parquet.io.InputFile {
    override def getLength: Long = b.length.toLong
    override def newStream(): org.apache.parquet.io.SeekableInputStream =
      new org.apache.parquet.io.SeekableInputStream {
        private val buf = java.nio.ByteBuffer.wrap(b)
        override def getPos: Long = buf.position().toLong
        override def seek(p: Long): Unit = buf.position(p.toInt)
        override def read(): Int =
          if (!buf.hasRemaining) -1 else buf.get() & 0xff
        override def read(dst: Array[Byte], off: Int, len: Int): Int = {
          if (!buf.hasRemaining) return -1
          val n = math.min(len, buf.remaining())
          buf.get(dst, off, n); n
        }
        override def read(dst: java.nio.ByteBuffer): Int = {
          if (!buf.hasRemaining) return -1
          val n = math.min(dst.remaining(), buf.remaining())
          val slice = buf.slice(); slice.limit(n)
          dst.put(slice); buf.position(buf.position() + n); n
        }
        override def readFully(dst: Array[Byte]): Unit =
          readFully(dst, 0, dst.length)
        override def readFully(dst: Array[Byte], off: Int, len: Int): Unit = {
          if (buf.remaining() < len) throw new java.io.EOFException()
          buf.get(dst, off, len); ()
        }
        override def readFully(dst: java.nio.ByteBuffer): Unit = {
          if (buf.remaining() < dst.remaining())
            throw new java.io.EOFException()
          while (dst.hasRemaining) dst.put(buf.get())
        }
        override def close(): Unit = ()
      }
  }

  /** Decode a PARQUET_DATA_BLOCK's content — one embedded parquet
    * file — to (row count, rows as JSON text matching the avro
    * blocks' record_json contract, field names from the parquet
    * schema).  Flat primitive schemas only (the Hudi data-block
    * shape); nested fields, INT96, or any parquet-hadoop decode
    * failure → None — reject, never garble.  TOTAL on arbitrary
    * bytes via the catch-all (parquet-hadoop throws freely on
    * corrupt input; the walk must not).
    */
  private[graft] def hudiParquetBlockRows(
      content: Array[Byte]): Option[(Long, Vector[String])] =
    try {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        new BytesInputFile(content))
      try {
        val schema = rdr.getFooter.getFileMetaData.getSchema
        import scala.jdk.CollectionConverters._
        val fields = schema.getFields.asScala.toVector
        if (fields.exists(!_.isPrimitive)) return None
        // decimal-annotated primitives carry a scale the raw value
        // walk below would silently drop (an INT64-backed DECIMAL
        // would read as the unscaled long) — reject, never garble
        if (fields.exists(f => f.getLogicalTypeAnnotation != null &&
          f.getLogicalTypeAnnotation.isInstanceOf[
            org.apache.parquet.schema.LogicalTypeAnnotation
              .DecimalLogicalTypeAnnotation])) return None
        val out = Vector.newBuilder[String]
        var total = 0L
        var pages = rdr.readNextRowGroup()
        while (pages != null) {
          val recReader = new org.apache.parquet.io.ColumnIOFactory()
            .getColumnIO(schema)
            .getRecordReader(pages,
              new org.apache.parquet.example.data.simple.convert
                .GroupRecordConverter(schema))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = recReader.read()
            val parts = Vector.newBuilder[String]
            var f = 0
            while (f < fields.length) {
              val ft = fields(f).asPrimitiveType()
              val v =
                if (g.getFieldRepetitionCount(f) == 0) "null"
                else ft.getPrimitiveTypeName match {
                  case INT64 => g.getLong(f, 0).toString
                  case INT32 => g.getInteger(f, 0).toString
                  case DOUBLE => g.getDouble(f, 0).toString
                  case FLOAT => g.getFloat(f, 0).toString
                  case BOOLEAN => g.getBoolean(f, 0).toString
                  case BINARY | FIXED_LEN_BYTE_ARRAY =>
                    if (ft.getLogicalTypeAnnotation != null &&
                      ft.getLogicalTypeAnnotation.isInstanceOf[
                        org.apache.parquet.schema.LogicalTypeAnnotation
                          .StringLogicalTypeAnnotation])
                      "\"" + MultimodalOps.avJsonEscape(
                        g.getString(f, 0)) + "\""
                    else
                      "\"" + g.getBinary(f, 0).getBytes
                        .map("%02x".format(_)).mkString + "\""
                  case _ => return None // INT96 etc.
                }
              parts += "\"" + MultimodalOps.avJsonEscape(
                fields(f).getName) + "\":" + v
              f += 1
            }
            out += "{" + parts.result().mkString(",") + "}"
            i += 1
          }
          total += pages.getRowCount
          pages = rdr.readNextRowGroup()
        }
        Some((total, out.result()))
      } finally rdr.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** List a file slice's log files explicitly: Hudi log files are
    * DOT-PREFIXED (`.<fileId>_<baseInstant>.log.<version>`), which
    * Spark's FileIndex classifies as hidden and silently drops — so
    * the log readers list with the FileSystem API (driver-side,
    * O(slice files)) and ship paths to executors, one task per file.
    */
  private def hudiListLogFiles(
      spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): Seq[String] =
    paths.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq
          .filter { s =>
            val n = s.getPath.getName
            // slice delta logs AND archived-timeline segments — both
            // are HoodieLogFormat streams, differently named
            s.isFile && (n.contains(".log.") || n.contains(".archive"))
          }
          .map(_.getPath.toString)
      else Seq(p)
    }.sorted

  /** Hudi ARCHIVED timeline census — the long-history half the
    * active `.hoodie/` replay points at: past the retention bound,
    * instants move into `.hoodie/archived/` as HoodieLogFormat
    * segments whose avro records describe the archived actions — the
    * SAME wire format as the MOR delta logs, so this is
    * [[hudiLogRecords]] plus a typed projection.  One row per
    * archived instant: (commit_time, action_type).  Metadata
    * economics: archive segments are KBs per thousand instants.
    */
  def hudiArchivedTimeline(
      spark: org.apache.spark.sql.SparkSession, archiveDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("commitTime", StringType),
      StructField("actionType", StringType)))
    val recs = hudiLogRecords(spark, Seq(archiveDir))
      .withColumn("a", from_json(col("record_json"), sch))
    val bad = recs.filter(
      col("a").isNull || col("a").getField("commitTime").isNull ||
        col("a").getField("actionType").isNull).count()
    require(bad == 0L,
      s"hudiArchivedTimeline: $bad undecodable archived-instant " +
        s"record(s) under $archiveDir — refusing a partial history")
    recs.select(col("a").getField("commitTime").as("commit_time"),
      col("a").getField("actionType").as("action_type"))
  }

  private def hudiDecodedLogs(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String]): org.apache.spark.sql.Dataset[
      (HudiLogBlock, Vector[String])] = {
    import spark.implicits._
    val files = hudiListLogFiles(spark, paths)
    require(files.nonEmpty,
      s"hudiDecodedLogs: no `.log.` files under ${paths.mkString(",")}")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { f =>
          val hp = new org.apache.hadoop.fs.Path(f)
          val in = hp.getFileSystem(conf).open(hp)
          val bytes = try in.readAllBytes() finally in.close()
          hudiLogBlocksOf(hp.getName, bytes).getOrElse(
            sys.error(s"hudiDecodedLogs: malformed Hudi log block " +
              s"stream in $f — refusing to merge a partially-readable " +
              "delta (a skipped block reads as silent data loss)"))
        }
      }
  }

  /** Block-level census of Hudi log files — one row per log block:
    * position, type, format version, instant, header entry count,
    * content length, decoded record count.  The MOR maintenance
    * surface (compaction planning reads exactly this: how much delta
    * has accumulated per file slice, at which instants).
    */
  def hudiLogBlocks(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    hudiDecodedLogs(spark, paths).map(_._1).toDF()
  }

  /** A decodable span of one log block's records: `[from, until)`
    * bytes of `path` holding `n` sized avro records (or, for a
    * parquet block, the whole embedded file).  The unit of WITHIN-
    * FILE decode parallelism.
    */
  private[graft] final case class HudiRecordChunk(
      path: String, block_seq: Long, block_type: String, instant: String,
      schema_json: String, from: Long, until: Long, n: Int)

  /** Chunk a log file's LIVE record blocks into ~`targetRecs`-record
    * spans.  The scan is framing-only — per record one i32 size read
    * and a bounds check, no value decode — so it is cheap even on a
    * 100 MB log, and it preserves the full walk's reject contract
    * (any record escaping its block's span rejects the file).
    * Parquet blocks are one indivisible chunk (the embedded file
    * decodes as a unit).  Shares [[hudiLogStructure]], so rollback
    * fencing is identical to the census walk.
    */
  private[graft] def hudiLogRecordChunks(
      path: String, b: Array[Byte],
      targetRecs: Int): Option[Vector[HudiRecordChunk]] = {
    if (targetRecs <= 0) return None
    val blocks = hudiLogStructure(b).getOrElse(return None)
    val out = Vector.newBuilder[HudiRecordChunk]
    for (blk <- blocks if !blk.rolledBack) {
      if (blk.btype == "parquet") {
        out += HudiRecordChunk(path, blk.seq, blk.btype, blk.instant,
          blk.schemaJson, blk.cStart.toLong, blk.cEnd.toLong, -1)
      } else if (blk.btype == "avro" || blk.btype == ":delete") {
        if (blk.cEnd - blk.cStart < 8) return None
        val cnt = hudiBeI32(b, blk.cStart + 4)
        if (cnt < 0 || cnt > 10000000) return None
        var q = blk.cStart + 8
        var chunkStart = q
        var inChunk = 0
        var j = 0
        while (j < cnt) {
          if (q + 4 > blk.cEnd) return None
          val sz = hudiBeI32(b, q)
          if (sz < 0 || sz > blk.cEnd - q - 4) return None
          q += 4 + sz
          inChunk += 1
          if (inChunk == targetRecs || j == cnt - 1) {
            out += HudiRecordChunk(path, blk.seq, blk.btype, blk.instant,
              blk.schemaJson, chunkStart.toLong, q.toLong, inChunk)
            chunkStart = q
            inChunk = 0
          }
          j += 1
        }
        if (q != blk.cEnd) return None
      }
    }
    Some(out.result())
  }

  /** Decode one chunk's records to JSON (the executor-side half of
    * the parallel record reader).  Throws on malformed content — by
    * the time a chunk exists the framing already validated, so a
    * failure here is file corruption between the two reads and must
    * be LOUD.
    */
  private[graft] def hudiDecodeChunk(
      c: HudiRecordChunk, bytes: Array[Byte]): Vector[String] =
    if (c.block_type == "parquet")
      hudiParquetBlockRows(bytes).getOrElse(
        sys.error(s"hudiDecodeChunk: embedded parquet block in " +
          s"${c.path} block ${c.block_seq} undecodable"))._2
    else {
      val at = MultimodalOps.parseAvroSchema(c.schema_json).getOrElse(
        sys.error(s"hudiDecodeChunk: bad block schema in ${c.path}"))
      val rb = Vector.newBuilder[String]
      var q = 0
      var j = 0
      while (j < c.n) {
        if (q + 4 > bytes.length)
          sys.error(s"hudiDecodeChunk: truncated chunk in ${c.path}")
        val sz = hudiBeI32(bytes, q)
        q += 4
        val v = MultimodalOps.avJsonValue(at, bytes, q, q + sz).getOrElse(
          sys.error(s"hudiDecodeChunk: undecodable record in ${c.path} " +
            s"block ${c.block_seq}"))
        if (v._2 != q + sz)
          sys.error(s"hudiDecodeChunk: record span mismatch in ${c.path}")
        rb += v._1
        q += sz
        j += 1
      }
      rb.result()
    }

  /** Record-level view of Hudi log files — one row per data/delete
    * block record, the block's instant alongside, the record itself
    * as JSON (decoded against the block header's embedded SCHEMA —
    * schemas can differ per block, so the typed interpretation
    * belongs to the caller holding the table schema).
    *
    * PARALLEL WITHIN A FILE — the part that matters when one slice's
    * log has grown compaction-overdue: a framing-only chunk scan
    * (one i32 per record, no value decode) splits each file's record
    * blocks into ~64k-record spans, the chunk list (metadata, no
    * bytes) re-spreads across the cluster, and each task ranged-reads
    * and decodes ONLY its span.  A single 100 MB log therefore
    * decodes at full parallelism instead of serializing one task —
    * and downstream shuffles get many map tasks instead of one.
    */
  def hudiLogRecords(
      spark: org.apache.spark.sql.SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = hudiListLogFiles(spark, paths)
    require(files.nonEmpty,
      s"hudiLogRecords: no log files under ${paths.mkString(",")}")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val chunks = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { f =>
          val hp = new org.apache.hadoop.fs.Path(f)
          val in = hp.getFileSystem(conf).open(hp)
          val bytes = try in.readAllBytes() finally in.close()
          hudiLogRecordChunks(f, bytes, 65536).getOrElse(
            sys.error(s"hudiLogRecords: malformed Hudi log block " +
              s"stream in $f — refusing to merge a partially-readable " +
              "delta (a skipped block reads as silent data loss)"))
        }
      }
    chunks
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { c =>
          val hp = new org.apache.hadoop.fs.Path(c.path)
          val in = hp.getFileSystem(conf).open(hp)
          val span = new Array[Byte]((c.until - c.from).toInt)
          try in.readFully(c.from, span, 0, span.length)
          finally in.close()
          hudiDecodeChunk(c, span).map(r => HudiLogRecord(
            hp.getName, c.block_seq, c.block_type, c.instant, r))
        }
      }.toDF()
  }

  /** Hudi MERGE_ON_READ snapshot of one-or-more file slices: base
    * parquet files merged with their log-file deltas — updates
    * override base rows by record key, deletes drop them, the latest
    * log action per key winning (instant, then delete-over-update on
    * a tie, then block order).
    *
    * Scale shape — the part worth getting right at 100 TB: the BASE
    * side never shuffles.  Hudi routes inserts to NEW file groups
    * (log files carry updates/deletes for their own group's keys),
    * so the merged read is: aggregate the log side to its latest
    * action per key — a shuffle of the SMALL side only, the
    * accumulated delta, orders of magnitude below the base — then
    * broadcast it into a single left join + filter over the base
    * scan.  Column pruning and predicate pushdown on base columns
    * survive (the join is on the key column only); update columns
    * resolve via `coalesce(log, base)` inside the same projection.
    */
  def hudiMorRead(
      spark: org.apache.spark.sql.SparkSession,
      basePaths: Seq[String], logPaths: Seq[String],
      keyCol: String = "_hoodie_record_key"): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val base = spark.read.parquet(basePaths: _*)
    require(base.columns.contains(keyCol),
      s"hudiMorRead: base files carry no `$keyCol` column — not a " +
        "Hudi base-file schema")
    // persisted: the update and delete branches below both read this
    // lineage, and without the pin each branch re-reads and re-decodes
    // every log file (measured 4× the single-decode time at the ×10
    // probe SF — the byte walk, not the merge, was the wall time).
    // Then SPREAD: the decode emits one partition per log file, and
    // without the rebalance the per-record from_json below runs
    // serially on however few files the slice has (the ×10 fixture's
    // single file put 2 M JSON parses on one core — 17 s of the 20 s
    // wall); the shuffle moves only the slim record strings
    // persisted AND eagerly materialized: the update and delete
    // branches sit in ONE job, and two subtrees racing to populate
    // the same cold cache can both run the decode — the count pins
    // the byte walk to exactly once.  Parallelism comes from the
    // reader itself (chunk spans — see hudiLogRecords), so no extra
    // repartition here.
    val recs = DedupOps.registerPersist(hudiLogRecords(spark, logPaths))
    recs.count()
    // avro AND parquet data blocks: two wire formats, one record_json
    // contract, one merge
    val updates = recs.filter(col("block_type").isin("avro", "parquet"))
      .withColumn("payload", from_json(col("record_json"), base.schema))
      .select(col("payload").getField(keyCol).as("k"),
        col("instant"), col("block_seq"),
        lit(0).as("is_delete"), col("payload"))
    val delSchema = StructType(Seq(StructField("recordKey", StringType)))
    val deletes = recs.filter(col("block_type") === ":delete")
      .withColumn("d", from_json(col("record_json"), delSchema))
      .select(col("d").getField("recordKey").as("k"),
        col("instant"), col("block_seq"),
        lit(1).as("is_delete"),
        lit(null).cast(base.schema).as("payload"))
    val w = Window.partitionBy("k")
      .orderBy(col("instant").desc, col("is_delete").desc,
        col("block_seq").desc)
    val logLatest = updates.unionByName(deletes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("is_delete"), col("payload"))
    // NO forced broadcast: the delta's size is data-dependent — for
    // the common thin-delta slice AQE's runtime stats turn this into
    // a broadcast join anyway (the base-never-shuffles shape), while
    // a compaction-overdue FAT delta (the ×10 fixture: delta = ⅓ of
    // base) would make a forced broadcast a driver/executor OOM at
    // scale; letting AQE pick degrades that case to a shuffle join
    // instead of an OOM
    val merged = base.join(
      logLatest, base(keyCol) === logLatest("k"), "left")
    merged
      .filter(col("is_delete").isNull || col("is_delete") === 0)
      .select(base.columns.toIndexedSeq.map { c =>
        if (c == keyCol) base(c).as(c)
        else coalesce(col("payload").getField(c), base(c)).as(c)
      }: _*)
  }

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet
    * table.  `numBuckets` should be sized so one bucket ≈ one
    * executor-task's worth of data at the target scale (100 TB / 10k
    * buckets ≈ 10 GB per bucket before row-group splitting).
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Overwrite-safe [[writeBucketed]]: drops a stale catalog entry AND
    * its orphaned warehouse directory first.  A managed table's
    * LOCATION outlives the (session-scoped) in-memory catalog, so a
    * fresh session re-creating the same table name would otherwise
    * fail with LOCATION_ALREADY_EXISTS even in Overwrite mode.
    */
  def writeBucketedReplacing(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // managed-table dirs are the lowercased identifier under the warehouse
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    writeBucketed(df, table, bucketCol, numBuckets)
  }

  /** Write partitioned by a low-cardinality column (date, lang,
    * source) so per-partition predicates prune files at planning time
    * — the coarse companion of bucketing's fine-grained co-location.
    */
  def writePartitioned(
      df: DataFrame, table: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(partitionCol)
      .saveAsTable(table)

  /** Compact a small-file parquet directory into ~`targetFileMB` files
    * — the maintenance op every long-running ingest needs: streaming
    * sinks, incremental appends, and over-parallel writes leave
    * thousands of KB-scale files whose per-file open/footer cost comes
    * to dominate every later scan (the classic small-file problem;
    * 100 TB in 1 MB files is 10⁸ opens per pass).
    *
    * File count derives from the directory's ACTUAL on-disk bytes (one
    * cheap listing, no data scan), then one job rewrites the rows
    * `coalesce`d to that count — coalesce, not repartition, so
    * compaction itself moves no rows over the network.  Row CONTENT is
    * preserved exactly (q_compact_roundtrip's oracle reads the
    * original table); intra-file order is not a parquet contract and
    * consumers must not rely on it.  Partition COLUMNS survive as data
    * columns but the directory layout flattens — compact partitioned
    * layouts per partition if pruning must keep working.  Writes to
    * `outDir` (compact-then-swap is the caller's atomic-rename step —
    * a maintenance job must not delete its input).  Returns the file
    * count written.
    */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, outDir: String, targetFileMB: Int = 256): Int = {
    require(targetFileMB > 0, s"compactParquet: targetFileMB=$targetFileMB")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts (the streaming-sink case
    // this op exists for) keep their files under subdirectories — a
    // flat listStatus would see only dirs, size the job at 0 bytes,
    // and funnel everything into one file
    val it = fs.listFiles(path, true)
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) bytes += s.getLen
    }
    val nFiles = math.max(1, math.ceil(
      bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    spark.read.parquet(dir)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }

  /** SCD Type-2 merge — the slowly-changing-dimension maintenance op:
    * fold an incoming snapshot `updates` into a versioned dimension
    * `current`, keeping FULL HISTORY.  A changed row's open version
    * closes (`version_end = batchId`, `is_current = false`) and a new
    * open version appends; unchanged rows and already-closed history
    * pass through untouched; unseen keys insert as new open rows.
    * Deletes are out of scope (retail SCD2 keeps disappeared keys
    * open — soft-delete is a tracked column).
    *
    * `current` schema: `key, tracked..., version_start BIGINT,
    * version_end BIGINT (OpenEnd = open), is_current BOOLEAN`;
    * `updates` carries `key, tracked...`.  Use [[scd2Init]] for
    * batch 0.
    *
    * Plan shape: ONE equi-join of the OPEN slice against the batch
    * (both shuffled on the key — on a key-bucketed dimension the
    * Exchange disappears, see [[writeBucketed]]); closed history is a
    * pass-through union that never joins.  At 100 TB the dimension's
    * history dominates rows but only the open slice pays the join —
    * exactly the merge shape Delta/Iceberg MERGE INTO compiles to,
    * expressed on plain DataFrames.
    */
  val OpenEnd: Long = Long.MaxValue

  def scd2Init(
      snapshot: DataFrame, key: String, tracked: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    snapshot.select((key +: tracked).map(col): _*)
      .withColumn("version_start", lit(0L))
      .withColumn("version_end", lit(OpenEnd))
      .withColumn("is_current", lit(true))
  }

  def scd2Merge(
      current: DataFrame, updates: DataFrame, key: String,
      tracked: Seq[String], batchId: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(batchId > 0, s"scd2Merge: batchId=$batchId (0 is scd2Init)")
    val closed = current.where(!col("is_current"))
    // side-presence flags, NOT key nullity, tell the two branches
    // apart after the full outer join: a NULL dimension key would
    // otherwise never match (null === x is null) and then vanish from
    // history when the branch filter tested col(key).isNotNull.  The
    // join itself is null-safe (<=>), so a null key behaves like any
    // other key value instead of silently dropping.
    val open = current.where(col("is_current"))
      .withColumn("__has_open", lit(true))
    val u = updates.select(
      col(key).as("__uk") +: tracked.map(t => col(t).as(s"__u_$t")): _*)
      .withColumn("__has_upd", lit(true))
    val j = open.join(u, col(key) <=> col("__uk"), "full_outer")
    val matched = col("__has_upd").isNotNull
    val differs = matched && tracked.map(t =>
      !(col(t) <=> col(s"__u_$t"))).reduce(_ || _)
    // open rows: unmatched pass through; matched-and-same pass
    // through; matched-and-different close
    val fromOpen = j.where(col("__has_open").isNotNull)
      .select((key +: tracked).map(col) :+
        col("version_start") :+
        when(differs, lit(batchId))
          .otherwise(col("version_end")).as("version_end") :+
        (!differs).as("is_current"): _*)
    // new versions: changed rows + brand-new keys, with the update's
    // tracked values
    val fresh = j.where(matched &&
        (col("__has_open").isNull || differs))
      .select(col("__uk").as(key) +:
        tracked.map(t => col(s"__u_$t").as(t)) :+
        lit(batchId).as("version_start") :+
        lit(OpenEnd).as("version_end") :+
        lit(true).as("is_current"): _*)
    closed.unionByName(fromOpen).unionByName(fresh)
  }

  /** AS-OF snapshot over an [[scd2Merge]]-maintained dimension: the
    * rows visible at batch `t` are exactly those whose version span
    * covers it — one filter, no join, pruning-friendly (a dimension
    * partitioned or z-ordered on `version_start` prunes history at
    * the scan).  `t = 0` reproduces the initial snapshot; the latest
    * batch reproduces `is_current`.
    */
  def scd2Snapshot(dim: DataFrame, t: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    dim.where(col("version_start") <= t && col("version_end") > t)
      .drop("is_current")
  }

  /** Morton (Z-order) value of N non-negative integer dimensions, each
    * truncated to `bits` low bits: bit `b` of dimension `i` lands at
    * output position `b*N + i` (round-robin, low-to-high).  Pure
    * bitwise builtins — `N*bits` shift/AND terms, fully inside
    * whole-stage codegen, no UDF.
    *
    * Z-order is the standard multi-dimensional CLUSTERING key for big
    * scans (Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting by the
    * interleaved value makes every contiguous file cover a small
    * RECTANGLE of the dimension space, so parquet min/max row-group
    * stats prune on EITHER dimension — a plain sort gives pruning on
    * the leading column only.  At 100 TB, a selective predicate on the
    * second dimension goes from a full scan to reading
    * ~√(files) of them.
    *
    * Callers pre-normalize dimensions to `[0, 2^bits)` (rank, epoch
    * day, price/16…); values outside are truncated, preserving only
    * low-bit locality.
    */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && bits * dims.size <= 62,
      s"zValue: ${dims.size} dims x $bits bits exceeds a long")
    val n = dims.size
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(d.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** The z-value as a SQL expression string over the SAME term order —
    * single-sourcing the oracle's replay of [[zValue]] (DuckDB and
    * Spark SQL share `&`, `>>`, `<<` on BIGINT).
    */
  def zValueSql(dims: Seq[String], bits: Int = 16): String = {
    val n = dims.size
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield s"(((CAST($d AS BIGINT) >> $b) & 1) << ${b * n + i})"
    terms.mkString("(", " + ", ")")
  }

  /** Rewrite `dir` z-ordered on `dims` into `nFiles` files: range-
    * partition by the interleaved value (sampled range bounds — no
    * global sort), sort within each partition, write one file per
    * partition.  Each output file then covers a compact rectangle of
    * the dimension space (StorageSpec pins the per-file range
    * shrinkage), which is what turns min/max file stats into real
    * pruning for predicates on ANY of the dims.
    */
  def zorderWrite(
      df: DataFrame, dims: Seq[Column], outDir: String,
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_zv", zValue(dims, bits))
      .repartitionByRange(nFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
}
