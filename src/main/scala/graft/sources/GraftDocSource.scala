package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftdoc` — a minimal length-prefixed binary corpus shard format,
  * implemented as a REAL DataSource V2 connector (the source tier of
  * the extension preference order, alongside the expression /
  * plan-node tiers the engine already exercises).  The format itself
  * is deliberately simple; the point is the CONNECTOR mechanics a
  * 100 TB source needs, each spec-pinned:
  *
  *  - **planning-time file skipping**: every shard footer records its
  *    doc_id min/max; pushed `doc_id` range filters eliminate whole
  *    files BEFORE any InputPartition is planned (the parquet
  *    row-group-stats idea at file granularity);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    doc_id-only projection never DECODES text bytes — the reader
  *    `skipBytes` past them (I/O still sequential, CPU and row width
  *    drop);
  *  - **filter pushdown** (`SupportsPushDownFilters`): doc_id
  *    comparisons are also applied per record in the reader; all
  *    filters are returned as residual so Spark re-applies them —
  *    the safe contract (a connector must never claim more than it
  *    guarantees);
  *  - **statistics** (`SupportsReportStatistics`): byte size from the
  *    surviving files, so the optimizer can broadcast a
  *    heavily-skipped read.
  *
  * One InputPartition per shard file — the natural split unit of a
  * record-stream format (records straddle no boundaries by
  * construction).
  *
  * Layout per file: `"GDOC1"` magic, then records of
  * `[long doc_id][int len][len utf8 bytes]`, then a 24-byte footer
  * `[long minId][long maxId][long count]`.
  */
class GraftDocSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDoc.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftDocTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object GraftDoc {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private[sources] val Magic = "GDOC1".getBytes("UTF-8")
  private[sources] val FooterBytes = 24

  /** Write `df` (doc_id long, text string) as graftdoc shards, one
    * file per partition, each with its min/max footer.  Executor-side
    * writes through the Hadoop FS API (object-store safe); overwrite
    * semantics.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val rows = df.select("doc_id", "text")
    rows.rdd.mapPartitionsWithIndex { case (pid, iter) =>
      val fsx = new Path(path).getFileSystem(hconf.value)
      val file = new Path(path, f"part-$pid%05d.gdoc")
      val out = new DataOutputStream(new java.io.BufferedOutputStream(
        fsx.create(file, true)))
      var minId = Long.MaxValue
      var maxId = Long.MinValue
      var n = 0L
      out.write(Magic)
      iter.foreach { row =>
        val id = row.getLong(0)
        val bytes =
          if (row.isNullAt(1)) null else row.getString(1).getBytes("UTF-8")
        out.writeLong(id)
        out.writeInt(if (bytes == null) -1 else bytes.length)
        if (bytes != null) out.write(bytes)
        minId = math.min(minId, id); maxId = math.max(maxId, id); n += 1
      }
      out.writeLong(minId); out.writeLong(maxId); out.writeLong(n)
      out.close()
      Iterator.single(n)
    }.count()
    ()
  }
}

class GraftDocTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graftdoc($path)"
  override def schema(): StructType = GraftDoc.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocScanBuilder(path,
      permissive = options.getBoolean("permissive", false))
}

class GraftDocScanBuilder(path: String, permissive: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftDoc.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("doc_id", _) | GreaterThan("doc_id", _) |
           GreaterThanOrEqual("doc_id", _) | LessThan("doc_id", _) |
           LessThanOrEqual("doc_id", _) => true
      case _ => false
    }
    filters // everything residual: Spark re-applies, we only SKIP with it
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDocScan(path, required, pushed, permissive)
}

/** The pushed doc_id bounds as a closed interval. */
private[sources] case class IdBounds(lo: Long, hi: Long) {
  def overlaps(min: Long, max: Long): Boolean = lo <= max && hi >= min
  def contains(id: Long): Boolean = id >= lo && id <= hi
}

private[sources] object IdBounds {
  def from(filters: Array[Filter]): IdBounds = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("doc_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) if v > Long.MinValue =>
        hi = math.min(hi, v - 1)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    IdBounds(lo, hi)
  }
}

case class GraftDocPartition(file: String, minId: Long, maxId: Long)
    extends InputPartition

class GraftDocScan(
    path: String, required: StructType, pushed: Array[Filter],
    permissive: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private lazy val bounds = IdBounds.from(pushed)

  /** (file, minId, maxId, bytes) for every shard SURVIVING the
    * footer-bounds skip — resolved once at planning time.
    */
  private lazy val survivingFiles: Seq[(String, Long, Long, Long)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).filter(_.getPath.getName.endsWith(".gdoc"))
    files.toSeq.flatMap { st =>
      // a shard must at least hold magic + footer, and its footer must
      // be sane; in permissive mode a corrupt shard is SKIPPED with a
      // warning instead of failing the whole 1000-executor read — one
      // bad object-store upload must not kill the job
      def corrupt(reason: String): Option[(String, Long, Long, Long)] =
        if (permissive) {
          System.err.println(
            s"[graftdoc] skipping corrupt shard ${st.getPath}: $reason")
          None
        } else sys.error(s"graftdoc: corrupt shard ${st.getPath}: $reason")
      if (st.getLen < GraftDoc.Magic.length + GraftDoc.FooterBytes)
        corrupt(s"only ${st.getLen} bytes")
      else {
        // an unreadable footer (I/O or checksum failure) is corruption
        // too — probe under the same permissive/strict policy
        val probed =
          try {
            val in = fs.open(st.getPath)
            try {
              val buf = new Array[Byte](GraftDoc.FooterBytes)
              in.readFully(st.getLen - GraftDoc.FooterBytes, buf)
              val magic = new Array[Byte](GraftDoc.Magic.length)
              in.readFully(0, magic)
              val bb = java.nio.ByteBuffer.wrap(buf)
              Right((magic, bb.getLong, bb.getLong, bb.getLong))
            } finally in.close()
          } catch {
            case e: java.io.IOException => Left(e.toString)
          }
        probed match {
          case Left(reason) => corrupt(reason)
          case Right((magic, mn, mx, n)) =>
            if (!java.util.Arrays.equals(magic, GraftDoc.Magic))
              corrupt("bad magic")
            else if (n < 0 || (n > 0 && mn > mx))
              corrupt(s"bad footer ($mn,$mx,$n)")
            else if (n > 0 && bounds.overlaps(mn, mx))
              Some((st.getPath.toString, mn, mx, st.getLen))
            else None
        }
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    survivingFiles.map { case (f, mn, mx, _) =>
      GraftDocPartition(f, mn, mx): InputPartition
    }.toArray

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(survivingFiles.map(_._4).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def description(): String =
    s"graftdoc $path, files=${survivingFiles.size}, " +
      s"bounds=[${bounds.lo},${bounds.hi}], " +
      s"columns=${required.fieldNames.mkString(",")}"

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocReaderFactory(required, bounds,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration))
}

class GraftDocReaderFactory(
    required: StructType, bounds: IdBounds,
    hconf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftDocReader(p.asInstanceOf[GraftDocPartition], required, bounds,
      hconf)
}

class GraftDocReader(
    part: GraftDocPartition, required: StructType, bounds: IdBounds,
    hconf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val needText = required.fieldNames.contains("text")
  private val fieldOrder: Array[Int] = required.fieldNames.map {
    case "doc_id" => 0
    case "text" => 1
    case other => throw new IllegalArgumentException(s"no column $other")
  }
  private val path = new Path(part.file)
  private val fs = path.getFileSystem(hconf.value)
  private val len = fs.getFileStatus(path).getLen
  private val in = new DataInputStream(new java.io.BufferedInputStream(
    fs.open(path), 1 << 16))
  private var pos: Long = {
    val magic = new Array[Byte](GraftDoc.Magic.length)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, GraftDoc.Magic),
      s"${part.file}: bad magic")
    GraftDoc.Magic.length.toLong
  }
  private val dataEnd = len - GraftDoc.FooterBytes
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pos < dataEnd) {
      val id = in.readLong()
      val n = in.readInt()
      pos += 12
      if (!bounds.contains(id)) {
        // record skipped by the pushed bounds: never decode the text
        if (n > 0) { in.skipBytes(n); pos += n }
      } else {
        val text: UTF8String =
          if (n < 0) null
          else if (!needText) { // pruned: skip, don't decode
            if (n > 0) { in.skipBytes(n); pos += n }
            null
          } else {
            val bytes = new Array[Byte](n)
            in.readFully(bytes)
            pos += n
            UTF8String.fromBytes(bytes)
          }
        val values: Array[Any] = fieldOrder.map {
          case 0 => id
          case 1 => text
        }
        current = InternalRow.fromSeq(values.toIndexedSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
