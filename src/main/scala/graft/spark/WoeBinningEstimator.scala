package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** MLlib pipeline wrapper around the core fit — the Spark-idiomatic
  * Estimator/Model shape the reference's fit/transform pattern maps to
  * (SURVEY.md §0 item 3).  Composes with `org.apache.spark.ml.Pipeline`
  * and persists via the usual `.write.save(path)`.
  *
  * SCHEMA CONTRACT: like the reference's `apply_bins` (binning.py:
  * 278-299), the default transform output is DATA-DEPENDENT — variables
  * failing the IV / bin-count / dedup filters are dropped, so the
  * actual columns can be a subset of what `transformSchema` declares
  * (one `<col>_bin` per input).  Set `exactSchema = true` to emit a
  * NULL-valued `<col>_bin` for every filtered variable instead, making
  * the declared schema exact for downstream pipeline stages.
  */
class WoeBinningEstimator(override val uid: String)
    extends Estimator[WoeBinningTransformer] with WoeBinningParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("woeBinning"))

  def setTargetCol(v: String): this.type = set(targetCol, v)
  def setInputCols(v: Array[String]): this.type = set(inputCols, v)
  def setNThreshold(v: Double): this.type = set(nThreshold, v)
  def setNOccurrences(v: Double): this.type = set(nOccurrences, v)
  def setPThreshold(v: Double): this.type = set(pThreshold, v)
  def setSepValue(v: Double): this.type = set(sepValue, v)
  def setMergeThreshold(v: Double): this.type = set(mergeThreshold, v)
  def setMaxDistinct(v: Int): this.type = set(maxDistinct, v)
  def setIvThreshold(v: Double): this.type = set(ivThreshold, v)
  def setBinThreshold(v: Int): this.type = set(binThreshold, v)
  def setRemove100Corr(v: Boolean): this.type = set(remove100Corr, v)
  def setPassthrough(v: Boolean): this.type = set(passthrough, v)
  def setExactSchema(v: Boolean): this.type = set(exactSchema, v)

  override def fit(ds: Dataset[_]): WoeBinningTransformer = {
    val opts = WoeFitOptions(
      nThreshold = if (isDefined(nThreshold)) Some($(nThreshold)) else None,
      nOccurrences = $(nOccurrences),
      pThreshold = $(pThreshold),
      sepValue = if (isDefined(sepValue)) Some($(sepValue)) else None,
      mergeThreshold = if (isDefined(mergeThreshold)) Some($(mergeThreshold)) else None,
      maxDistinct = if (isDefined(maxDistinct)) Some($(maxDistinct)) else None)
    val core = WoeBinning.fit(ds.toDF(), $(targetCol), $(inputCols).toSeq, opts)
    copyValues(new WoeBinningTransformer(uid, core).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    WoeBinningParams.outputSchema(schema, $(inputCols), $(passthrough))

  override def copy(extra: ParamMap): WoeBinningEstimator = defaultCopy(extra)
}

object WoeBinningEstimator extends DefaultParamsReadable[WoeBinningEstimator]

/** Shared params (fit + transform filters, binning.py:103-104,268). */
trait WoeBinningParams extends Params {
  final val targetCol = new Param[String](this, "targetCol", "binary 0/1 target column")
  final val inputCols = new StringArrayParam(this, "inputCols", "numeric feature columns")
  final val nThreshold = new DoubleParam(this, "nThreshold",
    "minimum bin size (default ceil(N/20))")
  final val nOccurrences = new DoubleParam(this, "nOccurrences", "minimum bads per bin")
  final val pThreshold = new DoubleParam(this, "pThreshold", "one-sided z-test cut")
  final val sepValue = new DoubleParam(this, "sepValue", "sentinel split value")
  final val mergeThreshold = new DoubleParam(this, "mergeThreshold",
    "relative |woe| gap for the post-merge")
  final val maxDistinct = new IntParam(this, "maxDistinct",
    "quantile pre-binning cap (scale knob, diverges from reference)")
  final val ivThreshold = new DoubleParam(this, "ivThreshold", "min total IV to keep a variable")
  final val binThreshold = new IntParam(this, "binThreshold", "min bins to keep a variable")
  final val remove100Corr = new BooleanParam(this, "remove100Corr",
    "drop variables whose total IV exactly repeats")
  final val passthrough = new BooleanParam(this, "passthrough",
    "keep input columns alongside the *_bin outputs")
  final val exactSchema = new BooleanParam(this, "exactSchema",
    "emit NULL *_bin columns for IV/bin-count/dedup-filtered variables " +
      "so the output always matches the declared schema")

  setDefault(targetCol -> "target", nOccurrences -> 1.0, pThreshold -> 0.1,
    ivThreshold -> 0.02, binThreshold -> 2, remove100Corr -> true,
    passthrough -> false, exactSchema -> false)
}

object WoeBinningParams {
  def outputSchema(schema: StructType, inputCols: Array[String], passthrough: Boolean): StructType = {
    // the surviving-variable set is data-dependent (IV filters); the
    // static schema lists a *_bin field per input, nullable
    val bins = inputCols.map(c => StructField(c + "_bin", DoubleType, nullable = true))
    if (passthrough) StructType(schema.fields ++ bins) else StructType(bins)
  }
}

/** The fitted MLlib Model: delegates to the driver-side bins +
  * expression-compiled transform of [[WoeBinningModel]].
  */
class WoeBinningTransformer(
    override val uid: String,
    val core: WoeBinningModel)
    extends Model[WoeBinningTransformer] with WoeBinningParams with MLWritable {

  def setIvThreshold(v: Double): this.type = set(ivThreshold, v)
  def setBinThreshold(v: Int): this.type = set(binThreshold, v)
  def setRemove100Corr(v: Boolean): this.type = set(remove100Corr, v)
  def setPassthrough(v: Boolean): this.type = set(passthrough, v)
  def setExactSchema(v: Boolean): this.type = set(exactSchema, v)

  /** The stacked 11-column bins table. */
  def binsDf(spark: SparkSession): DataFrame = core.binsDf(spark)

  override def transform(ds: Dataset[_]): DataFrame =
    core.transform(ds.toDF(), $(ivThreshold), $(binThreshold),
      $(remove100Corr), $(passthrough), $(exactSchema))

  override def transformSchema(schema: StructType): StructType =
    WoeBinningParams.outputSchema(schema,
      core.fitted.map(_._1).toArray, $(passthrough))

  override def copy(extra: ParamMap): WoeBinningTransformer =
    copyValues(new WoeBinningTransformer(uid, core), extra).setParent(parent)

  override def write: MLWriter = new WoeBinningTransformer.Writer(this)
}

object WoeBinningTransformer extends MLReadable[WoeBinningTransformer] {

  // DefaultParamsWriter/Reader are private[ml]; the Writer emits the
  // SAME on-disk shape they use — a single-line JSON text file at
  // <path>/metadata with class/uid/paramMap — so PipelineModel.load
  // (which reflects on the "class" field and dispatches to this
  // companion's read) works alongside direct load.
  private[spark] class Writer(instance: WoeBinningTransformer) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      instance.core.save(sparkSession, new Path(path, "bins").toString)
      val json =
        s"""{"class":"${classOf[WoeBinningTransformer].getName}",""" +
          s""""timestamp":${System.currentTimeMillis()},""" +
          s""""sparkVersion":"${sparkSession.version}",""" +
          s""""uid":"${instance.uid}",""" +
          s""""paramMap":{"ivThreshold":${instance.getOrDefault(instance.ivThreshold)},""" +
          s""""binThreshold":${instance.getOrDefault(instance.binThreshold)},""" +
          s""""remove100Corr":${instance.getOrDefault(instance.remove100Corr)},""" +
          s""""passthrough":${instance.getOrDefault(instance.passthrough)},""" +
          s""""exactSchema":${instance.getOrDefault(instance.exactSchema)}},""" +
          s""""defaultParamMap":{}}"""
      sparkSession.sparkContext.parallelize(Seq(json), 1)
        .saveAsTextFile(new Path(path, "metadata").toString)
    }
  }

  private class Reader extends MLReader[WoeBinningTransformer] {
    override def load(path: String): WoeBinningTransformer = {
      val core = WoeBinningModel.load(sparkSession, new Path(path, "bins").toString)
      val json = sparkSession.sparkContext
        .textFile(new Path(path, "metadata").toString, 1).first()
      def field(name: String): String = {
        val m = (s""""$name":("[^"]*"|[^,}]*)""").r.findFirstMatchIn(json)
        m.map(_.group(1).stripPrefix("\"").stripSuffix("\""))
          .getOrElse(sys.error(s"WoeBinningTransformer.load: missing $name in metadata"))
      }
      val m = new WoeBinningTransformer(field("uid"), core)
      m.set(m.ivThreshold, field("ivThreshold").toDouble)
        .set(m.binThreshold, field("binThreshold").toInt)
        .set(m.remove100Corr, field("remove100Corr").toBoolean)
        .set(m.passthrough, field("passthrough").toBoolean)
      // absent in pre-exactSchema saves → keep the false default
      val exact = (""""exactSchema":(true|false)""").r.findFirstMatchIn(json)
      exact.foreach(g => m.set(m.exactSchema, g.group(1).toBoolean))
      m
    }
  }

  override def read: MLReader[WoeBinningTransformer] = new Reader
}
