package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC corpus interchange — the columnar alternative when the
  * surrounding stack (Hive-era warehouses, Trino/Presto federations)
  * speaks ORC rather than parquet.  Same rules as the other sources:
  * schema-explicit read (no footer-sampling inference pass across
  * 10⁵ files), splittable columnar scans with predicate
  * pushdown/column pruning — functionally parquet's peer, so the
  * round-trip gate is identical in shape.
  */
object OrcCorpus {

  def write(df: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode("overwrite").orc(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
