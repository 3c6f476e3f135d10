package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured sidecar parsing — the metadata discipline of
  * WebDataset/Dolma-style corpora, where every record carries a JSON
  * sidecar (crawl headers, license tags, per-event properties) next to
  * the payload columns.
  *
  * Everything here is SCHEMA-EXPLICIT `from_json` / `get_json_object`:
  * no `spark.read.json` inference pass ever runs, because at 100 TB
  * schema inference is a full extra scan of the corpus before the
  * first real job (the same rule [[graft.sources.JsonlCorpus]]
  * applies to whole-file JSONL).  Both functions are per-row
  * projections — no shuffle, fully pipelined inside whole-stage
  * codegen stages, partition-parallel at any scale.
  *
  * Corrupt sidecars behave like the engine's JSONL sources: a row
  * whose JSON fails the schema parses to a NULL struct instead of
  * failing the job, and [[corruptSidecars]] surfaces exactly those
  * rows for quarantine (count-safe: parse failure must never silently
  * shrink an aggregate).
  */
object JsonOps {

  /** Parses `jsonCol` against an explicit `schema` into struct column
    * `outCol`.  PERMISSIVE: an unparseable row yields a struct with
    * every field NULL (a NULL `jsonCol` stays a NULL struct) — pair
    * with [[corruptSidecars]] when the pipeline needs the quarantine
    * stream.
    */
  def parseSidecar(
      df: DataFrame, jsonCol: String, schema: StructType,
      outCol: String = "meta"): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))

  /** Single-path scalar extraction without a full parse —
    * `get_json_object` returns the path's value as a string (NULL on
    * missing path / corrupt JSON); cast at the call site.  Cheaper
    * than [[parseSidecar]] when one field of a wide sidecar is needed:
    * the tokenizer stops at the requested path.
    */
  def extractPath(c: Column, path: String): Column = get_json_object(c, path)

  /** Promotes every field of the parsed struct to a top-level column
    * named `prefix<field>`, dropping the struct — the step that turns
    * a sidecar into ordinary columns downstream operators (and column
    * pruning) see natively.
    */
  def flattenSidecar(
      df: DataFrame, structCol: String, prefix: String = ""): DataFrame = {
    val fields = df.schema(structCol).dataType match {
      case s: StructType => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"$structCol must be a struct, got ${other.catalogString}")
    }
    val flat = fields.map(f => col(s"`$structCol`.`$f`").as(s"$prefix$f"))
    df.select(df.columns.filterNot(_ == structCol).map(col).toSeq ++ flat: _*)
  }

  /** Rows whose non-null sidecar failed the schema parse — the
    * quarantine stream ([[graft.sources.JsonlCorpus]] discipline:
    * corrupt records are routed, never dropped silently).  PERMISSIVE
    * `from_json` does NOT null the struct on malformed input (it nulls
    * the fields), so detection goes through the engine's corrupt-record
    * column: the parser copies the raw text into it exactly when the
    * row failed (malformed JSON, or a field that defied its type).
    */
  def corruptSidecars(
      df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val corruptCol = "__graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol),
      s"schema may not already contain $corruptCol")
    val withCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    df.withColumn("__parsed",
        from_json(col(jsonCol), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corruptCol)))
      .where(col(s"__parsed.$corruptCol").isNotNull)
      .drop("__parsed")
  }
}
