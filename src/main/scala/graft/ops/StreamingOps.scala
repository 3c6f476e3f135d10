package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` table (reserved by
  * the driver testdata for stream extensions; the reference itself has
  * no streaming surface — SURVEY.md §2.10).
  *
  * The events parquet has shipped with BOTH TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS) `ts` columns across testdata generations, so the
  * readers sniff the file's physical type from its footer and
  * normalize to the engine-canonical unit: `ts` as ns-since-epoch
  * LONG (exact integer arithmetic; ns epoch values fit a long until
  * year 2262).  Each op exists in a streaming form (readStream +
  * watermark) and a batch form with identical semantics — the batch
  * form is what the DuckDB oracle checks.
  */
object StreamingOps {

  /** Canonical post-normalization schema: `ts` is ns-since-epoch. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch (normalized)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def withEventTime(df: DataFrame): DataFrame =
    // integer DIV: double division of ns values (> 2^53) is off by
    // 1µs on ~13% of timestamps, shifting window-boundary events
    df.withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))

  /** True iff the parquet at `path` stores `ts` as TIMESTAMP(NANOS).
    * Footer-only sniff (one driver-side schema read, no data scan).
    * NANOS columns surface as LongType only under the nanosAsLong
    * legacy conf; without it Spark 4 reads them as TimestampNTZ/
    * Timestamp — so sniff with the conf ON and check for LongType.
    */
  private def tsIsNanosLong(spark: SparkSession, path: String): Boolean = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path).schema("ts").dataType == LongType
  }

  /** Reader-side schema matching the file's physical `ts` type. */
  private def fileSchema(nanos: Boolean): StructType =
    if (nanos) eventsSchema
    else StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** Normalize `ts` to ns-long (µs timestamps ×1000 — exact: the
    * product stays far below Long.MaxValue for any real epoch).
    */
  private def normalizeTs(df: DataFrame, nanos: Boolean): DataFrame =
    if (nanos) df
    else df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))

  // NOTE: nanosAsLong is a session-wide SQL conf (no reader-level
  // equivalent) and must stay set while a NANOS scan EXECUTES, so the
  // readers below intentionally leave it on: any later read of a
  // parquet TIMESTAMP(NANOS) column in the same session also sees
  // longs.  Isolate sessions (spark.newSession()) if that matters.

  def readEventsBatch(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val nanos = tsIsNanosLong(spark, path)
    withEventTime(normalizeTs(
      spark.read.schema(fileSchema(nanos)).parquet(path), nanos))
  }

  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    // the file-stream source insists on a directory; the testdata ships
    // one parquet FILE per table → stage a symlink dir
    val staged = graft.SparkEntry.stageAsDir(dir, "events")
    val nanos = tsIsNanosLong(spark, staged)
    withEventTime(normalizeTs(
      spark.readStream.schema(fileSchema(nanos)).parquet(staged), nanos))
  }

  /** 5-minute tumbling window counts per event type.  Works on both
    * the batch and streaming frames (same expression).  Integer DIV on
    * MICROSECONDS: double division would lose precision (ts > 2^53),
    * and DuckDB's TIMESTAMP is µs — µs is the cross-engine unit.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        expr("(ts DIV 1000) DIV 300000000").as("bucket5m"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1000).cast(LongType)).as("value_millis"))

  /** One-shot memory-sink runner shared by the stream test/demo
    * surfaces: runs the frame to completion, materializes the result
    * into a cached DataFrame, and — even on failure — stops the query
    * and drops the sink's temp view (the per-call nanoTime names would
    * otherwise accumulate in the catalog for the session's lifetime).
    * The returned frame stays cached; callers owning long sessions
    * should unpersist it when done.
    */
  private[graft] def runToMemory(
      df: DataFrame, prefix: String, outputMode: String): DataFrame = {
    val spark = df.sparkSession
    val name = s"${prefix}_${System.nanoTime()}"
    val q = df.writeStream.outputMode(outputMode).format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      val out = spark.table(name).cache()
      out.count() // materialize before the query stops / view drops
      out
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  /** Streaming flavor with watermark + event-time window (the idiom a
    * live source needs); memory-sink runner for tests/demo.
    */
  def runWindowedStream(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEventsStream(spark, dir)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1000).cast(LongType)).as("value_millis"))
    runToMemory(agg, "events_window", "complete")
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("value_millis"))
      .orderBy("window_start", "event_type")
  }

  /** Exact streaming dedup (idempotent ingestion): at-most-once per
    * key, with state BOUNDED by the watermark horizon —
    * `dropDuplicatesWithinWatermark` evicts seen-keys older than the
    * watermark, which is what makes exact dedup viable on an unbounded
    * stream (a plain `dropDuplicates` would grow state forever).
    * Batch equivalent: `df.dropDuplicates(keys)`.
    */
  def streamingDedup(
      events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Memory-sink runner: streams `dir` (a directory whose files may
    * repeat rows, e.g. a doubled staging of the events file) through
    * [[streamingDedup]] and returns the deduplicated frame.
    */
  def runDedupStream(
      spark: SparkSession, stagedDir: String,
      keys: Seq[String] = Seq("event_id")): DataFrame = {
    val nanos = tsIsNanosLong(spark, stagedDir)
    val src = withEventTime(normalizeTs(
      spark.readStream.schema(fileSchema(nanos)).parquet(stagedDir), nanos))
    runToMemory(streamingDedup(src, keys), "events_dedup", "append")
  }

  /** Event carried into the custom-state sessionizer (event_time is
    * the watermark column; tus the exact µs arithmetic twin).
    */
  case class SessEvent(
      user_id: Long, tus: Long, event_id: Long,
      event_time: java.sql.Timestamp)

  /** Open-session state per user: running session counter + bounds. */
  case class SessState(seq: Long, startUs: Long, lastUs: Long, n: Long)

  case class SessionRow(
      user_id: Long, session_id: Long, n_events: Long, duration_ms: Long)

  /** Streaming sessionization with CUSTOM state
    * (`flatMapGroupsWithState` + event-time timeout): per-user open
    * session lives in the state store; a session is emitted when the
    * inactivity gap closes it in-stream, or when the watermark passes
    * `last + gap` (timeout) — so state is one row per ACTIVE user,
    * bounded by the watermark horizon, never by history.  Emits the
    * same (user_id, session_id, n_events, duration_ms) rows as the
    * batch [[sessionize]] (StreamingOpsSpec pins equality); the
    * still-open session per user flushes on timeout once the watermark
    * moves past it.
    *
    * Cross-trigger order contract: a later trigger's events are
    * normally newer than the open session's `lastUs`.  A LATE event
    * (older than `lastUs`, admitted by the watermark) that falls
    * within the gap of the open session is ABSORBED correctly — the
    * session keeps `startUs = min`, `lastUs = max`, so duration and
    * count match what the batch sort would produce (OpsSpec pins
    * this).  A late event older than `lastUs − gap` cannot re-open or
    * renumber already-emitted sessions (their state is gone) — it
    * extends the open session's start; reordering OLDER than the gap
    * horizon needs an upstream sort, the standard streaming
    * sessionizer contract.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val src = events
      .withWatermark("event_time", s"$gapMinutes minutes")
      .select(col("user_id").cast("long").as("user_id"),
        expr("ts DIV 1000").as("tus"),
        col("event_id").cast("long").as("event_id"),
        col("event_time"))
      .as[SessEvent]
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final.
            // A TOMBSTONE (startUs = -1) keeps the per-user session
            // counter so a user who returns after a timeout continues
            // numbering — removing state here would re-emit
            // session_id 1 and break batch parity.  The state row
            // shrinks to the counter; callers needing strictly
            // active-user-bounded state can trade renumbering for
            // state.remove().  No new timeout is set, so tombstones
            // never re-fire.
            val s = state.get
            state.update(SessState(s.seq, -1L, -1L, 0L))
            if (s.startUs < 0) Iterator.empty // defensive: tombstone timeout
            else Iterator(
              SessionRow(uid, s.seq, s.n, (s.lastUs - s.startUs) / 1000L))
          } else {
            // batch-internal order restored here; cross-trigger order
            // is the documented source contract
            val evs = it.toVector.sortBy(e => (e.tus, e.event_id))
            val out = Vector.newBuilder[SessionRow]
            var st = state.getOption.getOrElse(SessState(0L, -1L, -1L, 0L))
            evs.foreach { e =>
              if (st.startUs < 0)
                st = SessState(st.seq + 1, e.tus, e.tus, 1L)
              else if (e.tus - st.lastUs > gapUs) {
                out += SessionRow(uid, st.seq, st.n,
                  (st.lastUs - st.startUs) / 1000L)
                st = SessState(st.seq + 1, e.tus, e.tus, 1L)
              } else
                // min/max bounds (not plain assignment): a LATE event
                // from a later trigger — older than lastUs but within
                // the gap — must widen the session, not regress its
                // end (a regressed lastUs would shrink duration AND
                // re-arm the timeout too early)
                st = st.copy(
                  startUs = math.min(st.startUs, e.tus),
                  lastUs = math.max(st.lastUs, e.tus),
                  n = st.n + 1)
            }
            state.update(st)
            // µs → ms; +1 so the timeout fires strictly after the gap
            state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000L + 1L)
            out.result().iterator
          }
      }.toDF()
  }

  /** Sessionization: per-user sessions split on ≥ 30 min inactivity
    * gaps — the classic gaps-and-islands form (lag + cumulative sum),
    * expressible identically in the batch oracle.  [[sessionizeStream]]
    * is the custom-state streaming equivalent; this batch form keeps
    * the semantics oracle-checkable.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    // µs granularity end-to-end (see windowedCounts precision note)
    val e = events.withColumn("tus", expr("ts DIV 1000"))
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val flagged = e.withColumn("new_session",
      when(lag("tus", 1).over(w).isNull, 1)
        .when(col("tus") - lag("tus", 1).over(w) > gapUs, 1)
        .otherwise(0))
    flagged
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("(max(tus) - min(tus)) DIV 1000").as("duration_ms"))
  }
}
