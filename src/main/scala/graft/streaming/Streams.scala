package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has NO event-time/stateful
  * streaming (SURVEY §1.2 — its "streaming" is Polars' out-of-core engine
  * toggle), so this module is additive: the standard Spark streaming
  * wrappers a training-data ingest pipeline needs, consistent with the
  * batch verbs (same `functions._` expressions work in both).
  */
object Streams {

  /** Streaming scan over a directory of parquet files (the batch tables in
    * /root/testdata double as streaming fixtures via file-source). The file
    * source requires a directory; `globFilter` selects files within it. */
  def readParquetStream(spark: SparkSession, dir: String,
      schema: StructType, maxFilesPerTrigger: Int = 1,
      globFilter: Option[String] = None): DataFrame = {
    var r = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    globFilter.foreach(g => r = r.option("pathGlobFilter", g))
    r.parquet(dir)
  }

  /** Event-time windowed aggregation with a watermark: the canonical
    * rate-limited, state-bounded shape (append mode safe). */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
      window: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(F.window(F.col(tsCol), window) +: keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("value")).as("total_value"))

  /** Streaming dedup by key within the watermark horizon — state is bounded
    * by the watermark, so this runs forever at constant memory. */
  def dedupeStream(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Sessionization via session_window (gap-based), the stateful op a
    * clickstream pipeline needs. */
  def sessionize(events: DataFrame, tsCol: String, watermark: String,
      gap: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(F.session_window(F.col(tsCol), gap) +: keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_events"), F.sum(F.col("value")).as("total_value"))

  /** Custom keyed state via flatMapGroupsWithState: per-key running count +
    * running sum emitted on every update, with processing-time timeout
    * evicting idle keys — the canonical bounded-state custom operator.
    * (Event-time bounded variants hang state cleanup on the watermark.) */
  def runningTotals(events: DataFrame, keyCol: String, valueCol: String,
      idleTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(F.col(keyCol).cast("string").as("k"),
      F.col(valueCol).cast("double").as("v")).as[(String, Double)]
    def update(key: String, rows: Iterator[(String, Double)],
        state: GroupState[(Long, Double)]): Iterator[(String, Long, Double)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
        var n = n0; var s = s0
        rows.foreach { case (_, v) => n += 1; s += v }
        state.update((n, s))
        idleTimeout.foreach(state.setTimeoutDuration)
        Iterator((key, n, s))
      }
    }
    // processing-time timeout keeps scheduling empty micro-batches to fire
    // evictions — right for a 24/7 pipeline, never settles on a bounded
    // source — so the timeout (and the timeout conf) is opt-in
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf)(update)
      .toDF("key", "n", "total")
  }

  /** Drive a streaming query to completion against a bounded source and
    * return the materialized result — the local smoke-test harness
    * (memory sink + processAllAvailable). */
  def runToMemory(stream: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append()): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
