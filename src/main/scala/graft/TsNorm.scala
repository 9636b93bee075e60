package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-encoding normalizer for event-time columns.
  *
  * Parquet writers disagree on how they encode "a timestamp": some write
  * TIMESTAMP(NANOS) (which Spark surfaces as long ns-since-epoch under
  * `spark.sql.legacy.parquet.nanosAsLong`), some TIMESTAMP(MICROS)
  * adjusted-to-UTC (Spark's `TimestampType`), some µs naive
  * (`TimestampNTZType`). At 100 TB a corpus WILL mix writers, so the
  * engine's internal convention — `ts` is a long of ns since the epoch
  * (ns-precision is the reference's datetime resolution, SURVEY §1.2) —
  * must not depend on which writer produced a file. Everything downstream
  * (range join binning, streaming event-time, duration arithmetic) reads
  * the normalized column only.
  *
  * The session timezone is pinned to UTC (see [[GraftSession]]): the
  * reference's datetimes are naive (`series.ex:21-24`), so an NTZ wall
  * clock and the UTC instant coincide and the NTZ→instant cast below is
  * value-preserving.
  */
object TsNorm {

  /** Normalize `col` to long ns-since-epoch whatever its arrival type:
    * LongType passes through (TIMESTAMP(NANOS) read via `nanosAsLong`, or
    * a writer that already materialized epoch-ns), timestamp types go
    * through `unix_micros · 1000`. Absent column or other types: no-op.
    * Works on batch and streaming frames alike (pure projection). */
  def normalizeTs(df: DataFrame, col: String = "ts"): DataFrame =
    df.schema.find(_.name == col).map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampType) =>
        df.withColumn(col, F.unix_micros(F.col(col)) * F.lit(1000L))
      case Some(TimestampNTZType) =>
        // NTZ → instant through the (UTC) session tz, then to epoch-µs
        df.withColumn(col,
          F.unix_micros(F.col(col).cast(TimestampType)) * F.lit(1000L))
      case _ => df
    }
}
