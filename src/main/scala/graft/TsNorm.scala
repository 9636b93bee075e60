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

  /** ns-since-epoch for 1970-02-22: every µs/ms/s encoding of any date
    * before ~2100 falls BELOW this (µs for 2100 ≈ 4.1e15), and every ns
    * encoding of a modern date falls above it — a clean discriminator for
    * the plain-INT64 misscale trap (r8 ADVICE: a writer that materialized
    * epoch-µs as untyped INT64 arrives as LongType and would silently
    * pass through 1000× off). */
  private val MinPlausibleNs = 1L << 52

  /** Normalize `col` to long ns-since-epoch whatever its arrival type:
    * LongType passes through (TIMESTAMP(NANOS) read via `nanosAsLong`, or
    * a writer that already materialized epoch-ns), timestamp types go
    * through `unix_micros · 1000`. Absent column: no-op. Any OTHER type
    * (string, int32-millis, …) THROWS like [[sliceNs]] does — a ts that
    * skipped normalization silently would corrupt every downstream
    * ns-domain computation; `lenient = true` restores the logged
    * passthrough for callers that knowingly carry a non-temporal `ts`.
    * Works on batch and streaming frames alike (pure projection).
    *
    * `assertNsRange` (event-time ingest sites set it): rides a per-row
    * `assert_true` on the LongType passthrough that aborts the query if a
    * value is non-null yet below [[MinPlausibleNs]] — i.e. the file's
    * untyped INT64 was NOT epoch-ns. The assert lives in a FILTER (pass →
    * true → row kept), not a column rewrite: the column stays the raw scan
    * attribute, so time predicates on it still reach parquet PushedFilters
    * / row-group pruning (the non-convertible assert conjunct simply stays
    * as a post-scan filter). One codegen'd comparison per row; no extra
    * job, streaming-safe. Off by default because pre-1970-02-22 instants
    * legitimately violate it; event tables are modern-dated. */
  /** Time-slice `df` to `[loNs, hiNs)` (ns-since-epoch domain) BEFORE
    * normalization, with the bound translated into the file's NATIVE
    * encoding so it reaches parquet `PushedFilters` and row-group min/max
    * pruning. This is the inverse of [[normalizeTs]]'s column rewrite: a
    * filter on the normalized column (`unix_micros(ts)*1000 >= lo`) is not
    * invertible to the scan, so at 100 TB a time-sliced query would read
    * every row group; filtering the RAW column against a translated
    * constant keeps the scan prunable — the difference between reading a
    * day and reading a decade on a time-partitioned corpus.
    *
    * Bound translation ns→µs is exact for µs-encoded files: with
    * `ceilDiv(x) = (x + 999) / 1000`, `us*1000 >= loNs ⟺ us >= ceilDiv(loNs)`
    * and `us*1000 < hiNs ⟺ us < ceilDiv(hiNs)` (integer `us`), so the
    * native predicate is EQUIVALENT to the ns-domain slice, not merely a
    * superset — no residual post-filter is needed. Timestamp literals are
    * built foldable (`timestamp_micros(lit)`), so ConstantFolding collapses
    * them before filter→parquet translation.
    *
    * Unhandled `ts` types throw: a slice silently returning unsliced (or
    * mis-sliced) data would be corrupt at any scale. Compose as
    * `normalizeTs(sliceNs(raw, lo, hi))`.
    *
    * `assertNsRange` on the INT64 branch: [[normalizeTs]]'s per-row
    * misscale assert is USELESS below a pushed slice bound — a file whose
    * untyped INT64 is really epoch-µs has every value ~1000× under any
    * modern ns bound, so the scan prunes ALL rows before the assert sees
    * one, and the query returns silently empty instead of aborting. The
    * slice therefore fails loud eagerly: a one-row probe job reads a
    * single non-null value and requires ns magnitude. Per-file encoding
    * is a writer property, so one row decides it; an empty table has
    * nothing to mis-slice and passes. */
  def sliceNs(df: DataFrame, loNs: Long, hiNs: Long,
              col: String = "ts", assertNsRange: Boolean = false): DataFrame = {
    require(loNs <= hiNs, s"empty/inverted slice [$loNs, $hiNs)")
    def ceilDivUs(ns: Long) = Math.floorDiv(Math.addExact(ns, 999L), 1000L)
    df.schema.find(_.name == col).map(_.dataType) match {
      case Some(LongType) => // epoch-ns passthrough: bound already native
        if (assertNsRange && df.isStreaming) {
          // a stream cannot run the eager probe (no collect); ride the
          // misscale assert on EVERY row instead, with the range predicate
          // as the `when` branch — `when(assert.isNull, <constant>)` is
          // fatal (ReplaceNullWithFalseInPredicate + SimplifyConditionals
          // fold the branches together and delete the assert, the r8
          // optimizer trap), but a non-constant branch cannot fold, so the
          // assert stays load-bearing. Costs parquet pushdown (the filter
          // is non-convertible), acceptable on a microbatch file source
          // where listing dominates.
          val msg = s"column '$col' arrived as INT64 with a magnitude too " +
            "small for ns-since-epoch — the writer likely materialized " +
            "epoch-us/ms/s as untyped INT64; a sliced read would be " +
            "silently empty"
          df.filter(
            F.when(F.assert_true(
              F.col(col).isNull || F.abs(F.col(col)) >= MinPlausibleNs,
              F.lit(msg)).isNull,
              F.col(col) >= F.lit(loNs) && F.col(col) < F.lit(hiNs)))
        } else {
          if (assertNsRange) {
            val probe = df.select(F.col(col)).filter(F.col(col).isNotNull)
              .limit(1).collect()
            probe.headOption.foreach { r =>
              val v = r.getLong(0)
              require(math.abs(v) >= MinPlausibleNs,
                s"column '$col' arrived as INT64 with magnitude $v — too " +
                  "small for ns-since-epoch; the writer likely materialized " +
                  "epoch-us/ms/s as untyped INT64. Slicing it against an " +
                  "ns-domain bound would silently return zero rows.")
            }
          }
          df.filter(F.col(col) >= F.lit(loNs) && F.col(col) < F.lit(hiNs))
        }
      case Some(TimestampType) =>
        df.filter(
          F.col(col) >= F.timestamp_micros(F.lit(ceilDivUs(loNs))) &&
          F.col(col) < F.timestamp_micros(F.lit(ceilDivUs(hiNs))))
      case Some(TimestampNTZType) =>
        // literal built as instant then cast to NTZ through the (UTC)
        // session tz — value-preserving, still foldable to an NTZ literal
        df.filter(
          F.col(col) >= F.timestamp_micros(F.lit(ceilDivUs(loNs)))
            .cast(TimestampNTZType) &&
          F.col(col) < F.timestamp_micros(F.lit(ceilDivUs(hiNs)))
            .cast(TimestampNTZType))
      case Some(other) => throw new IllegalArgumentException(
        s"cannot time-slice column '$col' of type $other — expected INT64 " +
          "ns, TIMESTAMP, or TIMESTAMP_NTZ")
      case None => throw new IllegalArgumentException(
        s"cannot time-slice: no column '$col' in ${df.schema.fieldNames.mkString(",")}")
    }
  }

  def normalizeTs(df: DataFrame, col: String = "ts",
                  assertNsRange: Boolean = false,
                  lenient: Boolean = false): DataFrame =
    df.schema.find(_.name == col).map(_.dataType) match {
      case Some(LongType) =>
        if (!assertNsRange) df
        else df.filter(
          F.when(F.assert_true(
            F.col(col).isNull || F.abs(F.col(col)) >= MinPlausibleNs,
            F.lit(s"column '$col' arrived as INT64 with a magnitude too " +
              "small for ns-since-epoch — the writer likely materialized " +
              "epoch-us/ms/s as untyped INT64; normalize it explicitly")
          ).isNull, F.lit(true)))
      case Some(TimestampType) =>
        df.withColumn(col, F.unix_micros(F.col(col)) * F.lit(1000L))
      case Some(TimestampNTZType) =>
        // NTZ → instant through the (UTC) session tz, then to epoch-µs
        df.withColumn(col,
          F.unix_micros(F.col(col).cast(TimestampType)) * F.lit(1000L))
      case Some(other) if lenient =>
        System.err.println(s"[graft] TsNorm: column '$col' has unhandled " +
          s"type $other — passing through UNNORMALIZED (expected INT64 " +
          "ns, TIMESTAMP, or TIMESTAMP_NTZ)")
        df
      case Some(other) => throw new IllegalArgumentException(
        s"cannot normalize column '$col' of type $other — expected INT64 " +
          "ns, TIMESTAMP, or TIMESTAMP_NTZ (a string or int32-millis ts " +
          "would flow downstream unnormalized and corrupt every ns-domain " +
          "computation; pass lenient = true to accept the column as-is)")
      case None => df
    }
}
