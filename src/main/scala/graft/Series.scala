package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-backed expression facade — graft's equivalent of the reference's
  * `Explorer.Series` in *expression* position (its LazySeries IR,
  * `lib/explorer/backend/lazy_series.ex:12-22`). We do not build our own IR:
  * Catalyst's `Column` tree IS the IR; this layer adds Explorer's operation
  * vocabulary, dtype-sensitive casts where Catalyst's coercion differs, and
  * the aggregation flag that the reference tracks per LazySeries node.
  *
  * Construction: `graft.gcol("name")` or implicitly from `Column`.
  */
final case class Series(col: Column, isAgg: Boolean = false) {
  private def lift(f: Column => Column): Series = Series(f(col), isAgg)
  private def zip(o: Series)(f: (Column, Column) => Column): Series =
    Series(f(col, o.col), isAgg || o.isAgg)

  // ---- comparison (reference expressions.rs:113-158) -----------------------
  def ===(o: Series): Series = zip(o)(_ === _)
  def =!=(o: Series): Series = zip(o)(_ =!= _)
  def >(o: Series): Series = zip(o)(_ > _)
  def >=(o: Series): Series = zip(o)(_ >= _)
  def <(o: Series): Series = zip(o)(_ < _)
  def <=(o: Series): Series = zip(o)(_ <= _)

  // ---- boolean (expressions.rs:161-183) ------------------------------------
  def &&(o: Series): Series = zip(o)(_ && _)
  def ||(o: Series): Series = zip(o)(_ || _)
  def unary_! : Series = lift(!_)
  /** Negation keeps the aggregate flag: without this, `-sum(x)` would
    * round-trip through the toColumn/fromColumn implicit pair and
    * resurface with isAgg = false, tripping summarise's must-aggregate
    * require on a perfectly valid aggregate. */
  def unary_- : Series = lift(c => -c)
  /** `binary_in` — membership against a literal collection. */
  def isIn(values: Seq[Any]): Series = lift(_.isInCollection(values))

  // ---- null / NaN tests (expressions.rs:185-218) ---------------------------
  def isNil: Series = lift(_.isNull)
  def isNotNil: Series = lift(_.isNotNull)
  /** nil propagates (reference is_nan(nil) = nil) — Spark's non-nullable
    * isnan reports false for nil, which would disagree with the adjacent
    * isInfinite/isFinite (both null-propagating comparisons). */
  def isNan: Series =
    lift(c => F.when(c.isNotNull, F.isnan(c)))
  def isInfinite: Series =
    lift(c => c === Double.PositiveInfinity || c === Double.NegativeInfinity)
  def isFinite: Series =
    lift(c => !F.isnan(c) && c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity)

  // ---- arithmetic (expressions.rs:336-407) ---------------------------------
  def +(o: Series): Series = zip(o)(_ + _)
  def -(o: Series): Series = zip(o)(_ - _)
  def *(o: Series): Series = zip(o)(_ * _)
  /** Explorer `divide` always yields float (`series.ex:3595`) with IEEE
    * zero-divisor semantics (x/0 → ±infinity, 0/0 → NaN) — Spark's own
    * Divide returns NULL there in legacy mode and ABORTS in ANSI mode,
    * neither of which is the reference's float division. (Signed-zero
    * divisors take the +0.0 branch — the one IEEE corner not preserved.) */
  def /(o: Series): Series = zip(o)((a, b) => {
    val ad = a.cast(DoubleType); val bd = b.cast(DoubleType)
    F.when(bd === 0.0 && ad.isNotNull,
      F.when(ad > 0, F.lit(Double.PositiveInfinity))
        .when(ad < 0, F.lit(Double.NegativeInfinity))
        .otherwise(F.lit(Double.NaN)))
      .otherwise(ad / bd)
  })
  def pow(o: Series): Series = zip(o)(F.pow)
  /** Integer division truncating toward zero, like Polars int division;
    * zero divisor → nil (reference series.ex:3903 "Returns nil if there is
    * a zero in the right-hand side"). Native IntegralDivide keeps the math
    * in longs — the old route through double division silently corrupted
    * |values| > 2^53 (1 ulp there is 2). */
  def quotient(o: Series): Series = zip(o)((a, b) =>
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a.cast(LongType)),
        org.apache.spark.sql.graftbridge.Bridge.expression(b.cast(LongType)),
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)))
  /** Remainder with dividend sign — Spark `%` matches Rust/Polars `%`. */
  def remainder(o: Series): Series = zip(o)(_ % _)

  // ---- math (expressions.rs:409-444) ---------------------------------------
  def abs: Series = lift(F.abs)
  def exp: Series = lift(F.exp)
  def ln: Series = lift(F.log)
  def log(base: Double): Series = lift(F.log(base, _))
  def floor: Series = lift(F.floor(_: Column))
  def ceil: Series = lift(F.ceil(_: Column))
  def round(decimals: Int): Series = lift(F.round(_, decimals))
  /** nil stays nil and NaN stays NaN (reference clip) — Spark's
    * least/greatest SKIP nulls (every null value would become the max
    * bound) and order NaN ABOVE every number (every NaN would clamp to
    * the max bound). The aggregate flag carries from the bounds too: an
    * aggregate bound (clip to a computed quantile) must keep summarise's
    * isAgg contract. */
  def clip(min: Series, max: Series): Series =
    Series(F.when(col.isNotNull,
      F.when(F.isnan(col.cast(DoubleType)), col)
        .otherwise(F.greatest(F.least(col, max.col), min.col))),
      isAgg || min.isAgg || max.isAgg)
  def sqrt: Series = lift(F.sqrt)
  /** -1/0/1 by sign (Polars `sign`); integer-typed like the reference. */
  def sign: Series = lift(F.signum(_).cast(LongType))
  def sin: Series = lift(F.sin); def cos: Series = lift(F.cos)
  def tan: Series = lift(F.tan); def asin: Series = lift(F.asin)
  def acos: Series = lift(F.acos); def atan: Series = lift(F.atan)
  def degrees: Series = lift(F.degrees)
  def radians: Series = lift(F.radians)

  // ---- null handling --------------------------------------------------------
  /** `fill_missing` with a value (reference `series.ex:5594-5628`). */
  def fillMissing(value: Any): Series = lift(c => F.coalesce(c, lit(value)))
  def coalesce(o: Series): Series = zip(o)(F.coalesce(_, _))

  // ---- casting ---------------------------------------------------------------
  def cast(to: DType): Series = lift(_.cast(to.spark))
  def cast(to: DataType): Series = lift(_.cast(to))

  // ---- naming ----------------------------------------------------------------
  def as(name: String): Series = lift(_.as(name))
}

object Series {
  import scala.language.implicitConversions
  implicit def fromColumn(c: Column): Series = Series(c)
  implicit def toColumn(s: Series): Column = s.col
  implicit def fromLiteral(v: Int): Series = Series(lit(v))
  implicit def fromLiteralL(v: Long): Series = Series(lit(v))
  implicit def fromLiteralD(v: Double): Series = Series(lit(v))
  implicit def fromLiteralS(v: String): Series = Series(lit(v))
  implicit def fromLiteralB(v: Boolean): Series = Series(lit(v))
}
