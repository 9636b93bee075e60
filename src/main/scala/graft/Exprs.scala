package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Expression vocabulary: the reference's aggregation + window op surface
  * (`lib/explorer/backend/lazy_series.ex:23-198`) expressed as Catalyst
  * `Column` constructors. Aggregations take an implicit [[Ctx]] so the same
  * spelling works in summarise position (plain aggregate → `groupBy.agg`) and
  * in grouped mutate/filter position (auto-windowed `over(partitionBy(groups))`,
  * matching the reference's `expr_over` injection, expressions.rs:1206-1209).
  *
  * Everything here is built from `org.apache.spark.sql.functions` (whole-stage
  * codegen'd) — no UDFs in the hot path.
  */
object exprs {

  // ======== aggregations (lazy_series.ex:182-198; series.ex:2400-3102) ======

  def sum(s: Series)(implicit c: Ctx): Series = c.agg(F.sum(s.col))
  def min(s: Series)(implicit c: Ctx): Series = c.agg(F.min(s.col))
  def max(s: Series)(implicit c: Ctx): Series = c.agg(F.max(s.col))
  def mean(s: Series)(implicit c: Ctx): Series = c.agg(F.avg(s.col))
  /** Exact median — `percentile`, not approx (SURVEY §7.3: oracle parity). */
  def median(s: Series)(implicit c: Ctx): Series = c.agg(F.median(s.col))
  def count(s: Series)(implicit c: Ctx): Series = c.agg(F.count(s.col))
  def size(implicit c: Ctx): Series = c.agg(F.count(F.lit(1)))
  def nilCount(s: Series)(implicit c: Ctx): Series =
    c.agg(F.count_if(s.col.isNull))
  def first(s: Series)(implicit c: Ctx): Series =
    c.agg(F.first(s.col, ignoreNulls = false))
  def last(s: Series)(implicit c: Ctx): Series =
    c.agg(F.last(s.col, ignoreNulls = false))
  def nDistinct(s: Series)(implicit c: Ctx): Series =
    c.agg(F.count_distinct(s.col))

  /** Approximate n_distinct (HyperLogLog++) — beyond-reference scale extra:
    * exact count_distinct shuffles every distinct value; the sketch is
    * fixed-size per group and merges map-side. The 100 TB default when the
    * count feeds a threshold, not an exact report. */
  def nDistinctApprox(s: Series, rsd: Double = 0.05)(implicit c: Ctx): Series =
    c.agg(F.approx_count_distinct(s.col, rsd))

  /** Approximate quantile (t-digest style percentile_approx) — the scale
    * alternative to the exact sort-based `quantile` (same accuracy knob as
    * Spark SQL's `percentile_approx`). */
  def quantileApprox(s: Series, q: Double, accuracy: Int = 10000)(
      implicit c: Ctx): Series =
    c.agg(F.percentile_approx(s.col, F.lit(q), F.lit(accuracy)))
  def all(s: Series)(implicit c: Ctx): Series = c.agg(F.bool_and(s.col))
  def any(s: Series)(implicit c: Ctx): Series = c.agg(F.bool_or(s.col))

  /** `all_equal/2` (series.ex): true iff the two series match positionally,
    * nil == nil (null-safe equality folded with bool_and). */
  def allEqual(a: Series, b: Series)(implicit c: Ctx): Series =
    c.agg(F.bool_and(a.col <=> b.col))

  /** Single modal value (reference returns the modal *set*, series.ex:2676;
    * Spark's `mode` picks one — see [[Gdf]]-level `frequencies` for the set). */
  def mode(s: Series)(implicit c: Ctx): Series = c.agg(F.mode(s.col))

  /** Product via sign/zero-aware log-sum composition — Spark has no product
    * aggregate (reference `product`, series.ex:2720). */
  def product(s: Series)(implicit c: Ctx): Series = {
    val x = s.col
    // compound of THREE aggregates — each routed through aggPart so the
    // grouped-mutate position windows all of them, not just the top node
    val hasZero = c.aggPart(F.bool_or(x === 0))
    val negs = c.aggPart(F.count_if(x < 0))
    val mag = F.exp(c.aggPart(
      F.sum(F.log(F.abs(F.nullif(x.cast(DoubleType), F.lit(0.0)))))))
    c.compound(F.when(hasZero, F.lit(0.0))
      .otherwise(F.when(negs % 2 === 1, -mag).otherwise(mag)))
  }

  /** `variance(ddof)` — ddof=1 (default) = var_samp, ddof=0 = var_pop
    * (reference series.ex:2854). */
  def variance(s: Series, ddof: Int = 1)(implicit c: Ctx): Series =
    c.agg(if (ddof == 1) F.var_samp(s.col) else F.var_pop(s.col))

  def standardDeviation(s: Series, ddof: Int = 1)(implicit c: Ctx): Series =
    c.agg(if (ddof == 1) F.stddev_samp(s.col) else F.stddev_pop(s.col))

  /** Exact interpolating quantile (`percentile`), not `percentile_approx` —
    * required for DuckDB-oracle parity (SURVEY §7.3). */
  def quantile(s: Series, q: Double)(implicit c: Ctx): Series =
    c.agg(F.percentile(s.col, F.lit(q)))

  /** Skewness. `bias = true` (reference default) = population g1 = Spark's
    * `skewness`; `bias = false` applies the G1 sample adjustment
    * (reference series.ex:2908-2915). */
  def skew(s: Series, bias: Boolean = true)(implicit c: Ctx): Series = {
    if (bias) c.agg(F.skewness(s.col))
    else {
      // two aggregates in one expression: per-aggregate windowing, see
      // [[Ctx.aggPart]]
      val g1 = c.aggPart(F.skewness(s.col))
      val n = c.aggPart(F.count(s.col)).cast(DoubleType)
      c.compound(g1 * F.sqrt(n * (n - 1)) / (n - 2))
    }
  }

  def correlation(a: Series, b: Series)(implicit c: Ctx): Series =
    c.agg(F.corr(a.col, b.col))

  def covariance(a: Series, b: Series, ddof: Int = 1)(implicit c: Ctx): Series =
    c.agg(if (ddof == 1) F.covar_samp(a.col, b.col)
          else F.covar_pop(a.col, b.col))

  /** `argmin`/`argmax` — position of the extreme (series.ex:2544-2605).
    * Needs a materialized row index (`Gdf.withRowIndex`). */
  def argmin(idx: Series, value: Series)(implicit c: Ctx): Series =
    c.agg(F.min_by(idx.col, value.col))
  def argmax(idx: Series, value: Series)(implicit c: Ctx): Series =
    c.agg(F.max_by(idx.col, value.col))

  // ======== positional / window ops (lazy_series.ex:92-118) =================
  // All row-order-based in the reference; here they window over the Gdf's
  // declared order (group-partitioned when grouped).

  /** `shift(s, n)` → lag (n>0) / lead (n<0) (reference expressions.rs:257). */
  def shift(s: Series, n: Int)(implicit c: Ctx): Series =
    Series(if (n >= 0) F.lag(s.col, n).over(c.orderedWin)
           else F.lead(s.col, -n).over(c.orderedWin))

  def cumulativeSum(s: Series, reverse: Boolean = false)(implicit c: Ctx): Series =
    cum(F.sum, s, reverse)
  def cumulativeMin(s: Series, reverse: Boolean = false)(implicit c: Ctx): Series =
    cum(F.min, s, reverse)
  def cumulativeMax(s: Series, reverse: Boolean = false)(implicit c: Ctx): Series =
    cum(F.max, s, reverse)
  def cumulativeCount(s: Series, reverse: Boolean = false)(implicit c: Ctx): Series =
    cum(F.count, s, reverse)
  /** Cumulative product via iterated multiply is not expressible as a Spark
    * aggregate; use the log-sum trick (null/zero/sign aware would need the
    * full [[exprs.product]] treatment — reference series.ex:3147-3326). */
  def cumulativeProduct(s: Series, reverse: Boolean = false)(implicit c: Ctx): Series = {
    val w = cumWin(reverse)
    val x = s.col.cast(DoubleType)
    val zeros = F.count_if(x === 0).over(w)
    val negs = F.count_if(x < 0).over(w)
    val mag = F.exp(F.sum(F.log(F.abs(F.nullif(x, F.lit(0.0))))).over(w))
    Series(F.when(zeros > 0, 0.0)
      .otherwise(F.when(negs % 2 === 1, -mag).otherwise(mag)))
  }

  private def cumWin(reverse: Boolean)(implicit c: Ctx) = {
    val base = if (reverse)
      c.part.orderBy(c.rowOrder.map(_.desc): _*)
    else c.orderedWin
    base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }
  private def cum(f: Column => Column, s: Series, reverse: Boolean)(
      implicit c: Ctx): Series =
    Series(f(s.col).over(cumWin(reverse)))

  /** Fixed-size trailing (or centered) rolling window
    * (reference series.ex:5093-5196; rolling_opts series.rs:731-830).
    * `minPeriods` nulls out under-filled windows. Weighted variants live
    * on their own entry points ([[windowSum]]/[[windowMean]]) — a
    * `weights` parameter here silently replaced ANY requested aggregate
    * with the weighted dot product (a weighted min/stddev has no such
    * formulation). */
  def rollingWindow(
      agg: Column => Column, s: Series, size: Int,
      minPeriods: Int = 1, center: Boolean = false)(implicit c: Ctx): Series = {
    val (lo, hi) = rollingBounds(size, center)
    val w = c.orderedWin.rowsBetween(lo, hi)
    val filled = F.count(s.col).over(w)
    Series(F.when(filled >= minPeriods, agg(s.col).over(w)))
  }

  private def rollingBounds(size: Int, center: Boolean): (Long, Long) =
    if (center) (-((size - 1) / 2).toLong, (size / 2).toLong)
    else (-(size - 1).toLong, 0L)

  /** Weighted window dot product, POSITION-aligned: every present value is
    * paired with its absolute row position and weighted by
    * `position - window_start` — one rule that covers all the partial
    * shapes at once (leading truncation at the partition head, TRAILING
    * truncation of a centered window at the tail, and interior nulls). A
    * trailing-slice alignment handles only the first of those: at a
    * centered tail it hands the present values the wrong end of the
    * weight vector, and an interior null (absent from a plain
    * collect_list) shifts every later neighbor onto its weight.
    * Returns (Σ xᵢ·wᵢ over non-null values, Σ wᵢ over non-null values) —
    * the second is the reference's weighted-mean denominator (series.ex
    * window_mean doctest: a partial first window divides by the USED
    * weights, not the full vector). */
  private def weightedDot(s: Series, size: Int, center: Boolean,
      weights: Seq[Double])(implicit c: Ctx): (Column, Column) = {
    require(weights.size == size,
      s"weights length ${weights.size} must equal window size $size")
    val (lo, hi) = rollingBounds(size, center)
    val w = c.orderedWin.rowsBetween(lo, hi)
    val pos = F.row_number().over(c.orderedWin)
    // struct(p, x) is never null, so the collected list holds EVERY frame
    // row (null x included) with its position
    val xs = F.collect_list(F.struct(pos.as("p"),
      s.col.cast(DoubleType).as("x"))).over(w)
    val ws = F.array(weights.map(F.lit): _*)
    val start = pos + F.lit(lo)
    def wAt(e: Column): Column = F.element_at(ws,
      (e.getField("p") - start + 1).cast(IntegerType))
    val dot = F.aggregate(xs, F.lit(0.0), (acc, e) =>
      acc + F.coalesce(e.getField("x") * wAt(e), F.lit(0.0)))
    val used = F.aggregate(xs, F.lit(0.0), (acc, e) =>
      acc + F.when(e.getField("x").isNotNull, wAt(e)).otherwise(F.lit(0.0)))
    (dot, used)
  }

  def windowSum(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false, weights: Seq[Double] = Nil)(implicit c: Ctx): Series =
    if (weights.isEmpty) rollingWindow(F.sum, s, size, minPeriods, center)
    else {
      val (lo, hi) = rollingBounds(size, center)
      val filled = F.count(s.col).over(c.orderedWin.rowsBetween(lo, hi))
      val (dot, _) = weightedDot(s, size, center, weights)
      // a window with NO present values is null like the unweighted path
      // (the fold's 0.0 seed would otherwise report 0.0), even at
      // minPeriods = 0
      Series(F.when(filled >= F.greatest(F.lit(minPeriods), F.lit(1)),
        dot))
    }
  def windowMean(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false, weights: Seq[Double] = Nil)(implicit c: Ctx): Series =
    if (weights.isEmpty) rollingWindow(F.avg, s, size, minPeriods, center)
    else {
      // weighted mean = Σx·w / Σw over the PRESENT values (reference
      // series.ex window_mean doctest: first partial window of
      // [1..10] × [0.25, 0.75] is 1.0 = 0.75/0.75, not 0.75/1.0)
      val (lo, hi) = rollingBounds(size, center)
      val filled = F.count(s.col).over(c.orderedWin.rowsBetween(lo, hi))
      val (dot, used) = weightedDot(s, size, center, weights)
      // zero weight sums take the IEEE route (0/0 → NaN, dot/0 → ±inf) —
      // the SAME division contract Series./ implements (Spark's legacy
      // Divide nulls every zero divisor, doubles included, so the raw
      // `dot / used` would silently null these windows instead). But a
      // window with NO present values is null like windowSum and the
      // unweighted avg path, even at minPeriods = 0 — the fold's 0.0/0.0
      // seeds are an artifact of the empty fold, not a zero weight sum
      Series(F.when(filled >= F.greatest(F.lit(minPeriods), F.lit(1)),
        (Series(dot) / Series(used)).col))
    }
  def windowMin(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false)(implicit c: Ctx): Series =
    rollingWindow(F.min, s, size, minPeriods, center)
  def windowMax(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false)(implicit c: Ctx): Series =
    rollingWindow(F.max, s, size, minPeriods, center)
  def windowMedian(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false)(implicit c: Ctx): Series =
    // median() rejects window frames in Spark; percentile(.5) is the same
    // exact-interpolating computation and is frame-capable
    rollingWindow(col => F.percentile(col, F.lit(0.5)), s, size,
      minPeriods, center)
  def windowStandardDeviation(s: Series, size: Int, minPeriods: Int = 1,
      center: Boolean = false)(implicit c: Ctx): Series =
    rollingWindow(F.stddev_samp, s, size, minPeriods, center)

  /** Expression-path `ewm_mean` (adjust=true): the direct weighted form
    * y_t = Σ (1-α)^(t-i) x_i / Σ (1-α)^(t-i) over an expanding window, as a
    * collect_list + higher-order fold. O(n²) work per group — the correctness
    * /small-group path; [[graft.Ewm]] is the O(n) scan used at scale. Kept
    * because the explicit left-fold makes results bit-comparable with other
    * engines evaluating the same formula. */
  def ewmMeanExpr(s: Series, alpha: Double)(implicit c: Ctx): Series = {
    val xs = F.collect_list(s.col.cast(DoubleType)).over(
      c.orderedWin.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val n = F.size(xs)
    def wsum(f: (Column, Column) => Column): Column =
      F.aggregate(F.zip_with(xs, F.sequence(F.lit(1), n), f),
        F.lit(0.0), (acc, v) => acc + v)
    val num = wsum((v, i) => v * F.pow(F.lit(1.0 - alpha), (n - i).cast(DoubleType)))
    val den = wsum((_, i) => F.pow(F.lit(1.0 - alpha), (n - i).cast(DoubleType)))
    Series(num / den)
  }

  /** Rank with Explorer's method set (reference series.ex:2063-2065):
    * average (default) / min / max / dense / ordinal / random (seeded
    * uniform tie-break — kept out of the oracle harness like all seeded
    * ops, since the tie order is engine-specific). */
  def rank(s: Series, method: String = "average", descending: Boolean = false,
      seed: Long = 42L)(implicit c: Ctx): Series = {
    val ord = if (descending) s.col.desc else s.col.asc
    val w = c.part.orderBy(ord)
    val minRank = F.rank().over(w)
    lazy val ties = F.count(F.lit(1)).over(
      Window.partitionBy(c.groups.map(F.col) :+ s.col: _*))
    method match {
      case "min" => Series(minRank)
      case "dense" => Series(F.dense_rank().over(w))
      case "ordinal" => Series(F.row_number().over(w))
      case "random" => Series(F.row_number().over(c.part.orderBy(ord, F.rand(seed))))
      case "max" => Series(minRank + ties - 1)
      case "average" =>
        Series((minRank.cast(DoubleType) + (ties - 1).cast(DoubleType) / 2.0))
      case other => throw new IllegalArgumentException(s"rank method $other")
    }
  }

  /** Local extrema (reference `peaks`, series.ex:3362-3368). */
  def peaks(s: Series, kind: String = "max")(implicit c: Ctx): Series = {
    val prev = F.lag(s.col, 1).over(c.orderedWin)
    val next = F.lead(s.col, 1).over(c.orderedWin)
    val cmpPrev = if (kind == "max") s.col > prev else s.col < prev
    val cmpNext = if (kind == "max") s.col > next else s.col < next
    Series(F.coalesce(cmpPrev, F.lit(true)) && F.coalesce(cmpNext, F.lit(true)))
  }

  /** Fill strategies (reference fill_missing_with_strategy,
    * expressions.rs:315-334). forward/backward need row order. */
  def fillMissingStrategy(s: Series, strategy: String)(implicit c: Ctx): Series =
    strategy match {
      case "forward" =>
        Series(F.coalesce(s.col, F.last(s.col, ignoreNulls = true).over(
          c.orderedWin.rowsBetween(Window.unboundedPreceding, -1))))
      case "backward" =>
        Series(F.coalesce(s.col, F.first(s.col, ignoreNulls = true).over(
          c.orderedWin.rowsBetween(1, Window.unboundedFollowing))))
      case "min" => Series(F.coalesce(s.col, F.min(s.col).over(c.part)))
      case "max" => Series(F.coalesce(s.col, F.max(s.col).over(c.part)))
      case "mean" => Series(F.coalesce(s.col, F.avg(s.col).over(c.part)))
      case "nan" => Series(F.coalesce(s.col, F.lit(Double.NaN)))
      case "infinity" =>
        Series(F.coalesce(s.col, F.lit(Double.PositiveInfinity)))
      case "neg_infinity" =>
        Series(F.coalesce(s.col, F.lit(Double.NegativeInfinity)))
      case other => throw new IllegalArgumentException(s"fill strategy $other")
    }

  /** if-then-else over series (the reference's `select/3` LazySeries op,
    * built by query `cond/if`, query.ex:452-466). */
  def iff(cond: Series, ifTrue: Series, ifFalse: Series): Series =
    Series(F.when(cond.col, ifTrue.col).otherwise(ifFalse.col),
      cond.isAgg || ifTrue.isAgg || ifFalse.isAgg)
}
