package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** Query context passed to the expression callbacks of `filter` / `mutate` /
  * `summarise` / `sortBy`. Mirrors the reference's QueryFrame + the grouped
  * translation rules:
  *
  *  - the reference injects `expr.over(groups)` for aggregations appearing in
  *    grouped mutate/filter (`lib/explorer/polars_backend/lazy_frame.ex:437-523`,
  *    `native/explorer/src/expressions.rs:1206-1209`) — here [[agg]] does the
  *    same with `Window.partitionBy(groups)`;
  *  - in summarise position, aggregations stay raw `AggregateExpression`s and
  *    the verb routes them into `groupBy(...).agg(...)` (`lazyframe.rs:251-275`);
  *  - positional ops (shift/cumulative/rolling/rank/row_index) are row-order
  *    based in the reference (`lib/explorer/series.ex:5093-5464`); Spark has no
  *    physical row order, so they window over [[rowOrder]] — the Gdf's declared
  *    ordering (see [[Gdf.ordered]]).
  */
final case class Ctx(
    groups: Seq[String],
    rowOrder: Seq[Column],
    windowed: Boolean,
    private[graft] val frame: Option[DataFrame] = None) {

  /** Group-partitioned window (whole frame when ungrouped). */
  def part: WindowSpec = Window.partitionBy(groups.map(F.col): _*)

  /** Group-partitioned window ordered by the frame's declared row order. */
  def orderedWin: WindowSpec = {
    require(rowOrder.nonEmpty,
      "positional op needs a row order: call .ordered(cols*) first")
    part.orderBy(rowOrder: _*)
  }

  /** An UNGROUPED aggregate in mutate/filter position: a whole-frame
    * window would be `Exchange SinglePartition` — every row funneled
    * through one task, the plan shape this file bans for row ids — so it
    * runs as a broadcast scalar subquery over the frame instead (the
    * sampleN pattern: one parallel aggregation, no shuffle of the rows).
    * Falls back to the window form when no frame reference is available
    * (hand-built Ctx). */
  private def ungroupedAgg(c: Column): Column =
    frame match {
      case Some(df) => org.apache.spark.sql.graftbridge.Bridge
        .scalarSubquery(df.select(c))
      case None => c.over(part)
    }

  /** Route an aggregate: windowed-over-groups in mutate/filter position,
    * plain aggregation (flagged) in summarise position. */
  private[graft] def agg(c: Column): Series =
    if (!windowed) Series(c, isAgg = true)
    else if (groups.nonEmpty) Series(c.over(part))
    else Series(ungroupedAgg(c))

  /** Per-aggregate routing for COMPOUND aggregations (several aggregate
    * functions combined in one expression, e.g. product's
    * zero/sign/magnitude split): in windowed position EACH aggregate must
    * carry its own OVER — one `.over` on the compound windows only the top
    * node, leaves the inner aggregates raw, and the analyzer rejects the
    * plan with MISSING_GROUP_BY. Wrap every aggregate with [[aggPart]],
    * then the combined expression with [[compound]]. */
  private[graft] def aggPart(c: Column): Column =
    if (!windowed) c
    else if (groups.nonEmpty) c.over(part)
    // ungrouped: leave the aggregate RAW — [[compound]] wraps the whole
    // combined expression in ONE scalar subquery (one aggregation pass),
    // where per-piece subqueries would scan the frame once per aggregate
    else c

  /** See [[aggPart]]. */
  private[graft] def compound(c: Column): Series =
    if (!windowed) Series(c, isAgg = true)
    else if (groups.nonEmpty) Series(c)
    else Series(ungroupedAgg(c))
}

/** The dataframe facade — graft's equivalent of `Explorer.DataFrame`
  * (`lib/explorer/data_frame.ex:30-90`): a Spark DataFrame plus the two pieces
  * of metadata Explorer keeps outside the data — the active `groups`
  * (`data_frame.ex:5952-6055`; groups are metadata, not a different type) and,
  * because Spark rows are unordered, an explicit logical `rowOrder` that
  * positional verbs (slice/shift/cumulative/rolling) window over.
  *
  * All verbs stay lazy Spark plans (Catalyst optimizes the whole pipeline);
  * `collect`-style materialization is just a Spark action, mirroring how the
  * reference's eager backend funnels through its lazy engine
  * (`lib/explorer/polars_backend/data_frame.ex:686-699`).
  */
final class Gdf(
    val sdf: DataFrame,
    val groups: Seq[String] = Nil,
    val rowOrder: Seq[Column] = Nil,
    val logical: Map[String, DType] = Map.empty,
    val stableGroups: Boolean = false) {

  def spark: SparkSession = sdf.sparkSession
  def names: Seq[String] = sdf.schema.fieldNames.toSeq

  /** Per-column logical dtypes: the physical reverse-map overlaid with the
    * facade's [[logical]] annotations — this is how `u32`, `:category` and
    * `:time` survive even though Spark has no such physical types (the
    * reference tracks dtype per series the same way, lazy_series.ex:12-22).
    * Annotations for columns that no longer exist are ignored. */
  def dtypes: Map[String, DType] =
    sdf.schema.fields.map { f =>
      f.name -> logical.getOrElse(f.name, DType.fromSpark(f.dataType))
    }.toMap
  def schema: StructType = sdf.schema

  /** Annotate columns with logical dtypes (u8/16/32/64, :category, :time,
    * ns-precision datetimes). The physical Spark type must be the dtype's
    * backing type — annotation never changes data. */
  def withLogical(pairs: (String, DType)*): Gdf = {
    pairs.foreach { case (n, d) =>
      val phys = sdf.schema(n).dataType
      require(phys == d.spark,
        s"column $n is physically $phys; logical $d needs ${d.spark}")
    }
    copy(logical = logical ++ pairs)
  }

  /** Cast a column to a logical dtype: physical cast to the backing type
    * plus the annotation (reference `Series.cast`, series.ex:1327 for
    * :category and the u* family). */
  def castLogical(name: String, d: DType): Gdf =
    copy(sdf.withColumn(name, sdf(name).cast(d.spark)),
      logical = logical + (name -> d))

  private def copy(
      sdf: DataFrame = sdf,
      groups: Seq[String] = groups,
      rowOrder: Seq[Column] = rowOrder,
      logical: Map[String, DType] = logical,
      stableGroups: Boolean = stableGroups): Gdf =
    new Gdf(sdf, groups, rowOrder, logical, stableGroups)

  private def ctx(windowed: Boolean) =
    Ctx(groups, rowOrder, windowed, Some(sdf))

  // ======== projection / selection (reference data_frame.ex:2458-2522) ======

  /** Grouped rule (reference data_frame.ex:2483-2487): group columns are
    * always kept — `select` appends any group column missing from the
    * selection, `discard` refuses to drop a group column (ungroup first,
    * exactly like the reference). */
  def select(cols: String*): Gdf =
    copy(sdf.select((cols ++ groups.filterNot(cols.contains)).map(sdf(_)): _*))

  /** Selector variant: keep columns whose name matches `re`. */
  def selectRe(re: String): Gdf = select(names.filter(_.matches(re)): _*)

  /** Selector variant: keep columns whose dtype satisfies `p`. */
  def selectWhere(p: DType => Boolean): Gdf = {
    val ds = dtypes; select(names.filter(n => p(ds(n))): _*)
  }

  def discard(cols: String*): Gdf =
    copy(sdf.drop(cols.filterNot(groups.contains): _*))

  /** `rename/2` (reference data_frame.ex:3915-4041). Renaming a group
    * column renames the group metadata with it. */
  def rename(pairs: (String, String)*): Gdf = {
    val m = pairs.toMap
    // rowOrder follows the rename too: its Columns hold UNRESOLVED
    // attribute names, and a stale one would fail resolution on the next
    // positional verb (head/slice/shift/...) against the renamed frame.
    // The rewrite goes through mapSortChild so a direction-bearing key
    // (.desc / withNils) keeps its ColumnNode SortOrder wrapper — a full
    // catalyst round trip produced the smuggled-SortOrder shape that
    // Dataset.sort double-wraps and codegen-crashes on
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val reOrdered = rowOrder.map(c => bridge.mapSortChild(c, e =>
      e.transform {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if m.contains(a.name) =>
          org.apache.spark.sql.catalyst.analysis
            .UnresolvedAttribute.quoted(m(a.name))
      }))
    copy(sdf.withColumnsRenamed(m),
      groups = groups.map(g => m.getOrElse(g, g)),
      rowOrder = reOrdered,
      logical = logical.map { case (k, v) => m.getOrElse(k, k) -> v })
  }

  def renameWith(f: String => String): Gdf =
    rename(names.map(n => n -> f(n)): _*)

  /** `relocate/3` (reference data_frame.ex:3821-3826). */
  def relocate(cols: Seq[String], before: Option[String] = None,
      after: Option[String] = None): Gdf = {
    val rest = names.filterNot(cols.contains)
    // a missing (or relocated-away) anchor would indexOf to -1 and
    // silently place the columns at the FRONT instead of erroring
    (before.toSeq ++ after.toSeq).foreach(a => require(rest.contains(a),
      s"relocate anchor '$a' is not a remaining column " +
        s"(existing, and not itself being relocated)"))
    val at = before.map(rest.indexOf).orElse(after.map(rest.indexOf(_) + 1))
      .getOrElse(0)
    val (pre, post) = rest.splitAt(at)
    select(pre ++ cols ++ post: _*)
  }

  /** `pull/2` — one column as an expression-position Series. */
  def pull(name: String): Series = Series(sdf(name))

  /** Access `pop/2` (reference data_frame.ex:419-429): detach columns —
    * (the popped columns as their own frame, the frame without them). */
  def pop(cols: String*): (Gdf, Gdf) = (select(cols: _*), discard(cols: _*))

  // ======== row order ========================================================

  /** Declare the logical row order used by positional verbs. Spark has no
    * physical row order (SURVEY §7.1 "row order is a first-class problem"),
    * so the order is explicit here rather than implicit like the reference. */
  def ordered(cols: Column*): Gdf = copy(rowOrder = cols)

  /** `reverse/1` (reference series.ex reverse): flip the declared row order
    * end-for-end — direction AND null placement of every order key invert,
    * so positional verbs (head/slice/at_every/row_index) read the frame
    * backwards. Pure metadata: no job, no shuffle until an order-consuming
    * verb runs. */
  def reverse: Gdf = {
    require(rowOrder.nonEmpty, "reverse needs a declared row order (.ordered)")
    copy(rowOrder = rowOrder.map(
      org.apache.spark.sql.graftbridge.Bridge.flipSortOrder))
  }

  /** 0-based row index over the declared order as a LongType column.
    * Grouped → per-group index via a hash-partitioned window (parallel).
    * Ungrouped → the distributed [[plans.RowId]] backbone: a global window
    * here would funnel everything through one task (`Exchange
    * SinglePartition`), which does not survive scale. */
  private def withIdxCol(name: String): DataFrame = {
    require(rowOrder.nonEmpty,
      "positional op needs a row order: call .ordered(cols*) first")
    if (groups.isEmpty) plans.RowId.attach(sdf, rowOrder, name)
    else sdf.withColumn(name,
      (F.row_number().over(ctx(true).orderedWin) - 1).cast(LongType))
  }

  /** Materialize a 0-based row-index column over the declared order
    * (reference `row_index`, series.ex:3102). Group-aware. */
  def withRowIndex(name: String = "row_index"): Gdf =
    copy(withIdxCol(name))

  // ======== row picking ======================================================

  /** First n rows. With a declared order this is sort+limit —
    * `TakeOrderedAndProject`, a per-partition partial top-k, no global
    * sort; with no order it is Spark's limit (frame order, like the
    * reference's physical order). */
  def head(n: Int = 5): Gdf =
    if (groups.nonEmpty) sliceGrouped(0, n)
    else if (rowOrder.nonEmpty) copy(sdf.sort(rowOrder: _*).limit(n))
    else copy(sdf.limit(n))

  /** Last n rows = head(n) of the flipped order (same
    * `TakeOrderedAndProject` shape — a global descending window here would
    * funnel the frame through one task). Grouped → per-group window. */
  def tail(n: Int = 5): Gdf = {
    import org.apache.spark.sql.graftbridge.Bridge
    if (groups.isEmpty) {
      require(rowOrder.nonEmpty,
        "ungrouped tail needs a row order: call .ordered(cols*) first")
      copy(sdf.sort(rowOrder.map(Bridge.flipSortOrder): _*).limit(n))
    } else {
      require(rowOrder.nonEmpty, // the standard message, not an obscure
        "positional op needs a row order: call .ordered(cols*) first")
      val c = ctx(true)
      val w = c.part.orderBy(rowOrder.map(Bridge.flipSortOrder): _*)
      copy(sdf.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n).drop("__rn"))
    }
  }

  /** `slice/3` (offset, len) over the declared order; group-aware like the
    * reference (`lazyframe.rs:142-160`). Negative offset counts from end.
    * Ungrouped slices run on the distributed row index; a negative offset
    * additionally broadcast-joins the total count (a 2-stage scalar agg)
    * instead of a whole-frame count window. */
  def slice(offset: Int, len: Int): Gdf =
    if (groups.nonEmpty) {
      if (offset >= 0) sliceGrouped(offset, len)
      else {
        val c = ctx(true)
        val cnt = F.count(F.lit(1)).over(c.part)
        val rn = F.row_number().over(c.orderedWin) - 1
        copy(sdf.withColumn("__rn", rn).withColumn("__cnt", cnt)
          .filter(F.col("__rn") >= F.col("__cnt") + offset &&
                  F.col("__rn") < F.col("__cnt") + offset + len)
          .drop("__rn", "__cnt"))
      }
    } else if (offset >= 0)
      copy(withIdxCol("__rn")
        .filter(F.col("__rn") >= offset && F.col("__rn") < offset.toLong + len)
        .drop("__rn"))
    else {
      val total = F.broadcast(sdf.agg(F.count(F.lit(1)).as("__cnt")))
      copy(withIdxCol("__rn").crossJoin(total)
        .filter(F.col("__rn") >= F.col("__cnt") + offset &&
                F.col("__rn") < F.col("__cnt") + offset + len)
        .drop("__rn", "__cnt"))
    }

  private def sliceGrouped(offset: Int, len: Int): Gdf = {
    val c = ctx(true)
    // keep the raw 1-based row_number and a `<=` bound: that exact shape
    // triggers Spark's WindowGroupLimit rewrite (partial top-k per group
    // BEFORE the shuffle) — filtering on row_number()-1 arithmetic doesn't
    val rn = F.row_number().over(c.orderedWin)
    // offset.toLong + len: Int arithmetic overflows for the "rest from
    // position k" idiom (slice(1, Int.MaxValue)) and silently returns an
    // empty frame — same fix the ungrouped path carries
    copy(sdf.withColumn("__rn", rn)
      .filter(F.col("__rn") > offset &&
        F.col("__rn") <= F.lit(offset.toLong + len))
      .drop("__rn"))
  }

  /** `slice/2` by explicit row indices (positional, needs order). */
  def sliceIndices(indices: Seq[Long]): Gdf =
    copy(withIdxCol("__rn")
      .filter(F.col("__rn").isInCollection(indices)).drop("__rn"))

  /** `mask/2` — boolean row filter (reference data_frame.ex:2573-2589; the
    * reference takes a positionally-aligned series, which in Spark semantics
    * is a boolean column of this frame). */
  def mask(pred: Column): Gdf = filterCol(pred)

  /** `at/2` — positional element access over the declared order
    * (reference series.ex:2202): the single row at 0-based index `i`. */
  def at(i: Int): Gdf = slice(i, 1)

  /** `at_every/2` — every `k`-th row over the declared order
    * (reference series.ex:1695). */
  def atEvery(k: Int): Gdf = {
    // k = 0: % 0 is null under legacy semantics — a silently EMPTY result
    require(k > 0, s"at_every needs a positive stride, got $k")
    copy(withIdxCol("__rn")
      .filter(F.col("__rn") % k === 0).drop("__rn"))
  }

  /** `index_of/2` — 0-based index of the first row where `col == value`
    * over the declared order (reference series.ex:7023). Series-level:
    * the index is GLOBAL over the declared order even on a grouped frame
    * (withIdxCol's per-group indices would report a group-relative
    * position as if it were the documented global one). */
  def indexOf(colName: String, value: Any): DataFrame = {
    require(rowOrder.nonEmpty,
      "positional op needs a row order: call .ordered(cols*) first")
    plans.RowId.attach(sdf, rowOrder, "__rn")
      .filter(F.col(colName) === F.lit(value))
      .agg(F.min("__rn").as("index"))
  }

  /** `sample/2` (reference data_frame.ex:4475-4527). Ungrouped
    * fraction-based maps to Spark's distributed Bernoulli sampler; grouped
    * takes the reference's exact `floor(frac · group size)` rows per group
    * (iris grouped 0.1 → exactly 5 of each 50 in the doctest) via a
    * seeded per-group random rank. `replace = true` stays on the global
    * Bernoulli sampler (per-group with-replacement has no distributed
    * one-pass analogue; the reference's seeded draws are engine-specific
    * either way). Exact-n uses a seeded random sort (fine at any scale —
    * TakeOrdered is a partial sort). */
  def sampleFrac(frac: Double, seed: Long = 42L,
      replace: Boolean = false): Gdf = {
    // negative fractions: the grouped path's floor(gn * frac) filter would
    // silently return an empty frame where the ungrouped Spark sampler
    // raises — one consistent loud contract
    require(frac >= 0.0, s"sample fraction must be non-negative, got $frac")
    require(frac <= 1.0 || replace,
      s"cannot take a larger sample than the total population without " +
        s"replacement (frac=$frac)")
    if (groups.isEmpty || replace) copy(sdf.sample(replace, frac, seed))
    else {
      val w = Window.partitionBy(groups.map(F.col): _*).orderBy(F.rand(seed))
      val cw = Window.partitionBy(groups.map(F.col): _*)
      // round at 1e-9 before flooring: `gn * frac` in doubles can land
      // just below the exact integer for fractions without a binary
      // representation (e.g. 50 * 0.1 = 4.999...), which would keep one
      // row fewer than the reference's floor(frac·n) (r6 ADVICE #5)
      copy(sdf.withColumn("__rn", F.row_number().over(w))
        .withColumn("__gn", F.count(F.lit(1)).over(cw))
        .filter(F.col("__rn") <=
          F.floor(F.round(F.col("__gn") * frac, 9)))
        .drop("__rn", "__gn"))
    }
  }

  /** Exact-n sample, per group when grouped. Without replacement an
    * oversized request RAISES ("cannot take a larger sample than the
    * total population" — the reference contract) via an `assert_true`
    * folded into the plan: a scalar-subquery count (ungrouped) or a
    * per-group count window (grouped) — no driver-side action. The size
    * check inherently reads every group's full size, so the grouped path
    * gives up the WindowGroupLimit pruning the unchecked shape had — the
    * price of raising, which the reference also pays.
    *
    * With replacement: n seeded uniform draws per (group ×) frame —
    * `range(n)` (or group keys × sequence) picks random positional
    * indices joined back on the per-group row index; duplicate picks
    * duplicate rows, which is the point. Needs the declared row order
    * (like every positional verb) to make the index well-defined. */
  def sampleN(n: Int, seed: Long = 42L, replace: Boolean = false): Gdf = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    // n = 0 draws nothing and can never be oversized — and the grouped
    // with-replacement path's sequence(1, 0) would infer a DESCENDING
    // step and yield [1, 0]: two draw rows per group instead of zero
    if (n == 0) return copy(sdf.filter(F.lit(false)))
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    def oversize(cnt: Column): Column =
      F.when(F.assert_true(F.lit(n.toLong) <= cnt,
        F.lit(s"cannot take a larger sample than the total population " +
          s"without replacement (n=$n)")).isNull, F.lit(true))
    if (!replace) {
      if (groups.isEmpty) {
        // The oversize check needs TWO redundant carriers because Catalyst
        // prunes either one alone (r6 ADVICE #1, r7 verdict nit, r8 ADVICE
        // medium):
        // 1. MAIN LEG: the assert lives INSIDE a scalar subquery (the
        //    aggregate always yields one row, so it fires even when the
        //    frame is EMPTY at runtime) referenced by a filter on the main
        //    frame. A downstream user filter pushed into this leg merely
        //    ANDs with the subquery reference — it cannot fold the check
        //    away. But PropagateEmptyRelation deletes the whole leg (and
        //    the subquery with it) when the frame is STATICALLY empty.
        // 2. SENTINEL LEG on range(1) — never statically empty, so its
        //    assert survives an empty main frame. Its payload columns are
        //    `get(array(null), id)` — null AT RUNTIME but structurally
        //    UNFOLDABLE (the index is the live `id` attribute). Payloads
        //    that fold to a null literal are fatal (r8 ADVICE medium): a
        //    pushed-down user filter constant-folds on them to null,
        //    ReplaceNullWithFalseInPredicate rewrites that to false,
        //    BooleanSimplification folds `assertCond AND false` to false
        //    (raise_error is deterministic, so it is NOT protected), and
        //    PruneFilters deletes the leg together with the assert. Null
        //    literals behind CASE WHEN fold the same way (even attribute
        //    conditions — all-null branches collapse), and rand() guards
        //    fold via OptimizeRand. With the unfoldable payload the pushed
        //    conjunct survives, and CombineFilters keeps the assert FIRST
        //    in the merged conjunction (inner condition precedes pushed),
        //    so the assert evaluates before any short-circuit. At runtime
        //    a passing assert yields null → isNotNull = false → the leg
        //    emits nothing.
        // Note: the union widens nullability — every output column is
        // nullable even if the input column was not (the sentinel's null
        // literals force it). Zero rows ever carry those nulls; only the
        // declared schema widens. The reference has no nullability notion,
        // so nothing user-visible depends on it.
        // Grouped frames need no guard: an empty frame has no groups, and
        // every existing group evaluates its window-count assert.
        val msg = s"cannot take a larger sample than the total " +
          s"population without replacement (n=$n)"
        val assertQ = bridge.scalarSubquery(sdf.select(
          F.assert_true(F.lit(n.toLong) <= F.count(F.lit(1)), F.lit(msg))))
        val main = sdf.orderBy(F.rand(seed)).limit(n).filter(assertQ.isNull)
        // the sentinel references the SAME assert-carrying subquery (a
        // passing assert is null → isNotNull = false → the leg emits
        // nothing; a failing one raises inside the subquery), so
        // ReuseSubquery collapses both legs onto ONE count aggregation —
        // a second plain-count subquery would be a redundant full scan.
        // On a STATICALLY empty frame the main leg is pruned, the inner
        // aggregate folds to count = 0, and the If(false, …) collapses to
        // the bare raise_error — still a runtime expression, so the
        // sentinel's reference fires it.
        val sentinel = spark.range(1)
          .filter(assertQ.isNotNull)
          .select(sdf.schema.map(f =>
            F.get(F.array(F.lit(null).cast(f.dataType)),
              F.col("id").cast(IntegerType)).as(f.name)): _*)
        copy(main.unionAll(sentinel))
      } else {
        val part = Window.partitionBy(groups.map(F.col): _*)
        val w = part.orderBy(F.rand(seed))
        copy(sdf
          .withColumn("__rn", F.row_number().over(w))
          .withColumn("__ok", oversize(F.count(F.lit(1)).over(part)))
          .filter(F.col("__ok") && F.col("__rn") <= n)
          .drop("__rn", "__ok"))
      }
    } else if (groups.isEmpty) {
      // drawing n > 0 from an EMPTY population is as impossible with
      // replacement as without: the assert rides the draws table (range(n)
      // is never statically empty, so it always evaluates) instead of the
      // join silently matching nothing
      val cnt = bridge.scalarSubquery(sdf.select(F.count(F.lit(1))))
      val draws = spark.range(n.toLong)
        .filter(F.when(F.assert_true(cnt > 0L, F.lit(
          s"cannot sample with replacement from an empty population " +
            s"(n=$n)")).isNull, F.lit(true)))
        .select(F.floor(F.rand(seed) * cnt).cast(LongType).as("__pick"))
      copy(withIdxCol("__idx")
        .join(draws, F.col("__idx") === F.col("__pick"))
        .drop("__idx", "__pick"))
    } else {
      // draw keys renamed: the draws table derives from this frame, and a
      // same-lineage equi-join on identically-named columns resolves
      // ambiguously (the classic Spark self-join trap)
      val counts = sdf.groupBy(groups.map(F.col): _*)
        .agg(F.count(F.lit(1)).as("__gcnt"))
      val draws = counts
        .select(groups.map(F.col) :+
          F.explode(F.sequence(F.lit(1), F.lit(n))).as("__j") :+
          F.col("__gcnt"): _*)
        .select(groups.map(g => F.col(g).as(s"__dk_$g")) :+
          F.floor(F.rand(seed) * F.col("__gcnt")).cast(LongType)
            .as("__pick"): _*)
      copy(withIdxCol("__idx")
        .join(draws, groups.map(g => F.col(g) === F.col(s"__dk_$g"))
          .reduce(_ && _) && F.col("__idx") === F.col("__pick"))
        .select(names.map(F.col): _*))
    }
  }

  def shuffle(seed: Long = 42L): Gdf = copy(sdf.orderBy(F.rand(seed)))

  /** `argsort` (reference series.ex:4823, sort opts shared.ex:583-584):
    * positions of rows in key order. `stable` (reference default false)
    * tie-breaks equal keys by original position; nils sort last like the
    * reference's default. Series-level: positions are GLOBAL over the
    * declared order even on a grouped frame (per-group indices would
    * emit one 0 per group — not a permutation). */
  def argsort(key: Column, descending: Boolean = false,
      stable: Boolean = false): DataFrame = {
    require(rowOrder.nonEmpty,
      "positional op needs a row order: call .ordered(cols*) first")
    val k = Gdf.withNils(if (descending) key.desc else key.asc, nilsLast = true)
    val order = if (stable) Seq(k, F.col("__orig").asc) else Seq(k)
    plans.RowId.attach(sdf, rowOrder, "__orig")
      .orderBy(order: _*)
      .select(F.col("__orig").as("index"))
  }

  /** `drop_nil/2` (reference data_frame.ex:3751-3757). */
  def dropNil(cols: String*): Gdf =
    copy(if (cols.isEmpty) sdf.na.drop() else sdf.na.drop(cols))

  // ======== filter / mutate (reference data_frame.ex:2674-2760, §3.1) =======

  /** Filter. Grouped aggregate predicates arrive as window expressions
    * (see [[Ctx.agg]]) which Spark forbids directly in WHERE — so the
    * predicate is materialized as a temp column first (Catalyst collapses
    * the projection for plain predicates, so this costs nothing). */
  def filter(f: Ctx => Series): Gdf = {
    val pred = f(ctx(true)).col
    copy(sdf.withColumn("__pred", pred)
      .filter(F.col("__pred")).drop("__pred"))
  }

  def filterCol(c: Column): Gdf = copy(sdf.filter(c))

  /** Sequential column additions — later pairs may reference earlier ones,
    * like the reference's mutate. Grouped aggregations broadcast via
    * window (see [[Ctx.agg]]). */
  def mutate(pairs: (String, Ctx => Series)*): Gdf = {
    val c = ctx(true)
    copy(pairs.foldLeft(sdf) { case (d, (n, f)) => d.withColumn(n, f(c).col) },
      logical = logical -- pairs.map(_._1)) // recomputed → physical truth
  }

  def mutateCol(name: String, col: Column): Gdf =
    copy(sdf.withColumn(name, col), logical = logical - name)

  /** Single-callback mutate: `df.mutateWith { implicit c => Seq(...) }`. */
  def mutateWith(f: Ctx => Seq[(String, Series)]): Gdf = {
    val c = ctx(true)
    val pairs = f(c)
    copy(pairs.foldLeft(sdf) { case (d, (n, s)) => d.withColumn(n, s.col) },
      logical = logical -- pairs.map(_._1))
  }

  // ======== sorting (reference data_frame.ex:3468-3617) =====================

  /** Multi-key sort. Spark's sort is not stable; `stable = true` emulates the
    * reference's `maintain_order` by tie-breaking on the declared row order.
    *
    * `nilsLast` is Explorer's frame-level `nils: :first/:last` option
    * (data_frame.ex:3468-3617, series.ex:4779) and defaults to `:last` in
    * BOTH directions like the reference — the opposite of Spark's ascending
    * default (nulls first), so every key's null ordering is rewritten
    * explicitly. */
  def sortBy(keys: Seq[Column], stable: Boolean = false,
      nilsLast: Boolean = true): Gdf = {
    val tiebreak = if (stable) rowOrder else Nil
    val full = (keys ++ tiebreak).map(Gdf.withNils(_, nilsLast))
    val sorted =
      if (groups.isEmpty) sdf.orderBy(full: _*)
      // grouped sort = sort within group blocks (lazyframe.rs:202-218)
      else sdf.orderBy(groups.map(g => Gdf.withNils(F.col(g), nilsLast)) ++ full: _*)
    new Gdf(sorted, groups, full, logical, stableGroups)
  }

  // ======== distinct (reference data_frame.ex:3685-3687) ====================

  /** Distinct on a subset. `keepAll = true` keeps the other columns, taking
    * the first row per key in the declared order (Polars keep=First under
    * maintain-order, `lazyframe.rs:220-233`). Grouped rule (reference
    * data_frame.ex distinct doc): the group columns are ADDED to the
    * distinct subset and the groups are kept on the result. */
  def distinct(subset: Seq[String] = Nil, keepAll: Boolean = false): Gdf = {
    val keys = {
      val base = if (subset.isEmpty) names else subset
      (groups.filterNot(base.contains) ++ base).toSeq
    }
    if (!keepAll) copy(sdf.select(keys.map(sdf(_)): _*).dropDuplicates())
    else if (rowOrder.isEmpty) copy(sdf.dropDuplicates(keys))
    else {
      val w = Window.partitionBy(keys.map(F.col): _*).orderBy(rowOrder: _*)
      copy(sdf.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") === 1).drop("__rn"))
    }
  }

  // ======== grouping (reference data_frame.ex:5952-6053) ====================

  def groupBy(cols: String*): Gdf = copy(groups = groups ++ cols)

  /** `group_by(..., stable: true)` (reference v0.11.1,
    * data_frame.ex:5880-5882 `stable?`; lazyframe.rs:18-33
    * `group_by_opt_order` → Polars `group_by_stable`): summarise output
    * returns groups in FIRST-OCCURRENCE order of the frame's declared row
    * order, where the default grouping leaves group order
    * engine-arbitrary. Costs one extra sort of the (small) aggregated
    * output — the aggregation itself is unchanged. */
  def groupByStable(cols: String*): Gdf =
    copy(groups = groups ++ cols, stableGroups = true)

  def ungroup(cols: String*): Gdf = {
    val g = if (cols.isEmpty) Nil else groups.filterNot(cols.contains)
    copy(groups = g, stableGroups = stableGroups && g.nonEmpty)
  }

  /** Shared summarise back end. Aggregations OVER window functions
    * (reference `summarise(max: max(window_mean(x, 2)))` — legal there,
    * illegal inside Spark's `groupBy.agg`) are supported by
    * auto-materialization: every `WindowExpression` found under an
    * aggregate is projected as a hidden column first and the aggregate is
    * rewritten to consume it — one extra window pass over the grouped
    * frame, which is what the reference's engine does internally too. */
  private def summariseCols(cols: Seq[(String, Series)]): Gdf = {
    require(cols.nonEmpty,
      "summarise needs at least one aggregation") // not a bare .head crash
    cols.foreach { case (n, s) =>
      require(s.isAgg, s"summarise expression '$n' must aggregate")
    }
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    var extra = Vector.empty[(String, Column)]
    val rewritten = cols.map { case (n, s) =>
      val (c, wins) = bridge.extractWindows(s.col, s"__win_${extra.size}_")
      extra ++= wins
      c.as(n)
    }
    val src =
      if (extra.isEmpty) sdf
      else sdf.select(F.col("*") +: extra.map { case (n, c) => c.as(n) }: _*)
    val out =
      if (groups.isEmpty) src.agg(rewritten.head, rewritten.tail: _*)
      else if (stableGroups) {
        // stable groups (groupByStable): output in first-occurrence order
        // = sort the AGGREGATED rows by min(row index) per group — one
        // distributed rowid pass plus a sort of the already-small
        // aggregate output, not a sort of the input
        require(rowOrder.nonEmpty,
          "group_by(stable: true) needs a declared row order (.ordered) — " +
            "first-occurrence order is undefined over unordered Spark rows")
        val withId = plans.RowId.attach(src, rowOrder, "__sg_ord")
        withId.groupBy(groups.map(withId(_)): _*)
          .agg(rewritten.head,
            (rewritten.tail :+ F.min(F.col("__sg_ord")).as("__sg_min")): _*)
          .orderBy("__sg_min").drop("__sg_min")
      } else src.groupBy(groups.map(src(_)): _*)
        .agg(rewritten.head, rewritten.tail: _*)
    new Gdf(out, Nil, Nil, logical.view.filterKeys(groups.contains).toMap)
  }

  /** `summarise` — consumes the groups (reference data_frame.ex:6128-6183;
    * `lazyframe.rs:251-275`). Every expression must aggregate; window
    * functions INSIDE an aggregation are auto-materialized (see
    * [[summariseCols]]). */
  def summarise(pairs: (String, Ctx => Series)*): Gdf = {
    val c = ctx(false)
    summariseCols(pairs.map { case (n, f) => n -> f(c) })
  }

  /** Single-callback summarise: `df.summariseWith { implicit c => Seq(...) }`. */
  def summariseWith(f: Ctx => Seq[(String, Series)]): Gdf = {
    val c = ctx(false)
    summariseCols(f(c))
  }

  // ======== SQL (reference data_frame.ex:6887-6931) =========================

  /** Raw SQL against this frame registered under `tableName` — Spark SQL is
    * strictly stronger than the reference's Polars SQL passthrough. The
    * result is a FRESH frame: the query's schema is arbitrary, so no
    * groups/rowOrder/logical metadata carries over (stale groups pointing
    * at aggregated-away columns broke the next verb). The temp view stays
    * registered under `tableName` for the session, by design — it IS the
    * API surface for follow-up queries. */
  def sql(query: String, tableName: String = "df"): Gdf = {
    sdf.createOrReplaceTempView(tableName)
    Gdf(spark.sql(query))
  }

  // ======== UDF escape hatch (reference §2.11) ===============================

  /** `DataFrame.transform/3` — arbitrary row-at-a-time host code
    * (reference data_frame.ex:4613-4630, documented there as expensive;
    * same warning applies: this leaves Catalyst, so nothing below it is
    * optimized). Runs distributed via mapPartitions, one partition per task. */
  def transformRows(outSchema: StructType)(
      f: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): Gdf = {
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    // fresh frame: `f` controls the output rows AND schema, so carrying
    // this frame's groups/rowOrder/logical over would describe columns
    // that may no longer exist (or worse, same-named ones of a different
    // dtype — a silent withLogical-invariant violation)
    Gdf(sdf.mapPartitions(f)(enc))
  }

  // ======== materialization ==================================================

  def collectRows(): Array[org.apache.spark.sql.Row] = sdf.collect()
  def count(): Long = sdf.count()

  /** `shape/1` — (n_rows, n_columns). n_rows runs a count job (the
    * reference's frame is materialized; a count is the lazy-plan analog). */
  def shape: (Long, Int) = (sdf.count(), names.size)
  def nRows: Long = sdf.count()
  def nColumns: Int = names.size

  /** `to_table_string` / `print/2` (data_frame.ex print, table inspect):
    * the frame rendered as an ASCII table, `limit` rows. */
  def toTableString(limit: Int = 5, truncate: Int = 20): String =
    org.apache.spark.sql.graftbridge.Bridge.showString(sdf, limit, truncate)

  def printTable(limit: Int = 5): Unit = println(toTableString(limit))

  /** `estimated_size/1` (data_frame.ex) — Catalyst's optimized-plan size
    * estimate in bytes. The reference reports the materialized frame's heap
    * size; for a lazy plan the optimizer's stats estimate is the analog
    * (exact after a scan of parquet footers, heuristic mid-plan). */
  def estimatedSize: BigInt = sdf.queryExecution.optimizedPlan.stats.sizeInBytes
  def cache(): Gdf = copy(sdf.cache())
}

object Gdf {
  def apply(df: DataFrame): Gdf = new Gdf(df)

  /** Force a sort key's null placement. A bare column becomes an ascending
    * key; a key that is already a SortOrder (`.desc` etc.) keeps its
    * direction and only the null ordering is replaced (see
    * [[org.apache.spark.sql.graftbridge.Bridge.withNullOrdering]]). */
  private[graft] def withNils(key: Column, nilsLast: Boolean): Column =
    org.apache.spark.sql.graftbridge.Bridge.withNullOrdering(key, nilsLast)
}
