package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** DataFrame-level statistics compositions — like the reference, these are
  * pure library code built on summarise/groupBy (describe at
  * data_frame.ex:6678-6741, frequencies at 6784-6800, nil_count at 6760,
  * correlation/covariance matrices at 6832-6879). */
object Stats {

  /** `describe/2`: count, nil_count, mean, std, min, percentiles, max per
    * numeric column — one pass, one job. */
  def describe(df: Gdf, percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): Gdf = {
    val numeric = df.names.filter(n => df.schema(n).dataType match {
      case _: NumericType => true; case _ => false
    })
    require(numeric.nonEmpty, // not a bare aggs.head crash
      s"describe: no numeric columns among ${df.names.mkString(", ")}")
    // labels carry 4 decimal digits of percent, so only percentiles
    // closer than 1e-6 collide — refuse those with a clear message
    // instead of the opaque duplicate-alias analysis crash they'd cause
    require(percentiles.map(pLabel).distinct.size == percentiles.size,
      s"describe: percentiles ${percentiles.mkString(", ")} collapse to " +
        "duplicate labels — values must differ by at least 1e-6")
    val aggs = numeric.flatMap { n =>
      val c = F.col(n)
      Seq(F.count(c).as(s"${n}__count"),
        F.count_if(c.isNull).as(s"${n}__nil_count"),
        F.avg(c).as(s"${n}__mean"),
        F.stddev_samp(c).as(s"${n}__std"),
        F.min(c).cast(DoubleType).as(s"${n}__min")) ++
        percentiles.map(p =>
          F.percentile(c, F.lit(p)).as(s"${n}__${pLabel(p)}")) :+
        F.max(c).cast(DoubleType).as(s"${n}__max")
    }
    val row = df.sdf.agg(aggs.head, aggs.tail: _*)
    // long form: one row per (column, statistic)
    val stats = Seq("count", "nil_count", "mean", "std", "min") ++
      percentiles.map(pLabel) :+ "max"
    val cols = numeric.map { n =>
      F.struct(F.lit(n).as("column"),
        F.array(stats.map(s => F.col(s"${n}__$s").cast(DoubleType)): _*).as("vals"))
    }
    val long = row.select(F.explode(F.array(cols: _*)).as("s"))
      .select(F.col("s.column").as("column"),
        F.posexplode(F.col("s.vals")).as(Seq("i", "value")))
      .withColumn("statistic",
        F.element_at(F.array(stats.map(F.lit): _*), F.col("i") + 1))
      .select("column", "statistic", "value")
    Gdf(long)
  }

  /** Percentile label: `.toInt` TRUNCATES the IEEE product (0.29 * 100 ==
    * 28.999999999999996 → "p28"), so round — but only to 4 decimals of a
    * percent, keeping sub-percent percentiles distinct (0.551/0.554 →
    * p55_1/p55_4, not one colliding p55); trailing zeros stripped so the
    * common whole-percent labels stay p25/p50/p75. */
  private def pLabel(p: Double): String = {
    val bd = BigDecimal(p * 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros
    s"p${bd.toPlainString.replace('.', '_')}"
  }

  /** `frequencies/1`: value counts, descending (data_frame.ex:6784-6800). */
  def frequencies(df: Gdf, cols: Seq[String]): Gdf = {
    require(!cols.contains("counts"),
      "frequencies: a grouping column named 'counts' collides with the " +
        "output count column — rename first")
    // internal agg alias so the ORDER BY never resolves ambiguously
    Gdf(df.sdf.groupBy(cols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__freq_n"))
      .orderBy(F.col("__freq_n").desc +: cols.map(F.col): _*)
      .withColumnRenamed("__freq_n", "counts"))
  }

  /** Modal set — the reference's multi-value `mode` (series.ex:2676-2679):
    * all values sharing the max frequency, as a sorted list. The max count is
    * a scalar aggregate broadcast back — not a rank window over the distinct
    * values, which would single-task a high-cardinality column. */
  def modeList(df: Gdf, col: String): Gdf = {
    val counts = df.sdf.groupBy(col).agg(F.count(F.lit(1)).as("__n"))
    val mx = F.broadcast(counts.agg(F.max(F.col("__n")).as("__mx")))
    Gdf(counts.crossJoin(mx).filter(F.col("__n") === F.col("__mx"))
      .select(F.col(col)).orderBy(col))
  }

  /** Deterministic grouped mode: the smallest value among those sharing the
    * max frequency (the reference's multi-value mode collapsed with a defined
    * tie-break so results are engine-comparable). Two hash aggregations —
    * (groups, value) counts then per-group arg-max — no windows, scales. */
  def modeBy(df: Gdf, groups: Seq[String], value: String,
      out: String = "mode"): Gdf = {
    val counts = df.sdf.groupBy((groups :+ value).map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__n"))
    // min over (-count, value) ⇒ max count, ties → smallest value. The
    // struct comparison is lexicographic over ANY orderable value dtype —
    // the old (count, value * -1) formulation silently null-cast strings
    // (nondeterministic ties; a runtime error under ANSI)
    val best = counts.groupBy(groups.map(F.col): _*)
      .agg(F.min_by(F.col(value),
        F.struct((F.col("__n") * -1).as("__negn"), F.col(value))).as(out))
    Gdf(best)
  }

  /** `categorise/2` (reference series.ex:1404): map a value column through
    * a category dictionary (category → code). Broadcast join — the
    * dictionary is small by definition. */
  def categorise(df: Gdf, col: String, categories: Gdf,
      catCol: String, codeCol: String = "code"): Gdf = {
    // a duplicated category would silently DUPLICATE every matching row
    // of the main frame through the join — a category dictionary is
    // unique by construction in the reference (:category dtype), so a
    // dup here is caller error; one bounded job on the (small) dict
    val dup = categories.sdf.groupBy(F.col(catCol))
      .agg(F.count(F.lit(1)).as("__n")).filter(F.col("__n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"categorise: category '${dup.headOption.map(_.get(0)).orNull}' " +
        "appears more than once in the dictionary — the join would " +
        "silently duplicate rows")
    val dict = F.broadcast(categories.sdf
      .select(F.col(catCol).as("__cat"), F.col(codeCol).as(s"${col}_code")))
    Gdf(df.sdf.join(dict, df.sdf(col) === F.col("__cat"), "left")
      .drop("__cat"))
  }

  /** `nil_count/1` per column (data_frame.ex:6760). */
  def nilCount(df: Gdf): Gdf = {
    require(df.names.nonEmpty, "nil_count: frame has no columns")
    val aggs = df.names.map(n => F.count_if(F.col(n).isNull).as(n))
    Gdf(df.sdf.agg(aggs.head, aggs.tail: _*))
  }

  /** Pairwise Pearson correlation matrix (data_frame.ex:6832). One job for
    * the whole matrix — n² aggregate expressions, single pass over the data,
    * which is the scalable shape (no per-pair jobs). */
  def correlationMatrix(df: Gdf, cols: Seq[String]): Gdf =
    pairwise(df, cols, (a, b) => F.corr(a, b), "correlation")

  /** Pairwise sample covariance matrix (data_frame.ex:6879). */
  def covarianceMatrix(df: Gdf, cols: Seq[String], ddof: Int = 1): Gdf =
    pairwise(df, cols,
      (a, b) => if (ddof == 1) F.covar_samp(a, b) else F.covar_pop(a, b),
      "covariance")

  private def pairwise(df: Gdf, cols: Seq[String],
      f: (Column, Column) => Column, what: String): Gdf = {
    // the output schema owns "names" (row labels) and internal aliases
    // use "__": a column named "names" would duplicate a struct field,
    // and "a__b"-shaped names collide across pairs — both surface as
    // ambiguous-reference crashes deep in the select
    require(!cols.contains("names"),
      s"$what matrix: a column named 'names' collides with the row-label " +
        "column — rename first")
    require(cols.forall(!_.contains("__")),
      s"$what matrix: column names containing '__' collide with the " +
        "internal pair aliases — rename first")
    val aggs = for { a <- cols; b <- cols }
      yield f(F.col(a), F.col(b)).as(s"${a}__${b}")
    val row = df.sdf.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { a =>
      F.struct((F.lit(a).as("names") +:
        cols.map(b => F.col(s"${a}__${b}").as(b))): _*)
    }
    Gdf(row.select(F.explode(F.array(structs: _*)).as("r")).select("r.*"))
  }

  /** Spearman rank correlation (reference correlation method=:spearman,
    * series.ex:2945-2998) = Pearson over average-ranks.
    *
    * Ranks are computed scale-safely: per column, ONE range shuffle on the
    * value ([[graft.plans.RowId.attachAvgRank]]) and a per-partition
    * run-length scan — ties are co-partitioned by the range partitioner, so
    * avg_rank = run_start+1 + (ties-1)/2 needs no Window and no second
    * shuffle. Identical to `rank()` + tie averaging.
    *
    * Complete-case semantics, like the reference: rows with a null in
    * EITHER column are excluded BEFORE ranking — the rank attacher
    * assigns every physical row a rank (nulls sort first), so ranking
    * the unfiltered frame would hand null observations the smallest
    * ranks and feed them into the correlation as real pairs (wrong
    * value, possibly wrong sign, no error). */
  def spearman(df: Gdf, a: String, b: String): Gdf = {
    val complete = df.sdf.filter(F.col(a).isNotNull && F.col(b).isNotNull)
    Gdf(graft.plans.RowId.attachAvgRank(
        graft.plans.RowId.attachAvgRank(complete, a, "__ra"), b, "__rb")
      .agg(F.corr(F.col("__ra"), F.col("__rb")).as("spearman")))
  }

  /** `cut/2` — fixed-break binning into labelled categories
    * (series.ex:4945; series.rs:205-305). Pure `when`-chain: codegen'd,
    * no shuffle. Labels default to Polars' `(lo, hi]` formatting
    * (`[lo, hi)` when `leftClosed`). A null input yields a null category —
    * the chain is guarded, otherwise every `when` is null and the value
    * would silently fall into the top bin. */
  def cut(col: Column, breaks: Seq[Double], labels: Seq[String] = Nil,
      leftClosed: Boolean = false): Column = {
    // unsorted breaks would bin by first-match against an out-of-order
    // chain; silently sorting them would misalign user-supplied labels —
    // require the caller's order to BE the bin order. STRICTLY ascending:
    // a duplicated break makes its second bin unreachable (its label can
    // never be produced) — Polars rejects it, and qcut's explicit
    // allowDuplicates dedup is the sanctioned escape
    require(breaks == breaks.sorted && breaks.distinct.size == breaks.size,
      s"cut breaks must be strictly ascending, got ${breaks.mkString(", ")}")
    val labs = cutLabels(breaks, labels, leftClosed)
    val first = F.when(col.isNull, F.lit(null).cast(StringType))
    val mid = breaks.indices.foldLeft(first) { (acc, i) =>
      acc.when(if (leftClosed) col < breaks(i) else col <= breaks(i), labs(i))
    }
    mid.otherwise(labs.last)
  }

  private def cutLabels(breaks: Seq[Double], labels: Seq[String],
      leftClosed: Boolean): Seq[String] = {
    if (labels.nonEmpty) {
      require(labels.size == breaks.size + 1,
        s"cut needs ${breaks.size + 1} labels, got ${labels.size}")
      labels
    } else {
      val bounds = Double.NegativeInfinity +: breaks :+ Double.PositiveInfinity
      bounds.sliding(2).map {
        case Seq(lo, hi) =>
          if (leftClosed) s"[${fmt(lo)}, ${fmt(hi)})" else s"(${fmt(lo)}, ${fmt(hi)}]"
      }.toSeq
    }
  }

  /** Polars' break formatting: integral doubles print bare (`(2, 4]`,
    * reference qcut doctest series.ex:4995-5002), non-integral keep the
    * fraction. */
  private def fmt(d: Double): String =
    if (d.isNegInfinity) "-inf" else if (d.isPosInfinity) "inf"
    else if (d == d.floor) d.toLong.toString else d.toString

  /** Full `Series.cut/3` shape (series.rs:205-243): a frame with `values`,
    * `break_point` (when `includeBreaks` — the bin's right endpoint, Inf for
    * the top bin, null for null input) and `category` (`:category` logical
    * dtype). */
  def cutFrame(df: Gdf, colName: String, breaks: Seq[Double],
      labels: Seq[String] = Nil, breakPointLabel: String = "break_point",
      categoryLabel: String = "category", leftClosed: Boolean = false,
      includeBreaks: Boolean = false): Gdf = {
    val col = F.col(colName)
    // the ascending-breaks contract is owned by [[cut]], which every path
    // below delegates to (the includeBreaks chain uses the same order)
    val sorted = breaks
    val base = df.sdf.select(col.as("values"))
    val out =
      if (!includeBreaks)
        base.withColumn(categoryLabel, cut(F.col("values"), sorted, labels, leftClosed))
      else {
        val bp = {
          val first = F.when(F.col("values").isNull, F.lit(null).cast(DoubleType))
          val mid = sorted.indices.foldLeft(first) { (acc, i) =>
            acc.when(if (leftClosed) F.col("values") < sorted(i)
                     else F.col("values") <= sorted(i), sorted(i))
          }
          mid.otherwise(Double.PositiveInfinity)
        }
        base.withColumn(breakPointLabel, bp)
          .withColumn(categoryLabel, cut(F.col("values"), sorted, labels, leftClosed))
      }
    new Gdf(out, logical = Map(categoryLabel -> DType.Category))
  }

  /** `qcut/2` — quantile binning (series.ex:5005). Breaks are computed with
    * exact `percentile` in one aggregate pass (collect of q scalars only),
    * then reuse [[cut]]. */
  def qcut(df: Gdf, colName: String, qs: Seq[Double],
      labels: Seq[String] = Nil): Column =
    cut(F.col(colName), qcutBreaks(df, colName, qs), labels)

  /** Full `Series.qcut/3` shape (series.rs:246-285). `allowDuplicates`
    * collapses equal quantile breaks instead of erroring. */
  def qcutFrame(df: Gdf, colName: String, qs: Seq[Double],
      labels: Seq[String] = Nil, breakPointLabel: String = "break_point",
      categoryLabel: String = "category", allowDuplicates: Boolean = false,
      leftClosed: Boolean = false, includeBreaks: Boolean = false): Gdf = {
    val breaks = qcutBreaks(df, colName, qs)
    val deduped = breaks.distinct
    if (!allowDuplicates) require(deduped.size == breaks.size,
      s"qcut quantiles produce duplicated breaks $breaks (allowDuplicates=false)")
    cutFrame(df, colName, deduped, labels, breakPointLabel, categoryLabel,
      leftClosed, includeBreaks)
  }

  private def qcutBreaks(df: Gdf, colName: String, qs: Seq[Double]): Seq[Double] = {
    require(qs.nonEmpty, "qcut: no quantiles given")
    val row = df.sdf.agg(
      F.percentile(F.col(colName), F.lit(qs.head)).as("q0"),
      qs.drop(1).zipWithIndex.map { case (q, i) =>
        F.percentile(F.col(colName), F.lit(q)).as(s"q${i + 1}") }: _*).head()
    require(!row.isNullAt(0), // all-null/empty column → bare NPE otherwise
      s"qcut: column '$colName' has no non-null values to take quantiles of")
    qs.indices.map(row.getDouble)
  }
}
