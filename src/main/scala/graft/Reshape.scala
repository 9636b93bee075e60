package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Reshaping verbs (reference SURVEY §2.7) and vertical/horizontal concat
  * (§2.4). All lazy DataFrame transforms except `transpose`, which is
  * eager-only in the reference too (`lazy_frame.ex:669-685`). */
object Reshape {

  /** `pivot_longer/3` (reference data_frame.ex:4819-4821) — wide→long via
    * Spark's native unpivot (same Polars `unpivot` semantics). Pivoted
    * columns must share a dtype; numeric mixes are relax-cast like the
    * reference (double wins). */
  def pivotLonger(df: Gdf, pivot: Seq[String],
      namesTo: String = "variable", valuesTo: String = "value"): Gdf = {
    val ids = df.names.filterNot(pivot.contains)
    val types = pivot.map(n => df.schema(n).dataType).distinct
    // the relax-cast covers NUMERIC mixes only (the reference rule); a
    // string/date in the mix would silently cast to all-null doubles
    require(types.size <= 1 || types.forall(_.isInstanceOf[NumericType]),
      s"pivot_longer: pivoted columns mix incompatible dtypes " +
        types.mkString("[", ", ", "]"))
    val src =
      if (types.size <= 1) df.sdf
      else pivot.foldLeft(df.sdf)((d, n) => d.withColumn(n, F.col(n).cast(DoubleType)))
    // grouped rule (reference data_frame.ex pivot_longer doc): groups that
    // are pivoted away are removed, the rest are kept
    new Gdf(src.unpivot(ids.map(F.col).toArray, pivot.map(F.col).toArray,
      namesTo, valuesTo), groups = df.groups.filterNot(pivot.contains))
  }

  /** `pivot_wider/4` (reference data_frame.ex:5102-5108; dataframe.rs:435-515):
    * long→wide, values aggregated with `first` (the reference hard-codes
    * PivotAgg::First). Distinct names are either supplied (scales: avoids the
    * collect) or discovered. */
  def pivotWider(df: Gdf, namesFrom: String, valuesFrom: String,
      namesPrefix: String = "", namesValues: Seq[String] = Nil): Gdf = {
    val ids = df.names.filterNot(n => n == namesFrom || n == valuesFrom)
    // pivot over the STRINGIFIED names column: output column names are
    // strings anyway, discovery and matching stay consistent by
    // construction (Row.toString vs cast-to-string diverge for e.g.
    // timestamps), and a null name becomes the "null" column instead of
    // an NPE in discovery
    val nameStr = F.coalesce(F.col(namesFrom).cast(StringType),
      F.lit("null"))
    val values =
      if (namesValues.nonEmpty) namesValues
      else {
        // discover RAW (nullable) strings so a genuine "null" string and
        // actual nulls stay distinguishable: both would silently merge
        // into one output column (first() then picks an arbitrary row of
        // the merged bucket). Same single job as before. The supplied-
        // namesValues path (the no-collect scale path) can't see the mix
        // without a job; a caller passing "null" there declares the
        // merged bucket knowingly.
        val raw = df.sdf.select(F.col(namesFrom).cast(StringType)
          .as("__pw_n")).distinct().collect()
          .map(r => Option(r.getString(0))).toSeq
        require(!(raw.contains(None) && raw.contains(Some("null"))),
          s"pivot_wider: column '$namesFrom' holds both nulls and the " +
            "literal string \"null\" — their output columns would " +
            "silently merge; rename one first")
        raw.map(_.getOrElse("null")).sorted
      }
    val g = df.sdf.withColumn("__pw_n", nameStr)
      .groupBy(ids.map(F.col): _*).pivot("__pw_n", values)
      .agg(F.first(F.col(valuesFrom)))
    // id-column collision suffixing (reference dataframe.rs:446-511): a
    // pivoted value equal to an id column name gets a numeric suffix.
    // Positional rename via toDF — withColumnRenamed would hit both twins.
    val newNames = ids ++ values.map { v =>
      val base = if (namesPrefix.isEmpty) v.toString else namesPrefix + v
      if (ids.contains(base)) s"${base}_1" else base
    }
    // grouped rule (reference data_frame.ex pivot_wider doc): groups that
    // are not ID columns are discarded
    new Gdf(g.toDF(newNames: _*), groups = df.groups.filter(ids.contains))
  }

  /** `explode/2` — unnest list column(s) into rows (data_frame.ex:6292).
    * Multi-column explode zips the lists (Polars multi-col semantics). */
  def explode(df: Gdf, cols: Seq[String]): Gdf = {
    val out =
      if (cols.size == 1)
        df.sdf.withColumn(cols.head, F.explode_outer(F.col(cols.head)))
      else {
        val zipped = df.sdf.withColumn("__z",
          F.explode_outer(F.arrays_zip(cols.map(F.col): _*)))
        cols.foldLeft(zipped)((d, n) => d.withColumn(n, F.col("__z").getField(n)))
          .drop("__z")
      }
    // groups survive an explode (the grouping columns are untouched)
    new Gdf(out, groups = df.groups)
  }

  /** `unnest/2` — struct column → one column per field (data_frame.ex:6341). */
  def unnest(df: Gdf, col: String): Gdf = {
    val fields = df.schema(col).dataType.asInstanceOf[StructType].fieldNames
    val others = df.names.filterNot(_ == col)
    new Gdf(df.sdf.select(others.map(F.col) ++
      fields.map(f => F.col(col).getField(f).as(f)): _*),
      groups = df.groups.filterNot(_ == col))
  }

  /** `dummies/2` — one-hot encode (data_frame.ex:4095-4099). Category values
    * can be supplied to avoid the distinct-collect at scale. */
  def dummies(df: Gdf, col: String, values: Seq[String] = Nil): Gdf = {
    // stringified key: null one-hots into a "<col>_null" column (the
    // Polars to_dummies rule) instead of NPE-ing discovery, and supplied
    // string values match non-string columns consistently
    val key = F.coalesce(F.col(col).cast(StringType), F.lit("null"))
    val vs = if (values.nonEmpty) values
      else {
        // raw nullable discovery — same null-vs-"null" collision guard
        // as pivot_wider (their dummies would silently merge)
        val raw = df.sdf.select(F.col(col).cast(StringType).as("__d_k"))
          .distinct().collect().map(r => Option(r.getString(0))).toSeq
        require(!(raw.contains(None) && raw.contains(Some("null"))),
          s"dummies: column '$col' holds both nulls and the literal " +
            "string \"null\" — their dummy columns would silently merge; " +
            "rename one first")
        raw.map(_.getOrElse("null")).sorted
      }
    val cols = vs.map(v =>
      F.when(key === v, 1).otherwise(0).as(s"${col}_$v"))
    // grouped rule (reference data_frame.ex dummies doc): all groups are
    // removed — Gdf.apply returns an ungrouped frame
    Gdf(df.sdf.select(df.names.map(F.col) ++ cols: _*))
  }

  /** `transpose/2` (data_frame.ex:4667) — rows↔columns. Driver-side collect,
    * eager-only exactly like the reference (dataframe.rs:43); only sane for
    * small frames (it inverts the scaling axis by definition). When every
    * transposed column shares one dtype the output keeps it (the reference's
    * uniform-dtype rule); mixed dtypes relax to string. */
  def transpose(df: Gdf, header: Option[String] = None,
      columns: Seq[String] = Nil): Gdf = {
    val spark = df.spark
    val names = header match {
      case Some(h) => df.names.filterNot(_ == h)
      case None => df.names
    }
    val shared: Option[DataType] = {
      val ts = names.map(n => df.schema(n).dataType).distinct
      if (ts.size == 1) Some(ts.head) else None
    }
    val rows = df.sdf.collect()
    val colNames: Seq[String] =
      if (columns.nonEmpty) columns
      else header match {
        case Some(h) => rows.map(r =>
          Option(r.get(df.names.indexOf(h))).map(_.toString)
            .getOrElse("null")).toSeq
        case None => rows.indices.map(i => s"column_$i")
      }
    val data = names.map { n =>
      val i = df.names.indexOf(n)
      Row.fromSeq(n +: rows.map(r =>
        if (shared.isDefined) r.get(i)
        else Option(r.get(i)).map(_.toString).orNull).toSeq)
    }
    val schema = StructType(StructField("name", StringType) +:
      colNames.map(c => StructField(c, shared.getOrElse(StringType))))
    Gdf(spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList), schema))
  }

  /** `concat_rows` (data_frame.ex:5762-5869) — vertical union with column
    * reconciliation and the reference's relaxed numeric cast (int+float →
    * float). */
  def concatRows(dfs: Seq[Gdf]): Gdf = {
    val allNames = dfs.flatMap(_.names).distinct
    // promote per-column dtypes across frames
    val target: Map[String, DataType] = allNames.map { n =>
      val ts = dfs.flatMap(d =>
        if (d.names.contains(n)) Some(DType.fromSpark(d.schema(n).dataType))
        else None)
      n -> ts.reduce(DType.promote).spark
    }.toMap
    val aligned = dfs.map { d =>
      val cols = allNames.map { n =>
        if (d.names.contains(n)) F.col(n).cast(target(n)).as(n)
        else F.lit(null).cast(target(n)).as(n)
      }
      d.sdf.select(cols: _*)
    }
    // grouped rule (reference data_frame.ex concat_rows doc): only the
    // FIRST frame's groups are kept
    new Gdf(aligned.reduce(_ union _), groups = dfs.head.groups)
  }

  /** `concat_columns` (data_frame.ex:5693-5720) — horizontal zip by position.
    * Spark rows are unordered, so each side gets a distributed row index over
    * its declared order ([[graft.plans.RowId]] — no single-task global
    * window) and the sides are equi-joined on the index (Polars `hstack`
    * equivalent; the index join is a plain hash shuffle). */
  def concatColumns(dfs: Seq[Gdf]): Gdf = {
    // the reference (Polars DataFrame::new over hstacked columns) ERRORS
    // on unequal heights; an unchecked inner join on the row index would
    // silently truncate to the shortest frame. The check rides the
    // already-needed index join (full-outer + per-row presence assert),
    // NOT an eager count() per input — the old shape materialized every
    // input an extra time purely for the height check. The error
    // therefore surfaces at action time (lazy), not at call time.
    val indexed = dfs.zipWithIndex.map { case (d, i) =>
      require(d.rowOrder.nonEmpty,
        "concat_columns needs .ordered(...) on every input")
      // attach the row index BEFORE the clash rename: the frame's
      // rowOrder Columns resolve against its own names, which a rename
      // would orphan
      val withIdx = graft.plans.RowId.attach(d.sdf, d.rowOrder, "__cc_idx")
        .withColumn(s"__cc_p$i", F.lit(true))
      if (i == 0) withIdx else {
        val clashes = dfs.take(i).flatMap(_.names).toSet
        d.names.foldLeft(withIdx)((acc, n) =>
          if (clashes(n)) acc.withColumnRenamed(n, s"${n}_$i") else acc)
      }
    }
    val joined = indexed.reduce((a, b) =>
      a.join(b, Seq("__cc_idx"), "full_outer"))
    // every input contributed a row at every index ⟺ equal heights.
    // Non-constant `when` branch so the assert cannot be constant-folded
    // away (the r8 optimizer trap — see TsNorm.sliceNs).
    val present = dfs.indices
      .map(i => F.col(s"__cc_p$i").isNotNull).reduce(_ && _)
    val checked = joined.filter(F.when(F.assert_true(present,
      F.lit("concat_columns requires equal heights — a row index present " +
        "in one input is missing in another")).isNull, present))
    // grouped rule (reference data_frame.ex concat_columns doc): only the
    // FIRST frame's groups are kept
    new Gdf(checked.drop(
      ("__cc_idx" +: dfs.indices.map(i => s"__cc_p$i")): _*),
      groups = dfs.head.groups)
  }
}
