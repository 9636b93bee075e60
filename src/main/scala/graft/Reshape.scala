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
    // are pivoted away are removed, the rest are kept; logical dtypes of
    // the SURVIVING id columns ride along (the Joins rule — a bare wrap
    // here silently dropped :category/:time/u* annotations)
    new Gdf(src.unpivot(ids.map(F.col).toArray, pivot.map(F.col).toArray,
      namesTo, valuesTo), groups = df.groups.filterNot(pivot.contains),
      logical = df.logical.filter { case (k, _) => ids.contains(k) })
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
    // the reference hard-codes PivotAgg::First = FRAME-order first; Spark's
    // first() is whichever value a task sees first, nondeterministic under
    // shuffles. With a declared row order the deterministic twin is
    // min_by(value, rowid); without one, "first" has no defined meaning
    // and Spark's arbitrary pick is the honest behavior.
    val (src, firstAgg) =
      if (df.rowOrder.nonEmpty) {
        val withId = graft.plans.RowId.attach(df.sdf, df.rowOrder, "__pw_rid")
        (withId, F.min_by(F.col(valuesFrom), F.col("__pw_rid")))
      } else (df.sdf, F.first(F.col(valuesFrom)))
    val g = src.withColumn("__pw_n", nameStr)
      .groupBy(ids.map(F.col): _*).pivot("__pw_n", values)
      .agg(firstAgg)
    // id-column collision suffixing (reference dataframe.rs:446-511): a
    // pivoted value equal to an id column name gets a numeric suffix,
    // INCREMENTED until unique — a fixed "_1" can itself collide with
    // another id or pivot value, yielding duplicate output columns.
    // Positional rename via toDF — withColumnRenamed would hit both twins.
    val taken = scala.collection.mutable.Set[String](ids: _*)
    val newNames = ids ++ values.map { v =>
      val base = if (namesPrefix.isEmpty) v.toString else namesPrefix + v
      var name = base
      var i = 0
      while (taken.contains(name)) { i += 1; name = s"${base}_$i" }
      taken += name
      name
    }
    // grouped rule (reference data_frame.ex pivot_wider doc): groups that
    // are not ID columns are discarded; surviving id columns keep their
    // logical dtypes
    new Gdf(g.toDF(newNames: _*), groups = df.groups.filter(ids.contains),
      logical = df.logical.filter { case (k, _) => ids.contains(k) })
  }

  /** `explode/2` — unnest list column(s) into rows (data_frame.ex:6292).
    * Multi-column explode zips the lists (Polars multi-col semantics). */
  def explode(df: Gdf, cols: Seq[String]): Gdf = {
    val out =
      if (cols.size == 1)
        df.sdf.withColumn(cols.head, F.explode_outer(F.col(cols.head)))
      else {
        // Polars' multi-column explode ERRORS on mismatched list lengths
        // (ShapeError); arrays_zip would silently null-pad to the longest
        // list, fabricating rows. Null-safe compare: all-null rows pass
        // (they explode to one all-null row), a null list zipped against
        // a real one is the same fabrication and fails loud. The `ok`
        // branch keeps the assert un-foldable (the r8 optimizer trap).
        val sz = F.size(F.col(cols.head))
        val ok = cols.tail.map(c => F.size(F.col(c)) <=> sz)
          .reduceOption(_ && _).getOrElse(F.lit(true))
        val checked = df.sdf.filter(F.when(F.assert_true(ok, F.lit(
          s"explode: columns ${cols.mkString(", ")} hold lists of " +
            "different lengths — multi-column explode zips " +
            "position-wise and has no semantics for ragged rows")).isNull,
          ok))
        val zipped = checked.withColumn("__z",
          F.explode_outer(F.arrays_zip(cols.map(F.col): _*)))
        cols.foldLeft(zipped)((d, n) => d.withColumn(n, F.col("__z").getField(n)))
          .drop("__z")
      }
    // groups survive an explode (the grouping columns are untouched);
    // logical dtypes: untouched columns keep theirs, an exploded List
    // annotation unwraps to its element dtype
    val logical = df.logical.flatMap { case (k, v) =>
      if (!cols.contains(k)) Some(k -> v)
      else v match {
        case DType.List(inner) => Some(k -> inner)
        case _ => None
      }
    }
    new Gdf(out, groups = df.groups, logical = logical)
  }

  /** `unnest/2` — struct column → one column per field (data_frame.ex:6341). */
  def unnest(df: Gdf, col: String): Gdf = {
    val fields = df.schema(col).dataType.asInstanceOf[StructType].fieldNames
    val others = df.names.filterNot(_ == col)
    new Gdf(df.sdf.select(others.map(F.col) ++
      fields.map(f => F.col(col).getField(f).as(f)): _*),
      groups = df.groups.filterNot(_ == col),
      logical = df.logical.filter { case (k, _) => others.contains(k) })
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
    // removed; every original column is untouched, so logical dtypes ride
    new Gdf(df.sdf.select(df.names.map(F.col) ++ cols: _*),
      groups = Nil, logical = df.logical)
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
    // honor the frame's declared row order: bare collect() returns plan
    // order, which varies with partitioning downstream of a shuffle — a
    // supplied `columns` list would attach labels to the WRONG rows
    val rows = (if (df.rowOrder.nonEmpty) df.sdf.orderBy(df.rowOrder: _*)
      else df.sdf).collect()
    require(columns.isEmpty || columns.size == rows.length,
      s"transpose: ${columns.size} column name(s) supplied for " +
        s"${rows.length} row(s)")
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
    require(dfs.nonEmpty, "concat_rows needs at least one frame")
    val allNames = dfs.flatMap(_.names).distinct
    // promote per-column dtypes across frames — but the relaxed cast
    // covers NUMERIC mixes only (the reference rule, same as
    // pivot_longer): DType.promote's float/decimal catch-alls would
    // otherwise accept a string/date partner and silently cast it to
    // all-null doubles
    val target: Map[String, DataType] = allNames.map { n =>
      val ts = dfs.flatMap(d =>
        if (d.names.contains(n)) Some(DType.fromSpark(d.schema(n).dataType))
        else None)
      val concrete = ts.distinct.filterNot(_ == DType.Null)
      require(concrete.size <= 1 ||
          concrete.forall(_.spark.isInstanceOf[NumericType]),
        s"concat_rows: column '$n' mixes incompatible dtypes " +
          concrete.mkString("[", ", ", "]") +
          " — only numeric mixes relax-cast")
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
    // FIRST frame's groups are kept; a logical annotation survives only
    // when every frame holding the column agrees on BOTH the annotation
    // and the physical dtype (a promoted cast silently invalidates it)
    val logical = dfs.head.logical.filter { case (k, v) =>
      dfs.forall(d => !d.names.contains(k) ||
        (d.logical.get(k).contains(v) && d.schema(k).dataType == target(k)))
    }
    new Gdf(aligned.reduce(_ union _), groups = dfs.head.groups,
      logical = logical)
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
    require(dfs.nonEmpty, "concat_columns needs at least one frame")
    // clash renames computed up front with UNIQUE targets: a frame that
    // already holds x_1 next to a clashing x would otherwise end up with
    // two x_1 columns (withColumnRenamed happily duplicates)
    val allTaken = scala.collection.mutable.Set[String](dfs.head.names: _*)
    val renamesPerFrame: Seq[Map[String, String]] =
      dfs.zipWithIndex.map { case (d, i) =>
        if (i == 0) Map.empty[String, String]
        else d.names.map { n =>
          var name = n
          var j = i
          while (allTaken.contains(name)) { name = s"${n}_$j"; j += 1 }
          allTaken += name
          n -> name
        }.filter(kv => kv._1 != kv._2).toMap
      }
    val indexed = dfs.zipWithIndex.map { case (d, i) =>
      require(d.rowOrder.nonEmpty,
        "concat_columns needs .ordered(...) on every input")
      // attach the row index BEFORE the clash rename: the frame's
      // rowOrder Columns resolve against its own names, which a rename
      // would orphan
      val withIdx = graft.plans.RowId.attach(d.sdf, d.rowOrder, "__cc_idx")
        .withColumn(s"__cc_p$i", F.lit(true))
      // ONE positional select, not sequential withColumnRenamed: renaming
      // x → x_1 while the frame's own x_1 awaits its rename transiently
      // duplicates the name, and the next withColumnRenamed then renames
      // BOTH twins
      val rn = renamesPerFrame(i)
      withIdx.select(withIdx.columns.map(c =>
        graft.io.GraftIO.qcol(c).as(rn.getOrElse(c, c))): _*)
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
    // FIRST frame's groups are kept; every frame's logical dtypes ride,
    // remapped through the clash renames
    new Gdf(checked.drop(
      ("__cc_idx" +: dfs.indices.map(i => s"__cc_p$i")): _*),
      groups = dfs.head.groups,
      logical = dfs.zipWithIndex.flatMap { case (d, i) =>
        d.logical.map { case (k, v) =>
          renamesPerFrame(i).getOrElse(k, k) -> v }
      }.toMap)
  }
}
