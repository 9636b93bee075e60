package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** DataFrame-level statistics compositions (SURVEY §2.5-2.6). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("describe long form with exact percentiles") {
    val d = Gdf(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val s = Stats.describe(d)
    val m = s.sdf.collect()
      .map(r => r.getString(1) -> r.getAs[Double]("value")).toMap
    assert(m("count") == 4.0 && m("nil_count") == 0.0)
    assert(m("mean") == 2.5 && m("min") == 1.0 && m("max") == 4.0)
    assert(m("p25") == 1.75 && m("p50") == 2.5 && m("p75") == 3.25)
  }

  test("frequencies descending") {
    val d = Gdf(Seq("a", "b", "a", "a", "b").toDF("c"))
    val f = Stats.frequencies(d, Seq("c"))
    val rows = f.sdf.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
  }

  test("modeList returns full modal set sorted") {
    val d = Gdf(Seq(1, 2, 2, 3, 3).toDF("v"))
    assert(col1[Int](Stats.modeList(d, "v").sdf, "v") == Seq(2, 3))
  }

  test("modeBy deterministic smallest modal value per group") {
    val d = Gdf(Seq(("g1", 5.0), ("g1", 5.0), ("g1", 3.0), ("g1", 3.0),
      ("g2", 7.0)).toDF("g", "v"))
    val m = Stats.modeBy(d, Seq("g"), "v")
    val rows = m.sdf.orderBy("g").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(3.0, 7.0))
  }

  test("nilCount per column") {
    val d = Gdf(df(schema("a" -> DoubleType, "b" -> StringType),
      Seq(1.0, null), Seq(null, "x"), Seq(null, "y")))
    val r = Stats.nilCount(d).sdf.collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
  }

  test("correlationMatrix pairwise in one pass") {
    val d = Gdf(Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("x", "y", "z"))
    val m = Stats.correlationMatrix(d, Seq("x", "y", "z"))
    val rows = m.sdf.orderBy("names").collect()
    val x = rows.find(_.getString(0) == "x").get
    assert(approx(x.getAs[Double]("y"), 1.0) &&
      approx(x.getAs[Double]("z"), -1.0))
  }

  test("spearman rank correlation handles ties via average ranks") {
    val d = Gdf(Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0))
      .toDF("a", "b"))
    // monotone → spearman exactly 1 even though pearson < 1
    val r = Stats.spearman(d, "a", "b").sdf.collect()(0).getDouble(0)
    assert(approx(r, 1.0))
  }

  test("spearman excludes null pairs BEFORE ranking (complete-case " +
      "semantics): a null observation must not enter as the smallest rank") {
    import org.apache.spark.sql.types._
    val d = Gdf(df(schema("a" -> DoubleType, "b" -> DoubleType),
      Seq(null, 100.0), Seq(1.0, 1.0), Seq(2.0, 2.0)))
    // complete pairs (1,1),(2,2) are perfectly monotone → 1.0; ranking
    // the null row would feed corr([1,2,3],[3,1,2]) = -0.5
    val r = Stats.spearman(d, "a", "b").sdf.collect()(0).getDouble(0)
    assert(approx(r, 1.0), r.toString)
  }

  test("describe percentile labels round instead of truncating; matrix/" +
      "frequency/qcut reserved-name and degenerate guards are loud") {
    val d = Gdf(Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y"))
    // 0.29 * 100 == 28.999999... — .toInt labeled it p28
    val labels = col1[String](Stats.describe(d, Seq(0.29, 0.57)).sdf
      .select("statistic").distinct(), "statistic")
    assert(labels.contains("p29") && labels.contains("p57"), labels.toString)
    // sub-percent percentiles keep DISTINCT labels (whole-percent
    // rounding collapsed 0.551/0.554 into one alias → opaque
    // duplicate-reference crash); true sub-1e-6 collisions are refused
    // loudly instead
    val sub = col1[String](Stats.describe(d, Seq(0.551, 0.554)).sdf
      .select("statistic").distinct(), "statistic")
    assert(sub.contains("p55_1") && sub.contains("p55_4"), sub.toString)
    val dup = intercept[IllegalArgumentException] {
      Stats.describe(d, Seq(0.5500000001, 0.5500000002))
    }
    assert(dup.getMessage.contains("duplicate labels"), dup.getMessage)
    intercept[IllegalArgumentException] {
      Stats.frequencies(Gdf(Seq(1L).toDF("counts")), Seq("counts"))
    }
    intercept[IllegalArgumentException] {
      Stats.correlationMatrix(Gdf(Seq((1.0, 2.0)).toDF("names", "x")),
        Seq("names", "x"))
    }
    intercept[IllegalArgumentException] {
      Stats.correlationMatrix(Gdf(Seq((1.0, 2.0)).toDF("a__b", "x")),
        Seq("a__b", "x"))
    }
    intercept[IllegalArgumentException] {
      Stats.nilCount(Gdf(Seq(1L).toDF("v").drop("v")))
    }
    intercept[IllegalArgumentException] {
      Stats.qcut(d, "x", Seq.empty)
    }
    // duplicate breaks make a bin unreachable — strictly-ascending now
    intercept[IllegalArgumentException] {
      Stats.cut(org.apache.spark.sql.functions.col("x"), Seq(1.0, 1.0))
    }
    // constant column → equal quantiles → the Column qcut is loud too
    val const = Gdf(Seq(1.0, 1.0, 1.0).toDF("v"))
    intercept[IllegalArgumentException] {
      Stats.qcut(const, "v", Seq(0.25, 0.75))
    }
  }

  test("categorise maps values through a dictionary") {
    import org.apache.spark.sql.{functions => F}
    val d = Gdf(Seq("b", "a", "z").toDF("c"))
    val cats = Gdf(Seq(("a", 0L), ("b", 1L)).toDF("cat", "code"))
    val out = Stats.categorise(d, "c", cats, "cat")
    val got = out.sdf.orderBy("c").collect()
      .map(r => Option(r.getAs[Any]("c_code"))).toSeq
    assert(got == Seq(Some(0L), Some(1L), None))
  }

  test("loud guards: duplicate categorise dictionary (silent row " +
      "duplication), describe without numeric columns, cutFrame unsorted " +
      "breaks (label misalignment — same contract as cut)") {
    import org.apache.spark.sql.{functions => F}
    val d = Gdf(Seq("a", "b").toDF("c"))
    val dupCats = Gdf(Seq(("a", 0L), ("a", 1L), ("b", 2L)).toDF("cat", "code"))
    val e1 = intercept[IllegalArgumentException] {
      Stats.categorise(d, "c", dupCats, "cat")
    }
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Stats.describe(Gdf(Seq("x").toDF("s")))
    }
    assert(e2.getMessage.contains("numeric"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Stats.cutFrame(Gdf(Seq(1.0).toDF("v")), "v", Seq(5.0, 2.0),
        labels = Seq("lo", "mid", "hi"))
    }
    assert(e3.getMessage.contains("ascending"), e3.getMessage)
  }

  test("cut labels (lo, hi] like Polars, custom labels, null → null") {
    val d = Seq(Some(5.0), Some(15.0), Some(45.0), None).toDF("v")
    val c = d.select(Stats.cut(F.col("v"), Seq(10.0, 25.0, 40.0)).as("bin"))
    assert(c.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("(-inf, 10]"), Some("(10, 25]"), Some("(40, inf]"), None))
    val c2 = d.select(Stats.cut(F.col("v"), Seq(10.0), Seq("lo", "hi")).as("b"))
    assert(c2.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("lo"), Some("hi"), Some("hi"), None))
  }

  test("cutFrame matches the reference doctest shape (series.ex:4927-4942)") {
    // iex> cut([1.0, 2.0, 3.0], [1.5, 2.5], include_breaks: true)
    val d = Gdf(Seq(1.0, 2.0, 3.0).toDF("x"))
    val out = Stats.cutFrame(d, "x", Seq(1.5, 2.5), includeBreaks = true)
    assert(out.names == Seq("values", "break_point", "category"))
    assert(out.dtypes("category") == DType.Category)
    val rows = out.sdf.orderBy("values").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(rows.map(_.getDouble(1)).toSeq ==
      Seq(1.5, 2.5, Double.PositiveInfinity))
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("(-inf, 1.5]", "(1.5, 2.5]", "(2.5, inf]"))
    // without include_breaks: 2 columns
    assert(Stats.cutFrame(d, "x", Seq(1.5, 2.5)).names ==
      Seq("values", "category"))
    // left_closed flips the interval
    val lc = Stats.cutFrame(d, "x", Seq(2.0), leftClosed = true)
    assert(lc.sdf.orderBy("values").collect().map(_.getString(1)).toSeq ==
      Seq("[-inf, 2)", "[2, inf)", "[2, inf)"))
  }

  test("qcutFrame matches the reference doctest (series.ex:4995-5002)") {
    // iex> qcut([1.0..5.0], [0.25, 0.75]) → (-inf, 2], (-inf, 2], (2, 4], (2, 4], (4, inf]
    val d = Gdf(Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x"))
    val out = Stats.qcutFrame(d, "x", Seq(0.25, 0.75))
    assert(out.sdf.orderBy("values").collect().map(_.getString(1)).toSeq ==
      Seq("(-inf, 2]", "(-inf, 2]", "(2, 4]", "(2, 4]", "(4, inf]"))
    // duplicate breaks rejected unless allowed
    val flat = Gdf(Seq(1.0, 1.0, 1.0, 9.0).toDF("x"))
    intercept[IllegalArgumentException] {
      Stats.qcutFrame(flat, "x", Seq(0.25, 0.5))
    }
    assert(Stats.qcutFrame(flat, "x", Seq(0.25, 0.5), allowDuplicates = true)
      .sdf.count() == 4)
  }

  test("qcut uses exact quantile breaks") {
    val d = Gdf((1 to 8).map(_.toDouble).toDF("v"))
    val c = d.sdf.select(F.col("v"),
      Stats.qcut(d, "v", Seq(0.5), Seq("bottom", "top")).as("b"))
    val half = c.collect().map(r => r.getString(1)).toSeq
    assert(half == Seq("bottom", "bottom", "bottom", "bottom",
      "top", "top", "top", "top"))
  }

  test("modeBy tie-break works on STRING values (the numeric-negate trick " +
      "would null-cast them and pick arbitrarily)") {
    val d = Gdf(Seq((1L, "b"), (1L, "a"), (2L, "z"), (2L, "z"), (2L, "y"))
      .toDF("g", "city"))
    val m = Stats.modeBy(d, Seq("g"), "city")
    val rows = m.sdf.orderBy("g").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "z")))
  }
}
