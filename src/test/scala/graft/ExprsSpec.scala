package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import graft.exprs._

/** Window/positional/aggregation expression ops (SURVEY §2.5-2.6). */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  // one group 'a' = [3,1,2], one group 'b' = [10,20]
  private def base = Gdf(Seq(
    ("a", 0L, 3.0), ("a", 1L, 1.0), ("a", 2L, 2.0),
    ("b", 0L, 10.0), ("b", 1L, 20.0)).toDF("g", "i", "v"))
    .groupBy("g").ordered(F.col("i"))

  private def vals(g: Gdf, c: String): Seq[Double] =
    g.sdf.orderBy("g", "i").collect().map(_.getAs[Double](c)).toSeq

  test("shift lag and lead") {
    val d = base.mutateWith { implicit c => Seq(
      "prev" -> shift(gcol("v"), 1), "next" -> shift(gcol("v"), -1)) }
    val rows = d.sdf.orderBy("g", "i").collect()
    assert(rows.map(r => Option(r.getAs[Any]("prev"))).toSeq ==
      Seq(None, Some(3.0), Some(1.0), None, Some(10.0)))
    assert(rows.map(r => Option(r.getAs[Any]("next"))).toSeq ==
      Seq(Some(1.0), Some(2.0), None, Some(20.0), None))
  }

  test("cumulative sum/min/max, and reverse variant") {
    val d = base.mutateWith { implicit c => Seq(
      "cs" -> cumulativeSum(gcol("v")),
      "cm" -> cumulativeMin(gcol("v")),
      "cx" -> cumulativeMax(gcol("v")),
      "csr" -> cumulativeSum(gcol("v"), reverse = true)) }
    assert(vals(d, "cs") == Seq(3.0, 4.0, 6.0, 10.0, 30.0))
    assert(vals(d, "cm") == Seq(3.0, 1.0, 1.0, 10.0, 10.0))
    assert(vals(d, "cx") == Seq(3.0, 3.0, 3.0, 10.0, 20.0))
    assert(vals(d, "csr") == Seq(6.0, 3.0, 2.0, 30.0, 20.0))
  }

  test("cumulative product with zero and negative handling") {
    val d = Gdf(Seq(("a", 0L, 2.0), ("a", 1L, -3.0), ("a", 2L, 0.0),
      ("a", 3L, 5.0)).toDF("g", "i", "v"))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq("cp" -> cumulativeProduct(gcol("v"))) }
    val got = vals(d, "cp")
    assert(approx(got(0), 2.0) && approx(got(1), -6.0))
    assert(got(2) == 0.0 && got(3) == 0.0)
  }

  test("rolling window mean with minPeriods and center") {
    val d = base.mutateWith { implicit c => Seq(
      "m" -> windowMean(gcol("v"), 2),
      "m2" -> windowMean(gcol("v"), 2, minPeriods = 2),
      "mc" -> windowMean(gcol("v"), 3, center = true)) }
    assert(vals(d, "m") == Seq(3.0, 2.0, 1.5, 10.0, 15.0))
    val m2 = d.sdf.orderBy("g", "i").collect()
      .map(r => Option(r.getAs[Any]("m2"))).toSeq
    assert(m2 == Seq(None, Some(2.0), Some(1.5), None, Some(15.0)))
    assert(vals(d, "mc") == Seq(2.0, 2.0, 1.5, 15.0, 15.0))
  }

  test("weighted rolling window (reference weights option)") {
    val d = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0))
      .toDF("g", "i", "v")).groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "ws" -> windowSum(gcol("v"), 2, weights = Seq(0.5, 1.0))) }
    // window [1,2]→0.5*1+1*2=2.5; [2,3]→0.5*2+1*3=4.0; partial first row
    // aligns to trailing weights: [1]→1.0*1
    assert(vals(d, "ws") == Seq(1.0, 2.5, 4.0))
  }

  test("weighted window: centered tail truncation and interior nulls get " +
      "POSITION weights; weighted mean divides by USED weights " +
      "(reference window_mean doctest)") {
    // centered size-3, weights [10, 1, 0.1]: at the LAST row the future
    // slot is missing — present values sit at window positions 1-2 and
    // must take weights [10, 1], not the trailing [1, 0.1]
    val d = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 4.0))
      .toDF("g", "i", "v")).groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "wc" -> windowSum(gcol("v"), 3, center = true,
          weights = Seq(10.0, 1.0, 0.1))) }
    // row0: [_,1,2] → 1*1 + 2*0.1 = 1.2; row1: [1,2,4] → 10+2+0.4 = 12.4;
    // row2 (tail): [2,4,_] → 2*10 + 4*1 = 24.0 (trailing-aligned would
    // give 2*1 + 4*0.1 = 2.4)
    assert(vals(d, "wc") == Seq(1.2, 12.4, 24.0))
    // interior null: the null row keeps its POSITION, so its neighbors
    // keep their weights
    val dn = Gdf(Seq(("a", 0L, Some(1.0)), ("a", 1L, None),
      ("a", 2L, Some(4.0))).toDF("g", "i", "v"))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "ws" -> windowSum(gcol("v"), 3, weights = Seq(10.0, 1.0, 0.1))) }
    // row2 window [1, null, 4] → 1*10 + 4*0.1 = 10.4 (null-compacted
    // trailing alignment would give 1*1 + 4*0.1 = 1.4)
    assert(vals(dn, "ws").last == 10.4)
    // reference doctest: window_mean([1..10], 2, weights [0.25, 0.75])
    // starts 1.0, 1.75, 2.75, ... — the partial first window divides by
    // the USED weight (0.75), not the full vector sum
    val dm = Gdf((1 to 10).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "i", "v")).groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "wm" -> windowMean(gcol("v"), 2, weights = Seq(0.25, 0.75))) }
    assert(vals(dm, "wm") ==
      Seq(1.0, 1.75, 2.75, 3.75, 4.75, 5.75, 6.75, 7.75, 8.75, 9.75))
  }

  test("weighted window edges: zero weight sums take the IEEE route " +
      "(NaN/±inf, the Series./ contract), all-null windows are null like " +
      "the unweighted path") {
    val d = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 1.0)).toDF("g", "i", "v"))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "wm" -> windowMean(gcol("v"), 2, weights = Seq(1.0, -1.0))) }
    val got = vals(d, "wm")
    // full window: dot = 1 - 1 = 0, used = 0 → 0/0 = NaN (not null);
    // partial first row uses only the trailing weight -1: -1/-1 = 1
    assert(got.head == 1.0)
    assert(got.last.asInstanceOf[Double].isNaN, got.toString)
    // minPeriods=0 + a window with NO present values: null, matching the
    // unweighted sum (the fold's 0.0 seed must not leak out)
    val dn = Gdf(Seq(("a", 0L, Option.empty[Double]),
      ("a", 1L, Some(2.0))).toDF("g", "i", "v"))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "w0" -> windowSum(gcol("v"), 1, minPeriods = 0,
          weights = Seq(3.0)),
        "u0" -> windowSum(gcol("v"), 1, minPeriods = 0),
        // weighted MEAN too: the empty window is null (not the fold
        // seeds' 0.0/0.0 = NaN) — NaN remains reserved for genuine
        // zero-weight-sum windows with present values
        "m0" -> windowMean(gcol("v"), 1, minPeriods = 0,
          weights = Seq(3.0))) }
    val rows = dn.sdf.orderBy("i").collect()
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4) && rows(0).isNullAt(5),
      rows(0).toString)
    assert(rows(1).getDouble(3) == 6.0 && rows(1).getDouble(4) == 2.0 &&
      rows(1).getDouble(5) == 2.0)
  }

  test("ungrouped compound aggregates (product) run as ONE scalar " +
      "subquery, not one per inner aggregate") {
    val d = Gdf(Seq(1.0, 2.0, -3.0).toDF("v"))
      .mutateWith { implicit c => Seq(
        "p" -> graft.exprs.product(gcol("v"))) }
    assert(d.sdf.collect().forall(_.getDouble(1) == -6.0))
    val plan = d.sdf.queryExecution.executedPlan.toString
    // one subquery reference (possibly shown twice as definition+ref);
    // three independent subqueries would print three distinct ids
    val ids = "subquery#\\d+".r.findAllIn(plan).toSeq.distinct
    assert(ids.size <= 1, s"$ids\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("product and skew(bias=false) work in grouped-mutate position " +
      "(each inner aggregate gets its own window)") {
    val d = Gdf(Seq(("a", 0L, 2.0), ("a", 1L, -3.0), ("b", 2L, 4.0))
      .toDF("g", "i", "v")).groupBy("g")
      .mutateWith { implicit c => Seq(
        "p" -> product(gcol("v"))) }
    assert(vals(d, "p") == Seq(-6.0, -6.0, 4.0))
    val sk = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 4.0),
      ("a", 3L, 8.0)).toDF("g", "i", "v")).groupBy("g")
      .mutateWith { implicit c => Seq(
        "s" -> skew(gcol("v"), bias = false).round(6)) }
    // G1 = g1·√(n(n−1))/(n−2) over [1,2,4,8] = 1.1376244
    assert(vals(sk, "s").forall(v => math.abs(v - 1.1376244) < 1e-5))
  }

  test("rank methods min/max/dense/ordinal/average") {
    val d = Gdf(Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0))
      .toDF("g", "v")).groupBy("g")
    val r = d.mutateWith { implicit c => Seq(
      "rmin" -> rank(gcol("v"), "min"),
      "rmax" -> rank(gcol("v"), "max"),
      "rdense" -> rank(gcol("v"), "dense"),
      "rord" -> rank(gcol("v"), "ordinal"),
      "ravg" -> rank(gcol("v"), "average")) }
    val rows = r.sdf.orderBy("v").collect()
    assert(rows.map(_.getAs[Int]("rmin")).toSeq == Seq(1, 2, 2, 4))
    assert(rows.map(_.getAs[Long]("rmax")).toSeq == Seq(1L, 3L, 3L, 4L))
    assert(rows.map(_.getAs[Int]("rdense")).toSeq == Seq(1, 2, 2, 3))
    assert(rows.map(_.getAs[Int]("rord")).toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_.getAs[Double]("ravg")).toSeq == Seq(1.0, 2.5, 2.5, 4.0))
  }

  test("rank :random breaks ties uniformly but stays a permutation (series.ex:2063)") {
    val d = Gdf(Seq.fill(20)("a").zipWithIndex
      .map { case (g, i) => (g, (i % 4).toDouble) }.toDF("g", "v")).groupBy("g")
    val r = d.mutateWith { implicit c => Seq(
      "rr" -> rank(gcol("v"), "random", seed = 7L)) }
    val ranks = r.sdf.collect().map(_.getAs[Int]("rr")).toSeq.sorted
    assert(ranks == (1 to 20).toList) // permutation: no duplicate ranks on ties
    // seeded: same seed reproduces
    val r2 = d.mutateWith { implicit c => Seq(
      "rr" -> rank(gcol("v"), "random", seed = 7L)) }
    assert(r.sdf.orderBy("v", "rr").collect().map(_.getInt(2)).toSeq ==
      r2.sdf.orderBy("v", "rr").collect().map(_.getInt(2)).toSeq)
  }

  test("peaks max/min with boundary nulls treated as smaller") {
    val d = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 2.0),
      ("a", 3L, 4.0)).toDF("g", "i", "v"))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "pk" -> peaks(gcol("v"), "max"), "tr" -> peaks(gcol("v"), "min")) }
    val rows = d.sdf.orderBy("i").collect()
    assert(rows.map(_.getAs[Boolean]("pk")).toSeq ==
      Seq(false, true, false, true))
    assert(rows.map(_.getAs[Boolean]("tr")).toSeq ==
      Seq(true, false, true, false))
  }

  test("fill strategies forward/backward/mean") {
    val d = Gdf(df(schema("g" -> StringType, "i" -> LongType, "v" -> DoubleType),
      Seq("a", 0L, null), Seq("a", 1L, 2.0), Seq("a", 2L, null),
      Seq("a", 3L, 4.0)))
      .groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq(
        "ff" -> fillMissingStrategy(gcol("v"), "forward"),
        "bf" -> fillMissingStrategy(gcol("v"), "backward"),
        "mf" -> fillMissingStrategy(gcol("v"), "mean")) }
    val rows = d.sdf.orderBy("i").collect()
    assert(rows.map(r => Option(r.getAs[Any]("ff"))).toSeq ==
      Seq(None, Some(2.0), Some(2.0), Some(4.0)))
    assert(rows.map(r => Option(r.getAs[Any]("bf"))).toSeq ==
      Seq(Some(2.0), Some(2.0), Some(4.0), Some(4.0)))
    assert(rows.map(_.getAs[Double]("mf")).toSeq == Seq(3.0, 2.0, 3.0, 4.0))
  }

  test("aggregates: product, mode, argmin/argmax, all/any, nilCount") {
    val d = Gdf(df(
      schema("g" -> StringType, "i" -> LongType, "v" -> DoubleType,
        "b" -> BooleanType),
      Seq("a", 0L, 2.0, true), Seq("a", 1L, -3.0, false),
      Seq("a", 2L, null, true)))
    val r = d.groupBy("g").summariseWith { implicit c => Seq(
      "prod" -> product(gcol("v")),
      "am" -> argmin(gcol("i"), gcol("v")),
      "ax" -> argmax(gcol("i"), gcol("v")),
      "all_b" -> all(gcol("b")), "any_b" -> any(gcol("b")),
      "nils" -> nilCount(gcol("v"))) }.sdf.collect()(0)
    assert(approx(r.getAs[Double]("prod"), -6.0))
    assert(r.getAs[Long]("am") == 1L && r.getAs[Long]("ax") == 0L)
    assert(!r.getAs[Boolean]("all_b") && r.getAs[Boolean]("any_b"))
    assert(r.getAs[Long]("nils") == 1L)
  }

  test("quantile is exact-interpolating (oracle parity §7.3)") {
    implicit val c: Ctx = Ctx(Nil, Nil, windowed = false)
    val d = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = d.agg(quantile(gcol("v"), 0.25).col.as("q")).collect()(0)
    assert(r.getDouble(0) == 1.75) // interpolated, not nearest
  }

  test("skew bias correction (reference series.ex:2908)") {
    implicit val c: Ctx = Ctx(Nil, Nil, windowed = false)
    val d = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val biased = d.agg(skew(gcol("v")).col.as("s")).collect()(0).getDouble(0)
    val unbiased = d.agg(skew(gcol("v"), bias = false).col.as("s"))
      .collect()(0).getDouble(0)
    // scipy.stats.skew([1,2,3,10]) = 1.0182338, bias=False = 1.7636326
    assert(approx(biased, 1.0182337649086284, 1e-9))
    assert(approx(unbiased, 1.763632614803888, 1e-9))
  }

  test("ewmMeanExpr matches pandas ewm(alpha=0.5, adjust=True)") {
    val d = Gdf(Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0))
      .toDF("g", "i", "v")).groupBy("g").ordered(F.col("i"))
      .mutateWith { implicit c => Seq("e" -> ewmMeanExpr(gcol("v"), 0.5)) }
    val got = vals(d, "e")
    val exp = Seq(1.0, 1.6666666666666667, 2.4285714285714284)
    got.zip(exp).foreach { case (g, e) => assert(approx(g, e, 1e-12)) }
  }

  test("iff nested conditionals") {
    val d = Seq(5.0, 15.0, 55.0).toDF("v").select(
      iff(gcol("v") >= glit(50.0), glit("high"),
        iff(gcol("v") >= glit(10.0), glit("mid"), glit("low"))).col.as("b"))
    assert(col1[String](d, "b") == Seq("low", "mid", "high"))
  }

  test("NaN vs null in aggregations (SURVEY §7.4.2: null skipped, NaN propagates)") {
    val d = df(schema("x" -> DoubleType),
      Seq(1.0), Seq(Double.NaN), Seq(null), Seq(3.0))
    implicit val c: Ctx = Ctx(Nil, Nil, windowed = false)
    val r = d.agg(
      sum(Series(F.col("x"))).col.as("s"),
      max(Series(F.col("x"))).col.as("mx"),
      count(Series(F.col("x"))).col.as("n")).head
    assert(r.getDouble(0).isNaN)          // NaN propagates through sum
    assert(r.getDouble(1).isNaN)          // NaN sorts above every double
    assert(r.getLong(2) == 3L)            // null is skipped, NaN is counted
  }

  test("approx aggregates track the exact ones (scale extras)") {
    val d = spark.range(0, 20000)
      .selectExpr("cast(id % 137 as double) as v")
    implicit val c: Ctx = Ctx(Nil, Nil, windowed = false)
    val r = d.agg(
      nDistinct(Series(F.col("v"))).col.as("exact"),
      nDistinctApprox(Series(F.col("v"))).col.as("approx"),
      quantile(Series(F.col("v")), 0.5).col.as("q_exact"),
      quantileApprox(Series(F.col("v")), 0.5).col.as("q_approx")).head
    val (exact, app) = (r.getLong(0), r.getLong(1))
    assert(math.abs(app - exact).toDouble / exact < 0.1, s"$app vs $exact")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 5.0)
  }
}
