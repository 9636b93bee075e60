package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Series expression vocabulary (reference series.ex doctest semantics). */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def nums = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")

  test("comparison and boolean ops") {
    val d = nums.filter((gcol("x") > glit(1.0) && gcol("x") <= glit(3.0)).col)
    assert(col1[Double](d, "x") == Seq(2.0, 3.0))
    val e = nums.filter((!(gcol("x") === glit(2.0))).col)
    assert(col1[Double](e, "x") == Seq(1.0, 3.0, 4.0))
  }

  test("isIn membership") {
    val d = nums.filter(gcol("x").isIn(Seq(1.0, 4.0)).col)
    assert(col1[Double](d, "x") == Seq(1.0, 4.0))
  }

  test("arithmetic: divide always yields float, quotient/remainder int") {
    val d = Seq((7L, 2L)).toDF("a", "b")
      .select(
        (gcol("a") / gcol("b")).col.as("div"),
        gcol("a").quotient(gcol("b")).col.as("quot"),
        gcol("a").remainder(gcol("b")).col.as("rem"))
    val r = d.collect()(0)
    assert(r.getDouble(0) == 3.5)
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L)
  }

  test("null/NaN tests distinguish nil from NaN (reference series.ex:6374)") {
    val d = df(schema("x" -> DoubleType),
      Seq(1.0), Seq(Double.NaN), Seq(null), Seq(Double.PositiveInfinity))
    assert(d.filter(gcol("x").isNil.col).count() == 1)
    assert(d.filter(gcol("x").isNan.col).count() == 1)
    assert(d.filter(gcol("x").isInfinite.col).count() == 1)
    // finite: only 1.0 (nil → nil like the reference, filtered out)
    assert(d.filter(gcol("x").isFinite.col).count() == 1)
  }

  test("clip") {
    val d = nums.select(gcol("x").clip(glit(1.5), glit(3.5)).col.as("c"))
    assert(col1[Double](d, "c") == Seq(1.5, 2.0, 3.0, 3.5))
    // nil stays nil (least/greatest SKIP nulls — unguarded, a null value
    // silently became the max bound)
    val n = df(schema("x" -> DoubleType), Seq(5.0), Seq(null))
      .select(Series(F.col("x")).clip(glit(0.0), glit(3.0)).col.as("c"))
    assert(n.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(3.0), None))
  }

  test("reference error semantics: /0 → infinity, quotient by 0 → nil, " +
      "remainder by 0 → nil, quotient exact beyond 2^53") {
    val d = Seq((7L, 0L)).toDF("a", "b").select(
      (gcol("a") / gcol("b")).col.as("div"),
      gcol("a").quotient(gcol("b")).col.as("quot"),
      gcol("a").remainder(gcol("b")).col.as("rem"))
    val r = d.collect()(0)
    assert(r.getDouble(0).isPosInfinity) // Polars float 7/0
    assert(r.isNullAt(1) && r.isNullAt(2)) // reference: nil on zero rhs
    // exact long division: the old double route returned 9007199254740992
    val big = Seq((9007199254740993L, 1L)).toDF("a", "b")
      .select(gcol("a").quotient(gcol("b")).col.as("q"))
    assert(big.collect()(0).getLong(0) == 9007199254740993L)
  }

  test("fillMissing and coalesce") {
    val d = df(schema("x" -> DoubleType), Seq(1.0), Seq(null))
    assert(col1[Double](d.select(
      Series(F.col("x")).fillMissing(-1.0).col.as("f")), "f") == Seq(1.0, -1.0))
  }

  test("cast via DType") {
    val d = nums.select(gcol("x").cast(DType.S(64)).col.as("i"))
    assert(d.schema("i").dataType == LongType)
    assert(col1[Long](d, "i") == Seq(1L, 2L, 3L, 4L))
  }

  test("math fns") {
    val d = Seq(-2.5).toDF("x").select(
      gcol("x").abs.col.as("abs"),
      gcol("x").floor.col.as("fl"),
      gcol("x").ceil.col.as("ce"),
      gcol("x").round(0).col.as("ro"))
    val r = d.collect()(0)
    assert(r.getDouble(0) == 2.5 && r.getLong(1) == -3L && r.getLong(2) == -2L)
  }

  test("duration arithmetic (series/duration_test.exs): dt-dt, +duration, date+duration") {
    import java.sql.{Date, Timestamp}
    val d = df(schema("a" -> TimestampType, "b" -> TimestampType,
        "d" -> DateType),
      Seq(Timestamp.valueOf("2024-01-02 02:00:00"),
        Timestamp.valueOf("2024-01-01 00:00:00"), Date.valueOf("2024-03-01")))
    // datetime - datetime -> duration dtype (reference duration_test "from subtraction")
    val withDur = d.withColumn("dur", (gcol("a") - gcol("b")).col)
    assert(DType.fromSpark(withDur.schema("dur").dataType) ==
      DType.Duration(DType.Us))
    // duration + datetime restores the original instant
    val back = withDur.withColumn("a2", (gcol("dur") + gcol("b")).col)
    assert(back.select("a2").head.getTimestamp(0) ==
      Timestamp.valueOf("2024-01-02 02:00:00"))
    // duration + duration
    val dd = withDur.withColumn("dd", (gcol("dur") + gcol("dur")).col)
      .select(F.col("dd").cast("string")).head.getString(0)
    assert(dd.contains("2 04:00:00"), dd) // 2 days 4 hours
    // date + duration -> date shifted (whole days)
    val shifted = d.withColumn("d2",
      (gcol("d") + Series(F.expr("INTERVAL '1' DAY"))).col)
    assert(shifted.select("d2").head.get(0).toString == "2024-03-02")
    // scalar multiply: duration * 2 (reference "multiply by integer")
    val twice = withDur.withColumn("tw", (gcol("dur") * glit(2)).col)
      .select(F.col("tw").cast("string")).head.getString(0)
    assert(twice.contains("2 04:00:00"), twice)
  }
  test("NaN/nil edges: isNan propagates nil (like isInfinite/isFinite), " +
      "clip keeps NaN instead of clamping it to the max bound, negation " +
      "and aggregate clip bounds keep the isAgg flag") {
    import org.apache.spark.sql.{functions => F}
    val d = df(schema("v" -> DoubleType),
      Seq(1.0), Seq(null), Seq(Double.NaN), Seq(100.0))
    val out = d.select(
      Series(F.col("v")).isNan.col.as("n"),
      Series(F.col("v")).clip(Series(F.lit(10.0)), Series(F.lit(40.0)))
        .col.as("c"))
      .collect().map(r => (Option(r.getAs[Any](0)), Option(r.getAs[Any](1))))
    assert(out(0) == (Some(false), Some(10.0)))
    assert(out(1) == (None, None)) // nil → nil on both
    assert(out(2)._1 == Some(true))
    assert(out(2)._2.exists(_.asInstanceOf[Double].isNaN),
      out(2).toString) // NaN survives clip (Spark's greatest would clamp)
    assert(out(3) == (Some(false), Some(40.0)))
    // -sum(x) stays an aggregate: the implicit Column round trip dropped
    // the flag and summarise refused a valid aggregate
    val g = Gdf(Seq(1.0, 2.0).toDF("x"))
      .summarise("neg" -> { implicit c: Ctx =>
        -graft.exprs.sum(gcol("x")) })
    assert(g.sdf.collect()(0).getDouble(0) == -3.0)
    // an aggregate clip BOUND keeps the flag too
    val gb = Gdf(Seq(1.0, 50.0).toDF("x"))
      .summarise("m" -> { implicit c: Ctx =>
        Series(F.lit(45.0)).clip(graft.exprs.min(gcol("x")),
          graft.exprs.max(gcol("x"))) })
    assert(gb.sdf.collect()(0).getDouble(0) == 45.0)
  }
}

/** DType lattice (reference shared.ex:52-114, series.ex:96-112). */
class DTypeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import DType.{promote, fromSpark, S, U, Bool, Str, Binary, Date, Null,
    Struct, List => DList, F => DF}
  test("promotion lattice") {
    assert(promote(S(32), S(64)) == S(64))
    // int ⊕ float keeps the float's width (shared.ex:397-398)
    assert(promote(S(64), DF(32)) == DF(32))
    assert(promote(DF(32), U(16)) == DF(32))
    assert(promote(DF(32), DF(32)) == DF(32))
    assert(promote(DF(32), DF(64)) == DF(64))
    assert(promote(U(32), U(16)) == U(32))
    assert(promote(S(8), U(8)) == S(16))
    assert(promote(Null, S(64)) == S(64))
  }
  test("unsigned widening (reference series.ex:96-112)") {
    assert(U(8).spark == ShortType)
    assert(U(32).spark == LongType)
    assert(U(64).spark == DecimalType(20, 0))
  }
  test("spark bimap roundtrip on exact types") {
    val exact = Seq(Bool, S(8), S(16), S(32), S(64), DF(32), DF(64), Str,
      Binary, Date, DList(S(64)), Struct(Seq("a" -> Str)))
    exact.foreach(t => assert(fromSpark(t.spark) == t))
  }

  test("iotype (series.ex:1294-1300, shared.ex:498-511)") {
    import DType.{iotype, Category, Decimal, Time, Duration, Us,
      NaiveDatetime}
    assert(iotype(S(32)) == Some(('s', 32)))
    assert(iotype(U(8)) == Some(('u', 8)))
    assert(iotype(DF(64)) == Some(('f', 64)))
    assert(iotype(Bool) == Some(('u', 8)))
    assert(iotype(Date) == Some(('s', 32)))
    assert(iotype(Time) == Some(('s', 64)))
    assert(iotype(NaiveDatetime(Us)) == Some(('s', 64)))
    assert(iotype(Duration(Us)) == Some(('s', 64)))
    assert(iotype(Category) == Some(('u', 32)))
    assert(iotype(Decimal(20, 2)) == Some(('s', 128)))
    assert(iotype(Str).isEmpty && iotype(Binary).isEmpty)
    assert(iotype(DList(S(64))).isEmpty)
  }

}
