package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Join semantics incl. suffixing, nulls_equal, outer key handling, and the
  * as-of join strategies (reference data_frame.ex:5137-5580). */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Gdf(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv"))
  private def right = Gdf(Seq((2L, "x"), (3L, "y"), (4L, "z")).toDF("k", "rv"))

  test("inner join merges keys, keeps left name") {
    val j = Joins.join(left, right, Seq("k" -> "k"), "inner")
    assert(j.names == Seq("k", "lv", "rv"))
    assert(col1[Long](j.sdf.orderBy("k"), "k") == Seq(2L, 3L))
  }

  test("left join keeps unmatched with nulls") {
    val j = Joins.join(left, right, Seq("k" -> "k"), "left")
    assert(j.sdf.count() == 3)
    assert(j.sdf.filter(F.col("rv").isNull).count() == 1)
  }

  test("right join keeps right key name") {
    val j = Joins.join(left, right, Seq("k" -> "k"), "right")
    assert(j.names.contains("k"))
    assert(j.sdf.count() == 3)
    assert(j.sdf.filter(F.col("lv").isNull).count() == 1)
  }

  test("outer join keeps both key columns, right suffixed (doctest 5196)") {
    val j = Joins.join(left, right, Seq("k" -> "k"), "outer")
    assert(j.names.contains("k") && j.names.contains("k_right"))
    assert(j.sdf.count() == 4)
  }

  test("semi and anti joins") {
    assert(Joins.join(left, right, Seq("k" -> "k"), "semi").sdf.count() == 2)
    val a = Joins.join(left, right, Seq("k" -> "k"), "anti")
    assert(col1[Long](a.sdf, "k") == Seq(1L))
  }

  test("cross join") {
    val j = Joins.join(left, right, Seq.empty[(String, String)], "cross")
    assert(j.sdf.count() == 9)
  }

  test("non-key clash gets _right suffix") {
    val r2 = Gdf(Seq((2L, "x")).toDF("k", "lv"))
    val j = Joins.join(left, r2, Seq("k" -> "k"), "inner")
    assert(j.names == Seq("k", "lv", "lv_right"))
  }

  test("nullsEqual matches null keys (reference nulls_equal)") {
    val l = Gdf(df(schema("k" -> LongType, "lv" -> StringType),
      Seq(null, "a"), Seq(1L, "b")))
    val r = Gdf(df(schema("k" -> LongType, "rv" -> StringType),
      Seq(null, "x"), Seq(1L, "y")))
    assert(Joins.join(l, r, Seq("k" -> "k"), "inner").sdf.count() == 1)
    assert(Joins.join(l, r, Seq("k" -> "k"), "inner",
      nullsEqual = true).sdf.count() == 2)
  }

  test("cross-name key pairs [a: d]") {
    val r2 = Gdf(Seq((2L, "x")).toDF("kk", "rv"))
    val j = Joins.join(left, r2, Seq("k" -> "kk"), "inner")
    assert(j.sdf.count() == 1)
    assert(j.names == Seq("k", "lv", "rv"))
  }

  private def trades = Gdf(Seq(
    ("A", 3L, 100.0), ("A", 7L, 101.0), ("B", 5L, 50.0))
    .toDF("sym", "t", "price"))
  private def quotes = Gdf(Seq(
    ("A", 2L, 99.0), ("A", 6L, 100.5), ("B", 8L, 49.0))
    .toDF("sym", "t", "quote"))

  test("asof backward with by") {
    val j = Joins.joinAsof(trades, quotes, "t", "t", by = Seq("sym"))
    val rows = j.sdf.orderBy("sym", "t").collect()
    assert(rows.map(r => Option(r.getAs[Any]("quote"))).toSeq ==
      Seq(Some(99.0), Some(100.5), None))
  }

  test("asof forward") {
    val j = Joins.joinAsof(trades, quotes, "t", "t", by = Seq("sym"),
      strategy = "forward")
    val rows = j.sdf.orderBy("sym", "t").collect()
    assert(rows.map(r => Option(r.getAs[Any]("quote"))).toSeq ==
      Seq(Some(100.5), None, Some(49.0)))
  }

  test("asof nearest picks closer side") {
    val j = Joins.joinAsof(trades, quotes, "t", "t", by = Seq("sym"),
      strategy = "nearest")
    val rows = j.sdf.orderBy("sym", "t").collect()
    // A t=3: backward(2)=99 dist 1, forward(6) dist 3 → 99
    // A t=7: backward(6)=100.5 dist 1 → 100.5; B t=5: forward(8)=49 dist 3
    assert(rows.map(r => r.getAs[Double]("quote")).toSeq ==
      Seq(99.0, 100.5, 49.0))
  }

  test("saltedJoin equals plain join results") {
    val l = Gdf((1 to 100).map(i => (i.toLong % 3, i.toLong)).toDF("k", "lv"))
    val r = Gdf(Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv"))
    val plain = Joins.join(l, r, Seq("k" -> "k"), "inner")
      .sdf.orderBy("lv").collect().toSeq
    val salted = Joins.saltedJoin(l, r, Seq("k" -> "k"), "inner", buckets = 4)
      .sdf.orderBy("lv").collect().toSeq
    assert(salted == plain)
  }

  test("asof equal keys match backward (right sorts before left)") {
    val l = Gdf(Seq(("A", 5L)).toDF("sym", "t"))
    val r = Gdf(Seq(("A", 5L, 1.0)).toDF("sym", "t", "q"))
    val j = Joins.joinAsof(l, r, "t", "t", by = Seq("sym"))
    assert(j.sdf.collect()(0).getAs[Double]("q") == 1.0)
  }

  test("rangeJoin matches the non-equi condition, bins crossing boundaries") {
    val points = Gdf(Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 25L), (5L, 100L))
      .toDF("pid", "p"))
    // widths vary; interval (20,10..22) spans three bins at width 8
    val intervals = Gdf(Seq((10L, 0L, 7L), (20L, 10L, 22L), (30L, 24L, 26L))
      .toDF("iid", "lo", "hi"))
    val got = Joins.rangeJoin(points, intervals, "p", "lo", "hi", binWidth = 8)
      .sdf.select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((10L, 1L), (20L, 2L), (20L, 3L), (30L, 4L)))
    // inclusive at both ends
    val edge = Joins.rangeJoin(
      Gdf(Seq((1L, 10L), (2L, 22L)).toDF("pid", "p")),
      Gdf(Seq((9L, 10L, 22L)).toDF("iid", "lo", "hi")), "p", "lo", "hi", 8)
    assert(edge.sdf.count() == 2)
    // the plan is a hash join on the bin, never a nested loop
    val plan = Joins.rangeJoin(points, intervals, "p", "lo", "hi", 8)
      .sdf.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    // degenerate wide interval fails loudly instead of exploding the shuffle
    val wide = Joins.rangeJoin(points,
      Gdf(Seq((1L, 0L, 100000L)).toDF("iid", "lo", "hi")),
      "p", "lo", "hi", binWidth = 8, maxBinsPerInterval = 16)
    val ex = intercept[Exception] { wide.sdf.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        (if (x.getCause ne x) messages(x.getCause) else Nil))
    assert(messages(ex).exists(_.contains("rangeJoin")), ex.toString)
  }
}
