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

  test("asof null keys never match (grouped path): null-key right rows " +
      "are masked from the carry, null-key left rows match nothing") {
    val l = Gdf(Seq(("A", Some(5L)), ("A", None))
      .toDF("sym", "t"))
    val r = Gdf(Seq(("A", None: Option[Long], 9.0), ("A", Some(3L), 1.0))
      .toDF("sym", "t", "q"))
    val back = Joins.joinAsof(l, r, "t", "t", by = Seq("sym"))
      .sdf.orderBy(F.col("t").asc_nulls_last).collect()
    assert(Option(back(0).getAs[Any]("q")) == Some(1.0)) // t=5 → q@3
    assert(Option(back(1).getAs[Any]("q")).isEmpty)      // t=null → none
    // forward: no right key ≥ 5, and the null-key rows must not pair up
    val fwd = Joins.joinAsof(l, r, "t", "t", by = Seq("sym"),
      strategy = "forward")
      .sdf.orderBy(F.col("t").asc_nulls_last).collect()
    assert(Option(fwd(0).getAs[Any]("q")).isEmpty)
    assert(Option(fwd(1).getAs[Any]("q")).isEmpty)
  }

  test("by-less asof: range-partitioned carry is correct across partition " +
      "boundaries (sparse right side, null keys, all strategies)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      // 501 left rows over 7 partitions; only 4 right rows, so most
      // partitions have NO right rows and every match crosses partition
      // boundaries through the seed carry
      val rightRows = Seq((10L, "a"), (700L, "b"), (701L, "c"), (1400L, "d"))
      val l = Gdf(((0 until 500).map(i => (i.toLong, Some(i * 3L))) :+
        (999L, None: Option[Long])).toDF("lid", "t"))
      val r = Gdf((rightRows.map { case (k, v) => (Some(k), v) } :+
        (None: Option[Long], "z")).toDF("t", "v"))
      def brute(t: Option[Long], strat: String): Option[String] = t.flatMap {
        x =>
          val back = rightRows.filter(_._1 <= x).sortBy(_._1).lastOption
          val fwd = rightRows.filter(_._1 >= x).sortBy(_._1).headOption
          strat match {
            case "backward" => back.map(_._2)
            case "forward" => fwd.map(_._2)
            case "nearest" => (back, fwd) match {
              case (Some(b), Some(f)) =>
                Some(if (f._1 - x < x - b._1) f._2 else b._2)
              case (b, f) => b.orElse(f).map(_._2)
            }
          }
      }
      for (strat <- Seq("backward", "forward", "nearest")) {
        val got = Joins.joinAsof(l, r, "t", "t", strategy = strat)
          .sdf.orderBy(F.col("lid")).collect()
          .map(row => (row.getAs[Long]("lid"),
            Option(row.getAs[Any]("v")).map(_.toString))).toSeq
        val want = got.map { case (lid, _) =>
          val t = if (lid == 999L) None else Some(lid * 3L)
          (lid, brute(t, strat))
        }
        assert(got == want, s"strategy $strat diverged from brute force")
      }
      // and the plan never funnels the union through one task: the big
      // window partitions by __pid, not by nothing
      val plan = Joins.joinAsof(l, r, "t", "t")
        .sdf.queryExecution.executedPlan.toString
      assert(plan.contains("__pid"), plan)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("rangeJoin drops null-bound intervals (inner semantics, no " +
      "raise_error) and suffixes clashing columns") {
    val points = Gdf(Seq((1L, 5L, "p"), (2L, 100L, "q"))
      .toDF("pid", "p", "tag"))
    val intervals = Gdf(Seq(
      (10L, Some(0L), Some(7L), "i"),
      (20L, None: Option[Long], Some(50L), "j"))
      .toDF("iid", "lo", "hi", "tag"))
    val out = Joins.rangeJoin(points, intervals, "p", "lo", "hi", binWidth = 8)
    assert(out.names.contains("tag") && out.names.contains("tag_right"))
    val rows = out.sdf.select("iid", "pid", "tag", "tag_right").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq((10L, 1L, "p", "i")))
  }

  test("saltedJoin propagates groups and logical dtypes like join") {
    val l = new Gdf(Seq((1L, "a"), (2L, "b")).toDF("k", "lv"),
      groups = Seq("k"), logical = Map("lv" -> DType.Category))
    val r = Gdf(Seq((1L, "x")).toDF("k", "rv"))
    val j = Joins.saltedJoin(l, r, Seq("k" -> "k"), buckets = 2)
    assert(j.groups == Seq("k"))
    assert(j.logical.get("lv").contains(DType.Category))
  }

  test("cross join suffixes clashing columns like the equi path") {
    val l = Gdf(Seq((1L, "a")).toDF("k", "x"))
    val r = new Gdf(Seq((9L, "z")).toDF("k", "rv"),
      logical = Map("k" -> DType.U(32)))
    val j = Joins.join(l, r, Seq.empty, "cross")
    assert(j.names == Seq("k", "x", "k_right", "rv"))
    // and right's logical annotation follows the suffixed name instead of
    // silently overriding left's k
    assert(j.logical.get("k").isEmpty)
    assert(j.logical.get("k_right").contains(DType.U(32)))
    // downstream references stay unambiguous
    assert(j.sdf.select("k").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("dropped join keys cannot leak stale logical dtypes over the " +
      "surviving column") {
    val l = Gdf(Seq((1L, "a")).toDF("id", "lv"))
    val r = new Gdf(Seq((1L, "x")).toDF("id", "rv"),
      logical = Map("id" -> DType.U(32)))
    // inner: right's id column is dropped — its u32 annotation must not
    // re-describe left's plain i64 id
    assert(Joins.join(l, r, Seq("id" -> "id"), "inner")
      .logical.get("id").isEmpty)
    // right join: left's id is dropped, right's survives with its dtype
    assert(Joins.join(l, r, Seq("id" -> "id"), "right")
      .logical.get("id").contains(DType.U(32)))
    // semi/anti output is the left side only — no right entries at all
    assert(Joins.join(l, r, Seq("id" -> "id"), "semi").logical.isEmpty)
  }

  test("asof nearest works on DateType keys and stays exact past 2^53") {
    val d = java.sql.Date.valueOf(_: String)
    val l = Gdf(Seq(Tuple1(d("2024-03-10"))).toDF("ts"))
    val r = Gdf(Seq((d("2024-03-01"), "early"), (d("2024-03-12"), "late"))
      .toDF("ts", "tag"))
    val got = Joins.joinAsof(l, r, "ts", "ts", strategy = "nearest")
      .sdf.select("tag").collect().map(_.getString(0)).toSeq
    assert(got == Seq("late")) // 2 days beats 9 days
    // int64 keys beyond 2^53: backward candidate is 3 ns closer but the
    // double route rounded both distances to equality and kept backward —
    // exact long math must pick forward
    val base = 1700000000000000000L // epoch ns scale, > 2^53
    val l2 = Gdf(Seq(Tuple1(base)).toDF("k"))
    val r2 = Gdf(Seq((base - 1027L, "b"), (base + 1024L, "f"))
      .toDF("k", "tag"))
    val got2 = Joins.joinAsof(l2, r2, "k", "k", strategy = "nearest")
      .sdf.select("tag").collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("f"))
    // non-orderable-distance keys are loud
    val ls = Gdf(Seq(Tuple1("a")).toDF("k"))
    val rs = Gdf(Seq(("a", "x")).toDF("k", "tag"))
    intercept[IllegalArgumentException] {
      Joins.joinAsof(ls, rs, "k", "k", strategy = "nearest")
    }
  }

  test("loud argument contracts: empty keys, zero buckets, suffix-target " +
      "collisions, reserved temp names") {
    val l = Gdf(Seq((1L, "a")).toDF("k", "x"))
    val r = Gdf(Seq((1L, "y")).toDF("k", "x"))
    intercept[IllegalArgumentException] {
      Joins.join(l, r, Seq.empty[(String, String)], "inner")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(l, r, Seq("k" -> "k"), buckets = 0)
    }
    // x clashes and x_right already exists → duplicate columns refused
    val lr = Gdf(Seq((1L, "a", "old")).toDF("k", "x", "x_right"))
    intercept[IllegalArgumentException] {
      Joins.join(lr, r, Seq("k" -> "k"), "inner")
    }
    intercept[IllegalArgumentException] {
      Joins.joinAsof(lr, r, "k", "k") // withColumn would CLOBBER x_right
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(Gdf(Seq((1L, 2)).toDF("k", "__salt")), r,
        Seq("k" -> "k"))
    }
    intercept[IllegalArgumentException] {
      Joins.joinAsof(Gdf(Seq((1L, 2)).toDF("k", "__side")), r, "k", "k")
    }
  }
}
