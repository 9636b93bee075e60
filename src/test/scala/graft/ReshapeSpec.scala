package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Reshaping verbs (SURVEY §2.7) and concat (§2.4). */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivotLonger wide→long with relaxed numeric cast") {
    val d = Gdf(Seq((1L, 10, 1.5), (2L, 20, 2.5)).toDF("id", "a", "b"))
    val l = Reshape.pivotLonger(d, Seq("a", "b"))
    assert(l.names == Seq("id", "variable", "value"))
    assert(l.sdf.count() == 4)
    // int a relax-cast to double because b is double
    assert(l.schema("value").dataType == DoubleType)
  }

  test("pivotWider long→wide with first-agg semantics") {
    val d = Gdf(Seq(("r1", "x", 1.0), ("r1", "y", 2.0), ("r2", "x", 3.0))
      .toDF("id", "name", "val"))
    val w = Reshape.pivotWider(d, "name", "val")
    assert(w.names == Seq("id", "x", "y"))
    val rows = w.sdf.orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 2.0)
    assert(rows(1).getDouble(1) == 3.0 && rows(1).isNullAt(2))
  }

  test("pivotWider suffixes pivot values clashing with id columns") {
    val d = Gdf(Seq(("r1", "id", 1.0), ("r1", "y", 2.0)).toDF("id", "n", "v"))
    val w = Reshape.pivotWider(d, "n", "v")
    assert(w.names == Seq("id", "id_1", "y"))
  }

  test("pivotWider duplicate (id,name) keeps first per declared values") {
    val d = Gdf(Seq(("r1", "x", 1.0), ("r1", "x", 9.0)).toDF("id", "n", "v"))
    val w = Reshape.pivotWider(d, "n", "v", namesValues = Seq("x"))
    assert(w.sdf.count() == 1)
  }

  test("explode single and multi-column zip semantics") {
    val d = Gdf(Seq((1L, Seq("a", "b"), Seq(10, 20))).toDF("id", "s", "n"))
    val e1 = Reshape.explode(d, Seq("s"))
    assert(e1.sdf.count() == 2)
    val e2 = Reshape.explode(d, Seq("s", "n"))
    val rows = e2.sdf.orderBy("n").collect()
    assert(rows.map(r => (r.getAs[String]("s"), r.getAs[Int]("n"))).toSeq ==
      Seq(("a", 10), ("b", 20)))
  }

  test("explode of empty/null list keeps row (explode_outer)") {
    val d = Gdf(df(schema("id" -> LongType,
      "s" -> ArrayType(StringType)), Seq(1L, null), Seq(2L, Seq("a"))))
    assert(Reshape.explode(d, Seq("s")).sdf.count() == 2)
  }

  test("unnest struct into fields") {
    val d = Gdf(Seq((1L, ("x", 2.0))).toDF("id", "st"))
    val u = Reshape.unnest(d, "st")
    assert(u.names == Seq("id", "_1", "_2"))
  }

  test("dummies one-hot") {
    val d = Gdf(Seq(("a"), ("b"), ("a")).toDF("c"))
    val o = Reshape.dummies(d, "c")
    assert(o.names == Seq("c", "c_a", "c_b"))
    assert(col1[Int](o.sdf.orderBy("c"), "c_a") == Seq(1, 1, 0))
  }

  test("transpose rows↔cols with header; uniform dtype preserved") {
    val d = Gdf(Seq(("m1", 1.0, 2.0), ("m2", 3.0, 4.0))
      .toDF("name", "a", "b"))
    val t = Reshape.transpose(d, header = Some("name"))
    assert(t.names == Seq("name", "m1", "m2"))
    // all transposed columns are f64 → output keeps f64 (dataframe.rs:43)
    assert(t.schema("m1").dataType == DoubleType)
    val rows = t.sdf.orderBy("name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getDouble(1) == 1.0 && rows(1).getDouble(2) == 4.0)
    // mixed dtypes relax to string
    val mixed = Gdf(Seq(("m1", 1.0, true)).toDF("name", "a", "b"))
    val tm = Reshape.transpose(mixed, header = Some("name"))
    assert(tm.schema("m1").dataType == StringType)
    assert(tm.sdf.orderBy("name").collect().map(_.getString(1)).toSeq ==
      Seq("1.0", "true"))
  }

  test("concatRows reconciles columns and promotes dtypes") {
    val a = Gdf(Seq((1, "x")).toDF("i", "s"))
    val b = Gdf(Seq((2.5, true)).toDF("i", "t"))
    val c = Reshape.concatRows(Seq(a, b))
    assert(c.names.toSet == Set("i", "s", "t"))
    assert(c.schema("i").dataType == DoubleType)
    assert(c.sdf.count() == 2)
  }

  test("concatColumns zips by declared row order") {
    val a = Gdf(Seq(1L, 2L, 3L).toDF("x")).ordered(F.col("x"))
    val b = Gdf(Seq("c", "a", "b").toDF("y")).ordered(F.col("y"))
    val c = Reshape.concatColumns(Seq(a, b))
    val rows = c.sdf.orderBy("x").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("concatColumns raises on unequal heights (the reference errors; " +
      "an unchecked index join would silently truncate) — at action time, " +
      "riding the index join instead of an eager count per input") {
    val a = Gdf(Seq(1L, 2L, 3L).toDF("x")).ordered(F.col("x"))
    val b = Gdf(Seq("a", "b").toDF("y")).ordered(F.col("y"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Throwable] {
      Reshape.concatColumns(Seq(a, b)).sdf.collect()
    }
    assert(msgs(ex).exists(_.contains("equal heights")), msgs(ex))
  }

  test("concatColumns three frames: zips correctly, and a short MIDDLE " +
      "frame still trips the height assert (nested outer joins)") {
    val a = Gdf(Seq(1L, 2L, 3L).toDF("x")).ordered(F.col("x"))
    val b = Gdf(Seq("c", "a", "b").toDF("y")).ordered(F.col("y"))
    val c = Gdf(Seq(30.0, 10.0, 20.0).toDF("z")).ordered(F.col("z"))
    val rows = Reshape.concatColumns(Seq(a, b, c)).sdf.orderBy("x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val short = Gdf(Seq("a", "b").toDF("y")).ordered(F.col("y"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Throwable] {
      Reshape.concatColumns(Seq(a, short, c)).sdf.collect()
    }
    assert(msgs(ex).exists(_.contains("equal heights")), msgs(ex))
  }

  test("pivotWider and dummies fail loud when nulls and a literal " +
      "\"null\" string coexist (their output columns would silently " +
      "merge)") {
    val df = Gdf(Seq((1L, Some("null"), 10.0), (1L, None, 20.0))
      .toDF("id", "name", "v"))
    val e1 = intercept[IllegalArgumentException] {
      Reshape.pivotWider(df, "name", "v")
    }
    assert(e1.getMessage.contains("silently merge"))
    val e2 = intercept[IllegalArgumentException] {
      Reshape.dummies(Gdf(Seq(Some("null"), None).toDF("c")), "c")
    }
    assert(e2.getMessage.contains("silently merge"))
    // a genuine "null" string WITHOUT actual nulls is an ordinary value
    val ok = Reshape.pivotWider(
      Gdf(Seq((1L, "null", 10.0), (1L, "a", 20.0)).toDF("id", "name", "v")),
      "name", "v")
    assert(ok.names.toSet == Set("id", "a", "null"))
  }

  test("concatColumns clash rename does not orphan the frame's row order") {
    // b's ONLY column clashes with a's, so it gets renamed x_1 — the row
    // index must attach against the original name the rowOrder resolves to
    val a = Gdf(Seq((1L, "p"), (2L, "q")).toDF("x", "v")).ordered(F.col("x"))
    val b = Gdf(Seq(30L, 10L).toDF("x")).ordered(F.col("x"))
    val c = Reshape.concatColumns(Seq(a, b))
    assert(c.names == Seq("x", "v", "x_1"))
    val rows = c.sdf.orderBy("x").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "p", 10L), (2L, "q", 30L)))
  }

  test("pivotWider and dummies handle null discovered values; transpose " +
      "headers tolerate nulls") {
    val df = Gdf(Seq((1L, Some("a"), 10.0), (1L, None, 20.0),
      (2L, Some("a"), 30.0)).toDF("id", "name", "v"))
    val wide = Reshape.pivotWider(df, "name", "v")
    assert(wide.names.toSet == Set("id", "a", "null"))
    val r1 = wide.sdf.filter(F.col("id") === 1).collect()(0)
    assert(r1.getAs[Double]("a") == 10.0 && r1.getAs[Double]("null") == 20.0)
    val d = Reshape.dummies(Gdf(Seq(Some("x"), None).toDF("c")), "c")
    assert(d.names.toSet == Set("c", "c_null", "c_x"))
    assert(d.sdf.filter(F.col("c").isNull).collect()(0)
      .getAs[Int]("c_null") == 1)
    val t = Reshape.transpose(
      Gdf(Seq((Some("h1"), 1L), (None, 2L)).toDF("h", "v")),
      header = Some("h"))
    assert(t.names == Seq("name", "h1", "null"))
  }

  test("pivotLonger refuses a non-numeric dtype mix instead of casting " +
      "strings to all-null doubles") {
    val df = Gdf(Seq((1, "a")).toDF("qty", "label"))
    val ex = intercept[IllegalArgumentException] {
      Reshape.pivotLonger(df, Seq("qty", "label"))
    }
    assert(ex.getMessage.contains("incompatible"))
  }

  test("concatRows refuses non-numeric dtype mixes (same rule as " +
      "pivot_longer) and empty input") {
    val a = Gdf(Seq(Tuple1(1.5)).toDF("v"))
    val b = Gdf(Seq(Tuple1("oops")).toDF("v"))
    val ex = intercept[IllegalArgumentException] {
      Reshape.concatRows(Seq(a, b))
    }
    assert(ex.getMessage.contains("incompatible"), ex.getMessage)
    intercept[IllegalArgumentException] { Reshape.concatRows(Nil) }
    intercept[IllegalArgumentException] { Reshape.concatColumns(Nil) }
    // numeric mixes still relax-cast; an absent column (null-filled) is
    // not a mix
    val c = Gdf(Seq((1, "x")).toDF("v", "s"))
    assert(Reshape.concatRows(Seq(a, Gdf(Seq(Tuple1(2)).toDF("v")), c))
      .sdf.count() == 3)
  }

  test("transpose honors the declared row order and validates the " +
      "supplied column count") {
    val df = Gdf(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val asc = Reshape.transpose(df.ordered(F.col("k")),
      columns = Seq("a", "b"))
    val desc = Reshape.transpose(df.ordered(F.col("k").desc),
      columns = Seq("a", "b"))
    def row(t: Gdf, name: String) = t.sdf.filter(F.col("name") === name)
      .collect().head
    assert(row(asc, "v").getLong(1) == 10L &&
      row(asc, "v").getLong(2) == 20L)
    assert(row(desc, "v").getLong(1) == 20L &&
      row(desc, "v").getLong(2) == 10L)
    intercept[IllegalArgumentException] {
      Reshape.transpose(df, columns = Seq("only_one"))
    }
  }

  test("pivotWider: ordered frames take the FRAME-order first on " +
      "duplicate (id, name) pairs; suffixes increment until unique") {
    val df = Gdf(Seq(("r1", "x", 1.0), ("r1", "x", 9.0))
      .toDF("id", "n", "v"))
    // frame order ascending v → 1.0 is first; descending → 9.0
    assert(Reshape.pivotWider(df.ordered(F.col("v")), "n", "v")
      .sdf.collect().head.getDouble(1) == 1.0)
    assert(Reshape.pivotWider(df.ordered(F.col("v").desc), "n", "v")
      .sdf.collect().head.getDouble(1) == 9.0)
    // a pivot value colliding with BOTH an id column and its _1 sibling
    // walks to the next free suffix instead of duplicating
    val tricky = Gdf(Seq((1L, 2L, "id", 5.0)).toDF("id", "id_1", "n", "v"))
    val w = Reshape.pivotWider(tricky, "n", "v")
    assert(w.names == Seq("id", "id_1", "id_2"))
    assert(w.names.distinct.size == w.names.size)
  }

  test("multi-column explode refuses ragged list lengths instead of " +
      "null-padding; all-null rows still pass") {
    val ok = Gdf(Seq((Seq("a", "b"), Seq(1, 2)),
      (null: Seq[String], null: Seq[Int])).toDF("s", "n"))
    assert(Reshape.explode(ok, Seq("s", "n")).sdf.count() == 3)
    val ragged = Gdf(Seq((Seq("a", "b", "c"), Seq(1))).toDF("s", "n"))
    val ex = intercept[Exception] {
      Reshape.explode(ragged, Seq("s", "n")).sdf.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        (if (x.getCause ne x) msgs(x.getCause) else Nil))
    assert(msgs(ex).exists(_.contains("different lengths")), ex.toString)
  }

  test("concatColumns keeps clash-rename targets unique when a frame " +
      "already holds the suffixed name") {
    val a = Gdf(Seq(Tuple1(1L)).toDF("x")).ordered(F.col("x"))
    val b = Gdf(Seq((2L, 3L)).toDF("x", "x_1")).ordered(F.col("x"))
    val out = Reshape.concatColumns(Seq(a, b))
    assert(out.names.distinct.size == out.names.size, out.names.toString)
    assert(out.names.toSet == Set("x", "x_1", "x_1_1") ||
      out.names.toSet == Set("x", "x_1", "x_1_2"), out.names.toString)
  }

  test("reshape verbs thread logical dtypes: survivors keep them, " +
      "exploded List annotations unwrap") {
    val base = new Gdf(Seq((1L, "a", Seq(1L, 2L))).toDF("k", "c", "xs"),
      logical = Map("c" -> DType.Category,
        "xs" -> DType.List(DType.U(32))))
    val ex = Reshape.explode(base, Seq("xs"))
    assert(ex.logical.get("c").contains(DType.Category))
    assert(ex.logical.get("xs").contains(DType.U(32)))
    assert(Reshape.dummies(base, "c").logical
      .get("c").contains(DType.Category))
    val pl = Reshape.pivotLonger(
      new Gdf(Seq((1L, 2L, 3L)).toDF("id", "p", "q"),
        logical = Map("id" -> DType.U(32))), Seq("p", "q"))
    assert(pl.logical.get("id").contains(DType.U(32)))
    // concat_rows: agreement keeps, disagreement (or a promoted cast)
    // drops
    val l1 = new Gdf(Seq(Tuple1(1L)).toDF("v"),
      logical = Map("v" -> DType.U(32)))
    val l2 = new Gdf(Seq(Tuple1(2L)).toDF("v"),
      logical = Map("v" -> DType.U(32)))
    assert(Reshape.concatRows(Seq(l1, l2)).logical
      .get("v").contains(DType.U(32)))
    assert(Reshape.concatRows(Seq(l1, Gdf(Seq(Tuple1(3L)).toDF("v"))))
      .logical.isEmpty)
  }
}
