package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** The grouped twin of every §2 verb (VERDICT r5 next #8), mirroring the
  * reference's `grouped_test.exs` semantics. Two kinds of twin:
  *
  *  - DATA twins — grouping changes the result rows: summarise, mutate,
  *    filter, sort, head/tail/slice/sample, distinct (group cols added to
  *    the key), rank/shift/cumulative (windows partition by groups). Most
  *    are covered in GdfSpec; the additions here close distinct + the
  *    reshape family.
  *  - METADATA twins — grouping changes only the `groups` metadata the
  *    result carries: select/discard/rename (group cols protected and
  *    remapped), pivot_longer/wider (pivoted / non-id groups discarded),
  *    dummies (all groups dropped), explode/unnest (kept), concat_rows/
  *    concat_columns (first frame's groups), join (left side's groups;
  *    right join takes the right side's), put/shuffle (ignore groups but
  *    keep them).
  *
  * Explicit N/A rows (no grouped twin BY REFERENCE CONTRACT): the IO verbs
  * (`to_csv` etc. — "Groups are ignored"), `describe` ("Groups are
  * ignored"), `transpose` (output columns are new), `pull`/`to_series`
  * (series extraction), `sql` (operates on the bare relation). */
class GroupedMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def base = new Gdf(
    Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0), ("b", 4L, 40.0),
      ("b", 5L, 50.0)).toDF("g", "id", "v"),
    groups = Seq("g"))

  // ---- projection keeps / protects / remaps group columns ----------------

  test("grouped select always keeps the group columns") {
    val out = base.select("v")
    assert(out.names == Seq("v", "g"), "group column must be appended")
    assert(out.groups == Seq("g"))
  }

  test("grouped discard refuses to drop a group column") {
    val out = base.discard("g", "v")
    assert(out.names == Seq("g", "id"), "g is a group — must survive")
    assert(out.groups == Seq("g"))
  }

  test("rename remaps group metadata with the column") {
    val out = base.rename("g" -> "grp")
    assert(out.groups == Seq("grp") && out.names.contains("grp"))
  }

  // ---- distinct: group columns join the key ------------------------------

  test("grouped distinct adds group columns to the subset and keeps groups") {
    val d = new Gdf(
      Seq(("a", 1L), ("a", 1L), ("b", 1L)).toDF("g", "k"),
      groups = Seq("g"))
    val out = d.distinct(Seq("k"))
    // ungrouped distinct on k would yield ONE row; the group column in
    // the key keeps one per (g, k)
    assert(out.count() == 2L)
    assert(out.groups == Seq("g"))
    assert(out.names.toSet == Set("g", "k"))
  }

  // ---- stable grouping (reference v0.11.1 `stable:` option) --------------

  test("groupByStable summarise returns groups in first-occurrence order " +
      "(data_frame.ex:5880 stable?; default grouping is engine-arbitrary)") {
    // first occurrences along the declared order: c, a, b — NOT sorted
    val d = new Gdf(
      Seq((1L, "c", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "a", 4.0),
        (5L, "c", 5.0)).toDF("id", "g", "v"))
      .ordered(F.col("id"))
      .groupByStable("g")
    val out = d.summarise("total" -> (_ => Series(F.sum(F.col("v")), isAgg = true)))
    val rows = out.sdf.collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("c", 6.0), ("a", 6.0), ("b", 3.0)), rows.toSeq)
    // the hidden ordering column must not leak into the schema
    assert(out.names == Seq("g", "total"))
    // stable without a declared order is undefined — fail loud
    val e = intercept[IllegalArgumentException] {
      new Gdf(Seq(("a", 1.0)).toDF("g", "v")).groupByStable("g")
        .summarise("t" -> (_ => Series(F.sum(F.col("v")), isAgg = true)))
    }
    assert(e.getMessage.contains("declared row order"))
    // ungroup clears the flag with the groups
    assert(!d.ungroup().stableGroups)
  }

  // ---- reshape family ----------------------------------------------------

  test("grouped pivot_longer drops pivoted groups, keeps the rest") {
    val d = new Gdf(
      Seq(("a", "x", 1.0, 2.0)).toDF("g", "h", "p1", "p2"),
      groups = Seq("g", "h"))
    assert(Reshape.pivotLonger(d, Seq("p1", "p2")).groups == Seq("g", "h"))
    // a group that IS pivoted away is removed from the metadata
    val d2 = new Gdf(
      Seq((1.0, "x", 2.0)).toDF("p1", "h", "p2"), groups = Seq("p1", "h"))
    assert(Reshape.pivotLonger(d2, Seq("p1", "p2")).groups == Seq("h"))
  }

  test("grouped pivot_wider keeps only groups that are id columns") {
    val d = new Gdf(
      Seq(("a", "mon", 1L), ("a", "tue", 2L), ("b", "mon", 3L))
        .toDF("team", "day", "hour"),
      groups = Seq("team", "day"))
    val out = Reshape.pivotWider(d, "day", "hour")
    // "day" is consumed by the pivot -> discarded from groups;
    // "team" is an id column -> kept
    assert(out.groups == Seq("team"))
    assert(out.names == Seq("team", "mon", "tue"))
    // the data itself is the ungrouped pivot (grouping is metadata-only)
    val rows = out.sdf.orderBy("team").collect()
      .map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
    assert(rows == Seq(("a", 1L, 2L), ("b", 3L, null)))
  }

  test("grouped dummies removes all groups") {
    val out = Reshape.dummies(base, "g")
    assert(out.groups.isEmpty)
    assert(out.names.contains("g_a") && out.names.contains("g_b"))
  }

  test("grouped explode and unnest keep the groups") {
    val d = new Gdf(
      Seq(("a", Seq(1, 2)), ("b", Seq(3))).toDF("g", "xs"),
      groups = Seq("g"))
    assert(Reshape.explode(d, Seq("xs")).groups == Seq("g"))
    val s = new Gdf(
      Seq(("a", (1, 2))).toDF("g", "st"), groups = Seq("g"))
    assert(Reshape.unnest(s, "st").groups == Seq("g"))
  }

  test("grouped concat_rows / concat_columns keep the FIRST frame's groups") {
    val left = new Gdf(Seq(("a", 1L)).toDF("g", "x"), groups = Seq("g"))
    val right = new Gdf(Seq(("b", 2L)).toDF("g", "x"), groups = Nil)
    assert(Reshape.concatRows(Seq(left, right)).groups == Seq("g"))
    assert(Reshape.concatRows(Seq(right.groupBy("x"), left)).groups
      == Seq("x"))
    val l2 = new Gdf(Seq(("a", 1L)).toDF("g", "x"), groups = Seq("g"))
      .ordered(F.col("x"))
    val r2 = new Gdf(Seq(9.5).toDF("y"), groups = Nil).ordered(F.col("y"))
    assert(Reshape.concatColumns(Seq(l2, r2)).groups == Seq("g"))
  }

  // ---- joins: side rules -------------------------------------------------

  test("join keeps left groups for inner/left/semi/anti/outer, right " +
      "groups for right joins") {
    val left = new Gdf(
      Seq((1L, "a"), (2L, "b")).toDF("k", "lg"), groups = Seq("lg"))
    val right = new Gdf(
      Seq((1L, "x"), (3L, "y")).toDF("k", "rg"), groups = Seq("rg"))
    for (how <- Seq("inner", "left", "semi", "anti", "outer"))
      assert(Joins.join(left, right, Seq("k"), how).groups == Seq("lg"),
        s"$how join must keep the left groups")
    assert(Joins.join(left, right, Seq("k"), "right").groups == Seq("rg"))
    // a group column that does not survive the join is pruned:
    // semi/anti joins drop the right side entirely, so right groups never
    // leak; grouping by the LEFT key survives every how
    assert(Joins.join(left.ungroup().groupBy("k"), right, Seq("k"), "inner")
      .groups == Seq("k"))
  }

  test("join_asof and range join keep the LEFT side's groups — the " +
      "matrix's last 'follows the join rule' entry, now evidence " +
      "(r6 verdict #9)") {
    val trades = new Gdf(
      Seq(("A", 3L, 10.0), ("A", 7L, 11.0), ("B", 4L, 20.0))
        .toDF("sym", "t", "px"), groups = Seq("sym"))
    val quotes = new Gdf(
      Seq(("A", 2L, 9.5), ("A", 6L, 10.5), ("B", 1L, 19.5))
        .toDF("sym", "qt", "bid"))
    val asof = Joins.joinAsof(trades, quotes, "t", "qt", by = Seq("sym"))
    assert(asof.groups == Seq("sym"), "asof join dropped the left groups")
    // and the data under the grouped-by keys is the backward match
    assert(asof.sdf.select("sym", "t", "bid").orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq(("A", 3L, 9.5), ("A", 7L, 10.5), ("B", 4L, 19.5)))
    // the grouped frame keeps working as a grouped frame downstream
    assert(asof.sampleN(1, seed = 5L).sdf.groupBy("sym").count()
      .collect().map(_.getLong(1)).forall(_ == 1L))

    val points = new Gdf(
      Seq(("g1", 5L), ("g2", 15L)).toDF("pg", "p"), groups = Seq("pg"))
    val ivals = new Gdf(
      Seq((0L, 9L, "lo"), (10L, 19L, "hi")).toDF("lo", "hi", "tag"))
    val rj = Joins.rangeJoin(points, ivals, "p", "lo", "hi", binWidth = 10)
    assert(rj.groups == Seq("pg"), "range join dropped the left groups")
    assert(rj.sdf.select("pg", "tag").orderBy("pg").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("g1", "lo"), ("g2", "hi")))
  }

  test("grouped sampleFrac takes exactly floor(frac * n) rows per group") {
    val d = new Gdf(
      (1 to 50).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v"),
      groups = Seq("g"))
    val out = d.sampleFrac(0.2, seed = 11L)
    val counts = out.sdf.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 5L, "g1" -> 5L), counts.toString)
    assert(out.groups == Seq("g"))
    // deterministic under the same seed
    assert(d.sampleFrac(0.2, seed = 11L).sdf.collect().map(_.getLong(1))
      .sorted.toSeq ==
      out.sdf.collect().map(_.getLong(1)).sorted.toSeq)
  }

  test("sampleN on a runtime-EMPTY frame still raises for n > 0 (the " +
      "assert lives in the scalar count subquery, not per row — r6 " +
      "ADVICE #1)") {
    // runtime-empty: a filtered scan the optimizer cannot fold away (the
    // statically-empty corner is exercised below)
    val empty = new Gdf(
      spark.range(10).toDF("v").filter(F.col("v") < -1))
    val err = intercept[Exception] { empty.sampleN(3).sdf.collect() }
    // the subquery failure surfaces wrapped ("Exception thrown in
    // awaitResult") — the contract message is in the cause chain
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("larger sample")), msgs(err))
    // STATICALLY empty relation (r7 verdict nit): PropagateEmptyRelation
    // folds the whole sampling leg away, but the assert rides a sentinel
    // union leg on range(1) that can't be folded — the raise still fires
    val static = new Gdf(df(schema("v" -> LongType)))
    val serr = intercept[Throwable] { static.sampleN(3).sdf.collect() }
    assert(msgs(serr).exists(_.contains("larger sample")), msgs(serr))
    assert(static.sampleN(0).sdf.collect().isEmpty)
    // n = 0 on an empty frame is a legal no-op
    assert(empty.sampleN(0).sdf.collect().isEmpty)
  }

  test("oversized sampleN raises even under a downstream filter (the " +
      "pushed filter must not prune the assert away — r8 ADVICE medium)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // nonempty frame, oversize request, user filter on top: the filter is
    // pushed into the union legs; the main leg's assert rides a scalar
    // subquery the pushdown cannot fold, so the raise still fires
    val d = new Gdf(spark.range(10).toDF("v"))
    val err = intercept[Throwable] {
      d.sampleN(100).sdf.filter(F.col("v") > 0).collect()
    }
    assert(msgs(err).exists(_.contains("larger sample")), msgs(err))
    // statically-empty frame + downstream filter: main leg is folded away
    // by PropagateEmptyRelation; the sentinel leg's nondeterministic null
    // payload blocks the filter pushdown, so its assert still evaluates
    val static = new Gdf(df(schema("v" -> LongType)))
    val serr = intercept[Throwable] {
      static.sampleN(3).sdf.filter(F.col("v") > 0).collect()
    }
    assert(msgs(serr).exists(_.contains("larger sample")), msgs(serr))
    // within-bounds sampleN under a filter: no raise, filter applies
    val ok = d.sampleN(10).sdf.filter(F.col("v") >= 5).collect()
    assert(ok.length == 5, ok.length)
    // sanity: oversize still raises with no filter on top (both legs)
    val plain = intercept[Throwable] { d.sampleN(100).sdf.collect() }
    assert(msgs(plain).exists(_.contains("larger sample")), msgs(plain))
  }

  test("grouped sampleFrac floor is the MATHEMATICAL floor, immune to " +
      "double rounding (100 * 0.29 = 28.999999999999996 — r6 ADVICE #5)") {
    val d = new Gdf(
      (1 to 200).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v"),
      groups = Seq("g"))
    val counts = d.sampleFrac(0.29, seed = 3L).sdf
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 29L, "g1" -> 29L), counts.toString)
  }

  test("oversized sample without replacement raises; with replacement " +
      "draws n per group (reference sample/2 contract)") {
    // 2 groups x 25 rows; the declared order makes the draw index defined
    val d = new Gdf(
      (1 to 50).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v"),
      groups = Seq("g")).ordered(F.col("v"))
    // n > group size without replacement -> the plan-folded assert fires
    val err = intercept[Exception] {
      d.sampleN(60, seed = 100L).sdf.collect()
    }
    assert(err.getMessage.contains("larger sample"), err.getMessage)
    intercept[IllegalArgumentException] { d.sampleFrac(1.2, seed = 100L) }
    // with replacement: 60 draws per 25-row group -> 120 rows, values
    // drawn from the right group, duplicates expected
    val rep = d.sampleN(60, seed = 100L, replace = true)
    assert(rep.count() == 120L)
    val byGroup = rep.sdf.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("g0" -> 60L, "g1" -> 60L))
    assert(rep.sdf.filter(F.col("g") === "g0" && F.col("v") % 2 =!= 0)
      .count() == 0L, "a draw crossed groups")
    // ungrouped with replacement: exactly n rows, all from the frame
    val u = new Gdf((1 to 10).map(_.toLong).toDF("v")).ordered(F.col("v"))
    val ur = u.sampleN(25, seed = 7L, replace = true)
    assert(ur.count() == 25L)
    assert(ur.sdf.filter(F.col("v") < 1 || F.col("v") > 10).count() == 0L)
    // within-bounds sampleN still exact and seeded
    assert(d.sampleN(5, seed = 3L).sdf.groupBy("g").count().collect()
      .forall(_.getLong(1) == 5L))
  }

  // ---- verbs that ignore groups but keep the metadata --------------------

  test("put/mutateCol and shuffle ignore groups but keep the metadata") {
    val out = base.mutateCol("w", F.col("v") * 2)
    assert(out.groups == Seq("g") && out.names.contains("w"))
    val sh = base.shuffle(seed = 7L)
    assert(sh.groups == Seq("g") && sh.count() == 5L)
  }

  // ---- grouped aggregation / window data twins (beyond GdfSpec) ----------

  test("grouped summarise with the full §2.5 aggregate battery") {
    val out = base.summariseWith { implicit c => Seq(
      "n" -> graft.exprs.size,
      "s" -> graft.exprs.sum(gcol("v")),
      "m" -> graft.exprs.mean(gcol("v")),
      "nd" -> graft.exprs.nDistinct(gcol("id"))) }
      .sortBy(Seq(F.col("g")))
    val rows = out.sdf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(rows == Seq(("a", 2L, 30.0, 15.0, 2L),
      ("b", 3L, 120.0, 40.0, 3L)))
  }

  test("summarise with a window function INSIDE the aggregation " +
      "(reference max(window_mean(x, 2)) shape)") {
    val out = base.ordered(F.col("id")).summariseWith { implicit c => Seq(
      "n" -> graft.exprs.size,
      "max_wm" -> graft.exprs.max(
        graft.exprs.windowMean(gcol("v"), size = 2))) }
      .sortBy(Seq(F.col("g")))
    // g=a: v 10,20 -> win means 10, 15 -> max 15
    // g=b: v 30,40,50 -> win means 30, 35, 45 -> max 45
    val rows = out.sdf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("a", 2L, 15.0), ("b", 3L, 45.0)))
    // window OVER an aggregation stays rejected (reference raises too)
    intercept[IllegalArgumentException] {
      base.ordered(F.col("id")).summariseWith { implicit c => Seq(
        "bad" -> graft.exprs.shift(graft.exprs.sum(gcol("v")), 1)) }
    }
  }

  test("groupByStable composes with window-in-aggregation " +
      "auto-materialization (the hidden projection must not disturb the " +
      "min-rowid ordering pass)") {
    // first occurrences along id: b (id 1), a (id 2)
    val d = new Gdf(
      Seq((1L, "b", 30.0), (2L, "a", 10.0), (3L, "b", 40.0), (4L, "a", 20.0),
        (5L, "b", 50.0)).toDF("id", "g", "v"))
      .ordered(F.col("id")).groupByStable("g")
    val out = d.summariseWith { implicit c => Seq(
      "max_wm" -> graft.exprs.max(
        graft.exprs.windowMean(gcol("v"), size = 2))) }
    val rows = out.sdf.collect().map(r => (r.getString(0), r.getDouble(1)))
    // values identical to the unordered twin; ORDER is first-occurrence
    assert(rows.toSeq == Seq(("b", 45.0), ("a", 15.0)), rows.toSeq)
    assert(out.names == Seq("g", "max_wm"))
  }

  test("grouped window verbs partition by group: rank and cumsum restart") {
    val out = base.ordered(F.col("id")).mutateWith { implicit c => Seq(
      "r" -> graft.exprs.rank(gcol("v"), method = "dense"),
      "cs" -> graft.exprs.cumulativeSum(gcol("v"))) }
      .sortBy(Seq(F.col("id")))
    val rows = out.sdf.collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getDouble(4))).toSeq
    assert(rows == Seq((1L, 1, 10.0), (2L, 2, 30.0),
      (3L, 1, 30.0), (4L, 2, 70.0), (5L, 3, 120.0)))
  }
}
