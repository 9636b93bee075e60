package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import graft.plans.RowId

/** The distributed row-index backbone must agree exactly with the
  * single-task global-window formulation it replaces, and its physical plan
  * must contain no `Exchange SinglePartition` feeding a Window. */
class RowIdSpec extends SparkSpec {
  import spark.implicits._

  test("RowId.attach matches row_number over a global window") {
    // shuffled, multi-partition input with a total order
    val df = spark.range(0, 10000).select(
        (F.col("id") * 2654435761L % 100003L).as("k"), F.col("id"))
      .repartition(13)
    val got = RowId.attach(df, Seq(F.col("k"), F.col("id")), "idx")
      .select("k", "id", "idx")
    val want = df.withColumn("idx",
      F.row_number().over(Window.orderBy(F.col("k"), F.col("id"))).cast("long") - 1)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.count() == 10000)
  }

  test("RowId plan has no window and no single-partition exchange") {
    val df = spark.range(0, 1000).select(F.col("id"))
    val indexed = RowId.attach(df, Seq(F.col("id")), "idx")
    val plan = indexed.queryExecution.executedPlan.toString
    // the whole point: positional indexing without any Window operator or
    // SinglePartition funnel — the index rides on the range-sorted RDD
    assert(!plan.contains("Window"), s"window in RowId plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition funnel:\n$plan")
    // output parallelism is preserved (not coalesced to one task)
    assert(indexed.rdd.getNumPartitions > 1)
  }

  test("RowId chained attaches stay consistent (spearman shape)") {
    // the regression that killed the SQL self-join design: two attaches in
    // one plan with different column pruning per branch
    val df = spark.range(0, 20000).select(
      (F.col("id") % 50).cast("double").as("a"),
      (F.col("id") * 2654435761L % 99991L).cast("double").as("b"))
    val r = Stats.spearman(Gdf(df.repartition(7)), "a", "b").sdf.head().getDouble(0)
    // ranks must sum to n(n+1)/2 regardless of tie structure; spearman of
    // a hash-scramble against a modulus is ~0 but must be finite and stable
    val r2 = Stats.spearman(Gdf(df.repartition(7)), "a", "b").sdf.head().getDouble(0)
    assert(!r.isNaN && math.abs(r) < 0.1)
    // ranks are exact (integers/halves, invariant to partition boundaries);
    // the only run-to-run jitter is corr's partial-state merge order — a
    // last-ulp float effect inherent to ANY distributed aggregation. The
    // oracle rounds to 6dp; assert stability to 1e-9 relative.
    assert(math.abs(r - r2) <= 1e-9 * math.max(1.0, math.abs(r)),
      s"spearman not stable: $r vs $r2")
  }

  test("RowId is stable under repeated evaluation (deterministic offsets)") {
    val df = spark.range(0, 5000).select((F.col("id") % 97).as("k"), F.col("id"))
    val indexed = RowId.attach(df, Seq(F.col("k"), F.col("id")), "idx").cache()
    try {
      // indices are a permutation of 0..n-1
      val agg = indexed.agg(
        F.count_distinct(F.col("idx")).as("d"),
        F.min("idx").as("mn"), F.max("idx").as("mx")).head()
      assert(agg.getLong(0) == 5000 && agg.getLong(1) == 0L && agg.getLong(2) == 4999L)
      // monotone w.r.t. the order
      val bad = indexed.alias("a").join(indexed.alias("b"),
        F.col("a.idx") + 1 === F.col("b.idx"))
        .filter(F.struct(F.col("a.k"), F.col("a.id")) >=
                F.struct(F.col("b.k"), F.col("b.id")))
      assert(bad.count() == 0)
    } finally indexed.unpersist()
  }
}
