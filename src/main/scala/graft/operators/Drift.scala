package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Distribution drift between two corpus snapshots — the monitoring op a
  * continuously-ingesting pipeline runs next to its dedup/quality gates:
  * has this week's crawl shifted in length / quality-score / language mix
  * against the reference snapshot the filters were tuned on?
  *
  * Metric: PSI (population stability index) per bucket,
  * `(p_a − p_b) · ln(p_a / p_b)`, with Jeffreys add-0.5 smoothing so an
  * empty bucket on one side contributes a large-but-finite term instead
  * of ±∞ (the standard industrial convention; smoothing is part of the
  * published contract, not a hidden fudge — the oracle replays it). Sum
  * of contributions = total PSI; the usual alert bands are 0.1 (drifting)
  * and 0.25 (broken).
  *
  * Scale shape: each snapshot contributes ONE map-side-combined groupBy
  * over a fixed bucket id (≤ breaks+1 groups — the shuffle carries a
  * handful of rows no matter the corpus size); the bucket join is a
  * few-row full-outer. Nothing driver-side, nothing quadratic, and both
  * snapshots are scanned exactly once.
  */
object Drift {

  /** Bucket id of `v` under right-open bins `(-∞,b₁) [b₁,b₂) … [bₙ,∞)`:
    * the count of breaks ≤ v — 0..n for n breaks. Null-valued rows are
    * excluded from both snapshots (they belong to a nil-count gate, not
    * a numeric histogram). */
  private def bucketOf(v: Column, breaks: Seq[Double]): Column =
    // the isNotNull guard keeps null values null (a bare `v >= b` is null,
    // and otherwise(0) would silently bucket nulls at 0)
    F.when(v.isNotNull,
      breaks.map(b => F.when(v >= b, 1).otherwise(0)).reduce(_ + _))

  /** Per-bucket PSI between snapshots `a` and `b` over numeric `col`.
    * `breaks` must be strictly increasing (same contract as `Stats.cut`).
    * Output: one row per bucket present in either snapshot — absent from
    * BOTH means a zero contribution, so omitting the row loses nothing —
    * with raw counts, smoothed shares (6 dp), and the PSI contribution
    * (6 dp). `contribution` sums to total PSI.
    *
    * Snapshot totals are recovered from the bucket counts themselves
    * (every counted row is in exactly one bucket), with a global window
    * over the JOINED frame — which is ≤ breaks+1 rows by construction,
    * so the single-partition window is a non-cost. Each snapshot is
    * scanned exactly once; scalar-subquery totals would scan both twice. */
  def psi(a: DataFrame, b: DataFrame, col: Column,
      breaks: Seq[Double]): DataFrame = {
    require(breaks.nonEmpty, "psi needs at least one break")
    require(breaks == breaks.sorted && breaks.distinct == breaks,
      s"breaks must be strictly increasing, got $breaks")
    val k = breaks.size + 1
    def side(df: DataFrame, n: String): DataFrame =
      df.select(bucketOf(col, breaks).as("bucket"))
        .filter(F.col("bucket").isNotNull)
        .groupBy("bucket").agg(F.count(F.lit(1)).as(n))
    val joined = side(a, "n_a").join(side(b, "n_b"), Seq("bucket"), "full")
      .select(F.col("bucket"),
        F.coalesce(F.col("n_a"), F.lit(0L)).as("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0L)).as("n_b"))
    smoothed(joined, "bucket", F.lit(k))
  }

  /** Shared smoothing/contribution tail over a (key, n_a, n_b) frame of
    * bounded size; `k` is the smoothing bucket count. */
  private def smoothed(joined: DataFrame, key: String, k: Column): DataFrame = {
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pa = (F.col("n_a") + 0.5) / (F.sum("n_a").over(w) + F.lit(0.5) * k)
    val pb = (F.col("n_b") + 0.5) / (F.sum("n_b").over(w) + F.lit(0.5) * k)
    joined.select(F.col(key), F.col("n_a"), F.col("n_b"),
        F.round(pa, 6).as("share_a"), F.round(pb, 6).as("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).as("contribution"))
      .orderBy(key)
  }

  /** Categorical PSI — same metric over a label column (language id,
    * source, license class). Labels absent from both snapshots cannot
    * occur by construction, so `k` for the smoothing denominator — the
    * number of distinct labels across both snapshots — is exactly the
    * joined frame's own row count, and totals are its column sums: the
    * whole statistic needs one groupBy per side and a bounded window,
    * no extra scans. */
  def psiCategorical(a: DataFrame, b: DataFrame, col: Column): DataFrame = {
    def side(df: DataFrame, n: String): DataFrame =
      df.select(col.as("label")).filter(F.col("label").isNotNull)
        .groupBy("label").agg(F.count(F.lit(1)).as(n))
    val joined = side(a, "n_a").join(side(b, "n_b"), Seq("label"), "full")
      .select(F.col("label"),
        F.coalesce(F.col("n_a"), F.lit(0L)).as("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0L)).as("n_b"))
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    smoothed(joined, "label", F.count(F.lit(1)).over(w))
  }

  /** Snapshot diff — which documents were added / removed / changed /
    * unchanged between two corpus snapshots (the audit step before
    * re-running an expensive downstream pipeline on "the same" corpus).
    *
    * Scale shape: each side shuffles only `(id, xxhash64(content))` — 16
    * bytes per row, never the document bodies — into one full-outer join
    * on id. "Changed" means the 64-bit content hashes differ: two
    * genuinely different versions agreeing by hash is a 2⁻⁶⁴ collision,
    * the standard content-addressing contract (same posture as exact
    * dedup's hash key). Ids are assumed unique within each snapshot
    * (the corpus-id contract everywhere in this engine); a duplicated id
    * multiplies through the join like any keyed join would. NULL content
    * hashes to the seed on both sides, so null-vs-null compares
    * "unchanged" — IS NOT DISTINCT FROM semantics, not SQL's
    * null-propagating equality. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, id: Column,
      content: Column): DataFrame = {
    // a null id would not match ITSELF across the join (SQL null
    // semantics) and surface as a phantom added+removed pair — assert
    // per row instead (non-constant branch, the Sampling.requireKey
    // posture)
    def checkedId: Column = F.when(F.assert_true(id.isNotNull, F.lit(
      "snapshotDiff id is null — a null id cannot be matched across " +
        "snapshots; filter or repair upstream")).isNull, id)
    def side(df: DataFrame, h: String): DataFrame =
      df.select(checkedId.as("doc_id"), F.xxhash64(content).as(h))
    side(prev, "__hp").join(side(cur, "__hc"), Seq("doc_id"), "full")
      .select(F.col("doc_id"),
        F.when(F.col("__hp").isNull, "added")
          .when(F.col("__hc").isNull, "removed")
          .when(F.col("__hp") === F.col("__hc"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
