package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.Bridge

/** Distributed 0-based global row index over a declared total order — the
  * scale-safe replacement for `row_number().over(Window.orderBy(...))`, which
  * funnels the whole dataset through ONE task (an `Exchange SinglePartition`
  * feeding a Window).
  *
  * The reference gets row order for free from its single-node columnar layout
  * (`lib/explorer/series.ex:3102` row_index, `series.ex:4823` argsort); Spark
  * rows are unordered, so positional semantics need an explicit index. This
  * is the classic RDD `zipWithIndex` shape over a Catalyst-planned sort:
  *
  *  1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — each
  *     partition holds a contiguous, sorted slice of the order (planned and
  *     optimized by Catalyst, executed once);
  *  2. one tiny job counts rows per partition on the *same* RDD (Spark core
  *     reuses the sort's shuffle files by RDD identity, so the input is not
  *     recomputed — and, critically, cannot re-sample different range
  *     bounds);
  *  3. indices are `offset(partition) + local position`, appended per
  *     partition with zero data movement.
  *
  * A pure-SQL formulation (a counts branch self-joined back on the partition
  * id) was tried first and is NOT correct: the two branches of the self-join
  * are only deduped by ReuseExchange when they canonicalize identically, and
  * column pruning routinely specializes one branch's scan, after which each
  * branch re-samples its own range bounds and the partition ids silently
  * disagree. RDD-level sharing has no such failure mode.
  *
  * Cost model at scale: one range shuffle of the data + one cheap count pass
  * over the shuffle output + a map. No global window, no single-task stage;
  * the count job is the same price `zipWithIndex` pays on any cluster.
  *
  * The order must be total (include a tiebreak key) for the index to be
  * deterministic — the same contract the reference's implicit row order
  * gives.
  */
object RowId {

  /** `df` plus a LongType 0-based row index named `name`, numbered over
    * `order`. Output partitioning is range(order); the count job runs at
    * call time (the facade mirrors the reference's eager posture here, like
    * qcut's break computation). */
  def attach(df: DataFrame, order: Seq[Column], name: String): DataFrame = {
    require(order.nonEmpty, "RowId.attach needs a declared row order")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    Bridge.zipWithRowIndex(sorted, name)
  }

  /** `df` plus a DoubleType average-rank column over `col`'s value order
    * (`rank() + (ties-1)/2`, the tie-averaging ranks spearman needs) — ONE
    * range shuffle, no Window: equal keys land in one partition under range
    * partitioning, so tie runs are contiguous and a per-partition run-length
    * scan assigns ranks (see [[Bridge.zipWithAvgRank]]). Replaces the
    * attach-then-window-by-value formulation, which paid a second (hash)
    * shuffle per ranked column. */
  def attachAvgRank(df: DataFrame, col: String, out: String): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = df
      .repartitionByRange(parts, df(col))
      .sortWithinPartitions(df(col))
    Bridge.zipWithAvgRank(sorted, col, out)
  }
}
