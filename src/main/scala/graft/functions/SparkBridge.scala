package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. `ExpressionUtils` is private[sql]
  * in Spark 4 (the Column API was decoupled from catalyst for Connect), so
  * custom native expressions need this one-hop accessor inside the sql
  * package tree. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** RDD-level zipWithIndex over an already sorted/partitioned plan: appends
    * a LongType `name` column holding the global 0-based row position. Works
    * on the plan's `toRdd` (InternalRow, no encoder round-trip); the
    * per-partition count job and the downstream consumers share the SAME
    * RDD, so the sort's shuffle is executed once and reused by identity —
    * the property the SQL-level self-join formulation could not guarantee
    * (see [[graft.plans.RowId]]). Needs private[sql]
    * `internalCreateDataFrame`, hence lives in the bridge. */
  def zipWithRowIndex(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.LongType
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L); p += 1 }
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      var i = offsets(pid)
      it.map { row =>
        extra.setLong(0, i); i += 1
        joined(row, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    session.internalCreateDataFrame(indexed, df.schema.add(name, LongType, nullable = false))
  }

  /** Rewrite a sort key's null ordering at the ColumnNode level (Spark 4's
    * Connect-agnostic Column representation). A catalyst SortOrder smuggled
    * into a Column is NOT recognized by Dataset.sort — it gets wrapped in a
    * second SortOrder and codegen-crashes — so the rewrite must happen on
    * `org.apache.spark.sql.internal.SortOrder` nodes, which is private[sql]
    * territory, hence here. Bare columns become ascending keys. */
  def withNullOrdering(key: Column, nilsLast: Boolean): Column = {
    import org.apache.spark.sql.internal.{SortOrder => SO}
    val target = if (nilsLast) SO.NullsLast else SO.NullsFirst
    key.node match {
      case so: SO => Column(so.copy(nullOrdering = target))
      case other => Column(SO(other, SO.Ascending, target))
    }
  }
}
