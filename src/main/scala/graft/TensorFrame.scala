package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Dense-tensor interop (reference `lib/explorer/tensor_frame.ex:1-295`,
  * `Series.to_tensor`/`from_tensor`): hand selected numeric columns of a
  * frame to tensor-consuming code (a JVM ML library, an ONNX runtime
  * binding) and put results back as columns.
  *
  * The reference converts a DataFrame into per-column Nx tensors — an
  * inherently DRIVER-SIDE, eager move (Nx computes on host/GPU buffers),
  * with `put/4` re-attaching computed tensors by position. Same posture
  * here: [[TensorFrame.from]] collects the requested columns (and ONLY
  * those — projection happens Spark-side) into primitive arrays; tensors
  * are positional, so re-attachment joins on the distributed rowid
  * backbone ([[graft.plans.RowId]]) rather than assuming one partition.
  * For model scoring over data that must NOT collect, use the expression
  * path ([[graft.operators.Similarity.dot]], mapPartitions batches) — a
  * TensorFrame is for the reference's use case: frame-shaped input to
  * host tensor code.
  *
  * Dtype mapping mirrors `to_tensor`'s iovec widths (tensor_frame.ex
  * "Supported dtypes"): integers → s64, f32/f64 → f64, boolean → 0/1
  * (u8 semantics), date → s32 days since epoch, datetimes → s64 in the
  * column's native unit (µs; ns columns are already long ns here). */
sealed trait Tensor {
  def shape: Seq[Int]
  def numElements: Int = shape.product
}
final case class LongTensor(data: Array[Long], shape: Seq[Int]) extends Tensor
final case class DoubleTensor(data: Array[Double], shape: Seq[Int]) extends Tensor

final case class TensorFrame(names: Seq[String], nRows: Int,
    columns: Map[String, Tensor]) {

  /** `tf[:name]` (Access protocol, tensor_frame.ex:145-161). */
  def apply(name: String): Tensor = columns.getOrElse(name,
    throw new IllegalArgumentException(
      s"no column $name in TensorFrame(${names.mkString(", ")})"))

  /** `Nx.stack(df)`: [nRows × nCols] row-major; integer columns promote to
    * double when mixed with floats (Nx's type unification). */
  def stack: Tensor = {
    val cols = names.map(apply)
    if (cols.forall(_.isInstanceOf[LongTensor])) {
      val arrs = cols.map(_.asInstanceOf[LongTensor].data)
      val out = new Array[Long](nRows * arrs.length)
      fill(arrs.length)((r, c) => out(r * arrs.length + c) = arrs(c)(r))
      LongTensor(out, Seq(nRows, arrs.length))
    } else {
      val arrs = cols.map(asDoubles)
      val out = new Array[Double](nRows * arrs.length)
      fill(arrs.length)((r, c) => out(r * arrs.length + c) = arrs(c)(r))
      DoubleTensor(out, Seq(nRows, arrs.length))
    }
  }

  /** `Nx.concatenate(df)`: columns laid end-to-end. */
  def concatenate: Tensor = {
    val cols = names.map(apply)
    if (cols.forall(_.isInstanceOf[LongTensor]))
      LongTensor(cols.flatMap(_.asInstanceOf[LongTensor].data).toArray,
        Seq(nRows * cols.length))
    else
      DoubleTensor(cols.flatMap(asDoubles).toArray, Seq(nRows * cols.length))
  }

  private def fill(nCols: Int)(f: (Int, Int) => Unit): Unit = {
    var r = 0
    while (r < nRows) { var c = 0; while (c < nCols) { f(r, c); c += 1 }; r += 1 }
  }

  private def asDoubles(t: Tensor): Array[Double] = t match {
    case DoubleTensor(d, _) => d
    case LongTensor(l, _) => l.map(_.toDouble)
  }
}

object TensorFrame {

  /** Collect `cols` of `df` into a TensorFrame (driver-side eager, the
    * reference's conversion semantics; unselected columns never leave the
    * executors). */
  def from(df: DataFrame, cols: Seq[String]): TensorFrame = {
    val projected = df.select(cols.map { c =>
      df.schema(c).dataType match {
        case BooleanType => df(c).cast(ByteType).cast(LongType).as(c)
        case DateType => F.unix_date(df(c)).cast(LongType).as(c) // epoch days
        case TimestampType | TimestampNTZType =>
          F.unix_micros(df(c).cast(TimestampType)).as(c)
        case ByteType | ShortType | IntegerType => df(c).cast(LongType).as(c)
        case LongType => df(c)
        case FloatType | DoubleType => df(c).cast(DoubleType).as(c)
        case other => throw new IllegalArgumentException(
          s"column $c: dtype ${other.simpleString} has no tensor form " +
            "(reference tensor_frame.ex supports numeric/bool/date/datetime)")
      }
    }: _*)
    val rows = projected.collect()
    val n = rows.length
    val tensors = cols.zipWithIndex.map { case (c, i) =>
      df.schema(c).dataType match {
        case FloatType | DoubleType =>
          val a = new Array[Double](n)
          var r = 0
          while (r < n) { a(r) = if (rows(r).isNullAt(i))
            Double.NaN else rows(r).getDouble(i); r += 1 }
          c -> (DoubleTensor(a, Seq(n)): Tensor)
        case _ =>
          val a = new Array[Long](n)
          var r = 0
          while (r < n) {
            if (rows(r).isNullAt(i)) throw new IllegalArgumentException(
              s"column $c: null at row $r — integer tensors have no NaN; " +
                "fill_missing before converting (reference to_tensor " +
                "raises the same way)")
            a(r) = rows(r).getLong(i); r += 1
          }
          c -> (LongTensor(a, Seq(n)): Tensor)
      }
    }.toMap
    TensorFrame(cols, n, tensors)
  }

  def from(gdf: Gdf, cols: Seq[String]): TensorFrame = from(gdf.sdf, cols)

  /** `DataFrame.put(df, name, tensor)` (data_frame.ex:3328,
    * tensor_frame.ex broadcast!): attach a 1-D tensor as a column by
    * POSITION over the frame's declared row order (positional ops need
    * `.ordered(...)`, like every other positional verb here); scalar
    * (length-1) tensors broadcast. Alignment rides the distributed rowid
    * backbone + a broadcast join of the host values — no single-partition
    * funnel on the frame side. */
  def put(gdf: Gdf, name: String, tensor: Tensor): Gdf = {
    val spark = gdf.sdf.sparkSession
    val (len, valueDf) = tensor match {
      case LongTensor(d, Seq(_)) =>
        (d.length, valuesDf(spark, d.length,
          i => Row(i.toLong, d(i)), LongType, name))
      case DoubleTensor(d, Seq(_)) =>
        (d.length, valuesDf(spark, d.length,
          i => Row(i.toLong, d(i)), DoubleType, name))
      case t => throw new IllegalArgumentException(
        s"put expects a 1-D tensor, got shape ${t.shape.mkString("x")}")
    }
    if (len == 1) {
      // scalar broadcast (tensor_frame.ex:194-196)
      val lit = tensor match {
        case LongTensor(d, _) => F.lit(d(0))
        case DoubleTensor(d, _) => F.lit(d(0))
      }
      return gdf.mutateCol(name, lit)
    }
    val n = gdf.sdf.count()
    require(len.toLong == n,
      s"tensor length $len != frame rows $n (tensor_frame.ex broadcast!)")
    val withId = gdf.withRowIndex("__tf_rid")
    val joined = withId.sdf.join(F.broadcast(valueDf), "__tf_rid")
      .drop("__tf_rid")
    Gdf(joined).ordered(gdf.rowOrder: _*).withLogical(
      gdf.logical.toSeq.filter(kv => kv._1 != name): _*)
  }

  private def valuesDf(spark: SparkSession, n: Int, row: Int => Row,
      dt: DataType, name: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize((0 until n).map(row), 1),
      StructType(Seq(StructField("__tf_rid", LongType, false),
        StructField(name, dt, false))))

  /** `Series.from_tensor` (series.ex): 1-D tensor → single-column frame. */
  def seriesFrom(spark: SparkSession, tensor: Tensor,
      name: String = "values"): Gdf = tensor match {
    case LongTensor(d, Seq(_)) =>
      Gdf(spark.createDataFrame(
        spark.sparkContext.parallelize(d.toSeq.map(v => Row(v))),
        StructType(Seq(StructField(name, LongType, false)))))
    case DoubleTensor(d, Seq(_)) =>
      Gdf(spark.createDataFrame(
        spark.sparkContext.parallelize(d.toSeq.map(v => Row(v))),
        StructType(Seq(StructField(name, DoubleType, false)))))
    case t => throw new IllegalArgumentException(
      s"seriesFrom expects a 1-D tensor, got shape ${t.shape.mkString("x")}")
  }
}
