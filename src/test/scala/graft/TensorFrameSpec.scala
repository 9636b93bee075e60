package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** TensorFrame interop (reference tensor_frame.ex doctests): per-column
  * tensors, stack/concatenate layouts, dtype mapping, positional put with
  * scalar broadcast. */
class TensorFrameSpec extends SparkSpec {

  private def frame = df(
    schema("a" -> LongType, "b" -> LongType),
    Seq[Any](11L, 21L), Seq[Any](12L, 22L))

  test("per-column tensors + stack/concatenate match the Nx doctests") {
    val tf = TensorFrame.from(frame.orderBy("a"), Seq("a", "b"))
    assert(tf("a").asInstanceOf[LongTensor].data.toSeq === Seq(11L, 12L))
    // Nx.concatenate -> [11, 12, 21, 22]
    assert(tf.concatenate.asInstanceOf[LongTensor].data.toSeq ===
      Seq(11L, 12L, 21L, 22L))
    // Nx.stack -> [[11, 21], [12, 22]] row-major
    val st = tf.stack.asInstanceOf[LongTensor]
    assert(st.shape === Seq(2, 2))
    assert(st.data.toSeq === Seq(11L, 21L, 12L, 22L))
  }

  test("dtype mapping: bool -> 0/1, date -> epoch days, float mix promotes") {
    val d = df(schema("f" -> BooleanType, "x" -> DoubleType, "n" -> IntegerType),
      Seq[Any](true, 1.5, 3), Seq[Any](false, 2.5, 4))
      .withColumn("d", F.to_date(F.lit("1970-01-03")))
    val tf = TensorFrame.from(d, Seq("f", "x", "n", "d"))
    assert(tf("f").asInstanceOf[LongTensor].data.toSeq === Seq(1L, 0L))
    assert(tf("d").asInstanceOf[LongTensor].data.toSeq === Seq(2L, 2L))
    // stack promotes the integer columns next to the double one
    val st = tf.stack.asInstanceOf[DoubleTensor]
    assert(st.shape === Seq(2, 4))
    assert(st.data.toSeq === Seq(1.0, 1.5, 3.0, 2.0, 0.0, 2.5, 4.0, 2.0))
  }

  test("put attaches a computed tensor positionally; scalar broadcasts") {
    val g = Gdf(frame).ordered(F.col("a"))
    val tf = TensorFrame.from(g.sdf.orderBy("a"), Seq("a", "b"))
    val sum = LongTensor(
      tf("a").asInstanceOf[LongTensor].data
        .zip(tf("b").asInstanceOf[LongTensor].data).map { case (x, y) => x + y },
      Seq(2))
    // the doctest: put(df, "result", add_columns(df)) -> [32, 34]
    val out = TensorFrame.put(g, "result", sum)
    assert(col1[Long](out.sdf.orderBy("a"), "result") === Seq(32L, 34L))
    val scal = TensorFrame.put(g, "k", LongTensor(Array(7L), Seq(1)))
    assert(col1[Long](scal.sdf, "k") === Seq(7L, 7L))
  }

  test("null integer refuses, null float becomes NaN, series round trip") {
    val d = df(schema("i" -> LongType, "x" -> DoubleType),
      Seq[Any](1L, 1.0), Seq[Any](null, null))
    intercept[IllegalArgumentException] {
      TensorFrame.from(d, Seq("i"))
    }
    val t = TensorFrame.from(d, Seq("x"))("x").asInstanceOf[DoubleTensor]
    assert(t.data(1).isNaN)
    val s = TensorFrame.seriesFrom(spark, LongTensor(Array(5L, 6L), Seq(2)), "v")
    assert(col1[Long](s.sdf.orderBy("v"), "v") === Seq(5L, 6L))
  }
}
