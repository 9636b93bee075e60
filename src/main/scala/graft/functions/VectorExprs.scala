package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native random-hyperplane signature for embedding LSH
  * ([[graft.operators.Similarity]]).
  *
  * The HOF formulation (`aggregate(zip_with(vec, sequence(...), ...))` per
  * plane) re-derives every hyperplane component ±sign from xxhash64 PER ROW
  * on the interpreted lambda path — planes × dims lambda evaluations and two
  * array allocations per row per plane. This expression derives the sign
  * matrix ONCE per (task, dims) and runs the projection as a JIT-compiled
  * dot-product loop; output bits are identical to the HOF version (same
  * `xxhash64(seed, plane, i) & 1` chain: seed hashed as long, plane and
  * element index as ints — Spark's per-type XXH64 fold).
  */
case class HyperplaneSig(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 64, s"planes $planes out of [1, 64]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)

  // lazy: child is unresolved at construction time (dataType would throw)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"hyperplane_sig over $other")
  }

  // sign matrix cache: per-task expression instance, keyed by dims (all rows
  // of a column share dims in practice; a ragged column just re-derives)
  @transient private var signs: Array[Array[Double]] = _
  @transient private var cachedDims: Int = -1

  private def signMatrix(dims: Int): Array[Array[Double]] = {
    if (cachedDims != dims) {
      val m = Array.ofDim[Double](planes, dims)
      var p = 0
      while (p < planes) {
        val hp = XXH64.hashInt(p, XXH64.hashLong(seed, 42L))
        var i = 0
        while (i < dims) {
          m(p)(i) = if ((XXH64.hashInt(i, hp) & 1L) == 0L) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      signs = m
      cachedDims = dims
    }
    signs
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val m = signMatrix(dims)
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      v(i) = if (arr.isNullAt(i)) 0.0
        else if (isFloat) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val s = m(p)
      var dot = 0.0
      var j = 0
      while (j < dims) { dot += v(j) * s(j); j += 1 }
      if (dot > 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

object VectorExprs {
  def hyperplaneSig(vec: Column, planes: Int, seed: Long): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, seed))
}
