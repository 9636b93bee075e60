package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Saturating accumulator: counts every element exactly, but STORES at most
  * `cap + 1` — enough to decide "size within [2, cap]" without ever holding
  * a degenerate group's full contents. */
private[functions] final class CappedBuf(var seen: Long, var n: Int,
    var items: Array[Long]) {
  def add(cap: Int, v: Long): Unit = {
    seen += 1L
    if (n <= cap) { // keep cap+1 so saturation is observable from items too
      if (n == items.length)
        items = java.util.Arrays.copyOf(items, math.min(items.length * 2, cap + 2))
      items(n) = v; n += 1
    }
  }
}

/** Capped `sort_array(collect_list(id))` for LSH/inverted-index bucket
  * stages, evaluating to NULL unless the group's true size is in
  * [2, cap] — the exact semantics of the
  * `collect_list → size.between(2, cap)` idiom every candidate generator
  * used, with two scale properties that idiom lacks:
  *
  *  - bounded buffers: a degenerate bucket (boilerplate shingle, all-zero
  *    simhash) holds ≤ cap+1 longs instead of its full posting list — the
  *    classic web-corpus OOM;
  *  - bounded shuffle: the PARTIAL aggregation saturates map-side too, so a
  *    hot key ships ≤ cap+1 elements per map task instead of every id it
  *    matched, which un-skews the reducer that would otherwise receive the
  *    whole posting list only to drop it in the size filter.
  *
  * Group sizes are still counted exactly (`seen`), so the [2, cap] band is
  * decided on true cardinality, never on the truncated store.
  *
  * `minSize` widens the band's floor for consumers that must KEEP
  * singleton groups — a persisted LSH index stores one-member buckets
  * because a FUTURE batch doc may land in them ([[graft.operators.Dedup
  * .writeMinhashIndex]]); live candidate generation keeps the default 2
  * (a singleton bucket can never produce a pair). */
case class CappedSortedIds(child: Expression, cap: Int,
    minSize: Int = 2,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedBuf] with UnaryLike[Expression] {
  require(cap >= 2, s"cap $cap must be >= 2")
  require(minSize >= 1, s"minSize $minSize must be >= 1")

  override def prettyName: String = "capped_sorted_ids"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CappedBuf =
    new CappedBuf(0L, 0, new Array[Long](8))

  override def update(b: CappedBuf, input: InternalRow): CappedBuf = {
    val v = child.eval(input)
    if (v != null) b.add(cap, v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedBuf, o: CappedBuf): CappedBuf = {
    b.seen += o.seen - o.n // add() below re-counts o's stored items
    var i = 0
    while (i < o.n) { b.add(cap, o.items(i)); i += 1 }
    b
  }

  override def eval(b: CappedBuf): Any =
    if (b.seen < minSize.toLong || b.seen > cap) null
    else {
      val out = java.util.Arrays.copyOf(b.items, b.n)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(b: CappedBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * b.n)
    bb.putLong(b.seen); bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val seen = bb.getLong; val n = bb.getInt
    val items = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { items(i) = bb.getLong; i += 1 }
    new CappedBuf(seen, n, items)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedSortedIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSortedIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CappedSortedIds =
    copy(child = c)
}

/** [[CappedSortedIds]] over `struct<bigint,bigint>` elements (the simhash
  * bucket rows): two parallel capped long arrays, emitted sorted by
  * (first, second) as `array<struct<id,simhash>>` — drop-in for
  * `sort_array(collect_list(struct(id, simhash)))` + size band. */
case class CappedSortedIdSigs(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(CappedBuf, CappedBuf)]
    with UnaryLike[Expression] {
  require(cap >= 2, s"cap $cap must be >= 2")

  override def prettyName: String = "capped_sorted_id_sigs"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, false),
    StructField("simhash", LongType, false))), containsNull = false)

  override def createAggregationBuffer(): (CappedBuf, CappedBuf) =
    (new CappedBuf(0L, 0, new Array[Long](8)),
      new CappedBuf(0L, 0, new Array[Long](8)))

  override def update(b: (CappedBuf, CappedBuf), input: InternalRow): (CappedBuf, CappedBuf) = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      b._1.add(cap, r.getLong(0)); b._2.add(cap, r.getLong(1))
    }
    b
  }

  override def merge(b: (CappedBuf, CappedBuf), o: (CappedBuf, CappedBuf)): (CappedBuf, CappedBuf) = {
    b._1.seen += o._1.seen - o._1.n
    b._2.seen += o._2.seen - o._2.n
    var i = 0
    while (i < o._1.n) {
      b._1.add(cap, o._1.items(i)); b._2.add(cap, o._2.items(i)); i += 1
    }
    b
  }

  override def eval(b: (CappedBuf, CappedBuf)): Any =
    if (b._1.seen < 2L || b._1.seen > cap) null
    else {
      val n = b._1.n
      val idx = Array.range(0, n).sortBy(i => (b._1.items(i), b._2.items(i)))
      val rows = new Array[Any](n)
      var i = 0
      while (i < n) {
        rows(i) = InternalRow(b._1.items(idx(i)), b._2.items(idx(i)))
        i += 1
      }
      new GenericArrayData(rows)
    }

  override def serialize(b: (CappedBuf, CappedBuf)): Array[Byte] = {
    val n = b._1.n
    val bb = java.nio.ByteBuffer.allocate(12 + 16 * n)
    bb.putLong(b._1.seen); bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b._1.items(i)); bb.putLong(b._2.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): (CappedBuf, CappedBuf) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val seen = bb.getLong; val n = bb.getInt
    val a = new Array[Long](math.max(n, 8)); val s = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { a(i) = bb.getLong; s(i) = bb.getLong; i += 1 }
    (new CappedBuf(seen, n, a), new CappedBuf(seen, n, s))
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedSortedIdSigs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSortedIdSigs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CappedSortedIdSigs =
    copy(child = c)
}

/** Streaming first+second moments of a vector column in ONE pass with a
  * bounded buffer: count, element-wise sum, and the upper triangle of the
  * Gram matrix Σ x·xᵀ — everything PCA/covariance needs, without the d²
  * per-row explode a SQL formulation would pay. The buffer is
  * 1 + d + d(d+1)/2 doubles regardless of row count; partial aggregation
  * merges map-side, so the shuffle ships ONE buffer per map task, not per
  * row. Null vectors are skipped (counted nowhere); a wrong-length vector
  * fails loud — a silent truncation would corrupt every covariance it
  * touches. */
private[functions] final class MomentsBuf(var n: Long,
    val sum: Array[Double], val gram: Array[Double])

case class VectorMoments(child: Expression, dim: Int,
    shift: Seq[Double] = Nil,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuf] with UnaryLike[Expression] {
  require(dim >= 1, s"vector_moments dim $dim must be >= 1")
  require(shift.isEmpty || shift.length == dim,
    s"vector_moments shift length ${shift.length} != dim $dim")
  // moments are accumulated about `shift` (y = x − shift): covariance from
  // raw moments cancels catastrophically when |mean| >> std (Σxxᵀ and
  // n·μμᵀ agree in their leading ~16 digits); shifting by any point NEAR
  // the data — the caller samples one row — makes the subtraction benign.
  @transient private lazy val sh: Array[Double] =
    if (shift.isEmpty) new Array[Double](dim) else shift.toArray

  override def prettyName: String = "vector_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("gram", ArrayType(DoubleType, containsNull = false))))

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"vector_moments over $other")
  }

  override def createAggregationBuffer(): MomentsBuf =
    new MomentsBuf(0L, new Array[Double](dim),
      new Array[Double](dim * (dim + 1) / 2))

  override def update(b: MomentsBuf, input: InternalRow): MomentsBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"vector_moments: expected dim $dim, got ${arr.numElements()}")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        x(i) = (if (arr.isNullAt(i)) throw new IllegalArgumentException(
            "vector_moments: null vector element")
          else if (isFloat) arr.getFloat(i).toDouble
          else arr.getDouble(i)) - sh(i)
        i += 1
      }
      b.n += 1L
      var k = 0
      i = 0
      while (i < dim) {
        b.sum(i) += x(i)
        var j = i
        while (j < dim) { b.gram(k) += x(i) * x(j); k += 1; j += 1 }
        i += 1
      }
    }
    b
  }

  override def merge(b: MomentsBuf, o: MomentsBuf): MomentsBuf = {
    b.n += o.n
    var i = 0
    while (i < dim) { b.sum(i) += o.sum(i); i += 1 }
    i = 0
    while (i < b.gram.length) { b.gram(i) += o.gram(i); i += 1 }
    b
  }

  override def eval(b: MomentsBuf): Any =
    InternalRow(b.n, new GenericArrayData(b.sum),
      new GenericArrayData(b.gram))

  override def serialize(b: MomentsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 8 * (b.sum.length + b.gram.length))
    bb.putLong(b.n)
    b.sum.foreach(bb.putDouble)
    b.gram.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sum = Array.fill(dim)(bb.getDouble)
    val gram = Array.fill(dim * (dim + 1) / 2)(bb.getDouble)
    new MomentsBuf(n, sum, gram)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorMoments =
    copy(child = c)
}

/** Streaming PROJECTED moments of a vector column in one pass with a
  * bounded buffer: count, element-wise sum, and G = Σ y·(yᵀΩ) for a
  * fixed d×m test matrix Ω (y = x − shift) — the distributed matvec a
  * randomized top-k eigensolver needs ([[graft.operators.Embeddings
  * .fitPcaTopK]]). Where [[VectorMoments]] ships d(d+1)/2 doubles per
  * map task (the full covariance — 67 MB at d = 4096), this ships
  * 1 + d + d·m: the right algorithm when the caller wants k ≪ d
  * directions, because C·Ω is computable without ever materializing C.
  * Per-row cost is 2dm flops (m dot products + a rank-1 accumulate);
  * partial aggregation merges map-side, so the shuffle ships ONE buffer
  * per map task, never a row. Null vectors are skipped; a wrong-length
  * vector fails loud. */
private[functions] final class ProjMomentsBuf(var n: Long,
    val sum: Array[Double], val g: Array[Double])

case class VectorProjMoments(child: Expression, dim: Int, m: Int,
    shift: Seq[Double], omega: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ProjMomentsBuf]
    with UnaryLike[Expression] {
  require(dim >= 1 && m >= 1, s"vector_proj_moments dim $dim, m $m")
  require(shift.isEmpty || shift.length == dim,
    s"vector_proj_moments shift length ${shift.length} != dim $dim")
  require(omega.length == dim * m,
    s"vector_proj_moments omega length ${omega.length} != dim*m ${dim * m}")
  @transient private lazy val sh: Array[Double] =
    if (shift.isEmpty) new Array[Double](dim) else shift.toArray
  // row-major d×m: om(i*m + j) = Ω(i, j)
  @transient private lazy val om: Array[Double] = omega.toArray

  override def prettyName: String = "vector_proj_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("g", ArrayType(DoubleType, containsNull = false))))

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"vector_proj_moments over $other")
  }

  override def createAggregationBuffer(): ProjMomentsBuf =
    new ProjMomentsBuf(0L, new Array[Double](dim),
      new Array[Double](dim * m))

  override def update(b: ProjMomentsBuf, input: InternalRow): ProjMomentsBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"vector_proj_moments: expected dim $dim, got ${arr.numElements()}")
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        y(i) = (if (arr.isNullAt(i)) throw new IllegalArgumentException(
            "vector_proj_moments: null vector element")
          else if (isFloat) arr.getFloat(i).toDouble
          else arr.getDouble(i)) - sh(i)
        i += 1
      }
      b.n += 1L
      // p = yᵀΩ (m values), then G += y·pᵀ — both loops walk the
      // row-major Ω/G buffers contiguously
      val p = new Array[Double](m)
      i = 0
      while (i < dim) {
        val yi = y(i)
        b.sum(i) += yi
        val off = i * m
        var j = 0
        while (j < m) { p(j) += yi * om(off + j); j += 1 }
        i += 1
      }
      i = 0
      while (i < dim) {
        val yi = y(i)
        val off = i * m
        var j = 0
        while (j < m) { b.g(off + j) += yi * p(j); j += 1 }
        i += 1
      }
    }
    b
  }

  override def merge(b: ProjMomentsBuf, o: ProjMomentsBuf): ProjMomentsBuf = {
    b.n += o.n
    var i = 0
    while (i < dim) { b.sum(i) += o.sum(i); i += 1 }
    i = 0
    while (i < b.g.length) { b.g(i) += o.g(i); i += 1 }
    b
  }

  override def eval(b: ProjMomentsBuf): Any =
    InternalRow(b.n, new GenericArrayData(b.sum), new GenericArrayData(b.g))

  override def serialize(b: ProjMomentsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 8 * (b.sum.length + b.g.length))
    bb.putLong(b.n)
    b.sum.foreach(bb.putDouble)
    b.g.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ProjMomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sum = Array.fill(dim)(bb.getDouble)
    val g = Array.fill(dim * m)(bb.getDouble)
    new ProjMomentsBuf(n, sum, g)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorProjMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorProjMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorProjMoments =
    copy(child = c)
}

object AggExprs {
  /** `sort_array(collect_list(id))` bounded at `cap`: NULL unless the
    * group's true size is in [minSize, cap] (default [2, cap]). */
  def cappedSortedIds(id: Column, cap: Int, minSize: Int = 2): Column =
    Bridge.column(
      CappedSortedIds(Bridge.expression(id), cap, minSize)
        .toAggregateExpression())

  /** Struct variant for (id, simhash) bucket rows. */
  def cappedSortedIdSigs(row: Column, cap: Int): Column =
    Bridge.column(
      CappedSortedIdSigs(Bridge.expression(row), cap).toAggregateExpression())

  /** One-pass count/sum/Gram of a fixed-dim vector column, optionally
    * accumulated about `shift` (see [[VectorMoments]]). */
  def vectorMoments(vec: Column, dim: Int,
      shift: Seq[Double] = Nil): Column =
    Bridge.column(
      VectorMoments(Bridge.expression(vec), dim, shift)
        .toAggregateExpression())

  /** One-pass count/sum/Σ y·(yᵀΩ) against a fixed d×m test matrix
    * (row-major `omega`), about `shift` (see [[VectorProjMoments]]). */
  def vectorProjMoments(vec: Column, dim: Int, m: Int,
      shift: Seq[Double], omega: Seq[Double]): Column =
    Bridge.column(
      VectorProjMoments(Bridge.expression(vec), dim, m, shift, omega)
        .toAggregateExpression())
}
