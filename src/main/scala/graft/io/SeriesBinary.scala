package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import graft.{DType, Gdf}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Raw fixed-width buffer ⇄ series reinterpret (reference
  * `Series.from_binary/3` series.ex:619-632, `to_iovec/1` series.ex:929,
  * `to_binary/1` series.ex:956; Rust `from_list.rs`/`encoding.rs`).
  *
  * Layout matches the reference's native-endian packing on commodity
  * hardware: little-endian, one fixed-width cell per value (`bool` = 1 byte
  * 0/1, `date` = i32 epoch days, `time`/datetime = i64). Nulls have no
  * representation in a fixed-width buffer — same restriction as the
  * reference's io-dtype check (series.ex:930).
  *
  * `toIovec` returns one chunk per Spark partition — the distributed analog
  * of the reference's one-binary-per-polars-chunk contract. `toBinary`
  * concatenates (driver-sized by definition, like all dump-style exports).
  */
object SeriesBinary {

  /** Bytes per value for an io-able logical dtype. Widths follow the
    * LOGICAL dtype (u8 is 1 byte on the wire even though the facade widens
    * its physical Spark type). */
  def width(d: DType): Int = d match {
    case DType.Bool => 1
    case DType.S(b) => b / 8
    case DType.U(b) => b / 8
    case DType.F(b) => b / 8
    case DType.Date => 4
    case DType.Time => 8
    case DType.NaiveDatetime(_) | DType.Datetime(_, _) => 8
    case other =>
      throw new IllegalArgumentException(s"cannot io dtype $other")
  }

  /** Reinterpret a packed buffer as a single-column frame of `dtype`. */
  def fromBinary(spark: SparkSession, bytes: Array[Byte], dtype: DType,
      col: String = "values"): Gdf = {
    val w = width(dtype)
    require(bytes.length % w == 0,
      s"binary for dtype $dtype is expected to be ${w * 8}-bit aligned")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / w
    val values: IndexedSeq[Any] = (0 until n).map { _ =>
      dtype match {
        case DType.Bool => buf.get() != 0
        case DType.S(8) => buf.get()
        case DType.S(16) => buf.getShort()
        case DType.S(32) => buf.getInt()
        case DType.S(64) => buf.getLong()
        case DType.U(8) => (buf.get() & 0xFF).toShort
        case DType.U(16) => buf.getShort() & 0xFFFF
        case DType.U(32) => buf.getInt().toLong & 0xFFFFFFFFL
        case DType.U(64) =>
          val v = buf.getLong()
          new java.math.BigDecimal(java.lang.Long.toUnsignedString(v))
        case DType.F(32) => buf.getFloat()
        case DType.F(64) => buf.getDouble()
        case DType.Date =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(buf.getInt().toLong))
        case DType.Time => buf.getLong()
        case DType.NaiveDatetime(_) =>
          val micros = buf.getLong()
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000).toInt,
            java.time.ZoneOffset.UTC)
        case other => throw new IllegalArgumentException(s"cannot io $other")
      }
    }
    val schema = StructType(Seq(StructField(col, dtype.spark)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(Row(_)).toList), schema)
    new Gdf(df, logical = dtype match {
      case DType.U(_) | DType.Time | DType.NaiveDatetime(_) => Map(col -> dtype)
      case _ => Map.empty
    })
  }

  /** One packed chunk per partition (reference to_iovec). Nulls reject. */
  def toIovec(df: Gdf, col: String): Seq[Array[Byte]] = {
    val dtype = df.dtypes(col)
    val w = width(dtype)
    df.sdf.select(df.sdf(col)).rdd.mapPartitions { it =>
      val rows = it.toArray
      val buf = ByteBuffer.allocate(rows.length * w)
        .order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        require(!r.isNullAt(0), s"cannot to_iovec a series with nils")
        dtype match {
          case DType.Bool => buf.put(if (r.getBoolean(0)) 1.toByte else 0.toByte)
          case DType.S(8) => buf.put(r.getByte(0))
          case DType.S(16) => buf.putShort(r.getShort(0))
          case DType.S(32) => buf.putInt(r.getInt(0))
          case DType.S(64) => buf.putLong(r.getLong(0))
          case DType.U(8) => buf.put(r.getShort(0).toByte)
          case DType.U(16) => buf.putShort(r.getInt(0).toShort)
          case DType.U(32) => buf.putInt(r.getLong(0).toInt)
          case DType.U(64) => buf.putLong(r.getDecimal(0).toBigInteger.longValue())
          case DType.F(32) => buf.putFloat(r.getFloat(0))
          case DType.F(64) => buf.putDouble(r.getDouble(0))
          case DType.Date => buf.putInt(r.get(0) match {
            case d: java.time.LocalDate => d.toEpochDay.toInt
            case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          })
          case DType.Time => buf.putLong(r.getLong(0))
          case DType.NaiveDatetime(_) =>
            val ldt = r.getAs[java.time.LocalDateTime](0)
            buf.putLong(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L)
          case other => throw new IllegalArgumentException(s"cannot io $other")
        }
      }
      Iterator(buf.array())
    }.collect().toSeq
  }

  /** Whole series as one buffer (reference to_binary doctest:
    * `[1, 2, 3] → <<1::64-native, 2::64-native, 3::64-native>>`). */
  def toBinary(df: Gdf, col: String): Array[Byte] = {
    val chunks = toIovec(df, col)
    val out = new Array[Byte](chunks.map(_.length).sum)
    var off = 0
    chunks.foreach { c => System.arraycopy(c, 0, out, off, c.length); off += c.length }
    out
  }
}
