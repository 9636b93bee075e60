package graft

import org.apache.spark.sql.types._

/** Explorer-compatible logical dtype system mapped onto Spark physical types.
  *
  * The reference's canonical dtype list lives at
  * `lib/explorer/shared.ex:7-47` (scalar types + list/struct/decimal) and
  * `lib/explorer/series.ex:12-58` (docs + aliases); alias normalisation
  * (`:integer`→`{:s,64}`, `:float`→`{:f,64}`) at `shared.ex:52-114`.
  *
  * Spark has no unsigned ints, no time-of-day type and no dictionary
  * (category) logical type, so those are *logical* dtypes here: they carry a
  * wider/physical Spark type plus facade metadata. The promotion rule for
  * unsigned ints ("unsigned → signed at 2× width, max 64", reference
  * `series.ex:96-112`) legitimizes the widening.
  */
sealed trait DType {
  /** Physical Spark type backing this logical dtype. */
  def spark: DataType
}

object DType {
  case object Null extends DType { val spark: DataType = NullType }
  case object Bool extends DType { val spark: DataType = BooleanType }

  /** Signed integer of width 8/16/32/64 — exact Spark match. */
  final case class S(bits: Int) extends DType {
    val spark: DataType = bits match {
      case 8 => ByteType; case 16 => ShortType
      case 32 => IntegerType; case 64 => LongType
    }
  }

  /** Unsigned integer — promoted to the next wider signed type
    * (u64 → Decimal(20,0)), logical width kept here. */
  final case class U(bits: Int) extends DType {
    val spark: DataType = bits match {
      case 8 => ShortType; case 16 => IntegerType
      case 32 => LongType; case 64 => DecimalType(20, 0)
    }
  }

  final case class F(bits: Int) extends DType {
    val spark: DataType = if (bits == 32) FloatType else DoubleType
  }

  /** 38-digit max precision in both engines (reference `shared.ex:104-112`). */
  final case class Decimal(precision: Int, scale: Int) extends DType {
    require(precision <= 38, s"decimal precision $precision > 38")
    val spark: DataType = DecimalType(precision, scale)
  }

  case object Str extends DType { val spark: DataType = StringType }
  case object Binary extends DType { val spark: DataType = BinaryType }

  /** Dictionary-encoded string (reference `series.ex:1327,1404`): physically
    * a string; parquet dictionary encoding keeps it compact on disk. */
  case object Category extends DType { val spark: DataType = StringType }

  case object Date extends DType { val spark: DataType = DateType }

  /** Time-of-day — Spark has no TimeType; nanoseconds since midnight as i64
    * (needed by hour/minute/second/nanosecond, `series.ex:6713-6776`). */
  case object Time extends DType { val spark: DataType = LongType }

  /** tz-less timestamp. Spark is µs-precision; ms/ns are logical only. */
  final case class NaiveDatetime(precision: TimeUnit) extends DType {
    val spark: DataType = TimestampNTZType
  }

  /** tz-aware timestamp (reference `series.ex:21-24`); session tz = UTC. */
  final case class Datetime(precision: TimeUnit, tz: String) extends DType {
    val spark: DataType = TimestampType
  }

  /** Signed duration (reference `lib/explorer/duration.ex:1-71`) — stored as
    * µs in a DayTimeInterval. */
  final case class Duration(precision: TimeUnit) extends DType {
    val spark: DataType = DayTimeIntervalType()
  }

  final case class List(inner: DType) extends DType {
    val spark: DataType = ArrayType(inner.spark)
  }

  final case class Struct(fields: Seq[(String, DType)]) extends DType {
    val spark: DataType =
      StructType(fields.map { case (n, d) => StructField(n, d.spark) })
  }

  sealed trait TimeUnit
  case object Ms extends TimeUnit
  case object Us extends TimeUnit
  case object Ns extends TimeUnit

  /** Best-effort inverse map Spark → logical dtype. u/category/time
    * distinctions don't exist physically; they are carried per-column in
    * `Gdf.logical` (set via `withLogical`/`castLogical`, threaded through
    * select/rename/mutate/joins) and overlaid by `Gdf.dtypes`. */
  def fromSpark(dt: DataType): DType = dt match {
    case NullType => Null
    case BooleanType => Bool
    case ByteType => S(8); case ShortType => S(16)
    case IntegerType => S(32); case LongType => S(64)
    case FloatType => F(32); case DoubleType => F(64)
    case d: DecimalType => Decimal(d.precision, d.scale)
    case StringType => Str
    case BinaryType => Binary
    case DateType => Date
    case TimestampNTZType => NaiveDatetime(Us)
    case TimestampType => Datetime(Us, "Etc/UTC")
    case _: DayTimeIntervalType => Duration(Us)
    case ArrayType(e, _) => List(fromSpark(e))
    case StructType(fs) => Struct(fs.toSeq.map(f => f.name -> fromSpark(f.dataType)))
    case other => throw new IllegalArgumentException(s"unmapped Spark type $other")
  }

  /** Numeric promotion lattice for binary arithmetic, mirroring the
    * reference's rules (`series.ex:96-112, 3460-3753`): int⊕int → widest int,
    * int⊕float → f64 (unless f32⊕f32), any division → float. Catalyst's own
    * coercion differs (e.g. int/int), so arithmetic in [[Series]] casts
    * explicitly where the rules diverge. */
  /** `Series.iotype` (reference series.ex:1294-1300 + shared.ex:498-511):
    * the fixed-width raw-buffer element type, as (sign-char, bits), that a
    * series of this dtype reinterprets to/from in [[graft.io.SeriesBinary]];
    * None for variable-width dtypes (string/binary/list/struct). */
  def iotype(d: DType): Option[(Char, Int)] = d match {
    case F(b) => Some(('f', b))
    case S(b) => Some(('s', b))
    case U(b) => Some(('u', b))
    case Bool => Some(('u', 8))
    case Date => Some(('s', 32))
    case Time => Some(('s', 64))
    case NaiveDatetime(_) | Datetime(_, _) | Duration(_) => Some(('s', 64))
    case Category => Some(('u', 32))
    case Decimal(_, _) => Some(('s', 128))
    case _ => None
  }

  def promote(a: DType, b: DType): DType = (a, b) match {
    case (x, y) if x == y => x
    case (Null, y) => y
    case (x, Null) => x
    case (S(x), S(y)) => S(math.max(x, y))
    case (U(x), U(y)) => U(math.max(x, y))
    case (S(x), U(y)) => S(math.min(64, math.max(x, 2 * y)))
    case (U(x), S(y)) => promote(b, a)
    // int ⊕ float keeps the float side's width (reference shared.ex:397-398:
    // {s,_} ⊕ {f,32} → {f,32}) — only f32 ⊕ f64 widens to f64
    case (F(x), F(y)) => F(math.max(x, y))
    case (F(x), _) => F(x)
    case (_, F(x)) => F(x)
    case (d: Decimal, _) => d
    case (_, d: Decimal) => d
    case _ =>
      throw new IllegalArgumentException(s"cannot promote $a with $b")
  }
}
