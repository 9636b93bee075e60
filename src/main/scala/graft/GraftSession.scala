package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession pre-configured the way every verb in
  * this engine expects (the settings Verify/Bench/specs run under).
  *
  * The interesting choices, and why they are defaults here:
  *  - AQE with partition coalescing + skew-join splitting stays ON: grouped
  *    verbs and the dedup family shuffle on data-dependent keys, and AQE's
  *    runtime re-plan is the first line of defense against skew at scale.
  *  - `shuffle.partitions` sized to the session's parallelism for local
  *    runs (Spark's 200 default thrashes a laptop; on a cluster, leave
  *    unset / size to ~2-3x total cores).
  *  - UTC session timezone: Explorer datetimes are tz-less
  *    (`{:naive_datetime, _}`, SURVEY §1.2); a non-UTC session would shift
  *    them on parquet read.
  *  - `parquet.nanosAsLong`: ns-precision timestamps read as long ns since
  *    Spark is µs-native (SURVEY §1.2 deviation; conversion helpers in
  *    [[StringFns]]).
  *  - ANSI mode OFF (Spark 4 defaults it on): the reference contract is
  *    Polars semantics — float division by zero yields ±infinity/NaN, an
  *    invalid cast yields nil, out-of-range element access yields nil —
  *    where ANSI raises at runtime. A single zero-divisor row must not
  *    turn a working pipeline into a crash; for inputs that trigger no
  *    error the two modes agree, so this flag only converts ANSI's
  *    runtime aborts into the reference's nil/infinity values.
  */
object GraftSession {

  /** The conf map [[local]]/[[builder]] apply — exposed as data so it is
    * spec-testable and copyable into an existing cluster submit. */
  def recommendedConfs(parallelism: Int): Map[String, String] = Map(
    // graft's native expressions as plain SQL functions (shingle_hashes,
    // simhash64, strip_accents, ... — see [[GraftExtensions]])
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.shuffle.partitions" -> parallelism.toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.ansi.enabled" -> "false",
    // size(null) must stay null: the legacy -1 default is TIED to ANSI
    // (sizeOfNull defaults to !ansi), so disabling ANSI would silently
    // resurrect it without this pin
    "spark.sql.legacy.sizeOfNull" -> "false",
    // union must CONCATENATE children's partitions, never zip them:
    // Spark 4's partitioning-aware union merges partition i of every
    // child into one partition when the children's output partitionings
    // compare equal. Two engine contracts break under that: concat_rows'
    // frame order (the reference stacks frames in argument order; a
    // zipped self-union of a hash-partitioned frame interleaves instead)
    // and Shards.readShards' one-partition-per-shard layout (its union
    // of per-shard coalesce(1) children — all SinglePartition — would
    // collapse to ONE serial partition). The engine never relies on
    // partitioning propagating THROUGH a union (grouped verbs window or
    // re-shuffle explicitly), so this trades nothing it uses.
    "spark.sql.unionOutputPartitioning" -> "false")

  /** Builder with the recommended confs applied; caller picks master. */
  def builder(appName: String = "graft",
      parallelism: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    recommendedConfs(parallelism).foldLeft(
      SparkSession.builder().appName(appName)) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Local development session: all cores, shuffle width = core count. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(parallelism = cores).master(s"local[$cores]").getOrCreate()
}
