package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Join verbs (reference `data_frame.ex:5137-5580`): equi joins
  * inner/left/right/outer/cross with `_right` suffixing and `nulls_equal`,
  * plus semi/anti (Spark-native extras) and the as-of join.
  *
  * Physical strategy is Catalyst's business (broadcast / SMJ / shuffled-hash
  * + AQE replace Polars' hash/sort-merge choice wholesale, SURVEY §2.8); the
  * [[Joins.broadcastRight]] hint covers the small-dimension case explicitly.
  */
object Joins {

  /** Equi join. `on` holds (leftCol, rightCol) pairs — same-name pairs give
    * Explorer's default overlapping-column behavior. Clashing non-key columns
    * from the right get the `_right` suffix (reference data_frame.ex:5380-5409);
    * `:outer` keeps both key columns, the right one suffixed (doctest
    * data_frame.ex:5196-5207). `nullsEqual` uses null-safe `<=>`
    * (data_frame.ex:5150-5155). */
  def join(left: Gdf, right: Gdf, on: Seq[(String, String)],
      how: String = "inner", nullsEqual: Boolean = false,
      broadcastRight: Boolean = false): Gdf = {
    require(Set("inner", "left", "right", "outer", "cross", "semi", "anti")
      .contains(how), s"invalid join type $how")
    if (how == "cross") {
      // the SAME suffixing contract as the equi path: un-renamed, a shared
      // name yields two identical output columns and AMBIGUOUS_REFERENCE
      // on any downstream use (and right's logical entry silently
      // overrode left's)
      val clashes = right.names.toSet intersect left.names.toSet
      val renames = right.names
        .map(n => n -> (if (clashes(n)) s"${n}_right" else n)).toMap
      requireSuffixTargetsFree(left.names, right.names, renames, "cross join")
      val r = right.sdf.withColumnsRenamed(renames)
      return new Gdf(left.sdf.crossJoin(
        if (broadcastRight) F.broadcast(r) else r),
        groups = left.groups,
        logical = left.logical ++ right.logical.map {
          case (k, v) => renames.getOrElse(k, k) -> v })
    }
    require(on.nonEmpty,
      s"$how join needs at least one key pair (only cross joins are " +
        "keyless)")

    val l = left.sdf
    val rightKeys = on.map(_._2)
    val keepRightKeys = how == "outer"
    // suffix right-side clashes (key cols too, when kept)
    val clashes = right.names.toSet intersect left.names.toSet
    val renames = right.names.map { n =>
      val isKey = rightKeys.contains(n)
      if (clashes(n) && (!isKey || keepRightKeys)) n -> s"${n}_right" else n -> n
    }.toMap
    requireSuffixTargetsFree(left.names, right.names, renames, s"$how join")
    val r0 = right.sdf.withColumnsRenamed(renames)
    val r = if (broadcastRight) F.broadcast(r0) else r0

    val cond = on.map { case (lk, rk0) =>
      val rk = renames(rk0)
      if (nullsEqual) l(lk) <=> r0(rk) else l(lk) === r0(rk)
    }.reduce(_ && _)

    val sparkHow = how match {
      case "outer" => "full"
      case "semi" => "left_semi"
      case "anti" => "left_anti"
      case h => h
    }
    val joined = l.join(r, cond, sparkHow)
    val out = how match {
      case "inner" | "left" | "semi" | "anti" =>
        // merged keys: keep left's, drop right's (never renamed in these
        // hows — keys suffix only when keepRightKeys)
        on.foldLeft(joined) { case (d, (_, rk0)) => d.drop(r0(rk0)) }
      case "right" =>
        // reference rewrites right join as swapped left (lazy_frame.ex:600-616);
        // Spark has native right join — drop the left key, keep right's name
        on.foldLeft(joined) { case (d, (lk, _)) => d.drop(l(lk)) }
      case "outer" => joined // both key columns kept, right suffixed
    }
    // grouped rule (reference data_frame.ex join docs): inner/left/semi/
    // anti/outer keep the LEFT side's groups, a right join keeps the
    // RIGHT side's (remapped through the suffixing); either way only
    // groups whose column survived the join remain
    val outGroups = (how match {
      case "right" => right.groups.map(g => renames.getOrElse(g, g))
      case _ => left.groups
    }).filter(out.columns.contains)
    // logical dtypes: right-side names remapped through the suffixing,
    // and entries for COLUMNS THE JOIN DROPS removed — a dropped right
    // key whose name matches a surviving left column would otherwise
    // override the left column's dtype with its stale annotation
    val rightLogical = right.logical.map {
      case (k, v) => renames.getOrElse(k, k) -> v }
    val merged = how match {
      case "semi" | "anti" => left.logical // output is the left side only
      case "inner" | "left" => left.logical ++ (rightLogical -- rightKeys)
      case "right" => (left.logical -- on.map(_._1)) ++ rightLogical
      case "outer" => left.logical ++ rightLogical
    }
    new Gdf(out, groups = outGroups, logical = merged)
  }

  /** Loud suffix-collision contract shared by every suffixing join: when
    * `x` clashes and `x_right` ALREADY exists on either side, the rename
    * would produce duplicate columns (or, in as-of's withColumn form,
    * silently overwrite the existing one). */
  private def requireSuffixTargetsFree(leftNames: Seq[String],
      rightNames: Seq[String], renames: Map[String, String],
      who: String): Unit = {
    val targets = renames.collect { case (n, t) if n != t => t }.toSeq
    val occupied = (leftNames ++ rightNames).toSet
    val bad = targets.filter(occupied.contains).sorted
    require(bad.isEmpty,
      s"$who: suffixing a clashing column would collide with existing " +
        s"column(s) ${bad.mkString(", ")} — rename before joining")
  }

  /** Temp working columns a verb is about to add with `withColumn` —
    * pre-existing same-named USER columns would be silently replaced and
    * lost, so refuse them up front. */
  private def requireNoReserved(names: Seq[String], reserved: Set[String],
      who: String): Unit = {
    val clash = names.filter(reserved.contains)
    require(clash.isEmpty,
      s"$who reserves internal column name(s) ${clash.mkString(", ")} — " +
        "rename before joining")
  }

  /** Shorthand for same-name keys. */
  def join(left: Gdf, right: Gdf, on: Seq[String], how: String): Gdf =
    join(left, right, on.map(k => k -> k), how)

  /** Skew-salted equi join (scale tooling, SURVEY §7 "salting for skew"):
    * when a handful of hot keys dominate, a plain shuffle join puts a whole
    * hot key on one task. Salting splits each left-side key into `buckets`
    * random sub-keys and replicates the right side once per bucket, so a
    * hot key fans out over `buckets` tasks. AQE's skew-join handles sort-
    * merge cases adaptively; explicit salting remains the tool for
    * deterministic plans and aggregate-after-join pipelines. */
  def saltedJoin(left: Gdf, right: Gdf, on: Seq[(String, String)],
      how: String = "inner", buckets: Int = 8, seed: Long = 42L): Gdf = {
    require(Set("inner", "left").contains(how),
      "salting supports inner/left joins")
    require(buckets > 0, s"saltedJoin needs positive buckets, got $buckets")
    requireNoReserved(left.names ++ right.names, Set("__salt"), "saltedJoin")
    // a uniform bucket straight from the seeded uniform — hashing it
    // first added two expression evals per row for no distributional gain
    val l = left.sdf.withColumn("__salt",
      F.floor(F.rand(seed) * buckets).cast("int"))
    val r = right.sdf.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    // thread groups/logical through the inner join (the Joins.join rule) —
    // a bare Gdf wrap here silently dropped the left side's grouping and
    // logical dtypes, making saltedJoin differ from the equivalent join
    val out = Joins.join(
      new Gdf(l, groups = left.groups, logical = left.logical),
      new Gdf(r, groups = right.groups, logical = right.logical),
      on :+ ("__salt" -> "__salt"), how)
    new Gdf(out.sdf.drop("__salt"), groups = out.groups,
      logical = out.logical)
  }

  /** Point-in-interval RANGE join (beyond-reference; the other operator the
    * brief names next to as-of). A bare non-equi condition
    * (`lo <= p AND p <= hi`) gives Spark NO equi key, so Catalyst plans a
    * BroadcastNestedLoopJoin — all-pairs, the shape the plan guard bans.
    *
    * Scale path: bucketize. Every interval replicates to the fixed-width
    * bins it covers (`sequence(floor(lo/w), floor(hi/w))` explode), every
    * point probes exactly its own bin — a plain shuffle HASH join on the
    * bin id plus a residual `BETWEEN` filter. Cost is
    * O(points + intervals × span/w) shuffle rows, linear and AQE-skew-
    * handled; pick `binWidth` ≈ the typical interval span so replication
    * stays near 1. `maxBinsPerInterval` guards against a degenerate wide
    * interval exploding the build side (same capping discipline as the
    * dedup bucket caps).
    *
    * Columns are LongType (epoch micros for time — caller casts); interval
    * ends are inclusive. */
  def rangeJoin(points: Gdf, intervals: Gdf, pointOn: String,
      loOn: String, hiOn: String, binWidth: Long,
      maxBinsPerInterval: Int = 1024): Gdf = {
    require(binWidth > 0, "rangeJoin needs a positive binWidth")
    requireNoReserved(points.names ++ intervals.names,
      Set("__bin", "__nbins"), "rangeJoin")
    val p = points.sdf.withColumn("__bin", F.floor(F.col(pointOn) / binWidth))
    // suffix interval-side clashes with the points side (the Joins.join
    // rule) — un-handled, a shared name yields AMBIGUOUS_REFERENCE on any
    // downstream select, or resolves the residual BETWEEN filter against
    // the wrong side when the clash is loOn/hiOn themselves
    val clashes = intervals.names.toSet intersect points.names.toSet
    val renames = intervals.names
      .map(n => n -> (if (clashes(n)) s"${n}_right" else n)).toMap
    requireSuffixTargetsFree(points.names, intervals.names, renames,
      "rangeJoin")
    val lo = renames(loOn); val hi = renames(hiOn)
    // inner-join semantics for null bounds: a null lo/hi interval matches
    // nothing and is dropped — left in, its null __nbins would fall through
    // the span guard's `when` into raise_error and abort the whole query
    val iv = intervals.sdf.withColumnsRenamed(renames)
      .filter(F.col(lo).isNotNull && F.col(hi).isNotNull)
      .withColumn("__nbins",
        (F.floor(F.col(hi) / binWidth) - F.floor(F.col(lo) / binWidth)))
    // fail loudly rather than silently exploding the shuffle
    val guarded = iv.withColumn("__nbins",
      F.when(F.col("__nbins") < maxBinsPerInterval, F.col("__nbins"))
        .otherwise(F.raise_error(F.concat(F.lit(
          s"rangeJoin: interval spans more than $maxBinsPerInterval bins " +
            s"of width $binWidth — raise binWidth: "), F.col(lo)))))
    val binned = guarded.withColumn("__bin",
      F.explode(F.sequence(F.floor(F.col(lo) / binWidth),
        F.floor(F.col(lo) / binWidth) + F.col("__nbins"))))
      .drop("__nbins")
    val joined = p.join(binned, Seq("__bin"))
      .filter(F.col(pointOn) >= F.col(lo) && F.col(pointOn) <= F.col(hi))
      .drop("__bin")
    // left (points) side's groups kept — the Joins.join rule, now actually
    // propagated (the grouped-verb matrix previously only asserted it)
    new Gdf(joined, groups = points.groups,
      logical = points.logical ++ intervals.logical.map {
        case (k, v) => renames.getOrElse(k, k) -> v
      })
  }

  /** `join_asof/3` (reference data_frame.ex:5416-5580; AsofStrategy
    * lazyframe.rs:371-426): for each left row, pick the right row with the
    * greatest key ≤ left key (backward), smallest ≥ (forward), or closest
    * (nearest), optionally pre-grouped by exact-match `by` keys.
    *
    * Spark-first design — a single shuffle on (by, key), no custom physical
    * operator: union the two sides tagged, sort within (by)-partitions by
    * (key, side), and carry the latest/earliest right payload across left
    * rows with `last/first(ignoreNulls) over` an unbounded frame. This is the
    * classic merge-join formulation: it scales linearly, never broadcasts the
    * right side, and AQE handles skewed `by` keys.
    *
    * Right payload columns arrive packed in one struct so a single window
    * expression carries them all. */
  def joinAsof(left: Gdf, right: Gdf, leftOn: String, rightOn: String,
      by: Seq[String] = Nil, strategy: String = "backward"): Gdf = {
    import org.apache.spark.sql.types.{StructField, StructType}
    requireNoReserved(left.names ++ right.names,
      Set("__asof_k", "__side", "__payload", "__m", "__pid", "__mb",
        "__mf", "__w", "__seed"), "joinAsof")
    val l = left.sdf
    val payloadCols = right.names.filterNot(n => n == rightOn || by.contains(n))
    // the payload suffix form is withColumn, which would OVERWRITE (not
    // duplicate) a pre-existing x_right — silent data loss; refuse like
    // the equi path
    requireSuffixTargetsFree(left.names, payloadCols,
      payloadCols.filter(l.columns.contains)
        .map(n => n -> s"${n}_right").toMap, "joinAsof")
    val payload = F.struct(
      (right.sdf(rightOn).as("__asof_key") +:
        payloadCols.map(n => right.sdf(n).as(n))): _*)
    val payloadType = StructType(
      StructField("__asof_key", right.schema(rightOn).dataType) +:
        payloadCols.map(n => StructField(n, right.schema(n).dataType)))

    val lTagged = l
      .withColumn("__asof_k", l(leftOn))
      .withColumn("__side", F.lit(1))
      .withColumn("__payload", F.lit(null).cast(payloadType))
    val rTagged = right.sdf
      .withColumn("__asof_k", right.sdf(rightOn))
      .withColumn("__side", F.lit(0))
      .withColumn("__payload", payload)
      .select((by.map(F.col) ++ Seq(F.col("__asof_k"), F.col("__side"),
        F.col("__payload")) ++
        l.columns.filterNot(c => by.contains(c)).map(c =>
          F.lit(null).cast(l.schema(c).dataType).as(c))): _*)

    val unioned = lTagged.unionByName(rTagged)

    require(Set("backward", "forward", "nearest").contains(strategy),
      s"asof strategy $strategy")
    // distance for "nearest", in the key's NATIVE domain: the old
    // cast-everything-to-double route failed analysis for DateType keys
    // and silently rounded int64 keys past 2^53 (epoch-ns timestamps!),
    // letting the farther row win
    def asofDist(a: Column, b: Column): Column = {
      import org.apache.spark.sql.types._
      left.schema(leftOn).dataType match {
        case DateType => F.abs(F.unix_date(a) - F.unix_date(b)).cast(LongType)
        case TimestampType | TimestampNTZType =>
          F.abs(F.unix_micros(a.cast(TimestampType)) -
            F.unix_micros(b.cast(TimestampType)))
        case ByteType | ShortType | IntegerType | LongType =>
          F.abs(a.cast(LongType) - b.cast(LongType)) // exact 64-bit math
        case FloatType | DoubleType | _: DecimalType => F.abs(a - b)
        case other => throw new IllegalArgumentException(
          s"joinAsof nearest needs a numeric or temporal key, got $other")
      }
    }
    def combineNearest(src: DataFrame, b: Column, f: Column): DataFrame = {
      val k = F.col("__asof_k")
      val db = asofDist(k, b.getField("__asof_key"))
      val df_ = asofDist(f.getField("__asof_key"), k)
      src.withColumn("__m",
        F.when(b.isNull, f).when(f.isNull, b)
          .when(df_ < db, f).otherwise(b))
    }

    // null asof keys never participate: a null-keyed RIGHT row would sort
    // nulls-first and get picked up by last(ignoreNulls) as a bogus
    // "earliest" match, so its payload is masked out of the carry
    val rightPayload = F.when(F.col("__side") === 0 &&
      F.col("__asof_k").isNotNull, F.col("__payload"))

    val withMatch = if (by.nonEmpty) {
      val part = Window.partitionBy(by.map(F.col): _*)
      def matched(dir: String): Column = dir match {
        case "backward" => // right rows sort before left at equal key
          F.last(rightPayload, ignoreNulls = true).over(part
            .orderBy(F.col("__asof_k"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, 0))
        case "forward" => // right rows sort after left at equal key
          F.first(rightPayload, ignoreNulls = true).over(part
            .orderBy(F.col("__asof_k"), F.col("__side").desc)
            .rowsBetween(0, Window.unboundedFollowing))
      }
      strategy match {
        case "backward" | "forward" =>
          unioned.withColumn("__m", matched(strategy))
        case "nearest" =>
          combineNearest(unioned, matched("backward"), matched("forward"))
      }
    } else {
      // BY-LESS asof: Window.partitionBy() with no columns funnels both
      // frames through ONE task — the global-window shape the plan guards
      // ban. Instead: range-partition the union on the key, carry the
      // match WITHIN each partition with a (__pid)-partitioned window
      // (parallel), and close the partition boundaries with a SEED table
      // — one row per partition (the last/first right payload of earlier/
      // later partitions), built by a tiny aggregation and carried with a
      // window over ≤ shuffle-partitions rows (bounded input, the
      // sanctioned small-window case). Both subtrees reference the SAME
      // ranged exchange, so ReuseExchange pins one boundary sampling —
      // seeds and rows see identical partition ids.
      val parts = l.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toInt
      val ranged = unioned
        .repartitionByRange(parts,
          F.col("__asof_k").asc_nulls_first, F.col("__side"))
        .withColumn("__pid", F.spark_partition_id())
      val rightRows = ranged
        .filter(F.col("__side") === 0 && F.col("__asof_k").isNotNull)
      // partition ids are 0..parts-1 by construction: enumerating them
      // from a range beats a full extra scan + shuffle of the union just
      // to recover integers already known (seeds for genuinely empty
      // partitions are harmless — no src row joins them, and the seed
      // carry over pid order stays correct)
      val allPids = l.sparkSession.range(parts)
        .select(F.col("id").cast("int").as("__pid"))
      def carry(src: DataFrame, back: Boolean): DataFrame = {
        val within =
          if (back)
            F.last(rightPayload, ignoreNulls = true).over(
              Window.partitionBy("__pid")
                .orderBy(F.col("__asof_k"), F.col("__side"))
                .rowsBetween(Window.unboundedPreceding, 0))
          else
            F.first(rightPayload, ignoreNulls = true).over(
              Window.partitionBy("__pid")
                .orderBy(F.col("__asof_k"), F.col("__side").desc)
                .rowsBetween(0, Window.unboundedFollowing))
        val perPart = rightRows.groupBy("__pid").agg(
          (if (back) F.max_by(F.col("__payload"), F.col("__asof_k"))
           else F.min_by(F.col("__payload"), F.col("__asof_k"))).as("__pp"))
        // every partition needs a seed row — one WITHOUT right rows must
        // still inherit the carry from its neighbors
        val padded = allPids.join(perPart, Seq("__pid"), "left")
        val wSeed =
          if (back) Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)
          else Window.orderBy("__pid")
            .rowsBetween(1, Window.unboundedFollowing)
        val seeds = padded.select(F.col("__pid"),
          (if (back) F.last(F.col("__pp"), ignoreNulls = true).over(wSeed)
           else F.first(F.col("__pp"), ignoreNulls = true).over(wSeed))
            .as("__seed"))
        src.withColumn("__w", within)
          .join(F.broadcast(seeds), Seq("__pid"), "left")
          .withColumn(if (back) "__mb" else "__mf",
            F.coalesce(F.col("__w"), F.col("__seed")))
          .drop("__w", "__seed")
      }
      val out = strategy match {
        case "backward" =>
          carry(ranged, back = true).withColumnRenamed("__mb", "__m")
        case "forward" =>
          carry(ranged, back = false).withColumnRenamed("__mf", "__m")
        case "nearest" =>
          combineNearest(carry(carry(ranged, back = true), back = false),
            F.col("__mb"), F.col("__mf")).drop("__mb", "__mf")
      }
      out.drop("__pid")
    }

    // ...and a null-keyed LEFT row has no order position, so it matches
    // nothing (under "forward" it would otherwise grab the smallest key)
    val result = withMatch.filter(F.col("__side") === 1)
      .withColumn("__m",
        F.when(F.col("__asof_k").isNotNull, F.col("__m")))
    val out = payloadCols.foldLeft(result) { (d, n) =>
      val name = if (l.columns.contains(n)) s"${n}_right" else n
      d.withColumn(name, F.col("__m").getField(n))
    }.drop("__asof_k", "__side", "__payload", "__m")
    // left side's groups kept — the Joins.join rule, now actually
    // propagated (the grouped-verb matrix previously only asserted it)
    new Gdf(out, groups = left.groups,
      logical = left.logical ++ payloadCols.flatMap { n =>
      right.logical.get(n).map { d =>
        (if (l.columns.contains(n)) s"${n}_right" else n) -> d
      }
    }.toMap)
  }
}
