package graft

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** [[TsNorm]] — the events.ts physical-encoding normalizer. Parquet writers
  * disagree on timestamp encoding (TIMESTAMP(NANOS) naive / TIMESTAMP(MICROS)
  * naive (NTZ) / adjusted-to-UTC); every query and stream over `ts` must
  * behave identically under all of them (r7 verdict #1: the engine used to
  * hard-assume NANOS and died at analysis on µs-encoded files). The three
  * fixtures here are byte-real parquet files in each encoding, writing the
  * SAME logical instants. */
class TsNormSpec extends SparkSpec {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  // (event_id, epoch_us, user_id (null→None), event_type, value)
  // layout: user 1 views then purchases 10 min later (s03 funnel shape);
  // an error at +2 min with clicks inside and outside its 5-minute window
  // (q59 range-join shape); a second hour bucket (s01 window shape).
  private val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
  private val rows: Seq[(Long, Long, Option[Long], String, Double)] = Seq(
    (1L, base + 0L, Some(1L), "view", 10.0),
    (2L, base + 120000000L, Some(2L), "error", 0.0),
    (3L, base + 180000000L, Some(1L), "click", 5.0),
    (4L, base + 440000000L, Some(3L), "click", 7.0), // 5:20 after the error — outside its 5-min window
    (5L, base + 600000000L, Some(1L), "purchase", 99.0),
    (6L, base + 3900000000L, None, "view", 1.0), // next hour, null user
    (7L, base + 4000000000L, Some(2L), "click", 2.0))

  /** TIMESTAMP(NANOS, isAdjustedToUTC=false) via parquet-java — exactly the
    * encoding `spark.sql.legacy.parquet.nanosAsLong` fires on (Spark can't
    * write it itself). */
  private def writeNanosFixture(dir: String): Unit = {
    val msg = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64).as(LTA.timestampType(false, LTA.TimeUnit.NANOS)).named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LTA.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LTA.stringType()).named("props")
      .named("events")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(msg).build()
    val gf = new SimpleGroupFactory(msg)
    rows.foreach { case (id, us, user, kind, v) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", us * 1000L)
      user.foreach(u => g.add("user_id", u))
      g.add("event_type", kind); g.add("value", v); g.add("props", "{}")
      w.write(g)
    }
    w.close()
  }

  private def baseDf: DataFrame = {
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    df(sch, rows.map { case (id, us, u, k, v) =>
      Seq(id, us, u.map(Long.box).orNull, k, v) }: _*)
  }

  /** µs naive (TimestampNTZType on read) — this environment's testdata
    * encoding — or µs adjusted-to-UTC (TimestampType on read). */
  private def writeMicrosFixture(dir: String, ntz: Boolean): Unit = {
    val ts =
      if (ntz) F.timestamp_micros(F.col("us")).cast(TimestampNTZType)
      else F.timestamp_micros(F.col("us"))
    // write as ONE FILE named events.parquet (like the driver's testdata):
    // the streaming file source's pathGlobFilter matches file basenames, so
    // a directory-shaped events.parquet/part-*.parquet would be invisible
    val tmp = s"$dir/__tmp"
    baseDf
      .select(F.col("event_id"), ts.as("ts"), F.col("user_id"),
        F.col("event_type"), F.col("value"), F.lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    new java.io.File(tmp).listFiles().foreach(_.delete())
    new java.io.File(tmp).delete()
  }

  private lazy val fixtures: Map[String, String] = {
    val out = Map(
      "nanos" -> java.nio.file.Files.createTempDirectory("graft_ts_ns").toString,
      "ntz" -> java.nio.file.Files.createTempDirectory("graft_ts_ntz").toString,
      "utc" -> java.nio.file.Files.createTempDirectory("graft_ts_utc").toString)
    writeNanosFixture(out("nanos"))
    writeMicrosFixture(out("ntz"), ntz = true)
    writeMicrosFixture(out("utc"), ntz = false)
    out.values.foreach(d =>
      new java.io.File(d).listFiles().foreach(_.deleteOnExit()))
    out
  }

  private def readEvents(dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  test("the three fixtures really arrive as three different types") {
    assert(readEvents(fixtures("nanos")).schema("ts").dataType == LongType)
    assert(readEvents(fixtures("ntz")).schema("ts").dataType == TimestampNTZType)
    assert(readEvents(fixtures("utc")).schema("ts").dataType == TimestampType)
  }

  test("normalizeTs yields identical epoch-ns longs under all encodings") {
    val expected = rows.map { case (id, us, _, _, _) => (id, us * 1000L) }
    for ((enc, dir) <- fixtures) {
      val got = TsNorm.normalizeTs(readEvents(dir))
      assert(got.schema("ts").dataType == LongType, enc)
      val vals = got.select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      assert(vals == expected, enc)
    }
  }

  test("normalizeTs is a no-op without a ts column") {
    val d = baseDf.drop("us")
    assert(TsNorm.normalizeTs(d) eq d)
  }

  test("assertNsRange catches untyped-INT64 epoch-us misscale, passes " +
      "real ns and nulls (r8 ADVICE: plain INT64 us would silently flow " +
      "through 1000x off)") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // epoch-µs magnitudes arriving as bare LongType: the guarded
    // passthrough must abort, naming the misscale
    val us = rows.map { case (id, u, _, _, _) => (id, u) }
      .toDF("event_id", "ts")
    val err = intercept[Throwable] {
      TsNorm.normalizeTs(us, assertNsRange = true).collect()
    }
    assert(msgs(err).exists(_.contains("ns-since-epoch")), msgs(err))
    // the same values at ns scale (with a null mixed in) pass untouched
    val ns = rows.map { case (id, u, _, _, _) =>
      (id, if (id == 6L) None else Some(u * 1000L)) }
      .toDF("event_id", "ts")
    val got = TsNorm.normalizeTs(ns, assertNsRange = true)
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)
    val expected = rows.map { case (id, u, _, _, _) =>
      (id, if (id == 6L) None else Some(u * 1000L)) }.sortBy(_._1)
    assert(got == expected)
    // unguarded passthrough stays the identity (zero-cost default)
    assert(TsNorm.normalizeTs(us) eq us)
  }

  test("normalizeTs fails loud on an unhandled ts type unless lenient " +
      "(r9 verdict #3: the logged passthrough was the last silent-encoding " +
      "corner)") {
    import spark.implicits._
    val strTs = Seq((1L, "2024-01-01T00:00:00Z"), (2L, "2024-01-02T00:00:00Z"))
      .toDF("event_id", "ts")
    val err = intercept[IllegalArgumentException] {
      TsNorm.normalizeTs(strTs)
    }
    assert(err.getMessage.contains("StringType"), err.getMessage)
    assert(err.getMessage.contains("lenient"), err.getMessage)
    // explicit opt-out keeps the old pass-through-with-a-log behavior
    assert(TsNorm.normalizeTs(strTs, lenient = true) eq strTs)
  }

  test("sliceNs selects identical rows under every encoding, with exact " +
      "ns->us bound translation (bounds deliberately NOT multiples of " +
      "1000 ns)") {
    // [error - 500ns, purchase + 1ns): events 2..5; the sub-us offsets
    // exercise the ceil-division bound translation — a naive truncating
    // divide would drop event 2 (lo) or event 5 (hi)
    val lo = (base + 120000000L) * 1000L - 500L
    val hi = (base + 600000000L) * 1000L + 1L
    for ((enc, dir) <- fixtures) {
      val got = TsNorm.normalizeTs(TsNorm.sliceNs(readEvents(dir), lo, hi))
        .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(got == Seq(2L, 3L, 4L, 5L), enc)
    }
  }

  test("sliceNs bound reaches parquet PushedFilters in every encoding " +
      "(the 100 TB row-group-pruning contract)") {
    val lo = (base + 120000000L) * 1000L
    val hi = (base + 600000000L) * 1000L
    for ((enc, dir) <- fixtures) {
      val plan = TsNorm.sliceNs(readEvents(dir), lo, hi)
        .queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: ["))
        .mkString("\n")
      assert(pushed.contains("GreaterThanOrEqual(ts") &&
        pushed.contains("LessThan(ts"), s"$enc: ts bound not pushed:\n$plan")
    }
  }

  test("sliceNs(assertNsRange) fails loudly on untyped-INT64 epoch-us — " +
      "the per-row normalize assert never sees a row once the pushed " +
      "bound prunes everything, so the slice must probe eagerly") {
    import spark.implicits._
    val us = rows.map { case (id, u, _, _, _) => (id, u) }
      .toDF("event_id", "ts")
    val err = intercept[IllegalArgumentException] {
      TsNorm.sliceNs(us, (base + 0L) * 1000L, (base + 600000000L) * 1000L,
        assertNsRange = true)
    }
    assert(err.getMessage.contains("ns-since-epoch"), err.getMessage)
    // the same instants at ns scale pass the probe and slice normally
    val ns = rows.map { case (id, u, _, _, _) => (id, u * 1000L) }
      .toDF("event_id", "ts")
    val got = TsNorm.sliceNs(ns, (base + 120000000L) * 1000L,
      (base + 600000000L) * 1000L, assertNsRange = true)
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(2L, 3L, 4L))
    // empty input: nothing to mis-slice, probe passes
    assert(TsNorm.sliceNs(ns.filter(F.lit(false)), 0L, Long.MaxValue,
      assertNsRange = true).count() == 0L)
  }

  test("sliceNs works on a STREAMING frame: sliced rows match batch, and " +
      "a misscaled INT64 stream aborts loudly (the eager probe can't run " +
      "on a stream — the disjunction guard must carry the assert)") {
    val spark0 = spark
    spark0.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = fixtures("nanos")
    val schema = spark0.read.parquet(s"$dir/events.parquet").schema
    val lo = (base + 120000000L) * 1000L
    val hi = (base + 600000000L) * 1000L
    val sliced = TsNorm.sliceNs(
      streaming.Streams.readParquetStream(spark0, dir, schema,
        globFilter = Some("events.parquet")),
      lo, hi, assertNsRange = true)
      .select("event_id")
    val got = streaming.Streams.runToMemory(sliced, "tsnorm_slice_stream")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(2L, 3L, 4L))
    // misscaled stream: write epoch-us as untyped INT64, stream it, abort
    import spark0.implicits._
    val usDir = java.nio.file.Files.createTempDirectory("graft_ts_usl").toString
    rows.map { case (id, u, _, _, _) => (id, u) }.toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(usDir)
    val usSchema = spark0.read.parquet(usDir).schema
    val bad = TsNorm.sliceNs(
      streaming.Streams.readParquetStream(spark0, usDir, usSchema,
        globFilter = Some("*.parquet")), lo, hi, assertNsRange = true)
    val err = intercept[Throwable] {
      streaming.Streams.runToMemory(bad, "tsnorm_slice_bad")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("ns-since-epoch")), msgs(err))
  }

  test("sliceNs fails loudly on an un-sliceable ts type (a silent " +
      "unsliced return would be corrupt at any scale)") {
    import spark.implicits._
    val strTs = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    intercept[IllegalArgumentException] { TsNorm.sliceNs(strTs, 0L, 1L) }
    intercept[IllegalArgumentException] {
      TsNorm.sliceNs(strTs.drop("ts"), 0L, 1L) }
  }

  test("q59 range join returns the same pairs under every encoding") {
    // in-spec expectation: clicks within [error.ts, error.ts + 5 min]
    // event 3 (1 min after error 2) matches; event 4 (5:20 after) and
    // event 7 (next hour) don't
    val results = fixtures.map { case (enc, dir) =>
      enc -> SparkEntry.queries("q59_range_join")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    results.foreach { case (enc, got) =>
      assert(got == Seq((2L, 3L)), enc) }
  }

  test("s01 streaming window runs under µs encoding and matches its batch twin") {
    // r7 verdict #5: the streaming path's encoding-agnosticism is CI-pinned
    // here, not sweep-discovered
    val streamed = SparkEntry.queries("s01_stream_window")(spark, fixtures("ntz"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batch = TsNorm.normalizeTs(readEvents(fixtures("nanos")))
      .withColumn("evt_ts", F.timestamp_micros(F.expr("ts DIV 1000")))
      .groupBy(F.window(F.col("evt_ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"), F.round(F.sum("value"), 4).as("total_value"))
      .select(F.col("window.start").as("hour_start"), F.col("event_type"),
        F.col("n"), F.col("total_value"))
      .orderBy("hour_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
