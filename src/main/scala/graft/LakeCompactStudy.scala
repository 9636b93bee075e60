package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Read-latency before/after day compaction of a time-partitioned lake
  * (r9 verdict #1's measurement half): a streaming
  * [[graft.streaming.Streams.lakeSink]] accretes a file per (micro-batch
  * × task × day); this study reproduces that accretion with `nAppends`
  * small appends into one UTC day, times the pruned one-day rollup
  * ([[graft.io.GraftIO.readTimeSlice]]) on the many-file day, compacts it
  * ([[graft.io.GraftIO.compactTimePartitions]]), and re-times the same
  * read — the number that says when a day is cold enough to be worth one
  * compaction rewrite.
  *
  * Usage: runMain graft.LakeCompactStudy [nRows] [nAppends] [runs] [out]
  */
object LakeCompactStudy {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nAppends = args.lift(1).map(_.toInt).getOrElse(64)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val out = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.GraftIO

    val dayNs = 86400L * 1000000000L
    val d0 = 19723L // 2024-01-01
    val base = java.nio.file.Files.createTempDirectory("graft_lakec").toString
    val layout = s"$base/layout"
    // nAppends small appends into the SAME day (plus a neighbor day that
    // must stay untouched by the compaction) — each append lands one file
    // per day per task, the streaming sink's accretion shape
    val perAppend = nRows / nAppends
    for (k <- 0 until nAppends) {
      spark.range(perAppend).select(
        (F.col("id") + k.toLong * perAppend).as("event_id"),
        (F.lit(d0 * dayNs) + F.pmod(F.xxhash64(F.col("id") + k),
          F.lit(dayNs))).as("ts"),
        F.pmod(F.xxhash64(F.col("id") * 7 + k), F.lit(1000L))
          .cast("double").as("value"))
        .coalesce(1)
        .withColumn("__pdate", GraftIO.utcDay("ts"))
        .write.mode("append").partitionBy("__pdate").parquet(layout)
    }
    // the untouched neighbor
    spark.range(1000).select(F.col("id").as("event_id"),
      (F.lit((d0 + 1) * dayNs) + F.col("id") * 1000L).as("ts"),
      F.lit(1.0).as("value"))
      .withColumn("__pdate", GraftIO.utcDay("ts"))
      .write.mode("append").partitionBy("__pdate").parquet(layout)

    def nFiles: Int = {
      val d = new java.io.File(layout, s"__pdate=2024-01-01")
      Option(d.listFiles()).map(_.count(_.getName.endsWith(".parquet")))
        .getOrElse(0)
    }
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def readDay(): Double = time {
      GraftIO.readTimeSlice(spark, layout, d0 * dayNs, (d0 + 1) * dayNs)
        .agg(F.count(F.lit(1)), F.sum("value")).collect()
    }
    // the sub-day slice is where in-file ts SORTING bites: the compacted
    // file's row groups carry tight min/max so a 1-hour slice prunes to
    // ~1/24 of the day, where EVERY unsorted append file overlaps every
    // hour and must be read in full
    val hourNs = 3600L * 1000000000L
    def readHour(): Double = time {
      GraftIO.readTimeSlice(spark, layout,
        d0 * dayNs + 12L * hourNs, d0 * dayNs + 13L * hourNs)
        .agg(F.count(F.lit(1)), F.sum("value")).collect()
    }

    val filesBefore = nFiles
    readDay(); readHour() // warm-up (footer/listing cold costs measured separately by run 1 variance)
    val before = (1 to runs).map(_ => readDay())
    val beforeHour = (1 to runs).map(_ => readHour())
    val tCompact = time {
      GraftIO.compactTimePartitions(spark, layout,
        d0 * dayNs, (d0 + 1) * dayNs)
    }
    val filesAfter = nFiles
    readDay(); readHour()
    val after = (1 to runs).map(_ => readDay())
    val afterHour = (1 to runs).map(_ => readHour())
    System.err.println(s"[lakecompact] files $filesBefore -> $filesAfter; " +
      s"day before ${before.map(t => f"$t%.2f").mkString(" ")} " +
      s"after ${after.map(t => f"$t%.2f").mkString(" ")}; " +
      s"hour before ${beforeHour.map(t => f"$t%.2f").mkString(" ")} " +
      s"after ${afterHour.map(t => f"$t%.2f").mkString(" ")}")

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val json = s"""{"metric":"lake_compact","unit":"sec","n_rows":$nRows,""" +
      s""""n_appends":$nAppends,"files_before":$filesBefore,""" +
      s""""files_after":$filesAfter,"compact_sec":$tCompact,""" +
      s""""read_before_med":${med(before)},"read_before_min":${before.min},""" +
      s""""read_after_med":${med(after)},"read_after_min":${after.min},""" +
      s""""hour_before_med":${med(beforeHour)},"hour_before_min":${beforeHour.min},""" +
      s""""hour_after_med":${med(afterHour)},"hour_after_min":${afterHour.min},""" +
      s""""runs_before":[${before.mkString(",")}],""" +
      s""""runs_after":[${after.mkString(",")}],""" +
      s""""runs_hour_before":[${beforeHour.mkString(",")}],""" +
      s""""runs_hour_after":[${afterHour.mkString(",")}],"n_runs":$runs}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
