package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Does incremental rollup maintenance actually beat re-aggregation, and
  * how does the gap grow with history? For history sizes of `days` UTC
  * days (`rowsPerDay` events each) this study times, per history size:
  * (a) the INCREMENTAL path — fold ONE new day's batch into the rollup
  * ([[graft.operators.Rollup.appendRollup]]) and serve the combined view
  * ([[graft.operators.Rollup.readRollup]]); and (b) the RE-AGGREGATION
  * path — one flat groupBy over the raw history+batch. The claim under
  * test is structural: (a) is batch-sized + partials-sized no matter the
  * history, (b) is history-sized — the curves should be flat vs linear,
  * and the crossover is immediate. Also times [[graft.operators.Rollup
  * .compactRollup]] at the largest history as the maintenance price.
  *
  * Usage: runMain graft.RollupStudy [rowsPerDay] [runs] [out]
  */
object RollupStudy {
  def main(args: Array[String]): Unit = {
    val rowsPerDay = args.lift(0).map(_.toLong).getOrElse(500000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val out = args.lift(2)
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
    import graft.operators.Rollup

    val dayNs = 86400L * 1000000000L
    val d0 = 19723L // 2024-01-01
    def day(k: Long) =
      spark.range(rowsPerDay).select(
        (F.lit((d0 + k) * dayNs) + F.pmod(F.xxhash64(F.col("id") + k),
          F.lit(dayNs))).as("ts"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64(F.col("id") * 3 + k),
          F.lit(8L))).as("event_type"),
        F.pmod(F.xxhash64(F.col("id") * 7 + k), F.lit(1000L))
          .cast("double").as("value"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val base = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val daySizes = Seq(4, 16, 64)
    val results = daySizes.map { nDays =>
      val raw = s"$base/raw_$nDays"
      (0 until nDays).foreach(k =>
        day(k).write.mode(if (k == 0) "overwrite" else "append").parquet(raw))
      val rollup = s"$base/rollup_$nDays"
      Rollup.buildRollup(spark.read.parquet(raw), "ts", Seq("event_type"),
        "value", rollup)
      val batch = day(nDays).persist()
      batch.count()
      // (a) incremental: fold the batch, serve the combined view
      val inc = (1 to runs).map { r =>
        time {
          Rollup.appendRollup(batch, "ts", Seq("event_type"), "value",
            rollup, s"b$r")
          Rollup.readRollup(spark, rollup)
            .agg(F.sum("n"), F.sum("sum")).collect()
        }
      }
      // (b) re-aggregation: one flat pass over history + batch
      val full = (1 to runs).map { _ =>
        time {
          spark.read.parquet(raw).unionByName(batch)
            .withColumn("__pdate", graft.io.GraftIO.utcDay("ts"))
            .groupBy("__pdate", "event_type")
            .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("sum"))
            .agg(F.sum("n"), F.sum("sum")).collect()
        }
      }
      batch.unpersist()
      val tCompact = time(Rollup.compactRollup(spark, rollup))
      System.err.println(f"[rollup] days=$nDays%3d inc ${med(inc)}%.2f " +
        f"(min ${inc.min}%.2f)  full ${med(full)}%.2f (min ${full.min}%.2f)" +
        f"  compact $tCompact%.2f")
      (nDays, med(inc), inc.min, med(full), full.min, tCompact)
    }

    val json = s"""{"metric":"rollup_maint","unit":"sec",""" +
      s""""rows_per_day":$rowsPerDay,"n_runs":$runs,"points":[""" +
      results.map { case (d, im, imin, fm, fmin, c) =>
        s"""{"days":$d,"inc_med":$im,"inc_min":$imin,""" +
          s""""full_med":$fm,"full_min":$fmin,"compact_sec":$c}"""
      }.mkString(",") + "]}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
