package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Pin [[graft.io.Manifest.compactManifest]]'s driver-side fold past the
  * measured 100k-file point (r13 verdict #5): the fold collects the FULL
  * manifest to the driver (the one deliberately table-sized operation in
  * the manifest LSM — the Delta-checkpoint posture), so its envelope is
  * (wall time, peak driver heap) as a function of manifest ROW count.
  * The r13 artifact measured 1.35 s at 100k rows and extrapolated ~15 s
  * at ~1M; this study measures the 300k and 1M points directly.
  *
  * The manifest rows are SYNTHESIZED through the internal part writer
  * (one real 64-file table for schema fidelity, then one big live part +
  * one tombstone part in the exact part schema): the fold's cost depends
  * only on manifest row count — building a literal million-file table
  * locally would measure parquet file creation, not the fold. The
  * tombstone part (20 synthetic files) keeps the carried-tombstone path
  * on; `liveCount` returned by the fold is asserted so a silently-wrong
  * synthetic layout can't produce a plausible-looking timing. Peak heap
  * is read from the JVM memory pools (resetPeakUsage before each fold) —
  * the driver-memory envelope of the `collect` + fold + 1-partition
  * rewrite, which is the number that decides when the sharded fold must
  * actually be built.
  *
  * r14: measures BOTH folds per size — the driver fold (threshold
  * forced to MaxValue) and the distributed fold (threshold 0) on twin
  * layouts. Local-mode caveat on the distributed rows: executors share
  * the driver JVM at local[32], so its "peak heap" is the whole
  * process; the comparison is still the decision number (the collect's
  * inflation vs the task-bounded fold), and on a real cluster the
  * distributed fold's driver term is O(parts), not O(rows).
  *
  * Usage: runMain graft.ManifestFoldStudy [sizesCsv] [runs] [out]
  * (defaults 100000,300000,1000000 × 3 runs — each run re-synthesizes a
  * fresh layout, since a fold leaves nothing left to fold.)
  */
object ManifestFoldStudy {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("100000,300000,1000000")
      .split(",").map(_.trim.toInt).toSeq
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
    import graft.io.Manifest
    import scala.jdk.CollectionConverters._

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val heapPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

    // ONE synthesis + measurement harness for both folds, so the
    // driver-vs-distributed comparison can never silently measure two
    // different layouts (the threshold and label are the ONLY knobs)
    def measureFold(nRows: Int, run: Int, threshold: Long,
        label: String): (Double, Double) = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_fold_${label}_${nRows}_$run").toString
      val path = s"$base/t"
      // a REAL 64-file manifested table pins the part schema (file,
      // rows, min_id, max_id) — synthetic parts below must merge with
      // it or the fold's read fails loud
      val df = spark.range(6400L).select(F.col("id"),
        F.sha2(F.concat_ws("_", F.col("id")), 256).as("p"))
      Manifest.writeWithManifest(df, path, statsCols = Seq("id"),
        clusterCols = Seq("id"), targetFiles = 64)
      val url = graft.io.GraftIO.resolveUrl(path)
      val synth = nRows - 64
      // one big live part: unique synthetic file names, disjoint id
      // envelopes above the real table's
      Manifest.writePart(spark.range(synth).select(
        F.concat(F.lit("synth/part-"), F.col("id")).as("file"),
        F.lit(100L).as("rows"),
        (F.col("id") * 100L + 1000000L).as("min_id"),
        (F.col("id") * 100L + 1000099L).as("max_id")),
        url, "synth0", commit = 1L)
      // a tombstone part killing 20 synthetic files keeps the
      // carried-tombstone scan in the measured path
      Manifest.writePart(spark.range(20).select(
        F.concat(F.lit("synth/part-"), F.col("id")).as("file"),
        F.lit(null).cast("long").as("rows"),
        F.lit(null).cast("long").as("min_id"),
        F.lit(null).cast("long").as("max_id")),
        url, "synthtomb", commit = 2L)
      // System.gc() before the measured window so peak-heap reads the
      // fold, not the layout-synthesis garbage
      System.gc()
      heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      val live = Manifest.compactManifest(spark, path, s"fold$run",
        driverFoldMaxBytes = threshold)
      val sec = (System.nanoTime() - t0) / 1e9
      val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / 1048576.0
      require(live == 64L + synth - 20,
        s"$label fold dropped rows: $live != ${64 + synth - 20}")
      // the folded manifest still answers a banded read (liveness
      // witness beyond the count)
      val got = Manifest.readSkipping(spark, path,
        "id", 100L, 199L).count()
      require(got == 100,
        s"post-$label-fold banded read broke: $got != 100")
      System.err.println(
        f"[fold] rows=$nRows%8d run=$run $label%-6s fold=$sec%.2fs " +
          f"peak=$peakMb%.0fMB")
      // delete the synthesized layout (r14 ADVICE: the study accreted
      // millions of synthetic manifest rows of parquet under tmpdir per
      // invocation — runs × labels × sizes temp dirs, never cleaned)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
      (sec, peakMb)
    }
    val results = sizes.map { nRows =>
      // driver-forced (threshold MaxValue) and distributed-forced
      // (threshold 0) on twin fresh layouts
      val timings = (1 to runs)
        .map(run => measureFold(nRows, run, Long.MaxValue, "driver"))
      val timingsDist = (1 to runs)
        .map(run => measureFold(nRows, run, 0L, "dist"))
      val secs = timings.map(_._1)
      val peaks = timings.map(_._2)
      (nRows, secs, peaks, timingsDist.map(_._1), timingsDist.map(_._2))
    }
    val json = "{\"metric\":\"manifest_fold\",\"unit\":\"sec\",\"sizes\":[" +
      results.map { case (n, secs, peaks, dsecs, dpeaks) =>
        s"""{"manifest_rows":$n,"fold_med":${med(secs)},""" +
          s""""fold_min":${secs.min},"peak_heap_mb_med":${med(peaks)},""" +
          s""""runs_fold":[${secs.mkString(",")}],""" +
          s""""runs_peak_mb":[${peaks.mkString(",")}],""" +
          s""""dist_fold_med":${med(dsecs)},""" +
          s""""dist_fold_min":${dsecs.min},""" +
          s""""dist_peak_heap_mb_med":${med(dpeaks)},""" +
          s""""runs_dist_fold":[${dsecs.mkString(",")}],""" +
          s""""runs_dist_peak_mb":[${dpeaks.mkString(",")}]}"""
      }.mkString(",") + s"],\"n_runs\":$runs}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
