package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Does manifest skipping pay, and what does clustering buy it? Builds a
  * synthetic corpus at `nRows` in `nFiles` files three ways — (a) plain
  * write, no manifest; (b) manifested but UNCLUSTERED (every file's
  * envelope overlaps every band — skipping legal but toothless); (c)
  * manifested AND range-clustered ([[graft.io.Manifest]]'s intended
  * layout) — and times the same narrow band read on each. (a) is the
  * baseline full scan + filter; (b) isolates the manifest's own overhead
  * (one tiny sidecar read + driver filter); (c) is the payoff. Locally
  * the gap understates object storage, where every opened file is a GET
  * round trip — the numbers to quote are files-opened, which is exact.
  *
  * Usage: runMain graft.ManifestStudy [nRows] [nFiles] [runs] [out]
  */
object ManifestStudy {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
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
    import graft.io.Manifest

    val base = java.nio.file.Files.createTempDirectory("graft_manif").toString
    // id, a skewless uniform band column v in [0, 1e6), and a payload wide
    // enough that IO dominates the scan (the 100 TB-shaped ratio)
    val df = spark.range(nRows).select(
      F.col("id"),
      F.pmod(F.xxhash64(F.col("id")), F.lit(1000000L)).as("v"),
      F.sha2(F.concat_ws("_", F.col("id"), F.lit("pad")), 256).as("p1"),
      F.sha2(F.concat_ws("-", F.col("id"), F.lit("pad")), 512).as("p2"))

    df.repartition(nFiles).write.mode("overwrite").parquet(s"$base/plain")
    Manifest.writeWithManifest(df, s"$base/flat", statsCols = Seq("v"),
      clusterCols = Nil, targetFiles = 0)
    Manifest.writeWithManifest(df, s"$base/clustered",
      statsCols = Seq("v"), clusterCols = Seq("v"), targetFiles = nFiles)

    // a ~1/64 band
    val lo = 500000L; val hi = 500000L + 1000000L / nFiles
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def agg(d: org.apache.spark.sql.DataFrame): Unit = {
      d.agg(F.count(F.lit(1)), F.sum(F.length(F.col("p1")))).collect(); ()
    }
    def full(): Double = time(agg(
      spark.read.parquet(s"$base/plain")
        .filter(F.col("v") >= lo && F.col("v") <= hi)))
    def flat(): Double = time(agg(
      Manifest.readSkipping(spark, s"$base/flat", "v", lo, hi)))
    def clus(): Double = time(agg(
      Manifest.readSkipping(spark, s"$base/clustered", "v", lo, hi)))

    def survivors(path: String): Long =
      Manifest.manifest(spark, path)
        .filter(F.col("min_v") <= hi && F.col("max_v") >= lo).count()
    def total(path: String): Long = Manifest.manifest(spark, path).count()

    full(); flat(); clus() // warm
    val tFull = (1 to runs).map(_ => full())
    val tFlat = (1 to runs).map(_ => flat())
    val tClus = (1 to runs).map(_ => clus())
    val sFlat = survivors(s"$base/flat")
    val sClus = survivors(s"$base/clustered")
    System.err.println(s"[manifest] full ${tFull.map(t => f"$t%.2f")
      .mkString(" ")}; flat(files=$sFlat) ${tFlat.map(t => f"$t%.2f")
      .mkString(" ")}; clustered(files=$sClus) ${tClus.map(t => f"$t%.2f")
      .mkString(" ")}")

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val json = s"""{"metric":"manifest_skip","unit":"sec",""" +
      s""""n_rows":$nRows,"n_files":$nFiles,""" +
      s""""full_med":${med(tFull)},"full_min":${tFull.min},""" +
      s""""flat_med":${med(tFlat)},"flat_min":${tFlat.min},""" +
      s""""clustered_med":${med(tClus)},"clustered_min":${tClus.min},""" +
      s""""files_opened_flat":$sFlat,"files_total_flat":${total(s"$base/flat")},""" +
      s""""files_opened_clustered":$sClus,""" +
      s""""files_total_clustered":${total(s"$base/clustered")},""" +
      s""""runs_full":[${tFull.mkString(",")}],""" +
      s""""runs_flat":[${tFlat.mkString(",")}],""" +
      s""""runs_clustered":[${tClus.mkString(",")}],"n_runs":$runs}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
