package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Measures the keyed-mutation economics of [[graft.io.Manifest
  * .deleteKeys]]: on a key-clustered manifested layout, deleting a
  * narrow key band should rewrite only the envelope-overlapping files
  * (time ~ band size), where the naive approach rewrites the whole
  * table (time ~ table size). Also measures the honest worst case —
  * keys spread uniformly across the domain, where every file's envelope
  * overlaps and pruning buys nothing.
  *
  * `runMain graft.UpsertStudy [nRows] [nFiles] [runs] [outJson]`
  */
object UpsertStudy {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
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

    val base = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    def corpus(): DataFrame = spark.range(nRows).select(
      F.col("id"),
      F.sha2(F.concat_ws("_", F.col("id"), F.lit("pad")), 256).as("p1"),
      F.sha2(F.concat_ws("-", F.col("id"), F.lit("pad")), 512).as("p2"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // --- pruned delete: narrow contiguous bands on the clustered key ----
    Manifest.writeWithManifest(corpus(), s"$base/t", statsCols = Seq("id"),
      clusterCols = Seq("id"), targetFiles = nFiles)
    val bandSize = 1000L
    val pruned = (1 to runs).map { r =>
      val lo = r * 10000L
      val keys = spark.range(lo, lo + bandSize).select(F.col("id"))
      var rewritten = 0
      val t = time {
        rewritten = Manifest.deleteKeys(spark, s"$base/t", "id", keys,
          segment = s"band$r")
      }
      (t, rewritten)
    }

    // --- spread delete: same key count, uniform over the domain --------
    Manifest.writeWithManifest(corpus(), s"$base/s", statsCols = Seq("id"),
      clusterCols = Seq("id"), targetFiles = nFiles)
    val spread = (1 to runs).map { r =>
      val keys = spark.range(bandSize)
        .select((F.pmod(F.xxhash64(F.col("id") + F.lit(r * 7919)),
          F.lit(nRows))).as("id"))
      var rewritten = 0
      val t = time {
        rewritten = Manifest.deleteKeys(spark, s"$base/s", "id", keys,
          segment = s"spread$r")
      }
      (t, rewritten)
    }

    // --- the naive baseline: full-table anti-join rewrite that maintains
    // the SAME end state (clustered manifested layout) — what a user
    // without keyed mutation would run
    val naive = (1 to runs).map { r =>
      val keys = spark.range(r * 50000L, r * 50000L + bandSize)
      time {
        val cur = spark.read.parquet(s"$base/t").drop("seg")
        Manifest.writeWithManifest(cur.join(keys, Seq("id"), "left_anti"),
          s"$base/naive_out", statsCols = Seq("id"),
          clusterCols = Seq("id"), targetFiles = nFiles)
      }
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val json = s"""{"metric":"lake_delete","unit":"sec",""" +
      s""""n_rows":$nRows,"n_files":$nFiles,"band_keys":$bandSize,""" +
      s""""pruned_med":${med(pruned.map(_._1))},""" +
      s""""pruned_files":[${pruned.map(_._2).mkString(",")}],""" +
      s""""spread_med":${med(spread.map(_._1))},""" +
      s""""spread_files":[${spread.map(_._2).mkString(",")}],""" +
      s""""naive_full_rewrite_med":${med(naive)},""" +
      s""""runs_pruned":[${pruned.map(_._1).mkString(",")}],""" +
      s""""runs_spread":[${spread.map(_._1).mkString(",")}],""" +
      s""""runs_naive":[${naive.mkString(",")}],"n_runs":$runs}"""
    println(json)
    System.err.println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
