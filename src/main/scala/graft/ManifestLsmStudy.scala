package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Does the segmented manifest make keyed-mutation cost flat in TABLE
  * size? The old design collected and rewrote the full manifest on every
  * mutation, so append/delete cost grew with the table's file count even
  * when the batch touched two files. The LSM layout writes one part (and
  * tombstone) per mutation — cost should track the BATCH.
  *
  * This study grows ONLY the manifest (file count) while holding the
  * mutation constant: at each size it times (a) a small
  * `appendWithManifest` batch, (b) a narrow-band `deleteKeys`, and (c)
  * `compactManifest` — the one deliberately table-sized operation left,
  * which is also a faithful stand-in for what the old design paid PER
  * MUTATION (full manifest collect + single-partition rewrite). Flat (a)
  * and (b) with growing (c) is the designed shape.
  *
  * Usage: runMain graft.ManifestLsmStudy [sizesCsv] [runs] [out]
  * (default sizes 1000,4000,16000 files — the quick check; the r13
  * envelope artifact runs `1000,16000,100000` to pin mutation flatness
  * AND compactManifest's driver collect+rewrite at the scale where the
  * 100 TB posture claims ~1M files would sit a decade of compactions
  * away — scaling/manifest_lsm_100k.json.)
  */
object ManifestLsmStudy {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("1000,4000,16000")
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

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val results = sizes.map { nFiles =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_mlsm_$nFiles").toString
      val nRows = nFiles * 100L
      val df = spark.range(nRows).select(F.col("id"),
        F.sha2(F.concat_ws("_", F.col("id")), 256).as("p"))
      Manifest.writeWithManifest(df, s"$base/t", statsCols = Seq("id"),
        clusterCols = Seq("id"), targetFiles = nFiles)
      // constant-size mutations against a growing table: 1k-row appends
      // (ids beyond the table) and 20-key narrow-band deletes
      val tApp = (1 to runs).map { r =>
        val batch = spark.range(nRows + r * 1000L, nRows + r * 1000L + 1000L)
          .select(F.col("id"), F.sha2(F.concat_ws("_", F.col("id")), 256)
            .as("p"))
        time(Manifest.appendWithManifest(batch, s"$base/t", s"a$r",
          clusterCols = Seq("id"), targetFiles = 1))
      }
      val tDel = (1 to runs).map { r =>
        val lo = (r - 1) * 200L
        val keys = spark.range(lo, lo + 20L).toDF("id")
        time(Manifest.deleteKeys(spark, s"$base/t", "id", keys, s"d$r"))
      }
      val tCmp = time(Manifest.compactManifest(spark, s"$base/t", "c1"))
      val manRows = Manifest.manifest(spark, s"$base/t").count()
      System.err.println(f"[mlsm] files=$nFiles%6d man=$manRows%6d " +
        f"append=${med(tApp)}%.2fs delete=${med(tDel)}%.2fs " +
        f"compact=$tCmp%.2fs")
      (nFiles, manRows, tApp, tDel, tCmp)
    }
    val json = "{\"metric\":\"manifest_lsm\",\"unit\":\"sec\",\"sizes\":[" +
      results.map { case (n, rows, a, d, c) =>
        s"""{"n_files":$n,"manifest_rows":$rows,""" +
          s""""append_med":${med(a)},"append_min":${a.min},""" +
          s""""delete_med":${med(d)},"delete_min":${d.min},""" +
          s""""compact":$c,""" +
          s""""runs_append":[${a.mkString(",")}],""" +
          s""""runs_delete":[${d.mkString(",")}]}"""
      }.mkString(",") + s"],\"n_runs\":$runs}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
