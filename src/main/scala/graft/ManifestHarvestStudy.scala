package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Is the distributed fold's footer-commit harvest still serial-RTT
  * bound at production part counts? (r14 verdict #4.)
  *
  * [[graft.io.Manifest.harvestFooterCommits]] reads one parquet footer
  * per manifest part file to recover each segment's commit stamp with
  * zero Spark jobs. r14 ran it as a sequential loop — fine at the
  * handful of parts a maintained table holds between compactions, but a
  * neglected high-churn table (one part per streaming batch) can
  * accrete thousands, and each footer open is a metadata round trip:
  * serial wall clock = parts × RTT. The harvest now runs in a bounded
  * 16-thread pool; this study builds layouts at growing part counts
  * (one `partitionBy` write — parts, not rows, are the variable) and
  * times the POOLED harvest against an in-study SERIAL replay of the
  * same footer reads, asserting result equality with the expected
  * (seg → commit) map both ways, then runs one full distributed fold
  * end-to-end at the largest count.
  *
  * Local-fs caveat, stated: the ~16× local speedup is thread-level
  * overlap of ~sub-ms opens; on object storage each open is a real
  * network RTT and the same pooling overlaps those — the win the pool
  * exists for is larger there, not smaller.
  *
  * Usage: runMain graft.ManifestHarvestStudy [partsCsv] [runs] [out]
  * (defaults 64,256,1024 × 3 runs.)
  */
object ManifestHarvestStudy {
  def main(args: Array[String]): Unit = {
    val partCounts = args.lift(0).getOrElse("64,256,1024")
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

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val hconf = spark.sparkContext.hadoopConfiguration

    val results = partCounts.map { nParts =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_harvest_$nParts").toString
      val url = graft.io.GraftIO.resolveUrl(s"$base/t")
      // nParts one-file parts in ONE partitioned write: part i lists 4
      // synthetic files at commit i (the per-batch streaming posture —
      // parts is the variable, rows per part is realistic-small)
      spark.range(nParts.toLong * 4).select(
          F.concat(F.lit("synth/part-"), F.col("id")).as("file"),
          F.lit(100L).as("rows"),
          (F.col("id") * 100L).as("min_id"),
          (F.col("id") * 100L + 99L).as("max_id"),
          F.floor(F.col("id") / 4).cast("long").as("__commit"),
          F.concat(F.lit("b"),
            F.floor(F.col("id") / 4).cast("long")).as("seg"))
        .repartition(F.col("seg"))
        .write.partitionBy("seg").parquet(s"$url/_manifest/parts")
      // the listing every fold pays (segDirs + per-dir listStatus)
      val partsRoot = new org.apache.hadoop.fs.Path(s"$url/_manifest/parts")
      val fs = partsRoot.getFileSystem(hconf)
      val partFiles = fs.listStatus(partsRoot)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
        .sortBy(_.getPath.getName)
        .map { d =>
          (d.getPath.getName.stripPrefix("seg="),
            fs.listStatus(d.getPath).filter(st => st.isFile &&
              !st.getPath.getName.startsWith("_") &&
              !st.getPath.getName.startsWith(".")))
        }.toSeq
      val expect = (0 until nParts).map(i => s"b$i" -> i.toLong).toMap
      def check(got: (Seq[(String, Long)], Boolean)): Unit = {
        require(!got._2, "unexpected stats fallback")
        require(got._1.toMap == expect, "harvest disagreed with layout")
      }
      // serial replay: the r14 shape — same opens, one at a time
      def serial(): (Seq[(String, Long)], Boolean) = {
        var fallback = false
        val segCommits = partFiles.flatMap { case (segName, statuses) =>
          var commit = Long.MinValue
          var lo = Long.MaxValue
          statuses.foreach { st =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(st, hconf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getFooter.getBlocks.forEach { b =>
              b.getColumns.forEach { c =>
                if (c.getPath.toDotString == "__commit") {
                  val stats = c.getStatistics
                  if (stats == null || !stats.hasNonNullValue)
                    fallback = true
                  else {
                    commit = math.max(commit, stats.genericGetMax
                      .asInstanceOf[java.lang.Long])
                    lo = math.min(lo, stats.genericGetMin
                      .asInstanceOf[java.lang.Long])
                  }
                }
              }
            } finally r.close()
          }
          if (commit == Long.MinValue) None
          else { if (lo != commit) fallback = true
            Some((segName, commit)) }
        }
        (segCommits, fallback)
      }
      // warmup both (JIT + footer page cache), then measure
      check(Manifest.harvestFooterCommits(hconf, partFiles)); check(serial())
      val tPool = (1 to runs).map { _ =>
        val (got, t) = time(Manifest.harvestFooterCommits(hconf, partFiles))
        check(got); t
      }
      val tSerial = (1 to runs).map { _ =>
        val (got, t) = time(serial()); check(got); t
      }
      System.err.println(f"[harvest] parts=$nParts%5d " +
        f"pooled=${med(tPool)}%.3fs serial=${med(tSerial)}%.3fs " +
        f"(${med(tSerial) / med(tPool)}%.1fx)")
      // end-to-end: one full distributed fold over the layout
      val (live, tFold) = time(Manifest.compactManifest(spark, s"$base/t",
        "fold0", driverFoldMaxBytes = 0L))
      require(live == nParts.toLong * 4, s"fold dropped rows: $live")
      System.err.println(f"[harvest] parts=$nParts%5d dist_fold=$tFold%.2fs")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
      (nParts, tPool, tSerial, tFold)
    }
    val json = "{\"metric\":\"manifest_harvest\",\"unit\":\"sec\"," +
      "\"sizes\":[" +
      results.map { case (n, p, s, f) =>
        s"""{"parts":$n,"pooled_med":${med(p)},"serial_med":${med(s)},""" +
          s""""speedup":${med(s) / med(p)},"dist_fold":$f,""" +
          s""""runs_pooled":[${p.mkString(",")}],""" +
          s""""runs_serial":[${s.mkString(",")}]}"""
      }.mkString(",") + s"],\"n_runs\":$runs}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
