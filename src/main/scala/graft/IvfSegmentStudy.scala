package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Search-latency vs segment-count study for the persisted IVF index —
  * the IVF twin of [[SegmentStudy]] (mh_segments.json) and the measured
  * payoff of [[graft.operators.Similarity.compactIvfIndex]]: a streaming
  * ingest appends one segment per micro-batch, and every segment adds one
  * file per populated cell, so the probed-cell read fans out to
  * `nprobe × segments` file opens (plus the listing). Build the SAME
  * corpus as 1 / 4 / 16 / 64 segments, search a fixed query batch
  * against each, then compact the 64-segment index and search again.
  *
  * Fixture: [[SemanticStudy.synthVecs]] (seeded hot-dim direction groups,
  * deterministic, no RNG at plan time).
  *
  * Usage: runMain graft.IvfSegmentStudy [nVecs] [runs] [out]
  */
object IvfSegmentStudy {
  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toLong).getOrElse(100000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
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
    import graft.operators.Similarity

    val base = java.nio.file.Files.createTempDirectory("graft_ivfsegs")
      .toString
    SemanticStudy.synthVecs(spark, nVecs).write.mode("overwrite")
      .parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    val queries = SemanticStudy.synthVecs(spark, 50, idOffset = nVecs * 3)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def search(path: String): Double = time {
      Similarity.searchIvfIndex(spark, path, queries, F.col("vec_id"),
        F.col("embedding"), k = 5, nprobe = 4).count()
    }

    // every config trains on the SAME small base slice (identical
    // centroids ⇒ identical probed cells ⇒ identical candidate volume),
    // then appends the SAME remainder as k equal segments — so the only
    // variable across configs is the file layout the appends accrete
    val segCounts = Seq(1, 4, 16, 64)
    val baseRows = nVecs / (segCounts.max + 1)
    val rest = nVecs - baseRows
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    var lastPath: String = null
    for (segs <- segCounts) {
      val path = s"$base/idx_$segs"
      val per = rest / segs
      Similarity.writeIvfIndex(corpus.filter(F.col("vec_id") < baseRows),
        F.col("vec_id"), F.col("embedding"), path, nlist = 32)
      for (k <- 0 until segs) {
        val lo = baseRows + per * k
        val hi = if (k == segs - 1) nVecs else baseRows + per * (k + 1)
        Similarity.appendToIvfIndex(
          corpus.filter(F.col("vec_id") >= lo && F.col("vec_id") < hi),
          F.col("vec_id"), F.col("embedding"), path, s"s$k")
      }
      search(path) // warm-up (JIT/codegen on the first probed index)
      results(s"search_${segs}seg") = (1 to runs).map(_ => search(path))
      lastPath = path
      System.err.println(s"[ivfsegs] $segs append segments: " +
        results(s"search_${segs}seg").map(t => f"$t%.2f").mkString(" "))
    }
    val tCompact = time { Similarity.compactIvfIndex(spark, lastPath) }
    search(lastPath)
    results("search_64seg_compacted") = (1 to runs).map(_ => search(lastPath))
    System.err.println(s"[ivfsegs] compacted (${f"$tCompact%.2f"}s): " +
      results("search_64seg_compacted").map(t => f"$t%.2f").mkString(" "))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val qs = results.map { case (k, v) => s""""$k":${med(v)}""" }.mkString(",")
    val qmin = results.map { case (k, v) => s""""$k":${v.min}""" }.mkString(",")
    val runsJ = results.map { case (k, v) =>
      s""""$k":[${v.mkString(",")}]""" }.mkString(",")
    val json = s"""{"metric":"ivf_segments","unit":"sec","n_vecs":$nVecs,""" +
      s""""compact_sec":$tCompact,"queries":{$qs},""" +
      s""""queries_min":{$qmin},"runs":{$runsJ},"n_runs":$runs}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
