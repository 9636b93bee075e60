package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Probe-latency vs segment-count study (r9 verdict #6 — the signal that
  * triggers MinHash-index compaction): build the SAME corpus as a
  * [[graft.operators.Dedup.writeMinhashIndex]] index in 1 / 4 / 16 / 64
  * segments (base + appends), probe a fixed batch against each, and then
  * probe the 64-segment index again AFTER
  * [[graft.operators.Dedup.compactMinhashIndex]] — the measured answer to
  * "when does compaction pay": the steady-state ingest stream appends one
  * segment per micro-batch, and every segment adds (a) per-segment posting
  * rows the bucket join must explode + distinct away and (b) file-listing
  * and row-group overhead on both index tables.
  *
  * Fixture: seeded synthetic docs (40 words from a 5k vocab per doc —
  * deterministic, no RNG at plan time), probe batch = half exact copies of
  * corpus docs (real verification work) + half fresh docs.
  *
  * Usage: runMain graft.SegmentStudy [nDocs] [runs] [out]
  */
object SegmentStudy {
  def synthDocs(spark: SparkSession, n: Long, idOffset: Long = 0L,
      words: Int = 40, vocab: Int = 5000): DataFrame = {
    // text keys on the OFFSET id (r16 fix): the original derived words
    // from the pre-offset range id, so `idOffset` changed only doc_id
    // and every "fresh" batch was an exact textual copy of corpus docs
    // 0..n-1 — IngestCompactStudy's all-dead survivors exposed it
    val wordCols = (0 until words).map(k =>
      F.concat(F.lit("w"),
        F.pmod(F.xxhash64((F.col("id") + idOffset) * 31 + k),
          F.lit(vocab.toLong))))
    spark.range(n).select((F.col("id") + idOffset).as("doc_id"),
      F.concat_ws(" ", wordCols: _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(20000L)
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
    import graft.operators.Dedup

    val base = java.nio.file.Files.createTempDirectory("graft_segs").toString
    // corpus on disk so every index build pays a real scan
    synthDocs(spark, nDocs).write.mode("overwrite")
      .parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    // probe batch: 250 exact copies (verification joins fire) + 250 fresh
    val batch = synthDocs(spark, 250, idOffset = 0)         // copies
      .unionAll(synthDocs(spark, 250, idOffset = nDocs * 2)) // fresh
    batch.write.mode("overwrite").parquet(s"$base/batch")
    val probeDf = spark.read.parquet(s"$base/batch")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(path: String): Double = time {
      Dedup.dedupAgainstIndex(probeDf, F.col("doc_id"), F.col("text"),
        path, threshold = 0.7).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val segCounts = Seq(1, 4, 16, 64)
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    var lastPath: String = null
    for (segs <- segCounts) {
      val path = s"$base/idx_$segs"
      val per = nDocs / segs
      Dedup.writeMinhashIndex(corpus.filter(F.col("doc_id") < per),
        F.col("doc_id"), F.col("text"), path)
      for (k <- 1 until segs) {
        Dedup.appendToMinhashIndex(
          corpus.filter(F.col("doc_id") >= per * k &&
            F.col("doc_id") < per * (k + 1)),
          F.col("doc_id"), F.col("text"), path, s"s$k")
      }
      probe(path) // warm-up (JIT/codegen) — the first index probed
                  // otherwise absorbs process warm-up into its grid
      results(s"probe_${segs}seg") = (1 to runs).map(_ => probe(path))
      lastPath = path
      System.err.println(s"[segstudy] $segs segments: " +
        results(s"probe_${segs}seg").map(t => f"$t%.2f").mkString(" "))
    }
    // compact the worst case and re-probe: the payoff measurement
    val tCompact = time { Dedup.compactMinhashIndex(spark, lastPath) }
    probe(lastPath)
    results("probe_64seg_compacted") = (1 to runs).map(_ => probe(lastPath))
    System.err.println(s"[segstudy] compacted (${f"$tCompact%.2f"}s): " +
      results("probe_64seg_compacted").map(t => f"$t%.2f").mkString(" "))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val qs = results.map { case (k, v) => s""""$k":${med(v)}""" }.mkString(",")
    val qmin = results.map { case (k, v) => s""""$k":${v.min}""" }.mkString(",")
    val runsJ = results.map { case (k, v) =>
      s""""$k":[${v.mkString(",")}]""" }.mkString(",")
    val json = s"""{"metric":"mh_segments","unit":"sec","n_docs":$nDocs,""" +
      s""""compact_sec":$tCompact,"queries":{$qs},""" +
      s""""queries_min":{$qmin},"runs":{$runsJ},"n_runs":$runs}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
