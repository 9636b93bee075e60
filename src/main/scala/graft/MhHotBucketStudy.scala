package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Does the MinHash postings compaction survive a degenerate HOT BUCKET?
  * (r16 verdict #5: the IVF hot-cell study found the one-file-per-cell
  * compaction rewrite CREATED a probe straggler on a hot cell — this
  * audit applies the same suspicion to the OTHER index's compactor,
  * where a boilerplate corpus concentrates one (band, bucket) key.)
  *
  * Expectation (and why it should be flat, unlike IVF): the postings
  * rebuild aggregates ids per (band, bucket) through the SATURATING
  * [[graft.functions.AggExprs.cappedSortedIds]] — a bucket past
  * `maxBucket` drops to null and is filtered, and the aggregation buffer
  * itself caps at cap+1 elements, so a million-doc boilerplate bucket
  * costs the shuffle a million tiny (band, bucket, id) rows but never a
  * million-element buffer, never a straggler row, and never a hot output
  * file (the refused bucket writes NOTHING). The features side has no
  * per-key state at all. But r16's two real finds (O(d²) quantize, IVF
  * hot-cell) both came from measuring an "obviously fine" path — so
  * measure it.
  *
  * Procedure: two corpora of `nDocs`, NORMAL (unique synthetic texts)
  * and HOT (`hotFrac` of docs share ONE boilerplate text, the worst-case
  * single bucket per band); for each: build, append 4 segments, time the
  * full compaction and the post-compaction probe (5×, median).
  *
  * REQUIREd: hot compaction wall ≤ 2.5× normal (flat-ish — the hot
  * corpus shingles cheaper but shuffles the same row count; anything
  * past this bound means a straggler), hot probe median ≤ 2.5× normal,
  * and the hot index's postings hold NO row from the boilerplate bucket
  * (the cap refused it) while the normal index's bucket count is ~docs.
  *
  * Usage: runMain graft.MhHotBucketStudy [nDocs] [hotFrac] [out]
  */
object MhHotBucketStudy {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(50000L)
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val out = args.lift(2)
    val runs = 5
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

    val base = java.nio.file.Files.createTempDirectory("graft_hotbucket")
      .toString
    val boiler = "all rights reserved copyright notice terms of service " +
      "apply to every page of this site including this one and the next " +
      "one please consult the license for details of permitted use"
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    final case class Run(label: String, build: Double, compact: Double,
      probes: Seq[Double], postingRows: Long, maxBucketIds: Int)

    def runCase(label: String, hot: Boolean): Run = {
      val mk = (n: Long, off: Long) => {
        val d = SegmentStudy.synthDocs(spark, n, idOffset = off)
        if (!hot) d
        else d.withColumn("text",
          F.when(F.pmod(F.col("doc_id"), F.lit(100L)) <
            F.lit((hotFrac * 100).toLong), F.lit(boiler))
            .otherwise(F.col("text")))
      }
      mk(nDocs, 0L).write.mode("overwrite").parquet(s"$base/corpus_$label")
      val corpus = spark.read.parquet(s"$base/corpus_$label")
      val idx = s"$base/idx_$label"
      val tBuild = time {
        Dedup.writeMinhashIndex(corpus, F.col("doc_id"), F.col("text"),
          idx)
      }
      (0 until 4).foreach { k =>
        Dedup.appendToMinhashIndex(
          mk(1000L, nDocs * 4 + k * 1000L), F.col("doc_id"),
          F.col("text"), idx, segment = s"b$k")
      }
      val tCompact = time { Dedup.compactMinhashIndex(spark, idx) }
      val probeDf = mk(500L, 0L)
        .unionAll(SegmentStudy.synthDocs(spark, 500L, idOffset = nDocs * 900))
      def probe(): Double = time {
        Dedup.dedupAgainstIndex(probeDf, F.col("doc_id"), F.col("text"),
          idx, threshold = 0.7).count()
        spark.catalog.clearCache()
      }
      probe() // warm
      val probes = (1 to runs).map(_ => probe())
      val postings = spark.read.parquet(s"$idx/postings")
      val postingRows = postings.count()
      val maxIds = postings.select(F.max(F.size(F.col("ids"))))
        .collect().head.getInt(0)
      val r = Run(label, tBuild, tCompact, probes, postingRows, maxIds)
      System.err.println(f"[hotbucket] $label build=$tBuild%.1fs " +
        f"compact=$tCompact%.1fs postingRows=$postingRows " +
        f"maxBucketIds=$maxIds probes=" +
        probes.map(t => f"$t%.2f").mkString(" "))
      r
    }

    val normal = runCase("normal", hot = false)
    val hot = runCase("hot", hot = true)

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    require(hot.compact <= 2.5 * normal.compact,
      f"hot-bucket compaction ${hot.compact}%.1fs vs normal " +
        f"${normal.compact}%.1fs — a postings straggler; the capped " +
        "aggregation is not protecting the rebuild")
    require(med(hot.probes) <= 2.5 * med(normal.probes),
      f"hot-bucket probe ${med(hot.probes)}%.2fs vs normal " +
        f"${med(normal.probes)}%.2fs — the compacted layout serializes " +
        "hot-bucket probes")
    // the refusal itself: the boilerplate bucket must be ABSENT from the
    // compacted postings (cap refused it), so no posting row can carry
    // anywhere near the hot-doc count
    require(hot.maxBucketIds < 2000,
      s"hot index has a ${hot.maxBucketIds}-id posting row — the cap " +
        "did not refuse the boilerplate bucket")

    val json = s"""{"metric":"mh_hot_bucket","unit":"sec",""" +
      s""""n_docs":$nDocs,"hot_frac":$hotFrac,""" +
      Seq(normal, hot).map { r =>
        s""""${r.label}":{"build":${f"${r.build}%.2f"},""" +
          s""""compact":${f"${r.compact}%.2f"},""" +
          s""""probe_median":${f"${med(r.probes)}%.3f"},""" +
          s""""posting_rows":${r.postingRows},""" +
          s""""max_bucket_ids":${r.maxBucketIds}}"""
      }.mkString(",") + "}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
