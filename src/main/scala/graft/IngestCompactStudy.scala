package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Does `compactEvery` actually hold the ingest stream's probe latency at
  * the compacted floor? (r15 verdict #3's measurement leg — SegmentStudy
  * measured the floor and the ~75%-at-64-segments degradation for MANUAL
  * compaction; this study runs the real streaming path with the IN-LINE
  * trigger and checks the steady state it leaves behind.)
  *
  * Three identical [[graft.streaming.Streams.ingestDedupStream]] runs
  * over the same `nBatches` micro-batch feed against the same pre-built
  * MinHash index shape: `compactEvery = 0` (segments accrete, one per
  * batch — the pre-r16 steady state), `compactEvery = cadence` with the
  * FULL fold (O(index) per trigger — the r16 in-line shape), and the
  * r17 production cadence `tieredCompaction = true, compactEvery = 1`
  * (size-tiered folds, O(batch) per trigger — [[TieredCompactStudy]]
  * measured the cost model on direct fold loops; THIS run drives it
  * through the real stream). Reported per run: total stream wall-clock,
  * final segment count on both index tables, and the median post-run
  * probe latency (the next batch's cost) — probes run INTERLEAVED
  * across the arms' final layouts so host-load drift cancels out of
  * the cross-arm comparison. REQUIREd: the full-fold run
  * ends with at most `cadence + 1` feature segments (base + the
  * segments since the last trigger, + the excluded in-flight one); the
  * tiered run's segment count is bounded by the fanout-per-class
  * invariant (fanout − 1 per level × O(log) levels + base + in-flight —
  * far under the accreted count); neither compacted run's post-run
  * probe exceeds the accreted run's; and all three runs' survivor
  * outputs are row-identical (in this fixture no bucket nears the cap,
  * so compaction cannot move a kill decision — a tier fold that lost or
  * duplicated a feature row would break the equality).
  *
  * Usage: runMain graft.IngestCompactStudy [nDocs] [nBatches] [out]
  */
object IngestCompactStudy {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(20000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val out = args.lift(2)
    val cadence = 6
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
    import graft.streaming.Streams

    val base = java.nio.file.Files.createTempDirectory("graft_icompact")
      .toString
    SegmentStudy.synthDocs(spark, nDocs).write.mode("overwrite")
      .parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    // feed: nBatches files of fresh docs (mtime-ordered), each sharing a
    // few exact copies of corpus docs so the probe does real kills
    val feed = new java.io.File(s"$base/feed"); feed.mkdirs()
    val batchRows = 400L
    for (k <- 0 until nBatches) {
      val fresh = SegmentStudy.synthDocs(spark, batchRows - 50,
        idOffset = nDocs * 4 + k * batchRows)
      val copies = SegmentStudy.synthDocs(spark, 50, idOffset = 0)
        .select((F.col("doc_id") + nDocs * 100 + k * batchRows)
          .as("doc_id"), F.col("text"))
      val tmp = s"$base/tmp_$k"
      fresh.unionAll(copies).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$base/feed/b$k.parquet"))
    }
    val schema = corpus.schema
    val probeDf = SegmentStudy.synthDocs(spark, 250, idOffset = 0)
      .unionAll(SegmentStudy.synthDocs(spark, 250, idOffset = nDocs * 8))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(path: String): Double = time {
      Dedup.dedupAgainstIndex(probeDf, F.col("doc_id"), F.col("text"),
        path, threshold = 0.7).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def segCount(path: String, table: String): Int =
      spark.read.parquet(s"$path/$table").select("seg").distinct()
        .collect().length

    final case class Run(label: String, wall: Double, featSegs: Int,
      postSegs: Int, var probes: Seq[Double])
    def run(label: String, every: Int, tiered: Boolean = false): Run = {
      val idx = s"$base/idx_$label"
      Dedup.writeMinhashIndex(corpus, F.col("doc_id"), F.col("text"), idx)
      val wall = time {
        Streams.ingestDedupStream(
          Streams.readParquetStream(spark, feed.toString, schema,
            maxFilesPerTrigger = 1),
          F.col("doc_id"), F.col("text"), idx, s"$base/out_$label",
          threshold = 0.7, name = s"ic_$label", compactEvery = every,
          tieredCompaction = tiered)
      }
      val r = Run(label, wall, segCount(idx, "features"),
        segCount(idx, "postings"), Seq.empty)
      System.err.println(f"[icompact] $label wall=${r.wall}%.1fs " +
        f"featSegs=${r.featSegs}")
      r
    }

    val accrete = run("accrete", every = 0)
    val inline = run("inline", every = cadence)
    val tiered = run("tiered", every = 1, tiered = true)

    // post-run probes INTERLEAVED across the three arms so host-load
    // drift cancels out of the cross-arm comparison (per-arm sequential
    // probing measured a 1.5× swing on this class of VM purely from
    // WHEN an arm's turn came)
    val all = Seq(accrete, inline, tiered)
    all.foreach(r => probe(s"$base/idx_${r.label}")) // warm
    val probeRounds = (1 to runs).map(_ =>
      all.map(r => r.label -> probe(s"$base/idx_${r.label}")))
    all.foreach { r =>
      r.probes = probeRounds.map(_.find(_._1 == r.label).get._2)
      System.err.println(f"[icompact] ${r.label} probes=" +
        r.probes.map(t => f"$t%.2f").mkString(" "))
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    require(inline.featSegs <= cadence + 1,
      s"in-line compaction left ${inline.featSegs} feature segments — " +
        s"the cadence-$cadence trigger is not folding")
    require(accrete.featSegs >= nBatches,
      s"accreting run ended with ${accrete.featSegs} segments — fixture " +
        "broken")
    require(med(inline.probes) <= med(accrete.probes) * 1.05,
      f"in-line-compacted probe ${med(inline.probes)}%.2fs worse than " +
        f"accreted ${med(accrete.probes)}%.2fs")
    // the tiered steady state: fanout − 1 segments per size class ×
    // O(log_fanout nBatches) levels, + base + the last in-flight segment
    // (excluded from its own trigger, folded by the next). For the
    // default fanout 4 over 24 equal-size batches that is single digits;
    // the bound below is loose enough for class-boundary jitter but far
    // under the accreted count, so a non-folding tier path cannot pass.
    require(tiered.featSegs <= 10,
      s"tiered run left ${tiered.featSegs} feature segments — the " +
        "per-trigger tier folds are not bounding the segment count")
    require(med(tiered.probes) <= med(accrete.probes) * 1.05,
      f"tiered-compacted probe ${med(tiered.probes)}%.2fs worse than " +
        f"accreted ${med(accrete.probes)}%.2fs")
    // survivor equality across all three runs: this fixture's buckets
    // never near the cap, so compaction cadence cannot move a kill
    // decision — any tier fold that lost, duplicated, or relabeled a
    // feature row WOULD move one and break this
    val survivorSets = Seq(accrete, inline, tiered).map { r =>
      spark.read.parquet(s"$base/out_${r.label}")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    require(survivorSets.distinct.size == 1,
      s"survivor sets differ across compaction arms: sizes " +
        survivorSets.map(_.size).mkString("/"))

    def runJson(r: Run): String =
      s"""{"label":"${r.label}","wall":${r.wall},""" +
        s""""feature_segments":${r.featSegs},""" +
        s""""postings_segments":${r.postSegs},""" +
        s""""probe_median":${med(r.probes)},""" +
        s""""probes":[${r.probes.mkString(",")}]}"""
    val json = s"""{"metric":"ingest_compact","unit":"sec",""" +
      s""""n_docs":$nDocs,"n_batches":$nBatches,"cadence":$cadence,""" +
      s""""runs":[${runJson(accrete)},${runJson(inline)},""" +
      s"""${runJson(tiered)}]}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
