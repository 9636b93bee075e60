package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Is the tiered compactor's per-trigger cost FLAT in the base size?
  * (r16 verdict #1's done-criterion: the full-fold `compactEvery` knob
  * was O(index) per trigger — cumulative O(T²/n) over a 24/7 stream —
  * and the fix only counts if the tiered fold's per-trigger cost tracks
  * the NEW data, not the corpus.)
  *
  * Procedure, per base size (N and 10N docs): build a MinHash index over
  * the base corpus, then append `nBatches` fresh segments and run
  * [[graft.operators.Dedup.tierCompactMinhashIndex]] after every append
  * (the stream's `compactEvery = 1, tieredCompaction = true` cadence,
  * driven directly so the compaction calls time in isolation), with
  * `baseFoldRatio = 1.0` so no base fold fires and every measured cost
  * is pure tier maintenance. Separately, time ONE full
  * [[graft.operators.Dedup.compactMinhashIndex]] over an identically
  * appended copy — the pre-r17 per-cadence cost.
  *
  * REQUIREd claims:
  *  - FLAT: total tiered compaction wall across all triggers at 10N is
  *    ≤ 2.5× the total at N (the work is O(batches·batch·log), not
  *    O(index); a 10× base would show ~10× here if the fold read it)
  *  - CONTRAST: the single full fold at 10N costs ≥ 3× the full fold at
  *    N (it IS O(index) — the cost model the tiered path escapes)
  *  - BOUNDED: the tiered run ends with ≤ 6 segments on both tables
  *    (base + tiers + the most recent unfolded appends)
  *  - EQUIVALENT: the tiered index's probe decisions equal the
  *    accreted (never-compacted) copy's on a mixed probe batch — tier
  *    folds must not change what dies
  *
  * Usage: runMain graft.TieredCompactStudy [nDocs] [nBatches] [out]
  */
object TieredCompactStudy {
  def main(args: Array[String]): Unit = {
    // base sizes where the full fold's O(index) term clears the ~1.5 s
    // fixed job floor: at 20k docs the floor dominated and the 10x
    // contrast read as 1.9x — the CONTRAST claim needs the data term
    // visible, the FLAT claim is size-agnostic
    val nDocs = args.lift(0).map(_.toLong).getOrElse(50000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val out = args.lift(2)
    val batchRows = 400L
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

    val base = java.nio.file.Files.createTempDirectory("graft_tiered")
      .toString
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    final case class Sized(n: Long, tieredTriggers: Seq[Double],
      fullFold: Double, folds: Int, baseFolds: Int, endSegs: Int)

    def runAt(n: Long, tag: String): Sized = {
      SegmentStudy.synthDocs(spark, n).write.mode("overwrite")
        .parquet(s"$base/corpus_$tag")
      val corpus = spark.read.parquet(s"$base/corpus_$tag")
      val batches = (0 until nBatches).map(k =>
        SegmentStudy.synthDocs(spark, batchRows,
          idOffset = n * 4 + k * batchRows))
      // tiered run: compact after EVERY append, ratio 1.0 pins the
      // measurement to tier folds only
      val tiered = s"$base/tiered_$tag"
      Dedup.writeMinhashIndex(corpus, F.col("doc_id"), F.col("text"),
        tiered)
      var folds = 0
      var baseFolds = 0
      val triggers = batches.zipWithIndex.map { case (b, k) =>
        Dedup.appendToMinhashIndex(b, F.col("doc_id"), F.col("text"),
          tiered, segment = s"b$k")
        time {
          val r = Dedup.tierCompactMinhashIndex(spark, tiered,
            fanout = 4, baseFoldRatio = 1.0)
          folds += r.folds.size
          if (r.baseFolded) baseFolds += 1
        }
      }
      // accreted copy: same appends, no maintenance — the full-fold
      // subject AND the probe-equivalence baseline
      val accreted = s"$base/accreted_$tag"
      Dedup.writeMinhashIndex(corpus, F.col("doc_id"), F.col("text"),
        accreted)
      batches.zipWithIndex.foreach { case (b, k) =>
        Dedup.appendToMinhashIndex(b, F.col("doc_id"), F.col("text"),
          accreted, segment = s"b$k")
      }
      // probe-decision equivalence BEFORE the full fold consumes the copy
      val probeDf = SegmentStudy.synthDocs(spark, 200, idOffset = 0)
        .unionAll(SegmentStudy.synthDocs(spark, 200,
          idOffset = n * 4 + batchRows / 2))
        .unionAll(SegmentStudy.synthDocs(spark, 100, idOffset = n * 9000))
      def survivors(path: String): Seq[Long] = {
        val s = Dedup.dedupAgainstIndex(probeDf, F.col("doc_id"),
          F.col("text"), path, threshold = 0.7)
          .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
        spark.catalog.clearCache()
        s
      }
      val sTiered = survivors(tiered)
      val sAccreted = survivors(accreted)
      require(sTiered == sAccreted,
        s"$tag: tiered survivors (${sTiered.size}) != accreted " +
          s"(${sAccreted.size}) — tier folds changed probe decisions")
      val fullFold = time {
        Dedup.compactMinhashIndex(spark, accreted)
      }
      val endSegs = spark.read.parquet(s"$tiered/features")
        .select("seg").distinct().collect().length
      val r = Sized(n, triggers, fullFold, folds, baseFolds, endSegs)
      System.err.println(f"[tiered] $tag n=$n folds=$folds " +
        f"tieredTotal=${triggers.sum}%.1fs fullFold=$fullFold%.1fs " +
        f"endSegs=$endSegs triggers=" +
        triggers.map(t => f"$t%.2f").mkString(" "))
      r
    }

    val small = runAt(nDocs, "n1")
    val big = runAt(nDocs * 10, "n10")

    // FLAT: the tiered cadence's total cost must not track the base
    require(big.tieredTriggers.sum <= 2.5 * small.tieredTriggers.sum,
      f"tiered compaction total grew ${big.tieredTriggers.sum}%.1fs vs " +
        f"${small.tieredTriggers.sum}%.1fs at 10x base — not flat; the " +
        "fold is reading the index")
    // CONTRAST: the full fold is O(index) — that is what tiering escapes
    require(big.fullFold >= 3.0 * small.fullFold,
      f"full fold at 10x base took ${big.fullFold}%.1fs vs " +
        f"${small.fullFold}%.1fs — the O(index) contrast did not " +
        "materialize; re-examine the fixture")
    require(small.baseFolds == 0 && big.baseFolds == 0,
      "ratio 1.0 runs must not base-fold — the measurement would mix " +
        "cost models")
    require(small.folds >= 2 && big.folds >= 2,
      s"too few tier folds fired (${small.folds}/${big.folds}) — the " +
        "fixture never fills a size class")
    require(small.endSegs <= 6 && big.endSegs <= 6,
      s"segment count not bounded (${small.endSegs}/${big.endSegs})")

    def sized(s: Sized): String =
      s"""{"n":${s.n},"tiered_triggers":[""" +
        s.tieredTriggers.map(t => f"$t%.3f").mkString(",") +
        s"""],"tiered_total":${f"${s.tieredTriggers.sum}%.3f"},""" +
        s""""full_fold":${f"${s.fullFold}%.3f"},"folds":${s.folds},""" +
        s""""end_segments":${s.endSegs}}"""
    val json = s"""{"metric":"tiered_compact","unit":"sec",""" +
      s""""batch_rows":$batchRows,"n_batches":$nBatches,""" +
      s""""small":${sized(small)},"big":${sized(big)}}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
