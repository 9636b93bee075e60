package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** What does the SQ8 rescore's id-pruned refine step COST, and what does
  * it buy? (r14 verdict #3's measurement leg.)
  *
  * On the r14 study corpus shape (deterministic low-rank, d = 256,
  * rank 32 — scaling/whitened_ivf_256.json's twin) with an SQ8 disk
  * index: per nprobe, the quantized-only search is timed against the
  * same search with `rescore` at factor ∈ {2, 4}, reporting wall-clock
  * and recall@10 against the FLOAT brute-force truth. The claims under
  * test: (a) the refine step's overhead is the bounded id-pruned lookup
  * (small and ~flat in factor), never a corpus re-scan; (b) rescored
  * recall@10 ≥ quantized recall@10 (the refine can only fix
  * quantization-induced rank inversions inside the candidate set).
  * Both are REQUIREd, so the artifact is self-checking.
  *
  * Usage: runMain graft.RescoreStudy [d] [n] [m] [out]
  * (defaults d=256, n=100000, m=100.)
  */
object RescoreStudy {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).map(_.toInt).getOrElse(256)
    val n = args.lift(1).map(_.toLong).getOrElse(100000L)
    val m = args.lift(2).map(_.toInt).getOrElse(100)
    val out = args.lift(3)
    val rank = 32
    val kTop = 10
    val nlist = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // the WhitenedIvfStudy/IvfRouteStudy generator — twin corpora
    def lowRank(ids: DataFrame): DataFrame = ids.select(
      F.col("id"),
      F.transform(F.sequence(F.lit(0), F.lit(d - 1)), j =>
        F.aggregate(F.sequence(F.lit(0), F.lit(rank - 1)), F.lit(0.0),
          (acc, l) => acc +
            (F.hash(j * 131 + l).cast("double") / 4.294967296e9) *
            (F.hash(F.col("id") * 31 + l).cast("double") / 4.294967296e9) /
            F.sqrt(l.cast("double") + 1.0)) +
          F.hash(F.col("id"), j, F.lit(7)).cast("double") / 4.294967296e9
            * 0.05).as("v"))

    val base = java.nio.file.Files
      .createTempDirectory(s"graft_rescore_$d").toString
    // the full-precision source reads from parquet — the id-prune's
    // pushed filter is then a REAL scan filter, not a local lookup
    lowRank(spark.range(n).toDF("id")).write.parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    val queries = lowRank(spark.range(n, n + m).toDF("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()

    def keys(df: DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    def recall(got: Map[Long, Set[Long]],
        truth: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size

    val (truth, tBrute) = time(keys(Similarity.bruteForceTopK(
      corpus, F.col("id"), F.col("v"), queries, F.col("id"), F.col("v"),
      kTop)))
    val path = s"$base/sq8"
    val (_, tBuild) = time(Similarity.writeIvfIndex(corpus, F.col("id"),
      F.col("v"), path, nlist = nlist, seed = 7, sq8 = true))
    System.err.println(f"[rescore] d=$d brute=$tBrute%.2fs build=$tBuild%.1fs")

    def search(np: Int, rs: Option[Similarity.RescoreSource]) =
      Similarity.searchIvfIndex(spark, path, queries, F.col("id"),
        F.col("v"), k = kTop, nprobe = np, rescore = rs)
    keys(search(1, None)) // cold-read warmup

    // nprobe 8/16 sit UNDER the wide-probe route (frac 0.125/0.25 of
    // nlist = 64) so the baseline genuinely times the quantized PROBE;
    // 64 is the exhaustive point and rides the brute route by design —
    // labeled `routed` in the artifact so nobody reads it as a probe
    // datapoint (r15 review: the first cut used 32, whose baseline was
    // silently the routed full scan)
    val sweep = Seq(8, 16, 64).map { np =>
      val routed = Similarity.shouldRouteBrute(np, nlist,
        widthBytes = d.toLong /* SQ8: 1 B/element */,
        localizeQueries = true)
      val (quant, tQ) = time(keys(search(np, None)))
      val rQ = recall(quant, truth)
      val rescored = Seq(2, 4).map { factor =>
        val (got, t) = time(keys(search(np, Some(Similarity.RescoreSource(
          corpus, F.col("id"), F.col("v"), factor)))))
        val r = recall(got, truth)
        System.err.println(f"[rescore] nprobe=$np routed=$routed " +
          f"factor=$factor search=$t%.2fs (+${t - tQ}%.2fs) " +
          f"recall=$r%.3f (quant $rQ%.3f)")
        // the refine can only help: candidates ⊇ nothing it can lose
        require(r >= rQ - 1e-9,
          f"rescore LOWERED recall at nprobe=$np factor=$factor: " +
            f"$r%.3f < $rQ%.3f")
        (factor, t, r)
      }
      // overhead claim: the refine is an id-pruned lookup, not a corpus
      // re-scan — it must cost well under the brute-force full scan
      rescored.foreach { case (f, t, _) =>
        require(t - tQ < 0.75 * tBrute,
          f"rescore overhead ${t - tQ}%.1fs at factor=$f approaches the " +
            f"full-scan cost $tBrute%.1fs — the id-prune is not pruning") }
      (np, routed, tQ, rQ, rescored)
    }
    val json = s"""{"metric":"sq8_rescore","unit":"sec","d":$d,"n":$n,""" +
      s""""m":$m,"nlist":$nlist,"k":$kTop,"brute":$tBrute,""" +
      s""""build":$tBuild,"sweep":[""" +
      sweep.map { case (np, routed, tQ, rQ, rescored) =>
        s"""{"nprobe":$np,"routed":$routed,"quant_search":$tQ,""" +
          s""""quant_recall":$rQ,""" +
          s""""rescored":[""" + rescored.map { case (f, t, r) =>
            s"""{"factor":$f,"search":$t,"recall":$r}"""
          }.mkString(",") + "]}"
      }.mkString(",") + "]}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
