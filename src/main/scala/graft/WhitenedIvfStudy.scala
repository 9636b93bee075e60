package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Does the whitened IVF's pcaK ≪ d reduction actually buy its claimed
  * search savings at transformer embedding widths — and what does the
  * metric change cost in raw-cosine recall?
  *
  * The whitened-index family
  * ([[graft.operators.Embeddings.writeWhitenedIvfIndex]]) claims
  * "k ≪ d cuts centroid-assignment and candidate-scoring flops by d/k".
  * The testdata embeddings are 8-wide, so nothing in the oracle suite can
  * see that term. This study pins it at realistic width: a deterministic
  * low-rank corpus (x = U·z + ε, rank r = 32 with a decaying spectrum —
  * the shape that makes PCA reduction meaningful, generated in-plan from
  * hashes so there is no testdata dependency or RNG state), then for each
  * (d, n) it measures wall-clock and recall@10 for:
  *
  *  - brute force over raw vectors (the exact baseline; truth set)
  *  - raw IVF at nlist/nprobe (the d-width index path)
  *  - whitened IVF at pcaK ∈ {r, 2r} — fit + build cost reported
  *    separately from search; recall measured BOTH against the raw-cosine
  *    truth (the honest end-user number — whitening deliberately changes
  *    the metric, so this is a semantics trade, not an approximation
  *    error) and against whitened-space brute force (the pruning-quality
  *    number: how much the IVF probe loses in its OWN space)
  *
  * Usage: runMain graft.WhitenedIvfStudy [d] [n] [m] [out]
  * (defaults d=256, n=100000 corpus, m=100 queries.)
  */
object WhitenedIvfStudy {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).map(_.toInt).getOrElse(256)
    val n = args.lift(1).map(_.toLong).getOrElse(100000L)
    val m = args.lift(2).map(_.toInt).getOrElse(100)
    val out = args.lift(3)
    val rank = 32
    val kTop = 10
    val nlist = 64
    val nprobe = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      // the RAW-IVF comparison arm's k-means training collect is
      // trainSample × d doubles (+ Row inflation) — ~1 GB at d = 4096,
      // past the 1 GiB maxResultSize default. Itself a width datapoint:
      // the whitened arm's training sample lives in pcaK space (2.5 MB
      // at pcaK = 32), two orders of magnitude below the raw arm's.
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Embeddings, Similarity}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // x(j) = Σ_l U(j,l)·z(l)·s(l) + 0.05·noise(j): U and z are hash-based
    // uniforms in [-0.5, 0.5), s(l) = 1/√(1+l) gives the decaying
    // spectrum. All deterministic — reruns see the identical corpus.
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

    val corpus = lowRank(spark.range(n).toDF("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = lowRank(spark.range(n, n + m).toDF("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count(); queries.count() // materialize: time searches, not gen

    def keys(df: DataFrame): Set[(Long, Long)] = df
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size

    // exact raw-cosine baseline — the truth set end users care about
    val (bruteRows, tBrute) = time(keys(Similarity.bruteForceTopK(
      corpus, F.col("id"), F.col("v"), queries, F.col("id"), F.col("v"),
      kTop)))

    val base = java.nio.file.Files
      .createTempDirectory(s"graft_wivf_$d").toString

    val nprobes = Seq(nprobe, 2 * nprobe, 4 * nprobe)
    def sweep(search: Int => DataFrame,
        truth: Set[(Long, Long)]): Seq[(Int, Double, Double)] = {
      // warmup probe: the first search against a fresh index pays its
      // cold parquet read (OS page cache) — without this the sweep shows
      // time DECREASING with nprobe, which is the I/O warming, not the
      // probe cost
      keys(search(1))
      nprobes.map { np =>
        val (got, t) = time(keys(search(np)))
        (np, t, recall(got, truth))
      }
    }
    def sweepJson(s: Seq[(Int, Double, Double)], rl: String): String =
      s.map { case (np, t, r) =>
        s"""{"nprobe":$np,"search":$t,"$rl":$r}"""
      }.mkString("[", ",", "]")

    // raw IVF at full width
    val rawPath = s"$base/raw"
    val (_, tRawBuild) = time(Similarity.writeIvfIndex(corpus, F.col("id"),
      F.col("v"), rawPath, nlist = nlist, seed = 7))
    val rawSweep = sweep(np => Similarity.searchIvfIndex(spark, rawPath,
      queries, F.col("id"), F.col("v"), k = kTop, nprobe = np), bruteRows)
    rawSweep.foreach { case (np, t, r) =>
      System.err.println(
        f"[wivf] d=$d raw_ivf nprobe=$np search=$t%.2fs recall=$r%.3f") }

    // whitened IVF at pcaK = rank and 2·rank
    val whitened = Seq(rank, 2 * rank).map { pcaK =>
      val p = s"$base/w$pcaK"
      val (model, tBuild) = time(Embeddings.writeWhitenedIvfIndex(corpus,
        F.col("id"), F.col("v"), p, pcaK = pcaK, nlist = nlist, seed = 7))
      // pruning-quality truth: brute force in the SAME whitened space
      val cw = Embeddings.pcaProject(corpus, F.col("v"), model, "wv",
        whiten = true)
      val qw = Embeddings.pcaProject(queries, F.col("v"), model, "wv",
        whiten = true)
      val (wTruth, tWBrute) = time(keys(Similarity.bruteForceTopK(
        cw, F.col("id"), F.col("wv"), qw, F.col("id"), F.col("wv"), kTop)))
      val own = sweep(np => Embeddings.searchWhitenedIvfIndex(spark, p,
        queries, F.col("id"), F.col("v"), k = kTop, nprobe = np), wTruth)
      // the raw-cosine recall of the FULL whitened ranking (its brute
      // force) — the metric-change cost, separated from IVF probe loss
      val rRawCeiling = recall(wTruth, bruteRows)
      own.foreach { case (np, t, r) =>
        System.err.println(f"[wivf] d=$d pcaK=$pcaK nprobe=$np " +
          f"search=$t%.2fs recall_own=$r%.3f") }
      System.err.println(f"[wivf] d=$d pcaK=$pcaK build=$tBuild%.1fs " +
        f"wbrute=$tWBrute%.2fs raw_recall_ceiling=$rRawCeiling%.3f")
      (pcaK, tBuild, tWBrute, rRawCeiling, own)
    }
    // whitened + SQ8 at pcaK = rank (r14): the composed candidate-payload
    // claim — int8 codes of pcaK dims vs float64s of d dims. Recall is
    // measured against the FLOAT whitened brute force (the metric
    // target; quantization error is the gap), and the on-disk assigned
    // sizes of the float-whitened vs sq8-whitened layouts are reported —
    // the 100 TB candidate-IO term the stamp exists for.
    def dirBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(hp).getLength
    }
    val sq8Path = s"$base/wsq8"
    val (modelQ, tBuildQ) = time(Embeddings.writeWhitenedIvfIndex(corpus,
      F.col("id"), F.col("v"), sq8Path, pcaK = rank, nlist = nlist,
      seed = 7, sq8 = true))
    val cwq = Embeddings.pcaProject(corpus, F.col("v"), modelQ, "wv",
      whiten = true)
    val qwq = Embeddings.pcaProject(queries, F.col("v"), modelQ, "wv",
      whiten = true)
    val wTruthQ = keys(Similarity.bruteForceTopK(cwq, F.col("id"),
      F.col("wv"), qwq, F.col("id"), F.col("wv"), kTop))
    val ownQ = sweep(np => Embeddings.searchWhitenedIvfIndex(spark,
      sq8Path, queries, F.col("id"), F.col("v"), k = kTop, nprobe = np),
      wTruthQ)
    val bytesFloat = dirBytes(s"$base/w$rank/assigned")
    val bytesSq8 = dirBytes(s"$sq8Path/assigned")
    ownQ.foreach { case (np, t, r) =>
      System.err.println(f"[wivf] d=$d pcaK=$rank SQ8 nprobe=$np " +
        f"search=$t%.2fs recall_vs_float=$r%.3f") }
    System.err.println(f"[wivf] d=$d SQ8 build=$tBuildQ%.1fs assigned " +
      f"float=${bytesFloat / 1048576.0}%.1fMB sq8=" +
      f"${bytesSq8 / 1048576.0}%.1fMB (${
        bytesFloat.toDouble / bytesSq8}%.1fx)")
    System.err.println(f"[wivf] d=$d n=$n brute=$tBrute%.2fs " +
      f"raw_ivf build=$tRawBuild%.1fs")

    val json = s"""{"metric":"whitened_ivf","unit":"sec","d":$d,""" +
      s""""n":$n,"m":$m,"rank":$rank,"k":$kTop,"nlist":$nlist,""" +
      s""""brute":$tBrute,""" +
      s""""raw_ivf":{"build":$tRawBuild,""" +
      s""""sweep":${sweepJson(rawSweep, "recall")}},"whitened":[""" +
      whitened.map { case (p, b, wb, rc, own) =>
        s"""{"pcaK":$p,"build":$b,"whitened_brute":$wb,""" +
          s""""raw_recall_ceiling":$rc,""" +
          s""""sweep":${sweepJson(own, "recall_own")}}"""
      }.mkString(",") +
      s"""],"whitened_sq8":{"pcaK":$rank,"build":$tBuildQ,""" +
      s""""assigned_bytes_float":$bytesFloat,""" +
      s""""assigned_bytes_sq8":$bytesSq8,""" +
      s""""sweep":${sweepJson(ownQ, "recall_vs_float")}}}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
