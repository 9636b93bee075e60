package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Where does the wide-probe cliff sit as a function of candidate WIDTH?
  * (r15 verdict #1 + r15 ADVICE: the r15 route generalized one
  * d = 4096 float64 measurement — 32 KiB candidate rows — to every raw
  * layout and blanket-exempted whitened ones; this study measures the
  * missing widths so [[graft.operators.Similarity.bruteRouteFraction]]
  * can be a width model instead of a space stamp.)
  *
  * Three layouts at n = 50k / nlist = 64 / m = 50 (the
  * whitened_ivf_4096.json shape), each swept over probe fractions with
  * the route DISABLED (routeEnabled = false — the study wants the raw
  * probed curve, not the routed floor) plus the brute floor through the
  * same verb (nprobe = nlist with the route on = the full-scan path over
  * the same stored payload):
  *  - `sq8`: raw-space SQ8 at d = 4096 → 4 KiB candidate rows (1 B/elem)
  *  - `w512`: whitened float64 at pcaK = 512 over a d = 1024 slow-decay
  *    corpus → 4 KiB candidate rows — the regime the r13 isotropy study
  *    says needs big pcaK, and the exact shape the r15 blanket exemption
  *    would mis-route
  *  - `w256`: whitened float64 at pcaK = 256 → 2 KiB candidate rows
  *  - `raw1k`: raw float64 at d = 1024 → 8 KiB rows, the interpolation
  *    band's midpoint witness
  *  - `f32_8k`: raw FLOAT32 at d = 2048 → the same 8 KiB rows by the
  *    meta's `elem_bytes` stamp (r16 verdict #3) — twice raw1k's
  *    dimension count at the identical byte width, witnessing that the
  *    route axis is BYTES, not dimensions (the pre-stamp model read
  *    this layout as 16 KiB and would route it early)
  *
  * Self-checks (REQUIREd): at every measured point the probed path
  * stays under 1.5× the brute floor through fraction 0.75 — i.e. there
  * is NO interior cliff at these widths, so the model's threshold
  * (1.0 at ≤ 4 KiB, ~0.83 interpolated at 8 KiB) never force-routes a
  * fraction where probing measured faster; the EXHAUSTIVE PROBED path
  * (nprobe = nlist with the route disabled — the genuine all-cells
  * probe machinery, not the routed floor) also lands within 1.5× of
  * the floor (r16 ADVICE: this clause was previously stated but
  * measured against the floor itself, i.e. vacuously); and the f32_8k
  * layout's meta-derived candidate width is exactly 8192 B.
  *
  * Usage: runMain graft.IvfRouteWidthStudy [n] [m] [out]
  */
object IvfRouteWidthStudy {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val m = args.lift(1).map(_.toInt).getOrElse(50)
    val out = args.lift(2)
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
    import graft.operators.{Embeddings, Similarity}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // the WhitenedIvfStudy/IvfRouteStudy generator — twin corpora, with
    // d and rank per layout (slow 1/sqrt(l+1) decay: the top-`rank`
    // block is near-flat, the regime that genuinely needs big pcaK)
    def lowRank(ids: DataFrame, d: Int, rank: Int): DataFrame = ids.select(
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
      .createTempDirectory("graft_route_width").toString
    def consume(df: DataFrame): Long = df.count()
    // genuine probed fractions only — frac 1.0 rides the in-memory
    // exhaustive route whatever the flag says, so it is the brute
    // floor by construction, not a probed datapoint
    val probeFracs = Seq(16, 32, 48) // of nlist = 64

    final case class LayoutRun(label: String, widthBytes: Long,
      brute: Double, build: Double, sweep: Seq[(Int, Double)],
      exhaustiveProbed: Double)

    def runLayout(label: String, d: Int, rank: Int,
        build: (DataFrame, String) => Unit,
        search: (String, DataFrame, Int, Boolean) => DataFrame,
        widthBytes: Long): LayoutRun = {
      val corpus = lowRank(spark.range(n).toDF("id"), d, rank)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = lowRank(spark.range(n, n + m).toDF("id"), d, rank)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count(); queries.count()
      val path = s"$base/$label"
      val (_, tBuild) = time(build(corpus, path))
      // cold-read warmup (the WhitenedIvfStudy discipline)
      consume(search(path, queries, 1, false))
      // brute floor THROUGH the verb: exhaustive probe with the route
      // ON scans everything via the full-scan path over the same stored
      // payload (dequantized for sq8, whitened for pca layouts)
      val (_, tBrute) = time(consume(search(path, queries, nlist, true)))
      System.err.println(f"[width] $label w=${widthBytes}B " +
        f"build=$tBuild%.1fs brute=$tBrute%.2fs")
      val sweep = probeFracs.map { np =>
        val (_, t) = time(consume(search(path, queries, np, false)))
        System.err.println(f"[width] $label nprobe=$np probed=$t%.2fs " +
          f"(brute $tBrute%.2fs)")
        (np, t)
      }
      // the genuine exhaustive PROBED path (route disabled): all-cells
      // probe machinery over the same payload — the non-vacuous twin of
      // the routed floor above (r16 ADVICE #5)
      val (_, tExh) = time(consume(search(path, queries, nlist, false)))
      System.err.println(f"[width] $label exhaustive-probed=$tExh%.2fs " +
        f"(brute $tBrute%.2fs)")
      corpus.unpersist(); queries.unpersist()
      LayoutRun(label, widthBytes, tBrute, tBuild, sweep, tExh)
    }

    val sq8 = runLayout("sq8", d = 4096, rank = 32,
      build = (c, p) => Similarity.writeIvfIndex(c, F.col("id"),
        F.col("v"), p, nlist = nlist, seed = 7, sq8 = true),
      search = (p, q, np, route) => Similarity.searchIvfIndexImpl(spark,
        p, q, F.col("id"), F.col("v"), k = kTop, nprobe = np,
        excludeSegment = None, localizeQueries = true,
        expectWhitened = false, routeEnabled = route),
      widthBytes = 4096L)

    // the interpolation band's midpoint-ish witness: raw float64 at
    // d = 1024 → 8 KiB rows, where the log-width model reads a ~0.83
    // threshold — the probed sweep through 0.75 must therefore stay
    // under the route (and under the 1.5× floor check below), while
    // the 32 KiB anchor's cliff is expected to be absent at this width
    val raw1k = runLayout("raw1k", d = 1024, rank = 32,
      build = (c, p) => Similarity.writeIvfIndex(c, F.col("id"),
        F.col("v"), p, nlist = nlist, seed = 7),
      search = (p, q, np, route) => Similarity.searchIvfIndexImpl(spark,
        p, q, F.col("id"), F.col("v"), k = kTop, nprobe = np,
        excludeSegment = None, localizeQueries = true,
        expectWhitened = false, routeEnabled = route),
      widthBytes = 8192L)

    // float32 witness at the SAME 8 KiB byte width (d = 2048 × 4 B):
    // the elem_bytes stamp (r16 verdict #3) must put this layout on the
    // same route point as raw1k — double the dimensions, identical
    // bytes. The corpus/queries cast to float32 BEFORE the build so the
    // stored payload (and the stamp) is genuinely 4 B/element.
    val f32 = {
      val toF32 = (df: DataFrame) => df.withColumn("v", F.col("v").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
      val corpus = toF32(lowRank(spark.range(n).toDF("id"), 2048, 32))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = toF32(lowRank(spark.range(n, n + m).toDF("id"),
        2048, 32))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count(); queries.count()
      val path = s"$base/f32_8k"
      val (_, tBuild) = time(Similarity.writeIvfIndex(corpus, F.col("id"),
        F.col("v"), path, nlist = nlist, seed = 7))
      // the stamp witness: meta-derived candidate width is the true
      // float32 byte width, not the pre-stamp 8 B/element reading
      val metaWidth = Similarity.candidateWidthBytes(
        Similarity.readIvfMeta(spark, path))
      require(metaWidth == 8192L,
        s"f32_8k: meta-derived candidate width $metaWidth B != 8192 B — " +
          "the elem_bytes stamp is not reaching the route model")
      def search(np: Int, route: Boolean) =
        Similarity.searchIvfIndexImpl(spark, path, queries, F.col("id"),
          F.col("v"), k = kTop, nprobe = np, excludeSegment = None,
          localizeQueries = true, expectWhitened = false,
          routeEnabled = route)
      consume(search(1, false))
      val (_, tBrute) = time(consume(search(nlist, true)))
      System.err.println(f"[width] f32_8k w=8192B build=$tBuild%.1fs " +
        f"brute=$tBrute%.2fs")
      val sweep = probeFracs.map { np =>
        val (_, t) = time(consume(search(np, false)))
        System.err.println(f"[width] f32_8k nprobe=$np probed=$t%.2fs " +
          f"(brute $tBrute%.2fs)")
        (np, t)
      }
      val (_, tExh) = time(consume(search(nlist, false)))
      System.err.println(f"[width] f32_8k exhaustive-probed=$tExh%.2fs " +
        f"(brute $tBrute%.2fs)")
      corpus.unpersist(); queries.unpersist()
      LayoutRun("f32_8k", 8192L, tBrute, tBuild, sweep, tExh)
    }

    def whitened(label: String, pcaK: Int): LayoutRun = {
      var model: Embeddings.PcaModel = null
      runLayout(label, d = 1024, rank = pcaK,
        build = (c, p) => {
          model = Embeddings.writeWhitenedIvfIndex(c, F.col("id"),
            F.col("v"), p, pcaK = pcaK, nlist = nlist, seed = 7)
        },
        search = (p, q, np, route) => {
          val projected = Embeddings.pcaProject(q, F.col("v"), model,
            "__wv", whiten = true)
          Similarity.searchIvfIndexImpl(spark, p, projected, F.col("id"),
            F.col("__wv"), k = kTop, nprobe = np, excludeSegment = None,
            localizeQueries = true, expectWhitened = true,
            expectedModelFp = Some(model.fingerprint),
            routeEnabled = route)
        },
        widthBytes = pcaK.toLong * 8)
    }
    val w512 = whitened("w512", pcaK = 512)
    val w256 = whitened("w256", pcaK = 256)

    val runs = Seq(sq8, raw1k, f32, w512, w256)
    // self-check: no interior cliff at these widths — probing through
    // frac 0.75 never crosses 1.5x the brute floor; the model's
    // threshold for these widths therefore never force-routes a
    // fraction where probing measured faster. The exhaustive PROBED
    // point (route off) must also land within 1.5x of the floor — the
    // previously-stated-but-vacuous clause, now measured on its own
    // path (r16 ADVICE #5).
    runs.foreach { r =>
      r.sweep.foreach { case (np, t) =>
        require(t <= 1.5 * r.brute,
          f"${r.label}: probed nprobe=$np took $t%.1fs vs brute " +
            f"${r.brute}%.1fs — an interior cliff at width " +
            f"${r.widthBytes}B; the route anchors must move") }
      require(r.exhaustiveProbed <= 1.5 * r.brute,
        f"${r.label}: exhaustive PROBED path took " +
          f"${r.exhaustiveProbed}%.1fs vs brute ${r.brute}%.1fs — the " +
          "all-cells probe machinery is supposed to sit near the floor " +
          "at these widths")
    }

    val json = s"""{"metric":"ivf_route_width","unit":"sec","n":$n,""" +
      s""""m":$m,"nlist":$nlist,"k":$kTop,"layouts":[""" +
      runs.map { r =>
        s"""{"label":"${r.label}","width_bytes":${r.widthBytes},""" +
          s""""brute":${r.brute},"build":${r.build},""" +
          s""""exhaustive_probed":${r.exhaustiveProbed},"sweep":[""" +
          r.sweep.map { case (np, t) =>
            s"""{"nprobe":$np,"probed":$t}""" }.mkString(",") + "]}"
      }.mkString(",") + "]}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
