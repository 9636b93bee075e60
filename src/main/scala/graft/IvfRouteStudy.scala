package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Does the wide-probe brute-force route fire exactly where the measured
  * curve says it should? (r14 verdict #1.)
  *
  * scaling/whitened_ivf_4096.json measured the RAW-index cliff: at
  * d = 4096, n = 50k, nlist = 64, probing nprobe = 32 (half the cells)
  * took 15.9 s against brute force's 8.1 s, while nprobe = 16 ran 3.1 s.
  * [[graft.operators.Similarity.searchIvfIndex]] now routes any raw
  * search probing >= `bruteRouteFraction` (0.5) of its cells to the full
  * scan. This study replays the exact study shape through the ROUTED
  * verb and reports, per nprobe in {16, 32, 64}:
  *   - the search wall-clock (the routed 32/64 should sit at the brute
  *     floor, not on the measured cliff)
  *   - whether the route fired (from the factored decision)
  * plus the explicit brute-force baseline. Pass/fail is structural: the
  * routed points must beat the measured 15.9 s cliff and land within a
  * small factor of the brute baseline.
  *
  * Usage: runMain graft.IvfRouteStudy [d] [n] [m] [out]
  * (defaults d=4096, n=50000, m=50 — the whitened_ivf_4096 shape.)
  */
object IvfRouteStudy {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).map(_.toInt).getOrElse(4096)
    val n = args.lift(1).map(_.toLong).getOrElse(50000L)
    val m = args.lift(2).map(_.toInt).getOrElse(50)
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
      // the raw k-means training collect is trainSample × d doubles
      // (WhitenedIvfStudy's width datapoint)
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // the SAME deterministic low-rank generator as WhitenedIvfStudy —
    // twin corpora across the two artifacts
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
    corpus.count(); queries.count()

    def consume(df: DataFrame): Long = df.count()

    val (_, tBrute) = time(consume(Similarity.bruteForceTopK(
      corpus, F.col("id"), F.col("v"), queries, F.col("id"), F.col("v"),
      kTop)))
    System.err.println(f"[route] d=$d brute=$tBrute%.2fs")

    val base = java.nio.file.Files
      .createTempDirectory(s"graft_route_$d").toString
    val path = s"$base/raw"
    val (_, tBuild) = time(Similarity.writeIvfIndex(corpus, F.col("id"),
      F.col("v"), path, nlist = nlist, seed = 7))
    System.err.println(f"[route] d=$d build=$tBuild%.1fs")

    // warmup (cold parquet read — the WhitenedIvfStudy discipline)
    consume(Similarity.searchIvfIndex(spark, path, queries, F.col("id"),
      F.col("v"), k = kTop, nprobe = 1))
    val sweep = Seq(16, 32, 64).map { np =>
      val routed = Similarity.shouldRouteBrute(np, nlist,
        widthBytes = d.toLong * 8 /* raw float64 */,
        localizeQueries = true)
      val (_, t) = time(consume(Similarity.searchIvfIndex(spark, path,
        queries, F.col("id"), F.col("v"), k = kTop, nprobe = np)))
      System.err.println(
        f"[route] d=$d nprobe=$np routed=$routed search=$t%.2fs")
      (np, routed, t)
    }
    // structural pass/fail: the route fires at >= nlist/2 and the routed
    // searches sit at the brute floor, not on the measured cliff
    require(sweep.collect { case (np, r, _) if np * 2 >= nlist => r }
      .forall(identity), "route did not fire at the measured fraction")
    require(!sweep.head._2, "route fired under the measured fraction")
    sweep.filter(_._2).foreach { case (np, _, t) =>
      require(t < 2.5 * tBrute,
        f"routed nprobe=$np took $t%.1fs vs brute $tBrute%.1fs — the " +
          "route is not delivering the full-scan floor") }

    val json = s"""{"metric":"ivf_route","unit":"sec","d":$d,"n":$n,""" +
      s""""m":$m,"nlist":$nlist,"k":$kTop,"brute":$tBrute,""" +
      s""""build":$tBuild,"sweep":[""" +
      sweep.map { case (np, r, t) =>
        s"""{"nprobe":$np,"routed":$r,"search":$t}"""
      }.mkString(",") + "]}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(base))
    spark.stop()
  }
}
