package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Does a HOT CELL (one IVF cell owning ~half the corpus) straggle the
  * probe? (r15 verdict #5.)
  *
  * Corpus: n vectors at d = 64, HALF of them scaled copies of one
  * direction (scaling never changes an argmax-of-dots assignment or a
  * cosine, so they co-assign into ONE cell by construction — the
  * worst-case cluster skew an un-retrained production index drifts
  * toward), the other half spread isotropically over the remaining
  * cells.
  *
  * What is measured:
  *  - `probe_fresh`: hot-cell probe against the FRESHLY BUILT index —
  *    the base write lands one file per (input task × cell), so the hot
  *    cell is already multi-file and the scan parallelizes.
  *  - `probe_compact1`: the same probe after a whole-cell compaction
  *    that collapses each cell to ONE file (`maxCellRowsPerFile` off) —
  *    at study scale that file is a single parquet row group, the scan
  *    cannot split it, and the probe serializes onto one task.
  *  - `probe_compact_split`: after compaction with the per-cell file
  *    cap engaged — the hot cell re-splits into bounded files and the
  *    parallel floor returns.
  *  - `brute`: the full-scan floor over 2x the rows, fully parallel —
  *    the structural yardstick (a healthy half-corpus probe should sit
  *    near half of it, never above it).
  * The distributed-queries path (`localizeQueries = false`) is measured
  * on the same three layouts: its candidate join keys on `cell`, so the
  * hot key is exactly the skew AQE's size-estimator orientation must
  * absorb.
  *
  * Self-checks (REQUIREd): the capped-compaction probe beats the
  * one-file-per-cell probe and lands within 2x of the fresh layout;
  * the one-file probe demonstrates the cliff only structurally (its
  * time is reported, not gated — on a warm local FS the single-task
  * penalty varies with cache state).
  *
  * Usage: runMain graft.IvfHotCellStudy [n] [m] [out]
  */
object IvfHotCellStudy {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(400000L)
    val m = args.lift(1).map(_.toInt).getOrElse(50)
    val out = args.lift(2)
    val d = 64
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
    // hot half: scaled copies of one direction (ids < n/2); cold half:
    // deterministic pseudo-random unit-ish vectors
    val hotDir = F.transform(F.sequence(F.lit(0), F.lit(d - 1)), j =>
      F.when(j === 0, 1.0).otherwise(0.01))
    val corpus = spark.range(n).toDF("id").select(F.col("id"),
      F.when(F.col("id") < n / 2,
        F.transform(hotDir, x =>
          x * (F.lit(0.9) + (F.col("id") % 100).cast("double") / 500.0)))
      .otherwise(
        F.transform(F.sequence(F.lit(0), F.lit(d - 1)), j =>
          F.hash(F.col("id") * 131 + j).cast("double") / 4.294967296e9))
      .as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    // queries: half hot-direction (probe the hot cell), half cold
    val queries = spark.range(n, n + m).toDF("id").select(F.col("id"),
      F.when(F.col("id") % 2 === 0, F.transform(hotDir, x => x))
      .otherwise(
        F.transform(F.sequence(F.lit(0), F.lit(d - 1)), j =>
          F.hash(F.col("id") * 131 + j).cast("double") / 4.294967296e9))
      .as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    def consume(df: DataFrame): Long = df.count()

    val (_, tBrute) = time(consume(Similarity.bruteForceTopK(corpus,
      F.col("id"), F.col("v"), queries, F.col("id"), F.col("v"), kTop)))
    System.err.println(f"[hotcell] brute=$tBrute%.2fs")

    val base = java.nio.file.Files.createTempDirectory("graft_hotcell")
      .toString
    val path = s"$base/idx"
    val (_, tBuild) = time(Similarity.writeIvfIndex(corpus, F.col("id"),
      F.col("v"), path, nlist = nlist, seed = 7))
    // verify the skew actually materialized: one cell owns ~half the rows
    val sizes = spark.read.parquet(s"$path/assigned")
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hotCell = sizes.maxBy(_._2)
    require(hotCell._2 >= (n * 2) / 5,
      s"hot cell did not materialize: max cell ${hotCell._2} of $n")
    System.err.println(s"[hotcell] build=$tBuild cell sizes: hot=" +
      s"${hotCell._2}, cells=${sizes.size}")

    def probe(localize: Boolean): Double = {
      consume(Similarity.searchIvfIndex(spark, path, queries.limit(2),
        F.col("id"), F.col("v"), k = kTop, nprobe = 1,
        localizeQueries = localize)) // warm the listing
      val (_, t) = time(consume(Similarity.searchIvfIndex(spark, path,
        queries, F.col("id"), F.col("v"), k = kTop, nprobe = 1,
        localizeQueries = localize)))
      t
    }
    val freshLoc = probe(localize = true)
    val freshDist = probe(localize = false)
    System.err.println(f"[hotcell] fresh loc=$freshLoc%.2fs dist=$freshDist%.2fs")

    // one file per cell: the pre-r16 compaction layout
    Similarity.compactIvfIndex(spark, path,
      maxCellRowsPerFile = Long.MaxValue)
    val oneLoc = probe(localize = true)
    val oneDist = probe(localize = false)
    System.err.println(f"[hotcell] 1-file loc=$oneLoc%.2fs dist=$oneDist%.2fs")

    // capped: the hot cell re-splits into bounded files
    Similarity.compactIvfIndex(spark, path,
      maxCellRowsPerFile = math.max(1L, n / 32))
    val hotFiles = {
      val p = new org.apache.hadoop.fs.Path(
        s"$path/assigned/seg=base/cell=${hotCell._1}")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    val splitLoc = probe(localize = true)
    val splitDist = probe(localize = false)
    System.err.println(f"[hotcell] split loc=$splitLoc%.2fs " +
      f"dist=$splitDist%.2fs hotFiles=$hotFiles")

    require(hotFiles > 1,
      s"capped compaction left the hot cell in $hotFiles file(s)")
    require(splitLoc <= oneLoc * 1.1,
      f"capped layout probe $splitLoc%.2fs did not recover the one-file " +
        f"cliff $oneLoc%.2fs")
    require(splitLoc <= 2.0 * freshLoc + 0.5,
      f"capped layout probe $splitLoc%.2fs far from the fresh multi-file " +
        f"floor $freshLoc%.2fs")

    val json = s"""{"metric":"ivf_hotcell","unit":"sec","n":$n,"m":$m,""" +
      s""""d":$d,"nlist":$nlist,"hot_rows":${hotCell._2},""" +
      s""""hot_files_capped":$hotFiles,"brute":$tBrute,""" +
      s""""build":$tBuild,"probe_fresh":{"loc":$freshLoc,"dist":$freshDist},""" +
      s""""probe_compact1":{"loc":$oneLoc,"dist":$oneDist},""" +
      s""""probe_compact_split":{"loc":$splitLoc,"dist":$splitDist}}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
