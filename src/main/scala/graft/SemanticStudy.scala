package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Semantic-dedup cost vs cluster-count study — the measured answer to
  * "how do I size nClusters": [[graft.operators.Similarity.semanticDedup]]'s
  * pair join is quadratic PER CELL (candidate volume ≈ Σ|cell|² ≈
  * N²/nClusters when balanced), so the cluster count is the knob that
  * turns an impossible corpus-wide all-pairs join into a linear-ish scan —
  * SemDeDup's own posture (cluster count grows with the corpus). This
  * study times the operator at a fixed corpus size across cluster counts
  * and records the planted-copy kill count at each, pinning that the
  * speedup costs NO true-duplicate recall (scaled copies co-assign with
  * their originals at every cluster count — assignment is scale-invariant).
  *
  * Fixture: seeded synthetic unit-ish vectors in `dirs` natural direction
  * groups (hot dim from a hash, deterministic noise elsewhere — no RNG at
  * plan time), plus ×2-scaled copies of the first `nCopies` ids.
  *
  * Usage: runMain graft.SemanticStudy [nVecs] [runs] [out]
  */
object SemanticStudy {
  def synthVecs(spark: SparkSession, n: Long, dims: Int = 32,
      idOffset: Long = 0L): DataFrame = {
    val hot = F.pmod(F.xxhash64(F.col("id")), F.lit(dims.toLong))
    val comps = (0 until dims).map { d =>
      F.when(hot === d.toLong, F.lit(10.0)).otherwise(F.lit(0.0)) +
        F.pmod(F.xxhash64(F.col("id") * 7 + d), F.lit(100L))
          .cast("double") * 0.01
    }
    spark.range(n).select((F.col("id") + idOffset).as("vec_id"),
      F.array(comps: _*).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toLong).getOrElse(40000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val out = args.lift(2)
    val nCopies = 200L
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

    val base = java.nio.file.Files.createTempDirectory("graft_sem").toString
    // corpus + planted scaled copies on disk so every run pays a real scan
    val corpus = synthVecs(spark, nVecs)
    val copies = synthVecs(spark, nCopies)
      .select((F.col("vec_id") + nVecs * 2).as("vec_id"),
        F.transform(F.col("embedding"), x => x * F.lit(2.0)).as("embedding"))
    corpus.unionAll(copies).write.mode("overwrite").parquet(s"$base/vecs")
    val vecs = spark.read.parquet(s"$base/vecs")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // survivors counted so the job runs end to end; copies-killed is the
    // recall pin (every planted copy must die at EVERY cluster count)
    def run(nc: Int): (Double, Long) = {
      val (dt, kept) = time {
        Similarity.semanticDedup(vecs, F.col("vec_id"), F.col("embedding"),
          threshold = 0.95, nClusters = nc, maxCellSize = 10000000L)
          .filter(F.col("vec_id") >= nVecs * 2).count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (dt, kept)
    }

    val clusterCounts = Seq(8, 32, 128, 512)
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val recalls = scala.collection.mutable.LinkedHashMap[String, Long]()
    run(clusterCounts.head) // process warm-up (JIT/codegen)
    for (nc <- clusterCounts) {
      val grid = (1 to runs).map(_ => run(nc))
      results(s"dedup_${nc}cells") = grid.map(_._1)
      recalls(s"copies_alive_${nc}cells") = grid.map(_._2).max
      System.err.println(s"[semstudy] $nc cells: " +
        grid.map(g => f"${g._1}%.2f").mkString(" ") +
        s" (copies alive: ${grid.map(_._2).max} of $nCopies planted)")
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val qs = results.map { case (k, v) => s""""$k":${med(v)}""" }.mkString(",")
    val qmin = results.map { case (k, v) => s""""$k":${v.min}""" }.mkString(",")
    val runsJ = results.map { case (k, v) =>
      s""""$k":[${v.mkString(",")}]""" }.mkString(",")
    val recJ = recalls.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val json = s"""{"metric":"semantic_dedup","unit":"sec","n_vecs":$nVecs,""" +
      s""""n_copies":$nCopies,"queries":{$qs},"queries_min":{$qmin},""" +
      s""""recall":{$recJ},"runs":{$runsJ},"n_runs":$runs}"""
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
