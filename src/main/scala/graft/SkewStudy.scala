package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Skew-handling study (scale tooling next to [[StageProfile]]): measures
  * a shuffled equi join under a degenerate hot key three ways —
  *
  *  (a) sort-merge join with AQE skew-join OFF — the naive baseline: the
  *      hot key's shuffle partition serializes on ONE task, the exact
  *      failure mode a 100 TB join with a celebrity key hits;
  *  (b) AQE skew-join ON ([[GraftSession]]'s default posture): the
  *      runtime splits the oversized partition into advisory-sized
  *      chunks, each joined against a replicated copy of the other
  *      side's matching partition;
  *  (c) [[Joins.saltedJoin]] — the explicit plan-level fix: left rows
  *      scatter over `buckets` salt values, the right side replicates
  *      ×buckets; works on any engine, and is the shape that ALSO fixes
  *      skewed aggregations (AQE skew-join only covers joins).
  *
  * Broadcast is disabled throughout: a broadcastable dim makes skew moot
  * (and the library broadcasts small dims by default — this study is the
  * large-dim case). AQE's skew trigger thresholds are lowered to fire at
  * harness scale (locally the hot partition is ~100 MB; the default
  * 256 MB threshold targets production sizes — at 100 TB the SAME plans
  * trigger on defaults).
  *
  * Fixture: `nFact` fact rows with `hotFrac` of them on ONE key and the
  * rest uniform over `nKeys`; dim = one row per key, with a payload wide
  * enough that sorting the hot partition is real work. Output: one JSON
  * line of medians/minima per variant (append to scaling/, cite in
  * SCALING.md).
  *
  * Usage: runMain graft.SkewStudy [nFact] [nKeys] [hotFrac] [runs] [out]
  */
object SkewStudy {
  def main(args: Array[String]): Unit = {
    val nFact = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nKeys = args.lift(1).map(_.toLong).getOrElse(100000L)
    val hotFrac = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val runs = args.lift(3).map(_.toInt).getOrElse(5)
    val out = args.lift(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // reference semantics: nil/infinity, not runtime aborts (GraftSession)
      .config("spark.sql.legacy.sizeOfNull", "false") // size(null) stays null, not legacy -1
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture on disk so every variant pays a real scan, not a cached range
    val base = java.nio.file.Files.createTempDirectory("graft_skew").toString
    spark.range(nFact)
      .select(
        F.when(F.rand(7) < hotFrac, F.lit(0L))
          .otherwise(F.pmod(F.xxhash64(F.col("id")), F.lit(nKeys)))
          .as("key"),
        F.col("id").as("fact_id"),
        F.concat(F.lit("p" * 96), F.col("id")).as("payload"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(nKeys)
      .select(F.col("id").as("key"), (F.col("id") * 3).as("attr"))
      .write.mode("overwrite").parquet(s"$base/dim")

    def fact = spark.read.parquet(s"$base/fact")
    def dim = spark.read.parquet(s"$base/dim")

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    // large-dim posture: no broadcast anywhere in the study
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def evalJoin(df: DataFrame): Unit =
      df.selectExpr("sum(attr)", "sum(length(payload))", "count(*)")
        .collect()

    def time(label: String)(mk: => DataFrame): Vector[Double] =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        evalJoin(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[skew] $label%-12s $dt%.2f s")
        dt
      }.toVector

    val grid = collection.mutable.LinkedHashMap.empty[String, Vector[Double]]

    // (a) naive: one task owns the hot key's partition
    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    grid("smj_noskew") = time("smj_noskew")(fact.join(dim, "key"))

    // (b) AQE skew-join: thresholds scaled to the harness fixture (the
    // default 256 MB trigger targets production partition sizes)
    conf("spark.sql.adaptive.skewJoin.enabled", "true")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    grid("aqe_skew") = time("aqe_skew")(fact.join(dim, "key"))

    // (c) explicit salting (buckets ≈ cores so the hot key fans the grid)
    // — with AQE skew-join OFF and the advisory size restored, so the
    // number isolates the salting mechanism rather than salting PLUS the
    // lowered-threshold AQE splits of variant (b)
    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    grid("salted") = time("salted")(
      Joins.saltedJoin(Gdf(fact), Gdf(dim), Seq("key" -> "key"),
        buckets = cpus.toInt).sdf)

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val json = grid.map { case (k, xs) =>
      s""""$k":{"median":${median(xs)},"min":${xs.min},"runs":[${xs.mkString(",")}]}"""
    }.mkString(
      s"""{"n_fact":$nFact,"n_keys":$nKeys,"hot_frac":$hotFrac,"cpus":$cpus,""",
      ",", "}")
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json))
    spark.stop()
    println(json)
  }
}
