package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Where does [[graft.operators.Embeddings.fitPca]]'s envelope actually
  * sit? The fit ships one (1 + d + d(d+1)/2)-double moments buffer per
  * map task and eigensolves a d×d covariance driver-side — costs that
  * are invisible at the testdata embedding width but are the whole
  * story at transformer-embedding widths (768/1024+). This study pins
  * both curves so the documented `maxDim = 2048` default is a measured
  * bound, not an asserted one: per d it times (a) the full distributed
  * fit over a deterministic synthetic corpus (planted dominant
  * direction + hash noise — the EmbeddingsSpec fixture shape, generated
  * in-plan so no testdata dependency) and (b) BOTH driver eigensolvers
  * alone on a deterministic symmetric matrix — the original cyclic
  * Jacobi (which this study caught hitting a cache wall: 178 s at
  * d = 1024, 28× from 512 instead of d³'s 8×) and the tred2/tql2
  * replacement fitPca now uses — and reports the per-task buffer size.
  *
  * Usage: runMain graft.PcaDimStudy [dimsCsv] [rows] [runs] [out]
  * (defaults 256,512,1024 × 20000 rows × 3 runs.)
  */
object PcaDimStudy {
  def main(args: Array[String]): Unit = {
    val dims = args.lift(0).getOrElse("256,512,1024")
      .split(",").map(_.trim.toInt).toSeq
    val nRows = args.lift(1).map(_.toLong).getOrElse(20000L)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val out = args.lift(3)
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

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val results = dims.map { d =>
      // deterministic in-plan corpus: unit hash-noise plus a planted
      // direction on coordinate 0 so the spectrum is anisotropic (the
      // fixture shape EmbeddingsSpec pins correctness on)
      val df = spark.range(nRows).select(F.col("id"),
          F.transform(F.sequence(F.lit(0), F.lit(d - 1)), i =>
            F.hash(F.col("id"), i).cast("double") / 2.147483647e9 +
              F.when(i === 0,
                (F.col("id") % 7 - 3).cast("double")).otherwise(0.0))
            .as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize: time the FIT, not the generator
      // the exact fit stops at its measured envelope (maxDim = 2048 —
      // the full-covariance buffer is 67 MB/task at 4096 and the dense
      // solve ~8-9× the 13.1 s d = 2048 point); the randomized top-k
      // fit is the algorithm FOR that regime, timed at every d
      val tFit = if (d <= 2048) (1 to runs).map { _ =>
        time(graft.operators.Embeddings.fitPca(df, F.col("v"), k = 16,
          maxDim = 2048))
      } else Seq(-1.0)
      val tRand = (1 to runs).map { _ =>
        time(graft.operators.Embeddings.fitPcaTopK(df, F.col("v"),
          k = 16))
      }
      df.unpersist(true)
      // driver eigensolve alone on a deterministic symmetric d×d (B·Bᵀ
      // over hash noise): the O(d³) share of the fit, isolated — BOTH
      // solvers, so the artifact carries the jacobi→tred2/tql2 delta
      // (the r13 fix: Jacobi hit a cache wall at transformer widths,
      // 178 s at d = 1024; QL's tridiagonal working set doesn't)
      val b = Array.tabulate(d, d)((i, j) =>
        (((i.toLong * 2654435761L + j * 1315423911L) & 0xffffL).toDouble /
          65536.0) - 0.5)
      val a = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(l => b(i)(l) * b(j)(l)).sum / d)
      // Jacobi is skipped past d = 1024: its measured cache-wall curve
      // (28-31x per doubling) puts d = 2048 at ~25 min — the point of
      // the comparison is made well before that. The full dense solve is
      // likewise skipped past 2048 (the exact fit's envelope).
      val tJac = if (d <= 1024)
        time(graft.operators.Embeddings.jacobiEigen(a.map(_.clone())))
      else -1.0
      val tSym = if (d <= 2048)
        time(graft.operators.Embeddings.symEigen(a.map(_.clone())))
      else -1.0
      val bufMb = (1L + d + d.toLong * (d + 1) / 2) * 8 / 1048576.0
      val bufRandMb = (1L + d + d.toLong * 24) * 8 / 1048576.0 // m = k+8
      System.err.println(f"[pcadim] d=$d%5d n=$nRows " +
        f"fit=${med(tFit)}%.2fs (min ${tFit.min}%.2f) " +
        f"rand=${med(tRand)}%.2fs (min ${tRand.min}%.2f) " +
        f"jacobi=$tJac%.2fs symql=$tSym%.2fs " +
        f"buffer=$bufMb%.1fMB bufferRand=$bufRandMb%.2fMB")
      (d, tFit, tRand, tJac, tSym, bufMb, bufRandMb)
    }
    val json = "{\"metric\":\"pca_dim\",\"unit\":\"sec\"," +
      s""""rows":$nRows,"k":16,"sizes":[""" +
      results.map { case (d, f, rnd, j, sy, mb, rmb) =>
        s"""{"dim":$d,"fit_med":${med(f)},"fit_min":${f.min},""" +
          s""""rand_med":${med(rnd)},"rand_min":${rnd.min},""" +
          s""""jacobi":$j,"symql":$sy,"buffer_mb":$mb,""" +
          s""""buffer_rand_mb":$rmb,""" +
          s""""runs_fit":[${f.mkString(",")}],""" +
          s""""runs_rand":[${rnd.mkString(",")}]}"""
      }.mkString(",") + s"],\"n_runs\":$runs}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
