package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Where does [[graft.io.Shards.readShards]]'s O(numShards) union plan
  * actually bend? The helper builds one explicit-file scan per shard and
  * unions them, so the DRIVER pays per-shard plan-construction +
  * analysis cost that is invisible at the testdata shard counts (16) but
  * is the whole story for a 100 TB export at production shard counts
  * (one shard ≈ 100 MB–1 GB ⇒ 100k–1M shards at 100 TB). The doc said
  * "fine into the thousands" — this study makes that a measured
  * envelope, r13-verdict-#6 style: per shard count it times (a) the
  * writeShards export, (b) readShards PLAN construction alone (the
  * driver-side union build + one forced executedPlan resolution — zero
  * data read), and (c) a full consume (count of every row through the
  * per-shard one-task scans).
  *
  * Usage: runMain graft.ShardPlanStudy [shardsCsv] [rows] [runs] [out]
  * (defaults 64,256,1024,4096 × 1,000,000 rows × 3 runs.)
  */
object ShardPlanStudy {
  def main(args: Array[String]): Unit = {
    val shardCounts = args.lift(0).getOrElse("64,256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    val nRows = args.lift(1).map(_.toLong).getOrElse(1000000L)
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

    val df = spark.range(nRows).select(F.col("id"),
      F.sha2(F.concat_ws("_", F.col("id")), 256).as("payload"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    val results = shardCounts.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_shards_$n").toString + "/layout"
      val tWrite = time(graft.io.Shards.writeShards(df, F.col("id"), n,
        dir, salt = "s"))
      // plan cost alone: build the union + force analysis/optimization/
      // physical planning via executedPlan — no job runs
      val tPlan = (1 to runs).map { _ =>
        time {
          val r = graft.io.Shards.readShards(spark, dir)
          r.queryExecution.executedPlan
        }
      }
      val tConsume = (1 to runs).map { _ =>
        time {
          val c = graft.io.Shards.readShards(spark, dir).count()
          require(c == nRows, s"lost rows: $c != $nRows")
        }
      }
      System.err.println(f"[shardplan] shards=$n%5d write=$tWrite%.2fs " +
        f"plan=${med(tPlan)}%.3fs (${med(tPlan) / n * 1000}%.3f ms/shard) " +
        f"consume=${med(tConsume)}%.2fs")
      // drop the synthesized layout (same tmpdir hygiene as
      // ManifestFoldStudy, r14 ADVICE #4)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
      (n, tWrite, tPlan, tConsume)
    }
    val json = "{\"metric\":\"shard_plan\",\"unit\":\"sec\"," +
      s""""rows":$nRows,"sizes":[""" +
      results.map { case (n, w, p, c) =>
        s"""{"shards":$n,"write":$w,"plan_med":${med(p)},""" +
          s""""plan_min":${p.min},"consume_med":${med(c)},""" +
          s""""consume_min":${c.min},""" +
          s""""runs_plan":[${p.mkString(",")}],""" +
          s""""runs_consume":[${c.mkString(",")}]}"""
      }.mkString(",") + s"],\"n_runs\":$runs}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
