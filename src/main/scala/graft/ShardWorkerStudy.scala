package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Is [[graft.io.Shards.readShard]] — the worker-side read past
  * [[graft.io.Shards.readShards]]' measured ~14-20 ms/shard plan
  * envelope (scaling/shard_plan.json) — actually CONSTANT in the
  * layout's total shard count? (r14 verdict #7.)
  *
  * The claim: a distributed trainer assigns shard ids to workers and
  * each worker pays only its OWN shard's existence checks + LIST + plan,
  * so per-shard read cost must not grow with the number of sibling
  * `shard=N` directories. The study builds one REAL `writeShards` layout
  * at `baseShards`, then grows it to each target dir count by copying
  * shard dirs (byte-identical payload files under new `shard=N` names —
  * the read path cannot tell a copied dir from a written one; what is
  * measured is the filesystem/planning scaling, which is the claim), and
  * times `readShard` + a full consume of that one shard at every layout
  * size over a fixed cycle of shard ids.
  *
  * Usage: runMain graft.ShardWorkerStudy [dirCountsCsv] [rows] [probes] [out]
  * (defaults 1024,16384,131072 dirs × 100,000 rows × 9 probed shards.)
  */
object ShardWorkerStudy {
  def main(args: Array[String]): Unit = {
    val dirCounts = args.lift(0).getOrElse("1024,16384,131072")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val nRows = args.lift(1).map(_.toLong).getOrElse(100000L)
    val probes = args.lift(2).map(_.toInt).getOrElse(9)
    val out = args.lift(3)
    val baseShards = dirCounts.head
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

    val root = java.nio.file.Files
      .createTempDirectory("graft_shardworker").toString
    val dir = root + "/layout"
    val df = spark.range(nRows).select(F.col("id"),
      F.sha2(F.concat_ws("_", F.col("id")), 256).as("payload"))
    graft.io.Shards.writeShards(df, F.col("id"), baseShards, dir,
      salt = "s")
    val perShard = nRows / baseShards

    // grow the layout: shard dirs [grown, target) are copies of
    // shard (sid % baseShards) — parallel copy, bounded by I/O
    var grown = baseShards
    def growTo(target: Int): Unit = {
      val src = new java.io.File(dir)
      java.util.stream.IntStream.range(grown, target).parallel()
        .forEach { sid =>
          org.apache.commons.io.FileUtils.copyDirectory(
            new java.io.File(src, s"shard=${sid % baseShards}"),
            new java.io.File(src, s"shard=$sid"))
        }
      grown = target
    }

    val results = dirCounts.map { target =>
      val tGrow = time(growTo(target))
      // probe a fixed id cycle spread across the whole layout; each
      // probe = the full worker-side verb (guards + LIST + plan) plus a
      // consume of that one shard's rows
      val ids = (0 until probes).map(i =>
        (i.toLong * 2654435761L) % target)
      val times = ids.map { sid =>
        time {
          val c = graft.io.Shards.readShard(spark, dir, sid).count()
          // hash-split shard sizes are Binomial(n, 1/shards) — mean
          // ~perShard, sd ~sqrt(perShard); a [perShard/2, perShard*2]
          // band is ~5σ at this size and still catches a read that
          // lost most of a shard (the first cut's `|| c > 0` disjunct
          // made the check vacuous — r15 review)
          require(c >= perShard / 2 && c <= perShard * 2,
            s"shard $sid read $c rows, expected ~$perShard")
        }
      }
      System.err.println(f"[shardworker] dirs=$target%7d " +
        f"grow=$tGrow%.1fs readShard med=${med(times)}%.3fs " +
        f"min=${times.min}%.3fs max=${times.max}%.3fs")
      (target, tGrow, times)
    }
    // the claim, enforced: per-shard read cost must not bend with total
    // dir count (allow 2x headroom over the smallest layout's median
    // for fs-cache noise)
    val baseMed = med(results.head._3)
    results.foreach { case (n, _, ts) =>
      require(med(ts) <= math.max(2.0 * baseMed, baseMed + 0.25),
        f"readShard bent with dir count: ${med(ts)}%.3fs at $n dirs " +
          f"vs $baseMed%.3fs at ${results.head._1}")
    }
    val json = "{\"metric\":\"shard_worker\",\"unit\":\"sec\"," +
      s""""rows":$nRows,"base_shards":$baseShards,"probes":$probes,""" +
      s""""sizes":[""" +
      results.map { case (n, g, ts) =>
        s"""{"dirs":$n,"grow":$g,"read_med":${med(ts)},""" +
          s""""read_min":${ts.min},"read_max":${ts.max},""" +
          s""""runs_read":[${ts.mkString(",")}]}"""
      }.mkString(",") + "]}"
    println(json)
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
