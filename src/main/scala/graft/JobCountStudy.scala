package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts driver-scheduled Spark jobs (and wall time) for one SparkEntry
  * query — the discriminator for per-micro-batch driver-floor work
  * (validation aggregates, manifest bookkeeping) that per-stage timings
  * hide. `runMain graft.JobCountStudy <query> [sfDir] [runs]`.
  * `SPARK_GRAFT_JOB_VERBOSE=1` additionally prints, for the LAST run,
  * every job's wall span and driver call site, grouped — the map from
  * "N jobs" to "N jobs from WHERE". */
object JobCountStudy {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val verbose = sys.env.contains("SPARK_GRAFT_JOB_VERBOSE")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // (jobId, callSite, submitMs) and (jobId, endMs) from the listener bus
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val ends = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          starts.put(j.jobId, (site, j.time)); ()
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (verbose) { ends.put(j.jobId, j.time); () }
    })
    val fn = SparkEntry.queries(query)
    for (r <- 1 to n) {
      jobs.set(0); starts.clear(); ends.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(300) // drain listener events
      println(f"run $r: jobs=${jobs.get()} wall=$dt%.2fs")
      if (verbose && r == n) {
        import scala.jdk.CollectionConverters._
        val rows = starts.asScala.toSeq.map { case (id, (site, t0j)) =>
          val span = ends.asScala.get(id).map(e => (e - t0j) / 1000.0)
          (id, site, span.getOrElse(-1.0))
        }.sortBy(_._1)
        rows.foreach { case (id, site, span) =>
          println(f"  job $id%4d $span%7.3fs  $site") }
        println("  --- by call site ---")
        rows.groupBy(_._2).toSeq
          .map { case (site, rs) => (site, rs.size, rs.map(_._3).sum) }
          .sortBy(-_._3)
          .foreach { case (site, cnt, tot) =>
            println(f"  $cnt%4d jobs $tot%7.3fs  $site") }
      }
    }
    spark.stop()
  }
}
