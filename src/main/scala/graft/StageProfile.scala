package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-stage profiler (builder tooling, not driver contract): runs
  * one SparkEntry query N times and prints every completed stage's task
  * count, wall span, and total executor run/CPU time — the discriminator
  * for "same plan, bimodal wall-clock" investigations where thread dumps
  * show parked executors. `runMain graft.StageProfile <query> <sfDir> [n]`. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // reference semantics: nil/infinity, not runtime aborts (GraftSession)
      .config("spark.sql.legacy.sizeOfNull", "false") // size(null) stays null, not legacy -1
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val span = (for {
          s <- i.submissionTime; e <- i.completionTime
        } yield (e - s) / 1000.0).getOrElse(-1.0)
        val run = i.taskMetrics.executorRunTime / 1000.0
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        val shw = i.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        val shr = i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
        stages.add(
          f"    stage ${i.stageId}%4d tasks=${i.numTasks}%4d span=$span%7.2fs " +
          f"run=$run%8.2fs cpu=$cpu%8.2fs shW=$shw%7.1fMB shR=$shr%7.1fMB " +
          i.name.takeWhile(_ != '\n'))
      }
    })
    val fn = SparkEntry.queries(query)
    for (r <- 1 to n) {
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(500) // let stage-completed events drain
      println(f"run $r: $dt%.2f s")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
