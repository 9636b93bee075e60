package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import graft.operators.Dedup

/** Ad-hoc stage profiler for the dedup operators (not part of the driver
  * contract; run with `runMain graft.Profile <sfdir>`). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // reference semantics: nil/infinity, not runtime aborts (GraftSession)
      .config("spark.sql.legacy.sizeOfNull", "false") // size(null) stays null, not legacy -1
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    timed("docs count")(docs.count())
    val withSh = docs.select(F.col("doc_id").as("id"),
      Dedup.shingleHashes(F.col("text"), 3).as("sh"))
    timed("shingling only")(
      withSh.select(F.sum(F.size(F.col("sh")))).collect())
    val postings = withSh.select(F.col("id"), F.explode(F.col("sh")).as("g"))
    timed("postings count")(println("  postings=" + postings.count()))
    val rare = postings.groupBy("g")
      .agg(F.sort_array(F.collect_list("id")).as("ids"))
      .filter(F.size(F.col("ids")).between(2, 20))
    timed("rare buckets")(println("  buckets=" + rare.count()))
    timed("pair count")(println("  pairs=" + rare.select(
      F.sum(F.size(F.col("ids")) * (F.size(F.col("ids")) - 1) / 2)).collect()
      .apply(0).get(0)))
    timed("d07 full") {
      println("  confirmed=" + Dedup.ngramJaccardPairs(docs,
        F.col("doc_id"), F.col("text"), 3, 0.8).count())
    }

    val sig = Dedup.minhashFromHashes(
      Dedup.shingleHashes(F.col("text"), 3), 64)
    timed("minhash signatures")(
      docs.select(F.avg(F.element_at(sig, 1))).collect())
    timed("minhash lsh candidates")(
      println("  cands=" + Dedup.minhashLshCandidates(docs,
        F.col("doc_id"), F.col("text"), 3, 64, 8).count()))
    timed("d05 full")(
      println("  pairs=" + Dedup.minhashDuplicatePairs(docs,
        F.col("doc_id"), F.col("text"), 0.8, 3, 64, 8).count()))
    timed("d01 exact")(
      println("  kept=" + Dedup.exact(docs, F.col("text"), F.col("doc_id"))
        .count()))
    timed("d01 as-bench") {
      Gdf(Dedup.exact(docs, F.col("text"), F.col("doc_id")))
        .select("doc_id", "n_chars")
        .sortBy(Seq(F.col("doc_id")))
        .sdf.write.mode("overwrite").format("noop").save()
    }
    // q14 variants: fused agg (Expand from count_distinct) vs split + join
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    timed("q14 fused (expand)") {
      li.groupBy("l_returnflag").agg(
        F.round(F.var_samp(F.col("l_quantity")), 6).as("var_qty"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 6).as("med"),
        F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.9)), 4).as("q90"),
        F.count_distinct(F.col("l_partkey")).as("nd"))
        .write.mode("overwrite").format("noop").save()
    }
    timed("q14 split+join") {
      val a = li.groupBy("l_returnflag").agg(
        F.round(F.var_samp(F.col("l_quantity")), 6).as("var_qty"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 6).as("med"),
        F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.9)), 4).as("q90"))
      val b = li.groupBy("l_returnflag")
        .agg(F.count_distinct(F.col("l_partkey")).as("nd"))
      a.join(b, Seq("l_returnflag"))
        .write.mode("overwrite").format("noop").save()
    }
    val q = SparkEntry.queries("d01_exact_dedup")(spark, sfDir)
    timed("d01 via SparkEntry") {
      q.write.mode("overwrite").format("noop").save()
    }
    println(q.queryExecution.executedPlan.toString.linesIterator
      .take(25).mkString("\n"))
    spark.stop()
  }
}
