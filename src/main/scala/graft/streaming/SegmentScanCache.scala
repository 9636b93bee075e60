package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Cross-trigger cache of an LSM index table's COMMITTED segment scans,
  * for the 24/7 ingest loops (r18, verdict #1): every micro-batch probe
  * previously re-listed and re-read the ENTIRE index table
  * (`spark.read.parquet(dir)` — file listing, schema inference, full
  * parquet scan) even though all but one segment is immutable between
  * folds. Here each `seg=<name>` partition directory is snapshotted ONCE
  * (`Dataset.localCheckpoint` via [[graft.Scratch.snapshotManaged]] —
  * executor blocks OUTSIDE the CacheManager, so the index appends'
  * `refreshByPath` can neither invalidate nor re-execute them: exactly
  * the hazard that made a CacheManager-based variant unsafe, r17) and
  * reused until its FILE IDENTITY (name/length/mtime of every data file
  * under the segment dir) changes:
  *
  *  - a new segment appears (last trigger's append)  → one new snapshot,
  *    O(batch);
  *  - a compaction fold rewrites/retires segments    → stale snapshots
  *    released by exact handle, the folded result snapshotted once,
  *    O(folded bytes) — the same cost the fold itself just paid;
  *  - everything else (the BASE segment in particular) → zero listing,
  *    zero read, zero planning per trigger.
  *
  * The in-flight segment is excluded BY NAME (a crashed attempt's
  * partial directory must never enter the probe — the caller's replay
  * exclusion contract). Segment values never need unescaping: both index
  * writers REQUIRE filesystem-safe labels.
  *
  * Fallback posture: any unexpected layout (no `seg=` children, foreign
  * entries) yields None and the caller keeps the plain per-trigger read
  * — the cache is an optimization, never a semantics change. Close()
  * releases every snapshot by its exact RDD handle (never a session
  * sweep); the owning stream calls it when the run ends. */
private[graft] final class SegmentScanCache(spark: SparkSession,
    tableDir: String) {

  // insertion order is irrelevant: frames are unioned in sorted segment
  // order for a deterministic plan
  private val entries =
    scala.collection.mutable.HashMap[String, SegmentScanCache.Entry]()

  private val root = new org.apache.hadoop.fs.Path(tableDir)
  private def fileSystem = root.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** (segment name, file-identity key) for every committed `seg=` child;
    * None when the table dir is missing or holds anything unexpected. */
  private def segsOnDisk(): Option[Seq[(String, String)]] = {
    val fs = fileSystem
    if (!fs.exists(root)) return None
    val children = fs.listStatus(root).toSeq
      .filter(st => !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    if (children.exists(st => !st.isDirectory ||
        !st.getPath.getName.startsWith("seg="))) return None
    Some(children.map { st =>
      val name = st.getPath.getName.stripPrefix("seg=")
      val files = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(st.getPath, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          files += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
      }
      (name, files.sorted.mkString(";"))
    })
  }

  /** The table's committed rows as a union of per-segment snapshots —
    * row-identical to `spark.read.parquet(tableDir)` minus the excluded
    * segment (the `seg` column re-attached per frame, nested partition
    * levels like `band=`/`cell=` discovered by the per-segment read as
    * usual). None ⇒ caller falls back to the plain read. */
  def frame(excludeSegment: Option[String]): Option[DataFrame] =
    segsOnDisk().flatMap { all =>
      val live = all.filterNot { case (n, _) => excludeSegment.contains(n) }
      // release entries whose segment vanished (folded/retired) or whose
      // files changed (a replayed batch re-wrote its own segment)
      val liveKeys = live.toMap
      val stale = entries.keys.filter(n =>
        !liveKeys.get(n).contains(entries(n).key)).toSeq
      stale.foreach { n => entries.remove(n).foreach(_.release()); () }
      live.sortBy(_._1).map { case (name, key) =>
        entries.getOrElseUpdate(name, {
          val (ck, release) = graft.Scratch.snapshotManaged(
            spark.read.parquet(s"$tableDir/seg=$name")
              .withColumn("seg", F.lit(name)))
          SegmentScanCache.Entry(key, ck, release)
        }).df
      }.reduceOption(_.unionByName(_))
    }

  /** Release every snapshot by exact handle. Idempotent. */
  def close(): Unit = {
    entries.values.foreach(_.release())
    entries.clear()
  }
}

private[graft] object SegmentScanCache {
  private final case class Entry(key: String, df: DataFrame,
    release: () => Unit)
}
