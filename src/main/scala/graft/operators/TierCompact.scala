package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Size-tiered fold planning + crash-safe fold commit for the segmented
  * on-disk indexes (the MinHash index's `features`/`postings`, the IVF
  * index's `assigned`) — the LSM posture that makes in-line stream
  * compaction affordable at corpus scale (r16 verdict #1).
  *
  * Why: `compactMinhashIndex`/`compactIvfIndex` are FULL rewrites — they
  * read the whole table and rewrite `base`. Driven per-trigger by a 24/7
  * ingest stream (`compactEvery`), that is O(index) work per cadence —
  * cumulative O(T²/n) writes over the stream's lifetime, unusable once
  * the base outgrows the batches. The size-tiered shape caps that:
  * segments group into geometric size CLASSES (class =
  * ⌊log_fanout(bytes/64 KiB)⌋), and whenever a class holds ≥ `fanout`
  * members they fold into ONE tier segment (which lands in a higher
  * class). Each row is folded at most once per level and there are
  * O(log_fanout(corpus/batch)) levels, so total fold writes are
  * O(N·log N) and the per-trigger cost is amortized O(batch) — FLAT in
  * the base size, which is untouched until the accumulated tiers reach
  * `baseFoldRatio` of it (then one full fold pays O(index) at a cadence
  * that is itself geometric). Same economics as the lake's manifest LSM
  * ([[graft.io.Manifest]] `compactEvery` + retention) and every
  * size-tiered LSM store.
  *
  * This object owns the INDEX-AGNOSTIC parts: byte-size listing, the
  * fold plan, deterministic tier naming, and the intent-marker commit
  * protocol that makes a fold crash-recoverable:
  *
  *  1. stage the tier's table dirs COMPLETE (index-specific write),
  *  2. write an intent marker `__fold_<tier>` at the index root listing
  *     the source segments,
  *  3. rename the staged dirs to `table/seg=<tier>`,
  *  4. delete the source segments' dirs,
  *  5. delete the marker.
  *
  * Recovery ([[recover]], run at every compaction entry): a marker whose
  * tier dirs are ALL present rolls FORWARD (finish the source deletes);
  * anything else rolls BACK (drop the partial tier; sources are intact
  * because deletes only happen after every rename). Between steps 3 and
  * 5 a crash can leave a probe window where fold sources coexist with
  * their tier — DUPLICATE rows, not missing ones — which is
  * decision-identical for the ingest kill rule (MinHash verification
  * dedups losers; IVF k=1 top-cosine is unchanged by a duplicated
  * candidate) and healed by the next compaction entry; general k>1
  * search in that window can list one corpus row at two ranks, the same
  * fail-soft-until-healed trade every rename-aside swap here makes.
  * Tier names are a hash of the sorted source set, so a replayed fold
  * restages the SAME tier and stays idempotent. */
private[graft] object TierCompact {

  final case class Fold(sources: Seq[String], tier: String)

  /** What a tiered compaction did: zero or more tier folds (cascaded
    * until no size class was full), whether the base-ratio trigger
    * escalated to a full base fold, and any crashed-fold tiers healed
    * at entry. */
  final case class Report(folds: Seq[Fold], baseFolded: Boolean,
      healed: Seq[String])

  /** Smallest size class granule: segments under 64 KiB share class 0. */
  private val unitBytes = 64L << 10

  def tierName(sources: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h = md.digest(sources.sorted.mkString("|")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "tf" + h.take(6).map(b => f"$b%02x").mkString
  }

  def sizeClass(bytes: Long, fanout: Int): Int = {
    val r = math.max(bytes, 1L).toDouble / unitBytes
    math.max(0, (math.log(r) / math.log(fanout.toDouble)).toInt)
  }

  /** One planning round: every size class holding ≥ fanout members
    * becomes a fold group (all members — folding the whole class keeps
    * the level geometry tight). Callers loop until the plan is empty;
    * each round's tiers land in higher classes, so the loop terminates
    * in O(log) rounds. */
  def plan(bytes: Map[String, Long], fanout: Int): Seq[Fold] =
    bytes.groupBy { case (_, b) => sizeClass(b, fanout) }
      .toSeq.sortBy(_._1)
      .map(_._2.keys.toSeq.sorted)
      .filter(_.size >= fanout)
      .map(group => Fold(group, tierName(group)))

  /** Per-segment byte sizes of `tableDir`'s `seg=` partitions, from one
    * listing plus one content summary per segment — no data read. The
    * segment count is bounded by fanout × levels (the invariant this
    * whole mechanism maintains), so this stays a handful of RPCs. */
  def segmentBytes(fs: FileSystem, tableDir: Path,
      exclude: Set[String]): Map[String, Long] = {
    if (!fs.exists(tableDir)) return Map.empty
    fs.listStatus(tableDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
      .map(s => s.getPath.getName.stripPrefix("seg=") -> s.getPath)
      .filter { case (n, _) => !exclude.contains(n) }
      .map { case (n, p) => n -> fs.getContentSummary(p).getLength }
      .toMap
  }

  private def markerPath(root: Path, tier: String): Path =
    new Path(root, s"__fold_$tier")

  /** Step 2 of the protocol: persist the fold intent BEFORE any rename.
    * One small file, newline-separated source labels. */
  def writeMarker(fs: FileSystem, root: Path, fold: Fold): Unit = {
    val out = fs.create(markerPath(root, fold.tier), true)
    try out.write(fold.sources.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def deleteMarker(fs: FileSystem, root: Path, tier: String): Unit = {
    fs.delete(markerPath(root, tier), false)
    ()
  }

  /** Entry-time crash recovery over every `__fold_*` intent marker at
    * `root`: roll FORWARD (delete the listed sources, then the marker)
    * when the tier's dirs exist under every `table`, roll BACK (delete
    * the partial tier dirs, then the marker) otherwise — sources are
    * guaranteed intact in that case because the protocol deletes them
    * only after every rename landed. Returns the healed tier names. */
  def recover(fs: FileSystem, root: Path, tables: Seq[String])
      : Seq[String] = {
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => !s.isDirectory && s.getPath.getName.startsWith("__fold_"))
      .map { st =>
        val tier = st.getPath.getName.stripPrefix("__fold_")
        val sources = {
          val in = fs.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toList
          finally in.close()
        }
        val tierDirs = tables.map(t => new Path(root, s"$t/seg=$tier"))
        if (tierDirs.forall(fs.exists)) {
          // fold was fully renamed in — finish the deletes
          sources.foreach { s =>
            tables.foreach(t =>
              fs.delete(new Path(root, s"$t/seg=$s"), true))
          }
        } else {
          // partial fold — drop it; sources are still whole
          tierDirs.foreach(fs.delete(_, true))
        }
        // a crashed fold's stage dir would otherwise linger forever
        // (a different source set hashes to a different tier name, so
        // nothing re-stages over it)
        fs.delete(new Path(root, s"__tierstage_$tier"), true)
        fs.delete(st.getPath, false)
        tier
      }
  }

  /** Steps 3–5: commit a staged fold. `stagedTableDirs` maps table name
    * → the staged dir holding that table's tier content (already
    * COMPLETE). Any pre-existing tier dir (a crashed identical fold that
    * recovery rolled back between our staging and here — impossible
    * under the single-writer contract, but cheap to defend) is replaced. */
  def commitFold(fs: FileSystem, root: Path, fold: Fold,
      stagedTableDirs: Seq[(String, Path)]): Unit = {
    writeMarker(fs, root, fold)
    stagedTableDirs.foreach { case (table, staged) =>
      val dest = new Path(root, s"$table/seg=${fold.tier}")
      fs.delete(dest, true)
      fs.mkdirs(dest.getParent)
      require(fs.rename(staged, dest),
        s"tier fold: rename $staged -> $dest failed")
    }
    fold.sources.foreach { s =>
      stagedTableDirs.foreach { case (table, _) =>
        fs.delete(new Path(root, s"$table/seg=$s"), true)
      }
    }
    deleteMarker(fs, root, fold.tier)
  }
}
