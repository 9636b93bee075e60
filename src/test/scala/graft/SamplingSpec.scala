package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.{Dedup, Sampling}

/** Deterministic sampling / splitting / mixture + cross-corpus dedup. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, sticky, and near the declared fractions") {
    val d = (0L until 5000L).toDF("id")
    val s1 = Sampling.hashSplit(d, F.col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000L)
    // binomial(5000, 0.8) is within ±3σ ≈ ±85 of 4000 essentially always
    assert(math.abs(counts("train") - 4000L) < 150,
      s"train count ${counts("train")} too far from 4000")
    assert(math.abs(counts("val") - 500L) < 100)
    assert(math.abs(counts("test") - 500L) < 100)
    // sticky: the same key maps to the same split regardless of the rest
    // of the corpus (subset re-run agrees row-for-row)
    val sub = Sampling.hashSplit(
      (0L until 100L).toDF("id"), F.col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    val full = s1.filter(F.col("id") < 100)
    assert(sub.except(full).isEmpty && full.except(sub).isEmpty)
    // salt changes the assignment
    val s2 = Sampling.hashSplit(d, F.col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "other")
    assert(s1.join(s2, Seq("id"))
      .filter(s1("split") =!= s2("split")).count() > 0)
  }

  test("hash operators fail loud on a null key (previously three " +
      "DIFFERENT silent paths: last split label, dropped from sample, " +
      "first in topK)") {
    val d = Seq(Some("k1"), None).toDF("k")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Throwable] {
      Sampling.hashSplit(d, F.col("k"),
        Seq("train" -> 0.8, "test" -> 0.2)).collect()
    }
    assert(msgs(e1).exists(_.contains("null")), msgs(e1))
    val e2 = intercept[Throwable] {
      Sampling.topKByHash(d.withColumn("dom", F.lit("a")), F.col("dom"),
        F.col("k"), k = 1).collect()
    }
    assert(msgs(e2).exists(_.contains("null")), msgs(e2))
    // non-null keys unaffected
    assert(Sampling.hashSplit(d.filter(F.col("k").isNotNull), F.col("k"),
      Seq("train" -> 1.0)).count() == 1)
  }

  test("hashSplit: single label and weight normalization") {
    val d = (0L until 50L).toDF("id")
    val one = Sampling.hashSplit(d, F.col("id"), Seq("all" -> 1.0))
    assert(one.filter(F.col("split") === "all").count() == 50)
    // weights 8/1/1 ≡ 0.8/0.1/0.1 (normalized)
    val a = Sampling.hashSplit(d, F.col("id"),
      Seq("x" -> 8.0, "y" -> 1.0, "z" -> 1.0), salt = "n")
    val b = Sampling.hashSplit(d, F.col("id"),
      Seq("x" -> 0.8, "y" -> 0.1, "z" -> 0.1), salt = "n")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("sampleByHash: monotone in fraction, deterministic") {
    val d = (0L until 2000L).toDF("id")
    val s30 = Sampling.sampleByHash(d, F.col("id"), 0.3, "z")
    val s50 = Sampling.sampleByHash(d, F.col("id"), 0.5, "z")
    assert(s30.except(s50).isEmpty, "sample(0.3) must be a subset of sample(0.5)")
    assert(math.abs(s50.count() - 1000L) < 150)
    assert(Sampling.sampleByHash(d, F.col("id"), 1.0, "z").count() == 2000)
    assert(Sampling.sampleByHash(d, F.col("id"), 0.0, "z").count() == 0)
    // the fraction=1.0 no-op still enforces the null-key contract
    val withNull = d.withColumn("id",
      F.when(F.col("id") === 7L, F.lit(null)).otherwise(F.col("id")))
    intercept[Exception] {
      Sampling.sampleByHash(withNull, F.col("id"), 1.0, "z").count()
    }
  }

  test("sampleToBudget: per-domain budgets honored with one-bucket overshoot") {
    val d = (0L until 600L).map(i => (i, s"dom${i % 3}", 10L))
      .toDF("id", "dom", "tok")
    val budgets = Map("dom0" -> 500L, "dom1" -> 250L) // dom2 absent → dropped
    val out = Sampling.sampleToBudget(d, F.col("dom"), F.col("id"),
      F.col("tok"), budgets, salt = "b")
    val perDom = out.groupBy("dom").agg(F.sum("tok").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!perDom.contains("dom2"), "unbudgeted domain must be dropped")
    // admission is bucket-granular: overshoot bounded by one bucket's
    // tokens (here every bucket is one 10-token doc, so ≤ budget + 10)
    assert(perDom("dom0") <= 510 && perDom("dom0") >= 500)
    assert(perDom("dom1") <= 260 && perDom("dom1") >= 250)
    // deterministic
    val again = Sampling.sampleToBudget(d, F.col("dom"), F.col("id"),
      F.col("tok"), budgets, salt = "b")
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("mixture: budget split by normalized weights") {
    val d = (0L until 400L).map(i => (i, s"dom${i % 2}", 5L))
      .toDF("id", "dom", "tok")
    val out = Sampling.mixture(d, F.col("dom"), F.col("id"), F.col("tok"),
      Map("dom0" -> 3.0, "dom1" -> 1.0), totalBudget = 400L, salt = "mx")
    val perDom = out.groupBy("dom").agg(F.sum("tok").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dom0 gets 300, dom1 gets 100; one-bucket (5-token) overshoot allowed
    assert(perDom("dom0") >= 300 && perDom("dom0") <= 305)
    assert(perDom("dom1") >= 100 && perDom("dom1") <= 105)
    // a negative weight would shrink the normalizer and inflate every
    // other domain's budget past totalBudget — refused loudly
    intercept[IllegalArgumentException] {
      Sampling.mixture(d, F.col("dom"), F.col("id"), F.col("tok"),
        Map("dom0" -> 1.0, "dom1" -> -0.5), totalBudget = 400L)
    }
  }

  test("dedupAgainstExact drops only reference-matching keys") {
    val batch = Seq((1L, "keep me"), (2L, "drop me"), (3L, "also keep"))
      .toDF("id", "t")
    val ref = Seq((10L, "drop me"), (11L, "unrelated")).toDF("rid", "rt")
    val out = Dedup.dedupAgainstExact(batch, F.col("t"), ref, F.col("rt"))
    assert(col1[Long](out.orderBy("id"), "id") == Seq(1L, 3L))
  }

  test("dedupAgainstNear drops near-dups of the reference, keeps batch dups") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the distant purple mountains"
    val nearRef = base.replace("slowly", "quickly")
    val other = "completely unrelated text about database query optimization " +
      "and distributed systems running on large compute clusters"
    // batch: 1 near-dups the reference; 2 and 3 duplicate EACH OTHER but
    // not the reference (must both survive — within-batch dedup is
    // dedupNear's job); 4 is unrelated
    val batch = Seq((1L, nearRef), (2L, other), (3L, other),
      (4L, "short interlude about cooking pasta properly al dente tonight"))
      .toDF("id", "text")
    val ref = Seq((7L, base)).toDF("rid", "rtext")
    val out = Dedup.dedupAgainstNear(batch, F.col("id"), F.col("text"),
      ref, F.col("rid"), F.col("rtext"),
      threshold = 0.5, shingleSize = 3, numHashes = 64, bands = 16)
    assert(col1[Long](out.orderBy("id"), "id") == Seq(2L, 3L, 4L))
  }

  test("minhash disk index: round trip agrees with the live cross-corpus " +
      "path, keeps singleton buckets, and probeBands prunes partitions") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the distant purple mountains"
    val other = "completely unrelated text about database query optimization " +
      "and distributed systems running on large compute clusters"
    // ref: two mutually-unrelated docs — every index bucket is a SINGLETON,
    // so the index MUST store size-1 buckets (minSize=1) or nothing could
    // ever match it
    val ref = Seq((10L, base), (11L, other)).toDF("rid", "rtext")
    // batch: 1 near-dups ref#10; 2/3 duplicate EACH OTHER only (both must
    // survive — within-batch dedup is dedupNear's job); 4 unrelated
    val pasta = "short interlude about cooking pasta properly al dente tonight"
    val batch = Seq((1L, base.replace("slowly", "quickly")),
      (2L, pasta), (3L, pasta),
      (4L, "entirely different musings on mountain weather and hiking gear"))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh").toString
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    val out = Dedup.dedupAgainstIndex(batch, F.col("id"), F.col("text"),
      dir, threshold = 0.5)
    assert(col1[Long](out.orderBy("id"), "id") == Seq(2L, 3L, 4L))
    // identical decision rule as the live (re-scan) path on the same data
    val live = Dedup.dedupAgainstNear(batch, F.col("id"), F.col("text"),
      ref, F.col("rid"), F.col("rtext"),
      threshold = 0.5, shingleSize = 3, numHashes = 64, bands = 16)
    assert(col1[Long](out.orderBy("id"), "id") ==
      col1[Long](live.orderBy("id"), "id"))
    // probeBands: an identical copy collides in EVERY band, so probing 2
    // of 16 still catches it — and the postings scan must prune to those
    // bands' partitions
    val copyBatch = Seq((20L, base), (21L, pasta)).toDF("id", "text")
    val pruned = Dedup.dedupAgainstIndex(copyBatch, F.col("id"),
      F.col("text"), dir, threshold = 0.9, probeBands = Some(2))
    assert(col1[Long](pruned.orderBy("id"), "id") == Seq(21L))
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("band"),
      s"probeBands not pushed to partition pruning:\n$plan")
    // self-describing: a reader never re-supplies build params; a missing
    // index fails loudly
    intercept[Exception] {
      Dedup.dedupAgainstIndex(batch, F.col("id"), F.col("text"),
        dir + "/nope", threshold = 0.5).collect()
    }
  }

  test("minhash disk index: rebuild on an existing layout is staged + " +
      "atomic — probe equals a fresh build at the NEW params, no " +
      "staging/move-aside leftovers") {
    val a = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the distant purple mountains"
    val b = "completely unrelated text about database query optimization " +
      "and distributed systems running on large compute clusters"
    val ref = Seq((10L, a), (11L, b)).toDF("rid", "rtext")
    val root = java.nio.file.Files.createTempDirectory("graft_mhrb")
      .toString
    val dir = root + "/idx"
    val fresh = root + "/fresh"
    // v1 at 16 bands over doc 10 only; rebuild IN PLACE on both docs at
    // 8 bands — changed corpus AND banding. A table-by-table overwrite
    // crash between postings and meta would leave 8-band postings probed
    // with 16-band hashes: a disjoint bucket space, silent pass-through
    Dedup.writeMinhashIndex(ref.filter(F.col("rid") === 10L),
      F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 8)
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), fresh,
      shingleSize = 3, numHashes = 64, bands = 8)
    val batch = Seq((1L, a.replace("slowly", "quickly")), (2L, b),
      (3L, "entirely different musings on mountain weather and gear"))
      .toDF("id", "text")
    def probe(p: String) = col1[Long](Dedup.dedupAgainstIndex(batch,
      F.col("id"), F.col("text"), p, threshold = 0.5).orderBy("id"), "id")
    assert(probe(dir) == probe(fresh))
    assert(probe(dir) == Seq(3L)) // both near-dups killed by the rebuilt index
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left == Set("features", "postings", "meta"), left.toString)
  }

  test("minhash disk index: a crashed rebuild's stage/aside leftovers " +
      "(which hold a features table) are recognized as our own and " +
      "cleared on retry; genuinely foreign data still refuses") {
    val a = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the distant purple mountains"
    val ref = Seq((1L, a)).toDF("rid", "rtext")
    val root = java.nio.file.Files.createTempDirectory("graft_mhcrash")
      .toString
    val dir = root + "/idx"
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    // crashed-rebuild simulation: a COMPLETE minhash layout (features +
    // postings + meta) left at the sibling stage dir — r14 ADVICE: the
    // known-table set omitted `features`, so this read as "foreign
    // data" and the documented crash-retry refused instead of recovering
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dir), new java.io.File(root + "/idx__rebuild"))
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 8)
    assert(!new java.io.File(root + "/idx__rebuild").exists())
    // same for a crashed swap's move-aside leftover
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dir), new java.io.File(root + "/idx__old"))
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    assert(!new java.io.File(root + "/idx__old").exists())
    // the rebuilt index is live end-to-end
    assert(Dedup.dedupAgainstIndex(Seq((2L, a)).toDF("id", "text"),
      F.col("id"), F.col("text"), dir, threshold = 0.9).count() == 0)
    // a user's unrelated directory at the stage name still refuses loudly
    val foreign = new java.io.File(root + "/idx__rebuild/my_data")
    assert(foreign.mkdirs())
    val e = intercept[IllegalArgumentException] {
      Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
        shingleSize = 3, numHashes = 64, bands = 8)
    }
    assert(e.getMessage.contains("my_data"), e.getMessage)
  }

  test("minhash disk index: the per-path meta cache re-reads a REGENERATED " +
      "index (file-identity key — a raw path key would serve stale build " +
      "params)") {
    val a = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sun sets slowly behind the distant purple mountains"
    val ref = Seq((1L, a)).toDF("rid", "rtext")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhmeta").toString
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16)
    val batch = Seq((2L, a)).toDF("id", "text")
    // populate the cache under the 16-band build
    assert(Dedup.dedupAgainstIndex(batch, F.col("id"), F.col("text"), dir,
      threshold = 0.9, probeBands = Some(16)).count() == 0)
    // regenerate IN PLACE with 4 bands: stale cached meta would accept
    // probeBands=16; fresh meta must reject it
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 4)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batch, F.col("id"), F.col("text"), dir,
        threshold = 0.9, probeBands = Some(16)).count()
    }
    assert(e.getMessage.contains("probeBands"), e.getMessage)
    // and the refreshed params work end-to-end
    assert(Dedup.dedupAgainstIndex(batch, F.col("id"), F.col("text"), dir,
      threshold = 0.9, probeBands = Some(4)).count() == 0)
  }

  test("minhash disk index: the maxBucket cap applies to the corpus+batch " +
      "UNION bucket, matching the live path on boilerplate (the candidate " +
      "blowup guardrail)") {
    val boiler = "all rights reserved copyright notice terms of service apply " +
      "to every page of this site including this one"
    val real = "a genuinely unique document about alpine butterflies and " +
      "their remarkable migration patterns across the high mountain passes"
    // ref: 4 identical boilerplate docs + 1 real doc; cap 5 keeps the
    // boilerplate bucket (4 <= 5) in the index...
    val ref = (Seq.tabulate(4)(i => (10L + i, boiler)) :+ (20L, real))
      .toDF("rid", "rtext")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhcap").toString
    Dedup.writeMinhashIndex(ref, F.col("rid"), F.col("rtext"), dir,
      shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 5)
    // ...but a batch with 2 more boilerplate copies pushes the UNION to 6
    // > 5: the pair must be refused exactly like the live path's capped
    // union bucket, so the boilerplate batch docs SURVIVE; the real-doc
    // copy still dies (its union bucket is 2)
    val batch = Seq((1L, boiler), (2L, boiler), (3L, real)).toDF("id", "text")
    val fromIndex = Dedup.dedupAgainstIndex(batch, F.col("id"),
      F.col("text"), dir, threshold = 0.8)
    val live = Dedup.dedupAgainstNear(batch, F.col("id"), F.col("text"),
      ref, F.col("rid"), F.col("rtext"), threshold = 0.8,
      shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 5)
    assert(col1[Long](fromIndex.orderBy("id"), "id") == Seq(1L, 2L))
    assert(col1[Long](fromIndex.orderBy("id"), "id") ==
      col1[Long](live.orderBy("id"), "id"))
  }

  test("compactMinhashIndex: merges segments into exactly a fresh " +
      "full-corpus build and restores the union cap segmentation eroded") {
    val boiler = "all rights reserved copyright notice terms of service " +
      "apply to every page of this site including this one"
    val real = "a genuinely unique document about alpine butterflies and " +
      "their remarkable migration patterns across the high mountain passes"
    // corpus A: 2 boilerplate copies + 1 real doc; appended batch B: 2
    // more boilerplate copies. Cap 3: each SEGMENT's boilerplate bucket
    // (size 2) stays under the cap, but the TRUE union (4) exceeds it
    val a = (Seq.tabulate(2)(i => (10L + i, boiler)) :+ (30L, real))
      .toDF("id", "text")
    val b = Seq.tabulate(2)(i => (20L + i, boiler)).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhc").toString
    val seg = dir + "/seg"
    Dedup.writeMinhashIndex(a, F.col("id"), F.col("text"), seg,
      shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 3)
    Dedup.appendToMinhashIndex(b, F.col("id"), F.col("text"), seg,
      segment = "b0")
    val probe = Seq((1L, boiler), (2L, real)).toDF("id", "text")
    // segmented: each posting row unions with the probe at 2+1 = 3 ≤ cap,
    // so the boilerplate probe doc DIES — the cap erosion in action
    // (the real-doc copy dies in every variant)
    assert(col1[Long](Dedup.dedupAgainstIndex(probe, F.col("id"),
      F.col("text"), seg, threshold = 0.8), "id").isEmpty)
    Dedup.compactMinhashIndex(spark, seg)
    // compacted: the merged bucket (4 > 3) was dropped at compaction, so
    // the boilerplate probe doc SURVIVES — the one-shot build's refusal
    val afterCompact = Dedup.dedupAgainstIndex(probe, F.col("id"),
      F.col("text"), seg, threshold = 0.8)
    assert(col1[Long](afterCompact.orderBy("id"), "id") == Seq(1L))
    // and the compacted index is ROW-IDENTICAL to a fresh build over A∪B
    val fresh = dir + "/fresh"
    Dedup.writeMinhashIndex(a.unionAll(b), F.col("id"), F.col("text"),
      fresh, shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 3)
    def rows(p: String, cols: String*): Seq[String] =
      spark.read.parquet(p).select(cols.map(F.col): _*)
        .collect().map(_.toString).toSeq.sorted
    assert(rows(seg + "/features", "id", "sh", "seg") ==
      rows(fresh + "/features", "id", "sh", "seg"))
    assert(rows(seg + "/postings", "band", "bucket", "ids", "seg") ==
      rows(fresh + "/postings", "band", "bucket", "ids", "seg"))
    // a bucket REFUSED at write time must stay refused through compaction:
    // base holds 4 boilerplate copies (bucket dropped at build, 4 > 3), a
    // segment adds 2 more. A stored-rows merge would see only the
    // segment's 2 ids and RESURRECT the bucket under the cap; the
    // rebuild-from-features recomputes the true union (6 > 3) and drops
    // it — the probe boilerplate doc survives, as with a fresh build
    val a2 = (Seq.tabulate(4)(i => (10L + i, boiler)) :+ (30L, real))
      .toDF("id", "text")
    val b2 = Seq.tabulate(2)(i => (20L + i, boiler)).toDF("id", "text")
    val seg2 = dir + "/seg2"
    Dedup.writeMinhashIndex(a2, F.col("id"), F.col("text"), seg2,
      shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 3)
    Dedup.appendToMinhashIndex(b2, F.col("id"), F.col("text"), seg2,
      segment = "b0")
    Dedup.compactMinhashIndex(spark, seg2)
    val fresh2 = dir + "/fresh2"
    Dedup.writeMinhashIndex(a2.unionAll(b2), F.col("id"), F.col("text"),
      fresh2, shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 3)
    assert(rows(seg2 + "/features", "id", "sh", "seg") ==
      rows(fresh2 + "/features", "id", "sh", "seg"))
    assert(rows(seg2 + "/postings", "band", "bucket", "ids", "seg") ==
      rows(fresh2 + "/postings", "band", "bucket", "ids", "seg"))
    assert(col1[Long](Dedup.dedupAgainstIndex(probe, F.col("id"),
      F.col("text"), seg2, threshold = 0.8).orderBy("id"), "id") == Seq(1L))
    // excludeSegment (r16, the in-line stream-compaction contract): the
    // fold skips the named segment — its features keep their seg label
    // and its postings rows pass through byte-identical to what the
    // appender wrote (NOT re-derived) — and a later fold that includes
    // it converges onto the fresh-build identity
    val seg3 = dir + "/seg3"
    Dedup.writeMinhashIndex(a, F.col("id"), F.col("text"), seg3,
      shingleSize = 3, numHashes = 64, bands = 16, maxBucket = 3)
    Dedup.appendToMinhashIndex(b, F.col("id"), F.col("text"), seg3,
      segment = "b0")
    def segRows(p: String): Seq[String] =
      spark.read.parquet(p).filter(F.col("seg") === "b0")
        .collect().map(_.toString).toSeq.sorted
    val keptPostingsBefore = segRows(seg3 + "/postings")
    val keptFeaturesBefore = segRows(seg3 + "/features")
    Dedup.compactMinhashIndex(spark, seg3, excludeSegment = Some("b0"))
    def segsOf(p: String): Set[String] =
      spark.read.parquet(p).select("seg").distinct()
        .collect().map(_.getString(0)).toSet
    assert(segsOf(seg3 + "/features") == Set("base", "b0"))
    assert(segRows(seg3 + "/postings") == keptPostingsBefore)
    assert(segRows(seg3 + "/features") == keptFeaturesBefore)
    // the excluded segment still probes (candidate generation is
    // segment-transparent): same all-dead probe as the segmented index,
    // because the cap erosion is intact while b0 stays unfolded
    assert(col1[Long](Dedup.dedupAgainstIndex(probe, F.col("id"),
      F.col("text"), seg3, threshold = 0.8), "id").isEmpty)
    // the NEXT (unexcluded) fold converges on the fresh-build identity
    Dedup.compactMinhashIndex(spark, seg3)
    assert(rows(seg3 + "/features", "id", "sh", "seg") ==
      rows(fresh + "/features", "id", "sh", "seg"))
    assert(rows(seg3 + "/postings", "band", "bucket", "ids", "seg") ==
      rows(fresh + "/postings", "band", "bucket", "ids", "seg"))
  }

  test("dedupAgainstNear fails loudly on a negative id instead of " +
      "misclassifying the row's side") {
    // a negative id in the NEW batch would land in the reference id range
    // and silently corrupt the losers set — the __uid projection must
    // abort the job instead
    val batch = Seq((-1L, "some text here"), (2L, "other text there"))
      .toDF("id", "text")
    val ref = Seq((7L, "reference text body")).toDF("rid", "rtext")
    val bad = intercept[Exception] {
      Dedup.dedupAgainstNear(batch, F.col("id"), F.col("text"),
        ref, F.col("rid"), F.col("rtext"), threshold = 0.5).collect()
    }
    assert(bad.getMessage.contains("non-negative"), bad.getMessage)
    // same enforcement on the reference side
    val badRef = intercept[Exception] {
      Dedup.dedupAgainstNear(
        Seq((1L, "some text here")).toDF("id", "text"), F.col("id"),
        F.col("text"), Seq((-7L, "reference text body")).toDF("rid", "rtext"),
        F.col("rid"), F.col("rtext"), threshold = 0.5).collect()
    }
    assert(badRef.getMessage.contains("non-negative"), badRef.getMessage)
  }

  test("topKByHash: exactly k per domain, deterministic, corpus-independent") {
    val d = (0L until 300L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")
    val out = Sampling.topKByHash(d, F.col("dom"), F.col("id"), k = 7,
      salt = "t")
    val counts = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("dom0" -> 7L, "dom1" -> 7L, "dom2" -> 7L))
    // sticky: a kept key stays kept when unrelated NON-SELECTED rows leave
    // (the sample is the k hash-smallest — removing larger-hash rows
    // cannot change membership)
    val keptIds = col1[Long](out.orderBy("id"), "id").toSet
    val shrunk = d.filter(F.col("id").isin(
      (keptIds ++ Set(298L, 299L)).toSeq.map(Long.box): _*))
    val again = Sampling.topKByHash(shrunk, F.col("dom"), F.col("id"), 7, "t")
    assert(col1[Long](again.orderBy("id"), "id").toSet == keptIds)
    // k larger than the domain keeps everything
    val all = Sampling.topKByHash(d.limit(5), F.col("dom"), F.col("id"),
      1000, "t")
    assert(all.count() == 5)
  }

  test("hashSplit and bloomGate are stateless — run unchanged on a stream") {
    val d = (0L until 40L).map(i => (i, s"doc $i")).toDF("id", "t")
    val ref = (0L until 10L).map(i => s"doc $i").toDF("rt")
    val dir = java.nio.file.Files.createTempDirectory("graft_sampling").toString
    d.write.parquet(dir + "/docs")
    val stream = graft.streaming.Streams.readParquetStream(
      spark, dir + "/docs", d.schema)
    // batch twins
    val splitBatch = Sampling.hashSplit(d, F.col("id"),
      Seq("train" -> 0.5, "test" -> 0.5), salt = "st")
    val gateBatch = Dedup.bloomGate(d, F.col("t"), ref, F.col("rt"),
      expectedItems = 10L, fpp = 0.001)
    // the same Column expressions applied to the streaming frame
    val splitStream = graft.streaming.Streams.runToMemory(
      Sampling.hashSplit(stream, F.col("id"),
        Seq("train" -> 0.5, "test" -> 0.5), salt = "st"), "t_split")
    assert(splitStream.except(splitBatch).isEmpty &&
      splitBatch.except(splitStream).isEmpty)
    val bf = Dedup.bloomGate(stream, F.col("t"), ref, F.col("rt"),
      expectedItems = 10L, fpp = 0.001)
    val gateStream = graft.streaming.Streams.runToMemory(bf, "t_gate")
    assert(gateStream.except(gateBatch).isEmpty &&
      gateBatch.except(gateStream).isEmpty)
  }

  test("bloomGate: members never survive, FPR bounded") {
    val ref = (0L until 500L).map(i => s"blocked $i").toDF("rt")
    val members = (0L until 500L).map(i => (i, s"blocked $i"))
    val clean = (500L until 2500L).map(i => (i, s"fresh document $i"))
    val d = (members ++ clean).toDF("id", "t")
    val out = Dedup.bloomGate(d, F.col("t"), ref, F.col("rt"),
      expectedItems = 500L, fpp = 0.01)
    // no false negatives: every planted member is dropped
    assert(out.filter(F.col("id") < 500).count() == 0)
    // false positives bounded: 2000 clean rows at fpp=0.01 → expect ~20,
    // allow generous slack (deterministic given the build, but sized for
    // any hash family drift)
    val kept = out.count()
    assert(kept >= 2000 - 100, s"only $kept clean rows survived the gate")
  }

  test("weightedSample: selection matches a JVM replay of the E-S rank, " +
      "k >= n keeps everything, loud on nonpositive/null weights") {
    // JVM replay of the exact rank formula the operator publishes
    def rank(key: String, salt: String, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((key + salt).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.log(u) / w
    }
    val rows = (1L to 40L).map(i => (i, (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val got = col1[Long](Sampling.weightedSample(df, F.col("id"),
      F.col("w"), k = 10, salt = "s1").orderBy("id"), "id")
    val want = rows.sortBy { case (i, w) => (-rank(i.toString, "s1", w),
      i.toString) }.take(10).map(_._1).sorted
    assert(got == want)
    // k >= n keeps every row regardless of weights
    assert(Sampling.weightedSample(df, F.col("id"), F.col("w"), k = 100)
      .count() == 40)
    // deterministic; a different salt draws a different set (these salts
    // verified to differ)
    val again = col1[Long](Sampling.weightedSample(df, F.col("id"),
      F.col("w"), k = 10, salt = "s1").orderBy("id"), "id")
    assert(again == got)
    val other = col1[Long](Sampling.weightedSample(df, F.col("id"),
      F.col("w"), k = 10, salt = "s2").orderBy("id"), "id")
    assert(other != got)
    // loud contracts: zero / null weight
    intercept[Exception] {
      Sampling.weightedSample(df.withColumn("w", F.lit(0.0)),
        F.col("id"), F.col("w"), k = 5).collect()
    }
    intercept[Exception] {
      Sampling.weightedSample(df.withColumn("w",
        F.lit(null).cast("double")), F.col("id"), F.col("w"), k = 5)
        .collect()
    }
    // per-group variant: same rank replay inside each domain, and the
    // plan is the pre-pruning WindowGroupLimit shape
    val gRows = (1L to 40L).map(i => (i, s"g${i % 3}", (i % 5 + 1).toDouble))
    val gdf = gRows.toDF("id", "g", "w")
    val grouped = Sampling.weightedSampleByGroup(gdf, F.col("g"),
      F.col("id"), F.col("w"), k = 4, salt = "s1")
    val gotG = grouped.collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val wantG = gRows.groupBy(_._2).view.mapValues(_.sortBy { case (i, _, w)
      => (-rank(i.toString, "s1", w), i.toString) }
      .take(4).map(_._1).sorted.toSeq).toMap
    assert(gotG == wantG)
    assert(grouped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }
}
