package graft

/** CI plan assertions (VERDICT r1 #10): the scale-killers found in round 1 —
  * a Window fed by `Exchange SinglePartition` (whole dataset through one
  * task) and accidental nested-loop joins — must not regress. Runs on the
  * sf0.001 fixtures, asserting on the pre-execution physical plan text.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans must stay free of single-partition windows and
    * nested-loop joins. q09 (cross join) and q45 (category-dictionary
    * window over <= #categories rows) are excluded by design; s01 builds a
    * streaming query and d11 generates driver-side fixtures — both too
    * heavy for a plan sweep. */
  private val guarded = Seq(
    "q01_agg", "q02_project_arith", "q04_sort_topk", "q06_join_star",
    "q07_join_left_agg", "q10_cumulative", "q13_rank", "q26_asof_join",
    "q28_slice", "q31_ewm", "q38_peaks_rowindex", "q39_head_grouped",
    "q42_spearman", "q44_concat_columns", "q51_sort_nils", "q52_cut_frame",
    "q54_positional", "q55_math_funcs", "q59_range_join",
    "q60_series_utils", "q61_argsort", "q63_time_slice",
    "d01_exact_dedup", "d05_minhash_pairs", "d07_ngram_jaccard",
    "d09_lsh_topk", "d13_embedding_neardup", "d14_ivf_topk",
    "d17_normalize", "d18_vocabulary", "d19_tfidf",
    "d21_repetition", "d22_scrub", "d23_contamination", "d24_dedup_lines",
    "d28_hash_split", "d29_mixture", "d30_dedup_against", "d32_topk_sample",
    "d51_index_dedup",
    "d33_chunk", "d36_quantize", "d40_dedup_spans", "d41_gopher_rules",
    "d42_top_ngrams", "d43_ivf_disk_index")

  /** Lines of the subtree rooted at line `i` (children print below with
    * deeper operator indentation until a line at or above the root's). */
  private def subtree(lines: Array[String], i: Int): Seq[String] = {
    def depth(l: String): Int = {
      val idx = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (idx < 0) l.length else idx
    }
    val d0 = depth(lines(i))
    lines.drop(i + 1).takeWhile(l => depth(l) > d0).toSeq
  }

  /** Drop the subtrees of scalar `Subquery` nodes: a scalar subquery's own
    * global aggregate legitimately exchanges to a single partition (it
    * produces ONE row) and is printed inline under its consumer — without
    * this the guard would flag e.g. a corpus-count subquery as the
    * window's input exchange. */
  private def withoutSubqueries(lines: Seq[String]): Seq[String] = {
    def depth(l: String): Int = {
      val idx = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (idx < 0) l.length else idx
    }
    val out = Seq.newBuilder[String]
    var skipDeeperThan = -1
    for (l <- lines) {
      val d = depth(l)
      if (skipDeeperThan >= 0 && d <= skipDeeperThan) skipDeeperThan = -1
      if (skipDeeperThan < 0) {
        if (l.contains("Subquery subquery#")) skipDeeperThan = d
        else out += l
      }
    }
    out.result()
  }

  /** A Window whose FIRST exchange below is SinglePartition = the whole
    * dataset funneling through one task. */
  private def singlePartitionWindows(plan: String): Seq[String] = {
    val lines = plan.linesIterator.toArray
    lines.indices.filter { i =>
      val l = lines(i)
      (l.contains("Window") || l.contains("WindowGroupLimit")) && {
        withoutSubqueries(subtree(lines, i)).find(_.contains("Exchange"))
          .exists(_.contains("SinglePartition"))
      }
    }.map(lines)
  }

  test("filter pushdown reaches the parquet scan (q03)") {
    val plan = SparkEntry.queries("q03_filter_predicates")(spark, dir)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.nonEmpty && !pushed.contains("PushedFilters: []"),
      s"no pushed filters:\n$plan")
    assert(pushed.contains("GreaterThan(l_quantity") ||
      pushed.contains("In(l_returnflag"), pushed)
  }

  test("q63 time slice: the ts bound reaches the parquet scan as a pushed " +
      "filter (r8 verdict watch #3 — a filter on the normalized " +
      "unix_micros(ts)*1000 projection would force a full scan at 100 TB)") {
    val plan = SparkEntry.queries("q63_time_slice")(spark, dir)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters: ["))
      .filter(l => l.contains("(ts") || l.contains("ts,") || l.contains("ts)"))
      .mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThan(ts"),
      s"ts slice not pushed to the scan:\n$plan")
  }

  test("column pruning reaches the parquet scan (q01 reads 6 of 11 columns)") {
    val plan = SparkEntry.queries("q01_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    val read = plan.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n")
    assert(read.nonEmpty, plan)
    for (unused <- Seq("l_partkey", "l_suppkey", "l_orderkey"))
      assert(!read.contains(unused), s"unpruned column $unused:\n$read")
  }

  test("d09 lshTopK: banded explode + candidate distinct carry ids only " +
      "(r3 verdict #4: no vector payload below the distinct)") {
    val plan = SparkEntry.queries("d09_lsh_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    val explodes = plan.linesIterator
      .filter(_.contains("Generate posexplode")).toSeq
    assert(explodes.nonEmpty, s"no banded explode found:\n$plan")
    for (g <- explodes)
      assert(!g.contains("embedding") && !g.contains("__cv") && !g.contains("__qv"),
        s"vector payload replicated through the banded explode:\n$g")
    val distincts = plan.linesIterator
      .filter(_.contains("HashAggregate(keys=[corpus_id")).toSeq
    assert(distincts.nonEmpty, s"no candidate distinct found:\n$plan")
    for (d <- distincts)
      assert(!d.contains("embedding") && !d.contains("__cv") && !d.contains("__qv"),
        s"vector payload inside the candidate distinct:\n$d")
  }

  test("d13 embedding near-dup: cache-free single-DAG verification — no " +
      "InMemoryTableScan, no binding repartition, candidate subtree " +
      "shared via exchange/stage reuse (r6 verdict: the unconditional " +
      "pins cost d13 2.3x for nothing)") {
    val df = SparkEntry.queries("d13_embedding_neardup")(spark, dir)
    // execute THIS QueryExecution so AQE finalizes it — stage reuse is
    // a runtime decision (df.write would plan a fresh clone and leave
    // df's own plan isFinalPlan=false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"),
      s"d13 verification path went through a cache:\n$plan")
    assert(!plan.contains("REPARTITION_BY_NUM"),
      s"d13 still carries a binding repartition:\n$plan")
    // the banded candidate subtree is consumed from multiple places in
    // ONE DAG; it must be computed once — visible as a ReusedExchange
    // (static planning) or a repeated ShuffleQueryStage id (AQE)
    val stageIds = raw"ShuffleQueryStage (\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val reused = plan.contains("ReusedExchange") ||
      stageIds.distinct.size < stageIds.size
    assert(reused, s"d13 candidate subtree not reused:\n$plan")
  }

  test("d09 lshTopK: candidate table cached once (column pruning " +
      "specializes the three consumer copies, defeating exchange reuse — " +
      "the cache is what keeps the corpus banding scan single-pass) and " +
      "the vector sides carry no forced repartition") {
    val df = SparkEntry.queries("d09_lsh_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TableCacheQueryStage") ||
        plan.contains("InMemoryTableScan"),
      s"d09 candidate table no longer cached — banding scan runs 3x:\n$plan")
    // exactly the one layout-pinning repartition (inside the cached
    // relation), none on the vector lookup sides
    val pins = plan.linesIterator.count(_.contains("REPARTITION_BY_NUM"))
    assert(pins <= 1, s"d09 carries forced vector-side repartitions:\n$plan")
    spark.catalog.clearCache()
  }

  test("d23 contamination: bench postings broadcast — the corpus side " +
      "streams through the match join without shuffling") {
    val plan = SparkEntry.queries("d23_contamination")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join in contamination:\n$plan")
  }

  test("hashSplit is a pure scan expression — no exchange, no sort, no join") {
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.Sampling.hashSplit(docs, F.col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s42")
      .queryExecution.executedPlan.toString
    for (op <- Seq("Exchange", "Sort", "Join"))
      assert(!plan.contains(op), s"hashSplit plan contains $op:\n$plan")
  }

  test("gopherFilter is a pure scan-side gate — no exchange, no sort, no join") {
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.TextAnalysis
      .gopherFilter(docs, F.col("text"))
      .queryExecution.executedPlan.toString
    for (op <- Seq("Exchange", "Sort", "Join"))
      assert(!plan.contains(op), s"gopherFilter plan contains $op:\n$plan")
  }

  test("bloomGate is a scan-side filter — no join or shuffle in the gated plan") {
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.Dedup.bloomGate(docs, F.col("text"),
      docs.limit(20), F.col("text"), expectedItems = 20L, fpp = 0.01)
      .queryExecution.executedPlan.toString
    for (op <- Seq("Exchange", "Join"))
      assert(!plan.contains(op), s"bloomGate plan contains $op:\n$plan")
    assert(plan.contains("might_contain"),
      s"bloom predicate not folded into the scan plan:\n$plan")
  }

  test("d29 mixture: admission joins back as a broadcast semi-join — the " +
      "corpus never shuffle-joins") {
    val plan = SparkEntry.queries("d29_mixture")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"no broadcast semi-join admission:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join in mixture:\n$plan")
  }

  test("chunk is scan-side row expansion — no exchange, no join") {
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.TextAnalysis.chunk(docs, F.col("doc_id"),
      F.col("text"), size = 40, overlap = 8)
      .queryExecution.executedPlan.toString
    for (op <- Seq("Exchange", "Join"))
      assert(!plan.contains(op), s"chunk plan contains $op:\n$plan")
    assert(plan.contains("Generate explode"), s"no scan-side explode:\n$plan")
  }

  test("d32 topKByHash plans as WindowGroupLimit — map-side top-k pruning " +
      "before the shuffle, no full per-domain sort-and-number") {
    val plan = SparkEntry.queries("d32_topk_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing:\n$plan")
  }

  test("quantile gates: approx_percentile sketch on the default path, " +
      "exact percentile only on opt-in") {
    import org.apache.spark.sql.{functions => F}
    // exact `percentile` buffers the full value multiset in one merge
    // buffer — the default (100 TB) path must plan the GK sketch instead
    val exactPct = "(?<!approx_)percentile\\(".r
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val score = F.length(F.col("text")).cast("double")
    val approxPlan = graft.operators.TextAnalysis
      .quantileFilter(docs, score, 0.5)
      .queryExecution.executedPlan.toString
    assert(approxPlan.contains("approx_percentile"),
      s"default gate does not plan the sketch:\n$approxPlan")
    assert(exactPct.findFirstIn(approxPlan).isEmpty,
      s"exact percentile on the default gate path:\n$approxPlan")
    val exactPlan = graft.operators.TextAnalysis
      .quantileFilter(docs, score, 0.5, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPct.findFirstIn(exactPlan).nonEmpty,
      s"exact=true did not plan the exact percentile:\n$exactPlan")
    val statsPlan = graft.operators.TextAnalysis
      .corpusStats(docs, F.col("text"))
      .queryExecution.executedPlan.toString
    assert(statsPlan.contains("approx_percentile") &&
      exactPct.findFirstIn(statsPlan).isEmpty,
      s"corpusStats default path not on the sketch:\n$statsPlan")
    // the registered approx twins really run the sketch path
    for (name <- Seq("d38_quality_gate_approx", "d39_corpus_stats_approx")) {
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("approx_percentile") &&
        exactPct.findFirstIn(p).isEmpty,
        s"$name not on the sketch path:\n$p")
    }
  }

  /** Queries whose BroadcastNestedLoopJoin is DELIBERATE, not an
    * accidental degeneration: exhaustive-probe IVF (r15) routes to the
    * brute scorer — a broadcast of the driver-small query set streamed
    * against the corpus scan, the same sanctioned shape as d04's
    * bruteForceTopK (which was never guarded for exactly this reason).
    * The single-partition-window guard still applies to them. */
  private val deliberateBnlj = Set("d14_ivf_topk", "d43_ivf_disk_index")

  for (name <- guarded)
    test(s"$name: no single-partition window, no nested-loop join") {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val offenders = singlePartitionWindows(plan)
      assert(offenders.isEmpty,
        s"single-partition window in $name:\n${offenders.mkString("\n")}\n$plan")
      if (!deliberateBnlj.contains(name))
        assert(!plan.contains("NestedLoop"),
          s"nested-loop join in $name:\n$plan")
      else
        assert(plan.contains("BroadcastNestedLoopJoin"),
          s"$name expected the routed brute shape (broadcast queries " +
            s"against the corpus scan):\n$plan")
    }
}
