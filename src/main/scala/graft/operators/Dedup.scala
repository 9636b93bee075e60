package graft.operators

import graft.Gdf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale text corpora — beyond the
  * reference's surface (its dedup is row-identity `distinct`,
  * data_frame.ex:3685), these are the standard training-data-pipeline
  * family: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is expressed as hash → shuffle-on-key →
  * per-key reduction, the shape that survives 100 TB (no driver collects,
  * no cross joins; candidate generation is always bucket-local).
  */
object Dedup {

  /** Exact dedup: keep the first row (lowest `idCol`) per identical `key`.
    * One hash-shuffle on the key; at 100 TB use `xxhash64(text)` as the
    * groupBy key so the shuffle carries 8-byte keys, then re-verify within
    * buckets (hash collisions are ~0 at 2^64 but the verify is free). */
  def exact(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(F.xxhash64(key)).orderBy(idCol)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1).drop("__rn")
  }

  /** Word n-grams (shingles) of `text`, distinct, as an array column of
    * strings — the semantic reference form (used where humans debug
    * near-dup output). The hot pipelines use [[shingleHashes]] instead. */
  def shingles(text: Column, n: Int): Column = {
    val words = F.split(F.lower(F.trim(text)), "\\s+")
    val count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    // zip_with chain over shifted slices — linear, see [[shingleHashes]]
    val chained = (1 until n).foldLeft(F.slice(words, F.lit(1), count)) { (h, j) =>
      F.zip_with(h, F.slice(words, F.lit(1 + j), count),
        (a, b) => F.concat(a, F.lit(" "), b))
    }
    F.when(count >= 1, F.array_distinct(chained))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Distinct (sorted) word-n-gram identities as 64-bit hashes — the native
    * [[graft.functions.ShingleHashes]] expression. Equivalent set semantics
    * to [[shingles]] up to hash collisions (~0 at 2^64); one JIT-compiled
    * eval per row instead of interpreted per-element HOF lambdas (profiled
    * ~10× on real documents). */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.TextExprs.shingleHashes(text, n)

  /** MinHash signature: for each of `numHashes` hash functions, the min over
    * the shingle set. ONE `aggregate` pass with an array accumulator — no
    * explode/shuffle. The hash family is Kirsch-Mitzenmacher
    * (h_i = h1 + i·h2): 2 xxhash64 evaluations per shingle instead of
    * `numHashes` (HOFs run interpreted, so hashing dominates — this is ~30×
    * less hashing at k=64). Operands are bit-masked (62/56 bits) so
    * h1 + i·h2 cannot overflow under ANSI mode while preserving order
    * statistics. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    minhashFromHashes(F.transform(shingleCol, s => F.xxhash64(s)), numHashes)

  /** MinHash over pre-hashed shingles ([[shingleHashes]]). */
  def minhashFromHashes(hashCol: Column, numHashes: Int): Column = {
    require(numHashes <= 64, "mask budget supports numHashes <= 64")
    F.aggregate(hashCol,
      F.array_repeat(F.lit(Long.MaxValue), numHashes),
      (acc, s) => {
        val h1 = s.bitwiseAND(F.lit(0x3FFFFFFFFFFFFFFFL))
        val h2 = F.xxhash64(s).bitwiseAND(F.lit(0x00FFFFFFFFFFFFFFL))
        F.zip_with(acc, F.sequence(F.lit(0), F.lit(numHashes - 1)),
          (m, i) => F.least(m, h1 + i * h2))
      })
  }

  /** Within-bucket ordered pairs of a sorted id array: (ids(i), ids(j)) for
    * i < j — pair generation stays inside the bucket's executor, no
    * self-join (a same-lineage self-join degenerates to a nested-loop join
    * in Spark; groupBy+expand is also one shuffle cheaper). Native
    * expression: see [[graft.functions.OrderedPairs]]. */
  private def bucketPairs(ids: Column): Column =
    graft.functions.TextExprs.orderedPairs(ids)

  /** The native pair expressions read ids as raw longs, so every candidate
    * generator normalizes the caller's id to bigint before it enters a
    * bucket (int/short ids widen losslessly; a non-numeric id fails at
    * analysis time with the expressions' type check instead of a runtime
    * ClassCastException). Pair outputs are therefore always bigint ids. */
  private def asLongId(id: Column): Column = id.cast(LongType)

  /** [[asLongId]] plus a fail-loud non-negativity check, for operators
    * that encode side/provenance in the id's sign ([[dedupAgainstNear]]):
    * `assert_true` returns null when the predicate holds (so the `when`
    * falls through to the id) and aborts the job on the first negative or
    * null id — a pure row expression, no extra pass over the data. */
  private def checkedNonNegId(id: Column, what: String): Column = {
    val idL = asLongId(id)
    F.when(
      F.assert_true(idL >= 0,
        F.lit(s"$what must be a non-negative, non-null integer")).isNull,
      idL)
  }

  /** MinHash + LSH banding: rows whose signature agrees on ALL rows of any
    * band become candidates. One explode to `bands` rows per doc, one
    * groupBy per (band, bucket), pairs expanded bucket-locally. `maxBucket`
    * caps degenerate buckets (boilerplate-heavy corpora) to avoid quadratic
    * blowup — the standard guardrail at scale. */
  def minhashLshCandidates(df: DataFrame, id: Column, text: Column,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    // fully fused native shingling + minhash + banding — one eval per row
    // emitting the band bucket hashes directly (see TextExprs); the
    // signature array never materializes as a column
    val banded = df.select(asLongId(id).as("id"), F.posexplode(
      graft.functions.TextExprs.minhashBandHashes(
        text, shingleSize, numHashes, bands)).as(Seq("band", "bucket")))
    // capped saturating collect (see [[graft.functions.CappedSortedIds]]):
    // same [2, maxBucket] band semantics as collect_list + size filter, but
    // a degenerate bucket buffers and ships <= maxBucket+1 ids instead of
    // its whole posting list
    banded.groupBy("band", "bucket")
      .agg(graft.functions.AggExprs.cappedSortedIds(F.col("id"), maxBucket)
        .as("ids"))
      .filter(F.col("ids").isNotNull)
      .select(F.explode(bucketPairs(F.col("ids"))).as("p"))
      .select("p.*").distinct()
  }

  /** Band planner for MinHash LSH (the MMDS §3.4.3 s-curve rule): among
    * the (bands, rowsPerBand) factorizations of `numHashes`, pick the one
    * whose detection-probability midpoint `(1/bands)^(1/rows)` — the
    * Jaccard at which a pair has ~50% candidate probability — sits
    * closest to the target threshold. Wider bands (more rows each) push
    * the midpoint UP, cutting the collision floor on low-similarity
    * corpora; more bands push it DOWN, buying recall near the threshold.
    * This is the 100 TB tuning knob SCALING.md's d05 analysis points at:
    * call it once with the corpus threshold instead of hand-picking.
    * Returns (bands, rowsPerBand, midpoint). */
  def lshPlan(numHashes: Int, threshold: Double): (Int, Int, Double) = {
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0, 1), got $threshold")
    (1 to numHashes).filter(numHashes % _ == 0)
      .map { b =>
        val r = numHashes / b
        (b, r, math.pow(1.0 / b, 1.0 / r))
      }
      .minBy { case (_, _, mid) => math.abs(mid - threshold) }
  }

  /** LSH candidate pairs from a pre-hashed shingle frame (`id` bigint,
    * `sh` array<bigint> — [[shingleHashes]] output): band hashes derive
    * FROM the stored hashes ([[graft.functions.TextExprs
    * .minhashBandHashesFromHashes]] ≡ [[graft.functions.TextExprs
    * .minhashBandHashes]]-over-text, the identity the index compactor's
    * row-identity spec pins), so a caller that already paid the corpus
    * text pass never re-normalizes/re-tokenizes (r18 optimization — the
    * pair family processed the corpus text once for candidates and twice
    * more for verification). */
  private def lshCandidatesFromHashes(hashed: DataFrame, numHashes: Int,
      bands: Int, maxBucket: Int): DataFrame =
    hashed.select(F.col("id"), F.posexplode(
        graft.functions.TextExprs.minhashBandHashesFromHashes(
          F.col("sh"), numHashes, bands)).as(Seq("band", "bucket")))
      .groupBy("band", "bucket")
      .agg(graft.functions.AggExprs.cappedSortedIds(F.col("id"), maxBucket)
        .as("ids"))
      .filter(F.col("ids").isNotNull)
      .select(F.explode(bucketPairs(F.col("ids"))).as("p"))
      .select("p.*").distinct()

  /** The shared one-text-pass scan of the pair family (r18): the corpus is
    * normalized + tokenized + shingle-hashed ONCE and cached; candidates
    * band-hash from the cache and verification joins it — the same shape
    * (and the same trade) as the r17 index build. MEMORY_AND_DISK: at
    * corpus scale the hash arrays spill rather than evict. */
  private def hashedShingles(df: DataFrame, id: Column, text: Column,
      shingleSize: Int): DataFrame =
    df.select(asLongId(id).as("id"),
        shingleHashes(text, shingleSize).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Near-dedup via MinHash LSH + exact Jaccard verification: candidates
    * from the shared shingle-hash scan (one text-processing pass — see
    * [[hashedShingles]]), verified against true shingle-set Jaccard ≥
    * threshold. Returns (id_a, id_b, jaccard) confirmed pairs. */
  def minhashDuplicatePairs(df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val hashed = hashedShingles(df, id, text, shingleSize)
    val cands = lshCandidatesFromHashes(hashed, numHashes, bands,
      maxBucket = 1000)
    verifyJaccardHashed(hashed, cands, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against a cached
    * shingle-hash frame ([[hashedShingles]]). Hash arrays are pulled ONLY
    * for docs appearing in a candidate pair (semi-join pruning) — at scale
    * the candidate set is orders of magnitude smaller than the corpus —
    * and no text is touched at all: the hashes come from the shared scan
    * the candidate generation already paid for. */
  private def verifyJaccardHashed(hashed: DataFrame, cands0: DataFrame,
      threshold: Double): DataFrame = {
    // the candidate table is consumed twice (id pruning + the pair join);
    // without persisting, the whole candidate-generation subtree (banding,
    // LSH shuffle) would execute twice. It is the small end of the
    // pipeline by construction — pairs of ids — so it caches cheaply
    // even at corpus scale. The explicit repartition PINS the cached
    // partitioning: without it, whichever consumer materializes the cache
    // first decides it, and when the broadcast-subquery thread (computing
    // the id-pruning side) wins the race it bakes its
    // coalesced-for-broadcast layout (~2 partitions) into the cache — the
    // downstream verification joins then run near-single-threaded
    // (measured: bimodal 5 s / 42 s on identical input). The partition
    // COUNT must be explicit: a column-only repartition is advisory
    // (REPARTITION_BY_COL — AQE may still coalesce it), an explicit count
    // is binding. Hashing on (id_a, id_b) also co-locates the pair join's
    // probe side.
    val nPart = cands0.sparkSession.sessionState.conf.numShufflePartitions
    val cands = cands0
      .repartition(nPart, F.col("id_a"), F.col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = cands.select(F.explode(F.array(
      F.col("id_a"), F.col("id_b"))).as("id")).distinct()
    // the hash side gets the same binding repartition AND its own persist:
    // it feeds BOTH pair-join sides (sh_a, sh_b), and without the cache
    // the corpus-scale hashed frame would be re-scanned + semi-joined
    // twice (the r17 plans showed two full shingle subtrees here). It is
    // candidate-scale, so it caches cheaply. The binding repartition
    // matters as before: the pair join is borderline-broadcastable from
    // EITHER side, and whichever side AQE probes from must not inherit a
    // near-single-partition layout on a 32-core executor.
    val verifySh = hashed
      .join(candIds, Seq("id"), "left_semi")
      .repartition(nPart, F.col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands
      .join(verifySh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(verifySh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast(DoubleType) /
          F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing a rare shingle —
    * the non-probabilistic variant: inverted index on shingles (explode +
    * shuffle), pair generation within postings lists capped by `maxDf`
    * (frequent shingles are dropped — they only generate noise pairs and
    * quadratic blowup at scale). */
  /** `minCooccur`: a candidate pair must share at least this many rare
    * shingles before exact verification. At Jaccard ≥ 0.5 true pairs share
    * a large fraction of their (many) rare shingles, so 2 costs no recall
    * while cutting the accidental single-collision pairs — the candidate
    * set is the scale hazard of the inverted-index design. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 20, minCooccur: Int = 2): DataFrame = {
    // one text pass (r18): postings explode from the shared cached
    // shingle-hash scan and verification joins the same cache
    val hashed = hashedShingles(df, id, text, shingleSize)
    // postings carry the 8-byte shingle hash, not the string — the shuffle
    // and groupBy key stays fixed-width regardless of shingle length
    val postings = hashed.select(F.col("id"), F.explode(F.col("sh")).as("g"))
    // saturating collect: common shingles (df ≫ maxDf — boilerplate) never
    // materialize their posting lists; see CappedSortedIds
    val rare = postings.groupBy("g")
      .agg(graft.functions.AggExprs.cappedSortedIds(F.col("id"), maxDf)
        .as("ids"))
      .filter(F.col("ids").isNotNull)
    val cands = rare
      .select(F.explode(bucketPairs(F.col("ids"))).as("p"))
      .select("p.*")
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("__cooccur"))
      .filter(F.col("__cooccur") >= minCooccur)
      .select("id_a", "id_b")
    verifyJaccardHashed(hashed, cands, threshold)
  }

  /** Candidate-volume diagnostics for [[ngramJaccardPairs]]: one row per
    * pipeline stage with its cardinality — `(stage, n)` for postings,
    * rare-shingle buckets, expanded candidate pairs, and pairs surviving
    * the `minCooccur` gate. The point (r3 verdict): when the dedup family's
    * wall-time moves between rounds, these counts separate "the corpus
    * generates more candidates" from "the plumbing got slower" without a
    * profiling session. Oracle-checkable (the counts are exact set sizes,
    * hash-free semantics up to 64-bit collisions). The input is re-derived
    * per stage but postings are persisted, so the corpus is scanned once. */
  def ngramStageCounts(df: DataFrame, id: Column, text: Column,
      shingleSize: Int = 3, maxDf: Int = 20, minCooccur: Int = 2): DataFrame = {
    val postings = df.select(asLongId(id).as("id"),
      F.explode(shingleHashes(text, shingleSize)).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rareBuckets = postings.groupBy("g")
      .agg(graft.functions.AggExprs.cappedSortedIds(F.col("id"), maxDf)
        .as("ids"))
      .filter(F.col("ids").isNotNull)
    val pairCounts = rareBuckets
      .select(F.explode(bucketPairs(F.col("ids"))).as("p")).select("p.*")
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("__co"))
    def stageOf(stage: String, d: DataFrame): DataFrame =
      d.agg(F.count(F.lit(1)).as("n"))
        .select(F.lit(stage).as("stage"), F.col("n"))
    stageOf("1_postings", postings)
      .unionAll(stageOf("2_rare_shingles", rareBuckets))
      .unionAll(rareBuckets
        .select(F.size(F.col("ids")).cast(LongType).as("sz"))
        // sz*(sz-1) is even, so `div 2` is exact
        .agg(F.coalesce(F.sum(F.expr("sz * (sz - 1) div 2")), F.lit(0L)).as("n"))
        .select(F.lit("3_candidate_pairs").as("stage"), F.col("n")))
      .unionAll(stageOf("4_cooccur_pairs",
        pairCounts.filter(F.col("__co") >= minCooccur)))
  }

  /** 64-bit SimHash over word tokens: each bit is the sign of the Σ±1 vote
    * across token hashes. ONE native eval per row
    * ([[graft.functions.SimHash64]]) — the previous explode → groupBy
    * formulation shuffled every token of the corpus just to sum votes;
    * signatures are embarrassingly parallel and belong in the scan.
    * Near-dup detection then compares popcount(xor) ≤ k within LSH buckets
    * on bit-bands. */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      graft.functions.TextExprs.simhash64(text).as("simhash"))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = F.bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxDistance`.
    * The band count is DERIVED from the distance: `maxDistance + 1` bands
    * guarantee by pigeonhole that any pair within the distance shares at
    * least one exact band — a fixed band count would silently lose recall
    * for larger distances (the old 4×16-bit layout only covered ≤ 3). */
  def simhashDuplicatePairs(df: DataFrame, id: Column, text: Column,
      maxDistance: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 32,
      s"maxDistance $maxDistance out of [0, 32)")
    val bands = maxDistance + 1
    val base = 64 / bands
    val extra = 64 % bands
    val widths = Seq.tabulate(bands)(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val sh = simhash(df, asLongId(id), text)
    val banded = sh.select(F.col("id"), F.col("simhash"),
      F.posexplode(F.array((0 until bands).map(b =>
        F.shiftrightunsigned(F.col("simhash"), offsets(b))
          .bitwiseAND((1L << widths(b)) - 1)): _*))
        .as(Seq("band", "bucket")))
    // pair expansion + distance + threshold fused in the native
    // HammingPairs expression — the nested-transform HOF formulation
    // re-evaluated the bucket array per element (quadratic interpreted
    // lambdas) and materialized every rejected pair
    banded.groupBy("band", "bucket")
      .agg(graft.functions.AggExprs.cappedSortedIdSigs(
        F.struct(F.col("id"), F.col("simhash")), maxBucket).as("rows"))
      .filter(F.col("rows").isNotNull)
      .select(F.explode(graft.functions.TextExprs.hammingPairs(
        F.col("rows"), maxDistance)).as("p"))
      .select("p.*").distinct()
  }

  /** Connected components over a near-duplicate pair table: each doc in a
    * pair gets a `cluster` label = the MINIMUM doc id reachable through the
    * pair graph (so one near-dup "family" shares one label, and the label
    * itself is the canonical member).
    *
    * Algorithm: distributed min-label propagation — every iteration each
    * vertex takes the min of its own label and its neighbors' labels (one
    * join + one groupBy per round), until a fixed point. Converges in
    * O(component diameter) rounds; near-dup components are stars/cliques
    * around a template (diameter ≤ 2-3 in practice), so 3-4 rounds is
    * typical. Lineage is cut with an eager `localCheckpoint` every round —
    * without it the plan doubles per iteration and the job dies long before
    * 100 TB. For adversarially long chain-shaped graphs swap in
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"), which converges in O(log² n); not needed for
    * dedup workloads.
    *
    * The convergence probe (`isEmpty` on the changed-label set) is one extra
    * cheap job per round over the LABEL table (pairs-scale, not
    * corpus-scale). */
  def duplicateClusters(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // the edges union references `pairs` TWICE — without caching, the whole
    // upstream pair-generation pipeline (LSH + verification) would execute
    // twice inside the first job
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p
      .select(F.col("id_a").as("src"), F.col("id_b").as("dst"))
      .union(p.select(F.col("id_b").as("src"), F.col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with min(id, min(neighbors)) rather than id: star/clique
    // components — the shape near-dup families take — then converge at
    // iteration 0 and pay only the confirming round, instead of one full
    // propagation round to learn what the groupBy already knew
    // convergence probe: labels are MONOTONE non-increasing per id (next =
    // min over a union that includes the previous label) over a fixed id
    // set, so the exact decimal label sum is strictly decreasing until the
    // fixed point — sum unchanged ⟺ every label unchanged. The sum rides
    // the SAME job that materializes the round's label table (r18, guide
    // §5 job floor: `observe` plants a CollectMetrics pass-through whose
    // accumulator fills during the localCheckpoint action, read back
    // synchronously from the executed plan) — replacing the separate
    // aggregate job per round, i.e. ONE scheduled job per iteration
    // instead of two. Exactness is unchanged: the metric is the same
    // decimal sum the dedicated job computed.
    def materializeWithSum(l: DataFrame, tag: String)
        : (DataFrame, java.math.BigDecimal) = {
      val named = l.observe(tag,
        F.sum(F.col("cluster").cast("decimal(38,0)")).as("s"))
      val ck = named.localCheckpoint() // eager: runs the job, fills the metric
      val row = named.queryExecution.observedMetrics(tag)
      (ck, if (row.isNullAt(0)) java.math.BigDecimal.ZERO
           else row.getDecimal(0))
    }
    var (labels, prevSum) = materializeWithSum(
      edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min(F.col("dst"))).as("cluster"))
        .withColumnRenamed("src", "id"),
      "cc_seed") // eager: materializes (and caches) edges + pairs
    p.unpersist(false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(F.col("dst").as("id"), F.col("cluster"))
      val (next, nextSum) = materializeWithSum(
        labels.union(neighborMin)
          .groupBy("id").agg(F.min("cluster").as("cluster")),
        s"cc_$iter")
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    edges.unpersist()
    // min-label propagation moves a label one hop per round: a component
    // with diameter > maxIterations would exit here with WRONG labels and
    // no symptom — dedupNear would then keep the wrong canonical docs.
    // Fail loudly instead of returning silently-wrong clusters; the
    // escape hatch for adversarially chain-shaped graphs is the
    // large-star/small-star O(log² n) variant cited above.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge within $maxIterations rounds — " +
          "the pair graph has a component with diameter > maxIterations. " +
          "Raise maxIterations, or use a large-star/small-star variant for " +
          "chain-shaped duplicate graphs.")
    labels.select(F.col("id"), F.col("cluster"))
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log² n)-round variant that [[duplicateClusters]]'s scaladoc
    * cites as the escape hatch for chain-shaped duplicate graphs, where
    * one-hop min-label propagation needs O(diameter) rounds. Same output
    * contract as [[duplicateClusters]]: every node of the pair graph
    * labeled with its component's MINIMUM id.
    *
    * Each round is two aggregate+join passes over the edge table (always
    * pairs-scale, monotonically shrinking toward one star edge per
    * non-root node):
    *  - large-star: every node attaches its LARGER neighbors to the
    *    minimum of its neighborhood (including itself);
    *  - small-star: every node attaches its smaller-or-equal neighbors
    *    (and itself) to that minimum.
    * Edges stay canonically (hi, lo); a fixed point — reached in
    * O(log² n) rounds on ANY graph shape — is exactly the star forest
    * whose centers are the component minima, detected IN the round that
    * produces it (see the in-loop comment). Per-round `localCheckpoint`
    * cuts lineage like every iterative operator here. */
  def duplicateClustersStar(pairs: DataFrame,
      maxIterations: Int = 30): DataFrame = {
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // canonical (hi, lo), deduped, self-loops dropped
    var edges = p
      .select(F.greatest(F.col("id_a"), F.col("id_b")).as("hi"),
        F.least(F.col("id_a"), F.col("id_b")).as("lo"))
      .filter(F.col("hi") =!= F.col("lo")).distinct()
      .localCheckpoint()
    // nodes appearing ONLY in self-loop pairs: the hi =!= lo filter drops
    // them from the star rounds, but [[duplicateClusters]] labels them to
    // themselves — honor the same-output contract by unioning them back at
    // the end. Eager checkpoint: evaluated while `p` is still cached.
    val selfNodes = p.filter(F.col("id_a") === F.col("id_b"))
      .select(F.col("id_a").as("id")).distinct()
      .localCheckpoint()
    p.unpersist(false)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIterations) {
      // ---- large-star: attach strictly-larger neighbors to the
      // neighborhood minimum m(u) = min(Γ(u) ∪ {u}). NO intra-round
      // distinct: the only consumers are min-aggregates and `next`'s own
      // distinct, neither of which a duplicate row can perturb, and the
      // duplicate volume is bounded by |bidir| = 2|E| — dropping the
      // dedup shuffle saves two stages per round.
      val bidir = edges.select(F.col("hi").as("u"), F.col("lo").as("v"))
        .unionAll(edges.select(F.col("lo").as("u"), F.col("hi").as("v")))
      val mLarge = bidir.groupBy("u")
        .agg(F.least(F.col("u"), F.min("v")).as("m"))
      val large = bidir.join(mLarge, "u")
        .filter(F.col("v") > F.col("u") && F.col("v") =!= F.col("m"))
        .select(F.col("v").as("hi"), F.col("m").as("lo"))
      // ---- small-star: attach every ≤ neighbor (and the node itself) to
      // m(hi) = min(Γ≤(hi) ∪ {hi}) — all los are < hi, so m = min(lo)
      val mSmall = large.groupBy("hi").agg(F.min("lo").as("m"))
      val next = large.join(mSmall, "hi")
        .filter(F.col("lo") =!= F.col("m"))
        .select(F.col("lo").as("hi"), F.col("m").as("lo"))
        .unionAll(mSmall.select(F.col("hi"), F.col("m").as("lo")))
        .distinct()
        .localCheckpoint()
      // IN-ROUND fixed-point detection. Both star ops preserve the
      // invariant lo < hi, so the alternation's fixed point — each
      // component one star centered on its minimum — is EXACTLY "the edge
      // set is a star forest": no hi repeats (one root per child) and no
      // node is both child (hi) and root (lo). Any non-forest set has a
      // mergeable node and is not fixed; any forest with lo < hi has
      // centers = component minima and both ops are the identity on it.
      // One union+aggregate job over the checkpointed table, detecting
      // convergence in the round that PRODUCES the fixed point — the old
      // (count, xor) signature screen needed one more identity round to
      // see the signature repeat, plus an exceptAll confirmation against
      // hash collisions; this test is exact and a round cheaper.
      converged = next
        .select(F.col("hi").as("n"), F.lit(1L).as("h"), F.lit(0L).as("r"))
        .unionAll(next
          .select(F.col("lo").as("n"), F.lit(0L).as("h"), F.lit(1L).as("r")))
        .groupBy("n").agg(F.sum("h").as("hs"), F.sum("r").as("rs"))
        .filter(F.col("hs") > 1L || (F.col("hs") > 0L && F.col("rs") > 0L))
        .isEmpty
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClustersStar did not converge within $maxIterations " +
          "rounds — raise maxIterations (bound is O(log² n) star rounds).")
    // fixed point = star forest (child, root): children label to their
    // root, roots label to themselves
    val labeled = edges
      .select(F.col("hi").as("id"), F.col("lo").as("cluster"))
      .unionAll(edges.select(F.col("lo").as("id"), F.col("lo").as("cluster")))
      .distinct()
    labeled.unionAll(
      selfNodes.join(labeled, Seq("id"), "left_anti")
        .select(F.col("id"), F.col("id").as("cluster")))
  }

  /** End-to-end near-dedup: MinHash-LSH pairs → connected components →
    * keep ONE canonical doc per cluster (the min id) plus every unpaired
    * doc. The anti-join key set (non-canonical cluster members) is
    * pairs-scale, so Spark broadcasts it in the common case where dups are
    * a small fraction of the corpus. */
  def dedupNear(df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val pairs = minhashDuplicatePairs(df, id, text, threshold, shingleSize,
      numHashes, bands)
    val losers = duplicateClusters(pairs)
      .filter(F.col("id") =!= F.col("cluster"))
      .select(F.col("id").as("__loser"))
    df.join(losers, id === F.col("__loser"), "left_anti")
  }

  /** Near-dedup keeping the BEST-scoring member of each duplicate cluster
    * instead of the minimum id — the production posture once a quality
    * signal exists (dedup then quality-filter wastes the cluster's best
    * text whenever the min-id member happens to be the worst one).
    * `score` is any per-row expression over `df`'s columns (quality score,
    * token count, recency); the winner is the member with the maximum
    * score, ties broken toward the SMALLEST id so the result is
    * deterministic under score collisions.
    *
    * Scale shape: identical to [[dedupNear]] — the cluster table is
    * pairs-scale, so the winner election (a groupBy over cluster members
    * only, never the corpus) and the final anti-join key set stay small;
    * the corpus itself is scanned once for pair generation and once for
    * the anti-join, never shuffled on its own rows. */
  def dedupNearKeepBest(df: DataFrame, id: Column, text: Column,
      score: Column, threshold: Double, shingleSize: Int = 3,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val pairs = minhashDuplicatePairs(df, id, text, threshold, shingleSize,
      numHashes, bands)
    val clusters = duplicateClusters(pairs)
    // score only the clustered members — and make sure the PLAN agrees:
    // the member restriction (join) sits BELOW the scoring projection,
    // so the score expression (arbitrary and possibly expensive — a
    // quality model, a token count) evaluates on the pairs-scale member
    // set only. The previous shape projected the score off the raw scan
    // and joined after; Catalyst does not push computed projections
    // through joins, so every corpus row paid the score (measured: the
    // election tail at sf0.1 was 1.3-1.6 s vs 0.16 s for dedupNear's —
    // restricting first removes the corpus-wide evaluation). Clusters
    // are pairs-scale in the common low-dup-rate case, so Spark
    // auto-broadcasts them into the corpus scan (no forced hint — a
    // pathological corpus where most docs are duplicates makes the
    // cluster table corpus-scale, and a forced broadcast would OOM the
    // driver exactly when the job is hardest).
    val members = df
      .join(clusters.select(F.col("id").as("__kb_cid"),
        F.col("cluster").as("__kb_cluster")), id === F.col("__kb_cid"))
      .select(F.col("__kb_cluster"), F.col("__kb_cid"),
        score.as("__kb_score"))
    // max over struct(score, -id): highest score wins; a null score loses
    // to any non-null one (struct ordering ranks null fields lowest); ties
    // — including all-null clusters — fall to the smallest id via -id
    val winners = members.groupBy("__kb_cluster")
      .agg(F.max(F.struct(F.col("__kb_score"),
        F.negate(F.col("__kb_cid")).as("__kb_neg"))).as("__kb_w"))
      .select(F.negate(F.col("__kb_w.__kb_neg")).as("__kb_keep"))
    val losers = clusters.join(winners,
        F.col("id") === F.col("__kb_keep"), "left_anti")
      .select(F.col("id").as("__loser"))
    df.join(losers, id === F.col("__loser"), "left_anti")
  }

  /** Benchmark-contamination detection — the standard decontamination pass
    * before training (GPT-3 appx C / PaLM-style n-gram overlap): for every
    * (corpus doc, benchmark doc) pair sharing at least `minOverlap` distinct
    * word `shingleSize`-grams, emit the shared-shingle count and the overlap
    * ratio `n_shared / |benchmark shingle set|` (the fraction of the eval
    * item's n-grams present in the training doc).
    *
    * Scale shape: the benchmark side is small by construction (eval suites
    * are thousands of rows; the corpus is the 100 TB side), so its exploded
    * (shingle-hash, bench_id) postings BROADCAST — the corpus streams
    * through shingling + a broadcast hash join and never shuffles; only
    * matched (doc, bench) pairs enter the single aggregation shuffle.
    * Shingle identities are 64-bit hashes ([[shingleHashes]]) so the join
    * key is fixed-width regardless of n-gram length. */
  def contamination(corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      shingleSize: Int = 3, minOverlap: Int = 2): DataFrame = {
    val corpusPost = corpus.select(asLongId(corpusId).as("doc_id"),
      F.explode(shingleHashes(corpusText, shingleSize)).as("g"))
    val benchSh = bench.select(asLongId(benchId).as("bench_id"),
      shingleHashes(benchText, shingleSize).as("s"))
    val benchPost = benchSh.select(F.col("bench_id"),
      F.explode(F.col("s")).as("g"))
    val benchSizes = benchSh.select(F.col("bench_id"),
      F.size(F.col("s")).as("__bn"))
    // shingleHashes is distinct-per-doc, so the per-(doc, bench) match
    // count IS the intersection size
    corpusPost.join(F.broadcast(benchPost), Seq("g"))
      .groupBy("doc_id", "bench_id").agg(F.count(F.lit(1)).as("n_shared"))
      .filter(F.col("n_shared") >= minOverlap)
      .join(F.broadcast(benchSizes), Seq("bench_id"))
      .select(F.col("doc_id"), F.col("bench_id"), F.col("n_shared"),
        (F.col("n_shared").cast(DoubleType) / F.col("__bn"))
          .as("overlap_ratio"))
  }

  /** The benchmark side of [[decontaminate]], collected ONCE: the distinct
    * shingle-hash identities of the eval suite, sorted for binary search.
    * Eval suites are small by construction (thousands of items), so the
    * collect is bounded — the same posture as IVF centroid training. */
  def benchShingleHashes(bench: DataFrame, benchText: Column,
      shingleSize: Int = 3): Array[Long] = {
    val hs = bench
      .select(F.explode(shingleHashes(benchText, shingleSize)).as("g"))
      .distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(hs)
    hs
  }

  /** Contamination overlap as a pure per-row Column: how many of the doc's
    * distinct shingles appear in the benchmark set (see
    * [[graft.functions.SortedSetOverlap]] — binary search against a
    * plan-literal sorted array, not a per-row hash set). */
  def contaminationOverlap(text: Column, benchHashes: Array[Long],
      shingleSize: Int = 3): Column =
    graft.functions.TextExprs.sortedSetOverlap(
      shingleHashes(text, shingleSize), benchHashes)

  /** Drop documents sharing at least `minOverlap` shingles with the
    * benchmark set — the decontamination filter as a STATELESS scan
    * expression: no join, no shuffle, no state, which makes it legal (and
    * cheap) in a Structured Streaming ingest pipeline as well as batch.
    * Use [[contamination]] when you need per-(doc, bench-item) attribution;
    * use this to gate a 100 TB scan (or a live stream) at full speed. */
  def decontaminate(df: DataFrame, text: Column, benchHashes: Array[Long],
      shingleSize: Int = 3, minOverlap: Int = 2): DataFrame =
    df.filter(
      contaminationOverlap(text, benchHashes, shingleSize) < minOverlap)

  /** Cross-document line-level dedup (the C4/RefinedWeb boilerplate pass):
    * drop every line whose TRIMMED form occurs in at least `minDocs`
    * distinct documents (nav bars, cookie banners, shared footers), then
    * reassemble each document from its surviving lines in original order.
    * Documents left with no surviving lines are dropped, matching C4.
    *
    * Scale shape: lines explode scan-side; line document-frequency
    * aggregates on `xxhash64(trim(line))` — an 8-byte shuffle key, with the
    * (key, doc) distinct as a map-side-combinable first level — and the
    * duplicated-key set joins back as a hash join (it is the small side:
    * only lines that actually repeat across `minDocs` docs). Reassembly is
    * one groupBy(doc) over surviving lines; per-group state is one
    * document's lines. The corpus is scanned twice (frequency pass + the
    * rebuild pass) — inherent to any two-sided frequency filter; at 100 TB
    * the first pass's output (the dup-key set) is the only thing retained. */
  def dedupLines(df: DataFrame, id: Column, text: Column,
      minDocs: Int = 2): DataFrame = {
    val lines = df.select(asLongId(id).as("id"),
      F.posexplode(F.split(text, "\n")).as(Seq("pos", "line")))
      .withColumn("__k", F.xxhash64(F.trim(F.col("line"))))
    val dupKeys = lines.select("__k", "id").distinct()
      .groupBy("__k").agg(F.count(F.lit(1)).as("__ndocs"))
      .filter(F.col("__ndocs") >= minDocs)
      .select("__k")
    lines.join(dupKeys, Seq("__k"), "left_anti")
      .groupBy("id")
      .agg(F.array_join(
        F.transform(
          F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("line")))),
          s => s.getField("line")), "\n").as("text"))
  }

  /** Cross-document duplicated-SPAN dedup — the token-level ExactSubstr
    * pass (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499; one granularity finer than
    * [[dedupLines]]): remove every `k`-token span whose exact token
    * sequence occurs in at least `minDocs` distinct documents, then
    * reassemble each document from the surviving tokens in original
    * order. A token is removed iff SOME duplicated span covers it;
    * documents left with no surviving tokens are dropped (the
    * [[dedupLines]] contract). Tokens are the whitespace split of the
    * lowercased trimmed text, matching the shingle family.
    *
    * Scale shape: k-gram postings explode scan-side carrying
    * `(id, pos, xxhash64(gram))` — fixed-width 8-byte keys regardless of
    * span text; document frequency aggregates two-level ((key, doc)
    * distinct first, map-side combinable) exactly like [[dedupLines]];
    * the duplicated-span key set is the SMALL side by construction (only
    * spans that actually repeat — boilerplate) and hash-joins back onto
    * the postings; coverage + rebuild is one groupBy(doc) whose state is
    * one document's hit positions and tokens. Two corpus scans — inherent
    * to any two-sided frequency filter; the only cross-document artifact
    * retained between them is the hot-key set. Token filtering is
    * O(tokens × hits-per-doc) per row — hits are boilerplate occurrences,
    * a vanishing fraction of tokens on real corpora. */
  def dedupSpans(df: DataFrame, id: Column, text: Column,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"span length k must be >= 1, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = F.when(F.length(F.trim(text)) === 0,
      F.array().cast(ArrayType(StringType)))
      .otherwise(F.split(F.lower(F.trim(text)), "\\s+"))
    val base = df.select(asLongId(id).as("id"), toks.as("__t"))
    // k-gram postings with 1-based start positions; sequence() must be
    // guarded (Spark's sequence(1, 0) runs DESCENDING, not empty)
    val starts = F.when(F.size(F.col("__t")) >= k,
      F.sequence(F.lit(1), F.size(F.col("__t")) - (k - 1)))
      .otherwise(F.array().cast(ArrayType(IntegerType)))
    val grams = base.select(F.col("id"), F.explode(
      F.transform(starts, i => F.struct(i.as("hp"),
        F.xxhash64(F.array_join(F.slice(F.col("__t"), i, F.lit(k)), " "))
          .as("__g")))).as("z"))
      .select(F.col("id"), F.col("z.hp"), F.col("z.__g"))
    val hot = grams.select("__g", "id").distinct()
      .groupBy("__g").agg(F.count(F.lit(1)).as("__nd"))
      .filter(F.col("__nd") >= minDocs)
      .select("__g")
    val perDocHits = grams.join(hot, Seq("__g"))
      .groupBy("id").agg(F.collect_list("hp").as("__hits"))
    val hitsArr = F.coalesce(F.col("__hits"),
      F.array().cast(ArrayType(IntegerType)))
    val kept = F.filter(F.col("__t"),
      (_, i0) => !F.exists(hitsArr, p => p <= i0 + 1 && i0 + 1 < p + k))
    base.join(perDocHits, Seq("id"), "left")
      .select(F.col("id"), kept.as("__kept"))
      .filter(F.size(F.col("__kept")) > 0)
      .select(F.col("id"), F.array_join(F.col("__kept"), " ").as("text"))
  }

  /** Cross-corpus EXACT dedup — drop rows of `df` whose `key` appears in
    * the reference corpus (incremental ingest: dedup a new batch against
    * the already-accepted corpus without re-deduping the corpus itself).
    * One anti join on 8-byte `xxhash64(key)` — the shuffle carries hashes,
    * never the text, on both sides. */
  def dedupAgainstExact(df: DataFrame, key: Column,
      ref: DataFrame, refKey: Column): DataFrame =
    df.join(ref.select(F.xxhash64(refKey).as("__rk")).distinct(),
      F.xxhash64(key) === F.col("__rk"), "left_anti")

  /** Cross-corpus NEAR dedup: drop documents of `df` with MinHash-verified
    * Jaccard ≥ `threshold` against ANY reference document — the
    * incremental-ingest twin of [[dedupNear]] (new-vs-new duplicates are
    * deliberately kept: dedup within the batch is [[dedupNear]]'s job).
    *
    * Scale shape: both corpora run the same fused shingle→minhash→band
    * scan and meet ONLY inside (band, bucket) groups — the reference side
    * never re-pairs against itself and the candidate set is cross-side
    * pairs only, so adding a 100 TB accepted corpus costs its banding scan
    * plus bucket-local work, never a corpus×corpus join. Implemented by
    * running [[minhashLshCandidates]] over the tagged union (reference ids
    * encoded negative — ordered pairs then put the reference member first,
    * making cross-side pairs a constant-time filter) and verifying exact
    * Jaccard on the surviving pairs only.
    *
    * Both id columns must be non-negative (they are widened to long; the
    * negative range encodes the reference side). ENFORCED, not assumed: a
    * negative or null id on either side would be silently misclassified
    * as the other side and corrupt the losers set, so each `__uid`
    * projection folds an `assert_true` over the row — the job fails loudly
    * at the first violating row, at scan speed, with no extra pass. */
  def dedupAgainstNear(df: DataFrame, id: Column, text: Column,
      ref: DataFrame, refId: Column, refText: Column,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8, maxBucket: Int = 1000): DataFrame = {
    val newSide = df.select(
      checkedNonNegId(id, "dedupAgainstNear: df id").as("__uid"),
      text.as("__ut"))
    val refSide = ref.select(
      (-checkedNonNegId(refId, "dedupAgainstNear: ref id") - 1).as("__uid"),
      refText.as("__ut"))
    val union = newSide.unionAll(refSide)
    // one text pass over the union (r18): candidates band-hash from the
    // shared cached shingle scan, verification joins the same cache
    val hashed = hashedShingles(union, F.col("__uid"), F.col("__ut"),
      shingleSize)
    val cross = lshCandidatesFromHashes(hashed, numHashes, bands, maxBucket)
      // pairs come out sorted (id_a < id_b): a cross-side pair is exactly
      // "negative (reference) first, non-negative (new) second"
      .filter(F.col("id_a") < 0 && F.col("id_b") >= 0)
    val contaminated = verifyJaccardHashed(hashed, cross, threshold)
      .select(F.col("id_b").as("__loser")).distinct()
    df.join(contaminated, asLongId(id) === F.col("__loser"), "left_anti")
  }

  /** Write a reusable ON-DISK MinHash LSH index over the accepted corpus —
    * the index-once/dedup-many posture for incremental ingest (the minhash
    * twin of [[Similarity]]'s cell-partitioned IVF disk index, d43).
    * [[dedupAgainstNear]] re-scans and re-shingles the FULL accepted corpus
    * for every incoming batch; at large scale the accepted side dwarfs any
    * batch, so its scan must be paid once and persisted:
    *
    *  - `path/features`: `(id, sh: array<bigint>)` in `seg=<segment>`
    *    partitions (`seg=base` from this writer; appends add their own) —
    *    each doc's distinct shingle hashes, written from the index
    *    build's single corpus scan. Candidate verification joins THIS
    *    table, so verification stays EXACT Jaccard (identical semantics
    *    to [[verifyJaccard]]) without ever touching corpus text again;
    *  - `path/postings`: `(bucket, ids: array<bigint>, seg, band)`
    *    written `partitionBy("seg", "band")` (segment partitions make
    *    [[appendToMinhashIndex]] retry-idempotent via dynamic partition
    *    overwrite) — LSH band buckets from the same fused
    *    native shingle→minhash→band expression the live path scans with
    *    ([[graft.functions.TextExprs.minhashBandHashes]] — writer and
    *    prober share the expression, which is all bucket agreement
    *    requires), saturating-capped at `maxBucket` (boilerplate buckets
    *    are dropped as pair noise, exactly the live path's guardrail) but
    *    KEEPING singleton buckets: a future batch doc may land in one.
    *    Band partitioning makes `probeBands` (below) a static partition
    *    filter — the IVF `nprobe` analogue;
    *  - `path/meta`: one row of build parameters, so readers never have
    *    to repeat them (a mismatched shingle size would silently produce
    *    disjoint bucket spaces).
    *
    * Build cost: two native-speed corpus scans (features, postings) —
    * deliberately NOT fused via a corpus-scale persist, which would be
    * the wrong trade on an accepted corpus far larger than memory. */
  private case class IndexMeta(shingleSize: Int, numHashes: Int,
      bands: Int, maxBucket: Int)

  /** Process-wide cache of `path/meta` keyed on FILE IDENTITY (canonical
    * URI + per-part length/mtime via one Hadoop `listStatus`), so the
    * 24/7 ingest stream stops paying two driver JOBS of fixed overhead
    * per micro-batch on an immutable 1-row table (r9 verdict watch #2) —
    * the listing RPC is orders cheaper than a parquet read + collect. A
    * REGENERATED index at the same path changes part identity and
    * re-reads (the same rule as SparkEntry's tableKey caches); entries
    * are 4 ints each and only accrete per index GENERATION, so the map
    * stays bounded on any long-running process. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexMeta]()

  private def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): IndexMeta = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = fs.listStatus(p).sortBy(_.getPath.getName)
      .map(s => s"${s.getPath}|${s.getLen}|${s.getModificationTime}")
      .mkString(";")
    metaCache.computeIfAbsent(key, _ => {
      // field names, not ordinals: a meta row written by another version
      // with reordered columns must fail loudly, not silently swap
      // shingle size for hash count and produce a disjoint bucket space
      val meta = spark.read.parquet(s"$path/meta").collect().head
      IndexMeta(meta.getAs[Int]("shingle_size"),
        meta.getAs[Int]("num_hashes"), meta.getAs[Int]("bands"),
        meta.getAs[Int]("max_bucket"))
    })
  }

  def writeMinhashIndex(corpus: DataFrame, id: Column, text: Column,
      path: String, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8, maxBucket: Int = 1000): Unit = {
    require(numHashes % bands == 0,
      s"numHashes $numHashes must divide into bands $bands")
    val spark = corpus.sparkSession
    // on a path that ALREADY holds an index this is an atomic staged
    // rebuild (the writeIvfIndex posture): a table-by-table overwrite
    // with changed params crash-leaves new postings under the old meta —
    // probes then band-hash with the old (numHashes, bands) into a
    // DISJOINT bucket space and every near-dup sails through silently
    // (exactly the failure the meta reader's field-name check warns
    // about, reachable without any version skew). The commit is ONE
    // whole-layout directory swap (Similarity.swapLayout): the staged
    // sibling holds the complete new layout, so no crash point can ever
    // expose features/postings/meta from two builds — the per-table swap
    // this replaced had exactly that window between table renames.
    val hconf = spark.sparkContext.hadoopConfiguration
    val hasLayout = {
      val p = new org.apache.hadoop.fs.Path(s"$path/meta")
      p.getFileSystem(hconf).exists(p)
    }
    val target = if (hasLayout) Similarity.stageDir(spark, path, "__rebuild")
      else path
    val base = corpus.select(asLongId(id).as("id"), text.as("__t"))
    // seg=base: both tables are SEGMENT-partitioned so incremental appends
    // ([[appendToMinhashIndex]]) land as their own dynamically-overwritten
    // partitions — a retried ingest batch rewrites its segment instead of
    // double-appending (the exactly-once half the streaming path needs).
    // ONE text-processing pass (r17 optimization): the shingle hashes are
    // computed once, cached across the two table writes, and postings
    // band-hash FROM THE HASHES ([[graft.functions.TextExprs
    // .minhashBandHashesFromHashes]]) — the identity the compactor's
    // row-identity spec already pins (MinHash over stored distinct
    // shingle hashes equals MinHash over text). The previous shape
    // normalized + tokenized + hashed the whole corpus text twice.
    val feats = base
      .select(F.col("id"), shingleHashes(F.col("__t"), shingleSize).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      feats
        .withColumn("seg", F.lit("base"))
        .write.mode("overwrite").partitionBy("seg")
        .parquet(s"$target/features")
      feats
        .select(F.col("id"),
          F.posexplode(graft.functions.TextExprs
            .minhashBandHashesFromHashes(F.col("sh"), numHashes, bands))
            .as(Seq("band", "bucket")))
        .groupBy("band", "bucket")
        .agg(graft.functions.AggExprs
          .cappedSortedIds(F.col("id"), maxBucket, minSize = 1).as("ids"))
        .filter(F.col("ids").isNotNull)
        .select(F.col("band"), F.col("bucket"), F.col("ids"),
          F.lit("base").as("seg"))
        .write.mode("overwrite").partitionBy("seg", "band")
        .parquet(s"$target/postings")
    } finally {
      feats.unpersist(false)
      ()
    }
    // one-row meta, driver-side (zero jobs — r17 optimization)
    graft.io.GraftIO.writeSmallParquet(spark,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shingle_size",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("num_hashes",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bands",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("max_bucket",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      Seq(org.apache.spark.sql.Row(shingleSize, numHashes, bands,
        maxBucket)),
      s"$target/meta")
    if (hasLayout)
      Similarity.swapLayout(spark, path, target, "rebuild")
  }

  /** Near-dedup an incoming batch against a persisted [[writeMinhashIndex]]
    * index WITHOUT re-reading the accepted corpus: candidates from a
    * bucket join of the batch's banded signature against `path/postings`,
    * verified by EXACT shingle-set Jaccard against `path/features` — same
    * decision rule as [[dedupAgainstNear]], minus the corpus re-scan,
    * INCLUDING the `maxBucket` cap on the corpus+batch union bucket (see
    * the in-body comment). Batch-internal duplicates are deliberately
    * kept ([[dedupNear]]'s job), mirroring [[dedupAgainstNear]].
    *
    * `probeBands`: probe only the first k of the index's bands — a STATIC
    * partition filter on the band-partitioned postings (only those bands'
    * files are read), trading recall for IO exactly like IVF `nprobe`;
    * default probes all bands (full LSH recall). */
  def dedupAgainstIndex(df: DataFrame, id: Column, text: Column,
      path: String, threshold: Double,
      probeBands: Option[Int] = None,
      excludeSegment: Option[String] = None): DataFrame =
    dedupAgainstIndexManaged(df, id, text, path, threshold, probeBands,
      excludeSegment)._1

  /** [[dedupAgainstIndex]] plus a release thunk dropping the internal
    * one-scan batch cache INCLUDING its CacheManager entry (Dataset-level
    * unpersist). One-shot callers can ignore it (Verify/Bench clear the
    * cache per query anyway); a LONG-RUNNING caller — the ingest stream —
    * must call it after consuming the result, because an RDD-level sweep
    * frees the blocks but leaves the CacheManager entry pinning the
    * batch's analyzed plan and file listing forever. */
  def dedupAgainstIndexManaged(df: DataFrame, id: Column, text: Column,
      path: String, threshold: Double,
      probeBands: Option[Int] = None,
      excludeSegment: Option[String] = None): (DataFrame, () => Unit) = {
    val (deduped, _, release) = dedupAgainstIndexWithSigs(df, id, text,
      path, threshold, probeBands, excludeSegment)
    (deduped, release)
  }

  /** [[dedupAgainstIndexManaged]] that ALSO exposes the probe's cached
    * per-doc signature frame (`bid`, `bsh` shingle hashes, `__bb` band
    * hashes) so the ingest loop's append step can reuse it
    * ([[appendSurvivorsFromSigs]]) instead of re-shingling and re-hashing
    * the batch text a second time (r17 optimization — the append phase
    * carried a full repeat of the batch's text processing per trigger).
    * The sigs frame is backed by the SAME cache the release thunk frees:
    * consume it before calling release. */
  /** `indexFrames`: pre-scanned (features, postings) frames — the ingest
    * loop's cross-trigger segment snapshots ([[graft.streaming
    * .SegmentScanCache]], r18), row-identical to the plain reads minus
    * the excluded segment. None keeps the per-call parquet reads. */
  private[graft] def dedupAgainstIndexWithSigs(df: DataFrame, id: Column,
      text: Column, path: String, threshold: Double,
      probeBands: Option[Int] = None,
      excludeSegment: Option[String] = None,
      indexFrames: Option[(DataFrame, DataFrame)] = None)
      : (DataFrame, DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val IndexMeta(shingleSize, numHashes, bands, maxBucket) =
      readIndexMeta(spark, path)
    val probe = probeBands.getOrElse(bands)
    require(probe >= 1 && probe <= bands,
      s"probeBands $probe out of [1, $bands]")
    // one batch scan: shingle hashes (verification) and band buckets
    // (candidates) computed together and persisted — the two consumers
    // are separate subtrees. Band hashes derive FROM the shingle hashes
    // (r17: one text normalization/tokenization pass instead of two;
    // minhashBandHashesFromHashes ≡ minhashBandHashes-over-text is the
    // identity the compactor's row-identity spec pins). The chained
    // select keeps the hash reuse visible to Catalyst (CollapseProject
    // does not merge projects that would duplicate a non-cheap
    // expression).
    val batch = df
      .select(asLongId(id).as("bid"),
        shingleHashes(text, shingleSize).as("bsh"))
      .select(F.col("bid"), F.col("bsh"),
        graft.functions.TextExprs.minhashBandHashesFromHashes(
          F.col("bsh"), numHashes, bands).as("__bb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // batch side aggregated under the SAME saturating cap as the index
    // side, and the pair drops any bucket whose corpus+batch UNION
    // exceeds maxBucket — the exact semantics of the live path's capped
    // union bucket. Without this, a boilerplate text shared by the whole
    // batch joins a stored ≤ maxBucket posting row into |batch|·maxBucket
    // candidate rows — the quadratic blowup the cap exists to refuse.
    val batchBuckets = batch.select(F.col("bid"),
      F.posexplode(F.col("__bb")).as(Seq("band", "bucket")))
      .filter(F.col("band") < probe)
      .groupBy("band", "bucket")
      .agg(graft.functions.AggExprs
        .cappedSortedIds(F.col("bid"), maxBucket, minSize = 1).as("bids"))
      .filter(F.col("bids").isNotNull)
    // excludeSegment: a RETRIED ingest batch may find its own partially-
    // written segment from the failed attempt — probing it would make
    // batch docs candidates against themselves (self-Jaccard 1 ⇒ every
    // doc dies). The in-flight segment is excluded from both tables; both
    // filters are partition pruning.
    def dropSeg(t: DataFrame): DataFrame =
      excludeSegment.fold(t)(s => t.filter(F.col("seg") =!= s))
    val postings = dropSeg(indexFrames.map(_._2)
        .getOrElse(spark.read.parquet(s"$path/postings")))
      .filter(F.col("band") < probe) // static partition pruning
    val cands = batchBuckets.join(postings, Seq("band", "bucket"))
      .filter(F.size(F.col("bids")) + F.size(F.col("ids")) <= maxBucket)
      .select(F.explode(F.col("bids")).as("bid"), F.col("ids"))
      .select(F.col("bid"), F.explode(F.col("ids")).as("iid"))
      .distinct()
    val feats = dropSeg(indexFrames.map(_._1)
        .getOrElse(spark.read.parquet(s"$path/features")))
      .drop("seg")
    val losers = cands
      .join(feats.withColumnsRenamed(Map("id" -> "iid", "sh" -> "ish")), "iid")
      .join(batch.select("bid", "bsh"), "bid")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("ish"), F.col("bsh"))).cast(DoubleType) /
          F.size(F.array_union(F.col("ish"), F.col("bsh"))))
      .filter(F.col("jaccard") >= threshold)
      .select(F.col("bid").as("__loser")).distinct()
    (df.join(losers, asLongId(id) === F.col("__loser"), "left_anti"),
      batch, () => { batch.unpersist(false); () })
  }

  /** Append an ingest batch's SURVIVORS to the index from the probe's own
    * cached signature frame ([[dedupAgainstIndexWithSigs]]) — row-identical
    * to `appendToMinhashIndex(survivors, id, text, …)` by construction
    * (`bsh`/`__bb` are the very expressions the text append computes, built
    * from the same meta parameters), minus the second shingling +
    * minhashing pass over the batch text. Private plumbing for the
    * streaming ingest loop: `sigs` must come from the same batch `survivors`
    * was filtered from, and the sigs cache must still be alive.
    *
    * `probeExcludedSegment` is the exclusion the PROBE that produced
    * `sigs`/`survivors` ran with, REQUIRED to equal `segment` (r17 ADVICE):
    * `survivors` reads the index through the probe's anti-join, so any
    * re-execution against the listing this append refreshes must still
    * exclude the segment being written — a caller without the exclusion
    * would self-match at Jaccard 1 and write features with empty postings,
    * the silent-index-corruption hazard [[appendToMinhashIndex]]'s
    * in-body comment documents. Enforced, not conventional. */
  private[graft] def appendSurvivorsFromSigs(sigs: DataFrame,
      survivors: DataFrame, id: Column, path: String,
      segment: String, probeExcludedSegment: Option[String]): Unit = {
    require(segment.nonEmpty && segment != "base" &&
      segment.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"segment '$segment' must be a filesystem-safe label != 'base'")
    require(probeExcludedSegment.contains(segment),
      s"appendSurvivorsFromSigs: the probe that produced the survivors " +
        s"must have excluded the segment being written (excluded " +
        s"$probeExcludedSegment, writing '$segment') — without the " +
        "exclusion a plan re-execution against the refreshed listing " +
        "self-matches at Jaccard 1 and corrupts the index")
    val spark = sigs.sparkSession
    val IndexMeta(_, _, _, maxBucket) = readIndexMeta(spark, path)
    // survivor ids pinned OUTSIDE the CacheManager before any index write
    // (r18, closing the r17 ADVICE residue): `survivors`' plan reads the
    // index through the probe's anti-join, so the features insert's
    // refreshByPath clears its cache entry and the postings pass would
    // RE-EXECUTE the entire probe (pruned index scan, banding join, exact
    // Jaccard) against the refreshed listing — correct under the enforced
    // exclusion, but a full repeat of the dominant per-trigger cost. A
    // localCheckpoint is invisible to the refresh and O(survivor ids);
    // handle-exact release (Scratch) because checkpoint blocks live
    // outside the CacheManager.
    val (survIds, releaseIds) = graft.Scratch.snapshotManaged(
      survivors.select(asLongId(id).as("bid")))
    // the semi-joined signature frame feeds BOTH table writes; persist it
    // so the second write replays cached rows instead of re-running the
    // semi-join (and its AQE materializations — measured +5 driver jobs
    // per trigger on the dedup ingest stream). Its plan holds only the
    // sigs cache and the checkpointed ids — no file source under `path` —
    // so the features insert's refresh cannot touch it.
    val s = sigs.join(survIds, Seq("bid"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      s.select(F.col("bid").as("id"), F.col("bsh").as("sh"),
          F.lit(segment).as("seg"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg").parquet(s"$path/features")
      s.select(F.col("bid").as("id"),
          F.posexplode(F.col("__bb")).as(Seq("band", "bucket")))
        .groupBy("band", "bucket")
        .agg(graft.functions.AggExprs
          .cappedSortedIds(F.col("id"), maxBucket, minSize = 1).as("ids"))
        .filter(F.col("ids").isNotNull)
        .select(F.col("band"), F.col("bucket"), F.col("ids"),
          F.lit(segment).as("seg"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg", "band").parquet(s"$path/postings")
    } finally {
      s.unpersist(false)
      releaseIds()
    }
  }

  /** Append newly-accepted docs to a persisted [[writeMinhashIndex]] index —
    * the GROW step of incremental ingest: probe a batch
    * ([[dedupAgainstIndex]]), then append its survivors so the NEXT batch
    * dedups against them too, without ever rebuilding the index.
    *
    * Appends are SEGMENTS (`seg=<segment>` partitions), written with
    * DYNAMIC partition overwrite: re-running the same segment REPLACES its
    * partitions instead of double-appending, which makes a retried
    * streaming batch idempotent (the segment's content is deterministic
    * given the index state before it, and earlier segments are untouched
    * by the rewrite). `features` segmentation is invisible to readers
    * (the verification join reads all rows per id); `postings` gains a
    * per-segment row for any (band, bucket) the batch lands in —
    * [[dedupAgainstIndex]]'s bucket join explodes every posting row for a
    * bucket and `distinct`s candidates, so candidate GENERATION is
    * segment-transparent, while the `maxBucket` union-cap is enforced per
    * SEGMENT pair, degrading toward per-segment granularity as segments
    * accumulate. At high segment counts, compact ([[compactMinhashIndex]])
    * — the same posture as any LSM-shaped index. Measured trigger
    * (`graft.SegmentStudy`, scaling/mh_segments.json): at 20k docs probe
    * latency is flat through ~16 segments and ~75% over the floor by 64
    * (per-segment posting rows + file-listing overhead); compaction cost
    * ~1.8 s and restored the floor, paying for itself within a handful
    * of probes — compact when the segment count reaches the tens, or on
    * a cadence cheap relative to the batch rate. Build parameters come from
    * `path/meta`, by field name, so an appender can never silently
    * diverge from the writer's bucket space. */
  def appendToMinhashIndex(batch: DataFrame, id: Column, text: Column,
      path: String, segment: String): Unit = {
    require(segment.nonEmpty && segment != "base" &&
      segment.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"segment '$segment' must be a filesystem-safe label != 'base'")
    val spark = batch.sparkSession
    val IndexMeta(shingleSize, numHashes, bands, maxBucket) =
      readIndexMeta(spark, path)
    // DELIBERATELY two independent from-text passes — do NOT "optimize"
    // this into a persist-once shape (r17 finding, reproduced in
    // IOStreamsSpec's lazy-probe parity assert): callers legitimately
    // pass a LAZY probe result over THIS SAME index (probe → append is
    // the canonical sequence), and caching a frame derived from that
    // input pins it into the CacheManager, whose write-triggered refresh
    // (`refreshByPath` at the end of the features insert) RE-EXECUTES the
    // cached plan against the refreshed file listing — the probe then
    // sees the segment this very append just wrote, self-matches at
    // Jaccard 1, and the postings pass writes an empty (or the caller's
    // later re-read returns a self-killed) survivor set. The streaming
    // loop avoids the double text pass differently and safely:
    // [[appendSurvivorsFromSigs]] writes from the probe's own already-
    // materialized signature cache.
    val base = batch.select(asLongId(id).as("id"), text.as("__t"))
    base
      .select(F.col("id"), shingleHashes(F.col("__t"), shingleSize).as("sh"),
        F.lit(segment).as("seg"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("seg").parquet(s"$path/features")
    base
      .select(F.col("id"),
        F.posexplode(graft.functions.TextExprs.minhashBandHashes(
          F.col("__t"), shingleSize, numHashes, bands))
          .as(Seq("band", "bucket")))
      .groupBy("band", "bucket")
      .agg(graft.functions.AggExprs
        .cappedSortedIds(F.col("id"), maxBucket, minSize = 1).as("ids"))
      .filter(F.col("ids").isNotNull)
      .select(F.col("band"), F.col("bucket"), F.col("ids"),
        F.lit(segment).as("seg"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("seg", "band").parquet(s"$path/postings")
  }

  /** Compact a segmented [[writeMinhashIndex]] index back to ONE base
    * segment — a FULL rewrite, O(index) per call: right as a manual
    * maintenance step or at a cadence amortized against the base size;
    * for a 24/7 ingest stream's per-trigger cadence use
    * [[tierCompactMinhashIndex]] (r16 verdict #1), whose size-tiered
    * folds cost O(new data) per trigger and delegate HERE only when the
    * accumulated tiers justify a base rewrite. This is the LSM
    * compaction step closing the loop on
    * [[appendToMinhashIndex]]'s documented degradation: with many
    * segments the `maxBucket` union-cap is enforced per segment pair, so
    * a boilerplate bucket split across segments can slip under the cap it
    * would have tripped whole. The result is row-identical to a fresh
    * [[writeMinhashIndex]] over the full accepted corpus (spec-pinned)
    * WITHOUT touching corpus text: features coalesce (they are the full
    * per-doc shingle-hash state), and postings are REBUILT from those
    * features through the same signature + band fold as the writer
    * ([[graft.functions.TextExprs.minhashBandHashesFromHashes]] — MinHash
    * is duplicate-insensitive, so band hashes over stored distinct
    * shingle hashes equal band hashes over text) with the saturating cap
    * applied to the full merged bucket. Rebuilding beats merging stored
    * posting rows, which CANNOT be exact: a bucket the writer refused at
    * segment-write time (> cap) is absent, so a stored-rows merge would
    * resurrect it partially — under-counting the cap in exactly the
    * boilerplate case compaction exists to restore.
    *
    * Swap is rename-aside (`table` → `table_old`, tmp → `table`, drop
    * `table_old`) so a crash at any step leaves a recoverable copy; a
    * production deployment on object storage would write a NEW index
    * generation and swap a version pointer instead (rename-as-copy + no
    * atomicity on s3) — same read path, different commit.
    *
    * Run ONLY while no ingest stream is mid-batch (between triggers, or
    * with the stream stopped): compaction folds every segment into
    * `base`, including a not-yet-committed in-flight one — after which a
    * replayed batch's own-segment exclusion
    * ([[dedupAgainstIndexManaged]]) no longer matches it, and the replay
    * self-kills its survivors, exactly the hazard the exclusion exists
    * to prevent. The EXCEPTION that makes in-line stream compaction
    * safe (`excludeSegment`, r15 verdict #3): the ingest stream's own
    * `foreachBatch` IS the single writer between triggers, and passing
    * its in-flight segment keeps that segment intact through the
    * rewrite — its features keep their `seg=` label and its postings
    * rows pass through byte-identical (they are already exactly what
    * the segment appender wrote; only the OTHER segments' features are
    * folded and re-banded into the base postings). A batch replayed
    * after a crash anywhere around the compaction still finds its
    * earlier attempt as a standalone segment its probe exclusion
    * matches; the skipped segment folds on the NEXT compaction, so
    * steady state is base + at most one live segment. */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, excludeSegment: Option[String] = None): Unit = {
    val IndexMeta(_, numHashes, bands, maxBucket) =
      readIndexMeta(spark, path)
    val hconf = spark.sparkContext.hadoopConfiguration
    def swap(table: String, write: String => Unit): Unit = {
      val dir = new org.apache.hadoop.fs.Path(s"$path/$table")
      val tmp = new org.apache.hadoop.fs.Path(s"$path/__${table}_compact")
      val old = new org.apache.hadoop.fs.Path(s"$path/__${table}_old")
      val fs = dir.getFileSystem(hconf)
      write(tmp.toString) // materializes BEFORE the source moves aside
      fs.delete(old, true)
      require(fs.rename(dir, old), s"compact: move-aside failed for $table")
      require(fs.rename(tmp, dir), s"compact: swap-in failed for $table")
      fs.delete(old, true)
    }
    // the excluded segment's postings must pass through from the OLD
    // postings table, and the snapshot is materialized EAGERLY, HERE,
    // before the swap below renames and deletes the source directory —
    // that eagerness is LOAD-BEARING: Dataset.localCheckpoint executes
    // the read at the call, so the pass-through rows exist as blocks
    // when the old table retires. A lazy variant
    // (localCheckpoint(eager = false)) would read files the swap
    // already deleted. Released at the end of this method through the
    // exact RDD handle (localCheckpoint lives outside the CacheManager —
    // an in-line stream compaction would otherwise accrete one
    // batch-sized block per trigger; handle-exact beats a
    // getPersistentRDDs diff, which would free concurrent session
    // users' blocks too)
    val kept = excludeSegment.map(ex => graft.Scratch.snapshotManaged(
      spark.read.parquet(s"$path/postings").filter(F.col("seg") === ex)))
    val keptPostings = kept.map(_._1)
    swap("features", out => {
      val f = spark.read.parquet(s"$path/features")
      (excludeSegment match {
        case None => f.drop("seg").withColumn("seg", F.lit("base"))
        case Some(ex) => f.withColumn("seg",
          F.when(F.col("seg") === ex, F.col("seg"))
            .otherwise(F.lit("base")))
      }).write.mode("overwrite").partitionBy("seg").parquet(out)
    })
    swap("postings", out => {
      var feats = spark.read.parquet(s"$path/features")
      excludeSegment.foreach(ex =>
        feats = feats.filter(F.col("seg") =!= ex))
      val rebuilt = feats.drop("seg")
        .select(F.col("id"),
          F.posexplode(graft.functions.TextExprs
            .minhashBandHashesFromHashes(F.col("sh"), numHashes, bands))
            .as(Seq("band", "bucket")))
        .groupBy("band", "bucket")
        .agg(graft.functions.AggExprs
          .cappedSortedIds(F.col("id"), maxBucket, minSize = 1).as("ids"))
        .filter(F.col("ids").isNotNull)
        .select(F.col("band"), F.col("bucket"), F.col("ids"),
          F.lit("base").as("seg"))
      keptPostings.fold(rebuilt)(kp => rebuilt.unionByName(
          kp.select("band", "bucket", "ids", "seg")))
        .write.mode("overwrite").partitionBy("seg", "band").parquet(out)
    })
    // release the pass-through snapshot's blocks (consumed by the
    // postings write above) — by exact handle, never a session sweep
    kept.foreach(_._2())
  }

  /** Size-tiered compaction of a segmented [[writeMinhashIndex]] index —
    * the scale-safe cadence for 24/7 ingest (r16 verdict #1), replacing
    * "fold EVERYTHING into base every time" with the LSM shape
    * ([[TierCompact]]): segments whose byte-size class holds ≥ `fanout`
    * members fold into ONE tier segment (cascading until no class is
    * full), and `base` is rewritten ONLY when the accumulated non-base
    * bytes reach `baseFoldRatio` of it (then this delegates to
    * [[compactMinhashIndex]], whose full fold restores the exact
    * fresh-build cap semantics). Driven per trigger by a stream, the
    * amortized cost is O(batch · log(corpus/batch)) — flat in the base
    * size ([[graft.TieredCompactStudy]], scaling/tiered_compact.json) —
    * where the full fold per trigger was O(index).
    *
    * Contract per fold: the tier segment is ROW-IDENTICAL to the folded
    * docs having been appended as ONE segment ([[appendToMinhashIndex]]
    * semantics, spec-pinned) — features pass through unchanged and
    * postings are REBUILT from the folded features through the same
    * band fold with the saturating `maxBucket` cap applied to the
    * merged bucket (a boilerplate bucket split across folded segments
    * trips the cap exactly as a single-segment append would; full
    * cap-semantics restoration across ALL segments remains the base
    * fold's job). Probe results therefore degrade NO FASTER than the
    * documented per-segment cap granularity, while the segment count —
    * what the mh_segments.json study showed costs ~75% probe latency by
    * 64 — stays bounded at fanout · O(log) levels.
    *
    * Crash safety: every fold commits through [[TierCompact]]'s intent
    * marker protocol; entry-time [[TierCompact.recover]] rolls a crashed
    * fold forward (tier fully renamed in → finish source deletes) or
    * back (partial tier → drop it; sources untouched). Same single-writer
    * contract as [[compactMinhashIndex]]: run between triggers or
    * in-line from the ingest stream's own `foreachBatch`, with the
    * in-flight segment passed as `excludeSegment` (never listed, never
    * folded).
    *
    * Operational note for VERY large bases: when the base-ratio
    * escalation fires it pays the full O(index) fold INSIDE the calling
    * trigger — at a multi-TB base that is one long stall while later
    * micro-batches queue (exactly once per geometric doubling of the
    * corpus, so amortized cost stays O(log), but the latency lands on
    * one batch). Where that stall is unacceptable, raise
    * `baseFoldRatio` (a very large value defers the base fold
    * indefinitely — tiers keep folding into higher classes, bounded at
    * fanout·levels segments) and run [[compactMinhashIndex]] in a
    * maintenance window between stream restarts, when the single-writer
    * window is free. */
  def tierCompactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, excludeSegment: Option[String] = None,
      fanout: Int = 4, baseFoldRatio: Double = 0.25)
      : TierCompact.Report = {
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    require(baseFoldRatio > 0.0,
      s"baseFoldRatio must be > 0, got $baseFoldRatio")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val healed = TierCompact.recover(fs, root, Seq("features", "postings"))
    val IndexMeta(_, numHashes, bands, maxBucket) =
      readIndexMeta(spark, path)
    val exclude = Set("base") ++ excludeSegment
    def sizes() = TierCompact.segmentBytes(fs,
      new org.apache.hadoop.fs.Path(root, "features"), exclude)
    val baseBytes = {
      val p = new org.apache.hadoop.fs.Path(root, "features/seg=base")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    val current = sizes()
    if (current.nonEmpty &&
        current.values.sum >= baseFoldRatio * baseBytes) {
      compactMinhashIndex(spark, path, excludeSegment)
      return TierCompact.Report(Seq.empty, baseFolded = true, healed)
    }
    val done = scala.collection.mutable.ArrayBuffer.empty[TierCompact.Fold]
    var round = TierCompact.plan(sizes(), fanout)
    while (round.nonEmpty) {
      round.foreach { fold =>
        val stage = new org.apache.hadoop.fs.Path(root,
          s"__tierstage_${fold.tier}")
        fs.delete(stage, true)
        val stagedFeatures =
          new org.apache.hadoop.fs.Path(stage, "features")
        val stagedPostings =
          new org.apache.hadoop.fs.Path(stage, "postings")
        spark.read.parquet(s"$path/features")
          .filter(F.col("seg").isin(fold.sources: _*)).drop("seg")
          .write.mode("overwrite").parquet(stagedFeatures.toString)
        // postings REBUILT from the staged features (one clean read of
        // exactly the fold set), through the same stored-hash band fold
        // as the full compaction — cap on the MERGED bucket, the
        // single-segment-append contract
        spark.read.parquet(stagedFeatures.toString)
          .select(F.col("id"),
            F.posexplode(graft.functions.TextExprs
              .minhashBandHashesFromHashes(F.col("sh"), numHashes, bands))
              .as(Seq("band", "bucket")))
          .groupBy("band", "bucket")
          .agg(graft.functions.AggExprs
            .cappedSortedIds(F.col("id"), maxBucket, minSize = 1).as("ids"))
          .filter(F.col("ids").isNotNull)
          .write.mode("overwrite").partitionBy("band")
          .parquet(stagedPostings.toString)
        TierCompact.commitFold(fs, root, fold,
          Seq("features" -> stagedFeatures, "postings" -> stagedPostings))
        fs.delete(stage, true)
        done += fold
      }
      round = TierCompact.plan(sizes(), fanout)
    }
    TierCompact.Report(done.toSeq, baseFolded = false, healed)
  }

  /** Membership gate against a reference key set WITHOUT a join: build a
    * Bloom filter over `xxhash64(refKey)` (distributed tree aggregation;
    * the filter itself is the only driver-held artifact — sized by
    * `expectedItems`/`fpp`, ~1.2 GB per 10^9 keys at 0.1%), then drop every
    * row of `df` whose key MIGHT be in the set, as a pure scan predicate
    * folded into the plan as a literal (native
    * `BloomFilterMightContain` — codegen'd, no shuffle, streaming-legal).
    *
    * False-positive direction is the SAFE one for hygiene filters: a false
    * positive drops an extra row (rate `fpp`), a true member is NEVER kept.
    * Use [[dedupAgainstExact]] when exact semantics are worth the join. */
  def bloomGate(df: DataFrame, key: Column, ref: DataFrame, refKey: Column,
      expectedItems: Long, fpp: Double = 0.001): DataFrame = {
    val bf = ref.select(F.xxhash64(refKey).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val mightContain = bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray, BinaryType),
        bridge.expression(F.xxhash64(key))))
    df.filter(!mightContain)
  }

  /** Embedding near-dup: cosine ≥ threshold pairs via random-hyperplane LSH
    * (see [[Similarity.hyperplaneSignature]]), verified exactly.
    *
    * Banded OR-construction: the `planes`-bit signature splits into `bands`
    * sub-signatures; a pair is a candidate if ANY band matches (explode →
    * groupBy(band, bucket) → in-bucket pair expansion → distinct). Recall for
    * a pair at angle θ is 1-(1-p^r)^bands with p = 1-θ/π, r = planes/bands —
    * a single whole-signature bucket (bands = 1) collapses to p^planes,
    * which is near zero for anything but exactly-collinear vectors. Band
    * WIDTH is the precision dial: 16-bit bands collide on random pairs at
    * ~2^-16 per band (near-zero junk candidates); 8-bit bands at ~0.4%
    * per band, which against n²/2 pairs floods verification. Default 4×16
    * keeps recall ≥ 0.999 for cosine ≥ 0.999 with precision to match.
    * Same candidate-bounding discipline as the minhash path: `maxBucket`
    * caps in-bucket expansion, exact cosine filters false positives. */
  def embeddingDuplicatePairs(df: DataFrame, id: Column, vec: Column,
      threshold: Double, planes: Int = 64, bands: Int = 4, seed: Long = 42,
      maxBucket: Int = 1000): DataFrame = {
    require(planes % bands == 0 && planes <= 64,
      s"planes $planes must be a multiple of bands $bands, at most 64")
    val bandBits = planes / bands
    val sig = Similarity.hyperplaneSignature(vec, planes, seed)
    // candidate generation buckets carry ONLY ids (8 bytes/row, same
    // discipline as the minhash path) — collecting the vectors themselves
    // would put maxBucket × dims floats in every aggregation buffer
    val cands0 = df.select(asLongId(id).as("id"), sig.as("sig"))
      .select(F.col("id"),
        F.posexplode(F.array((0 until bands).map(b =>
          F.shiftrightunsigned(F.col("sig"), b * bandBits)
            .bitwiseAND(if (bandBits == 64) -1L else (1L << bandBits) - 1)): _*))
          .as(Seq("band", "bucket")))
      .groupBy("band", "bucket")
      .agg(graft.functions.AggExprs.cappedSortedIds(F.col("id"), maxBucket)
        .as("ids"))
      .filter(F.col("ids").isNotNull)
      .select(F.explode(bucketPairs(F.col("ids"))).as("p"))
      .select("p.*").distinct()
    // exact verification: semi-join-prune the corpus to candidate ids, then
    // join the vectors back per pair side (verifyJaccard pattern) — but
    // deliberately WITHOUT verifyJaccard's persist + binding repartitions.
    // Those exist to make a cross-consumer CACHE layout deterministic (the
    // cached-partitioning race, SCALING.md); here every consumer of the
    // candidate table sits inside ONE action's DAG, so Spark's exchange
    // reuse (ReusedExchange / AQE stage reuse) already runs the expensive
    // subtree — signatures, banding shuffle, pair distinct — exactly once,
    // with no InMemoryRelation whose layout a racing materializer could
    // decide. Verified in round 7: the unconditional pins cost d13 an
    // extra ~2.3× on the driver VM (three exchanges + two forced
    // sort-merge joins on a pairs-scale table) while buying nothing —
    // hash(id_a,id_b) satisfies neither join's hash(id_a)/hash(id_b)
    // requirement anyway. Verification work here is a per-pair cosine on
    // pruned vectors (light), not verifyJaccard's per-doc shingling
    // (heavy), so AQE's size-based orientation is safe at every scale:
    // tiny sides broadcast, big sides shuffle on real stats.
    val cands = cands0
    val candIds = cands.select(F.explode(F.array(
      F.col("id_a"), F.col("id_b"))).as("vid")).distinct()
    val vecs = df.select(id.as("vid"), vec.as("vv"))
      .join(candIds, Seq("vid"), "left_semi")
    cands
      .join(vecs.select(F.col("vid").as("id_a"), F.col("vv").as("__va")),
        Seq("id_a"))
      .join(vecs.select(F.col("vid").as("id_b"), F.col("vv").as("__vb")),
        Seq("id_b"))
      .withColumn("cosine", Similarity.cosine(F.col("__va"), F.col("__vb")))
      .filter(F.col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
