package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deterministic sampling / splitting / mixture operators for
  * training-data pipelines — beyond the reference's seeded `sample`
  * (data_frame.ex:2177, which is engine-RNG-specific by design): these
  * assign rows by a HASH of a caller-declared key, which is what a
  * production corpus pipeline actually needs:
  *
  *  - **sticky**: a document keeps its split/sample membership across
  *    reruns and corpus growth (RNG sampling reshuffles everything when
  *    the row order or partition count changes);
  *  - **portable**: the hash is md5 of the key's UTF-8 string — every
  *    engine renders the same lowercase hex, so the assignment is
  *    reproducible outside Spark (and DuckDB-oracle-checkable here);
  *  - **scan-speed**: assignment is a pure per-row expression — no
  *    shuffle, no state, streaming-legal.
  *
  * The assignment granule is the first `HexChars` hex chars of the md5
  * (16^4 = 65536 buckets): weights are quantized to 1/65536, which is the
  * standard train/val/test resolution. Lexicographic hex-string order
  * equals numeric bucket order, so thresholds stay strings end to end and
  * no engine-specific hex→int conversion enters the contract.
  */
object Sampling {

  private val HexChars = 4
  private val Buckets = 1 << (4 * HexChars) // 65536

  /** A null key would take three DIFFERENT silent paths — land in the
    * last split label (the `otherwise` branch), vanish from samples (null
    * comparison), and sort FIRST in topKByHash (nulls-first ordering) —
    * so every hash entry point asserts non-null per row instead (one
    * codegen'd check; a null document key is upstream corruption, not a
    * samplable row). Non-constant `when` branch so the assert survives
    * optimization (see TsNorm.sliceNs). */
  private def requireKey(key: Column, hashed: Column): Column =
    F.when(F.assert_true(key.isNotNull, F.lit(
      "hash sampling key is null — null keys have no deterministic " +
        "bucket; filter or coalesce them explicitly first")).isNull,
      hashed)

  /** Lowercase-hex bucket id in [0, 65536) as a 4-char string:
    * `substr(md5(key || salt), 1, 4)`. */
  def hashBucket(key: Column, salt: String = ""): Column = {
    val k = key.cast(StringType)
    requireKey(k, F.substring(
      F.md5(F.concat(k, F.lit(salt)).cast(BinaryType)), 1, HexChars))
  }

  /** Cumulative bucket thresholds for `weights`, as 4-char hex strings —
    * label i covers buckets [t(i-1), t(i)). The last label absorbs the
    * remainder, so weights that do not sum exactly to 1 (or quantization
    * loss) land in the final label, never in dropped rows. */
  private def thresholds(weights: Seq[(String, Double)]): Seq[(String, String)] = {
    require(weights.nonEmpty, "hashSplit needs at least one label")
    require(weights.forall(_._2 >= 0), s"negative split weight in $weights")
    val total = weights.map(_._2).sum
    require(total > 0, "split weights sum to zero")
    var cum = 0.0
    weights.init.map { case (label, w) =>
      cum += w / total
      label -> f"${math.min((cum * Buckets).toLong, (Buckets - 1).toLong)}%04x"
    }
  }

  /** Deterministic train/val/test (or arbitrary-label) split: appends
    * `out` = the label whose hash-bucket range contains md5(key || salt).
    * Weights are normalized and quantized to 1/65536. Pure scan
    * expression; same doc → same split, forever, on any engine.
    * Single-label weight lists degenerate to a constant column. */
  def hashSplit(df: DataFrame, key: Column,
      weights: Seq[(String, Double)], salt: String = "",
      out: String = "split"): DataFrame = {
    val b = hashBucket(key, salt)
    val lastLabel = weights.last._1
    // flat when-chain: thresholds ascend, so first match wins
    val assigned = thresholds(weights) match {
      case Seq() => F.lit(lastLabel)
      case ts =>
        ts.tail.foldLeft(F.when(b < ts.head._2, ts.head._1)) {
          case (acc, (label, t)) => acc.when(b < t, label)
        }.otherwise(lastLabel)
    }
    df.withColumn(out, assigned)
  }

  /** Deterministic `fraction` sample by key hash: keeps rows whose bucket
    * falls below `floor(fraction * 65536)`. Sticky and portable — the kept
    * set only grows/shrinks at the boundary when `fraction` changes, and a
    * given key's membership never depends on the rest of the corpus. */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    val t = f"${math.min((fraction * Buckets).toLong, Buckets.toLong - 1)}%04x"
    if (fraction >= 1.0)
      // the no-op sample still enforces the class's null-key contract —
      // otherwise the corruption surfaces only when fraction later
      // shrinks, and the kept set stops being a monotone prefix
      df.filter(requireKey(key.cast(StringType), F.lit(true)))
    else df.filter(hashBucket(key, salt) < t)
  }

  /** Per-domain token-budget sampling: keeps, for every domain, the
    * documents of its first hash-ordered buckets whose cumulative token
    * count stays under the domain's budget — the "draw a deterministic
    * sample of ~B tokens per domain" step of mixture construction.
    *
    * Bucket-granular by design: the unit of admission is a hash bucket
    * (1/65536 of the domain), not a document, so the kept set is a prefix
    * of a fixed pseudo-random order — sticky under reruns, and the
    * overshoot is bounded by one bucket's tokens (~budget·65536/corpus).
    *
    * Scale shape: ONE hash aggregation over (domain, bucket) — 8-byte-ish
    * keys, map-side combinable; the cumulative scan runs on the aggregate,
    * which is ≤ 65536 rows PER DOMAIN regardless of corpus size (the
    * Window partitions by domain over that bounded table — never over
    * corpus rows); admission joins back as a broadcast semi-join. The
    * corpus itself is scanned once and never re-sorted or shuffled. */
  def sampleToBudget(df: DataFrame, domain: Column, key: Column,
      tokens: Column, budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    require(budgets.nonEmpty, "sampleToBudget needs at least one domain budget")
    val b = hashBucket(key, salt)
    val perBucket = df
      .select(domain.cast(StringType).as("__dom"), b.as("__h4"),
        tokens.cast(LongType).as("__tok"))
      .groupBy("__dom", "__h4").agg(F.sum("__tok").as("__btok"))
    val w = Window.partitionBy("__dom").orderBy("__h4")
    val budgetOf = F.element_at(
      F.map(budgets.toSeq.sortBy(_._1).flatMap { case (d, bu) =>
        Seq(F.lit(d), F.lit(bu)) }: _*), F.col("__dom"))
    val admitted = perBucket
      .withColumn("__before", F.sum("__btok").over(w) - F.col("__btok"))
      .filter(F.col("__before") < F.coalesce(budgetOf, F.lit(0L)))
      .select("__dom", "__h4")
    df.join(F.broadcast(admitted),
      domain.cast(StringType) === F.col("__dom") && b === F.col("__h4"),
      "left_semi")
  }

  /** Full md5 hex of `key || salt` — the per-key pseudo-random TOTAL order
    * behind [[topKByHash]] (the 4-char bucket of [[hashBucket]] collides on
    * purpose; this does not, to 2^-64). */
  def hashOrder(key: Column, salt: String = ""): Column = {
    val k = key.cast(StringType)
    requireKey(k,
      F.md5(F.concat(k, F.lit(salt)).cast(BinaryType)))
  }

  /** Deterministic k-per-domain sample: the k smallest keys per domain in
    * md5 order (ties broken by the key itself) — "give me k representative
    * examples per source", sticky and portable like every operator here.
    *
    * Scale shape: `row_number <= k` over a domain-partitioned window plans
    * as `WindowGroupLimit`, so each map task pre-prunes to its local top-k
    * BEFORE the shuffle — the bytes moved are O(domains · k), not the
    * corpus, and a giant domain never funnels through one task unpruned. */
  def topKByHash(df: DataFrame, domain: Column, key: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"topKByHash k must be positive, got $k")
    val w = Window.partitionBy(domain)
      .orderBy(hashOrder(key, salt), key.cast(StringType))
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k).drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * Inf. Proc. Letters 97(5), 2006): each row draws the deterministic
    * uniform `u = (hex32(md5(key‖salt)) + 0.5) / 2³²` and ranks at
    * `ln(u) / w`; the k largest ranks are an exact weighted
    * sample-without-replacement — P(row selected first) = wᵢ/Σw,
    * sequentially without replacement thereafter. Same determinism
    * contract as every hash sampler here: sticky under reruns, portable
    * (md5 + exact integer arithmetic renders identically in any engine),
    * and the uniform is strictly inside (0,1) so ln(u) is finite.
    *
    * Scale shape: rank is a pure per-row expression and the top-k plans
    * as `TakeOrderedAndProject` — each partition pre-prunes to its local
    * k, the driver merges O(partitions · k) rows; no global sort, no
    * shuffle of the corpus. Weights must be strictly positive per row
    * (asserted in-plan — a zero/negative/null weight has no E-S
    * semantics); w → 0 degrades continuously to never-selected. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"weightedSample k must be positive, got $k")
    val ks = key.cast(StringType)
    df.withColumn("__ws_rank", esRank(ks, weight, salt))
      .orderBy(F.col("__ws_rank").desc, ks.asc)
      .limit(k)
      .drop("__ws_rank")
  }

  /** The A-ES rank `ln(u)/w` with its in-plan weight/key guards. */
  private def esRank(ks: Column, weight: Column, salt: String): Column = {
    val hex = F.substring(
      F.md5(F.concat(ks, F.lit(salt)).cast(BinaryType)), 1, 8)
    val u = (F.conv(hex, 16, 10).cast(DoubleType) + 0.5) / 4294967296.0
    F.when(F.assert_true(weight.isNotNull && weight > 0, F.lit(
      "weightedSample weight must be strictly positive — a zero, " +
        "negative, or null weight has no sampling semantics")).isNull,
      requireKey(ks, F.log(u) / weight))
  }

  /** Per-domain [[weightedSample]]: k rows PER GROUP drawn proportional
    * to weight — "k representative examples per source, biased to the
    * high-quality ones". Same rank, taken inside a domain-partitioned
    * window: `row_number <= k` plans as `WindowGroupLimit`, so map tasks
    * pre-prune to their local top-k before the shuffle (the
    * [[topKByHash]] scale shape — bytes moved are O(domains · k), and a
    * giant domain never funnels through one task unpruned). */
  def weightedSampleByGroup(df: DataFrame, domain: Column, key: Column,
      weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"weightedSampleByGroup k must be positive, got $k")
    val ks = key.cast(StringType)
    val w = Window.partitionBy(domain)
      .orderBy(esRank(ks, weight, salt).desc, ks.asc)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k).drop("__rn")
  }

  /** Domain-mixture sampling: splits `totalBudget` tokens across domains
    * by `weights` (normalized), then applies [[sampleToBudget]] — the
    * "hit a target domain mix for a training run" step. Domains absent
    * from `weights` are dropped. */
  def mixture(df: DataFrame, domain: Column, key: Column, tokens: Column,
      weights: Map[String, Double], totalBudget: Long,
      salt: String = ""): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    val neg = weights.filter(_._2 < 0)
    require(neg.isEmpty,
      s"negative mixture weight(s) ${neg.keys.mkString(", ")} — they " +
        "shrink the normalizer and inflate every other domain's budget " +
        "past totalBudget")
    val total = weights.values.sum
    require(total > 0, "mixture weights sum to zero")
    val budgets = weights.map { case (d, w) =>
      d -> math.floor(w / total * totalBudget).toLong
    }
    sampleToBudget(df, domain, key, tokens, budgets, salt)
  }
}
