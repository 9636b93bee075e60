package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * `Column` expression compositions — codegen'd, embarrassingly parallel,
  * no shuffle, so they run at scan speed on any corpus size. */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = F.split(F.lower(F.trim(text)), "\\s+")

  /** [[tokens]] with the empty-document guard: `split(trim(""), ...)`
    * returns `[""]`, so an unguarded explode hands empty/whitespace-only
    * documents a bogus empty-string token. Null text stays null. */
  def tokensOrEmpty(text: Column): Column =
    F.when(F.length(F.trim(text)) === 0,
      F.array().cast(ArrayType(StringType))).otherwise(tokens(text))

  /** LET-binding for expressions: evaluates `col` ONCE and passes the bound
    * value to `body`. Catalyst HOFs evaluate their input array a single time
    * and lambdas reference only the bound variable — without this, an
    * expression that mentions `tokens(text)` k times re-tokenizes the
    * document k times in the interpreted HOF path. */
  private def let(col: Column)(body: Column => Column): Column =
    F.element_at(F.transform(F.array(col), body), 1)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    F.when(F.length(F.trim(text)) === 0, 0L)
      .otherwise(F.size(tokens(text)).cast(LongType))

  /** BPE-ish subword count estimate: word-piece regex (runs of letters,
    * digits, or single punctuation), the classic GPT-2 pre-tokenizer shape.
    * A cheap, deterministic proxy for tokenizer-true counts. Counted with
    * the native [[graft.functions.CountRegexMatches]] (same java.util.regex
    * engine as regexp_extract_all, without materializing the matches). */
  def subwordCount(text: Column): Column =
    graft.functions.TextExprs.countRegexMatches(F.lower(text),
      "[a-z]+|[0-9]|[^a-z0-9\\s]")

  /** Tokenizer-TRUE token count: BPE under a caller-supplied ranked merge
    * table ([[graft.functions.BpeTokenCount]] — load a published
    * merges.txt's pairs in file order). Drop-in for every token-budget
    * column parameter — [[graft.operators.Packing.packSequences]],
    * [[graft.operators.Sampling.mixture]], [[corpusStats]] all take the
    * count as a Column, so `bpeTokenCount(text, merges)` swaps in for
    * [[tokenCount]] without touching the operators; the whitespace
    * default stays the oracle-checked one (DuckDB can replay it). */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.TextExprs.bpeTokenCount(text, merges)

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "zu", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "una"))

  /** Per-language stopword hit ratio over a pre-bound token array. */
  private def stopwordRatioT(toks: Column, lang: String): Column =
    F.when(F.size(toks) > 0,
      F.size(F.filter(toks, t => t.isInCollection(stopwords(lang))))
        .cast(DoubleType) / F.size(toks)).otherwise(0.0)

  /** Per-language stopword hit ratio. */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    F.when(text.isNull, F.lit(null).cast(DoubleType)).otherwise(
      stopwordRatioBody(text, lang))

  private def stopwordRatioBody(text: Column, lang: String): Column =
    let(tokens(text))(stopwordRatioT(_, lang))

  /** n-gram-heuristic language ID: the language whose stopword set scores
    * the highest hit ratio; "und" (undetermined) when nothing hits.
    * Tokenizes once for all languages (let-binding). */
  def langId(text: Column): Column =
    // explicit null guard: the let-bound scoring would otherwise turn a
    // null document into all-zero scores and answer "und" — null in,
    // null out is the engine-wide convention (SURVEY §1.3)
    F.when(text.isNull, F.lit(null).cast(StringType)).otherwise(
      let(tokens(text)) { toks =>
        val scored = stopwords.keys.toSeq.sorted.map { lang =>
          F.struct(stopwordRatioT(toks, lang).as("score"),
            F.lit(lang).as("lang"))
        }
        val best = F.array_max(F.array(scored: _*))
        F.when(best.getField("score") > 0, best.getField("lang"))
          .otherwise(F.lit("und"))
      })

  /** Quality score in [0,1]: blend of the standard cheap text-quality
    * signals (Gopher/C4-style): alphabetic ratio, punctuation density,
    * mean word length in a sane band, stopword presence. */
  def qualityScore(text: Column): Column = {
    // null guard as in langId: the zero-defaulted blend would otherwise
    // score a null document 0.2 instead of null
    val len = F.length(text).cast(DoubleType)
    val alpha = F.length(F.regexp_replace(text, "[^A-Za-z ]", "")).cast(DoubleType)
    val punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast(DoubleType)
    F.when(text.isNull, F.lit(null).cast(DoubleType)).otherwise(
      let(tokens(text)) { toks =>
        val nTok = F.size(toks).cast(DoubleType)
        val meanWordLen = F.when(nTok > 0,
          F.aggregate(toks, F.lit(0.0), (acc, t) => acc + F.length(t)) / nTok)
          .otherwise(0.0)
        val alphaRatio = F.when(len > 0, alpha / len).otherwise(0.0)
        val punctRatio = F.when(len > 0, punct / len).otherwise(0.0)
        val wordLenOk = F.when(meanWordLen >= 3 && meanWordLen <= 10, 1.0)
          .otherwise(0.0)
        val stopOk = F.when(stopwordRatioT(toks, "en") > 0.01, 1.0).otherwise(0.0)
        F.round(
          alphaRatio * 0.4 + (F.lit(1.0) - F.least(punctRatio * 10, F.lit(1.0))) * 0.2 +
            wordLenOk * 0.2 + stopOk * 0.2, 6)
      })
  }

  /** The Gopher rule set's required stopwords (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1): a document is expected to contain at least
    * two of these to count as running English prose. */
  private val requiredStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document-quality signals (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1 — the published web-corpus filtering
    * heuristics; a training-pipeline extension beyond the reference's
    * surface): word count, mean word length, symbol-to-word ratio
    * (`#` and `...`), bullet-started and ellipsis-ended line fractions,
    * fraction of words containing a letter, and the required-stopword hit
    * count. One tokenization and one line split per row (let-bound), all
    * per-row expressions — scan speed, no shuffle, streaming-legal.
    * Ratios are rounded to 6 dp so cross-engine oracles can hash-match. */
  def gopherStats(text: Column): Column =
    // null in, null struct out (engine-wide convention; the gate then
    // drops null documents because null passes no threshold)
    F.when(text.isNull, F.lit(null)).otherwise(gopherStatsNonNull(text))

  private def gopherStatsNonNull(text: Column): Column =
    let(tokens(text)) { toks =>
      let(F.split(text, "\n")) { lines =>
        val nTok = F.when(F.length(F.trim(text)) === 0, 0)
          .otherwise(F.size(toks))
        val n = nTok.cast(DoubleType)
        val nLines = F.size(lines).cast(DoubleType)
        val meanWordLen = F.when(nTok > 0, F.round(
          F.aggregate(toks, F.lit(0L), (a, t) => a + F.length(t))
            .cast(DoubleType) / n, 6)).otherwise(0.0)
        val symbols = graft.functions.TextExprs.countRegexMatches(
          text, "#|\\.\\.\\.")
        val symbolRatio = F.when(nTok > 0,
          F.round(symbols.cast(DoubleType) / n, 6)).otherwise(0.0)
        val bulletFrac = F.round(F.size(F.filter(lines,
          l => l.rlike("^\\s*[-*•‣▪]"))).cast(DoubleType)
          / nLines, 6)
        val ellipsisFrac = F.round(F.size(F.filter(lines,
          l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast(DoubleType)
          / nLines, 6)
        val alphaFrac = F.when(nTok > 0, F.round(
          F.size(F.filter(toks, t => t.rlike("[a-z]"))).cast(DoubleType) / n,
          6)).otherwise(0.0)
        val stopHits = requiredStopwords.map(w =>
          F.array_contains(toks, w).cast(IntegerType)).reduce(_ + _)
        F.struct(
          nTok.cast(LongType).as("word_count"),
          meanWordLen.as("mean_word_len"),
          symbolRatio.as("symbol_word_ratio"),
          bulletFrac.as("bullet_line_frac"),
          ellipsisFrac.as("ellipsis_line_frac"),
          alphaFrac.as("alpha_word_frac"),
          stopHits.cast(LongType).as("req_stopword_hits"))
      }
    }

  /** The Gopher document gate over a [[gopherStats]] struct; thresholds
    * default to the published rule set (word count 50–100k, mean word
    * length 3–10, symbol ratio ≤ 0.1, bullet lines ≤ 90%, ellipsis lines
    * ≤ 30%, ≥ 80% of words alphabetic, ≥ 2 required stopwords). */
  def gopherPasses(stats: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3, maxMeanWordLen: Double = 10,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8, minStopwordHits: Long = 2): Column =
    stats.getField("word_count").between(minWords, maxWords) &&
      stats.getField("mean_word_len")
        .between(minMeanWordLen, maxMeanWordLen) &&
      stats.getField("symbol_word_ratio") <= maxSymbolRatio &&
      stats.getField("bullet_line_frac") <= maxBulletFrac &&
      stats.getField("ellipsis_line_frac") <= maxEllipsisFrac &&
      stats.getField("alpha_word_frac") >= minAlphaFrac &&
      stats.getField("req_stopword_hits") >= minStopwordHits

  /** Keep the documents that pass the Gopher gate. Purely row-local —
    * unlike [[quantileFilter]] there is no corpus-wide state, so this is
    * the cheaper FIRST stage of a filtering pipeline (drop the obvious
    * junk at scan speed, spend the quantile gate on what remains). */
  def gopherFilter(df: DataFrame, text: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3, maxMeanWordLen: Double = 10,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8, minStopwordHits: Long = 2): DataFrame =
    df.filter(gopherPasses(gopherStats(text),
      minWords, maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolRatio,
      maxBulletFrac, maxEllipsisFrac, minAlphaFrac, minStopwordHits))

  /** Order-sensitive 64-bit document fingerprint: a left fold chaining
    * xxhash64(acc, token) — order-sensitive like a rolling hash but safe
    * under ANSI mode (`acc * 31 + h` overflow-checks in Spark 4). Equal
    * normalized token streams ⇒ equal fingerprints. */
  def fingerprint(text: Column): Column =
    F.aggregate(tokens(text), F.lit(0L), (acc, t) => F.xxhash64(acc, t))

  /** Repetition quality signals (Gopher §A1.1 / RefinedWeb): duplicated
    * line fraction, duplicated-line character fraction, top word-bigram
    * share — the standard filters for boilerplate/spam/templating. One
    * native eval per row (struct of 3 doubles), scan speed; see
    * [[graft.functions.RepetitionStats]]. */
  def repetitionStats(text: Column): Column =
    graft.functions.TextExprs.repetitionStats(text)

  /** PII / link scrub: redact emails, URLs and IPv4 addresses with typed
    * placeholder tokens — the standard pre-training hygiene pass. Pure
    * codegen'd `regexp_replace` chain; patterns deliberately use only
    * syntax with identical semantics in java.util.regex and RE2 so the
    * operation is oracle-checkable against DuckDB. */
  def scrub(text: Column,
      emails: Boolean = true, urls: Boolean = true,
      ips: Boolean = true): Column = {
    var c = text
    // URLs first: an URL may contain an @ (userinfo) or digits that the
    // later patterns would partially redact
    if (urls) c = F.regexp_replace(c, "https?://[^\\s]+", "<URL>")
    if (emails)
      c = F.regexp_replace(c,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    if (ips)
      c = F.regexp_replace(c,
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    c
  }

  /** Canonical text normalization (the standard pre-dedup/pre-tokenize
    * step): lowercase, strip diacritics (native NFD expression — no Spark
    * builtin), collapse whitespace runs to one space, trim. Pure per-row
    * expression pipeline, scan speed. */
  def normalize(text: Column, lowercase: Boolean = true,
      stripAccents: Boolean = true, collapseWhitespace: Boolean = true): Column = {
    val lowered = if (lowercase) F.lower(text) else text
    val stripped =
      if (stripAccents) graft.functions.TextExprs.stripAccents(lowered)
      else lowered
    if (collapseWhitespace)
      F.trim(F.regexp_replace(stripped, "\\s+", " "))
    else stripped
  }

  /** Token-window chunking: split each document into chunks of `size`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens
    * (stride = size − overlap) — the standard doc→sequence step for
    * long-document training and retrieval indexing. Chunk i covers tokens
    * `[1 + i·stride, 1 + i·stride + size)`; the final chunk may be
    * shorter; a document shorter than `size` yields exactly one chunk;
    * empty/whitespace documents yield none.
    *
    * Scale shape: one `posexplode` over a per-row chunk-index sequence —
    * pure scan-side row expansion (the sequence is O(n/stride) ints, the
    * chunk texts are slices of one tokenization), no shuffle, no state,
    * streaming-legal. Output: `id, chunk_id, chunk_text, n_tokens`. */
  def chunk(df: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap $overlap must be in [0, size=$size)")
    val stride = size - overlap
    val toks = tokens(text)
    val n = F.when(F.length(F.trim(text)) === 0, 0)
      .otherwise(F.size(toks))
    // extra chunks past the first: ceil((n - size) / stride), floored at 0
    val extra = F.greatest(
      F.ceil((n - size).cast(DoubleType) / stride).cast(IntegerType), F.lit(0))
    val idx = F.when(n > 0, F.sequence(F.lit(0), extra)).otherwise(
      F.array().cast(ArrayType(IntegerType)))
    df.select(id.as("id"), toks.as("__toks"), n.as("__n"),
        F.explode(idx).as("chunk_id"))
      .select(F.col("id"), F.col("chunk_id"),
        F.array_join(F.slice(F.col("__toks"),
          F.col("chunk_id") * stride + 1, F.lit(size)), " ").as("chunk_text"),
        F.least(F.lit(size), F.col("__n") - F.col("chunk_id") * stride)
          .cast(LongType).as("n_tokens"))
  }

  /** Corpus-wide top-k token n-grams by occurrence count (multiset, not
    * the per-document distinct sets [[graft.operators.Dedup.shingles]]
    * feeds to MinHash) — the standard boilerplate-discovery scan used to
    * calibrate repetition filters and spot templating.
    *
    * Scale shape: per-row gram expansion (a transform over ONE let-bound
    * tokenization — no join, no state) → explode → count groupBy with
    * map-side partial aggregation → `orderBy.limit(k)`, which plans as
    * TakeOrderedAndProject (per-partition top-k heaps + driver merge of k
    * rows — never a global sort). Deterministic tie-break: count desc,
    * gram asc. */
  def topNgrams(df: DataFrame, text: Column, n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    require(k >= 1, s"top-k must be positive, got $k")
    val grams = let(tokens(text)) { toks =>
      val m = F.size(toks) - (n - 1)
      F.when(F.length(F.trim(text)) === 0 || m <= 0,
        F.array().cast(ArrayType(StringType)))
        .otherwise(F.transform(F.sequence(F.lit(1), m),
          i => F.array_join(F.slice(toks, i, F.lit(n)), " ")))
    }
    df.select(F.explode(grams).as("ngram"))
      .groupBy("ngram").agg(F.count(F.lit(1)).as("freq"))
      .orderBy(F.col("freq").desc, F.col("ngram").asc)
      .limit(k)
  }

  /** Per-group top-k n-grams (e.g. per-source/domain boilerplate): same
    * expansion and counts as [[topNgrams]], with the top-k taken inside
    * each group by a rank window partitioned on the group column — Spark
    * plans the rank-≤-k filter as WindowGroupLimit (map-side per-group
    * heaps before the shuffle), never a global sort or a driver loop. */
  def topNgramsBy(df: DataFrame, group: Column, text: Column,
      n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    require(k >= 1, s"top-k must be positive, got $k")
    val grams = let(tokens(text)) { toks =>
      val m = F.size(toks) - (n - 1)
      F.when(F.length(F.trim(text)) === 0 || m <= 0,
        F.array().cast(ArrayType(StringType)))
        .otherwise(F.transform(F.sequence(F.lit(1), m),
          i => F.array_join(F.slice(toks, i, F.lit(n)), " ")))
    }
    val w = Window.partitionBy("group")
      .orderBy(F.col("freq").desc, F.col("ngram").asc)
    df.select(group.as("group"), F.explode(grams).as("ngram"))
      .groupBy("group", "ngram").agg(F.count(F.lit(1)).as("freq"))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("group", "ngram", "freq", "rank")
  }

  /** The quantile aggregate behind [[quantileFilter]] and [[corpusStats]].
    * Default is `approx_percentile` — a Greenwald-Khanna sketch whose merge
    * buffer is O(accuracy·log n) REGARDLESS of corpus size, with the
    * ε-quantile guarantee `rank(v)/n ∈ [q − 1/accuracy, q + 1/accuracy]`.
    * That is the only shape that survives 100 TB: Spark's EXACT
    * `percentile` aggregate accumulates the full value multiset into one
    * final merge buffer — an OOM on a web corpus of near-unique double
    * scores. `exact = true` opts into the exact interpolated percentile
    * for small frames and cross-engine oracle parity (exact results are
    * engine-portable; sketch results are not). */
  private def percentileAgg(c: Column, q: Double, exact: Boolean,
      accuracy: Int): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile q=$q out of [0, 1]")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    if (exact) F.percentile(c, F.lit(q))
    // cast: approx_percentile returns the input type (an actual element of
    // the multiset, no interpolation); exact percentile returns double —
    // pin both paths to one threshold/output schema
    else F.approx_percentile(c, F.lit(q), F.lit(accuracy)).cast(DoubleType)
  }

  /** The corpus-wide `q`-th quantile of `score` as a scalar-subquery
    * Column: the aggregation executes once inside the consuming plan and
    * its value is injected as a literal — no driver-side action. Approx
    * (sketch) by default; see [[percentileAgg]] for the trade. */
  def quantileThreshold(df: DataFrame, score: Column, q: Double,
      exact: Boolean = false, accuracy: Int = 10000): Column =
    org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      df.select(percentileAgg(score, q, exact, accuracy)))

  /** Quantile gate: keep rows whose `score` is at or above the corpus-wide
    * `q`-th quantile of that score — the standard "top-(1-q) by quality"
    * selection step of a filtering pipeline. The threshold is computed as
    * a scalar subquery in the same plan (one extra aggregation pass over
    * the score column — inherent to any self-referential quantile filter;
    * no driver-side action). Default threshold is `approx_percentile`
    * (bounded-memory sketch — the 100 TB posture); `exact = true` swaps in
    * the exact interpolated percentile, whose merge buffer holds the full
    * score multiset — small-frame / oracle-parity use only. */
  def quantileFilter(df: DataFrame, score: Column, q: Double,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val scored = df.withColumn("__score", score)
    val thr = quantileThreshold(scored, F.col("__score"), q, exact, accuracy)
    scored.filter(F.col("__score") >= thr).drop("__score")
  }

  /** One-row corpus profile — the `describe` of a text corpus: document
    * and token totals, token-count distribution percentiles, and the
    * English share by stopword language ID. ONE aggregation pass over one
    * scan (every input is a per-row expression). Percentiles default to
    * the `approx_percentile` sketch (bounded merge buffers — the 100 TB
    * posture); `exact = true` opts into exact interpolated percentiles
    * for small frames and cross-engine oracle parity. */
  def corpusStats(df: DataFrame, text: Column,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame =
    df.select(tokenCount(text).as("__tok"), langId(text).as("__lang"))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum("__tok").as("n_tokens"),
        F.round(F.avg("__tok"), 6).as("avg_doc_tokens"),
        F.round(percentileAgg(F.col("__tok"), 0.5, exact, accuracy), 6)
          .as("p50_tokens"),
        F.round(percentileAgg(F.col("__tok"), 0.9, exact, accuracy), 6)
          .as("p90_tokens"),
        F.max("__tok").as("max_tokens"),
        F.count_if(F.col("__lang") === "en").as("n_english"))

  /** Corpus size N, kept INSIDE the consuming query plan as a scalar
    * subquery (no separate driver-side count() action per operator; for a
    * parquet source the count is footer-only). */
  private def corpusSize(df: DataFrame): Column =
    org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      df.select(F.count(F.lit(1))))

  /** The df-banding upper bound: floor(maxDfRatio · N). `floor` (not
    * round) on BOTH the engine and every oracle twin — truncation vs
    * round-to-nearest differ by 1 for odd N, which would make
    * verification data-dependent. */
  private def dfBound(df: DataFrame, maxDfRatio: Double): Column =
    F.floor(F.lit(maxDfRatio) * corpusSize(df))

  /** Corpus vocabulary with document-frequency banding: one row per token
    * with `doc_freq` (documents containing it) and `term_freq` (total
    * occurrences), keeping `minDf <= doc_freq <= floor(maxDfRatio * N)`.
    *
    * Scale shape: explode → two-level aggregation — groupBy(token, doc)
    * partial-counts map-side, then groupBy(token) — instead of
    * `count_distinct(doc)`, whose per-group distinct-set buffers are the
    * classic OOM at web-corpus vocabulary sizes. Both shuffles carry
    * fixed-width keys after the first combine. N enters as a scalar
    * subquery in the same plan (parquet count is footer-only), not a
    * separate full-corpus action. */
  def vocabulary(df: DataFrame, id: Column, text: Column,
      minDf: Long = 1L, maxDfRatio: Double = 1.0): DataFrame = {
    val perDoc = df
      .select(id.as("__doc"), F.explode(tokensOrEmpty(text)).as("token"))
      .groupBy("__doc", "token").agg(F.count(F.lit(1)).as("__tf"))
    perDoc.groupBy("token")
      .agg(F.count(F.lit(1)).as("doc_freq"), F.sum("__tf").as("term_freq"))
      .filter(F.col("doc_freq") >= minDf &&
        F.col("doc_freq") <= dfBound(df, maxDfRatio))
  }

  /** Top-k TF-IDF terms per document: tf(doc, token) · ln(N / df(token)),
    * deterministic tie-break (score desc, token asc).
    *
    * Scale shape: the per-token doc-frequency table is vocabulary-sized
    * (≪ corpus) and hash-joins back onto the (doc, token) counts; the
    * top-k window partitions by doc id — hash-distributed, never a global
    * window. `maxDfRatio` drops ubiquitous tokens BEFORE the join, which
    * both bounds the join's skew (stopword postings are the hot keys) and
    * matches the IDF intuition that they score ~0 anyway. */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column, k: Int,
      maxDfRatio: Double = 0.5): DataFrame = {
    val tf = df
      .select(id.as("doc_id"), F.explode(tokensOrEmpty(text)).as("token"))
      .groupBy("doc_id", "token").agg(F.count(F.lit(1)).as("tf"))
    val docFreq = tf.groupBy("token")
      .agg(F.count(F.lit(1)).as("df"))
      .filter(F.col("df") <= dfBound(df, maxDfRatio))
    val w = Window.partitionBy("doc_id")
      .orderBy(F.col("score").desc, F.col("token").asc)
    tf.join(docFreq, "token")
      .withColumn("score",
        F.round(F.col("tf") *
          F.log(corpusSize(df).cast(DoubleType) / F.col("df")), 6))
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("doc_id", "token", "score", "rank")
  }

  /** Unigram language-model log-loss — the CCNet-style perplexity
    * filtering signal in its honestly-stated one-gram form (CCNet proper
    * scores with a 5-gram KenLM; the pipeline shape — train token
    * statistics on a REFERENCE corpus, score every candidate document,
    * gate on the score distribution — is identical, and the reference
    * model here is a DataFrame, not driver state). Add-one smoothing:
    * `p(t) = (count_ref(t) + 1) / (N + V + 1)` with `N` = reference token
    * occurrences and `V` = reference vocabulary size (the `+1` bucket is
    * every out-of-vocabulary token's mass); a document scores
    * `mean(-ln p(t))` over its tokens — low = fluent under the reference
    * distribution, high = off-distribution (or OOV-dense) text. Empty and
    * null documents score null (no tokens = no evidence, not "perfectly
    * fluent"). Compose with [[quantileFilter]] to gate, exactly as CCNet
    * gates on perplexity terciles.
    *
    * Scale shape: the reference collapses to a vocabulary-sized count
    * table (two map-side-combined aggregations); scoring is explode →
    * LEFT join that table (auto-broadcast at typical vocab sizes) → one
    * per-doc mean with map-side combine; N and V ride along as scalar
    * subqueries in the same plan. */
  def unigramLogLoss(df: DataFrame, id: Column, text: Column,
      ref: DataFrame, refText: Column): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    def toks(t: Column) = F.when(F.length(F.trim(t)) === 0,
      F.array().cast(ArrayType(StringType))).otherwise(tokens(t))
    val counts = ref.select(F.explode(toks(refText)).as("__term"))
      .groupBy("__term").agg(F.count(F.lit(1)).as("__c"))
    // N and V both derive from the vocabulary-sized counts table — the
    // reference corpus is scanned exactly once, not re-tokenized per
    // statistic
    val nTok = bridge.scalarSubquery(
      counts.select(F.coalesce(F.sum("__c"), F.lit(0L))))
    val vSize = bridge.scalarSubquery(counts.select(F.count(F.lit(1))))
    val denom = (nTok + vSize + F.lit(1L)).cast(DoubleType)
    val scored = df.select(id.as("doc_id"), F.explode(toks(text)).as("__term"))
      .join(counts, Seq("__term"), "left")
      .groupBy("doc_id")
      .agg(F.round(F.avg(-F.log(
        (F.coalesce(F.col("__c"), F.lit(0L)) + F.lit(1L)).cast(DoubleType)
          / denom)), 6).as("log_loss"))
    df.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
  }

  /** Apply a linear text classifier — a vocabulary-keyed weight table,
    * the fastText / web-quality-classifier model head — at corpus scale:
    * per-document `score = sigmoid(bias + Σ_occurrences weight(token))`,
    * out-of-vocabulary tokens contributing zero. The model IS a DataFrame
    * (`term`, `weight`): no driver-side model state, so a multi-million-row
    * head ships as an ordinary join side (auto-broadcast when it fits,
    * shuffle-hash when it doesn't — never forced).
    *
    * Scale shape: explode → INNER join the vocabulary BEFORE the per-doc
    * aggregation, so out-of-vocabulary occurrences (most of a web corpus)
    * die map-side and never enter the shuffle; the one shuffled groupBy
    * carries (id, partial-sum) after map-side combine. Documents with zero
    * vocabulary hits (including empty/null text) are restored by a left
    * join against the input's id spine at `sigmoid(bias)`.
    *
    * `scale` multiplies the summed weight before the sigmoid. Its real
    * job is fixed-point determinism: a distributed float sum is
    * order-dependent in the last ulp, and Spark does not pin partition
    * order — so the same corpus can score differently run to run at the
    * rounding boundary. Shipping integer-valued weights (e.g.
    * `floor(1000 * w)`) with `scale = 0.001` makes the sum EXACT (integer
    * arithmetic in doubles below 2^53) under any partitioning; the only
    * float ops left are one multiply and one sigmoid, which are
    * partition-order-free. Score is rounded to 6 dp — the cross-engine
    * float contract every oracle twin in this codebase pins. */
  def scoreLinear(df: DataFrame, id: Column, text: Column,
      weights: DataFrame, term: String = "term", weight: String = "weight",
      bias: Double = 0.0, scale: Double = 1.0): DataFrame = {
    val toks = F.when(F.length(F.trim(text)) === 0,
      F.array().cast(ArrayType(StringType))).otherwise(tokens(text))
    val w = weights.select(F.col(term).as("__term"),
      F.col(weight).cast(DoubleType).as("__w"))
    val hits = df.select(id.as("doc_id"), F.explode(toks).as("__term"))
      .join(w, "__term")
      .groupBy("doc_id").agg(F.sum("__w").as("__s"))
    df.select(id.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(F.col("doc_id"),
        F.round(F.lit(1.0) / (F.lit(1.0) +
          F.exp(-(F.lit(scale) * F.coalesce(F.col("__s"), F.lit(0.0)) +
            F.lit(bias)))), 6)
          .as("score"))
  }
}
