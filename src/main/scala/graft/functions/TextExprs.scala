package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hot path.
  *
  * The `zip_with`/`aggregate` higher-order-function formulations of shingling
  * and MinHash run on Catalyst's interpreted lambda path (HOFs never
  * whole-stage-codegen): profiled at sf0.1 they evaluate millions of lambda
  * nodes per partition and dominate every near-dup operator. These
  * expressions do the same work in one `eval` call per row with JIT-compiled
  * imperative loops — the preference order of SURVEY §7.3 (custom Expression
  * over mapPartitions: stays a column, composes with projection pushdown and
  * the rest of the plan).
  *
  * Hashing is Spark's own XXH64 over UTF-8 word bytes, so results are
  * stable across executors/JVMs with zero driver state. */
private[graft] object TextHashing {
  private val ws = "\\s+".r.pattern

  /** Lowercased whitespace tokens of a document. */
  def words(text: UTF8String): Array[String] = {
    val s = text.toString.trim.toLowerCase
    if (s.isEmpty) Array.empty else ws.split(s)
  }

  def hashWord(w: String, seed: Long): Long = {
    val b = UTF8String.fromString(w)
    XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, seed)
  }

  /** Hash identities of the word n-grams (not deduplicated). */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val ws = words(text)
    if (ws.length < n) return Array.empty
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = hashWord(ws(i), 42L); i += 1 }
    val out = new Array[Long](ws.length - n + 1)
    i = 0
    while (i < out.length) {
      var h = wh(i)
      var j = 1
      while (j < n) { h = XXH64.hashLong(wh(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature (Kirsch-Mitzenmacher h1 + i·h2) + per-band fold
    * over a shingle-hash array — shared by the from-text and from-hashes
    * expressions, which is all their band-space agreement requires. */
  def bandHashes(hs: Array[Long], numHashes: Int, bands: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val s = hs(i)
      val h1 = s & 0x3FFFFFFFFFFFFFFFL
      val h2 = XXH64.hashLong(s, 42L) & 0x00FFFFFFFFFFFFFFL
      var k = 0
      var h = h1
      while (k < numHashes) {
        if (h < sig(k)) sig(k) = h
        h += h2
        k += 1
      }
      i += 1
    }
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var k = b * rows
      val end = k + rows
      while (k < end) { h = XXH64.hashLong(sig(k), h); k += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}

/** text → array<bigint>: distinct, sorted word-n-gram hash identities. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  
  override def prettyName: String = "shingle_hashes"
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val hs = TextHashing.shingleHashes(input.asInstanceOf[UTF8String], n)
    java.util.Arrays.sort(hs)
    // dedupe in place on the sorted array
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

/** text → array<bigint>: MinHash signature of the shingle set, fused
  * (shingling and the k-way min in one pass, no intermediate allocation
  * proportional to k×shingles). Kirsch-Mitzenmacher family h1 + i·h2 with
  * 62/56-bit masks (ANSI-safe, order statistics preserved). */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val hs = TextHashing.shingleHashes(input.asInstanceOf[UTF8String], n)
    var i = 0
    while (i < hs.length) {
      val s = hs(i)
      val h1 = s & 0x3FFFFFFFFFFFFFFFL
      val h2 = XXH64.hashLong(s, 42L) & 0x00FFFFFFFFFFFFFFL
      var k = 0
      var h = h1
      while (k < numHashes) {
        if (h < sig(k)) sig(k) = h
        h += h2 // h1 + k·h2, accumulated
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** array<bigint> (sorted bucket ids) → array<struct<id_a,id_b>>: all ordered
  * pairs (i < j). The nested-transform HOF formulation builds every pair
  * struct through interpreted lambdas — for the ~10^6 pairs a skewed bucket
  * set produces, the imperative eval is the difference between the pair
  * expansion being free and being the pipeline's top cost. */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a", LongType, false),
      org.apache.spark.sql.types.StructField("id_b", LongType, false))),
    containsNull = false)
  // the eval reads raw longs out of UnsafeArrayData — any other element
  // type would read garbage silently, so the bigint-id contract is checked
  // at analysis time, not left to a runtime cast
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ordered_pairs requires array<bigint> ids, got ${other.sql}")
    }
  override def prettyName: String = "ordered_pairs"
  override protected def withNewChildInternal(c: Expression): OrderedPairs =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val n = ids.length
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** text → array<bigint>: per-band bucket hashes of the MinHash signature,
  * fully fused — shingling, the k-way min, AND the per-band fold in one
  * eval, never materializing the signature array as a column. Replaces
  * `transform(sequence(0,bands-1), b -> xxhash64(slice(sig,...)))`, which
  * ran interpreted and allocated `bands` slices per row. Bucket ids are a
  * different (but equally collision-resistant) hash of the same band
  * content, so LSH semantics — equal band ⇒ same bucket — are unchanged. */
case class MinHashBandHashes(child: Expression, n: Int, numHashes: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, s"numHashes $numHashes % bands $bands != 0")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"
  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.bandHashes(
      TextHashing.shingleHashes(input.asInstanceOf[UTF8String], n),
      numHashes, bands))
}

/** array<bigint> (shingle hashes, e.g. a dedup index's stored features) →
  * array<bigint>: the SAME signature + per-band fold as
  * [[MinHashBandHashes]], minus the shingling — MinHash is
  * duplicate-insensitive, so band hashes over a doc's stored distinct
  * shingle hashes equal band hashes over its text. This is what lets
  * index COMPACTION rebuild postings exactly without ever re-reading
  * corpus text. */
case class MinHashBandHashesFromHashes(child: Expression, numHashes: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, s"numHashes $numHashes % bands $bands != 0")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes_from_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_hashes_from_hashes requires array<bigint>, got ${other.sql}")
    }
  override protected def withNewChildInternal(c: Expression): MinHashBandHashesFromHashes =
    copy(child = c)
  // element-by-element copy, NOT toLongArray: a parquet round trip reads
  // stored (null-free) arrays back as containsNull=true, and toLongArray
  // on a null element dies with an unhelpful assertion/NPE — name the
  // contract violation instead
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"minhash_band_hashes_from_hashes: null element at position $i — " +
          "stored shingle-hash arrays are built null-free; this input is " +
          "not a stored feature array")
      hashes(i) = arr.getLong(i)
      i += 1
    }
    new GenericArrayData(TextHashing.bandHashes(hashes, numHashes, bands))
  }
}

/** array<struct<id,simhash>> (sorted bucket rows) → array<struct<id_a,
  * id_b,distance>>: ordered pairs (i < j) whose Hamming distance is at most
  * `maxDistance` — pair expansion, popcount(xor) and the distance filter
  * fused in one imperative eval. The HOF formulation (`transform` over
  * `slice`) re-evaluates the bucket array per element (the quadratic
  * interpreted-lambda trap this file exists to avoid), and emitting only
  * surviving pairs keeps degenerate buckets from materializing ~maxBucket²
  * rejected structs. */
case class HammingPairs(child: Expression, maxDistance: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a", LongType, false),
      org.apache.spark.sql.types.StructField("id_b", LongType, false),
      org.apache.spark.sql.types.StructField("distance",
        org.apache.spark.sql.types.IntegerType, false))),
    containsNull = false)
  // same bigint-id contract as OrderedPairs: getLong on a non-long struct
  // field would throw (or silently misread UnsafeRow-backed arrays), so
  // reject anything but struct<bigint,bigint> elements at analysis time
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: org.apache.spark.sql.types.StructType, _)
          if s.length == 2 && s.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hamming_pairs requires array<struct<bigint,bigint>>, got ${other.sql}")
    }
  override def prettyName: String = "hamming_pairs"
  override protected def withNewChildInternal(c: Expression): HammingPairs =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val rows = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = rows.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = rows.getStruct(i, 2)
      ids(i) = r.getLong(0); sigs(i) = r.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (d <= maxDistance)
          out += org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), d)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<bigint> → bigint: how many of the row's elements are present in
  * the SORTED reference set, by per-element binary search. The set lives
  * in the expression instance — a plan-broadcast literal shipped once per
  * task (like IVF centroids in TopCells), NOT rebuilt per row the way
  * `array_intersect`'s hash set is — so a 10^5-entry benchmark set costs
  * each row only `s·log B` comparisons. The contamination gate's hot loop:
  * stateless, shuffle-free, and therefore legal in Structured Streaming
  * scans. */
case class SortedSetOverlap(child: Expression, set: Array[Long])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_set_overlap requires array<bigint>, got ${other.sql}")
    }
  override def prettyName: String = "sorted_set_overlap"
  override protected def withNewChildInternal(c: Expression): SortedSetOverlap =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    var n = 0L
    var i = 0
    while (i < xs.length) {
      if (java.util.Arrays.binarySearch(set, xs(i)) >= 0) n += 1
      i += 1
    }
    n
  }
}

/** text → bigint: number of non-overlapping matches of `pattern`. Same
  * java.util.regex engine as Spark's regexp_* functions (identical counts),
  * but counts with a reused Matcher instead of materializing every match
  * into an array (`size(regexp_extract_all(...))` allocates all matches). */
case class CountRegexMatches(child: Expression, pattern: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "count_regex_matches"
  override protected def withNewChildInternal(c: Expression): CountRegexMatches =
    copy(child = c)

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    var n = 0L
    while (m.find()) n += 1
    n
  }
}

/** text → bigint: BPE token count under a caller-supplied ranked merge
  * table — the pluggable tokenizer for token budgets (packing, mixture,
  * corpus stats), so budgets can match a real training tokenizer instead
  * of whitespace counts (r6 verdict #8). Pre-tokenization is whitespace
  * splitting; each word seeds as its character sequence and the standard
  * BPE encode loop runs: find the lowest-RANK adjacent pair, merge ALL
  * its occurrences left-to-right, repeat until no mergeable pair remains
  * (the GPT-2 `bpe()` loop — load a published merges.txt's pairs in file
  * order for tokenizer-true counts). The merge table rides as a plan
  * literal and the rank map is built ONCE per task (the TopCells /
  * SortedSetOverlap posture), not per row — at GPT-2 scale that is one
  * ~50k-entry map per task. Whitespace itself is not counted (no
  * byte-level space marker), so counts equal Σ over words of |BPE(word)|. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)

  // a space joins the pair halves: words are whitespace-split, so no
  // merge symbol can contain one — the concatenation is collision-free
  // (and matches the "A B" line format of published merges files)
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    merges.foreach { case (a, b) =>
      m.putIfAbsent(a + " " + b, Integer.valueOf(i)); i += 1
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val buf = new scala.collection.mutable.ArrayBuffer[String](16)
    var count = 0L
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        buf.clear()
        var j = start
        while (j < i) { buf += String.valueOf(s.charAt(j)); j += 1 }
        var done = buf.length < 2
        while (!done) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          var p = 0
          while (p < buf.length - 1) {
            val r = rank.get(buf(p) + " " + buf(p + 1))
            if (r != null && r < bestRank) { bestRank = r; bestIdx = p }
            p += 1
          }
          if (bestIdx < 0) done = true
          else {
            val a = buf(bestIdx)
            val b = buf(bestIdx + 1)
            var w = 0
            while (w < buf.length - 1) {
              if (buf(w) == a && buf(w + 1) == b) {
                buf(w) = a + b; buf.remove(w + 1)
              } else w += 1
            }
            done = buf.length < 2
          }
        }
        count += buf.length
      }
    }
    count
  }
}

/** text → bigint: 64-bit SimHash over word tokens — each bit is the sign
  * of the ±1 vote sum across token hashes (token multiplicity counts).
  * Same tokenization + XXH64(seed 42) as `xxhash64(token)`, so it is
  * bit-identical to the explode → groupBy(sum per bit) formulation it
  * replaces — except that formulation shuffled EVERY TOKEN of the corpus
  * to aggregate votes, while this is one eval per row: the signature
  * stage of simhash dedup drops from two stages + a token-wide exchange
  * to scan speed. Empty documents yield 0L. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val ws = TextHashing.words(input.asInstanceOf[UTF8String])
    val votes = new Array[Int](64)
    var i = 0
    while (i < ws.length) {
      val h = TextHashing.hashWord(ws(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** text → text with diacritics removed: Unicode NFD decomposition, then
  * drop combining marks (á→a, ö→o). No Spark builtin covers this; the JDK
  * normalizer does it without a UDF's serialization overhead. Matches
  * DuckDB's `strip_accents` on Latin text (oracle-checked). */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)

  @transient private lazy val marks =
    java.util.regex.Pattern.compile("\\p{M}+")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val decomposed = java.text.Normalizer.normalize(
      s, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(marks.matcher(decomposed).replaceAll(""))
  }
}

/** Unicode normalization (java.text.Normalizer) as a scan-side
  * expression — the C4/RefinedWeb text-canonicalization step: NFC for
  * byte-identical comparisons across sources that emit composed vs
  * decomposed forms, NFKC when compatibility folding (ligatures,
  * full-width forms, circled digits) should merge with their plain
  * equivalents before tokenization/dedup. Form is a case-object enum
  * resolved at plan time, not a per-row string. */
case class UnicodeNormalize(child: Expression,
    form: java.text.Normalizer.Form)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"
  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, form))
}

/** text → struct<dup_line_frac, dup_line_char_frac, top_bigram_share>:
  * the standard repetition quality signals (Gopher §A1.1 / RefinedWeb
  * rep-filters) in ONE eval per row:
  *  - dup_line_frac: duplicated lines / non-empty lines;
  *  - dup_line_char_frac: characters in the 2nd+ occurrence of each
  *    repeated line / all line characters;
  *  - top_bigram_share: occurrences of the most frequent word bigram /
  *    all bigrams.
  * The SQL formulation needs two explode → groupBy(doc, line|gram) →
  * groupBy(doc) rounds — two corpus-wide shuffles to compute per-ROW
  * facts; this stays in the scan. All ratios 0.0 when the denominator is
  * empty. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dup_line_frac",
      org.apache.spark.sql.types.DoubleType, false),
    org.apache.spark.sql.types.StructField("dup_line_char_frac",
      org.apache.spark.sql.types.DoubleType, false),
    org.apache.spark.sql.types.StructField("top_bigram_share",
      org.apache.spark.sql.types.DoubleType, false)))
  override def prettyName: String = "repetition_stats"
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // lines: non-empty after \n split
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0L; var lineChars = 0L; var dupLines = 0L; var dupChars = 0L
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == '\n') {
        if (i > start) {
          val line = s.substring(start, i)
          nLines += 1; lineChars += line.length
          val prev = lineCounts.merge(line, 1, Integer.sum)
          if (prev > 1) { dupLines += 1; dupChars += line.length }
        }
        start = i + 1
      }
      i += 1
    }
    // word bigrams over the shared tokenization
    val ws = TextHashing.words(input.asInstanceOf[UTF8String])
    var topBigram = 0; val nBigrams = math.max(ws.length - 1, 0)
    if (nBigrams > 0) {
      val biCounts = new java.util.HashMap[Long, Int]()
      var j = 0
      while (j < nBigrams) {
        val h = XXH64.hashLong(TextHashing.hashWord(ws(j + 1), 42L),
          TextHashing.hashWord(ws(j), 42L))
        val c = biCounts.merge(h, 1, Integer.sum)
        if (c > topBigram) topBigram = c
        j += 1
      }
    }
    InternalRow(
      if (nLines == 0L) 0.0 else dupLines.toDouble / nLines,
      if (lineChars == 0L) 0.0 else dupChars.toDouble / lineChars,
      if (nBigrams == 0) 0.0 else topBigram.toDouble / nBigrams)
  }
}

object TextExprs {
  def countRegexMatches(text: Column, pattern: String): Column =
    Bridge.column(CountRegexMatches(Bridge.expression(text), pattern))

  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))

  def stripAccents(text: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(text)))

  /** form: "NFC" | "NFD" | "NFKC" | "NFKD" (resolved at plan time). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text),
      java.text.Normalizer.Form.valueOf(form.toUpperCase)))

  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  def hammingPairs(rows: Column, maxDistance: Int): Column =
    Bridge.column(HammingPairs(Bridge.expression(rows), maxDistance))

  def minhashBandHashes(text: Column, n: Int, numHashes: Int,
      bands: Int): Column =
    Bridge.column(MinHashBandHashes(Bridge.expression(text), n, numHashes, bands))

  def minhashBandHashesFromHashes(shingleHashes: Column, numHashes: Int,
      bands: Int): Column =
    Bridge.column(MinHashBandHashesFromHashes(
      Bridge.expression(shingleHashes), numHashes, bands))

  def orderedPairs(ids: Column): Column =
    Bridge.column(OrderedPairs(Bridge.expression(ids)))

  def sortedSetOverlap(xs: Column, set: Array[Long]): Column =
    Bridge.column(SortedSetOverlap(Bridge.expression(xs), set))

  def shingleHashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), n, numHashes))

  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))
}
