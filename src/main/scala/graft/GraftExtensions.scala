package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.functions._

/** SQL surface for the engine's native expressions — the Spark-idiomatic
  * registration path (`SparkSessionExtensions.injectFunction`), so a
  * cluster user gets `shingle_hashes(text, 3)` etc. in plain `spark.sql`
  * with `--conf spark.sql.extensions=graft.GraftExtensions`, no imports
  * and no UDF registration.
  *
  * Config parameters (shingle size, band counts, regex patterns) must be
  * foldable literals — they parameterize the expression instance itself
  * (hash-family layout, compiled pattern), exactly like Spark's own
  * `approx_count_distinct`'s rsd argument. Non-literal arguments fail at
  * analysis time with a named-argument message, not at runtime.
  *
  * [[GraftExtensions.register]] applies the same registrations to a LIVE
  * session (the extensions mechanism only runs at session construction). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register every graft SQL function into an existing session's
    * function registry (session-scoped, same builders as the injected
    * path). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got ${other.sql}")
  }

  private def litLong(fn: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got ${other.sql}")
  }

  private def litString(fn: String, arg: String, e: Expression): String =
    e match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a string literal, got ${other.sql}")
    }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def fd(name: String, clazz: Class[_], usage: String)(
      builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
      builder)

  /** Every graft SQL function: (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fd("shingle_hashes", classOf[ShingleHashes],
      "shingle_hashes(text, n) - distinct sorted word-n-gram hash identities") {
      args =>
        arity("shingle_hashes", 2, args)
        ShingleHashes(args(0), litInt("shingle_hashes", "n", args(1)))
    },
    fd("minhash_signature", classOf[MinHashSignature],
      "minhash_signature(text, n, num_hashes) - MinHash signature of the shingle set") {
      args =>
        arity("minhash_signature", 3, args)
        MinHashSignature(args(0), litInt("minhash_signature", "n", args(1)),
          litInt("minhash_signature", "num_hashes", args(2)))
    },
    fd("minhash_band_hashes", classOf[MinHashBandHashes],
      "minhash_band_hashes(text, n, num_hashes, bands) - per-band LSH bucket hashes") {
      args =>
        arity("minhash_band_hashes", 4, args)
        MinHashBandHashes(args(0),
          litInt("minhash_band_hashes", "n", args(1)),
          litInt("minhash_band_hashes", "num_hashes", args(2)),
          litInt("minhash_band_hashes", "bands", args(3)))
    },
    fd("minhash_band_hashes_from_hashes", classOf[MinHashBandHashesFromHashes],
      "minhash_band_hashes_from_hashes(shingle_hashes, num_hashes, bands) " +
        "- per-band LSH bucket hashes from a stored shingle-hash array") {
      args =>
        arity("minhash_band_hashes_from_hashes", 3, args)
        MinHashBandHashesFromHashes(args(0),
          litInt("minhash_band_hashes_from_hashes", "num_hashes", args(1)),
          litInt("minhash_band_hashes_from_hashes", "bands", args(2)))
    },
    fd("ordered_pairs", classOf[OrderedPairs],
      "ordered_pairs(ids) - all (i < j) pairs of a sorted bigint id array") {
      args =>
        arity("ordered_pairs", 1, args)
        OrderedPairs(args(0))
    },
    fd("hamming_pairs", classOf[HammingPairs],
      "hamming_pairs(rows, max_distance) - id pairs within Hamming distance") {
      args =>
        arity("hamming_pairs", 2, args)
        HammingPairs(args(0), litInt("hamming_pairs", "max_distance", args(1)))
    },
    fd("count_regex_matches", classOf[CountRegexMatches],
      "count_regex_matches(text, pattern) - non-overlapping regex match count") {
      args =>
        arity("count_regex_matches", 2, args)
        CountRegexMatches(args(0),
          litString("count_regex_matches", "pattern", args(1)))
    },
    fd("simhash64", classOf[SimHash64],
      "simhash64(text) - 64-bit SimHash over word tokens") { args =>
        arity("simhash64", 1, args)
        SimHash64(args(0))
    },
    fd("strip_accents", classOf[StripAccents],
      "strip_accents(text) - NFD-decompose and drop combining marks") { args =>
        arity("strip_accents", 1, args)
        StripAccents(args(0))
    },
    fd("unicode_normalize", classOf[UnicodeNormalize],
      "unicode_normalize(text, form) - java.text.Normalizer NFC/NFD/NFKC/NFKD") {
      args =>
        arity("unicode_normalize", 2, args)
        UnicodeNormalize(args(0), java.text.Normalizer.Form.valueOf(
          litString("unicode_normalize", "form", args(1)).toUpperCase))
    },
    fd("repetition_stats", classOf[RepetitionStats],
      "repetition_stats(text) - struct(dup_line_frac, dup_line_char_frac, top_bigram_share)") {
      args =>
        arity("repetition_stats", 1, args)
        RepetitionStats(args(0))
    },
    fd("hyperplane_sig", classOf[HyperplaneSig],
      "hyperplane_sig(vec, planes, seed) - random-hyperplane sign bits packed into a bigint") {
      args =>
        arity("hyperplane_sig", 3, args)
        HyperplaneSig(args(0), litInt("hyperplane_sig", "planes", args(1)),
          litLong("hyperplane_sig", "seed", args(2)))
    },
    fd("capped_sorted_ids", classOf[CappedSortedIds],
      "capped_sorted_ids(id, cap) - sorted bucket ids, null when <2 or >cap collected") {
      args =>
        arity("capped_sorted_ids", 2, args)
        CappedSortedIds(args(0), litInt("capped_sorted_ids", "cap", args(1)))
    },
    fd("sorted_set_overlap", classOf[SortedSetOverlap],
      "sorted_set_overlap(hashes, set) - how many hashes are in the literal bigint set") {
      args =>
        arity("sorted_set_overlap", 2, args)
        // the set parameterizes the expression (sorted for binary search),
        // exactly like the Column-API decontamination gate — it must fold
        // at analysis time, it is not a per-row operand
        val setExpr = args(1)
        if (!setExpr.foldable) throw new IllegalArgumentException(
          "sorted_set_overlap: argument 'set' must be a foldable array " +
            s"literal, got ${setExpr.sql}")
        import org.apache.spark.sql.catalyst.util.ArrayData
        val longs = (setExpr.eval(), setExpr.dataType) match {
          case (null, _) => Array.empty[Long]
          case (a: ArrayData, org.apache.spark.sql.types.ArrayType(LongType, _)) =>
            a.toLongArray()
          case (a: ArrayData, org.apache.spark.sql.types.ArrayType(IntegerType, _)) =>
            a.toIntArray().map(_.toLong)
          case (_, dt) => throw new IllegalArgumentException(
            s"sorted_set_overlap: 'set' must be array<bigint>, got ${dt.sql}")
        }
        java.util.Arrays.sort(longs)
        SortedSetOverlap(args(0), longs)
    },
    fd("bpe_token_count", classOf[BpeTokenCount],
      "bpe_token_count(text, merges) - BPE token count under a ranked " +
        "merge table: array(array('l','o'), array('lo','w'), ...) in " +
        "merges-file order") {
      args =>
        arity("bpe_token_count", 2, args)
        // the merge table parameterizes the expression (rank map built
        // once per task) — a foldable array<array<string>> literal, each
        // inner array an (a, b) pair in rank order
        val mExpr = args(1)
        if (!mExpr.foldable) throw new IllegalArgumentException(
          "bpe_token_count: argument 'merges' must be a foldable " +
            s"array<array<string>> literal, got ${mExpr.sql}")
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.unsafe.types.UTF8String
        val merges = (mExpr.eval(), mExpr.dataType) match {
          case (null, _) => Seq.empty[(String, String)]
          case (a: ArrayData, org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(StringType, _), _)) =>
            (0 until a.numElements()).map { i =>
              val pair = a.getArray(i)
              if (pair == null || pair.numElements() != 2)
                throw new IllegalArgumentException(
                  s"bpe_token_count: merge #$i must be a 2-element pair")
              (pair.getUTF8String(0).toString,
                pair.getUTF8String(1).toString)
            }
          case (_, dt) => throw new IllegalArgumentException(
            "bpe_token_count: 'merges' must be array<array<string>>, " +
              s"got ${dt.sql}")
        }
        BpeTokenCount(args(0), merges)
    })
}
