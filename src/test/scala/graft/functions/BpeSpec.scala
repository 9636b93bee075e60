package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import graft.operators.{Packing, TextAnalysis}

/** BpeTokenCount vs an INDEPENDENT reference implementation of the
  * classic BPE encode loop (GPT-2 encoder.py `bpe()`: find the best-rank
  * pair, merge all occurrences, repeat), plus hand-computed fixtures and
  * the token-budget plumbing it exists for. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE, written functional-style on purpose (different code
    * path from the expression's imperative buffer loop). */
  private def refBpe(word: String, ranks: Map[(String, String), Int]): Int = {
    @annotation.tailrec
    def loop(toks: Vector[String]): Vector[String] = {
      val pairs = toks.zip(toks.drop(1))
      val ranked = pairs.flatMap(p => ranks.get(p).map(p -> _))
      if (ranked.isEmpty) toks
      else {
        val (best, _) = ranked.minBy(_._2)
        // merge every occurrence left-to-right, non-overlapping
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && (toks(i), toks(i + 1)) == best) {
            out += toks(i) + toks(i + 1); i += 2
          } else { out += toks(i); i += 1 }
        }
        loop(out.result())
      }
    }
    if (word.isEmpty) 0 else loop(word.map(String.valueOf(_)).toVector).length
  }

  private def refCount(text: String,
      ranks: Map[(String, String), Int]): Long =
    text.split("\\s+").filter(_.nonEmpty).map(refBpe(_, ranks).toLong).sum

  private def sparkCount(texts: Seq[String],
      merges: Seq[(String, String)]): Seq[Long] = {
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    d.select(F.col("id"),
      TextAnalysis.bpeTokenCount(F.col("text"), merges).as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
  }

  test("hand-computed fixtures (GPT-2 bpe() semantics)") {
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r")
    // "lower": l o w e r -> lo -> low -> er => [low, er]
    // "low":   l o w -> lo -> low => [low]
    // "newest": no merges apply beyond e+r absent => chars: 6... e,r not
    // adjacent ("st" after "e"): n e w e s t => 6 tokens
    assert(sparkCount(
      Seq("lower lower", "low", "newest", "", "   ", "xyz"),
      merges) == Seq(4L, 1L, 6L, 0L, 0L, 3L))
    // rank order matters: with (e,r) ranked FIRST, "ler" -> l er (2), not
    // le r — pin against a reordered table
    assert(sparkCount(Seq("ler"), Seq("e" -> "r", "l" -> "e")) == Seq(2L))
    assert(sparkCount(Seq("ler"), Seq("l" -> "e", "e" -> "r")) == Seq(2L))
    // merge-all-occurrences in one step: "aaaa" with (a,a) then (aa,aa)
    assert(sparkCount(Seq("aaaa"), Seq("a" -> "a", "aa" -> "aa")) ==
      Seq(1L))
    // odd run: aaa -> [aa, a] (left-to-right, non-overlapping)
    assert(sparkCount(Seq("aaa"), Seq("a" -> "a")) == Seq(2L))
  }

  test("matches the independent reference implementation on a seeded " +
      "random corpus under a random merge table") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def randWord() = (0 until (1 + rnd.nextInt(8)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // random merge table over the alphabet + some composites
    val symbols = alphabet.map(String.valueOf(_)) ++
      Seq("ab", "cd", "abc", "aa", "bb")
    val merges = rnd.shuffle(
      (for { a <- symbols; b <- symbols } yield (a, b)).toSeq).take(30)
    val ranks = merges.zipWithIndex.toMap
    val texts = (0 until 100).map(_ =>
      (0 until (1 + rnd.nextInt(6))).map(_ => randWord()).mkString(" "))
    val got = sparkCount(texts, merges)
    val exp = texts.map(refCount(_, ranks))
    got.zip(exp).zip(texts).foreach { case ((g, e), t) =>
      assert(g == e, s"'$t': spark $g != ref $e")
    }
  }

  test("plugs into the token-budget operators: packSequences bins by BPE " +
      "counts (same Column slot as the whitespace default)") {
    val merges = Seq("a" -> "a", "aa" -> "aa")
    val d = Seq(
      (0L, "aaaa aaaa"), // 2 BPE tokens (8 whitespace chars -> 2 words)
      (1L, "aaaa"),      // 1
      (2L, "b b b"),     // 3
      (3L, "aaaa aaaa aaaa")) // 3
      .toDF("id", "text")
    val packed = Packing.packSequences(d,
      TextAnalysis.bpeTokenCount(F.col("text"), merges), budget = 3L,
      order = Seq(F.col("id")))
      .select("id", "tokens_before", "bin").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // prefix sums over BPE counts 2,1,3,3: before = 0,2,3,6 -> bins 0,0,1,2
    assert(packed.toSeq ==
      Seq((0L, 0L, 0L), (1L, 2L, 0L), (2L, 3L, 1L), (3L, 6L, 2L)))
  }
}
