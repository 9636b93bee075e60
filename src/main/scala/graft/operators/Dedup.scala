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

  /** Word n-grams (shingles) of `text`, distinct, as an array column.
    * Pure higher-order functions — codegen'd, no explode. */
  def shingles(text: Column, n: Int): Column = {
    val words = F.split(F.lower(F.trim(text)), "\\s+")
    val count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    F.array_distinct(F.transform(F.sequence(F.lit(0), count - 1),
      i => F.concat_ws(" ", F.slice(words, i + 1, F.lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the shingle set. ONE `aggregate` pass with an array
    * accumulator — the shingle expression is evaluated once per row (HOFs
    * run interpreted, so k separate aggregates would re-evaluate the
    * shingling k times), and no explode/shuffle is involved. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    F.aggregate(shingleCol,
      F.array_repeat(F.lit(Long.MaxValue), numHashes),
      (acc, s) => F.zip_with(acc,
        F.sequence(F.lit(0), F.lit(numHashes - 1)),
        (m, seed) => F.least(m, F.xxhash64(seed, s))))

  /** Within-bucket ordered pairs of a sorted id array: (ids(i), ids(j)) for
    * i < j, via nested `transform` — pair generation stays inside the
    * bucket's executor, no self-join (a same-lineage self-join degenerates
    * to a nested-loop join in Spark; groupBy+expand is also one shuffle
    * cheaper). */
  private def bucketPairs(ids: Column): Column =
    F.flatten(F.transform(ids, (a, i) =>
      F.transform(F.slice(ids, i + 2, F.size(ids)),
        b => F.struct(a.as("id_a"), b.as("id_b")))))

  /** MinHash + LSH banding: rows whose signature agrees on ALL rows of any
    * band become candidates. One explode to `bands` rows per doc, one
    * groupBy per (band, bucket), pairs expanded bucket-locally. `maxBucket`
    * caps degenerate buckets (boilerplate-heavy corpora) to avoid quadratic
    * blowup — the standard guardrail at scale. */
  def minhashLshCandidates(df: DataFrame, id: Column, text: Column,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(shingles(text, shingleSize), numHashes)
    val banded = df.select(id.as("id"), sig.as("sig"))
      .select(F.col("id"), F.posexplode(
        F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
          b => F.xxhash64(F.slice(F.col("sig"), b * rowsPerBand + 1, F.lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))
    banded.groupBy("band", "bucket")
      .agg(F.sort_array(F.collect_list("id")).as("ids"))
      .filter(F.size(F.col("ids")).between(2, maxBucket))
      .select(F.explode(bucketPairs(F.col("ids"))).as("p"))
      .select("p.*").distinct()
  }

  /** Near-dedup via MinHash LSH + exact Jaccard verification: candidates
    * from [[minhashLshCandidates]], verified against true shingle-set
    * Jaccard ≥ threshold. Returns (id_a, id_b, jaccard) confirmed pairs. */
  def minhashDuplicatePairs(df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val withSh = df.select(id.as("id"), shingles(text, shingleSize).as("sh"))
    val cands = minhashLshCandidates(df, id, text, shingleSize, numHashes, bands)
    cands
      .join(withSh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(withSh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
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
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    val withSh = df.select(id.as("id"), shingles(text, shingleSize).as("sh"))
    val postings = withSh.select(F.col("id"), F.explode(F.col("sh")).as("g"))
    val rare = postings.groupBy("g")
      .agg(F.collect_list("id").as("ids"), F.count(F.lit(1)).as("df"))
      .filter(F.col("df") between (2, maxDf))
    val cands = rare
      .select(F.explode(F.transform(F.col("ids"), a =>
        F.transform(F.col("ids"), b => F.struct(a.as("id_a"), b.as("id_b")))))
        .as("ps"))
      .select(F.explode(F.col("ps")).as("p")).select("p.*")
      .filter(F.col("id_a") < F.col("id_b")).distinct()
    cands
      .join(withSh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(withSh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast(DoubleType) /
          F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word tokens: one explode + one groupBy — each bit
    * is the sign of the Σ±1 vote across token hashes. Near-dup detection
    * then compares popcount(xor) ≤ k within LSH buckets on bit-bands. */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tokens = df.select(id.as("id"),
      F.explode(F.split(F.lower(F.trim(text)), "\\s+")).as("tok"))
      .withColumn("h", F.xxhash64(F.col("tok")))
    val bitVotes = (0 until 64).map { i =>
      F.sum(F.when(F.col("h").bitwiseAND(1L << i) =!= 0, 1).otherwise(-1))
        .as(s"b$i")
    }
    val votes = tokens.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
    val sim = (0 until 64).map { i =>
      F.when(F.col(s"b$i") > 0, F.lit(1L << i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    votes.select(F.col("id"), sim.as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = F.bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxDistance`,
    * candidates bucketed by 16-bit bands (4 bands ⇒ any pair within
    * distance 3 shares at least one exact band — standard pigeonhole). */
  def simhashDuplicatePairs(df: DataFrame, id: Column, text: Column,
      maxDistance: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sh = simhash(df, id, text)
    val banded = sh.select(F.col("id"), F.col("simhash"),
      F.posexplode(F.array((0 until 4).map(b =>
        F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "bucket")))
    val pairs = banded.groupBy("band", "bucket")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("id"), F.col("simhash"))))
        .as("rows"))
      .filter(F.size(F.col("rows")).between(2, maxBucket))
      .select(F.explode(F.flatten(F.transform(F.col("rows"), (a, i) =>
        F.transform(F.slice(F.col("rows"), i + 2, F.size(F.col("rows"))), b =>
          F.struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            hamming(a.getField("simhash"), b.getField("simhash"))
              .as("distance")))))).as("p"))
      .select("p.*").distinct()
    pairs.filter(F.col("distance") <= maxDistance)
  }

  /** Embedding near-dup: cosine ≥ threshold pairs via random-hyperplane LSH
    * buckets (see [[Similarity.hyperplaneSignature]]), verified exactly. */
  def embeddingDuplicatePairs(df: DataFrame, id: Column, vec: Column,
      threshold: Double, planes: Int = 16, seed: Long = 42,
      maxBucket: Int = 1000): DataFrame = {
    val sig = Similarity.hyperplaneSignature(vec, planes, seed)
    df.select(id.as("id"), vec.as("v"), sig.as("bucket"))
      .groupBy("bucket")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("id"), F.col("v"))))
        .as("rows"))
      .filter(F.size(F.col("rows")).between(2, maxBucket))
      .select(F.explode(F.flatten(F.transform(F.col("rows"), (a, i) =>
        F.transform(F.slice(F.col("rows"), i + 2, F.size(F.col("rows"))), b =>
          F.struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            Similarity.cosine(a.getField("v"), b.getField("v"))
              .as("cosine")))))).as("p"))
      .select("p.*")
      .filter(F.col("cosine") >= threshold)
  }
}
