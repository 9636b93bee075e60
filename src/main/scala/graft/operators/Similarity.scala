package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`) — beyond the
  * reference's surface; first-class for training-data pipelines.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *    (it is small by construction); the corpus streams through one
  *    projection + per-query top-k — no shuffle of the corpus, scales
  *    linearly to any corpus size.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; only bucket-colliding
  *    (query, doc) pairs are scored. Same recall/latency trade-off as an
  *    IVF probe; the scale path when the query set itself is large.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions —
  * whole-stage-codegen'd, no UDF.
  */
object Similarity {

  /** Dot product of two array columns. Operands are widened to double
    * BEFORE multiplying so accumulation is bit-identical to any other
    * double-precision engine (oracle parity on float32 embeddings). */
  def dot(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      F.lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest corpus rows per query row, by cosine.
    * `queries` is broadcast; result columns: query id, corpus id, rank,
    * cosine. Ties broken by corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.crossJoin(F.broadcast(q))
      .withColumn("cosine", cosine(F.col("cv"), F.col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("corpus_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "cosine")
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * Hyperplane components are deterministic pseudo-random ±1s derived from
    * (seed, plane, dim) via xxhash64 — reproducible across executors with
    * zero driver state, which is what you want on a 1000-node run. Native
    * expression ([[graft.functions.HyperplaneSig]]): the sign matrix is
    * derived once per task and the projection is a JIT'd dot loop, not
    * planes × dims interpreted lambdas per row. */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Long): Column =
    graft.functions.VectorExprs.hyperplaneSig(vec, planes, seed)

  /** LSH-bucketed approximate top-k: hash corpus and queries with the same
    * hyperplanes, score only bucket collisions. Multi-probe via `bands`
    * sub-signatures raises recall (a pair collides if any band matches). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, planes: Int = 16, bands: Int = 4, seed: Long = 42): DataFrame = {
    val bandBits = planes / bands
    def banded(df: DataFrame, id: Column, vec: Column, idName: String) = {
      val sig = hyperplaneSignature(vec, planes, seed)
      df.select(id.as(idName), vec.as(s"__v_$idName"), sig.as("sig"))
        .select(F.col(idName), F.col(s"__v_$idName"),
          F.posexplode(F.array((0 until bands).map(b =>
            F.shiftrightunsigned(F.col("sig"), b * bandBits)
              .bitwiseAND((1L << bandBits) - 1)): _*))
          .as(Seq("band", "bucket")))
    }
    val c = banded(corpus, corpusId, corpusVec, "corpus_id")
    val q = banded(queries, queryId, queryVec, "query_id")
    val pairs = c.join(q, Seq("band", "bucket"))
      .select("corpus_id", "__v_corpus_id", "query_id", "__v_query_id")
      .distinct()
      .withColumn("cosine",
        cosine(F.col("__v_corpus_id"), F.col("__v_query_id")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("corpus_id"))
    pairs.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "cosine")
  }
}
