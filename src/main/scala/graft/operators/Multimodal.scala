package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample pipeline stages.
  *
  * The Spark-side plumbing is real — schemas, batched `mapPartitions`
  * (the JVM analogue of `mapInPandas`: iterator-of-batches in, iterator
  * out, so decoder state amortizes across a partition), partitioning by
  * media size to balance decode skew. The codec step itself is STUBBED
  * with a deterministic fake (this container ships no image/audio libs):
  * `fakeDecode` derives pixel/sample values from xxhash of the payload, so
  * every stage downstream of decode is fully testable and reproducible.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata, the layout a
    * 100 TB multimodal lake would use (payload column stays opaque for
    * predicate pushdown on the metadata). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true)))

  /** Deterministic fake payload for tests/benchmarks: `n` pseudo-random
    * bytes derived from the id. */
  def syntheticPayload(id: Column, n: Int): Column =
    F.sha2(F.concat(id.cast(StringType), F.lit("payload")), 256)
      .cast(BinaryType)

  /** STUB decode — stands in for an image/audio codec. Deterministic:
    * "decodes" the payload into `dims` float features in [0,1) derived
    * from xxhash64(payload, i). Real plumbing, fake codec (marked). */
  def fakeDecodeFeatures(payload: Column, dims: Int): Column =
    F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), i =>
      (F.pmod(F.xxhash64(payload, i), F.lit(1000000L)).cast(DoubleType)
        / 1000000.0))

  /** Feature extraction stage: payload → fixed-width embedding. Expression
    * only — runs in whole-stage codegen, no shuffle. */
  def extractFeatures(df: DataFrame, payloadCol: String,
      dims: Int = 16): DataFrame =
    df.withColumn("features", fakeDecodeFeatures(F.col(payloadCol), dims))

  /** Resize stage (STUB codec): metadata transform is real — recompute
    * width/height, preserve aspect policy — payload transform is the
    * deterministic fake. Batched mapPartitions so a real codec would
    * amortize per-partition init (the `mapInPandas` batch shape). */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val wIdx = df.schema.fieldIndex("width")
    val hIdx = df.schema.fieldIndex("height")
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(wIdx) = targetW
        vals(hIdx) = targetH
        // STUB: a real codec would re-encode; we tag the payload
        val old = r.getAs[Array[Byte]](pIdx)
        vals(pIdx) = if (old == null) null
          else old.take(16) ++ Array[Byte](targetW.toByte, targetH.toByte)
        Row.fromSeq(vals.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: every `stride`-th frame index up to
    * `n_frames`, exploded to one row per sampled frame. Pure expressions. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx", F.explode(
      F.when(F.col("kind") === "video" && F.col("n_frames").isNotNull,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride)))
        .otherwise(F.array(F.lit(0)))))

  /** Skew-aware repartition for decode stages: large payloads dominate
    * decode time; range-partition by payload size so one executor doesn't
    * eat all the 4K videos. */
  def balanceBySize(df: DataFrame, partitions: Int): DataFrame =
    df.repartitionByRange(partitions,
      F.length(F.col("payload")).desc, F.col("media_id"))
}
