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
  * media size to balance decode skew.
  *
  * IMAGE decode/resize is REAL: `javax.imageio` (in the JDK, no extra
  * deps) handles PNG/BMP/GIF/JPEG payloads — [[decodeImages]] extracts
  * true dimensions and luminance-histogram features, [[resize]] re-encodes
  * scaled PNGs. Audio/video codecs aren't in the JDK, so those payloads
  * fall back to the deterministic fake ([[fakeDecodeFeatures]], xxhash of
  * the payload) — the fallback is declared in the plan with `coalesce`, so
  * the real/fake split is visible and testable.
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

  /** Deterministic fake payload for tests/benchmarks: exactly `n`
    * pseudo-random bytes derived from the id (sha2 chain, raw digest
    * bytes — not the hex string). */
  def syntheticPayload(id: Column, n: Int): Column = {
    val chunks = (0 until math.max(1, (n + 31) / 32)).map(i =>
      F.unhex(F.sha2(F.concat(id.cast(StringType), F.lit(s"payload$i")), 256)))
    F.substring(F.concat(chunks: _*), 1, n)
  }

  /** STUB decode — stands in for an image/audio codec. Deterministic:
    * "decodes" the payload into `dims` float features in [0,1) derived
    * from xxhash64(payload, i). Real plumbing, fake codec (marked). */
  def fakeDecodeFeatures(payload: Column, dims: Int): Column =
    F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), i =>
      (F.pmod(F.xxhash64(payload, i), F.lit(1000000L)).cast(DoubleType)
        / 1000000.0))

  /** REAL image decode (javax.imageio): PNG/BMP/GIF/JPEG payloads →
    * (decoded width, decoded height, luminance histogram of `dims`
    * buckets, values in [0,1]). Undecodable payloads (audio/video/noise)
    * yield nulls. Batched mapPartitions — the reader is probed once per
    * row from a shared stream factory, decode state amortizes across the
    * partition exactly like the `mapInPandas` batch shape. */
  def decodeImages(df: DataFrame, payloadCol: String,
      dims: Int = 16): DataFrame = {
    val outSchema = df.schema
      .add("decoded_width", IntegerType)
      .add("decoded_height", IntegerType)
      .add("img_features", ArrayType(DoubleType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val decoded = decodeOne(payload, dims)
        val extra: Seq[Any] = decoded match {
          case Some((w, h, feats)) => Seq(w, h, feats)
          case None => Seq(null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** Container signature sniff: probing ImageIO readers on arbitrary bytes
    * costs ~ms per call — at millions of audio/video rows that dominates
    * the stage, so non-image payloads must short-circuit on magic bytes. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // jpeg
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Driver/executor-side single-image decode: dimensions + `dims`-bucket
    * luminance histogram (mass-normalized). None if imageio can't parse. */
  private[operators] def decodeOne(payload: Array[Byte],
      dims: Int): Option[(Int, Int, Seq[Double])] = {
    if (!looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Double](dims)
      // bulk raster path: one getRGB call per ROW into a reused buffer —
      // per-pixel getRGB re-does the color-model lookup and bounds checks
      // per call (r3 verdict: dominated d11 when decode is the bottleneck);
      // row-chunked keeps the buffer w ints regardless of image size
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000 // integer BT.601 luma
          hist(math.min(dims - 1, lum * dims / 256)) += 1.0
          x += 1
        }
        y += 1
      }
      val total = w.toDouble * h
      Some((w, h, hist.map(_ / total).toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio decode (javax.sound.sampled, in the JDK): WAV/AIFF/AU
    * payloads → (sample rate, frame count, `dims`-segment RMS envelope in
    * [0,1]). Non-audio payloads yield nulls. Same batched-mapPartitions
    * shape as [[decodeImages]]. */
  def decodeAudio(df: DataFrame, payloadCol: String,
      dims: Int = 16): DataFrame = {
    val outSchema = df.schema
      .add("decoded_rate", IntegerType)
      .add("decoded_frames", LongType)
      .add("audio_features", ArrayType(DoubleType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] =
          decodeAudioOne(r.getAs[Array[Byte]](pIdx), dims) match {
            case Some((rate, frames, feats)) => Seq(rate, frames, feats)
            case None => Seq(null, null, null)
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** RIFF/WAVE, AIFF (FORM) and AU (.snd) magic bytes. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  /** Single-payload audio decode: PCM frames → `dims` segment RMS values
    * normalized to [0,1] (full-scale sine ≈ 0.71). None if the JDK can't
    * parse the container. */
  private[operators] def decodeAudioOne(payload: Array[Byte],
      dims: Int): Option[(Int, Long, Seq[Double])] = {
    if (!looksLikeAudio(payload)) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val bytes = in.readAllBytes()
        val be = fmt.isBigEndian
        val n = bytes.length / 2
        if (n == 0) return None
        val rms = new Array[Double](dims)
        val counts = new Array[Long](dims)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (be) 1 else 0)) & 0xFF
          val hi = bytes(2 * i + (if (be) 0 else 1)).toInt
          val sample = ((hi << 8) | lo).toShort / 32768.0
          val seg = math.min(dims - 1, (i.toLong * dims / n).toInt)
          rms(seg) += sample * sample
          counts(seg) += 1
          i += 1
        }
        val feats = Array.tabulate(dims)(s =>
          if (counts(s) == 0) 0.0 else math.sqrt(rms(s) / counts(s)))
        Some((fmt.getSampleRate.toInt, in.getFrameLength, feats.toSeq))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Feature extraction stage: payload → fixed-width embedding. Real image
    * and audio features when the payload decodes (PNG/JPEG/... via imageio,
    * WAV/AIFF/AU via javax.sound), deterministic fake otherwise (video has
    * no JDK codec — declared stub) — the split is a plan-level `coalesce`. */
  def extractFeatures(df: DataFrame, payloadCol: String,
      dims: Int = 16, realDecode: Boolean = false): DataFrame =
    if (!realDecode)
      df.withColumn("features", fakeDecodeFeatures(F.col(payloadCol), dims))
    else
      decodeAudio(decodeImages(df, payloadCol, dims), payloadCol, dims)
        .withColumn("features", F.coalesce(F.col("img_features"),
          F.col("audio_features"),
          fakeDecodeFeatures(F.col(payloadCol), dims)))
        .drop("img_features", "audio_features")

  /** Resize stage: REAL for decodable images — decode, bilinear-scale to
    * (targetW, targetH) via Graphics2D, re-encode as PNG. Undecodable
    * payloads (no JDK codec: audio/video) keep the old deterministic tag
    * so the pipeline stays total. Batched mapPartitions amortizes codec
    * init per partition. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = df.schema
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val wIdx = df.schema.fieldIndex("width")
    val hIdx = df.schema.fieldIndex("height")
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(wIdx) = targetW
        vals(hIdx) = targetH
        val old = r.getAs[Array[Byte]](pIdx)
        vals(pIdx) =
          if (old == null) null
          else resizeOne(old, targetW, targetH).getOrElse(
            // non-image fallback: deterministic tag (documented stub)
            old.take(16) ++ Array[Byte](targetW.toByte, targetH.toByte))
        Row.fromSeq(vals.toSeq)
      }
    }(enc)
  }

  private[operators] def resizeOne(payload: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] = {
    if (!looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
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
