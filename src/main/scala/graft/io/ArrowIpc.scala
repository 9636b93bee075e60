package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.nio.channels.Channels

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowReader, ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.ipc.WriteChannel
import org.apache.arrow.vector.{VectorLoader, VectorUnloader}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.util.ArrowUtils

/** Arrow IPC file/stream source + sink (reference `from_ipc/to_ipc/
  * from_ipc_stream/to_ipc_stream`, data_frame.ex:1104-1541; Rust impl
  * dataframe/io.rs:353-708). OSS Spark has no first-class IPC source, so
  * this rides Spark's own internal Arrow machinery (`ArrowConverters` /
  * `ArrowUtils`, both private[sql] — hence this bridge package):
  *
  *  - read: arrow-java reader → record-batch bytes → `ArrowConverters
  *    .toDataFrame` (the exact path Spark uses for Arrow-based
  *    createDataFrame), so all Spark-supported Arrow types come for free;
  *  - write: per-partition `ArrowConverters.toBatchIterator` on executors
  *    (distributed serialization) → batches collected and framed into the
  *    IPC file/stream container on the driver.
  *
  * The driver materializes batch BYTES (columnar, compressed-width), not
  * rows; same eager posture as the reference's IPC IO, which is not a lazy
  * scan either. Parquet remains the at-scale format. */
object ArrowIpc {

  private def withReader[T](reader: ArrowReader, spark: SparkSession)(
      mk: (ArrowReader, VectorSchemaRoot) => T): T =
    try mk(reader, reader.getVectorSchemaRoot) finally reader.close()

  private def readVia(spark: SparkSession, mkReader: RootAllocator => ArrowReader): DataFrame = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = mkReader(allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = ArrowUtils.fromArrowSchema(root.getSchema)
      val batches = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (reader.loadNextBatch()) {
        val unloader = new VectorUnloader(root)
        val rb = unloader.getRecordBatch
        try {
          val bos = new ByteArrayOutputStream()
          MessageSerializer.serialize(
            new WriteChannel(Channels.newChannel(bos)), rb)
          batches += bos.toByteArray
        } finally rb.close()
      }
      ArrowConverters.toDataFrame(batches.iterator, sparkSchema.json,
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    } finally { reader.close(); allocator.close() }
  }

  // readers always get the decompressing codec factory, so lz4/zstd IPC
  // files (reference write options, dataframe/io.rs:353-708) read
  // transparently; uncompressed files are unaffected
  private def codecFactory =
    org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE

  private def codecType(compression: Option[String]) = {
    import org.apache.arrow.vector.compression.CompressionUtil.CodecType
    compression.map(_.toLowerCase) match {
      case None | Some("uncompressed") => CodecType.NO_COMPRESSION
      case Some("lz4") => CodecType.LZ4_FRAME
      case Some("zstd") => CodecType.ZSTD
      case Some(other) =>
        throw new IllegalArgumentException(s"ipc compression $other (lz4|zstd)")
    }
  }

  def readFile(spark: SparkSession, path: String): DataFrame =
    readVia(spark, alloc =>
      new ArrowFileReader(new FileInputStream(path).getChannel, alloc, codecFactory))

  def readStream(spark: SparkSession, path: String): DataFrame =
    readVia(spark, alloc =>
      new ArrowStreamReader(new FileInputStream(path), alloc, codecFactory))

  /** In-memory variant (`load_ipc`): parse IPC bytes. */
  def loadStream(spark: SparkSession, bytes: Array[Byte]): DataFrame =
    readVia(spark, alloc =>
      new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc, codecFactory))

  /** In-memory variant of `from_ipc` (`load_ipc`): parse IPC FILE bytes. */
  def loadFile(spark: SparkSession, bytes: Array[Byte]): DataFrame =
    readVia(spark, alloc =>
      new ArrowFileReader(
        new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes),
        alloc, codecFactory))

  private def writeVia(df: DataFrame, out: java.io.OutputStream,
      stream: Boolean, compression: Option[String]): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    // distributed: each partition serializes its rows to arrow batches
    val batches = df.queryExecution.toRdd.mapPartitions { iter =>
      ArrowConverters.toBatchIterator(iter, schema, 10000, tz,
        true, false, TaskContext.get())
    }.collect()

    val allocator = new RootAllocator(Long.MaxValue)
    val arrowSchema = ArrowUtils.toArrowSchema(schema, tz, true, false)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val loader = new VectorLoader(root)
    val ch = Channels.newChannel(out)
    val opt = org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT
    val ct = codecType(compression)
    val compressed =
      ct != org.apache.arrow.vector.compression.CompressionUtil.CodecType.NO_COMPRESSION
    // the commons codec factory refuses to build a NO_COMPRESSION codec, so
    // uncompressed writes take the plain constructors
    val writer =
      if (stream && compressed) new ArrowStreamWriter(root, null, ch, opt,
        codecFactory, ct)
      else if (stream) new ArrowStreamWriter(root, null, ch)
      else if (compressed) new ArrowFileWriter(root, null, ch,
        null, opt, codecFactory, ct)
      else new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      batches.foreach { b =>
        val rb = MessageSerializer.deserializeRecordBatch(
          new org.apache.arrow.vector.ipc.ReadChannel(
            Channels.newChannel(new java.io.ByteArrayInputStream(b))),
          allocator)
        try { loader.load(rb); writer.writeBatch() } finally rb.close()
      }
      writer.end()
    } finally { writer.close(); out.close(); root.close(); allocator.close() }
  }

  def writeFile(df: DataFrame, path: String,
      compression: Option[String] = None): Unit =
    writeVia(df, new FileOutputStream(path), stream = false, compression)

  def writeStream(df: DataFrame, path: String,
      compression: Option[String] = None): Unit =
    writeVia(df, new FileOutputStream(path), stream = true, compression)

  /** `dump_ipc` — the frame as Arrow IPC FILE bytes (data_frame.ex:1240). */
  def dumpFile(df: DataFrame,
      compression: Option[String] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeVia(df, bos, stream = false, compression)
    bos.toByteArray
  }

  /** `dump_ipc_stream` — the frame as IPC STREAM bytes (data_frame.ex:1494). */
  def dumpStream(df: DataFrame,
      compression: Option[String] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeVia(df, bos, stream = true, compression)
    bos.toByteArray
  }

  /** `dump_ipc_schema` (data_frame.ex:1260-1263): ONLY the encapsulated
    * Arrow schema message for this frame's schema — the header a bare
    * record-batch stream is prefixed with in wire protocols. */
  def dumpSchema(df: DataFrame): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(df.schema, tz, true, false)
    val bos = new ByteArrayOutputStream()
    MessageSerializer.serialize(
      new WriteChannel(Channels.newChannel(bos)), arrowSchema)
    bos.toByteArray
  }

  /** `dump_ipc_record_batch` (data_frame.ex:1298-1300): the frame's data as
    * a list of encapsulated Arrow record-batch messages (no schema, no file
    * container) — one binary per partition-batch, pairing with
    * [[dumpSchema]] for hand-rolled IPC framing. Batches are serialized on
    * executors ([[ArrowConverters.toBatchIterator]]); compression re-frames
    * each batch through an Arrow codec on the driver. */
  def dumpRecordBatches(df: DataFrame,
      compression: Option[String] = None): Seq[Array[Byte]] = {
    val spark = df.sparkSession
    val schema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val batches = df.queryExecution.toRdd.mapPartitions { iter =>
      ArrowConverters.toBatchIterator(iter, schema, 10000, tz,
        true, false, TaskContext.get())
    }.collect().toSeq
    val ct = codecType(compression)
    if (ct == org.apache.arrow.vector.compression.CompressionUtil.CodecType.NO_COMPRESSION) {
      // toBatchIterator already yields encapsulated record-batch messages
      batches
    } else {
      val allocator = new RootAllocator(Long.MaxValue)
      val arrowSchema = ArrowUtils.toArrowSchema(schema, tz, true, false)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val loader = new VectorLoader(root)
      val codec = codecFactory.createCodec(ct)
      try batches.map { b =>
        val rb = MessageSerializer.deserializeRecordBatch(
          new org.apache.arrow.vector.ipc.ReadChannel(
            Channels.newChannel(new java.io.ByteArrayInputStream(b))),
          allocator)
        try {
          loader.load(rb)
          val out = new VectorUnloader(root, true, codec, true).getRecordBatch
          try {
            val bos = new ByteArrayOutputStream()
            MessageSerializer.serialize(
              new WriteChannel(Channels.newChannel(bos)), out)
            bos.toByteArray
          } finally out.close()
        } finally rb.close()
      } finally { root.close(); allocator.close() }
    }
  }
}
