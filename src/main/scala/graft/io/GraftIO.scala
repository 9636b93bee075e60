package graft.io

import graft.Gdf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources/sinks (reference SURVEY §2.1, `lib/explorer/data_frame.ex:607-1722`,
  * Rust impls `native/explorer/src/dataframe/io.rs`). Explorer's option names
  * are translated onto Spark's DataFrameReader/Writer options; every reader
  * is a lazy distributed scan with projection/predicate pushdown for free
  * (the reference gets this from Polars `scan_*`, `lazyframe/io.rs`).
  *
  * Explorer's `from_*`(file)/`load_*`(in-memory binary) split: `load_*` here
  * parallelizes the string/bytes through the same reader. Cloud URLs
  * (s3://, http://) ride on Hadoop FileSystem connectors, matching the
  * reference's FSS layer (`lib/explorer/fss.ex`).
  */
object GraftIO {

  /** `from_csv` (data_frame.ex:607-838; reader opts io.rs:34-51). */
  def fromCsv(spark: SparkSession, path: String,
      delimiter: String = ",", header: Boolean = true,
      skipRows: Int = 0, maxRows: Option[Int] = None,
      columns: Seq[String] = Nil, dtypes: Option[StructType] = None,
      inferSchemaLength: Option[Int] = Some(1000),
      nilValues: Seq[String] = Nil, encoding: String = "UTF-8",
      eolDelimiter: Option[String] = None,
      quoteDelimiter: String = "\"",
      parseDates: Boolean = false): Gdf = {
    var r = spark.read
      .option("sep", delimiter)
      .option("header", header)
      .option("encoding", encoding)
      .option("quote", quoteDelimiter)
    if (skipRows > 0) r = r.option("skipRows", skipRows)
    eolDelimiter.foreach(e => r = r.option("lineSep", e))
    if (nilValues.nonEmpty) r = r.option("nullValue", nilValues.head)
    dtypes match {
      case Some(s) => r = r.schema(s)
      case None =>
        r = r.option("inferSchema", inferSchemaLength.isDefined)
        if (parseDates) r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
    }
    var df = r.csv(path)
    if (columns.nonEmpty) df = df.select(columns.map(df(_)): _*)
    maxRows.foreach(n => df = df.limit(n))
    Gdf(df)
  }

  /** `load_csv` — parse an in-memory CSV string (data_frame.ex:771). */
  def loadCsv(spark: SparkSession, contents: String,
      delimiter: String = ",", header: Boolean = true): Gdf = {
    import spark.implicits._
    val ds = spark.createDataset(contents.split("\n").toSeq)
    Gdf(spark.read.option("sep", delimiter).option("header", header)
      .option("inferSchema", true).csv(ds))
  }

  /** `to_csv` (data_frame.ex:838). */
  def toCsv(df: Gdf, path: String, delimiter: String = ",",
      header: Boolean = true): Unit =
    df.sdf.write.mode("overwrite").option("sep", delimiter)
      .option("header", header).csv(path)

  /** `from_parquet` (data_frame.ex:872; lazy scan lazyframe/io.rs:11-61).
    * Column projection and `max_rows` push into the scan via Catalyst. */
  def fromParquet(spark: SparkSession, path: String,
      columns: Seq[String] = Nil, maxRows: Option[Int] = None): Gdf = {
    var df = spark.read.parquet(path)
    if (columns.nonEmpty) df = df.select(columns.map(df(_)): _*)
    maxRows.foreach(n => df = df.limit(n))
    Gdf(df)
  }

  /** `to_parquet` with Explorer's compression atoms
    * (gzip/brotli/snappy/lz4/zstd + uncompressed, data_frame.ex:1075). */
  def toParquet(df: Gdf, path: String, compression: String = "snappy",
      partitionBy: Seq[String] = Nil): Unit = {
    var w = df.sdf.write.mode("overwrite").option("compression",
      if (compression == "lz4") "lz4_raw" else compression)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.parquet(path)
  }

  /** `from_ndjson` (data_frame.ex:1572) — NDJSON is Spark json's native
    * framing. */
  def fromNdjson(spark: SparkSession, path: String,
      inferSchemaLength: Option[Int] = None): Gdf = {
    var r = spark.read
    inferSchemaLength.foreach(n => r = r.option("samplingRatio", "1.0"))
    Gdf(r.json(path))
  }

  def toNdjson(df: Gdf, path: String): Unit =
    df.sdf.write.mode("overwrite").json(path)

  /** `load_ndjson` — parse in-memory NDJSON (data_frame.ex:1648). */
  def loadNdjson(spark: SparkSession, contents: String): Gdf = {
    import spark.implicits._
    Gdf(spark.read.json(spark.createDataset(contents.split("\n").toSeq)))
  }

  /** Bucketed managed table (scale tooling, SURVEY §7: "bucketing for
    * co-located joins"): rows hash-bucketed and sorted by the join key at
    * write time, so later equi-joins/aggregations on that key read
    * pre-partitioned data and skip the shuffle entirely. The 100 TB pattern
    * for fact tables that are repeatedly joined on the same key. */
  def toBucketTable(df: Gdf, table: String, bucketBy: Seq[String],
      numBuckets: Int, sortBy: Seq[String] = Nil): Unit = {
    var w = df.sdf.write.mode("overwrite")
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    if (sortBy.nonEmpty) w = w.sortBy(sortBy.head, sortBy.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  def fromTable(spark: SparkSession, table: String): Gdf =
    Gdf(spark.table(table))

  /** `from_ipc` / `to_ipc` — Arrow IPC file format (data_frame.ex:1104);
    * `from_ipc_stream` / `to_ipc_stream` — IPC stream framing
    * (data_frame.ex:1406). See [[org.apache.spark.sql.graftbridge.ArrowIpc]]
    * for the design. */
  def fromIpc(spark: SparkSession, path: String): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.readFile(spark, path))

  def toIpc(df: Gdf, path: String): Unit =
    org.apache.spark.sql.graftbridge.ArrowIpc.writeFile(df.sdf, path)

  def fromIpcStream(spark: SparkSession, path: String): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.readStream(spark, path))

  def toIpcStream(df: Gdf, path: String): Unit =
    org.apache.spark.sql.graftbridge.ArrowIpc.writeStream(df.sdf, path)

  /** `load_ipc_stream` — parse in-memory Arrow IPC stream bytes. */
  def loadIpcStream(spark: SparkSession, bytes: Array[Byte]): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.loadStream(spark, bytes))

  /** `from_query` (ADBC in the reference, data_frame.ex:518-544) → JDBC. */
  def fromQuery(spark: SparkSession, url: String, query: String,
      properties: java.util.Properties = new java.util.Properties()): Gdf =
    Gdf(spark.read.jdbc(url, s"($query) q", properties))

  /** `new/1` — build from host-language rows (data_frame.ex:1915-2023). */
  def fromRows(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row],
      schema: StructType): Gdf =
    Gdf(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema))
}
