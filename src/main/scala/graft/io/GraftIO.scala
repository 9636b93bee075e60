package graft.io

import graft.Gdf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
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

  /** Explorer's `lz4` compression atom maps to parquet's lz4_raw codec
    * (the interoperable frame; Spark's bare "lz4" is the deprecated
    * Hadoop-framed variant). Shared by every parquet writer here and
    * [[Manifest]]. */
  private[io] def parquetCodec(compression: String): String =
    if (compression == "lz4") "lz4_raw" else compression

  /** Write DRIVER-LOCAL rows as one parquet file under `dir` (replacing
    * the directory) with zero Spark jobs — the metadata-write fast path
    * (r17 optimization, guide §5: index metas, centroid tables and
    * manifest parts are a handful of driver-resident rows; a full
    * driver-scheduled job plus the commit protocol per tiny file is the
    * per-mutation floor the streaming paths pay every trigger). Bytes go
    * through Spark's own parquet write support
    * ([[org.apache.spark.sql.graftbridge.Bridge.writeParquetDriverSide]]),
    * so readers see exactly what a `coalesce(1).write` would have
    * produced. Callers own the BOUNDED-rows contract. */
  private[graft] def writeSmallParquet(
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row], dir: String): Unit =
    org.apache.spark.sql.graftbridge.Bridge.writeParquetDriverSide(
      spark, schema, rows, dir, overwriteDir = true)

  // ======== cloud / remote URLs (reference lib/explorer/fss.ex:53-223,
  // cloud_writer.rs) ==========================================================
  // Every reader/writer accepts the reference's URL schemes:
  //  - s3://bucket/key   → rewritten to Hadoop's s3a:// connector (the
  //    connector jar ships on real clusters; configure credentials with
  //    [[configureS3]] — the FSS entries endpoint/access_key_id/
  //    secret_access_key/region map onto fs.s3a.*).
  //  - http(s)://...     → fetched once on the driver to a local temp file
  //    (exactly the reference's posture: FSS downloads single HTTP objects,
  //    they are not a distributed filesystem), then read locally.
  //  - file://, hdfs://, s3a://, and bare paths pass through to Hadoop.

  /** Map the reference's S3 `FSS.Config` fields onto Hadoop's s3a
    * connector (fss.ex:53-150: access_key_id, secret_access_key, region,
    * endpoint, token). `pathStyle` is what MinIO-style endpoints need. */
  def configureS3(spark: SparkSession, accessKeyId: String,
      secretAccessKey: String, region: Option[String] = None,
      endpoint: Option[String] = None, sessionToken: Option[String] = None,
      pathStyle: Boolean = false): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.access.key", accessKeyId)
    c.set("fs.s3a.secret.key", secretAccessKey)
    region.foreach(c.set("fs.s3a.endpoint.region", _))
    endpoint.foreach(c.set("fs.s3a.endpoint", _))
    sessionToken.foreach { t =>
      c.set("fs.s3a.session.token", t)
      c.set("fs.s3a.aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.auth.TemporaryAWSCredentialsProvider")
    }
    if (pathStyle) c.set("fs.s3a.path.style.access", "true")
  }

  /** Normalize a user-facing URL to something Hadoop can scan. Public so
    * sinks/tools outside this facade can reuse the exact same rules. */
  def resolveUrl(path: String): String =
    if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://")
    else if (path.startsWith("http://") || path.startsWith("https://"))
      fetchToLocal(path)
    else path

  /** [[resolveUrl]] for readers that open LOCAL java.io streams (Arrow IPC
    * — a single framed file, not a splittable distributed format): http(s)
    * fetches land as a filesystem path, and file:// URIs unwrap to one. */
  private def resolveLocal(path: String): String = {
    val u = resolveUrl(path)
    if (u.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(u))
      .toString
    else u
  }

  /** Sink-side URL rules: s3:// rewrites to the s3a connector; http(s) is
    * read-only (the reference's cloud_writer.rs writes S3 only, too). */
  private[io] def resolveWriteUrl(path: String): String = {
    require(!path.startsWith("http://") && !path.startsWith("https://"),
      s"cannot write to an http(s) URL: $path")
    if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://") else path
  }

  /** Driver-side single-object HTTP fetch → `file://` temp path. The
    * reference does the same for http(s) sources (fss.ex:156-223): an HTTP
    * URL names ONE object, so a distributed scan gains nothing — fetch it
    * once, then let every reader treat it as a local file. */
  private def fetchToLocal(url: String): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .GET().build()
    val tmp = java.nio.file.Files.createTempFile("graft_http",
      url.replaceAll(".*/", "_"))
    tmp.toFile.deleteOnExit()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofFile(tmp,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    require(resp.statusCode() / 100 == 2,
      s"HTTP ${resp.statusCode()} fetching $url")
    tmp.toUri.toString // file:///...
  }

  /** `from_csv` (data_frame.ex:607-838; reader opts io.rs:34-51).
    *
    * `skipRows`/`skipRowsAfterHeader` have no Spark CSV option — the file is
    * read as text lines, the lines are dropped positionally (distributed
    * zipWithIndex filter, like the reference's line-skipping in Polars'
    * reader), and the remainder is parsed with `csv(Dataset[String])`.
    * Quoted embedded newlines don't survive line-splitting, same limit as
    * the reference's skip handling. All `nilValues` are honored: the head
    * maps to Spark's nullValue, the rest are nullified post-parse on
    * string-typed columns (non-string columns already parse them to null). */
  def fromCsv(spark: SparkSession, path: String,
      delimiter: String = ",", header: Boolean = true,
      skipRows: Int = 0, skipRowsAfterHeader: Int = 0,
      maxRows: Option[Int] = None,
      columns: Seq[String] = Nil, dtypes: Option[StructType] = None,
      inferSchemaLength: Option[Int] = Some(1000),
      nilValues: Seq[String] = Nil, encoding: String = "UTF-8",
      eolDelimiter: Option[String] = None,
      quoteDelimiter: String = "\"",
      parseDates: Boolean = false): Gdf = {
    // Explorer's `:utf8_lossy` (io.rs:44): malformed UTF-8 → U+FFFD instead
    // of an error. Spark's text decode (Hadoop Text) already replaces
    // malformed sequences, so lossy IS the UTF-8 behavior here; the alias
    // keeps reference call sites working verbatim.
    val charset = encoding.toLowerCase match {
      case "utf8-lossy" | "utf8_lossy" => "UTF-8"
      case _ => encoding
    }
    import spark.implicits._
    val url = resolveUrl(path)
    def textLines(): org.apache.spark.sql.Dataset[String] = {
      var tr = spark.read.option("encoding", charset)
      eolDelimiter.foreach(e => tr = tr.option("lineSep", e))
      tr.textFile(url)
    }
    val hdr = if (header) 1 else 0
    // the text-line paths below (skip pre-pass, bounded inference sample)
    // go through Spark's TEXT source, which decodes UTF-8 ONLY — it has
    // no encoding option, so a non-UTF-8 charset would silently read
    // mojibake into the skipped/inferred lines. Refuse/degrade loudly:
    // skipping requires UTF-8; bounded inference falls back to the full
    // inference scan (the csv source itself honors `encoding`).
    val textPathSafe = Set("utf-8", "us-ascii", "ascii")
      .contains(charset.toLowerCase.replace("_", "-"))
    require(textPathSafe || (skipRows == 0 && skipRowsAfterHeader == 0),
      s"skip_rows with encoding $charset is unsupported — the positional " +
        "line pre-pass reads through Spark's UTF-8-only text source")
    // positional line-skipping pre-pass (None when nothing to skip)
    val keptLines: Option[org.apache.spark.sql.Dataset[String]] =
      if (skipRows == 0 && skipRowsAfterHeader == 0) None
      else {
        val afterHdr = skipRows + hdr
        Some(spark.createDataset(
          textLines().rdd.zipWithIndex.filter { case (_, i) =>
            i >= skipRows &&
              (skipRowsAfterHeader == 0 || i < afterHdr ||
                i >= afterHdr + skipRowsAfterHeader)
          }.map(_._1)))
      }
    def baseOpts(r0: org.apache.spark.sql.DataFrameReader) = {
      var r = r0.option("sep", delimiter)
        .option("header", header)
        .option("encoding", charset)
        .option("quote", quoteDelimiter)
      if (nilValues.nonEmpty) r = r.option("nullValue", nilValues.head)
      if (dtypes.isEmpty && parseDates)
        r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
      r
    }
    // Explorer's infer_schema_length contract (data_frame.ex:632): Some(n)
    // infers from the first n rows ONLY — a bounded sample probe, then the
    // schema is APPLIED to the full scan (at 100 TB the difference between
    // a driver-cheap probe and a second full pass, the same shape as
    // [[fromNdjson]]); None does the full-table inference scan.
    val schemaToUse: Option[StructType] = dtypes.orElse(
      if (!textPathSafe) None // degrade to the full, charset-correct scan
      else inferSchemaLength.map { n =>
        val sample = keptLines.getOrElse(textLines()).limit(n + hdr)
        baseOpts(spark.read).option("inferSchema", true).csv(sample).schema
      })
    var r = baseOpts(spark.read)
    schemaToUse match {
      case Some(s) => r = r.schema(s)
      case None => r = r.option("inferSchema", true)
    }
    var df = keptLines match {
      case None =>
        eolDelimiter.foreach(e => r = r.option("lineSep", e))
        r.csv(url)
      case Some(kept) => r.csv(kept)
    }
    if (nilValues.size > 1) {
      val extras = nilValues.tail
      df.schema.fields.foreach { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          df = df.withColumn(f.name,
            org.apache.spark.sql.functions.when(
              df(f.name).isInCollection(extras), null).otherwise(df(f.name)))
      }
    }
    // qcol: a dotted/backtick-needing column NAME must project as a
    // top-level column, not parse as struct-field access
    if (columns.nonEmpty) df = df.select(columns.map(qcol): _*)
    maxRows.foreach(n => df = df.limit(n))
    Gdf(df)
  }

  /** `load_csv` — parse an in-memory CSV string (data_frame.ex:771). */
  def loadCsv(spark: SparkSession, contents: String,
      delimiter: String = ",", header: Boolean = true): Gdf = {
    import spark.implicits._
    // \r?\n: CRLF content would otherwise leave a trailing \r on every
    // line — the last column (and on the header row, its NAME) silently
    // carries it
    val ds = spark.createDataset(contents.split("\r?\n").toSeq)
    Gdf(spark.read.option("sep", delimiter).option("header", header)
      .option("inferSchema", true).csv(ds))
  }

  /** `to_csv` (data_frame.ex:838). */
  def toCsv(df: Gdf, path: String, delimiter: String = ",",
      header: Boolean = true): Unit =
    df.sdf.write.mode("overwrite").option("sep", delimiter)
      .option("header", header).csv(resolveWriteUrl(path))

  /** `from_parquet` (data_frame.ex:872; lazy scan lazyframe/io.rs:11-61).
    * Column projection and `max_rows` push into the scan via Catalyst. */
  def fromParquet(spark: SparkSession, path: String,
      columns: Seq[String] = Nil, maxRows: Option[Int] = None): Gdf = {
    var df = spark.read.parquet(resolveUrl(path))
    // qcol: a dotted/backtick-needing column NAME must project as a
    // top-level column, not parse as struct-field access
    if (columns.nonEmpty) df = df.select(columns.map(qcol): _*)
    maxRows.foreach(n => df = df.limit(n))
    Gdf(df)
  }

  /** `to_parquet` with Explorer's compression atoms
    * (gzip/brotli/snappy/lz4/zstd + uncompressed, data_frame.ex:1075). */
  def toParquet(df: Gdf, path: String, compression: String = "snappy",
      partitionBy: Seq[String] = Nil): Unit = {
    var w = df.sdf.write.mode("overwrite").option("compression",
      parquetCodec(compression))
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.parquet(resolveWriteUrl(path))
  }

  /** Time-partitioned parquet layout — the WRITE-side half of the 100 TB
    * time-scan story (the read-side half, row-group pruning via native-
    * encoding predicates, is [[graft.TsNorm.sliceNs]]). Rows land in one
    * directory per UTC date of `tsNsCol` (epoch-ns long, the engine's
    * normalized convention), SORTED by ts within each file so parquet
    * row-group min/max stay tight for sub-day slices. The
    * `repartition(date)` shuffle is the layout-build job's one-time cost:
    * paid once, it turns every later time-sliced read into directory
    * pruning — untouched days cost zero IO, not even a footer read. At
    * real scale add a second in-day clustering column to the repartition
    * (e.g. user bucket) if single-day volume exceeds one task. */
  def writeTimePartitioned(df: DataFrame, tsNsCol: String, path: String,
      compression: String = "snappy"): Unit = {
    df.withColumn("__pdate", utcDay(tsNsCol))
      .repartition(F.col("__pdate"))
      .sortWithinPartitions(qcol(tsNsCol))
      .write.mode("overwrite")
      .option("compression",
        parquetCodec(compression))
      .partitionBy("__pdate").parquet(resolveWriteUrl(path))
  }

  /** Backtick-quoted column reference: `F.col` parses an unquoted dot as
    * struct-field access, so every entry point that receives a COLUMN
    * NAME string resolves it through this — the write and read sides of
    * a layout must agree on awkward names. */
  private[graft] def qcol(name: String): org.apache.spark.sql.Column =
    F.col("`" + name.replace("`", "``") + "`")

  /** UTC day of an epoch-ns long via exact integral arithmetic, NOT
    * `to_date(timestamp_micros)` — that pair derives the day in the
    * SESSION time zone, so a non-UTC session would write partitions the
    * UTC read bounds miss. DIV keeps the math exact where float division
    * of epoch-ns (1.7e18 > 2^53) cannot. Epoch-nonnegative ts assumed
    * (DIV truncates toward zero; pre-1970 rows would need floor-div day
    * bucketing). Shared by the batch layout writer and the streaming
    * lake sink, which is all write/read partition agreement requires.
    * Built with the Column API over a native IntegralDivide (exact SQL
    * DIV), with the name backtick-quoted — no raw-SQL interpolation, so
    * column names with spaces, dots, or reserved words resolve correctly
    * (`F.col` parses an unquoted dot as struct-field access). */
  def utcDay(tsNsCol: String): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val quoted = "`" + tsNsCol.replace("`", "``") + "`"
    F.date_from_unix_date(bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        bridge.expression(F.col(quoted)),
        bridge.expression(F.lit(86400L * 1000000000L)),
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
      .cast("int"))
  }

  /** Pruned `[loNs, hiNs)` read of a [[writeTimePartitioned]] layout: the
    * derived date bound becomes a PartitionFilter (directory pruning), the
    * ns bound a PushedFilter (row-group pruning inside the day's sorted
    * file). Both guards are spec-asserted (`numFiles` metric = days
    * touched). */
  def readTimeSlice(spark: SparkSession, path: String, loNs: Long,
      hiNs: Long, tsNsCol: String = "ts"): DataFrame = {
    require(loNs < hiNs, s"empty time slice [$loNs, $hiNs)")
    // same truncating day arithmetic as the writer (self-consistent for
    // the epoch-nonnegative ts the layout assumes)
    val dayNs = 86400L * 1000000000L
    val epoch = java.time.LocalDate.ofEpochDay(0)
    val loDate = epoch.plusDays(loNs / dayNs)
    val hiDate = epoch.plusDays((hiNs - 1) / dayNs)
    spark.read.parquet(resolveUrl(path))
      .filter(F.col("__pdate").between(
        F.lit(java.sql.Date.valueOf(loDate)),
        F.lit(java.sql.Date.valueOf(hiDate))))
      .filter(qcol(tsNsCol) >= loNs && qcol(tsNsCol) < hiNs)
      .drop("__pdate")
  }

  /** Compact day partitions of a time-partitioned layout in the
    * DAY-ALIGNED range `[loNs, hiNs)`: each touched day is rewritten
    * through the batch writer's repartition+sort shape and REPLACED via
    * dynamic partition overwrite — untouched days keep their files. The
    * streaming [[graft.streaming.Streams.lakeSink]] accretes a file per
    * (micro-batch × task × day); compacting a cold day restores one
    * sorted file with tight row groups, the same LSM posture as the
    * dedup index's segment compaction.
    *
    * A stream-written layout carries a `_spark_metadata` commit log, and
    * batch readers consult it when present — files rewritten OUTSIDE the
    * log would be invisible (and the deleted originals still listed), so
    * compaction REFUSES such a layout unless `dropCommitLog = true`,
    * which deletes the log first and converts the directory to a plain
    * partitioned table (do this on a ROTATED layout the stream no longer
    * appends to; the log's exactly-once listing has done its job once
    * the stream is done). The day's rows stage through a temp directory
    * (Spark cannot overwrite a path it is reading), which also bounds
    * the replace window to the final write. */
  def compactTimePartitions(spark: SparkSession, path: String, loNs: Long,
      hiNs: Long, tsNsCol: String = "ts",
      dropCommitLog: Boolean = false): Unit = {
    val dayNs = 86400L * 1000000000L
    require(loNs % dayNs == 0 && hiNs % dayNs == 0 && loNs < hiNs,
      s"compaction range [$loNs, $hiNs) must be day-aligned and non-empty" +
        " — a partial-day bound would silently drop the rest of the day")
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(resolveWriteUrl(path))
    val fs = root.getFileSystem(hconf)
    val log = new org.apache.hadoop.fs.Path(root, "_spark_metadata")
    if (fs.exists(log)) {
      require(dropCommitLog,
        "layout carries a streaming commit log (_spark_metadata); " +
          "rewritten partitions would be invisible to log-consulting " +
          "readers — pass dropCommitLog = true to convert a ROTATED " +
          "layout to a plain partitioned table first")
      // conversion = the log's listing becomes the DIRECTORY's listing:
      // delete every data file the log never committed (crashed-batch
      // orphans) BEFORE dropping it, or they'd become visible — and get
      // baked into the compacted day — the moment the log is gone
      val committed = spark.read.parquet(resolveUrl(path)).inputFiles
        .map(u => org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
          new org.apache.hadoop.fs.Path(u)).toString).toSet
      val it = fs.listFiles(root, true)
      val orphans = Iterator.continually(it)
        .takeWhile(_.hasNext).map(_.next().getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.toString.contains("_spark_metadata") &&
          !committed.contains(org.apache.hadoop.fs.Path
            .getPathWithoutSchemeAndAuthority(p).toString))
        .toList
      orphans.foreach(fs.delete(_, false))
      fs.delete(log, true)
    }
    val tmp = new org.apache.hadoop.fs.Path(root.getParent,
      s"__${root.getName}_compact_${loNs / dayNs}")
    try {
      readTimeSlice(spark, path, loNs, hiNs, tsNsCol)
        .write.mode("overwrite").parquet(tmp.toString)
      spark.read.parquet(tmp.toString)
        .withColumn("__pdate", utcDay(tsNsCol))
        .repartition(F.col("__pdate"))
        .sortWithinPartitions(qcol(tsNsCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__pdate").parquet(resolveWriteUrl(path))
    } finally fs.delete(tmp, true)
  }

  /** Retention/TTL for a time-partitioned layout: delete every WHOLE day
    * partition strictly before the day-aligned `beforeNs` cutoff — pure
    * directory removal, zero data reads, the cheapest operation a 100 TB
    * lake performs (one LIST + one DELETE per expired day). The cutoff
    * must be day-aligned: a mid-day cutoff would need a rewrite of the
    * boundary day, which is [[compactTimePartitions]]' job, not
    * retention's — refusing keeps "expire" unable to lose part of a day
    * silently. A commit-logged (stream-written) layout is refused for the
    * same reason as compaction: deleting files behind the log's back
    * leaves readers listing ghosts — convert via [[compactTimePartitions]]
    * `dropCommitLog = true` first (on a rotated layout). Returns the
    * number of day partitions removed. */
  def expireTimePartitions(spark: SparkSession, path: String,
      beforeNs: Long): Int = {
    val dayNs = 86400L * 1000000000L
    require(beforeNs % dayNs == 0,
      s"retention cutoff $beforeNs must be day-aligned — a mid-day " +
        "cutoff would silently drop part of the boundary day")
    val root = new org.apache.hadoop.fs.Path(resolveWriteUrl(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      "layout carries a streaming commit log (_spark_metadata); deleting " +
        "partitions behind it leaves readers listing ghost files — " +
        "convert with compactTimePartitions(dropCommitLog = true) first")
    val cutoff = java.time.LocalDate.ofEpochDay(0)
      .plusDays(beforeNs / dayNs)
    val expired = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("__pdate=") &&
          java.time.LocalDate.parse(p.getName.stripPrefix("__pdate="))
            .isBefore(cutoff)
      }
    expired.foreach(fs.delete(_, true))
    expired.size
  }

  /** `from_ndjson` (data_frame.ex:1572) — NDJSON is Spark json's native
    * framing. `inferSchemaLength = Some(n)` matches Explorer: the schema is
    * inferred from the first n rows only (sampled via a limited text read),
    * then applied to the full scan; None infers from everything. */
  def fromNdjson(spark: SparkSession, path: String,
      inferSchemaLength: Option[Int] = None): Gdf = inferSchemaLength match {
    case None => Gdf(spark.read.json(resolveUrl(path)))
    case Some(n) =>
      val url = resolveUrl(path)
      val sample = spark.read.textFile(url).limit(n)
      val schema = spark.read.json(sample).schema
      Gdf(spark.read.schema(schema).json(url))
  }

  def toNdjson(df: Gdf, path: String): Unit =
    df.sdf.write.mode("overwrite").json(resolveWriteUrl(path))

  /** `load_ndjson` — parse in-memory NDJSON (data_frame.ex:1648). */
  def loadNdjson(spark: SparkSession, contents: String): Gdf = {
    import spark.implicits._
    Gdf(spark.read.json(spark.createDataset(
      contents.split("\r?\n").toSeq)))
  }

  // ======== dump_* — frame → in-memory binary (data_frame.ex:607-1722) ======
  // The reference's dump family returns the serialized frame as a binary.
  // These are driver-sized BY DEFINITION (the result lives in one host
  // buffer), so they funnel through a single-file write of the same Spark
  // writer the to_* sink uses — identical quoting/encoding — and read the
  // bytes back. Parquet stays the at-scale format; dumps are for handoff.

  private def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dump").toFile
    try f(dir) finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  private def partFile(dir: java.io.File): java.io.File =
    dir.listFiles().filter(f => f.getName.startsWith("part-")).head

  /** `dump_csv` (data_frame.ex:860) — the frame as one CSV string. */
  def dumpCsv(df: Gdf, delimiter: String = ",", header: Boolean = true): String =
    withTempDir { dir =>
      val p = new java.io.File(dir, "csv").getPath
      df.sdf.coalesce(1).write.option("sep", delimiter)
        .option("header", header).csv(p)
      new String(java.nio.file.Files.readAllBytes(
        partFile(new java.io.File(p)).toPath),
        java.nio.charset.StandardCharsets.UTF_8)
    }

  /** `dump_ndjson` (data_frame.ex:1694) — one JSON object per line. */
  def dumpNdjson(df: Gdf): String = {
    val lines = df.sdf.toJSON.collect()
    if (lines.isEmpty) "" else lines.mkString("", "\n", "\n")
  }

  /** `dump_parquet` (data_frame.ex:1056) — the frame as parquet bytes. */
  def dumpParquet(df: Gdf, compression: String = "snappy"): Array[Byte] =
    withTempDir { dir =>
      val p = new java.io.File(dir, "pq").getPath
      df.sdf.coalesce(1).write.option("compression",
        parquetCodec(compression)).parquet(p)
      java.nio.file.Files.readAllBytes(partFile(new java.io.File(p)).toPath)
    }

  /** `load_parquet` (data_frame.ex:1022) — parse in-memory parquet bytes. */
  def loadParquet(spark: SparkSession, bytes: Array[Byte]): Gdf =
    withTempDir { dir =>
      val f = new java.io.File(dir, "load.parquet")
      java.nio.file.Files.write(f.toPath, bytes)
      // eager: materialize before the temp file is deleted
      val rows = spark.read.parquet(f.getPath)
      val collected = rows.collect().toSeq
      fromRows(spark, collected, rows.schema)
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
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.readFile(spark, resolveLocal(path)))

  def toIpc(df: Gdf, path: String, compression: Option[String] = None): Unit =
    org.apache.spark.sql.graftbridge.ArrowIpc.writeFile(df.sdf, path, compression)

  def fromIpcStream(spark: SparkSession, path: String): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.readStream(spark, resolveLocal(path)))

  def toIpcStream(df: Gdf, path: String,
      compression: Option[String] = None): Unit =
    org.apache.spark.sql.graftbridge.ArrowIpc.writeStream(df.sdf, path, compression)

  /** `load_ipc` — parse in-memory Arrow IPC FILE bytes (data_frame.ex:1200). */
  def loadIpc(spark: SparkSession, bytes: Array[Byte]): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.loadFile(spark, bytes))

  /** `dump_ipc` / `dump_ipc_stream` — frame → in-memory IPC bytes
    * (data_frame.ex:1240, 1494; driver-sized by definition, like all
    * dump-style exports). */
  def dumpIpc(df: Gdf, compression: Option[String] = None): Array[Byte] =
    org.apache.spark.sql.graftbridge.ArrowIpc.dumpFile(df.sdf, compression)

  def dumpIpcStream(df: Gdf, compression: Option[String] = None): Array[Byte] =
    org.apache.spark.sql.graftbridge.ArrowIpc.dumpStream(df.sdf, compression)

  /** `dump_ipc_schema` / `dump_ipc_record_batch` (data_frame.ex:1260,1298) —
    * raw encapsulated Arrow messages for hand-rolled wire framing: the
    * schema header, and one binary per record batch (no container). */
  def dumpIpcSchema(df: Gdf): Array[Byte] =
    org.apache.spark.sql.graftbridge.ArrowIpc.dumpSchema(df.sdf)

  def dumpIpcRecordBatches(df: Gdf,
      compression: Option[String] = None): Seq[Array[Byte]] =
    org.apache.spark.sql.graftbridge.ArrowIpc.dumpRecordBatches(df.sdf, compression)

  /** `load_ipc_stream` — parse in-memory Arrow IPC stream bytes. */
  def loadIpcStream(spark: SparkSession, bytes: Array[Byte]): Gdf =
    Gdf(org.apache.spark.sql.graftbridge.ArrowIpc.loadStream(spark, bytes))

  /** `from_query` (ADBC in the reference, data_frame.ex:518-544) → JDBC. */
  def fromQuery(spark: SparkSession, url: String, query: String,
      properties: java.util.Properties = new java.util.Properties()): Gdf = {
    // the `query` option lets Spark's per-database dialect wrap the
    // subquery correctly (Derby needs `AS alias`, most others don't)
    var r = spark.read.format("jdbc")
      .option("url", url).option("query", query)
    properties.forEach((k, v) => r = r.option(k.toString, v.toString))
    Gdf(r.load())
  }

  /** `new/1` — build from host-language rows (data_frame.ex:1915-2023). */
  def fromRows(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row],
      schema: StructType): Gdf =
    Gdf(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema))
}
