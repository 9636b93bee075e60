package graft

import graft.io.GraftIO
import org.apache.spark.sql.types._

/** Cloud/remote URL handling (reference fss.ex:53-223, cloud_writer.rs):
  * every reader takes URL schemes, not just bare local paths. No S3 service
  * exists in this environment, so the s3 path is checked to the connector
  * boundary (scheme rewrite + hadoop conf), and the genuinely-remote path is
  * exercised END TO END over http:// against an in-process JDK HTTP server —
  * the same single-object-fetch semantics the reference implements. */
class CloudIOSpec extends SparkSpec {

  private def withHttpServer[T](files: Map[String, Array[Byte]])(
      f: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    files.foreach { case (name, bytes) =>
      server.createContext(s"/$name",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("from_csv reads an http:// URL end to end") {
    val csv = "a,b\n1,x\n2,y\n3,z\n".getBytes("UTF-8")
    withHttpServer(Map("data.csv" -> csv)) { base =>
      val g = GraftIO.fromCsv(spark, s"$base/data.csv")
      assert(g.sdf.count() === 3)
      assert(col1[Int](g.sdf.orderBy("a"), "a") === Seq(1, 2, 3))
    }
  }

  test("from_ndjson reads an http:// URL end to end") {
    val nd = "{\"k\":1}\n{\"k\":2}\n".getBytes("UTF-8")
    withHttpServer(Map("rows.ndjson" -> nd)) { base =>
      val g = GraftIO.fromNdjson(spark, s"$base/rows.ndjson")
      assert(col1[Long](g.sdf.orderBy("k"), "k") === Seq(1L, 2L))
    }
  }

  test("from_ipc reads an http:// URL (local-stream reader unwraps the fetch)") {
    val src = df(schema("id" -> LongType), Seq(1L), Seq(2L))
    val bytes = GraftIO.dumpIpc(Gdf(src))
    withHttpServer(Map("frame.arrow" -> bytes)) { base =>
      val g = GraftIO.fromIpc(spark, s"$base/frame.arrow")
      assert(col1[Long](g.sdf.orderBy("id"), "id") === Seq(1L, 2L))
    }
  }

  test("parquet round-trips through an explicit file:// scheme URL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cloud").toFile
    val url = s"file://${dir.getAbsolutePath}/t.parquet"
    val src = df(schema("id" -> LongType, "v" -> DoubleType),
      Seq[Any](1L, 1.5), Seq[Any](2L, 2.5))
    GraftIO.toParquet(Gdf(src), url)
    val back = GraftIO.fromParquet(spark, url)
    assert(col1[Double](back.sdf.orderBy("id"), "v") === Seq(1.5, 2.5))
  }

  test("s3:// rewrites to the s3a connector scheme") {
    assert(GraftIO.resolveUrl("s3://bucket/key/part.parquet") ===
      "s3a://bucket/key/part.parquet")
    assert(GraftIO.resolveUrl("/local/path.parquet") === "/local/path.parquet")
    assert(GraftIO.resolveUrl("hdfs://nn/keep.parquet") === "hdfs://nn/keep.parquet")
  }

  test("configureS3 lands the FSS config fields on fs.s3a.*") {
    GraftIO.configureS3(spark, "AKID", "SECRET", region = Some("us-east-1"),
      endpoint = Some("http://127.0.0.1:9000"), pathStyle = true)
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.access.key") === "AKID")
    assert(c.get("fs.s3a.secret.key") === "SECRET")
    assert(c.get("fs.s3a.endpoint.region") === "us-east-1")
    assert(c.get("fs.s3a.endpoint") === "http://127.0.0.1:9000")
    assert(c.get("fs.s3a.path.style.access") === "true")
  }

  test("writers refuse http(s) targets") {
    val src = Gdf(df(schema("id" -> LongType), Seq(1L)))
    intercept[IllegalArgumentException] {
      GraftIO.toCsv(src, "http://127.0.0.1:1/out.csv")
    }
  }
}
