ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "explorerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver tail-parses the LAST stdout line as JSON. Two sbt
// defaults break that: LoggedOutput re-logs forked stdout with an
// "[info] " prefix, and the "[success] Total time" banner prints after
// the program's final line. Pass forked output through raw and drop the
// banner so graft.Bench's compact JSON line is genuinely last.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not another setting —
// exclude it from the unused-key lint
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Second JDBC engine for the from_query cross-engine spec: the DuckDB
// JDBC driver is already present in the image's pre-warmed artifact cache
// (no new dependency resolution, zero egress). Attached as a test-scope
// unmanaged jar only when found — the spec skips itself otherwise.
Test / unmanagedJars ++= {
  val cacheRoot = file(sys.env.getOrElse("COURSIER_CACHE",
    sys.props("user.home") + "/.cache/coursier"))
  (cacheRoot ** "duckdb_jdbc-*.jar").get.take(1).map(Attributed.blank(_))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // ad-hoc JVM flags for forked runs (GC logs, profilers) without
  // editing the build, e.g. SPARK_GRAFT_JVM_OPTS="-Xlog:gc:file=/tmp/gc.log"
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
