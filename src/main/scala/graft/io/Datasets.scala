package graft.io

import graft.Gdf
import org.apache.spark.sql.SparkSession

/** `Explorer.Datasets` (reference lib/explorer/datasets.ex:1-78): the
  * bundled example datasets — `fossil_fuels`, `wine`, `iris` — read from a
  * datasets directory by name, with a process-wide cache so repeated loads
  * (tests, notebook exploration) don't re-hit the filesystem (the
  * reference uses `:persistent_term` for the same reason).
  *
  * Like the reference (its moduledoc: datasets are not available inside
  * releases and must be deployed alongside the app), the CSV assets are a
  * packaging concern, not library code: they are read from
  * `GRAFT_DATASETS_DIR` (default `datasets/` under the working directory).
  * This environment has no network egress, so the repo does not vendor the
  * UCI files; any directory holding `{fossil_fuels,wine,iris}.csv` in the
  * reference's column layout works. */
object Datasets {

  @volatile private var cache = Map.empty[String, Gdf]

  /** Override point; re-read per call so tests/apps can redirect (system
    * property wins over the environment — env vars can't change inside a
    * running JVM). */
  def datasetsDir: String = sys.props.getOrElse("graft.datasets.dir",
    sys.env.getOrElse("GRAFT_DATASETS_DIR",
      new java.io.File("datasets").getAbsolutePath))

  /** CO2 emissions from fossil fuels since 2010, by country
    * (datasets.ex:18-27). */
  def fossilFuels(spark: SparkSession): Gdf = readDataset(spark, "fossil_fuels")

  /** Chemical analysis of wines from three cultivars (datasets.ex:29-43). */
  def wine(spark: SparkSession): Gdf = readDataset(spark, "wine")

  /** Fisher/Anderson iris measurements (datasets.ex:45-59). */
  def iris(spark: SparkSession): Gdf = readDataset(spark, "iris")

  /** Drop cached frames (e.g. after changing `GRAFT_DATASETS_DIR`). */
  def clearCache(): Unit = synchronized { cache = Map.empty }

  private def readDataset(spark: SparkSession, name: String): Gdf =
    synchronized {
      cache.getOrElse(name, {
        val g = GraftIO.fromCsv(spark,
          new java.io.File(datasetsDir, s"$name.csv").getPath)
        cache = cache.updated(name, g)
        g
      })
    }
}
