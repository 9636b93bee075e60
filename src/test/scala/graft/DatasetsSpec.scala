package graft

import graft.io.Datasets

/** Datasets loader (reference datasets.ex): named CSV → frame with infer,
  * cached across calls. The UCI assets aren't vendored (no egress); the
  * spec deploys a stand-in iris.csv into a redirected datasets dir, which
  * is exactly the reference's deployment contract. */
class DatasetsSpec extends SparkSpec {

  test("iris loads by name from the datasets dir and caches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_datasets")
    java.nio.file.Files.writeString(dir.resolve("iris.csv"),
      "sepal_length,sepal_width,petal_length,petal_width,species\n" +
        "5.1,3.5,1.4,0.2,Iris-setosa\n" +
        "7.0,3.2,4.7,1.4,Iris-versicolor\n" +
        "6.3,3.3,6.0,2.5,Iris-virginica\n")
    System.setProperty("graft.datasets.dir", dir.toString)
    try {
      Datasets.clearCache()
      val g = Datasets.iris(spark)
      assert(g.sdf.count() === 3)
      assert(g.sdf.columns.toSeq === Seq("sepal_length", "sepal_width",
        "petal_length", "petal_width", "species"))
      // dtype inference: measurements numeric, species string
      assert(g.sdf.schema("sepal_length").dataType.typeName === "double")
      // cached: same frame instance on the second call
      assert(Datasets.iris(spark) eq g)
    } finally {
      System.clearProperty("graft.datasets.dir")
      Datasets.clearCache()
    }
  }
}
