package graft

import graft.planner._
import graft.result.Formatters

/** One-off generator for the committed CSV goldens (FormatterSpec). */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val cat = SparkTestSession.catalog
    def q(sparse: Boolean) = CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Part", Some("Part"), Some("Brands"))),
        LevelDrill(LevelRef("ShipDate", Some("Month"), Some("Monthly")))),
      Seq("revenue", "cnt"),
      cuts = Seq(RangeCut(LevelRef("ShipDate", Some("Month"),
        Some("Monthly")), 1, 3)),
      nonempty = false, sparse = sparse)
    val dir = java.nio.file.Paths.get("src/test/resources/golden")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("part_month_dense.csv"),
      Formatters.csv(Formatters.tidy(cat, q(sparse = false)))
        .getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("part_month_sparse.csv"),
      Formatters.csv(Formatters.tidy(cat, q(sparse = true)))
        .getBytes("UTF-8"))
    println("goldens written")
  }
}
