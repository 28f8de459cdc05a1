package graft

import graft.api.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the operator registries; each carries its own
  * DuckDB oracle SQL where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Every capability the engine exposes, one GraftQuery per SURVEY §2 op. */
  def registry: Seq[GraftQuery] =
    operators.Relational.all ++
      operators.Kernels.all ++
      operators.Sources.all ++
      operators.StreamingOps.all ++
      operators.GapFill.all ++
      operators.Quality.all ++
      operators.StatOps.all ++
      operators.Forecast.all ++
      operators.TextOps.all ++
      operators.Pretrain.all ++
      operators.VectorOps.all ++
      operators.MultiModal.all ++
      sim.BusSim.all ++
      serve.QueryService.all

  private lazy val maps = GraftQuery.toMaps(registry)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 end-to-end slice: window prep -> ride generation (U1)
    * -> ridership join (J1) -> passenger fold (U2) -> demand rollup.
    */
  def entry(spark: SparkSession): DataFrame =
    sim.BusSim.endToEnd(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = maps._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = maps._2

  /** Subset of the registry timed by the Bench harness. */
  def benchQueries: Seq[GraftQuery] = registry.filter(_.bench)
}
