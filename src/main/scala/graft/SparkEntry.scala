package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{AnalyticsQueries, CorpusQueries, CurationQueries, ExtendedQueries, InventoryQueries, MusicOracleQueries, PipelineQueries, SurfaceQueries}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    InventoryQueries.q05ThreeWayJoin(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    InventoryQueries.all ++ PipelineQueries.all ++ MusicOracleQueries.all ++
      ExtendedQueries.all ++ CurationQueries.all ++ SurfaceQueries.all ++
      CorpusQueries.all ++ AnalyticsQueries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    InventoryQueries.oracles ++ PipelineQueries.oracles ++ MusicOracleQueries.oracles ++
      ExtendedQueries.oracles ++ CurationQueries.oracles ++ SurfaceQueries.oracles ++
      CorpusQueries.oracles ++ AnalyticsQueries.oracles
}
