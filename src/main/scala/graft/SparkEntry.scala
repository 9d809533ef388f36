package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the beyond-reference
  * dedup/similarity/text operators) is exposed as one named query over the
  * driver's parquet tables, with an equivalent DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** All registered query suites. */
  def suites: Seq[Q] =
    CoreQueries.all ++ TpchMoreQueries.all ++ CleaningQueries.all ++
      WindowQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ MiscQueries.all ++
      AnalyticsQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.sql.map(s => q.name -> s)).toMap
}
