package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  * Query inventory is assembled from the per-area objects so each SURVEY
  * section stays reviewable on its own.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ StreamQueries.queries ++
      ExtraQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Keys omitted here (engine-specific hashes,
    * sketches, float similarity ranks) get the driver's rows-only check
    * and are exact-oracle-tested in ScalaTest specs instead.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ PipelineQueries.oracleSql ++ StreamQueries.oracleSql ++
      ExtraQueries.oracleSql
}
