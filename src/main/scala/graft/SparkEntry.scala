package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * named query (Spark-first DataFrame plan) with, where SQL-expressible,
  * a DuckDB oracle statement producing the identical result (same column
  * names, same total order, decimal-exact arithmetic).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.CdcQueries.queries ++
      operators.ExtQueries.queries ++
      operators.Ext2Queries.queries ++
      operators.Ext3Queries.queries ++
      operators.Ext4Queries.queries ++
      operators.Ext5Queries.queries ++
      operators.Ext6Queries.queries ++
      operators.Ext7Queries.queries ++
      operators.Ext8Queries.queries ++
      operators.Ext9Queries.queries ++
      operators.Ext10Queries.queries ++
      operators.Ext11Queries.queries ++
      operators.Ext12Queries.queries ++
      operators.Ext13Queries.queries ++
      operators.Ext14Queries.queries ++
      operators.Ext15Queries.queries ++
      operators.Ext16Queries.queries ++
      operators.Ext17Queries.queries ++
      operators.Ext18Queries.queries ++
      operators.Ext19Queries.queries ++
      operators.Ext20Queries.queries ++
      operators.Ext21Queries.queries ++
      operators.Ext22Queries.queries ++
      operators.Ext23Queries.queries ++
      operators.Ext24Queries.queries ++
      operators.Ext25Queries.queries ++
      operators.Ext26Queries.queries ++
      operators.Ext27Queries.queries ++
      operators.Ext28Queries.queries ++
      operators.Ext29Queries.queries ++
      operators.Ext30Queries.queries ++
      operators.Ext31Queries.queries ++
      operators.Ext32Queries.queries ++
      operators.Ext33Queries.queries ++
      operators.Ext34Queries.queries ++
      operators.Ext35Queries.queries ++
      operators.Ext36Queries.queries ++
      operators.Ext37Queries.queries ++
      operators.EventTimeQueries.queries ++
      operators.Pq.queries ++
      operators.IvfPq.queries ++
      operators.DataQuality.queries ++
      operators.MiscQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.CdcQueries.oracle ++
      operators.ExtQueries.oracle ++
      operators.Ext2Queries.oracle ++
      operators.Ext3Queries.oracle ++
      operators.Ext4Queries.oracle ++
      operators.Ext5Queries.oracle ++
      operators.Ext6Queries.oracle ++
      operators.Ext7Queries.oracle ++
      operators.Ext8Queries.oracle ++
      operators.Ext9Queries.oracle ++
      operators.Ext10Queries.oracle ++
      operators.Ext11Queries.oracle ++
      operators.Ext12Queries.oracle ++
      operators.Ext13Queries.oracle ++
      operators.Ext14Queries.oracle ++
      operators.Ext15Queries.oracle ++
      operators.Ext16Queries.oracle ++
      operators.Ext17Queries.oracle ++
      operators.Ext18Queries.oracle ++
      operators.Ext19Queries.oracle ++
      operators.Ext20Queries.oracle ++
      operators.Ext21Queries.oracle ++
      operators.Ext22Queries.oracle ++
      operators.Ext23Queries.oracle ++
      operators.Ext24Queries.oracle ++
      operators.Ext25Queries.oracle ++
      operators.Ext26Queries.oracle ++
      operators.Ext27Queries.oracle ++
      operators.Ext28Queries.oracle ++
      operators.Ext29Queries.oracle ++
      operators.Ext30Queries.oracle ++
      operators.Ext31Queries.oracle ++
      operators.Ext32Queries.oracle ++
      operators.Ext33Queries.oracle ++
      operators.Ext34Queries.oracle ++
      operators.Ext35Queries.oracle ++
      operators.Ext36Queries.oracle ++
      operators.Ext37Queries.oracle ++
      operators.EventTimeQueries.oracle ++
      operators.Pq.oracle ++
      operators.IvfPq.oracle ++
      operators.DataQuality.oracle ++
      operators.MiscQueries.oracle
}
