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

  /** Single registry of every query module: (name, queries, oracles).
    * `queries`/`oracleSql` below and EntryContractSpec both derive
    * from THIS list, so a new module registered here is automatically
    * covered by the catalog-consistency tests (the r5 red gate was a
    * hand-maintained copy of this list going stale).
    */
  val modules: Seq[(String,
      Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    ("Relational", operators.Relational.queries,
      operators.Relational.oracle),
    ("CdcQueries", operators.CdcQueries.queries,
      operators.CdcQueries.oracle),
    ("ExtQueries", operators.ExtQueries.queries,
      operators.ExtQueries.oracle),
    ("Ext2Queries", operators.Ext2Queries.queries,
      operators.Ext2Queries.oracle),
    ("Ext3Queries", operators.Ext3Queries.queries,
      operators.Ext3Queries.oracle),
    ("Ext4Queries", operators.Ext4Queries.queries,
      operators.Ext4Queries.oracle),
    ("Ext5Queries", operators.Ext5Queries.queries,
      operators.Ext5Queries.oracle),
    ("Ext6Queries", operators.Ext6Queries.queries,
      operators.Ext6Queries.oracle),
    ("Ext7Queries", operators.Ext7Queries.queries,
      operators.Ext7Queries.oracle),
    ("Ext8Queries", operators.Ext8Queries.queries,
      operators.Ext8Queries.oracle),
    ("Ext9Queries", operators.Ext9Queries.queries,
      operators.Ext9Queries.oracle),
    ("Ext10Queries", operators.Ext10Queries.queries,
      operators.Ext10Queries.oracle),
    ("Ext11Queries", operators.Ext11Queries.queries,
      operators.Ext11Queries.oracle),
    ("Ext12Queries", operators.Ext12Queries.queries,
      operators.Ext12Queries.oracle),
    ("Ext13Queries", operators.Ext13Queries.queries,
      operators.Ext13Queries.oracle),
    ("Ext14Queries", operators.Ext14Queries.queries,
      operators.Ext14Queries.oracle),
    ("Ext15Queries", operators.Ext15Queries.queries,
      operators.Ext15Queries.oracle),
    ("Ext16Queries", operators.Ext16Queries.queries,
      operators.Ext16Queries.oracle),
    ("Ext17Queries", operators.Ext17Queries.queries,
      operators.Ext17Queries.oracle),
    ("Ext18Queries", operators.Ext18Queries.queries,
      operators.Ext18Queries.oracle),
    ("Ext19Queries", operators.Ext19Queries.queries,
      operators.Ext19Queries.oracle),
    ("Ext20Queries", operators.Ext20Queries.queries,
      operators.Ext20Queries.oracle),
    ("Ext21Queries", operators.Ext21Queries.queries,
      operators.Ext21Queries.oracle),
    ("Ext22Queries", operators.Ext22Queries.queries,
      operators.Ext22Queries.oracle),
    ("Ext23Queries", operators.Ext23Queries.queries,
      operators.Ext23Queries.oracle),
    ("Ext24Queries", operators.Ext24Queries.queries,
      operators.Ext24Queries.oracle),
    ("Ext25Queries", operators.Ext25Queries.queries,
      operators.Ext25Queries.oracle),
    ("Ext26Queries", operators.Ext26Queries.queries,
      operators.Ext26Queries.oracle),
    ("Ext27Queries", operators.Ext27Queries.queries,
      operators.Ext27Queries.oracle),
    ("Ext28Queries", operators.Ext28Queries.queries,
      operators.Ext28Queries.oracle),
    ("Ext29Queries", operators.Ext29Queries.queries,
      operators.Ext29Queries.oracle),
    ("Ext30Queries", operators.Ext30Queries.queries,
      operators.Ext30Queries.oracle),
    ("Ext31Queries", operators.Ext31Queries.queries,
      operators.Ext31Queries.oracle),
    ("Ext32Queries", operators.Ext32Queries.queries,
      operators.Ext32Queries.oracle),
    ("Ext33Queries", operators.Ext33Queries.queries,
      operators.Ext33Queries.oracle),
    ("Ext34Queries", operators.Ext34Queries.queries,
      operators.Ext34Queries.oracle),
    ("Ext35Queries", operators.Ext35Queries.queries,
      operators.Ext35Queries.oracle),
    ("Ext36Queries", operators.Ext36Queries.queries,
      operators.Ext36Queries.oracle),
    ("Ext37Queries", operators.Ext37Queries.queries,
      operators.Ext37Queries.oracle),
    ("Ext38Queries", operators.Ext38Queries.queries,
      operators.Ext38Queries.oracle),
    ("Ext39Queries", operators.Ext39Queries.queries,
      operators.Ext39Queries.oracle),
    ("Ext40Queries", operators.Ext40Queries.queries,
      operators.Ext40Queries.oracle),
    ("Ext41Queries", operators.Ext41Queries.queries,
      operators.Ext41Queries.oracle),
    ("Ext42Queries", operators.Ext42Queries.queries,
      operators.Ext42Queries.oracle),
    ("Ext43Queries", operators.Ext43Queries.queries,
      operators.Ext43Queries.oracle),
    ("Ext44Queries", operators.Ext44Queries.queries,
      operators.Ext44Queries.oracle),
    ("Ext45Queries", operators.Ext45Queries.queries,
      operators.Ext45Queries.oracle),
    ("Ext46Queries", operators.Ext46Queries.queries,
      operators.Ext46Queries.oracle),
    ("Ext47Queries", operators.Ext47Queries.queries,
      operators.Ext47Queries.oracle),
    ("Ext48Queries", operators.Ext48Queries.queries,
      operators.Ext48Queries.oracle),
    ("Ext49Queries", operators.Ext49Queries.queries,
      operators.Ext49Queries.oracle),
    ("Ext50Queries", operators.Ext50Queries.queries,
      operators.Ext50Queries.oracle),
    ("Ext51Queries", operators.Ext51Queries.queries,
      operators.Ext51Queries.oracle),
    ("Ext52Queries", operators.Ext52Queries.queries,
      operators.Ext52Queries.oracle),
    ("Ext53Queries", operators.Ext53Queries.queries,
      operators.Ext53Queries.oracle),
    ("Ext54Queries", operators.Ext54Queries.queries,
      operators.Ext54Queries.oracle),
    ("Ext55Queries", operators.Ext55Queries.queries,
      operators.Ext55Queries.oracle),
    ("Ext56Queries", operators.Ext56Queries.queries,
      operators.Ext56Queries.oracle),
    ("Ext57Queries", operators.Ext57Queries.queries,
      operators.Ext57Queries.oracle),
    ("Ext58Queries", operators.Ext58Queries.queries,
      operators.Ext58Queries.oracle),
    ("Ext59Queries", operators.Ext59Queries.queries,
      operators.Ext59Queries.oracle),
    ("Ext60Queries", operators.Ext60Queries.queries,
      operators.Ext60Queries.oracle),
    ("Ext61Queries", operators.Ext61Queries.queries,
      operators.Ext61Queries.oracle),
    ("Ext62Queries", operators.Ext62Queries.queries,
      operators.Ext62Queries.oracle),
    ("Ext63Queries", operators.Ext63Queries.queries,
      operators.Ext63Queries.oracle),
    ("Ext64Queries", operators.Ext64Queries.queries,
      operators.Ext64Queries.oracle),
    ("Ext65Queries", operators.Ext65Queries.queries,
      operators.Ext65Queries.oracle),
    ("EventTimeQueries", operators.EventTimeQueries.queries,
      operators.EventTimeQueries.oracle),
    ("Pq", operators.Pq.queries, operators.Pq.oracle),
    ("IvfPq", operators.IvfPq.queries, operators.IvfPq.oracle),
    ("DataQuality", operators.DataQuality.queries,
      operators.DataQuality.oracle),
    ("MiscQueries", operators.MiscQueries.queries,
      operators.MiscQueries.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._3).reduce(_ ++ _)
}
