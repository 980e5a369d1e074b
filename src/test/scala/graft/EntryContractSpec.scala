package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query catalog. */
class EntryContractSpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
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
      ("EventTimeQueries", operators.EventTimeQueries.queries,
        operators.EventTimeQueries.oracle),
      ("MiscQueries", operators.MiscQueries.queries,
        operators.MiscQueries.oracle),
      ("Pq", operators.Pq.queries, operators.Pq.oracle),
      ("IvfPq", operators.IvfPq.queries, operators.IvfPq.oracle),
      ("DataQuality", operators.DataQuality.queries,
        operators.DataQuality.oracle))

  test("no query name is declared by two modules (silent map shadowing)") {
    val all = modules.flatMap { case (m, qs, _) =>
      qs.keys.map(_ -> m)
    }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query keys: ${dups.map { case (k, ms) =>
        s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", ")}")
    val allO = modules.flatMap { case (m, _, os) => os.keys.map(_ -> m) }
    val dupsO = allO.groupBy(_._1).filter(_._2.size > 1)
    assert(dupsO.isEmpty, s"duplicate oracle keys: ${dupsO.keys}")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("catalog size equals the sum of module sizes") {
    assert(SparkEntry.queries.size === modules.map(_._2.size).sum)
  }
}
