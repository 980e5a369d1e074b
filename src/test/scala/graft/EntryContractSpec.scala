package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query catalog.
  *
  * The module list is `SparkEntry.modules` — the SAME registry the
  * catalog itself is built from — so this spec cannot go stale when a
  * new module is added (the round-5 red gate was a hand-maintained
  * copy of the list here missing nine modules).
  */
class EntryContractSpec extends AnyFunSuite {

  private val modules = SparkEntry.modules

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
