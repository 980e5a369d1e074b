package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A groupBy on a skewed key puts one key's entire weight on a single
  * reducer. Salting splits each key into `salts` sub-groups (random
  * spread via a hash of the full row), partially aggregates per
  * (key, salt), then combines per key — the heavy key's work is spread
  * over `salts` reducers at the cost of a second (tiny) shuffle.
  * Results are exactly the plain-groupBy results for decomposable
  * aggregates (sum/count/min/max; exact decimal sums commute, so the
  * DuckDB oracle of the UNSALTED query verifies this operator).
  */
object Salting {

  /** Salted sum/count aggregation.
    * @param aggs (outputName -> column-to-sum) pairs; decimal-cast
    *             columns recommended for exactness
    */
  def saltedSumAgg(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: Seq[(String, Column)]): DataFrame = {
    val salt = pmod(hash(col("*")), lit(salts)).as("__salt")
    val phase1 = df
      .select((keys.map(col) :+ salt) ++
        aggs.map { case (n, c) => c.as(s"__v_$n") }: _*)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        aggs.map { case (n, _) =>
          sum(col(s"__v_$n")).as(s"__s_$n") }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("n"),
        aggs.map { case (n, _) => sum(col(s"__s_$n")).as(n) }: _*)
  }
}
