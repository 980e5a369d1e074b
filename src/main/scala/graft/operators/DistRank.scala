package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the scale-safe replacement for
  * `row_number()/ntile() OVER (ORDER BY ...)` with no PARTITION BY,
  * which Spark plans as a SINGLE-partition window (every row through
  * one task — the `WindowExec: No Partition Defined` warning, and a
  * serialization point at 100 TB).
  *
  * Shape: `repartitionByRange` on the order key (the same sampled
  * range shuffle Spark's own global orderBy uses, so it is
  * skew-adaptive), per-partition `row_number` via a window PARTITIONED
  * by `spark_partition_id()`, then per-partition row counts — a table
  * with exactly `numParts` rows — cumulated into starting offsets by
  * one bounded window and broadcast back. The global rank of a row is
  * its partition's offset plus its local rank; the result is invariant
  * to where the range sampler happens to place the partition
  * boundaries, because the order is total.
  *
  * The ranked input is materialized once via `.cache()` (plan-keyed):
  * the local-rank pass and the count pass must observe the SAME
  * partition assignment, and the range partitioner's boundary sample
  * must not be paid twice.
  */
object DistRank {

  /** Appends `rnCol` = exact 1-based global row number under the total
    * order `order`. `order` MUST be a total order (append a unique
    * tiebreaker column) — ties across a partition boundary would
    * otherwise make local ranks ambiguous.
    */
  def globalRowNumber(df: DataFrame, rnCol: String, numParts: Int,
      order: Column*): DataFrame = {
    val parts = df.repartitionByRange(numParts, order: _*)
      .withColumn("_drk_pid", spark_partition_id())
      .cache()
    val local = parts.withColumn("_drk_lrn",
      row_number().over(
        Window.partitionBy("_drk_pid").orderBy(order: _*)).cast("long"))
    val counts = parts.groupBy("_drk_pid")
      .agg(count(lit(1)).as("_drk_c"))
    // numParts rows — the only unpartitioned window, domain-bounded
    // by construction (32 here; a few thousand on a real cluster)
    val offs = counts.withColumn("_drk_off",
      coalesce(sum("_drk_c").over(Window.orderBy("_drk_pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_drk_pid", "_drk_off")
    local.join(broadcast(offs), "_drk_pid")
      .withColumn(rnCol, col("_drk_off") + col("_drk_lrn"))
      .drop("_drk_pid", "_drk_lrn", "_drk_off")
  }

  /** Appends, for each (valueCol -> outCol) pair, the exact INCLUSIVE
    * running sum of valueCol under the total order `order` — the
    * scale-safe replacement for `sum(v) OVER (ORDER BY ... ROWS
    * UNBOUNDED PRECEDING)` with no PARTITION BY. Same two-pass shape
    * as [[globalRowNumber]]: partition-local running sums plus
    * broadcast per-partition starting offsets.
    */
  def globalPrefixSums(df: DataFrame, sums: Seq[(String, String)],
      numParts: Int, order: Column*): DataFrame = {
    val parts = df.repartitionByRange(numParts, order: _*)
      .withColumn("_drk_pid", spark_partition_id())
      .cache()
    val wLocal = Window.partitionBy("_drk_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(parts) { case (d, (v, out)) =>
      d.withColumn(s"_drk_run_$out", sum(col(v)).over(wLocal))
    }
    val aggCols = sums.map { case (v, out) =>
      sum(col(v)).as(s"_drk_tot_$out") }
    val totals = parts.groupBy("_drk_pid")
      .agg(aggCols.head, aggCols.tail: _*)
    // numParts rows — the only unpartitioned window, bounded by the
    // partition count, never by the data
    val wPid = Window.orderBy("_drk_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sums.foldLeft(totals) { case (d, (_, out)) =>
      d.withColumn(s"_drk_off_$out",
        coalesce(sum(s"_drk_tot_$out").over(wPid), lit(0L)))
    }.select(col("_drk_pid") +:
      sums.map { case (_, out) => col(s"_drk_off_$out") }: _*)
    val joined = local.join(broadcast(offs), "_drk_pid")
    sums.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out, col(s"_drk_off_$out") + col(s"_drk_run_$out"))
        .drop(s"_drk_run_$out", s"_drk_off_$out")
    }.drop("_drk_pid")
  }

  /** SQL-standard NTILE(k) from a global row number `rn` and total
    * count `n`: the first (n mod k) buckets hold (n div k + 1) rows,
    * the rest hold (n div k) — NOT the floor((rn-1)*k/n)+1
    * approximation, which distributes the remainder across the range
    * and disagrees with NTILE whenever k does not divide n.
    */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    // Column./ is DOUBLE division in Spark — floor() brings each
    // quotient back to the exact integer lattice (all operands are
    // non-negative counts, so floor == integer division). The doubles
    // are exact up to 2^53 rows — beyond any single ntile input.
    val q = floor(n / lit(k.toLong)) // rows per small bucket
    val r = n % lit(k.toLong) // number of (q+1)-sized buckets
    val big = r * (q + lit(1L)) // rows covered by the big buckets
    when(rn <= big, floor((rn - lit(1L)) / (q + lit(1L))) + lit(1L))
      .otherwise(r + floor((rn - big - lit(1L)) / q) + lit(1L))
  }
}
