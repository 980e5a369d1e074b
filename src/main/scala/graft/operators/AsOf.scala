package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and rightTime <= leftTime.
  *
  * Implementation is the scalable union + carry-forward pattern rather
  * than a per-row range probe: tag both sides, union, ONE shuffle on
  * the key, sort within partitions by (time, right-first), then a
  * running `last_value(ignore nulls)` carries the latest right payload
  * forward onto every left row. O(n log n) per key group, no range-join
  * blowup, AQE-friendly — this is the plan you want at 100 TB (a
  * broadcast range join only works when one side is small).
  */
object AsOf {

  /** @param left       probe side
    * @param right      build side (rows carried forward)
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to surface (renamed as-is)
    * @return left rows + nullable right payload columns
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payload,
      forward = false)

  /** Forward (look-ahead) as-of join: for each left row, the EARLIEST
    * right row with the same key and rightTime >= leftTime — the
    * "time to next X" shape (next purchase after a touchpoint, next
    * quote after a trade). Same union + one-shuffle carry pattern as
    * [[asofJoin]], scanned in reverse time order; identical plan cost.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payload,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      left.withColumn("__t", col(leftTime))
        .withColumn("__is_right", lit(false))
        .withColumn("__p", lit(null).cast(
          s"struct<${payload.map(p => s"$p:" +
            right.schema(p).dataType.catalogString).mkString(",")}>"))
        .select((keys.map(col) :+ col("__t") :+ col("__is_right") :+
          col("__p") :+ struct(leftCols.map(col): _*).as("__l")): _*)
      .unionByName(
        right.withColumn("__t", col(rightTime))
          .withColumn("__is_right", lit(true))
          .withColumn("__p", struct(payload.map(col): _*))
          .select((keys.map(col) :+ col("__t") :+ col("__is_right") :+
            col("__p") :+ lit(null).cast(
              s"struct<${left.schema.fields.map(f =>
                s"${f.name}:${f.dataType.catalogString}").mkString(",")}>")
            .as("__l")): _*))
    // right rows sort BEFORE left rows at equal time, in both scan
    // directions: backward asof is `rightTime <= leftTime`, forward
    // (reverse-time scan) is `rightTime >= leftTime` — equal times
    // match either way
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t"),
        col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.withColumn("__carry",
      last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(!col("__is_right"))
      .select((leftCols.map(n => col(s"__l.$n").as(n)) ++
        payload.map(p => col(s"__carry.$p").as(p))): _*)
  }

  /** Stream-static as-of enrichment: each (streaming) left row picks
    * the most recent row of a STATIC right table with the same key and
    * rightTime <= leftTime — fully STATELESS on the stream side, so
    * it runs in append mode with no watermark and no state store. The
    * static side is pre-aggregated ONCE into a per-key history array
    * sorted by time; the stream then pays one equi-join (broadcast
    * when the dimension fits) plus a pure projection:
    * `element_at(filter(hist, _.t <= leftTime), -1)` — filter
    * preserves sort order, so the last survivor IS the as-of match.
    * Per-key history length bounds the array (snapshot/compact the
    * dimension first for unbounded histories — KeyedTableSink.load is
    * exactly that snapshot).
    *
    * Tie contract: on duplicate (key, rightTime) rows the LARGEST
    * payload struct wins (sort_array orders by time, then payload) —
    * deterministic, unlike the batch formulations, where exact right
    * duplicates are engine-order ties; dedupe the dimension first if
    * the distinction matters.
    */
  def asofStreamStatic(leftStream: DataFrame, rightStatic: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = leftStream.columns.toSeq
    val hist = rightStatic
      .select((keys.map(col) :+
        struct((col(rightTime).as("__rt") +:
          payload.map(col)): _*).as("__e")): _*)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("__e"))).as("__hist"))
    leftStream.join(hist, keys, "left")
      .withColumn("__best", try_element_at(
        filter(col("__hist"), e => e.getField("__rt") <= col(leftTime)),
        lit(-1)))
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__best.$p").as(p))): _*)
  }
}
