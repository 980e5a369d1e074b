package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) self-join: pairs of rows with the same key whose
  * event times lie within `windowSec` of each other.
  *
  * Naive `|a.t - b.t| <= w` is a non-equi join — Spark would plan a
  * per-key cartesian. The scale pattern: floor times into w-sized
  * buckets, emit each right row into its own AND the previous bucket
  * (explode x2), equi-join on (key, bucket), then filter the exact
  * predicate. Join fan-in is bounded by bucket occupancy, the join is
  * hash-partitioned, and AQE handles skewed buckets.
  */
object RangeJoin {

  /** @param df      input
    * @param keys    equi keys
    * @param timeCol epoch-seconds long column
    * @param idCol   unique row id (output pairs have id_a < id_b)
    * @param windowSec max |t_a - t_b|
    */
  def withinInterval(df: DataFrame, keys: Seq[String], timeCol: String,
      idCol: String, windowSec: Long): DataFrame = {
    val bucket = floor(col(timeCol) / windowSec)
    val left = df.select((keys.map(col) :+ col(idCol).as("id_a") :+
      col(timeCol).as("t_a") :+ bucket.as("__bk")): _*)
    // right rows visible from their own bucket and the next one
    val right = df.select((keys.map(col) :+ col(idCol).as("id_b") :+
        col(timeCol).as("t_b") :+
        explode(array(bucket, bucket + 1)).as("__bk")): _*)
    // match on id inequality, THEN normalize pair order: the bucket
    // adjacency scheme only guarantees each unordered pair matches in
    // at least one left/right orientation — filtering id_a < id_b
    // before normalizing would drop pairs that matched the other way
    left.join(right, keys :+ "__bk")
      .filter(col("id_a") =!= col("id_b") &&
        abs(col("t_a") - col("t_b")) <= windowSec)
      .select((keys.map(col) :+
        least(col("id_a"), col("id_b")).as("pid_a") :+
        greatest(col("id_a"), col("id_b")).as("pid_b") :+
        when(col("id_a") < col("id_b"), col("t_b") - col("t_a"))
          .otherwise(col("t_a") - col("t_b")).as("dt_sec")): _*)
      .withColumnRenamed("pid_a", "id_a")
      .withColumnRenamed("pid_b", "id_b")
      .distinct() // a pair can match in multiple orientations/buckets
  }
}
