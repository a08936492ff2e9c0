package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: the two-phase salted pattern for keys
  * whose groups are far larger than a partition (at 100 TB a handful
  * of hot keys otherwise serialize into single reducers).
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers and partially aggregate; phase 2 re-groups
  * by key alone over the tiny phase-1 output. Results are identical
  * to a direct groupBy for any algebraic aggregate (spec + oracle
  * checked); only the shuffle distribution changes. Note AQE's
  * skewedJoin handles skewed JOINS; skewed AGGREGATION still needs
  * this pattern.
  */
object Skew {

  /** sum+count per key, salted. The salt is derived from the value
    * column's hash purely to spread rows; it never affects results.
    */
  def saltedSumCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", pmod(hash(col(valueCol)), lit(saltBuckets)))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_n"))
      .groupBy(keys: _*)
      .agg(sum(col("_s")).as("total"), sum(col("_n")).as("n"))
  }
}
