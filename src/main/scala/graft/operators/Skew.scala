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

  /** Salted/replicated hot-key JOIN: `fact` rows get a per-row salt
    * from `spread`, the (small) `dim` side is replicated over all
    * `saltBuckets` salt values, and the equi join runs on
    * (keys..., salt) — so a hot key's fact rows land on `saltBuckets`
    * reducers instead of one. Results are IDENTICAL to
    * `fact.join(dim, keys)`: every fact row still meets its dim row
    * (in exactly one salt cell), spec- and oracle-checked.
    *
    * `spread` must vary WITHIN a key group (e.g. `hash(col("id"))` of
    * a non-key column) — a function of the join key alone would map a
    * hot key back to one salt and change nothing. Replication
    * multiplies the dim-side shuffle by `saltBuckets`; use for
    * low-cardinality/skewed keys where the dim side is small but a
    * broadcast is unwanted or the dim is mid-sized.
    *
    * When to prefer AQE: `spark.sql.adaptive.skewJoin` re-splits
    * skewed SORT-MERGE partitions at runtime from shuffle stats and
    * subsumes this pattern for plain shuffle joins; the manual salt
    * still wins when the skew is known a priori, when the join would
    * not go through a sort-merge (e.g. forced shuffle-hash), or when
    * a deterministic pre-partitioned layout is wanted at rest.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      spread: Column, saltBuckets: Int = 16): DataFrame = {
    val s = saltBuckets
    val factS = fact.withColumn("_salt", pmod(spread, lit(s)))
    val dimS = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(s - 1))))
    factS.join(dimS, keys :+ "_salt").drop("_salt")
  }

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
