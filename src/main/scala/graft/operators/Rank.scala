package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking primitives.
  *
  * `ntile(k) OVER (ORDER BY ...)` — the direct Spark spelling — has an
  * empty window partitionSpec, so the WHOLE frame funnels through ONE
  * task: correct, but a serial chokepoint the moment the frame is
  * entity-scale (customers, users). `globalNtile` keeps the identical
  * SQL semantics (standard ntile: larger buckets first, total order
  * decided by the caller's tiebreak column) while every stage stays
  * partition-parallel:
  *
  *   1. Range-bucket boundaries from `approxQuantile` on the leading
  *      order column, collected ONCE at query construction (≤ 31
  *      doubles — bounded by PARALLELISM, not data) and embedded as
  *      LITERALS. The bucket id is then a pure function of the row's
  *      value, so every subtree of the plan agrees on it by
  *      construction. (Two rejected designs, both bitten in testing:
  *      a global single-task window is the thing being removed, and
  *      `repartitionByRange` + `spark_partition_id()` is wrong under
  *      AQE — partition ids are PHYSICAL placement, and AQE may
  *      coalesce the reused shuffle differently for the count subtree
  *      vs the rank subtree, silently shifting ids. Approximate
  *      boundaries only affect bucket BALANCE, never rank order:
  *      buckets are value ranges, and value ties stay in one bucket.)
  *   2. Per-bucket counts — ≤ numShufflePartitions rows — prefix-
  *      summed via a broadcast triangle self-join of that tiny frame
  *      (a 32×32 cross of count rows, no window), giving each bucket
  *      its global rank offset and the total n.
  *   3. `row_number` within each bucket + offset = exact global rank
  *      with no single-task stage: the rank window's partitionSpec is
  *      the bucket id, so the sort runs 32-way, not 1-way.
  *   4. ntile arithmetic from the rank, all integer: with base = n/k
  *      and rem = n%k, ranks ≤ rem*(base+1) land in the first rem
  *      (larger) buckets, the rest in base-sized buckets — the same
  *      fill rule Spark and DuckDB implement, so oracles keep using
  *      plain `ntile(k) OVER (ORDER BY ...)`.
  *
  * At 100 TB the input here is an already-aggregated per-entity frame
  * (|customers|, |users|); the boundary pass re-reads that aggregate
  * once (cache/checkpoint it upstream when chaining many axes), and
  * the one data shuffle (hash on bucket id) moves the entity frame
  * 32-way parallel — never through one task. Reference behavior
  * pinned: toy_vector_db has no windowed ranking; this backs the
  * pipeline-layer RFM/decile queries.
  */
object Rank {

  /** Exact `ntile(k) OVER (ORDER BY order*)` as a new int column
    * `out`, computed with value-bucketed distributed rank instead of a
    * global single-task window. `order` MUST be a total order (include
    * a unique tiebreak) and its leading column non-null and castable
    * to double (numeric/decimal), or ranks are nondeterministic.
    *
    * `pin = true` (default) eagerly localCheckpoints the input first:
    * the plan references `df` four times (boundary pass, two count
    * aliases, rank pass), so an unpinned expensive upstream would be
    * recomputed per reference. Pass `pin = false` when `df` is already
    * a checkpoint/cache projection (e.g. fanning one pinned frame out
    * to several tile axes).
    */
  def globalNtile(df: DataFrame, k: Int, out: String, order: Column*): DataFrame =
    globalNtile(df, k, out, pin = true, order: _*)

  def globalNtile(df0: DataFrame, k: Int, out: String, pin: Boolean,
      order: Column*): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val df = if (pin) df0.localCheckpoint(true) else df0
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val vd = order.head.cast("double")

    // boundary values, pinned as literals: ≤ parts-1 doubles to the
    // driver — bounded by parallelism, not by data. Dedup'd (heavy
    // value ties collapse adjacent quantiles) so buckets stay disjoint.
    val cuts = df.select(vd.as("__v"))
      .stat.approxQuantile("__v",
        (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .distinct.sorted
    val bucketed =
      if (cuts.isEmpty) df.withColumn("__pid", lit(0))
      else df.withColumn("__pid",
        size(filter(
          array(cuts.map(c => lit(c)): _*), c => c <= vd)))

    // ≤ `parts` rows: per-bucket counts, prefix-summed + totaled via a
    // broadcast triangle join (32×32 rows), not a window — keeps the
    // "no partition-less WindowExec" guard airtight
    val counts = bucketed.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .crossJoin(broadcast(counts.as("b")))
      .groupBy(col("a.__pid").as("__pid"))
      .agg(
        sum(when(col("b.__pid") < col("a.__pid"), col("b.__cnt"))
          .otherwise(lit(0L))).as("__off"),
        sum(col("b.__cnt")).as("__n"))

    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    bucketed
      .join(broadcast(offsets), "__pid")
      .withColumn("__rank", col("__off") + row_number().over(w))
      .withColumn(out, expr(
        s"""cast(case
           |  when __n div $k = 0 then __rank
           |  when __rank <= (__n % $k) * (__n div $k + 1)
           |    then (__rank + __n div $k) div (__n div $k + 1)
           |  else __n % $k +
           |    (__rank - (__n % $k) * (__n div $k + 1) + __n div $k - 1)
           |      div (__n div $k)
           |end as int)""".stripMargin))
      .drop("__pid", "__off", "__n", "__rank")
  }

  /** Exact running sum of `valueCol` (an exact-integer column — cents
    * / e-units, never raw doubles) in the caller's total order, plus
    * the grand total, with NO single-task stage — the same
    * value-bucket strategy as [[globalNtile]]: literal boundaries
    * from approxQuantile on the leading order column, per-bucket
    * VALUE sums prefix-summed through the broadcast triangle join,
    * and a bucket-partitioned running-sum window. Backs Pareto/ABC
    * concentration analyses where `sum(x) OVER (ORDER BY ...)` — an
    * empty-partition window — would funnel the entity frame through
    * one task. Order must be total (include a unique tiebreak);
    * leading column non-null numeric. Adds `out` (cumulative sum
    * including the current row) and `outTotal` (grand total).
    */
  def globalCumSum(df0: DataFrame, valueCol: String, out: String,
      outTotal: String, order: Column*): DataFrame = {
    val df = df0.localCheckpoint(true)
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val vd = order.head.cast("double")
    val cuts = df.select(vd.as("__v"))
      .stat.approxQuantile("__v",
        (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .distinct.sorted
    val bucketed =
      if (cuts.isEmpty) df.withColumn("__pid", lit(0))
      else df.withColumn("__pid",
        size(filter(array(cuts.map(c => lit(c)): _*), c => c <= vd)))
    val sums = bucketed.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__bsum"))
    val offsets = sums.as("a")
      .crossJoin(broadcast(sums.as("b")))
      .groupBy(col("a.__pid").as("__pid"))
      .agg(
        sum(when(col("b.__pid") < col("a.__pid"), col("b.__bsum"))
          .otherwise(lit(0L))).as("__off"),
        sum(col("b.__bsum")).as(outTotal))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + sum(col(valueCol)).over(w))
      .drop("__pid", "__off")
  }
}
