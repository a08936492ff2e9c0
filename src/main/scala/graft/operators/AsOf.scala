package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** As-of (point-in-time) join: for each left row, the most recent
  * right row with `right.time <= left.time` on the same key — the
  * trades-vs-quotes / feature-lookup operator Spark has no native
  * form of.
  *
  * The naive formulations are a range join (Catalyst plans a
  * nested-loop O(n*m) join) or a per-left-row LIMIT 1 subquery.
  * This is the scalable union-merge form:
  *
  *   1. tag both sides and union them (schema-aligned),
  *   2. ONE sort-shuffle by (key, time, side, tie),
  *   3. carry the latest right payload forward with
  *      last(ignoreNulls) over the preceding-rows frame,
  *   4. keep the left rows.
  *
  * Cost = the sort-shuffle of both inputs — no pair blow-up, skew
  * bounded by per-key row counts (the bound any per-key window op
  * has). At 100 TB both sides shuffle once on the join key; there is
  * no candidate-pair stream to explode.
  *
  * Determinism: at equal time, right rows sort BEFORE left rows
  * (side 0 < 1) so `<=` semantics hold; equal-(key,time) right rows
  * are ordered by `tieCol` ascending, so the carried payload is the
  * one with the LARGEST tie value — the same row DuckDB's ASOF JOIN
  * picks when (key, time) is unique, and a pinned choice when it
  * is not.
  */
object AsOf {

  /** @param payload right-side column names carried to the output as
    *                `<name><suffix>` (null when no right row is at or
    *                before the left row's time)
    *
    * The payload travels as ONE struct under last(ignoreNulls):
    * per-column carries would resurrect an older row's value wherever
    * the matched row has a NULL in that column — mixing fields of two
    * different right rows. The struct is all-or-nothing, so every
    * output payload column comes from the SAME matched row, NULL
    * fields included. Right rows with a NULL time are dropped (there
    * is no "at or before" for an unknown time; ascending-null-first
    * ordering would otherwise treat them as earlier than everything).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, tieCol: String,
      payload: Seq[String], suffix: String = "_asof"): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val lStruct = StructType(left.schema.fields)
    val pStruct = StructType(payload.map(p => right.schema(p)))

    val lSel: Seq[Column] =
      Seq(col(keyCol).as("_k"), col(timeCol).cast(LongType).as("_t"),
        lit(1).as("_side"), lit(Long.MaxValue).as("_tie"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
        lit(null).cast(pStruct).as("_p"))
    val rSel: Seq[Column] =
      Seq(col(keyCol).as("_k"), col(timeCol).cast(LongType).as("_t"),
        lit(0).as("_side"), col(tieCol).cast(LongType).as("_tie"),
        lit(null).cast(lStruct).as("_lrow"),
        struct(payload.map(col): _*).as("_p"))

    val u = left.select(lSel: _*)
      .union(right.where(col(timeCol).isNotNull).select(rSel: _*))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("_last", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_lrow.*") +:
        payload.map(p => col("_last." + p).as(p + suffix)): _*)
  }

  /** Floor division as exact integer arithmetic: (c - pmod(c, w)) is
    * an exact multiple of w, so the divide is exact for any epoch
    * magnitude — never floor(double) on a raw quotient, whose rounding
    * at bucket boundaries would put a point in the wrong bucket.
    */
  private def fdiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / w).cast(LongType)

  /** Point-in-interval join: every (point, interval) pair on the same
    * key with `lo <= point < hi` — the "which events fall inside
    * which windows" operator. What Catalyst does with the naive
    * `ON key = key AND p >= lo AND p < hi` form depends on the key:
    * with a selective equi-key it plans a hash join with the range as
    * a RESIDUAL filter (fine), but candidates within a key are still
    * ALL (point, interval) pairs of that key — quadratic under hot
    * keys — and with no key at all (global windows) it degenerates to
    * a BroadcastNestedLoopJoin over the full cross product. This is
    * the bucketed form that bounds candidates by TIME LOCALITY
    * instead of key selectivity:
    *
    *   1. intervals explode to the time buckets they overlap
    *      (ceil(len/bucketWidth)+1 rows each — pick bucketWidth near
    *      the typical interval length so the fan-out is ~2),
    *   2. points map to their single containing bucket,
    *   3. ONE hash equi-join on (key, bucket) — key may be a literal
    *      constant for the keyless/global-window case,
    *   4. exact range post-filter (the bucket join is a superset).
    *
    * At 100 TB both sides shuffle once on (key, bucket) — candidate
    * pairs exist only inside a bucket, and bucket population is
    * time-local, so a year of data spreads over ~50k buckets even
    * when every row shares one key. Empty/inverted intervals
    * (`lo >= hi`) match nothing, as on the SQL side.
    *
    * Output: the matched pairs — all point columns plus the interval
    * frame's non-key columns (caller aliases any collisions first).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.where(col(loCol) < col(hiCol))
      .withColumn("_b", explode(sequence(
        fdiv(col(loCol), bucketWidth), fdiv(col(hiCol) - 1, bucketWidth))))
    val pt = points.withColumn("_b", fdiv(col(pointCol), bucketWidth))
    pt.join(iv, Seq(keyCol, "_b"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_b")
  }
}
