package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Greedy k-center coreset (farthest-point traversal, the classic
  * 2-approximation): seed = lowest sample id, then `rounds` adds of
  * "the point farthest from its nearest chosen center" (ties: lowest
  * id). The deterministic diversity sampler behind coreset selection,
  * eval-set seeding and annotation batching.
  *
  * Scale shape: the sample is a caller-derived id-mod slice (keep it
  * count(*)-derived so the loop cost is flat at any SF); each round
  * is ONE broadcast of the ≤(rounds+1)-row center frame over the
  * sample plus a map-side min fold — the per-round argmax is a
  * model-sized limit(1) pick (the Bpe merge-loop precedent). Every
  * distance is computed identically in the DuckDB oracle (same L2 op
  * order), so the raw-double argmax is engine-exact.
  */
object Coreset {

  /** One greedy round's scoring frame over `sample` (id, v) against
    * `centers` (cid, cv): per sample id the min L2 to the current
    * center set, with the e4-rounded radius alongside. Exposed
    * separately so PlanGuardSpec asserts the ROUND job's physical
    * plan (broadcast centers, map-side min fold, no cartesian) — the
    * driver loop itself executes eagerly and leaves only a
    * LocalTableScan in the final query plan.
    */
  def kcenterRound(sample: DataFrame, centers: DataFrame): DataFrame =
    sample.crossJoin(broadcast(centers))
      .select(col("id"),
        VectorFunctions.vec_l2(col("v"), col("cv")).as("d"))
      .groupBy(col("id")).agg(min(col("d")).as("dm"))
      .select(col("id"),
        expr("CAST(round(dm * 10000.0) AS BIGINT)").as("r_e4"),
        col("dm"))

  /** Full traversal: (step, center_id, radius_e4) for step 0 (seed,
    * radius 0) through `rounds`. `sample` must expose (id, v) with v
    * already cast to array<double>. Already-chosen ids are excluded
    * from each round's argmax, and the traversal STOPS when the
    * sample is exhausted (m <= rounds points) — fewer rows come back
    * rather than duplicate radius-0 centers.
    */
  def kcenter(sample: DataFrame, rounds: Int): DataFrame = {
    val s = sample.sparkSession
    import s.implicits._
    var centers = sample.orderBy(col("id")).limit(1)
      .select(col("id").as("cid"), col("v").as("cv"))
      .coalesce(1).localCheckpoint(eager = false)
    val seed = centers.collect()
    require(seed.nonEmpty,
      "kcenter requires a non-empty sample: no seed point to start the " +
        "farthest-first traversal from")
    val steps = Seq.newBuilder[(Int, Long, Long)]
    steps += ((0, seed.head.getLong(0), 0L))
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      val cand = sample.join(
        centers.select(col("cid").as("id")), Seq("id"), "left_anti")
      val picked = kcenterRound(cand, centers)
        .orderBy(col("dm").desc, col("id")).limit(1).collect()
      if (picked.isEmpty) exhausted = true
      else {
        val pick = picked.head
        steps += ((step, pick.getLong(0), pick.getLong(1)))
        centers = centers.unionByName(
            sample.where(col("id") === pick.getLong(0))
              .select(col("id").as("cid"), col("v").as("cv")))
          .coalesce(1).localCheckpoint(eager = false)
        step += 1
      }
    }
    steps.result().toDF("step", "center_id", "radius_e4")
  }
}
