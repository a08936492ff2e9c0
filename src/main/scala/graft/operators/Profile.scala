package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-corpus profiling: the monitoring side of a vector
  * pipeline (drift detection, normalization audits, per-class
  * centroids for classification/boosting). The reference stores
  * vectors but has no analytics over them (storage.go stops at CRUD);
  * at 100 TB these are the queries a platform team actually runs
  * before/after every ingest.
  *
  * Both operators posexplode the vector column — the shuffle carries
  * n_vectors × dim scalar rows into a hash aggregate keyed by (dim)
  * or (label, dim), with map-side partial combine, so the reduce side
  * sees |dims| (resp. |labels|×|dims|) rows regardless of corpus
  * size. No per-row HOF aggregation (interpreted lambdas) anywhere on
  * the hot path.
  */
object Profile {

  /** Per-dimension distribution stats over an embedding column:
    * (dim, mean, std, lo, hi), 4-dp rounded, ordered by dim. Drift
    * monitoring compares two of these profiles; a normalization audit
    * checks mean≈0 / std≈const.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(
        round(avg(col("v").cast("double")), 4).as("mean"),
        round(stddev_pop(col("v").cast("double")), 4).as("std"),
        round(min(col("v")).cast("double"), 4).as("lo"),
        round(max(col("v")).cast("double"), 4).as("hi"))
      .orderBy(col("dim"))

  /** Per-label mean vector (class centroids), re-assembled into an
    * array ordered by dimension: (label, n_vectors, centroid). The
    * collect_list is bounded at `dim` structs per label and sorted by
    * the leading struct field, so reassembly is deterministic.
    */
  def labelCentroids(df: DataFrame, vecCol: String, labelCol: String)
      : DataFrame =
    labelDimAgg(df, vecCol, labelCol)
      .withColumnRenamed("n_vectors", "np")
      .groupBy(col(labelCol))
      .agg(max(col("np")).as("n_vectors"),
        transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("centroid"))
      .orderBy(col(labelCol))

  /** Long-form centroid rows: (label, dim, m, n_vectors), one row per
    * (label, dim). Same two-level aggregate as [[labelCentroids]]
    * minus the array re-assembly — all-scalar columns, so downstream
    * tooling (and the driver's hash compare) can sort/hash it without
    * special-casing arrays. `n_vectors` is the per-label row count
    * (identical across the label's dims).
    */
  def labelCentroidsLong(df: DataFrame, vecCol: String, labelCol: String)
      : DataFrame =
    labelDimAgg(df, vecCol, labelCol).orderBy(col(labelCol), col("dim"))

  /** Unsorted (label, dim) aggregate shared by both public forms.
    * Kept order-free so [[labelCentroids]]'s second-level aggregate
    * doesn't inherit a sort Catalyst can't eliminate (array_sort on
    * the collected structs already makes reassembly deterministic);
    * the ordering guarantee lives only in [[labelCentroidsLong]].
    */
  private def labelDimAgg(df: DataFrame, vecCol: String, labelCol: String)
      : DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(labelCol), col("dim"))
      .agg(round(avg(col("v").cast("double")), 4).as("m"),
        count(lit(1)).as("n_vectors"))
}
