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

  /** Per-label embedding outliers: each vector's L2 distance to its
    * label's centroid, top `k` per label — the mislabeled/corrupt-
    * vector sweep run before training on a labeled embedding corpus.
    * The centroid is the 4-dp ROUNDED per-dim mean
    * ([[labelCentroids]]): the rounding is the determinism anchor
    * that lets an independent engine re-derive the identical
    * reference point before measuring distances. Scale shape: the
    * centroid table is |labels| rows (broadcast back onto the
    * corpus), the distance is the codegen'd
    * [[graft.functions.VectorFunctions]] kernel (map-only), and the
    * per-label top-k is one window pass partitioned by label.
    */
  def labelOutliers(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 3): DataFrame = {
    val cents = labelCentroids(df, vecCol, labelCol)
      .select(col(labelCol), col("centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labelCol).orderBy(col("dist").desc, col(idCol))
    df.join(broadcast(cents), Seq(labelCol))
      .withColumn("dist", round(
        graft.functions.VectorFunctions.vec_l2(col(vecCol), col("centroid")), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(labelCol), col(idCol), col("dist"))
      .orderBy(col(labelCol), col("dist").desc, col(idCol))
  }

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

  /** Column-level data-quality profile — the deequ/TFDV-style audit a
    * training pipeline runs on every new corpus drop: per column, row
    * count, null count, EXACT distinct count, lexicographic min/max
    * of the string form. One explode to (column, value) long form +
    * ONE hash aggregate (count-distinct expands to the standard
    * two-phase partial plan), so the pass over the table is single
    * and map-side-combined — never a scan per column. Min/max compare
    * the STRING form (uniform output schema; both engines order
    * varchar lexicographically, so '10' < '9' — a profile convention,
    * documented, not a bug).
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .orderBy(col("col_name"))

  /** Constraint validation over the documents table (deequ-style
    * checks): one row per check with its violation count, zero =
    * healthy. Two scans, each the minimal shape for its checks: the
    * row-local predicates fold map-side into a single global
    * aggregate (one row crosses the wire per partition); key
    * uniqueness is the one check that genuinely needs a shuffle, and
    * it shuffles the id-keyed partial counts only.
    */
  def dataChecks(df: DataFrame): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val rowChecks = df.agg(
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("doc_id_null"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("text_empty"),
      sum(when(col("lang").isNull || !col("lang").isin(langs: _*), 1L)
        .otherwise(0L)).as("lang_unknown"),
      sum(when(col("n_chars") < 0, 1L).otherwise(0L)).as("n_chars_negative"),
      sum(when(col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L)).as("n_chars_mismatch"))
    val dup = df.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L))
        .as("doc_id_dup_rows"))
    rowChecks.crossJoin(dup) // both single-row
      .selectExpr("""stack(6,
        'doc_id_dup_rows', doc_id_dup_rows,
        'doc_id_null', doc_id_null,
        'lang_unknown', lang_unknown,
        'n_chars_mismatch', n_chars_mismatch,
        'n_chars_negative', n_chars_negative,
        'text_empty', text_empty) AS (check_name, n_violations)""")
      .orderBy(col("check_name"))
  }

  /** Referential-integrity audit between the documents table and its
    * embedding table — the check every retrieval deployment runs
    * before it trusts a joined serving path. One row per check:
    * row counts on each side, docs with NO embedding row (training
    * coverage gap), embedding rows with NO document (orphans that a
    * delete pass missed), and embedding rows whose dimension differs
    * from the table's dominant dim (a partial re-embed left behind).
    *
    * Scale shape: the two anti-join checks shuffle only the two ID
    * projections (long columns, not payloads); the dominant dim is a
    * |distinct dims|-sized aggregate (tiny) broadcast back over a
    * map-side size() comparison. All five numbers union into one
    * frame via single-row crossJoins, same as [[dataChecks]].
    */
  def integrityAudit(docs: DataFrame, embeds: DataFrame,
      docIdCol: String, vecIdCol: String, vecCol: String): DataFrame = {
    val dIds = docs.select(col(docIdCol).as("_id"))
    val eIds = embeds.select(col(vecIdCol).as("_id"))
    val nDocs = dIds.agg(count(lit(1)).as("docs_total"))
    val nEmb = eIds.agg(count(lit(1)).as("embeds_total"))
    val noEmb = dIds.join(eIds, Seq("_id"), "left_anti")
      .agg(count(lit(1)).as("docs_without_embedding"))
    val orphan = eIds.join(dIds, Seq("_id"), "left_anti")
      .agg(count(lit(1)).as("embeddings_without_doc"))
    // dominant dim = the most frequent size(vec) (ties: smaller dim)
    val topDim = embeds.groupBy(size(col(vecCol)).as("_d"))
      .agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_d")).limit(1)
      .select(col("_d"))
    val badDim = embeds.crossJoin(broadcast(topDim))
      .agg(sum(when(size(col(vecCol)) =!= col("_d"), 1L).otherwise(0L))
        .as("dim_mismatch"))
    nDocs.crossJoin(nEmb).crossJoin(noEmb).crossJoin(orphan)
      .crossJoin(badDim) // all single-row
      .selectExpr("""stack(5,
        'dim_mismatch', dim_mismatch,
        'docs_total', docs_total,
        'docs_without_embedding', docs_without_embedding,
        'embeddings_without_doc', embeddings_without_doc,
        'embeds_total', embeds_total) AS (check_name, n)""")
      .orderBy(col("check_name"))
  }
}
