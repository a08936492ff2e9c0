package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the audit behind incremental ingest and
  * dataset versioning ("what changed between crawl N and crawl N+1").
  * The reference stores one mutable collection with no history; a
  * 100 TB corpus is rebuilt incrementally, and every rebuild needs
  * the added/removed/changed/unchanged breakdown before promotion.
  *
  * Scale shape: one hash-partitioned full-outer join on the id — the
  * single unavoidable shuffle, uniformly keyed. Content comparison
  * is an md5 computed map-side on BOTH scans (so the join carries a
  * 128-bit digest per side, not document bodies), and the per-source
  * status rollup that follows moves |sources|×4 rows. Nothing
  * collects; at 100 TB this is two scans + one join.
  */
object Snapshot {

  /** Row-status diff of two snapshots keyed by `idCol`, comparing
    * md5(`textCol`): (id, source, status) with status in
    * added | removed | changed | unchanged. `source` is taken from
    * whichever side has the row (new side wins for changed rows —
    * they agree by construction when sources are stable).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, srcCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"),
        col(srcCol).as(s"${side}_src"),
        md5(col(textCol)).as(s"${side}_h"))
    keyed(oldDf, "o")
      .join(keyed(newDf, "n"), col("o_id") === col("n_id"), "full_outer")
      .select(
        coalesce(col("o_id"), col("n_id")).as(idCol),
        coalesce(col("n_src"), col("o_src")).as(srcCol),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          // null-safe: md5(null) is null, so `=!=` would send a row
          // whose text is NULL on exactly one side to 'unchanged'
          .when(!(col("o_h") <=> col("n_h")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
