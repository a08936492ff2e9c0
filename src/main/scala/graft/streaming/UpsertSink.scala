package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed UPSERT sink for `foreachBatch` — the missing half
  * of the streaming durability story: Spark's file sink is
  * exactly-once for APPEND (metadata log, StreamRestartSpec), but
  * `foreachBatch` is AT-LEAST-ONCE — after a crash the last batch is
  * re-delivered with the SAME batchId, and a naive upsert applied
  * twice corrupts a non-idempotent store (DedupStream's scaladoc
  * documents exactly this caveat; this object closes it).
  *
  * Layout: a tiny delta-log. Each batch lands as one overwrite-mode
  * parquet directory keyed by its batchId:
  *
  *   dir/_usink_batch=<batchId>/...parquet
  *
  * Replay safety is structural, not transactional: a replay of a
  * COMPLETED batch (its _SUCCESS exists) is a commit-side NO-OP, and
  * a crashed partial write (no _SUCCESS) is invisible to [[read]]
  * until rewritten — so the store state is a pure function of the
  * delivered batch set (at-least-once delivery + idempotent commit =
  * exactly-once effect), and a replay never deletes files out from
  * under a reader that already planned its scan. No manifest or
  * lock; reader consistency comes from _SUCCESS gating: [[read]]
  * considers only batch directories whose marker exists, so a reader
  * overlapping the FIRST in-flight write of batch N sees the store
  * WITHOUT batch N rather than a half-written directory.
  *
  * Read = last-writer-wins per key: newest batchId for a key is the
  * live row (a key-partitioned window, bounded state per key).
  * Compact folds the log into a single base batch (batchId 0 under a
  * fresh dir) once the directory count hurts scan planning — on a
  * real cluster, per-key-bucketed output keeps the read's window
  * shuffle-free.
  *
  * 100 TB shape: each commit writes |batch| rows, never rewrites the
  * store; the read shuffles the log ONCE on the key (or not at all if
  * bucketed); compaction is the only full pass, and it is itself an
  * idempotent overwrite.
  */
object UpsertSink {

  /** Partition column holding the batchId. Deliberately unlikely as a
    * payload name — a payload column with the same name would collide
    * with the partition-inferred column on read, so [[commit]] rejects
    * it outright.
    */
  val BatchCol = "_usink_batch"

  /** Commit one micro-batch of keyed rows. Safe to call any number of
    * times with the same (batch, batchId): a replay of a COMPLETED
    * batch (directory already carries _SUCCESS) is a NO-OP — by the
    * delivery contract it would rewrite identical content, and
    * skipping it means a replay never deletes files out from under a
    * reader that has already planned its scan. Only a crashed
    * partial write (no _SUCCESS — invisible to [[read]]) is actually
    * rewritten.
    */
  def commit(dir: String, batch: DataFrame, batchId: Long): Unit = {
    require(!batch.columns.contains(BatchCol),
      s"payload must not contain the reserved column '$BatchCol'")
    val p = new org.apache.hadoop.fs.Path(s"$dir/$BatchCol=$batchId")
    val fs = p.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    if (!fs.exists(marker)) {
      batch.write.mode(SaveMode.Overwrite).parquet(p.toString)
      // Write the marker ourselves rather than trusting the Hadoop
      // committer's marksuccessfuljobs setting: with that config off the
      // committer skips _SUCCESS and every good batch would be invisible
      // to read()'s gate. create(overwrite=true) is a no-op byte-wise if
      // the committer already wrote it.
      fs.create(marker, true).close()
    }
  }

  /** Current store state: for every key the row from the HIGHEST
    * committed batchId (last writer wins; within one batch a key is
    * expected once — ties break to an arbitrary-but-deterministic
    * row via the ordered window). Only batch directories carrying a
    * _SUCCESS marker participate (see the reader-consistency note in
    * the object scaladoc); an empty or never-committed store is an
    * explicit error, not a parquet path-resolution crash.
    */
  def read(spark: SparkSession, dir: String, keyCol: String): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ready =
      if (fs.exists(base))
        fs.listStatus(base).toSeq
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith(s"$BatchCol="))
          .filter(s => fs.exists(
            new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
          .map(_.getPath.toString)
      else Seq.empty
    require(ready.nonEmpty,
      s"UpsertSink store at $dir has no committed batch")
    val log = spark.read.option("basePath", dir).parquet(ready: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(BatchCol).desc)
    log.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", BatchCol)
  }

  /** Fold the delta log into a single base batch under `outDir`
    * (batchId 0). Idempotent: rerunning overwrites the same output —
    * compaction deliberately bypasses commit()'s completed-batch
    * no-op (a later compaction of a GROWN log must refresh batch 0),
    * so run it as the offline maintenance pass it is, not
    * concurrently with readers of `outDir`.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
      keyCol: String): Unit = {
    val folded = read(spark, dir, keyCol)
    require(!folded.columns.contains(BatchCol),
      s"payload must not contain the reserved column '$BatchCol'")
    folded.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/$BatchCol=0")
  }

  /** Driver-gate harness: stream the documents table in `nSplits`
    * DISJOINT micro-batches (doc_id residue classes — order-
    * independent, so the gate is deterministic regardless of file
    * arrival order) through a REAL readStream + foreachBatch commit
    * into this sink, then return the store state read back via
    * [[read]]. The update-wins semantics are pinned separately and
    * deterministically by UpsertSinkSpec's explicit batchIds.
    */
  def ingestDrain(spark: SparkSession, sfDir: String,
      nSplits: Int = 3): DataFrame = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_upsert_ingest").toString
    val incoming = s"$tmp/incoming"
    val store = s"$tmp/store"
    (0 until nSplits).foreach { i =>
      docs.where(pmod(col("doc_id"), lit(nSplits.toLong)) === i)
        .coalesce(1).write.mode("append").parquet(incoming)
    }
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$incoming/*.parquet")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: DataFrame, bid: Long) =>
        commit(store, b, bid)
      }.start()
    try q.processAllAvailable() finally q.stop()
    read(spark, store, "doc_id")
  }
}
