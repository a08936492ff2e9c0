package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TextFuncs}

/** Corpus-preparation operators for LLM training-data pipelines:
  * chunking, sequence packing, deterministic sampling and benchmark
  * decontamination. The reference has no analogue (it stops at
  * store + search); these are the steps between "deduped corpus"
  * and "training batches" at 100 TB.
  *
  * Scale shapes: chunking is map-only (explode fan-out, no shuffle);
  * packing is one window shuffle keyed by the group column;
  * sampling is a map-only filter; decontamination shuffles the
  * shingle stream (∝ corpus tokens, never doc×benchmark pairs).
  */
object Corpus {

  /** Split each document into overlapping token-window chunks:
    * chunk `i` covers tokens `[i*stride, i*stride + window)` (the
    * standard sliding-window prep for embedding / context-length
    * limits). Documents with fewer than `window` tokens yield one
    * short chunk; empty docs yield none. Map-only: the explode fans
    * each doc out to its `1 + ceil((n-window)/stride)` chunks.
    *
    * Output: (idCol, chunk_idx int, chunk string, n_tokens int).
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    // integer-exact chunk count (no fp ceil, which could disagree
    // with the oracle at exact multiples): for n > window it is
    // ((n - window + stride - 1) div stride) + 1; the greatest(1, _)
    // covers n <= window, where the div term is <= 0 in both engines
    // (trunc here, floor in DuckDB — both end below 1).
    val nc = expr(
      s"greatest(1L, ((size(_toks) - $window + ${stride - 1}) div $stride) + 1)")
    df.select(col(idCol), TextFuncs.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L), nc - 1)).as("_ci"))
      .withColumn("_chunk_toks",
        slice(col("_toks"), (col("_ci") * stride + 1).cast("int"), lit(window)))
      .select(col(idCol),
        col("_ci").cast("int").as("chunk_idx"),
        array_join(col("_chunk_toks"), " ").as("chunk"),
        size(col("_chunk_toks")).as("n_tokens"))
  }

  /** Concat-and-split sequence packing at document granularity — the
    * standard LLM pretraining prep (lay a group's documents end to
    * end in id order, cut every `budget` tokens): a document's pack
    * is `start div budget` where `start` is the running token count
    * before it within its group. One window shuffle keyed by
    * `groupCol`; at 100 TB the group column (source / shard) bounds
    * each window partition, and packs never cross groups.
    *
    * Output: one row per doc — (groupCol, idCol, n_tokens, start,
    * pack_id). Downstream aggregates by (groupCol, pack_id).
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(groupCol), col(idCol),
        size(TextFuncs.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start div $budget"))
  }

  /** Deterministic per-row hash in [0, 100): Knuth multiplicative
    * hash of the id, exact in long arithmetic in BOTH engines (the
    * id is folded mod 1000003 first so the multiply never exceeds
    * 2^63 — max 1000002 * 2654435761 ≈ 2.7e15). Sampling decisions
    * are reproducible across runs/engines, unlike rand(). */
  def hashMod100(id: Column): Column =
    pmod(pmod(pmod(id, lit(1000003L)) * lit(2654435761L),
      lit(4294967296L)), lit(100L))

  /** Stratified / weighted-mixture sampling: keep a row iff
    * hashMod100(id) < its stratum's percentage. Map-only filter;
    * rates per stratum express mixture weights (the "sample source A
    * at 37%, source B at 11%" knob of corpus mixing). */
  def sampleByRate(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.where(hashMod100(col(idCol)) < ratePct)

  /** Training docs that share at least one k-token shingle with the
    * benchmark set — the contamination check run before training.
    * Both sides explode to (shingle hash) streams and meet in an
    * equi join: shuffle ∝ token streams, never |train|×|bench|
    * pairs. Returns the distinct contaminated id column.
    */
  def contaminatedIds(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame = {
    val tSh = train.select(col(idCol),
      explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
    val bSh = bench
      .select(explode(TextExprs.shingle_hashes(col(textCol), shingleK)).as("sh"))
      .distinct()
    tSh.join(bSh, "sh").select(col(idCol)).distinct()
  }

  /** Benchmark decontamination: `train` minus contaminated docs
    * (left_anti on the contaminated id set). */
  def decontaminate(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleK: Int): DataFrame =
    train.join(contaminatedIds(train, bench, textCol, idCol, shingleK),
      Seq(idCol), "left_anti")
}
