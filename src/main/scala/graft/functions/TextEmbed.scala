package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text -> vector embedder.
  *
  * Replaces the reference's MiniLM HTTP embedding service
  * (/root/reference/pkg/embedding/engine.go:65-95,
  * pkg/embedding/models/huggingface.go) with a hash-projection
  * embedding: component j is the mean over tokens of a seeded
  * projection of the token's polynomial hash into [0, 1), then the
  * vector is L2-normalized. No model weights, fully reproducible in
  * any engine — the DuckDB oracle computes the identical vector —
  * and dimension-matched to the test corpus (64, vs the reference's
  * 384 from MiniLM).
  *
  * embed(text)[j] = n_j / ||n||  where
  *   raw_j = mean_t ((charFold(t) * (j+1) + j*37) % 997) / 997.0
  */
object TextEmbed {

  val Dim = 64
  val M = 997L

  /** Raw (unnormalized) components as array<double>, from a token
    * hash array column (charFold per token).
    */
  def rawComponents(tokenHashes: Column, dim: Int = Dim): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (h * (j + 1) + j * 37) % M)
        .cast("double") / (size(tokenHashes) * M))

  /** L2-normalized embedding of a text column. */
  def embed(text: Column, dim: Int = Dim): Column = {
    val hashes = transform(TextFuncs.tokens(text), t => TextFuncs.charFold(t))
    val raw = rawComponents(hashes, dim)
    val norm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    transform(raw, x => x / norm)
  }

  /** Driver-side mirror of embed() for constant query strings (the
    * EMBEDDING('...') SQL function path, reference functions.go:46-90).
    * Must stay formula-identical to embed(); spec-tested for equality.
    */
  def embedLocal(text: String, dim: Int = Dim): Array[Double] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val hashes = toks.map(TextKernels.charFold) // codepoint fold, same as kernel
    // empty text -> zero vector, matching TextKernels.embed (without
    // this the 0/0 division yields an all-NaN vector and downstream
    // cosine comparisons go silently all-false)
    if (hashes.isEmpty) return Array.fill(dim)(0.0)
    val raw = Array.tabulate(dim) { j =>
      hashes.map(h => (h * (j + 1) + j * 37) % M).sum.toDouble / (hashes.length * M)
    }
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / norm)
  }

  /** DuckDB SQL for the raw component list given a token-hash list
    * expression (mirrors rawComponents).
    */
  def sqlRawComponents(hashes: String, dim: Int = Dim): String =
    s"list_transform(range(0, $dim), j -> " +
      s"CAST(list_sum(list_transform($hashes, h -> (h * (j + 1) + j * 37) % $M)) AS DOUBLE) " +
      s"/ (len($hashes) * $M))"

  /** DuckDB SQL for the normalized embedding given a text expression. */
  def sqlEmbed(text: String, dim: Int = Dim): String = {
    val hashes =
      s"list_transform(${SqlSnips.tokens(text)}, t -> ${SqlSnips.charFold("t")})"
    val raw = sqlRawComponents(hashes, dim)
    s"(SELECT list_transform(r, x -> x / sqrt(list_sum(list_transform(r, y -> y * y)))) " +
      s"FROM (SELECT $raw AS r) _n)"
  }
}
