package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline layer.
  *
  * Everything here is deliberately *portable*: the same arithmetic is
  * expressible in DuckDB 1.0 SQL (see SqlSnips), so every operator
  * built on these can be oracle-checked. In particular all hashing is
  * an explicit polynomial fold (never an engine-native hash whose
  * implementation differs across engines).
  *
  * Reference points: the reference engine's text pipeline
  * (/root/reference/pkg/embedding/pipeline/processor.go) normalizes
  * text and embeds it; its SQL layer has LIKE/metadata filters only.
  * The dedup/quality/language operators are the scale additions.
  */
object TextFuncs {

  val P: Long = 1000000007L

  /** Whitespace tokenization. Canonical semantics shared by ALL THREE
    * sides (this HOF spec, the native TextKernels.tokenize, and the
    * DuckDB SqlSnips.tokens): trim, split on \s+, drop empty tokens —
    * so padded/empty text yields the same token list everywhere
    * (a bare split keeps a leading "" for padded input, which would
    * silently shift n_tokens/minhash/simhash off the oracle).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Portable polynomial rolling hash over the characters of a string:
    * fold(acc*31 + ascii(c)) mod P. Identical to SqlSnips.charFold.
    */
  def charFold(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % P)

  /** Seeded minhash permutation of a precomputed base hash:
    * h_s(b) = ((2s+1)*b + 131s + 7) mod P.
    */
  def seededHash(base: Column, seed: Int): Column =
    (base * (2 * seed + 1) + (131 * seed + 7)) % P

  /** Word k-shingles as space-joined strings. Caller must guarantee
    * size(tokens) >= k (sequence(1, n) is descending for n < 1).
    */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => array_join(slice(toks, i, lit(k)), " "))

  /** MinHash signature: for each seed, min over shingle base-hashes. */
  def minhashSig(shingleBases: Column, numSeeds: Int): Column =
    transform(
      sequence(lit(0), lit(numSeeds - 1)),
      s => array_min(transform(shingleBases,
        b => (b * (s * 2 + 1) + (s * 131 + 7)) % P)))

  /** 32-bit SimHash over per-token hashes (+1/-1 vote per bit, bit set
    * if the vote sum is positive). Bit extraction uses
    * floor(h / 2^j) % 2 — exact for h < 2^31 and portable to DuckDB.
    */
  def simhash32(tokenHashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, j) => {
        val vote = aggregate(
          tokenHashes,
          lit(0L),
          (a, h) => a + when(
            floor(h / pow(lit(2.0), j.cast("double"))).cast("long") % 2 === 1, 1L)
            .otherwise(-1L))
        acc + when(vote > 0, pow(lit(2.0), j.cast("double")).cast("long")).otherwise(0L)
      })

  /** Stopword ratio over a token array. */
  def stopRatio(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stops))).cast("double") / size(toks)
}

/** DuckDB 1.0 SQL fragments mirroring TextFuncs exactly — used to
  * assemble oracle queries so the Spark and SQL sides can't drift.
  */
object SqlSnips {
  val P = "1000000007"

  /** tokens(text) — trim + split + drop empties, same as TextFuncs.tokens
    * and TextKernels.tokenize (see the tokenization note there).
    */
  def tokens(text: String): String =
    s"list_filter(regexp_split_to_array(trim($text), '\\s+'), t -> t <> '')"

  /** charFold(text) */
  def charFold(text: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % $P)"

  /** shingles(toks, k) — requires len(toks) >= k */
  def shingles(toks: String, k: Int): String =
    s"list_transform(range(1, len($toks) - ${k - 2}), " +
      s"i -> array_to_string($toks[i:i+${k - 1}], ' '))"

  /** minhashSig(bases, numSeeds) */
  def minhashSig(bases: String, numSeeds: Int): String =
    s"list_transform(range(0, $numSeeds), s -> " +
      s"list_min(list_transform($bases, b -> (b * (s * 2 + 1) + (s * 131 + 7)) % $P)))"

  /** simhash32(tokenHashes) */
  def simhash32(hashes: String): String =
    s"list_sum(list_transform(range(0, 32), j -> CASE WHEN " +
      s"list_sum(list_transform($hashes, h -> CASE WHEN " +
      s"CAST(floor(h / (2 ** j)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)) > 0 " +
      s"THEN CAST(2 ** j AS BIGINT) ELSE 0 END))"

  /** stopRatio(toks, stops) */
  def stopRatio(toks: String, stops: Seq[String]): String = {
    val set = stops.map(s => s"'$s'").mkString(", ")
    s"CAST(len(list_filter($toks, t -> t IN ($set))) AS DOUBLE) / len($toks)"
  }
}
