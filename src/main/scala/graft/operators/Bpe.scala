package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SqlSnips, TextFuncs}

/** Byte-pair-encoding merge learning — the tokenizer-training step of
  * a pretraining data pipeline (the reference ships a fixed MiniLM
  * tokenizer, models/huggingface.go; training one is the scale task
  * its pipeline runs upstream).
  *
  * Architecture (the standard industrial BPE shape, e.g. the
  * SentencePiece/HF trainers): the corpus is scanned ONCE into a
  * word-frequency table (map-side-combined hash agg — the only
  * n-scaling stage), then every merge iteration runs on the |vocab|
  * frame: explode adjacent symbol pairs weighted by word count, pick
  * the global argmax pair, apply the merge. At 100 TB the vocab table
  * is millions of rows, not the corpus — iteration cost is
  * corpus-size-independent.
  *
  * Determinism: pure integer counting; argmax ties break on pair
  * text; merge application is literal string replacement. Symbol
  * sequences ride as DOUBLE-SPACE-joined strings padded on both ends
  * ("  a  b  "), so the pattern " a  b " (single-space flanks) can
  * be literal-replaced by " ab " with classic find-from-original,
  * non-overlapping, left-to-right semantics — identical in Java's
  * String replace and DuckDB's replace(), and immune to the
  * consumed-separator bug a single-space joining would have (in
  * " a b a b " the second occurrence loses its leading space once the
  * first is consumed; with double spaces each gap donates one space
  * to each neighboring match).
  */
object Bpe {

  /** Double-space-joined, double-space-padded symbol string of a word
    * split into characters.
    */
  private def padExpr(word: org.apache.spark.sql.Column) =
    concat(lit("  "), array_join(split(word, ""), "  "), lit("  "))

  /** Learn `iters` BPE merges over the whitespace-token vocabulary of
    * `textCol`. Returns (merge_rank, pair, merged, n) — one row per
    * learned merge, `n` the position-weighted pair count that won.
    * The per-iteration 1-row argmax collect is model training state
    * (the Ann.kmeans contract), not a data collect.
    */
  /** Shared trainer core: runs the merge loop and returns both the
    * learned merges and the final per-word symbol frame
    * (w, n, pad) — the apply side ([[tokenCompression]]) reads the
    * latter, the learn side ([[learnMerges]]) the former.
    */
  private def train(docs: DataFrame, textCol: String, iters: Int)
      : (Seq[Row], DataFrame) = {
    val wc = docs
      .select(explode(TextFuncs.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    // vocab-sized frame; checkpoint so the corpus tokenize+explode
    // runs once, not once per merge iteration
    var cur = wc.select(col("w"), col("n"), padExpr(col("w")).as("pad"))
      .localCheckpoint(eager = true)

    val merges = ArrayBuffer.empty[Row]
    var k = 1
    var exhausted = false
    while (k <= iters && !exhausted) {
      val syms = filter(split(col("pad"), "  "), s => length(s) > 0)
      val top = cur
        .where(size(syms) >= 2)
        .select(col("n"), explode(TextFuncs.shingles(syms, 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        val merged = a + b
        merges += Row(k, pair, merged, cnt)
        cur = cur.withColumn("pad",
          org.apache.spark.sql.functions.replace(
            col("pad"), lit(s" $a  $b "), lit(s" $merged ")))
        k += 1
      }
    }
    (merges.toSeq, cur)
  }

  def learnMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = train(docs, textCol, iters)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
      .orderBy(col("merge_rank"))
  }

  /** The APPLY side of the trainer: tokenize the corpus with the
    * learned merges and report per-group compression — whitespace
    * tokens vs BPE symbols and their integer-exact ratio (1e-5
    * units). The merge chain runs on the |vocab| frame; the corpus
    * contributes only the (group, word) count agg, and the symbol-
    * count join touches vocab-sized frames on both sides.
    */
  def tokenCompression(docs: DataFrame, textCol: String,
      groupCol: String, iters: Int): DataFrame = {
    val (_, fin) = train(docs, textCol, iters)
    val nSym = size(filter(split(col("pad"), "  "), s => length(s) > 0))
    val sc = fin.select(col("w"), nSym.cast("long").as("n_sym"))
    docs
      .select(col(groupCol), explode(TextFuncs.tokens(col(textCol))).as("w"))
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("c"))
      .join(sc, Seq("w"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("ws_tokens"),
        sum(col("c") * col("n_sym")).as("bpe_tokens"))
      .withColumn("ratio_e5", expr("(bpe_tokens * 100000) div ws_tokens"))
      .orderBy(col(groupCol))
  }

  /** The shared WITH-body prefix replaying [[train]]'s merge chain:
    * wc → p0 → (s/pr/c/b/p)×iters, with `w` carried through so the
    * apply oracle can join symbol counts back to words.
    * MATERIALIZED throughout: default CTE inlining re-expands the
    * upstream chain at every reference (b$k is referenced by both
    * p$k and the learn oracle's output UNION), which compounds per
    * iteration — the same blowup Pca.oracleSql measured.
    */
  private def chainSql(tbl: String, textCol: String, iters: Int): String = {
    val toks = SqlSnips.tokens(textCol)
    val its = (1 to iters).map { k =>
      val prev = s"p${k - 1}"
      s"""s$k AS MATERIALIZED (SELECT n, list_filter(string_split(pad, '  '), s -> s <> '') AS syms FROM $prev),
         |pr$k AS MATERIALIZED (SELECT n, unnest(list_transform(range(1, len(syms)),
         |  i -> syms[i] || ' ' || syms[i + 1])) AS pair FROM s$k WHERE len(syms) >= 2),
         |c$k AS MATERIALIZED (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM pr$k GROUP BY pair),
         |b$k AS MATERIALIZED (SELECT pair, cnt FROM c$k ORDER BY cnt DESC, pair LIMIT 1),
         |p$k AS MATERIALIZED (SELECT w, n, replace(pad,
         |    ' ' || split_part(b$k.pair, ' ', 1) || '  ' || split_part(b$k.pair, ' ', 2) || ' ',
         |    ' ' || replace(b$k.pair, ' ', '') || ' ') AS pad
         |  FROM p${k - 1}, b$k)""".stripMargin
    }.mkString(",\n")
    s"""tk AS (SELECT unnest($toks) AS w FROM $tbl),
       |wc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY w),
       |p0 AS MATERIALIZED (SELECT w, n, '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS pad FROM wc),
       |$its""".stripMargin
  }

  /** DuckDB replay of [[learnMerges]] as an unrolled CTE chain (the
    * kmeans-oracle idiom), assembled next to the Scala so the two
    * sides cannot drift. Assumes every iteration finds a pair (true
    * whenever the corpus has any multi-char token).
    */
  def oracleSql(tbl: String, textCol: String, iters: Int): String = {
    val out = (1 to iters).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS merge_rank, pair,
         | replace(pair, ' ', '') AS merged, cnt AS n FROM b$k""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH ${chainSql(tbl, textCol, iters)}
       |SELECT * FROM ($out) ORDER BY merge_rank""".stripMargin.replaceAll("\n", " ")
  }

  /** DuckDB replay of [[tokenCompression]]: same chain, then symbol
    * counts joined back onto per-group word counts.
    */
  def compressionOracleSql(tbl: String, textCol: String,
      groupCol: String, iters: Int): String = {
    val toks = SqlSnips.tokens(textCol)
    s"""WITH ${chainSql(tbl, textCol, iters)},
       |sc AS MATERIALIZED (SELECT w,
       |  CAST(len(list_filter(string_split(pad, '  '), s -> s <> '')) AS BIGINT) AS n_sym
       |  FROM p$iters),
       |gc AS (SELECT $groupCol, w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT $groupCol, unnest($toks) AS w FROM $tbl) GROUP BY 1, 2)
       |SELECT $groupCol, CAST(sum(c) AS BIGINT) AS ws_tokens,
       | CAST(sum(c * n_sym) AS BIGINT) AS bpe_tokens,
       | CAST((sum(c * n_sym) * 100000) // sum(c) AS BIGINT) AS ratio_e5
       |FROM gc JOIN sc USING (w)
       |GROUP BY $groupCol ORDER BY $groupCol""".stripMargin.replaceAll("\n", " ")
  }
}
