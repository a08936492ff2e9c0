package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFuncs

/** BM25 ranked lexical retrieval — the classical probabilistic
  * ranking function (Robertson & Walker, Okapi BM25; the Lucene
  * "+1" idf variant so scores stay positive at any df).
  *
  *   score(d, q) = Σ_{t ∈ q} ln(1 + (N - df + 0.5)/(df + 0.5))
  *                 · tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))
  *
  * The reference's text search ranks by embedding distance only
  * (pkg/embedding, search-text); BM25 gives the engine the lexical
  * ranker that hybrid RRF fusion expects on the other side.
  *
  * Scale shape: the corpus tokenize/explode is map-only, and the
  * very next operator drops every token that is not one of the
  * (few) query terms — an `isin` over a literal list, pushed into
  * the scan — so the tf groupBy shuffles only the matching sliver,
  * never the token stream. Corpus statistics (N, avgdl) are one
  * global aggregate over map-only doc lengths; df is counted from
  * the tf rows themselves. Nothing corpus-sized is ever sorted:
  * the final top-k is a TakeOrderedAndProject heap.
  */
object Bm25 {

  /** Per-(doc, term) BM25 partials for the query terms. The doc
    * length rides along the explode (one scan, no corpus-sized join
    * back to a lengths table). Exposed for composition/tests;
    * [[search]] sums it. Output: (term, idCol, dl int, tf long,
    * df long).
    */
  def termStats(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val tf = docs
      .select(col(idCol), TextFuncs.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
      .where(col("term").isin(queryTerms: _*)) // map-side drop
      .groupBy(col(idCol), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
  }

  /** Top-k docs for `query` under BM25(k1, b). Scores round to 4dp
    * with ties broken by id; `query` tokenizes with the same
    * tokenizer as the corpus, duplicate query terms count once.
    */
  def search(docs: DataFrame, textCol: String, idCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val queryTerms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(TextFuncs.tokens(col(textCol)))).as("avgdl")).head()
    val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val idf = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val contrib = idf * col("tf") * (k1 + 1.0) / (col("tf") + norm)
    termStats(docs, textCol, idCol, queryTerms)
      .groupBy(col(idCol))
      .agg(round(sum(contrib), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
