package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extension point: registers every graft SQL function at
  * session build, the idiomatic deployment for a shared cluster:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * After that, plain Spark SQL can run e.g.
  *   SELECT id FROM corpus ORDER BY vec_cosine(embedding, q) LIMIT 10
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
    e.injectFunction(fn("vec_l2",
      "vec_l2(a, b) - Euclidean distance between two vectors",
      es => VectorDistance(es(0), es(1), "l2")))
    e.injectFunction(fn("vec_cosine",
      "vec_cosine(a, b) - cosine distance (1 - similarity)",
      es => VectorDistance(es(0), es(1), "cosine")))
    e.injectFunction(fn("vec_dot",
      "vec_dot(a, b) - negated dot product",
      es => VectorDistance(es(0), es(1), "dot")))
    e.injectFunction(fn("vec_l1",
      "vec_l1(a, b) - Manhattan distance",
      es => VectorDistance(es(0), es(1), "l1")))
    e.injectFunction(fn("char_fold",
      "char_fold(s) - portable polynomial rolling hash",
      es => CharFold(es.head)))
    e.injectFunction(fn("simhash32",
      "simhash32(s) - 32-bit simhash of whitespace tokens",
      es => SimHash32Expr(es.head)))
    e.injectFunction(fn("minhash_sig",
      "minhash_sig(s) - 8-seed minhash signature of 3-shingles",
      es => MinHashSigExpr(es.head, 3, 8)))
    e.injectFunction(fn("text_embed",
      "text_embed(s) - deterministic 64-dim hash-projection embedding",
      es => TextEmbedExpr(es.head, TextEmbed.Dim)))
    e.injectFunction(fn("lsh_signature",
      "lsh_signature(v) - 8-plane random-hyperplane LSH bucket",
      es => LshSignature(es.head, 8)))
    e.injectFunction(fn("shingle_hashes",
      "shingle_hashes(s) - 3-token shingle base hashes (decontamination stream)",
      es => ShingleHashesExpr(es.head, 3)))
    e.injectFunction(fn("heavy_hitters",
      "heavy_hitters(item, m) - Space-Saving top items sketch (bounded memory)",
      es => {
        // m parameterizes sketch MEMORY, so it must be a literal at
        // plan time — reject column refs (eval(null) would crash
        // opaquely) and non-positive sizes up front
        if (!es(1).foldable) throw new IllegalArgumentException(
          "heavy_hitters: m must be a foldable literal, got " + es(1).sql)
        val m = es(1).eval(null) match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            "heavy_hitters: m must be numeric, got " + other)
        }
        if (m < 1) throw new IllegalArgumentException(
          s"heavy_hitters: m must be >= 1, got $m")
        HeavyHittersAgg(es(0), m).toAggregateExpression()
      }))
  }
}
