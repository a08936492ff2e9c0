package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val e = Tables.load(spark, sf, "embeddings")
  private lazy val model = Pq.train(e, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2)
  private lazy val codes = Pq.encode(model, e, "vec_id", "embedding").cache()

  test("train: m*k codebook entries of subDim each") {
    assert(model.codebooks.count() == 8 * 16)
    assert(model.codebooks.select(size(col("centroid"))).distinct().head().getInt(0) == 8)
  }

  test("encode: one code row per vector, m codes in [0, k)") {
    assert(codes.count() == e.count())
    val bad = codes.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("encode is deterministic") {
    val again = Pq.encode(model, e, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val first = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(first == again)
  }

  test("ADC search: self-query ranks the encoded vector at/near the top, recall reasonable") {
    val qvec = e.where(col("vec_id") === 0)
      .head().getSeq[Float](1).toArray
    val approx = Pq.searchAdc(model, codes, qvec, "vec_id", topK = 20)
      .collect().map(_.getLong(0))
    assert(approx.take(5).contains(0L), s"query vector not in top-5: ${approx.toSeq}")
    // recall@10 of PQ-ADC (8 bytes/vector) vs exact l2 top-10
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = graft.operators.Knn.topK(e, q, "vec_id", "embedding", "euclidean", 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx.take(10).toSet).size / 10.0
    assert(recall >= 0.2, s"recall $recall")
  }

  test("searchAdc (literal table) == searchAdcJoin (explode+join), incl. at rest") {
    // static codebooks: both paths fully deterministic
    val sm = Pq.staticCodebooks(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val sc = Pq.encode(sm, e, "vec_id", "embedding").localCheckpoint(true)
    val qvec = e.where(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val qdf = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))

    val lit = Pq.searchAdc(sm, sc, qvec, "vec_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val join = Pq.searchAdcJoin(sm, sc, qdf, "vec_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(lit.sameElements(join),
      s"literal=${lit.toSeq} join=${join.toSeq}")

    // at-rest round trip: write codes+codebooks+params, load, same top-k
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Pq.writeIndex(sm, sc, dir)
    val (rm, rc) = Pq.loadIndex(spark, dir)
    assert(rm.m == sm.m && rm.k == sm.k && rm.subDim == sm.subDim)
    val rest = Pq.searchAdc(rm, rc, qvec, "vec_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rest.sameElements(lit))
  }

  test("searchAdc at rest is map-only: no exchange before TakeOrdered") {
    val sm = Pq.staticCodebooks(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val sc = Pq.encode(sm, e, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_plan").toString
    Pq.writeIndex(sm, sc, dir)
    val (rm, rc) = Pq.loadIndex(spark, dir)
    val qvec = e.where(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val plan = Pq.searchAdc(rm, rc, qvec, "vec_id", topK = 10)
      .queryExecution.executedPlan.toString
    // the serving scan: parquet codes -> codegen'd literal-table score
    // -> per-partition heap. Any Exchange here would be a full-corpus
    // shuffle per query (what searchAdcJoin pays for composability).
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ADC + exact re-rank recovers near-perfect recall") {
    val qvec = e.where(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val reranked = Pq.searchWithRerank(model, codes, e, qvec,
      "vec_id", "embedding", "euclidean", topK = 10, candidates = 100)
      .collect().map(_.getLong(0)).toSet
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = graft.operators.Knn.topK(e, q, "vec_id", "embedding", "euclidean", 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect reranked).size / 10.0
    assert(recall >= 0.7, s"rerank recall $recall")
  }

  test("variance-snake permutation: a real permutation, balanced groups") {
    val order = Pq.varianceSnakeOrder(e, "vec_id", "embedding", m = 8)
    assert(order.sorted == (0 until 64).toList) // bijective on dims
    // determinism: the exact-integer ranking replays identically
    assert(order == Pq.varianceSnakeOrder(e, "vec_id", "embedding", m = 8))
  }

  test("OPQ permutation: trained-PQ distortion <= plain at same m/k") {
    // the claim ann_pq_permuted exists to earn: dealing dims to
    // subspaces by variance (snake draft) never leaves one
    // subquantizer starved and another overloaded, so total
    // reconstruction SSE at the same m/k/iters budget is at worst
    // plain PQ's (equal on a perfectly isotropic cloud, better the
    // more the per-dim variances spread)
    def sse(corpus: org.apache.spark.sql.DataFrame): Double = {
      val m = Pq.train(corpus, "vec_id", "embedding", dim = 64,
        m = 8, k = 16, iters = 2)
      val sub = corpus.select(col("vec_id"),
          explode(transform(sequence(lit(0), lit(7)), g =>
            struct(g.as("grp"),
              transform(slice(col("embedding"), g * 8 + 1, lit(8)),
                _.cast("double")).as("sv")))).as("x"))
        .select(col("x.grp").as("grp"), col("vec_id"), col("x.sv").as("sv"))
      val d2 = aggregate(
        zip_with(col("sv"), col("centroid"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (a, b) => a + b)
      sub.join(broadcast(m.codebooks), Seq("grp"))
        .select(col("grp"), col("vec_id"), d2.as("d2"))
        .groupBy(col("grp"), col("vec_id")).agg(min(col("d2")).as("err2"))
        .agg(sum(col("err2"))).head().getDouble(0)
    }
    val order = Pq.varianceSnakeOrder(e, "vec_id", "embedding", m = 8)
    val pe = e.select(col("vec_id"),
      array(order.map(i => col("embedding").getItem(i)): _*).as("embedding"))
    val plain = sse(e)
    val permuted = sse(pe)
    assert(permuted <= plain * 1.005,
      f"permuted SSE $permuted%.2f vs plain $plain%.2f")
    info(f"plain SSE $plain%.3f, permuted SSE $permuted%.3f, " +
      f"ratio ${permuted / plain}%.4f")
  }

  test("append+delete round-trip equals a fresh encode on the same data") {
    val old = e.where(col("vec_id") < 400)
    val add = e.where(col("vec_id") >= 400)
    val doomed = e.where(col("vec_id") % 7 === 0)
    val live = Pq.deleteFromIndex(
      Pq.appendToIndex(model, Pq.encode(model, old, "vec_id", "embedding"),
        add, "vec_id", "embedding"),
      "vec_id", doomed)
    val fresh = Pq.encode(model,
      e.where(col("vec_id") % 7 =!= 0), "vec_id", "embedding")
    assert(live.orderBy("vec_id").collect().toSeq ==
      fresh.orderBy("vec_id").collect().toSeq)
  }
}
