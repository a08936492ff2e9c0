package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorDistance, VectorFunctions}
import graft.operators.{Ann, Bq, BqKernels, IvfPq, Pq, Sq}

/** Reference-dimension validation: the test corpus is 64-dim, but the
  * reference embeds with 384-dim MiniLM (engine.go:65-95). Every
  * distance kernel and one serving path per index family runs here at
  * dim = 384 on synthesized vectors, pinning (a) kernel correctness
  * codegen-vs-interpreted-vs-reference-formula at the real width,
  * (b) the BQ packing boundary — 384 dims = exactly 6 × 64-bit
  * words via the wide path, while the single-word API refuses, and
  * (c) the Pq/Bq dim guards at 384.
  */
class Dim384Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 384
  private val n = 120

  // deterministic synthesized floats in [-1, 1]
  private def vec(i: Int): Array[Float] =
    Array.tabulate(dim)(j => (((i * 131 + j * 7919) % 997) - 498) / 498.0f)

  private lazy val corpus = (0 until n).map(i => (i.toLong, vec(i)))
    .toDF("vec_id", "embedding")
  private val qid = 7
  private lazy val query = Seq(Tuple1(vec(qid))).toDF("qvec")

  private def lit384(v: Array[Float]) =
    Literal(ArrayData.toArrayData(v), ArrayType(FloatType, containsNull = false))

  test("distance kernels at 384: codegen == interpreted == formula") {
    val a = vec(3); val b = vec(11)
    // reference formulas, double accumulation over float values in
    // index order — the kernel's documented contract
    var l2 = 0.0; var dot = 0.0; var na = 0.0; var nb = 0.0; var l1 = 0.0
    for (j <- 0 until dim) {
      val x = a(j).toDouble; val y = b(j).toDouble
      l2 += (x - y) * (x - y); dot += x * y; na += x * x; nb += y * y
      l1 += math.abs(x - y)
    }
    val expect = Map(
      "l2" -> math.sqrt(l2), "dot" -> -dot, "l1" -> l1,
      "cosine" -> (1.0 - dot / (math.sqrt(na) * math.sqrt(nb))))
    for ((m, e) <- expect) {
      val interp = VectorDistance(lit384(a), lit384(b), m)
        .eval(null).asInstanceOf[Double]
      val codegen = Seq((a, b)).toDF("a", "b")
        .select(VectorFunctions.forMetric(m)(col("a"), col("b")))
        .head().getDouble(0)
      assert(codegen === interp, m)
      assert(math.abs(interp - e) < 1e-9, s"$m: $interp vs $e")
    }
  }

  test("rp_project at 384: components equal the plane-formula dots") {
    val row = corpus.where(col("vec_id") === 3)
      .select(graft.functions.LshExpr.rp_project(col("embedding"), 16))
      .head.getSeq[Double](0)
    assert(row.length == 16)
    val v = vec(3)
    for (p <- 0 until 16) {
      var dot = 0.0
      for (j <- 0 until dim)
        dot += v(j).toDouble *
          (((p * graft.functions.RpKernels.MaxDim + j + 1) * 2654435761L
            % 4294967296L) / 4294967296.0 - 0.5)
      // identical op order + double accumulation -> bit-equal
      assert(row(p) === dot, s"component $p")
    }
  }

  test("flat + LSH at 384: exact-duplicate query retrieves itself first") {
    val flat = graft.operators.Knn.topK(
      corpus, query, "vec_id", "embedding", "cosine", 5)
    assert(flat.head().getLong(0) === qid.toLong)
    val lsh = Ann.searchLsh(corpus, query, "vec_id", "embedding", "cosine", 5)
    val top = lsh.head()
    assert(top.getLong(0) === qid.toLong)
    assert(top.getDouble(1) === 0.0)
  }

  test("IVF at 384: all-cluster probe is exact, self first") {
    val (tagged, cents) = Ann.buildIvf(
      corpus, "vec_id", "embedding", k = 4, iters = 2)
    val r = Ann.searchIvf(tagged, cents, query,
      "vec_id", "embedding", "cosine", k = 5, nprobe = 4)
    assert(r.head().getLong(0) === qid.toLong)
    assert(r.count() === 5)
  }

  test("SQ8 at 384: shortlist + exact re-rank, self first") {
    val model = Sq.train(corpus, "embedding", dim)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val r = Sq.searchWithRerank(model, codes, corpus, query,
      "vec_id", "embedding", "cosine", topK = 5, candidates = 20)
    assert(r.head().getLong(0) === qid.toLong)
  }

  test("SQ4 at 384: packed length 192, shortlist + exact re-rank, self first") {
    val model = Sq.train(corpus, "embedding", dim)
    val codes = Sq.encode4(model, corpus, "vec_id", "embedding")
    // 384 dims nibble-pack into exactly 192 ints
    assert(codes.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("codes"))).head().getInt(0) === 192)
    val r = Sq.search4WithRerank(model, codes, corpus, query,
      "vec_id", "embedding", "cosine", topK = 5, candidates = 20)
    assert(r.head().getLong(0) === qid.toLong)
  }

  test("PQ at 384: m=8 -> 48-dim subspaces; serving deterministic") {
    val model = Pq.train(corpus, "vec_id", "embedding",
      dim = dim, m = 8, k = 16, iters = 2)
    assert(model.subDim === 48)
    val codes = Pq.encode(model, corpus, "vec_id", "embedding")
    val r1 = Pq.searchAdcJoin(model, codes, query, "vec_id", topK = 10)
      .collect().toSeq
    val r2 = Pq.searchAdcJoin(model, codes, query, "vec_id", topK = 10)
      .collect().toSeq
    assert(r1.size === 10)
    assert(r1 === r2)
  }

  test("IVF-PQ at 384: routed ADC serving runs end to end") {
    val idx = IvfPq.build(corpus, "vec_id", "embedding", dim = dim,
      kClusters = 4, ivfIters = 2, m = 8, kCodes = 16, pqIters = 2)
    assert(IvfPq.search(idx, query, "vec_id", topK = 10, nprobe = 2)
      .count() === 10)
  }

  test("BQ wide at 384: exactly 6 packed words, self at hamming 0") {
    val model = Bq.trainWide(corpus, "embedding", dim)
    val codes = Bq.encodeWide(model, corpus, "vec_id", "embedding")
    assert(codes.select(size(col("code")).as("w")).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(6))
    val r = Bq.searchWide(model, codes, query, "vec_id", topK = 5)
    val top = r.head()
    assert(top.getLong(0) === qid.toLong)
    assert(top.getInt(1) === 0)
  }

  test("BQ wide hamming == unpacked sign-bit disagreement count") {
    val model = Bq.trainWide(corpus, "embedding", dim)
    // packed xor+popcount (the codegen'd serving kernel)
    val codes = Bq.encodeWide(model, corpus, "vec_id", "embedding")
    val a = codes.where(col("vec_id") === 3).head().getSeq[Long](1)
    val b = codes.where(col("vec_id") === 11).head().getSeq[Long](1)
    val packed = BqKernels.hammingWide(
      ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
    // unpacked: count dims where the sign bits disagree
    val va = vec(3); val vb = vec(11)
    val unpacked = (0 until dim).count(j =>
      (va(j) > model.thr(j)) != (vb(j) > model.thr(j)))
    assert(packed === unpacked)
    assert(packed > 0) // distinct vectors must actually disagree
  }

  test("dim guards at 384: single-word BQ and non-dividing PQ refuse") {
    val e1 = intercept[IllegalArgumentException] {
      Bq.train(corpus, "embedding", dim)
    }
    assert(e1.getMessage.contains("64"))
    val e2 = intercept[IllegalArgumentException] {
      BqKernels.encode(ArrayData.toArrayData(vec(0)), isFloat = true,
        Array.fill(dim)(0.0))
    }
    assert(e2.getMessage.contains("64"))
    val e3 = intercept[IllegalArgumentException] {
      Pq.train(corpus, "vec_id", "embedding", dim = dim, m = 7, k = 16,
        iters = 1)
    }
    assert(e3.getMessage.contains("divisible"))
  }
}
