package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sq

class SqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  def corpus = Tables.load(spark, sf, "embeddings")

  test("codes are bytes in [0,255]; extremes map to 0 and 255") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val bad = codes.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0)
    // the row attaining dimension 1's min encodes dim 1 as 0, the max as 255
    val lo = codes.join(corpus, "vec_id")
      .where(element_at(col("embedding"), 1).cast("double") === model.mins(0))
      .select(element_at(col("codes"), 1)).head.getInt(0)
    val hi = codes.join(corpus, "vec_id")
      .where(element_at(col("embedding"), 1).cast("double") === model.maxs(0))
      .select(element_at(col("codes"), 1)).head.getInt(0)
    assert(lo == 0 && hi == 255)
  }

  test("dequantized L2 approximates exact L2 within the step bound") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    // worst-case per-dim quantization error is step/2 = (mx-mn)/510;
    // accumulated over 64 dims the L2 deviation is bounded by
    // sqrt(sum(step_i^2))/2 — check against the exact distance
    val maxErr = math.sqrt(model.mins.indices.map { i =>
      val st = (model.maxs(i) - model.mins(i)) / 255.0; st * st
    }.sum) / 2.0
    val joined = Sq.search(model, codes, q, "vec_id", topK = 1000, roundTo = 8)
      .join(corpus.crossJoin(q).select(col("vec_id"),
        functions.VectorFunctions.vec_l2(col("embedding"), col("qvec")).as("exact")),
        "vec_id")
    val worst = joined.select(max(abs(col("dist") - col("exact")))).head.getDouble(0)
    assert(worst <= maxErr, s"worst=$worst bound=$maxErr")
  }

  test("search plan is map-only: no exchange before TakeOrdered") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val plan = Sq.search(model, codes, q, "vec_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("write/load round trip reproduces search results") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("sqidx").toString
    Sq.writeIndex(model, codes, dir)
    val (m2, c2) = Sq.loadIndex(spark, dir)
    assert(m2.mins.sameElements(model.mins) && m2.maxs.sameElements(model.maxs))
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val a = Sq.search(model, codes, q, "vec_id", 10).collect().toSeq
    val b = Sq.search(m2, c2, q, "vec_id", 10).collect().toSeq
    assert(a == b)
  }

  test("rerank with corpus-sized candidate set equals exact flat kNN") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode(model, corpus, "vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val n = corpus.count().toInt
    val rr = Sq.searchWithRerank(model, codes, corpus, q,
      "vec_id", "embedding", "euclidean", topK = 10, candidates = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.operators.Knn.topK(corpus, q,
      "vec_id", "embedding", "euclidean", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr == exact)
  }

  test("append+delete round-trip equals a fresh encode on the same data") {
    val model = Sq.train(corpus, "embedding", 64)
    val old = corpus.where(col("vec_id") < 400)
    val add = corpus.where(col("vec_id") >= 400)
    val doomed = corpus.where(col("vec_id") % 7 === 0)
    val live = Sq.deleteFromIndex(
      Sq.appendToIndex(model, Sq.encode(model, old, "vec_id", "embedding"),
        add, "vec_id", "embedding"),
      "vec_id", doomed)
    val fresh = Sq.encode(model,
      corpus.where(col("vec_id") % 7 =!= 0), "vec_id", "embedding")
    assert(live.orderBy("vec_id").collect().toSeq ==
      fresh.orderBy("vec_id").collect().toSeq)
  }

  test("stalenessReport: in-range corpus 0.0; shifted rows flagged") {
    val model = Sq.train(corpus, "embedding", 64)
    val clean = Sq.stalenessReport(model, corpus, "embedding").head
    assert(clean.getLong(1) == 0L && clean.getDouble(2) == 0.0)
    // shift every component above the trained max -> frac 1.0
    val shifted = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(1000.0f)).as("embedding"))
    val bad = Sq.stalenessReport(model, shifted, "embedding").head
    assert(bad.getDouble(2) == 1.0)
  }

  test("IVF-SQ8 with all clusters probed equals the flat SQ8 rerank") {
    import graft.operators.Ann
    val e = corpus
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val tagged = Ann.tagCorpus(e, "vec_id", "embedding", cents)
    val model = Sq.train(e, "embedding", 64)
    val q = e.where(col("vec_id") === 3).select(col("embedding").as("qvec"))
    val flat = Sq.searchWithRerank(model,
        Sq.encode(model, e, "vec_id", "embedding"), e, q,
        "vec_id", "embedding", "euclidean", topK = 10, candidates = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Sq.searchIvfSq(model,
        Sq.encodeIvf(model, tagged, "vec_id", "embedding"), cents, e, q,
        "vec_id", "embedding", "euclidean", topK = 10, candidates = 50,
        nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == flat)
  }

  test("SQ4: packed codes carry 15-level values; length = ceil(dim/2)") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode4(model, corpus, "vec_id", "embedding")
    val lens = codes.select(size(col("codes")).as("l"))
      .where(col("l") =!= 32).count()
    assert(lens == 0)
    // every nibble in [0,15] by construction: packed ints < 256
    val bad = codes.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0)
  }

  test("SQ4: odd dimension packs the tail nibble alone (lo nibble)") {
    val df = Seq((0L, Array(0.0f, 0.0f, 10.0f)), (1L, Array(1.0f, 2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val model = Sq.train(df, "embedding", 3)
    val codes = Sq.encode4(model, df, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    // dim 3 (max=10 on row 0) lands alone in word 2's low nibble
    assert(codes(0).length == 2 && codes(1).length == 2)
    assert(codes(0)(1) == 15 && codes(1)(1) == 0) // row0 dim3=max->15, row1 dim3=min->0
    // row 1 attains dim1/dim2 maxes: word 1 = 15 | 15<<4 = 255
    assert(codes(1)(0) == 255 && codes(0)(0) == 0)
  }

  test("SQ4: unpacked distance equals the 15-level formula; rerank with full candidates = exact kNN") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode4(model, corpus, "vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    // wider cells than SQ8 -> larger but still bounded deviation
    val maxErr = math.sqrt(model.mins.indices.map { i =>
      val st = (model.maxs(i) - model.mins(i)) / 15.0; st * st
    }.sum) / 2.0
    val joined = Sq.search4(model, codes, q, "vec_id", topK = 1000, roundTo = 8)
      .join(corpus.crossJoin(q).select(col("vec_id"),
        functions.VectorFunctions.vec_l2(col("embedding"), col("qvec")).as("exact")),
        "vec_id")
    val worst = joined.select(max(abs(col("dist") - col("exact")))).head.getDouble(0)
    assert(worst <= maxErr, s"worst=$worst bound=$maxErr")
    val n = corpus.count().toInt
    val rr = Sq.search4WithRerank(model, codes, corpus, q,
      "vec_id", "embedding", "euclidean", topK = 10, candidates = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.operators.Knn.topK(corpus, q,
      "vec_id", "embedding", "euclidean", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr == exact)
  }

  test("SQ4: search plan is map-only, no exchange before TakeOrdered") {
    val model = Sq.train(corpus, "embedding", 64)
    val codes = Sq.encode4(model, corpus, "vec_id", "embedding")
    val q = corpus.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val plan = Sq.search4(model, codes, q, "vec_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("degenerate constant dimension encodes as 0 and round-trips") {
    val df = Seq((0L, Array(1.0f, 5.0f)), (1L, Array(1.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val model = Sq.train(df, "embedding", 2)
    assert(model.mins(0) == 1.0 && model.maxs(0) == 1.0)
    val codes = Sq.encode(model, df, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(codes(0) == Seq(0, 0) && codes(1) == Seq(0, 255))
  }
}
