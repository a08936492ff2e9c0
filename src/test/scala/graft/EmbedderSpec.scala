package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embedder, HashProjectionEmbedder, TextExprs}
import graft.operators.Knn

/** Custom model stand-in: 4-dim [n_tokens, text_len, vowels, 1],
  * L2-normalized. Deliberately nothing like hash projection — the
  * point is that the pipeline doesn't care. Top-level so the broadcast
  * serializes only the embedder (not a test-suite \$outer).
  */
class ToyModelEmbedder(
    calls: LongAccumulator, maxBatch: LongAccumulator) extends Embedder {
  // a real impl would lazy-load broadcast weights here (one init
  // per executor); the accumulators stand in for that lifecycle
  override val dim = 4
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    calls.add(1)
    maxBatch.add(math.max(maxBatch.value, texts.length) - maxBatch.value)
    texts.map { t =>
      val raw = Array(
        t.trim.split("\\s+").count(_.nonEmpty).toFloat,
        t.length.toFloat,
        t.count("aeiou".contains(_)).toFloat,
        1f)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      if (n == 0) raw else raw.map(_ / n)
    }
  }
}

/** The pluggable batch-inference seam: a custom Embedder must flow
  * through embed/search-shaped pipelines with no query changes, the
  * default must equal the codegen kernel, and the batching contract
  * (grouped calls, not per-row) must actually hold.
  */
class EmbedderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(100)

  test("HashProjectionEmbedder via embedColumn == text_embed kernel") {
    val viaSeam = Embedder.embedColumn(
      docs.select(col("doc_id"), col("text")), "text", "emb",
      new HashProjectionEmbedder(), batchSize = 16)
    val rows = viaSeam
      .join(docs.select(col("doc_id"),
        TextExprs.text_embed(col("text")).as("kemb")), Seq("doc_id"))
      .select(col("emb"), col("kemb"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Double](1)
      assert(a.length == 64 && b.length == 64)
      // float32 seam output vs float64 kernel: 1e-6 relative is the
      // float32 round-trip error bound for unit-norm components
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("custom Embedder flows through an embed+knn pipeline; batching is real") {
    val calls = spark.sparkContext.longAccumulator("embed_calls")
    val maxBatch = spark.sparkContext.longAccumulator("embed_max_batch")
    val toy = new ToyModelEmbedder(calls, maxBatch)
    val embedded = Embedder.embedColumn(
      docs.select(col("doc_id"), col("text")), "text", "embedding",
      toy, batchSize = 16)
    // the embedded column feeds the SAME operators as any vector col
    val q = embedded.where(col("doc_id") === 0)
      .select(col("embedding").as("qvec"))
    val top = Knn.topK(embedded, q, "doc_id", "embedding", "cosine", 5)
      .collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 0.0)
    // batching contract: far fewer calls than rows, batches capped
    assert(calls.value > 0 && calls.value < 100,
      s"per-row calls? calls=${calls.value}")
    assert(maxBatch.value <= 16, s"batch overflow: ${maxBatch.value}")
  }

  test("searchByText with a custom embedder ranks by its own geometry") {
    val calls = spark.sparkContext.longAccumulator("c2")
    val mb = spark.sparkContext.longAccumulator("m2")
    val toy = new ToyModelEmbedder(calls, mb)
    // two-word query: nearest docs under the toy geometry are the ones
    // with similar token/length/vowel ratios, NOT hash-projection ones
    val r = Embedder.searchByText(
      docs.select(col("doc_id"), col("text")), "text", "doc_id",
      "hello world", toy, k = 3).collect()
    assert(r.length == 3)
    assert(r.map(_.getDouble(1)).toSeq == r.map(_.getDouble(1)).sorted.toSeq)
  }

  test("LinearProjectionEmbedder: broadcast weights load once, batches real, W non-identity") {
    import graft.functions.{LinearProjection, LinearProjectionEmbedder}
    val init = spark.sparkContext.longAccumulator("lin_init")
    val batches = spark.sparkContext.longAccumulator("lin_batches")
    val model = new LinearProjectionEmbedder(4, Some(init), Some(batches))
    val embedded = Embedder.embedColumn(
      docs.select(col("doc_id"), col("text")), "text", "emb",
      model, batchSize = 16)
    val rows = embedded.select(col("doc_id"), col("text"), col("emb"))
      .collect()
    assert(rows.length == 100)
    // the weight matrix materialized lazily ONCE per executor-side
    // deserialization of the broadcast (local[*]: one JVM, a handful
    // of tasks — never once per row), and calls were batched
    assert(init.value >= 1 && init.value <= batches.value,
      s"init=${init.value} batches=${batches.value}")
    assert(batches.value < 100,
      s"per-row model calls: ${batches.value}")
    // W is genuinely non-identity/non-diagonal: off-diagonal mass
    val w = Array.tabulate(4, LinearProjection.InDim)(
      LinearProjection.weight)
    assert(w.zipWithIndex.exists { case (row, j) =>
      row.zipWithIndex.exists { case (v, i) => i != j && v != 0f } })
    assert(w.flatten.distinct.length > 2, w.flatten.toSeq.toString)
    // every produced vector equals the driver-side W·features — the
    // executor path computes the same projection, exactly (integer
    // outputs, float32-lossless)
    rows.foreach { r =>
      val x = LinearProjection.features(r.getString(1))
      val want = Array.tabulate(4)(j =>
        (0 until LinearProjection.InDim).map(i => w(j)(i) * x(i)).sum)
      assert(r.getSeq[Float](2) == want.toSeq, s"doc ${r.getLong(0)}")
    }
  }

  test("default seam through search_text shape matches the kernel query") {
    // the shipped search_text query uses the codegen kernel; the seam
    // with the default embedder must produce the same ranking
    val viaSeam = Embedder.searchByText(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "text", "doc_id", SparkEntry.SearchTextQuery,
      new HashProjectionEmbedder(), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaKernel = SparkEntry.queries("search_text")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSeam.map(_._1).sameElements(viaKernel.map(_._1)))
    viaSeam.zip(viaKernel).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 0.0001) // float32 seam vs float64 kernel at 4dp
    }
  }
}
