package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable batch-inference embedding seam.
  *
  * The reference embeds text through a remote model service
  * (/root/reference/pkg/embedding/engine.go:65-95 batches texts and
  * calls /root/reference/pkg/embedding/models/huggingface.go, MiniLM
  * 384-dim). The Spark-native shape of that contract is:
  *
  *  - ONE model context per partition (not per row): `mapPartitions`,
  *    with the model/weights shipped once per executor via a
  *    broadcast variable, never re-serialized per task closure;
  *  - texts buffered into fixed-size batches (`batchSize`), the unit
  *    a real inference runtime (ONNX/Triton/HTTP service) wants;
  *  - output is a plain `array<float>` column appended to the input
  *    row — downstream kNN/ANN/dedup operators don't know or care
  *    which embedder produced it.
  *
  * Swapping in a real model = implementing [[Embedder]] (load weights
  * in a lazy field so they materialize per executor, talk to the
  * runtime in `embedBatch`) — no query or pipeline changes. The
  * default [[HashProjectionEmbedder]] is the deterministic,
  * oracle-able stand-in, value-identical to the `text_embed` kernel
  * expression (spec-pinned).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch. Must return exactly `texts.length` vectors of
    * length `dim`; called from executor tasks, so implementations
    * must be thread-compatible per instance.
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-projection embedder (TextEmbed formula, same
  * values as the `text_embed` codegen kernel and the DuckDB oracle).
  */
class HashProjectionEmbedder(val dim: Int = TextEmbed.Dim) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      TextKernels.embed(UTF8String.fromString(t), dim).map(_.toFloat)
    }
}

/** The deterministic pieces of [[LinearProjectionEmbedder]], shared
  * with its DuckDB oracle: an INTEGER featurization (token/char/vowel/
  * distinct counts + bias — whitespace tokenization identical to
  * TextFuncs.tokens / SqlSnips.tokens) and a dense non-identity
  * integer weight matrix from a closed-form hash, so model outputs
  * are exact small integers that float32 carries losslessly and an
  * independent engine reproduces bit-for-bit.
  */
object LinearProjection {
  val InDim = 5

  /** w(j, i) = ((j·InDim + i)·2654435761 mod 7) − 3 ∈ [−3, 3]. */
  def weight(j: Int, i: Int): Float =
    (((j.toLong * InDim + i) * 2654435761L) % 7L - 3L).toFloat

  /** [n_tokens, n_chars, n_vowels, n_distinct_tokens, 1] — the bias
    * keeps even the empty text off the zero vector (cosine defined).
    * n_chars counts CODE POINTS (DuckDB's len(text) semantics), not
    * UTF-16 units — an astral-plane character would otherwise count
    * 2 here and 1 in the oracle and shift the projection by a full
    * weight column.
    */
  def features(t: String): Array[Float] = {
    val toks = t.trim.split("\\s+").filter(_.nonEmpty)
    Array(toks.length.toFloat, t.codePointCount(0, t.length).toFloat,
      t.count(c => "aeiou".indexOf(c.toInt) >= 0).toFloat,
      toks.distinct.length.toFloat, 1f)
  }
}

/** A real (small, local) linear model through the batch-inference
  * seam — the huggingface.go:34 ProcessDocuments analog with an
  * actual non-identity weight matrix instead of the hash-projection
  * stand-in: out = W · features(text), W the 4×5 integer matrix
  * above. The matrix materializes LAZILY, once per executor
  * deserialization of the broadcast instance — exactly where a real
  * implementation would load its ONNX/weights file; `initCount` /
  * `batchCount` let the spec verify that lifecycle (weights loaded
  * once per executor, calls batched not per-row). Integer outputs
  * make the whole pipeline DuckDB-oracle-able end to end
  * (`embed_linear_search`).
  */
class LinearProjectionEmbedder(val dim: Int = 4,
    initCount: Option[org.apache.spark.util.LongAccumulator] = None,
    batchCount: Option[org.apache.spark.util.LongAccumulator] = None)
  extends Embedder {

  @transient private lazy val w: Array[Array[Float]] = {
    initCount.foreach(_.add(1))
    Array.tabulate(dim, LinearProjection.InDim)(LinearProjection.weight)
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    batchCount.foreach(_.add(1))
    texts.map { t =>
      val x = LinearProjection.features(t)
      // accumulate in DOUBLE (the oracle's list_sum precision): a
      // float accumulator would round partial sums past 2^24. The
      // final float cast is exact while |out| < 2^24 — with |w| ≤ 3
      // and 5 features that bounds documents at ~10^6 chars, the
      // stated input-domain contract of the float32-lossless claim
      Array.tabulate(dim) { j =>
        var s = 0.0; var i = 0
        while (i < LinearProjection.InDim) {
          s += w(j)(i).toDouble * x(i); i += 1
        }
        s.toFloat
      }
    }
  }
}

object Embedder {

  /** Append `outCol` = embedder(textCol) to every row. Null/absent
    * text embeds as the zero vector (matching the kernel's behavior
    * on empty token lists: downstream cosine treats it as distance 1).
    *
    * Batching contract (the part a real model needs): rows stream
    * through `mapPartitions` in groups of `batchSize`; the embedder
    * instance rides a broadcast variable so executor JVMs deserialize
    * the weights once, not once per task.
    */
  def embedColumn(df: DataFrame, textCol: String, outCol: String,
      embedder: Embedder, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val bc = df.sparkSession.sparkContext.broadcast(embedder)
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val out = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(idx)) "" else r.getString(idx))
        val vecs = bc.value.embedBatch(texts)
        require(vecs.length == batch.length,
          s"embedder returned ${vecs.length} vectors for ${batch.length} texts")
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(Encoders.row(outSchema))
    out
  }

  /** search_text-shaped pipeline on a pluggable embedder: embed the
    * corpus column, embed the query string (driver side, it's one
    * batch of one), rank by cosine. The shipped `search_text` query
    * keeps the codegen kernel; this is the seam a real model drops
    * into.
    */
  def searchByText(df: DataFrame, textCol: String, idCol: String,
      query: String, embedder: Embedder, k: Int,
      batchSize: Int = 64): DataFrame = {
    val qvec = embedder.embedBatch(Seq(query)).head
    val embedded = embedColumn(df, textCol, "_emb", embedder, batchSize)
    embedded
      .select(col(idCol),
        round(VectorFunctions.vec_cosine(col("_emb"), typedLit(qvec.toSeq)), 4)
          .as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
