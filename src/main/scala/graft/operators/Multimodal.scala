package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata; the
  * Spark-side contract — schema, partition-sized batching, feature
  * array shape — is real and tested. The codec calls themselves are
  * STUBBED with a deterministic fake (this container has no image or
  * audio libraries): every place a real decoder would go is marked
  * `STUB:`. Swapping in a real codec changes only the inside of
  * `decodeStub`, not the pipeline shape.
  */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, byte_len: Int,
      features: Array[Float])

  /** STUB: stands in for a real decode + feature extraction (e.g.
    * JPEG decode -> resize -> channel means). Deterministic in the
    * payload bytes so tests are stable: feature j is a windowed byte
    * fold, normalized to [0,1).
    */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var acc = 0L
      var i = j
      while (i < payload.length) { acc = (acc * 31 + (payload(i) & 0xff)) % 1000003L; i += dim }
      out(j) = acc.toFloat / 1000003f
      j += 1
    }
    out
  }

  /** Per-partition batched featurization — the mapInPandas-equivalent
    * shape: one iterator per partition, rows processed in a tight
    * loop, no per-row task overhead. On a real cluster each partition
    * would host one codec context / model session.
    */
  def featurize(rows: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // STUB: real impl would initialize one decoder per partition here
      it.map { r =>
        MediaFeatures(r.media_id, r.mime, r.payload.length,
          decodeStub(r.payload, dim))
      }
    }
  }

  /** "Resize": STUB for an image resize — here a truncation/pad of the
    * payload, keeping the binary-in/binary-out column contract.
    */
  def resizePayload(df: DataFrame, payloadCol: String, target: Int): DataFrame = {
    val fn = udf { (b: Array[Byte]) =>
      if (b == null) null
      else if (b.length >= target) b.take(target)
      else b ++ Array.fill[Byte](target - b.length)(0) // STUB: pad, not interpolate
    }
    df.withColumn(payloadCol, fn(col(payloadCol)))
  }

  /** "Frame sampling": every nth chunk of a binary payload as a frame
    * row (media_id, frame_no, frame). STUB for video keyframe
    * extraction; the explode/partition shape is the real contract.
    */
  def sampleFrames(
      rows: Dataset[MediaRow], chunkBytes: Int, everyNth: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      r.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyNth == 0) // STUB: real impl decodes keyframes
        .map { case (chunk, i) => (r.media_id, i, chunk) }
    }.toDF("media_id", "frame_no", "frame")
  }
}
