package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata; the
  * Spark-side contract — schema, partition-sized batching, feature
  * array shape — is real and tested.
  *
  * Codecs: image decode/resize (PNG/JPEG/BMP/GIF), WAV-PCM audio
  * decode, and MJPEG-in-AVI video keyframe extraction
  * ([[extractMjpegFrames]]: RIFF walk + per-frame JPEG) are REAL, via
  * the JDK's own `javax.imageio` / `javax.sound.sampled` — no
  * external dependency. Other video codecs have no JVM decoder and
  * yield no rows (honest failure); `decodeStub`/`resizePayload`/
  * `sampleFrames` remain as deterministic byte-level fallbacks for
  * arbitrary payloads.
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

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean_r: Float, mean_g: Float, mean_b: Float)

  /** REAL image decode + per-channel statistics via `javax.imageio`
    * (PNG/JPEG/BMP/GIF — the JDK's own codecs, no external library).
    * mapPartitions keeps the one-decoder-context-per-partition shape;
    * rows whose payload does not decode (wrong mime, corrupt bytes)
    * are dropped rather than poisoning the batch.
    */
  def featurizeImages(rows: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          Some(ImageFeatures(r.media_id, w, h, sr / n, sg / n, sb / n))
        }
      }
    }
  }

  /** REAL image resize: bilinear Graphics2D scale, re-encoded as PNG —
    * binary in, binary out, same column contract as [[resizePayload]].
    * Undecodable payloads are dropped.
    */
  def resizeImage(rows: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          Some(MediaRow(r.media_id, "image/png", bos.toByteArray))
        }
      }
    }
  }

  case class AudioFeatures(media_id: Long, frames: Long, sample_rate: Float,
      rms: Float, zero_crossings: Int)

  /** REAL WAV (16-bit PCM) decode via `javax.sound.sampled`: frame
    * count, sample rate, RMS amplitude and zero-crossing count — the
    * standard cheap audio-quality signals. Non-WAV / malformed
    * payloads are dropped.
    */
  def featurizeWav(rows: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        try {
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(r.payload))
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16) None
            else {
              val bytes = ais.readAllBytes()
              val n = bytes.length / 2
              var i = 0; var sum = 0.0; var zc = 0; var prev = 0
              while (i < n) {
                val s =
                  if (fmt.isBigEndian)
                    (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
                  else
                    (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
                sum += s.toDouble * s
                if (i > 0 && ((s < 0) != (prev < 0))) zc += 1
                prev = s; i += 1
              }
              Some(AudioFeatures(r.media_id, ais.getFrameLength,
                fmt.getSampleRate,
                math.sqrt(sum / math.max(1, n)).toFloat, zc))
            }
          } finally ais.close()
        } catch { case _: Exception => None }
      }
    }
  }

  /** "Resize": byte-level fallback for arbitrary payloads (see
    * [[resizeImage]] for the real image path) — truncation/pad keeping
    * the binary-in/binary-out column contract.
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
    * row (media_id, frame_no, frame). Byte-level fallback for codecs
    * the JVM cannot decode (see [[extractMjpegFrames]] for the real
    * MJPEG-in-AVI path); the explode/partition shape is the contract.
    */
  def sampleFrames(
      rows: Dataset[MediaRow], chunkBytes: Int, everyNth: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      r.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyNth == 0) // fallback: real MJPEG path decodes
        .map { case (chunk, i) => (r.media_id, i, chunk) }
    }.toDF("media_id", "frame_no", "frame")
  }

  /** Content-defined chunking (gear-style rolling hash): a boundary
    * lands wherever the running hash of the byte stream hits
    * `h % modulus == 0` at least `minLen` bytes past the previous
    * boundary. The doubling recurrence makes the hash a TRUE sliding
    * window: a byte's contribution is g(b)·2^k after k more bytes,
    * which is ≡ 0 mod 2^30 once k ≥ 30 — so boundaries depend only
    * on the last 30 bytes of content, and after an insertion or
    * deletion every boundary ≥30 bytes downstream re-synchronizes.
    * Unlike [[sampleFrames]]' fixed windows (where one inserted byte
    * shifts EVERY later chunk), near-identical payloads share almost
    * all chunk digests — the FastCDC/LBFS dedup property. Integer
    * arithmetic is engine-portable: the DuckDB oracle replays the
    * identical recurrence with a list_reduce.
    *
    *   h_i      = (h_{i-1} * 2 + (b_i * 2654435761) % 2^20) % 2^30
    *   boundary = i - last >= minLen  AND  h_i % modulus == 0
    */
  def cdcChunksKernel(payload: Array[Byte], minLen: Int,
      modulus: Long): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var h = 0L; var last = 0; var i = 1
    while (i <= payload.length) {
      val b = payload(i - 1) & 0xff
      h = (h * 2 + (b.toLong * 2654435761L) % 1048576L) % 1073741824L
      if (i - last >= minLen && h % modulus == 0) {
        out += java.util.Arrays.copyOfRange(payload, last, i)
        last = i
      }
      i += 1
    }
    if (payload.length > last)
      out += java.util.Arrays.copyOfRange(payload, last, payload.length)
    new GenericArrayData(out.toArray[Any])
  }

  /** cdc_chunks(payload): binary -> array<binary> of content-defined
    * chunks. Codegen'd call into the static kernel. */
  case class CdcChunksExpr(child: Expression, minLen: Int,
      modulus: Long) extends UnaryExpression {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "cdc_chunks"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${t.catalogString}")
    }
    override def nullSafeEval(v: Any): Any =
      cdcChunksKernel(v.asInstanceOf[Array[Byte]], minLen, modulus)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.operators.Multimodal.cdcChunksKernel($c, $minLen, ${modulus}L)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def cdcChunks(payload: Column, minLen: Int = 16, modulus: Long = 64L): Column =
    Shims.column(CdcChunksExpr(Shims.expression(payload), minLen, modulus))

  case class VideoFrame(media_id: Long, frame_no: Int, width: Int,
      height: Int, jpeg: Array[Byte])

  /** REAL video keyframe extraction for MJPEG-in-AVI, pure JVM: a
    * RIFF container walk finds the `movi` list's video chunks
    * (`##dc`/`##db`, including inside `rec ` sub-lists), each of which
    * is a complete JPEG in Motion-JPEG — decoded through the same
    * `javax.imageio` path as the image operators. Every `everyNth`
    * frame is kept (MJPEG is all-intraframe, so every frame IS a
    * keyframe). Non-AVI payloads and non-JPEG frame chunks (any other
    * codec) yield no rows — the same honest drop contract as the
    * image/audio paths, since the JDK ships no inter-frame codec.
    */
  def extractMjpegFrames(
      rows: Dataset[MediaRow], everyNth: Int = 1): Dataset[VideoFrame] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      mjpegFrameChunks(r.payload).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .flatMap { case (jpeg, i) =>
          val img = ImageIO.read(new ByteArrayInputStream(jpeg))
          if (img == null) None
          else Some(VideoFrame(r.media_id, i, img.getWidth, img.getHeight, jpeg))
        }
    }
  }

  /** RIFF/AVI walk: the raw payloads of the `movi` list's video
    * frame chunks in file order; empty for anything that is not a
    * well-formed RIFF AVI. Truncated or over-running chunk sizes end
    * the walk rather than throwing (corrupt tails are common in
    * crawled video).
    */
  private[graft] def mjpegFrameChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return Seq.empty
    val fileEnd = math.min(bytes.length.toLong, 8L + u32(4))
    val out = Seq.newBuilder[Array[Byte]]
    def walk(start: Long, end: Long, insideMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off.toInt)
        val size = u32(off.toInt + 4)
        val dataEnd = off + 8 + size
        if (id == "LIST" && size >= 4 && off + 12 <= end) {
          val listType = fourcc(off.toInt + 8)
          // frames live in `movi`; `rec ` groups interleaved chunks.
          // A truncated list is walked to the available end, so the
          // complete frames before the cut still come out.
          if (listType == "movi" || (insideMovi && listType == "rec "))
            walk(off + 12, math.min(dataEnd, end), insideMovi = true)
        } else if (dataEnd > end) {
          return // truncated leaf chunk: stop cleanly
        } else if (insideMovi && id.length == 4 &&
            id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')) {
          out += java.util.Arrays.copyOfRange(
            bytes, (off + 8).toInt, dataEnd.toInt)
        }
        off = dataEnd + (size & 1L) // RIFF chunks are word-aligned
      }
    }
    walk(12L, fileEnd, insideMovi = false)
    out.result()
  }
}
