package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's binary vector wire format, as a Spark
  * source/sink (observed layout: /root/reference/pkg/core/vector/
  * vector.go:89-178 Encode/Decode; /root/reference/pkg/storage/
  * storage.go:278-287 writes one `<id>.vec` file per vector).
  *
  * Layout, all u32s little-endian:
  *   [id_len][id utf-8][dimension][dimension x float32 LE]
  *   [meta_len]["k=v;k2=v2" with '=' and ';' backslash-escaped]
  *
  * Decode is lenient the way the reference's is: a buffer that ends
  * after the values (no metadata section), or whose declared metadata
  * length overruns the buffer, yields an empty metadata map rather
  * than an error. Encode writes metadata keys in sorted order (the
  * reference's Go map iteration is arbitrary; decoders on both sides
  * are order-insensitive, so sorting only adds determinism).
  *
  * Interop path: a directory of reference-written `.vec` files loads
  * distributed via Spark's `binaryFile` source straight into the
  * (id, vector, metadata) collection schema VectorSql uses.
  */
object VectorWire {

  case class VecRow(id: String, vector: Array[Float],
      metadata: Map[String, String])

  private def escape(s: String): String =
    s.replace("=", "\\=").replace(";", "\\;")
  private def unescape(s: String): String =
    s.replace("\\=", "=").replace("\\;", ";")

  /** Split on an unescaped delimiter, PRESERVING escape sequences in
    * the pieces (so a second-level split still sees them; the final
    * [[unescape]] strips the backslashes).
    *
    * Deliberate divergence: the reference's splitRespectingEscapes
    * (vector.go:229-253) drops the backslash during the first split,
    * so its own decoder mangles any pair whose key/value contains '='
    * or ';' (the re-split sees 3 fields and silently drops the pair).
    * Pairs without escaped characters decode identically on both
    * sides; escaped ones additionally survive here.
    */
  private[sources] def splitUnescaped(s: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var escaped = false
    s.foreach { c =>
      if (escaped) { cur += '\\'; cur += c; escaped = false }
      else if (c == '\\') escaped = true
      else if (c == delim) { out += cur.toString(); cur.clear() }
      else cur += c
    }
    // keep the trailing piece even when empty: "=" must split to
    // ("", "") so an empty key/value round-trips (the reference drops
    // trailing empties — same bug class as its backslash handling)
    out += cur.toString()
    out.result()
  }

  private def encodeMeta(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${escape(k)}=${escape(v)}" }
      .mkString(";")

  private def decodeMeta(s: String): Map[String, String] =
    if (s.isEmpty) Map.empty
    else splitUnescaped(s, ';').flatMap { pair =>
      splitUnescaped(pair, '=') match {
        case Seq(k, v) => Some(unescape(k) -> unescape(v))
        case _ => None // malformed pair: reference drops it silently
      }
    }.toMap

  def encode(id: String, values: Array[Float],
      metadata: Map[String, String]): Array[Byte] = {
    val idB = id.getBytes(UTF_8)
    val metaB = encodeMeta(metadata).getBytes(UTF_8)
    val buf = ByteBuffer
      .allocate(4 + idB.length + 4 + 4 * values.length + 4 + metaB.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(idB.length).put(idB).putInt(values.length)
    values.foreach(buf.putFloat)
    buf.putInt(metaB.length).put(metaB)
    buf.array()
  }

  def decode(bytes: Array[Byte]): VecRow = {
    require(bytes.length >= 8, "buffer too small to decode vector")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // all length arithmetic in Long: a corrupt header (u32 read as a
    // huge/negative Int) must fail the bound check, not overflow past
    // it into a 2GB allocation or NegativeArraySizeException
    val idLen = buf.getInt
    require(idLen >= 0 && bytes.length >= 4L + idLen + 4L,
      "buffer too small to decode vector")
    val idB = new Array[Byte](idLen); buf.get(idB)
    val dim = buf.getInt
    require(dim >= 0 && bytes.length >= 4L + idLen + 4L + 4L * dim,
      "buffer too small to decode vector values")
    val values = Array.fill(dim)(buf.getFloat)
    val meta =
      if (buf.remaining() <= 4) Map.empty[String, String]
      else {
        val metaLen = buf.getInt
        if (buf.remaining() < metaLen) Map.empty[String, String]
        else {
          val mB = new Array[Byte](metaLen); buf.get(mB)
          decodeMeta(new String(mB, UTF_8))
        }
      }
    VecRow(new String(idB, UTF_8), values, meta)
  }

  /** Load a directory of `.vec` files as a collection DataFrame
    * (id, vector, metadata) — the distributed read path: Spark's
    * binaryFile source splits the file listing across executors, and
    * each task decodes its files locally.
    */
  def readVecDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.vec")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .map(decode)
      .toDF()
  }

  /** Write each (id, vector, metadata) row as `<dir>/<id>.vec`
    * (reference storage.go saveVector layout). Executors write files
    * directly, so on a cluster `dir` must be shared storage; for the
    * reference's single-node layout it's a plain directory.
    */
  def writeVecDir(df: DataFrame, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    df.select(col("id"), col("vector"), col("metadata"))
      .foreachPartition { (it: Iterator[Row]) =>
        it.foreach { r =>
          val meta = Option(r.getMap[String, String](2))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          val bytes = encode(r.getString(0),
            r.getSeq[Float](1).toArray, meta)
          Files.write(Paths.get(dir, r.getString(0) + ".vec"), bytes)
        }
      }
  }
}
