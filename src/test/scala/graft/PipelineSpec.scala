package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextEmbed, TextFuncs}
import graft.operators.{Ann, Dedup, Multimodal}
import graft.sources.VectorStore

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat again and again", "en"), // near dup of 0
    (3L, "completely different content about spark query engines at scale", "en"),
    (4L, "unrelated words forming another document entirely separate topic", "fr")
  ).toDF("doc_id", "text", "lang")

  test("exactGroups finds the exact duplicate pair") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .where($"n" > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("n") == 2L)
    assert(g.head.getAs[Long]("keep_id") == 0L)
  }

  test("minhashPairs surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing: $pairs")
    // unrelated docs 3,4 must not pair with anything
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 4L && p._1 != 2L || p._2 == 3L))
  }

  test("simhash: identical docs get identical hashes, near dups are close") {
    val hs = Dedup.simhashDocs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(0L) == hs(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0L), hs(2L)) < hamming(hs(0L), hs(3L)))
  }

  test("jaccardPairs scores the near dup high") {
    val j = Dedup.jaccardPairs(docs, "text", "doc_id", "lang", 10, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 2L)) > 0.7)
    assert(j((0L, 3L)) < 0.2)
  }
}

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("lsh signature is stable and bucket search returns the query itself first") {
    val r = SparkEntry.queries("ann_lsh")(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.head.getLong(0) == 0L && r.head.getDouble(1) == 0.0)
  }

  test("ivf: clusters cover the corpus; search finds the query vector") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    assert(centroids.count() == 4)
    assert(tagged.count() == e.count())
    val res = SparkEntry.queries("ann_ivf")(spark, sf).collect()
    assert(res.head.getLong(0) == 0L && res.head.getDouble(1) == 0.0)
  }

  test("ivf recall@10 vs exact flat search is reasonable on sf0.001") {
    val exact = SparkEntry.queries("knn_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("ann_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 3,
      s"recall too low: ${(exact intersect approx).size}/10")
  }
}

class TextEmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("embedLocal matches the Column-side embed formula exactly") {
    val text = "spark join merge sort table scan"
    val local = TextEmbed.embedLocal(text)
    val viaSpark = Seq(text).toDF("text")
      .select(TextEmbed.embed(col("text")).as("v"))
      .head().getSeq[Double](0).toArray
    assert(local.length == 64 && viaSpark.length == 64)
    local.zip(viaSpark).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    val norm = math.sqrt(local.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
  }

  test("embedLocal on empty/whitespace text is the zero vector, not NaN") {
    for (t <- Seq("", "   ", "\t\n")) {
      val v = TextEmbed.embedLocal(t)
      assert(v.length == 64 && v.forall(_ == 0.0), s"'$t' -> ${v.take(3).toSeq}")
    }
    // matches the kernel's empty-token behavior exactly
    val kernel = graft.functions.TextKernels
      .embed(org.apache.spark.unsafe.types.UTF8String.fromString(""), 64)
    assert(kernel.forall(_ == 0.0))
  }
}

class CrudSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def store = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("insert/delete/update/get/list/count round-trip") {
    val ins = VectorStore.insert(store, Seq((4L, "d")).toDF("id", "v"))
    assert(VectorStore.count(ins) == 4)
    val del = VectorStore.delete(ins, "id", Seq(Tuple1(2L)).toDF("id"))
    assert(del.select("id").as[Long].collect().sorted.sameElements(Array(1L, 3L, 4L)))
    val upd = VectorStore.update(del, "id", Seq((3L, "z")).toDF("id", "v"))
    assert(VectorStore.get(upd, "id", 3L).head().getString(1) == "z")
    assert(VectorStore.listIds(upd, "id").as[Long].collect().length == 3)
  }

  test("randomVectors: deterministic, seeded, right shape") {
    val a = VectorStore.randomVectors(spark, 10, 8).collect()
    val b = VectorStore.randomVectors(spark, 10, 8).collect()
    assert(a.length == 10)
    assert(a.head.getSeq[Float](1).length == 8)
    assert(a.map(_.getSeq[Float](1)).toSeq == b.map(_.getSeq[Float](1)).toSeq)
    val c = VectorStore.randomVectors(spark, 10, 8, seed = 7L).collect()
    assert(a.head.getSeq[Float](1) != c.head.getSeq[Float](1))
    assert(a.flatMap(_.getSeq[Float](1)).forall(v => v >= -0.5f && v < 0.5f))
  }

  test("parquet save/load round-trip preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vs").toString
    VectorStore.save(store, s"$dir/t")
    val back = VectorStore.load(spark, s"$dir/t")
    assert(back.orderBy("id").collect().toSeq == store.orderBy("id").collect().toSeq)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Seq(
    Multimodal.MediaRow(1L, "image/fake", Array.tabulate[Byte](256)(_.toByte)),
    Multimodal.MediaRow(2L, "audio/fake", Array.tabulate[Byte](100)(i => (i * 3).toByte))
  ).toDS()

  test("featurize: deterministic features with the declared shape") {
    val f = Multimodal.featurize(media, dim = 16).collect().sortBy(_.media_id)
    assert(f.length == 2)
    assert(f.forall(_.features.length == 16))
    assert(f(0).byte_len == 256 && f(1).byte_len == 100)
    val again = Multimodal.featurize(media, dim = 16).collect().sortBy(_.media_id)
    assert(f.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize + frame sampling keep the column contracts") {
    val resized = Multimodal.resizePayload(media.toDF(), "payload", 64)
    assert(resized.select("payload").as[Array[Byte]].collect().forall(_.length == 64))
    val frames = Multimodal.sampleFrames(media, chunkBytes = 32, everyNth = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame"))
    assert(frames.where($"media_id" === 1L).count() == 4) // 8 chunks, every 2nd
  }

  // ---- REAL codecs (pure JDK: javax.imageio / javax.sound.sampled) ----

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("cdcChunks: chunks concatenate back to the payload; minLen respected") {
    val payload = Array.tabulate[Byte](500)(i => ((i * 37 + 11) % 251).toByte)
    val df = Seq(Tuple1(payload)).toDF("p")
    val chunks = df
      .select(explode(Multimodal.cdcChunks(col("p"), minLen = 8, modulus = 16L)))
      .as[Array[Byte]].collect()
    assert(chunks.map(_.length).sum == 500)
    assert(chunks.flatten.sameElements(payload))
    // all chunks except possibly the tail respect minLen
    assert(chunks.dropRight(1).forall(_.length >= 8), chunks.map(_.length).toSeq)
  }

  test("cdcChunks: one inserted byte damages ~one chunk; fixed windows shift everything") {
    val base = Array.tabulate[Byte](500)(i => ((i * 37 + 11) % 251).toByte)
    val edited = (base.take(250) :+ 0x58.toByte) ++ base.drop(250)
    def digests(p: Array[Byte]) =
      Seq(Tuple1(p)).toDF("p")
        .select(explode(Multimodal.cdcChunks(col("p"), minLen = 8, modulus = 16L)).as("c"))
        .select(md5(col("c"))).as[String].collect().toSet
    val a = digests(base); val b = digests(edited)
    // sliding-window boundaries re-synchronize ≥30 bytes after the
    // edit: most digests survive
    assert((a & b).size >= a.size - 3, s"shared=${(a & b).size} of ${a.size}")
    // fixed 32-byte windows lose every chunk after the edit point
    def fixed(p: Array[Byte]) =
      p.grouped(32).map(c => java.util.Arrays.hashCode(c)).toSet
    val fa = fixed(base); val fb = fixed(edited)
    assert((fa & fb).size <= fa.size / 2 + 1,
      s"fixed shared=${(fa & fb).size} of ${fa.size}")
  }

  test("featurizeImages decodes real PNGs: dimensions + channel means") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", pngBytes(8, 4, 0xff0000)),  // red
      Multimodal.MediaRow(2L, "image/png", pngBytes(3, 3, 0x102030)),
      Multimodal.MediaRow(3L, "application/junk", Array[Byte](1, 2, 3))
    ).toDS()
    val f = Multimodal.featurizeImages(rows).collect().sortBy(_.media_id)
    assert(f.length == 2, "undecodable payload must be dropped")
    assert(f(0).width == 8 && f(0).height == 4)
    assert(f(0).mean_r == 255f && f(0).mean_g == 0f && f(0).mean_b == 0f)
    assert(f(1).mean_r == 0x10.toFloat && f(1).mean_g == 0x20.toFloat &&
      f(1).mean_b == 0x30.toFloat)
  }

  test("resizeImage really resizes: output decodes at the target size") {
    val rows = Seq(Multimodal.MediaRow(1L, "image/png",
      pngBytes(8, 8, 0x00ff00))).toDS()
    val out = Multimodal.resizeImage(rows, 4, 2).collect()
    assert(out.length == 1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).payload))
    assert(img.getWidth == 4 && img.getHeight == 2)
    // solid green stays solid green through a bilinear resize
    assert((img.getRGB(1, 1) & 0xffffff) == 0x00ff00)
  }

  private def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal-but-realistic MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih},
    * JUNK, LIST(movi){ 00dc... } } with word-aligned chunks — enough
    * structure that the parser must actually skip non-movi content.
    */
  private def mjpegAviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ u32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ inner)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val junk = chunk("JUNK", Array.fill[Byte](13)(0x5a))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ junk ++ movi
    bos.write("RIFF".getBytes("ISO-8859-1")); bos.write(u32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  test("extractMjpegFrames: real RIFF walk + JPEG decode, every-nth kept") {
    val frames = Seq(jpegBytes(8, 6, 0xff0000), jpegBytes(8, 6, 0x00ff00),
      jpegBytes(8, 6, 0x0000ff), jpegBytes(8, 6, 0x808080))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video/x-msvideo", mjpegAviBytes(frames)),
      Multimodal.MediaRow(2L, "video/mp4", Array[Byte](0, 0, 0, 32, 'f', 't', 'y', 'p')),
      Multimodal.MediaRow(3L, "application/junk", Array[Byte](1, 2))
    ).toDS()
    val all = Multimodal.extractMjpegFrames(rows).collect().sortBy(_.frame_no)
    assert(all.map(_.media_id).distinct.toSeq == Seq(1L),
      "non-AVI payloads must yield no rows")
    assert(all.length == 4 && all.map(_.frame_no).toSeq == Seq(0, 1, 2, 3))
    assert(all.forall(f => f.width == 8 && f.height == 6))
    // frame payloads are the container's own JPEG bytes, byte-exact
    assert(all.head.jpeg.sameElements(frames.head))
    // a JPEG decoded from frame 0 is predominantly red (lossy codec:
    // exact channel equality is not guaranteed, dominance is)
    val img0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(all.head.jpeg))
    val p = img0.getRGB(4, 3)
    assert(((p >> 16) & 0xff) > 200 && ((p >> 8) & 0xff) < 80 && (p & 0xff) < 80)
    val sampled = Multimodal.extractMjpegFrames(rows, everyNth = 2).collect()
    assert(sampled.map(_.frame_no).sorted.toSeq == Seq(0, 2))
  }

  test("mjpegFrameChunks: truncated tail ends the walk, no throw") {
    val good = mjpegAviBytes(Seq(jpegBytes(4, 4, 0x123456), jpegBytes(4, 4, 0x654321)))
    // chop mid-way through the second frame chunk
    val truncated = good.take(good.length - 10)
    val got = Multimodal.mjpegFrameChunks(truncated)
    assert(got.length == 1, "the complete first frame survives")
    assert(Multimodal.mjpegFrameChunks(Array[Byte]()).isEmpty)
    assert(Multimodal.mjpegFrameChunks("RIFFxxxxWAVE".getBytes("ISO-8859-1")).isEmpty)
  }

  test("featurizeWav decodes real WAV PCM: frames, rate, rms, crossings") {
    // a +1000/-1000 square wave: rms = 1000, one crossing per flip
    val square = Array.tabulate[Short](100)(i => if ((i / 10) % 2 == 0) 1000 else -1000)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", wavBytes(square, 8000)),
      Multimodal.MediaRow(2L, "application/junk", Array[Byte](9, 9, 9))
    ).toDS()
    val f = Multimodal.featurizeWav(rows).collect()
    assert(f.length == 1, "non-WAV payload must be dropped")
    assert(f(0).frames == 100L && f(0).sample_rate == 8000f)
    assert(math.abs(f(0).rms - 1000f) < 0.5f)
    assert(f(0).zero_crossings == 9) // 10 blocks -> 9 sign flips
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.streaming.EventStream

  test("watermarked windowed agg over a parquet stream (memory sink)") {
    val stream = EventStream.readStream(spark, "/root/testdata/sf0.001")
    val agg = EventStream.windowedCounts(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT count(*) FROM win_out").head().getLong(0)
      assert(rows > 0)
      // cross-check one bucket against the batch path
      val batch = SparkEntry.queries("events_window")(spark, "/root/testdata/sf0.001")
        .agg(sum("n")).head().getLong(0)
      val streamed = spark.sql("SELECT sum(n) FROM win_out").head().getLong(0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup emits exactly the distinct digests") {
    import org.apache.spark.sql.functions._
    val got = EventStream.dedupDistinctBatchDrain(spark, "/root/testdata/sf0.001")
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(md5(col("text")).as("h")).distinct()
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0)
  }

  test("dropDuplicatesWithinWatermark bounds dedup state on a live stream") {
    import org.apache.spark.sql.functions._
    // two identical streams unioned = every event arrives twice; the
    // watermarked dedup must let each event_id through exactly once
    // while keeping only watermark-deep state (the continuous-ingest
    // form of the streaming_dedup query's unbounded-state dropDuplicates)
    val s1 = EventStream.readStream(spark, "/root/testdata/sf0.001")
    val s2 = EventStream.readStream(spark, "/root/testdata/sf0.001")
    val deduped = s1.unionAll(s2)
      .withColumn("event_ts", EventStream.tsCol)
      .withWatermark("event_ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedup_wm_out").head().getLong(0)
      val expect = Tables.load(spark, "/root/testdata/sf0.001", "events").count()
      assert(n == expect, s"streamed $n != batch $expect")
    } finally q.stop()
  }

  test("sessionize groups events by gap") {
    import spark.implicits._
    val ev = Seq(
      EventStream.Event(1L, 0L, 1.0), EventStream.Event(1L, 10L, 2.0),
      EventStream.Event(1L, 500L, 3.0), // gap > 300 -> new session
      EventStream.Event(2L, 5L, 4.0)
    ).toDS()
    val sessions = EventStream.sessionize(ev, gapUs = 300L).collect()
    // streaming semantics: the still-open session per user stays in
    // state, so only the *closed* session for user 1 is emitted
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 1L && s.nEvents == 2L && s.totalValue == 3.0)
  }
}
