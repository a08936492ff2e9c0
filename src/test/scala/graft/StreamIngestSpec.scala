package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann
import graft.streaming.EventStream

/** Streaming index maintenance: vectors arrive as a stream and each
  * micro-batch is appended to a live at-rest IVF index by
  * assignment-only insert (Ann.appendToIvf inside foreachBatch) — the
  * ingest half of a continuously-updated vector store. The batch
  * operators ARE the streaming operators; foreachBatch is just the
  * delivery loop, so correctness reduces to "streamed ingest ==
  * one-shot batch build with the same centroids", asserted here.
  */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("foreachBatch appendToIvf equals the one-shot batch tagging") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
      .localCheckpoint(true)

    // at-rest store starts with the first half of the corpus
    val dir = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    val store = s"$dir/tagged"
    Ann.tagCorpus(e.where(col("vec_id") % 2 === 0), "vec_id", "embedding", cents)
      .write.mode("overwrite").parquet(store)

    // the other half arrives as a stream of parquet files
    val incoming = s"$dir/incoming"
    val half = e.where(col("vec_id") % 2 === 1)
    half.write.mode("overwrite").parquet(incoming)

    val q = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "1") // several micro-batches
      .parquet(s"$incoming/*.parquet")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tagged = spark.read.parquet(store)
        Ann.appendToIvf(tagged, cents, batch, "vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$store.next")
        // atomic-ish swap for the test; production would write
        // partitionBy(cluster) deltas instead of rewriting
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$store.next"),
          new org.apache.hadoop.fs.Path(store))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(store)
    val oneShot = Ann.tagCorpus(e, "vec_id", "embedding", cents)
    assert(streamed.count() == e.count())
    assert(streamed.except(oneShot).isEmpty &&
      oneShot.except(streamed).isEmpty,
      "streamed ingest must equal the one-shot batch build")
  }

  test("foreachBatch graph appendBatch equals the same appends in arrival order") {
    import graft.operators.KnnGraph
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count()
    val cut1 = n - 2 * math.max(1L, n / 16L)
    val cut2 = n - math.max(1L, n / 16L)
    def asBatch(df: DataFrame): DataFrame = df
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        Ann.lshSignature(col("embedding"), 8).as("qbucket"))
    def appended(b: KnnGraph.Build, batch: DataFrame): KnnGraph.Build = {
      val app = KnnGraph.appendBatch(b, batch, degree = 16)
      KnnGraph.Build(Seq(app.graph),
        b.vecs.unionByName(batch.select(col("qid").as("id"),
          col("qv").as("v"), col("qbucket").as("bucket"))),
        b.n + batch.count())
    }
    // the at-rest store starts with the dense base prefix
    val dir = java.nio.file.Files.createTempDirectory("graph_ingest").toString
    val store = s"$dir/graph"
    val base = KnnGraph.nnDescentBuild(
      e.where(col("vec_id") < cut1), "vec_id", "embedding", 16)
    KnnGraph.writeIndex(base, store)
    // two ingest batches arrive as a stream, one file per micro-batch;
    // explicit mtimes pin the file-source arrival ORDER (graph append
    // is order-dependent, unlike the IVF assignment-only insert)
    val incoming = s"$dir/incoming"
    new java.io.File(incoming).mkdirs()
    Seq((cut1, cut2, "b1"), (cut2, n, "b2")).zipWithIndex.foreach {
      case ((lo, hi, nm), i) =>
        val sub = s"$incoming/$nm"
        e.where(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("overwrite").parquet(sub)
        new java.io.File(sub).listFiles().foreach(f =>
          f.setLastModified(1000000L + i * 60000L))
    }
    val q = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$incoming/*/*.parquet")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val cur = KnnGraph.loadIndex(spark, store)
          val next = appended(cur, asBatch(batch).localCheckpoint(true))
          KnnGraph.writeIndex(
            KnnGraph.Build(Seq(next.rounds.last.localCheckpoint(true)),
              next.vecs.localCheckpoint(true), next.n),
            s"$store.next")
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(store), true)
          fs.rename(new org.apache.hadoop.fs.Path(s"$store.next"),
            new org.apache.hadoop.fs.Path(store))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // reference: the SAME two appends applied sequentially in batch
    // order, no streaming machinery
    val ref = appended(appended(base,
        asBatch(e.where(col("vec_id") >= cut1 && col("vec_id") < cut2))),
      asBatch(e.where(col("vec_id") >= cut2)))
    val streamed = KnnGraph.loadIndex(spark, store)
    assert(streamed.n === n)
    def edges(g: DataFrame) = g.select(col("src"), col("dst"), col("d_e4"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges(streamed.rounds.last) === edges(ref.rounds.last),
      "streamed graph ingest must equal the same appends in arrival order")
  }

  test("searchIvfBatch per-query results equal single-query searchIvf") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val tagged = Ann.tagCorpus(e, "vec_id", "embedding", cents)
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Ann.searchIvfBatch(tagged, cents, queries,
        "vec_id", "embedding", "cosine", k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    (0L until 5L).foreach { qid =>
      val single = Ann.searchIvf(tagged, cents,
          e.where(col("vec_id") === qid).select(col("embedding").as("qvec")),
          "vec_id", "embedding", "cosine", 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid).sortBy(t => (t._2, t._1)) == single,
        s"qid $qid batch != single")
    }
  }

  test("streaming search drain equals the batch probe of the query set") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.SearchStream
      .searchBatchDrain(spark, sf, nQueries = 10, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e = Tables.load(spark, sf, "embeddings")
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val tagged = Ann.tagCorpus(e, "vec_id", "embedding", cents)
    val batch = Ann.searchIvfBatch(tagged, cents,
        e.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "vec_id", "embedding", "cosine", k = 10, nprobe = 2)
      .orderBy(col("qid"), col("dist"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch)
  }

  test("streaming graph serve equals one static search over the persisted graph") {
    val sf = "/root/testdata/sf0.001"
    val idxDir = graft.operators.GraphIndexCache
      .ensurePath(new java.io.File(sf).getCanonicalPath + ":spec-serve", 16)(
        Tables.load(spark, sf, "embeddings"))
    val streamed = graft.streaming.SearchStream
      .graphServeDrain(spark, sf, idxDir, nQueries = 10, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(streamed.nonEmpty)
    // static reference: fresh build, same count-derived budgets
    val e = Tables.load(spark, sf, "embeddings")
    val build = graft.operators.KnnGraph
      .nnDescentBuild(e, "vec_id", "embedding", 16)
    val qs = build.vecs.where(col("id") < 10)
      .select(col("id").as("qid"), col("v").as("qv"),
        col("bucket").as("qbucket"))
    val static0 = graft.operators.KnnGraph
      .beamSearch(build.rounds.last, build.vecs, qs, build.n, k = 8)
      .orderBy(col("qid"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(streamed == static0)
  }
}
