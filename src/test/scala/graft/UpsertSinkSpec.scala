package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.UpsertSink

/** Exactly-once EFFECT from at-least-once foreachBatch delivery: the
  * UpsertSink contract. Replays (same batch, same batchId) and
  * restarts must leave the keyed store exactly as if each batch were
  * applied once, in batchId order.
  */
class UpsertSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_upsert").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    try go(new java.io.File(path)) catch { case _: Throwable => () }
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("id", "v")
  }

  private def state(dir: String): Seq[(Long, String)] = {
    val spark2 = spark
    import spark2.implicits._
    UpsertSink.read(spark, dir, "id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
  }

  test("replayed batchId is idempotent; later batch wins per key") {
    val dir = tmpDir()
    try {
      UpsertSink.commit(dir, df(Seq(1L -> "a", 2L -> "b")), 0L)
      UpsertSink.commit(dir, df(Seq(2L -> "B", 3L -> "c")), 1L)
      // crash replay: batch 1 re-delivered verbatim
      UpsertSink.commit(dir, df(Seq(2L -> "B", 3L -> "c")), 1L)
      assert(state(dir) === Seq(1L -> "a", 2L -> "B", 3L -> "c"))
    } finally rm(dir)
  }

  test("compacted base equals the live read; compact is idempotent") {
    val dir = tmpDir(); val out = tmpDir()
    try {
      UpsertSink.commit(dir, df(Seq(1L -> "a", 2L -> "b")), 0L)
      UpsertSink.commit(dir, df(Seq(1L -> "A")), 1L)
      UpsertSink.compact(spark, dir, out, "id")
      UpsertSink.compact(spark, dir, out, "id") // rerun = same output
      assert(state(out) === Seq(1L -> "A", 2L -> "b"))
      assert(state(out) === state(dir))
    } finally { rm(dir); rm(out) }
  }

  test("seeded random schedules with replays match a reference fold") {
    // 5 deterministic scenarios: random keyed batches, random replay
    // positions — the sink state must equal a plain Map fold applied
    // once per batchId in order, whatever the replay schedule did
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      val dir = tmpDir()
      try {
        val nBatches = 2 + rnd.nextInt(4)
        val batches = (0 until nBatches).map { bid =>
          bid.toLong -> Seq.fill(1 + rnd.nextInt(6))(
            rnd.nextInt(8).toLong -> s"b$bid-v${rnd.nextInt(100)}")
            .distinctBy(_._1)
        }
        // delivery schedule: each batch once, then random replays
        val schedule = batches ++ Seq.fill(rnd.nextInt(3))(
          batches(rnd.nextInt(nBatches)))
        schedule.foreach { case (bid, rows) =>
          UpsertSink.commit(dir, df(rows), bid)
        }
        val want = batches.sortBy(_._1)
          .foldLeft(Map.empty[Long, String]) { case (m, (_, rows)) =>
            m ++ rows.toMap
          }.toSeq.sortBy(_._1)
        assert(state(dir) === want)
      } finally rm(dir)
    }
  }

  test("reserved-column payload rejected; empty store is explicit") {
    val dir = tmpDir()
    try {
      // a payload already carrying the partition column would be
      // ambiguous/overwritten on read — commit refuses it
      val bad = df(Seq(1L -> "a"))
        .withColumn(UpsertSink.BatchCol, lit(9L))
      val e = intercept[IllegalArgumentException] {
        UpsertSink.commit(dir, bad, 0L)
      }
      assert(e.getMessage.contains(UpsertSink.BatchCol))
      // reading a store with no committed batch is a clear error,
      // not a parquet path-resolution crash
      val e2 = intercept[IllegalArgumentException] {
        UpsertSink.read(spark, dir, "id")
      }
      assert(e2.getMessage.contains("no committed batch"))
    } finally rm(dir)
  }

  test("read ignores a batch directory without its _SUCCESS marker") {
    val dir = tmpDir()
    try {
      UpsertSink.commit(dir, df(Seq(1L -> "a", 2L -> "b")), 0L)
      UpsertSink.commit(dir, df(Seq(2L -> "B")), 1L)
      // simulate an in-flight overwrite of batch 1: marker gone
      val marker = new java.io.File(
        s"$dir/${UpsertSink.BatchCol}=1/_SUCCESS")
      assert(marker.exists())
      assert(marker.delete())
      assert(state(dir) === Seq(1L -> "a", 2L -> "b"))
    } finally rm(dir)
  }

  test("streaming restart through foreachBatch leaves exactly-once state") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = tmpDir()
    try {
      val in = s"$tmp/in"; val store = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
      def feed(ids: Range, tag: String): Unit =
        ids.map(i => (i.toLong, s"$tag-$i")).toDF("id", "v")
          .coalesce(1).write.mode("append").parquet(in)
      def run(): Unit = {
        val q = spark.readStream.schema("id LONG, v STRING")
          .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, bid: Long) =>
            UpsertSink.commit(store, b, bid)
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      feed(0 until 10, "v1")
      run()
      feed(5 until 15, "v2") // overlapping keys arrive as an update
      run()                  // NEW query, same checkpoint
      val got = state(store)
      val want = ((0 until 5).map(i => i.toLong -> s"v1-$i") ++
        (5 until 15).map(i => i.toLong -> s"v2-$i")).sortBy(_._1)
      assert(got === want)
    } finally rm(tmp)
  }

  test("commit writes _SUCCESS itself even with marksuccessfuljobs off") {
    // read()'s gate and commit()'s replay no-op both key off _SUCCESS;
    // if only the Hadoop committer wrote it, flipping
    // marksuccessfuljobs=false would make every good batch invisible
    val dir = tmpDir()
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get(key)
    try {
      hc.set(key, "false")
      UpsertSink.commit(dir, df(Seq(1L -> "a")), 0L)
      assert(new java.io.File(
        s"$dir/${UpsertSink.BatchCol}=0/_SUCCESS").exists())
      assert(state(dir) === Seq(1L -> "a"))
    } finally {
      if (prev == null) hc.unset(key) else hc.set(key, prev)
      rm(dir)
    }
  }
}
