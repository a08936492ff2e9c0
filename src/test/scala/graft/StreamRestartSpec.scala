package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Checkpoint-restart recovery: the contract that makes a streaming
  * ingest operable on a real cluster. Both tests stop a query, start a
  * NEW query from the same checkpoint + sink, and assert the resumed
  * run behaves as if the stop never happened:
  *
  *  1. dropDuplicates state — duplicates arriving AFTER the restart of
  *     rows seen BEFORE it are still suppressed (state restored, not
  *     rebuilt empty), and the parquet sink's metadata log keeps the
  *     output exactly-once.
  *  2. watermarked windowed aggregation — windows OPENED before the
  *     stop finalize correctly after restart once the watermark
  *     passes them (agg state + watermark both recovered).
  */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val H = 3600L * 1000000L // one hour in micros

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_restart").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    try go(new java.io.File(path)) catch { case _: Throwable => () }
  }

  private def evDf(rows: Seq[(Long, Long)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (id, us) => (id, us * 1000L, id, "a", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("dropDuplicates state survives restart; file sink stays exactly-once") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = tmpDir()
    try {
      val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      def feed(ids: Range): Unit =
        ids.map(i => (i.toLong, s"doc-$i"))
          .toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in)
      def run(): Unit = {
        val q = spark.readStream
          .schema("doc_id LONG, text STRING").parquet(s"$in/*.parquet")
          .select(md5(col("text")).as("h"))
          .dropDuplicates("h")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out).start()
        try q.processAllAvailable() finally q.stop()
      }
      feed(0 until 100)
      run()
      // restart: 50..149 overlaps 50 already-seen rows, which only the
      // RESTORED state can suppress
      feed(50 until 150)
      run()
      val got = spark.read.parquet(out).as[String].collect().sorted.toSeq
      val want = (0 until 150).map(i => s"doc-$i").toDF("text")
        .select(md5(col("text")).as("h"))
        .as[String].collect().distinct.sorted.toSeq
      assert(got === want) // no losses, no duplicates across the restart
    } finally rm(tmp)
  }

  test("windows opened before a restart finalize correctly after it") {
    val tmp = tmpDir()
    try {
      val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      def feed(df: DataFrame): Unit =
        df.coalesce(1).write.mode("append").parquet(in)
      def run(): Unit = {
        val q = EventStream.lateAgg(
            spark.readStream.schema(EventStream.schema)
              .parquet(s"$in/*.parquet"), "2 hours")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out).start()
        try q.processAllAvailable() finally q.stop()
      }
      // phase 1: three windows open, none finalized (watermark 2h
      // behind the 2.5h max), then STOP
      feed(evDf(Seq((1L, H / 2), (2L, 3 * H / 2), (3L, 5 * H / 2))))
      run()
      // nothing finalized yet (an all-empty sink dir can also fail
      // schema inference — treat that as zero rows)
      val n0 = try spark.read.parquet(out).count()
        catch { case _: Throwable => 0L }
      assert(n0 === 0L)
      // phase 2 (new query, same checkpoint): late row into the
      // still-open [0,1) window, plus a sentinel that pushes the
      // watermark past every real window
      feed(evDf(Seq((4L, H / 4), (5L, 100L * H))))
      run()
      val got = spark.read.parquet(out)
        .select((unix_timestamp(col("window.start")) / 3600L).cast("long"),
          col("n_stream"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // [0,1) counts BOTH its pre-stop row and the post-restart late
      // row (watermark recovered as 0.5h, window still open); the
      // sentinel window at hour 100 never finalizes
      assert(got === Seq((0L, 2L), (1L, 1L), (2L, 1L)))
    } finally rm(tmp)
  }
}
