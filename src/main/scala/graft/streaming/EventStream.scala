package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the events table.
  *
  * The reference engine has no stream processing; this is part of the
  * pipeline layer a 100 TB ingest needs: watermarked windowed
  * aggregation (late data bounded, state evictable) and custom
  * session state via flatMapGroupsWithState. Batch parquet drives the
  * same code in tests through readStream + memory sink.
  */
object EventStream {

  /** events.parquet schema, with ts as raw TIMESTAMP(NANOS) long
    * (see Tables.load) — readStream needs the schema up front.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob, not bare file: FileStreamSource requires a directory-like
    // path for basePath inference
    spark.readStream.schema(schema).parquet(s"$sfDir/events.*")
  }

  private val memSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Runs the watermarked windowed aggregation AS A STREAM (memory
    * sink, complete mode, drained synchronously) and returns the
    * result — the oracle-checked `streaming_window` query goes through
    * here, so streaming execution itself is gated against DuckDB.
    */
  def windowedCountsBatchDrain(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val name = s"graft_stream_win_${memSinkId.incrementAndGet()}"
    val q = windowedCounts(readStream(spark, sfDir), "1 hour", "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // 1h tumbling windows align to epoch hours -> same buckets as the
    // batch events_window query
    spark.table(name).select(
      (unix_timestamp(col("window.start")) / 3600L).cast("long").as("hour_bucket"),
      col("event_type"), col("n"),
      round(col("total"), 2).as("total"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** documents.parquet schema for the streaming dedup path. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming exact dedup: the ingest-side twin of Dedup.exactGroups.
    * Documents stream in, each emits its content digest, and streaming
    * `dropDuplicates` lets only first-seen digests through — the
    * dedup-on-arrival pattern of a training-data ingest. Projecting to
    * the digest BEFORE dropDuplicates keeps the emitted row
    * deterministic (which duplicate arrives first is not).
    *
    * State note: keyed by digest with no watermark, state grows with
    * distinct documents — correct for a bounded backfill; a 100 TB
    * continuous ingest bounds it with `dropDuplicatesWithinWatermark`
    * on an arrival-time column (spec-demonstrated on events) at the
    * cost of only deduping within the watermark horizon.
    */
  def dedupDistinctBatchDrain(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_stream_dedup_${memSinkId.incrementAndGet()}"
    val q = spark.readStream.schema(docSchema).parquet(s"$sfDir/documents.*")
      .select(md5(col("text")).as("h"))
      .dropDuplicates("h")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("h"))
  }

  /** Exact nanos -> timestamp without a double round-trip ("/" would
    * promote to double; `div` stays integral). */
  def tsCol: org.apache.spark.sql.Column = expr("timestamp_micros(ts div 1000)")

  /** Stream-STREAM interval join executed as a real stream: each
    * click joined to the same user's purchases in the preceding
    * `lookbackHours` — the two-stream correlation op (attribution
    * joins, feature lookback). Both sides carry watermarks and the
    * join condition bounds event time on BOTH ends, so Spark evicts
    * join state once the watermark passes `lookbackHours + watermark`
    * — state stays bounded on an unbounded stream, the property that
    * makes this runnable on a 100 TB/day ingest. Inner join + append
    * mode: rows emit exactly once.
    *
    * Timestamps are exact micros (timestamp_micros(ts div 1000)), so
    * the interval arithmetic matches the DuckDB oracle's integer
    * epoch_us comparison bit for bit.
    */
  def intervalJoinBatchDrain(spark: SparkSession, sfDir: String,
      lookbackHours: Int = 6, statePartitions: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_ij_${memSinkId.incrementAndGet()}"
    // state-store partitioning is frozen into the checkpoint at first
    // run, so unlike batch shuffles AQE can never re-size it — choose
    // it from expected per-trigger volume up front (a few thousand
    // rows/trigger does not need 32 stores x 2 join sides writing
    // delta files every micro-batch; a 100 TB/day ingest does)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try intervalJoinBatchDrainImpl(spark, sfDir, lookbackHours, name)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def intervalJoinBatchDrainImpl(spark: SparkSession, sfDir: String,
      lookbackHours: Int, name: String): DataFrame = {
    val clicks = readStream(spark, sfDir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        tsCol.as("c_ts"))
      .withWatermark("c_ts", "12 hours")
    val purchases = readStream(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        tsCol.as("p_ts"), col("value"))
      .withWatermark("p_ts", "12 hours")
    val q = clicks.join(purchases,
        col("c_uid") === col("p_uid") &&
          col("p_ts") >= col("c_ts") - expr(s"INTERVAL $lookbackHours HOURS") &&
          col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("purchase_id"),
        round(col("value"), 4).as("value"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("click_id"), col("purchase_id"))
  }

  /** Tumbling-window counts with a watermark: state for a window is
    * dropped once the watermark passes, so executor state stays
    * bounded no matter how long the stream runs.
    */
  def windowedCounts(
      events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withColumn("event_ts", tsCol)
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  case class Event(user_id: Long, tsUs: Long, value: Double)
  case class Session(user_id: Long, nEvents: Long, totalValue: Double,
      startUs: Long, endUs: Long)

  /** Gap-based sessionization with explicit state (exact integer
    * microseconds). Emits a session when `gapUs` elapses between a
    * user's consecutive events; the still-open session stays in
    * GroupState (per-key, partitioned by user_id — scales
    * horizontally with executors).
    */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Session]) =>
          val sorted = it.toSeq.sortBy(_.tsUs)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur = state.getOption.orNull
          for (e <- sorted) {
            if (cur == null) {
              cur = Session(uid, 1L, e.value, e.tsUs, e.tsUs)
            } else if (e.tsUs - cur.endUs > gapUs) {
              out += cur
              cur = Session(uid, 1L, e.value, e.tsUs, e.tsUs)
            } else {
              cur = cur.copy(nEvents = cur.nEvents + 1,
                totalValue = cur.totalValue + e.value, endUs = e.tsUs)
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }
}
