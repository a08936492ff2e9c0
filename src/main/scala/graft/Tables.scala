package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  * Reads are plain parquet scans so Catalyst pushes filters/pruning
  * straight into the scan — the columnar file IS the flat index
  * (reference: /root/reference/pkg/index/flat/flat.go brute-force scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // older generator builds wrote ts as parquet TIMESTAMP(NANOS),
      // which Spark's vectorized reader only accepts as a raw long
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Canonical events contract: `ts` is nanos-since-epoch (long).
    * The generator has emitted three shapes across builds — raw
    * TIMESTAMP(NANOS) (long via nanosAsLong), TIMESTAMP_NTZ micros,
    * and TIMESTAMP_LTZ — so the loader normalizes here ONCE and every
    * downstream bucket/window/as-of computation stays exact integer
    * arithmetic (`ts div 1e9` = epoch seconds), matching the DuckDB
    * oracles' `epoch_us(ts)` (tz-free on naive timestamps).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case _: TimestampNTZType =>
        // NTZ: difference against the NTZ epoch literal — no
        // session-tz cast anywhere, same naive-epoch convention as
        // DuckDB's epoch_us over a naive timestamp
        df.withColumn("ts",
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L))
      case _: TimestampType =>
        // LTZ: unix_micros is tz-free by definition (instant-based)
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: expected long or timestamp, got ${other.catalogString}")
    }
}
