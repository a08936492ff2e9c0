package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

class AnnScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("native lsh_signature == HOF composition on the corpus") {
    val e = Tables.load(spark, sf, "embeddings")
    val diff = e.select(
        Ann.lshSignature(col("embedding"), 8).as("k"),
        Ann.lshSignatureHof(col("embedding"), 8).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diff == 0)
  }

  test("lsh_signature runs codegen'd (plan shows *(1))") {
    val e = Tables.load(spark, sf, "embeddings")
    val plan = e.select(Ann.lshSignature(col("embedding")).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [lsh_signature"), plan)
  }

  test("appendToIvf: new vectors land in their nearest cluster, no retrain") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    val newRows = graft.sources.VectorStore.randomVectors(spark, 10, 64, seed = 9L)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val appended = Ann.appendToIvf(tagged, centroids, newRows, "vec_id", "embedding")
    assert(appended.count() == e.count() + 10)
    assert(appended.where(col("vec_id") >= 10000L)
      .select("cluster").distinct().count() >= 1)
  }

  test("IVF written partitionBy(cluster): probe scans only nprobe partitions") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    // the at-rest layout for 100 TB: one parquet partition per cluster
    tagged.write.partitionBy("cluster").parquet(s"$dir/ivf")
    centroids.write.parquet(s"$dir/centroids")

    val back = spark.read.parquet(s"$dir/ivf")
    val cents = spark.read.parquet(s"$dir/centroids")
    val q = Tables.load(spark, sf, "embeddings")
      .where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val res = Ann.searchIvf(back, cents, q,
      "vec_id", "embedding", "cosine", 10, nprobe = 2)

    // correctness: query vector found at distance 0
    val rows = res.collect()
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 0.0)

    // scale proof: the scan is partition-pruned to the probed clusters
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cluster"),
      s"no partition pruning in plan:\n$plan")
  }
}
