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

  test("rp_project: plane rows never alias at any supported width") {
    // With the former p*64 stride, plane p+1 was plane p shifted by
    // 64 positions for inputs wider than 64 dims — components were
    // not independent and the JL bound silently failed on lag-64
    // autocorrelated embeddings. The MaxDim stride makes every
    // stream index (p, j) unique: p*MaxDim + j + 1 collides across
    // planes only if MaxDim <= j, which checkInputDataTypes can
    // never see — pin the arithmetic here.
    val M = graft.functions.RpKernels.MaxDim
    assert(M >= 2048)
    val idx = for (p <- 0 until 16; j <- 0 until M) yield p * M + j + 1
    assert(idx.distinct.length == idx.length)
    // and the kernel really reads that stream: component 1 of a
    // one-hot vector at dim j equals the plane entry at 1*M + j + 1
    val j0 = 100
    val oneHot = Array.fill(M / 2)(0.0f).updated(j0, 1.0f)
    val out = graft.functions.RpKernels.project(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        oneHot.map(_.asInstanceOf[Any])), isFloat = true, k = 2)
    val expected =
      ((1 * M + j0 + 1) * 2654435761L % 4294967296L) / 4294967296.0 - 0.5
    assert(out.getDouble(1) === expected)
  }

  test("kmeansMulti == kmeans per k: same seeds, ties, centroid snap") {
    // the multi-k chain must be numerically identical to |ks|
    // independent chains — the elbow oracle replays the per-k CTEs,
    // so any divergence (seed rule, tie-break, rounding) fails there
    // at 10x the debugging cost; pin it here directly
    val e = Tables.load(spark, sf, "embeddings")
    val multi = Ann.kmeansMulti(e, "vec_id", "embedding",
        ks = Seq(2, 4, 8), iters = 2, trainSampleMod = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSet
    val single = Seq(2, 4, 8).flatMap { k =>
      Ann.kmeans(e, "vec_id", "embedding", k = k, iters = 2,
          trainSampleMod = 2)
        .collect()
        .map(r => (k, r.getInt(0), r.getSeq[Double](1)))
    }.toSet
    assert(multi === single)
  }

  test("rp_project: inputs wider than MaxDim are rejected, not aliased") {
    // past MaxDim the Weyl-stream index p*MaxDim + j wraps into plane
    // p+1's rows — exactly the aliasing the stride exists to prevent —
    // so the kernel must refuse rather than silently degrade
    val M = graft.functions.RpKernels.MaxDim
    val wide = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill[Any](M + 1)(0.0f))
    val e = intercept[IllegalArgumentException] {
      graft.functions.RpKernels.project(wide, isFloat = true, k = 2)
    }
    assert(e.getMessage.contains(s"up to $M"), e.getMessage)
  }

  test("rp_project: JL mean distance ratio near 1, runs codegen'd") {
    val e = Tables.load(spark, sf, "embeddings").limit(64)
    val proj = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"),
      graft.functions.LshExpr.rp_project(col("embedding"), 16).as("y"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("rp_project"), plan)
    def d2(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, z) -> (x - z) * (x - z)), " +
        "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")
    val r = proj.as("a").join(proj.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select((d2("a.y", "b.y") * 12.0 / (d2("a.v", "b.v") * 16.0)).as("ratio"))
      .agg(avg(col("ratio"))).head.getDouble(0)
    // E[ratio] = 1 under JL; 16 dims is noisy per pair but the mean
    // over ~2k pairs concentrates well inside [0.8, 1.2]
    assert(r > 0.8 && r < 1.2, s"mean JL ratio $r")
  }

  test("multi-table LSH with L=1 degenerates to single-table searchLsh") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val single = Ann.searchLsh(e, q, "vec_id", "embedding", "cosine", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val multi = Ann.searchLshTables(e, q, "vec_id", "embedding", "cosine", 10,
      planesPerTable = 8, numTables = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(single.sameElements(multi))
  }

  test("multi-table LSH candidates are the union of per-table buckets") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    // k large enough to return every candidate: the result set must
    // contain each single-table result set (OR-amplification)
    val all = Ann.searchLshTables(e, q, "vec_id", "embedding", "cosine", 100000,
      planesPerTable = 4, numTables = 4)
      .collect().map(_.getLong(0)).toSet
    // table 0 of the combined signature = plain 4-plane signature
    val t0 = Ann.searchLshTables(e, q, "vec_id", "embedding", "cosine", 100000,
      planesPerTable = 4, numTables = 1)
      .collect().map(_.getLong(0)).toSet
    assert(t0.subsetOf(all))
    assert(all.contains(0L)) // the query vector always matches itself
  }

  test("annJoinLsh: equi-join candidates, partial topk before the exchange") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val res = Ann.annJoinLsh(e, q, "vec_id", "embedding", "qid", "qvec",
      "euclidean", 5)
    val plan = res.queryExecution.executedPlan.toString
    // candidates must come from a hash join on (tbl, bucket), NOT the
    // broadcast nested-loop cross join of the exact knnJoin
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_topk_pairs"), plan)

    // every returned neighbor is a true bucket collision, ranked right
    val rows = res.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(3) <= 5))
    // approximate recall vs the exact batch join on the same queries
    val exact = graft.operators.Knn.knnJoin(e, q, "vec_id", "embedding",
      "qid", "qvec", "euclidean", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.2, s"batch ANN recall $recall vs exact")
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

  test("IVF insert+delete round-trip == fresh build on the same data") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    val fresh = tagged.select(col("vec_id"), col("cluster"))

    val newRows = graft.sources.VectorStore.randomVectors(spark, 10, 64, seed = 9L)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val appended = Ann.appendToIvf(tagged, centroids, newRows, "vec_id", "embedding")
    val afterDelete = Ann.deleteFromIvf(
        appended, "vec_id", newRows.select(col("vec_id")))
      .select(col("vec_id"), col("cluster"))

    assert(afterDelete.count() == e.count())
    assert(afterDelete.exceptAll(fresh).count() == 0)
    assert(fresh.exceptAll(afterDelete).count() == 0)
  }

  test("deleteFromIvf is an anti-join: only doomed ids leave, tags untouched") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, _) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 1)
    val doomed = e.where(col("vec_id") % 7 === 0).select(col("vec_id"))
    val after = Ann.deleteFromIvf(tagged, "vec_id", doomed)
    assert(after.count() == tagged.count() - doomed.count())
    assert(after.where(col("vec_id") % 7 === 0).count() == 0)
    // surviving rows keep their cluster (at-rest partitions stay valid)
    val before = tagged.where(col("vec_id") % 7 =!= 0)
      .select(col("vec_id"), col("cluster"))
    assert(after.select(col("vec_id"), col("cluster"))
      .exceptAll(before).count() == 0)
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
  }

  test("ivfStats: per-cluster counts and shares account for every row") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, _) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 1)
    val stats = Ann.ivfStats(tagged).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == e.count())
    val shareSum = stats.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01)
  }

  test("compactIvf: no-op when balanced, recenter+retag when skewed") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    val tcached = tagged.localCheckpoint(true)

    // balanced index (kmeans on this corpus stays under 0.9): no-op,
    // same DataFrame objects back — zero jobs beyond the stats probe
    val (t2, c2) = Ann.compactIvf(tcached, centroids, "vec_id", "embedding",
      maxShare = 0.9)
    assert((t2 eq tcached) && (c2 eq centroids))

    // churn: delete 90% of every cluster except the largest -> skew
    val sizes = Ann.ivfStats(tcached).collect()
      .map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n")).toMap
    val biggest = sizes.maxBy(_._2)._1
    val doomed = tcached
      .where(col("cluster") =!= biggest && col("vec_id") % 10 =!= 0)
      .select(col("vec_id"))
    val skewed = Ann.deleteFromIvf(tcached, "vec_id", doomed)
      .localCheckpoint(true)
    val shareBefore = Ann.ivfStats(skewed)
      .agg(org.apache.spark.sql.functions.max(col("share"))).head().getDouble(0)
    assert(shareBefore > 0.5, s"setup failed to skew: $shareBefore")

    val (t3, c3) = Ann.compactIvf(skewed, centroids, "vec_id", "embedding",
      maxShare = 0.5, iters = 2)
    assert(t3.count() == skewed.count()) // rebalance loses no rows
    // retag is consistent: every row sits in its argmin cluster
    val expect = Ann.tagCorpus(
      skewed.drop("cluster"), "vec_id", "embedding", c3)
      .select(col("vec_id"), col("cluster"))
    assert(t3.select(col("vec_id"), col("cluster"))
      .exceptAll(expect).count() == 0)
    val shareAfter = Ann.ivfStats(t3)
      .agg(org.apache.spark.sql.functions.max(col("share"))).head().getDouble(0)
    assert(shareAfter <= shareBefore,
      s"compact made skew worse: $shareBefore -> $shareAfter")
  }

  test("IVF written partitionBy(cluster): probe scans only nprobe partitions") {
    val e = Tables.load(spark, sf, "embeddings")
    val (tagged, centroids) = Ann.buildIvf(e, "vec_id", "embedding", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    // the at-rest layout for 100 TB: one parquet partition per cluster
    Ann.writeIndex(tagged, centroids, dir)
    val (back, cents) = Ann.loadIndex(spark, dir)
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

  test("tagCorpus metaCols ride the index; filtered probe == filter-then-search") {
    val e = Tables.load(spark, sf, "embeddings")
    val cents = e.where(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val tagged = Ann.tagCorpus(e, "vec_id", "embedding", cents,
      metaCols = Seq("label"))
    // metadata survived the min_by payload unchanged
    val drift = tagged.join(e.select(col("vec_id"), col("label").as("l0")), "vec_id")
      .where(col("label") =!= col("l0")).count()
    assert(drift == 0)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    // filtering the tagged index inside the probe equals building the
    // index over the pre-filtered corpus (assignment is per-row)
    val a = Ann.searchIvf(tagged.where(col("label") === 3).drop("label"),
      cents, q, "vec_id", "embedding", "cosine", 10, nprobe = 2).collect().toSeq
    val b = Ann.searchIvf(
      Ann.tagCorpus(e.where(col("label") === 3), "vec_id", "embedding", cents),
      cents, q, "vec_id", "embedding", "cosine", 10, nprobe = 2).collect().toSeq
    assert(a == b)
  }
}
