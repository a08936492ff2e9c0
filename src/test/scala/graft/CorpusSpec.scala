package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup}

class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // ---- chunking ----------------------------------------------------------

  test("chunkTokens: chunk i covers tokens [i*stride, i*stride+window)") {
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Corpus.chunkTokens(doc, "text", "doc_id", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // n=10, w=4, s=3 -> nc = ((10-4+2) div 3)+1 = 3 chunks
    assert(rows.map(_.getString(2)).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(rows.map(_.getInt(3)).toSeq == Seq(4, 4, 4))
  }

  test("chunkTokens: short doc yields one short chunk, empty doc none") {
    val docs = Seq((1L, "a b"), (2L, "  "), (3L, "x")).toDF("doc_id", "text")
    val rows = Corpus.chunkTokens(docs, "text", "doc_id", 5, 5)
      .orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "a b"), (3L, "x")))
  }

  test("chunkTokens reconstructs every token when stride == window") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val orig = docs.select(explode(functions.TextFuncs.tokens(col("text"))))
      .count()
    val chunked = Corpus.chunkTokens(docs, "text", "doc_id", 7, 7)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(orig == chunked)
  }

  test("chunkTokens is map-only (no exchange in the plan)") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = Corpus.chunkTokens(docs, "text", "doc_id", 40, 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- packing -----------------------------------------------------------

  test("packSequences: packs partition each group's docs; budgets respected") {
    val docs = Tables.load(spark, sf, "documents")
    val packed = Corpus.packSequences(docs, "text", "doc_id", "source", 256L)
    // every doc appears exactly once
    assert(packed.count() == docs.count())
    // pack start offsets are the running sums: within (source, pack),
    // all starts lie in [pack*256, (pack+1)*256)
    val bad = packed.where(
      col("start") < col("pack_id") * 256 ||
        col("start") >= (col("pack_id") + 1) * 256).count()
    assert(bad == 0)
    // packs 0..max are contiguous per source (concat-and-split leaves no
    // empty pack between occupied ones)
    val gaps = packed.groupBy("source")
      .agg(countDistinct("pack_id").as("n"), max("pack_id").as("mx"))
      .where(col("n") =!= col("mx") + 1).count()
    assert(gaps == 0)
  }

  // ---- sampling ----------------------------------------------------------

  test("hashMod100 is deterministic and uniform-ish") {
    val ids = spark.range(10000).toDF("id")
    val h = ids.select(Corpus.hashMod100(col("id")).as("h"))
    assert(h.where(col("h") < 0 || col("h") > 99).count() == 0)
    val buckets = h.groupBy("h").count()
    assert(buckets.count() == 100)
    // repeated evaluation gives identical assignments
    val again = ids.select(Corpus.hashMod100(col("id")).as("h"))
    assert(h.exceptAll(again).count() == 0)
  }

  test("sampleByRate keeps ~rate% per stratum") {
    val docs = spark.range(10000)
      .select(col("id"), (col("id") % 3).cast("string").as("stratum"))
    val rate = when(col("stratum") === "0", lit(10)).otherwise(lit(50))
    val kept = Corpus.sampleByRate(docs, "id", rate)
      .groupBy("stratum").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // ~3333 ids per stratum; 10% and 50% with hash noise
    assert(kept("0") > 200 && kept("0") < 470, kept)
    assert(kept("1") > 1450 && kept("1") < 1900, kept)
  }

  // ---- decontamination ---------------------------------------------------

  test("decontaminate removes exactly the shingle-sharing docs") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox sat"),   // shares "the quick brown"
      (2L, "a completely different doc here"),
      (3L, "lazy quick brown fox")       // shares "quick brown fox"
    ).toDF("doc_id", "text")
    val cont = Corpus.contaminatedIds(train, bench, "text", "doc_id", 3)
      .as[Long].collect().sorted
    assert(cont.toSeq == Seq(1L, 3L))
    val clean = Corpus.decontaminate(train, bench, "text", "doc_id", 3)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(2L))
  }

  test("docs shorter than k shingle tokens are never contaminated") {
    val bench = Seq((100L, "x y z")).toDF("doc_id", "text")
    val train = Seq((1L, "x y")).toDF("doc_id", "text")
    assert(Corpus.contaminatedIds(train, bench, "text", "doc_id", 3).count() == 0)
  }

  test("bloom-prefiltered contamination == exact, with the filter in the plan") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = docs.where(col("doc_id") % 17 === 0)
    val train = docs.where(col("doc_id") % 17 =!= 0)
    val exact = Corpus.contaminatedIds(train, bench, "text", "doc_id", 3)
      .as[Long].collect().sorted.toSeq
    val bloom = Corpus.contaminatedIdsBloom(train, bench, "text", "doc_id", 3)
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(bloom.as[Long].collect().sorted.toSeq == exact)
  }

  test("bloom contamination with empty benchmark is empty") {
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val train = Seq((1L, "x y z w")).toDF("doc_id", "text")
    assert(Corpus.contaminatedIdsBloom(train, bench, "text", "doc_id", 3).count() == 0)
  }

  // ---- incremental minhash ----------------------------------------------

  test("incremental pairs + old-only pairs == full-recompute pairs") {
    val docs = Tables.load(spark, sf, "documents")
    val oldDocs = docs.where(col("doc_id") % 3 =!= 0)
    val newDocs = docs.where(col("doc_id") % 3 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(Dedup.minhashPairs(docs, "text", "doc_id"))
    val oldOnly = pairSet(Dedup.minhashPairs(oldDocs, "text", "doc_id"))
    val oldSigs = Dedup.minhashSigs(oldDocs, "text", "doc_id")
    val (allSigs, incr) = Dedup.incrementalMinhashPairs(
      oldSigs, newDocs, "text", "doc_id")
    val incrSet = pairSet(incr)
    assert(oldOnly ++ incrSet == full, "increment must complete the pair set")
    assert(incrSet.intersect(oldOnly).isEmpty, "old-old pairs must not re-emit")
    // the returned store is the full signature table for the next run
    assert(allSigs.count() ==
      Dedup.minhashSigs(docs, "text", "doc_id").count())
  }

  test("incremental signature store round-trips through parquet") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.minhashSigs(docs.where(col("doc_id") % 3 =!= 0), "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    val oldSigs = spark.read.parquet(dir)
    val (_, incr) = Dedup.incrementalMinhashPairs(
      oldSigs, docs.where(col("doc_id") % 3 === 0), "text", "doc_id")
    val direct = Dedup.incrementalMinhashPairs(
      Dedup.minhashSigs(docs.where(col("doc_id") % 3 =!= 0), "text", "doc_id"),
      docs.where(col("doc_id") % 3 === 0), "text", "doc_id")._2
    assert(incr.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  // ---- connected components ---------------------------------------------

  test("connectedComponents: chain + clique + isolated node") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, pairs, "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on an empty edge set") {
    val nodes = Seq(5L, 6L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, pairs, "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("connectedComponents matches brute-force closure on corpus pairs") {
    val docs = Tables.load(spark, sf, "documents")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find as the oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> find(n)).toMap
    val got = Dedup.connectedComponents(
        docs.select(col("doc_id")), docs.sparkSession.createDataFrame(
          pairs.toSeq).toDF("a", "b"), "doc_id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    expect.foreach { case (n, r) => assert(got(n) == r, s"node $n") }
  }

  // ---- star-contraction connected components -----------------------------

  test("connectedComponentsStar: chain + clique + isolated node") {
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val got = Dedup.connectedComponentsStar(nodes, pairs, "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connectedComponentsStar: 200-node chain in O(log n) rounds " +
      "(label propagation's maxRounds guard trips on the same graph)") {
    // the adversarial shape the connectedComponents docstring defers
    // to star contraction for: diameter 199 >> default maxRounds
    val n = 200
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, pairs, "id", "a", "b").collect()
    }
    val got = Dedup.connectedComponentsStar(nodes, pairs, "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n && got.forall(_._2 == 0L))
  }

  test("connectedComponentsStar: empty edges, and fixpoint equal to " +
      "label propagation on corpus pairs") {
    val empty = Dedup.connectedComponentsStar(Seq(7L, 8L).toDF("id"),
        Seq.empty[(Long, Long)].toDF("a", "b"), "id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(empty == Map(7L -> 7L, 8L -> 8L))
    val docs = Tables.load(spark, sf, "documents")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .localCheckpoint(eager = true)
    val prop = Dedup.connectedComponents(
        docs.select(col("doc_id")), pairs, "doc_id", "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = Dedup.connectedComponentsStar(
        docs.select(col("doc_id")), pairs, "doc_id", "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == prop)
  }
}
