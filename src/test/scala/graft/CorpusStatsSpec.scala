package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Corpus, Dedup, Profile}

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b a b a b", "s0"),     // bigrams: "a b" x3, "b a" x2
    (1L, "x y z", "s0"),           // bigrams: "x y", "y z"
    (2L, "solo", "s1"),            // no bigrams
    (3L, "p q p q", "s1")          // "p q" x2, "q p" x1
  ).toDF("doc_id", "text", "source")

  test("ngrams guards short docs (Spark sequence descends for m < 1)") {
    val out = docs.select(col("doc_id"),
        Corpus.ngrams(graft.functions.TextFuncs.tokens(col("text")), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(2L).isEmpty)
    assert(out(1L) == Seq("x y", "y z"))
    assert(out(0L) == Seq("a b", "b a", "a b", "b a", "a b"))
  }

  test("shingle_strings kernel equals the ngrams HOF spec") {
    val docs2 = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cmp = docs2.select(
      graft.functions.TextExprs.shingle_strings(col("text"), 3).as("k"),
      Corpus.ngrams(graft.functions.TextFuncs.tokens(col("text")), 3).as("h"))
    assert(cmp.where(not(col("k") <=> col("h"))).count() == 0)
  }

  test("ngramTopK counts and tie-breaks deterministically") {
    val top = Corpus.ngramTopK(docs, "text", 2, 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("a b", 3L))
    // count 2: "b a" and "p q" tie -> lexicographic
    assert(top(1) == ("b a", 2L) && top(2) == ("p q", 2L))
  }

  test("repetitionStats computes top/dup fractions exactly") {
    val st = Corpus.repetitionStats(docs, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(st(0L) == ((5L, 0.6, 0.6)))  // 3/5 top, 1 - 2/5 dup
    assert(st(1L) == ((2L, 0.5, 0.0)))
    assert(!st.contains(2L))            // no bigrams -> absent
    assert(st(3L) == ((3L, round4(2.0 / 3), round4(1.0 - 2.0 / 3))))
  }

  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("shardAssign is deterministic, in range, and partitionBy-writable") {
    val n = 64
    val df = spark.range(n).toDF("doc_id")
    val sharded = Corpus.shardAssign(df, "doc_id", 8)
    val shards = sharded.select("shard").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(shards.subsetOf((0L until 8L).toSet))
    // same input -> same assignment (no rand())
    val again = Corpus.shardAssign(df, "doc_id", 8)
    assert(sharded.except(again).isEmpty && again.except(sharded).isEmpty)
    // the at-rest layout: one directory per shard, pruned on read
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    sharded.write.mode("overwrite").partitionBy("shard").parquet(dir)
    val one = spark.read.parquet(dir).where(col("shard") === 3L)
    val expected = sharded.where(col("shard") === 3L).count()
    assert(one.count() == expected)
    val scan = one.queryExecution.executedPlan.toString
    assert(!scan.contains("Filter ") || scan.contains("PartitionFilters"),
      s"shard predicate should prune partitions, not row-filter:\n$scan")
  }

  test("mixByTokenBudget: integer rate, deterministic kept set") {
    val kept = Corpus.mixByTokenBudget(docs, "text", "doc_id", "source", 6L)
    val rows = kept.collect()
    // s0 has 6+3=9 tokens -> rate = min(100, 600 div 9) = 66
    // s1 has 1+4=5 tokens -> rate = 100 (budget covers it)
    val rates = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_pct")).toMap
    assert(rates.get("s0").forall(_ == 66L))
    assert(rates.get("s1").forall(_ == 100L))
    // s1 fully kept at rate 100
    assert(rows.count(_.getAs[String]("source") == "s1") == 2)
    // kept set under rate 66 = ids whose hashMod100 < 66, exactly
    val expect0 = docs.where(col("source") === "s0")
      .select(col("doc_id")).where(Corpus.hashMod100(col("doc_id")) < 66)
      .collect().map(_.getLong(0)).toSet
    assert(rows.filter(_.getAs[String]("source") == "s0")
      .map(_.getAs[Long]("doc_id")).toSet == expect0)
  }

  test("editVerify: zero distance for identical text, threshold filters") {
    val d2 = Seq(
      (0L, "same text entirely"), (1L, "same text entirely"),
      (2L, "wholly different words here")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.editVerify(d2, pairs, "text", "doc_id", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((0L, 1L, 0)))
  }

  test("dimStats: exact stats on a crafted corpus") {
    val vs = Seq(
      (0L, Array(1.0f, -2.0f)),
      (1L, Array(3.0f, 2.0f))).toDF("vec_id", "embedding")
    val st = Profile.dimStats(vs, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(st(0) == ((2.0, 1.0, 1.0, 3.0)))
    assert(st(1) == ((0.0, 2.0, -2.0, 2.0)))
  }

  test("labelCentroids: mean vectors re-assembled in dim order") {
    val vs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(3.0f, 2.0f), 7),
      (2L, Array(5.0f, 5.0f), 8)).toDF("vec_id", "embedding", "label")
    val c = Profile.labelCentroids(vs, "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(c(7) == ((2L, Seq(2.0, 1.0))))
    assert(c(8) == ((1L, Seq(5.0, 5.0))))
  }

  test("labelCentroidsLong: (label, dim, m, n_vectors) rows, ordered") {
    val vs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(3.0f, 2.0f), 7),
      (2L, Array(5.0f, 5.0f), 8)).toDF("vec_id", "embedding", "label")
    val long = Profile.labelCentroidsLong(vs, "embedding", "label")
    assert(long.columns.toSeq == Seq("label", "dim", "m", "n_vectors"))
    val rows = long.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // output order is (label, dim), n_vectors repeats per label
    assert(rows.toSeq == Seq(
      (7, 0, 2.0, 2L), (7, 1, 1.0, 2L), (8, 0, 5.0, 1L), (8, 1, 5.0, 1L)))
    // long form reassembles into exactly the array form
    val rebuilt = rows.groupBy(_._1).map { case (lbl, rs) =>
      lbl -> rs.sortBy(_._2).map(_._3).toSeq
    }
    val arr = Profile.labelCentroids(vs, "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](2)).toMap
    assert(rebuilt == arr)
  }

  test("dupSpanFrac: shared spans counted cross-doc only") {
    val d = Seq(
      (0L, "one two three four five tail"),   // shares "one..five" with 1
      (1L, "one two three four five other"),
      (2L, "totally unrelated words in here x"), // repeated NOWHERE else
      (3L, "zz zz zz zz zz zz")               // self-repeats only -> not dup
    ).toDF("doc_id", "text")
    val out = Corpus.dupSpanFrac(d, "text", "doc_id", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 0/1: 2 shingles each, exactly one ("one two three four five") shared
    assert(out(0L) == ((2L, 1L, 0.5)))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L)._2 == 0L)
    // doc 3's repeated shingle lives in ONE doc -> not cross-doc dup
    assert(out(3L)._2 == 0L)
  }

  test("radiusSearch returns exactly the within-radius set, nearest first") {
    import graft.operators.Knn
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val r = Knn.radiusSearch(e, q, "vec_id", "embedding", "cosine", 0.9)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.nonEmpty && r.forall(_._2 <= 0.9))
    assert(r.map(_._2).toSeq == r.map(_._2).sortBy(identity).toSeq)
    // nothing within the radius is missing: recompute via topK
    val all = Knn.topK(e, q, "vec_id", "embedding", "cosine", Int.MaxValue)
      .collect().count(_.getDouble(1) <= 0.9)
    assert(r.length == all)
    // self at distance 0 leads
    assert(r.head == ((0L, 0.0)))
  }

  test("unigramCrossEntropy: hand-computed xent on a 2-doc corpus") {
    import spark.implicits._
    // vocab: a=2, b=2, c=1, N=5
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .unigramCrossEntropy(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: three tokens all with c=2 -> -ln(2/5) each
    // doc 2: avg(-ln(2/5), -ln(1/5)); doc 3: no tokens -> absent
    assert(got.toSeq == Seq(
      (1L, 3L, r4(-math.log(0.4))),
      (2L, 2L, r4((-math.log(0.4) - math.log(0.2)) / 2))))
  }

  test("lshRecallReport: every query finds at least itself; n_hit <= k") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val rep = Ann.lshRecallReport(e, e.where(col("vec_id") < 5),
      "vec_id", "embedding", "cosine", k = 10, numPlanes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.keySet == (0L until 5L).toSet)
    // a query shares its own bucket, and self is rank 1 of the exact
    // top-k, so recall can never be 0
    assert(rep.values.forall(h => h >= 1L && h <= 10L))
  }

  test("minhashRecallMatrix: narrower bands predict supersets (monotone frontier)") {
    // a width-2 band collision implies both width-1 sub-bands collide,
    // so predictions are nested: n_pred and recall are monotone in
    // band count, and every config's hits are bounded by the truth
    val docs2 = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val m = graft.operators.Dedup
      .minhashRecallMatrix(docs2, "text", "doc_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (t1, p1, h1) = m("seeds=8,rows_per_band=1")
    val (t2, p2, h2) = m("seeds=8,rows_per_band=2")
    val (t4, p4, h4) = m("seeds=8,rows_per_band=4")
    assert(t1 == t2 && t2 == t4, "shared truth across configs")
    assert(p1 >= p2 && p2 >= p4, "narrower bands cast a wider net")
    assert(h1 >= h2 && h2 >= h4 && h1 <= t1)
  }

  test("dataChecks: injected violations are counted, healthy checks zero") {
    // 3 rows sharing doc_id 1 (2 excess), one unknown lang, one
    // n_chars lying about its text, one empty text
    val bad = Seq(
      (1L, "abc", "en", "s0", 3L),
      (1L, "defg", "en", "s0", 4L),
      (1L, "hi", "fr", "s0", 2L),
      (2L, "jk", "xx", "s0", 2L),
      (3L, "lmn", "de", "s1", 99L),
      (4L, "", "zh", "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Profile.dataChecks(bad).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "doc_id_dup_rows" -> 2L, "doc_id_null" -> 0L, "lang_unknown" -> 1L,
      "n_chars_mismatch" -> 1L, "n_chars_negative" -> 0L,
      "text_empty" -> 1L))
  }

  test("tableProfile: one row per column with exact null/distinct counts") {
    val df = Seq(
      (Some(1L), Some("en")), (Some(2L), None), (Some(2L), Some("fr"))
    ).toDF("doc_id", "lang")
    val got = Profile.tableProfile(df, Seq("doc_id", "lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("doc_id", 3L, 0L, 2L, "1", "2"),
      ("lang", 3L, 1L, 2L, "en", "fr")))
  }

  test("bigramCrossEntropy: hand-computed conditional xent on a 2-doc corpus") {
    val df = Seq((0L, "a b a c"), (1L, "a b")).toDF("doc_id", "text")
    // bigram counts: "a b"->2, "b a"->1, "a c"->1; prefix marginals:
    // a->3, b->1. doc0 = avg(-ln(2/3), -ln(1/1), -ln(1/3)) = 0.5014;
    // doc1 = -ln(2/3) = 0.4055
    val got = Corpus.bigramCrossEntropy(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 3L, 0.5014), (1L, 1L, 0.4055)))
  }

  test("contaminationSpans: shared spans ranked by train reach, distinct-doc counts") {
    val train = Seq(
      (1L, "the quick brown fox jumps over things"),
      (2L, "a the quick brown fox jumps too"),
      (3L, "nothing shared here at all today")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val got = Corpus.contaminationSpans(train, bench, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the 5-token span "the quick brown fox jumps" is in 2 train docs
    assert(got.head == (("the quick brown fox jumps", 2L, 1L)))
    assert(got.forall(_._2 <= 2))
  }

  test("temperatureMixture: alpha=1 is natural; alpha<1 up-weights small sources") {
    val df = Seq(
      (0L, (1 to 90).map(_ => "w").mkString(" "), "big"),
      (1L, (1 to 10).map(_ => "w").mkString(" "), "small")
    ).toDF("doc_id", "text", "source")
    val nat = Corpus.temperatureMixture(df, "text", "source", alpha = 1.0)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(nat.forall { case (_, p, w) => math.abs(p - w) < 1e-9 })
    val t = Corpus.temperatureMixture(df, "text", "source", alpha = 0.7)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(t("small") > 1.0 && t("big") < 1.0)
    // shares still sum to ~1 after scaling
    val shares = Corpus.temperatureMixture(df, "text", "source")
      .agg(sum(col("temp_share"))).collect().head.getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-3)
  }

  test("ntile follows the SQL standard (larger buckets first) — gate dependence") {
    // user_activity_deciles and orders_rfm oracle against DuckDB's
    // ntile; both engines must put the n mod b extra rows in the
    // FIRST buckets. 7 rows into 3 tiles -> sizes 3,2,2.
    val df = (1 to 7).map(i => (i.toLong, i)).toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))
    val sizes = df.withColumn("t", ntile(3).over(w))
      .groupBy("t").count().orderBy("t")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((1, 3L), (2, 2L), (3, 2L)))
  }

  test("zipfSlope: exact power law fits slope -1; natural text is negative") {
    // freq(rank r) = 2^(8-r) is an EXACT log-linear law with slope
    // -ln2/ln? no — freq halves per rank STEP, not per rank ratio, so
    // build the true power law instead: token t_r repeated 720/r
    // times (720 divisible by 1..6 -> integer counts, no floor bias)
    val text = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"t$r")).mkString(" ")
    val one = Seq((0L, text, "s0")).toDF("doc_id", "text", "source")
    val slope = Corpus.zipfSlope(one, "text", "source", topN = 6)
      .collect().head.getDouble(2)
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
    val real = Corpus.zipfSlope(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        "text", "source")
      .collect()
    assert(real.nonEmpty && real.forall(_.getDouble(2) < 0.0))
  }

  test("keywordsBySource: unique vocab ranks first, universal vocab scores 0") {
    val df = Seq(
      (0L, "common alpha alpha alpha", "sA"),
      (1L, "common beta beta", "sB"),
      (2L, "common gamma", "sC")
    ).toDF("doc_id", "text", "source")
    val rows = Corpus.keywordsBySource(df, "text", "source", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(5)))
    val first = rows.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(first == Map("sA" -> "alpha", "sB" -> "beta", "sC" -> "gamma"))
    // 'common' appears in every source -> ln(3/3) = 0 score wherever ranked
    assert(rows.filter(_._3 == "common").forall(_._4 == 0.0))
  }

  test("integrityAudit: injected gap/orphan/dim-mismatch each counted once") {
    val d = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val e = Seq(
      (0L, Array(1.0f, 2.0f), 0),
      (1L, Array(1.0f, 2.0f, 3.0f), 0),  // dim mismatch (dominant = 2)
      (9L, Array(4.0f, 5.0f), 1)         // orphan (doc 9 absent)
    ).toDF("vec_id", "embedding", "label")
    val got = Profile.integrityAudit(d, e, "doc_id", "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "dim_mismatch" -> 1L, "docs_total" -> 3L,
      "docs_without_embedding" -> 1L,  // doc 2
      "embeddings_without_doc" -> 1L, "embeds_total" -> 3L))
  }

  test("normalizedDedupReport: case/whitespace variants collapse, raw does not") {
    val df = Seq(
      (0L, "Hello  World", "s0"),
      (1L, "hello world", "s0"),
      (2L, " HELLO\tWORLD ", "s0"),
      (3L, "unique text", "s0"),
      (4L, "café", "s1"),          // é precomposed
      (5L, "café", "s1")          // e + combining acute -> NFC é
    ).toDF("doc_id", "text", "source")
    val got = Dedup.normalizedDedupReport(df, "text", "source")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("s0") == ((4L, 4L, 2L, 2L)))  // 3 variants -> 1, plus unique
    assert(got("s1") == ((2L, 2L, 1L, 1L)))  // NFC unifies the two cafés
  }

  test("containmentPairs: contained doc scores C=1.0 with J<1 on a real candidate") {
    val big = (1 to 30).map(i => s"w$i").mkString(" ")
    // near-identical shingle profile (minhash candidate) but strict
    // token subset: drop the last token only
    val small = (1 to 29).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, small, "s"), (1L, big, "s"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.containmentPairs(df, "text", "doc_id").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getDouble(3) == 1.0)            // containment
    assert(r.getDouble(2) < 1.0)             // jaccard strictly below
  }
}
