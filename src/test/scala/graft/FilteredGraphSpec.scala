package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KnnGraph

/** Filtered graph search contract (KnnGraph.filteredBeamSearch): the
  * predicate is applied INSIDE the traversal — the beam expands
  * unfiltered, the result admits only allowed nodes — and the
  * admitted top-k equals filter-then-rescan over the traversal's
  * visited set (the identity the operator's docstring claims), so
  * the filter can never starve the walk itself.
  */
class FilteredGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val build =
    KnnGraph.nnDescentBuild(emb, "vec_id", "embedding", 16)
  private lazy val qs = build.vecs.where(col("id") < 10)
    .select(col("id").as("qid"), col("v").as("qv"),
      col("bucket").as("qbucket"))
  private lazy val allowed = emb.where(col("label") === 3)
    .select(col("vec_id").as("id"))
  private lazy val served = KnnGraph.filteredBeamSearch(
    build.rounds.last, build.vecs, qs, build.n, allowed, k = 8)

  test("every served node passes the predicate") {
    val bad = served.join(allowed.select(col("id").as("node")),
      Seq("node"), "left_anti")
    assert(bad.count() === 0)
  }

  test("filter-inside-beam == filter-then-rescan over the evaluated set") {
    // ground truth built INDEPENDENTLY in plain Scala set logic: the
    // evaluated set is seeds ∪ (per hop: previous frontier ∪ its
    // out-edge expansions, self excluded) — seeds recomputed from
    // the ring/bucket rules, frontiers read from the plain
    // traversal's states, distances from ONE Spark-scored all-pairs
    // frame (identical kernel arithmetic; the set/cut logic is what
    // this test re-derives)
    val states = KnnGraph.beamSearchRounds(build.rounds.last,
      build.vecs, qs, build.n, degree = 8)
    val n = build.n
    val outEdges = build.rounds.last.select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val buckets = build.vecs.select(col("id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val qids = qs.select(col("qid")).collect().map(_.getLong(0))
    def seedsOf(qid: Long): Set[Long] = {
      val ring = (1 to 4).flatMap(d =>
        Seq(math.floorMod(qid + d, n), math.floorMod(qid - d, n))).toSet
      val mates = buckets.collect {
        case (id, b) if b == buckets(qid) => id
      }.toSet
      (ring ++ mates) - qid
    }
    val frontiers = states.map(_.select(col("qid"), col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    val evaluated: Map[Long, Set[Long]] = qids.map { qid =>
      val hops = (1 until states.length).map { h =>
        val f = frontiers(h - 1).getOrElse(qid, Set.empty[Long])
        (f ++ f.flatMap(nd => outEdges.getOrElse(nd, Set.empty))) - qid
      }
      qid -> (seedsOf(qid) ++ hops.flatten)
    }.toMap
    // distances from the Spark kernel (arithmetic identical by
    // construction; only the admit/cut logic is re-derived here)
    val dMap = build.vecs.select(col("id"), col("v")).crossJoin(
        broadcast(qs.select(col("qid"), col("qv"))))
      .select(col("qid"), col("id"),
        round(graft.functions.VectorFunctions
          .vec_l2(col("v"), col("qv")) * 1e4).cast("bigint").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ok = allowed.collect().map(_.getLong(0)).toSet
    val truth = evaluated.flatMap { case (qid, nodes) =>
      nodes.toSeq.filter(ok)
        .map(nd => (nd, dMap((qid, nd))))
        .sortBy { case (nd, d) => (d, nd) }.take(8).zipWithIndex
        .map { case ((nd, d), i) => (qid, nd, d, i + 1) }
    }.toSet
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === truth)
  }

  test("a ~10% selective filter does not starve the result") {
    // labels are uniform-ish over 10 values, so label=3 keeps ~10% of
    // the corpus; every query must still fill meaningful top-k from
    // the unfiltered walk's visited set
    val perQ = served.groupBy(col("qid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perQ.size === 10, s"queries answered: ${perQ.size}")
    assert(perQ.values.forall(_ >= 1), perQ.toString)
    // and the full k=8 is reachable for most queries (the visited
    // set is beam*(hops+1) ~ 100+ nodes, ~10 allowed on average)
    assert(perQ.values.count(_ >= 4) >= 5, perQ.toString)
  }

  test("selectivity floor: ultra-selective predicates starve; filteredViable reads it") {
    // the ~10% predicate sits ABOVE the floor and filled top-k above;
    // a ~1%-and-below predicate sits at/below it — measure the admit
    // starvation the floor formula predicts (PERF.md records the
    // numbers). allowed·evaluated >= k·n with evaluated =
    // beam·(degree+1)·(hops+1) = 27·9·4 = 972 at n=500
    val n = build.n
    assert(KnnGraph.filteredViable(n, allowed.count(), k = 8)) // ~10%
    assert(!KnnGraph.filteredViable(n, 1, k = 8)) // single node
    assert(!KnnGraph.filteredViable(n, (n * 4 / 972).max(1), k = 16))
    // measured: a single-allowed-node predicate returns AT MOST one
    // row per query (and only for the queries whose walk touched it)
    // — fewer than k not because fewer exist but because the visited
    // set holds too few: the starvation the floor exists to catch
    val one = emb.where(col("vec_id") === 42)
      .select(col("vec_id").as("id"))
    val starved = KnnGraph.filteredBeamSearch(
      build.rounds.last, build.vecs, qs, build.n, one, k = 8)
    val counts = starved.groupBy(col("qid")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(counts.forall(_ <= 1), counts.mkString(","))
    assert(counts.sum < 8 * 10, counts.mkString(","))
  }

  test("SQL graph route falls back to filter-then-rank below the floor") {
    import graft.sql.VectorSql
    val cat = new VectorSql.Catalog(spark)
    val collection = emb.select(
      col("vec_id").cast("string").as("id"),
      col("embedding").as("vector"),
      map(lit("label"), col("label").cast("string")).as("metadata"))
    cat.put("vectors", collection)
    cat.putIndex("vectors", VectorSql.GraphIndex(build))
    // a 2-of-n IN predicate (~0.4%): below the floor for
    // candidates=16, so the route must NOT walk — the plan is the
    // exact filter-then-rank (TakeOrdered over the ~2 matching rows)
    val sql = "SELECT id, distance FROM vectors " +
      "NEAREST TO (SELECT vector FROM vectors WHERE id = '0') " +
      "USING euclidean WHERE id IN ('7', '11') LIMIT 10"
    assert(!KnnGraph.filteredViable(build.n, 2, k = 16))
    val plan = VectorSql.explain(cat, sql)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val got = VectorSql.execute(cat, sql)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // equals the index-less exact answer: both matching rows, ranked
    val noIdx = new VectorSql.Catalog(spark)
    noIdx.put("vectors", collection)
    val want = VectorSql.execute(noIdx, sql)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want)
    assert(got.map(_._1).toSet === Set("7", "11"), got.toString)
    // while the ~10% label predicate stays ON the walk (routes): its
    // plan candidate-joins the traversal output, not a corpus rank
    val routedSql = "SELECT id, distance FROM vectors " +
      "NEAREST TO (SELECT vector FROM vectors WHERE id = '0') " +
      "USING euclidean WHERE metadata.label = '3' LIMIT 5"
    val routed = VectorSql.execute(cat, routedSql)
      .collect().map(_.getString(0)).toSeq
    assert(routed.size === 5, routed.toString)
  }
}
