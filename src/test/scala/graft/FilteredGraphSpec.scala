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

  test("filter-inside-beam == filter-then-rescan over the visited set") {
    // ground truth built INDEPENDENTLY: run the plain (unfiltered)
    // traversal, collect every visited beam state, filter to the
    // allowed ids and take the per-query top-8 by (d_e4, id) in
    // plain Scala — no TopKAgg, no window
    val states = KnnGraph.beamSearchRounds(build.rounds.last,
      build.vecs, qs, build.n, degree = 8)
    val visited = states
      .map(_.select(col("qid"), col("node"), col("d_e4")))
      .reduce(_.unionByName(_))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val ok = allowed.collect().map(_.getLong(0)).toSet
    val truth = visited.toSeq.filter(t => ok(t._2))
      .groupBy(_._1).flatMap { case (qid, rows) =>
        rows.sortBy(t => (t._3, t._2)).take(8).zipWithIndex
          .map { case ((_, node, d), i) => (qid, node, d, i + 1) }
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
}
