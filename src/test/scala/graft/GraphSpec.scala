package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("star graph: hub outranks leaves, ranks conserve mass") {
    // hub 0 connected to leaves 1..4, plus an isolated pair (10, 11)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val r = Graph.pagerank(pairs, iters = 5).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    assert(r.size == 7)
    assert(r(0L)._1 == 4) // hub degree
    // the hub accumulates the leaves' mass
    assert(r(0L)._2 > r(1L)._2 * 2)
    // symmetric leaves get identical ranks (determinism across keys)
    assert(Set(1L, 2L, 3L, 4L).map(r(_)._2).size == 1)
    // the isolated pair swaps mass with itself -> stays near 1/N
    assert(r(10L)._2 == r(11L)._2)
    // integer mass is conserved up to div truncation: each of the 5
    // iterations can shed < 100 units per node to the two divs
    val total = r.values.map(_._2).sum
    assert(total <= Graph.Scale && total > Graph.Scale - 7 * 5 * 200)
  }

  test("label propagation: bridged triangles split into two communities") {
    // triangles {0,1,2} and {5,6,7} joined by the bridge 2-5: CC
    // would merge everything; 4 sync rounds of min-majority LP settle
    // on community 0 = {0,1,2} and community 2 = {5,6,7} (hand-traced
    // trajectory — the same rounds the DuckDB oracle unrolls)
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (5L, 6L), (5L, 7L),
      (6L, 7L), (2L, 5L)).toDF("doc_a", "doc_b")
    val m = Graph.labelProp(pairs, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("label propagation: single edge oscillates back to self on even rounds") {
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val m = Graph.labelProp(pairs, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 2L))
    val m3 = Graph.labelProp(pairs, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m3 == Map(1L -> 2L, 2L -> 1L))
  }

  test("label propagation: invariant under edge partitioning/order") {
    // the 100 TB claim: synchronous rounds + (count DESC, label ASC)
    // tie-break make the result a pure function of the edge SET —
    // shuffling rows across partitions must not move a single label
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (5L, 6L), (5L, 7L),
      (6L, 7L), (2L, 5L), (3L, 0L), (9L, 5L), (3L, 9L))
      .toDF("doc_a", "doc_b")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.labelProp(df, iters = 4).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(pairs)
    assert(run(pairs.repartition(7)) == base)
    assert(run(pairs.orderBy(col("doc_b"))) == base)
  }

  test("two-node path equals closed form") {
    // single edge: both nodes have deg 1; fixpoint r = 0.15/2 + 0.85*r
    // -> r = 1/2 exactly; integer trajectory stays at Scale/2 - eps
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Graph.pagerank(pairs, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getLong(2)).toMap
    assert(r(1L) == r(2L))
    assert(math.abs(r(1L) - Graph.Scale / 2) < 10)
  }

  private def corenessMap(pairs: org.apache.spark.sql.DataFrame,
      iters: Int = Graph.Adaptive): Map[Long, Long] =
    Graph.corenessRounds(pairs, iters).rounds.last.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("coreness: K4 with a pendant path peels to textbook values") {
    // K4 on {0,1,2,3} (coreness 3 each), path 3-10-11 hanging off it
    // (10 and 11 are in the 1-core only). 4 nodes + 2 pendants ->
    // n=6, adaptive iters = max(2, ceil(log2 6)) = 3, enough: the
    // h-index iteration settles K4 in one round and the tail in two
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 10L), (10L, 11L)).toDF("doc_a", "doc_b")
    assert(corenessMap(pairs) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L,
      3L -> 3L, 10L -> 1L, 11L -> 1L))
  }

  test("coreness: long path needs its length in rounds (budget caveat)") {
    // a 7-node path: every interior node starts at degree 2 and the
    // h-index wave moves inward one hop per round — coreness 1
    // everywhere at fixpoint. With iters=1 the center still reads 2;
    // by iters=3 (= adaptive for n=7) the whole path reads 1
    val pairs = (0L to 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val one = corenessMap(pairs, iters = 1)
    assert(one(3L) == 2L)
    assert(corenessMap(pairs).values.forall(_ == 1L))
  }

  test("corenessIters: count-derived clamp(ceil(log2 n), 2, 8)") {
    assert(Graph.corenessIters(0) === 2)
    assert(Graph.corenessIters(1) === 2)
    assert(Graph.corenessIters(4) === 2)
    assert(Graph.corenessIters(5) === 3)   // ceil(log2 5) = 3
    assert(Graph.corenessIters(256) === 8)
    assert(Graph.corenessIters(1L << 40) === 8) // cap = oracle unroll
  }

  test("coreness: monotone non-increasing per round, order-invariant") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L), (3L, 5L), (1L, 4L)).toDF("doc_a", "doc_b")
    val cz = Graph.corenessRounds(pairs, iters = 4)
    val perRound = cz.rounds.map(_.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    perRound.sliding(2).foreach { w =>
      val (prev, next) = (w.head, w.last)
      next.foreach { case (node, c) => assert(c <= prev(node)) }
    }
    // pure function of the edge SET — repartition must not move a value
    val shuffled = Graph.corenessRounds(pairs.repartition(5), iters = 4)
      .rounds.last.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled == perRound.last)
  }
}
