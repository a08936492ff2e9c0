package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Recall

class RecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("matrix: 16 family x budget rows, invariants hold") {
    val rows = Recall.matrix(
        Tables.load(spark, sf, "embeddings"), "vec_id", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
    val m = rows.toMap
    assert(rows.length == 16 && m.size == 16)
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    // the graph family serves near-exact at its ef budget on this
    // corpus (0.98 at pin time) — keep it honest but not brittle
    assert(m(("graph", "beam=3log2n")) >= 0.85,
      s"graph ${m(("graph", "beam=3log2n"))}")
    // more probed clusters can only add candidates -> monotone recall
    assert(m(("ivf", "nprobe=1")) <= m(("ivf", "nprobe=2")))
    assert(m(("ivf", "nprobe=2")) <= m(("ivf", "nprobe=4")))
    // ivfpq ranks by ADC score, not the baseline metric, so the
    // superset guarantee is only statistical: extra probed clusters
    // can surface ADC-better-but-truly-farther candidates that
    // displace a true neighbor (observed: one-neighbor dip at
    // sf0.001). Allow that single-neighbor slack.
    assert(m(("ivfpq", "nprobe=2")) <= m(("ivfpq", "nprobe=4")) + 0.0101)
    // exact re-rank of a superset of the raw top-k can't lose hits:
    // every true top-10 member inside the 30-candidate shortlist ranks
    // ahead of every non-member under the exact metric
    assert(m(("pq", "adc")) <= m(("pq", "rerank=30")))
    assert(m(("sq8", "codes")) <= m(("sq8", "rerank=30")))
    assert(m(("sq4", "codes")) <= m(("sq4", "rerank=30")))
    assert(m(("bq", "hamming")) <= m(("bq", "rerank=30")))
    // 16-level cells are coarser than 256-level ones: SQ4's raw code
    // scan can't beat SQ8's (ties allowed at small SF)
    assert(m(("sq4", "codes")) <= m(("sq8", "codes")) + 1e-9)
    // dequantized-l2 over 8-bit codes barely perturbs the ranking
    assert(m(("sq8", "codes")) >= 0.9, s"sq8 ${m(("sq8", "codes"))}")
  }

  test("RP(16) shortlist + exact rerank: measured recall@10, honestly low " +
      "on this isotropic corpus (the ann_rp_rerank quality pin)") {
    import graft.functions.RpKernels
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rows = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val ids = rows.map(_._1)
    val vecs = rows.toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble - b(i).toDouble; s += x * x; i += 1
      }; s
    }
    // project through the SHIPPED kernel, not a re-derivation
    val projs = rows.map { case (id, v) =>
      id -> RpKernels.project(ArrayData.toArrayData(v), isFloat = true, 16)
        .toDoubleArray()
    }.toMap
    def l2d(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }; s
    }
    val recalls = (0L until 20L).map { qid =>
      val qv = vecs(qid); val qp = projs(qid)
      val exact = ids.sortBy(id => (l2(vecs(id), qv), id)).take(10).toSet
      val short = ids.sortBy(id => (l2d(projs(id), qp), id)).take(50)
      val rr = short.sortBy(id => (l2(vecs(id), qv), id)).take(10).toSet
      (exact & rr).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // the machinery works (recall is far above the ~0.02 random-50
    // baseline) but JL at 16 dims CANNOT resolve this corpus's
    // near-uniform distance gaps — pinned as a band so the documented
    // "low on isotropic data, use embed_rp to predict" claim stays
    // true to the measurement (0.285 at pin time)
    assert(mean >= 0.15 && mean <= 0.60, s"RP rerank mean recall@10 $mean")
  }
}
