package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll

/** Pins the HyperLogLog sketch behind `users_hll` / `streaming_hll`:
  * the m=64 error envelope on known cardinalities, and the merge
  * law (register table of a union = elementwise max of the register
  * tables) that makes the streaming complete-mode aggregation legal.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ids(from: Long, until: Long) = {
    val spark2 = spark
    import spark2.implicits._
    (from until until).toDF("id").withColumn("g", lit("x"))
  }

  test("estimate lands inside the m=64 error envelope") {
    // RSE for m=64 is 1.04/sqrt(64) = 13%; assert 3-sigma. n=40 runs
    // through the linear-counting branch, the others through the raw
    // estimator. n around 2-3x m sits in the classic HLL bias zone
    // (what HLL++ patches with empirical tables — not portable, so
    // deliberately not implemented; see Hll scaladoc) and is NOT a
    // supported accuracy regime.
    for (n <- Seq(40L, 1000L, 20000L)) {
      val est = Hll.estimate(Hll.registers(ids(0, n), "id", Seq("g")),
        Seq("g")).head().getDouble(1)
      assert(math.abs(est - n) / n < 0.39, s"n=$n est=$est")
    }
  }

  test("union sketch = elementwise max of register tables (merge law)") {
    val a = Hll.registers(ids(0, 5000), "id", Seq("g"))
    val b = Hll.registers(ids(2500, 7500), "id", Seq("g"))
    val merged = a.unionByName(b)
      .groupBy(col("g"), col("reg")).agg(max(col("mx")).as("mx"))
    val direct = Hll.registers(ids(0, 5000).unionByName(ids(2500, 7500)),
      "id", Seq("g"))
    val mEst = Hll.estimate(merged, Seq("g")).head().getDouble(1)
    val dEst = Hll.estimate(direct, Seq("g")).head().getDouble(1)
    assert(mEst === dEst)
    // and the merged registers themselves are identical
    assert(merged.orderBy("reg").collect().toSeq ===
      direct.orderBy("reg").collect().toSeq)
  }

  test("registers are bounded: at most 64 rows per group") {
    val r = Hll.registers(ids(0, 50000), "id", Seq("g"))
    assert(r.count() <= 64)
  }
}
