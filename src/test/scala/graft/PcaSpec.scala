package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def frame(vecs: Seq[Array[Float]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v.toSeq)), 4),
      StructType(Seq(StructField("embedding",
        ArrayType(FloatType, containsNull = false), nullable = false))))

  test("recovers a planted dominant direction") {
    // points spread along u = (3,4)/5 with small orthogonal jitter:
    // the top component must align with u (up to sign)
    val u = Array(0.6f, 0.8f)
    val vecs = (0 until 200).map { i =>
      val tpar = (i % 21 - 10) * 0.1f           // -1.0 .. 1.0 along u
      val tperp = ((i * 7) % 5 - 2) * 0.01f     // tiny orthogonal noise
      Array(u(0) * tpar - u(1) * tperp, u(1) * tpar + u(0) * tperp)
    }
    val out = Pca.topComponent(frame(vecs), "embedding", dim = 2)
      .orderBy("dim").collect()
    val l0 = out(0).getDouble(1); val l1 = out(1).getDouble(1)
    val norm = math.sqrt(l0 * l0 + l1 * l1)
    val cos = math.abs((l0 * u(0) + l1 * u(1)) / norm)
    assert(cos > 0.999, s"loading ($l0,$l1) not aligned with u, cos=$cos")
    // eigenvalue ~ population variance along u: tpar has variance
    // avg(t^2)= 0.1^2 * avg((i%21-10)^2) = 0.01 * (2*sum(1..10^2))/21
    val expected = 0.01 * (2.0 * (1 to 10).map(k => k * k).sum) / 21
    val eig = out(0).getDouble(2)
    assert(math.abs(eig - expected) < 0.01, s"eig=$eig expected~$expected")
  }

  test("max-abs loading is exactly 1.0 and eigval >= max diagonal variance") {
    val vecs = (0 until 100).map { i =>
      Array((i % 7 - 3) * 0.05f, (i % 3 - 1) * 0.2f, ((i * 13) % 11 - 5) * 0.03f)
    }
    val out = Pca.topComponent(frame(vecs), "embedding", dim = 3).collect()
    assert(out.map(r => math.abs(r.getDouble(1))).max === 1.0)
    // lambda_max >= max C_ii for symmetric PSD covariance
    val byDim = vecs.transpose.map { xs =>
      val m = xs.map(_.toDouble).sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(out.head.getDouble(2) >= byDim.max - 1e-3)
  }

  test("constant frame degenerates to zero eigenvalue") {
    val vecs = Seq.fill(10)(Array(0.25f, -0.5f))
    val out = Pca.topComponent(frame(vecs), "embedding", dim = 2).collect()
    assert(out.head.getDouble(2) === 0.0)
  }
}
