package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ZOrder, ZOrderKernels}

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave: known values, monotone per coordinate, bounds enforced") {
    assert(ZOrderKernels.interleave(0L, 0L) == 0L)
    assert(ZOrderKernels.interleave(1L, 0L) == 1L)  // x -> even bits
    assert(ZOrderKernels.interleave(0L, 1L) == 2L)  // y -> odd bits
    assert(ZOrderKernels.interleave(3L, 3L) == 15L) // 0b1111
    // monotone in each coordinate with the other fixed
    val xs = Seq(0L, 1L, 2L, 7L, 100L, 65535L, (1L << 31) - 1)
    for (fixed <- Seq(0L, 42L, 1L << 20)) {
      val zx = xs.map(ZOrderKernels.interleave(_, fixed))
      assert(zx == zx.sorted)
      val zy = xs.map(ZOrderKernels.interleave(fixed, _))
      assert(zy == zy.sorted)
    }
    // top bit stays clear: 62-bit keys sort correctly as signed longs
    assert(ZOrderKernels.interleave((1L << 31) - 1, (1L << 31) - 1) > 0L)
    intercept[IllegalArgumentException](ZOrderKernels.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrderKernels.interleave(0L, 1L << 31))
  }

  test("z-sorted layout clusters BOTH dimensions tighter than a 1-column sort") {
    // 64x64 grid; cut into 64 contiguous 'row groups' of 64 rows.
    // For a predicate on y, count groups whose [min,max] y-range
    // covers a given y value (the groups a reader must scan).
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    def groupsHit(ordered: Seq[(Long, Long)], yTarget: Long): Int =
      ordered.grouped(64).count { g =>
        val ys = g.map(_._2); ys.min <= yTarget && yTarget <= ys.max
      }
    val byX = pts.sortBy { case (x, y) => (x, y) }
    val byZ = df.select(col("x"), col("y"),
        ZOrder.zorder(col("x"), col("y")).as("z"))
      .orderBy(col("z")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // x-sorted: every group spans all 64 y values -> no pruning on y
    assert(groupsHit(byX, 13L) == 64)
    // z-sorted: y=13 lives in a bounded band of groups
    val zHit = groupsHit(byZ, 13L)
    assert(zHit <= 16, s"z-order hit $zHit of 64 groups")
    // and x stays prunable too (the point of z over a y-sort)
    def groupsHitX(ordered: Seq[(Long, Long)], xT: Long): Int =
      ordered.grouped(64).count { g =>
        val xs = g.map(_._1); xs.min <= xT && xT <= xs.max
      }
    assert(groupsHitX(byZ, 13L) <= 16)
  }

  test("codegen column form equals the kernel on real data") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = docs.select(col("doc_id"), col("n_chars"),
        ZOrder.zorder(col("n_chars"), pmod(col("doc_id"), lit(997L))).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) ==
        ZOrderKernels.interleave(r.getLong(1), r.getLong(0) % 997L))
    }
  }
}
