package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def left = Seq(
    (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
    (2L, 10L, "l3")
  ).toDF("k", "t", "name")

  def right = Seq(
    (1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0),
    (3L, 1L, 102L, 3.0)
  ).toDF("k", "t", "rid", "v")

  test("latest right row at-or-before each left time; no match -> null") {
    val got = AsOf.asofJoin(left, right, "k", "t", "rid", Seq("rid", "v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 5L, -1L),    // before any purchase
      (1L, 10L, 100L),  // equal time counts (<=)
      (1L, 20L, 101L),  // latest of {10, 15}
      (2L, 10L, -1L)))  // key with no right rows
  }

  test("equal-(key,time) right rows: the largest tie value wins") {
    val r2 = Seq((1L, 10L, 7L, 7.0), (1L, 10L, 9L, 9.0), (1L, 10L, 8L, 8.0))
      .toDF("k", "t", "rid", "v")
    val l2 = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val got = AsOf.asofJoin(l2, r2, "k", "t", "rid", Seq("rid"))
      .select("rid_asof").head.getLong(0)
    assert(got == 9L)
  }

  test("matched row's NULL payload stays NULL (no resurrection from older rows)") {
    // older purchase has value 2.0; the MATCHED (latest) one has NULL
    // value — per-column carries would mix fields of both rows
    val r = Seq((1L, 5L, 100L, Some(2.0)), (1L, 10L, 101L, None))
      .toDF("k", "t", "rid", "v")
    val l = Seq((1L, 20L, "x")).toDF("k", "t", "name")
    val row = AsOf.asofJoin(l, r, "k", "t", "rid", Seq("rid", "v")).head()
    assert(row.getLong(3) == 101L)
    assert(row.isNullAt(4), "value must come from the matched row (NULL), not an older one")
  }

  test("right rows with NULL time are excluded, not treated as earliest") {
    val r = Seq((Some(1L), None: Option[Long], Some(9L)), (Some(1L), Some(50L), Some(1L)))
      .toDF("k", "t", "rid")
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val row = AsOf.asofJoin(l, r, "k", "t", "rid", Seq("rid")).head()
    assert(row.isNullAt(3), "null-time right row must not match")
  }

  test("left columns pass through unchanged; payload suffixed") {
    val out = AsOf.asofJoin(left, right, "k", "t", "rid", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "name", "v_asof"))
  }

  test("plan: one exchange per side, no nested-loop join") {
    val plan = AsOf.asofJoin(left, right, "k", "t", "rid", Seq("rid", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("matches per-row lookup on corpus data") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        expr("ts div 1000").as("t"), col("value"))
    val got = AsOf.asofJoin(clicks, purchases, "user_id", "t", "pid", Seq("pid"))
      .collect().map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // driver-side oracle: brute-force max-t purchase <= click t per user
    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    clicks.collect().foreach { c =>
      val (u, eid, t) = (c.getLong(0), c.getLong(1), c.getLong(2))
      val expect = ps.getOrElse(u, Array.empty)
        .filter(_._3 <= t)
        .sortBy(p => (p._3, p._2))
        .lastOption.map(_._2).getOrElse(-1L)
      assert(got(eid) == expect, s"click $eid")
    }
  }

  // ---- intervalJoin ------------------------------------------------------

  test("intervalJoin: half-open [lo, hi) bounds, bucket-straddling " +
      "intervals, empty interval matches nothing") {
    // bucketWidth 10; interval (1, 5, 25) straddles buckets 0..2
    val iv = Seq((1L, 100L, 5L, 25L), (1L, 101L, 30L, 30L),
      (2L, 102L, 0L, 10L)).toDF("k", "win_id", "lo", "hi")
    val pt = Seq((1L, 1L, 5L), (1L, 2L, 24L), (1L, 3L, 25L),
      (1L, 4L, 30L), (2L, 5L, 9L), (3L, 6L, 7L)).toDF("k", "pid", "p")
    val got = AsOf.intervalJoin(pt, iv, "k", "p", "lo", "hi", 10L)
      .select("pid", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pid 1 at lo (inclusive), pid 2 inside, pid 3 at hi (exclusive),
    // pid 4 inside the EMPTY interval (lo==hi -> no match),
    // pid 5 on key 2, pid 6 on a key with no intervals
    assert(got == Set((1L, 100L), (2L, 100L), (5L, 102L)))
  }

  test("intervalJoin: pair set equals the brute-force range join for " +
      "any bucket width") {
    val rnd = new scala.util.Random(42)
    val iv = (0 until 60).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(3).toLong, i.toLong, lo, lo + rnd.nextInt(80).toLong)
    }.toDF("k", "win_id", "lo", "hi")
    val pt = (0 until 200).map(i =>
      (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(1100).toLong))
      .toDF("k", "pid", "p")
    val brute = pt.as("p").join(iv.as("i"),
        col("p.k") === col("i.k") && col("p.p") >= col("i.lo") &&
          col("p.p") < col("i.hi"))
      .select(col("pid"), col("win_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = AsOf.intervalJoin(pt, iv, "k", "p", "lo", "hi", w)
        .select("pid", "win_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"bucketWidth $w")
    }
  }
}
