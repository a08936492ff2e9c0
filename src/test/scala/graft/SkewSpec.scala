package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** The two salted skew patterns must be result-identical to their
  * direct forms (only the shuffle distribution may differ).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("saltedJoin == direct join on a skewed key (rows and values)") {
    val ev = Tables.load(spark, sf, "events")
    val dim = ev.groupBy(col("event_type"))
      .agg(min(col("event_id")).as("first_id"))
    val direct = ev.join(dim, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("first_id"))
    val salted = Skew.saltedJoin(ev, dim, Seq("event_type"),
        spread = hash(col("event_id")), saltBuckets = 8)
      .select(col("event_id"), col("event_type"), col("first_id"))
    assert(direct.count() == salted.count())
    assert(direct.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(direct).count() == 0)
  }

  test("saltedJoin keeps duplicate fact rows (join multiplicity)") {
    // two fact rows with the same key and same spread value must BOTH
    // survive (exceptAll above covers this; this pins the tiny case)
    val fact = Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "payload")
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "attr")
    val out = Skew.saltedJoin(fact, dim, Seq("k"),
      spread = lit(7), saltBuckets = 4)
    assert(out.count() == 3)
    assert(out.where(col("k") === 1).count() == 2)
  }

  test("salted join plan keys on (key, salt) — the skew spread is real") {
    val ev = Tables.load(spark, sf, "events")
    val dim = ev.groupBy(col("event_type"))
      .agg(min(col("event_id")).as("first_id"))
    val plan = Skew.saltedJoin(ev, dim, Seq("event_type"),
        spread = hash(col("event_id")), saltBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
  }
}
