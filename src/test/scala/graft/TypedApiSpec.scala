package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// top-level: encoders can't reach case classes nested in a test class
case class Line(
    l_returnflag: String, l_linestatus: String,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double)

/** Typed Dataset[T] surface: case-class encoders + groupByKey, the
  * compile-time-checked form of the q1 aggregation. Values must equal
  * the untyped oracle-checked q1_agg.
  */
class TypedApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("typed groupByKey aggregation == untyped q1_agg") {
    import spark.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
    val li = Tables.load(spark, sf, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
      .as[Line]
    val typed = li
      .groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .mapGroups { (key: (String, String), it: Iterator[Line]) =>
        val (rf, ls) = key
        var qty = 0.0; var rev = 0.0; var n = 0L
        it.foreach { l =>
          qty += l.l_quantity
          rev += l.l_extendedprice * (1 - l.l_discount)
          n += 1
        }
        (rf, ls, math.round(qty * 100) / 100.0, n)
      }
      .collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap

    val untyped = SparkEntry.queries("q1_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(4)))).toMap

    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, (qty, n)) =>
      assert(n == untyped(k)._2, s"count mismatch for $k")
      assert(math.abs(qty - untyped(k)._1) < 0.02, s"qty mismatch for $k")
    }
  }
}
