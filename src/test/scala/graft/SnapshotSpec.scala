package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshot

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val oldSnap = Seq(
      (1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val newSnap = Seq(
      (1L, "alpha", "s1"),    // unchanged
      (2L, "beta v2", "s1"),  // changed
      (4L, "delta", "s2"))    // added; 3 removed
      .toDF("doc_id", "text", "source")
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", "text", "source")
      .as[(Long, String, String)].collect()
      .map { case (id, src, st) => id -> ((src, st)) }.toMap
    assert(out === Map(
      1L -> ("s1", "unchanged"),
      2L -> ("s1", "changed"),
      3L -> ("s2", "removed"),
      4L -> ("s2", "added")))
  }
}
