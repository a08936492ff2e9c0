package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Redact

/** Pins the PII patterns' match behavior — including the edge cases
  * the Redact docstrings document — and that `clean_text` contains no
  * residual match of any category.
  */
class RedactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    val spark2 = spark
    import spark2.implicits._
    val r = Redact.scrub(Seq(text).toDF("text"), "text")
      .select("n_email", "n_phone", "n_ipv4", "clean_text").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("emails: multiple matches, trailing punctuation not swallowed") {
    val (e, p, i, clean) =
      scrubOne("mail a@b.com and c.d+x@e.org. done")
    assert((e, p, i) === (2L, 0L, 0L))
    assert(clean === "mail <EMAIL> and <EMAIL>. done")
  }

  test("phones: strict +CC-NNN-NNN-NNNN only") {
    val (e, p, i, clean) =
      scrubOne("call +1-555-010-0007 or 555-010-0007")
    assert((e, p, i) === (0L, 1L, 0L))
    assert(clean === "call <PHONE> or 555-010-0007")
  }

  test("ipv4: plain quad matches, 3-part version string does not") {
    val (e, p, i, clean) = scrubOne("host 10.0.0.1 spark 3.5.1")
    assert((e, p, i) === (0L, 0L, 1L))
    assert(clean === "host <IP> spark 3.5.1")
  }

  test("ipv4 documented edge: a 5-part run matches its first quad") {
    val (_, _, i, clean) = scrubOne("run 1.2.3.4.5 ok")
    assert(i === 1L)
    assert(clean === "run <IP>.5 ok")
  }

  test("no category matches inside another's replacement output") {
    val (e, p, i, clean) =
      scrubOne("u7@example.com at 10.1.0.7 call +1-555-007-0007")
    assert((e, p, i) === (1L, 1L, 1L))
    assert(clean === "<EMAIL> at <IP> call <PHONE>")
  }

  test("no-op on clean text") {
    val (e, p, i, clean) = scrubOne("just ordinary words 123 here")
    assert((e, p, i) === (0L, 0L, 0L))
    assert(clean === "just ordinary words 123 here")
  }
}
